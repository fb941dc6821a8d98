package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time window queries over the `events` fixture table.
  *
  * Batch-mode equivalents of the reference corpus's streaming-window
  * constructs (SURVEY.md §2.4 U4): `GROUP BY TUMBLING(ts, interval)` →
  * `window(ts, d)` (reference `emr-baseline-testing/queries/q101.sql:33`),
  * `HOPPING(ts, slide, size)` → `window(ts, size, slide)` (q100.sql:33),
  * `delay(ts) < 'd'` → `withWatermark` (q102.sql:32-33; a no-op on bounded
  * data, exercised for real in the streaming specs). The same `window()`
  * expressions run unchanged under `readStream` — that is the point of
  * building them Spark-native.
  *
  * Window starts are emitted as epoch seconds (bigint) so the oracle
  * compare is independent of timestamp-precision representation (fixture
  * `ts` is nanosecond parquet; Spark truncates to micros, DuckDB keeps ns).
  */
object EventsQueries {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TUMBLING(ts, interval 1 minute) — q101.sql:33 semantics.
    "q_events_tumbling" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "60 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy(col("w_start"), col("event_type"))
    }),

    // HOPPING(ts, interval 30 second, interval 1 minute) — q100.sql:33:
    // 60s windows sliding every 30s; every event lands in exactly 2 windows.
    "q_events_hopping" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "60 seconds", "30 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy(col("w_start"), col("event_type"))
    }),

    // TUMBLING + delay() watermark (q102.sql:32-33). On bounded input the
    // watermark admits everything; kept in the plan so the identical code
    // path runs under readStream (proven in StreamingWindowSpec).
    "q_events_tumbling_delay" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .withWatermark("ts", "2 minutes")
        .groupBy(window(col("ts"), "300 seconds"))
        .agg(count(lit(1)).as("n_events"),
          round(avg(col("value")), 4).as("avg_value"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("n_events"), col("avg_value"))
        .orderBy(col("w_start"))
    }),

    // Sessionization via session_window (beyond the reference corpus —
    // SURVEY.md §2.5 notes session windows absent there; a training-data
    // pipeline needs them for behavioral segmentation). A new session
    // starts when the gap since the previous event is >= 5 minutes.
    "q_events_sessionize" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Session windows on a STREAM: gap-merged sessions under a
    // watermark in APPEND mode — only sessions the watermark has sealed
    // (end + nothing can extend them) emit; open tails stay in state.
    // The oracle replays gap assignment (new session iff diff >= gap,
    // Spark's session_window semantics) and the emission rule at
    // microsecond event time vs the ms-floored watermark — the
    // q_sql_q102 discipline applied to MERGING windows, whose extents
    // are data-dependent rather than grid-aligned.
    "q_events_session_stream" -> ((s, dir) => {
      val u = java.util.UUID.randomUUID().toString.replace("-", "")
      val sink = s"/tmp/graft_sessstrm_$u/t"
      val ckpt = s"/tmp/graft_sessstrmck_$u"
      // cap sized for ~3 batches at sf0.1 (100k events): emission
      // correctness is batching-independent (the final no-data batch
      // evicts everything the final watermark seals), but every extra
      // micro-batch pays a full stateful checkpoint cycle — 25 batches
      // measured 42 s of pure engine overhead
      val q = s.readStream.format("log").option("path", s"$dir/events.parquet")
        .option("maxOffsetsPerTrigger", "40000").load()
        // event time must be LTZ; the session is pinned to UTC so the
        // NTZ→LTZ cast is value-identity
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("s_start"),
          unix_timestamp(col("session_window.end")).as("s_end"),
          col("n_events"), col("sum_value"))
        .writeStream.format("kv").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // State-eviction invariant, PINNED: after the final (no-data)
      // batch evicts everything the final watermark seals, the state
      // store must hold EXACTLY the open sessions — total gap-merged
      // sessions minus emitted (sealed) ones. This is the claim that
      // matters at 100x stream length: sealed state evicts, only open
      // tails stay resident, so state is bounded by concurrently-open
      // sessions under the watermark, never by stream history.
      val stateRows = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators).map(_.numRowsTotal).sum
      val emitted = s.read.format("kv").option("path", sink).load().count()
      val totalSessions = Tables.load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
        .agg(count(lit(1))).count()
      require(stateRows == totalSessions - emitted,
        s"session state holds $stateRows rows; want open sessions only " +
          s"($totalSessions total - $emitted sealed = " +
          s"${totalSessions - emitted})")
      s.read.format("kv").option("path", sink).load()
        .orderBy(col("user_id"), col("s_start"))
    }),

    // Approximate DISTINCT on a STREAM — the sketch family's streaming
    // payoff: exact streaming COUNT DISTINCT state grows with the key
    // set (unbounded over an unbounded stream), HllDistinct's state is
    // 256 BYTES per window forever, and register max is order-free, so
    // the drained result is micro-batching-independent by construction
    // (the property that makes an exact oracle possible at all).
    // Tumbling 6-hour windows in APPEND mode: only watermark-sealed
    // windows emit (the q_sql_q102 emission rule, replayed); registers
    // accumulate across micro-batches through the state store.
    "q_stream_hll_window" -> ((s, dir) => {
      val u = java.util.UUID.randomUUID().toString.replace("-", "")
      val sink = s"/tmp/graft_hllstrm_$u/t"
      val ckpt = s"/tmp/graft_hllstrmck_$u"
      val q = s.readStream.format("log").option("path", s"$dir/events.parquet")
        .option("maxOffsetsPerTrigger", "40000").load()
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "21600 seconds"))
        .agg(
          graft.functions.HllDistinct.hllDistinct(col("user_id"), p = 8)
            .as("hll_users"),
          count(lit(1)).as("n_events"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("hll_users"), col("n_events"))
        .writeStream.format("kv").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.format("kv").option("path", sink).load()
        .orderBy(col("w_start"))
    }),

    // The KMV synopsis on a STREAM — the fourth sketch family's
    // windowed-ingest gate (HLL/CMS/KLL each have one): per-window
    // minima arrays drain in APPEND mode (watermark-sealed windows
    // only), estimates read from the drained table alone. Union+trim
    // state is a pure function of the window's multiset, so the drain
    // is micro-batching-independent by construction.
    "q_stream_kmv_window" -> ((s, dir) => {
      import graft.functions.KmvDistinct
      val u = java.util.UUID.randomUUID().toString.replace("-", "")
      val sink = s"/tmp/graft_kmvstrm_$u/t"
      val ckpt = s"/tmp/graft_kmvstrmck_$u"
      val q = s.readStream.format("log").option("path", s"$dir/events.parquet")
        .option("maxOffsetsPerTrigger", "40000").load()
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "21600 seconds"))
        .agg(KmvDistinct.kmvMinima(col("user_id"), k = 128).as("mins"),
          count(lit(1)).as("n_events"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("mins"), col("n_events"))
        .writeStream.format("kv").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.format("kv").option("path", sink).load()
        .select(col("w_start"),
          graft.functions.KmvDistinct.kmvEstimate(col("mins"), k = 128)
            .as("kmv_users"),
          col("n_events"))
        .orderBy(col("w_start"))
    }),

    // A SAMPLE on a stream — the sketch-matrix's fifth family
    // ([[graft.operators.SampleSynopsis]]) gets its windowed-ingest
    // gate like HLL/CMS/KMV/KLL before it: per-6h-window bottom-16
    // event samples drain in APPEND mode (watermark-sealed windows
    // only), 16 rows of state per window forever. Bottom-k-by-hash is
    // a pure function of the window's row set (union+trim merge), so
    // the drained table is micro-batching-independent by construction
    // and the ranked sample replays hash-for-hash in the oracle.
    "q_stream_sample_ingest" -> ((s, dir) => {
      import graft.operators.SampleSynopsis
      val u = java.util.UUID.randomUUID().toString.replace("-", "")
      val sink = s"/tmp/graft_smpstrm_$u/t"
      val ckpt = s"/tmp/graft_smpstrmck_$u"
      val q = s.readStream.format("log").option("path", s"$dir/events.parquet")
        .option("maxOffsetsPerTrigger", "40000").load()
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "21600 seconds"))
        .agg(SampleSynopsis.uniformAgg(col("event_id"), 16,
          "event_id" -> col("event_id"), "user_id" -> col("user_id"))
          .as("smp"),
          count(lit(1)).as("n_events"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("smp"), col("n_events"))
        .writeStream.format("kv").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      SampleSynopsis.explodeSample(
        s.read.format("kv").option("path", sink).load(),
        "smp", Seq("w_start", "n_events"), Seq("event_id", "user_id"))
        .select(col("w_start"), col("rnk"), col("event_id"),
          col("user_id"), col("n_events"))
        .orderBy(col("w_start"), col("rnk"))
    }),

    // Streaming WEIGHTED-sample ingest (the q_stream_sample_ingest
    // discipline on DLT priority samples): per-6h-window top-17
    // priority rows (weights = cents of value, the exact lattice the
    // KLL gates use; 17 = k+1 so each window's τ lands in the table)
    // drain in append mode — sealed windows only — and the per-window
    // τ-threshold estimate reads each window's total event value off
    // 16 stored rows. Emission rule, priority chain and estimator all
    // replay in the oracle.
    "q_stream_priority_ingest" -> ((s, dir) => {
      import graft.operators.SampleSynopsis
      val u = java.util.UUID.randomUUID().toString.replace("-", "")
      val sink = s"/tmp/graft_priostrm_$u/t"
      val ckpt = s"/tmp/graft_priostrmck_$u"
      val q = s.readStream.format("log").option("path", s"$dir/events.parquet")
        .option("maxOffsetsPerTrigger", "40000").load()
        .withColumn("ts", col("ts").cast("timestamp"))
        .filter(col("value") > 0)
        .withColumn("cents",
          floor(col("value") * 100 + lit(0.5)).cast("long"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "21600 seconds"))
        .agg(SampleSynopsis.priorityAgg(col("event_id"), col("cents"), 17)
          .as("smp"))
        .select(unix_timestamp(col("window.start")).as("w_start"), col("smp"))
        .writeStream.format("kv").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val rows = SampleSynopsis.explodePriority(
        s.read.format("kv").option("path", sink).load(), "smp",
        Seq("w_start"))
      val tau = rows.groupBy(col("w_start"))
        .agg(coalesce(max(when(col("rnk") === 17, -col("nq"))),
          lit(0).cast("decimal(38,0)")).as("tau"))
      val estW = rows.filter(col("rnk") <= 16)
        .join(broadcast(tau), "w_start")
        .groupBy(col("w_start"))
        .agg(sum(greatest(col("w").cast("decimal(38,0)"), col("tau")))
          .cast("long").as("est_cents"))
      rows.filter(col("rnk") <= 16)
        .join(broadcast(estW), "w_start")
        .select(col("w_start"), col("rnk"), col("id").as("event_id"),
          col("w").as("cents"), col("est_cents"))
        .orderBy(col("w_start"), col("rnk"))
    }),

    // Streaming ingest of the sample-matrix CELL table: the stream
    // groups by (6h-window × event_type) — one watermark-sealed
    // bottom-8 sample per CELL drains in append mode — and the
    // per-window marginalization then rolls up from the drained cell
    // rows alone, BIT-IDENTICAL to the direct per-window sample over
    // the same sealed windows (union+trim over the type dimension).
    // The direct build rides along, restricted to windows the drain
    // sealed; one replayed chain per window pins both columns.
    "q_stream_sample_matrix" -> ((s, dir) => {
      import graft.operators.SampleSynopsis
      val u = java.util.UUID.randomUUID().toString.replace("-", "")
      val sink = s"/tmp/graft_smxstrm_$u/t"
      val ckpt = s"/tmp/graft_smxstrmck_$u"
      val q = s.readStream.format("log").option("path", s"$dir/events.parquet")
        .option("maxOffsetsPerTrigger", "40000").load()
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "21600 seconds"), col("event_type"))
        .agg(SampleSynopsis.uniformAgg(col("event_id"), 8,
          "event_id" -> col("event_id")).as("smp"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("event_type"), col("smp"))
        .writeStream.format("kv").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val stored = SampleSynopsis.explodeSample(
        s.read.format("kv").option("path", sink).load(),
        "smp", Seq("w_start", "event_type"), Seq("event_id"))
      val rolled = SampleSynopsis.rollupBy(stored, "h", 8,
        Seq("w_start"), Seq("event_id"))
      val sealedW = stored.select(col("w_start")).distinct()
      val ev = Tables.load(s, dir, "events")
        .select(unix_timestamp(window(col("ts"), "21600 seconds")("start"))
          .as("w_start"), col("event_id"))
        .join(broadcast(sealedW), "w_start")
      val direct = SampleSynopsis.explodeSample(
        ev.groupBy(col("w_start")).agg(
          SampleSynopsis.uniformAgg(col("event_id"), 8,
            "event_id" -> col("event_id")).as("smp")),
        "smp", Seq("w_start"), Seq("event_id"))
        .select(col("w_start"), col("rnk"),
          col("event_id").as("event_id_direct"))
      rolled.join(direct, Seq("w_start", "rnk"))
        .select(col("w_start"), col("rnk"), col("event_id"),
          col("event_id_direct"))
        .orderBy(col("w_start"), col("rnk"))
    }),

    // Per-(event_type × 6h-window) SAMPLE MATRIX: ONE persisted cell
    // table answers every marginalization — rolled up over type it
    // yields each window's bottom-8 sample, over window each type's,
    // over both the corpus sample, each BIT-IDENTICAL to the direct
    // build of that slice (the union+trim lemma applies per surviving
    // group: any row of a slice's bottom-k is in its own cell's
    // bottom-k). At 100 TB the cell table is maintained incrementally
    // (q_sample_incremental's append path) and every "sample this
    // slice" dashboard question reads synopsis rows alone. Direct
    // builds ride along; the oracle pins both columns with one
    // replayed chain per axis.
    "q_sample_matrix" -> ((s, dir) => {
      import graft.operators.SampleSynopsis
      val safe = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val sk = s"/tmp/graft_smpmx$safe"
      graft.sources.ParquetIO.deletePath(sk)
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"),
          unix_timestamp(window(col("ts"), "21600 seconds")("start"))
            .as("w_start"),
          col("event_id"), col("user_id"))
      ev.groupBy(col("event_type"), col("w_start"))
        .agg(SampleSynopsis.uniformAgg(col("event_id"), 8,
          "event_id" -> col("event_id"), "user_id" -> col("user_id"))
          .as("smp"))
        .select(col("event_type"), col("w_start"),
          posexplode(col("smp")).as(Seq("pos", "t")))
        .select(col("event_type"), col("w_start"), col("t.h").as("h"),
          col("t.event_id").as("event_id"), col("t.user_id").as("user_id"))
        .write.format("kv").option("path", sk).mode("overwrite").save()
      val stored = s.read.format("kv").option("path", sk).load()
      def directBy(keep: Seq[String]) =
        SampleSynopsis.explodeSample(
          ev.groupBy(keep.map(col): _*).agg(
            SampleSynopsis.uniformAgg(col("event_id"), 8,
              "event_id" -> col("event_id")).as("smp")),
          "smp", keep, Seq("event_id"))
      def axisDf(axisName: String, keep: Seq[String]) = {
        val rolled = SampleSynopsis.rollupBy(stored, "h", 8, keep,
          Seq("event_id", "user_id"))
        val direct = directBy(keep).select(
          keep.map(col) :+ col("rnk") :+
            col("event_id").as("event_id_direct"): _*)
        val grp = if (keep.isEmpty) lit("*")
          else concat_ws("/", keep.map(c => col(c).cast("string")): _*)
        rolled.join(direct, keep :+ "rnk")
          .select(lit(axisName).as("axis"), grp.as("grp"), col("rnk"),
            col("event_id"), col("event_id_direct"), col("user_id"))
      }
      axisDf("window", Seq("w_start"))
        .unionAll(axisDf("type", Seq("event_type")))
        .unionAll(axisDf("global", Seq.empty))
        .orderBy(col("axis"), col("grp"), col("rnk"))
    }),

    // Streaming SKETCH-TABLE ingest for the frequency family (the
    // q_stream_hll_window discipline on counters): per-window CMS
    // counter blobs land in a kv table as the stream drains (append
    // mode, watermark-sealed windows only), and the corpus-wide
    // estimate rolls up from sketch rows alone via cmsMerge — counter
    // adds are order-free, so the drained table is micro-batching-
    // independent and the whole pipeline admits an exact oracle
    // (emission rule + counter replay + min-of-depth estimates).
    "q_stream_cms_ingest" -> ((s, dir) => {
      import graft.functions.{CmsSketch, Sketches}
      val u = java.util.UUID.randomUUID().toString.replace("-", "")
      val sink = s"/tmp/graft_cmsstrm_$u/t"
      val ckpt = s"/tmp/graft_cmsstrmck_$u"
      val q = s.readStream.format("log").option("path", s"$dir/events.parquet")
        .option("maxOffsetsPerTrigger", "40000").load()
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "21600 seconds"))
        .agg(CmsSketch.cms(col("event_type"), depth = 4, width = 256)
          .as("sk"))
        .select(unix_timestamp(col("window.start")).as("w_start"), col("sk"))
        .writeStream.format("kv").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // rollup from the drained sketch table alone; the probe set is
      // the five event types (exact counts over the SAME sealed
      // windows ride along as the accuracy pin)
      val merged = s.read.format("kv").option("path", sink).load()
        .agg(CmsSketch.cmsMerge(col("sk"), depth = 4, width = 256).as("sk"))
      val types = Tables.load(s, dir, "events")
        .select(col("event_type")).distinct()
      types.crossJoin(broadcast(merged))
        .select(col("event_type"),
          CmsSketch.cmsEstimate(col("sk"),
            Sketches.stringHash64(col("event_type"), 0x9747b28cL),
            depth = 4, width = 256).as("cms_n"))
        .orderBy(col("event_type"))
    }),

    // Bucketized interval join ([[graft.operators.IntervalJoin]]): each
    // signup opens a 10-minute attribution window; find every view of
    // the same user inside it. Spark would run the raw BETWEEN predicate
    // as a nested-loop join — the operator makes it an equi-join on
    // (user, time bucket) with interval explode bounded at 2 copies.
    "q_events_interval_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("t_us", unix_micros(col("ts")))
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("t_us"))
      val windows = ev.where(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"),
          col("t_us").as("w_lo"), (col("t_us") + 600000000L).as("w_hi"))
      graft.operators.IntervalJoin.pointInInterval(
        views, windows, "t_us", "w_lo", "w_hi",
        bucketWidth = 600000000L, keyCols = Seq("user_id"))
        .select(col("signup_id"), col("view_id"), col("user_id"),
          (col("t_us") - col("w_lo")).as("lag_us"))
        .orderBy(col("signup_id"), col("view_id"))
    }),

    // Exact per-group quantiles over the binned value histogram
    // ([[graft.operators.CorpusStats.binnedQuantiles]]): window state is
    // bounded by the bin count, never the corpus; interpolation
    // arithmetic is replayed verbatim by the oracle.
    "q_events_quantiles" -> ((s, dir) => {
      graft.operators.CorpusStats.binnedQuantiles(
        Tables.load(s, dir, "events"), "event_type", "value",
        Seq(0.25, 0.5, 0.9, 0.99))
        .orderBy(col("event_type"))
    }),

    // Mergeable quantile sketch ([[graft.functions.KllSketch]]) — the
    // sketch-matrix member exact quantiles can't scale to: per-group
    // state is <= k (value, count) pairs at ANY corpus size and the
    // merge is order-free, where the exact path shuffles every value.
    // Values are integer cents, so the hash coins, level escalation,
    // weighted rank rule AND the exact integer-rank quantiles that ride
    // along all replay in DuckDB; the exact columns pin the accuracy
    // the estimate columns claim.
    "q_events_kll_quantiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.KllSketch
      val ev = Tables.load(s, dir, "events")
        .where(col("value").isNotNull)
        .select(col("event_type"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      val est = ev.groupBy(col("event_type"))
        .agg(KllSketch.kll(col("cents"), k = 256).as("sk"))
        .select(col("event_type"), KllSketch.kllN(col("sk")).as("n"),
          KllSketch.kllQuantile(col("sk"), 25).as("kll_q25"),
          KllSketch.kllQuantile(col("sk"), 50).as("kll_q50"),
          KllSketch.kllQuantile(col("sk"), 90).as("kll_q90"),
          KllSketch.kllQuantile(col("sk"), 99).as("kll_q99"))
      // exact lower quantiles under the SAME integer rank rule (first
      // value whose cumulative count reaches pct% of the group) — one
      // distinct-value window + one aggregation, state bounded by the
      // distinct cents per group, never a per-row shuffle
      val byV = ev.groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).as("c"))
      val win = Window.partitionBy(col("event_type")).orderBy(col("cents"))
      val exact = byV
        .withColumn("cum", sum(col("c")).over(win))
        .withColumn("w",
          sum(col("c")).over(Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(
          min(when(col("cum") * 100 >= col("w") * 25, col("cents")))
            .as("exact_q25"),
          min(when(col("cum") * 100 >= col("w") * 50, col("cents")))
            .as("exact_q50"),
          min(when(col("cum") * 100 >= col("w") * 90, col("cents")))
            .as("exact_q90"),
          min(when(col("cum") * 100 >= col("w") * 99, col("cents")))
            .as("exact_q99"))
      est.join(exact, "event_type")
        .select(col("event_type"), col("n"),
          col("kll_q25"), col("kll_q50"), col("kll_q90"), col("kll_q99"),
          col("exact_q25"), col("exact_q50"), col("exact_q90"),
          col("exact_q99"))
        .orderBy(col("event_type"))
    }),

    // PERSISTED quantile-sketch table + rollup — the q_corpus_hll_merge
    // discipline on quantiles: per-(type, 6h window) blobs land ONCE as
    // a kv table and any coarser grouping's quantiles are answered from
    // sketch rows alone. The rollup is BIT-IDENTICAL to the direct
    // sketch (hash-coin levels are monotone under sub-multisets — see
    // KllSketch's scaladoc), so the oracle replays ONE chain and pins
    // both the merged and the direct column to it.
    "q_events_kll_merge" -> ((s, dir) => {
      import graft.functions.KllSketch
      val sk = s"/tmp/graft_kllsk${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      graft.sources.ParquetIO.deletePath(sk)
      val ev = Tables.load(s, dir, "events")
        .where(col("value").isNotNull)
        .select(col("event_type"), col("ts"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      ev.groupBy(col("event_type"), window(col("ts"), "21600 seconds"))
        .agg(KllSketch.kll(col("cents"), k = 256).as("sk"))
        .select(col("event_type"),
          unix_timestamp(col("window.start")).as("w_start"), col("sk"))
        .write.format("kv").option("path", sk).mode("overwrite").save()
      val merged = s.read.format("kv").option("path", sk).load()
        .groupBy(col("event_type"))
        .agg(KllSketch.kllMerge(col("sk"), k = 256).as("sk"))
        .select(col("event_type"),
          KllSketch.kllQuantile(col("sk"), 50).as("kll_q50"),
          KllSketch.kllN(col("sk")).as("n"))
      val direct = ev.groupBy(col("event_type"))
        .agg(KllSketch.kll(col("cents"), k = 256).as("sk"))
        .select(col("event_type"),
          KllSketch.kllQuantile(col("sk"), 50).as("direct_q50"))
      merged.join(direct, "event_type")
        .select(col("event_type"), col("kll_q50"), col("direct_q50"),
          col("n"))
        .orderBy(col("event_type"))
    }),

    // The HLL cell grid under the same 2-D marginalization: per-(type ×
    // 6h-window) register cells answer distinct-user counts for every
    // slice — per window, per type AND corpus-wide — by register-max
    // rollup from stored rows alone (order-free, so any
    // marginalization of the grid is canonical). Direct sketches and
    // exact counts ride along per axis.
    "q_events_hll_matrix" -> ((s, dir) => {
      import graft.functions.{HllDistinct, HllMerge}
      val sk = s"/tmp/graft_hllmx${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      graft.sources.ParquetIO.deletePath(sk)
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"),
          unix_timestamp(window(col("ts"), "21600 seconds")("start"))
            .as("w_start"),
          col("user_id"))
      ev.groupBy(col("event_type"), col("w_start"))
        .agg(HllDistinct.hllRegisters(col("user_id"), p = 8).as("regs"))
        .write.format("kv").option("path", sk).mode("overwrite").save()
      val stored = s.read.format("kv").option("path", sk).load()
      def axisDf(axisName: String, keep: Seq[String]) = {
        val rolled = stored.groupBy(keep.map(col): _*)
          .agg(HllMerge.hllMergeEstimate(col("regs"), p = 8).as("hll_ndv"))
        val direct = ev.groupBy(keep.map(col): _*)
          .agg(HllDistinct.hllDistinct(col("user_id"), p = 8)
            .as("hll_direct"),
            countDistinct(col("user_id")).as("exact_ndv"))
        val grp = if (keep.isEmpty) lit("*")
          else concat_ws("/", keep.map(c => col(c).cast("string")): _*)
        (if (keep.isEmpty) rolled.crossJoin(broadcast(direct))
         else rolled.join(direct, keep))
          .select(lit(axisName).as("axis"), grp.as("grp"), col("hll_ndv"),
            col("hll_direct"), col("exact_ndv"))
      }
      axisDf("window", Seq("w_start"))
        .unionAll(axisDf("type", Seq("event_type")))
        .unionAll(axisDf("global", Seq.empty))
        .orderBy(col("axis"), col("grp"))
    }),

    // The sketch matrix goes TWO-dimensional: the same per-(type ×
    // 6h-window) KLL cell table that q_events_kll_merge marginalizes
    // per type also answers per-WINDOW and corpus-wide quantiles —
    // kllMerge over the surviving dimension(s), each rollup
    // BIT-IDENTICAL to the direct sketch over that slice (the
    // sub-multiset level-monotonicity argument is partition-shape-free,
    // so ANY marginalization of the cell grid is canonical). "Any
    // slice's distribution" answered from stored blobs alone; direct
    // builds ride along, one replayed chain per axis pins both.
    "q_events_kll_matrix" -> ((s, dir) => {
      import graft.functions.KllSketch
      val sk = s"/tmp/graft_kllmx${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      graft.sources.ParquetIO.deletePath(sk)
      val ev = Tables.load(s, dir, "events")
        .where(col("value").isNotNull)
        .select(col("event_type"),
          unix_timestamp(window(col("ts"), "21600 seconds")("start"))
            .as("w_start"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      ev.groupBy(col("event_type"), col("w_start"))
        .agg(KllSketch.kll(col("cents"), k = 256).as("sk"))
        .write.format("kv").option("path", sk).mode("overwrite").save()
      val stored = s.read.format("kv").option("path", sk).load()
      def axisDf(axisName: String, keep: Seq[String]) = {
        val rolled = stored.groupBy(keep.map(col): _*)
          .agg(KllSketch.kllMerge(col("sk"), k = 256).as("sk"))
          .select(keep.map(col) ++ Seq(
            KllSketch.kllQuantile(col("sk"), 50).as("q50"),
            KllSketch.kllQuantile(col("sk"), 90).as("q90"),
            KllSketch.kllN(col("sk")).as("n")): _*)
        val direct = ev.groupBy(keep.map(col): _*)
          .agg(KllSketch.kll(col("cents"), k = 256).as("sk"))
          .select(keep.map(col) :+
            KllSketch.kllQuantile(col("sk"), 50).as("direct_q50"): _*)
        val grp = if (keep.isEmpty) lit("*")
          else concat_ws("/", keep.map(c => col(c).cast("string")): _*)
        (if (keep.isEmpty) rolled.crossJoin(broadcast(direct))
         else rolled.join(direct, keep))
          .select(lit(axisName).as("axis"), grp.as("grp"), col("q50"),
            col("direct_q50"), col("q90"), col("n"))
      }
      axisDf("window", Seq("w_start"))
        .unionAll(axisDf("type", Seq("event_type")))
        .unionAll(axisDf("global", Seq.empty))
        .orderBy(col("axis"), col("grp"))
    }),

    // Distribution DRIFT from sketch rows alone — the dashboard the
    // quantile sketch exists for: each 6h window's median, located in
    // the CORPUS distribution by its estimated permille rank
    // (kll_rank_milli over the corpus blob). A stationary stream sits
    // near 500; a shifted window shows up as a rank excursion — and
    // the whole readout touches one corpus sketch row per window, not
    // the raw data. Exact BigInt rank arithmetic; both chains and the
    // rank rule replay in the oracle.
    "q_events_kll_drift" -> ((s, dir) => {
      import graft.functions.KllSketch
      val ev = Tables.load(s, dir, "events")
        .where(col("value").isNotNull)
        .select(col("ts"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      val win = ev.groupBy(window(col("ts"), "21600 seconds"))
        .agg(KllSketch.kll(col("cents"), k = 256).as("sk"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          KllSketch.kllQuantile(col("sk"), 50).as("win_q50"),
          KllSketch.kllN(col("sk")).as("n_vals"))
      val corp = ev.agg(KllSketch.kll(col("cents"), k = 256).as("csk"))
      win.crossJoin(broadcast(corp))
        .select(col("w_start"), col("win_q50"), col("n_vals"),
          KllSketch.kllRankMilli(col("csk"), col("win_q50"))
            .as("corp_rank_milli"))
        .orderBy(col("w_start"))
    }),

    // Approximate quantiles on a STREAM — the q_stream_hll_window
    // discipline on ranks: exact streaming quantiles would hold every
    // value in state (unbounded), KllSketch holds <= k pairs per window
    // forever, and the hash-coin state is a pure function of the
    // window's multiset, so the drained result is micro-batching-
    // independent by construction (what makes the exact oracle
    // possible). Tumbling 6-hour windows in APPEND mode: only
    // watermark-sealed windows emit.
    "q_stream_kll_window" -> ((s, dir) => {
      import graft.functions.KllSketch
      val u = java.util.UUID.randomUUID().toString.replace("-", "")
      val sink = s"/tmp/graft_kllstrm_$u/t"
      val ckpt = s"/tmp/graft_kllstrmck_$u"
      val q = s.readStream.format("log").option("path", s"$dir/events.parquet")
        .option("maxOffsetsPerTrigger", "40000").load()
        .withColumn("ts", col("ts").cast("timestamp"))
        .where(col("value").isNotNull)
        .withColumn("cents",
          floor(col("value") * 100 + lit(0.5)).cast("long"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "21600 seconds"))
        .agg(KllSketch.kll(col("cents"), k = 256).as("sk"))
        .select(unix_timestamp(col("window.start")).as("w_start"), col("sk"))
        .writeStream.format("kv").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.format("kv").option("path", sink).load()
        .select(col("w_start"),
          KllSketch.kllQuantile(col("sk"), 50).as("kll_q50"),
          KllSketch.kllQuantile(col("sk"), 99).as("kll_q99"),
          KllSketch.kllN(col("sk")).as("n_vals"))
        .orderBy(col("w_start"))
    }),

    // Training examples from the raw event stream in ONE Catalyst plan —
    // the feature-engineering flagship: gap-sessionize (4-hour
    // inactivity — the fixture's median inter-event gap is ~7 h),
    // aggregate per-session features (counts, exact integer cents),
    // then label each session by whether a purchase follows within
    // 8 hours of its end (forward as-of with
    // tolerance, strictly-after via end+1µs). Every stage replays in
    // the oracle: window lag/cumsum sessionization, integer features,
    // EXISTS-window label.
    "q_pipeline_features" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(s, dir, "events")
        .withColumn("t_us", unix_micros(col("ts")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lagW = Window.partitionBy(col("user_id"))
        .orderBy(col("t_us"), col("event_id"))
      val sess = ev
        .withColumn("new_s",
          when(lag(col("t_us"), 1).over(lagW).isNull ||
            col("t_us") - lag(col("t_us"), 1).over(lagW) >= 14400000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_s")).over(w))
      val feats = sess.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_views"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).cast("long")
            .as("value_cents"),
          min(col("t_us")).as("sess_start"), max(col("t_us")).as("sess_end"))
      val left = feats.withColumn("t_us", col("sess_end") + 1L)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("t_us"), col("event_id").as("p_id"))
      graft.operators.AsOfJoin.asofForward(left, purchases, "user_id", "t_us",
        Seq("p_id"), tolerance = Some(lit(28800000000L)))
        .select(col("user_id"), col("session_id"), col("n_events"),
          col("n_views"), col("value_cents"), col("sess_start"),
          col("sess_end"), col("p_id").isNotNull.cast("int").as("label"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // Percentile winsorization audit: exact binned 1/99-percentile
    // thresholds per event type (broadcast back), rows classified
    // against them — outlier clipping as data prep, with the clip
    // counts exact integers and the thresholds exposed. The oracle
    // replays the interpolation and the strict-inequality classification.
    "q_events_winsorize" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val thr = graft.operators.CorpusStats.binnedQuantiles(
        ev, "event_type", "value", Seq(0.01, 0.99))
        .select(col("event_type"), col("q_01"), col("q_99"))
      ev.join(broadcast(thr), "event_type")
        .select(col("event_type"),
          when(col("value") < col("q_01"), lit(1L)).otherwise(lit(0L)).as("lo"),
          when(col("value") > col("q_99"), lit(1L)).otherwise(lit(0L)).as("hi"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("lo")).as("n_clipped_lo"),
          sum(col("hi")).as("n_clipped_hi"))
        .join(broadcast(thr), Seq("event_type"))
        .select(col("event_type"), col("n"), col("n_clipped_lo"),
          col("n_clipped_hi"), round(col("q_01"), 6).as("q_01"),
          round(col("q_99"), 6).as("q_99"))
        .orderBy(col("event_type"))
    }),

    // Sketch-PLANNED winsorize: clip bounds come from the persisted KLL
    // quantile table (p5/p95 read off stored blobs — zero exact
    // percentile shuffle), then ONE exact pass clips and aggregates.
    // At 100 TB the exact-percentile plan shuffles every value per
    // group; this plan broadcasts a 5-row bounds table. Sums stay on
    // the integer cents lattice, so the whole pipeline (sketch levels,
    // quantile readout, clip, sums) replays exactly.
    "q_events_winsorize_sketch" -> ((s, dir) => {
      import graft.functions.KllSketch
      val sk = s"/tmp/graft_wsk${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      graft.sources.ParquetIO.deletePath(sk)
      val ev = Tables.load(s, dir, "events").where(col("value").isNotNull)
        .select(col("event_type"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      ev.groupBy(col("event_type"))
        .agg(KllSketch.kll(col("cents"), k = 256).as("sk"))
        .write.format("kv").option("path", sk).mode("overwrite").save()
      val bounds = s.read.format("kv").option("path", sk).load()
        .select(col("event_type"),
          KllSketch.kllQuantile(col("sk"), 5).as("lo_cents"),
          KllSketch.kllQuantile(col("sk"), 95).as("hi_cents"))
      ev.join(broadcast(bounds), "event_type")
        .groupBy(col("event_type"), col("lo_cents"), col("hi_cents"))
        .agg(count(lit(1)).as("n"),
          sum(least(greatest(col("cents"), col("lo_cents")),
            col("hi_cents"))).cast("long").as("sum_clipped"),
          sum(col("cents")).cast("long").as("sum_raw"))
        .select(col("event_type"), col("lo_cents"), col("hi_cents"),
          col("n"), col("sum_clipped"), col("sum_raw"))
        .orderBy(col("event_type"))
    }),

    // Point-in-time (as-of) join: attach to each view the user's most
    // recent purchase at or before it — the time-series lookup Spark has
    // no native operator for ([[graft.operators.AsOfJoin]]: tagged union
    // + one per-key window pass, single shuffle). Times compare as
    // integer epoch micros — the common precision of Spark's truncated
    // micros and the fixture's nanosecond storage — so both engines rank
    // identically.
    "q_events_asof" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("t_us", unix_micros(col("ts")))
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("t_us"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("t_us"), col("value").as("ref_value"))
      graft.operators.AsOfJoin.asofBackward(
        views, purchases, "user_id", "t_us", Seq("ref_value"))
        .orderBy(col("event_id"))
    }),

    // Forward as-of: each view picks up the EARLIEST purchase at or after
    // it — oracle is DuckDB's native ASOF with the inequality flipped
    // (two independent engines, same inclusive-forward semantics).
    "q_events_asof_fwd" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("t_us", unix_micros(col("ts")))
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("t_us"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("t_us"), col("value").as("ref_value"))
      graft.operators.AsOfJoin.asofForward(
        views, purchases, "user_id", "t_us", Seq("ref_value"))
        .orderBy(col("event_id"))
    }),

    // Backward as-of with a tolerance bound (pandas merge_asof
    // tolerance): matches farther than ~28 hours are nulled — the bound
    // sits near the median view→purchase gap, so roughly half the
    // matches survive and half null (both branches exercised). Oracle
    // applies the same inclusive CASE over DuckDB's native ASOF.
    "q_events_asof_tol" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("t_us", unix_micros(col("ts")))
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("t_us"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("t_us"), col("value").as("ref_value"))
      graft.operators.AsOfJoin.asofBackward(
        views, purchases, "user_id", "t_us", Seq("ref_value"),
        tolerance = Some(lit(100000000000L)))
        .orderBy(col("event_id"))
    }),

    // Nearest as-of (pandas direction='nearest', ties backward): oracle
    // replays the rule with correlated min/max subqueries — no ASOF
    // operator involved, a third independent formulation.
    "q_events_asof_near" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("t_us", unix_micros(col("ts")))
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("t_us"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("t_us"), col("value").as("ref_value"))
      graft.operators.AsOfJoin.asofNearest(
        views, purchases, "user_id", "t_us", Seq("ref_value"))
        .orderBy(col("event_id"))
    }),

    // Semi-structured extraction: the `props` JSON column (the reference's
    // Loghub default schema carries the whole log as a JSON __value__ —
    // LoghubSourceRDD.scala:155-166; same extract-then-aggregate shape).
    "q_events_json" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_bucket"))
        .groupBy(col("event_type"), col("k_bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("k_bucket"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "q_events_tumbling" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL 60 SECOND, ts)) AS BIGINT) AS w_start,
        |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q_events_hopping" ->
      """SELECT w_start, event_type, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM (
        |  SELECT CAST(epoch(time_bucket(INTERVAL 30 SECOND, ts)) AS BIGINT)
        |           - 30 * o.off AS w_start,
        |         event_type, value
        |  FROM events, (SELECT unnest([0, 1]) AS off) o
        |)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q_events_tumbling_delay" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL 300 SECOND, ts)) AS BIGINT) AS w_start,
        |  count(*) AS n_events, round(avg(value), 4) AS avg_value
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q_events_session_stream" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('microseconds', ts) AS ts, value
        |  FROM events
        |), o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
        |         THEN 1 ELSE 0 END AS ns
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sid AS (
        |  SELECT user_id, ts, value,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |), sess AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(min(ts))) AS BIGINT) AS s_start,
        |    CAST(floor(epoch(max(ts) + INTERVAL 5 MINUTE)) AS BIGINT) AS s_end,
        |    max(ts) AS last_ts,
        |    count(*) AS n_events, round(sum(value), 2) AS sum_value
        |  FROM sid GROUP BY user_id, sid
        |)
        |SELECT user_id, s_start, s_end, n_events, sum_value
        |FROM sess
        |WHERE epoch_us(last_ts + INTERVAL 5 MINUTE)
        |      <= (SELECT (epoch_ms(max(ts)) - 600000) * 1000 FROM events)
        |ORDER BY user_id, s_start""".stripMargin,

    "q_events_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |)
        |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM o
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // HLL registers + tumbling windows + the append-mode emission rule
    // (window_end <= ms-floored final watermark), all replayed — the
    // register chain is SketchOracleSql's shared p=8 replay
    "q_stream_hll_window" -> {
      val chain = SketchOracleSql.hllChainSql("sw",
        """SELECT (epoch_us(date_trunc('microseconds', ts)) // 21600000000) * 21600 AS grp,
          |    user_id AS v FROM events""".stripMargin,
        "hll_users")
      s"""WITH $chain,
         |swcnt AS (
         |  SELECT (epoch_us(date_trunc('microseconds', ts)) // 21600000000) * 21600 AS grp,
         |    count(*)::BIGINT AS n_events
         |  FROM events GROUP BY 1
         |), swwm AS (
         |  SELECT (epoch_ms(max(ts)) - 600000) * 1000 AS wm_us FROM events
         |)
         |SELECT c.grp AS w_start, o.hll_users, c.n_events
         |FROM swcnt c JOIN swout o USING (grp), swwm
         |WHERE (c.grp + 21600) * 1000000 <= swwm.wm_us
         |ORDER BY w_start""".stripMargin
    },

    // the oracle runs the raw point-in-interval predicate — the
    // bucketized equi-join must reproduce it exactly
    "q_events_interval_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS t_us, event_type
        |  FROM events
        |)
        |SELECT s.event_id AS signup_id, v.event_id AS view_id, v.user_id,
        |  v.t_us - s.t_us AS lag_us
        |FROM (SELECT * FROM ev WHERE event_type = 'signup') s
        |JOIN (SELECT * FROM ev WHERE event_type = 'view') v
        |  ON s.user_id = v.user_id
        |  AND v.t_us BETWEEN s.t_us AND s.t_us + 600000000
        |ORDER BY signup_id, view_id""".stripMargin,

    "q_events_quantiles" ->
      """WITH cnts AS (
        |  SELECT event_type AS g, round(value, 2) AS b, count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), ranked AS (
        |  SELECT g, b, cnt,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY b) AS cum,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY b) - cnt + 1 AS first_rank
        |  FROM cnts
        |), totals AS (
        |  SELECT g, sum(cnt) AS n FROM cnts GROUP BY 1
        |), targets AS (
        |  SELECT g, n, p, CAST(floor(p * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 AS rlo,
        |    CAST(ceil(p * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 AS rhi,
        |    p * CAST(n - 1 AS DOUBLE) - floor(p * CAST(n - 1 AS DOUBLE)) AS frac
        |  FROM totals, unnest(CAST([0.25, 0.5, 0.9, 0.99] AS DOUBLE[])) AS tp(p)
        |), lo AS (
        |  SELECT t.g, t.p, t.n, t.frac, r.b AS vlo
        |  FROM targets t JOIN ranked r ON t.g = r.g AND t.rlo BETWEEN r.first_rank AND r.cum
        |), hi AS (
        |  SELECT t.g, t.p, t.n, t.frac, r.b AS vhi
        |  FROM targets t JOIN ranked r ON t.g = r.g AND t.rhi BETWEEN r.first_rank AND r.cum
        |), q AS (
        |  SELECT lo.g, lo.p, lo.n, vlo + (vhi - vlo) * lo.frac AS q
        |  FROM lo JOIN hi ON lo.g = hi.g AND lo.p = hi.p
        |)
        |SELECT g AS event_type, CAST(max(n) AS BIGINT) AS n,
        |  max(CASE WHEN p = 0.25 THEN q END) AS q_25,
        |  max(CASE WHEN p = 0.5 THEN q END) AS q_5,
        |  max(CASE WHEN p = 0.9 THEN q END) AS q_9,
        |  max(CASE WHEN p = 0.99 THEN q END) AS q_99
        |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,

    // hash-coin levels, escalation-minimal level selection, weighted
    // integer rank rule and the exact ride-along quantiles — the whole
    // sketch replayed (SketchOracleSql.kllChainSql)
    "q_events_kll_quantiles" -> SketchOracleSql.kllQuantilesOracle,

    // rollup ≡ direct bit-for-bit (sub-multiset level monotonicity) —
    // one replayed chain pins both columns
    "q_events_kll_merge" -> SketchOracleSql.kllMergeOracle,
    "q_events_kll_matrix" -> SketchOracleSql.kllMatrixOracle,
    "q_events_hll_matrix" -> SketchOracleSql.hllMatrixOracle,

    // window medians located in the corpus sketch by the exact rank
    // rule — both chains replayed
    "q_events_kll_drift" -> SketchOracleSql.kllDriftOracle,

    // the append-mode emission rule + the per-window chain + rank rule
    "q_stream_kll_window" -> SketchOracleSql.streamKllWindowOracle,

    // sealed windows + the per-window k-min chain + counts
    "q_stream_kmv_window" -> SketchOracleSql.streamKmvWindowOracle,
    "q_stream_sample_ingest" -> SketchOracleSql.streamSampleIngestOracle(16),
    "q_stream_priority_ingest" -> SketchOracleSql.streamPriorityIngestOracle(16),
    "q_stream_sample_matrix" -> SketchOracleSql.streamSampleMatrixOracle(8),
    "q_sample_matrix" -> SketchOracleSql.sampleMatrixOracle(8),
    "q_events_winsorize_sketch" -> SketchOracleSql.eventsWinsorizeSketchOracle,

    // sessionization (lag/cumsum), integer features, EXISTS label over
    // the strictly-after 10-minute window — the full chain replayed
    "q_pipeline_features" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, value,
        |    epoch_ns(ts) // 1000 AS t_us
        |  FROM events
        |), o AS (
        |  SELECT *, CASE WHEN lag(t_us) OVER w IS NULL
        |      OR t_us - lag(t_us) OVER w >= 14400000000 THEN 1 ELSE 0 END AS new_s
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
        |), s AS (
        |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY t_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS session_id
        |  FROM o
        |), feats AS (
        |  SELECT user_id, session_id, count(*)::BIGINT AS n_events,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_views,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS value_cents,
        |    min(t_us) AS sess_start, max(t_us) AS sess_end
        |  FROM s GROUP BY 1, 2
        |)
        |SELECT f.user_id, f.session_id, f.n_events, f.n_views, f.value_cents,
        |  f.sess_start, f.sess_end,
        |  CAST(CASE WHEN EXISTS (
        |    SELECT 1 FROM ev p
        |    WHERE p.user_id = f.user_id AND p.event_type = 'purchase'
        |      AND p.t_us >= f.sess_end + 1
        |      AND p.t_us <= f.sess_end + 1 + 28800000000)
        |    THEN 1 ELSE 0 END AS INT) AS label
        |FROM feats f
        |ORDER BY user_id, session_id""".stripMargin,

    // same interpolation replay as q_events_quantiles at p = 1/99,
    // then the strict-inequality clip classification
    "q_events_winsorize" ->
      """WITH cnts AS (
        |  SELECT event_type AS g, round(value, 2) AS b, count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), ranked AS (
        |  SELECT g, b, cnt,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY b) AS cum,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY b) - cnt + 1 AS first_rank
        |  FROM cnts
        |), totals AS (
        |  SELECT g, sum(cnt) AS n FROM cnts GROUP BY 1
        |), targets AS (
        |  SELECT g, n, p, CAST(floor(p * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 AS rlo,
        |    CAST(ceil(p * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 AS rhi,
        |    p * CAST(n - 1 AS DOUBLE) - floor(p * CAST(n - 1 AS DOUBLE)) AS frac
        |  FROM totals, unnest(CAST([0.01, 0.99] AS DOUBLE[])) AS tp(p)
        |), lo AS (
        |  SELECT t.g, t.p, t.frac, r.b AS vlo
        |  FROM targets t JOIN ranked r ON t.g = r.g AND t.rlo BETWEEN r.first_rank AND r.cum
        |), hi AS (
        |  SELECT t.g, t.p, t.frac, r.b AS vhi
        |  FROM targets t JOIN ranked r ON t.g = r.g AND t.rhi BETWEEN r.first_rank AND r.cum
        |), thr AS (
        |  SELECT lo.g AS event_type,
        |    max(CASE WHEN lo.p = 0.01 THEN vlo + (vhi - vlo) * lo.frac END) AS q01,
        |    max(CASE WHEN lo.p = 0.99 THEN vlo + (vhi - vlo) * lo.frac END) AS q99
        |  FROM lo JOIN hi ON lo.g = hi.g AND lo.p = hi.p
        |  GROUP BY 1
        |)
        |SELECT e.event_type, count(*)::BIGINT AS n,
        |  CAST(sum(CASE WHEN e.value < t.q01 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
        |  CAST(sum(CASE WHEN e.value > t.q99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
        |  round(max(t.q01), 6) AS q_01, round(max(t.q99), 6) AS q_99
        |FROM events e JOIN thr t USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // DuckDB's native ASOF JOIN is the oracle for the hand-built
    // union+window implementation — two independent formulations of the
    // same point-in-time semantics.
    "q_events_asof" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS t_us, value, event_type
        |  FROM events
        |), l AS (
        |  SELECT event_id, user_id, t_us, value FROM ev WHERE event_type = 'view'
        |), r AS (
        |  SELECT user_id, t_us, max(value) AS ref_value FROM ev
        |  WHERE event_type = 'purchase' GROUP BY 1, 2
        |)
        |SELECT l.event_id, l.user_id, l.t_us, l.value, r.ref_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t_us >= r.t_us
        |ORDER BY l.event_id""".stripMargin,

    "q_events_asof_fwd" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS t_us, value, event_type
        |  FROM events
        |), l AS (
        |  SELECT event_id, user_id, t_us, value FROM ev WHERE event_type = 'view'
        |), r AS (
        |  SELECT user_id, t_us, max(value) AS ref_value FROM ev
        |  WHERE event_type = 'purchase' GROUP BY 1, 2
        |)
        |SELECT l.event_id, l.user_id, l.t_us, l.value, r.ref_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t_us <= r.t_us
        |ORDER BY l.event_id""".stripMargin,

    "q_events_asof_tol" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS t_us, value, event_type
        |  FROM events
        |), l AS (
        |  SELECT event_id, user_id, t_us, value FROM ev WHERE event_type = 'view'
        |), r AS (
        |  SELECT user_id, t_us, max(value) AS ref_value FROM ev
        |  WHERE event_type = 'purchase' GROUP BY 1, 2
        |)
        |SELECT l.event_id, l.user_id, l.t_us, l.value,
        |  CASE WHEN l.t_us - r.t_us <= 100000000000 THEN r.ref_value END AS ref_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t_us >= r.t_us
        |ORDER BY l.event_id""".stripMargin,

    "q_events_asof_near" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS t_us, value, event_type
        |  FROM events
        |), l AS (
        |  SELECT event_id, user_id, t_us, value FROM ev WHERE event_type = 'view'
        |), r AS (
        |  SELECT user_id, t_us, max(value) AS ref_value FROM ev
        |  WHERE event_type = 'purchase' GROUP BY 1, 2
        |), m AS (
        |  SELECT l.*,
        |    (SELECT max(r2.t_us) FROM r r2
        |     WHERE r2.user_id = l.user_id AND r2.t_us <= l.t_us) AS bt,
        |    (SELECT min(r3.t_us) FROM r r3
        |     WHERE r3.user_id = l.user_id AND r3.t_us >= l.t_us) AS ft
        |  FROM l
        |), c AS (
        |  SELECT *, CASE
        |    WHEN bt IS NULL THEN ft
        |    WHEN ft IS NULL THEN bt
        |    WHEN (t_us - bt) <= (ft - t_us) THEN bt ELSE ft END AS mt
        |  FROM m
        |)
        |SELECT c.event_id, c.user_id, c.t_us, c.value, r.ref_value
        |FROM c LEFT JOIN r ON r.user_id = c.user_id AND r.t_us = c.mt
        |ORDER BY c.event_id""".stripMargin,

    "q_events_json" ->
      """SELECT event_type, CAST(props->>'$.k' AS BIGINT) % 10 AS k_bucket,
        |  count(*) AS n
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
  )
}
