package graft.operators

import org.apache.spark.sql.DataFrame

/** Gate-scoped registry for persisted model/corpus frames (round-15 fix
  * for the round-14 session-leaked persists, guide §5 "unpersist when
  * done").
  *
  * Why not a per-chain `finally`-unpersist: CacheManager dedupes
  * plan-equal persists to ONE entry, so under concurrent audit chains
  * ([[SimilaritySearch.inParallel]]) the first finisher's unpersist
  * evicts blocks its still-running siblings read ("Block rdd_N does not
  * exist", r14). Why not leak session-scoped (the r14 workaround): the
  * entries accumulate for the JVM's life across 341 gates — corpus-sized
  * blocks are a real memory-pressure risk at scale — and a bench rerun
  * of the same gate silently reads the previous run's still-cached
  * plan-equal blocks (a warm-cache bias in the medians).
  *
  * The safe release point is the GATE boundary: gates build and execute
  * strictly sequentially (Bench/Verify run one gate to completion before
  * the next), so when the next gate's builder starts, no chain of the
  * previous gate can still be reading. [[graft.SparkEntry.queries]]
  * calls [[releaseAll]] at every gate dispatch. Within a gate the
  * CacheManager dedup across plan-equal concurrent chains is preserved
  * (that dedup is a measured win — shared coarse trainings evaluate
  * once). Unpersist is always correctness-safe: an InMemoryRelation
  * whose blocks are gone recomputes from its child plan.
  */
object SessionCaches {
  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Persist (MEMORY_AND_DISK) and register for release at the next gate
    * boundary. Returns the input frame.
    */
  def register(df: DataFrame): DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    registered.add(df)
    df
  }

  /** Queue an ALREADY-persisted frame for release at the next gate
    * boundary (for loop patterns that persist iteratively and leave the
    * final iterate cached for lazy consumers).
    */
  def track(df: DataFrame): DataFrame = { registered.add(df); df }

  /** Unpersist every frame registered since the last call. */
  def releaseAll(): Unit = {
    var df = registered.poll()
    while (df != null) {
      scala.util.Try(df.unpersist())
      df = registered.poll()
    }
  }

  /** Registered-but-unreleased count (test hook). */
  def outstanding: Int = registered.size()
}
