package graft.operators

import graft.SparkSpec

/** Round-15 cache-lifecycle contract (r14 verdict #1/#4): persisted
  * model/corpus frames registered by operators must not outlive their
  * gate — the next gate dispatch releases them, so cached blocks cannot
  * accumulate across a 341-gate bench run and a rerun of the same gate
  * cannot silently read the previous run's still-cached blocks.
  */
class SessionCachesSpec extends SparkSpec {

  private def runGate(name: String): Unit =
    graft.SparkEntry.queries(name)(spark, sf(""))
      .write.format("noop").mode("overwrite").save()

  test("gate dispatch releases the previous gate's registered caches") {
    def cached: Int = spark.sparkContext.getPersistentRDDs.size
    // isolate from whatever earlier suites left behind
    SessionCaches.releaseAll()
    spark.sqlContext.clearCache()

    // an ANN gate that registers model caches (coarse + PQ codebooks)
    runGate("q_ann_ivfpq")
    assert(SessionCaches.outstanding > 0,
      "ANN gate should register model caches")
    val afterFirst = cached
    assert(afterFirst > 0)

    // rerunning the SAME gate must not accumulate entries: the dispatch
    // releases run 1's registrations before run 2 registers its own
    runGate("q_ann_ivfpq")
    assert(cached <= afterFirst,
      s"cached RDDs accumulated across reruns: $afterFirst -> $cached")

    // a gate that registers nothing leaves ZERO cached blocks behind
    // once dispatched after the ANN gate
    runGate("q1_pricing_summary")
    assert(SessionCaches.outstanding == 0,
      "non-caching gate must not hold registrations")
    assert(cached == 0,
      s"blocks remained cached after a gate boundary: $cached")
  }

  test("concurrent plan-equal chains share one entry and survive a sibling finishing") {
    SessionCaches.releaseAll()
    spark.sqlContext.clearCache()
    // an audit gate runs sibling chains via inParallel over shared
    // registered frames — values must come out exact (no
    // "Block does not exist" mid-read, registrations released next gate)
    runGate("q_ann_pca2_audit")
    runGate("q1_pricing_summary")
    // registrations fully drained (localCheckpoint RDDs of the audit's
    // returned frames are GC-owned, not registry-owned, so only the
    // registry is asserted here)
    assert(SessionCaches.outstanding == 0)
  }
}
