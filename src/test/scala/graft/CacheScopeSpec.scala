package graft

import org.scalatest.funsuite.AnyFunSuite

/** Operator-scoped cache release (r12): after a dedup-family query's
  * consuming action, NO persisted RDDs may remain — without any caller
  * calling `clearCache`. This is the contract CacheScope.selfReleasing
  * (and minhashLsh's structural ReusedExchange form) replaced the old
  * caller-side teardown with.
  */
class CacheScopeSpec extends AnyFunSuite {

  lazy val spark = Specs.spark
  private val sf = "/root/testdata/sf0.001"

  /** Release is a post-action listener event (async bus) — poll. */
  private def drained(deadlineMs: Long = 20000): Boolean = {
    val end = System.currentTimeMillis + deadlineMs
    while (System.currentTimeMillis < end &&
      spark.sparkContext.getPersistentRDDs.nonEmpty) Thread.sleep(100)
    spark.sparkContext.getPersistentRDDs.isEmpty
  }

  test("dedup-family persists release themselves after the consuming action") {
    // baseline once: earlier suites ran under the old conventions
    spark.catalog.clearCache()
    assert(drained(),
      s"baseline leak (pre-existing): ${spark.sparkContext.getPersistentRDDs}")
    val names = Seq("minhash_lsh", "ngram_jaccard", "ngram_containment",
      "simhash_pairs", "simhash_partners", "dedup_incremental",
      "dedup_clusters", "dedup_keep", "lsh_recall")
    for (n <- names if SparkEntry.queries.contains(n)) {
      SparkEntry.queries(n)(spark, sf).count() // the one consuming action
      assert(drained(), s"$n left persisted RDDs behind: " +
        spark.sparkContext.getPersistentRDDs.values.map(_.toString))
    }
  }

  test("releaseAll drops persists armed by plan-only builds") {
    import spark.implicits._
    spark.catalog.clearCache()
    assert(drained(), "baseline leak")
    // arm two relations and never run their consumers — the Explain
    // scenario the r12 advice flagged (stale listeners taxing every
    // later action for the life of the session)
    val a = operators.CacheScope.selfReleasing(
      Seq(1, 2, 3).toDF("x").selectExpr("x * 2 AS y"))
    val b = operators.CacheScope.selfReleasing(
      Seq(4, 5).toDF("x").selectExpr("x + 1 AS z"))
    // force the persists to actually hold blocks via the RDD surface
    // (no listener event, so nothing self-releases yet)
    a.queryExecution.toRdd.count()
    b.queryExecution.toRdd.count()
    assert(spark.sparkContext.getPersistentRDDs.size == 2,
      s"expected 2 armed persists: ${spark.sparkContext.getPersistentRDDs}")
    operators.CacheScope.releaseAll()
    assert(drained(), s"releaseAll left persists: " +
      spark.sparkContext.getPersistentRDDs.values.map(_.toString))
    // and an unrelated action after releaseAll must not throw (the
    // armed listeners are unregistered, not just spent)
    assert(Seq(1).toDF("x").count() == 1)
  }

  test("matchingActions = 2 survives the first consumer and releases on the second") {
    import spark.implicits._
    spark.catalog.clearCache()
    operators.CacheScope.releaseAll()
    assert(drained(), "baseline leak")
    val twice = operators.CacheScope.selfReleasing(
      Seq(1, 2, 3).toDF("x").selectExpr("x * 3 AS y"),
      matchingActions = 2)
    twice.count() // matching action #1 — must NOT release
    // the release path is async; give a wrong early release time to land
    Thread.sleep(1000)
    assert(spark.sparkContext.getPersistentRDDs.size == 1,
      "the first matching action must not release a matchingActions=2 persist: " +
        spark.sparkContext.getPersistentRDDs)
    twice.count() // matching action #2 — releases
    assert(drained(), "second matching action failed to release: " +
      spark.sparkContext.getPersistentRDDs.values.map(_.toString))
  }

  test("a stale armed listener retires itself after MaxStaleActions") {
    import spark.implicits._
    spark.catalog.clearCache()
    operators.CacheScope.releaseAll()
    assert(drained(), "baseline leak")
    val stale = operators.CacheScope.selfReleasing(
      Seq(9, 9).toDF("x").selectExpr("x - 1 AS w"))
    stale.queryExecution.toRdd.count() // blocks held, listener armed
    assert(spark.sparkContext.getPersistentRDDs.size == 1)
    // run non-matching Dataset actions past the retirement threshold
    (0 to operators.CacheScope.MaxStaleActions).foreach { i =>
      Seq(i).toDF("x").count()
    }
    assert(drained(), "stale listener never retired its persist: " +
      spark.sparkContext.getPersistentRDDs.values.map(_.toString))
  }
}
