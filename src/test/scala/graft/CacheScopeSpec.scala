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
}
