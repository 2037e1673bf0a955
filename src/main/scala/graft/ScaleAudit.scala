package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: the NEXT-DECADE scaling audit (sf0.1 × 10 ≈ sf1
  * equivalent) for the co-occurrence + dedup + graph head queries.
  *
  * Replication is shape-honest, not a byte copy: replica i shifts
  * l_orderkey / l_partkey / doc_id into a disjoint key range (10× more
  * baskets AND 10× more products/graph nodes — growth adds new
  * entities, it does not just reweight old ones) and rewrites document
  * vowels by a per-replica rotation (so replicas are independent
  * corpora to the shingle/minhash family, not an artificial 10-way
  * exact-dup megacluster; replicas i and i+5 share a rotation, which
  * contributes one exact-dup partner per doc — a realistic, LINEAR
  * near-dup load).
  *
  * Inputs are MATERIALIZED as parquet so the audited plans run the same
  * scan→shuffle path as the bench, then each named query is timed with
  * Bench's min-of-2 + GC discipline at sf0.1 and at the replicated dir.
  * Usage: `runMain graft.ScaleAudit [query...]` (default: the head set).
  */
object ScaleAudit {

  private val Heads = Seq("cooccur_counts", "crystalball_pairs",
    "dedup_keep", "dedup_clusters", "ngram_jaccard", "page_rank",
    "triangle_count", "assoc_rules", "fpgrowth_rules", "link_rank")

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Heads
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_X10_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // _SUCCESS, not bare directory existence: a killed prior replication
    // leaves a partial directory that would silently time a truncated
    // "x10" corpus
    def missing(t: String) =
      !new java.io.File(s"$outDir/$t.parquet/_SUCCESS").exists()
    if (missing("lineitem")) {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      (0 until 10).map { i =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * (1L << 40)))
          .withColumn("l_partkey", col("l_partkey") + lit(i.toLong * (1L << 40)))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    }
    if (missing("documents")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      def rot(i: Int) = { val v = "aeiou"; val k = i % 5; v.drop(k) + v.take(k) }
      (0 until 10).map { i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
          .withColumn("text", translate(col("text"), "aeiou", rot(i)))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    }
    // events: 10× more users, event-time span preserved (replicas are
    // new user populations, not a longer history — state-size growth,
    // which is what stateful/fold operators must survive)
    if (missing("events")) {
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      (0 until 10).map { i =>
        ev.withColumn("event_id", col("event_id") + lit(i.toLong * (1L << 40)))
          .withColumn("user_id", col("user_id") + lit(i.toLong * 1000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }
    // orders: 10× more customers AND orders (frontier/agg families)
    if (missing("orders")) {
      val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      (0 until 10).map { i =>
        ord.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * (1L << 40)))
          .withColumn("o_custkey", col("o_custkey") + lit(i.toLong * 1000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    }

    def time(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      val runs = (1 to 2).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      runs.min
    }
    println("| query | sf0.1 | x10 | ratio |")
    println("|---|---|---|---|")
    for (n <- names) {
      val base = time(n, sfDir)
      val x10 = time(n, outDir)
      println(f"| `$n` | $base%.2f s | $x10%.2f s | ${x10 / base}%.1f× |")
    }
    spark.stop()
  }
}
