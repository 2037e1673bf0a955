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
  *
  * SECOND NOTCH: `runMain graft.ScaleAudit x100 [query...]` replicates
  * the x10 corpus ANOTHER 10× (sf1 × 10 ≈ sf10-equivalent — 100× the
  * bench SF) into SPARK_GRAFT_X100_DIR (default /tmp/graft_sf10) with a
  * second disjoint key-shift decade (shift unit 2⁴⁴ / 10⁸ / 10⁷, all
  * strictly above the first decade's ranges), and times x10 vs x100 —
  * the ratio column reads ~10× for a linear operator exactly like the
  * first notch.
  */
object ScaleAudit {

  private val Heads = Seq("cooccur_counts", "crystalball_pairs",
    "dedup_keep", "dedup_clusters", "ngram_jaccard", "page_rank",
    "triangle_count", "assoc_rules", "fpgrowth_rules", "link_rank")

  /** The x100 head set: the 5 most expensive scale-audited operators
    * (VERDICT r10 item 9) + the re-bounded fpgrowth_rules.
    */
  private val X100Heads = Seq("cooccur_counts", "dedup_clusters",
    "page_rank", "assoc_rules", "entity_clusters", "fpgrowth_rules")

  def main(args: Array[String]): Unit = {
    val x100 = args.headOption.contains("x100")
    val rest = if (x100) args.drop(1).toSeq else args.toSeq
    val names =
      if (rest.nonEmpty) rest
      else if (x100) X100Heads
      else Heads
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_X10_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // SPARK_GRAFT_SHUFFLE: at the x100 notch a 32-partition shuffle
      // holds ~4.5 M rows per partition and spills — the partition count
      // must scale with the data (a cluster config, not a plan property);
      // this knob lets the audit PROVE that claim instead of asserting it
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // _SUCCESS, not bare directory existence: a killed prior replication
    // leaves a partial directory that would silently time a truncated
    // replicated corpus
    def missingIn(dir: String)(t: String) =
      !new java.io.File(s"$dir/$t.parquet/_SUCCESS").exists()
    // One replication decade src → dst: 10 shifted replicas per table,
    // each decade's shift units strictly above the previous decade's key
    // ranges so replicas never collide across notches.
    def replicateDecade(srcDir: String, dstDir: String, orderShift: Long,
        docShift: Long, userShift: Long): Unit = {
      val missing = missingIn(dstDir) _
      if (missing("lineitem")) {
        val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
        (0 until 10).map { i =>
          li.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * orderShift))
            .withColumn("l_partkey", col("l_partkey") + lit(i.toLong * orderShift))
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dstDir/lineitem.parquet")
      }
      if (missing("documents")) {
        val docs = spark.read.parquet(s"$srcDir/documents.parquet")
        def rot(i: Int) = { val v = "aeiou"; val k = i % 5; v.drop(k) + v.take(k) }
        (0 until 10).map { i =>
          docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * docShift))
            .withColumn("text", translate(col("text"), "aeiou", rot(i)))
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dstDir/documents.parquet")
      }
      // events: 10× more users, event-time span preserved (replicas are
      // new user populations, not a longer history — state-size growth,
      // which is what stateful/fold operators must survive)
      if (missing("events")) {
        val ev = spark.read.parquet(s"$srcDir/events.parquet")
        (0 until 10).map { i =>
          ev.withColumn("event_id", col("event_id") + lit(i.toLong * orderShift))
            .withColumn("user_id", col("user_id") + lit(i.toLong * userShift))
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dstDir/events.parquet")
      }
      // orders: 10× more customers AND orders (frontier/agg families)
      if (missing("orders")) {
        val ord = spark.read.parquet(s"$srcDir/orders.parquet")
        (0 until 10).map { i =>
          ord.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * orderShift))
            .withColumn("o_custkey", col("o_custkey") + lit(i.toLong * userShift))
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dstDir/orders.parquet")
      }
    }
    val out100Dir = sys.env.getOrElse("SPARK_GRAFT_X100_DIR", "/tmp/graft_sf10")
    replicateDecade(sfDir, outDir,
      orderShift = 1L << 40, docShift = 10000000L, userShift = 1000000L)
    if (x100)
      replicateDecade(outDir, out100Dir,
        orderShift = 1L << 44, docShift = 100000000L, userShift = 10000000L)

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
    val (baseDir, bigDir, baseLbl, bigLbl) =
      if (x100) (outDir, out100Dir, "x10", "x100")
      else (sfDir, outDir, "sf0.1", "x10")
    println(s"| query | $baseLbl | $bigLbl | ratio |")
    println("|---|---|---|---|")
    for (n <- names) {
      val base = time(n, baseDir)
      val big = time(n, bigDir)
      println(f"| `$n` | $base%.2f s | $big%.2f s | ${big / base}%.1f× |")
    }
    spark.stop()
  }
}
