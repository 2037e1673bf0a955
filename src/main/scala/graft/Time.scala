package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: time individual registered queries by name at an arbitrary
  * SF dir, with the same session config and min-of-2 discipline as
  * [[Bench]]. Usage: `runMain graft.Time <sfDir> <query> [query...]`.
  *
  * `runMain graft.Time <sfDir> dsir_stages` instead prints the
  * PER-STAGE receipt for the `pipeline_dsir_pack` composition (r17,
  * VERDICT r16 item 7): each pipeline prefix is timed end-to-end
  * (gate → +repair → +dedup → +DSIR → +tokenizer/pack), so the
  * marginal column attributes the composed row's cost to a stage —
  * the instrument the driver-vs-builder gap on this row lacked.
  * Prefixes RECOMPUTE their upstream (no cross-prefix caching), which
  * is exactly what makes the marginals honest: stage i's marginal is
  * its true incremental cost inside the one-pass plan, not a warm-cache
  * artifact.
  */
object Time {

  private def dsirStageProbe(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators._
    def docs = sources.Tables.load(spark, sfDir, "documents")
    def gate = TextAnalysis.gopherQuality(docs, stopList = Seq("the", "a"))
      .filter(col("keep")).select(col("doc_id"))
    def repaired = TextAnalysis.c4LineFilter(docs.join(gate, Seq("doc_id")),
        minLineWords = 50, requireTerminalPunct = false)
      .filter(col("keep"))
      .select(col("doc_id"), col("clean_text").as("text"))
    def cleaned = repaired.join(docs.select(col("doc_id"), col("lang")),
      Seq("doc_id"))
    def kept = Dedup.keepCanonical(cleaned,
      Dedup.minhashLsh(cleaned).select(col("doc_a"), col("doc_b")))
    def sel = Dsir.dsirSelect(kept, k = 100).select(col("doc_id"))
    def corpus = CacheScope.selfReleasing(
      kept.filter(col("lang") === "en").select(col("doc_id"), col("text"))
        .unionByName(
          kept.select(col("doc_id"), col("text")).join(sel, Seq("doc_id"))),
      matchingActions = 2)
    def packed = Packing.packFromLengths(
      TextAnalysis.bpeTrainedEncode(corpus)
        .select(col("doc_id"), col("n_bpe_tokens").as("len")))
    val stages: Seq[(String, () => Long)] = Seq(
      "gopher_gate" -> (() => gate.count()),
      "+c4_repair" -> (() => repaired.count()),
      "+minhash_dedup" -> (() => kept.count()),
      "+dsir_select" -> (() => sel.count()),
      "+bpe_pack(full)" -> (() => packed.count()))
    var prevMin = 0.0
    println("| prefix | min s | marginal s | rows |")
    println("|---|---|---|---|")
    stages.foreach { case (label, act) =>
      val runs = (1 to 2).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val n = act()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, n)
      }
      val m = runs.map(_._1).min
      println(f"| $label%-16s | $m%7.2f | ${m - prevMin}%7.2f | ${runs.head._2} |")
      prevMin = m
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    if (names.contains("dsir_stages")) {
      dsirStageProbe(spark, sfDir)
      spark.stop()
      return
    }
    for (name <- names; fn <- SparkEntry.queries.get(name)) {
      val times = (1 to 2).map { _ =>
        System.gc() // same pre-run hygiene as Bench
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, n)
      }
      println(f"[time] $name%-24s min=${times.map(_._1).min}%8.2fs " +
        f"runs=${times.map(t => f"${t._1}%.2f").mkString(",")} rows=${times.head._2}")
    }
    spark.stop()
  }
}
