package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY r17 optimization probe — stage-level attribution for the
  * expensive rows (deleted before round close). Usage:
  *   runMain graft.ProbeR17 <sfDir> setsim
  */
object ProbeR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = args.drop(1).headOption.getOrElse("setsim")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.sessionBuilder(s"local[$cpus]",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          Bench.scaledShufflePartitions(sfDir, cpus.toInt).toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time(label: String)(act: => Long): Unit = {
      val runs = (1 to 2).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val n = act
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, n)
      }
      println(f"[probe] $label%-28s min=${runs.map(_._1).min}%7.2fs " +
        f"runs=${runs.map(t => f"${t._1}%.2f").mkString(",")} rows=${runs.head._2}")
    }

    if (what == "setsim") {
      val docs = sources.Tables.load(spark, sfDir, "documents")
      val thresholdE6 = 900000L
      def sig = docs.select(col("doc_id"),
        md5(expr("array_join(array_sort(array_distinct(" +
          "regexp_extract_all(lower(text), '[a-z0-9]+', 0))), ' ')"))
          .as("sg"))
      def reps = sig.groupBy(col("sg"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_docs"))
      def tok = docs.join(reps.select(col("rep_id").as("doc_id"),
            col("n_docs")), "doc_id")
          .select(col("doc_id"), col("n_docs"),
            explode(array_distinct(expr(
              "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")))
              .as("token"))
      def dfreq = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
      def ordered = tok.join(dfreq, "token")
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
            .orderBy(col("df"), col("token"))))
        .withColumn("sz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      def prefix = ordered
        .filter(col("pos") <=
          col("sz") - expr(s"($thresholdE6 * sz + 999999) div 1000000") + 1)
        .select(col("doc_id"), col("token"), col("sz"), col("n_docs"))
      def cand = prefix.as("a").join(prefix.as("b"),
          col("a.token") === col("b.token") &&
            col("a.doc_id") < col("b.doc_id") &&
            expr(s"($thresholdE6 * greatest(a.sz, b.sz) + 999999) div 1000000")
              <= least(col("a.sz"), col("b.sz")))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.sz").as("sz_a"), col("b.sz").as("sz_b"),
          col("a.n_docs").as("n_docs_a"), col("b.n_docs").as("n_docs_b"))
        .distinct()
      def inter = cand
        .join(tok.select(col("doc_id").as("doc_a"), col("token")), "doc_a")
        .join(tok.select(col("doc_id").as("doc_b"), col("token")),
          Seq("doc_b", "token"))
        .groupBy(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"),
          col("n_docs_a"), col("n_docs_b"))
        .agg(count(lit(1)).as("n_common"))

      time("1 sig (md5 tokens all docs)") { sig.count() }
      time("2 reps (groupBy sg)") { reps.count() }
      time("3 tok (2nd regexp, reps)") { tok.count() }
      time("4 dfreq") { dfreq.count() }
      time("5 ordered (2 windows)") { ordered.count() }
      time("6 prefix") { prefix.count() }
      time("7 cand (selfjoin+distinct)") { cand.count() }
      time("8 inter (verify joins)") { inter.count() }
      time("9 full setsim_join") {
        operators.Dedup.setsimJoin(docs).count()
      }
    }
    spark.stop()
  }
}
