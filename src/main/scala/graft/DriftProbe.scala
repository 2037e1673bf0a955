package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r14 drift-attribution instrument (VERDICT r13 item 1): measure the
  * per-plan cost of the two always-on r13 additions every bench query
  * pays, so their contribution to the fleet-wide s/q drift can be ruled
  * in or out ARITHMETICALLY instead of by full-bench A/B alone:
  *
  *  1. [[graft.optimizer.RewriteVectorFolds]] — one extra optimizer
  *     rule; its cost is a transform walk over every optimized plan.
  *     Measured: optimize a representative mid-size plan N times with
  *     the rule installed vs not, report the per-plan delta.
  *  2. [[graft.operators.CacheScope]] armed listeners — each taxes every
  *     Dataset action completion with one `analyzed.exists(sameResult)`
  *     walk. Measured: the walk itself on the same plan, per call.
  *
  * Usage: `sbt "runMain graft.DriftProbe <sfDir>"`. Prints one JSON line
  * per measurement; results land in BENCH_NOTES with the full-bench
  * SPARK_GRAFT_NO_SELF_RELEASE / SPARK_GRAFT_NO_FOLD_REWRITE A/B.
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.sessionBuilder("local[8]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // a representative multi-join/agg/window plan (no vector folds, so
    // the rule MATCHES NOTHING and we time its pure walk overhead —
    // the cost every non-vector query pays)
    def buildPlan() = {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("c_nationkey")).orderBy(col("q").desc)))
        .filter(col("rk") <= 3)
    }

    def timeOptimize(n: Int): Double = {
      var i = 0
      val t0 = System.nanoTime()
      while (i < n) {
        // fresh DataFrame each round: optimizedPlan is lazy-cached per QE
        buildPlan().queryExecution.optimizedPlan
        i += 1
      }
      (System.nanoTime() - t0) / 1e6 / n // ms per optimize
    }

    // warm-up, then paired measurement: rule OUT then IN then OUT again
    // (JIT drift shows up as out1 != out2)
    timeOptimize(20)
    val rule = graft.optimizer.RewriteVectorFolds
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == rule)
    val out1 = timeOptimize(50)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    val in1 = timeOptimize(50)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == rule)
    val out2 = timeOptimize(50)
    println(f"""{"probe":"fold_rule_walk","ms_per_plan_without":${math.min(out1, out2)}%.3f,"ms_per_plan_with":$in1%.3f,"delta_ms":${in1 - math.min(out1, out2)}%.3f}""")

    // the armed-listener walk: one sameResult containment scan of an
    // analyzed plan per Dataset action per armed listener
    val qe = buildPlan().queryExecution
    val analyzed = qe.analyzed
    val marker = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .queryExecution.analyzed // a marker that DOES occur in the tree
    val missMarker = spark.read.parquet(s"$sfDir/part.parquet")
      .queryExecution.analyzed // and one that doesn't (worst case: full walk)
    def timeWalk(m: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: Int): Double = {
      var i = 0
      var hits = 0
      val t0 = System.nanoTime()
      while (i < n) { if (analyzed.exists(_.sameResult(m))) hits += 1; i += 1 }
      val ms = (System.nanoTime() - t0) / 1e6 / n
      ms
    }
    timeWalk(missMarker, 200) // warm
    val hitMs = timeWalk(marker, 2000)
    val missMs = timeWalk(missMarker, 2000)
    println(f"""{"probe":"listener_sameresult_walk","ms_per_action_hit":$hitMs%.4f,"ms_per_action_miss_fullwalk":$missMs%.4f}""")
    spark.stop()
  }
}
