package graft

import org.apache.spark.sql.SparkSession
import graft.operators.CrystalBall
import graft.sources.{BasketSource, GoldenSink}

/** Drop-in replacement for the reference's three jobs (`run.sh:7-13`):
  * reads the basket text file and writes the Pairs / Stripes / Hybrid
  * outputs in the reference's own formats and file layout, so a user of
  * the original jars can switch by replacing
  *
  *   `hadoop jar CrystalBall<variant>.jar CrystalBall<variant> …`
  *
  * with
  *
  *   `graft.CrystalBallApp <inputPath> <outputDir>`
  *
  * One Spark app produces all three variants (they are the same relation
  * — SURVEY.md §0): pair lines range-partitioned 3-way like the
  * reference's Pairs partitioner, stripe lines for Stripes (3-way) and
  * Hybrid (2-way).
  */
object CrystalBallApp {
  def main(args: Array[String]): Unit = {
    val Array(input, output) = args
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"))
      .appName("crystal-ball")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val baskets = BasketSource.fromText(spark, input)
    val pairs = CrystalBall.pairProbabilities(baskets)
    val stripes = CrystalBall.stripeProbabilities(baskets)
    // range-partition on the product id first (reference file layout),
    // then format — formatting is narrow and keeps the partitioning
    GoldenSink.writeText(
      GoldenSink.pairLines(GoldenSink.rangePartitioned(pairs, 3)),
      s"$output/CrystalBallPair")
    GoldenSink.writeText(
      GoldenSink.stripeLines(GoldenSink.rangePartitioned(stripes, 3)),
      s"$output/CrystalBallStripe")
    GoldenSink.writeText(
      GoldenSink.stripeLines(GoldenSink.rangePartitioned(stripes, 2)),
      s"$output/CrystalBallHybrid")
    spark.stop()
  }
}
