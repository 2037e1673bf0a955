package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual registered queries by name at an arbitrary
  * SF dir, with the same session config and min-of-2 discipline as
  * [[Bench]]. Usage: `runMain graft.Time <sfDir> <query> [query...]`.
  */
object Time {
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
