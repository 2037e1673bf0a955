package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Engine-native table sinks for the 100 TB layout story (SURVEY.md §2.1
  * lists partitioned/bucketed tables as absent from the reference; at
  * scale they are how shuffles get designed OUT of the pipeline):
  *
  *  - partitioned parquet → partition pruning: filters on the partition
  *    column never touch non-matching files;
  *  - bucketed tables → co-located joins: two tables bucketed by the same
  *    key into the same bucket count sort-merge-join with NO exchange on
  *    either side (the per-bucket layout replaces the shuffle).
  *
  * Both are asserted at the plan level in TableSinkSpec.
  */
object TableSink {

  /** Hive-style partitioned parquet: one directory per partition value. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted table (requires the session catalog — bucket
    * metadata lives in the metastore). `nBuckets` must match across
    * tables intended for co-located joins.
    *
    * A fresh in-memory catalog doesn't know about managed-table
    * directories a previous session left in the warehouse, and refuses to
    * create over them (LOCATION_ALREADY_EXISTS) — drop both the catalog
    * entry and any orphaned location first.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }
}
