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

  /** Hive-style partitioned layout: one directory per partition value.
    * `format` is any batch file format Spark ships (parquet default; orc
    * for ORC-consuming downstreams — same pruning behavior, asserted for
    * both in TableSinkSpec).
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], format: String = "parquet"): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*)
      .format(format).save(path)

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
    // support both bare and db-qualified names: quote each part, and probe
    // the managed location under <warehouse>[/<db>.db]/<table>
    val parts = table.split('.')
    val quoted = parts.map(p => s"`$p`").mkString(".")
    spark.sql(s"DROP TABLE IF EXISTS $quoted")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val relative = parts match {
      case Array(db, tbl) => s"${db.toLowerCase}.db/${tbl.toLowerCase}"
      case _              => parts.last.toLowerCase
    }
    val loc = new org.apache.hadoop.fs.Path(warehouse, relative)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }
}
