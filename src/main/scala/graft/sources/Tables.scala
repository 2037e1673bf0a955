package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Central testdata reader. The driver's parquet timestamp encoding has
  * varied across data generations: TIMESTAMP(NANOS) (arriving as LongType
  * under `spark.sql.legacy.parquet.nanosAsLong` — the events.ts shape of
  * earlier rounds), TIMESTAMP_NTZ µs (the current generation: every
  * temporal column is `isAdjustedToUTC=false`), and UTC-adjusted
  * TIMESTAMP µs. Every table read funnels through
  * [[normalizeTimestamps]] so the operator surface sees exactly ONE
  * convention — TimestampType. The session timezone is pinned to UTC in
  * every entry point, so the normalized wall-clock values are identical
  * to what DuckDB reads natively from the same files under any of the
  * three encodings, keeping the oracle compare encoding-agnostic.
  */
object Tables {

  /** TIMESTAMP_NTZ columns → TimestampType (identity wall-clock under a
    * UTC session); a LongType `ts` column (the legacy nanos contract —
    * values are µs-aligned across the testdata) → TimestampType.
    *
    * The long-nanos rewrite is SCOPED to the events table (`table` —
    * the only table that has ever shipped the nanos encoding): a future
    * table with a genuine long `ts` (epoch-µs, a counter) must not be
    * silently divided by 1000. Unscoped callers (`table = ""`) get only
    * the NTZ normalization.
    */
  def normalizeTimestamps(df: DataFrame, table: String = ""): DataFrame = {
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    val ntzFixed =
      if (ntz.isEmpty) df
      else df.withColumns(
        ntz.map(f => f.name -> col(f.name).cast(TimestampType)).toMap)
    if (table == "events" && ntzFixed.schema.fields.exists(f =>
        f.name == "ts" && f.dataType == LongType))
      ntzFixed.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else ntzFixed
  }

  /** Read one driver testdata table with normalized timestamps. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTimestamps(spark.read.parquet(s"$dir/$name.parquet"), name)
}
