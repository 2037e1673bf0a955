package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the "what is in this table" first pass every
  * ingestion pipeline runs before trusting a new source (the reference,
  * fed a fixed known input, has no counterpart; SURVEY.md §2.1).
  */
object Profile {

  /** Long-format column profile: one output row per profiled column with
    * row count, null count, EXACT distinct count, and min/max rendered
    * as strings (computed in the column's native type and ordering, cast
    * only for display — so numeric min/max is numeric, not lexical).
    *
    * Scale shape: ONE aggregation pass over the input. Multiple exact
    * count_distinct aggregates plan through Catalyst's Expand (input
    * rows replicate once per distinct-aggregate, then every path is
    * partial-aggregable — one shuffle, no per-column scan). That ×cols
    * row replication is the price of exactness; a very wide table
    * profiles in column chunks, or swaps in approx_count_distinct and
    * keeps everything else — the one-pass shape is unchanged. The
    * pivot to long format happens on the single aggregated row
    * (driver-side width, zero extra jobs).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in schema: ${missing.mkString(",")}")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nonnull"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nonnull`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    wide.select(col("__n"),
        expr(s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n_nonnull, n_distinct, min_value, max_value)"))
      .select(col("column_name"), col("__n").as("n_rows"),
        (col("__n") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
      .orderBy(col("column_name"))
  }
}
