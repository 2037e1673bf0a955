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
  /** POPULATION STABILITY INDEX drift report — the monitoring metric a
    * data platform computes per feature per refresh: the baseline
    * population's QUARTILE edges (exact, via the window-free ExactRank —
    * never a global ntile window) bin both populations, per-bin shares
    * are add-1-smoothed e6 integers, and each bin's PSI term
    * `(p − q)·ln(p/q)` is e6-floored BEFORE any summation so the total
    * is an order-independent integer sum (the bm25 contract). Terms are
    * non-negative by construction ((p−q) and ln(p/q) share sign), so a
    * drifting bin is visible as a large term, not a cancellation.
    * Populations here: even vs odd doc_id over n_chars — an iid split,
    * so the expected PSI is near zero and any regression in the binning
    * or share math shows as a VALUE.
    *
    * Scale shape: one ExactRank pass over the baseline for the edges
    * (3-value broadcast), one row-local CASE bin per population, two
    * partial-aggregable bin counts densified against a literal 4-row
    * bin relation, and a 4-row result. The fact table is scanned twice
    * (rank + bin) — the rank pass is the price of exact edges.
    */
  def psiDrift(documents: DataFrame): DataFrame = {
    val base = documents.filter(col("doc_id") % 2 === 0)
      .select(col("n_chars").as("x"), col("doc_id"))
    val cur = documents.filter(col("doc_id") % 2 === 1)
      .select(col("n_chars").as("x"))
    val ranked = ExactRank.exactRank(base.withColumn("g", lit(1)),
        Seq("g"), Seq("x", "doc_id"))
      .withColumn("tier", expr("((rnk - 1) * 4) div n_group"))
    val edges = ranked.groupBy()
      .agg(max(when(col("tier") === 0, col("x"))).as("e1"),
        max(when(col("tier") === 1, col("x"))).as("e2"),
        max(when(col("tier") === 2, col("x"))).as("e3"))
    def binned(pop: DataFrame, cntCol: String): DataFrame =
      pop.crossJoin(broadcast(edges))
        .select(when(col("x") <= col("e1"), 0)
          .when(col("x") <= col("e2"), 1)
          .when(col("x") <= col("e3"), 2).otherwise(3).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(cntCol))
    val spark = documents.sparkSession
    val bins = spark.range(4).select(col("id").cast("int").as("bin"))
    val dense = bins
      .join(binned(base, "n_base"), Seq("bin"), "left")
      .join(binned(cur, "n_cur"), Seq("bin"), "left")
      .na.fill(0L, Seq("n_base", "n_cur"))
    val totals = dense.agg(sum(col("n_base")).as("tb"),
      sum(col("n_cur")).as("tc"))
    dense.crossJoin(broadcast(totals))
      .withColumn("p_e6", expr("(n_base + 1) * 1000000 div (tb + 4)"))
      .withColumn("q_e6", expr("(n_cur + 1) * 1000000 div (tc + 4)"))
      .withColumn("term_e6", floor(
        ((col("p_e6") - col("q_e6")).cast("double") / lit(1000000.0)) *
          log(col("p_e6").cast("double") / col("q_e6").cast("double")) *
          lit(1000000.0)).cast("long"))
      .select(col("bin"), col("n_base"), col("n_cur"), col("p_e6"),
        col("q_e6"), col("term_e6"))
      .orderBy(col("bin"))
  }

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
