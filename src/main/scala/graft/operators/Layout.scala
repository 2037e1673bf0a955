package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — multi-dimensional data layout
  * for scan pruning (public technique: Morton 1966; productized in
  * Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * The 100 TB problem this solves: parquet min/max skipping prunes on
  * the SORT column only. A table range-partitioned by `l_partkey` answers
  * partkey predicates with O(selectivity) files read, but a
  * `l_suppkey` predicate still scans everything — each file's suppkey
  * min/max spans the whole domain. Interleaving the bits of BOTH
  * dimensions into one sort key bounds every file's bounding BOX in
  * (partkey, suppkey) space: the top 2k bits of the z-key pin k bits
  * of EACH dimension, so files sorted by z-key have per-file spans of
  * domain/2^k in both dimensions at once, and either predicate prunes.
  *
  * The interleave is pure bit algebra — an unrolled
  * `sum_i ((x>>i & 1) << 2i) + ((y>>i & 1) << (2i+1))` expression built
  * once as a SQL string shared structurally with the DuckDB oracle
  * (`shiftleft/shiftright` spellings on Spark, `<<`/`>>` on DuckDB),
  * so the key values are bit-identical on both engines. Whole-stage
  * codegen folds the 32 terms into straight-line long arithmetic; no
  * UDF, no shuffle beyond the final presentation sort.
  *
  * [[zorderStats]] makes the layout win measurable AS DATA: bucket rows
  * by the top bits of their z-key (what a z-sorted writer would put in
  * one file) and report each bucket's per-dimension span — the file-
  * level bounding boxes a scan planner would prune against. The spec
  * asserts the quantitative claim: z-bucket suppkey spans are bounded
  * by the sub-box size while a partkey-only sort leaves them at
  * domain size.
  */
object Layout {

  /** Bits per dimension interleaved into the z-key. Inputs are first
    * min/max-scaled into the 2^ZBits grid (one 1-row bounds aggregate,
    * broadcast — the house bounded crossJoin), so the interleave is
    * domain-independent: raw keys that occupy only the low bits of a
    * fixed-width domain would otherwise collapse every row into
    * z-bucket 0 and the bounding-box demonstration would be vacuous.
    */
  val ZBits = 16

  /** The unrolled Morton interleave over `x`/`y` (column names), using
    * `shiftleft(a, n)` / `shiftright(a, n)` function spellings that
    * Spark parses; the oracle builds the same term list with operator
    * spellings. Terms address disjoint bits, so `+` is exact.
    */
  private[graft] def mortonExprSpark(x: String, y: String): String =
    (0 until ZBits).flatMap { i =>
      Seq(
        s"shiftleft(shiftright($x, $i) & 1, ${2 * i})",
        s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1})")
    }.mkString(" + ")

  /** The DuckDB spelling of the same term list (shared structure). */
  def mortonExprSql(x: String, y: String): String =
    (0 until ZBits).flatMap { i =>
      Seq(
        s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** Per-z-bucket layout statistics: bucket = top `topBits` bit-pairs of
    * the z-key (i.e. `zkey >> (2·ZBits − 2·topBits)`), each bucket's row
    * count and per-dimension min/max span. With `topBits = 5`, each
    * bucket pins the top 5 bits of BOTH dimensions: spans are bounded
    * by 2^(ZBits−5) = 2048 in each dimension — the pruning guarantee.
    *
    * Plan: one projection (the codegen'd interleave) + one
    * partial-aggregable groupBy on a ≤ 4^topBits-key space. No window,
    * no per-row state; scales as a single pass.
    */
  def zorderStats(lineitem: DataFrame, topBits: Int = 5): DataFrame = {
    val keys = lineitem.select(
      col("l_partkey").cast("long").as("p"),
      col("l_suppkey").cast("long").as("s"))
    val bounds = keys.agg(
      min(col("p")).as("minp"), max(col("p")).as("maxp"),
      min(col("s")).as("mins"), max(col("s")).as("maxs"))
    // min/max scaling into the 2^ZBits grid: exact long arithmetic,
    // floor integer division (both operands non-negative) — identical
    // `div`/`//` semantics on the two engines
    val grid = 1L << ZBits
    val masked = keys.crossJoin(broadcast(bounds)).select(
      expr(s"((p - minp) * $grid) div (maxp - minp + 1)").as("x"),
      expr(s"((s - mins) * $grid) div (maxs - mins + 1)").as("y"))
    val zkey = expr(mortonExprSpark("x", "y"))
    masked
      .select(col("x"), col("y"),
        shiftright(zkey, 2 * ZBits - 2 * topBits).as("zbucket"))
      .groupBy(col("zbucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        (max(col("x")) - min(col("x"))).as("span_part"),
        (max(col("y")) - min(col("y"))).as("span_supp"))
      .orderBy(col("zbucket"))
  }
}
