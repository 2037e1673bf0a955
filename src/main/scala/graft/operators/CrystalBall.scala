package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Basket

/** Relative-frequency normalization — the "crystal ball" (SURVEY.md §2
  * O6/O9/O12/O13): P(neighbor|product) = cnt(product, neighbor) /
  * Σ_x cnt(product, x).
  *
  * The reference needs order inversion (wildcard `(p,*)` keys sorted before
  * real neighbors, `src/CrystalBallPair.java:126-135,215-224`) because a
  * MapReduce reducer sees each key once. In Spark the denominator is simply a
  * window aggregate over the *already-aggregated* pair counts — the window's
  * exchange moves only |distinct pairs| rows, not raw observations, and
  * Catalyst supplies map-side partial aggregation (the reference's in-mapper
  * combining, O7) automatically.
  */
object CrystalBall {

  /** (product, neighbor, cnt) → + prob. One extra exchange on `product`
    * over aggregated data only.
    */
  def normalize(counts: DataFrame): DataFrame =
    counts.withColumn("prob",
      col("cnt") / sum(col("cnt")).over(Window.partitionBy(col("product"))))

  /** Skew-safe alternative to the window: aggregate per-product totals
    * (map-side combined, no sort) and join them back. At 100 TB a hot
    * product makes the window's per-partition sort skew; the totals
    * relation has one row per distinct product — broadcastable when the
    * catalog is small, AQE-skew-handled otherwise. Same arithmetic, same
    * result (tested equal to [[normalize]]).
    */
  def normalizeViaTotalsJoin(counts: DataFrame): DataFrame = {
    val totals = counts.groupBy(col("product"))
      .agg(sum(col("cnt")).as("total"))
    counts.join(totals, "product")
      .withColumn("prob", col("cnt") / col("total"))
      .drop("total")
  }

  /** Pair-shaped flagship result (reference Pairs variant output,
    * `output/CrystalBallPair/part-r-*`): (product, neighbor, cnt, prob),
    * deterministically ordered (string sort, matching the reference's
    * lexicographic `Pair.compareTo`, `src/CrystalBallPair.java:215-224`).
    */
  def pairProbabilities(baskets: Dataset[Basket]): DataFrame =
    normalize(CoOccurrence.counts(baskets))
      .orderBy(col("product"), col("neighbor"))

  /** Stripe-shaped result (reference Stripes/Hybrid variants,
    * `src/CrystalBallStripe.java:101-113`): one row per product, neighbors
    * as a neighbor-sorted array of (neighbor, prob) structs. A sorted array
    * rather than MapType so output comparison is deterministic (the
    * reference's map iteration order is Java HashMap order — SURVEY.md §5).
    */
  def stripeProbabilities(baskets: Dataset[Basket]): DataFrame =
    normalize(CoOccurrence.counts(baskets))
      .groupBy(col("product"))
      .agg(sort_array(collect_list(struct(col("neighbor"), col("prob"))))
        .as("stripe"))
      .orderBy(col("product"))

  /** Map-typed stripes — the engine-native presentation (MapType column),
    * for users who want `stripe['34']` lookups.
    */
  def stripeMap(baskets: Dataset[Basket]): DataFrame =
    normalize(CoOccurrence.counts(baskets))
      .groupBy(col("product"))
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("neighbor"), col("prob")))))
        .as("stripe"))
}
