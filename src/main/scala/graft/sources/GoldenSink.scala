package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference-format text sinks (SURVEY.md §2 O15/O16/O17) and the
  * reference's range-partitioned file layout (O11) — test/compat-only
  * concerns; engine-native output is parquet.
  *
  * Formats (reference `src/CrystalBallPair.java:210-212`,
  * `src/CrystalBallStripe.java:188-201`):
  *   pair line:   `[a, b]\tprob`
  *   stripe line: `a\t{(b, prob), (b2, prob2), }`   (note trailing ", }")
  */
object GoldenSink {

  /** (product, neighbor, …, prob) → `[a, b]\tprob` lines. */
  def pairLines(pairs: DataFrame): DataFrame =
    pairs.select(concat(lit("["), col("product"), lit(", "), col("neighbor"),
      lit("]\t"), col("prob").cast("string")).as("value"))

  /** Stripe rows (product, stripe: array<struct<neighbor,prob>>) →
    * `a\t{(b, p), …, }` lines (deterministic neighbor order — the
    * reference's HashMap order is nondeterministic, so byte-diffing
    * against goldens must compare parsed maps, SURVEY.md §5).
    */
  def stripeLines(stripes: DataFrame): DataFrame =
    stripes.select(concat(col("product"), lit("\t{"),
      array_join(transform(col("stripe"),
        e => concat(lit("("), e.getField("neighbor"), lit(", "),
          e.getField("prob").cast("string"), lit("), "))), ""),
      lit("}")).as("value"))

  /** O16/O17: write text lines, overwriting the target (the reference's
    * `fs.delete` + TextOutputFormat).
    */
  def writeText(lines: DataFrame, path: String): Unit =
    lines.write.mode("overwrite").text(path)

  /** O11: the reference's numeric range partitioning over the product id
    * (Pairs/Stripes: 3 reducers at <30/<60/≥60). `repartitionByRange` with
    * an explicit numeric cast reproduces the file layout; non-numeric ids
    * go to a null-first partition instead of crashing (the reference's
    * `Integer.parseInt` would throw, SURVEY.md §7 phase 1).
    */
  def rangePartitioned(pairs: DataFrame, partitions: Int = 3): DataFrame =
    pairs.repartitionByRange(partitions, col("product").cast("int"))
}
