package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB design point (SURVEY.md §7
  * "what's hard": hot products make any single `groupBy`/`join` key
  * partition-bound). AQE handles most runtime skew; these are the explicit
  * forms for when a key's cardinality is pathological enough that even one
  * reducer's share of ONE key doesn't fit.
  */
object Skew {

  /** Salted two-phase aggregation: count in (key, salt) sub-groups, then
    * re-aggregate per key. The salt is derived deterministically from the
    * full row hash, so results are stable across runs; Catalyst's partial
    * aggregation already bounds per-task state — salting additionally
    * bounds the per-key share of any single REDUCER, which matters when
    * one key dominates the dataset.
    */
  def saltedCounts(df: DataFrame, keys: Seq[String], nSalts: Int = 16): DataFrame = {
    // nSalts = 0 would make pmod null out every salt (silent empty result)
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    saltedPartials(df, keys, nSalts)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("cnt"))
  }

  /** First phase of [[saltedCounts]]: per-(key, salt) sub-group counts.
    * Exposed so tests can assert the balance property directly — a hot
    * key's rows must spread across ~nSalts sub-groups, each a bounded
    * share of the key's total.
    */
  private[graft] def saltedPartials(df: DataFrame, keys: Seq[String],
      nSalts: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(nSalts)))
    salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
  }

  /** Skewed equi-join: replicate the SMALL side `nSalts` times and salt
    * the big side's key deterministically, so a hot key's rows spread over
    * `nSalts` tasks instead of one. Semantically identical to
    * `big.join(small, bigKey === smallKey)` for inner joins.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, nSalts: Int = 8): DataFrame = {
    // nSalts = 0 would replicate the small side zero times (empty join)
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val saltedBig = big.withColumn("_salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(nSalts)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until nSalts).map(lit(_)): _*)))
    // dataframe-qualified refs: bigKey/smallKey may share a name
    saltedBig.join(replicated,
        saltedBig("_salt") === replicated("_salt") &&
          saltedBig(bigKey) === replicated(smallKey))
      .drop("_salt")
  }
}
