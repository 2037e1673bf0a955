package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.BasketSource
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Every implemented operator from SURVEY.md §2 (plus the §7 phase-2
  * extension surface) registers here as a named query over the driver
  * testdata, with a DuckDB oracle twin in [[oracleSql]] where the operator
  * is SQL-expressible. Column names are aliased identically on both sides
  * (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline computation: P(neighbor | product) over
    * purchase sequences (SURVEY.md §0).
    */
  def entry(spark: SparkSession): DataFrame =
    crystalballPairs(spark, "/root/testdata/sf0.001")

  // ---- helpers ----------------------------------------------------------

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship: pair-shaped crystal ball over lineitem-derived baskets. */
  private def crystalballPairs(spark: SparkSession, dir: String): DataFrame =
    CrystalBall.pairProbabilities(BasketSource.basketsFromLineitem(spark, dir))

  // ---- driver surface ---------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1–O3: basket source (lineitem-derived, FIXTURES.md §2)
    "baskets" -> ((s, dir) =>
      BasketSource.fromLineitem(s, dir).orderBy(col("customer"))),
    // O4/O5 + O7/O12: repeat-terminated co-occurrence window + counts
    "cooccur_counts" -> ((s, dir) =>
      CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
        .orderBy(col("product"), col("neighbor"))),
    // O4 via pure Catalyst composition (posexplode + window + range join):
    // same relation as cooccur_counts, proving SQL-expressibility.
    "cooccur_counts_sql" -> ((s, dir) =>
      CoOccurrence.pairsSql(BasketSource.fromLineitem(s, dir))
        .groupBy(col("product"), col("neighbor")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("product"), col("neighbor"))),
    // O6/O9/O13: flagship relative-frequency normalization (Pairs shape)
    "crystalball_pairs" -> ((s, dir) => crystalballPairs(s, dir)),
    // O8/O14: stripe shape (sorted struct array for deterministic compare)
    "crystalball_stripes" -> ((s, dir) =>
      CrystalBall.stripeProbabilities(
        BasketSource.basketsFromLineitem(s, dir))),
  )

  /** DuckDB oracle twins. Shared SQL prelude for basket derivation mirrors
    * BasketSource.fromLineitem / CoOccurrence exactly (FIXTURES.md §2).
    */
  private val basketsCte =
    """WITH baskets AS (
      |  SELECT CAST(l_orderkey AS VARCHAR) AS customer,
      |         list(CAST(l_partkey AS VARCHAR)
      |              ORDER BY l_linenumber, CAST(l_partkey AS VARCHAR)) AS products
      |  FROM lineitem GROUP BY l_orderkey
      |)""".stripMargin

  private val cooccurCte =
    basketsCte +
      """, exploded AS (
      |  SELECT customer AS bid, unnest(products) AS product,
      |         generate_subscripts(products, 1) AS pos
      |  FROM baskets
      |), currents AS (
      |  SELECT bid, product, pos,
      |         lead(pos) OVER (PARTITION BY bid, product ORDER BY pos) AS next_same
      |  FROM exploded
      |), pairs AS (
      |  SELECT a.product, b.product AS neighbor
      |  FROM currents a JOIN exploded b
      |    ON a.bid = b.bid AND b.pos > a.pos
      |   AND (a.next_same IS NULL OR b.pos < a.next_same)
      |), counts AS (
      |  SELECT product, neighbor, count(*) AS cnt FROM pairs GROUP BY 1, 2
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "baskets" ->
      (basketsCte + "\nSELECT customer, products FROM baskets ORDER BY customer"),
    "cooccur_counts" ->
      (cooccurCte + "\nSELECT product, neighbor, cnt FROM counts ORDER BY product, neighbor"),
    "cooccur_counts_sql" ->
      (cooccurCte + "\nSELECT product, neighbor, cnt FROM counts ORDER BY product, neighbor"),
    "crystalball_pairs" ->
      (cooccurCte +
        """
        |SELECT product, neighbor, cnt,
        |       CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY product) AS DOUBLE) AS prob
        |FROM counts ORDER BY product, neighbor""".stripMargin),
    "crystalball_stripes" ->
      (cooccurCte +
        """, probs AS (
        |  SELECT product, neighbor, cnt,
        |         CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY product) AS DOUBLE) AS prob
        |  FROM counts
        |)
        |SELECT product,
        |       list(struct_pack(neighbor := neighbor, prob := prob) ORDER BY neighbor) AS stripe
        |FROM probs GROUP BY product ORDER BY product""".stripMargin),
  )
}
