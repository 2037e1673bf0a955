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

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; with `spark.sql.legacy.parquet.nanosAsLong=true` it
    * arrives as LongType nanos. All values are µs-aligned (ns %% 1000 == 0
    * across the testdata), so the conversion is lossless and matches the
    * µs timestamps DuckDB reads natively.
    */
  private def eventsTable(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }

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
    // ---- relational breadth (SURVEY.md §2.1 — absent from the reference) --
    "q1_pricing" -> ((s, dir) => Relational.pricingSummary(t(s, dir, "lineitem"))),
    "q3_topk" -> ((s, dir) => Relational.revenueTopK(
      t(s, dir, "customer"), t(s, dir, "orders"), t(s, dir, "lineitem"))),
    "join_bcast_region" -> ((s, dir) => Relational.customersPerRegion(
      t(s, dir, "customer"), t(s, dir, "nation"), t(s, dir, "region"))),
    "semi_join" -> ((s, dir) => Relational.customersWithOrders(
      t(s, dir, "customer"), t(s, dir, "orders"))),
    "anti_join" -> ((s, dir) => Relational.customersWithoutOrders(
      t(s, dir, "customer"), t(s, dir, "orders"))),
    "rollup_agg" -> ((s, dir) => Relational.rollupSummary(t(s, dir, "lineitem"))),
    "cube_agg" -> ((s, dir) => Relational.cubeSummary(t(s, dir, "orders"))),
    "distinct_agg" -> ((s, dir) => Relational.distinctCounts(t(s, dir, "lineitem"))),
    "set_ops" -> ((s, dir) => Relational.setOps(
      t(s, dir, "customer"), t(s, dir, "orders"))),
    "topk_orders" -> ((s, dir) => Relational.topOrders(t(s, dir, "orders"))),
    "scalar_funcs" -> ((s, dir) => Relational.scalarFunctions(t(s, dir, "part"))),
    // ---- analytic windows + sessionization over events ------------------
    "window_rank" -> ((s, dir) => Events.userWindows(eventsTable(s, dir))),
    "sessionize" -> ((s, dir) => Events.sessionize(eventsTable(s, dir))),
    "hourly_counts" -> ((s, dir) => Events.hourlyCounts(eventsTable(s, dir))),
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
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS count_order,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "join_bcast_region" ->
      """SELECT r_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "rollup_agg" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |  coalesce(l_linestatus, '(all)') AS linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "cube_agg" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS orderstatus,
        |  coalesce(o_orderpriority, '(all)') AS orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY orderstatus, orderpriority""".stripMargin,
    "distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "set_ops" ->
      """WITH ordered AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
        |rich AS (SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT custkey, 'both' AS tag
        |FROM (SELECT custkey FROM ordered INTERSECT SELECT custkey FROM rich)
        |UNION ALL
        |SELECT custkey, 'rich_no_orders' AS tag
        |FROM (SELECT custkey FROM rich EXCEPT SELECT custkey FROM ordered)
        |ORDER BY tag, custkey""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin,
    "scalar_funcs" ->
      """SELECT p_partkey, upper(p_name) AS name_upper,
        |  length(p_name) AS name_len,
        |  substr(p_brand, 1, 5) AS brand_prefix,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  abs(p_size - 25) AS size_dist,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  p_size % 7 AS size_mod,
        |  CASE WHEN p_size >= 25 THEN 'big' ELSE 'small' END AS size_class
        |FROM part ORDER BY p_partkey""".stripMargin,
    "window_rank" ->
      """SELECT event_id, user_id, event_type, value,
        |  row_number() OVER w AS rn,
        |  rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(event_type, 1) OVER w AS next_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
        |         lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events
        |), s AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM g
        |), sid AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM s
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end,
        |  CAST((max(us) - min(us)) / 1000000 AS DOUBLE) AS duration_sec,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sid GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "hourly_counts" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
  )
}
