package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational breadth surface (SURVEY.md §2.1 / §7 phase 2): the operator
  * categories the reference lacks entirely — joins (broadcast / sort-merge /
  * semi / anti), grouped + grouping-set aggregation, distinct aggregation,
  * set operations, top-k, scalar function projection. All pure Catalyst
  * built-ins: predicate pushdown, column pruning, partial aggregation and
  * join-strategy selection (incl. AQE) come for free.
  *
  * Float-parity discipline for the DuckDB oracle: every `sum` over monetary
  * doubles goes through DECIMAL(18,2) (exact, order-independent — Spark's
  * partial-aggregation order is nondeterministic) and is only cast to
  * DOUBLE at the end, so both engines divide/compare identical IEEE
  * operands.
  */
object Relational {

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** TPC-H Q1-shaped pricing summary: single-shuffle grouped aggregation
    * with map-side combine; the shipdate filter is pushed to the parquet
    * scan. At 100 TB: 4-6 groups — the classic low-cardinality agg, shuffle
    * volume is O(partitions × groups).
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("count_order"),
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("sum_disc_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-shaped join + top-k: customer is the small side — at any
    * scale customer ≪ lineitem, so we broadcast it explicitly; orders ⋈
    * lineitem is the big sort-merge/shuffled-hash join on the order key.
    * Top-k is a global `orderBy + limit` → Spark plans TakeOrderedAndProject
    * (per-partition heaps, no full sort).
    */
  def revenueTopK(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      k: Int = 10): DataFrame =
    lineitem
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      .join(orders.filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(k)

  /** Star-schema rollup through two broadcast dimension joins:
    * customer ⋈ nation ⋈ region. nation/region are tiny at every scale —
    * broadcast both; zero shuffles besides the final aggregation.
    */
  def customersPerRegion(customer: DataFrame, nation: DataFrame,
      region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(dec("c_acctbal")).cast("double").as("sum_acctbal"))
      .orderBy(col("r_name"))

  /** Left-semi join: customers that have at least one order (EXISTS). */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Left-anti join: customers with no orders (NOT EXISTS). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** ROLLUP over (returnflag, linestatus). Grouping-set null markers are
    * coalesced to a sentinel so ordering semantics (NULLS FIRST vs LAST)
    * can't differ between engines.
    */
  def rollupSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec("l_quantity")).cast("double").as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** CUBE over (orderstatus, orderpriority) on orders. */
  def cubeSummary(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(dec("o_totalprice")).cast("double").as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("orderpriority"),
        col("n"), col("sum_price"))
      .orderBy(col("orderstatus"), col("orderpriority"))

  /** Distinct aggregation: Catalyst plans the expand + two-phase agg. */
  def distinctCounts(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Set operations in one relation: INTERSECT / EXCEPT / UNION branches
    * tagged and unioned. Spark plans these as semi/anti aggregate joins.
    */
  def setOps(customer: DataFrame, orders: DataFrame): DataFrame = {
    val ordered = orders.select(col("o_custkey").as("custkey")).distinct()
    val rich = customer.filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("custkey")).distinct()
    val i = ordered.intersect(rich).withColumn("tag", lit("both"))
    val e = rich.except(ordered).withColumn("tag", lit("rich_no_orders"))
    i.union(e).orderBy(col("tag"), col("custkey"))
  }

  /** Multiset set operations (INTERSECT ALL / EXCEPT ALL): bag semantics
    * over order priorities in two date ranges — Spark plans these as
    * count-tracking aggregate joins.
    */
  def setOpsAll(orders: DataFrame): DataFrame = {
    val split = lit("1996-01-01").cast("timestamp")
    val early = orders.filter(col("o_orderdate") < split)
      .select(col("o_orderpriority").as("priority"))
    val late = orders.filter(col("o_orderdate") >= split)
      .select(col("o_orderpriority").as("priority"))
    val i = early.intersectAll(late).groupBy(col("priority"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    val e = early.exceptAll(late).groupBy(col("priority"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    i.union(e).orderBy(col("op"), col("priority"))
  }

  /** Explicit GROUPING SETS (the grouping-set form rollup/cube can't
    * express: two independent single-column groupings in one pass) with
    * grouping_id disambiguation — via the native Dataset API (no temp
    * view, no session-catalog side effects).
    */
  def groupingSets(lineitem: DataFrame): DataFrame =
    lineitem
      .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id(col("l_returnflag"), col("l_linestatus"))
          .cast("long").as("gid"),
        count(lit(1)).as("n"),
        sum(dec("l_quantity")).cast("double").as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("gid"), col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** Global top-k via TakeOrderedAndProject (no full sort at scale). */
  def topOrders(orders: DataFrame, k: Int = 15): DataFrame =
    orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)

  /** TPC-H Q5-shaped 6-way join: local-supplier revenue by nation. The
    * join graph mixes two broadcastable dimensions (nation, region), a
    * mid-size dimension (supplier — broadcast at test scale, shuffled at
    * 100 TB where AQE decides), and the orders⋈lineitem fact-fact join.
    * Grouped by name for a deterministic ordering (revenue ties can't
    * reorder output).
    */
  def localSupplierRevenue(region: DataFrame, nation: DataFrame,
      customer: DataFrame, supplier: DataFrame, orders: DataFrame,
      lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_lineitems"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("revenue"))
      .orderBy(col("n_name"))

  /** Left outer join + aggregation: per-customer order stats where
    * customers without orders keep a zero row (count(col) ignores nulls;
    * the sum coalesces). Shuffle on the customer key only.
    */
  def customerOrderStats(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec("o_totalprice")).cast("double"), lit(0).cast("double"))
          .as("total_spent"))
      .orderBy(col("c_custkey"))

  /** Full outer join: presence flags for customers ordering before vs
    * after a date split — exercises null-producing sides on both ends.
    */
  def orderPresence(orders: DataFrame): DataFrame = {
    val split = lit("1996-01-01").cast("timestamp")
    val early = orders.filter(col("o_orderdate") < split)
      .select(col("o_custkey").as("k_early")).distinct()
    val late = orders.filter(col("o_orderdate") >= split)
      .select(col("o_custkey").as("k_late")).distinct()
    early.join(late, col("k_early") === col("k_late"), "full_outer")
      .select(coalesce(col("k_early"), col("k_late")).as("custkey"),
        when(col("k_early").isNull, 0).otherwise(1).as("early"),
        when(col("k_late").isNull, 0).otherwise(1).as("late"))
      .orderBy(col("custkey"))
  }

  /** Orders strictly above their customer's average price. Expressed with
    * window aggregates here and a grouped-subquery join in the oracle —
    * different plans, same relation. The comparison is decimal-exact
    * (price·n > total) so no float average can diverge between engines.
    */
  def aboveAvgOrders(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    orders
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("total", sum(dec("o_totalprice")).over(w))
      .filter(dec("o_totalprice") * col("n") > col("total"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  val OrderPriorities: Seq[String] =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** Pivot: order counts by priority, one column per priority value
    * (explicit value list keeps the schema static; absent combinations
    * are zero-filled to match the oracle's sum(CASE ...)).
    */
  def priorityPivot(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", OrderPriorities)
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderstatus"))

  /** Unpivot (melt): the wide per-status priority counts back to long
    * (status, priority, n) rows — the inverse of [[priorityPivot]] and
    * the standard wide→long reshape. Uses Spark's native `unpivot`
    * operator; n stays a count (never null) because the pivot filled
    * absent combinations with 0.
    */
  def priorityUnpivot(orders: DataFrame): DataFrame =
    priorityPivot(orders)
      .unpivot(Array(col("o_orderstatus")),
        OrderPriorities.map(col).toArray, "priority", "n")
      .orderBy(col("o_orderstatus"), col("priority"))

  /** Higher-order array-function breadth over the basket relation:
    * slice, sort, element membership (exists), predicate-over-all
    * (forall), flatten-free distinct count, and a fold (aggregate) —
    * each codegen-free lambda evaluated per row, no shuffle beyond the
    * basket build.
    */
  def arrayFunctions(baskets: DataFrame): DataFrame =
    baskets.select(
        col("customer"),
        size(col("products")).cast("long").as("n_products"),
        array_join(slice(col("products"), 1, 3), " ").as("first3"),
        array_join(array_sort(col("products")), " ").as("sorted_products"),
        size(array_distinct(col("products"))).cast("long").as("n_distinct"),
        exists(col("products"), p => p === "34").as("has_34"),
        forall(col("products"), p => p.rlike("^[0-9]+$")).as("all_numeric"),
        aggregate(col("products"), lit(0L),
          (acc, p) => acc + length(p)).as("total_chars"))
      .orderBy(col("customer"))

  /** Date/time function breadth over orders (year/month/day/dow,
    * truncation, arithmetic) — engine-portable variants only (day-of-week
    * aligned to Spark's 1=Sunday convention on both sides).
    */
  def dateFunctions(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("d"),
      dayofweek(col("o_orderdate")).as("dow"),
      quarter(col("o_orderdate")).as("q"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      last_day(col("o_orderdate")).as("month_end"),
      date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
      datediff(lit("1999-01-01").cast("date"), col("o_orderdate").cast("date"))
        .as("days_to_1999"))
      .orderBy(col("o_orderkey"))

  /** Exact per-group median (lower median: the row at rank ⌊(n+1)/2⌋ under
    * a fully deterministic ordering) — the deterministic complement of
    * percentile_approx in `approx_stats`.
    *
    * l_returnflag has THREE distinct values, so a
    * `row_number over Window.partitionBy(l_returnflag)` would sort the
    * entire table in 3 tasks at any cluster size. Instead this uses the
    * [[ExactRank]] range-partitioned counter+offset shape: range-partition
    * on (flag, quantity, orderkey, linenumber) — which spreads each flag's
    * rows across MANY contiguous partitions — then exact ranks fall out of
    * partition-local counters plus per-(partition, flag) offsets from a
    * bounded driver pass. Full parallelism on a 3-value key; (orderkey,
    * linenumber) uniqueness makes the total order (and thus the picked
    * median row) deterministic.
    *
    * Eager like [[Sampling.stratifiedSample]]: the offset pass runs at
    * call time (bounded collect — one row per partition × flag).
    */
  def exactMedian(lineitem: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    // lower median = the rank-⌊(n+1)/2⌋ = ⌈n/2⌉ element — exactly the
    // 50th percentile under exactQuantiles' ceil(q·n/100) rank rule
    rankedQuantityByFlag(lineitem)
      .flatMap { case ((flag, qty, _, _), rn, n) =>
        if (rn == (n + 1L) / 2L) Iterator.single((flag, qty, n))
        else Iterator.empty
      }
      .toDF("l_returnflag", "median_qty", "n_rows")
      .orderBy(col("l_returnflag"))
  }

  /** Shared ranked scaffolding for the exact order statistics: cast,
    * range-partition and sort lineitem on (flag, quantity, tie-breakers),
    * then annotate each row with its exact in-flag rank and flag total via
    * [[ExactRank]] (eager bounded offset pass — see caller scaladocs).
    */
  private def rankedQuantityByFlag(lineitem: DataFrame)
      : org.apache.spark.rdd.RDD[((String, Double, Long, Long), Long, Long)] = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    val sorted = lineitem
      .select(col("l_returnflag").cast("string"), col("l_quantity").cast("double"),
        col("l_orderkey").cast("long"), col("l_linenumber").cast("long"))
      .repartitionByRange(col("l_returnflag"), col("l_quantity"),
        col("l_orderkey"), col("l_linenumber"))
      .sortWithinPartitions(col("l_returnflag"), col("l_quantity"),
        col("l_orderkey"), col("l_linenumber"))
      .as[(String, Double, Long, Long)]
    ExactRank.rankWithinGroups(sorted.rdd, (t: (String, Double, Long, Long)) => t._1)
  }

  /** Exact per-group quantiles — discrete (lower-rank) semantics: the
    * element at rank ⌈q·n/100⌉ — for a whole percentile set in ONE ranked
    * pass, the [[ExactRank]] generalization of [[exactMedian]]. Same
    * scale posture: range-partitioning on (group, value, tie-breakers)
    * keeps full parallelism on the 3-value returnflag key where a per-key
    * window would be a 3-task ceiling at any scale; the percentile set
    * only changes the rank targets each row is checked against, so p25
    * through p95 cost exactly one extra comparison each, not extra passes.
    * Eager like [[exactMedian]]: the offset pass runs at call time
    * (bounded collect — one row per partition × flag).
    */
  def exactQuantiles(lineitem: DataFrame,
      percentiles: Seq[Int] = Seq(25, 50, 75, 95)): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    val ps = percentiles.distinct.sorted
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100]: $percentiles")
    rankedQuantityByFlag(lineitem)
      .flatMap { case ((flag, qty, _, _), rn, n) =>
        ps.iterator
          .filter(p => rn == math.max(1L, (n * p + 99L) / 100L))
          .map(p => (flag, p, qty, n))
      }
      .toDF("l_returnflag", "q_pct", "qty", "n_rows")
      .orderBy(col("l_returnflag"), col("q_pct"))
  }

  /** Fixed-width value histogram over events: integer bucketing keeps the
    * group key exact on both engines.
    */
  def valueHistogram(events: DataFrame, width: Double = 50.0): DataFrame =
    events
      .groupBy(floor(col("value") / width).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("bucket"))

  /** Ordered string aggregation (SQL LISTAGG / string_agg): per nation,
    * the comma-joined sorted names of its high-balance suppliers.
    *
    * collect_list gathers a group's rows into one aggregation buffer, so
    * LISTAGG is only scale-sane when the GROUP is bounded — here by the
    * selective balance predicate (pushed to the parquet scan). For
    * unbounded groups the right shape is a pre-ranked top-N
    * (WindowGroupLimit, see lateral_topk) feeding the aggregation, not a
    * raw corpus-wide collect. array_sort before concat makes the joined
    * string deterministic regardless of arrival order.
    */
  def stringAgg(supplier: DataFrame, nation: DataFrame,
      minBalance: Double = 9000.0): DataFrame =
    supplier.filter(col("s_acctbal") > minBalance)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        concat_ws(",", array_sort(collect_list(col("s_name")))).as("supplier_names"))
      .orderBy(col("n_name"))

  /** Exact per-group Pearson correlation + covariance between quantity
    * and extended price, from ONE partial-aggregable pass.
    *
    * Spark's built-in `corr`/`covar_pop` accumulate DOUBLES in partial
    * aggregation order — nondeterministic across runs and never
    * hash-comparable with another engine. This formulation instead
    * aggregates the five EXACT integer power sums (Σq, Σp, Σq², Σp²,
    * Σqp) over cent-scaled longs, then evaluates the closed-form
    * correlation in a fixed double operand order — deterministic,
    * oracle-matching, and still a single map-side-combined groupBy (the
    * moment-sketch shape: merging partial sums is associative, so the
    * 100 TB plan is scan → partial agg → 3-row final agg).
    *
    * Sums are carried in DECIMAL(38,0): Σp² at cent scale is ~1.1e14 per
    * row, so a LONG sum wraps past ~84k rows per group while decimal
    * holds exact to ~1e24 rows — the same overflow posture as PageRank's
    * damping term. corr is scale-invariant so the e2 factor cancels;
    * cov divides it back out explicitly.
    */
  def corrStats(lineitem: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val agg = lineitem
      .select(col("l_returnflag"),
        round(col("l_quantity")).cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("p"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("q").cast(d38)).as("sq"),
        sum(col("p").cast(d38)).as("sp"),
        sum((col("q") * col("q")).cast(d38)).as("sqq"),
        sum((col("p") * col("p")).cast(d38)).as("spp"),
        sum((col("q") * col("p")).cast(d38)).as("sqp"))
    val nd = col("n_rows").cast("double")
    val (sq, sp, sqq, spp, sqp) = (col("sq").cast("double"),
      col("sp").cast("double"), col("sqq").cast("double"),
      col("spp").cast("double"), col("sqp").cast("double"))
    val covNum = nd * sqp - sq * sp
    agg.select(col("l_returnflag"), col("n_rows"),
        (sq / nd).as("mean_qty"),
        (sp / nd / lit(100.0)).as("mean_price"),
        (covNum / (nd * nd) / lit(100.0)).as("cov_qty_price"),
        (covNum / (sqrt(nd * sqq - sq * sq) * sqrt(nd * spp - sp * sp)))
          .as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  /** GOLDEN-RECORD survivorship — the MDM step after entity resolution
    * clusters duplicate records: per entity, field-level survivors by
    * explicit deterministic rules rather than keep-first —
    *  - identity fields (custkey, name, nation) come from the RICHEST
    *    member (max balance, ties to the smallest key): one
    *    `max(struct(cents, −custkey, …))` argmax;
    *  - the balance is the FIELD-LEVEL max across members;
    *  - the segment is the cluster MODE (ties to the smallest value):
    *    the communities_lpa `min(struct(−cnt, v))` argmin over a
    *    (entity, segment) count.
    * Entities are synthesized deterministically (custkey div 3 — every
    * three customers one entity with conflicting fields), the messyUrls
    * discipline: the oracle replays the same synthesis, so the gate
    * checks real survivorship arithmetic.
    *
    * Scale shape: two partial-aggregable aggregates (member argmax;
    * segment mode via a nested groupBy) joined on the entity key — no
    * window, megacluster-safe (a million-member entity collapses
    * map-side in both paths).
    */
  def goldenRecord(customer: DataFrame): DataFrame = {
    val cents =
      expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)")
    val base = customer.select(
      expr("c_custkey div 3").as("entity_id"),
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_mktsegment"), cents.as("cents"))
    val rich = base.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("cents"), (-col("c_custkey")).as("nk"),
          col("c_name").as("name"),
          col("c_nationkey").as("nation"))).as("r"),
        max(col("cents")).as("max_cents"))
      .select(col("entity_id"), col("n_members"),
        (-col("r.nk")).as("golden_custkey"),
        col("r.name").as("golden_name"),
        col("r.nation").as("golden_nation"),
        (col("max_cents").cast("double") / lit(100.0)).as("golden_acctbal"))
    val mode = base.groupBy(col("entity_id"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("entity_id"))
      .agg(min(struct((-col("cnt")).as("nc"),
        col("c_mktsegment").as("seg"))).as("m"))
      .select(col("entity_id"), col("m.seg").as("golden_segment"))
    rich.join(mode, Seq("entity_id")).orderBy(col("entity_id"))
  }

  /** CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
    * Walker, WSDM 2013) — the adjustment every large experimentation
    * platform applies before reading a treatment effect: per user the
    * PRE-period metric x is a covariate for the post-period metric y,
    * θ = cov(x,y)/var(x) is fit on the pooled population, and each
    * variant's adjusted mean is mean(y) − θ·(mean(x) − mean(x_pool)) —
    * same expectation, variance shrunk by corr(x,y)². Assignment is the
    * md5 bucket of the customer key (deterministic, append-stable — the
    * [[graft.operators.Sampling.bucket100]] contract), so the whole
    * readout replays bit-for-bit.
    *
    * Parity: per-user sums are exact cents; θ's moments are
    * DECIMAL(19,0)×DECIMAL(19,0) products summed in DECIMAL(38,0) (the
    * [[corrStats]] discipline, product widened BEFORE the sum because
    * per-user totals square past long range at corpus scale); every
    * double derives from those exact sums in one fixed operand order.
    *
    * Scale shape: one partial-aggregable groupBy(custkey) builds the
    * per-user (x, y) relation (persisted DISK_ONLY, operator-scoped,
    * two consumers), then a 1-row pooled-moment aggregate broadcast
    * onto the 2-row per-variant aggregate. No window, no join on fact
    * keys.
    */
  def cupedAdjust(orders: DataFrame,
      splitDate: String = "1998-06-01"): DataFrame = {
    val d19 = "decimal(19,0)"
    val d38 = "decimal(38,0)"
    val cents = round(col("o_totalprice") * 100).cast("long")
    val per = graft.operators.CacheScope.selfReleasing(
      orders.select(col("o_custkey"),
          when(col("o_orderdate") < lit(splitDate), cents)
            .otherwise(lit(0L)).as("xc"),
          when(col("o_orderdate") >= lit(splitDate), cents)
            .otherwise(lit(0L)).as("yc"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("xc")).as("x"), sum(col("yc")).as("y"))
        .withColumn("variant",
          when(Sampling.bucket100(col("o_custkey")) < 50, "A")
            .otherwise("B")),
      matchingActions = 2)
    val pool = per.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(d38)).as("sx"),
      sum(col("y").cast(d38)).as("sy"),
      sum((col("x").cast(d19) * col("x").cast(d19)).cast(d38)).as("sxx"),
      sum((col("x").cast(d19) * col("y").cast(d19)).cast(d38)).as("sxy"))
    val byv = per.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x").cast(d38)).as("svx"),
        sum(col("y").cast(d38)).as("svy"))
    val nd = col("n").cast("double")
    val (sx, sy, sxx, sxy) = (col("sx").cast("double"),
      col("sy").cast("double"), col("sxx").cast("double"),
      col("sxy").cast("double"))
    val nv = col("n_users").cast("double")
    val (svx, svy) = (col("svx").cast("double"), col("svy").cast("double"))
    // zero pre-period variance = no covariate signal: NULL theta (the
    // regressionStats degenerate-fit convention), never a div-by-zero
    val theta = when(nd * sxx - sx * sx =!= lit(0.0),
      (nd * sxy - sx * sy) / (nd * sxx - sx * sx))
    byv.crossJoin(broadcast(pool))
      .withColumn("theta", theta)
      .select(col("variant"), col("n_users"),
        (svy / nv / lit(100.0)).as("mean_y"),
        col("theta"),
        (svy / nv / lit(100.0) -
          col("theta") * ((svx / nv - sx / nd) / lit(100.0)))
          .as("mean_y_cuped"))
      .orderBy(col("variant"))
  }

  /** pass@k evaluation (Chen et al. 2021, the Codex estimator) — the
    * readout every LLM-eval pipeline computes over (problem, sample,
    * correct) relations: per problem with n samples and c correct,
    * pass@k = 1 − C(n−c,k)/C(n,k), the unbiased probability that at
    * least one of k drawn samples is correct. The ratio is computed as
    * a k-step SEQUENTIALLY-FLOORED e6 product
    * (r ← r·(n−c−i) div (n−i), r₀ = 1e6) — each step stays ≤ 1e6·n so
    * BIGINT holds to ~9e12 samples per problem where the single
    * cross-multiplied form overflows past n ≈ 2000 at k = 5; the floor
    * sequence is the stated contract, identical on both engines. When
    * n − c < k a factor hits zero and pass@k = 1 exactly, the paper's
    * own boundary. Problems with n < k are excluded (the estimator is
    * undefined there).
    *
    * Fixture semantics: problems = customers, samples = their orders,
    * correct = the order beat the global median price (computed
    * exactly, the exact_median discipline) — deterministic, no labels
    * needed.
    *
    * Scale shape: one partial-aggregable groupBy(problem) with a
    * conditional count, a broadcast 1-row median, row-local unrolled
    * k-step arithmetic, and a |ks|-row summary — no window, no join on
    * fact keys.
    */
  def passAtK(orders: DataFrame, ks: Seq[Int] = Seq(1, 5)): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= 16),
      s"ks in [1,16]: $ks")
    val cents = expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    val med = ExactRank.exactRank(
        orders.select(cents.as("cents")).withColumn("g", lit(1)),
        Seq("g"), Seq("cents"))
      .filter(col("rnk") * 2 === col("n_group") ||
        col("rnk") * 2 === col("n_group") + 1)
      .agg(min(col("cents")).as("median_cents"))
    val per = orders.select(col("o_custkey"), cents.as("cents"))
      .crossJoin(broadcast(med))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("cents") > col("median_cents"), 1L).otherwise(0L))
          .as("c"))
    val perP = graft.operators.CacheScope.selfReleasing(per)
    ks.map { k =>
      // unrolled k-step floored product; (n−c−i) hits ≤0 → r = 0
      val rExpr = (0 until k).foldLeft("1000000"){ (acc, i) =>
        s"(($acc * greatest(n - c - $i, 0)) div (n - $i))" }
      perP.filter(col("n") >= k)
        .select(col("o_custkey"), col("n"), col("c"),
          (lit(1000000L) - expr(rExpr)).as("pass_e6"))
        .agg(lit(k).as("k"),
          count(lit(1)).as("n_problems"),
          sum(col("pass_e6")).as("sum_pass_e6"),
          expr("sum(pass_e6) div count(1)").as("mean_pass_e6"))
    }.reduce(_.unionByName(_)).orderBy(col("k"))
  }

  /** Exact per-group simple linear regression (OLS price ~ quantity):
    * slope, intercept, and R² per return flag, from the SAME five exact
    * power sums as [[corrStats]] — one partial-aggregable pass, no
    * window, no second scan. Spark's `regr_slope`/`regr_r2` (like
    * `corr`) accumulate doubles in partial-order and can't hash-match
    * another engine; deriving the closed form from DECIMAL(38,0) sums in
    * a fixed double operand order can. Cent-scaled y: slope/intercept
    * divide the 100 back out; R² is scale-invariant. A zero-variance
    * group (all x or all y identical — undefined fit) yields NULLs
    * rather than ±Inf.
    */
  def regressionStats(lineitem: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val agg = lineitem
      .select(col("l_returnflag"),
        round(col("l_quantity")).cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("p"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("q").cast(d38)).as("sq"),
        sum(col("p").cast(d38)).as("sp"),
        sum((col("q") * col("q")).cast(d38)).as("sqq"),
        sum((col("p") * col("p")).cast(d38)).as("spp"),
        sum((col("q") * col("p")).cast(d38)).as("sqp"))
    val nd = col("n_rows").cast("double")
    val (sq, sp, sqq, spp, sqp) = (col("sq").cast("double"),
      col("sp").cast("double"), col("sqq").cast("double"),
      col("spp").cast("double"), col("sqp").cast("double"))
    val covNum = nd * sqp - sq * sp
    val varX = nd * sqq - sq * sq
    val varY = nd * spp - sp * sp
    val degenerate = col("sqq") * col("n_rows") === col("sq") * col("sq") ||
      col("spp") * col("n_rows") === col("sp") * col("sp")
    agg.select(col("l_returnflag"), col("n_rows"),
        when(degenerate, lit(null))
          .otherwise(covNum / varX / lit(100.0)).as("slope"),
        when(degenerate, lit(null))
          .otherwise((sp / nd - covNum / varX * (sq / nd)) / lit(100.0))
          .as("intercept"),
        when(degenerate, lit(null))
          .otherwise(covNum * covNum / (varX * varY)).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  /** Scalar function library projection (string/math/date) — whole-stage
    * codegen'd row-level expressions, no shuffle at all.
    */
  def scalarFunctions(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      length(col("p_name")).cast("long").as("name_len"),
      substring(col("p_brand"), 1, 5).as("brand_prefix"),
      concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
      abs(col("p_size") - lit(25)).as("size_dist"),
      floor(col("p_retailprice")).as("price_floor"),
      ceil(col("p_retailprice")).as("price_ceil"),
      (col("p_size") % 7).as("size_mod"),
      when(col("p_size") >= 25, "big").otherwise("small").as("size_class"),
      levenshtein(col("p_brand"), lit("Brand#33")).cast("long").as("brand_dist"))
      .orderBy(col("p_partkey"))

  /** Robust per-group outlier scoring (Iglewicz–Hoaglin modified z-score):
    * z = 0.6745 · (x − median) / MAD, flagged at |z| > 3.5. Median and MAD
    * are EXACT lower medians (rank ⌊(n+1)/2⌋ under a deterministic
    * ordering), not interpolated — which is what lets the DuckDB oracle
    * compute bit-identical doubles, and means the statistic itself is
    * reproducible run-to-run at any partitioning.
    *
    * Scale shape: TWO [[ExactRank.exactRank]] passes (value median, then
    * absolute-deviation median) — the engine's scalable order-statistic
    * primitive; event_type has a handful of values, so the per-group
    * window alternative would sort the whole table under a
    * #groups-task ceiling. The stat relations are group-count-sized and
    * join back via broadcast; the z computation is row-local. A
    * degenerate group (MAD = 0: over half its values identical) yields
    * NULL scores rather than ±Inf. Eager like every ExactRank consumer
    * (two bounded offset passes at call time); three scans of the input
    * total — at 100 TB, persist the projected input first if scans
    * dominate.
    */
  def robustZscore(events: DataFrame, threshold: Double = 3.5): DataFrame = {
    val base = events.select(col("event_id"), col("event_type"), col("value"))
    def lowerMedian(df: DataFrame, valueCol: String, as: String) =
      ExactRank.exactRank(df, Seq("event_type"), Seq(valueCol, "event_id"))
        .filter(col("rnk") === expr("(n_group + 1) div 2"))
        .select(col("event_type"), col(valueCol).as(as))
    val med = lowerMedian(base, "value", "med")
    val dev = base.join(broadcast(med), "event_type")
      .withColumn("absdev", abs(col("value") - col("med")))
    val mad = lowerMedian(
      dev.select(col("event_id"), col("event_type"), col("absdev")),
      "absdev", "mad")
    val z = lit(0.6745) * (col("value") - col("med")) / col("mad")
    dev.join(broadcast(mad), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        when(col("mad") === 0, lit(null)).otherwise(z).as("robust_z"),
        when(col("mad") === 0, lit(null))
          .otherwise(abs(z) > lit(threshold)).as("is_outlier"))
      .orderBy(col("event_id"))
  }

  /** Winsorization — clamp every value into its group's EXACT
    * [P_lo, P_hi] percentile band (the robust-clipping step feature
    * pipelines run before scaling; clipping, unlike dropping, keeps the
    * row count stable for downstream joins). Percentile VALUES are exact
    * order statistics at rank ⌈n·p/100⌉ via the window-free
    * [[ExactRank.exactRank]] ([[exactQuantiles]]' convention), pulled
    * into a groups×2 threshold relation that broadcasts back onto the
    * corpus — clamping itself is a row-local greatest/least, pure
    * selection with no arithmetic, so cross-engine equality is exact
    * even on doubles.
    */
  def winsorize(events: DataFrame, loPct: Int = 5, hiPct: Int = 95): DataFrame = {
    require(1 <= loPct && loPct < hiPct && hiPct <= 100,
      s"winsorize: need 1 <= loPct < hiPct <= 100, got ($loPct, $hiPct)")
    val ranked = ExactRank.exactRank(
      events.select(col("event_id"), col("event_type"), col("value")),
      Seq("event_type"), Seq("value", "event_id"))
    val thr = ranked.groupBy(col("event_type")).agg(
      max(when(col("rnk") ===
        greatest(lit(1L), expr(s"(n_group * $loPct + 99) div 100")),
        col("value"))).as("lo"),
      max(when(col("rnk") ===
        greatest(lit(1L), expr(s"(n_group * $hiPct + 99) div 100")),
        col("value"))).as("hi"))
    // clamp-back probes the RAW relation, not `ranked` — the clamp needs
    // no rank, and reading ranked here would re-execute the whole
    // range-repartition + rank lineage a second time per materialization
    events.select(col("event_id"), col("event_type"), col("value"))
      .join(broadcast(thr), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("lo"), col("hi"),
        greatest(col("lo"), least(col("hi"), col("value"))).as("value_w"),
        (col("value") < col("lo") || col("value") > col("hi")).as("clipped"))
      .orderBy(col("event_id"))
  }

  /** Declarative data-quality constraint suite (the Deequ shape): a
    * fixed set of named checks — row count, completeness, value range,
    * key uniqueness, referential integrity — evaluated as conditional
    * aggregates and emitted long-format `(check_name, metric, passed)`.
    * The pre-ingest validation gate of a training pipeline, as a query.
    *
    * Scale shape: ONE partial-aggregable pass over the fact table for
    * all row-local checks (conditional sums collapse map-side), one
    * distinct-count pass over the dimension for uniqueness, and one
    * LEFT ANTI equi-join for referential orphans (AQE broadcasts the
    * key side when it fits). The three 1-row results cross-join
    * broadcast-style; the long format is a row-local explode.
    */
  def dqChecks(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val li = lineitem.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("l_quantity").isNull, 1).otherwise(0)).as("null_qty"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)
        .otherwise(0)).as("qty_oob"),
      sum(when(col("l_extendedprice") <= 0, 1).otherwise(0)).as("price_nonpos"))
    val ord = orders.agg(count(lit(1)).as("n_orders"),
      countDistinct(col("o_orderkey")).as("n_distinct_keys"))
    val orphans = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    def chk(name: String, metric: org.apache.spark.sql.Column,
        passed: org.apache.spark.sql.Column) =
      struct(lit(name).as("check_name"),
        metric.cast("double").as("metric"), passed.as("passed"))
    li.crossJoin(ord).crossJoin(orphans)
      .select(explode(array(
        chk("row_count_positive", col("n_rows"), col("n_rows") > 0),
        chk("quantity_complete", col("null_qty"), col("null_qty") === 0),
        chk("quantity_in_range", col("qty_oob"), col("qty_oob") === 0),
        chk("price_positive", col("price_nonpos"), col("price_nonpos") === 0),
        chk("orderkey_unique", col("n_orders") - col("n_distinct_keys"),
          col("n_orders") === col("n_distinct_keys")),
        chk("orderkey_referential", col("n_orphans"), col("n_orphans") === 0)
      )).as("c"))
      .select(col("c.check_name"), col("c.metric"), col("c.passed"))
      .orderBy(col("check_name"))
  }

  /** K-anonymity audit over a quasi-identifier combination — the
    * privacy gate before releasing or training on user-linked data: a
    * row is re-identifiable when its QI group holds fewer than k
    * records. Emits the one-row audit (group counts, risky groups,
    * risky rows, worst group size) rather than the risky rows
    * themselves — the go/no-go signal.
    *
    * Scale shape: one partial-aggregable groupBy on the QI columns
    * (group relation is QI-cardinality sized), then a 1-row summary
    * aggregate. No window, no join.
    */
  def kAnonymity(customer: DataFrame, k: Int = 5): DataFrame =
    customer.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .agg(lit(k).as("k"),
        count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1).otherwise(0)).as("n_risky_groups"),
        sum(when(col("n") < k, col("n")).otherwise(lit(0L)))
          .as("n_risky_rows"),
        min(col("n")).as("min_group_size"))

  /** Distinct l-DIVERSITY audit (Machanavajjhala et al., ICDE 2006 —
    * the attack [[kAnonymity]] misses: a group of k rows that all share
    * ONE sensitive value is k-anonymous yet fully disclosing). Per
    * quasi-identifier group (nation, segment) over the sensitive
    * account-balance BAND: the group passes iff it carries ≥ l distinct
    * sensitive values; the summary also counts SKEWED groups where the
    * modal band dominates (max_freq · l > n — the exact-integer
    * cross-multiplication stand-in for entropy l-diversity, whose ln()
    * would be libm-dependent).
    *
    * The band is exact money math: cents through DECIMAL(18,2) (the
    * house parity convention), shifted positive before the integral
    * divide so Spark's truncate-toward-zero and DuckDB's floor division
    * can never disagree on a negative balance.
    *
    * Scale shape: two nested partial-aggregable hash aggregates
    * ((QI, band) then QI) and a 1-row summary — no windows, no joins.
    */
  def lDiversity(customer: DataFrame, l: Int = 3): DataFrame = {
    val band = expr(
      "(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000)" +
        " div 100000")
    val cell = customer
      .select(col("c_nationkey"), col("c_mktsegment"), band.as("band"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
      .agg(count(lit(1)).as("cnt"))
    cell.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_sens"),
        max(col("cnt")).as("max_freq"))
      .agg(lit(l).as("l"),
        count(lit(1)).as("n_groups"),
        sum(when(col("n_sens") < l, 1).otherwise(0))
          .as("n_low_diversity_groups"),
        sum(when(col("n_sens") < l, col("n")).otherwise(lit(0L)))
          .as("n_rows_at_risk"),
        min(col("n_sens")).as("min_distinct_sensitive"),
        sum(when(col("max_freq") * l > col("n"), 1).otherwise(0))
          .as("n_skewed_groups"))
  }

  /** t-CLOSENESS audit (Li, Li & Venkatasubramanian, ICDE 2007 — the
    * attack [[lDiversity]] misses: a group can be diverse yet still
    * disclosing when its sensitive DISTRIBUTION skews far from the
    * table's, e.g. 90% of one band where the population holds 20%).
    * Per QI group (nation, segment) over the same ordered acctbal band
    * as [[lDiversity]], the distance is the paper's ORDERED Earth
    * Mover's Distance: EMD = Σᵢ |Σ_{j≤i}(p_j − q_j)| / (m − 1) over the
    * band domain in band order. Distributions are e6-QUANTIZED integers
    * (`p_e6 = cnt·1e6 div n_g`) so every cumulative term is exact
    * integer arithmetic both engines replay bit-for-bit — the
    * cross-multiplication alternative keeps true rationals but its
    * `cnt_gv·N` products overflow BIGINT past ~3e9 rows, while the
    * quantized form is bounded by m·1e6 at ANY corpus size (the
    * quantization error is ≤ m/1e6 per group — documented, not hidden).
    * A group violates when its EMD_e6 exceeds `tMilli·1000`.
    *
    * Scale shape: two partial-aggregable hash aggregates sized by
    * QI-cardinality and band-domain cardinality, a broadcast cross join
    * building the DENSE (group × band) grid — dimension-bound: its row
    * count is QI·m regardless of fact size — a left join of the grid
    * onto the cell counts, one window over the dimension-bound grid
    * (partitions = groups, rows per partition = m), and a 1-row
    * summary. The fact table is touched exactly once.
    */
  def tCloseness(customer: DataFrame, tMilli: Int = 200): DataFrame = {
    require(tMilli >= 1 && tMilli <= 999, s"tMilli in [1,999]: $tMilli")
    import org.apache.spark.sql.expressions.Window
    val band = expr(
      "(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000)" +
        " div 100000")
    val cell = customer
      .select(col("c_nationkey"), col("c_mktsegment"), band.as("band"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
      .agg(count(lit(1)).as("cnt"))
    val groups = cell.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(col("cnt")).as("n_g"))
    val bands = cell.groupBy(col("band")).agg(sum(col("cnt")).as("cnt_v"))
    val total = bands.agg(sum(col("cnt_v")).as("n_total"),
      count(lit(1)).as("m"))
    val grid = groups.crossJoin(broadcast(bands))
      .join(cell, Seq("c_nationkey", "c_mktsegment", "band"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(total))
      .select(col("c_nationkey"), col("c_mktsegment"), col("band"),
        col("n_g"), col("m"),
        expr("cnt * 1000000 div n_g").as("p_e6"),
        expr("cnt_v * 1000000 div n_total").as("q_e6"))
    val byGroup = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
      .orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dist = grid
      .withColumn("cum", sum(col("p_e6") - col("q_e6")).over(byGroup))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(max(col("n_g")).as("n_g"),
        expr("sum(abs(cum)) div (max(m) - 1)").as("emd_e6"))
    dist.agg(lit(tMilli * 1000L).as("t_e6"),
      count(lit(1)).as("n_groups"),
      sum(when(col("emd_e6") > tMilli * 1000L, 1).otherwise(0))
        .as("n_violating_groups"),
      sum(when(col("emd_e6") > tMilli * 1000L, col("n_g"))
        .otherwise(lit(0L))).as("n_rows_at_risk"),
      max(col("emd_e6")).as("max_emd_e6"))
  }

  /** BAND JOIN on a numeric attribute (|s.value − c.value| ≤ band) via
    * BUCKET BLOCKING — the fuzzy numeric matching every entity-resolution
    * pipeline needs (here: suppliers to customers with balances within
    * $1), planned as an EQUI-join: Spark turns a bare range predicate
    * into BroadcastNestedLoopJoin — O(|S|·|C|), the scale killer — so
    * one side explodes to its bucket ±1 (bucket width = band ⇒ every
    * qualifying pair shares a bucket; ±1 covers boundary straddle) and
    * the exact |diff| ≤ band filter runs on candidates only. The 3×
    * row inflation on ONE side buys a hash join on the bucket key —
    * the interval_join/asof discipline applied to values instead of
    * time.
    *
    * Money math: cents through DECIMAL(18,2), shifted positive before
    * the bucket divide (the [[lDiversity]] rule) so floor and truncate
    * division agree on negative balances. A (supplier, customer) pair
    * can match through at most one bucket (the customer side has
    * exactly one), so no dedup pass is needed.
    */
  def bandJoin(supplier: DataFrame, customer: DataFrame,
      bandCents: Long = 100): DataFrame = {
    require(bandCents >= 1, s"bandCents must be >= 1, got $bandCents")
    val sc = supplier
      .select(col("s_suppkey"),
        expr("CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("s_cents"))
      .withColumn("bkt", explode(array((-1 to 1).map(d =>
        expr(s"(s_cents + 100000) div $bandCents + $d")): _*)))
    val cc = customer
      .select(col("c_custkey"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("c_cents"))
      .withColumn("bkt", expr(s"(c_cents + 100000) div $bandCents"))
    sc.join(cc, "bkt")
      .filter(abs(col("s_cents") - col("c_cents")) <= bandCents)
      .select(col("s_suppkey"), col("c_custkey"),
        (col("s_cents") - col("c_cents")).as("diff_cents"))
      .orderBy(col("s_suppkey"), col("c_custkey"))
  }

  /** POISSON BOOTSTRAP confidence-interval replicates (the distributed
    * bootstrap: classic resampling draws n rows WITH replacement — a
    * global operation — but for large n the per-row resample count
    * converges to Poisson(1), which is ROW-LOCAL: each row just needs
    * an independent weight, so the whole bootstrap is one map + one
    * partial-aggregable groupBy on the replicate id; the shuffle
    * carries B rows per partition regardless of corpus size).
    *
    * Everything is deterministic and integer-exact: the weight comes
    * from the house md5-prefix uniform (u = hash mod 1e6) pushed
    * through the Poisson(1) inverse CDF as a CASE ladder over
    * PRECOMPUTED e6-floored cumulative thresholds (367879 = ⌊e⁻¹·1e6⌋,
    * …) — no exp()/ln() at query time, so the oracle replays weights
    * bit-for-bit. Per replicate the emitted row is (rep, n_eff,
    * sum_cents, mean_e6) with the mean floored from a DECIMAL(38,0)
    * cross-multiplication — the caller reads the CI off the B ordered
    * means (e.g. replicates 1 and 30 of 32 ≈ a 94% interval).
    */
  def bootstrapCi(orders: DataFrame, replicates: Int = 32): DataFrame = {
    require(replicates >= 2 && replicates <= 256,
      s"replicates must be in [2, 256], got $replicates")
    // cumulative Poisson(1) CDF, e6-floored; u >= 999998 caps at 8
    val cdf = Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L,
      999916L, 999989L, 999998L)
    val ladder = cdf.zipWithIndex.foldRight(lit(9)) { case ((t, k), els) =>
      when(col("u") < t, k).otherwise(els)
    }
    orders
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      .withColumn("rep", explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("u",
        conv(substring(md5(concat_ws("|", lit("boot"), col("o_orderkey"),
          col("rep"))), 1, 8), 16, 10).cast("long") % 1000000L)
      .withColumn("w", ladder)
      .groupBy(col("rep"))
      .agg(sum(col("w")).cast("long").as("n_eff"),
        sum(col("w") * col("cents")).as("sum_cents"))
      .withColumn("mean_e6",
        expr("CAST((CAST(sum_cents AS DECIMAL(38,0)) * 1000000)" +
          " div (100 * n_eff) AS BIGINT)"))
      .orderBy(col("rep"))
  }

  /** Differentially-private release of a group-count histogram —
    * the Laplace mechanism (Dwork et al. 2006, public) over the
    * (lang, source) corpus composition, the privacy gate's release
    * half ([[kAnonymity]] is the audit half: audit says whether a
    * grouping is safe to publish raw; this publishes a noised version
    * when it is not).
    *
    * A count histogram has L1 sensitivity 1 (one document moves one
    * cell by one), so Laplace(b = 1/ε) noise per cell gives ε-DP. The
    * noise here is SEEDED — inverse-CDF of a uniform derived from the
    * house md5-prefix hash of the cell key — which makes the release
    * deterministic and bit-replayable by the oracle: u = (h mod 10^6 +
    * 0.5)/10^6 ∈ (0,1), noise = −b·sign(u−½)·ln(1−2|u−½|).
    *
    * THIS ROW IS NOT A PRIVATE RELEASE — it is the verification artifact
    * for the mechanism: the noise derives from the PUBLIC cell key (so
    * anyone can invert it exactly) and `n_exact` ships alongside
    * `noisy_e6`. The ε-DP guarantee attaches only to a production
    * projection that (a) drops `n_exact` and (b) seeds the uniform from
    * a secret — the Laplace derivation is the operator; the seed and the
    * release projection are policy. The noised value ships under
    * the house e6 integer contract: both engines compute the same
    * IEEE-double ln/multiply chain, and the ×10^6 round absorbs any
    * last-ulp libm divergence (the token_drift precedent).
    *
    * Scale shape: one partial-aggregable groupBy (cell-cardinality
    * sized) + a row-local noise projection. No window, no join, no
    * driver action.
    */
  def dpHistogram(documents: DataFrame, epsilon: Double = 1.0): DataFrame = {
    val b = 1.0 / epsilon
    val h = conv(substring(md5(concat(lit("dp_"), col("lang"), lit("_"),
      col("source")).cast("binary")), 1, 8), 16, 10).cast("long")
    val u = (pmod(h, lit(1000000L)).cast("double") + 0.5) / 1000000.0
    val noise = -lit(b) * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    documents.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_exact"))
      .select(col("lang"), col("source"), col("n_exact"),
        floor((col("n_exact") + noise) * 1e6 + 0.5).cast("long")
          .as("noisy_e6"))
      .orderBy(col("lang"), col("source"))
  }

  /** MERGEABLE QUANTILE SKETCH with a MEASURED-ERROR leg (r15 — the
    * lsh_recall discipline applied to approximate quantiles, where
    * [[approx_stats]] only ships structural booleans): build a
    * fixed-width bucket CDF over exact cents (ONE partial-aggregable
    * pass — per-partition bucket counts merge by addition, the textbook
    * mergeable summary a 1000-executor quantile query actually ships),
    * estimate each target percentile by integer linear interpolation
    * inside its bucket, and join the EXACT rank-t value (one
    * [[ExactRank]] pass) so the estimate's absolute error is a VALUE in
    * the hash gate — a sketch-resolution regression fails the driver
    * compare instead of hiding behind a tolerance boolean.
    *
    * All integer: v = round(price·100) cents; bucket = v div W;
    * target rank t = ⌈n·pct/100⌉ = (n·pct + 99) div 100; estimate =
    * b·W + ((t − cum_before)·W) div cnt — every operand non-negative,
    * so `div` and DuckDB `//` agree.
    *
    * Scale shape: the sketch leg is one scan + a bucket-cardinality
    * groupBy (≈ value_range/W rows) with a window only over that tiny
    * relation; the exact leg is the AUDIT cost (the measured-quality
    * pattern) and runs as the distributed ExactRank, never a global
    * window over the data.
    */
  def quantileSketch(lineitem: DataFrame, widthCents: Long = 100000L,
      pcts: Seq[Int] = Seq(1, 5, 25, 50, 75, 95, 99)): DataFrame = {
    val v = quantileValues(lineitem)
    quantileFromBuckets(v, quantileBuckets(v, widthCents), widthCents, pcts)
  }

  /** The SKETCH-ONLY primary (r16, VERDICT r15 item 2): bucket CDF +
    * integer-interpolated estimates WITHOUT the exact rank-t audit leg.
    * The registered `quantile_sketch` primary is this form — one
    * partial-aggregable bucket-count pass over the data plus window/join
    * work on the tiny (≈ value_range/W rows) bucket relation, the shape
    * that actually ships at 100 TB. [[quantileSketch]] (estimates JOINED
    * with the exact rank-t truth, ExactRank pass over the full corpus)
    * stays registered as the measured-error audit twin — its x100 cost
    * is entirely the audit's, by design.
    */
  def quantileSketchOnly(lineitem: DataFrame, widthCents: Long = 100000L,
      pcts: Seq[Int] = Seq(1, 5, 25, 50, 75, 95, 99)): DataFrame =
    quantileEstimate(
      quantileBuckets(quantileValues(lineitem), widthCents), widthCents, pcts)

  /** The sketch's value relation: exact cents + the deterministic
    * tie-break key columns the exact-rank leg orders by. */
  private[graft] def quantileValues(lineitem: DataFrame): DataFrame =
    lineitem.select(
      round(col("l_extendedprice") * 100).cast("long").as("v"),
      col("l_orderkey"), col("l_linenumber"),
      col("l_partkey").cast("string").as("pk"))

  /** The MERGEABLE summary itself — per-bucket counts (one
    * partial-aggregable pass). Partial bucket relations from disjoint
    * slices merge by `groupBy(b).sum(cnt)`; [[quantileFromBuckets]]
    * produces identical estimates from the merged partials as from a
    * one-shot build (quantile_stream drives that property end-to-end
    * through exactly-once micro-batches).
    */
  private[graft] def quantileBuckets(v: DataFrame,
      widthCents: Long): DataFrame =
    v.groupBy(expr(s"v div $widthCents").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Estimate + measured-error tail shared by the batch and streaming
    * forms: CDF over the (tiny) bucket relation, integer interpolation,
    * exact rank-t leg from [[ExactRank]] over the full value relation.
    */
  /** Estimate tail shared by the sketch-only primary, the audit twin,
    * and the streaming merge: CDF + integer interpolation over the
    * (tiny) bucket relation. Returns (pct, n_total, target_rank,
    * est_cents) ordered by pct — the `quantile_sketch` primary's exact
    * driver surface. The global window is over the bucket relation
    * only (≈ value_range/W rows), never the data.
    */
  private[graft] def quantileEstimate(buckets: DataFrame,
      widthCents: Long, pcts: Seq[Int]): DataFrame = {
    require(widthCents >= 1 && pcts.nonEmpty &&
      pcts.forall(p => p >= 1 && p <= 100), "degenerate sketch parameters")
    val w = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cdf = buckets.withColumn("cum_before",
      coalesce(sum(col("cnt")).over(w), lit(0L)))
    val n = buckets.agg(sum(col("cnt")).as("n"))
    val targets = buckets.sparkSession.range(0, pcts.size)
      .select(expr(s"array(${pcts.mkString(",")})[CAST(id AS INT)]")
        .as("pct"))
      .crossJoin(broadcast(n))
      .select(col("pct"), col("n").as("n_total"),
        expr("(n * pct + 99) div 100").as("target_rank"))
    broadcast(targets).join(cdf,
        col("target_rank") > col("cum_before") &&
          col("target_rank") <= col("cum_before") + col("cnt"))
      .select(col("pct"), col("n_total"), col("target_rank"),
        (col("b") * widthCents +
          expr(s"((target_rank - cum_before) * $widthCents) div cnt"))
          .as("est_cents"))
      .orderBy(col("pct"))
  }

  private[graft] def quantileFromBuckets(v: DataFrame, buckets: DataFrame,
      widthCents: Long, pcts: Seq[Int]): DataFrame = {
    val est = quantileEstimate(buckets, widthCents, pcts)
    val ranked = ExactRank.exactRank(v.withColumn("g", lit(0)), Seq("g"),
      Seq("v", "l_orderkey", "l_linenumber", "pk"))
    val exact = ranked.join(
        broadcast(est.select(col("pct").as("p2"),
          col("target_rank").as("t2"))),
        col("rnk") === col("t2"))
      .select(col("p2").as("pct"), col("v").as("exact_cents"))
    est.join(exact, "pct")
      .withColumn("abs_err_cents", abs(col("est_cents") - col("exact_cents")))
      .orderBy(col("pct"))
  }

  /** ε-DP MEAN release ([[dpHistogram]]'s numeric sibling — the third
    * classic Laplace release after count histogram and top-k): the mean
    * tokens-per-document with per-document contribution CLIPPED to
    * `clip` — clipping is what bounds the mean's L1 sensitivity at
    * clip/n, the standard DP-mean recipe. Noise is the same seeded
    * md5-uniform → inverse-CDF Laplace as the siblings (deterministic,
    * oracle-replayable; the scale b = clip/(n·ε) is computed in-plan
    * from the released n). Ships `n_docs`/`clipped_sum`/`mean_e6`
    * alongside `noisy_mean_e6` under the SAME not-a-private-release
    * verification contract documented on [[dpHistogram]] — the
    * mechanism is the operator, the secret seed and the drop-the-exact
    * projection are policy.
    *
    * Scale shape: one partial-aggregable scan (count + clipped sum),
    * then row-local double math on a 1-row relation. The division of
    * exact integers and the ln/multiply chain are the same IEEE ops on
    * both engines; the ×1e6 round absorbs last-ulp libm divergence.
    */
  def dpMean(documents: DataFrame, epsilon: Double = 1.0,
      clip: Long = 500): DataFrame = {
    require(epsilon > 0 && clip >= 1, "dpMean: epsilon > 0, clip >= 1")
    // coalesce BEFORE least (r16 advice): for a NULL text the regex size
    // is NULL and least() would skip the NULL in both engines — making a
    // null document contribute the full clip to clipped_sum instead of 0
    val tokens = least(coalesce(
      size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
        .cast("long"), lit(0L)), lit(clip))
    val agg = documents.select(tokens.as("t"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("clipped_sum"))
    val h = conv(substring(md5(lit("dp_mean_release").cast("binary")),
      1, 8), 16, 10).cast("long")
    val u = (pmod(h, lit(1000000L)).cast("double") + 0.5) / 1000000.0
    val b = lit(clip.toDouble / epsilon) / col("n_docs").cast("double")
    val noise = -b * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    agg.select(col("n_docs"), col("clipped_sum"),
      expr("CAST((CAST(clipped_sum AS DECIMAL(38,0)) * 1000000)" +
        " div n_docs AS BIGINT)").as("mean_e6"),
      floor((col("clipped_sum").cast("double") / col("n_docs").cast("double")
        + noise) * 1e6 + 0.5).cast("long").as("noisy_mean_e6"))
  }

  /** RFM SEGMENTATION (Recency / Frequency / Monetary — the classic
    * retail customer-value cut, squarely in the reference's
    * market-basket domain): per customer the days since their last
    * order (anchored at the corpus max date, so the segmentation is a
    * pure function of the data), their order count, and their
    * total spend in exact cents; each dimension scored into EXACT
    * quartiles 1..4 (4 = best — most recent / most frequent / highest
    * spend) and composed into the classic 3-digit RFM code.
    *
    * Quartiles are the curriculum_order idiom: three window-free
    * [[ExactRank]] passes over the customer-cardinality relation with
    * `((rnk−1)·4) div n` integer tier math — boundaries are hash-exact,
    * no percentile interpolation, no global ORDER BY window.
    *
    * Scale shape: one partial-aggregable groupBy(custkey) collapses the
    * orders scan to customer cardinality; the anchor is a 1-row
    * broadcast; each ExactRank pass parallelizes at partition width
    * (single rank group, bounded per-partition offset state).
    */
  /** JOIN-KEY SKEW PROFILE (r16 — the diagnostic every 100 TB shuffle
    * plan needs BEFORE it hits the straggler: is this key distribution
    * salted-join territory?): per key the exact count, its share of all
    * rows (pct_e6), and a fleet-level skew factor — max_cnt·n_keys/n
    * scaled e6, which reads 1e6 for a perfectly uniform distribution
    * and max_cnt/mean_cnt multiples above it. Emits the top-k hottest
    * keys by (cnt desc, key).
    *
    * Scale shape: one partial-aggregable groupBy to key cardinality; the
    * top-k is orderBy+limit (TakeOrdered — a bounded heap per partition
    * + one k-row merge, NEVER a global rank window over the key
    * relation); the totals are a 1-row broadcast; the final rank window
    * orders k ≤ topK rows.
    */
  def skewProfile(df: DataFrame, keyCol: String, topK: Int = 20)
      : DataFrame = {
    require(topK >= 1, s"skewProfile: topK must be >= 1, got $topK")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("n_total"),
      count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"))
    counts.orderBy(col("cnt").desc, col("key")).limit(topK)
      .crossJoin(broadcast(tot))
      .withColumn("pct_e6", expr("(cnt * 1000000) div n_total"))
      .withColumn("skew_e6", expr(
        "CAST((CAST(max_cnt AS DECIMAL(38,0)) * n_keys * 1000000)" +
          " div n_total AS BIGINT)"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cnt").desc, col("key"))))
      .select(col("rk"), col("key"), col("cnt"), col("pct_e6"),
        col("n_total"), col("n_keys"), col("skew_e6"))
      .orderBy(col("rk"))
  }

  /** EXACT GINI CONCENTRATION of customer spend (r16 — the classic
    * inequality coefficient, here as a data-curation diagnostic: how
    * concentrated is a distribution before you sample/cap it): with
    * per-customer totals x_1 ≤ … ≤ x_n (ties broken by custkey),
    * G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i) — the rank-weighted
    * closed form, every term an integer. Emits the exact numerator and
    * denominator in DECIMAL-safe cross-multiplication plus the floored
    * g_e6, so the oracle replays it bit-for-bit (no doubles anywhere).
    *
    * Scale shape: one partial-aggregable groupBy to customer totals,
    * ONE [[ExactRank]] pass for the ranks (never a global window), one
    * final aggregate. Rank state is partitions×1 with the fail-fast
    * guard.
    */
  def giniConcentration(orders: DataFrame): DataFrame = {
    val totals = orders.groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
    val ranked = ExactRank.exactRank(totals.withColumn("g", lit(0)),
      Seq("g"), Seq("cents", "o_custkey"))
    ranked.agg(
        count(lit(1)).as("n_customers"),
        sum(col("cents")).as("total_cents"),
        sum(expr("CAST(rnk AS DECIMAL(38,0)) * cents")).as("rank_weighted"))
      .select(col("n_customers"), col("total_cents"),
        expr("CAST(2 * rank_weighted - (n_customers + 1)" +
          " * CAST(total_cents AS DECIMAL(38,0)) AS DECIMAL(38,0))")
          .as("gini_num"),
        expr("CAST(CAST(n_customers AS DECIMAL(38,0)) * total_cents" +
          " AS DECIMAL(38,0))").as("gini_den"))
      .select(col("n_customers"), col("total_cents"),
        col("gini_num").cast("long").as("gini_num"),
        col("gini_den").cast("long").as("gini_den"),
        // the ×1e6 product stays in DECIMAL(38,0): num·1e6 passes the
        // long ceiling two decades before num itself would
        expr("CAST((gini_num * 1000000) div gini_den AS BIGINT)")
          .as("gini_e6"))
  }

  def rfmSegment(orders: DataFrame): DataFrame = {
    val per = orders.groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("monetary_cents"))
    val anchor = orders.agg(max(col("o_orderdate")).as("anchor"))
    val m = per.crossJoin(broadcast(anchor))
      .select(col("custkey"),
        datediff(col("anchor"), col("last_order")).cast("long")
          .as("recency_days"),
        col("frequency"), col("monetary_cents"))
      .withColumn("g", lit(0))
    val r1 = ExactRank.exactRank(m, Seq("g"),
      Seq("recency_days", "custkey"), rankCol = "r_rnk", totalCol = "n_cust")
    val r2 = ExactRank.exactRank(r1, Seq("g"),
      Seq("frequency", "custkey"), rankCol = "f_rnk", totalCol = "n_f")
    val r3 = ExactRank.exactRank(r2, Seq("g"),
      Seq("monetary_cents", "custkey"), rankCol = "m_rnk", totalCol = "n_m")
    r3.select(col("custkey"), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        // recency ranks ascending (smallest gap first), so tier 0 is the
        // BEST quartile → score 4 − tier; frequency/monetary rank
        // ascending too, so their best tier is 3 → score tier + 1
        expr("CAST(4 - ((r_rnk - 1) * 4) div n_cust AS INT)").as("r_q"),
        expr("CAST(1 + ((f_rnk - 1) * 4) div n_cust AS INT)").as("f_q"),
        expr("CAST(1 + ((m_rnk - 1) * 4) div n_cust AS INT)").as("m_q"))
      .withColumn("rfm",
        (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).cast("int"))
      .orderBy(col("custkey"))
  }

  /** THEIL–SEN robust slope (Sen 1968) — the median of pairwise slopes,
    * the outlier-resistant regression [[regressionStats]]' OLS is not
    * (one corrupted row moves OLS arbitrarily; Theil–Sen tolerates 29%
    * contamination). An AUDIT operator over a BOUNDED deterministic
    * head (the brute-force-queries discipline): n points make n²/2
    * pairs, so the full estimator cannot be a registered 100 TB query —
    * the head is the exactness contract, and a production run feeds a
    * reservoir instead. Pairs orient x-ascending so every slope is one
    * exact IEEE division of integer cents by integer quantity
    * (equal-x pairs drop, per the definition); the median is the
    * [[ExactRank]] lower median over (slope, pair-id) total order —
    * no floor-vs-truncate hazard anywhere.
    */
  def theilSen(lineitem: DataFrame, maxPoints: Int = 200): DataFrame = {
    require(maxPoints >= 2 && maxPoints <= 2000,
      s"maxPoints in [2,2000] — pairs are quadratic in it: $maxPoints")
    val pts = lineitem
      .select(round(col("l_quantity")).cast("long").as("x"),
        round(col("l_extendedprice") * 100).cast("long").as("y"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_partkey").cast("string").as("pk"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("pk"))
      .limit(maxPoints)
      .withColumn("g", lit(1))
    val idx = graft.operators.CacheScope.selfReleasing(
      ExactRank.exactRank(pts, Seq("g"),
        Seq("l_orderkey", "l_linenumber", "pk"), rankCol = "i"))
    val a = idx.select(col("i").as("ia"), col("x").as("xa"),
      col("y").as("ya"))
    val b = idx.select(col("i").as("ib"), col("x").as("xb"),
      col("y").as("yb"))
    val slopes = a.join(b, col("xa") < col("xb"))
      .select(((col("yb") - col("ya")).cast("double") /
        (col("xb") - col("xa")).cast("double")).as("slope"),
        col("ia"), col("ib"))
      .withColumn("g", lit(1))
    val ranked = ExactRank.exactRank(slopes, Seq("g"),
      Seq("slope", "ia", "ib"))
    ranked
      .filter(col("rnk") * 2 === col("n_group") ||
        col("rnk") * 2 === col("n_group") + 1)
      .agg(count(lit(1)).as("n_median_rows"),
        max(col("n_group")).as("n_pairs"),
        min(col("slope")).as("ts_slope"))
      .select(lit(maxPoints).as("n_points"), col("n_pairs"),
        col("ts_slope"))
  }

  /** ε-DP TOP-K release ([[dpHistogram]]'s selection sibling — the
    * "what are the most common tokens" query a privacy-gated corpus
    * answers without exposing exact tails): per-token Laplace-noised
    * counts with the same seeded (oracle-replayable) md5-uniform →
    * inverse-CDF noise derivation, then the top `k` by noisy count —
    * repeated noisy-max, the standard composition-accounted release
    * (a production deployment splits ε across the k selections; the
    * fixed seed here is the hash-gate determinism contract, exactly as
    * documented on [[dpHistogram]]).
    *
    * Scale shape: one partial-aggregable token count (vocabulary-sized
    * result), row-local noise, and a TakeOrderedAndProject at k —
    * never a global sort.
    */
  def dpTopK(documents: DataFrame, epsilon: Double = 1.0,
      k: Int = 10): DataFrame = {
    val b = 1.0 / epsilon
    val h = conv(substring(md5(concat(lit("dptk_"), col("token"))
      .cast("binary")), 1, 8), 16, 10).cast("long")
    val u = (pmod(h, lit(1000000L)).cast("double") + 0.5) / 1000000.0
    val noise = -lit(b) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    val scored = documents
      .select(explode(regexp_extract_all(col("text"), lit("[a-z0-9]+"),
        lit(0))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
      .select(col("token"), col("n_exact"),
        floor((col("n_exact") + noise) * 1e6 + 0.5).cast("long")
          .as("noisy_e6"))
      .orderBy(col("noisy_e6").desc, col("token")).limit(k)
    scored.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("noisy_e6").desc, col("token"))).cast("long"))
      .select(col("rk"), col("token"), col("n_exact"), col("noisy_e6"))
      .orderBy(col("rk"))
  }

  /** Exact per-group quantile normalization — the rank-based feature
    * transform (each value maps to its empirical quantile
    * `(rank−1)/(n−1)` within its group; a singleton group maps to 0.5).
    * Rank-transforming a feature is the standard defense against heavy
    * tails before models that assume bounded inputs, and the quantile is
    * EXACT: both factors are integers from one [[ExactRank.exactRank]]
    * pass, and the single double division is the same IEEE op the oracle
    * runs.
    *
    * Scale shape: the public ExactRank — parallelism is the partition
    * count, never the group count (a 3-value group key would pin
    * `row_number() OVER (PARTITION BY grp)` to 3 tasks forever).
    * `keyCol` breaks value ties so the rank is total and deterministic.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
      keyCol: String): DataFrame =
    ExactRank.exactRank(
        df.select(col(groupCol), col(valueCol), col(keyCol)),
        Seq(groupCol), Seq(valueCol, keyCol))
      .select(col(groupCol), col(keyCol), col(valueCol),
        when(col("n_group") === 1, lit(0.5))
          .otherwise((col("rnk") - 1).cast("double") /
            (col("n_group") - 1).cast("double")).as("quantile"))
      .orderBy(col(groupCol), col(keyCol))

  /** 2-D skyline (Pareto frontier) over per-customer (order count,
    * biggest single order) — the "no other customer is at least as
    * good on both axes and better on one" query (Börzsönyi et al.
    * 2001, public). The axes are deliberately weakly correlated
    * (frequency vs ticket size), so the frontier is non-trivial.
    *
    * Mergeable-summary execution (the [[HeavyHitters]] posture):
    * skyline(S) = skyline(∪ₚ skyline(Sₚ)), so each partition reduces
    * to its local frontier and ONE frontier-sized task merges them —
    * the corpus-sized relation never funnels through a single task,
    * only the (typically tiny, anti-correlation-bounded) candidate
    * union does. Each local pass is LINEAR, not the O(p²) block-nested
    * loop: sorted by (n DESC, s DESC), a point survives iff its s
    * strictly exceeds the best s among strictly-higher-n points AND it
    * heads its n-group (ties on both axes all survive — equals don't
    * dominate).
    *
    * Money is read in DECIMAL(18,2) and shipped as exact cents, so
    * dominance is integer-exact on both engines; the oracle is the
    * NOT-EXISTS definition.
    */
  /** Grouped Spearman rank correlation — the robust (monotone-invariant)
    * dependence measure: Pearson over the two variables' within-group
    * sort ranks (Spearman 1904, public). Rank-based dependence is the
    * standard check when heavy tails make raw-moment correlation
    * (corr_stats) unstable; a monotone transform of either variable
    * leaves it bit-identical (spec-held).
    *
    * Exactness: ranks come from TWO sequential window-free
    * [[ExactRank]] annotation passes over the same rows (the shared
    * unique-key tie-break makes both total orders deterministic; no
    * row-identity join is ever needed because exactRank ANNOTATES).
    * All six moment sums are exact longs (Σr·r ≤ n³/3 — fits a long to
    * n ≈ 2·10⁶ per group, the stated contract; beyond that the sums
    * enter DECIMAL, not needed here), cast to double only for the
    * final ρ arithmetic, which both engines run in the same IEEE order
    * under the e6 contract.
    *
    * Scale shape: two ExactRank passes (partition-width parallelism —
    * a `row_number OVER (PARTITION BY g)` would single-task each of
    * the 3 groups forever; the oracle states exactly that window
    * DEFINITION) + one partial-aggregable groupBy.
    */
  def spearmanCorr(lineitem: DataFrame): DataFrame = {
    val tie = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val base = lineitem.select(
      (col("l_returnflag").as("g") +: col("l_quantity").as("x") +:
        col("l_extendedprice").as("y") +: tie.map(col)): _*)
    val rx = ExactRank.exactRank(base, Seq("g"), "x" +: tie,
      rankCol = "rx", totalCol = "nx")
    val ry = ExactRank.exactRank(rx, Seq("g"), "y" +: tie,
      rankCol = "ry", totalCol = "ny")
    val m = ry.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sx2"),
        sum(col("ry") * col("ry")).as("sy2"))
    def d(c: String) = col(c).cast("double")
    m.select(col("g").as("l_returnflag"), col("n"),
        floor((d("n") * d("sxy") - d("sx") * d("sy")) /
          sqrt((d("n") * d("sx2") - d("sx") * d("sx")) *
            (d("n") * d("sy2") - d("sy") * d("sy"))) * 1e6 + 0.5)
          .cast("long").as("spearman_e6"))
      .orderBy(col("l_returnflag"))
  }

  /** Linear frontier scan (the [[skyline]] kernel); REQUIRES input
    * sorted by (n DESC, s DESC). A point survives iff its s strictly
    * exceeds the best s among strictly-higher-n points AND it ties its
    * n-group's head — equal points never dominate each other, so exact
    * duplicates all survive. Property-tested against brute-force
    * dominance on random multisets.
    */
  private[graft] def frontierScan(
      it: Iterator[(Long, Long, Long)]): Iterator[(Long, Long, Long)] = {
    var maxSHigher = Long.MinValue // best s among strictly-higher n
    var curN = Long.MinValue; var groupHead = Long.MinValue
    var started = false
    it.filter { case (_, n, s) =>
      if (!started || n != curN) {
        if (started && groupHead > maxSHigher) maxSHigher = groupHead
        curN = n; groupHead = s; started = true
      }
      s > maxSHigher && s == groupHead
    }
  }

  def skyline(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val pts = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        (max(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("max_order_cents"))
      .toDF("_1", "_2", "_3") // tuple-encoder names, stable across scans
      .as[(Long, Long, Long)]
    val sortCols = Seq(col("_2").desc, col("_3").desc)
    val local = pts
      .sortWithinPartitions(sortCols: _*)
      .mapPartitions(frontierScan)
    val global = local
      .repartition(1)
      .sortWithinPartitions(sortCols: _*)
      .mapPartitions(frontierScan)
    global.toDF("o_custkey", "n_orders", "max_order_cents")
      .orderBy(col("o_custkey"))
  }
}
