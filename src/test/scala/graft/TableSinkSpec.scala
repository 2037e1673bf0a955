package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TableSink

/** Layout-driven shuffle elimination: partition pruning and co-located
  * bucketed joins, asserted at the physical-plan level.
  */
class TableSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Specs.spark
  private val sf = "/root/testdata/sf0.001"

  test("partitioned write enables partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    TableSink.writePartitioned(li, s"$dir/li_part", Seq("l_returnflag"))
    val pruned = spark.read.parquet(s"$dir/li_part")
      .filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"), s"no partition filters:\n$plan")
    // and the result is right
    assert(pruned.count() ==
      li.filter(col("l_returnflag") === "R").count())
  }

  test("ORC partitioned layout round-trips and prunes like parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    TableSink.writePartitioned(li, s"$dir/li_orc", Seq("l_returnflag"), "orc")
    val back = spark.read.orc(s"$dir/li_orc")
    assert(back.count() == li.count())
    val pruned = back.filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"), s"no ORC partition filters:\n$plan")
    // value-preserving across the format change, not just row counts
    val a = back.agg(sum(col("l_quantity").cast("decimal(18,2)"))).collect()(0).get(0)
    val b = li.agg(sum(col("l_quantity").cast("decimal(18,2)"))).collect()(0).get(0)
    assert(a == b)
  }

  test("same-bucket tables sort-merge-join without exchanges") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey")
    TableSink.writeBucketed(li, "li_bkt", "l_orderkey", 4)
    TableSink.writeBucketed(o, "o_bkt", "o_orderkey", 4)
    // disable auto-broadcast: at test scale the join would otherwise plan
    // BroadcastHashJoin and the assertion would hold vacuously
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
