package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FuzzyJoin

/** Blocked edit-distance join checked against hand-computed distances,
  * including the two deliberate bounds: the distance threshold and the
  * first-token block (a cross-block near-match is NOT emitted — the
  * documented recall tradeoff that buys the equi-join shape).
  */
class FuzzyJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Specs.spark

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "alpha centauri prime"),
      (2L, "alpha centauri prine"),   // dist 1 from #1, same block
      (3L, "alpha centxuri prixx"),   // dist 3 from #1, same block
      (4L, "alpha completely different tail xyz"), // same block, far
      (5L, "blpha centauri prime")    // dist 1 from #1, DIFFERENT block
    ).toDF("id", "s")
  }

  test("emits exactly the within-block within-threshold pairs") {
    val got = FuzzyJoin.blockedSelfJoin(fixture, "id", "s", 3)
      .orderBy(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // 1-2 dist 1, 1-3 dist 3, 2-3 dist 3; 4 same block but far (dropped
    // by threshold), 5 out of block despite dist 1 from #1 — the blocking
    // recall tradeoff
    assert(got.toSeq == Seq((1L, 2L, 1), (1L, 3L, 3), (2L, 3L, 3)))
  }

  test("threshold distances equal the unbounded levenshtein") {
    // the banded early-abandon overload must agree with the full DP on
    // every pair it keeps
    val pairs = FuzzyJoin.blockedSelfJoin(fixture, "id", "s", 3)
    val withFull = pairs
      .join(fixture.select(col("id").as("id_a"), col("s").as("sa")), "id_a")
      .join(fixture.select(col("id").as("id_b"), col("s").as("sb")), "id_b")
      .withColumn("full", levenshtein(col("sa"), col("sb")))
    assert(withFull.filter(col("dist") =!= col("full")).count() === 0)
  }

  test("no self-pairs, no duplicate orientations") {
    val got = FuzzyJoin.blockedSelfJoin(fixture, "id", "s", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.forall { case (a, b) => a < b })
    assert(got.distinct.length == got.length)
  }

  test("maxDist 0 degenerates to exact-duplicate pairs") {
    import spark.implicits._
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "same texx"))
      .toDF("id", "s")
    val got = FuzzyJoin.blockedSelfJoin(df, "id", "s", 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 0)))
  }
}
