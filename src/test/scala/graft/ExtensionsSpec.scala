package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CoOccurrence, CrystalBall}
import graft.sources.BasketSource

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions installs co_occur_pairs and dot_d at session build") {
    val base = Specs.spark // ensure the shared context exists first
    // A sibling session over the SAME SparkContext, built with extensions.
    // (Do NOT stop it — that would stop the shared context; just restore
    // the default/active session afterwards.)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // (config("spark.sql.extensions", ...) is static conf — ignored when
      // the SparkContext already exists, so use withExtensions directly)
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne base)
      val pairs = s.sql(
        "SELECT co_occur_pairs(array('1', '2', '1', '3'))").collect()
      assert(pairs.map(r => (r.getString(0), r.getString(1))).toSeq ==
        Seq(("1", "2"), ("2", "1"), ("2", "3"), ("1", "3")))
      val dot = s.sql(
        "SELECT dot_d(array(1.0d, 2.0d), array(3.0d, 4.0d))").head.getDouble(0)
      assert(dot == 11.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("normalizeViaTotalsJoin equals window-based normalize") {
    val spark = Specs.spark
    val counts = CoOccurrence.counts(BasketSource.fromLines(spark, Seq(
      "Mary 34 56 29 12 34 56 92 29 34 12",
      "Kelly 92 29 12 34 79 29 56 12 34 18")))
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(toMap(CrystalBall.normalize(counts)) ==
      toMap(CrystalBall.normalizeViaTotalsJoin(counts)))
  }
}
