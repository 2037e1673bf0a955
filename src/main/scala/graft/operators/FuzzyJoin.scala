package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked edit-distance (fuzzy) self-join — record linkage over short
  * strings (titles, names, URLs), the character-level member of the dedup
  * family: ngram_jaccard/minhash see token sets, this sees typos.
  *
  * All-pairs levenshtein is O(n²·L²) and unshippable at corpus scale; the
  * standard discipline is BLOCKING: only pairs sharing a cheap candidate
  * key are compared. The key here is the string's first token — an
  * explicit recall heuristic (an edit inside the leading token moves a
  * pair out of its block) traded for turning the cross product into a
  * per-block self-equi-join whose quadratic is bounded by the hottest
  * block. At 100 TB the block-key cardinality grows with the corpus, the
  * equi-join shuffle stays linear, and a hot block (every title starting
  * "the") is AQE-splittable on the probe side.
  *
  * Two bounds run before any O(L²) work: the length pre-filter
  * (|len(a)-len(b)| <= maxDist is a lower bound on edit distance) is pure
  * codegen'd arithmetic, and the distance itself uses Spark's THRESHOLD
  * levenshtein overload — O(L·maxDist) banded DP that abandons early and
  * returns -1 past the bound, instead of filling the full matrix to
  * discard it. Both are built-ins; no UDF.
  */
object FuzzyJoin {

  /** Pairs (id_a < id_b) whose strCol values are within maxDist edits,
    * among rows sharing a first-token block: (id_a, id_b, dist). */
  def blockedSelfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val blk = split(col(strCol), " ").getItem(0)
    val a = df.select(col(idCol).as("id_a"), col(strCol).as("s_a"),
      blk.as("blk"))
    val b = df.select(col(idCol).as("id_b"), col(strCol).as("s_b"),
      blk.as("blk"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
