package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequent-items ("heavy hitters") via Misra-Gries candidate
  * pruning — the mergeable-summary pattern for corpus-scale token
  * statistics (Misra & Gries 1982; merge rule per Agarwal et al. 2012,
  * "Mergeable Summaries" — all public), finishing with an EXACT,
  * deterministic result.
  *
  * The naive `groupBy(token)` shuffles one row per distinct token —
  * vocabulary-sized, fine. What is NOT fine at 100 TB is asking for
  * "every token above an n/d support threshold" from an adversarial
  * vocabulary (URLs, hashes — distinct count ~ corpus size). The
  * Misra-Gries pass bounds that: each partition keeps at most `capacity`
  * counters (decrement-all on overflow), and the per-partition summaries
  * TREE-MERGE into one summary that is still ≤ `capacity` counters (the
  * merge adds counters, then subtracts the (capacity+1)-largest count
  * and drops non-positives — errors add, so the merged guarantee is
  * still n/(capacity+1)). A token with GLOBAL frequency > n/(capacity+1)
  * therefore survives the merged summary, making it a guaranteed
  * candidate SUPERSET of the true heavy hitters whose size never grows
  * with partition count — the naive union-of-survivors alternative is
  * capacity·partitions large (~10⁷ at 100k partitions), which is why the
  * merge matters. Exact counts then run over the candidate-filtered
  * stream only; the unbounded-vocabulary aggregation never happens.
  *
  * Plan shape: one bounded sketch job (mapPartitions → treeReduce — an
  * EAGER pass at call time, the [[Sampling.stratifiedSample]] bounded-
  * action discipline; ≤ capacity counters ever reach the driver), then a
  * lazy InSet filter + groupBy over candidates only. The support test
  * `freq · d > n` is integer-exact on both engines.
  *
  * `capacity` must be ≥ `d`, else the sketch could evict a true heavy
  * hitter (guarantee threshold n/(capacity+1) would sit ABOVE the
  * reported n/d support line).
  */
object HeavyHitters {

  /** Pure Misra-Gries pass: at most `capacity` counters; on overflow all
    * counters decrement and zeroed ones drop (each overflow burns
    * `capacity` tokens' worth of increments — amortized O(1)/token).
    * GUARANTEE (property-tested): the surviving keys include every token
    * whose frequency in `it` exceeds n/(capacity+1), and each surviving
    * count under-estimates the true frequency by at most n/(capacity+1).
    */
  /** One MG increment against a bounded counter map — the shared step of
    * the flat and grouped passes.
    */
  private[graft] def mgAdd(m: scala.collection.mutable.HashMap[String, Long],
      t: String, capacity: Int): Unit =
    m.get(t) match {
      case Some(c) => m.update(t, c + 1L)
      case None if m.size < capacity => m.update(t, 1L)
      case None =>
        val ks = m.keysIterator.toArray
        var i = 0
        while (i < ks.length) {
          val k = ks(i)
          val v = m(k)
          if (v == 1L) m.remove(k) else m.update(k, v - 1L)
          i += 1
        }
    }

  private[graft] def mgCounters(it: Iterator[String],
      capacity: Int): Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach(mgAdd(m, _, capacity))
    m.toMap
  }

  private[graft] def mgSketch(it: Iterator[String],
      capacity: Int): Iterator[String] = mgCounters(it, capacity).keysIterator

  /** Bounded merge of two MG summaries (Agarwal et al. 2012): add
    * counters; if over capacity, subtract the (capacity+1)-largest count
    * from every counter and drop non-positives — at most `capacity`
    * survive, and the two summaries' under-estimation errors ADD, so
    * tree-merging partition summaries preserves the global
    * n/(capacity+1) coverage guarantee (property-tested).
    */
  private[graft] def mgMerge(a: Map[String, Long], b: Map[String, Long],
      capacity: Int): Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    m ++= a
    b.foreach { case (k, v) => m.update(k, m.getOrElse(k, 0L) + v) }
    if (m.size <= capacity) m.toMap
    else {
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      val t = counts(m.size - capacity - 1) // (capacity+1)-th largest
      m.iterator.collect { case (k, v) if v > t => k -> (v - t) }.toMap
    }
  }

  /** Input contract: `documents` must be DETERMINISTIC across jobs — the
    * candidate sketch (pass 1) and the exact counts (pass 2) each scan the
    * token stream, and the superset guarantee only holds when both passes
    * see the same data. Parquet relations (every registered caller) are;
    * a sampled/streaming/changing source is not — persist such an input
    * before calling, or the candidate set silently loses its coverage
    * guarantee. (The two-scan shape is deliberate: persisting a 100 TB
    * token explosion to buy one scan costs more than the second scan.)
    */
  def heavyHitters(documents: DataFrame, d: Int = 100,
      capacity: Int = 256): DataFrame = {
    require(d >= 2, "heavyHitters: d must be >= 2 (support = n/d)")
    require(capacity >= d,
      s"heavyHitters: capacity $capacity < d $d voids the superset guarantee")
    val spark = documents.sparkSession
    import spark.implicits._

    val toks = documents
      .select(explode(split(col("text"), " ")).as("token")).as[String]

    // bounded eager sketch job: partition summaries tree-merge to ONE
    // ≤capacity-entry map on the driver
    val cap = capacity
    val summaries = toks.rdd
      .mapPartitions(it => Iterator.single(mgCounters(it, cap)))
    val candidates: Seq[String] =
      if (summaries.isEmpty()) Seq.empty
      else summaries.treeReduce((x, y) => mgMerge(x, y, cap)).keys.toSeq.sorted

    val tokDf = toks.toDF("token")
    val candidateFilter =
      if (candidates.isEmpty) lit(false)
      else col("token").isInCollection(candidates)
    tokDf
      .filter(candidateFilter)
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(tokDf.agg(count(lit(1)).as("_n"))))
      .filter(col("freq") * d > col("_n"))
      .select(col("token"), col("freq"), col("_n").as("n_tokens"))
      .orderBy(col("freq").desc, col("token"))
  }

  /** STRATIFIED heavy hitters — per-group frequent tokens ("what's
    * frequent in German but not overall" drives per-language stoplists
    * and boilerplate hunting). Same two-pass shape as [[heavyHitters]],
    * with per-group MG counter maps: pass 1 keeps ≤ capacity counters PER
    * GROUP per partition and tree-merges group-wise (each group's merged
    * summary keeps its own n_g/(capacity+1) guarantee over the group's
    * n_g tokens), pass 2 exact-counts candidate (group, token) pairs via
    * a broadcast semi-join. Driver/broadcast state is groups × capacity —
    * which is why `maxGroups` is a hard fail-fast contract, not a
    * heuristic cap: this operator is for LOW-CARDINALITY strata (lang,
    * source, bucket); an unbounded group key needs a different algorithm,
    * not a silent truncation. Same determinism contract on `documents` as
    * [[heavyHitters]] (two scans must see the same data).
    */
  def heavyHittersByGroup(documents: DataFrame, groupCol: String = "lang",
      d: Int = 100, capacity: Int = 256, maxGroups: Int = 1000): DataFrame = {
    require(d >= 2, "heavyHittersByGroup: d must be >= 2 (support = n_g/d)")
    require(capacity >= d,
      s"heavyHittersByGroup: capacity $capacity < d $d voids the superset guarantee")
    require(maxGroups >= 1, "heavyHittersByGroup: maxGroups must be >= 1")
    val spark = documents.sparkSession
    import spark.implicits._

    val pairs = documents
      .select(col(groupCol).cast("string").as("g"),
        explode(split(col("text"), " ")).as("token"))
      .as[(String, String)]

    val cap = capacity
    val maxG = maxGroups
    def checkGroups(n: Int): Unit =
      if (n > maxG) throw new IllegalStateException(
        s"heavyHittersByGroup: group cardinality exceeded maxGroups=$maxG — " +
          "this operator is for low-cardinality strata; pick a coarser key " +
          "or raise maxGroups knowingly (driver state is groups x capacity)")
    val summaries = pairs.rdd.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.HashMap[String, Long]]
      it.foreach { case (g, t) =>
        mgAdd(m.getOrElseUpdate(g, {
          checkGroups(m.size + 1)
          scala.collection.mutable.HashMap.empty[String, Long]
        }), t, cap)
      }
      Iterator.single(m.map { case (g, gm) => g -> gm.toMap }.toMap)
    }
    val merged: Map[String, Map[String, Long]] =
      if (summaries.isEmpty()) Map.empty
      else summaries.treeReduce { (a, b) =>
        val keys = a.keySet ++ b.keySet
        checkGroups(keys.size)
        keys.iterator.map(g => g -> mgMerge(a.getOrElse(g, Map.empty),
          b.getOrElse(g, Map.empty), cap)).toMap
      }
    val candidates = merged.iterator
      .flatMap { case (g, cm) => cm.keysIterator.map(t => (g, t)) }.toSeq

    val tokDf = pairs.toDF("g", "token")
    val counted =
      if (candidates.isEmpty) tokDf.filter(lit(false))
      else tokDf.join(broadcast(candidates.toDF("g", "token")), Seq("g", "token"))
    counted
      .groupBy(col("g"), col("token")).agg(count(lit(1)).as("freq"))
      .join(broadcast(
        tokDf.groupBy(col("g")).agg(count(lit(1)).as("n_tokens"))), Seq("g"))
      .filter(col("freq") * d > col("n_tokens"))
      .select(col("g").as(groupCol), col("token"), col("freq"), col("n_tokens"))
      .orderBy(col(groupCol), col("freq").desc, col("token"))
  }
}
