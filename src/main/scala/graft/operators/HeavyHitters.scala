package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequent-items ("heavy hitters") via Misra-Gries candidate
  * pruning — the mergeable-summary pattern for corpus-scale token
  * statistics (Misra & Gries 1982; the `freqItems` family's guarantee,
  * but finishing with an EXACT, deterministic result).
  *
  * The naive `groupBy(token)` shuffles one row per distinct token —
  * vocabulary-sized, fine. What is NOT fine at 100 TB is asking for
  * "every token above an n/d support threshold" from an adversarial
  * vocabulary (URLs, hashes — distinct count ~ corpus size). The
  * Misra-Gries pass bounds that: each partition keeps at most `capacity`
  * counters (decrement-all on overflow), and a token with GLOBAL
  * frequency > n/(capacity+1) must exceed the local threshold in at
  * least one partition (pigeonhole), so the union of per-partition
  * survivors is a guaranteed candidate SUPERSET of the true heavy
  * hitters. Exact counts then run over the candidate-filtered stream
  * only — the unbounded-vocabulary aggregation never happens.
  *
  * Plan shape: mapPartitions sketch (no shuffle) → distinct over ≤
  * capacity·partitions candidate rows (tiny) → broadcast semi-join back
  * onto the token stream → groupBy over candidates only. Fully lazy; the
  * support test `freq · d > n` is integer-exact on both engines.
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
    * whose frequency in `it` exceeds n/(capacity+1).
    */
  private[graft] def mgSketch(it: Iterator[String],
      capacity: Int): Iterator[String] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
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
    }
    m.keysIterator
  }

  def heavyHitters(documents: DataFrame, d: Int = 100,
      capacity: Int = 256): DataFrame = {
    require(d >= 2, "heavyHitters: d must be >= 2 (support = n/d)")
    require(capacity >= d,
      s"heavyHitters: capacity $capacity < d $d voids the superset guarantee")
    val spark = documents.sparkSession
    import spark.implicits._

    val toks = documents
      .select(explode(split(col("text"), " ")).as("token")).as[String]

    // Misra-Gries per partition: at most `capacity` counters survive
    val cap = capacity
    val candidates = toks
      .mapPartitions(it => mgSketch(it, cap))
      .toDF("token").distinct()

    val withTotal = toks.toDF("token")
      .join(broadcast(candidates), Seq("token"), "left_semi")
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(
        toks.toDF("token").agg(count(lit(1)).as("_n"))))

    withTotal
      .filter(col("freq") * d > col("_n"))
      .select(col("token"), col("freq"), col("_n").as("n_tokens"))
      .orderBy(col("freq").desc, col("token"))
  }
}
