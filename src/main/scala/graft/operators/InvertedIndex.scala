package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction and phrase serving — the search-serving
  * half of a curated corpus (the retrieval family's exact-match
  * complement to [[TextAnalysis.bm25]]'s scoring).
  *
  * Scale shape: the index is the FLAT postings relation
  * `(token, doc_id, n_occ, positions)` — one row per (token, document),
  * positions doc-bounded — never a per-token postings ARRAY. A
  * collect_list over each token would put a stop word's entire
  * corpus-wide posting list into ONE row/one task (the classic skew
  * bomb at 100 TB); the flat relation keeps hot tokens spread across
  * partitions, aggregates with map-side combine, and is exactly what
  * [[graft.sources.TableSink.writeBucketed]] persists bucketed on
  * `token` for the build-once/serve-many discipline (the
  * ann_ivf_persisted shape) — a term lookup is then a partition-pruned
  * scan, no shuffle.
  */
object InvertedIndex {

  /** The flat postings relation: one row per (token, doc_id) with the
    * occurrence count and the sorted 0-based position list. One explode
    * + one partial-aggregable groupBy — no window, no per-token array.
    */
  def postings(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"),
        sort_array(collect_list(col("pos").cast("long"))).as("positions"))

  /** The registered build product (presentation-sorted postings). */
  def invertedIndex(documents: DataFrame): DataFrame =
    postings(documents).orderBy(col("token"), col("doc_id"))

  /** Driver-facing presentation of [[invertedIndex]]: the position list
    * serialized CSV (the `baskets` convention — the driver harness's
    * pandas compare cannot sort/hash array cells). Engine users and the
    * `phrase_*` consumers keep the ArrayType [[postings]] relation; the
    * serialization is row-local, so the scalable shape is unchanged.
    */
  def invertedIndexLines(documents: DataFrame): DataFrame =
    postings(documents)
      .select(col("token"), col("doc_id"), col("n_occ"),
        array_join(col("positions"), ",").as("positions"))
      .orderBy(col("token"), col("doc_id"))

  /** Exact two-term phrase search over the postings relation: documents
    * where `w1` is IMMEDIATELY followed by `w2`, with the adjacency hit
    * count. Each side is the token's postings (partition-pruned against
    * a bucketed index; a pushed-down token filter in-flight), the join
    * is a doc_id equi-join of two term-bounded relations, and the
    * adjacency test is row-local position arithmetic
    * (`(pa + 1) ∩ pb`) — positions are distinct by construction, so the
    * intersection size IS the hit count.
    */
  def phraseSearch(documents: DataFrame, w1: String = "table",
      w2: String = "hash"): DataFrame =
    phraseFromPostings(postings(documents), w1, w2)

  /** The serve half against ANY postings relation — in-flight
    * ([[phraseSearch]]) or read back from a TOKEN-BUCKETED catalog
    * table, where the equality filter on `token` prunes the scan to
    * one bucket's files (Spark bucket pruning — the partition-pruned
    * term lookup the index is persisted FOR).
    */
  def phraseFromPostings(p: DataFrame, w1: String = "table",
      w2: String = "hash"): DataFrame = {
    val a = p.filter(col("token") === w1)
      .select(col("doc_id"), col("positions").as("pa"))
    val b = p.filter(col("token") === w2)
      .select(col("doc_id"), col("positions").as("pb"))
    a.join(b, "doc_id")
      .select(col("doc_id"),
        size(array_intersect(
          transform(col("pa"), x => x + 1L), col("pb"))).cast("long")
          .as("n_hits"))
      .filter(col("n_hits") > 0)
      .orderBy(col("doc_id"))
  }
}
