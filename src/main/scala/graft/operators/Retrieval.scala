package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-stage composition: hybrid lexical+semantic ranking — the
  * query-time half of a RAG corpus, built from the engine's two existing
  * scale-certified rankers (BM25 over the token relation, exact cosine
  * over the embedding column).
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009): each
    * ranker contributes `1/(K + rank)` for the documents on its top-`depth`
    * list, and documents are re-ranked by the sum. Rank positions are the
    * ONLY signal — which is what makes RRF robust to incomparable score
    * scales (a BM25 logit and a cosine do not share units) and what makes
    * this relation hash-exact across engines: each contribution is
    * `floor(1e6 / (K + rank))` of exact integers, and the fused score is
    * a two-term INTEGER sum — no cross-engine float-accumulation drift
    * by construction.
    *
    * Scale shape: all the heavy lifting happens inside the two rankers
    * (BM25: token explode + partial-aggregable counts; cosine: one
    * broadcast 1-row query against a linear corpus scan) — both already
    * scale-audited. The fusion itself joins two depth-bounded lists
    * (≤ `depth` rows each), so its global rank window is over ≤ 2·depth
    * rows — bounded work regardless of corpus size. A document on only
    * one list still fuses (full outer join, absent side contributes 0) —
    * rank-list truncation must not silently drop candidates.
    */
  def rrfFusion(documents: DataFrame, embeddings: DataFrame,
      queryTerms: Seq[String] = TextAnalysis.DefaultBm25Query,
      queryVecId: Long = 0L, depth: Int = 20, rrfK: Int = 60,
      topN: Int = 20): DataFrame = {
    require(depth >= 1 && topN >= 1 && rrfK >= 1,
      s"rrfFusion: depth/topN/rrfK must be >= 1, got $depth/$topN/$rrfK")
    fuse(documents,
      Similarity.queryTopK(embeddings, queryVecId, depth),
      queryTerms, depth, rrfK, topN)
  }

  /** [[rrfFusion]] with the semantic leg served from the PERSISTED
    * bucketed IVF index instead of the exact corpus scan
    * ([[graft.operators.Similarity.queryTopKFromIndex]]: driver-side
    * probe-cell choice → literal IN filter → statically bucket-pruned
    * index read). The BM25 leg and the fusion arithmetic are shared
    * with [[rrfFusion]] by construction; with a probe set covering the
    * query's true top-`depth` (recall 1) the output is bit-identical —
    * which is how the driver checks it, against rrf_fusion's own oracle
    * text. At 100 TB this is the difference between a retrieval serve
    * that reads `numProbes` cells' files and one that scans every
    * embedding per query.
    */
  def rrfFusionIndexed(documents: DataFrame, index: DataFrame,
      queryTerms: Seq[String] = TextAnalysis.DefaultBm25Query,
      queryVecId: Long = 0L, depth: Int = 20, rrfK: Int = 60,
      topN: Int = 20, numProbes: Int = 12): DataFrame = {
    require(depth >= 1 && topN >= 1 && rrfK >= 1,
      s"rrfFusionIndexed: depth/topN/rrfK must be >= 1, got $depth/$topN/$rrfK")
    fuse(documents,
      Similarity.queryTopKFromIndex(index, queryVecId, depth,
        numProbes = numProbes),
      queryTerms, depth, rrfK, topN)
  }

  /** The fusion tail shared by the exact-scan and indexed serves: the
    * two rank lists are depth-bounded, so the full-outer join and the
    * global rank window touch ≤ 2·depth rows at any corpus size. */
  private def fuse(documents: DataFrame, semTopK: DataFrame,
      queryTerms: Seq[String], depth: Int, rrfK: Int,
      topN: Int): DataFrame = {
    val lex = TextAnalysis.bm25(documents, queryTerms, topN = depth)
      .select(col("doc_id"), col("rk").cast("long").as("lex_rk"))
    val sem = semTopK
      .select(col("other_id").as("doc_id"), col("rk").cast("long").as("sem_rk"))
    def contrib(rk: String) = coalesce(
      floor(lit(1000000.0) / (lit(rrfK.toLong) + col(rk))).cast("long"),
      lit(0L))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rk"), col("sem_rk"),
        (contrib("lex_rk") + contrib("sem_rk")).as("rrf_e6"))
      // bounded window: ≤ 2·depth fused rows exist at ANY corpus size
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rrf_e6").desc, col("doc_id"))).cast("long"))
      .filter(col("rk") <= topN)
      .select(col("rk"), col("doc_id"), col("lex_rk"), col("sem_rk"),
        col("rrf_e6"))
      .orderBy(col("rk"))
  }
}
