package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.BasketSource
import graft.operators._

/** The second half of [[SparkEntry.oracleSql]]'s registration list —
  * the MinHash/LSH replay chains, HTML-link fixtures and their SQL
  * twins, and the `oracleSqlRest`/`oracleSqlRest2` registration seams
  * (kept as the two Seqs they always were; SparkEntry concatenates and
  * duplicate-guards).
  */
private[graft] trait SparkEntryOracleRest extends SparkEntryOracleBuilders {



  /** The S-curve oracle: ONE signature relation, one exact-Jaccard
    * truth, then per banding config the capped band self-join (QUALIFY
    * row_number ≤ maxBucket — the engine's WindowGroupLimit cut) with
    * NO est-Jaccard filter, presence-joined against truth.
    */
  private[graft] lazy val lshScurveSql: String = {
    val configs = Seq((2, 8), (4, 4), (8, 2))
    val mins = (0 until Dedup.NumHashes).map(k =>
      s"min((h * ${Dedup.minhashA(k)} + ${Dedup.minhashB(k)}) % ${Dedup.MinhashP}) AS mh$k")
      .mkString(",\n    ")
    def cfg(b: Int, r: Int): String = {
      val bandRows = (0 until b).map { i =>
        val cols = (0 until r).map(q => s"mh${i * r + q} AS b$q")
          .mkString(", ")
        s"  SELECT doc_id, $i AS band, $cols FROM mh"
      }.mkString("\n  UNION ALL\n")
      val keyCols = (0 until r).map(q => s"b$q").mkString(", ")
      val joinCond = (0 until r).map(q => s"x.b$q = y.b$q").mkString(" AND ")
      val thrE6 = math.floor(Dedup.lshThreshold(b, r) * 1e6).toLong
      s""",
        |bands_${b}_$r AS MATERIALIZED (
        |$bandRows),
        |capped_${b}_$r AS MATERIALIZED (
        |  SELECT doc_id, band, $keyCols FROM (
        |    SELECT *, row_number() OVER (PARTITION BY band, $keyCols
        |      ORDER BY doc_id) AS rk
        |    FROM bands_${b}_$r) WHERE rk <= ${Dedup.MaxBandBucket}),
        |row_${b}_$r AS (
        |  SELECT CAST($b AS INT) AS bands, CAST($r AS INT) AS rows_per_band,
        |    CAST($thrE6 AS BIGINT) AS threshold_e6,
        |    CAST(sum(tt.t) AS BIGINT) AS n_true,
        |    CAST(sum(cc.c) AS BIGINT) AS n_candidates,
        |    CAST(sum(CASE WHEN tt.t IS NOT NULL AND cc.c IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
        |  FROM (SELECT doc_a, doc_b, 1 AS t FROM truth) tt
        |  FULL OUTER JOIN (
        |    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, 1 AS c
        |    FROM capped_${b}_$r x JOIN capped_${b}_$r y
        |      ON x.band = y.band AND $joinCond AND x.doc_id < y.doc_id
        |  ) cc USING (doc_a, doc_b))""".stripMargin
    }
    shinglesCte +
      s""", dfreq AS (SELECT shingle FROM sh GROUP BY shingle
        |           HAVING count(*) <= ${Dedup.MaxShingleDocFreq}),
        |shc AS (SELECT s.doc_id, s.shingle FROM sh s JOIN dfreq USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |truth AS MATERIALIZED (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) >= 0.5),
        |hs AS (
        |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 14))::BIGINT AS h FROM sh
        |), mh AS MATERIALIZED (
        |  SELECT doc_id,
        |    $mins
        |  FROM hs GROUP BY doc_id
        |)""".stripMargin +
      configs.map { case (b, r) => cfg(b, r) }.mkString +
      "\n" +
      configs.map { case (b, r) => s"SELECT * FROM row_${b}_$r" }
        .mkString("\nUNION ALL\n") +
      "\nORDER BY bands"
  }

  private[graft] lazy val minhashLshSql: String =
    minhashScoredCte +
      """SELECT doc_a, doc_b, est_jaccard
      |FROM scored ORDER BY doc_a, doc_b""".stripMargin

  // both orientations of the undirected scored pairs, per-doc top-k by
  // (est_jaccard desc, partner id) — minhashPartners' rank cut replayed
  private[graft] lazy val minhashPartnersSql: String =
    minhashScoredCte +
      """, directed AS (
      |  SELECT doc_a AS doc_id, doc_b AS partner_id, est_jaccard FROM scored
      |  UNION ALL
      |  SELECT doc_b AS doc_id, doc_a AS partner_id, est_jaccard FROM scored
      |)
      |SELECT doc_id, partner_id, est_jaccard,
      |  CAST(row_number() OVER (PARTITION BY doc_id
      |    ORDER BY est_jaccard DESC, partner_id) AS BIGINT) AS rk
      |FROM directed
      |QUALIFY rk <= 5
      |ORDER BY doc_id, rk""".stripMargin

  // a minhash signature depends only on its own doc, so the oracle
  // computes signatures corpus-wide and splits by the mod-10 predicate;
  // ties on est_jaccard (exact multiples of 1/16) resolve to min base id
  private[graft] lazy val minhashIncrementalSql: String = {
    val mins = (0 until Dedup.NumHashes).map(k =>
      s"min((h * ${Dedup.minhashA(k)} + ${Dedup.minhashB(k)}) % ${Dedup.MinhashP}) AS mh$k")
      .mkString(",\n    ")
    val rowsPerBand = Dedup.NumHashes / Dedup.NumBands
    val bandRows = (0 until Dedup.NumBands).map { b =>
      val cols = (0 until rowsPerBand)
        .map(r => s"mh${b * rowsPerBand + r} AS b$r").mkString(", ")
      s"SELECT doc_id, $b AS band, $cols FROM mh"
    }.mkString("\n  UNION ALL ")
    val bandJoin = (0 until rowsPerBand)
      .map(r => s"x.b$r = y.b$r").mkString(" AND ")
    val agree = (0 until Dedup.NumHashes)
      .map(k => s"(CASE WHEN a.mh$k = b.mh$k THEN 1 ELSE 0 END)")
      .mkString(" + ")
    shinglesCte +
      s""", hs AS (
      |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 14))::BIGINT AS h FROM sh
      |), mh AS (
      |  SELECT doc_id,
      |    $mins
      |  FROM hs GROUP BY doc_id
      |), bands AS (
      |  $bandRows
      |), cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS dup_of
      |  FROM bands x JOIN bands y
      |    ON x.band = y.band AND $bandJoin
      |  WHERE x.doc_id % 10 = 0 AND y.doc_id % 10 <> 0
      |), matched AS (
      |  SELECT cand.doc_id, cand.dup_of,
      |    CAST($agree AS DOUBLE) / ${Dedup.NumHashes}.0 AS est_jaccard
      |  FROM cand JOIN mh a ON a.doc_id = cand.doc_id
      |    JOIN mh b ON b.doc_id = cand.dup_of
      |  WHERE CAST($agree AS DOUBLE) / ${Dedup.NumHashes}.0 >= 0.25
      |), best AS (
      |  SELECT doc_id, max(est_jaccard) AS est_jaccard
      |  FROM matched GROUP BY doc_id
      |)
      |SELECT m.doc_id, min(m.dup_of) AS dup_of, m.est_jaccard
      |FROM matched m JOIN best USING (doc_id, est_jaccard)
      |GROUP BY m.doc_id, m.est_jaccard
      |ORDER BY doc_id""".stripMargin
  }

  private[graft] lazy val oracleSqlRest: Seq[(String, String)] = Seq(
    "dedup_incremental" -> minhashIncrementalSql,
    // the persisted-index probe must produce the in-flight probe's exact
    // result — same oracle text (the ann_ivf_persisted convention)
    "dedup_persisted" -> minhashIncrementalSql,
    "dedup_appended" -> minhashIncrementalSql,
    // the checkpointed micro-batch replay across a stop/restart must
    // reproduce the one-shot probe bit-for-bit — same oracle text
    "dedup_incremental_stream" -> minhashIncrementalSql,
    "simhash" ->
      (simhashFpCte + "\nSELECT doc_id, c0, c1, c2, c3 FROM fp ORDER BY doc_id"),
    "simhash_pairs" ->
      (simhashFpCte +
        """, r AS (SELECT doc_id AS doc_b, c0 AS d0, c1 AS d1, c2 AS d2, c3 AS d3 FROM fp),
        |cand AS (
        |  SELECT DISTINCT f.doc_id, r.doc_b, f.c0, f.c1, f.c2, f.c3, r.d0, r.d1, r.d2, r.d3
        |  FROM fp f JOIN r ON f.doc_id < r.doc_b
        |    AND (f.c0 = r.d0 OR f.c1 = r.d1 OR f.c2 = r.d2 OR f.c3 = r.d3))
        |SELECT doc_id AS doc_a, doc_b,
        |  CAST(bit_count(xor(c0, d0)) + bit_count(xor(c1, d1))
        |     + bit_count(xor(c2, d2)) + bit_count(xor(c3, d3)) AS INTEGER) AS hamming
        |FROM cand
        |WHERE bit_count(xor(c0, d0)) + bit_count(xor(c1, d1))
        |    + bit_count(xor(c2, d2)) + bit_count(xor(c3, d3)) <= 12
        |ORDER BY doc_a, doc_b""".stripMargin),
    // per-document k nearest partners over HOT-BUCKET-CAPPED banded
    // candidates (first maxBucket=64 members per (chunk, value), then
    // pairs within the cap) — the identical deterministic cut
    "simhash_partners" ->
      (simhashFpCte + partnersReplaySql),
    // simhash_partners' capped-candidate + rank-cut replay over the
    // dHash fingerprint CTE
    "phash_partners" ->
      (phashFpCte + partnersReplaySql),
    // temporal-dHash fingerprints from doc_id arithmetic + the same
    // capped-partner replay (simhash_partners' SQL over videoFpCte)
    "video_phash_partners" ->
      (videoFpCte + partnersReplaySql),
    // window-energy gradient fingerprints from doc_id arithmetic + the
    // same capped-partner replay (simhash_partners' SQL over audioFpCte)
    "audio_phash_partners" ->
      (audioFpCte + partnersReplaySql),
    // the cluster composition: banded candidates -> Hamming pairs ->
    // transitive closure (cosine_clusters' recursive-CTE pattern over
    // the dHash fingerprint CTE)
    "phash_clusters" ->
      ("WITH RECURSIVE" + phashFpCte.stripPrefix("WITH") +
        """, r AS (SELECT doc_id AS doc_b, c0 AS d0, c1 AS d1, c2 AS d2, c3 AS d3 FROM fp),
        |cand AS (
        |  SELECT DISTINCT f.doc_id, r.doc_b, f.c0, f.c1, f.c2, f.c3, r.d0, r.d1, r.d2, r.d3
        |  FROM fp f JOIN r ON f.doc_id < r.doc_b
        |    AND (f.c0 = r.d0 OR f.c1 = r.d1 OR f.c2 = r.d2 OR f.c3 = r.d3)),
        |pairs AS (
        |  SELECT doc_id AS doc_a, doc_b FROM cand
        |  WHERE bit_count(xor(c0, d0)) + bit_count(xor(c1, d1))
        |      + bit_count(xor(c2, d2)) + bit_count(xor(c3, d3)) <= 12),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
        |reach AS (
        |  SELECT src AS node, dst AS r FROM edges
        |  UNION
        |  SELECT reach.node, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
        |cl AS (
        |  SELECT node AS doc_id, least(node, min(r)) AS cluster_id
        |  FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS n_members
        |FROM cl ORDER BY doc_id""".stripMargin),
    // same banded-candidate replay as simhash_pairs over the dHash
    // fingerprint CTE (PNG-lossless decode = byte math, see phashFpCte)
    "phash_pairs" ->
      (phashFpCte +
        """, r AS (SELECT doc_id AS doc_b, c0 AS d0, c1 AS d1, c2 AS d2, c3 AS d3 FROM fp),
        |cand AS (
        |  SELECT DISTINCT f.doc_id, r.doc_b, f.c0, f.c1, f.c2, f.c3, r.d0, r.d1, r.d2, r.d3
        |  FROM fp f JOIN r ON f.doc_id < r.doc_b
        |    AND (f.c0 = r.d0 OR f.c1 = r.d1 OR f.c2 = r.d2 OR f.c3 = r.d3))
        |SELECT doc_id AS doc_a, doc_b,
        |  CAST(bit_count(xor(c0, d0)) + bit_count(xor(c1, d1))
        |     + bit_count(xor(c2, d2)) + bit_count(xor(c3, d3)) AS INTEGER) AS hamming
        |FROM cand
        |WHERE bit_count(xor(c0, d0)) + bit_count(xor(c1, d1))
        |    + bit_count(xor(c2, d2)) + bit_count(xor(c3, d3)) <= 12
        |ORDER BY doc_a, doc_b""".stripMargin),
    "cosine_pairs" ->
      (embedCte +
        s""", s AS (
        |  SELECT * FROM n ORDER BY vec_id LIMIT ${Similarity.MaxBruteForceQueries}
        |), p AS (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS other_id,
        |    CAST(floor($dotExpr / (a.nrm * b.nrm) * 1000000.0) AS BIGINT) AS cos_e6
        |  FROM s a JOIN s b ON a.vec_id < b.vec_id)
        |SELECT vec_id, other_id, cos_e6 FROM p
        |WHERE cos_e6 >= 400000 ORDER BY vec_id, other_id""".stripMargin),
    "cosine_clusters" ->
      ("WITH RECURSIVE" + embedCte.stripPrefix("WITH") +
        s""", s AS (
        |  SELECT * FROM n ORDER BY vec_id LIMIT ${Similarity.MaxBruteForceQueries}
        |), p AS (
        |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
        |    CAST(floor($dotExpr / (a.nrm * b.nrm) * 1000000.0) AS BIGINT) AS cos_e6
        |  FROM s a JOIN s b ON a.vec_id < b.vec_id),
        |pairs AS (SELECT doc_a, doc_b FROM p WHERE cos_e6 >= 400000),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
        |reach AS (
        |  SELECT src AS node, dst AS r FROM edges
        |  UNION
        |  SELECT reach.node, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
        |cl AS (
        |  SELECT node AS doc_id, least(node, min(r)) AS cluster_id
        |  FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS n_members
        |FROM cl ORDER BY doc_id""".stripMargin),
    "ann_topk" -> annTopkOracle,
    "ann_lsh_topk" ->
      (s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), wb AS (
        |  SELECT vec_id, v, $lshBucketExpr AS bucket FROM e
        |), n AS (
        |  SELECT vec_id, v, bucket, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM wb
        |), p AS (
        |  SELECT a.vec_id AS vec_id, a.bucket AS bucket, b.vec_id AS other_id,
        |    CAST(floor($dotExpr / (a.nrm * b.nrm) * 1000000.0) AS BIGINT) AS cos_e6
        |  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
        |SELECT vec_id, bucket, other_id, cos_e6, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_e6 DESC, other_id) AS rk
        |  FROM p)
        |WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin),
    "ann_lsh_multi" ->
      (s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), wb AS (
        |  SELECT vec_id, v, ${lshBucketExprFor(0)} AS bt0,
        |    ${lshBucketExprFor(1)} AS bt1 FROM e
        |), n AS (
        |  SELECT vec_id, v, bt0, bt1,
        |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM wb
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS other_id
        |  FROM n a JOIN n b
        |    ON (a.bt0 = b.bt0 OR a.bt1 = b.bt1) AND a.vec_id <> b.vec_id
        |), p AS (
        |  SELECT c.vec_id, c.other_id,
        |    CAST(floor($dotExpr / (a.nrm * b.nrm) * 1000000.0) AS BIGINT) AS cos_e6
        |  FROM cand c JOIN n a ON a.vec_id = c.vec_id
        |  JOIN n b ON b.vec_id = c.other_id)
        |SELECT vec_id, other_id, cos_e6, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_e6 DESC, other_id) AS rk
        |  FROM p)
        |WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin),
    "ann_ivf_topk" -> annIvfTopKOracle,
    "ann_partners" -> annPartnersOracle,
    "ann_partners_auto" -> (embedCte + annPartnersOracleBody(64,
      "vec_id < (SELECT greatest(4, least(4096, count(*) // 256)) FROM embeddings)")),
    // decoded-raster features replayed from the text bytes (PNG-lossless)
    "image_embed_real" ->
      (imageEmbedFeatCte +
        """
        |SELECT doc_id,
        |  CAST(max(CASE WHEN q = 0 THEN lum END) AS BIGINT) AS f0,
        |  CAST(max(CASE WHEN q = 1 THEN lum END) AS BIGINT) AS f1,
        |  CAST(max(CASE WHEN q = 2 THEN lum END) AS BIGINT) AS f2,
        |  CAST(max(CASE WHEN q = 3 THEN lum END) AS BIGINT) AS f3,
        |  CAST(max(CASE WHEN q = 0 THEN grad END) AS BIGINT) AS f4,
        |  CAST(max(CASE WHEN q = 1 THEN grad END) AS BIGINT) AS f5,
        |  CAST(max(CASE WHEN q = 2 THEN grad END) AS BIGINT) AS f6,
        |  CAST(max(CASE WHEN q = 3 THEN grad END) AS BIGINT) AS f7
        |FROM feat GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // the decode→embed→bounded-kNN composition over the 8-dim descriptor
    "image_ann_partners" -> imageAnnPartnersOracle,
    // decoded-sample energy profile replayed from doc_id arithmetic
    // (PCM-in-WAV lossless)
    "audio_embed_real" -> mediaEmbedScalarsSql(audioEmbedValueExpr),
    "audio_ann_partners" ->
      (docArithmeticEmbedCte(audioEmbedValueExpr) + annPartnersOracleBody(8)),
    // demuxed constant-plane luma profile replayed from doc_id arithmetic
    "video_embed_real" -> mediaEmbedScalarsSql(videoEmbedValueExpr),
    "video_ann_partners" ->
      (docArithmeticEmbedCte(videoEmbedValueExpr) + annPartnersOracleBody(8)),
    // the persisted-index serve must produce the in-flight serve's exact
    // result — same oracle text
    "ann_ivf_persisted" -> annIvfTopKOracle,
    // the appended index serves bit-identically to a one-shot rebuild:
    // same frozen quantizer, same cells, same oracle text
    "ann_index_append" -> annIvfTopKOracle,
    // base + 2 appends + compaction serve == the one-shot build's serve
    "ann_index_compacted" -> annIvfTopKOracle,
    "ann_batch_serve" -> annBatchServeOracle,
    // append + compaction preserve index rows exactly, so the lifecycle
    // twin's bounded serve == the one-shot batch serve — same oracle text
    "ann_lifecycle_serve" -> annBatchServeOracle,
    "pq_encode" -> pqEncodeOracle,
    "pq_encode_residual" -> pqEncodeResidualOracle,
    "pq_residual_gain" -> pqResidualGainOracle,
    "pq_recall_residual" -> pqRecallOracleWith(annIvfpqResidualOracle),
    "pq_recall_rerank" -> pqRecallOracleWith(annIvfpqRerankOracle),
    "pq_recall" -> pqRecallOracle,
    "matryoshka_recall" -> matryoshkaOracle,
    // neighbor lists from annTopkOracle; vote = row_number over
    // (cnt DESC, label) = the engine's min(struct(-cnt, label))
    "knn_label_eval" ->
      (s"""WITH t AS ($annTopkOracle
        |), lab AS (SELECT vec_id, label FROM embeddings
        |), v AS (
        |  SELECT t.vec_id, l.label, count(*) AS c
        |  FROM t JOIN lab l ON l.vec_id = t.other_id GROUP BY 1, 2
        |), p AS (
        |  SELECT vec_id, label AS pred FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY c DESC, label) AS r FROM v)
        |  WHERE r = 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(CASE WHEN p.pred = l.label THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_correct,
        |  CAST(sum(CASE WHEN p.pred = l.label THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS accuracy_e6
        |FROM p JOIN lab l USING (vec_id)""".stripMargin),
    "pq_recall_auto" -> pqRecallOracleWith(annIvfpqAutoOracle),
    "pq_recall_imi" -> pqRecallOracleWith(annIvfpqImiOracle),
    // the head-bounded PRIMARY serves: each full serve oracle replayed
    // whole (so the primary can never drift from its audit twin's index
    // math) and cut to the registered ServeHead query batch — the index
    // side is query-independent, so the head rows are bit-identical
    "ann_ivfpq_serve" -> headServeOracle(annIvfpqOracle, "adc_e6"),
    "ann_ivfpq_imi_serve" -> headServeOracle(annIvfpqImiOracle, "adc_e6"),
    "ann_ivfpq_residual_serve" ->
      headServeOracle(annIvfpqResidualOracle, "adc_e6"),
    "ann_ivfpq_rerank_serve" ->
      headServeOracle(annIvfpqRerankOracle, "cos_e6"),
    "ivf_probe_recall" -> ivfProbeRecallOracle(Seq(1, 2, 4)),
    "hard_negatives" -> hardNegativesOracle,
    "bitext_mine" -> bitextMineOracle,
    // the streamed probe must equal the one-shot probe of the same query
    // set (mod-10 vectors) against the full-corpus index — the
    // dedup_incremental_stream replay convention
    "ann_ivf_stream" ->
      (embedCte +
        s""", cents AS (
        |  SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 16
        |), scored AS (
        |  SELECT a.vec_id, a.v, a.nrm, c.cent_id,
        |    CAST(floor(list_sum(list_transform(range(1, 65), i -> a.v[i] * c.cv[i])) / (a.nrm * c.cnrm) * 1000000.0) AS BIGINT) AS cscore
        |  FROM n a CROSS JOIN cents c
        |), assigned AS (
        |  SELECT vec_id, v, nrm, cent_id AS cluster FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cscore DESC, cent_id) AS crk
        |    FROM scored) WHERE crk = 1
        |), p AS (
        |  SELECT a.vec_id AS vec_id, a.cluster AS cluster, b.vec_id AS other_id,
        |    CAST(floor($dotExpr / (a.nrm * b.nrm) * 1000000.0) AS BIGINT) AS cos_e6
        |  FROM assigned a JOIN assigned b
        |    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
        |  WHERE a.vec_id % 10 = 0)
        |SELECT vec_id, cluster, other_id, cos_e6, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_e6 DESC, other_id) AS rk
        |  FROM p)
        |WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin),
    "ann_ivf_trained" ->
      """SELECT TRUE AS rk_contiguous, TRUE AS one_cluster_per_query,
        |  TRUE AS recall_ge_10pct""".stripMargin,
    // split sizes are oracle-exact; the accuracy contract is structural
    // (L-BFGS isn't SQL-expressible) — a degenerate model flips a boolean
    "quality_model" ->
      """SELECT CAST(sum(CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |  CAST(sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_holdout,
        |  TRUE AS holdout_acc_ge_70pct, TRUE AS beats_majority,
        |  TRUE AS probs_in_unit
        |FROM documents""".stripMargin,
    "semantic_dedup" ->
      """SELECT count(*) AS n_total, TRUE AS cluster_min_kept,
        |  TRUE AS clusters_in_range FROM embeddings""".stripMargin,
    "quantize_embeddings" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), m AS (
        |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e
        |), q AS (
        |  SELECT vec_id, mx,
        |    list_transform(v, x -> greatest(least(CAST(floor(x * 127.0 / mx) AS BIGINT), 127), -127)) AS qv
        |  FROM m WHERE mx > 0
        |)
        |SELECT vec_id, CAST(floor(mx * 1000000.0) AS BIGINT) AS maxabs_e6,
        |  list_max(list_transform(qv, x -> abs(x))) AS max_abs_q,
        |  md5(array_to_string(list_transform(qv, x -> CAST(x AS VARCHAR)), ' ')) AS q_md5
        |FROM q ORDER BY vec_id""".stripMargin,
    // same md5-derived plane weights as the LSH bucket oracles, same
    // IEEE fold — the e6 floor is exact on both engines
    "random_projection" -> {
      val scale = 1.0 / math.sqrt(8.0)
      val cols = (0 until 8).map { p =>
        val a = s"ascii(substr(md5('${p}_' || CAST(i - 1 AS VARCHAR)), 1, 1))"
        val w = s"(($a - CASE WHEN $a >= 97 THEN 87 ELSE 48 END) - 7.5)"
        s"CAST(floor(list_sum(list_transform(range(1, 65), i -> v[i] * $w)) * $scale * 1000000.0) AS BIGINT) AS rp$p"
      }.mkString(",\n    ")
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT vec_id,
        |    $cols
        |FROM e ORDER BY vec_id""".stripMargin
    },
    // spectral solve isn't SQL-expressible: counts are oracle-exact,
    // the spectral contract + distributed variance cross-check are
    // structural booleans (ann_ivf_trained pattern)
    "pca_summary" ->
      """SELECT count(*) AS n_vectors, CAST(4 AS INT) AS k,
        |  TRUE AS comps_orthonormal, TRUE AS eigvals_descending,
        |  TRUE AS capture_ge_uniform, TRUE AS proj_var_matches
        |FROM embeddings""".stripMargin,
    "ann_ivf_multiprobe" -> multiprobeSql(2),
    "text_cooccur" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS products FROM documents
        |), exploded AS (
        |  SELECT doc_id AS bid, unnest(products) AS product,
        |         generate_subscripts(products, 1) AS pos
        |  FROM toks
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
        |  SELECT product AS term, neighbor AS coterm, count(*) AS cnt
        |  FROM pairs GROUP BY 1, 2
        |)
        |SELECT term, coterm, cnt FROM counts
        |ORDER BY cnt DESC, term, coterm LIMIT 50""".stripMargin,
    "pipeline_clean" ->
      """WITH c AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> list_contains(['the','a','of','and','to','in','is','on','for','with'], x))) AS BIGINT) AS n_stopwords
        |  FROM documents
        |), q AS (
        |  SELECT doc_id, lang,
        |    CAST(0.4 AS DOUBLE) * (CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |      + CAST(0.3 AS DOUBLE) * least(CAST(n_tokens AS DOUBLE) / 300.0, 1.0)
        |      + CAST(0.3 AS DOUBLE) * (CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS quality
        |  FROM c
        |), f AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_md5
        |  FROM documents
        |), s AS (
        |  SELECT q.doc_id, q.lang, q.quality, f.bag_md5
        |  FROM q JOIN f USING (doc_id) WHERE q.quality >= 0.22
        |), d AS (
        |  SELECT *, row_number() OVER (PARTITION BY bag_md5 ORDER BY doc_id) AS rk FROM s
        |)
        |SELECT lang, count(*) AS n_docs, min(quality) AS min_quality,
        |  max(quality) AS max_quality
        |FROM d WHERE rk = 1 GROUP BY lang ORDER BY lang""".stripMargin,
    "next_purchase_rules" ->
      """WITH seq AS (
        |  SELECT o_custkey, o_orderkey,
        |    lead(o_orderkey) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS next_o
        |  FROM orders
        |), op AS (
        |  SELECT o_orderkey AS prev_o, next_o FROM seq WHERE next_o IS NOT NULL
        |), it AS (
        |  SELECT DISTINCT l_orderkey AS basket, CAST(l_partkey AS VARCHAR) AS item
        |  FROM lineitem
        |), tr AS (
        |  SELECT a.item AS antecedent, b.item AS consequent
        |  FROM op JOIN it a ON a.basket = op.prev_o
        |          JOIN it b ON b.basket = op.next_o
        |), cnt AS (
        |  SELECT antecedent, consequent, count(*) AS n_trans
        |  FROM tr GROUP BY antecedent, consequent
        |), fa AS (
        |  SELECT antecedent, count(*) AS n_from FROM tr GROUP BY antecedent)
        |SELECT c.antecedent, c.consequent, c.n_trans,
        |  CAST(c.n_trans AS DOUBLE) / CAST(f.n_from AS DOUBLE) AS confidence
        |FROM cnt c JOIN fa f USING (antecedent)
        |WHERE c.n_trans >= 2
        |ORDER BY antecedent, consequent""".stripMargin,
    "assoc_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS basket, CAST(l_partkey AS VARCHAR) AS item FROM lineitem),
        |nb AS (SELECT count(DISTINCT basket) AS n FROM items),
        |supp AS (SELECT item, count(*) AS supp FROM items GROUP BY item),
        |pairs AS (
        |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_cnt
        |  FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |j AS (
        |  SELECT p.item_a, p.item_b, p.pair_cnt, sa.supp AS supp_a, sb.supp AS supp_b,
        |         (SELECT n FROM nb) AS n
        |  FROM pairs p JOIN supp sa ON p.item_a = sa.item JOIN supp sb ON p.item_b = sb.item)
        |SELECT * FROM (
        |  SELECT item_a AS antecedent, item_b AS consequent, pair_cnt,
        |    CAST(pair_cnt AS DOUBLE) / CAST(n AS DOUBLE) AS support,
        |    CAST(pair_cnt AS DOUBLE) / CAST(supp_a AS DOUBLE) AS confidence,
        |    CAST(pair_cnt AS DOUBLE) * CAST(n AS DOUBLE) / CAST(supp_a * supp_b AS DOUBLE) AS lift
        |  FROM j
        |  UNION ALL
        |  SELECT item_b AS antecedent, item_a AS consequent, pair_cnt,
        |    CAST(pair_cnt AS DOUBLE) / CAST(n AS DOUBLE) AS support,
        |    CAST(pair_cnt AS DOUBLE) / CAST(supp_b AS DOUBLE) AS confidence,
        |    CAST(pair_cnt AS DOUBLE) * CAST(n AS DOUBLE) / CAST(supp_a * supp_b AS DOUBLE) AS lift
        |  FROM j)
        |ORDER BY antecedent, consequent""".stripMargin,
    "fpgrowth_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS basket, CAST(l_partkey AS VARCHAR) AS item FROM lineitem),
        |nb AS (SELECT count(DISTINCT basket) AS n FROM items),
        |supp AS (SELECT item, count(*) AS supp FROM items GROUP BY item),
        |pairs AS (
        |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_cnt
        |  FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2
        |  HAVING count(*) >= ceil(1.0e-4 * (SELECT n FROM nb))),
        |j AS (
        |  SELECT p.item_a, p.item_b, p.pair_cnt, sa.supp AS supp_a, sb.supp AS supp_b,
        |         (SELECT n FROM nb) AS n
        |  FROM pairs p JOIN supp sa ON p.item_a = sa.item JOIN supp sb ON p.item_b = sb.item)
        |SELECT * FROM (
        |  SELECT item_a AS antecedent, item_b AS consequent,
        |    CAST(pair_cnt AS DOUBLE) / CAST(supp_a AS DOUBLE) AS confidence,
        |    (CAST(pair_cnt AS DOUBLE) / CAST(supp_a AS DOUBLE)) / (CAST(supp_b AS DOUBLE) / CAST(n AS DOUBLE)) AS lift,
        |    CAST(pair_cnt AS DOUBLE) / CAST(n AS DOUBLE) AS support
        |  FROM j
        |  UNION ALL
        |  SELECT item_b AS antecedent, item_a AS consequent,
        |    CAST(pair_cnt AS DOUBLE) / CAST(supp_b AS DOUBLE) AS confidence,
        |    (CAST(pair_cnt AS DOUBLE) / CAST(supp_b AS DOUBLE)) / (CAST(supp_a AS DOUBLE) / CAST(n AS DOUBLE)) AS lift,
        |    CAST(pair_cnt AS DOUBLE) / CAST(n AS DOUBLE) AS support
        |  FROM j)
        |ORDER BY antecedent, consequent""".stripMargin,
    "rolling_fingerprint" -> {
      val horner = (0 until TextAnalysis.RollWindow).foldLeft("0")((acc, k) =>
        s"(($acc * ${TextAnalysis.RollB} + vals[i + $k]) % ${TextAnalysis.RollP})")
      s"""WITH v AS (
        |  SELECT doc_id,
        |    list_transform(string_split(text, ' '),
        |      tok -> ('0x' || substr(md5(tok), 1, 14))::BIGINT % ${TextAnalysis.RollP}) AS vals
        |  FROM documents
        |), w AS (
        |  SELECT doc_id,
        |    CASE WHEN len(vals) >= ${TextAnalysis.RollWindow}
        |         THEN list_transform(range(1, len(vals) - ${TextAnalysis.RollWindow - 2}), i -> $horner)
        |         ELSE [] END AS wh
        |  FROM v
        |)
        |SELECT doc_id, CAST(len(wh) AS BIGINT) AS n_windows,
        |  CAST(len(list_distinct(wh)) AS BIGINT) AS n_distinct_windows,
        |  list_min(wh) AS min_window_hash
        |FROM w ORDER BY doc_id""".stripMargin
    },
    "multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(1 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
        |  CAST(1 + (octet_length(encode(text)) // 64) % 64 AS INTEGER) AS height,
        |  3 AS channels,
        |  CAST(len(list_filter(range(1, CAST(len(string_split(text, ' ')) AS BIGINT) + 1),
        |    i -> ((i - 1) % 4) = 0)) AS INTEGER) AS n_frames,
        |  md5(substr(text, 1, 64)) AS head_sig
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the real-kernel round trip: dims recomputed from doc_id with the
    // same integer floor arithmetic as ImageIoCodec.resize; color_ok is
    // the literal-TRUE accuracy contract (exact, solid-color fixture)
    "media_decode_real" ->
      """WITH f AS (
        |  SELECT doc_id, 1 + doc_id % 16 AS w, 1 + doc_id % 9 AS h
        |  FROM documents
        |)
        |SELECT doc_id, w, h,
        |  CASE WHEN greatest(w, h) <= 4 THEN w
        |       ELSE greatest(1, w * 4 // greatest(w, h)) END AS out_w,
        |  CASE WHEN greatest(w, h) <= 4 THEN h
        |       ELSE greatest(1, h * 4 // greatest(w, h)) END AS out_h,
        |  TRUE AS color_ok
        |FROM f ORDER BY doc_id""".stripMargin,
    "audio_decode_real" ->
      """SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(16 AS BIGINT) AS bits,
        |  CAST(1 + doc_id % 32 AS BIGINT) AS n_frames,
        |  TRUE AS pcm_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    // one row per SAMPLED frame (stride 2, inclusive upper bound id%6 =
    // n_frames-1); constant planes make the mean luma integer-exact
    "video_decode_real" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    unnest(range(0, CAST(1 + doc_id % 6 AS BIGINT), 2)) AS fidx
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(2 * (1 + doc_id % 8) AS INT) AS w,
        |  CAST(2 * (1 + doc_id % 5) AS INT) AS h,
        |  CAST(1 + doc_id % 6 AS BIGINT) AS n_frames,
        |  CAST(fidx AS BIGINT) AS frame_idx,
        |  CAST(16 + (doc_id * 7 + fidx * 13) % 220 AS BIGINT) AS luma,
        |  TRUE AS plane_ok
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "media_frames" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), f AS (
        |  SELECT doc_id,
        |    unnest(list_filter(
        |      list_transform(range(1, len(toks) + 1),
        |        i -> {'idx': CAST(i - 1 AS BIGINT), 'frame': toks[i]}),
        |      s -> s.idx % 4 = 0)) AS fr
        |  FROM t)
        |SELECT doc_id, fr.idx AS frame_idx, md5(fr.frame) AS frame_sig,
        |  CAST(1 + length(fr.frame) % 16 AS INTEGER) AS thumb_w
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "shard_rebalance" ->
      """WITH s AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |r AS (
        |  SELECT n_bytes,
        |    row_number() OVER (ORDER BY -n_bytes, doc_id) AS rnk
        |  FROM s)
        |SELECT CAST((rnk - 1) % 8 AS INT) AS shard, count(*) AS n_docs,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes
        |FROM r GROUP BY 1 ORDER BY shard""".stripMargin,
    "dataset_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
        |  CAST(bucket % 8 AS INTEGER) AS shard
        |FROM b ORDER BY doc_id""".stripMargin,
    // global difficulty rank → exact integer quartile tiers → md5
    // shuffle within tier (row_number windows replay ExactRank exactly)
    "curriculum_order" -> curriculumOrderOracleSql,
    // per-tier prefix-sum window over the curriculum oracle's own CTE —
    // the layout cannot drift from the ordering it packs
    "pack_curriculum" ->
      s"""WITH cur AS ($curriculumOrderOracleSql),
      |o AS (
      |  SELECT tier AS grp, doc_id, n_subword_tokens AS len,
      |    CAST(coalesce(sum(n_subword_tokens) OVER (PARTITION BY tier
      |      ORDER BY pos_in_tier, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      |  FROM cur
      |), p AS (
      |  SELECT grp, doc_id, len, off,
      |    unnest(generate_series(off // 512, (off + len - 1) // 512)) AS seq_id
      |  FROM o WHERE len > 0)
      |SELECT grp, seq_id, doc_id,
      |  greatest(0, seq_id * 512 - off) AS tok_begin,
      |  least(len, (seq_id + 1) * 512 - off) AS tok_end
      |FROM p ORDER BY grp, seq_id, doc_id""".stripMargin,
    // hashed uni+bigram features, one conditional agg builds target AND
    // raw bucket counts, add-one-smoothed log ratio floored to e6
    // integers MODEL-SIDE (unigram_logprob's parity pattern) so doc
    // scores are integer sums
    "dsir_weights" ->
      (dsirWeightsCte +
        """SELECT doc_id, is_target, n_feats, score_e6
        |FROM doc_scores ORDER BY doc_id""".stripMargin),
    "dsir_select" ->
      (dsirWeightsCte +
        """, sel AS (
        |  SELECT doc_id, n_feats, score_e6,
        |    CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS rk
        |  FROM doc_scores WHERE NOT is_target)
        |SELECT rk, doc_id, n_feats, score_e6
        |FROM sel WHERE rk <= 100 ORDER BY rk""".stripMargin),
    // global stream offset = window cumsum (oracle scale is fine with
    // the single-task window; the ENGINE uses the window-free prefix
    // sum), then the same span arithmetic; range() is end-exclusive
    // where Spark's sequence() is inclusive, hence the +1
    "pack_spans" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS len
        |  FROM documents
        |), offs AS (
        |  SELECT doc_id, len,
        |    CAST(COALESCE(sum(len) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        |  FROM docs
        |), sp AS (
        |  SELECT doc_id, len, off,
        |    unnest(range(CAST(off // 512 AS BIGINT),
        |                 CAST((off + len - 1) // 512 + 1 AS BIGINT))) AS seq_id
        |  FROM offs WHERE len > 0)
        |SELECT seq_id, doc_id,
        |  GREATEST(0, seq_id * 512 - off) AS tok_begin,
        |  LEAST(len, (seq_id + 1) * 512 - off) AS tok_end
        |FROM sp ORDER BY seq_id, doc_id""".stripMargin,
    "pack_summary" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS len
        |  FROM documents
        |), offs AS (
        |  SELECT doc_id, len,
        |    CAST(COALESCE(sum(len) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        |  FROM docs
        |), sp AS (
        |  SELECT doc_id, len, off,
        |    unnest(range(CAST(off // 512 AS BIGINT),
        |                 CAST((off + len - 1) // 512 + 1 AS BIGINT))) AS seq_id
        |  FROM offs WHERE len > 0
        |), spans AS (
        |  SELECT seq_id, doc_id,
        |    GREATEST(0, seq_id * 512 - off) AS tok_begin,
        |    LEAST(len, (seq_id + 1) * 512 - off) AS tok_end
        |  FROM sp)
        |SELECT seq_id, count(*) AS n_docs,
        |  CAST(sum(tok_end - tok_begin) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN tok_begin > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_carried
        |FROM spans GROUP BY seq_id ORDER BY seq_id""".stripMargin,
    // the 64-round learned-tokenizer chain (pipeline_tokenizer's own
    // CTEs) producing per-doc BPE budgets, then the same packing window
    // the full curated-pretraining composition (quality -> dedup ->
    // DSIR -> pack on the corpus-trained tokenizer), every stage's
    // fragment chained and retargeted — see pipelineDsirPackSql
    "pipeline_dsir_pack" -> pipelineDsirPackSql,
    "pack_bpe" -> {
      bpeTrainOracleChain(BpeOracleRounds) + s""",
        |v AS (SELECT word,
        |  CAST(len(string_split(trim(enc), '  ')) AS BIGINT) AS n_bpe
        |  FROM e$BpeOracleRounds),
        |dw AS (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS word
        |  FROM documents),
        |agg AS (SELECT doc_id, CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens
        |  FROM dw JOIN v USING (word) GROUP BY doc_id),
        |lens AS (SELECT documents.doc_id,
        |  coalesce(agg.n_bpe_tokens, CAST(0 AS BIGINT)) AS len
        |  FROM documents LEFT JOIN agg USING (doc_id)),
        |offs AS (
        |  SELECT doc_id, len,
        |    CAST(COALESCE(sum(len) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        |  FROM lens
        |), sp AS (
        |  SELECT doc_id, len, off,
        |    unnest(range(CAST(off // 512 AS BIGINT),
        |                 CAST((off + len - 1) // 512 + 1 AS BIGINT))) AS seq_id
        |  FROM offs WHERE len > 0)
        |SELECT seq_id, doc_id,
        |  GREATEST(0, seq_id * 512 - off) AS tok_begin,
        |  LEAST(len, (seq_id + 1) * 512 - off) AS tok_end
        |FROM sp ORDER BY seq_id, doc_id""".stripMargin
    },
    // the delta's spans continue the base stream: same span arithmetic,
    // offsets shifted by the base's total token count
    "pack_incremental" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS len,
        |    (doc_id % 10 = 0) AS is_delta
        |  FROM documents
        |), bt AS (
        |  SELECT CAST(COALESCE(sum(len), 0) AS BIGINT) AS base_off
        |  FROM docs WHERE NOT is_delta
        |), offs AS (
        |  SELECT doc_id, len,
        |    CAST(COALESCE(sum(len) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS d_off
        |  FROM docs WHERE is_delta
        |), sp AS (
        |  SELECT doc_id, len, d_off + (SELECT base_off FROM bt) AS off
        |  FROM offs WHERE len > 0
        |), u AS (
        |  SELECT doc_id, len, off,
        |    unnest(range(CAST(off // 512 AS BIGINT),
        |                 CAST((off + len - 1) // 512 + 1 AS BIGINT))) AS seq_id
        |  FROM sp)
        |SELECT seq_id, doc_id,
        |  GREATEST(0, seq_id * 512 - off) AS tok_begin,
        |  LEAST(len, (seq_id + 1) * 512 - off) AS tok_end
        |FROM u ORDER BY seq_id, doc_id""".stripMargin,
    // the streamed union replayed: phase-1 docs (doc_id%20=0) packed
    // first, phase-2 docs after — a (phase, doc_id)-ordered prefix sum
    // from the base total, same span arithmetic
    // snapshot semantics over the source rows: v1 = base split, v2 adds
    // phase-1 deltas (doc_id % 20 = 0), v3 = everything
    "snapshot_stream" ->
      """SELECT * FROM (
        |  SELECT CAST(1 AS INT) AS version, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents WHERE doc_id % 10 != 0
        |  UNION ALL
        |  SELECT CAST(2 AS INT), count(*), CAST(sum(n_chars) AS BIGINT)
        |  FROM documents WHERE doc_id % 10 != 0 OR doc_id % 20 = 0
        |  UNION ALL
        |  SELECT CAST(3 AS INT), count(*), CAST(sum(n_chars) AS BIGINT)
        |  FROM documents)
        |ORDER BY version""".stripMargin,
    "pack_stream" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS len,
        |    (doc_id % 10 = 0) AS is_delta,
        |    CASE WHEN doc_id % 20 = 0 THEN 0 ELSE 1 END AS phase
        |  FROM documents
        |), bt AS (
        |  SELECT CAST(COALESCE(sum(len), 0) AS BIGINT) AS base_off
        |  FROM docs WHERE NOT is_delta
        |), offs AS (
        |  SELECT doc_id, len,
        |    CAST(COALESCE(sum(len) OVER (ORDER BY phase, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS d_off
        |  FROM docs WHERE is_delta
        |), sp AS (
        |  SELECT doc_id, len, d_off + (SELECT base_off FROM bt) AS off
        |  FROM offs WHERE len > 0
        |), u AS (
        |  SELECT doc_id, len, off,
        |    unnest(range(CAST(off // 512 AS BIGINT),
        |                 CAST((off + len - 1) // 512 + 1 AS BIGINT))) AS seq_id
        |  FROM sp)
        |SELECT seq_id, doc_id,
        |  GREATEST(0, seq_id * 512 - off) AS tok_begin,
        |  LEAST(len, (seq_id + 1) * 512 - off) AS tok_end
        |FROM u ORDER BY seq_id, doc_id""".stripMargin,
    "pipeline_quality" ->
      (gopherC4CleanCte + """, toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM cl
        |), bg AS (
        |  SELECT doc_id, t[i - 1] AS w1, t[i] AS w2
        |  FROM (SELECT doc_id, t, unnest(range(2, len(t) + 1)) AS i FROM toks)
        |), model AS (
        |  SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY w1, w2
        |), ctx AS (
        |  SELECT w1, CAST(sum(cnt) AS BIGINT) AS ctx_cnt FROM model GROUP BY w1
        |), voc AS (
        |  SELECT count(DISTINCT tok) AS v FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM cl)
        |), scored AS (
        |  SELECT m.w1, m.w2,
        |    CAST(floor(-ln((CAST(m.cnt AS DOUBLE) + 1.0)
        |        / (CAST(c.ctx_cnt AS DOUBLE) + CAST(voc.v AS DOUBLE)))
        |      * 1000000.0) AS BIGINT) AS s_e6
        |  FROM model m JOIN ctx c USING (w1) CROSS JOIN voc
        |), doc_scores AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    CAST(CAST(sum(s_e6) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |      AS avg_surprisal_e6
        |  FROM bg JOIN scored USING (w1, w2)
        |  GROUP BY doc_id
        |), ranked AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY avg_surprisal_e6, doc_id) AS rnk,
        |    count(*) OVER () AS n
        |  FROM doc_scores
        |), lm AS (
        |  SELECT doc_id FROM ranked WHERE rnk * 3 <= n * 2
        |), pt AS (
        |  SELECT tk.doc_id, tk.t FROM toks tk JOIN lm USING (doc_id)
        |), st AS (
        |  SELECT doc_id, t, range(1, len(t) + 1, 10) AS starts FROM pt
        |), ex AS (
        |  SELECT doc_id, t, unnest(starts) AS s,
        |    CAST(generate_subscripts(starts, 1) - 1 AS INTEGER) AS pos
        |  FROM st
        |), pg AS (
        |  SELECT doc_id, pos, array_to_string(t[s:s+9], ' ') AS passage FROM ex
        |), fo AS (
        |  SELECT doc_id, pos, passage,
        |    row_number() OVER (PARTITION BY passage ORDER BY doc_id, pos) AS rn
        |  FROM pg
        |), rebuilt AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(passage, ' ' ORDER BY pos) AS clean_text
        |  FROM fo WHERE rn = 1 GROUP BY doc_id
        |), totals AS (
        |  SELECT doc_id, count(*) AS n_passages FROM pg GROUP BY doc_id
        |)
        |SELECT t.doc_id, t.n_passages,
        |  CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(r.clean_text, '') AS clean_text
        |FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
        |ORDER BY t.doc_id""".stripMargin),
    "pipeline_pretrain" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), st AS (
        |  SELECT doc_id, t, range(1, len(t) + 1, 10) AS starts FROM toks
        |), ex AS (
        |  SELECT doc_id, t, unnest(starts) AS s,
        |    CAST(generate_subscripts(starts, 1) - 1 AS INTEGER) AS pos
        |  FROM st
        |), pg AS (
        |  SELECT doc_id, pos, array_to_string(t[s:s+9], ' ') AS passage FROM ex
        |), fo AS (
        |  SELECT doc_id, pos, passage,
        |    row_number() OVER (PARTITION BY passage ORDER BY doc_id, pos) AS rn
        |  FROM pg
        |), cleaned AS (
        |  SELECT doc_id,
        |    coalesce(string_agg(CASE WHEN rn = 1 THEN passage END, ' ' ORDER BY pos), '') AS text
        |  FROM fo GROUP BY doc_id
        |), w AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
        |  FROM cleaned
        |), kept AS (
        |  SELECT doc_id FROM w
        |  WHERE bucket < least(CAST(100 AS BIGINT),
        |    CAST(floor(n_tokens * 100.0 / 64.0) AS BIGINT))
        |), d AS (
        |  SELECT c.doc_id, CAST(c.doc_id % 8 AS INTEGER) AS shard,
        |    CAST(len(string_split(c.text, ' ')) AS BIGINT) AS n_tokens
        |  FROM cleaned c JOIN kept k ON c.doc_id = k.doc_id
        |), pk AS (
        |  SELECT doc_id, shard, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS tokens_before
        |  FROM d
        |)
        |SELECT doc_id, shard, n_tokens,
        |  tokens_before // 512 AS chunk,
        |  tokens_before % 512 AS chunk_offset
        |FROM pk ORDER BY doc_id""".stripMargin,
    "weighted_sample" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
        |  FROM documents
        |), t AS (
        |  SELECT doc_id, n_tokens, bucket,
        |    least(CAST(100 AS BIGINT),
        |      CAST(floor(n_tokens * 100.0 / 64.0) AS BIGINT)) AS keep_thr
        |  FROM b
        |)
        |SELECT doc_id, n_tokens, bucket, keep_thr
        |FROM t WHERE bucket < keep_thr ORDER BY doc_id""".stripMargin,
    "pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, shard, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS tokens_before
        |  FROM d
        |)
        |SELECT doc_id, shard, n_tokens,
        |  tokens_before // 512 AS chunk,
        |  tokens_before % 512 AS chunk_offset
        |FROM p ORDER BY doc_id""".stripMargin,
    "domain_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        |  FROM documents)
        |SELECT doc_id, source, rn FROM r WHERE rn <= 10
        |ORDER BY doc_id""".stripMargin,
    "url_normalize" ->
      s"""$urlParseCte
        |SELECT doc_id, url, scheme, host, path,
        |  CASE WHEN scheme = '' OR host = '' THEN NULL
        |       ELSE scheme || '://' || host || kept_port || path || kept_query
        |  END AS url_norm
        |FROM n ORDER BY doc_id""".stripMargin,
    "html_links" ->
      (htmlLinksCte + """
        |SELECT doc_id, pos, href, host, url_norm
        |FROM links ORDER BY doc_id, pos""".stripMargin),
    "html_links_resolved" ->
      (resolvedLinksCte + """
        |SELECT doc_id, pos, href, host, url_norm
        |FROM rlinks ORDER BY doc_id, pos""".stripMargin),
    // the crawl-authority composition: the SAME rank recurrence as
    // page_rank, fed by the RESOLVED link edge relation (doc -> host)
    "link_rank" -> pageRankSql(3, edgesWith = resolvedLinksCte +
      """, edges AS (
        |  SELECT DISTINCT 'd' || CAST(doc_id AS VARCHAR) AS src,
        |    host AS dst
        |  FROM rlinks WHERE url_norm IS NOT NULL)""".stripMargin),
    // the two HITS sweeps unrolled: a1 = indegree (h0 = 1), h1, a2, h2
    "hits_scores" -> (resolvedLinksCte +
      """, edges AS (
        |  SELECT DISTINCT 'd' || CAST(doc_id AS VARCHAR) AS src,
        |    host AS dst
        |  FROM rlinks WHERE url_norm IS NOT NULL
        |), a1 AS (
        |  SELECT dst, CAST(count(*) AS BIGINT) AS a FROM edges GROUP BY dst
        |), h1 AS (
        |  SELECT src, CAST(sum(a1.a) AS BIGINT) AS h
        |  FROM edges JOIN a1 USING (dst) GROUP BY src
        |), a2 AS (
        |  SELECT dst, CAST(sum(h1.h) AS BIGINT) AS a
        |  FROM edges JOIN h1 USING (src) GROUP BY dst
        |), h2 AS (
        |  SELECT src, CAST(sum(a2.a) AS BIGINT) AS h
        |  FROM edges JOIN a2 USING (dst) GROUP BY src)
        |SELECT side, node, score FROM (
        |  SELECT 'hub' AS side, src AS node, h AS score FROM h2
        |  UNION ALL
        |  SELECT 'auth' AS side, dst AS node, a AS score FROM a2)
        |ORDER BY side, node""".stripMargin),
  ) ++ oracleSqlRest2

  /** Deterministic real-shaped HTML fixture pages (messy absolute links
    * with default ports, root-/path-relative + protocol-relative +
    * fragment-only + QUERY-only + mailto: links, a single-QUOTED href
    * with a dot-segment, and a per-page base URL) — shared by
    * html_links, html_links_resolved and link_rank;
    * [[htmlLinksCte]]/[[resolvedLinksCte]] are the byte-identical SQL
    * twins. The mailto row exercises the authority-less-scheme
    * quarantine; the "?p=" row exercises RFC 3986 §5.3 query-only
    * resolution.
    */
  private[graft] def htmlFixturePages(s: SparkSession, dir: String): DataFrame = {
    val k = pmod(col("doc_id"), lit(5)).cast("string")
    val k2 = pmod(col("doc_id"), lit(7)).cast("string")
    val k3 = pmod(col("doc_id"), lit(9)).cast("string")
    val k4 = pmod(col("doc_id"), lit(3)).cast("string")
    val id = col("doc_id").cast("string")
    t(s, dir, "documents").select(col("doc_id"),
      concat(lit("https://site"), k3, lit(".org/a/"), k4,
        lit("/page.html")).as("base_url"),
      concat(
        lit("<div><a href=\"HTTP://WWW.Example"), k, lit(".COM:80/p/"), id,
        lit("\">x</a> <a href=\"/rel/"), id,
        lit("\">y</a> <a href='sub/dir/../"), id,
        lit("'>q</a> <a href=\"https://example"), k2, lit(".net/x?q="), id,
        lit("#f\">z</a> <a href=\"//cdn.example"), k2,
        lit(".net/lib.js\">c</a> <a href=\"#top\">t</a>"),
        lit(" <a href=\"mailto:u"), k, lit("@ex.org\">m</a>"),
        lit(" <a href=\"?p="), id,
        lit("\">g</a></div>")).as("html"))
  }

  /** [[htmlFixturePages]]' SQL twin plus quote-stripped href extraction,
    * ending in `l2(doc_id, base_url, pos, href)` — the shared front half
    * of [[htmlLinksCte]] and [[resolvedLinksCte]].
    */
  private[graft] lazy val htmlPagesCte: String = {
    val hr = Url.HrefRe.replace("'", "''")
    s"""WITH pages AS (
      |  SELECT doc_id,
      |    'https://site' || CAST(doc_id % 9 AS VARCHAR) || '.org/a/' ||
      |      CAST(doc_id % 3 AS VARCHAR) || '/page.html' AS base_url,
      |    '<div><a href="HTTP://WWW.Example' || CAST(doc_id % 5 AS VARCHAR) ||
      |    '.COM:80/p/' || CAST(doc_id AS VARCHAR) ||
      |    '">x</a> <a href="/rel/' || CAST(doc_id AS VARCHAR) ||
      |    '">y</a> <a href=''sub/dir/../' || CAST(doc_id AS VARCHAR) ||
      |    '''>q</a> <a href="https://example' || CAST(doc_id % 7 AS VARCHAR) ||
      |    '.net/x?q=' || CAST(doc_id AS VARCHAR) ||
      |    '#f">z</a> <a href="//cdn.example' || CAST(doc_id % 7 AS VARCHAR) ||
      |    '.net/lib.js">c</a> <a href="#top">t</a>' ||
      |    ' <a href="mailto:u' || CAST(doc_id % 5 AS VARCHAR) ||
      |    '@ex.org">m</a> <a href="?p=' || CAST(doc_id AS VARCHAR) ||
      |    '">g</a></div>' AS html
      |  FROM documents
      |), l AS (
      |  SELECT doc_id, base_url,
      |    unnest(regexp_extract_all(html, '$hr', 1)) AS qhref,
      |    CAST(generate_subscripts(regexp_extract_all(html, '$hr', 1), 1) - 1
      |      AS INTEGER) AS pos
      |  FROM pages
      |), l2 AS (
      |  SELECT doc_id, base_url, pos,
      |    substr(qhref, 2, length(qhref) - 2) AS href
      |  FROM l
      |)""".stripMargin
  }

  /** The normalize() regex chain over a `(doc_id, pos, href, u)` input
    * CTE named `$src` with URL column `$urlCol`, ending in
    * `$out(doc_id, pos, href, host, url_norm)`.
    */
  private[graft] def urlNormChain(src: String, urlCol: String, out: String,
      tag: String): String = {
    val (sc, au, pa, qu, ui, po) = (Url.SchemeRe, Url.AuthorityRe,
      Url.PathRe, Url.QueryRe, Url.UserinfoRe, Url.PortRe)
    s""", p$tag AS (
      |  SELECT doc_id, pos, href,
      |    lower(regexp_extract($urlCol, '$sc', 1)) AS scheme,
      |    regexp_replace(regexp_extract($urlCol, '$au', 1), '$ui', '') AS hostport,
      |    regexp_extract($urlCol, '$pa', 1) AS raw_path,
      |    regexp_extract($urlCol, '$qu', 1) AS query
      |  FROM $src
      |), n$tag AS (
      |  SELECT doc_id, pos, href, scheme,
      |    lower(regexp_replace(hostport, '$po', '')) AS host,
      |    CASE WHEN raw_path = '' THEN '/' ELSE raw_path END AS path,
      |    CASE WHEN (scheme = 'http' AND regexp_extract(hostport, '$po', 1) = '80')
      |         OR (scheme = 'https' AND regexp_extract(hostport, '$po', 1) = '443')
      |         OR regexp_extract(hostport, '$po', 1) = '' THEN ''
      |         ELSE ':' || regexp_extract(hostport, '$po', 1) END AS kept_port,
      |    CASE WHEN query = '' THEN '' ELSE '?' || query END AS kept_query
      |  FROM p$tag
      |), $out AS (
      |  SELECT doc_id, pos, href, host,
      |    CASE WHEN scheme = '' OR host = '' THEN NULL
      |         ELSE scheme || '://' || host || kept_port || path || kept_query
      |    END AS url_norm
      |  FROM n$tag
      |)""".stripMargin
  }

  /** The html_links dataflow as a reusable CTE chain ending in
    * `links(doc_id, pos, href, host, url_norm)` — shared by the
    * html_links oracle and link_rank's edge relation.
    */
  private[graft] lazy val htmlLinksCte: String =
    htmlPagesCte + urlNormChain("l2", "href", "links", "u")

  /** Url.DotSegmentPasses as a nested regexp_replace SQL expression. */
  private[graft] def dotRemoveSql(e: String): String =
    Url.DotSegmentPasses.foldLeft(e) { case (acc, (p, r)) =>
      s"regexp_replace($acc, '$p', '$r', 'g')"
    }

  /** The html_links_resolved dataflow — RFC 3986 §5.2 reference
    * resolution against each page's base URL (Url.resolveLinks' twin),
    * ending in `rlinks(doc_id, pos, href, host, url_norm)`.
    */
  private[graft] lazy val resolvedLinksCte: String = {
    val (sc, au, pa, ui, qr, asc) =
      (Url.SchemeRe, Url.AuthorityRe, Url.PathRe, Url.UserinfoRe,
        Url.QueryRe, Url.AnySchemeRe)
    val merged = dotRemoveSql(
      "regexp_replace(b_path, '[^/]*$', '', 'g') || href")
    htmlPagesCte + s""", b AS (
      |  SELECT doc_id, pos, href,
      |    lower(regexp_extract(base_url, '$sc', 1)) AS b_scheme,
      |    regexp_replace(regexp_extract(base_url, '$au', 1), '$ui', '') AS b_hostport,
      |    CASE WHEN regexp_extract(base_url, '$pa', 1) = '' THEN '/'
      |         ELSE regexp_extract(base_url, '$pa', 1) END AS b_path,
      |    CASE WHEN regexp_extract(base_url, '$qr', 1) <> ''
      |         THEN '?' || regexp_extract(base_url, '$qr', 1)
      |         ELSE '' END AS b_query
      |  FROM l2
      |), r AS (
      |  SELECT doc_id, pos, href,
      |    CASE WHEN regexp_extract(href, '$asc', 1) <> '' THEN href
      |         WHEN href LIKE '//%' THEN b_scheme || ':' || href
      |         WHEN href LIKE '/%' THEN b_scheme || '://' || b_hostport || href
      |         WHEN href LIKE '?%'
      |           THEN b_scheme || '://' || b_hostport || b_path || href
      |         WHEN href = '' OR href LIKE '#%'
      |           THEN b_scheme || '://' || b_hostport || b_path || b_query
      |         ELSE b_scheme || '://' || b_hostport || $merged
      |    END AS abs_url
      |  FROM b
      |)""".stripMargin + urlNormChain("r", "abs_url", "rlinks", "r")
  }

  private[graft] lazy val oracleSqlRest2: Seq[(String, String)] = Seq(
    "host_cap" ->
      s"""$urlParseCte, valid AS (
        |  SELECT doc_id, host FROM n WHERE NOT (scheme = '' OR host = '')
        |), r AS (
        |  SELECT doc_id, host,
        |    CAST(row_number() OVER (PARTITION BY host
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        |  FROM valid)
        |SELECT doc_id, host, rn FROM r WHERE rn <= 10
        |ORDER BY doc_id""".stripMargin,
    "token_budget_mix" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS tokens_before
        |  FROM d
        |)
        |SELECT doc_id, source, n_tokens, tokens_before
        |FROM o WHERE tokens_before < 600
        |ORDER BY doc_id""".stripMargin,
    // the UniMax water-fill as a recursive CTE: `ranked` orders domains
    // ascending by size (name tie-break), the recursion carries the
    // remaining budget b (post-allocation), and row i's allotment uses
    // the PRE-allocation b with floor division — the engine's exact
    // integer recurrence. The i=0 seed row is arithmetic-only and
    // filtered out.
    "unimax_mix" ->
      """WITH RECURSIVE counts AS (
        |  SELECT source AS domain,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source
        |), params AS (
        |  SELECT CAST(count(*) AS BIGINT) AS d,
        |    CAST(sum(n_tokens) * 1900 // 1000 AS BIGINT) AS b0
        |  FROM counts
        |), ranked AS (
        |  SELECT domain, n_tokens,
        |    CAST(row_number() OVER (ORDER BY n_tokens, domain) AS BIGINT) AS i
        |  FROM counts
        |), fill AS (
        |  SELECT CAST(0 AS BIGINT) AS i, (SELECT b0 FROM params) AS b,
        |    CAST(NULL AS VARCHAR) AS domain, CAST(0 AS BIGINT) AS n_tokens,
        |    CAST(0 AS BIGINT) AS alloc, CAST(NULL AS VARCHAR) AS bound
        |  UNION ALL
        |  SELECT r.i,
        |    f.b - least(r.n_tokens * 2, f.b // ((SELECT d FROM params) - f.i)),
        |    r.domain, r.n_tokens,
        |    least(r.n_tokens * 2, f.b // ((SELECT d FROM params) - f.i)),
        |    CASE WHEN r.n_tokens * 2 <= f.b // ((SELECT d FROM params) - f.i)
        |         THEN 'epoch_cap' ELSE 'budget' END
        |  FROM fill f JOIN ranked r ON r.i = f.i + 1
        |)
        |SELECT domain, n_tokens, alloc AS alloc_tokens,
        |  CAST(alloc * 1000000 // n_tokens AS BIGINT) AS epochs_e6, bound
        |FROM fill WHERE i > 0 ORDER BY domain""".stripMargin,
    "temperature_mix" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n_stratum FROM documents GROUP BY lang
        |), m AS (
        |  SELECT lang, CAST(n_stratum AS BIGINT) AS n_stratum,
        |    CAST(floor(100.0 * sqrt(CAST(n_stratum AS DOUBLE) /
        |      CAST(max(n_stratum) OVER () AS DOUBLE))) AS BIGINT) AS thr
        |  FROM c
        |), b AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5('mix_' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
        |  FROM documents
        |)
        |SELECT b.doc_id, b.lang, m.n_stratum, m.thr, b.bucket
        |FROM b JOIN m ON b.lang = m.lang
        |WHERE b.bucket < m.thr ORDER BY b.doc_id""".stripMargin,
    "stratified_sample" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n_stratum
        |  FROM documents)
        |SELECT doc_id, lang, rn, n_stratum FROM r
        |WHERE rn <= CAST(ceil(0.2 * n_stratum) AS BIGINT)
        |ORDER BY lang, rn""".stripMargin,
  )
}
