package graft

import graft.operators._

/** The primary half of [[SparkEntry.oracleSql]]'s registration list —
  * oracle texts for the relational/co-occurrence/graph/tokenizer/
  * quality families, composed from [[SparkEntryOracleBuilders]] (and a
  * few shared minhash chains from [[SparkEntryOracleRest]], hence the
  * extends chain Main → Rest → Builders). `SparkEntry` concatenates
  * this Seq with `oracleSqlRest` and guards with `distinctKeys`
  * (duplicate keys fail fast at class-init, exactly as before the r15
  * file split).
  */
private[graft] trait SparkEntryOracleMain extends SparkEntryOracleMain2 {

  private[graft] lazy val oracleSqlMain: Seq[(String, String)] = Seq(
    "baskets" ->
      (basketsCte +
        "\nSELECT customer, array_to_string(products, ' ') AS products" +
        "\nFROM baskets ORDER BY customer"),
    "cooccur_counts" ->
      (cooccurCte + "\nSELECT product, neighbor, cnt FROM counts ORDER BY product, neighbor"),
    "cooccur_counts_capped" ->
      (cooccurCappedCte(5) +
        "\nSELECT product, neighbor, cnt FROM counts ORDER BY product, neighbor"),
    "cooccur_counts_sql" ->
      (cooccurCte + "\nSELECT product, neighbor, cnt FROM counts ORDER BY product, neighbor"),
    // merge-of-partials must equal the FULL recompute — same oracle text
    "cooccur_incremental" ->
      (cooccurCte + "\nSELECT product, neighbor, cnt FROM counts ORDER BY product, neighbor"),
    // persisted-partials IVM must equal the full recompute — same oracle
    "cooccur_persisted" ->
      (cooccurCte + "\nSELECT product, neighbor, cnt FROM counts ORDER BY product, neighbor"),
    // base + INSERTed generation + delta must equal the full recompute
    "cooccur_appended" ->
      (cooccurCte + "\nSELECT product, neighbor, cnt FROM counts ORDER BY product, neighbor"),
    // the streaming run must equal the batch computation — same oracle text
    "cooccur_stream" ->
      (cooccurCte + "\nSELECT product, neighbor, cnt FROM counts ORDER BY product, neighbor"),
    // transformWithState running totals across real micro-batches must
    // equal the batch marginal — DuckDB widens sum to HUGEINT, so CAST
    "cooccur_totals_tws" ->
      (cooccurCte + """
        |SELECT product, CAST(sum(cnt) AS BIGINT) AS total
        |FROM counts GROUP BY product ORDER BY product""".stripMargin),
    // backfill-seeded state + streamed second half must equal the FULL
    // batch marginal — the md5-bucket split is invisible to the answer
    "cooccur_totals_tws_boot" ->
      (cooccurCte + """
        |SELECT product, CAST(sum(cnt) AS BIGINT) AS total
        |FROM counts GROUP BY product ORDER BY product""".stripMargin),
    // stream->table ingest across a restart must equal the batch
    // aggregate — same oracle text as hourly_counts
    "events_table_stream" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // streaming twin of hourly_counts — same oracle text as the batch
    "hourly_counts_stream" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // the full prefix-filter chain replayed: df order, per-doc prefix
    // cut, length filter, exact verify — losslessness itself is the
    // SPEC's claim (brute-force fixture), the oracle checks the chain
    "setsim_join" ->
      """WITH sig AS (
        |  SELECT doc_id, md5(list_aggregate(list_sort(list_distinct(
        |    regexp_extract_all(lower(text), '[a-z0-9]+'))),
        |    'string_agg', ' ')) AS sg
        |  FROM documents
        |), reps AS (
        |  SELECT sg, min(doc_id) AS rep_id, count(*) AS n_docs
        |  FROM sig GROUP BY 1
        |), tok AS MATERIALIZED (
        |  SELECT d.doc_id, r.n_docs,
        |    unnest(list_distinct(regexp_extract_all(lower(d.text),
        |      '[a-z0-9]+'))) AS token
        |  FROM documents d JOIN reps r ON d.doc_id = r.rep_id
        |), dfq AS (SELECT token, count(*) AS df FROM tok GROUP BY 1
        |), ord AS (
        |  SELECT t.doc_id, t.n_docs, t.token,
        |    row_number() OVER (PARTITION BY t.doc_id
        |      ORDER BY d.df, t.token) AS pos,
        |    count(*) OVER (PARTITION BY t.doc_id) AS sz
        |  FROM tok t JOIN dfq d USING (token)
        |), pre AS MATERIALIZED (
        |  SELECT doc_id, token, sz, n_docs FROM ord
        |  WHERE pos <= sz - (900000 * sz + 999999) // 1000000 + 1
        |), cand AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.sz AS sz_a, b.sz AS sz_b,
        |    a.n_docs AS n_docs_a, b.n_docs AS n_docs_b
        |  FROM pre a JOIN pre b ON a.token = b.token
        |    AND a.doc_id < b.doc_id
        |    AND (900000 * greatest(a.sz, b.sz) + 999999) // 1000000
        |      <= least(a.sz, b.sz)
        |), inter AS (
        |  SELECT c.doc_a, c.doc_b, c.sz_a, c.sz_b,
        |    c.n_docs_a, c.n_docs_b, count(*) AS n_common
        |  FROM cand c
        |  JOIN tok ta ON ta.doc_id = c.doc_a
        |  JOIN tok tb ON tb.doc_id = c.doc_b AND tb.token = ta.token
        |  GROUP BY 1, 2, 3, 4, 5, 6)
        |SELECT doc_a, doc_b, CAST(sz_a AS BIGINT) AS sz_a,
        |  CAST(sz_b AS BIGINT) AS sz_b,
        |  CAST(n_docs_a AS BIGINT) AS n_docs_a,
        |  CAST(n_docs_b AS BIGINT) AS n_docs_b,
        |  CAST(n_common AS BIGINT) AS n_common,
        |  CAST((n_common * 1000000) // (sz_a + sz_b - n_common) AS BIGINT)
        |    AS jaccard_e6
        |FROM inter
        |WHERE (n_common * 1000000) // (sz_a + sz_b - n_common) >= 900000
        |ORDER BY doc_a, doc_b""".stripMargin,
    // RAKE replay: gaps-and-islands phrases over the shared token
    // pattern, deg/freq word scores, phrase sums — all integer
    "rake_keywords" ->
      (s"""WITH tk AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
        |    generate_subscripts(regexp_extract_all(lower(text),
        |      '[a-z0-9]+'), 1) - 1 AS pos
        |  FROM documents
        |), ns AS (
        |  SELECT doc_id, pos, w,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
        |      AS island
        |  FROM tk WHERE w NOT IN (${operators.TextAnalysis.stopwords
             .map(w => s"'$w'").mkString(", ")})
        |), pt AS MATERIALIZED (
        |  SELECT doc_id, island, pos, w,
        |    count(*) OVER (PARTITION BY doc_id, island) AS plen
        |  FROM ns
        |), wsc AS (
        |  SELECT w, CAST((sum(plen) * 1000000) // count(*) AS BIGINT)
        |    AS ws_e6
        |  FROM pt GROUP BY 1
        |), ph AS (
        |  SELECT pt.doc_id, pt.island,
        |    string_agg(pt.w, ' ' ORDER BY pt.pos) AS phrase,
        |    CAST(max(pt.plen) AS BIGINT) AS n_words,
        |    CAST(sum(wsc.ws_e6) AS BIGINT) AS score_e6
        |  FROM pt JOIN wsc USING (w) GROUP BY 1, 2
        |), bt AS (
        |  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ,
        |    max(n_words) AS n_words, max(score_e6) AS score_e6
        |  FROM ph GROUP BY 1
        |), top AS (SELECT * FROM bt ORDER BY score_e6 DESC, phrase LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY score_e6 DESC, phrase)
        |    AS INT) AS rk,
        |  phrase, n_words, n_occ, score_e6
        |FROM top ORDER BY rk""".stripMargin),
    // raw Turing r* = (r+1)·N(r+1)/N(r) over the count-of-counts,
    // HUGEINT floor-div, gap rows (no N(r+1)) at 0
    "good_turing" ->
      """WITH tk AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |    AS w FROM documents
        |), fr AS (
        |  SELECT w, count(*) AS r FROM tk GROUP BY w
        |), coc AS (
        |  SELECT r, count(*) AS n_r FROM fr GROUP BY r)
        |SELECT c.r, CAST(c.n_r AS BIGINT) AS n_r,
        |  CAST((CAST(c.r + 1 AS HUGEINT) * coalesce(c2.n_r, 0)
        |    * 1000000) // c.n_r AS BIGINT) AS r_star_e6
        |FROM coc c LEFT JOIN coc c2 ON c2.r = c.r + 1
        |ORDER BY c.r""".stripMargin,
    // token-frequency Gini: ascending (f, w) ranks, the
    // gini_concentration closed form in HUGEINT
    "vocab_gini" ->
      """WITH tk AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |    AS w FROM documents
        |), fr AS (
        |  SELECT w, count(*) AS f FROM tk GROUP BY w
        |), rk AS (
        |  SELECT f, row_number() OVER (ORDER BY f, w) AS rnk FROM fr
        |), ag AS (
        |  SELECT count(*) AS n_types, sum(f) AS total_tokens,
        |    sum(CAST(rnk AS HUGEINT) * f) AS rank_weighted
        |  FROM rk)
        |SELECT CAST(n_types AS BIGINT) AS n_types,
        |  CAST(total_tokens AS BIGINT) AS total_tokens,
        |  CAST(((2 * rank_weighted - (n_types + 1)
        |      * CAST(total_tokens AS HUGEINT)) * 1000000)
        |    // (CAST(n_types AS HUGEINT) * total_tokens) AS BIGINT)
        |    AS gini_e6
        |FROM ag""".stripMargin,
    // Heaps curve: first-doc type attribution, prefix sums along
    // doc_id, power-of-two ranks + the full-corpus point
    "heaps_curve" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents
        |), pd AS (
        |  SELECT doc_id, count(*) AS n_tok FROM tk GROUP BY doc_id
        |), nt AS (
        |  SELECT doc_id, count(*) AS n_new FROM (
        |    SELECT w, min(doc_id) AS doc_id FROM tk GROUP BY w)
        |  GROUP BY doc_id
        |), base AS (
        |  SELECT d.doc_id, coalesce(pd.n_tok, 0) AS n_tok,
        |    coalesce(nt.n_new, 0) AS n_new
        |  FROM documents d LEFT JOIN pd USING (doc_id)
        |  LEFT JOIN nt USING (doc_id)
        |), cum AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rk,
        |    count(*) OVER () AS n_docs,
        |    sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      AS cum_tokens,
        |    sum(n_new) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      AS cum_types
        |  FROM base)
        |SELECT CAST(rk AS BIGINT) AS rk, doc_id,
        |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
        |  CAST(cum_types AS BIGINT) AS cum_types
        |FROM cum WHERE (rk & (rk - 1)) = 0 OR rk = n_docs
        |ORDER BY rk""".stripMargin,
    // t-score collocations: integral numerator f(ab)·N − f(a)·f(b) in
    // HUGEINT, the one double expression operand-identical to the
    // engine (sqrt is correctly rounded — portable; ln would not be)
    "collocations_tscore" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
        |    generate_subscripts(regexp_extract_all(lower(text),
        |      '[a-z0-9]+'), 1) - 1 AS pos
        |  FROM documents
        |), bg AS (
        |  SELECT w AS w1,
        |    lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |  FROM tk
        |), fab AS (
        |  SELECT w1, w2, count(*) AS n_ab FROM bg
        |  WHERE w2 IS NOT NULL GROUP BY w1, w2 HAVING count(*) >= 5
        |), uni AS (
        |  SELECT w, count(*) AS f FROM tk GROUP BY w
        |), tot AS (SELECT count(*) AS n_tok FROM tk
        |), sc AS (
        |  SELECT w1, w2, n_ab,
        |    CAST(CAST(n_ab AS HUGEINT) * n_tok
        |        - CAST(a.f AS HUGEINT) * b.f AS DOUBLE)
        |      / (CAST(n_tok AS DOUBLE) * sqrt(CAST(n_ab AS DOUBLE)))
        |      AS t_score
        |  FROM fab JOIN uni a ON a.w = fab.w1
        |  JOIN uni b ON b.w = fab.w2 CROSS JOIN tot
        |), rk AS (
        |  SELECT *, row_number() OVER (ORDER BY t_score DESC, w1, w2)
        |    AS rk FROM sc)
        |SELECT CAST(rk AS INT) AS rk, w1, w2,
        |  CAST(n_ab AS BIGINT) AS n_ab, t_score
        |FROM rk WHERE rk <= 20 ORDER BY rk""".stripMargin,
    // per-document RAKE replay: identical islands, word stats grouped by
    // (doc_id, w), per-doc top-5 rank
    "rake_keywords_doc" ->
      (s"""WITH tk AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
        |    generate_subscripts(regexp_extract_all(lower(text),
        |      '[a-z0-9]+'), 1) - 1 AS pos
        |  FROM documents
        |), ns AS (
        |  SELECT doc_id, pos, w,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
        |      AS island
        |  FROM tk WHERE w NOT IN (${operators.TextAnalysis.stopwords
             .map(w => s"'$w'").mkString(", ")})
        |), pt AS MATERIALIZED (
        |  SELECT doc_id, island, pos, w,
        |    count(*) OVER (PARTITION BY doc_id, island) AS plen
        |  FROM ns
        |), wsc AS (
        |  SELECT doc_id, w,
        |    CAST((sum(plen) * 1000000) // count(*) AS BIGINT) AS ws_e6
        |  FROM pt GROUP BY 1, 2
        |), ph AS (
        |  SELECT pt.doc_id, pt.island,
        |    string_agg(pt.w, ' ' ORDER BY pt.pos) AS phrase,
        |    CAST(max(pt.plen) AS BIGINT) AS n_words,
        |    CAST(sum(wsc.ws_e6) AS BIGINT) AS score_e6
        |  FROM pt JOIN wsc USING (doc_id, w) GROUP BY 1, 2
        |), bd AS (
        |  SELECT doc_id, phrase, CAST(count(*) AS BIGINT) AS n_occ,
        |    max(n_words) AS n_words, max(score_e6) AS score_e6
        |  FROM ph GROUP BY 1, 2
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score_e6 DESC, phrase) AS rk
        |  FROM bd)
        |SELECT doc_id, CAST(rk AS INT) AS rk, phrase, n_words, n_occ,
        |  score_e6
        |FROM rk WHERE rk <= 5 ORDER BY doc_id, rk""".stripMargin),
    // rank-weighted closed form replayed with HUGEINT
    // cross-multiplication; ranks under the (cents, custkey) total order
    "gini_concentration" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1
        |), r AS (
        |  SELECT cents,
        |    row_number() OVER (ORDER BY cents, o_custkey) AS rnk
        |  FROM per
        |), a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |    CAST(sum(cents) AS BIGINT) AS total_cents,
        |    sum(CAST(rnk AS HUGEINT) * cents) AS rw
        |  FROM r)
        |SELECT n_customers, total_cents,
        |  CAST(2 * rw - (n_customers + 1) * CAST(total_cents AS HUGEINT)
        |    AS BIGINT) AS gini_num,
        |  CAST(CAST(n_customers AS HUGEINT) * total_cents AS BIGINT)
        |    AS gini_den,
        |  CAST(((2 * rw - (n_customers + 1) * CAST(total_cents AS HUGEINT))
        |    * 1000000) // (CAST(n_customers AS HUGEINT) * total_cents)
        |    AS BIGINT) AS gini_e6
        |FROM a""".stripMargin,
    // top-k via ORDER BY/LIMIT on the aggregated key relation; skew
    // factor in HUGEINT cross-multiplication
    "skew_profile" ->
      """WITH c AS (
        |  SELECT l_partkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS n_total,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(max(cnt) AS BIGINT) AS max_cnt
        |  FROM c
        |), top AS (SELECT key, cnt FROM c ORDER BY cnt DESC, key LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY top.cnt DESC, top.key)
        |    AS INT) AS rk,
        |  top.key, CAST(top.cnt AS BIGINT) AS cnt,
        |  CAST((top.cnt * 1000000) // t.n_total AS BIGINT) AS pct_e6,
        |  t.n_total, t.n_keys,
        |  CAST((CAST(t.max_cnt AS HUGEINT) * t.n_keys * 1000000)
        |    // t.n_total AS BIGINT) AS skew_e6
        |FROM top CROSS JOIN t ORDER BY rk""".stripMargin,
    // lift kept rational (no ln): ranking and the PMI>0 cut replay as
    // exact HUGEINT division, top-5 per product; marginals are TRUE
    // (full-count) while the scored relation carries the Church–Hanks
    // support floor cnt >= 2 (r17)
    "ppmi_rank" ->
      (cooccurCte + """, ra AS (SELECT product, sum(cnt) AS c_a FROM counts GROUP BY 1
        |), rb AS (SELECT neighbor, sum(cnt) AS c_b FROM counts GROUP BY 1
        |), tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM counts
        |), sc AS (
        |  SELECT m.product, m.neighbor, m.cnt, tot.n_total,
        |    CAST((CAST(m.cnt AS HUGEINT) * tot.n_total * 1000000)
        |      // (CAST(ra.c_a AS HUGEINT) * rb.c_b) AS BIGINT) AS lift_e6
        |  FROM counts m JOIN ra USING (product) JOIN rb USING (neighbor)
        |  CROSS JOIN tot
        |  WHERE m.cnt >= 2
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY product
        |    ORDER BY lift_e6 DESC, neighbor) AS rk
        |  FROM sc WHERE lift_e6 > 1000000)
        |SELECT product, neighbor, cnt, n_total, lift_e6,
        |  CAST(rk AS INT) AS rk
        |FROM rk WHERE rk <= 5 ORDER BY product, rk""".stripMargin),
    // two-source union + update-mode last-emission recovery must equal
    // the batch aggregate over the whole corpus — same oracle text
    "hourly_counts_union_stream" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // streaming dedup admits each distinct fingerprint exactly once
    "dedup_stream" ->
      "SELECT DISTINCT md5(text) AS fp FROM documents ORDER BY fp",
    // within one watermark window the bounded form admits exactly the
    // distinct keys — the window-crossing TTL behavior is spec-held
    "dedup_stream_bounded" ->
      "SELECT DISTINCT md5(event_type) AS fp FROM events ORDER BY fp",
    "cooccur_counts_gen" ->
      (cooccurCte + "\nSELECT product, neighbor, cnt FROM counts ORDER BY product, neighbor"),
    // the custom-LogicalPlan form answers to the same window semantics
    "cooccur_counts_plan" ->
      (cooccurCte + "\nSELECT product, neighbor, cnt FROM counts ORDER BY product, neighbor"),
    "crystalball_pairs" ->
      (cooccurCte +
        """
        |SELECT product, neighbor, cnt,
        |       CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY product) AS DOUBLE) AS prob
        |FROM counts ORDER BY product, neighbor""".stripMargin),
    "crystalball_totals" ->
      (cooccurCte +
        """
        |SELECT product, neighbor, cnt,
        |       CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY product) AS DOUBLE) AS prob
        |FROM counts ORDER BY product, neighbor""".stripMargin),
    "salted_agg" ->
      """SELECT l_returnflag, count(*) AS cnt FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "skew_join" ->
      """SELECT p_brand, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "crystalball_stripes" ->
      (cooccurCte +
        """, probs AS (
        |  SELECT product, neighbor, cnt,
        |         CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY product) AS DOUBLE) AS prob
        |  FROM counts
        |)
        |SELECT product,
        |       count(*) OVER (PARTITION BY product) AS n_neighbors,
        |       row_number() OVER (PARTITION BY product ORDER BY neighbor) - 1 AS pos,
        |       neighbor, prob
        |FROM probs ORDER BY product, pos""".stripMargin),
    "stripe_lookup" ->
      (cooccurCte +
        """, probs AS (
        |  SELECT product, neighbor,
        |         CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY product) AS DOUBLE) AS prob
        |  FROM counts
        |), agg AS (
        |  SELECT product, count(*) AS n_neighbors FROM probs GROUP BY product
        |), p34 AS (
        |  SELECT product, prob AS p34 FROM probs WHERE neighbor = '34'
        |)
        |SELECT agg.product, agg.n_neighbors, p34.p34
        |FROM agg LEFT JOIN p34 ON agg.product = p34.product
        |ORDER BY agg.product""".stripMargin),
    "page_rank" -> pageRankSql(3),
    // personalized PageRank: the same unrolled recurrence with seed-gated
    // teleport mass (khop's round-hundred seed rule)
    "ppr_seeded" -> pprSql(3),
    // HyperANF: the register relation and integer estimate replayed
    "hyperanf" -> hyperAnfSql(3),
    "anf_function" -> anfFunctionSql(3),
    "hyperanf_256" -> hyperAnfSql(3, registers = 256),
    "anf_function_256" -> anfFunctionSql(3, registers = 256),
    "harmonic_centrality" -> harmonicCentralitySql(3),
    // the hash-argmin walk replayed step by step
    "random_walks" -> (walkCte(4, 2) +
      "\nSELECT seed, rep, step, node FROM walks ORDER BY seed, rep, step"),
    // the biased second-order walk with its draw table replayed
    "node2vec_walks" -> node2vecSql(4, 2),
    // skip-gram windowing over the identical walk relation
    "walk_skipgram" -> (walkCte(4, 2) +
      """
      |SELECT a.node AS center, b.node AS context, count(*) AS cnt
      |FROM walks a JOIN walks b
      |  ON a.seed = b.seed AND a.rep = b.rep AND a.step <> b.step
      |  AND abs(b.step - a.step) <= 2
      |GROUP BY 1, 2 ORDER BY center, context""".stripMargin),
    // the oracle inverts the same CDF with a plain range join (fine at
    // oracle scale; the engine's bucketization must be invisible);
    // freq^(3/4) via composed sqrt — correctly rounded on both engines
    "skipgram_negatives" -> (walkCte(4, 2) +
      """, sg_pairs AS (
      |  SELECT a.node AS center, b.node AS context, count(*) AS cnt
      |  FROM walks a JOIN walks b
      |    ON a.seed = b.seed AND a.rep = b.rep AND a.step <> b.step
      |    AND abs(b.step - a.step) <= 2
      |  GROUP BY 1, 2
      |), freqs AS (
      |  SELECT context AS node, CAST(sum(cnt) AS BIGINT) AS freq
      |  FROM sg_pairs GROUP BY 1
      |), wts AS (
      |  SELECT node,
      |    CAST(floor(sqrt(CAST(freq AS DOUBLE))
      |      * sqrt(sqrt(CAST(freq AS DOUBLE))) * 1000.0) AS BIGINT) AS w
      |  FROM freqs
      |), ladder AS (
      |  SELECT node, w,
      |    CAST(coalesce(sum(w) OVER (ORDER BY node
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS w_before,
      |    CAST(sum(w) OVER () AS BIGINT) AS wt
      |  FROM wts
      |), draws AS (
      |  SELECT center, context, j,
      |    ('0x' || substr(md5('neg:' || center || ':' || context || ':' || j),
      |      1, 14))::BIGINT % (SELECT max(wt) FROM ladder) AS u
      |  FROM sg_pairs CROSS JOIN (SELECT unnest(range(1, 3)) AS j)
      |)
      |SELECT d.center, d.context, CAST(d.j AS INT) AS j,
      |  l.node AS negative,
      |  (l.node = d.center OR l.node = d.context) AS is_collision
      |FROM draws d JOIN ladder l
      |  ON d.u >= l.w_before AND d.u < l.w_before + l.w
      |ORDER BY center, context, j""".stripMargin),
    // fixed unroll >= the graph's measured integer-fixpoint round (55 at
    // sf0.01 on the significant graph, margin to 80; engine loops until
    // changed==0 and no-op rounds make any larger unroll identical — the
    // lpaConvergedCte argument applied to the rank lattice)
    "pagerank_converged" -> pageRankSql(80, materialize = true,
      edgesWith = cooccurCte +
        ", edges AS (SELECT product AS src, neighbor AS dst FROM counts WHERE cnt >= 2)"),
    // same triangles, enumerated by the id-ordered a<b<c form (join order
    // differs, the counted set is identical — that's the point)
    "triangle_count" ->
      (cooccurCte +
        """, und AS (
        |  SELECT DISTINCT least(product, neighbor) AS u,
        |    greatest(product, neighbor) AS v
        |  FROM counts WHERE product <> neighbor AND cnt >= 2
        |), tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM und e1
        |  JOIN und e2 ON e2.u = e1.v
        |  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
        |)
        |SELECT node, count(*) AS n_tri FROM (
        |  SELECT unnest([a, b, c]) AS node FROM tri)
        |GROUP BY node ORDER BY node""".stripMargin),
    // Watts–Strogatz local clustering: triangles re-enumerated
    // id-ordered, corners unnested per node, exact e6 rational —
    // degree-1 nodes pinned to 0, triangle-free nodes kept via the
    // left join
    "local_clustering" ->
      (cooccurCte +
        """, und AS (
        |  SELECT DISTINCT least(product, neighbor) AS u,
        |    greatest(product, neighbor) AS v
        |  FROM counts WHERE product <> neighbor AND cnt >= 2
        |), deg AS (
        |  SELECT node, count(*) AS degree FROM (
        |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY node
        |), tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM und e1
        |  JOIN und e2 ON e2.u = e1.v
        |  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
        |), tn AS (
        |  SELECT node, count(*) AS triangles FROM (
        |    SELECT unnest([a, b, c]) AS node FROM tri)
        |  GROUP BY node
        |)
        |SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
        |  CAST(coalesce(t.triangles, 0) AS BIGINT) AS triangles,
        |  CAST(CASE WHEN d.degree >= 2
        |    THEN (2 * coalesce(t.triangles, 0) * 1000000)
        |      // (d.degree * (d.degree - 1))
        |    ELSE 0 END AS BIGINT) AS cc_e6
        |FROM deg d LEFT JOIN tn t USING (node) ORDER BY node""".stripMargin),
    // Newman assortativity: HUGEINT moment sums over the both-
    // orientations degree-pair relation, the one double ratio built
    // from the same cast-to-double operands as the engine, integer
    // degeneracy test
    "assortativity" ->
      (cooccurCte +
        """, und AS (
        |  SELECT DISTINCT least(product, neighbor) AS u,
        |    greatest(product, neighbor) AS v
        |  FROM counts WHERE product <> neighbor AND cnt >= 2
        |), deg AS (
        |  SELECT node, count(*) AS d FROM (
        |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY node
        |), pr AS (
        |  SELECT d1.d AS j, d2.d AS k
        |  FROM und JOIN deg d1 ON d1.node = und.u
        |  JOIN deg d2 ON d2.node = und.v
        |  UNION ALL
        |  SELECT d2.d AS j, d1.d AS k
        |  FROM und JOIN deg d1 ON d1.node = und.u
        |  JOIN deg d2 ON d2.node = und.v
        |), ag AS (
        |  SELECT count(*) AS n,
        |    sum(CAST(j AS HUGEINT)) AS sj,
        |    sum(CAST(j AS HUGEINT) * j) AS sjj,
        |    sum(CAST(j AS HUGEINT) * k) AS sjk
        |  FROM pr)
        |SELECT CAST(n // 2 AS BIGINT) AS n_edges,
        |  CASE WHEN CAST(n AS HUGEINT) * sjj = sj * sj THEN NULL
        |    ELSE (CAST(n AS DOUBLE) * CAST(sjk AS DOUBLE)
        |        - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sjj AS DOUBLE)
        |        - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))
        |  END AS assortativity
        |FROM ag""".stripMargin),
    // rich club: power-of-two threshold spine, club membership by
    // min(endpoint degree) > k, exact e6 density
    "rich_club" ->
      (cooccurCte +
        """, und AS (
        |  SELECT DISTINCT least(product, neighbor) AS u,
        |    greatest(product, neighbor) AS v
        |  FROM counts WHERE product <> neighbor AND cnt >= 2
        |), deg AS (
        |  SELECT node, count(*) AS d FROM (
        |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY node
        |), th AS (
        |  SELECT k FROM (
        |    SELECT unnest(list_transform(range(0, 63),
        |      i -> CAST(1 AS BIGINT) << i)) AS k), (
        |    SELECT max(d) AS md FROM deg)
        |  WHERE k <= md
        |), em AS (
        |  SELECT least(d1.d, d2.d) AS m
        |  FROM und JOIN deg d1 ON d1.node = und.u
        |  JOIN deg d2 ON d2.node = und.v
        |), ek AS (
        |  SELECT k, count(CASE WHEN m > k THEN 1 END) AS n_edges
        |  FROM em CROSS JOIN th GROUP BY k
        |), nk AS (
        |  SELECT k, count(CASE WHEN d > k THEN 1 END) AS n_nodes
        |  FROM deg CROSS JOIN th GROUP BY k
        |)
        |SELECT nk.k, CAST(nk.n_nodes AS BIGINT) AS n_nodes,
        |  CAST(ek.n_edges AS BIGINT) AS n_edges,
        |  CAST(CASE WHEN nk.n_nodes >= 2
        |    THEN (2 * ek.n_edges * 1000000)
        |      // (nk.n_nodes * (nk.n_nodes - 1))
        |    ELSE 0 END AS BIGINT) AS phi_e6
        |FROM nk JOIN ek USING (k) ORDER BY nk.k""".stripMargin),
    // unrolled synchronous LPA twin: same undirected significant-edge
    // graph, 3 rounds, QUALIFY row_number argmax = the engine's
    // min(struct(-cnt, lbl)) (max count, smallest-label tie-break)
    "communities_lpa" -> lpaSql(3),
    // fixed unroll >= the fixture's convergence round (engine loops
    // until changed==0; monotone no-op rounds make any larger unroll
    // identical — see lpaConvergedCte)
    "lpa_converged" -> (lpaConvergedCte(16) +
      "\nSELECT node, community FROM labels ORDER BY node"),
    "modularity_lpa" -> modularityLpaSql(16),
    // same fixed-unroll discipline for the peel: any unroll >= the
    // engine's convergence round (8 at sf0.01) yields the identical core
    "kcore_decompose" -> kcoreSql(2, 16),
    // fixed unroll >= the engine's measured peel depth at sf0.01 (the
    // kcore no-op argument applies: a converged round keeps every edge)
    "ktruss_edges" -> ktrussSql(3, 12),
    // capped wedge pairs through each apex (QUALIFY ≤ 64 by neighbor id
    // — the engine's map-side cut), per-term-floored RA sum, full-degree
    // Jaccard, existing edges anti-joined
    "link_predict" -> (cooccurCte +
      """, e AS (
        |  SELECT product AS src, neighbor AS dst FROM counts WHERE cnt >= 2
        |), und AS MATERIALIZED (
        |  SELECT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM e WHERE src <> dst GROUP BY 1, 2
        |), adj AS (
        |  SELECT u AS w, v AS x FROM und
        |  UNION ALL SELECT v AS w, u AS x FROM und
        |), deg AS (SELECT w, count(*) AS deg FROM adj GROUP BY w
        |), capped AS (
        |  SELECT w, x FROM adj
        |  QUALIFY row_number() OVER (PARTITION BY w ORDER BY x) <= 64
        |), cand AS (
        |  SELECT ca.x AS a, cb.x AS b, ca.w
        |  FROM capped ca JOIN capped cb ON ca.w = cb.w AND ca.x < cb.x
        |), scored AS (
        |  SELECT c.a, c.b, CAST(count(*) AS BIGINT) AS common_neighbors,
        |    CAST(sum(1000000 // d.deg) AS BIGINT) AS ra_e6
        |  FROM cand c JOIN deg d ON d.w = c.w GROUP BY 1, 2
        |  HAVING count(*) >= 2
        |), new_pairs AS (
        |  SELECT s.* FROM scored s LEFT JOIN und
        |    ON und.u = s.a AND und.v = s.b
        |  WHERE und.u IS NULL)
        |SELECT p.a, p.b, p.common_neighbors,
        |  da.deg AS deg_a, db.deg AS deg_b,
        |  CAST((1000000 * p.common_neighbors) //
        |    (da.deg + db.deg - p.common_neighbors) AS BIGINT) AS jaccard_e6,
        |  p.ra_e6
        |FROM new_pairs p
        |JOIN deg da ON da.w = p.a JOIN deg db ON db.w = p.b
        |ORDER BY p.a, p.b""".stripMargin),
    // recursive-CTE twin of the frontier BFS: UNION (not UNION ALL)
    // dedupes (node, hop) pairs so the working set stays bounded on the
    // dense graph, and min(hop) reproduces the anti-join's minimality
    "khop_reach" ->
      ("WITH RECURSIVE " + cooccurCte.stripPrefix("WITH ") +
        """, e AS (
        |  SELECT product AS src, neighbor AS dst FROM counts WHERE cnt >= 2
        |), reach(node, hop) AS (
        |  SELECT DISTINCT src, 0 FROM e WHERE CAST(src AS BIGINT) % 100 = 0
        |  UNION
        |  SELECT e.dst, r.hop + 1 FROM reach r JOIN e ON e.src = r.node
        |  WHERE r.hop < 3
        |)
        |SELECT node, min(hop) AS min_hops FROM reach GROUP BY node
        |ORDER BY min_hops, node""".stripMargin),
    // the same 24-step integer decay, DuckDB's // = Spark's div on
    // positive BIGINTs; floor(o_totalprice * 100) is the same double
    // expression on both sides
    "cbo_reorder" ->
      """SELECT c_nationkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "sql_recursive_decay" ->
      """WITH RECURSIVE sched(o_orderkey, m, bal) AS (
        |  SELECT o_orderkey, 0, CAST(floor(o_totalprice * 100) AS BIGINT)
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, m + 1, bal - ((bal * 3) // 100)
        |  FROM sched WHERE m < 24
        |)
        |SELECT o_orderkey, max(bal) AS start_cents, min(bal) AS final_cents
        |FROM sched GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    // the unbounded closure: recursion capped at the engine's shared
    // 60-round convergence bound (UNION dedups (node, hop) pairs, so a
    // cycle contributes at most |V|·60 rows, never an infinite stream);
    // min(hop) recovers the exact BFS level
    "reach_converged" ->
      ("WITH RECURSIVE " + cooccurCte.stripPrefix("WITH ") +
        """, e AS (
        |  SELECT product AS src, neighbor AS dst FROM counts WHERE cnt >= 2
        |), reach(node, hop) AS (
        |  SELECT DISTINCT src, 0 FROM e WHERE CAST(src AS BIGINT) % 100 = 0
        |  UNION
        |  SELECT e.dst, r.hop + 1 FROM reach r JOIN e ON e.src = r.node
        |  WHERE r.hop < 60
        |)
        |SELECT node, min(hop) AS min_hops FROM reach GROUP BY node
        |ORDER BY min_hops, node""".stripMargin),
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS count_order,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "join_bcast_region" ->
      """SELECT r_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "rollup_agg" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |  coalesce(l_linestatus, '(all)') AS linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "cube_agg" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS orderstatus,
        |  coalesce(o_orderpriority, '(all)') AS orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY orderstatus, orderpriority""".stripMargin,
    "approx_stats" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  TRUE AS approx_parts_within_5pct,
        |  TRUE AS approx_median_within_decile
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "set_ops" ->
      """WITH ordered AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
        |rich AS (SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT custkey, 'both' AS tag
        |FROM (SELECT custkey FROM ordered INTERSECT SELECT custkey FROM rich)
        |UNION ALL
        |SELECT custkey, 'rich_no_orders' AS tag
        |FROM (SELECT custkey FROM rich EXCEPT SELECT custkey FROM ordered)
        |ORDER BY tag, custkey""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin,
    "outer_join_agg" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), CAST(0 AS DOUBLE)) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "full_outer_presence" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
        |           WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
        |b AS (SELECT DISTINCT o_custkey AS k FROM orders
        |      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00')
        |SELECT coalesce(a.k, b.k) AS custkey,
        |  CASE WHEN a.k IS NULL THEN 0 ELSE 1 END AS early,
        |  CASE WHEN b.k IS NULL THEN 0 ELSE 1 END AS late
        |FROM a FULL JOIN b ON a.k = b.k ORDER BY custkey""".stripMargin,
    "above_avg_orders" ->
      """WITH g AS (
        |  SELECT o_custkey AS k, count(*) AS n,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |  FROM orders GROUP BY 1)
        |SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders JOIN g ON o_custkey = g.k
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * n > total
        |ORDER BY o_orderkey""".stripMargin,
    "pivot_status" ->
      ("""SELECT o_orderstatus,""" +
        Relational.OrderPriorities.map(p =>
          s"""\n  CAST(sum(CASE WHEN o_orderpriority = '$p' THEN 1 ELSE 0 END) AS BIGINT) AS "$p"""")
          .mkString(",") +
        "\nFROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "unpivot_status" ->
      (s"""WITH s AS (SELECT DISTINCT o_orderstatus FROM orders),
        |pr AS (SELECT unnest([${Relational.OrderPriorities.map(p => s"'$p'").mkString(", ")}]) AS priority),
        |c AS (SELECT o_orderstatus, o_orderpriority AS priority, count(*) AS n
        |      FROM orders GROUP BY 1, 2)
        |SELECT s.o_orderstatus, pr.priority, coalesce(c.n, 0) AS n
        |FROM s CROSS JOIN pr
        |LEFT JOIN c ON c.o_orderstatus = s.o_orderstatus AND c.priority = pr.priority
        |ORDER BY s.o_orderstatus, pr.priority""".stripMargin),
    "array_funcs" ->
      (basketsCte +
        """
        |SELECT customer,
        |  CAST(len(products) AS BIGINT) AS n_products,
        |  array_to_string(products[1:3], ' ') AS first3,
        |  array_to_string(list_sort(products), ' ') AS sorted_products,
        |  CAST(len(list_distinct(products)) AS BIGINT) AS n_distinct,
        |  list_contains(products, '34') AS has_34,
        |  len(list_filter(products, p -> regexp_matches(p, '^[0-9]+$'))) = len(products) AS all_numeric,
        |  CAST(coalesce(list_sum(list_transform(products, p -> length(p))), 0) AS BIGINT) AS total_chars
        |FROM baskets ORDER BY customer""".stripMargin),
    "above_nation_avg" ->
      """SELECT c_custkey, c_nationkey, c_acctbal FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
        |      (SELECT count(*) FROM customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)
        |    > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    "lateral_topk" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,
    "date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  last_day(o_orderdate) AS month_end,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INTEGER) AS days_to_1999
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_funcs" ->
      """SELECT p_partkey, upper(p_name) AS name_upper,
        |  length(p_name) AS name_len,
        |  substr(p_brand, 1, 5) AS brand_prefix,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  abs(p_size - 25) AS size_dist,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  p_size % 7 AS size_mod,
        |  CASE WHEN p_size >= 25 THEN 'big' ELSE 'small' END AS size_class,
        |  CAST(levenshtein(p_brand, 'Brand#33') AS BIGINT) AS brand_dist
        |FROM part ORDER BY p_partkey""".stripMargin,
    "regex_funcs" ->
      """SELECT p_partkey,
        |  regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_masked,
        |  regexp_extract(p_brand, '[0-9]+') AS brand_num,
        |  regexp_matches(p_name, '[0-9]') AS name_has_digits,
        |  CAST(length(regexp_replace(p_brand, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit_chars,
        |  string_split(p_type, ' ')[1] AS type_head
        |FROM part ORDER BY p_partkey""".stripMargin,
    "set_ops_all" ->
      """WITH early AS (SELECT o_orderpriority AS priority FROM orders
        |               WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
        |late AS (SELECT o_orderpriority AS priority FROM orders
        |         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'),
        |i AS (SELECT priority FROM early INTERSECT ALL SELECT priority FROM late),
        |e AS (SELECT priority FROM early EXCEPT ALL SELECT priority FROM late)
        |SELECT priority, count(*) AS n, 'intersect_all' AS op FROM i GROUP BY priority
        |UNION ALL
        |SELECT priority, count(*) AS n, 'except_all' AS op FROM e GROUP BY priority
        |ORDER BY op, priority""".stripMargin,
    "grouping_sets" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |  coalesce(l_linestatus, '(all)') AS linestatus,
        |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin,
    "exact_median" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem
        |)
        |SELECT l_returnflag, l_quantity AS median_qty, n AS n_rows
        |FROM r WHERE rn = (n + 1) // 2 ORDER BY l_returnflag""".stripMargin,
    // the streamed merge is bit-identical to the one-shot sketch (the
    // partials recombine exactly), so it replays the same oracle
    "quantile_stream" -> quantileSketchOnlyOracle,
    // bucket CDF + integer interpolation replayed verbatim; the exact
    // leg is the rank-t value under ORDER BY v (tie order irrelevant to
    // the t-th smallest VALUE)
    "quantile_sketch" -> quantileSketchOnlyOracle,
    "quantile_sketch_audit" -> quantileSketchOracle,
    "exact_quantiles" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem
        |), q AS (SELECT unnest([25, 50, 75, 95]) AS q_pct)
        |SELECT l_returnflag, q.q_pct, l_quantity AS qty, n AS n_rows
        |FROM r, q WHERE rn = greatest(1, (n * q.q_pct + 99) // 100)
        |ORDER BY l_returnflag, q_pct""".stripMargin,
    "order_rank" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey) AS rnk,
        |  count(*) OVER (PARTITION BY o_orderstatus) AS n_group
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "quantile_normalize" ->
      """WITH r AS (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice, o_orderkey) AS rnk,
        |    count(*) OVER (PARTITION BY o_orderstatus) AS n_group
        |  FROM orders)
        |SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  CASE WHEN n_group = 1 THEN 0.5
        |    ELSE CAST(rnk - 1 AS DOUBLE) / CAST(n_group - 1 AS DOUBLE)
        |  END AS quantile
        |FROM r ORDER BY o_orderstatus, o_orderkey""".stripMargin,
    // the richest-member argmax = ORDER BY (cents DESC, custkey) LIMIT 1
    // per entity; mode = (cnt DESC, segment) — both replayed as windows
    "golden_record" ->
      """WITH base AS (
        |  SELECT c_custkey // 3 AS entity_id, c_custkey, c_name,
        |    c_nationkey, c_mktsegment,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM customer
        |), rich AS (
        |  SELECT entity_id, c_custkey AS golden_custkey,
        |    c_name AS golden_name, c_nationkey AS golden_nation
        |  FROM (
        |    SELECT *, row_number() OVER (PARTITION BY entity_id
        |      ORDER BY cents DESC, c_custkey) AS rn
        |    FROM base) WHERE rn = 1
        |), agg AS (
        |  SELECT entity_id, count(*) AS n_members,
        |    CAST(max(cents) AS DOUBLE) / 100.0 AS golden_acctbal
        |  FROM base GROUP BY 1
        |), mode AS (
        |  SELECT entity_id, c_mktsegment AS golden_segment
        |  FROM (
        |    SELECT entity_id, c_mktsegment,
        |      row_number() OVER (PARTITION BY entity_id
        |        ORDER BY count(*) DESC, c_mktsegment) AS rn
        |    FROM base GROUP BY entity_id, c_mktsegment) WHERE rn = 1
        |)
        |SELECT a.entity_id, a.n_members, r.golden_custkey, r.golden_name,
        |  r.golden_nation, a.golden_acctbal, m.golden_segment
        |FROM agg a JOIN rich r USING (entity_id) JOIN mode m USING (entity_id)
        |ORDER BY entity_id""".stripMargin,
    "k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS n
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(5 AS INT) AS k,
        |  count(*) AS n_groups,
        |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
        |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_risky_rows,
        |  CAST(min(n) AS BIGINT) AS min_group_size
        |FROM g""".stripMargin,
    // the same two nested aggregates; the band shift keeps the integral
    // divide positive so // (floor) and div (truncate) agree
    "l_diversity" ->
      """WITH cell AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000)
        |      // 100000 AS band,
        |    count(*) AS cnt
        |  FROM customer GROUP BY 1, 2, 3
        |), g AS (
        |  SELECT c_nationkey, c_mktsegment, CAST(sum(cnt) AS BIGINT) AS n,
        |    count(*) AS n_sens, CAST(max(cnt) AS BIGINT) AS max_freq
        |  FROM cell GROUP BY 1, 2)
        |SELECT CAST(3 AS INT) AS l,
        |  count(*) AS n_groups,
        |  CAST(sum(CASE WHEN n_sens < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low_diversity_groups,
        |  CAST(sum(CASE WHEN n_sens < 3 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_rows_at_risk,
        |  CAST(min(n_sens) AS BIGINT) AS min_distinct_sensitive,
        |  CAST(sum(CASE WHEN max_freq * 3 > n THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_skewed_groups
        |FROM g""".stripMargin,
    // ordered EMD over the dense (group × band) grid; e6-quantized
    // integer distributions so cumulative terms replay exactly; // is
    // DuckDB floor division = Spark div on the non-negative operands
    "t_closeness" ->
      """WITH cell AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000)
        |      // 100000 AS band,
        |    count(*) AS cnt
        |  FROM customer GROUP BY 1, 2, 3
        |), g AS (
        |  SELECT c_nationkey, c_mktsegment, CAST(sum(cnt) AS BIGINT) AS n_g
        |  FROM cell GROUP BY 1, 2
        |), bands AS (
        |  SELECT band, CAST(sum(cnt) AS BIGINT) AS cnt_v FROM cell GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(cnt_v) AS BIGINT) AS n_total, count(*) AS m
        |  FROM bands
        |), grid AS (
        |  SELECT g.c_nationkey, g.c_mktsegment, b.band, g.n_g, t.m,
        |    COALESCE(c.cnt, 0) * 1000000 // g.n_g AS p_e6,
        |    b.cnt_v * 1000000 // t.n_total AS q_e6
        |  FROM g CROSS JOIN bands b CROSS JOIN tot t
        |  LEFT JOIN cell c ON c.c_nationkey = g.c_nationkey
        |    AND c.c_mktsegment = g.c_mktsegment AND c.band = b.band
        |), cum AS (
        |  SELECT c_nationkey, c_mktsegment, n_g, m,
        |    sum(p_e6 - q_e6) OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY band
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM grid
        |), dist AS (
        |  SELECT c_nationkey, c_mktsegment, max(n_g) AS n_g,
        |    CAST(sum(abs(cum)) // (max(m) - 1) AS BIGINT) AS emd_e6
        |  FROM cum GROUP BY 1, 2)
        |SELECT CAST(200000 AS BIGINT) AS t_e6,
        |  count(*) AS n_groups,
        |  CAST(sum(CASE WHEN emd_e6 > 200000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating_groups,
        |  CAST(sum(CASE WHEN emd_e6 > 200000 THEN n_g ELSE 0 END) AS BIGINT)
        |    AS n_rows_at_risk,
        |  max(emd_e6) AS max_emd_e6
        |FROM dist""".stripMargin,
    // the oracle states the SEMANTICS directly (a plain range-predicate
    // join — fine at oracle scale; the bucketing is the engine's plan,
    // invisible to the result)
    "band_join" ->
      """SELECT s_suppkey, c_custkey,
        |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) -
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS diff_cents
        |FROM supplier JOIN customer
        |  ON abs(CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) -
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) <= 100
        |ORDER BY s_suppkey, c_custkey""".stripMargin,
    // the Poisson(1) weights replayed through the same md5-prefix
    // uniform and the precomputed e6 CDF ladder — no exp() at query time
    "bootstrap_ci" ->
      """WITH b AS (
        |  SELECT CAST(t.rep AS INTEGER) AS rep,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    ('0x' || substr(md5(concat_ws('|', 'boot',
        |      CAST(o_orderkey AS VARCHAR), CAST(t.rep AS VARCHAR))), 1, 8))::BIGINT
        |      % 1000000 AS u
        |  FROM orders CROSS JOIN range(0, 32) t(rep)
        |), w AS (
        |  SELECT rep, cents,
        |    CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
        |      WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
        |      WHEN u < 996340 THEN 4 WHEN u < 999405 THEN 5
        |      WHEN u < 999916 THEN 6 WHEN u < 999989 THEN 7
        |      WHEN u < 999998 THEN 8 ELSE 9 END AS w
        |  FROM b)
        |SELECT rep, CAST(sum(w) AS BIGINT) AS n_eff,
        |  CAST(sum(w * cents) AS BIGINT) AS sum_cents,
        |  CAST((CAST(sum(w * cents) AS HUGEINT) * 1000000) //
        |    (100 * sum(w)) AS BIGINT) AS mean_e6
        |FROM w GROUP BY rep ORDER BY rep""".stripMargin,
    // the seeded-Laplace derivation is shared verbatim: md5-prefix
    // uniform -> inverse CDF, e6 round absorbs last-ulp ln divergence
    "dp_histogram" ->
      """WITH g AS (
        |  SELECT lang, source, count(*) AS n_exact
        |  FROM documents GROUP BY 1, 2
        |), n AS (
        |  SELECT lang, source, n_exact,
        |    (('0x' || substr(md5('dp_' || lang || '_' || source), 1, 8))::BIGINT
        |       % 1000000 + 0.5) / 1000000.0 AS u
        |  FROM g)
        |SELECT lang, source, n_exact,
        |  CAST(floor((n_exact +
        |    -(1.0) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))) * 1e6 + 0.5)
        |    AS BIGINT) AS noisy_e6
        |FROM n ORDER BY lang, source""".stripMargin,
    // same noise derivation keyed per token; top-k = the engine's
    // TakeOrdered cut replayed as an ORDER BY ... LIMIT
    "dp_topk" ->
      """WITH g AS (
        |  SELECT token, count(*) AS n_exact FROM (
        |    SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token
        |    FROM documents)
        |  GROUP BY token
        |), n AS (
        |  SELECT token, n_exact,
        |    (('0x' || substr(md5('dptk_' || token), 1, 8))::BIGINT
        |       % 1000000 + 0.5) / 1000000.0 AS u
        |  FROM g
        |), s AS (
        |  SELECT token, n_exact,
        |    CAST(floor((n_exact +
        |      -(1.0) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))) * 1e6 + 0.5)
        |      AS BIGINT) AS noisy_e6
        |  FROM n ORDER BY noisy_e6 DESC, token LIMIT 10)
        |SELECT CAST(row_number() OVER (ORDER BY noisy_e6 DESC, token)
        |    AS BIGINT) AS rk,
        |  token, n_exact, noisy_e6
        |FROM s ORDER BY rk""".stripMargin,
    // hash-exact Lloyd's k-means: quantized long-form replay, floored
    // shifted-space centroid means, final argmin pass
    "kmeans_assign" -> kmeansAssignOracle(),
    "kmeans_centroids" -> kmeansCentroidsOracle(),
    // the numeric DP release: clipped sum + the constant-key seeded
    // noise, scale b = clip/(n·ε) computed from the released n
    "dp_mean" ->
      """WITH v AS (
        |  SELECT least(coalesce(CAST(len(regexp_extract_all(text, '[a-z0-9]+'))
        |    AS BIGINT), 0), 500) AS t
        |  FROM documents
        |), a AS (
        |  SELECT count(*) AS n_docs, CAST(sum(t) AS BIGINT) AS clipped_sum
        |  FROM v
        |), n AS (
        |  SELECT n_docs, clipped_sum,
        |    (('0x' || substr(md5('dp_mean_release'), 1, 8))::BIGINT
        |       % 1000000 + 0.5) / 1000000.0 AS u,
        |    500.0 / 1.0 / n_docs AS b
        |  FROM a)
        |SELECT n_docs, clipped_sum,
        |  CAST((CAST(clipped_sum AS HUGEINT) * 1000000) // n_docs
        |    AS BIGINT) AS mean_e6,
        |  CAST(floor((CAST(clipped_sum AS DOUBLE) / n_docs +
        |    -b * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))) * 1e6 + 0.5)
        |    AS BIGINT) AS noisy_mean_e6
        |FROM n""".stripMargin,
    // three row_number rankings over the customer-cardinality relation
    // replay the engine's ExactRank passes; quartile tiers are the same
    // ((rnk-1)*4) // n integer math, recency inverted (4 = most recent)
    "rfm_segment" ->
      """WITH per AS (
        |  SELECT o_custkey AS custkey, max(o_orderdate) AS last_order,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS monetary_cents
        |  FROM orders GROUP BY 1
        |), anchor AS (SELECT max(o_orderdate) AS anchor FROM orders
        |), m AS (
        |  SELECT custkey,
        |    CAST(date_diff('day', last_order, anchor) AS BIGINT)
        |      AS recency_days,
        |    frequency, monetary_cents
        |  FROM per CROSS JOIN anchor
        |), nn AS (SELECT count(*) AS n FROM m
        |), r AS (
        |  SELECT m.*,
        |    row_number() OVER (ORDER BY recency_days, custkey) AS r_rnk,
        |    row_number() OVER (ORDER BY frequency, custkey) AS f_rnk,
        |    row_number() OVER (ORDER BY monetary_cents, custkey) AS m_rnk
        |  FROM m)
        |SELECT custkey, recency_days, frequency, monetary_cents,
        |  CAST(4 - ((r_rnk - 1) * 4) // n AS INT) AS r_q,
        |  CAST(1 + ((f_rnk - 1) * 4) // n AS INT) AS f_q,
        |  CAST(1 + ((m_rnk - 1) * 4) // n AS INT) AS m_q,
        |  CAST((4 - ((r_rnk - 1) * 4) // n) * 100 +
        |    (1 + ((f_rnk - 1) * 4) // n) * 10 +
        |    (1 + ((m_rnk - 1) * 4) // n) AS INT) AS rfm
        |FROM r CROSS JOIN nn ORDER BY custkey""".stripMargin,
    // the CMS build/probe is replayed EXACTLY (shared md5 bucket hash):
    // counters = one GROUP BY (seed,bucket); estimate = min over seeds
    "cms_heavy" -> {
      val eps = math.E / operators.Sketches.CmsWidth
      val w = operators.Sketches.CmsWidth
      s"""WITH items AS (SELECT l_partkey AS key FROM lineitem),
        |tot AS (SELECT count(*) AS n_total FROM items),
        |exact AS (SELECT key, count(*) AS exact_cnt FROM items GROUP BY key),
        |topk AS (
        |  SELECT key, exact_cnt FROM exact
        |  ORDER BY exact_cnt DESC, key LIMIT 20),
        |seeds AS (SELECT unnest([0, 1, 2]) AS seed),
        |counters AS (
        |  SELECT s.seed,
        |    ('0x' || substr(md5(CAST(i.key AS VARCHAR)), s.seed * 8 + 1, 8))
        |      ::BIGINT % $w AS bucket,
        |    count(*) AS c
        |  FROM items i CROSS JOIN seeds s GROUP BY 1, 2),
        |est AS (
        |  SELECT t.key, t.exact_cnt, min(c.c) AS cms_est
        |  FROM topk t CROSS JOIN seeds s
        |  JOIN counters c ON c.seed = s.seed AND c.bucket =
        |    ('0x' || substr(md5(CAST(t.key AS VARCHAR)), s.seed * 8 + 1, 8))
        |      ::BIGINT % $w
        |  GROUP BY 1, 2)
        |SELECT e.key AS l_partkey, e.exact_cnt, e.cms_est,
        |  (e.cms_est >= e.exact_cnt AND e.cms_est <= e.exact_cnt +
        |     CAST(ceil($eps * t.n_total) AS BIGINT)) AS within_bound
        |FROM est e CROSS JOIN tot t
        |ORDER BY e.exact_cnt DESC, l_partkey""".stripMargin
    },
    // xxhash64 isn't replayable in DuckDB: top-k keys/counts are
    // oracle-exact, the sketch-quality checks are structural booleans
    // (est_ge_exact is the CMS no-undercount theorem; within_bound the
    // deterministic e/w*N check the md5 twin carries as data)
    "cms_heavy_fast" ->
      """SELECT l_partkey, exact_cnt,
        |  TRUE AS est_ge_exact, TRUE AS within_bound
        |FROM (SELECT l_partkey, count(*) AS exact_cnt
        |      FROM lineitem GROUP BY 1)
        |ORDER BY exact_cnt DESC, l_partkey LIMIT 20""".stripMargin,
    // DataSketches estimates aren't SQL-expressible: n_exact is
    // oracle-exact, the merge-transparency invariants are structural
    "hll_sharded" ->
      """SELECT count(DISTINCT l_partkey) AS n_exact,
        |  TRUE AS merge_near_direct, TRUE AS est_within_5pct
        |FROM lineitem""".stripMargin,
    // the persisted+appended serve must satisfy the same contract as
    // the in-flight union — same oracle text
    "hll_persisted" ->
      """SELECT count(DISTINCT l_partkey) AS n_exact,
        |  TRUE AS merge_near_direct, TRUE AS est_within_5pct
        |FROM lineitem""".stripMargin,
    // per-group n_exact oracle-exact; the per-group merge/accuracy
    // invariants are the same structural booleans as the global row
    "hll_by_group" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact,
        |  TRUE AS merge_near_direct, TRUE AS est_within_5pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // compaction must be invisible to the serve — same oracle text again
    "hll_compacted" ->
      """SELECT count(DISTINCT l_partkey) AS n_exact,
        |  TRUE AS merge_near_direct, TRUE AS est_within_5pct
        |FROM lineitem""".stripMargin,
    // exact intersection via INTERSECT; the inclusion-exclusion band is
    // the structural boolean (hll_sharded's posture)
    "hll_intersect" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_exact,
        |  TRUE AS ie_within_10pct
        |FROM (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |      INTERSECT
        |      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')""".stripMargin,
    // the NOT-EXISTS dominance DEFINITION; the engine's two-phase
    // frontier merge must be invisible in the result
    "skyline" ->
      """WITH c AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS max_order_cents
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, n_orders, max_order_cents
        |FROM c a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM c b
        |  WHERE b.n_orders >= a.n_orders
        |    AND b.max_order_cents >= a.max_order_cents
        |    AND (b.n_orders > a.n_orders
        |      OR b.max_order_cents > a.max_order_cents))
        |ORDER BY o_custkey""".stripMargin,
    // same unrolled Morton term list, DuckDB operator spelling
    "zorder_stats" -> {
      val z = operators.Layout.mortonExprSql("x", "y")
      val shift = 2 * operators.Layout.ZBits - 2 * 5
      val dom = 1L << operators.Layout.ZBits
      s"""WITH b AS (
        |  SELECT min(l_partkey) AS minp, max(l_partkey) AS maxp,
        |         min(l_suppkey) AS mins, max(l_suppkey) AS maxs
        |  FROM lineitem
        |), m AS (
        |  SELECT ((l_partkey - minp) * $dom) // (maxp - minp + 1) AS x,
        |         ((l_suppkey - mins) * $dom) // (maxs - mins + 1) AS y
        |  FROM lineitem CROSS JOIN b
        |), z AS (
        |  SELECT x, y, ($z) >> $shift AS zbucket FROM m)
        |SELECT zbucket, count(*) AS n_rows,
        |  max(x) - min(x) AS span_part,
        |  max(y) - min(y) AS span_supp
        |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin
    },
    "dq_checks" ->
      """WITH li AS (
        |  SELECT count(*) AS n_rows,
        |    sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS null_qty,
        |    sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS qty_oob,
        |    sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS price_nonpos
        |  FROM lineitem),
        |o AS (SELECT count(*) AS n_orders,
        |    count(DISTINCT o_orderkey) AS n_distinct_keys FROM orders),
        |orph AS (SELECT count(*) AS n_orphans FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_orderkey = l.l_orderkey))
        |SELECT check_name, metric, passed FROM (
        |  SELECT 'row_count_positive' AS check_name,
        |    CAST(n_rows AS DOUBLE) AS metric, n_rows > 0 AS passed FROM li
        |  UNION ALL SELECT 'quantity_complete', CAST(null_qty AS DOUBLE),
        |    null_qty = 0 FROM li
        |  UNION ALL SELECT 'quantity_in_range', CAST(qty_oob AS DOUBLE),
        |    qty_oob = 0 FROM li
        |  UNION ALL SELECT 'price_positive', CAST(price_nonpos AS DOUBLE),
        |    price_nonpos = 0 FROM li
        |  UNION ALL SELECT 'orderkey_unique',
        |    CAST(n_orders - n_distinct_keys AS DOUBLE),
        |    n_orders = n_distinct_keys FROM o
        |  UNION ALL SELECT 'orderkey_referential', CAST(n_orphans AS DOUBLE),
        |    n_orphans = 0 FROM orph)
        |ORDER BY check_name""".stripMargin,
    // the window DEFINITION of the same two rank total-orders; moments
    // exact BIGINT, final ρ arithmetic in the same IEEE op order
    "spearman_corr" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g, l_quantity AS x, l_extendedprice AS y,
        |         l_orderkey, l_linenumber, l_partkey, l_suppkey
        |  FROM lineitem
        |), r AS (
        |  SELECT g,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY x,
        |      l_orderkey, l_linenumber, l_partkey, l_suppkey) AS BIGINT) AS rx,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY y,
        |      l_orderkey, l_linenumber, l_partkey, l_suppkey) AS BIGINT) AS ry
        |  FROM b
        |), m AS (
        |  SELECT g, count(*) AS n,
        |    CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
        |    CAST(sum(rx * ry) AS BIGINT) AS sxy,
        |    CAST(sum(rx * rx) AS BIGINT) AS sx2,
        |    CAST(sum(ry * ry) AS BIGINT) AS sy2
        |  FROM r GROUP BY g)
        |SELECT g AS l_returnflag, n,
        |  CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |      (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    * 1e6 + 0.5) AS BIGINT) AS spearman_e6
        |FROM m ORDER BY l_returnflag""".stripMargin,
    // the same k-step floored product, // = div on non-negative operands;
    // lower median via the identical rank selection
    "pass_at_k" -> {
      def rExpr(k: Int) = (0 until k).foldLeft("1000000") { (acc, i) =>
        s"(($acc * greatest(n - c - $i, 0)) // (n - $i))" }
      def row(k: Int) =
        s"""SELECT CAST($k AS INT) AS k,
           |  count(*) AS n_problems,
           |  CAST(sum(1000000 - ${rExpr(k)}) AS BIGINT) AS sum_pass_e6,
           |  CAST(sum(1000000 - ${rExpr(k)}) // count(*) AS BIGINT)
           |    AS mean_pass_e6
           |FROM per WHERE n >= $k""".stripMargin
      s"""WITH cents AS (
        |  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |), med AS (
        |  SELECT min(cents) AS median_cents FROM (
        |    SELECT cents, row_number() OVER (ORDER BY cents) AS rnk,
        |      count(*) OVER () AS n
        |    FROM cents)
        |  WHERE rnk * 2 = n OR rnk * 2 = n + 1
        |), per AS (
        |  SELECT o_custkey, count(*) AS n,
        |    CAST(sum(CASE WHEN cents > (SELECT median_cents FROM med)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM cents GROUP BY o_custkey
        |)
        |SELECT * FROM (
        |${row(1)}
        |UNION ALL
        |${row(5)})
        |ORDER BY k""".stripMargin
    },
    // per-user exact cents, HUGEINT pooled moments (= the engine's
    // DECIMAL(38,0)), every double derived in the engine's operand order
    "cuped_adjust" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(sum(CASE WHEN o_orderdate < DATE '1998-06-01'
        |      THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN o_orderdate >= DATE '1998-06-01'
        |      THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS y,
        |    CASE WHEN ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
        |        % 100 < 50
        |      THEN 'A' ELSE 'B' END AS variant
        |  FROM orders GROUP BY o_custkey
        |), pool AS (
        |  SELECT count(*) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM per
        |), byv AS (
        |  SELECT variant, count(*) AS n_users,
        |    sum(CAST(x AS HUGEINT)) AS svx, sum(CAST(y AS HUGEINT)) AS svy
        |  FROM per GROUP BY variant
        |), j AS (
        |  SELECT variant, n_users, n, sx, svx, svy,
        |    CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) != 0.0
        |      THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      END AS theta
        |  FROM byv CROSS JOIN pool
        |)
        |SELECT variant, n_users,
        |  CAST(svy AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0 AS mean_y,
        |  theta,
        |  CAST(svy AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0
        |    - theta * ((CAST(svx AS DOUBLE) / CAST(n_users AS DOUBLE)
        |          - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0)
        |    AS mean_y_cuped
        |FROM j ORDER BY variant""".stripMargin,
    // the same bounded head, pair orientation and lower-median rank rule
    "theil_sen" ->
      """WITH pts AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
        |    row_number() OVER (ORDER BY l_orderkey, l_linenumber,
        |      CAST(l_partkey AS VARCHAR)) AS i
        |  FROM lineitem
        |  ORDER BY l_orderkey, l_linenumber, CAST(l_partkey AS VARCHAR)
        |  LIMIT 200
        |), slopes AS (
        |  SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
        |      AS slope,
        |    a.i AS ia, b.i AS ib
        |  FROM pts a JOIN pts b ON a.x < b.x
        |), r AS (
        |  SELECT slope,
        |    row_number() OVER (ORDER BY slope, ia, ib) AS rnk,
        |    count(*) OVER () AS n
        |  FROM slopes)
        |SELECT CAST(200 AS INT) AS n_points,
        |  CAST(max(n) AS BIGINT) AS n_pairs,
        |  min(slope) AS ts_slope
        |FROM r WHERE rnk * 2 = n OR rnk * 2 = n + 1""".stripMargin,
    "corr_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity) AS BIGINT) AS q,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p
        |  FROM lineitem
        |), a AS (
        |  SELECT l_returnflag, count(*) AS n_rows,
        |    sum(CAST(q AS HUGEINT)) AS sq, sum(CAST(p AS HUGEINT)) AS sp,
        |    sum(CAST(q AS HUGEINT) * q) AS sqq,
        |    sum(CAST(p AS HUGEINT) * p) AS spp,
        |    sum(CAST(q AS HUGEINT) * p) AS sqp
        |  FROM m GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n_rows,
        |  CAST(sq AS DOUBLE) / CAST(n_rows AS DOUBLE) AS mean_qty,
        |  CAST(sp AS DOUBLE) / CAST(n_rows AS DOUBLE) / 100.0 AS mean_price,
        |  (CAST(n_rows AS DOUBLE) * CAST(sqp AS DOUBLE)
        |     - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
        |    / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)) / 100.0
        |    AS cov_qty_price,
        |  (CAST(n_rows AS DOUBLE) * CAST(sqp AS DOUBLE)
        |     - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
        |    / (sqrt(CAST(n_rows AS DOUBLE) * CAST(sqq AS DOUBLE)
        |          - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
        |       * sqrt(CAST(n_rows AS DOUBLE) * CAST(spp AS DOUBLE)
        |            - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)))
        |    AS corr_qty_price
        |FROM a ORDER BY l_returnflag""".stripMargin,
    // same exact-power-sum pass as corr_stats; degenerate-variance test
    // on the EXACT hugeint sums, closed forms in the Spark operand order
    "regression_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity) AS BIGINT) AS q,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p
        |  FROM lineitem
        |), a AS (
        |  SELECT l_returnflag, count(*) AS n_rows,
        |    sum(CAST(q AS HUGEINT)) AS sq, sum(CAST(p AS HUGEINT)) AS sp,
        |    sum(CAST(q AS HUGEINT) * q) AS sqq,
        |    sum(CAST(p AS HUGEINT) * p) AS spp,
        |    sum(CAST(q AS HUGEINT) * p) AS sqp
        |  FROM m GROUP BY l_returnflag
        |), d AS (
        |  SELECT l_returnflag, n_rows,
        |    (sqq * n_rows = sq * sq OR spp * n_rows = sp * sp) AS degen,
        |    CAST(n_rows AS DOUBLE) AS nd,
        |    CAST(sq AS DOUBLE) AS sqd, CAST(sp AS DOUBLE) AS spd,
        |    CAST(n_rows AS DOUBLE) * CAST(sqp AS DOUBLE)
        |      - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE) AS cov_num,
        |    CAST(n_rows AS DOUBLE) * CAST(sqq AS DOUBLE)
        |      - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) AS var_x,
        |    CAST(n_rows AS DOUBLE) * CAST(spp AS DOUBLE)
        |      - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) AS var_y
        |  FROM a
        |)
        |SELECT l_returnflag, n_rows,
        |  CASE WHEN degen THEN NULL
        |    ELSE cov_num / var_x / 100.0 END AS slope,
        |  CASE WHEN degen THEN NULL
        |    ELSE (spd / nd - cov_num / var_x * (sqd / nd)) / 100.0 END
        |    AS intercept,
        |  CASE WHEN degen THEN NULL
        |    ELSE cov_num * cov_num / (var_x * var_y) END AS r2
        |FROM d ORDER BY l_returnflag""".stripMargin,
    // exact order-statistic thresholds (exactQuantiles' ceil convention),
    // then a pure-selection clamp — no arithmetic, exact on doubles
    "winsorize" ->
      """WITH r AS (
        |  SELECT event_id, event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rnk,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events
        |), thr AS (
        |  SELECT event_type,
        |    max(CASE WHEN rnk = greatest(1, (n * 5 + 99) // 100) THEN value END) AS lo,
        |    max(CASE WHEN rnk = greatest(1, (n * 95 + 99) // 100) THEN value END) AS hi
        |  FROM r GROUP BY event_type
        |)
        |SELECT r.event_id, r.event_type, r.value, t.lo, t.hi,
        |  greatest(t.lo, least(t.hi, r.value)) AS value_w,
        |  (r.value < t.lo OR r.value > t.hi) AS clipped
        |FROM r JOIN thr t USING (event_type)
        |ORDER BY r.event_id""".stripMargin,
    // lower medians via row_number (NOT median(), which interpolates):
    // identical picked rows -> identical IEEE operands in the z formula
    "robust_zscore" ->
      """WITH ranked AS (
        |  SELECT event_type, value, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events
        |), med AS (
        |  SELECT event_type, value AS med FROM ranked WHERE rn = (n + 1) // 2
        |), dev AS (
        |  SELECT e.event_id, e.event_type, e.value, m.med,
        |    abs(e.value - m.med) AS absdev
        |  FROM events e JOIN med m USING (event_type)
        |), dranked AS (
        |  SELECT event_type, absdev, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY absdev, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM dev
        |), mad AS (
        |  SELECT event_type, absdev AS mad FROM dranked WHERE rn = (n + 1) // 2
        |)
        |SELECT d.event_id, d.event_type, d.value,
        |  CASE WHEN t.mad = 0 THEN NULL
        |       ELSE 0.6745 * (d.value - d.med) / t.mad END AS robust_z,
        |  CASE WHEN t.mad = 0 THEN NULL
        |       ELSE abs(0.6745 * (d.value - d.med) / t.mad) > 3.5
        |  END AS is_outlier
        |FROM dev d JOIN mad t USING (event_type)
        |ORDER BY d.event_id""".stripMargin,
    "profile_table" -> {
      val profiled = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderpriority")
      profiled.map(c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_value,
           |  CAST(max($c) AS VARCHAR) AS max_value
           |FROM orders""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
    "scd2_apply" ->
      """WITH cur AS (
        |  SELECT c_custkey, c_name, c_acctbal,
        |    TIMESTAMP '1995-01-01' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
        |  FROM customer
        |), upd AS (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
        |         ELSE c_acctbal END AS c_acctbal,
        |    TIMESTAMP '1997-06-01' AS change_ts
        |  FROM customer WHERE c_custkey % 7 = 0 OR c_custkey % 11 = 0
        |), chg AS (
        |  SELECT u.c_custkey, u.c_name, u.c_acctbal, u.change_ts
        |  FROM upd u JOIN cur c ON u.c_custkey = c.c_custkey
        |  WHERE NOT (u.c_acctbal IS NOT DISTINCT FROM c.c_acctbal
        |         AND u.c_name IS NOT DISTINCT FROM c.c_name)
        |)
        |SELECT c.c_custkey, c.c_name, c.c_acctbal, c.valid_from,
        |  ch.change_ts AS valid_to, FALSE AS is_current
        |FROM cur c JOIN chg ch ON c.c_custkey = ch.c_custkey
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal, change_ts AS valid_from,
        |  CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
        |FROM chg
        |UNION ALL
        |SELECT c.c_custkey, c.c_name, c.c_acctbal, c.valid_from,
        |  c.valid_to, c.is_current
        |FROM cur c
        |WHERE NOT EXISTS (SELECT 1 FROM chg WHERE chg.c_custkey = c.c_custkey)
        |ORDER BY c_custkey, valid_from""".stripMargin,
    // the oracle compares columns directly where the engine compares
    // fingerprints — classification must agree (orders has no NULLs and
    // the doubled price always differs)
    "snapshot_diff" ->
      """WITH oldS AS (
        |  SELECT * FROM orders WHERE o_orderkey % 89 <> 0
        |), newS AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |)
        |SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |  CASE WHEN a.o_orderkey IS NULL THEN 'insert'
        |       WHEN b.o_orderkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS change
        |FROM oldS a FULL OUTER JOIN newS b ON a.o_orderkey = b.o_orderkey
        |WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
        |   OR a.o_totalprice <> b.o_totalprice
        |ORDER BY o_orderkey""".stripMargin,
    // round-trip identity: the applied feed IS the new snapshot
    "cdc_upsert" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 97 <> 0
        |ORDER BY o_orderkey""".stripMargin,
    "string_agg" ->
      """SELECT n_name, count(*) AS n_suppliers,
        |  string_agg(s_name, ',' ORDER BY s_name) AS supplier_names
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_acctbal > 9000.0
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // DuckDB dayofweek is 0-based Sunday; Spark's is 1-based — the +1
    // aligns them. Positive cents, so // and div agree on the mean.
    // hourly Fano factor: integer hour buckets (epoch-µs floor-div),
    // HUGEINT moments, zero hours through the span length
    "burstiness" ->
      """WITH ph AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*) AS c
        |  FROM events GROUP BY event_type, h
        |), ag AS (
        |  SELECT event_type, max(h) - min(h) + 1 AS n_hours,
        |    sum(c) AS n_events, sum(CAST(c AS HUGEINT) * c) AS scc
        |  FROM ph GROUP BY event_type)
        |SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  CAST(((CAST(n_hours AS HUGEINT) * scc
        |      - CAST(n_events AS HUGEINT) * n_events) * 1000000)
        |    // (CAST(n_hours AS HUGEINT) * n_events) AS BIGINT)
        |    AS fano_e6
        |FROM ag ORDER BY event_type""".stripMargin,
    "seasonal_profile" ->
      """WITH c AS (
        |  SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
        |    CAST(hour(ts) AS INT) AS hr,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), p AS (
        |  SELECT dow, hr, count(*) AS n_events,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM c GROUP BY 1, 2
        |), pm AS (
        |  SELECT dow, hr, n_events, sum_cents,
        |    CAST(sum_cents // n_events AS BIGINT) AS mean_cents
        |  FROM p)
        |SELECT c.dow, c.hr,
        |  max(pm.n_events) AS n_events,
        |  max(pm.sum_cents) AS sum_cents,
        |  max(pm.mean_cents) AS mean_cents,
        |  CAST(max(abs(c.cents - pm.mean_cents)) AS BIGINT)
        |    AS max_abs_residual_cents
        |FROM c JOIN pm USING (dow, hr)
        |GROUP BY 1, 2 ORDER BY dow, hr""".stripMargin,
    "value_histogram" ->
      """SELECT CAST(floor(value / 50.0) AS INTEGER) AS bucket, count(*) AS n,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,
    // lower medians replayed as rank (n+1)//2 under the (cents,
    // event_id) total order — both rank passes unrolled as windows over
    // the small DuckDB corpus (the engine uses ExactRank)
    "mad_outliers" ->
      """WITH c AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
        |    event_id
        |  FROM events
        |), r1 AS (
        |  SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS rnk,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM c
        |), med AS (
        |  SELECT event_type, CAST(n AS BIGINT) AS n_events,
        |    cents AS med_cents
        |  FROM r1 WHERE rnk = (n + 1) // 2
        |), d AS (
        |  SELECT c.event_type, abs(c.cents - med.med_cents) AS dev,
        |    c.event_id
        |  FROM c JOIN med USING (event_type)
        |), r2 AS (
        |  SELECT event_type, dev,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY dev, event_id) AS rnk,
        |    count(*) OVER (PARTITION BY event_type) AS n2
        |  FROM d
        |), mad AS (
        |  SELECT event_type, dev AS mad_cents FROM r2
        |  WHERE rnk = (n2 + 1) // 2)
        |SELECT med.event_type, med.n_events, med.med_cents, mad.mad_cents,
        |  CAST(sum(CASE WHEN d.dev > 3 * mad.mad_cents THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM med JOIN mad USING (event_type) JOIN d USING (event_type)
        |GROUP BY 1, 2, 3, 4 ORDER BY event_type""".stripMargin,
    "window_rank" ->
      """SELECT event_id, user_id, event_type, value,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INTEGER) AS value_rank,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(event_type, 1) OVER w AS next_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "window_frames" ->
      """SELECT event_id, user_id, value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)))
        |       OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum4,
        |  count(*) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_n,
        |  first_value(event_type) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type,
        |  last_value(event_type) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS latest_type,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "window_distributions" ->
      """SELECT event_id, user_id, value,
        |  percent_rank() OVER (PARTITION BY user_id ORDER BY value) AS pct_rank,
        |  cume_dist() OVER (PARTITION BY user_id ORDER BY value) AS cume,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
        |    (PARTITION BY user_id ORDER BY epoch_us(ts)
        |     RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum_10min,
        |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |     RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS range_n_10min
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
        |         lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events
        |), s AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM g
        |), sid AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM s
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end,
        |  CAST((max(us) - min(us)) / 1000000 AS DOUBLE) AS duration_sec,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sid GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    // MapState running counts across real micro-batches must equal the
    // batch group-count
    "user_type_counts_tws" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    // the streamed bottom-k reservoir is batch-split-insensitive: it
    // must equal the batch k-smallest-md5 relation row for row (same
    // hex md5 of the decimal id rendering, same id tie-break)
    "reservoir_bottomk_tws" ->
      """WITH r AS (
        |  SELECT event_type, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rk
        |  FROM events)
        |SELECT event_type, CAST(rk AS INT) AS rk, event_id
        |FROM r WHERE rk <= 32 ORDER BY event_type, rk""".stripMargin,
    // the timer-closed streaming sessions must equal the batch
    // gaps-and-islands relation under the same cents quantization
    // (floor(value·100+0.5), identical IEEE ops both engines); every
    // sum CAST back from DuckDB's HUGEINT widening
    "sessionize_tws" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
        |         lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events
        |), s AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM g
        |), sid AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM s
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(max(us) - min(us) AS BIGINT) AS duration_us,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM sid GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name, count(*) AS n_lineitems,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "session_window_agg" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
        |         lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events
        |), s AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM g
        |), sid AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM s
        |)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sid GROUP BY user_id, session_id ORDER BY user_id, session_start""".stripMargin,
    // the streaming session merge must equal the batch session_window_agg
    "session_window_stream" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
        |         lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events
        |), s AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM g
        |), sid AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM s
        |)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sid GROUP BY user_id, session_id ORDER BY user_id, session_start""".stripMargin,
    "locf_fill" ->
      """SELECT event_id, user_id, ts, event_type,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END
        |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |FROM events ORDER BY event_id""".stripMargin,
    "hourly_counts" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // merge(partials, delta) must equal the full recompute exactly
    "hourly_counts_incremental" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "latest_events" ->
      """SELECT user_id, count(*) AS n_events,
        |  arg_min(event_type, ts) AS first_type,
        |  arg_max(event_type, ts) AS last_type,
        |  arg_max(value, ts) AS last_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "sliding_counts" ->
      """WITH w AS (
        |  SELECT event_type, value,
        |    unnest([to_timestamp((epoch_us(ts) // 1000000 // 1800) * 1800 - 1800),
        |            to_timestamp((epoch_us(ts) // 1000000 // 1800) * 1800)]) AS win_start
        |  FROM events)
        |SELECT CAST(win_start AS TIMESTAMP) AS win_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    // the same position-summary containment algebra; the oracle states
    // it over first/last/min-after summaries exactly like the engine
    "seq_patterns" ->
      """WITH pos AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS pos
        |  FROM events
        |), fp AS (
        |  SELECT user_id, event_type, min(pos) AS first_pos,
        |    max(pos) AS last_pos
        |  FROM pos GROUP BY 1, 2
        |), l1 AS (
        |  SELECT CAST(1 AS INT) AS length, event_type AS pattern,
        |    count(*) AS support
        |  FROM fp GROUP BY 2
        |), l2 AS (
        |  SELECT CAST(2 AS INT) AS length,
        |    a.event_type || '>' || b.event_type AS pattern,
        |    count(*) AS support
        |  FROM fp a JOIN fp b USING (user_id)
        |  WHERE a.first_pos < b.last_pos
        |  GROUP BY 2
        |), mab AS (
        |  SELECT p.user_id, a.event_type AS a, p.event_type AS b,
        |    min(p.pos) AS mab
        |  FROM pos p JOIN fp a USING (user_id)
        |  WHERE p.pos > a.first_pos
        |  GROUP BY 1, 2, 3
        |), l3 AS (
        |  SELECT CAST(3 AS INT) AS length,
        |    m.a || '>' || m.b || '>' || c.event_type AS pattern,
        |    count(*) AS support
        |  FROM mab m JOIN fp c USING (user_id)
        |  WHERE c.last_pos > m.mab
        |  GROUP BY 2
        |)
        |SELECT length, pattern, CAST(support AS BIGINT) AS support FROM (
        |  SELECT * FROM l1 UNION ALL SELECT * FROM l2
        |  UNION ALL SELECT * FROM l3)
        |WHERE support >= 3
        |ORDER BY length, pattern""".stripMargin,
    // the same journey segmentation and credit CASE; // = div on the
    // non-negative credit operands; remainder-to-last keeps every
    // journey's credit summing to exactly 1e6
    "attribution_touch" ->
      """WITH tagged AS (
        |  SELECT event_id, ts, user_id, event_type,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv,
        |    COALESCE(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS journey
        |  FROM events
        |), touches AS (
        |  SELECT * FROM tagged
        |  WHERE event_type IN ('view', 'click', 'signup')
        |), convs AS (
        |  SELECT DISTINCT user_id, journey FROM tagged WHERE is_conv = 1
        |), pos AS (
        |  SELECT t.user_id, t.journey, t.event_type,
        |    row_number() OVER (PARTITION BY t.user_id, t.journey
        |      ORDER BY t.ts, t.event_id) AS p,
        |    count(*) OVER (PARTITION BY t.user_id, t.journey) AS n
        |  FROM touches t JOIN convs USING (user_id, journey)
        |), cr AS (
        |  SELECT event_type AS channel, p, n,
        |    CASE WHEN n = 1 THEN 1000000
        |         WHEN n = 2 THEN 500000
        |         WHEN p = 1 THEN 400000
        |         WHEN p = n THEN 400000 + (200000 - (n - 2) * (200000 // (n - 2)))
        |         ELSE 200000 // (n - 2) END AS credit_e6
        |  FROM pos)
        |SELECT channel, count(*) AS n_touches,
        |  CAST(sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
        |  CAST(sum(CASE WHEN p = n THEN 1 ELSE 0 END) AS BIGINT) AS n_last,
        |  CAST(sum(credit_e6) AS BIGINT) AS credit_e6
        |FROM cr GROUP BY channel ORDER BY channel""".stripMargin,
    "funnel_steps" ->
      """WITH s0 AS (
        |  SELECT user_id, min(ts) AS view_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s1 AS (
        |  SELECT e.user_id, min(e.ts) AS click_ts
        |  FROM events e JOIN s0 ON e.user_id = s0.user_id AND e.ts >= s0.view_ts
        |  WHERE e.event_type = 'click' GROUP BY e.user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS purchase_ts
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.click_ts
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
        |), u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id, s0.view_ts, s1.click_ts, s2.purchase_ts,
        |  CAST(CASE WHEN s0.view_ts IS NULL THEN 0 ELSE 1 END
        |     + CASE WHEN s1.click_ts IS NULL THEN 0 ELSE 1 END
        |     + CASE WHEN s2.purchase_ts IS NULL THEN 0 ELSE 1 END AS BIGINT) AS n_stages,
        |  CASE WHEN s2.purchase_ts IS NOT NULL THEN 'purchase'
        |       WHEN s1.click_ts IS NOT NULL THEN 'click'
        |       WHEN s0.view_ts IS NOT NULL THEN 'view'
        |       ELSE 'none' END AS furthest
        |FROM u
        |LEFT JOIN s0 ON u.user_id = s0.user_id
        |LEFT JOIN s1 ON u.user_id = s1.user_id
        |LEFT JOIN s2 ON u.user_id = s2.user_id
        |ORDER BY u.user_id""".stripMargin,
    "event_transitions" ->
      """WITH nxt AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events
        |), c AS (
        |  SELECT from_type, to_type, count(*) AS cnt
        |  FROM nxt WHERE to_type IS NOT NULL GROUP BY from_type, to_type
        |)
        |SELECT from_type, to_type, cnt,
        |  CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "cohort_retention" ->
      """WITH first_seen AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |  FROM events GROUP BY 1
        |), activity AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), agg AS (
        |  SELECT f.cohort_day,
        |    CAST(datediff('day', f.cohort_day, a.day) AS INTEGER) AS day_offset,
        |    count(*) AS active_users
        |  FROM activity a JOIN first_seen f USING (user_id)
        |  GROUP BY 1, 2
        |)
        |SELECT cohort_day, day_offset, active_users,
        |  CAST(active_users AS DOUBLE) /
        |    CAST(max(CASE WHEN day_offset = 0 THEN active_users END)
        |      OVER (PARTITION BY cohort_day) AS DOUBLE) AS retention
        |FROM agg ORDER BY cohort_day, day_offset""".stripMargin,
    // exact-integer EWMA twin: same cents quantization (identical IEEE
    // ops), same left fold — list_prepend injects the 0 init. The step
    // must FLOOR like the Spark side's shiftright (DuckDB's // truncates
    // toward zero and diverges on negative values); floor((a+b)/2.0) is
    // exact here because the state is bounded by max |cents|, far below
    // the 2^53 double-integer ceiling
    "ewma_value" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  list_reduce(list_prepend(0, list(cents ORDER BY ts, event_id)),
        |    (a, b) -> CAST(floor((a + b) / 2.0) AS BIGINT)) AS ewma_cents
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the max(0,·) recurrence unrolled: s_t = p_t − min(0, min_{j≤t} p_j)
    // over exact integer cents — provably equal to the engine's fold.
    // cusum_stream's bounded replay must reproduce the batch fold
    // exactly — same oracle text.
    "cusum_stream" -> cusumOracleSql,
    "cusum_alerts" -> cusumOracleSql,
    // the streaming EWMA's bounded replay must reproduce the batch fold
    // exactly — same oracle text as ewma_value
    "ewma_stream" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  list_reduce(list_prepend(0, list(cents ORDER BY ts, event_id)),
        |    (a, b) -> CAST(floor((a + b) / 2.0) AS BIGINT)) AS ewma_cents
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,
    // per-(user,hour) latest value by the total (ts, event_id) order —
    // the HUGEINT composite key mirrors Spark's max_by struct key
    // (event_id stays far below the 1e9 multiplier)
    "resample_ffill" ->
      """WITH bounds AS (
        |  SELECT user_id, date_trunc('hour', min(ts)) AS t0,
        |    date_trunc('hour', max(ts)) AS t1
        |  FROM events GROUP BY 1),
        |grid AS (
        |  SELECT user_id,
        |    unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS grid_ts
        |  FROM bounds),
        |hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS grid_ts,
        |    max_by("value", epoch_us(ts)::HUGEINT * 1000000000 + event_id) AS hv
        |  FROM events GROUP BY 1, 2)
        |SELECT g.user_id, g.grid_ts,
        |  last_value(h.hv IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.grid_ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS "value",
        |  h.hv IS NULL AS filled
        |FROM grid g LEFT JOIN hourly h
        |  ON g.user_id = h.user_id AND g.grid_ts = h.grid_ts
        |ORDER BY g.user_id, g.grid_ts""".stripMargin,
  ) ++ oracleSqlMain2
}
