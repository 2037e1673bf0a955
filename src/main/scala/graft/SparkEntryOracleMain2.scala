package graft

import graft.operators._

/** The second half of [[SparkEntryOracleMain]]'s registration list —
  * json/variant, asof/temporal, streaming, sketch, sampling and split
  * oracle texts, moved verbatim in the r16 registry reseam (VERDICT r15
  * item 7) to keep every source file under the 2.5k-line cap. `SparkEntry`
  * still concatenates the full list and guards with `distinctKeys`.
  */
private[graft] trait SparkEntryOracleMain2 extends SparkEntryOracleRest {

  private[graft] lazy val oracleSqlMain2: Seq[(String, String)] = Seq(
    "json_funcs" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod
        |FROM events ORDER BY event_id""".stripMargin,
    "variant_funcs" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_var,
        |  json_extract_string(props, '$.missing') IS NULL AS missing_is_null
        |FROM events ORDER BY event_id""".stripMargin,
    "asof_join" -> asofOracleSql,
    // the bucketized variant is semantics-identical, so it shares the
    // native ASOF JOIN oracle verbatim
    "asof_join_bucketized" -> asofOracleSql,
    "proximity_pairs" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events
        |)
        |SELECT a.user_id, a.event_id AS event_a, a.event_type AS type_a,
        |  b.event_id AS event_b, b.event_type AS type_b, b.us - a.us AS delta_us
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |  AND b.us >= a.us AND b.us - a.us <= 300000000
        |  AND (a.us < b.us OR (a.us = b.us AND a.event_id < b.event_id))
        |  AND a.event_id <> b.event_id
        |ORDER BY a.user_id, event_a, event_b""".stripMargin,
    "interval_join" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS lus
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS rus,
        |         value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT c.user_id, c.click_id, p.purchase_id,
        |  p.rus - c.lus AS delta_us, p.purchase_value
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.rus >= c.lus AND p.rus - c.lus <= 300000000
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
    // the stream-stream run must equal the batch interval join — same
    // oracle text
    "interval_join_stream" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS lus
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS rus,
        |         value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT c.user_id, c.click_id, p.purchase_id,
        |  p.rus - c.lus AS delta_us, p.purchase_value
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.rus >= c.lus AND p.rus - c.lus <= 300000000
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
    // the left-outer twin: matched rows as above; an unmatched click
    // emits NULLs only when its 5-minute window fell fully behind the
    // final watermark W = min(max click, max purchase) − 1 h — the
    // withheld tail is the streaming-correct answer, encoded here in µs
    "interval_join_stream_outer" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS lus
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS rus,
        |         value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |), w AS (
        |  SELECT least((SELECT max(lus) FROM c), (SELECT max(rus) FROM p))
        |    - 3600000000 - 300000000 AS cut
        |), m AS (
        |  SELECT c.user_id, c.click_id, p.purchase_id,
        |    p.rus - c.lus AS delta_us, p.purchase_value
        |  FROM c JOIN p ON c.user_id = p.user_id
        |    AND p.rus >= c.lus AND p.rus - c.lus <= 300000000
        |), um AS (
        |  SELECT c.user_id, c.click_id, CAST(NULL AS BIGINT) AS purchase_id,
        |    CAST(NULL AS BIGINT) AS delta_us,
        |    CAST(NULL AS DOUBLE) AS purchase_value
        |  FROM c CROSS JOIN w
        |  WHERE c.lus < w.cut AND NOT EXISTS (
        |    SELECT 1 FROM p WHERE p.user_id = c.user_id
        |      AND p.rus >= c.lus AND p.rus - c.lus <= 300000000)
        |)
        |SELECT * FROM (SELECT * FROM m UNION ALL SELECT * FROM um)
        |ORDER BY user_id, click_id, purchase_id NULLS FIRST""".stripMargin,
    "text_stats" ->
      """WITH c AS (
        |  SELECT doc_id, lang, source, CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> list_contains(['the','a','of','and','to','in','is','on','for','with'], x))) AS BIGINT) AS n_stopwords
        |  FROM documents
        |)
        |SELECT doc_id, lang, source, n_chars, n_tokens, n_distinct_tokens, n_stopwords,
        |  CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
        |  CAST(0.4 AS DOUBLE) * (CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |    + CAST(0.3 AS DOUBLE) * least(CAST(n_tokens AS DOUBLE) / 300.0, 1.0)
        |    + CAST(0.3 AS DOUBLE) * (CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS quality
        |FROM c ORDER BY doc_id""".stripMargin,
    "lang_id" -> langIdOracleSql,
    // Cavnar–Trenkle: per-lang and per-doc top-100 2-/3-gram rank
    // profiles, out-of-place distance, argmin with lexicographic ties
    // lp (profile training) reads only the bounded doc_id < 2000 sample
    // — the engine's LangIdTrainDocs cut, shared verbatim
    "lang_id_ngram" -> langIdNgramOracle,
    // the measured-quality row: the SAME prediction relation grouped into
    // the (label, prediction) confusion matrix
    "lang_id_confusion" ->
      s"""WITH pred AS ($langIdNgramOracle
        |)
        |SELECT lang_label, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
        |FROM pred GROUP BY 1, 2
        |ORDER BY lang_label, lang_pred""".stripMargin,
    "token_freq" ->
      """SELECT token, count(*) AS freq
        |FROM (SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token FROM documents)
        |GROUP BY token ORDER BY freq DESC, token LIMIT 50""".stripMargin,
    // 64 unrolled training rounds over the space-encoded form; the
    // string replace IS the greedy left-to-right merge (bpe_tokens'
    // own oracle convention), and argmax ties break lexicographically
    "bpe_train" -> {
      bpeTrainOracleChain(BpeOracleRounds) + "\n" +
        (0 until BpeOracleRounds).map { i =>
          if (i == 0)
            s"SELECT CAST(1 AS INT) AS round, a AS sym_a, b AS sym_b, CAST(cnt AS BIGINT) AS cnt FROM b0"
          else
            s"UNION ALL SELECT ${i + 1}, a, b, CAST(cnt AS BIGINT) FROM b$i"
        }.mkString("\n") + "\nORDER BY round"
    },
    // the vocabulary-scale exact-parity leg: 256 unrolled rounds over the
    // partkey word types, rules hash-checked one by one
    "bpe_train_vocab" -> bpeVocabOracleSql(BpeVocabRounds),
    // two generated 16-level Viterbi DP chains (one per EM round), each
    // level MATERIALIZED — the same unroll discipline as bpe_train
    "unigram_train" -> unigramOracleSql(),
    // the same chains + a THIRD (application) chain under the learned
    // scores, joined back onto the per-document word occurrences
    "unigram_fertility" -> unigramOracleSql(fertility = true),
    // the same chains + application chain, word scores joined back from
    // the learned score table (Σ piece s_e6 = the dp's own sc), negated
    // and summed per document — the surprisal the engine's Viterbi emits
    "unigram_perplexity" -> unigramOracleSql(surprisal = true),
    // both tokenizers' FULL oracle chains nested as CTEs (scoped WITHs,
    // no name crosstalk) joined per doc — the bake-off can't drift from
    // either tokenizer's own oracle
    "tokenizer_compare" -> {
      val bpeSql = bpeTrainOracleChain(BpeOracleRounds) + s""",
        |v AS (SELECT word,
        |  CAST(len(string_split(trim(enc), '  ')) AS BIGINT) AS n_bpe,
        |  CAST(length(word) AS BIGINT) AS n_char FROM e$BpeOracleRounds),
        |d AS (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS word
        |  FROM documents),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens
        |  FROM d JOIN v USING (word) GROUP BY doc_id)
        |SELECT documents.doc_id,
        |  coalesce(agg.n_words, CAST(0 AS BIGINT)) AS n_words,
        |  coalesce(agg.n_bpe_tokens, CAST(0 AS BIGINT)) AS n_bpe_tokens
        |FROM documents LEFT JOIN agg USING (doc_id)""".stripMargin
      s"""WITH uni AS (${unigramOracleSql(fertility = true)}
        |), bpe AS ($bpeSql
        |)
        |SELECT count(*) AS n_docs,
        |  CAST(sum(b.n_words) AS BIGINT) AS n_words,
        |  CAST(sum(b.n_bpe_tokens) AS BIGINT) AS bpe_tokens,
        |  CAST(sum(u.n_covered) AS BIGINT) AS uni_covered,
        |  CAST(sum(u.n_pieces) AS BIGINT) AS uni_pieces,
        |  CAST(sum(b.n_bpe_tokens) * 1000000 // sum(b.n_words) AS BIGINT)
        |    AS bpe_fert_e6,
        |  CAST(sum(u.n_pieces) * 1000000 // sum(u.n_covered) AS BIGINT)
        |    AS uni_fert_e6,
        |  CAST(sum(CASE WHEN u.n_covered = u.n_words
        |    AND u.n_pieces < b.n_bpe_tokens THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_docs_uni_wins
        |FROM uni u JOIN bpe b USING (doc_id)""".stripMargin
    },
    // structural contract for the 1024-merge leg: n_rules literal (the
    // partkey vocabulary exhausts at ~1990, so all 1024 rounds must
    // produce a rule), first_cnt recomputed EXACTLY with one unchained
    // round, invariants as literal TRUE (bpeTrainSummary's contract)
    "bpe_train_1k" ->
      (bpeVocabWordsCte +
        """,
        |p0 AS (
        |  SELECT syms[i] AS a, syms[i + 1] AS b, sum(freq) AS cnt FROM (
        |    SELECT freq, syms, unnest(generate_series(1, len(syms) - 1)) AS i FROM
        |      (SELECT freq, string_split(trim(enc), '  ') AS syms FROM e0))
        |  GROUP BY 1, 2)
        |SELECT CAST(1024 AS BIGINT) AS n_rules,
        |  (SELECT CAST(max(cnt) AS BIGINT) FROM p0) AS first_cnt,
        |  TRUE AS rounds_contiguous, TRUE AS counts_nonincreasing,
        |  TRUE AS merges_distinct""".stripMargin),
    // the composed tokenizer: the SAME 64-round training chain, then the
    // final word-type encoding (e64) applied back to every document's
    // regex words — per-doc word/char/BPE-token budgets under the
    // learned vocabulary
    "pipeline_tokenizer" -> {
      bpeTrainOracleChain(BpeOracleRounds) + s""",
        |v AS (SELECT word,
        |  CAST(len(string_split(trim(enc), '  ')) AS BIGINT) AS n_bpe,
        |  CAST(length(word) AS BIGINT) AS n_char FROM e$BpeOracleRounds),
        |d AS (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS word
        |  FROM documents),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(n_char) AS BIGINT) AS n_char_tokens,
        |  CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens
        |  FROM d JOIN v USING (word) GROUP BY doc_id)
        |SELECT documents.doc_id,
        |  coalesce(agg.n_words, CAST(0 AS BIGINT)) AS n_words,
        |  coalesce(agg.n_char_tokens, CAST(0 AS BIGINT)) AS n_char_tokens,
        |  coalesce(agg.n_bpe_tokens, CAST(0 AS BIGINT)) AS n_bpe_tokens
        |FROM documents LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin
    },
    // same smoothing, same IEEE ops, same e6 floor as the Spark side
    "token_drift" ->
      """WITH t AS (
        |  SELECT doc_id % 2 = 0 AS half_a,
        |    unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token
        |  FROM documents),
        |c AS (
        |  SELECT token,
        |    sum(CASE WHEN half_a THEN 1 ELSE 0 END) AS cnt_a,
        |    sum(CASE WHEN half_a THEN 0 ELSE 1 END) AS cnt_b
        |  FROM t GROUP BY token),
        |tot AS (SELECT sum(cnt_a) AS tot_a, sum(cnt_b) AS tot_b,
        |  count(*) AS v FROM c)
        |SELECT token, CAST(cnt_a AS BIGINT) AS cnt_a,
        |  CAST(cnt_b AS BIGINT) AS cnt_b,
        |  CAST(floor(1000000.0 *
        |    (CAST(cnt_a + 1 AS DOUBLE) / CAST(tot_a + v AS DOUBLE)) *
        |    ln((CAST(cnt_a + 1 AS DOUBLE) / CAST(tot_a + v AS DOUBLE)) /
        |       (CAST(cnt_b + 1 AS DOUBLE) / CAST(tot_b + v AS DOUBLE))))
        |    AS BIGINT) AS contrib_e6
        |FROM c, tot
        |ORDER BY contrib_e6 DESC, token LIMIT 20""".stripMargin,
    "heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |), n AS (SELECT count(*) AS n_tokens FROM t)
        |SELECT token, count(*) AS freq,
        |  (SELECT n_tokens FROM n) AS n_tokens
        |FROM t GROUP BY token
        |HAVING count(*) * 100 > (SELECT n_tokens FROM n)
        |ORDER BY freq DESC, token""".stripMargin,
    "heavy_hitters_by_lang" ->
      """WITH tk AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
        |), n AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens FROM tk GROUP BY lang
        |), f AS (
        |  SELECT lang, token, count(*) AS freq FROM tk GROUP BY lang, token
        |)
        |SELECT f.lang, f.token, f.freq, n.n_tokens
        |FROM f JOIN n USING (lang)
        |WHERE f.freq * 60 > n.n_tokens
        |ORDER BY lang, freq DESC, token""".stripMargin,
    // the oracle states the reconciliation: v1 rows carry NULL source
    "schema_evolution" ->
      """WITH u AS (
        |  SELECT doc_id, lang, NULL AS source FROM documents
        |  WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, lang, source FROM documents WHERE doc_id % 2 = 1)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_legacy,
        |  count(DISTINCT source) AS n_sources
        |FROM u GROUP BY lang ORDER BY lang""".stripMargin,
    // the same quartile-edge binning and smoothed-share arithmetic;
    // floor-before-sum keeps PSI an integer relation
    "psi_drift" ->
      """WITH base AS (
        |  SELECT n_chars AS x, doc_id FROM documents WHERE doc_id % 2 = 0
        |), cur AS (
        |  SELECT n_chars AS x FROM documents WHERE doc_id % 2 = 1
        |), ranked AS (
        |  SELECT x, ((row_number() OVER (ORDER BY x, doc_id) - 1) * 4)
        |      // (count(*) OVER ()) AS tier
        |  FROM base
        |), edges AS (
        |  SELECT max(CASE WHEN tier = 0 THEN x END) AS e1,
        |    max(CASE WHEN tier = 1 THEN x END) AS e2,
        |    max(CASE WHEN tier = 2 THEN x END) AS e3
        |  FROM ranked
        |), bb AS (
        |  SELECT CASE WHEN x <= e1 THEN 0 WHEN x <= e2 THEN 1
        |    WHEN x <= e3 THEN 2 ELSE 3 END AS bin, count(*) AS n_base
        |  FROM base CROSS JOIN edges GROUP BY 1
        |), cb AS (
        |  SELECT CASE WHEN x <= e1 THEN 0 WHEN x <= e2 THEN 1
        |    WHEN x <= e3 THEN 2 ELSE 3 END AS bin, count(*) AS n_cur
        |  FROM cur CROSS JOIN edges GROUP BY 1
        |), dense AS (
        |  SELECT CAST(b.bin AS INTEGER) AS bin,
        |    CAST(coalesce(bb.n_base, 0) AS BIGINT) AS n_base,
        |    CAST(coalesce(cb.n_cur, 0) AS BIGINT) AS n_cur
        |  FROM (SELECT unnest(range(0, 4)) AS bin) b
        |  LEFT JOIN bb ON bb.bin = b.bin LEFT JOIN cb ON cb.bin = b.bin
        |), tot AS (
        |  SELECT CAST(sum(n_base) AS BIGINT) AS tb,
        |    CAST(sum(n_cur) AS BIGINT) AS tc FROM dense
        |), sh AS (
        |  SELECT bin, n_base, n_cur,
        |    CAST((n_base + 1) * 1000000 // (tb + 4) AS BIGINT) AS p_e6,
        |    CAST((n_cur + 1) * 1000000 // (tc + 4) AS BIGINT) AS q_e6
        |  FROM dense CROSS JOIN tot)
        |SELECT bin, n_base, n_cur, p_e6, q_e6,
        |  CAST(floor(
        |    (CAST(p_e6 - q_e6 AS DOUBLE) / 1000000.0)
        |    * ln(CAST(p_e6 AS DOUBLE) / CAST(q_e6 AS DOUBLE))
        |    * 1000000.0) AS BIGINT) AS term_e6
        |FROM sh ORDER BY bin""".stripMargin,
    // post-expiry the newest snapshot must still serve the full corpus
    "snapshot_expire" ->
      """SELECT CAST(3 AS INT) AS version, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents""".stripMargin,
    // the oracle states snapshot semantics over the source rows: as-of
    // v1 = the base split only, as-of v2 = base plus the append
    "table_time_travel" ->
      """SELECT * FROM (
        |  SELECT CAST(1 AS INT) AS version, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents WHERE doc_id % 10 != 0
        |  UNION ALL
        |  SELECT CAST(2 AS INT), count(*), CAST(sum(n_chars) AS BIGINT)
        |  FROM documents)
        |ORDER BY version""".stripMargin,
    // roundtrip invariance: the ORC write→pruned-read cycle must be
    // value-transparent, so the oracle aggregates the parquet original
    "orc_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY source ORDER BY source""".stripMargin,
    // the vocab boundary is a (count DESC, token) total order on both
    // sides, so the top-V cut is deterministic
    "oov_rate" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), tk AS (
        |  SELECT doc_id, tok FROM t WHERE tok <> ''
        |), cnt AS (
        |  SELECT tok, count(*) AS c FROM tk GROUP BY tok
        |), vocab AS (
        |  SELECT tok FROM cnt ORDER BY c DESC, tok LIMIT 1000
        |), pd AS (
        |  SELECT tk.doc_id, count(*) AS n_tokens,
        |    CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_oov
        |  FROM tk LEFT JOIN vocab v USING (tok) GROUP BY tk.doc_id
        |)
        |SELECT d.doc_id,
        |  coalesce(p.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
        |  coalesce(p.n_oov, CAST(0 AS BIGINT)) AS n_oov,
        |  CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(floor(CAST(p.n_oov AS DOUBLE) /
        |      CAST(p.n_tokens AS DOUBLE) * 1e6 + 0.5) AS BIGINT) END
        |    AS oov_e6
        |FROM documents d LEFT JOIN pd p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // the same three positional-postings probes; DuckDB's 1-based
    // subscripts vs Spark's 0-based posexplode are internal only
    "phrase_trigram" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        |), idx AS (
        |  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i
        |  FROM toks WHERE len(ts) >= 3
        |), tri AS (
        |  SELECT array_to_string(ts[i:i+2], ' ') AS phrase FROM idx
        |), top AS (
        |  SELECT phrase FROM tri GROUP BY phrase
        |  ORDER BY count(*) DESC, phrase LIMIT 1
        |), w AS (
        |  SELECT phrase, string_split(phrase, ' ') AS ws FROM top
        |), post AS (
        |  SELECT doc_id, generate_subscripts(ts, 1) AS pos, unnest(ts) AS tok
        |  FROM toks)
        |SELECT p1.doc_id, w.phrase, count(*) AS n_matches
        |FROM post p1 CROSS JOIN w
        |JOIN post p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
        |JOIN post p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2
        |WHERE p1.tok = ws[1] AND p2.tok = ws[2] AND p3.tok = ws[3]
        |GROUP BY p1.doc_id, w.phrase ORDER BY p1.doc_id""".stripMargin,
    "token_counts" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_subword_tokens,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM documents)
        |SELECT doc_id, n_ws_tokens, n_subword_tokens, n_chars,
        |  CAST(n_chars AS DOUBLE) / CAST(n_subword_tokens AS DOUBLE) AS chars_per_subword
        |FROM c ORDER BY doc_id""".stripMargin,
    // each division floors independently — that IS the contract
    "readability_flesch" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    greatest(CAST(1 AS BIGINT),
        |      CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  206835000 - (1015000 * n_words) // n_sentences -
        |    (84600000 * n_syllables) // n_words AS flesch_e6
        |FROM c ORDER BY doc_id""".stripMargin,
    "quality_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), tri AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tri
        |  FROM toks WHERE len(t) >= 3
        |), c AS (
        |  SELECT doc_id, tri, count(*) AS c FROM tri GROUP BY 1, 2
        |)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
        |  CAST(max(c) AS BIGINT) AS max_trigram,
        |  count(*) AS n_distinct_trigrams,
        |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS rep_ratio
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "c4_line_filter" -> c4LineFilterOracle,
    "gopher_quality" -> gopherQualityOracleSql,
    // the three gates' oracle texts composed VERBATIM as CTEs — the
    // ablation cannot drift from the gates it reports on
    "quality_ablation" ->
      s"""WITH g AS ($gopherQualityOracleSql),
      |c4 AS ($c4LineFilterOracle),
      |l AS ($langIdOracleSql)
      |SELECT g.keep AS gopher_pass, c4.keep AS c4_pass,
      |  (l.lang_pred = l.lang_label) AS lang_pass, count(*) AS n_docs
      |FROM g JOIN c4 ON g.doc_id = c4.doc_id JOIN l ON g.doc_id = l.doc_id
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "script_profile" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    repeat(chr(1072), CAST(doc_id % 40 AS INTEGER)) ||
        |    repeat('a', CAST(doc_id % 23 AS INTEGER)) ||
        |    repeat(chr(20320), CAST(doc_id % 17 AS INTEGER)) ||
        |    repeat('7', CAST(doc_id % 5 AS INTEGER)) AS t
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, CAST(length(t) AS BIGINT) AS n_cp,
        |    CAST(length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_latin,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[' || chr(1024) || '-' || chr(1279) || ']', '', 'g')) AS BIGINT) AS n_cyrillic,
        |    CAST(length(t) - length(regexp_replace(t,
        |      '[' || chr(19968) || '-' || chr(40959) || ']', '', 'g')) AS BIGINT) AS n_cjk,
        |    CAST(length(t) - length(regexp_replace(t, '[0-9]', '', 'g')) AS BIGINT) AS n_digit
        |  FROM s
        |)
        |SELECT doc_id, n_cp, n_latin, n_cyrillic, n_cjk, n_digit,
        |  n_cp - n_latin - n_cyrillic - n_cjk - n_digit AS n_other,
        |  CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk THEN 'latin'
        |       WHEN n_cyrillic >= n_cjk THEN 'cyrillic' ELSE 'cjk' END AS dominant
        |FROM c ORDER BY doc_id""".stripMargin,
    "nfc_normalize" ->
      """WITH r AS (
        |  SELECT doc_id, text || ' Cafe' || chr(769) || ' ' || chr(233)
        |    || 'cole A' || chr(778) || 'ngstro' || chr(776) || 'm' AS raw
        |  FROM documents
        |)
        |SELECT doc_id, nfc_normalize(raw) AS nfc_text,
        |  nfc_normalize(raw) = raw AS already_nfc,
        |  CAST(length(raw) AS BIGINT) AS n_cp_raw,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_cp_nfc
        |FROM r ORDER BY doc_id""".stripMargin,
    "fingerprints" ->
      """SELECT doc_id, md5(text) AS content_md5,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // same seeded damage classes, same length-difference occurrence
    // arithmetic (both engines count code points)
    "mojibake_stats" ->
      """WITH seeded AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 40 = 0 THEN ' cafÃ© Âfoo'
        |         WHEN doc_id % 40 = 1 THEN ' donâ€™t'
        |         WHEN doc_id % 40 = 2 THEN ' bad�char'
        |         ELSE '' END AS text
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST((length(text) - length(replace(text, 'Ã', '')))
        |       + (length(text) - length(replace(text, 'Â', ''))) AS BIGINT)
        |      AS n_latin1_utf8,
        |    CAST((length(text) - length(replace(text, 'â€', ''))) / 2 AS BIGINT)
        |      AS n_broken_punct,
        |    CAST(length(text) - length(replace(text, '�', '')) AS BIGINT)
        |      AS n_replacement
        |  FROM seeded)
        |SELECT doc_id, n_latin1_utf8, n_broken_punct, n_replacement,
        |  (n_latin1_utf8 = 0 AND n_broken_punct = 0 AND n_replacement = 0)
        |    AS is_clean
        |FROM c ORDER BY doc_id""".stripMargin,
    "scrub_pii" -> {
      val (e, i, n) = (TextAnalysis.EmailRe, TextAnalysis.Ipv4Re,
        TextAnalysis.LongNumRe)
      s"""WITH m AS (
        |  SELECT doc_id, text,
        |    regexp_replace(text, '$e', '<EMAIL>', 'g') AS em
        |  FROM documents
        |), m2 AS (
        |  SELECT doc_id, text, em,
        |    regexp_replace(em, '$i', '<IP>', 'g') AS ipm
        |  FROM m
        |), c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '$e')) AS BIGINT) AS n_emails,
        |    CAST(len(regexp_extract_all(em, '$i')) AS BIGINT) AS n_ips,
        |    CAST(len(regexp_extract_all(ipm, '$n')) AS BIGINT) AS n_long_numbers,
        |    md5(regexp_replace(ipm, '$n', '<NUM>', 'g')) AS masked_md5
        |  FROM m2
        |)
        |SELECT doc_id, n_emails, n_ips, n_long_numbers, masked_md5,
        |  n_emails + n_ips + n_long_numbers = 0 AS clean
        |FROM c ORDER BY doc_id""".stripMargin
    },
    "html_extract" -> {
      val (sc, st, cm, bl, tg) = (TextAnalysis.HtmlScriptRe,
        TextAnalysis.HtmlStyleRe, TextAnalysis.HtmlCommentRe,
        TextAnalysis.HtmlBlockTagRe, TextAnalysis.HtmlTagRe)
      s"""WITH pages AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc</title><style>body{color:#333} .nav{display:none}</style></head><body><script type="text/javascript">var lt = 1 < 2 && 3 > 2;</script><h1>Doc '
        |    || CAST(doc_id AS VARCHAR) || '</h1><p>'
        |    || regexp_replace(text, '\\. ', '.</p><p>', 'g')
        |    || '</p><div class="nav"><ul><li>Home</li><li>About &amp; &lt;contact&gt; &quot;mail&#39;s&quot;&nbsp;here</li></ul></div><!-- footer'
        |    || chr(10) || 'comment --></body></html>' AS html
        |  FROM documents
        |), s1 AS (
        |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(html,
        |    '$sc', ' ', 'g'), '$st', ' ', 'g'), '$cm', ' ', 'g'),
        |    '\\s+', ' ', 'g') AS x
        |  FROM pages
        |), s2 AS (
        |  SELECT doc_id, regexp_replace(regexp_replace(x,
        |    '$bl', chr(10), 'g'), '$tg', '', 'g') AS x FROM s1
        |), s3 AS (
        |  SELECT doc_id, replace(replace(replace(replace(replace(replace(x,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
        |    '&nbsp;', ' '), '&amp;', '&') AS x FROM s2
        |)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(x,
        |    ' +', ' ', 'g'), ' ?(\\n ?)+', chr(10), 'g'),
        |    '^\\s+|\\s+$$', '', 'g') AS text
        |FROM s3 ORDER BY doc_id""".stripMargin
    },
    "chunk_docs" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), s AS (
        |  SELECT doc_id, toks,
        |    list_filter(range(1, len(toks) + 1, 24),
        |      x -> x = 1 OR x + 8 <= len(toks)) AS starts
        |  FROM t
        |), c AS (
        |  SELECT doc_id, toks, unnest(starts) AS start,
        |    generate_subscripts(starts, 1) - 1 AS chunk_idx
        |  FROM s
        |)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(start AS BIGINT) AS start_token,
        |  CAST(len(toks[start:start+31]) AS BIGINT) AS n_chunk_tokens,
        |  md5(array_to_string(toks[start:start+31], ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "bpe_tokens" ->
      s"""WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        |), enc AS (
        |  SELECT doc_id, length(w) AS nc,
        |         len(string_split($bpeEncodedExpr, '  ')) AS nb
        |  FROM words WHERE w <> ''
        |), agg AS (
        |  SELECT doc_id, count(*) AS n_words,
        |         CAST(sum(nc) AS BIGINT) AS n_char_tokens,
        |         CAST(sum(nb) AS BIGINT) AS n_bpe_tokens
        |  FROM enc GROUP BY doc_id
        |)
        |SELECT d.doc_id, coalesce(a.n_words, CAST(0 AS BIGINT)) AS n_words,
        |  coalesce(a.n_char_tokens, CAST(0 AS BIGINT)) AS n_char_tokens,
        |  coalesce(a.n_bpe_tokens, CAST(0 AS BIGINT)) AS n_bpe_tokens
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // per-language rollup of the same per-doc encode: the two ratios
    // are single IEEE divisions under the e6 contract
    "tokenizer_fertility" ->
      s"""WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        |), enc AS (
        |  SELECT doc_id, length(w) AS nc,
        |         len(string_split($bpeEncodedExpr, '  ')) AS nb
        |  FROM words WHERE w <> ''
        |), agg AS (
        |  SELECT doc_id, count(*) AS n_words,
        |         CAST(sum(nc) AS BIGINT) AS n_char_tokens,
        |         CAST(sum(nb) AS BIGINT) AS n_bpe_tokens
        |  FROM enc GROUP BY doc_id
        |), perdoc AS (
        |  SELECT d.doc_id, d.lang,
        |    coalesce(a.n_words, CAST(0 AS BIGINT)) AS n_words,
        |    coalesce(a.n_char_tokens, CAST(0 AS BIGINT)) AS n_char_tokens,
        |    coalesce(a.n_bpe_tokens, CAST(0 AS BIGINT)) AS n_bpe_tokens
        |  FROM documents d LEFT JOIN agg a USING (doc_id))
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS n_words,
        |  CAST(sum(n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
        |  CAST(floor(CAST(sum(n_bpe_tokens) AS DOUBLE) /
        |    CAST(sum(n_words) AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
        |    AS fertility_e6,
        |  CAST(floor(CAST(sum(n_char_tokens) AS DOUBLE) /
        |    CAST(sum(n_bpe_tokens) AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
        |    AS chars_per_token_e6
        |FROM perdoc GROUP BY lang ORDER BY lang""".stripMargin,
    "unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), freq AS (
        |  SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
        |), tot AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM freq
        |), scored AS (
        |  SELECT t.doc_id,
        |    CAST(floor(-ln(CAST(f.cnt AS DOUBLE) / CAST(tot.n_total AS DOUBLE))
        |      * 1000000.0) AS BIGINT) AS s_e6
        |  FROM toks t JOIN freq f USING (tok) CROSS JOIN tot
        |)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(s_e6) AS BIGINT) AS surprisal_e6,
        |  CAST(CAST(sum(s_e6) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS avg_surprisal_e6
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // bigrams via 1-based list indexing over range(2, len+1) — empty for
    // single-token docs, matching the Spark side's size>=2 guard
    "bigram_logprob" ->
      (bigramDocScoresCte +
        """SELECT doc_id, n_bigrams, surprisal_e6, avg_surprisal_e6
        |FROM doc_scores ORDER BY doc_id""".stripMargin),
    // the oracle MAY window globally (single-engine check); the Spark
    // side must not — exact integer-rank thirds, bucket means as ratios
    // of exact integer sums
    "kn_bigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), bg AS (
        |  SELECT doc_id, t[i - 1] AS w1, t[i] AS w2
        |  FROM (SELECT doc_id, t, unnest(range(2, len(t) + 1)) AS i FROM toks)
        |), model AS (
        |  SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY w1, w2
        |), ctx AS (
        |  SELECT w1, CAST(sum(cnt) AS BIGINT) AS ctx_cnt,
        |    count(*) AS n1fwd FROM model GROUP BY w1
        |), np AS (
        |  SELECT w2, count(*) AS nprec FROM model GROUP BY w2
        |), ty AS (
        |  SELECT count(*) AS n_types FROM model
        |), scored AS (
        |  SELECT m.w1, m.w2,
        |    CAST(floor(-ln(
        |      ((CAST(m.cnt AS DOUBLE) - 0.75) / CAST(c.ctx_cnt AS DOUBLE))
        |      + ((0.75 * CAST(c.n1fwd AS DOUBLE)) / CAST(c.ctx_cnt AS DOUBLE))
        |        * (CAST(p.nprec AS DOUBLE) / CAST(ty.n_types AS DOUBLE)))
        |      * 1000000.0) AS BIGINT) AS s_e6
        |  FROM model m JOIN ctx c USING (w1) JOIN np p ON p.w2 = m.w2
        |  CROSS JOIN ty
        |), doc AS (
        |  SELECT b.doc_id, count(*) AS n_bigrams,
        |    CAST(sum(s.s_e6) AS BIGINT) AS surprisal_e6
        |  FROM bg b JOIN scored s ON b.w1 = s.w1 AND b.w2 = s.w2
        |  GROUP BY b.doc_id)
        |SELECT doc_id, n_bigrams, surprisal_e6,
        |  CAST(surprisal_e6 AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
        |    AS avg_surprisal_e6
        |FROM doc ORDER BY doc_id""".stripMargin,
    "perplexity_buckets" ->
      (bigramDocScoresCte +
        """, ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY avg_surprisal_e6, doc_id) AS rnk,
        |    count(*) OVER () AS n
        |  FROM doc_scores
        |), lab AS (
        |  SELECT *, CASE WHEN rnk * 3 <= n THEN 'head'
        |    WHEN rnk * 3 <= n * 2 THEN 'middle' ELSE 'tail' END AS bucket
        |  FROM ranked
        |)
        |SELECT bucket, count(*) AS n_docs,
        |  min(avg_surprisal_e6) AS min_avg_e6,
        |  max(avg_surprisal_e6) AS max_avg_e6,
        |  CAST(sum(surprisal_e6) AS BIGINT) AS sum_surprisal_e6,
        |  CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams,
        |  CAST(CAST(sum(surprisal_e6) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(sum(n_bigrams) AS BIGINT) AS DOUBLE)
        |    AS mean_surprisal_e6
        |FROM lab GROUP BY bucket ORDER BY bucket""".stripMargin),
    // bigramDocScoresCte with every model relation conditioned on lang,
    // then the per-language ranked thirds (the oracle's window states
    // the SEMANTICS; the engine's ExactRank must be invisible)
    "ccnet_select" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
        |), bg AS (
        |  SELECT doc_id, lang, t[i - 1] AS w1, t[i] AS w2
        |  FROM (SELECT doc_id, lang, t, unnest(range(2, len(t) + 1)) AS i
        |        FROM toks)
        |), model AS (
        |  SELECT lang, w1, w2, count(*) AS cnt FROM bg GROUP BY 1, 2, 3
        |), ctx AS (
        |  SELECT lang, w1, CAST(sum(cnt) AS BIGINT) AS ctx_cnt
        |  FROM model GROUP BY 1, 2
        |), voc AS (
        |  SELECT lang, count(DISTINCT tok) AS v FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS tok
        |    FROM documents) GROUP BY lang
        |), scored AS (
        |  SELECT m.lang, m.w1, m.w2,
        |    CAST(floor(-ln((CAST(m.cnt AS DOUBLE) + 1.0)
        |        / (CAST(c.ctx_cnt AS DOUBLE) + CAST(voc.v AS DOUBLE)))
        |      * 1000000.0) AS BIGINT) AS s_e6
        |  FROM model m JOIN ctx c USING (lang, w1) JOIN voc USING (lang)
        |), doc_scores AS (
        |  SELECT doc_id, lang, count(*) AS n_bigrams,
        |    CAST(sum(s_e6) AS BIGINT) AS surprisal_e6,
        |    CAST(CAST(sum(s_e6) AS BIGINT) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS avg_surprisal_e6
        |  FROM bg JOIN scored USING (lang, w1, w2) GROUP BY 1, 2
        |), ranked AS (
        |  SELECT *,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY avg_surprisal_e6, doc_id) AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_group
        |  FROM doc_scores
        |), lab AS (
        |  SELECT *, CASE WHEN rnk * 3 <= n_group THEN 'head'
        |    WHEN rnk * 3 <= n_group * 2 THEN 'middle'
        |    ELSE 'tail' END AS bucket
        |  FROM ranked)
        |SELECT doc_id, lang, n_bigrams, surprisal_e6, rnk, n_group,
        |  bucket, bucket != 'tail' AS kept
        |FROM lab ORDER BY doc_id""".stripMargin,
    "corpus_shuffle" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |      AS BIGINT) AS pos
        |  FROM documents)
        |SELECT doc_id, pos, CAST((pos - 1) % 8 AS INTEGER) AS shard
        |FROM p ORDER BY doc_id""".stripMargin,
    "contamination" -> contaminationSql,
    // the Bloom pre-filter has no false negatives and the exact join
    // removes false positives, so the result is bit-identical to the
    // plain contamination check — ONE oracle for both engine paths
    "contamination_bloom" -> contaminationSql,
    "passage_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), st AS (
        |  SELECT doc_id, t, range(1, len(t) + 1, 10) AS starts FROM toks
        |), ex AS (
        |  SELECT doc_id, t, unnest(starts) AS s,
        |    CAST(generate_subscripts(starts, 1) - 1 AS INTEGER) AS pos
        |  FROM st
        |), p AS (
        |  SELECT doc_id, pos, array_to_string(t[s:s+9], ' ') AS passage FROM ex
        |), fo AS (
        |  SELECT doc_id, pos, passage,
        |    row_number() OVER (PARTITION BY passage ORDER BY doc_id, pos) AS rn
        |  FROM p
        |), rebuilt AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(passage, ' ' ORDER BY pos) AS clean_text
        |  FROM fo WHERE rn = 1 GROUP BY doc_id
        |), totals AS (
        |  SELECT doc_id, count(*) AS n_passages FROM p GROUP BY doc_id
        |)
        |SELECT t.doc_id, t.n_passages,
        |  CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(r.clean_text, '') AS clean_text
        |FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "token_entropy" ->
      """WITH tokens AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS c FROM tokens GROUP BY doc_id, tok
        |), n AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM tf GROUP BY doc_id
        |)
        |SELECT t.doc_id, max(n.n) AS n_tokens, count(*) AS n_distinct,
        |  CAST(sum(CAST(floor(-1000000.0 *
        |    (CAST(t.c AS DOUBLE) / CAST(n.n AS DOUBLE)) *
        |    ln(CAST(t.c AS DOUBLE) / CAST(n.n AS DOUBLE))) AS BIGINT)) AS BIGINT) AS entropy_e6
        |FROM tf t JOIN n ON t.doc_id = n.doc_id
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "cdc_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), ex AS (
        |  SELECT doc_id, unnest(t) AS tok,
        |    CAST(generate_subscripts(t, 1) AS INTEGER) AS pos
        |  FROM toks
        |), h AS (
        |  SELECT doc_id, tok, pos,
        |    CASE WHEN ('0x' || substr(md5(tok), 1, 8))::BIGINT % 16 = 0
        |         THEN 1 ELSE 0 END AS bnd
        |  FROM ex
        |), c AS (
        |  SELECT doc_id, tok, pos,
        |    coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
        |  FROM h
        |)
        |SELECT doc_id, CAST(chunk AS BIGINT) AS chunk_id,
        |  count(*) AS n_tokens,
        |  string_agg(tok, ' ' ORDER BY pos) AS chunk_text
        |FROM c GROUP BY doc_id, chunk ORDER BY doc_id, chunk_id""".stripMargin,
    "boilerplate_filter" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), st AS (
        |  SELECT doc_id, t, range(1, len(t) + 1, 10) AS starts FROM toks
        |), ex AS (
        |  SELECT doc_id, t, unnest(starts) AS s,
        |    CAST(generate_subscripts(starts, 1) - 1 AS INTEGER) AS pos
        |  FROM st
        |), p AS (
        |  SELECT doc_id, pos, array_to_string(t[s:s+9], ' ') AS passage FROM ex
        |), df AS (
        |  SELECT passage, count(DISTINCT doc_id) AS df FROM p GROUP BY passage
        |)
        |SELECT p.doc_id, count(*) AS n_passages,
        |  CAST(sum(CASE WHEN d.df <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(CASE WHEN d.df <= 1 THEN p.passage END, ' ' ORDER BY p.pos), '') AS clean_text
        |FROM p JOIN df d ON p.passage = d.passage
        |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin,
    "tfidf_topk" ->
      """WITH tokens AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM tokens GROUP BY doc_id, tok
        |), df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.tok, t.tf, d.df,
        |    CAST(floor(CAST(t.tf AS DOUBLE) *
        |      ln(CAST(n.n_docs + 1 AS DOUBLE) / CAST(d.df + 1 AS DOUBLE)) *
        |      1000000.0) AS BIGINT) AS tfidf_e6
        |  FROM tf t JOIN df d USING (tok) CROSS JOIN nd n
        |), ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf_e6 DESC, tok) AS rk
        |  FROM scored
        |)
        |SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, tf, df, tfidf_e6
        |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "bm25_rank" ->
      """WITH tokens AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), dl AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id),
        |tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM tokens
        |  WHERE tok IN ('spark', 'query', 'join') GROUP BY doc_id, tok
        |), df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |st AS (
        |  SELECT (SELECT count(*) FROM documents) AS n_docs,
        |         (SELECT count(*) FROM tokens) AS total_tok
        |), per AS (
        |  SELECT t.doc_id,
        |    CAST(floor(
        |      ln(1.0 + ((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
        |                / (CAST(d.df AS DOUBLE) + 0.5)))
        |      * ((CAST(t.tf AS DOUBLE) * (1.2 + 1.0))
        |         / (CAST(t.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
        |            + 0.75 * (CAST(l.dl AS DOUBLE)
        |              / (CAST(s.total_tok AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_e6
        |  FROM tf t JOIN df d USING (tok) JOIN dl l USING (doc_id) CROSS JOIN st s
        |), scored AS (
        |  SELECT doc_id, CAST(sum(term_e6) AS BIGINT) AS bm25_e6,
        |    count(*) AS n_terms_matched
        |  FROM per GROUP BY doc_id ORDER BY bm25_e6 DESC, doc_id LIMIT 20
        |)
        |SELECT CAST(row_number() OVER (ORDER BY bm25_e6 DESC, doc_id) AS BIGINT) AS rk,
        |  doc_id, n_terms_matched, bm25_e6
        |FROM scored ORDER BY rk""".stripMargin,
    // the same formula text instantiated twice (pass 1 on q0, pass 2 on
    // the expanded set) so the two passes can never drift apart
    "bm25_prf" -> {
      val q = operators.TextAnalysis.DefaultBm25Query
      val banned = (q ++ operators.TextAnalysis.stopwords)
        .map(t => s"'$t'").mkString(", ")
      val qList = q.map(t => s"'$t'").mkString(", ")
      def pass(sfx: String, termsFrom: String) = s""",
        |tf$sfx AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM tokens
        |  WHERE tok IN (SELECT tok FROM $termsFrom) GROUP BY doc_id, tok
        |), df$sfx AS (SELECT tok, count(*) AS df FROM tf$sfx GROUP BY tok),
        |per$sfx AS (
        |  SELECT t.doc_id,
        |    CAST(floor(
        |      ln(1.0 + ((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
        |                / (CAST(d.df AS DOUBLE) + 0.5)))
        |      * ((CAST(t.tf AS DOUBLE) * (1.2 + 1.0))
        |         / (CAST(t.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
        |            + 0.75 * (CAST(l.dl AS DOUBLE)
        |              / (CAST(s.total_tok AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))
        |      * 1000000.0) AS BIGINT) AS term_e6
        |  FROM tf$sfx t JOIN df$sfx d USING (tok) JOIN dl l USING (doc_id)
        |  CROSS JOIN st s
        |), scored$sfx AS (
        |  SELECT doc_id, CAST(sum(term_e6) AS BIGINT) AS bm25_e6,
        |    count(*) AS n_terms_matched
        |  FROM per$sfx GROUP BY doc_id)""".stripMargin
      s"""WITH tokens AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), dl AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id),
        |st AS (
        |  SELECT (SELECT count(*) FROM documents) AS n_docs,
        |         (SELECT count(*) FROM tokens) AS total_tok
        |), q0 AS (SELECT unnest([$qList]) AS tok)""".stripMargin +
        pass("1", "q0") + s""",
        |fb AS (
        |  SELECT doc_id FROM scored1 ORDER BY bm25_e6 DESC, doc_id LIMIT 10
        |), fbtoks AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS cnt
        |    FROM tokens JOIN fb USING (doc_id)
        |    WHERE tok NOT IN ($banned)
        |    GROUP BY tok ORDER BY cnt DESC, tok LIMIT 3)
        |), qe AS (SELECT tok FROM q0 UNION ALL SELECT tok FROM fbtoks)""".stripMargin +
        pass("2", "qe") + s""",
        |top AS (
        |  SELECT doc_id, bm25_e6, n_terms_matched FROM scored2
        |  ORDER BY bm25_e6 DESC, doc_id LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY bm25_e6 DESC, doc_id)
        |    AS BIGINT) AS rk,
        |  doc_id, n_terms_matched, bm25_e6
        |FROM top ORDER BY rk""".stripMargin
    },
    // positions via 1-based list indexing (the bigram-oracle pattern);
    // the flat (token, doc) grain mirrors the skew-safe engine relation
    "inverted_index" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS arr FROM documents
        |), p AS (
        |  SELECT doc_id, arr[i] AS token, CAST(i - 1 AS BIGINT) AS pos
        |  FROM (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS i FROM t)
        |)
        |SELECT token, doc_id, count(*) AS n_occ,
        |  array_to_string(list(pos ORDER BY pos), ',') AS positions
        |FROM p GROUP BY token, doc_id ORDER BY token, doc_id""".stripMargin,
    "phrase_search" -> phraseSearchSql,
    // persisted-bucketed serve must be bit-identical to the in-flight
    // serve (the ann_ivf_persisted convention) — same oracle text
    "phrase_persisted" -> phraseSearchSql,
    // every masking decision replayed from the md5(doc_id:pos) PRNG;
    // run structure via the same lag/sum window chain; pair assembly =
    // ordered string_agg (engine: in-aggregate array_sort)
    "span_corruption" ->
      """WITH toks AS (
        |  SELECT doc_id, i - 1 AS pos, t[i] AS tok
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
        |), f AS (
        |  SELECT doc_id, pos, tok,
        |    CASE WHEN ('0x' || substr(md5(doc_id || ':' || pos), 1, 8))::BIGINT % 100 < 15
        |      THEN 1 ELSE 0 END AS anchor
        |  FROM toks
        |), m AS (
        |  SELECT doc_id, pos, tok,
        |    max(anchor) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1 AS masked
        |  FROM f
        |), r AS (
        |  SELECT doc_id, pos, tok, masked,
        |    CASE WHEN masked AND NOT COALESCE(
        |        lag(masked) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
        |      THEN 1 ELSE 0 END AS new_run
        |  FROM m
        |), rr AS (
        |  SELECT doc_id, pos, tok, masked, new_run,
        |    sum(new_run) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        |  FROM r
        |), p AS (
        |  SELECT doc_id, pos, new_run,
        |    CASE WHEN NOT masked THEN tok
        |         WHEN new_run = 1
        |           THEN '<extra_id_' || (run_id - 1) || '>' END AS in_piece,
        |    CASE WHEN masked AND new_run = 1
        |           THEN '<extra_id_' || (run_id - 1) || '>' || ' ' || tok
        |         WHEN masked THEN tok END AS tgt_piece
        |  FROM rr)
        |SELECT doc_id,
        |  COALESCE(string_agg(in_piece, ' ' ORDER BY pos), '') AS input_text,
        |  COALESCE(string_agg(tgt_piece, ' ' ORDER BY pos), '') AS target_text,
        |  CAST(sum(new_run) AS BIGINT) AS n_spans
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // FIM: the same md5 streams, DuckDB 1-based inclusive list slices
    // mirror Spark's slice(arr, start, len); nullif drops empty pieces
    // from the sentinel join exactly like the engine's when()
    "fim_transform" ->
      """WITH b AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS t,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |    ('0x' || substr(md5('fim:' || doc_id), 1, 8))::BIGINT % 100 < 50
        |      AS is_fim
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, text, t, n, is_fim,
        |    ('0x' || substr(md5('fimcut1:' || doc_id), 1, 8))::BIGINT % (n + 1) AS c1,
        |    ('0x' || substr(md5('fimcut2:' || doc_id), 1, 8))::BIGINT % (n + 1) AS c2
        |  FROM b
        |), s AS (
        |  SELECT doc_id, text, t, n, is_fim,
        |    least(c1, c2) AS lo, greatest(c1, c2) AS hi
        |  FROM c)
        |SELECT doc_id,
        |  CASE WHEN is_fim THEN 'fim' ELSE 'causal' END AS mode,
        |  n AS n_tokens,
        |  CASE WHEN is_fim THEN lo END AS cut_lo,
        |  CASE WHEN is_fim THEN hi END AS cut_hi,
        |  CASE WHEN is_fim THEN concat_ws(' ', '<fim_prefix>',
        |      nullif(array_to_string(t[1:lo], ' '), ''),
        |      '<fim_suffix>', nullif(array_to_string(t[hi+1:n], ' '), ''),
        |      '<fim_middle>', nullif(array_to_string(t[lo+1:hi], ' '), ''))
        |    ELSE text END AS fim_text
        |FROM s ORDER BY doc_id""".stripMargin,
    // MLM: one md5 per (doc, pos); selection / action / replacement
    // index read hex windows [1,8], [9,8], [17,8] of it — the oracle
    // explodes positions where the engine stays row-local
    "mlm_mask" ->
      """WITH toks AS (
        |  SELECT doc_id, i AS pos, t[i] AS tok, t, CAST(len(t) AS BIGINT) AS n
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
        |), h AS (
        |  SELECT doc_id, pos, tok, t, n,
        |    md5('mlm:' || doc_id || ':' || pos) AS hh
        |  FROM toks
        |), d AS (
        |  SELECT doc_id, pos, tok, n,
        |    ('0x' || substr(hh, 1, 8))::BIGINT % 100 < 15 AS sel,
        |    ('0x' || substr(hh, 9, 8))::BIGINT % 10 AS sub,
        |    t[CAST(('0x' || substr(hh, 17, 8))::BIGINT % n AS INTEGER) + 1]
        |      AS rtok
        |  FROM h
        |), m AS (
        |  SELECT doc_id, pos, tok, n, sel,
        |    CASE WHEN NOT sel THEN tok
        |         WHEN sub < 8 THEN '[MASK]'
        |         WHEN sub = 8 THEN rtok
        |         ELSE tok END AS mtok,
        |    CASE WHEN sel AND sub < 8 THEN 1 ELSE 0 END AS is_m,
        |    CASE WHEN sel AND sub = 8 THEN 1 ELSE 0 END AS is_r,
        |    CASE WHEN sel AND sub = 9 THEN 1 ELSE 0 END AS is_k
        |  FROM d)
        |SELECT doc_id, max(n) AS n_tokens,
        |  CAST(sum(CASE WHEN sel THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
        |  CAST(sum(is_m) AS BIGINT) AS n_masked,
        |  CAST(sum(is_r) AS BIGINT) AS n_random,
        |  CAST(sum(is_k) AS BIGINT) AS n_kept,
        |  string_agg(mtok, ' ' ORDER BY pos) AS masked_text,
        |  COALESCE(string_agg(CASE WHEN sel THEN pos || ':' || tok END,
        |    ' ' ORDER BY pos), '') AS labels
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // bm25_rank's chain (lex list) + ann_topk's cosine chain pinned to
    // query vec 0 (sem list) + the two-term integer RRF sum
    "rrf_fusion" -> rrfFusionSql,
    // the persisted-IVF-probed serve must produce the exact-scan serve's
    // result at gate scale (probe set covers the true top-20 — recall 1)
    // — same oracle text (the phrase_persisted convention)
    "rrf_fusion_indexed" -> rrfFusionSql,
    "dedup_exact" ->
      """SELECT md5(text) AS content_md5, count(*) AS n_copies,
        |  min(doc_id) AS canonical_id
        |FROM documents GROUP BY content_md5 ORDER BY canonical_id""".stripMargin,
    // the oracle states the DEFINITION (rank-window self-join); the
    // engine's block decomposition must be invisible in the result
    "sorted_neighborhood" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    substr(regexp_replace(lower(coalesce(text, '')), '\s+', '', 'g'),
        |      1, 24) AS sort_key
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, sort_key,
        |    row_number() OVER (ORDER BY sort_key, doc_id) AS rnk
        |  FROM k)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  b.rnk - a.rnk AS gap, a.sort_key = b.sort_key AS same_key
        |FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk - a.rnk <= 4
        |ORDER BY doc_a, doc_b""".stripMargin,
    // SNM candidates -> levenshtein verification (shared 10%-capped-at-
    // 58 budget) -> the house recursive-CC formulation
    "entity_clusters" ->
      """WITH RECURSIVE k AS (
        |  SELECT doc_id,
        |    substr(regexp_replace(lower(coalesce(text, '')), '\s+', '', 'g'),
        |      1, 24) AS sort_key
        |  FROM documents
        |), rnks AS (
        |  SELECT doc_id, sort_key,
        |    row_number() OVER (ORDER BY sort_key, doc_id) AS rnk
        |  FROM k
        |), cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM rnks a JOIN rnks b ON b.rnk > a.rnk AND b.rnk - a.rnk <= 4
        |), v AS (
        |  SELECT c.doc_a, c.doc_b
        |  FROM cand c JOIN documents da ON da.doc_id = c.doc_a
        |              JOIN documents db ON db.doc_id = c.doc_b
        |  WHERE levenshtein(da.text, db.text) * 10 <=
        |        least(greatest(length(da.text), length(db.text)), 580)
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM v
        |  UNION SELECT doc_b AS src, doc_a AS dst FROM v
        |), reach AS (
        |  SELECT src AS node, dst AS r FROM edges
        |  UNION
        |  SELECT reach.node, edges.dst FROM reach JOIN edges ON reach.r = edges.src
        |), cl AS (
        |  SELECT node AS doc_id, least(node, min(r)) AS cluster_id
        |  FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS n_members
        |FROM cl ORDER BY doc_id""".stripMargin,
    // the all-pairs DEFINITION — the engine's prefix filtering must be
    // invisible in the result (lossless), so the oracle carries none of it
    "fuzzy_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, substr(text, 1, 40) AS title FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.title, b.title) AS INTEGER) AS dist
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE abs(length(a.title) - length(b.title)) <= 2
        |  AND levenshtein(a.title, b.title) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    "repeated_spans" ->
      (spansCte +
        """SELECT gram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
          |FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
          |ORDER BY gram""".stripMargin),
    "span_dedup" ->
      (spansCte +
        """, rep AS (SELECT gram FROM g GROUP BY gram
          |    HAVING count(DISTINCT doc_id) >= 2),
          |per AS (SELECT doc_id, count(*) AS n_spans FROM g GROUP BY doc_id),
          |repc AS (SELECT doc_id, count(*) AS n_repeated
          |  FROM g JOIN rep USING (gram) GROUP BY doc_id)
          |SELECT d.doc_id, coalesce(per.n_spans, 0) AS n_spans,
          |  coalesce(repc.n_repeated, 0) AS n_repeated,
          |  coalesce(repc.n_repeated, 0) = 0 AS keep
          |FROM documents d
          |LEFT JOIN per USING (doc_id) LEFT JOIN repc USING (doc_id)
          |ORDER BY doc_id""".stripMargin),
    // min-doc first-occurrence attribution over the shared span
    // relation; novelty as an exact e6 ratio
    "span_novelty" ->
      (spansCte.stripSuffix("\n") +
        """, fd AS (
        |  SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram
        |), per AS (
        |  SELECT g.doc_id, count(*) AS n_spans,
        |    count(CASE WHEN g.doc_id = fd.first_doc THEN 1 END) AS n_novel
        |  FROM g JOIN fd USING (gram) GROUP BY g.doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(per.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(coalesce(per.n_novel, 0) AS BIGINT) AS n_novel,
        |  CAST(CASE WHEN coalesce(per.n_spans, 0) > 0
        |    THEN (per.n_novel * 1000000) // per.n_spans
        |    ELSE 0 END AS BIGINT) AS novelty_e6
        |FROM documents d LEFT JOIN per USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin),
    // positional spans regenerated WITH positions (the shared spansCte
    // drops them), repeated-gram runs chained by island = pos − rank,
    // run length in tokens = consecutive positions + 7
    "span_dedup_50" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), px AS (
        |  SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS pos FROM toks
        |), g AS (
        |  SELECT doc_id, pos, array_to_string(t[pos:pos+7], ' ') AS gram
        |  FROM px
        |), rep AS (
        |  SELECT gram FROM g GROUP BY gram
        |  HAVING count(DISTINCT doc_id) >= 2
        |), rg AS (SELECT g.doc_id, g.pos FROM g JOIN rep USING (gram)
        |), isl AS (
        |  SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
        |      AS island
        |  FROM rg
        |), runs AS (
        |  SELECT doc_id, island, count(*) + 7 AS run_tokens
        |  FROM isl GROUP BY 1, 2
        |), per AS (
        |  SELECT doc_id,
        |    CAST(count(CASE WHEN run_tokens >= 50 THEN 1 END) AS BIGINT)
        |      AS n_long_runs,
        |    CAST(max(run_tokens) AS BIGINT) AS max_run_tokens
        |  FROM runs GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(per.n_long_runs, 0) AS BIGINT) AS n_long_runs,
        |  CAST(coalesce(per.max_run_tokens, 0) AS BIGINT) AS max_run_tokens,
        |  coalesce(per.n_long_runs, 0) = 0 AS keep
        |FROM documents d LEFT JOIN per USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "ngram_jaccard" ->
      (shinglesCte +
        s""", dfreq AS (SELECT shingle FROM sh GROUP BY shingle
        |           HAVING count(*) <= ${Dedup.MaxShingleDocFreq}),
        |shc AS (SELECT s.doc_id, s.shingle FROM sh s JOIN dfreq USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_common,
        |  CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) AS jaccard
        |FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) >= 0.1
        |ORDER BY doc_a, doc_b""".stripMargin),
    "ngram_containment" ->
      (shinglesCte +
        s""", dfreq AS (SELECT shingle FROM sh GROUP BY shingle
        |           HAVING count(*) <= ${Dedup.MaxShingleDocFreq}),
        |shc AS (SELECT s.doc_id, s.shingle FROM sh s JOIN dfreq USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_common,
        |  CAST(n_common AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) AS containment
        |FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE CAST(n_common AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin),
    "minhash_lsh" -> minhashLshSql,
    "lsh_scurve" -> lshScurveSql,
    "minhash_partners" -> minhashPartnersSql,
    "lsh_recall" ->
      (shinglesCte +
        s""", dfreq AS (SELECT shingle FROM sh GROUP BY shingle
        |           HAVING count(*) <= ${Dedup.MaxShingleDocFreq}),
        |shc AS (SELECT s.doc_id, s.shingle FROM sh s JOIN dfreq USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |truth AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) >= 0.5),
        |cand AS (SELECT doc_a, doc_b FROM ($minhashLshSql)),
        |j AS (SELECT t.doc_a IS NOT NULL AS has_t, c.doc_a IS NOT NULL AS has_c
        |      FROM truth t FULL OUTER JOIN cand c
        |        ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
        |SELECT CAST(sum(CASE WHEN has_t THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
        |  CAST(sum(CASE WHEN has_c THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
        |  CAST(sum(CASE WHEN has_t AND has_c THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
        |FROM j""".stripMargin),
    "dedup_clusters" ->
      (s"""WITH RECURSIVE
        |pairs AS (SELECT doc_a, doc_b FROM ($minhashLshSql)),
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
    "dedup_keep" ->
      (s"""WITH RECURSIVE
        |pairs AS (SELECT doc_a, doc_b FROM ($minhashLshSql)),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
        |reach AS (
        |  SELECT src AS node, dst AS r FROM edges
        |  UNION
        |  SELECT reach.node, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
        |cl AS (
        |  SELECT node AS doc_id, least(node, min(r)) AS cluster_id
        |  FROM reach GROUP BY node),
        |kept AS (
        |  SELECT d.* FROM documents d
        |  WHERE d.doc_id NOT IN (SELECT doc_id FROM cl WHERE doc_id <> cluster_id))
        |SELECT lang, count(*) AS n_kept, min(doc_id) AS min_doc,
        |  max(doc_id) AS max_doc
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin),
    // same recursive CC labels; best member = rank-1 by (n_chars desc,
    // doc_id) within each label (the oracle MAY window; the engine's
    // argmax is the window-free partial aggregate)
    "ngram_coverage" -> ngramCoverageSql,
    "dedup_keep_best" ->
      (s"""WITH RECURSIVE
        |pairs AS (SELECT doc_a, doc_b FROM ($minhashLshSql)),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
        |reach AS (
        |  SELECT src AS node, dst AS r FROM edges
        |  UNION
        |  SELECT reach.node, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
        |cl AS (
        |  SELECT node AS doc_id, least(node, min(r)) AS cluster_id
        |  FROM reach GROUP BY node),
        |labeled AS (
        |  SELECT d.doc_id, d.lang, d.n_chars,
        |    COALESCE(c.cluster_id, d.doc_id) AS cid
        |  FROM documents d LEFT JOIN cl c ON d.doc_id = c.doc_id),
        |best AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (
        |      PARTITION BY cid ORDER BY n_chars DESC, doc_id) AS rn
        |    FROM labeled) WHERE rn = 1),
        |kept AS (
        |  SELECT d.* FROM documents d JOIN best b ON d.doc_id = b.doc_id)
        |SELECT lang, count(*) AS n_kept, min(doc_id) AS min_doc,
        |  CAST(sum(n_chars) AS BIGINT) AS kept_chars
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin),
    // same recursive CC labels; chosen = rank-1 by (q desc, id), rejected
    // = rank-1 by (q asc, id desc) — the oracle MAY window; the engine's
    // extremes are window-free partial aggregates. Equal-q ties drop.
    "preference_pairs" ->
      (s"""WITH RECURSIVE
        |pairs AS (SELECT doc_a, doc_b FROM ($minhashLshSql)),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
        |reach AS (
        |  SELECT src AS node, dst AS r FROM edges
        |  UNION
        |  SELECT reach.node, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
        |cl AS (
        |  SELECT node AS doc_id, least(node, min(r)) AS cluster_id
        |  FROM reach GROUP BY node),
        |labeled AS (
        |  SELECT d.doc_id, d.n_chars,
        |    COALESCE(c.cluster_id, d.doc_id) AS cid
        |  FROM documents d LEFT JOIN cl c ON d.doc_id = c.doc_id),
        |b AS (
        |  SELECT cid, doc_id AS chosen_id, n_chars AS chosen_q FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY cid ORDER BY n_chars DESC, doc_id) AS rn
        |    FROM labeled) WHERE rn = 1),
        |w AS (
        |  SELECT cid, doc_id AS rejected_id, n_chars AS rejected_q FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY cid ORDER BY n_chars, doc_id DESC) AS rn
        |    FROM labeled) WHERE rn = 1)
        |SELECT b.cid AS cluster_id, chosen_id, chosen_q,
        |  rejected_id, rejected_q
        |FROM b JOIN w ON b.cid = w.cid
        |WHERE chosen_q > rejected_q
        |ORDER BY cluster_id""".stripMargin),
    // cluster labels via the same recursive CC, then the dataset_split
    // bucket rule keyed on each doc's representative (COALESCE = the
    // Spark side's left-join singleton fallback)
    // the oracle's per-stratum window states the semantics; the
    // engine's range-partitioned ExactRank must be invisible
    "sample_exact_k" ->
      """WITH kx AS (
        |  SELECT doc_id, lang, md5('exk_' || doc_id) AS h FROM documents
        |), r AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
        |      AS BIGINT) AS rnk,
        |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_group
        |  FROM kx)
        |SELECT doc_id, lang, rnk, n_group FROM r
        |WHERE rnk <= 100 ORDER BY doc_id""".stripMargin,
    // the same cluster-representative chain, folds = bucket % 5
    "group_kfold" ->
      (s"""WITH RECURSIVE
        |pairs AS (SELECT doc_a, doc_b FROM ($minhashLshSql)),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
        |reach AS (
        |  SELECT src AS node, dst AS r FROM edges
        |  UNION
        |  SELECT reach.node, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
        |cl AS (
        |  SELECT node AS doc_id, least(node, min(r)) AS cluster_id
        |  FROM reach GROUP BY node),
        |r AS (
        |  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS rep_id
        |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
        |SELECT doc_id, rep_id,
        |  CAST(('0x' || substr(md5(CAST(rep_id AS VARCHAR)), 1, 8))::BIGINT
        |    % 100 % 5 AS INTEGER) AS fold
        |FROM r ORDER BY doc_id""".stripMargin),
    "leakage_safe_split" ->
      (s"""WITH RECURSIVE
        |pairs AS (SELECT doc_a, doc_b FROM ($minhashLshSql)),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
        |reach AS (
        |  SELECT src AS node, dst AS r FROM edges
        |  UNION
        |  SELECT reach.node, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
        |cl AS (
        |  SELECT node AS doc_id, least(node, min(r)) AS cluster_id
        |  FROM reach GROUP BY node),
        |r AS (
        |  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS rep_id
        |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
        |b AS (
        |  SELECT doc_id, rep_id,
        |    ('0x' || substr(md5(CAST(rep_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
        |  FROM r)
        |SELECT doc_id, rep_id, bucket,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin),
  )
}
