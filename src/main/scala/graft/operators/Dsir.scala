package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection: hashed n-gram importance weighting (Xie et
  * al., "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023 — the public method, re-expressed Spark-first). Two
  * bag-of-hashed-ngram models are fit — the TARGET distribution p (the
  * domain you want more of) and the RAW distribution q (the pool you
  * select from) — and each raw document is scored by its log importance
  * weight `log w(x) = Σ_features [log p(bucket) - log q(bucket)]`;
  * selection takes the top-k raw documents by that weight.
  *
  * Feature space: word unigrams ∪ bigrams (the paper's features), hashed
  * into `16^bucketChars` buckets by md5-hex prefix — the engine's proven
  * cross-engine hash (corpus_shuffle's discipline), so the oracle buckets
  * identically. Both distributions are add-one smoothed over the bucket
  * space.
  *
  * Exactness: each bucket's log-ratio is floored to an e6 INTEGER once,
  * model-side (`floor((ln((tc+1)/(tt+B)) - ln((rc+1)/(rt+B))) · 1e6)` —
  * the unigram_logprob parity pattern, exact double operands in fixed
  * order), and a document's score is an INTEGER sum of those — no
  * cross-engine float-accumulation drift by construction.
  *
  * Scale shape: fitting is ONE corpus scan — a single `groupBy(bucket)`
  * with a conditional aggregate builds BOTH distributions (the target
  * here is a slice of the pool, flagged per row; with a separate target
  * corpus it's the same aggregate over a union). The model relation is
  * bucket-count-sized (256 rows at the default; the paper's 10k at
  * production scale — either way broadcast-sized), so scoring is the
  * second corpus scan + one broadcast equi-join + a per-doc partial
  * aggregate: no corpus-sized shuffle beyond the doc_id combine, nothing
  * quadratic, and selection's global top-k is a bounded TakeOrdered.
  */
object Dsir {

  /** Hex-prefix length of the md5 feature hash: 2 → 256 buckets (sized
    * for the gate corpus; production uses 4–5 → 64k–1M). */
  val DefaultBucketChars = 2

  /** doc_id, is_target, feat — word unigrams ∪ bigrams ("w1 w2"; word
    * tokens never contain spaces, so the two feature kinds cannot
    * collide). Row-local explode, no shuffle. */
  private def features(documents: DataFrame, targetFilter: org.apache.spark.sql.Column): DataFrame = {
    val arr = documents.select(col("doc_id"),
      targetFilter.as("is_target"), split(col("text"), " ").as("arr"))
    val uni = arr.select(col("doc_id"), col("is_target"),
      explode(col("arr")).as("feat"))
    val bi = arr.filter(size(col("arr")) >= 2)
      .select(col("doc_id"), col("is_target"), explode(expr(
        "transform(sequence(0, size(arr) - 2), i -> concat(arr[i], ' ', arr[i + 1]))"))
        .as("feat"))
    uni.unionAll(bi)
  }

  /** The bucket-count-sized model relation: (bkt, w_e6) where w_e6 is
    * the e6-integer smoothed log importance ratio of the bucket. */
  private def model(feats: DataFrame, bucketChars: Int): DataFrame = {
    val b = math.pow(16, bucketChars).toLong
    val counts = feats
      .groupBy(substring(md5(col("feat")), 1, bucketChars).as("bkt"))
      .agg(count(lit(1)).as("rc"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("tc"))
    // totals are a 1-row aggregate OF the bucket relation (bounded), and
    // the ratio arithmetic mirrors the oracle operand-for-operand
    val tot = counts.agg(sum(col("rc")).as("rt"), sum(col("tc")).as("tt"))
    counts.crossJoin(broadcast(tot)).select(col("bkt"),
      floor((log((col("tc") + 1L).cast("double") /
               (col("tt") + b).cast("double")) -
             log((col("rc") + 1L).cast("double") /
               (col("rt") + b).cast("double"))) * lit(1000000.0))
        .cast("long").as("w_e6"))
  }

  /** Per-document log importance weight: (doc_id, is_target, n_feats,
    * score_e6). `targetLang` documents define the target distribution;
    * every document (target rows included, flagged) is scored.
    */
  def dsirWeights(documents: DataFrame,
      targetLang: String = "en",
      bucketChars: Int = DefaultBucketChars): DataFrame = {
    require(bucketChars >= 1 && bucketChars <= 8,
      s"bucketChars must be in [1, 8], got $bucketChars")
    val feats = features(documents, col("lang") === targetLang)
    val m = model(feats, bucketChars)
    feats
      .join(broadcast(m),
        substring(md5(col("feat")), 1, bucketChars) === col("bkt"))
      .groupBy(col("doc_id"))
      .agg(first(col("is_target")).as("is_target"),
        count(lit(1)).as("n_feats"),
        sum(col("w_e6")).as("score_e6"))
      .orderBy(col("doc_id"))
  }

  /** The selection product: top-`k` NON-target documents by log
    * importance weight (desc, doc_id tie-break) — the raw-pool subset
    * DSIR adds to the target domain. Global top-k over a scored corpus
    * is a bounded TakeOrdered (map-side partial top-k), never a full
    * sort.
    */
  def dsirSelect(documents: DataFrame, k: Int = 100,
      targetLang: String = "en",
      bucketChars: Int = DefaultBucketChars): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val scored = dsirWeights(documents, targetLang, bucketChars)
      .filter(!col("is_target"))
      .orderBy(col("score_e6").desc, col("doc_id"))
      .limit(k)
    // rank over k rows — bounded window regardless of corpus size
    scored.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_e6").desc, col("doc_id"))).cast("long"))
      .select(col("rk"), col("doc_id"), col("n_feats"), col("score_e6"))
  }
}
