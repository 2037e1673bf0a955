package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for the training-data pipeline
  * surface: reproducible train/val/test assignment and stratified
  * sampling without RNG state.
  *
  * Every assignment derives from md5 of a stable row key, so the split is
  * (a) reproducible across runs, engines, and partitionings, (b) stable
  * under appends — a document keeps its split when the corpus grows (the
  * property per-partition RNG sampling like `df.sample` lacks), and
  * (c) computable inside the scan's codegen stage — no shuffle, no
  * driver-side state, embarrassingly parallel at 100 TB.
  */
object Sampling {

  /** Hash bucket in [0, 100) from the md5 of a stable key: first 8 hex
    * chars → 32-bit integer → mod 100. Portable to the DuckDB oracle via
    * the '0x' cast.
    */
  private[graft] def bucket100(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100

  /** Deterministic 90/5/5 train/val/test split plus an 8-way output-shard
    * assignment per document. Pure row-local projection — the plan is a
    * single codegen'd scan+project at any scale.
    */
  def datasetSplit(documents: DataFrame): DataFrame =
    documents
      .withColumn("bucket", bucket100(col("doc_id")))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test").as("split"),
        (col("bucket") % 8).cast("int").as("shard"))
      .orderBy(col("doc_id"))

  /** Token-budget sequence packing — how pretraining batches are actually
    * laid out: per shard, documents are concatenated in doc_id order into
    * one token stream and chunked into fixed `budget`-token sequences; a
    * document is identified by the chunk it STARTS in and its token offset
    * inside that chunk (documents may straddle chunk boundaries, exactly
    * like concat-and-chunk pretraining packing). All arithmetic is a
    * running sum over a per-shard window: one exchange on the shard key,
    * deterministic, no driver state — at 100 TB the shard count is the
    * parallelism knob and each shard's window is an independent sort.
    */
  def packSequences(documents: DataFrame, budget: Int = 512,
      numShards: Int = 8): DataFrame = {
    val nTok = size(split(col("text"), " ")).cast("long")
    val shard = (col("doc_id") % numShards).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(col("doc_id"), nTok.as("n_tokens"), shard.as("shard"))
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("tokens_before") / budget).as("chunk"),
        (col("tokens_before") % budget).as("chunk_offset"))
      .orderBy(col("doc_id"))
  }

  /** Stratified sample: the first ceil(fraction·|stratum|) documents of
    * each stratum in doc_id order. Exact per-stratum allocation (unlike
    * Bernoulli sampling, which only hits the fraction in expectation) and
    * fully deterministic. One exchange on the stratum key; at scale the
    * window sort is per-stratum and AQE splits skewed strata.
    */
  def stratifiedSample(documents: DataFrame, stratum: String = "lang",
      fraction: Double = 0.2): DataFrame = {
    val byStratum = Window.partitionBy(col(stratum))
    documents
      .withColumn("rn", row_number().over(byStratum.orderBy(col("doc_id")))
        .cast("long"))
      .withColumn("n_stratum", count(lit(1)).over(byStratum))
      .filter(col("rn") <= ceil(lit(fraction) * col("n_stratum")))
      .select(col("doc_id"), col(stratum), col("rn"), col("n_stratum"))
      .orderBy(col(stratum), col("rn"))
  }

  /** Per-domain document cap — the curation step that bounds any single
    * domain's (here: `source`'s) contribution to the corpus. Documents
    * rank within their domain by md5 order (a uniform deterministic
    * shuffle, so the kept subset is an unbiased per-domain sample, not
    * "first N by id"), tie-broken by doc_id; ranks above the cap drop.
    * One exchange on the domain key; per-domain window sorts are
    * independent, and AQE splits skewed domains. NOT append-stable by
    * design (a cap is relative to the domain's current population —
    * adding documents must be able to displace old ones).
    */
  def domainCap(documents: DataFrame, domain: String = "source",
      maxPerDomain: Int = 10): DataFrame = {
    require(maxPerDomain >= 1, "maxPerDomain must be >= 1")
    documents
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(domain))
          .orderBy(md5(col("doc_id").cast("string").cast("binary")),
            col("doc_id"))).cast("long"))
      .filter(col("rn") <= maxPerDomain)
      .select(col("doc_id"), col(domain), col("rn"))
      .orderBy(col("doc_id"))
  }

  /** Temperature-based domain mixing at α = 1/2: each stratum keeps
    * documents with probability sqrt(n_c / n_max), flattening the domain
    * distribution toward uniform (the multilingual-pretraining rebalance;
    * the largest stratum keeps everything, a 4×-smaller one keeps ~50%
    * MORE than its proportional share). α is fixed at 1/2 because sqrt is
    * the one power IEEE requires correctly rounded — both engines produce
    * bit-identical thresholds, which `pow()` cannot promise.
    *
    * Plan: one tiny aggregation for stratum counts, a global-max window
    * over that |strata|-row relation, then a broadcast join back onto the
    * corpus with a salted-md5 bucket filter — the corpus-side work is a
    * single codegen'd scan+filter at any scale.
    */
  def temperatureMix(documents: DataFrame, stratum: String = "lang"): DataFrame = {
    val counts = documents.groupBy(col(stratum))
      .agg(count(lit(1)).as("n_stratum"))
      .withColumn("thr", floor(lit(100.0) *
        sqrt(col("n_stratum").cast("double") /
          max(col("n_stratum")).over(Window.partitionBy()).cast("double")))
        .cast("long"))
    documents
      // salt the hash key so inclusion is independent of datasetSplit /
      // weightedSample, which bucket the bare doc_id
      .withColumn("bucket", bucket100(concat(lit("mix_"), col("doc_id").cast("string"))))
      .join(broadcast(counts), stratum)
      .filter(col("bucket") < col("thr"))
      .select(col("doc_id"), col(stratum), col("n_stratum"), col("thr"),
        col("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic weighted sampling — the data-mixing step that keeps a
    * document with probability proportional to a per-row weight (here:
    * length-proportional, capped at 1 — longer documents carry more
    * training signal). A document is kept iff its md5 bucket falls below
    * weight·100, so inclusion is reproducible, append-stable, and
    * engine-portable; all arithmetic (tokens·100/64 is exact in doubles:
    * ×100 is exact for small ints, /64 is a power of two) happens in the
    * scan's codegen stage. Shuffle-free at any scale, like
    * [[datasetSplit]].
    */
  def weightedSample(documents: DataFrame,
      fullWeightTokens: Int = 64): DataFrame = {
    require(fullWeightTokens >= 1, "fullWeightTokens must be >= 1")
    val nTok = size(split(col("text"), " ")).cast("long")
    documents
      .withColumn("n_tokens", nTok)
      .withColumn("bucket", bucket100(col("doc_id")))
      .withColumn("keep_thr", least(lit(100L),
        floor(col("n_tokens") * lit(100.0) / lit(fullWeightTokens.toDouble))
          .cast("long")))
      .filter(col("bucket") < col("keep_thr"))
      .select(col("doc_id"), col("n_tokens"), col("bucket"), col("keep_thr"))
      .orderBy(col("doc_id"))
  }
}
