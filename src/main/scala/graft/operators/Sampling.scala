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

  /** Leakage-safe train/val/test split: every member of a near-duplicate
    * cluster lands in the SAME split, so the test set can never hold a
    * near-copy of a training document — the train/test contamination that
    * silently inflates eval numbers when splits are drawn per-document.
    * Each document's split hash is computed on its cluster REPRESENTATIVE
    * (the component's min doc_id, as labeled by
    * [[Dedup.nearDupClusters]]; unclustered documents represent
    * themselves), with the same append-stable md5 bucket rule as
    * [[datasetSplit]] — adding new documents never reassigns old ones.
    *
    * Scale shape: one LEFT equi-join of the corpus against the labels
    * relation (pair-derived, usually orders of magnitude smaller — AQE
    * broadcasts it when it fits), then the same row-local projection as
    * [[datasetSplit]]. No window, no skew surface: a megacluster is one
    * label row per member, and the join key is doc_id (unique), not
    * cluster_id.
    */
  def leakageSafeSplit(documents: DataFrame, clusters: DataFrame): DataFrame =
    documents.select(col("doc_id"))
      .join(clusters.select(col("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .withColumn("rep_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket", bucket100(col("rep_id")))
      .select(col("doc_id"), col("rep_id"), col("bucket"),
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))

  /** EXACT-k per-stratum sample — the "give me exactly 1000 documents
    * per language" request fraction-based [[stratifiedSample]] can't
    * answer (its md5-threshold keeps a proportion, never a count):
    * documents rank within their stratum by md5(salted id) via the
    * window-free [[ExactRank.exactRank]] and the first `k` survive.
    * Deterministic and REPRODUCIBLE but — unlike the fraction samplers —
    * deliberately NOT append-stable: a fixed-size sample cannot be (new
    * docs must displace old ones to hold k); the md5 order makes the
    * displacement unbiased. Strata smaller than k keep everything.
    *
    * Scale shape: one ExactRank pass grouped by stratum (range-
    * partitioned parallelism — a hot stratum never single-tasks the way
    * `row_number() OVER (PARTITION BY lang)` would), then a row-local
    * rank filter.
    */
  def sampleExactK(documents: DataFrame, stratum: String = "lang",
      k: Int = 100): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    val keyed = documents.select(col("doc_id"), col(stratum))
      .withColumn("h",
        md5(concat(lit("exk_"), col("doc_id").cast("string"))))
    ExactRank.exactRank(keyed, Seq(stratum), Seq("h", "doc_id"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col(stratum), col("rnk"), col("n_group"))
      .orderBy(col("doc_id"))
  }

  /** GROUP K-FOLD assignment — [[leakageSafeSplit]]'s discipline for
    * cross-validation: every member of a near-duplicate cluster lands in
    * the SAME fold (fold = md5 bucket of the cluster representative,
    * mod k), so no fold's holdout ever contains a near-copy of another
    * fold's training data — the grouped K-fold sklearn calls GroupKFold,
    * with the group structure coming from dedup instead of a label
    * column. Append-stable like every md5 assignment here.
    *
    * Scale shape: identical to [[leakageSafeSplit]] — one LEFT equi-join
    * of the corpus onto the (much smaller) cluster-label relation, then
    * a row-local projection.
    */
  def groupKFold(documents: DataFrame, clusters: DataFrame,
      k: Int = 5): DataFrame = {
    require(k >= 2, s"k >= 2: $k")
    documents.select(col("doc_id"))
      .join(clusters.select(col("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .withColumn("rep_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("fold", (bucket100(col("rep_id")) % k).cast("int"))
      .select(col("doc_id"), col("rep_id"), col("fold"))
      .orderBy(col("doc_id"))
  }

  /** Size-balanced output sharding: documents sort by byte size
    * descending (doc_id tie-break) and deal round-robin into
    * `numShards` shards — the classic longest-first balancing that
    * bounds shard skew by ONE document's size, vs hash sharding whose
    * skew grows with the size variance. This is how balanced output
    * files are actually produced at corpus scale (equal-bytes shards →
    * equal task times downstream).
    *
    * Scale shape: the global size ordering rides the window-free
    * [[ExactRank.exactRank]] under a constant group (rank parallelism =
    * partition count), and the output is the per-shard aggregate —
    * vocabulary-of-shards sized, not corpus sized.
    */
  def shardRebalance(documents: DataFrame, numShards: Int = 8): DataFrame = {
    require(numShards >= 1, "shardRebalance requires numShards >= 1")
    val sized = documents.select(col("doc_id"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"))
    val ranked = ExactRank.exactRank(
      sized.withColumn("g", lit(0))
        .withColumn("neg_bytes", -col("n_bytes")),
      Seq("g"), Seq("neg_bytes", "doc_id"))
    ranked
      .select(((col("rnk") - 1) % numShards).cast("int").as("shard"),
        col("n_bytes"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("total_bytes"))
      .orderBy(col("shard"))
  }

  /** Token-budget sequence packing — how pretraining batches are actually
    * laid out: per shard, documents are concatenated in doc_id order into
    * one token stream and chunked into fixed `budget`-token sequences; a
    * document is identified by the chunk it STARTS in and its token offset
    * inside that chunk (documents may straddle chunk boundaries, exactly
    * like concat-and-chunk pretraining packing). All arithmetic is a
    * running sum over a per-shard window: one exchange on the shard key,
    * deterministic, no driver state.
    *
    * Parallelism contract: `numShards` IS the parallelism — each shard's
    * window is an independent single-task sort, so per-shard volume must
    * fit a task. The default (8) is sized for the driver's small-SF check;
    * at corpus scale pass numShards ≈ the input's partition count (e.g.
    * `documents.rdd.getNumPartitions`) so shard streams stay task-sized.
    * Raising the shard count is safe because a shard's layout depends ONLY
    * on the documents assigned to it (doc_id % numShards), never on other
    * shards — packing each shard alone reproduces the global result
    * (pinned by a shard-count-invariance test).
    */
  def packSequences(documents: DataFrame, budget: Int = 512,
      numShards: Int = 8): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    require(numShards >= 1, "numShards must be >= 1")
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
    * fully deterministic.
    *
    * A `row_number over Window.partitionBy(stratum)` would pin every row
    * of one stratum into a single task (window partitions get no map-side
    * combining and are NOT AQE-splittable) — with `stratum = lang`,
    * parallelism would be ~#languages forever. Since the selected subset
    * is O(fraction·n) per stratum, the exact rank genuinely needs a
    * per-stratum total order, so this uses the scalable global-rank
    * shape instead ([[ExactRank.rankWithinGroups]]): range-partition on
    * (stratum, doc_id) — which spreads a hot stratum across MANY
    * contiguous partitions — then assign ranks as partition-local counters
    * plus per-(partition, stratum) offsets from a bounded driver pass; the
    * second pass reuses the first's shuffle files, so the relation
    * shuffles once. Stratum totals fall out of the same counts, no extra
    * aggregation.
    *
    * EAGER, unlike most operators here: the offset pass runs a bounded
    * `collect()` at call time and freezes the offsets into a broadcast —
    * the returned DataFrame is a snapshot of the source as of the call.
    * If the source relation's contents change between construction and
    * consumption, rank assignment fails fast (ExactRank's missing-key
    * check) rather than silently diverging.
    */
  def stratifiedSample(documents: DataFrame, stratum: String = "lang",
      fraction: Double = 0.2): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val sorted = documents
      .select(col("doc_id").cast("long"), col(stratum).cast("string"))
      .repartitionByRange(col(stratum), col("doc_id"))
      .sortWithinPartitions(col(stratum), col("doc_id"))
      .as[(Long, String)]
    ExactRank.rankWithinGroups(sorted.rdd, (t: (Long, String)) => t._2)
      .flatMap { case ((id, s), rn, n) =>
        if (rn <= math.ceil(fraction * n).toLong) Iterator.single((id, s, rn, n))
        else Iterator.empty
      }.toDF("doc_id", stratum, "rn", "n_stratum")
      .orderBy(col(stratum), col("rn"))
  }

  /** Per-domain document cap — the curation step that bounds any single
    * domain's (here: `source`'s) contribution to the corpus. Documents
    * rank within their domain by md5 order (a uniform deterministic
    * shuffle, so the kept subset is an unbiased per-domain sample, not
    * "first N by id"), tie-broken by doc_id; ranks above the cap drop.
    * NOT append-stable by design (a cap is relative to the domain's
    * current population — adding documents must be able to displace old
    * ones).
    *
    * Skew shape: a single `Window.partitionBy(domain)` would put ALL of
    * a hot domain's rows in one task (window partitions are not
    * AQE-splittable). Because the cap is a small constant, the rank is
    * computed in two phases: rows first rank inside (domain, salt)
    * sub-groups — [[CapSalts]]-way parallel for a hot domain — and only
    * sub-group survivors (≤ cap · CapSalts rows per domain, a bounded
    * relation) reach the per-domain window. A row below the global cap
    * always survives phase 1 (everything ahead of it globally includes
    * everything ahead of it in its own sub-group), and a row cut by
    * phase 1 has ≥ cap sub-group-mates ahead of it globally, so the
    * survivor ranks equal the global ranks — identical output, no
    * single-task ceiling.
    */
  def domainCap(documents: DataFrame, domain: String = "source",
      maxPerDomain: Int = 10): DataFrame = {
    require(maxPerDomain >= 1, "maxPerDomain must be >= 1")
    val ord = Seq(md5(col("doc_id").cast("string").cast("binary")),
      col("doc_id"))
    documents
      .withColumn("salt", pmod(hash(col("doc_id")), lit(CapSalts)))
      .withColumn("local_rn", row_number().over(
        Window.partitionBy(col(domain), col("salt")).orderBy(ord: _*)))
      .filter(col("local_rn") <= maxPerDomain)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(domain)).orderBy(ord: _*)).cast("long"))
      .filter(col("rn") <= maxPerDomain)
      .select(col("doc_id"), col(domain), col("rn"))
      .orderBy(col("doc_id"))
  }

  /** Sub-group fan-out for [[domainCap]]'s two-phase rank: a hot domain's
    * phase-1 rank runs CapSalts-way parallel and its phase-2 input is at
    * most CapSalts · cap rows.
    */
  val CapSalts = 64

  /** Token-budget mixture sampling — the "take N tokens from each source"
    * step that assembles a pretraining mix: documents shuffle uniformly
    * within their source (md5 order, the [[domainCap]] pick discipline,
    * so the kept slice is an unbiased sample), then each source keeps
    * documents while the cumulative token count BEFORE the document is
    * under `budgetTokens` — the document that crosses the budget line is
    * kept (budgets are floors, not ceilings: every source delivers at
    * least its budget when it has the tokens).
    *
    * Scale shape: the per-source running total is
    * [[ExactRank.exactPrefixSum]] — a `sum() OVER (PARTITION BY source
    * ORDER BY ...)` window would pin a hot source's every document into
    * ONE task (a real mix always has a dominant source); the prefix-sum
    * shape keeps parallelism at the partition count with one bounded
    * offset pass.
    */
  def tokenBudgetMix(documents: DataFrame, budgetTokens: Long = 600,
      source: String = "source"): DataFrame = {
    require(budgetTokens >= 1, "budgetTokens must be >= 1")
    val d = documents.select(col("doc_id"), col(source),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("shuffle_key",
        md5(col("doc_id").cast("string").cast("binary")))
    ExactRank.exactPrefixSum(d, Seq(source), Seq("shuffle_key", "doc_id"),
        "n_tokens", beforeCol = "tokens_before", totalCol = "source_tokens")
      .filter(col("tokens_before") < budgetTokens)
      .select(col("doc_id"), col(source), col("n_tokens"),
        col("tokens_before"))
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

  /** UniMax domain mixing (Chung et al., "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", ICLR 2023): allocate a total token budget across
    * domains in ASCENDING size order with a per-domain epoch cap —
    * each domain receives min(n_tokens · maxEpochs, remaining-budget /
    * remaining-domains). Small domains are upsampled up to the cap
    * (never the unbounded oversampling temperature mixing gives rare
    * strata); what the cap leaves unspent redistributes evenly over the
    * larger domains. Complements [[temperatureMix]] (probabilistic
    * reweighting) and [[tokenBudgetMix]] (per-source prefix cuts): this
    * emits the EPOCH PLAN itself — (domain, n_tokens, alloc_tokens,
    * epochs_e6, bound) — the artifact a data-mixing team reviews.
    *
    * All-integer arithmetic (floor division at every step, BigInt for
    * the e6 scaling) so a DuckDB recursive CTE replays it exactly.
    * The budget is corpus-derived (`budgetPerMille` of total tokens)
    * so the mixed cap/budget regime survives scale-factor changes.
    *
    * Scale shape: ONE partial-aggregable count per domain, then a
    * bounded collect of |domains| rows (a corpus has O(100) sources,
    * never O(rows)) and a driver loop over them — the sequential
    * water-filling recurrence is inherently ordered, |domains|-sized,
    * and the wrong thing to distribute.
    */
  def unimaxMix(documents: DataFrame, budgetPerMille: Int = 1900,
      maxEpochs: Int = 2, source: String = "source"): DataFrame = {
    require(budgetPerMille >= 1, "budgetPerMille must be >= 1")
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    val spark = documents.sparkSession
    import spark.implicits._
    // bounded collect: one row per domain
    val counts = documents
      .select(col(source).as("domain"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy(col("domain")).agg(sum(col("n")).as("n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (dom, t) => (t, dom) } // ascending size, name ties
    val total = counts.map(_._2).sum
    var b = total * budgetPerMille / 1000L
    val d = counts.length
    val rows = counts.zipWithIndex.map { case ((dom, t), i) =>
      val u = b / (d - i)
      val cap = t * maxEpochs.toLong
      val alloc = math.min(cap, u)
      b -= alloc
      (dom, t, alloc, (BigInt(alloc) * 1000000 / t).toLong,
        if (cap <= u) "epoch_cap" else "budget")
    }
    rows.toSeq
      .toDF("domain", "n_tokens", "alloc_tokens", "epochs_e6", "bound")
      .orderBy(col("domain"))
  }

  /** Deterministic global training-order shuffle: every document gets its
    * exact position in the md5-of-doc_id total order — the corpus-wide
    * shuffled epoch order a training run consumes — plus its output
    * shard. A bare `row_number() OVER (ORDER BY md5)` would be a
    * single-task global sort; here the md5 keyspace's own uniformity
    * supplies the parallelism instead: the first `bucketChars` hex chars
    * define 16^bucketChars contiguous key ranges of near-equal volume
    * (uniform by construction — no data-dependent skew is possible),
    * rows rank inside their bucket, and a 16^bucketChars-row prefix-sum
    * relation joined back (broadcast) lifts bucket ranks to exact global
    * positions. Fully lazy — one exchange on the bucket key plus a tiny
    * aggregate; no driver action, no hot key. The third scalable-rank
    * shape in this file, complementing [[domainCap]]'s two-phase cap
    * rank and [[stratifiedSample]]'s range-partitioned rank: when the
    * order key is a uniform hash, bucketing beats both.
    */
  def corpusShuffle(documents: DataFrame, numShards: Int = 8,
      bucketChars: Int = 3): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    require(bucketChars >= 1 && bucketChars <= 8,
      "bucketChars must be in [1, 8]")
    val keyed = documents
      .select(col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("k"))
      .withColumn("bkt", substring(col("k"), 1, bucketChars))
    val counts = keyed.groupBy(col("bkt")).agg(count(lit(1)).as("n"))
    val offsets = counts.select(col("bkt"),
      coalesce(sum(col("n")).over(Window.orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off"))
    keyed
      .withColumn("rn_b", row_number().over(
        Window.partitionBy(col("bkt")).orderBy(col("k"), col("doc_id")))
        .cast("long"))
      .join(broadcast(offsets), "bkt")
      .select(col("doc_id"), (col("off") + col("rn_b")).as("pos"),
        ((col("off") + col("rn_b") - 1) % numShards).cast("int").as("shard"))
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
