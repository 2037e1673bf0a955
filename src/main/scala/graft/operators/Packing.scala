package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence packing — the step between a curated corpus and a
  * training loader: documents are laid end-to-end on ONE global token
  * stream in doc_id order ("concat and chunk", the GPT-style packing in
  * which document boundaries may fall inside a sequence), and the stream
  * is cut into fixed-length sequences of `seqLen` tokens. The output is
  * the (sequence, document) assignment relation a loader consumes: for
  * every sequence a document overlaps, one row with the doc-LOCAL token
  * span `[tok_begin, tok_end)` that lands in that sequence.
  *
  * Scale shape: the ONLY global coordination packing needs is each
  * document's starting OFFSET on the token stream — an exact prefix sum
  * in doc_id order. A `sum() OVER (ORDER BY doc_id)` window would pull
  * the entire corpus through ONE task (the global-order window has a
  * single partition); [[ExactRank.exactPrefixSum]] instead
  * range-partitions by doc_id, sums per partition, and ships only the
  * ~numPartitions partial totals through the driver — parallelism stays
  * at the partition count on a 100 TB corpus. Everything downstream of
  * the offset is row-local arithmetic plus a bounded explode (a document
  * emits `ceil(len/seqLen)+1` rows at most — output is O(corpus tokens /
  * seqLen + documents), never quadratic).
  *
  * Token accounting uses the engine's subword proxy (the
  * `[a-z]+|[0-9]+|[^a-z0-9 ]` class, tokenCounts' convention) so the
  * oracle replays lengths exactly; a real deployment swaps in
  * pipeline_tokenizer's BPE counts — the packing math is tokenizer-
  * agnostic. Empty documents (zero tokens) occupy no stream positions
  * and emit no rows.
  */
object Packing {

  /** One row per (seq_id, doc_id) overlap: `tok_begin`/`tok_end` are the
    * doc-local half-open token span assigned to that sequence. Every
    * sequence holds exactly `seqLen` tokens except the last.
    */
  def packSequences(documents: DataFrame, seqLen: Int = 512): DataFrame =
    packFromLengths(lens(documents), seqLen)

  /** [[packSequences]] over ANY per-document length relation
    * `(doc_id, len)` — the packing math is tokenizer-agnostic, and this
    * is the seam that proves it: the default path feeds the subword
    * regex proxy, `pack_bpe` feeds the LEARNED BPE token budgets from
    * [[TextAnalysis.bpeTrainedEncode]], and a production deployment
    * feeds whatever its tokenizer counts. Zero-length documents occupy
    * no stream positions.
    */
  def packFromLengths(lengths: DataFrame, seqLen: Int = 512): DataFrame = {
    require(seqLen >= 1, s"packFromLengths requires seqLen >= 1, got $seqLen")
    // one logical group (the stream is global); parallel via the range
    // partitioning on doc_id inside exactPrefixSum
    val offs = ExactRank.exactPrefixSum(
      lengths.select(col("doc_id").cast("long").as("doc_id"),
          col("len").cast("long").as("len"))
        .withColumn("g", lit(0)), Seq("g"), Seq("doc_id"), "len",
      beforeCol = "off", totalCol = "stream_total", maxGroups = 1)
    val s = seqLen.toLong
    offs.filter(col("len") > 0)
      .select(col("doc_id"), col("len"), col("off"),
        explode(sequence(expr(s"off div $s"),
          expr(s"(off + len - 1) div $s"))).as("seq_id"))
      .select(col("seq_id"), col("doc_id"),
        greatest(lit(0L), col("seq_id") * s - col("off")).as("tok_begin"),
        least(col("len"), (col("seq_id") + 1L) * s - col("off"))
          .as("tok_end"))
      .orderBy(col("seq_id"), col("doc_id"))
  }

  /** GROUPED packing: [[packFromLengths]] with one independent token
    * stream PER GROUP, each laid in a caller-chosen order — the
    * curriculum layout (`pack_curriculum`: group = difficulty tier,
    * order = the tier's shuffled position) and, in production, any
    * per-domain / per-epoch stream. Input is `(grp, ord, doc_id, len)`;
    * emits `(grp, seq_id, doc_id, tok_begin, tok_end)` with seq_id
    * numbered within its group's stream. Same window-free machinery:
    * ONE exactPrefixSum pass grouped on `grp` (bounded group count —
    * the ExactRank contract), then row-local span arithmetic + a
    * bounded explode. Zero-length documents occupy no positions.
    */
  def packGrouped(lengths: DataFrame, seqLen: Int = 512,
      maxGroups: Int = 64): DataFrame = {
    require(seqLen >= 1, s"packGrouped requires seqLen >= 1, got $seqLen")
    val offs = ExactRank.exactPrefixSum(
      lengths.select(col("grp"), col("ord").cast("long").as("ord"),
        col("doc_id").cast("long").as("doc_id"),
        col("len").cast("long").as("len")),
      Seq("grp"), Seq("ord", "doc_id"), "len",
      beforeCol = "off", totalCol = "grp_total", maxGroups = maxGroups)
    val s = seqLen.toLong
    offs.filter(col("len") > 0)
      .select(col("grp"), col("doc_id"), col("len"), col("off"),
        explode(sequence(expr(s"off div $s"),
          expr(s"(off + len - 1) div $s"))).as("seq_id"))
      .select(col("grp"), col("seq_id"), col("doc_id"),
        greatest(lit(0L), col("seq_id") * s - col("off")).as("tok_begin"),
        least(col("len"), (col("seq_id") + 1L) * s - col("off"))
          .as("tok_end"))
      .orderBy(col("grp"), col("seq_id"), col("doc_id"))
  }

  /** Continuous-ingestion packing — the dedup_incremental discipline
    * applied to sequence assembly: a `delta` batch packs onto the END of
    * an already-packed `base` corpus's token stream, continuing mid-
    * sequence (the base's final partial sequence is topped up by the
    * first delta tokens — append never wastes pad). Only the delta is
    * prefix-summed; the base contributes ONE number (its total token
    * count, a broadcast 1-row aggregate), so per-batch cost is
    * O(|delta|) regardless of base size — the base corpus is never
    * re-scanned beyond that single partial-aggregable sum. Emits the
    * delta's (seq_id, doc_id, span) rows on the SAME global sequence
    * numbering as [[packSequences]] over base-then-delta would produce.
    */
  def packIncremental(base: DataFrame, delta: DataFrame,
      seqLen: Int = 512): DataFrame = {
    require(seqLen >= 1, s"packIncremental requires seqLen >= 1, got $seqLen")
    packOnto(delta, lens(base)
      .agg(coalesce(sum(col("len")), lit(0L)).as("base_off")), seqLen)
  }

  /** The subword-proxy token length of each document (tokenCounts'
    * regex class, shared with every packing oracle — the ONE definition
    * every packing entry point uses, so the incremental and one-shot
    * paths can never disagree on lengths). A null `text` contributes
    * ZERO stream positions: without the coalesce, `size(...)` returns
    * null/-1 (conf-dependent) where the oracle's `sum` simply SKIPS the
    * null row — either divergence would shift every later document's
    * offset. */
  private def lens(df: DataFrame) = df.select(
    col("doc_id").cast("long").as("doc_id"),
    greatest(coalesce(size(regexp_extract_all(col("text"),
      lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long"),
      lit(0L)), lit(0L)).as("len"))

  /** One-row total token count of a corpus slice (`n_tokens`) — the
    * per-batch state row the streaming composition appends. */
  def totalTokens(df: DataFrame): DataFrame =
    lens(df).agg(coalesce(sum(col("len")), lit(0L)).as("n_tokens"))

  /** The per-batch core of incremental packing: pack `delta` starting at
    * the stream offset given by the 1-row `baseTotal` relation
    * (`base_off`) — for [[packIncremental]] that is the base corpus's
    * token total; for the streaming composition it is base total + all
    * PRIOR batches' totals (a #batches-sized state relation, never a
    * base rescan). Only the delta is prefix-summed.
    */
  def packOnto(delta: DataFrame, baseTotal: DataFrame,
      seqLen: Int = 512): DataFrame = {
    require(seqLen >= 1, s"packOnto requires seqLen >= 1, got $seqLen")
    val offs = ExactRank.exactPrefixSum(
      lens(delta).withColumn("g", lit(0)), Seq("g"), Seq("doc_id"), "len",
      beforeCol = "d_off", totalCol = "d_total", maxGroups = 1)
    val s = seqLen.toLong
    offs.crossJoin(broadcast(baseTotal))
      .filter(col("len") > 0)
      .select(col("doc_id"), col("len"),
        (col("d_off") + col("base_off")).as("off"))
      .select(col("doc_id"), col("len"), col("off"),
        explode(sequence(expr(s"off div $s"),
          expr(s"(off + len - 1) div $s"))).as("seq_id"))
      .select(col("seq_id"), col("doc_id"),
        greatest(lit(0L), col("seq_id") * s - col("off")).as("tok_begin"),
        least(col("len"), (col("seq_id") + 1L) * s - col("off"))
          .as("tok_end"))
      .orderBy(col("seq_id"), col("doc_id"))
  }

  /** Per-sequence packing summary — the invariant view: every sequence
    * carries exactly `seqLen` tokens (except the last partial one),
    * `n_docs` documents overlap it, and `n_carried` of those began in an
    * earlier sequence (their span crosses this sequence's left cut — the
    * rows a loader's attention-mask builder treats as continuations).
    * The relation a packing-efficiency dashboard reads.
    */
  def packSummary(documents: DataFrame, seqLen: Int = 512): DataFrame =
    packSequences(documents, seqLen)
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_end") - col("tok_begin")).as("n_tokens"),
        sum(when(col("tok_begin") > 0, 1L).otherwise(0L)).as("n_carried"))
      .orderBy(col("seq_id"))
}
