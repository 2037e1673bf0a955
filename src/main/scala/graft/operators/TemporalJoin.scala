package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for — both built by
  * composition (the preferred path: no custom plan node needed because
  * existing operators express the semantics at full scale).
  *
  * [[asOf]]: backward as-of join (each left row picks the latest right row
  * at-or-before its timestamp per key) via the union-tag + running
  * last_value formulation — ONE shuffle on the key, linear work, no range
  * explosion; checked against DuckDB's native ASOF JOIN in the driver gate.
  *
  * [[proximityPairs]]: time-range self-join (pairs within a gap) via
  * bucketized equi-join — each row joins only its own and the adjacent
  * time bucket, so the plan is an equi-shuffle join with bounded fan-out
  * instead of the O(n²)-per-key theta join a naive `a.us <= b.us <=
  * a.us + gap` condition would plan.
  */
object TemporalJoin {

  /** Backward as-of join on (`key`, `tsCol`): every left row gains an
    * `_asof` struct holding `payload` from the latest right row with
    * right.ts <= left.ts and the same key (null when no such row — LEFT
    * semantics). Right rows at exactly the left timestamp DO match
    * (`_src` tie-break sorts right before left at equal time).
    *
    * Deterministic by construction: duplicate right rows at the same
    * (key, ts) are reduced to the one with the LARGEST payload struct
    * (field-by-field struct ordering, first payload column decides) before
    * the as-of window, so the picked peer never depends on partial order.
    * Payload columns must be orderable (no map type) — true of every
    * registered caller.
    *
    * Plan shape: right dedupe window on (key, ts) → unionByName (no
    * shuffle) → one exchange on `key` → a single running-frame window.
    * Scales linearly in total rows.
    *
    * Skew contract: a hot key shares the fate of any per-key window — ONE
    * task owns that key's running frame (window partitions get no map-side
    * combining and are not AQE-splittable), so per-key volume is the
    * parallelism floor. Correctness under a 50%-hot key is pinned by a
    * fixture. If one key's volume outgrows a task at your scale, use
    * [[asOfBucketized]] — identical semantics (equivalence-tested), with
    * per-(key, time-bucket) parallelism instead of per-key. Callers that
    * don't know their key distribution should use [[asOfAuto]], which
    * measures it and picks for them.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      payload: Seq[String]): DataFrame = {
    val extras = left.columns.filterNot(c => c == key || c == tsCol).toSeq
    val payStruct = struct(payload.map(col): _*)
    val rNorm = right.select(
      Seq(col(key), col(tsCol)) ++
        extras.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payStruct.as("_pay"): _*)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key), col(tsCol)).orderBy(col("_pay").desc)))
      .filter(col("_rn") === 1).drop("_rn")
      .withColumn("_src", lit(0))
    val lNorm = left.select(Seq(col(key), col(tsCol)) ++ extras.map(col): _*)
      .withColumn("_pay", lit(null).cast(rNorm.schema("_pay").dataType))
      .withColumn("_src", lit(1))
    val w = Window.partitionBy(col(key))
      .orderBy(unix_micros(col(tsCol)), col("_src"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lNorm.unionByName(rNorm)
      .withColumn("_asof", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_src") === 1)
      .drop("_pay", "_src")
  }

  /** The RECOMMENDED as-of entry point — scale-safe by default. Picks
    * [[asOf]] or [[asOfBucketized]] by measuring the hottest key's combined
    * row volume with one partial-aggregable planning pass
    * (`groupBy(key).count` → `max` — the probe itself is skew-proof: a hot
    * key collapses map-side before the exchange). If the hottest key
    * exceeds `maxKeyRowsPerTask` rows, [[asOf]]'s per-key running frame
    * would pin that key to a single task, so the bucketized form is
    * chosen; otherwise the plain form (one fewer shuffle, no carry join)
    * wins. Both branches are semantically identical (equivalence-tested in
    * TemporalJoinSpec), so the choice affects only the physical plan.
    *
    * The probe is an eager action by design — statistics before planning,
    * the same posture as AQE's runtime re-plan. Callers that already know
    * their key cardinality can call the specific variant directly and skip
    * the probe; at 100 TB the probe is one shuffle-light pass over the two
    * key columns (pruned scan), amortized against a join that reads every
    * column.
    *
    * Default `maxKeyRowsPerTask` = 4M rows: a per-key window task holding
    * ~4M narrow rows (~a few hundred MB unserialized) is near the upper
    * bound of comfortable single-task memory at typical executor sizing.
    */
  def asOfAuto(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      payload: Seq[String], bucketSec: Long = 3600,
      maxKeyRowsPerTask: Long = 4L << 20): DataFrame =
    if (bucketizedWins(left, right, key, maxKeyRowsPerTask))
      asOfBucketized(left, right, key, tsCol, payload, bucketSec)
    else asOf(left, right, key, tsCol, payload)

  /** The [[asOfAuto]] decision, separated for direct testing: true when
    * the hottest key's combined (left + right) row volume exceeds the
    * per-task budget. Empty inputs choose the plain form. */
  private[graft] def bucketizedWins(left: DataFrame, right: DataFrame,
      key: String, maxKeyRowsPerTask: Long): Boolean = {
    val mx = left.select(col(key)).unionByName(right.select(col(key)))
      .groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx")).head()
    !mx.isNullAt(0) && mx.getLong(0) > maxKeyRowsPerTask
  }

  /** Backward as-of join with per-(key, time-bucket) parallelism — the
    * hot-key-safe variant of [[asOf]] (identical semantics, equivalence-
    * tested, including the right-side (key, ts) max-payload dedupe and the
    * inclusive at-tie match). Use when one key's row volume outgrows a
    * single task: [[asOf]]'s per-key running frame puts ALL of a hot key's
    * rows in one task, while here the frame is split at `bucketSec`-wide
    * time-bucket boundaries, so a hot key runs (its time span / bucketSec)-
    * way parallel.
    *
    * Shape: (1) each (key, bucket) of the deduped right side reduces to
    * its last event via a partial-aggregable `max(struct(us, payload))`;
    * (2) a per-key running `last` over those BUCKET SUMMARIES (a relation
    * of one row per occupied bucket — orders of magnitude smaller than the
    * data, so this window's per-key volume is bounded by the time span,
    * never by row count) yields each bucket's carry-in: the latest right
    * payload from any strictly-earlier bucket; (3) the [[asOf]] union-tag
    * running-frame window runs per (key, bucket) to resolve same-bucket
    * matches; (4) rows with no same-bucket match take the carry-in via an
    * equi-join on (key, bucket). A right row in an earlier bucket always
    * precedes a left row in a later one (floor is monotone), so in-bucket
    * resolution + carry-in is exhaustive and exact.
    *
    * `bucketSec` is the skew knob: smaller buckets → more parallelism for
    * a hot key, more bucket-summary rows. Volume concentrated inside one
    * bucket still pins a task — size buckets below the hot key's burst
    * width, exactly like [[proximityPairs]]' gap buckets.
    */
  def asOfBucketized(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, payload: Seq[String], bucketSec: Long = 3600): DataFrame = {
    require(bucketSec > 0, s"asOfBucketized requires bucketSec > 0, got $bucketSec")
    val bucketMicros = bucketSec * 1000000L
    val extras = left.columns.filterNot(c => c == key || c == tsCol).toSeq
    val payStruct = struct(payload.map(col): _*)
    // right dedupe at (key, ts): max payload wins — same as asOf, so the
    // two variants are drop-in interchangeable
    val rNorm = right.select(
      Seq(col(key), col(tsCol)) ++
        extras.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payStruct.as("_pay"): _*)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key), col(tsCol)).orderBy(col("_pay").desc)))
      .filter(col("_rn") === 1).drop("_rn")
      .withColumn("_src", lit(0))
      .withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("_bkt", floor(col("_us") / bucketMicros))
    val lNorm = left.select(Seq(col(key), col(tsCol)) ++ extras.map(col): _*)
      .withColumn("_pay", lit(null).cast(rNorm.schema("_pay").dataType))
      .withColumn("_src", lit(1))
      .withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("_bkt", floor(col("_us") / bucketMicros))
    // (1) per-(key, bucket) last right event — partial-aggregable, so a
    // hot bucket collapses map-side before the exchange
    val bucketLast = rNorm.groupBy(col(key), col("_bkt"))
      .agg(max(struct(col("_us"), col("_pay"))).as("_bl"))
    // (2) carry-in per bucket: latest right payload from strictly-earlier
    // buckets, over the bounded summary relation (left-needed buckets
    // included so gaps carry forward)
    val needed = lNorm.select(col(key), col("_bkt")).distinct()
    val wCarry = Window.partitionBy(col(key)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = needed.join(bucketLast, Seq(key, "_bkt"), "full_outer")
      .withColumn("_carry", last(col("_bl"), ignoreNulls = true).over(wCarry))
      .select(col(key), col("_bkt"), col("_carry._pay").as("_carry_pay"))
    // (3) same-bucket running frame — asOf's window, split at bucket edges
    val wBkt = Window.partitionBy(col(key), col("_bkt"))
      .orderBy(col("_us"), col("_src"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lNorm.unionByName(rNorm)
      .withColumn("_inb", last(col("_pay"), ignoreNulls = true).over(wBkt))
      .filter(col("_src") === 1)
      // (4) carry join: every left (key, bucket) is present in `carry`
      .join(carry, Seq(key, "_bkt"))
      .withColumn("_asof", coalesce(col("_inb"), col("_carry_pay")))
      .drop("_pay", "_src", "_us", "_bkt", "_inb", "_carry_pay")
  }

  /** Two-sided interval join — the BATCH twin of the stream-stream
    * interval join (streaming.StreamingOps.joinStreams): every left row
    * pairs with the right rows on the same key whose timestamp lies in
    * [left.ts, left.ts + gapSec]. Heterogeneous sides (unlike
    * [[proximityPairs]]' self-join), same bucketization: the left side
    * explodes into its own and the next gap-width bucket, the right side
    * keeps its own, so the plan is a plain equi-join on (key, bucket)
    * with the exact time predicate applied after — bounded fan-out, no
    * per-key cartesian. Emits left ++ right columns plus `delta_us`
    * (right.ts − left.ts in microseconds); both inputs must already have
    * disjoint column names apart from `key`.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, gapSec: Long): DataFrame = {
    // gapSec = 0 would make the bucket divisor 0: floor(x/0) is NULL, the
    // equi-join keys go NULL, and the join silently returns empty instead
    // of "same instant" — reject rather than mis-answer
    require(gapSec > 0, s"intervalJoin requires gapSec > 0, got $gapSec")
    val gapMicros = gapSec * 1000000L
    val l = left.withColumn("_lus", unix_micros(col(leftTs)))
      .withColumn("_b", floor(col("_lus") / gapMicros))
      .withColumn("_jb", explode(array(col("_b"), col("_b") + 1)))
      .drop("_b")
    val r = right.withColumn("_rus", unix_micros(col(rightTs)))
      .withColumn("_jb", floor(col("_rus") / gapMicros))
    l.join(r, Seq(key, "_jb"))
      .filter(col("_rus") >= col("_lus") &&
        col("_rus") - col("_lus") <= gapMicros)
      .withColumn("delta_us", col("_rus") - col("_lus"))
      .drop("_jb", "_lus", "_rus")
  }

  /** Self-pairs of events on the same key within `gapSec` seconds:
    * (a, b) with a.us <= b.us <= a.us + gap, canonically ordered
    * (time, then event_id at ties) so each pair appears exactly once.
    *
    * The left side explodes into its own and the NEXT time bucket
    * (bucket width = gap, so a qualifying partner is always in one of the
    * two); the join is then a plain equi-join on (key, bucket) with the
    * exact time predicate applied after. 2x row replication buys an
    * equi-shuffle plan — at 100 TB that is the difference between a
    * shuffle join and a per-key cartesian.
    */
  def proximityPairs(events: DataFrame, gapSec: Long = 300): DataFrame = {
    val gapMicros = gapSec * 1000000L
    val e = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("bucket", floor(col("us") / gapMicros))
    val probe = e
      .withColumn("jb", explode(array(col("bucket"), col("bucket") + 1)))
      .select(col("user_id"), col("event_id").as("event_a"),
        col("us").as("us_a"), col("event_type").as("type_a"), col("jb"))
    val build = e.select(col("user_id"), col("event_id").as("event_b"),
      col("us").as("us_b"), col("event_type").as("type_b"),
      col("bucket").as("jb"))
    probe.join(build, Seq("user_id", "jb"))
      .filter(col("us_b") >= col("us_a") &&
        col("us_b") - col("us_a") <= gapMicros &&
        (col("us_a") < col("us_b") ||
          (col("us_a") === col("us_b") && col("event_a") < col("event_b"))) &&
        col("event_a") =!= col("event_b"))
      .select(col("user_id"), col("event_a"), col("type_a"),
        col("event_b"), col("type_b"),
        (col("us_b") - col("us_a")).as("delta_us"))
      .orderBy(col("user_id"), col("event_a"), col("event_b"))
  }
}
