package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD type 2) merge-apply — the CDC
  * "MERGE INTO history" pattern every warehouse pipeline needs and the
  * reference (a stateless batch job) has no counterpart for.
  *
  * Contract: `current` is an SCD2 table — `key`, the tracked attribute
  * columns, `valid_from`/`valid_to` timestamps and an `is_current` flag;
  * `updates` carries `key`, the same attributes, and a change timestamp.
  * Applying a batch of updates:
  *
  *  - an update whose attributes differ from the key's current row
  *    CLOSES that row (`valid_to` = change ts, `is_current` = false) and
  *    INSERTS the new version (`valid_from` = change ts, open-ended);
  *  - an update identical to the current row is a no-op (idempotent
  *    re-delivery, the common CDC replay case);
  *  - an update for an unseen key inserts its first version;
  *  - historical (non-current) rows pass through untouched;
  *  - a STALE update — change ts at-or-before the current row's
  *    `valid_from` (an out-of-order CDC batch) — is skipped: applying it
  *    would produce an inverted interval and overlapping history.
  *
  * Scale shape: updates dedupe to one row per key via a partial-aggregable
  * `groupBy(key).max(struct(ts, attrs))` (latest-wins, deterministic on
  * ties; a retry-storm hot key collapses map-side — fixture-tested), then
  * ONE full-outer equi-join against the current slice, and the verdict
  * per joined row emits 0–2 output rows ROW-LOCALLY via a conditional
  * array + explode — never a second join or a window. Note the full-outer
  * shape cannot broadcast (Spark plans it sort-merge), so both sides
  * shuffle once — acceptable because both are DIMENSION-sized (current
  * rows + deduped updates), never history-sized: the history pass-through
  * is a filter + union that touches no join. Callers with guaranteed
  * no-new-keys batches can trade the full-outer for a left join plus
  * broadcast, but the general contract keeps unseen-key inserts.
  */
object Scd {

  def scd2Apply(current: DataFrame, updates: DataFrame, key: String,
      attrs: Seq[String], changeTsCol: String = "change_ts"): DataFrame = {
    require(attrs.nonEmpty, "scd2Apply: attrs must be non-empty")

    // latest update per key; attrs ride inside the max struct so ties on
    // the timestamp resolve deterministically by attribute order
    val latest = updates
      .groupBy(col(key))
      .agg(max(struct(col(changeTsCol) +: attrs.map(col): _*)).as("_u"))
      .select(col(key).as("_u_key") +:
        col(s"_u.$changeTsCol").as("_change_ts") +:
        attrs.map(a => col(s"_u.$a").as(s"_u_$a")): _*)
      .withColumn("_has_upd", lit(true))

    val cur = current.filter(col("is_current"))
      .withColumn("_has_cur", lit(true))
    val hist = current.filter(!col("is_current"))

    val joined = cur.join(latest, col(key) === col("_u_key"), "full_outer")
    val same = attrs.map(a => col(a) <=> col(s"_u_$a")).reduce(_ && _)

    def row(attrOf: String => Column, vf: Column, vt: Column,
        ic: Column): Column =
      struct(attrs.map(a => attrOf(a).as(a)) ++
        Seq(vf.as("valid_from"), vt.as("valid_to"), ic.as("is_current")): _*)

    val passThrough =
      row(a => col(a), col("valid_from"), col("valid_to"), col("is_current"))
    val closed =
      row(a => col(a), col("valid_from"), col("_change_ts"), lit(false))
    val fresh = row(a => col(s"_u_$a"), col("_change_ts"),
      lit(null).cast(current.schema("valid_to").dataType), lit(true))

    // out-of-order CDC guard: an update at-or-before the current row's
    // valid_from would close it into a zero-width or INVERTED interval
    // (valid_to < valid_from) and overlap the history — treat it as stale
    // and pass the current row through unchanged. Within one batch the
    // latest-wins dedupe above already ordered same-key updates; this
    // guards the cross-batch ordering the caller can't always guarantee.
    val stale = col("_change_ts") <= col("valid_from")
    val emitted = when(col("_has_cur").isNull, array(fresh))
      .when(col("_has_upd").isNull || same || stale, array(passThrough))
      .otherwise(array(closed, fresh))

    val applied = joined
      .select(coalesce(col(key), col("_u_key")).as(key),
        explode(emitted).as("_r"))
      .select(col(key) +: (attrs ++ Seq("valid_from", "valid_to", "is_current"))
        .map(c => col(s"_r.$c").as(c)): _*)

    applied.unionByName(
      hist.select(col(key) +:
        (attrs ++ Seq("valid_from", "valid_to", "is_current")).map(col): _*))
  }

  /** Snapshot diff — the other half of the CDC story ([[scd2Apply]]
    * consumes a change feed; this PRODUCES one from two table snapshots):
    * one row per changed key, classified insert / delete / update.
    * Changes are detected on a row fingerprint (md5 over the non-key
    * columns in a fixed order, NULL-distinguished) so the comparison is
    * one scalar equality regardless of column count. ONE full-outer
    * equi-join on the key and row-local classification — no window, no
    * second pass; at 100 TB the diff costs exactly the co-partitioned
    * join of the two snapshots, and with both snapshots bucketed on the
    * key (TableSink.writeBucketed) the exchange moves to write time.
    *
    * Fingerprint collisions (md5, 2^-64-ish) would misreport an update
    * as unchanged — the standard CDC trade; callers needing certainty
    * compare columns directly at 16 bytes/row extra width.
    *
    * With `includePayload=true` the feed also carries the NEW-side value
    * columns (NULL for deletes, which have no new image) — exactly the
    * shape [[upsertApply]] consumes, so
    * `upsertApply(old, snapshotDiff(old, new, keys, includePayload=true),
    * keys)` reconstructs `new` — the round-trip identity of the CDC
    * algebra, property-tested and driver-checked (`cdc_upsert`).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], includePayload: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    val valCols = oldSnap.columns.filterNot(keyCols.contains).sorted
    require(valCols.sameElements(
        newSnap.columns.filterNot(keyCols.contains).sorted),
      "snapshots must share their non-key column set")
    // to_json(struct(...)) is an INJECTION-FREE encoding: every value is
    // JSON-escaped under its field name, so no value can alias across
    // adjacent columns the way a separator-joined concat can (with a
    // plain \u0001 join, ("a\u0001b","c") and ("a","b\u0001c")
    // fingerprint identically and an update silently reads as
    // unchanged). NULL fields are omitted by the encoder, which is also
    // unambiguous — the field-name key set itself distinguishes every
    // NULL pattern.
    def fp(df: DataFrame, extra: Seq[Column], as: String) = df.select(
      keyCols.map(col) ++ extra :+
        md5(to_json(struct(valCols.map(col): _*))).as(as): _*)
    val payload = if (includePayload) valCols.toSeq.map(col) else Nil
    val o = fp(oldSnap, Nil, "_fp_old")
    val n = fp(newSnap, payload, "_fp_new")
    o.join(n, keyCols, "full_outer")
      .withColumn("change",
        when(col("_fp_old").isNull, lit("insert"))
          .when(col("_fp_new").isNull, lit("delete"))
          .when(col("_fp_old") =!= col("_fp_new"), lit("update")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) ++ (col("change") +: payload): _*)
  }

  /** Upsert merge-apply (SCD type 1 / `MERGE INTO` without history):
    * apply a change feed of full-row images tagged insert / update /
    * delete to a base snapshot, producing the new snapshot. The
    * current-state twin of [[scd2Apply]] (which keeps history) and the
    * inverse of [[snapshotDiff]] (round-trip identity above).
    *
    * Scale shape — deliberately NOT the full-outer join of the other two:
    * untouched base rows come from a LEFT ANTI join against the feed's
    * KEY projection, and the feed's surviving images are unioned on top.
    * The anti join's right side is keys-only and batch-sized, so at
    * 100 TB the common case (small CDC batch, huge base) plans as a
    * BROADCAST anti join — the base never shuffles at all, where a
    * full-outer formulation forces a two-sided sort-merge of the base.
    *
    * With `seqCol` set, the feed first dedupes latest-wins per key via a
    * partial-aggregable `groupBy(key).max(struct(seq, op, attrs))` (ties
    * on seq resolve deterministically: 'update' > 'insert' > 'delete' by
    * string order, then by attribute values); a retry-storm hot key
    * collapses map-side exactly as in [[scd2Apply]].
    *
    * Caller contract: the feed is consumed TWICE (keys for the anti
    * join, images for the union). A materialized CDC batch re-scans
    * cheaply; a DERIVED feed (e.g. [[snapshotDiff]] output) must be
    * persisted first or its lineage — a snapshot-sized join — executes
    * twice (`cdc_upsert` persists it DISK_ONLY, released by the
    * harness's `clearCache`).
    */
  def upsertApply(base: DataFrame, feed: DataFrame, keyCols: Seq[String],
      opCol: String = "change", seqCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "upsertApply needs at least one key column")
    val attrs = base.columns.filterNot(keyCols.contains).toSeq
    val deduped = seqCol match {
      case Some(s) =>
        feed.groupBy(keyCols.map(col): _*)
          .agg(max(struct((s +: opCol +: attrs).map(col): _*)).as("_f"))
          .select(keyCols.map(col) ++
            (opCol +: attrs).map(c => col(s"_f.$c").as(c)): _*)
      case None => feed
    }
    // Fail fast on an op outside the recognized domain: without this, a
    // NULL or misspelled op row still removes its key via the anti join
    // (touched is op-blind) while the NULL-filtering `=!= "delete"`
    // predicate drops it from the upserts — a malformed feed row would
    // silently act as a delete. raise_error is row-local and codegen'd;
    // a clean feed pays one `in`-set check per row.
    val validated = deduped.withColumn(opCol,
      when(col(opCol).isin("insert", "update", "delete"), col(opCol))
        .otherwise(raise_error(concat(
          lit("upsertApply: unrecognized op value '"),
          coalesce(col(opCol).cast("string"), lit("NULL")),
          lit(s"' in column $opCol — expected insert/update/delete")))))
    val touched = validated.select(keyCols.map(col): _*)
    val untouched = base.join(touched, keyCols, "left_anti")
    val upserts = validated.filter(col(opCol) =!= "delete")
      .select((keyCols ++ attrs).map(col): _*)
    untouched.unionByName(upserts)
  }
}
