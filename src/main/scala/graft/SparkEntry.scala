package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.BasketSource
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Every implemented operator from SURVEY.md §2 (plus the §7 phase-2
  * extension surface) registers here as a named query over the driver
  * testdata, with a DuckDB oracle twin in [[oracleSql]] where the operator
  * is SQL-expressible. Column names are aliased identically on both sides
  * (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry extends SparkEntryOracleMain {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline computation: P(neighbor | product) over
    * purchase sequences (SURVEY.md §0).
    */
  def entry(spark: SparkSession): DataFrame =
    crystalballPairs(spark, "/root/testdata/sf0.001")

  // ---- helpers ----------------------------------------------------------

  /** Timestamp-encoding normalization (nanos-as-long / NTZ / UTC µs —
    * the driver's generator has shipped all three) lives in
    * [[graft.sources.Tables.normalizeTimestamps]]; every table funnels
    * through it via [[t]].
    */
  private def eventsTable(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")

  /** Flagship: pair-shaped crystal ball over lineitem-derived baskets. */
  private def crystalballPairs(spark: SparkSession, dir: String): DataFrame =
    CrystalBall.pairProbabilities(BasketSource.basketsFromLineitem(spark, dir))

  /** Stage input for a bounded file-source stream, run the body, DELETE
    * the staging copy. The body returns only after `awaitTermination()`
    * with its result materialized in the memory sink (driver memory), so
    * the staged files are dead weight the moment it returns — and
    * without the cleanup every invocation (Bench times each streaming
    * query 2-3×) leaks a corpus-sized copy into the system temp dir.
    */
  private def withStreamStage(prefix: String)(body: String => DataFrame): DataFrame = {
    val stage = java.nio.file.Files.createTempDirectory(prefix)
    try body(stage.toString)
    finally {
      import scala.jdk.CollectionConverters._
      // Files.walk holds open directory handles until closed — leak one
      // per streaming invocation otherwise (Bench runs each query 2-3x)
      val walk = java.nio.file.Files.walk(stage)
      try walk.iterator().asScala.toSeq
        .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  /** Per-invocation staging for queries whose RESULT still reads the
    * staged files lazily (orc_roundtrip / schema_evolution) — unlike
    * [[withStreamStage]], the returned plan scans the directory after
    * this returns, so it cannot be deleted here. A unique directory per
    * invocation is the isolation fix: a fixed tmpdir path lets a
    * concurrent run's read interleave with this run's partial write, and
    * a killed run's stale generation dirs would satisfy glob reads
    * (mergeSchema) forever after. A shutdown hook reclaims the space at
    * JVM exit (Verify/Bench are single-JVM mains, so nothing outlives
    * the process).
    */
  private def freshStageDir(prefix: String): String = {
    val stage = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(stage)
      try walk.iterator().asScala.toSeq
        .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }))
    stage.toString
  }

  // ---- driver surface ---------------------------------------------------

  /** Registry guard: a Scala `Map` literal silently keeps only the LAST
    * binding for a duplicated key — the shadowing bug class that twice
    * dropped an oracle-checked query off the verified surface
    * (pack_sequences in r12, then phrase_search r12→r13). Both registries
    * are therefore built from `Seq`s of pairs and duplicates fail fast at
    * class-init (so `sbt test` and the driver both refuse to run) instead
    * of shipping a silently-shrunk surface.
    */
  private[graft] def distinctKeys[V](which: String,
      entries: Seq[(String, V)]): Map[String, V] = {
    val dups = entries.groupBy(_._1).collect {
      case (k, vs) if vs.size > 1 => k
    }.toSeq.sorted
    require(dups.isEmpty,
      s"duplicate $which registrations (later bindings would silently " +
        s"shadow earlier ones): ${dups.mkString(", ")}")
    entries.toMap
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = queriesMap

  private lazy val queriesMap: Map[String, (SparkSession, String) => DataFrame] =
    distinctKeys("queries", queryEntries)

  private lazy val queryEntries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // O1–O3: basket source (lineitem-derived, FIXTURES.md §2). The engine
    // API keeps `products` as array<string>; the driver-facing projection
    // serializes it (space-joined, matching the reference's own text
    // format) because the driver's pandas compare cannot hash array cells.
    "baskets" -> ((s, dir) =>
      BasketSource.fromLineitem(s, dir)
        .select(col("customer"), array_join(col("products"), " ").as("products"))
        .orderBy(col("customer"))),
    // O4/O5 + O7/O12: repeat-terminated co-occurrence window + counts
    "cooccur_counts" -> ((s, dir) =>
      CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
        .orderBy(col("product"), col("neighbor"))),
    // O4 with the quadratic-basket guard ENGAGED (maxWindow=5): the 100 TB
    // pathological-basket cap, driver-checked against an oracle that
    // expresses the cap as a position-delta predicate. On 7-item lineitem
    // baskets the cap truncates real windows, so this result genuinely
    // differs from the uncapped twin.
    "cooccur_counts_capped" -> ((s, dir) =>
      CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir), maxWindow = 5)
        .orderBy(col("product"), col("neighbor"))),
    // O4 via pure Catalyst composition (posexplode + window + range join):
    // same relation as cooccur_counts, proving SQL-expressibility.
    "cooccur_counts_sql" -> ((s, dir) =>
      CoOccurrence.pairsSql(BasketSource.fromLineitem(s, dir))
        .groupBy(col("product"), col("neighbor")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("product"), col("neighbor"))),
    // O4 as a registered Catalyst Generator (UDTF) — SQL-first surface
    "cooccur_counts_gen" -> ((s, dir) => {
      graft.functions.CoOccurFunctions.register(s)
      BasketSource.fromLineitem(s, dir)
        .selectExpr("co_occur_pairs(products)")
        .groupBy(col("product"), col("neighbor")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("product"), col("neighbor"))
    }),
    // O4 as a WHOLE-OPERATOR Catalyst extension — custom LogicalPlan +
    // SparkStrategy + SparkPlan (graft.plans.CoOccurWindow), the (c)
    // rung of the custom-operator ladder: the window scan runs over
    // InternalRow ArrayData in place (no encoder round trip) and emits
    // through one reused UnsafeProjection. Same oracle text as
    // cooccur_counts — all four O4 forms answer to one hash gate.
    "cooccur_counts_plan" -> ((s, dir) =>
      graft.plans.CoOccurWindow.pairs(
          BasketSource.fromLineitem(s, dir).select(col("products")))
        .groupBy(col("product"), col("neighbor")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("product"), col("neighbor"))),
    // O4/O7 under incremental view maintenance: the corpus splits into an
    // "existing" and a "delta" partition (deterministic crc32 hash of the
    // basket key), each aggregates independently, and the merged partial
    // counts must equal the full recompute — the additivity contract a
    // 100 TB pipeline relies on to ingest new data WITHOUT re-reading the
    // corpus. The oracle is the full-recompute formulation, so the driver
    // hash gate proves merge == recompute end-to-end. Window semantics
    // are per-basket (row-local), so any basket-disjoint split is exact.
    "cooccur_incremental" -> ((s, dir) => {
      val b = BasketSource.basketsFromLineitem(s, dir)
      val existing = b.filter(crc32(col("customer").cast("binary")) % 2 === 0)
      val delta = b.filter(crc32(col("customer").cast("binary")) % 2 === 1)
      CoOccurrence.counts(existing).unionByName(CoOccurrence.counts(delta))
        .groupBy(col("product"), col("neighbor"))
        .agg(sum(col("cnt")).as("cnt"))
        .orderBy(col("product"), col("neighbor"))
    }),
    // cooccur_incremental's production shape: the existing partition's
    // partial counts are WRITTEN as a bucketed catalog table (bucketed on
    // product — the serve key; its one shuffle happens at write time, the
    // ann_ivf_persisted discipline) and the merge plan reads the partials
    // back from the catalog + scans ONLY the delta — lineitem appears in
    // the plan exactly once (PlanSpec pin). A later session resumes from
    // the table alone; merge(persisted, delta) == full recompute is the
    // driver's hash gate (same oracle text as cooccur_counts).
    "cooccur_persisted" -> ((s, dir) => {
      val b = BasketSource.basketsFromLineitem(s, dir)
      val existing = b.filter(crc32(col("customer").cast("binary")) % 2 === 0)
      val delta = b.filter(crc32(col("customer").cast("binary")) % 2 === 1)
      val tbl = "graft_cooccur_partials"
      graft.sources.TableSink.writeBucketed(
        CoOccurrence.counts(existing), tbl, "product", 8)
      CoOccurrence.mergeCounts(s.table(tbl), CoOccurrence.counts(delta))
        .orderBy(col("product"), col("neighbor"))
    }),
    // the APPEND half of the build-once discipline: generation 0's
    // partials are written as the bucketed base, generation 1's partials
    // are INSERTed into the same table under the same bucket spec (no
    // base rebuild, no table-wide shuffle — TableSink.appendBucketed),
    // and the merge reads base+appended from the catalog plus ONLY the
    // generation-2 delta. merge == full recompute is the driver's hash
    // gate (same oracle text); PlanSpec pins the single corpus scan and
    // the cross-session resume
    "cooccur_appended" -> ((s, dir) => {
      val b = BasketSource.basketsFromLineitem(s, dir)
      val gen = crc32(col("customer").cast("binary")) % 3
      val tbl = "graft_cooccur_appended"
      graft.sources.TableSink.writeBucketed(
        CoOccurrence.counts(b.filter(gen === 0)), tbl, "product", 8)
      graft.sources.TableSink.appendBucketed(
        CoOccurrence.counts(b.filter(gen === 1)), tbl, "product", 8)
      CoOccurrence.mergeCounts(s.table(tbl),
          CoOccurrence.counts(b.filter(gen === 2)))
        .orderBy(col("product"), col("neighbor"))
    }),
    // the flagship THROUGH THE STREAMING ENGINE, driver-checked: basket
    // lines are staged to a temp dir, read back as a bounded file-source
    // text STREAM run to completion (availableNow trigger), window-
    // flatMapped and counted by Structured Streaming in complete mode
    // into a memory sink, and the materialized sink table is returned.
    // Same oracle text as cooccur_counts — batch/stream parity, finally
    // visible to the driver's hash gate (StreamingSpec holds the
    // watermark/exactly-once guarantees the gate can't see). The memory
    // sink bounds this ARTIFACT to driver memory; production would swap
    // in the parquet foreachBatch sink (StreamingOps
    // .writePartitionedStream) — the dataflow upstream is identical.
    "cooccur_stream" -> ((s, dir) => withStreamStage("graft_cooccur_stream") { stage =>
      BasketSource.fromLineitem(s, dir)
        .select(concat_ws(" ", col("customer"),
          array_join(col("products"), " ")).as("value"))
        .write.mode("overwrite").text(stage)
      val counts = graft.streaming.StreamingOps.coOccurrenceCounts(s, stage)
      val sink = "cooccur_stream_sink"
      s.catalog.dropTempView(sink)
      val q = counts.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink).orderBy(col("product"), col("neighbor"))
    }),
    // event-time WINDOWED AGGREGATION through the streaming engine,
    // driver-checked: normalized events staged to a temp dir, read back as
    // a bounded parquet file-source stream (availableNow), watermarked +
    // 1-hour-tumbling aggregated in complete mode into a memory sink.
    // Epoch-aligned tumbling windows make window.start ==
    // date_trunc('hour', ts), so the batch hourly_counts oracle applies
    // verbatim — windowing parity visible to the hash gate (StreamingSpec
    // holds the late-drop/append-closure guarantees the gate can't see).
    "hourly_counts_stream" -> ((s, dir) => withStreamStage("graft_hourly_stream") { stage =>
      eventsTable(s, dir).write.mode("overwrite").parquet(stage)
      val counts = graft.streaming.StreamingOps.hourlyCounts(
        graft.streaming.StreamingOps.eventsStreamNormalized(s, stage))
      val sink = "hourly_counts_stream_sink"
      s.catalog.dropTempView(sink)
      val q = counts.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink).orderBy(col("hour"), col("event_type"))
    }),
    // SESSION WINDOWS through the streaming engine, driver-checked: the
    // engine's native session_window merges per-user gap sessions
    // incrementally across micro-batches (stateful session coalescing —
    // the semantics StreamingSpec can poke at batch-boundary level, here
    // made visible to the driver's hash gate). Same oracle text as the
    // batch session_window_agg twin.
    "session_window_stream" -> ((s, dir) => withStreamStage("graft_session_stream") { stage =>
      eventsTable(s, dir).write.mode("overwrite").parquet(stage)
      val sessions = graft.streaming.StreamingOps.sessionWindows(
        graft.streaming.StreamingOps.eventsStreamNormalized(s, stage))
      val sink = "session_window_stream_sink"
      s.catalog.dropTempView(sink)
      val q = sessions.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink).orderBy(col("user_id"), col("session_start"))
    }),

    // STATEFUL CUSTOM AGGREGATION through the streaming engine,
    // driver-checked: per-user exact-integer EWMA state folded across
    // micro-batches via mapGroupsWithState — the custom-state extension
    // point carrying Events.ewmaValue's integer recurrence, so the
    // bounded replay reproduces the batch result EXACTLY and shares its
    // oracle text. Update-mode emissions re-emit a user's running state
    // per batch; the final state per user is the max-n_events row
    // (n strictly grows), a deterministic pick at any batch split.
    "ewma_stream" -> ((s, dir) => withStreamStage("graft_ewma_stream") { stage =>
      // coalesce(1): the state fold is order-sensitive, and a multi-file
      // range-partitioned stage has no pinned mtime order — one staged
      // file makes the cross-batch replay order contract hold under ANY
      // trigger config, not just single-batch AvailableNow.
      eventsTable(s, dir).orderBy(col("ts"), col("event_id"))
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val ew = graft.streaming.StreamingOps.ewmaStream(
        graft.streaming.StreamingOps.eventsStreamNormalized(s, stage))
      val sink = "ewma_stream_sink"
      s.catalog.dropTempView(sink)
      val q = ew.toDF().writeStream.format("memory").queryName(sink)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink).groupBy(col("user_id"))
        .agg(max_by(struct(col("n_events"), col("ewma_cents")),
          col("n_events")).as("st"))
        .select(col("user_id"), col("st.n_events").as("n_events"),
          col("st.ewma_cents").as("ewma_cents"))
        .orderBy(col("user_id"))
    }),

    // STREAMING DRIFT MONITOR, driver-checked: the EIGHTH streaming
    // query — per-user CUSUM state via mapGroupsWithState against an
    // offline-derived reference (train-in-batch / monitor-in-stream,
    // the production deploy shape). Shares cusum_alerts' oracle text:
    // the bounded replay must reproduce the batch fold exactly.
    "cusum_stream" -> ((s, dir) => withStreamStage("graft_cusum_stream") { stage =>
      val ev = eventsTable(s, dir)
      // the offline baseline: same k derivation as the batch twin
      val k = ev.agg(
        floor(sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
          .cast("double") / count(lit(1))).cast("long"))
        .collect()(0).getLong(0)
      // coalesce(1): order-sensitive state fold — the ewma_stream
      // staging contract (pinned replay order under any trigger)
      ev.orderBy(col("ts"), col("event_id"))
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val cu = graft.streaming.StreamingOps.cusumStream(
        graft.streaming.StreamingOps.eventsStreamNormalized(s, stage), k)
      val sink = "cusum_stream_sink"
      s.catalog.dropTempView(sink)
      val q = cu.toDF().writeStream.format("memory").queryName(sink)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink).groupBy(col("user_id"))
        .agg(max_by(struct(col("n_events"), col("max_cusum_cents"),
          col("n_alarms")), col("n_events")).as("st"))
        .select(col("user_id"), col("st.n_events").as("n_events"),
          col("st.max_cusum_cents").as("max_cusum_cents"),
          col("st.n_alarms").as("n_alarms"))
        .orderBy(col("user_id"))
    }),

    // EXACTLY-ONCE INTO A PERSISTED TABLE SINK, driver-checked across a
    // forced stop/restart: half the events stage, a checkpointed
    // foreachBatch stream (maxFilesPerTrigger=2 → several micro-batches,
    // each landing as an idempotent batch_id partition) drains and STOPS;
    // the other half stages and the SAME checkpoint resumes — committed
    // offsets are never re-read, so any duplicate or lost row breaks the
    // batch hourly_counts oracle this query shares. The production
    // stream->table ingest shape, hash-gated end to end.
    "events_table_stream" -> ((s, dir) => withStreamStage("graft_evt_table") { stage =>
      val in = stage + "/in"; val sink = stage + "/sink"
      val ckpt = stage + "/ckpt"
      val ev = eventsTable(s, dir)
      def run(): Unit = {
        val q = graft.streaming.StreamingOps.writeTableStream(
          graft.streaming.StreamingOps.eventsStreamNormalized(s, in,
            maxFilesPerTrigger = 2), sink, ckpt)
        q.awaitTermination()
      }
      ev.filter(col("event_id") % 2 === 0).repartition(4)
        .write.mode("overwrite").parquet(in)
      run() // phase 1: drains the staged half, then a clean stop
      ev.filter(col("event_id") % 2 === 1).repartition(4)
        .write.mode("append").parquet(in)
      run() // phase 2: restart from the checkpoint — new files only
      // materialize before withStreamStage deletes the sink files: the
      // aggregate is calendar × type sized (the hourly_counts shape).
      // A `.cache()` here would pin one NEW entry per invocation (the
      // temp stage path is baked into the plan) — the r12 soak's growth
      // class — so the result lands in a stable OVERWRITTEN warehouse
      // table instead: survives the stage teardown, zero persists.
      graft.sources.TableSink.saveTable(
        Events.hourlyCounts(s.read.parquet(sink).drop("batch_id")),
        "graft_evt_table_result")
      s.table("graft_evt_table_result")
        .orderBy(col("hour"), col("event_type"))
    }),
    // STATEFUL STREAMING DEDUP driver-checked: document content
    // fingerprints stream through dropDuplicates state — the exactly-once
    // admission guard of a continuous corpus ingest. The output is the
    // distinct-fingerprint SET, deterministic regardless of micro-batch
    // arrival order, emitted append-mode (dedup is not an aggregation, so
    // rows emit as they are first admitted). Bounded-state production
    // variant (dropDuplicatesWithinWatermark) is eviction/readmission-
    // tested in StreamingSpec.
    "dedup_stream" -> ((s, dir) => withStreamStage("graft_dedup_stream") { stage =>
      t(s, dir, "documents").select(md5(col("text")).as("fp"))
        .write.mode("overwrite").parquet(stage)
      val fpSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("fp",
          org.apache.spark.sql.types.StringType)))
      val distinctFp = graft.streaming.StreamingOps.dedupStream(
        s.readStream.schema(fpSchema).parquet(stage), Seq("fp"))
      val sink = "dedup_stream_sink"
      s.catalog.dropTempView(sink)
      val q = distinctFp.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink).orderBy(col("fp"))
    }),
    // the BOUNDED-STATE twin (dropDuplicatesWithinWatermark): per-key
    // state is dropped once event time passes it — O(keys-per-window)
    // state instead of unbounded. The replay carries every duplicate
    // inside one watermark window, so the admitted set equals the
    // unbounded form's and the oracle text is shared; the state-TTL
    // distinction across windows is StreamingSpec's job.
    "dedup_stream_bounded" -> ((s, dir) => withStreamStage("graft_dedup_bnd") { stage =>
      val ev = eventsTable(s, dir)
        .select(md5(col("event_type").cast("string")).as("fp"), col("ts"))
      // the shared batch-DISTINCT oracle holds iff every duplicate key
      // falls inside ONE watermark window — previously assumed of the
      // fixture (30 days > its span), now enforced by construction: the
      // delay is DERIVED from the staged data's actual event-time span
      // (+1 h of slack), so a grown fixture widens the window with it
      // instead of silently breaking the equivalence. One bounded 1-row
      // aggregate; the cross-window TTL semantics stay StreamingSpec's job.
      val spanRow = ev.agg((unix_timestamp(max(col("ts"))) -
        unix_timestamp(min(col("ts")))).as("span")).head
      val span = if (spanRow.isNullAt(0)) 0L else spanRow.getLong(0)
      ev.write.mode("overwrite").parquet(stage)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("fp",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType)))
      val admitted = graft.streaming.StreamingOps.dedupStreamBounded(
        s.readStream.schema(schema).parquet(stage), Seq("fp"),
        delay = s"${span + 3600} seconds")
      val sink = "dedup_stream_bounded_sink"
      s.catalog.dropTempView(sink)
      val q = admitted.select(col("fp")).writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink).orderBy(col("fp"))
    }),
    // O6/O9/O13: flagship relative-frequency normalization (Pairs shape)
    "crystalball_pairs" -> ((s, dir) => crystalballPairs(s, dir)),
    // explicit skew mitigation, driver-checked: results must equal the
    // unsalted formulations bit-for-bit (the salt is an execution detail)
    "salted_agg" -> ((s, dir) =>
      Skew.saltedCounts(t(s, dir, "lineitem"), Seq("l_returnflag"))
        .orderBy(col("l_returnflag"))),
    "skew_join" -> ((s, dir) =>
      Skew.saltedJoin(t(s, dir, "lineitem"), t(s, dir, "part"),
          "l_partkey", "p_partkey")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_brand"))),
    // O13 via the skew-safe totals-join normalization (the hot-product
    // path): same result as the window formulation, benched side-by-side
    "crystalball_totals" -> ((s, dir) =>
      CrystalBall.normalizeViaTotalsJoin(
          CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir)))
        .select(col("product"), col("neighbor"), col("cnt"), col("prob"))
        .orderBy(col("product"), col("neighbor"))),
    // O8/O14: stripe shape. The stripe aggregation (sorted struct array)
    // stays in the plan; the driver projection posexplodes it back to
    // scalar rows — `pos` pins the within-stripe sort and `n_neighbors`
    // the stripe size, so the array semantics are still fully checked
    // without array-typed output columns (driver compare limitation).
    "crystalball_stripes" -> ((s, dir) =>
      CrystalBall.stripeProbabilities(
          BasketSource.basketsFromLineitem(s, dir))
        .select(col("product"), size(col("stripe")).cast("long").as("n_neighbors"),
          posexplode(col("stripe")))
        .select(col("product"), col("n_neighbors"),
          col("pos").cast("long").as("pos"),
          col("col.neighbor").as("neighbor"), col("col.prob").as("prob"))
        .orderBy(col("product"), col("pos"))),
    // O8 in its engine-native MapType presentation: per-product stripe as
    // a map, driver-checked through scalar projections (map lookup via
    // element_at — null when the neighbor is absent — plus map_keys size)
    "stripe_lookup" -> ((s, dir) =>
      CrystalBall.stripeMap(BasketSource.basketsFromLineitem(s, dir))
        .select(col("product"),
          size(map_keys(col("stripe"))).cast("long").as("n_neighbors"),
          element_at(col("stripe"), "34").as("p34"))
        .orderBy(col("product"))),
    // product centrality over the co-occurrence graph itself: fixed-point
    // integer PageRank (exact BIGINT arithmetic — the oracle unrolls the
    // same iterations and hash-matches, which float ranks never could)
    "page_rank" -> ((s, dir) =>
      Graph.pageRank(
        CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
          .select(col("product").as("src"), col("neighbor").as("dst")))),
    // the CONVERGENCE-TERMINATED fixpoint pageRank's guard rail defers
    // to (r14): same exact integer recurrence, run until NO rank_e9
    // changes — an exact fixpoint exists on the finite integer lattice
    // (post-convergence rounds are no-ops, so the oracle replays the
    // open-ended loop as a fixed 80-round unroll). Over the SIGNIFICANT
    // graph like the other converged ops — measured convergence is
    // structure-dependent, not size-dependent: the sparse sf0.01 graph
    // needs 55 rounds, the denser sf0.1 graph 5, and the UNFILTERED
    // graph costs 53 s at sf0.1 for the same fixpoint semantics
    // (BENCH_NOTES). A coarser e6 lattice is NOT the cheap way out: it
    // oscillates in a limit cycle at sf0.1 (measured) — exactness is
    // what makes "run until no change" well-defined here.
    // materialized to a FIXED catalog table (the streaming queries'
    // convention): pageRankConverged's deep-fixpoint lineage truncation
    // makes its direct return single-consumption (see its scaladoc's
    // consumption contract) — the saveTable write is that one
    // consumption, and the returned table scan is durable,
    // re-consumable, and recompute-free. Also the honest economics: a
    // 55-round fixpoint is an artifact you store, not a view.
    "pagerank_converged" -> ((s, dir) => {
      graft.sources.TableSink.saveTable(
        Graph.pageRankConverged(
          CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
            .filter(col("cnt") >= 2)
            .select(col("product").as("src"), col("neighbor").as("dst")),
          maxRounds = 80),
        "graft_pagerank_converged")
      s.table("graft_pagerank_converged").orderBy(col("node"))
    }),
    // exact triangle counts over the SIGNIFICANT co-occurrence edges
    // (cnt >= 2 — noise pruning is standard before cohesion analysis on a
    // co-occurrence graph; the once-seen pairs at cnt=1 are mostly basket
    // coincidence). Degree-ordered orientation bounds the wedge quadratic
    // at O(sqrt(m)) per vertex, hub products included — the full-graph
    // path is exercised against brute force in PipelineSpec.
    "triangle_count" -> ((s, dir) =>
      Graph.triangleCounts(
        CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
          .filter(col("cnt") >= 2)
          .select(col("product").as("src"), col("neighbor").as("dst")))
        .orderBy(col("node"))),
    // bounded multi-source BFS over the same significant-edge graph:
    // seeds are the round-hundred products, 3 hops, minimal hop labels
    "khop_reach" -> ((s, dir) => {
      val edges = CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
        .filter(col("cnt") >= 2)
        .select(col("product").as("src"), col("neighbor").as("dst"))
      val seeds = edges.filter(col("src").cast("long") % 100 === 0)
        .select(col("src").as("node"))
      Graph.kHopReach(edges, seeds, k = 3)
    }),
    // PERSONALIZED PageRank (r14 — Haveliwala's topic-sensitive walk):
    // page_rank's exact integer recurrence with the teleport term
    // restricted to the khop seed set, ranking every product by graph
    // proximity to the seeds — the link-graph analogue of DSIR's
    // importance weights for relevance-targeted selection. Seed
    // membership is annotated once on the node relation; each round adds
    // one row-local CASE to the fixed-point update, so the oracle
    // unrolls bit-exactly like page_rank's.
    "ppr_seeded" -> ((s, dir) => {
      // edge relation MATERIALIZED to a catalog table first (r14 verdict
      // item 5, the pagerank_converged economics): the operator traverses
      // its edges five times (degree agg/join, two node-union arms,
      // seeds) and a DISK_ONLY persist of the co-occurrence chain
      // measured SLOWER at both decade notches (BENCH_NOTES r14) — but a
      // one-shot parquet write turns every later traversal into a
      // compact columnar scan instead of either a chain recompute or a
      // row-format disk cache read. Same relation, same oracle.
      graft.sources.TableSink.saveTable(
        CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
          .filter(col("cnt") >= 2)
          .select(col("product").as("src"), col("neighbor").as("dst")),
        "graft_ppr_edges")
      val edges = s.table("graft_ppr_edges")
      val seeds = edges.filter(col("src").cast("long") % 100 === 0)
        .select(col("src").as("node"))
      Graph.personalizedPageRank(edges, seeds)
    }),
    // HyperANF (r14 — Boldi–Vigna approximate neighborhood function):
    // per-node HLL ball sketches grown one radius per round by
    // max-merging successor registers — ball sizes at the scale where
    // reach_converged's exact closure is quadratic. All-integer
    // register math (md5 bucket/rho, Σ2^(48−M) harmonic denominator,
    // DECIMAL(38,0) estimate floor), so the oracle replays every row.
    "hyperanf" -> ((s, dir) =>
      Graph.hyperAnf(
        CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
          .filter(col("cnt") >= 2)
          .select(col("product").as("src"), col("neighbor").as("dst")))),
    // the neighborhood function + effective-diameter flag over those
    // sketches (Boldi–Vigna's headline statistic, exact-integer 90%
    // cross-multiplication — one tiny broadcast join, window-free)
    "anf_function" -> ((s, dir) =>
      Graph.anfFunction(
        CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
          .filter(col("cnt") >= 2)
          .select(col("product").as("src"), col("neighbor").as("dst")))),
    // the PRODUCTION register count (r14 verdict item 4): 256 registers
    // cut the standard error 4× (1.04/√256 ≈ ±6.5% vs ±26% at 16) — the
    // width a 100 TB diameter instrument actually runs at. Same integer
    // idiom (s_scaled tops at 2^56, BIGINT-safe), same per-round
    // economics (register rows per node scale 16×, the merge join and
    // max-agg shapes are unchanged); GraphSpec pins the clique-accuracy
    // tightening vs the 16-register miniature.
    "hyperanf_256" -> ((s, dir) =>
      Graph.hyperAnf(
        CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
          .filter(col("cnt") >= 2)
          .select(col("product").as("src"), col("neighbor").as("dst")),
        registers = 256)),
    "anf_function_256" -> ((s, dir) =>
      Graph.anfFunction(
        CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
          .filter(col("cnt") >= 2)
          .select(col("product").as("src"), col("neighbor").as("dst")),
        registers = 256)),
    // approximate harmonic centrality off the same sketches (Boldi–
    // Vigna's application): Σ_r Δball/r per node — quadratic all-pairs
    // distances read off a linear sketch pass; the lag window runs
    // over constant 4-row per-node partitions, the safe window shape
    "harmonic_centrality" -> ((s, dir) =>
      Graph.harmonicCentrality(
        CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
          .filter(col("cnt") >= 2)
          .select(col("product").as("src"), col("neighbor").as("dst")))),
    // DETERMINISTIC random walks (r14 — DeepWalk/node2vec corpus prep):
    // two 4-step walks per khop seed over the significant co-occurrence
    // graph, each step a seeded hash-ARGMIN over the current node's
    // neighbors — min(struct(md5, dst)) is partial-aggregable, so hub
    // fan-out never single-tasks the step (the LPA argmax discipline);
    // the oracle replays the walk verbatim.
    "random_walks" -> ((s, dir) => {
      val edges = CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
        .filter(col("cnt") >= 2)
        .select(col("product").as("src"), col("neighbor").as("dst"))
      val seeds = edges.filter(col("src").cast("long") % 100 === 0)
        .select(col("src").as("node"))
      Graph.randomWalks(edges, seeds)
    }),
    // the BIASED second-order walk (r14 — Grover–Leskovec node2vec at
    // p=4, q=2): next hop weighted by its relation to the PREVIOUS node
    // (return 1 / common 4 / outward 2), the weights realized EXACTLY
    // as min-over-w-hash-draws (P(win) = w/Σw for the min of iid
    // uniforms) — faithful weighted sampling that stays a pure function
    // of the edge set. One candidates join + one adjacency-flag join +
    // a ≤4-way row-local explode per step.
    "node2vec_walks" -> ((s, dir) => {
      val edges = CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
        .filter(col("cnt") >= 2)
        .select(col("product").as("src"), col("neighbor").as("dst"))
      val seeds = edges.filter(col("src").cast("long") % 100 === 0)
        .select(col("src").as("node"))
      Graph.node2vecWalks(edges, seeds)
    }),
    // skip-gram windowing over those walk sequences (the word2vec step
    // of DeepWalk): (center, context, cnt) pairs within ±2 walk
    // positions — the bounded per-walk self-join, output linear in the
    // walk corpus. The relation a graph-embedding trainer consumes.
    "walk_skipgram" -> ((s, dir) => {
      val edges = CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
        .filter(col("cnt") >= 2)
        .select(col("product").as("src"), col("neighbor").as("dst"))
      val seeds = edges.filter(col("src").cast("long") % 100 === 0)
        .select(col("src").as("node"))
      Graph.walkSkipgramPairs(Graph.randomWalks(edges, seeds))
    }),
    // word2vec negatives for those skip-gram pairs: freq^(3/4) tempered
    // context distribution (sqrt-composed — IEEE-exact), md5 uniforms
    // inverted through the exact CDF ladder as a bucketized EQUI-join
    "skipgram_negatives" -> ((s, dir) => {
      val edges = CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
        .filter(col("cnt") >= 2)
        .select(col("product").as("src"), col("neighbor").as("dst"))
      val seeds = edges.filter(col("src").cast("long") % 100 === 0)
        .select(col("src").as("node"))
      Graph.skipgramNegatives(
        Graph.walkSkipgramPairs(Graph.randomWalks(edges, seeds)))
    }),
    // COST-BASED OPTIMIZATION as a first-class surface (r14 — the
    // "statistics" line of SURVEY §2.1): catalog tables ANALYZEd with
    // column stats, CBO + join-reorder enabled, a 3-way star join whose
    // logical order the optimizer re-derives from cardinalities instead
    // of FROM order. The conf flags are scoped to THIS plan: the
    // executedPlan materializes inside the try (logical optimization —
    // where CBO reorder runs — is cached on the QueryExecution), so the
    // finally-restore cannot leak CBO into neighboring queries' plans.
    // Result is plan-independent; the driver hashes it like any query.
    "cbo_reorder" -> ((s, dir) => {
      for (n <- Seq("customer", "orders", "lineitem")) {
        graft.sources.TableSink.saveTable(t(s, dir, n), s"graft_cbo_$n")
        s.sql(s"ANALYZE TABLE graft_cbo_$n COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      val prev = Seq("spark.sql.cbo.enabled",
        "spark.sql.cbo.joinReorder.enabled").map(k => k -> s.conf.get(k))
      prev.foreach { case (k, _) => s.conf.set(k, "true") }
      try {
        val df = s.sql(
          """SELECT c_nationkey,
            |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
            |  count(*) AS n_items
            |FROM graft_cbo_lineitem
            |JOIN graft_cbo_orders ON l_orderkey = o_orderkey
            |JOIN graft_cbo_customer ON o_custkey = c_custkey
            |WHERE c_mktsegment = 'BUILDING'
            |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
        df.queryExecution.executedPlan // pin the CBO-optimized plan now
        df
      } finally prev.foreach { case (k, v) => s.conf.set(k, v) }
    }),
    // Spark 4's RECURSIVE CTE front end as a first-class surface (r14):
    // a per-order integer decay schedule — bal_{n+1} = bal_n − (bal_n·3
    // div 100), 24 steps. The per-step floor makes it NON-LINEAR (no
    // closed form, no window rewrite): this is the computation class
    // recursion genuinely buys. Scale shape: acyclic, out-degree 1,
    // depth fixed at 24 — each recursion level is one linear scan of
    // the previous level, so total work is 24·|orders|, never the
    // path-enumeration blowup the kHopReach scaladoc warns recursive
    // UNION ALL invites on cyclic graphs (Spark 4.1 supports only
    // UNION ALL recursion, so graph closures stay on the anti-join BFS
    // operators; THIS shape is what the SQL front end is for).
    "sql_recursive_decay" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("graft_orders_rec")
      // the inner LIMIT is Spark's per-reference recursion allowance
      // (lifts the 1M-row spark.sql.cteRecursionRowLimit guardrail
      // without a session-conf leak — caught by the x10 audit at 3.75M
      // rows); it never truncates: 25·|orders/10| stays far under it
      // through the x100 notch, and past that the engine should fail
      // loudly rather than silently truncate a schedule
      s.sql("""WITH RECURSIVE sched(o_orderkey, m, bal) AS (
        |  SELECT o_orderkey, 0, CAST(floor(o_totalprice * 100) AS BIGINT)
        |  FROM graft_orders_rec WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, m + 1, bal - (bal * 3 div 100)
        |  FROM sched WHERE m < 24
        |)
        |SELECT o_orderkey, max(bal) AS start_cents, min(bal) AS final_cents
        |FROM (SELECT * FROM sched LIMIT 100000000)
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)
    }),
    // the CONVERGENCE-TERMINATED closure of the same BFS (r14, the
    // lpa_converged discipline for reachability): run until the
    // frontier empties — exact min-hop labels with no horizon, levels
    // truncated through persisted row RDDs; oracle replays it as a
    // recursion bounded at the shared 60-round cap (engine throws
    // beyond it rather than serving a truncated closure)
    "reach_converged" -> ((s, dir) => {
      val edges = CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
        .filter(col("cnt") >= 2)
        .select(col("product").as("src"), col("neighbor").as("dst"))
      val seeds = edges.filter(col("src").cast("long") % 100 === 0)
        .select(col("src").as("node"))
      Graph.reachConverged(edges, seeds)
    }),
    // deterministic synchronous label propagation over the same
    // significant-edge graph: product communities in 3 rounds, every
    // round a hash-aggregate argmax (min(struct(-cnt, lbl))) — the
    // oracle unrolls the identical rounds with a QUALIFY argmax
    "communities_lpa" -> ((s, dir) =>
      Graph.labelPropagation(
        CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
          .filter(col("cnt") >= 2)
          .select(col("product").as("src"), col("neighbor").as("dst")),
        iterations = 3)),
    // the CONVERGENCE-TERMINATED fixpoint over the same graph (r13
    // verdict item 4): monotone update, stop when no label changes,
    // per-round lineage truncation — oracle replays it as a fixed
    // unroll (post-convergence rounds are no-ops under monotonicity)
    "lpa_converged" -> ((s, dir) =>
      Graph.lpaConverged(
        CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
          .filter(col("cnt") >= 2)
          .select(col("product").as("src"), col("neighbor").as("dst")))),
    // Newman modularity of those converged communities (r14 — the
    // measure-don't-guess row for community detection, the lsh_recall
    // discipline): per community the EXACT integer numerator
    // 4·m·e_in − d_tot² (Q = Σ/4m²) — a labeling change shows up as
    // value drift, not vibes. Oracle shares lpa_converged's label CTEs.
    "modularity_lpa" -> ((s, dir) => {
      // converged labels MATERIALIZED to a catalog table first (r14
      // verdict item 6): modularity joins the labeling THREE times
      // (both edge endpoints + community sizes), and feeding it the
      // lpaConverged frame directly replays the full fixpoint per
      // consumer — the most expensive audit row in the r14 fleet
      // (149.9 s at x100). A converged labeling is an artifact you
      // store (the pagerank_converged economics): fixpoint once, three
      // parquet scans. Same labels, same oracle.
      val edges = CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
        .filter(col("cnt") >= 2)
        .select(col("product").as("src"), col("neighbor").as("dst"))
      graft.sources.TableSink.saveTable(
        Graph.lpaConverged(edges), "graft_lpa_labels")
      Graph.modularity(edges, s.table("graft_lpa_labels"))
    }),
    // LINK PREDICTION (r15 — Liben-Nowell/Kleinberg for the co-purchase
    // graph): non-edges scored by capped common-neighbor structure —
    // count, Jaccard, and the integer-exact resource-allocation index
    // (Σ 1e6 div deg(w), the published Adamic–Adar alternative that
    // needs no ln). Wedge apexes capped map-side (MaxBandBucket
    // discipline), existing edges anti-joined out.
    "link_predict" -> ((s, dir) =>
      Graph.linkPredict(
        CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
          .filter(col("cnt") >= 2)
          .select(col("product").as("src"), col("neighbor").as("dst")))),
    // K-CORE decomposition (r14): peel nodes with in-survivor degree < 2
    // to the unique maximal 2-core (the cycle-containing skeleton) — the
    // densification filter before community/centrality passes. k = 2 is
    // the significant-edge graph's interesting core (its 3-core is EMPTY
    // at the verify scale; k=2 cascades 1632 → 837 nodes over 8 rounds).
    // Convergence-terminated (exact per-round counts ARE the test:
    // survivors only shrink); oracle replays it as a fixed unroll,
    // post-convergence rounds are no-ops
    "kcore_decompose" -> ((s, dir) =>
      Graph.kcoreDecompose(
        CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
          .filter(col("cnt") >= 2)
          .select(col("product").as("src"), col("neighbor").as("dst")),
        k = 2)),
    // ---- relational breadth (SURVEY.md §2.1 — absent from the reference) --
    "q1_pricing" -> ((s, dir) => Relational.pricingSummary(t(s, dir, "lineitem"))),
    "q3_topk" -> ((s, dir) => Relational.revenueTopK(
      t(s, dir, "customer"), t(s, dir, "orders"), t(s, dir, "lineitem"))),
    "join_bcast_region" -> ((s, dir) => Relational.customersPerRegion(
      t(s, dir, "customer"), t(s, dir, "nation"), t(s, dir, "region"))),
    "semi_join" -> ((s, dir) => Relational.customersWithOrders(
      t(s, dir, "customer"), t(s, dir, "orders"))),
    "anti_join" -> ((s, dir) => Relational.customersWithoutOrders(
      t(s, dir, "customer"), t(s, dir, "orders"))),
    "rollup_agg" -> ((s, dir) => Relational.rollupSummary(t(s, dir, "lineitem"))),
    "cube_agg" -> ((s, dir) => Relational.cubeSummary(t(s, dir, "orders"))),
    "distinct_agg" -> ((s, dir) => Relational.distinctCounts(t(s, dir, "lineitem"))),
    "set_ops" -> ((s, dir) => Relational.setOps(
      t(s, dir, "customer"), t(s, dir, "orders"))),
    "topk_orders" -> ((s, dir) => Relational.topOrders(t(s, dir, "orders"))),
    "outer_join_agg" -> ((s, dir) => Relational.customerOrderStats(
      t(s, dir, "customer"), t(s, dir, "orders"))),
    "full_outer_presence" -> ((s, dir) => Relational.orderPresence(t(s, dir, "orders"))),
    "above_avg_orders" -> ((s, dir) => Relational.aboveAvgOrders(t(s, dir, "orders"))),
    "pivot_status" -> ((s, dir) => Relational.priorityPivot(t(s, dir, "orders"))),
    "unpivot_status" -> ((s, dir) => Relational.priorityUnpivot(t(s, dir, "orders"))),
    "array_funcs" -> ((s, dir) =>
      Relational.arrayFunctions(BasketSource.fromLineitem(s, dir))),
    // correlated scalar subqueries through the SQL front end — Catalyst
    // decorrelates both into aggregate+join (no per-row re-execution);
    // sum·count comparison in exact decimals avoids cross-engine avg()
    // double drift
    "above_nation_avg" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql("""
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer c
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
              (SELECT count(*) FROM customer c2
               WHERE c2.c_nationkey = c.c_nationkey)
            > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer c2
               WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey""")
    }),
    // correlated LATERAL subquery (SQL:2016 lateral derived table) with
    // per-row ORDER BY + LIMIT — the "top-N per group" SQL surface;
    // Catalyst decorrelates it into a ranked window join
    "lateral_topk" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")
    }),
    "date_funcs" -> ((s, dir) => Relational.dateFunctions(t(s, dir, "orders"))),
    "scalar_funcs" -> ((s, dir) => Relational.scalarFunctions(t(s, dir, "part"))),
    // regexp family: replace-all (DuckDB needs the 'g' flag to match
    // Spark's replace-all default), group-0 extract ('' on no match on
    // both engines), boolean match, digit-count via negated-class strip
    "regex_funcs" -> ((s, dir) =>
      t(s, dir, "part").select(
          col("p_partkey"),
          regexp_replace(col("p_brand"), "[0-9]+", "#").as("brand_masked"),
          regexp_extract(col("p_brand"), "[0-9]+", 0).as("brand_num"),
          col("p_name").rlike("[0-9]").as("name_has_digits"),
          length(regexp_replace(col("p_brand"), "[^0-9]", "")).cast("long")
            .as("n_digit_chars"),
          split(col("p_type"), " ").getItem(0).as("type_head"))
        .orderBy(col("p_partkey"))),
    "set_ops_all" -> ((s, dir) => Relational.setOpsAll(t(s, dir, "orders"))),
    "grouping_sets" -> ((s, dir) => Relational.groupingSets(t(s, dir, "lineitem"))),
    "exact_median" -> ((s, dir) => Relational.exactMedian(t(s, dir, "lineitem"))),
    "exact_quantiles" -> ((s, dir) => Relational.exactQuantiles(t(s, dir, "lineitem"))),
    // mergeable fixed-width CDF sketch + integer-interpolated percentile
    // estimates, with the EXACT rank-t values joined alongside so the
    // sketch error is a hash-gated VALUE (r15 — the lsh_recall measured-
    // quality discipline for quantiles; approx_stats keeps the
    // structural-boolean form for the built-in KLL/HLL sketches)
    "quantile_sketch" -> ((s, dir) =>
      Relational.quantileSketch(t(s, dir, "lineitem"))),
    // the MERGE of the sketch driven end-to-end (r15): per-micro-batch
    // bucket partials written exactly-once (foreachBatch batch_id
    // partitions, across a forced stop/restart), merged by one
    // groupBy-sum, and fed to the SAME estimate tail — bit-identical to
    // the one-shot sketch, so it shares quantile_sketch's oracle text.
    // This is the sketch's 100 TB selling point made a gate: partials
    // from any slicing of the data recombine exactly.
    "quantile_stream" -> ((s, dir) =>
      withStreamStage("graft_qsk_stream") { stage =>
        val in = stage + "/in"; val sink = stage + "/sink"
        val ckpt = stage + "/ckpt"
        val li = Relational.quantileValues(t(s, dir, "lineitem"))
        def run(): Unit = {
          val stream = s.readStream.schema(li.schema)
            .option("maxFilesPerTrigger", 2).parquet(in)
          val q = stream.writeStream
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
              graft.streaming.StreamingOps.writeBatchIdempotent(
                Relational.quantileBuckets(b, 100000L), sink, id)
            }
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        li.filter(col("l_orderkey") % 2 === 0).repartition(2)
          .write.mode("overwrite").parquet(in)
        run() // phase 1: drains the even half, clean stop
        li.filter(col("l_orderkey") % 2 =!= 0).repartition(2)
          .write.mode("append").parquet(in)
        run() // phase 2: restart from the checkpoint — new files only
        // materialize the merged partials before withStreamStage deletes
        // the staging dir (the returned plan must not scan it lazily)
        graft.sources.TableSink.saveTable(
          s.read.parquet(sink).groupBy(col("b"))
            .agg(sum(col("cnt")).as("cnt")),
          "graft_quantile_partials")
        Relational.quantileFromBuckets(li,
          s.table("graft_quantile_partials"), 100000L,
          Seq(1, 5, 25, 50, 75, 95, 99))
      }),
    // the exact-rank primitive as a PUBLIC operator over arbitrary
    // (group, order) columns: row_number + count(*) per group WITHOUT a
    // per-group window task. o_orderstatus has THREE values — a window
    // would be a 3-task ceiling at any cluster size; the range-partitioned
    // counter+offset shape ranks at full cluster width. (o_totalprice,
    // o_orderkey) is unique, so the ordering — and the ranks — are
    // deterministic.
    "order_rank" -> ((s, dir) =>
      ExactRank.exactRank(
          t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice")),
          groupCols = Seq("o_orderstatus"),
          orderCols = Seq("o_totalprice", "o_orderkey"))
        .orderBy(col("o_orderkey"))),
    // exact rank-based feature transform: value → empirical quantile
    // within its group, via the same window-free ExactRank machinery
    "quantile_normalize" -> ((s, dir) =>
      Relational.quantileNormalize(t(s, dir, "orders"),
        "o_orderstatus", "o_totalprice", "o_orderkey")),
    // declarative data-quality gate (the Deequ shape): named constraint
    // checks as one conditional-aggregate pass + an anti-join orphan scan
    "dq_checks" -> ((s, dir) =>
      Relational.dqChecks(t(s, dir, "lineitem"), t(s, dir, "orders"))),
    // privacy gate: quasi-identifier group-size audit (re-identifiable
    // rows live in groups smaller than k)
    // MDM survivorship after entity resolution: field-level survivors
    // by explicit rules (richest-member identity, field max, mode)
    "golden_record" -> ((s, dir) =>
      Relational.goldenRecord(t(s, dir, "customer"))),
    "k_anonymity" -> ((s, dir) =>
      Relational.kAnonymity(t(s, dir, "customer"))),
    // the diversity half of the privacy audit (r14 — the attack
    // k-anonymity misses: a uniform-sensitive group discloses even at
    // size k): distinct l-diversity over the balance band, with the
    // skew count as an exact-integer entropy stand-in
    "l_diversity" -> ((s, dir) =>
      Relational.lDiversity(t(s, dir, "customer"))),
    // the distribution half of the privacy audit (the attack
    // l-diversity misses: a diverse group whose sensitive distribution
    // skews far from the table's): ordered-EMD t-closeness over the
    // same balance band, e6-quantized exact-integer arithmetic
    "t_closeness" -> ((s, dir) =>
      Relational.tCloseness(t(s, dir, "customer"))),
    // privacy gate, release half: ε-DP Laplace-noised corpus histogram
    // with a seeded (oracle-replayable) noise derivation
    "dp_histogram" -> ((s, dir) =>
      Relational.dpHistogram(t(s, dir, "documents"))),
    // the selection half of the DP release pair: seeded-Laplace noisy
    // counts, top-k by noisy count (repeated noisy-max)
    "dp_topk" -> ((s, dir) =>
      Relational.dpTopK(t(s, dir, "documents"))),
    // the numeric third of the DP release family (r15): clipped-sum
    // mean with sensitivity clip/n, the same seeded md5-Laplace
    // derivation — verification artifact, not a private release (the
    // dp_histogram contract)
    "dp_mean" -> ((s, dir) =>
      Relational.dpMean(t(s, dir, "documents"))),
    // BAND join (r14 — fuzzy numeric matching as an EQUI-join: bucket
    // blocking at bucket width = band, supplier side exploded ±1, exact
    // |diff| filter on candidates — a bare range predicate would plan
    // as BroadcastNestedLoopJoin, O(|S|·|C|))
    "band_join" -> ((s, dir) =>
      Relational.bandJoin(t(s, dir, "supplier"), t(s, dir, "customer"))),
    // POISSON bootstrap CI replicates (r14 — the distributed bootstrap:
    // per-row Poisson(1) weights from the house md5 uniform through a
    // precomputed e6 inverse-CDF ladder, so the resample is row-local,
    // deterministic, and oracle-replayable; B ordered means ARE the CI)
    "bootstrap_ci" -> ((s, dir) =>
      Relational.bootstrapCi(t(s, dir, "orders"))),
    // exact moments→correlation: deterministic twin of corr/covar_pop
    "corr_stats" -> ((s, dir) => Relational.corrStats(t(s, dir, "lineitem"))),
    // Theil-Sen robust slope over a bounded deterministic head: exact
    // lower median of pairwise IEEE slopes (29% contamination tolerance
    // where one corrupt row moves OLS arbitrarily)
    "theil_sen" -> ((s, dir) => Relational.theilSen(t(s, dir, "lineitem"))),
    // CUPED variance-reduced experiment readout: md5-bucket assignment,
    // pre-period covariate, pooled theta from exact DECIMAL moments
    "cuped_adjust" -> ((s, dir) =>
      Relational.cupedAdjust(t(s, dir, "orders"))),
    // RFM customer segmentation (r15 — the classic retail value cut in
    // the reference's own market-basket domain): recency/frequency/
    // monetary per customer, each scored into EXACT quartiles via three
    // window-free ExactRank passes (the curriculum_order tier idiom),
    // composed into the 3-digit RFM code
    "rfm_segment" -> ((s, dir) =>
      Relational.rfmSegment(t(s, dir, "orders"))),
    // Codex pass@k estimator: per problem 1 - C(n-c,k)/C(n,k) via the
    // k-step sequentially-floored e6 product (BIGINT-safe at any n)
    "pass_at_k" -> ((s, dir) =>
      Relational.passAtK(t(s, dir, "orders"))),
    // rank (Spearman) correlation: monotone-invariant dependence via two
    // window-free ExactRank passes + exact long moments (e6 contract)
    "spearman_corr" -> ((s, dir) =>
      Relational.spearmanCorr(t(s, dir, "lineitem"))),
    // grouped OLS from the same exact power-sum pass as corr_stats
    "regression_stats" -> ((s, dir) =>
      Relational.regressionStats(t(s, dir, "lineitem"))),
    // robust outlier scoring: exact median/MAD per event_type via two
    // public ExactRank passes, row-local modified z — no per-group window
    "robust_zscore" -> ((s, dir) => Relational.robustZscore(eventsTable(s, dir))),
    // exact-percentile clipping (robust feature scaling): per-type P5/P95
    // order statistics via window-free ExactRank, broadcast clamp-back
    "winsorize" -> ((s, dir) => Relational.winsorize(eventsTable(s, dir))),
    // one-pass long-format column profile (exact distincts via Expand)
    "profile_table" -> ((s, dir) =>
      Profile.profile(t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority"))),
    // SCD2 merge-apply over a synthetic CDC batch: mod-7 keys change
    // acctbal (+100), mod-11 keys re-deliver unchanged rows (idempotent
    // no-op) — close+insert vs pass-through both driver-checked
    "scd2_apply" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val current = c.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        lit("1995-01-01").cast("timestamp").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"),
        lit(true).as("is_current"))
      val updates = c
        .filter(col("c_custkey") % 7 === 0 || col("c_custkey") % 11 === 0)
        .select(col("c_custkey"), col("c_name"),
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal")).as("c_acctbal"),
          lit("1997-06-01").cast("timestamp").as("change_ts"))
      Scd.scd2Apply(current, updates, "c_custkey", Seq("c_name", "c_acctbal"))
        .orderBy(col("c_custkey"), col("valid_from"))
    }),
    // the other half of the CDC story: PRODUCE a change feed by diffing
    // two keyed snapshots — one fingerprinted full-outer join, row-local
    // insert/delete/update classification (see Scd.snapshotDiff). The two
    // snapshots derive deterministically from orders: keys % 89 == 0 are
    // absent from the old snapshot (inserts), % 97 == 0 absent from the
    // new (deletes), % 10 == 0 get a doubled price in the new (updates).
    "snapshot_diff" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val oldSnap = orders.filter(col("o_orderkey") % 89 =!= 0)
      val newSnap = orders.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 10 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
      Scd.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),
    // the CDC round-trip identity, driver-checked: applying the payload
    // diff of (old -> new) onto old MUST reconstruct new exactly — the
    // oracle is simply the new snapshot. Untouched rows ride a
    // broadcastable keys-only anti join (the base never shuffles).
    "cdc_upsert" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val oldSnap = orders.filter(col("o_orderkey") % 89 =!= 0)
      val newSnap = orders.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 10 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
      // upsertApply consumes the feed twice (anti-join keys + images);
      // a real pipeline passes a materialized CDC batch, so a DERIVED
      // feed persists DISK_ONLY first — else the diff join runs twice
      // at snapshot scale. Operator-scoped release (r12): one lazy
      // consumer plan, so selfReleasing frees it after the action.
      val feed = CacheScope.selfReleasing(
        Scd.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"),
          includePayload = true),
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
      Scd.upsertApply(oldSnap, feed, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),
    "string_agg" -> ((s, dir) =>
      Relational.stringAgg(t(s, dir, "supplier"), t(s, dir, "nation"))),
    "value_histogram" -> ((s, dir) => Relational.valueHistogram(eventsTable(s, dir))),
    // day-of-week × hour seasonal baseline + per-cell residual extremes
    // (r15 — the de-seasonalization profile an event-rate monitor needs
    // before calling anything an anomaly); ≤168 cells, broadcast-joined
    // back for residuals, all integer cents
    "seasonal_profile" -> ((s, dir) =>
      Events.seasonalProfile(eventsTable(s, dir))),
    "q5_local_supplier" -> ((s, dir) => Relational.localSupplierRevenue(
      t(s, dir, "region"), t(s, dir, "nation"), t(s, dir, "customer"),
      t(s, dir, "supplier"), t(s, dir, "orders"), t(s, dir, "lineitem"))),
    // approx sketches (HLL / KLL): the sketches stay in the plan, but the
    // driver-facing columns are oracle-checkable — exact count_distinct
    // plus accuracy-contract booleans (sketch within tolerance of the
    // exact value). The oracle emits the exact counts and literal TRUE;
    // a sketch drifting out of tolerance flips the boolean and fails the
    // hash compare. Numeric sketch accuracy is additionally asserted in
    // PipelineSpec.
    "approx_stats" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          count_distinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey")).as("ap"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("am"),
          expr("percentile(l_quantity, array(0.45, 0.55))").as("p"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("ap") - col("exact_parts")) <=
            col("exact_parts") * lit(0.05)).as("approx_parts_within_5pct"),
          (col("am") >= element_at(col("p"), 1) &&
            col("am") <= element_at(col("p"), 2)).as("approx_median_within_decile"))
        .orderBy(col("l_returnflag"))),
    // ---- analytic windows + sessionization over events ------------------
    "window_rank" -> ((s, dir) => Events.userWindows(eventsTable(s, dir))),
    "window_frames" -> ((s, dir) => Events.userFrames(eventsTable(s, dir))),
    "window_distributions" -> ((s, dir) =>
      Events.userDistributions(eventsTable(s, dir))),
    "sessionize" -> ((s, dir) => Events.sessionize(eventsTable(s, dir))),
    "session_window_agg" -> ((s, dir) => Events.sessionWindowAgg(eventsTable(s, dir))),
    "hourly_counts" -> ((s, dir) => Events.hourlyCounts(eventsTable(s, dir))),
    // sparse-signal forward fill: value observed only on purchases,
    // carried per user by a last(ignoreNulls) frame — verbatim carry,
    // hash-exact; user-cardinality window partitions
    "locf_fill" -> ((s, dir) => Events.locfFill(eventsTable(s, dir))),
    // aggregate-table IVM: merge(partials(old), delta) == full recompute
    // — same oracle text as hourly_counts, the cooccur_incremental
    // convention applied to the aggregate-maintenance algebra
    "hourly_counts_incremental" -> ((s, dir) => {
      val ev = eventsTable(s, dir)
      Events.hourlyCountsMerge(
        Events.hourlyCountsPartials(ev.filter(col("event_id") % 10 =!= 0)),
        ev.filter(col("event_id") % 10 === 0))
    }),
    "latest_events" -> ((s, dir) => Events.latestEvents(eventsTable(s, dir))),
    "sliding_counts" -> ((s, dir) => Events.slidingCounts(eventsTable(s, dir))),
    // ordered funnel: earliest per-stage timestamps with stage-order
    // constraints (view → click → purchase), per user
    "funnel_steps" -> ((s, dir) => Events.funnelSteps(eventsTable(s, dir))),
    // PrefixSpan-semantics sequential patterns up to length 3 over
    // per-user event sequences — containment via position summaries,
    // O(t^2) per user, never a subsequence scan
    "seq_patterns" -> ((s, dir) =>
      Events.seqPatterns(eventsTable(s, dir))),
    // U-shaped attribution: per purchase journey 40/20/40 exact-e6
    // credit over its touches, remainder to the last touch, rolled up
    // by channel — credit conserves to 1e6 per attributed journey
    "attribution_touch" -> ((s, dir) =>
      Events.attributionTouch(eventsTable(s, dir))),
    // first-order Markov transition matrix over per-user event streams
    "event_transitions" -> ((s, dir) => Events.transitionMatrix(eventsTable(s, dir))),
    // first-seen day cohorts x activity-day offsets with retention rates
    "cohort_retention" -> ((s, dir) => Events.cohortRetention(eventsTable(s, dir))),
    // exact-integer EWMA (alpha=1/2): cents quantization + a shiftright
    // fold over each user's time-sorted events — sequential smoothing
    // WITHOUT a window over raw events, hash-exact vs the oracle's fold
    "ewma_value" -> ((s, dir) => Events.ewmaValue(eventsTable(s, dir))),
    // CUSUM drift monitor: exact-integer max(0, s + d) fold per user;
    // the oracle replays it via the prefix-sum/running-min closed form
    "cusum_alerts" -> ((s, dir) => Events.cusumAlerts(eventsTable(s, dir))),
    // dense hourly grid + forward fill: the gap-filling resample ahead
    // of any fixed-step time-series model; window only over the
    // calendar-bounded grid, never raw events
    "resample_ffill" -> ((s, dir) => Events.resampleFfill(eventsTable(s, dir))),
    // semi-structured column breadth: the same JSON field through BOTH
    // parse paths (path extraction and schema'd from_json) — emitting the
    // two must-agree columns makes the hash gate also a parser
    // cross-check; per-type aggregation exercises JSON values in keys
    "json_funcs" -> ((s, dir) => {
      val ev = eventsTable(s, dir)
      ev.select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k_path"),
          from_json(col("props"), "k BIGINT", new java.util.HashMap[String, String]())
            .getField("k").as("k_struct"))
        .withColumn("k_mod", col("k_path") % 7)
        .orderBy(col("event_id"))
    }),
    // Spark 4's VARIANT type (r14): the semi-structured column path —
    // parse once into the binary variant encoding, extract typed
    // scalars lazily (the open-schema ingestion shape: at 100 TB you
    // parse JSON text ONCE at ingest and every downstream reader does
    // cheap typed extraction instead of re-parsing strings). Registered
    // presentation extracts scalars, so the driver can hash them; the
    // oracle is the equivalent JSON-path read.
    "variant_funcs" -> ((s, dir) => {
      val ev = eventsTable(s, dir)
      ev.select(col("event_id"), col("event_type"),
          parse_json(col("props")).as("v"))
        .select(col("event_id"), col("event_type"),
          try_variant_get(col("v"), "$.k", "long").as("k_var"),
          // a missing path extracts to SQL NULL, never an error — the
          // open-schema contract
          try_variant_get(col("v"), "$.missing", "long").isNull
            .as("missing_is_null"))
        .orderBy(col("event_id"))
    }),
    // as-of join (backward): latest purchase at-or-before each click.
    // Duplicate-(user_id, ts) purchases resolve INSIDE asOf (max payload
    // struct — p_event_id is the first payload field, so the max-event_id
    // row wins, matching the oracle's ORDER BY event_id DESC dedupe);
    // DuckDB ASOF's own tie choice is unspecified, hence the QUALIFY twin.
    // Goes through asOfAuto — the recommended entry point: it probes the
    // hottest key with one partial-aggregable pass and silently upgrades
    // to the bucketized plan when a key's volume would pin one window
    // task (here no user is hot, so the plain one-shuffle plan is chosen
    // and the hash is unchanged).
    "asof_join" -> ((s, dir) => {
      val ev = eventsTable(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("p_event_id"),
          col("value").as("p_value"))
      TemporalJoin.asOfAuto(clicks, purchases, "user_id", "ts",
          Seq("p_event_id", "p_value"))
        .select(col("event_id"), col("user_id"), col("value"),
          col("_asof.p_event_id").as("purchase_event_id"),
          col("_asof.p_value").as("purchase_value"))
        .orderBy(col("event_id"))
    }),
    // the hot-key-safe as-of variant: per-(key, hour-bucket) parallelism,
    // same semantics (equivalence-tested in TemporalJoinSpec), same oracle
    "asof_join_bucketized" -> ((s, dir) => {
      val ev = eventsTable(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("p_event_id"),
          col("value").as("p_value"))
      TemporalJoin.asOfBucketized(clicks, purchases, "user_id", "ts",
          Seq("p_event_id", "p_value"), bucketSec = 3600)
        .select(col("event_id"), col("user_id"), col("value"),
          col("_asof.p_event_id").as("purchase_event_id"),
          col("_asof.p_value").as("purchase_value"))
        .orderBy(col("event_id"))
    }),
    "proximity_pairs" -> ((s, dir) =>
      TemporalJoin.proximityPairs(eventsTable(s, dir))),
    // the two-sided (stream-stream-shaped) interval join in batch form:
    // purchases within 5 minutes AFTER each click, heterogeneous sides —
    // the batch-parity twin of StreamingOps.joinStreams
    "interval_join" -> ((s, dir) => {
      val ev = eventsTable(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      TemporalJoin.intervalJoin(clicks, purchases, "user_id",
          "click_ts", "purchase_ts", 300)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          col("delta_us"), col("purchase_value"))
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    }),
    // the stream-STREAM interval join driver-checked: the same staged
    // events feed two independent file-source streams (clicks, purchases),
    // watermarked on BOTH sides and joined on user + a two-sided
    // event-time bound — the state-expiry requirement that separates a
    // runnable stream-stream join from an unbounded-state one — run to
    // completion under availableNow into an append memory sink. With no
    // maxFilesPerTrigger set, the file source serves ALL staged files as
    // a SINGLE micro-batch (watermarks only advance between batches), so
    // watermark eviction (spec-tested in StreamingSpec) can't drop
    // in-window matches of this historical replay while the read still
    // parallelizes across files — and the result equals the batch twin
    // bit-for-bit: same oracle text as interval_join.
    "interval_join_stream" -> ((s, dir) => withStreamStage("graft_ij_stream") { stage =>
      // each side staged into its own directory: a stream's source filter
      // does not prune the file scan (the source reads the whole
      // directory, the filter runs post-read), so splitting at stage time
      // is the streaming analogue of partition pruning. ONE partitionBy
      // write, not two filtered writes — the events relation is scanned
      // once however many sides there are (at 100 TB the staging scan IS
      // the cost; r11 floor decomposition in BENCH_NOTES). Each side then
      // streams its partition directory, restoring the path-encoded
      // partition column as a literal (the streaming source runs no
      // partition discovery under a user schema).
      eventsTable(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .write.mode("overwrite").partitionBy("event_type").parquet(stage)
      def side(tpe: String) = graft.streaming.StreamingOps
        .eventsStreamNormalized(s, s"$stage/event_type=$tpe",
          constEventType = tpe)
      val joined = graft.streaming.StreamingOps.joinStreams(
        side("click"), side("purchase"))
      val sink = "interval_join_stream_sink"
      s.catalog.dropTempView(sink)
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
            .as("delta_us"),
          col("purchase_value"))
        .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
    }),
    // NINTH streaming query — LEFT-OUTER stream-stream interval join:
    // NULL-purchase rows emit only once the watermark PROVES no match
    // can arrive; the tail still in state at termination is withheld
    // (the oracle encodes the W − window cutoff — the part a batch
    // left join gets wrong about a live stream)
    "interval_join_stream_outer" -> ((s, dir) => withStreamStage("graft_ijo_stream") { stage =>
      // same one-scan partitionBy staging as interval_join_stream
      eventsTable(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .write.mode("overwrite").partitionBy("event_type").parquet(stage)
      def side(tpe: String) = graft.streaming.StreamingOps
        .eventsStreamNormalized(s, s"$stage/event_type=$tpe",
          constEventType = tpe)
      val joined = graft.streaming.StreamingOps.joinStreamsLeftOuter(
        side("click"), side("purchase"))
      val sink = "interval_join_stream_outer_sink"
      s.catalog.dropTempView(sink)
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
            .as("delta_us"),
          col("purchase_value"))
        .orderBy(col("user_id"), col("click_id"),
          col("purchase_id").asc_nulls_first)
    }),
    // ---- text analysis (LLM-data-pipeline surface) -----------------------
    "text_stats" -> ((s, dir) => TextAnalysis.textStats(t(s, dir, "documents"))),
    "lang_id" -> ((s, dir) => TextAnalysis.langId(t(s, dir, "documents"))),
    // the graduated classifier: Cavnar–Trenkle character-n-gram rank
    // profiles learned from the labeled corpus in one distributed pass,
    // scored doc-locally by out-of-place distance
    "lang_id_ngram" -> ((s, dir) =>
      TextAnalysis.langIdNgram(t(s, dir, "documents"))),
    // the measured-quality row for the Cavnar–Trenkle classifier (r15 —
    // the lsh_recall discipline for language ID): the SAME prediction
    // relation grouped into the (label, prediction) confusion matrix,
    // so a profile/scorer regression shows as count drift in the hash
    // gate, not as a silent accuracy slide
    "lang_id_confusion" -> ((s, dir) =>
      TextAnalysis.langIdNgram(t(s, dir, "documents"))
        .groupBy(col("lang_label"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang_label"), col("lang_pred"))),
    "token_freq" -> ((s, dir) => TextAnalysis.tokenFrequencies(t(s, dir, "documents"))),
    // snapshot-vs-snapshot drift monitor: top KL contributors between
    // the two corpus halves' smoothed unigram distributions (e6 ints)
    "token_drift" -> ((s, dir) => TextAnalysis.tokenDrift(t(s, dir, "documents"))),
    // BPE merge TRAINING (bpe_tokens applies a table; this learns one):
    // 64 rounds of pair-count argmax + greedy merge, induced driver-local
    // over the bounded word-type relation in ONE distributed pass
    "bpe_train" -> ((s, dir) => TextAnalysis.bpeTrain(t(s, dir, "documents"))),
    // VOCABULARY-scale induction, exact-parity leg: the documents corpus
    // has 31 word types (exhausts at 89 merges), so the scale proof runs
    // on the partkey vocabulary (2000 numeric word types, exhaustion
    // ~1990) — 256 rounds, right under DuckDB's ~300-round CTE-chain
    // binder ceiling, every rule hash-checked against the unrolled chain
    "bpe_train_vocab" -> ((s, dir) =>
      TextAnalysis.bpeTrain(
        t(s, dir, "lineitem").select(col("l_partkey").cast("string").as("text")),
        merges = BpeVocabRounds)),
    // the REAL-tokenizer merge count (1024), same 1-job induction; the
    // oracle is structural (n_rules + a single-round-exact first_cnt
    // anchor + the BPE invariants) because no SQL engine can unroll a
    // 1024-round dependent chain — see bpeTrainSummary's contract.
    // CORPUS CONTRACT (the n_rules=1024 literal): the vocabulary's merge
    // exhaustion must exceed 1024 — true at sf0.01 (2000 partkey types,
    // exhaustion ~1990) and every larger SF; sf0.001's 200 types exhaust
    // at ~190, so this row's gate is sf0.01+ by design (bpe_train_vocab's
    // CHAINED oracle degrades gracefully with the corpus, this structural
    // one asserts the scale point itself)
    "bpe_train_1k" -> ((s, dir) =>
      TextAnalysis.bpeTrainSummary(
        t(s, dir, "lineitem").select(col("l_partkey").cast("string").as("text")),
        merges = 1024)),
    // the induction→application composition: bpe_train's 64 learned
    // rules feed the greedy encoder over the same word model — the
    // trained-tokenizer budget a real pipeline runs
    "pipeline_tokenizer" -> ((s, dir) =>
      TextAnalysis.bpeTrainedEncode(t(s, dir, "documents"))),
    // the tokenizer BAKE-OFF: BPE (64 learned merges) vs unigram-LM
    // (2-round hard EM) trained on the SAME corpus, head-to-head on
    // corpus fertility — exact integer totals + e6 fertilities + the
    // per-doc win count on fully-covered docs
    "tokenizer_compare" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val uni = TextAnalysis.unigramFertility(docs)
        .select(col("doc_id"), col("n_covered"), col("n_pieces"),
          col("n_words").as("u_words"))
      val bpe = TextAnalysis.bpeTrainedEncode(docs)
        .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"))
      uni.join(bpe, Seq("doc_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_words"),
          sum(col("n_bpe_tokens")).as("bpe_tokens"),
          sum(col("n_covered")).as("uni_covered"),
          sum(col("n_pieces")).as("uni_pieces"),
          expr("sum(n_bpe_tokens) * 1000000 div sum(n_words)")
            .as("bpe_fert_e6"),
          expr("sum(n_pieces) * 1000000 div sum(n_covered)")
            .as("uni_fert_e6"),
          sum(when(col("n_covered") === col("u_words") &&
            col("n_pieces") < col("n_bpe_tokens"), 1L).otherwise(0L))
            .as("n_docs_uni_wins"))
    }),
    // SentencePiece-style unigram-LM tokenizer training: substring seed
    // vocab, 2 hard-EM rounds of distributed Viterbi (score table in
    // the task closure) + vocab-sized usage aggregates; only
    // vocab-bounded relations reach the driver
    "unigram_train" -> ((s, dir) =>
      TextAnalysis.unigramTrain(t(s, dir, "documents"))),
    // the unigram induction->application composition (bpeTrainedEncode's
    // twin): per-doc subword budgets under the LEARNED scores, doc-local
    // mapPartitions with a per-partition word->pieces memo
    "unigram_fertility" -> ((s, dir) =>
      TextAnalysis.unigramFertility(t(s, dir, "documents"))),
    // LM surprisal under the TRAINED unigram tokenizer (r15 — the CCNet
    // perplexity-quality discipline with the in-repo LM): per document
    // the exact-integer −Σ best-segmentation log-prob (e6) plus the
    // per-word normalization CCNet thresholds on — low = fluent
    // in-distribution text, high = boilerplate/noise. Same distributed
    // EM + doc-local application shape as unigram_fertility.
    "unigram_perplexity" -> ((s, dir) =>
      TextAnalysis.unigramSurprisal(t(s, dir, "documents"))),
    // exact frequent items above n/100 support, via Misra-Gries candidate
    // pruning (the unbounded-vocabulary guard) — result is exact, so the
    // oracle is the plain HAVING formulation
    "heavy_hitters" -> ((s, dir) =>
      HeavyHitters.heavyHitters(t(s, dir, "documents"), d = 100)),
    // stratified twin: per-language frequent tokens via per-group MG
    // summaries (groups x capacity driver bound, fail-fast contract) —
    // result is exact, so the oracle is the grouped HAVING formulation
    "heavy_hitters_by_lang" -> ((s, dir) =>
      HeavyHitters.heavyHittersByGroup(t(s, dir, "documents"),
        groupCol = "lang", d = 60)),
    // mergeable-sketch discipline, frequency side: Count-Min counter
    // relation as plain relational algebra (shared md5 hashes, so the
    // oracle replays the estimates EXACTLY, collisions included)
    "cms_heavy" -> ((s, dir) =>
      Sketches.cmsHeavyEstimates(t(s, dir, "lineitem"))),
    // the production xxhash64 hash path (measured 4x counter build vs
    // md5); structural oracle since DuckDB cannot replay xxhash64
    "cms_heavy_fast" -> ((s, dir) =>
      Sketches.cmsHeavyEstimatesFast(t(s, dir, "lineitem"))),
    // mergeable-sketch discipline, cardinality side: per-shard
    // DataSketches HLL union == one-shot sketch (structural oracle —
    // the merge-transparency contract a persisted-sketch layout serves)
    "hll_sharded" -> ((s, dir) =>
      Sketches.hllShardedDistinct(t(s, dir, "lineitem"))),
    // stratified cardinality: per-(group, shard) sketches union into
    // per-GROUP estimates (the heavy_hitters_by_lang posture for HLL)
    "hll_by_group" -> ((s, dir) =>
      Sketches.hllByGroup(t(s, dir, "lineitem"))),
    // the sketch-table ingest discipline: shard sketches PERSISTED
    // bucketed, a second generation APPENDED (sketch relations are
    // additive — serving unions rows, never rebuilds), serve reads the
    // table only. Same output contract/oracle as hll_sharded.
    "hll_persisted" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.sources.TableSink.writeBucketed(
        Sketches.hllShardSketches(li.filter(col("l_orderkey") % 2 === 1)),
        "graft_hll_shards", "shard", 4)
      graft.sources.TableSink.appendBucketed(
        Sketches.hllShardSketches(li.filter(col("l_orderkey") % 2 === 0)),
        "graft_hll_shards", "shard", 4)
      Sketches.hllServe(s.table("graft_hll_shards"), li)
    }),
    // the COMPACTION verb on the sketch-table lifecycle: build + append
    // leave one file-set per generation; OPTIMIZE-style bin-packing
    // rewrites them to ONE file per bucket (TableSink.compactBucketed),
    // and the post-compaction serve must be bit-identical to the
    // pre-compaction one — same output contract/oracle as hll_sharded.
    // The file-count drop and serve parity are spec-pinned in
    // TableSinkSpec; this row proves the compacted table still serves.
    "hll_compacted" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.sources.TableSink.writeBucketed(
        Sketches.hllShardSketches(li.filter(col("l_orderkey") % 2 === 1)),
        "graft_hll_compact", "shard", 4)
      graft.sources.TableSink.appendBucketed(
        Sketches.hllShardSketches(li.filter(col("l_orderkey") % 2 === 0)),
        "graft_hll_compact", "shard", 4)
      graft.sources.TableSink.compactBucketed(s, "graft_hll_compact",
        "shard", 4)
      Sketches.hllServe(s.table("graft_hll_compact"), li)
    }),
    // sketch-set INTERSECTION via inclusion-exclusion over three
    // one-scan conditional sketches (HLL can't intersect directly —
    // registers only max-merge into unions); exact count oracle-checked,
    // the IE accuracy band a structural boolean (r14)
    "hll_intersect" -> ((s, dir) =>
      Sketches.hllIntersect(t(s, dir, "lineitem"))),
    // 2-D Pareto frontier via mergeable per-partition frontiers (linear
    // scans, frontier-sized merge task; exact-cents dominance)
    "skyline" -> ((s, dir) => Relational.skyline(t(s, dir, "orders"))),
    "token_counts" -> ((s, dir) => TextAnalysis.tokenCounts(t(s, dir, "documents"))),
    // Flesch reading ease in exact e6 cross-multiplication (r14 — the
    // classic difficulty signal corpus filters bucket on); row-local
    "readability_flesch" -> ((s, dir) =>
      TextAnalysis.readabilityFlesch(t(s, dir, "documents"))),
    // columnar-format breadth: ORC sink partitioned by language, read
    // back through the native ORC source with the lang predicate
    // landing as PARTITION PRUNING (only the en/ directory is read) —
    // the write→layout→pruned-scan cycle on the second columnar format
    "orc_roundtrip" -> ((s, dir) => {
      val path = freshStageDir("graft_orc_docs")
      t(s, dir, "documents").write.mode("overwrite")
        .partitionBy("lang").orc(path)
      s.read.orc(path).filter(col("lang") === "en")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"))
    }),
    // schema evolution across producer generations: a v1 writer
    // without `source` and a v2 writer with it land in one dataset;
    // mergeSchema reconciles (missing column → NULL), the query
    // reports legacy coverage — the lake-ingest reality every 100 TB
    // corpus lives with (generations never rewrite)
    "schema_evolution" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = freshStageDir("graft_schema_evo")
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"))
        .write.mode("overwrite").parquet(s"$path/gen=1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("source"))
        .write.mode("overwrite").parquet(s"$path/gen=2")
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("source").isNull.cast("long")).as("n_legacy"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang"))
    }),
    // snapshot time travel: v1 = base write, v2 = append; the pinned v1
    // read resolves through its manifest only, so it never sees v2's
    // files — snapshot isolation from immutability + manifest indirection
    "table_time_travel" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = freshStageDir("graft_timetravel")
      graft.sources.TableSink.writeSnapshot(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0), root, 1)
      graft.sources.TableSink.writeSnapshot(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0), root, 2)
      def at(v: Int) = graft.sources.TableSink.readSnapshot(s, root, v)
        .agg(lit(v).as("version"), count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
      at(1).unionByName(at(2)).orderBy(col("version"))
    }),
    // PSI drift report: baseline quartile edges (ExactRank), smoothed
    // e6 shares, per-bin terms floored before summation
    "psi_drift" -> ((s, dir) =>
      Profile.psiDrift(t(s, dir, "documents"))),
    // retention close of the time-travel lifecycle: expire v1..v2 (their
    // manifests delete; data directories survive wherever a live
    // manifest still references them), newest version stays readable
    "snapshot_expire" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = freshStageDir("graft_snapexp")
      graft.sources.TableSink.writeSnapshot(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0), root, 1)
      graft.sources.TableSink.writeSnapshot(
        docs.filter(pmod(col("doc_id"), lit(20)) === 0), root, 2)
      graft.sources.TableSink.writeSnapshot(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0 &&
          pmod(col("doc_id"), lit(20)) =!= 0), root, 3)
      graft.sources.TableSink.expireSnapshots(s, root, 2)
      graft.sources.TableSink.readSnapshot(s, root, 3)
        .agg(lit(3).as("version"), count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
    }),
    // vocab-coverage gate: per-doc out-of-vocabulary fraction against
    // the corpus top-1000 vocabulary (bounded cut, broadcast probe)
    "oov_rate" -> ((s, dir) => TextAnalysis.oovRate(t(s, dir, "documents"))),
    // positional-postings TRIGRAM query (self-derived top trigram) —
    // r12 accidentally shadowed this under the two-term phrase_search
    // key; renamed to restore it to the verified surface
    "phrase_trigram" -> ((s, dir) =>
      TextAnalysis.phraseSearch(t(s, dir, "documents"))),
    // unigram entropy quality signal (row-local runs, e6 integer contract)
    "token_entropy" -> ((s, dir) => TextAnalysis.tokenEntropy(t(s, dir, "documents"))),
    "quality_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(t(s, dir, "documents"))),
    // C4 line-level cleaning. The corpus is unpunctuated single-line text,
    // so the punctuation rule is switched off and the word-count rule set
    // to 50 — the line machinery still runs end-to-end and the keep
    // verdict genuinely splits the corpus; the punctuation/boilerplate
    // rules are exercised by the PipelineSpec fixture.
    "c4_line_filter" -> ((s, dir) =>
      TextAnalysis.c4LineFilter(t(s, dir, "documents"), minLineWords = 50,
        requireTerminalPunct = false)),
    // FILTER ABLATION report (r14 — the curation question every gate
    // pipeline answers first: which filters remove what, exclusively
    // and jointly?): the three registered doc-level gates — Gopher
    // keep, C4 line-survival, language-ID correctness — cross-tabbed
    // into the 8-cell overlap cube. Three row-local gate projections +
    // two doc_id equi-joins + one partial-aggregable rollup; the
    // oracle composes the three gates' own oracle texts verbatim, so
    // the ablation can never drift from the gates it reports on.
    "quality_ablation" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val g = TextAnalysis.gopherQuality(docs, stopList = Seq("the", "a"))
        .select(col("doc_id"), col("keep").as("gopher_pass"))
      val c = TextAnalysis.c4LineFilter(docs, minLineWords = 50,
          requireTerminalPunct = false)
        .select(col("doc_id"), col("keep").as("c4_pass"))
      val l = TextAnalysis.langId(docs)
        .select(col("doc_id"),
          (col("lang_pred") === col("lang_label")).as("lang_pass"))
      g.join(c, "doc_id").join(l, "doc_id")
        .groupBy(col("gopher_pass"), col("c4_pass"), col("lang_pass"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("gopher_pass"), col("c4_pass"), col("lang_pass"))
    }),
    // full Gopher ruleset (word/line/symbol/stopword rules + keep verdict).
    // stopList localized to the synthetic corpus's function words — its
    // vocabulary contains only 'the'/'a' from any natural stop lexicon, so
    // the canonical 8-word default could never fire the ≥2 rule here.
    "gopher_quality" -> ((s, dir) =>
      TextAnalysis.gopherQuality(t(s, dir, "documents"),
        stopList = Seq("the", "a"))),
    "fingerprints" -> ((s, dir) => TextAnalysis.fingerprints(t(s, dir, "documents"))),
    // Unicode NFC canonicalization ahead of content hashing: both engines
    // append the same decomposed+precomposed sample (combining acute/ring/
    // diaeresis) to the ASCII corpus, and the normalizer must fold the
    // decomposed forms into their precomposed twins (html_extract
    // synthesis discipline; JDK Normalizer vs DuckDB nfc_normalize — the
    // same Unicode spec on both sides)
    "nfc_normalize" -> ((s, dir) => {
      val mixed = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" Café école Ångström")).as("text"))
      TextAnalysis.nfcNormalize(mixed)
    }),
    "scrub_pii" -> ((s, dir) => TextAnalysis.scrubPii(t(s, dir, "documents"))),
    // encoding-damage gate (ftfy posture): the fixture corpus is clean
    // ASCII, so the three damage classes are synthesized deterministically
    // per doc_id residue (nfc_normalize discipline) — a gate that never
    // fires is untested
    "mojibake_stats" -> ((s, dir) => {
      val seeded = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 40 === 0, lit(" cafÃ© Âfoo"))
            .when(col("doc_id") % 40 === 1, lit(" donâ€™t"))
            .when(col("doc_id") % 40 === 2, lit(" bad�char"))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.mojibakeStats(seeded)
    }),
    // script composition over synthesized per-doc script mixes (repeat
    // counts driven by doc_id so dominance varies): Cyrillic 'а', Latin
    // 'a', CJK '你', digit '7' — both engines build the identical string
    "script_profile" -> ((s, dir) => {
      val mixed = t(s, dir, "documents").select(col("doc_id"), concat(
        expr("repeat('а', CAST(doc_id % 40 AS INT))"),
        expr("repeat('a', CAST(doc_id % 23 AS INT))"),
        expr("repeat('你', CAST(doc_id % 17 AS INT))"),
        expr("repeat('7', CAST(doc_id % 5 AS INT))")).as("text"))
      TextAnalysis.scriptProfile(mixed)
    }),
    // markup-to-text extraction, the step ahead of every quality filter:
    // the corpus is wrapped in deterministic real-shaped HTML (head/style/
    // script/entities/comment, sentences split across <p> blocks) by BOTH
    // engines, then the extraction chain must recover clean block text.
    // Row-local regexp chain — no shuffle beyond the presentation sort.
    "html_extract" -> ((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"), concat(
        lit("<html><head><title>Doc</title><style>body{color:#333} " +
          ".nav{display:none}</style></head><body>" +
          "<script type=\"text/javascript\">var lt = 1 < 2 && 3 > 2;</script>" +
          "<h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1><p>"),
        regexp_replace(col("text"), "\\. ", ".</p><p>"),
        lit("</p><div class=\"nav\"><ul><li>Home</li><li>About &amp; " +
          "&lt;contact&gt; &quot;mail&#39;s&quot;&nbsp;here</li></ul></div>" +
          "<!-- footer\ncomment --></body></html>")).as("html"))
      TextAnalysis.htmlExtract(pages).orderBy(col("doc_id"))
    }),
    "chunk_docs" -> ((s, dir) => TextAnalysis.chunkDocuments(t(s, dir, "documents"))),
    // content-defined chunking (Rabin-style md5 boundary trigger)
    "cdc_chunks" -> ((s, dir) => TextAnalysis.cdcChunks(t(s, dir, "documents"))),
    "contamination" -> ((s, dir) => TextAnalysis.contamination(t(s, dir, "documents"))),
    "contamination_bloom" -> ((s, dir) =>
      TextAnalysis.contaminationBloom(t(s, dir, "documents"))),
    "passage_dedup" -> ((s, dir) => TextAnalysis.passageDedup(t(s, dir, "documents"))),
    // global frequent-passage (boilerplate) removal: frequent spans drop
    // from EVERY document, not just after the first occurrence
    "boilerplate_filter" -> ((s, dir) =>
      TextAnalysis.boilerplateFilter(t(s, dir, "documents"))),
    // subword cost accounting: bounded-merge-table BPE, doc-local
    "bpe_tokens" -> ((s, dir) => TextAnalysis.bpeEncode(t(s, dir, "documents"))),
    // per-language tokens-per-word fertility + chars-per-token
    // compression from the same doc-local encode (e6 contract)
    "tokenizer_fertility" -> ((s, dir) =>
      TextAnalysis.tokenizerFertility(t(s, dir, "documents"))),
    // multi-dimensional data-layout keys: Morton-interleaved z-order
    // buckets with per-bucket bounding-box spans (the min/max pruning
    // guarantee, measured as data)
    "zorder_stats" -> ((s, dir) =>
      Layout.zorderStats(t(s, dir, "lineitem"))),
    // corpus-statistics quality: unigram-LM surprisal (join-formulated —
    // a count-over-token window would single-task the stop words)
    "unigram_logprob" -> ((s, dir) =>
      TextAnalysis.unigramLogProb(t(s, dir, "documents"))),
    // conditional upgrade: bigram-LM cross-entropy (CCNet-style
    // perplexity quality signal), add-one smoothed, model enriched
    // model-side so the corpus probe is ONE equi-join
    "bigram_logprob" -> ((s, dir) =>
      TextAnalysis.bigramLogProb(t(s, dir, "documents"))),
    // Kneser-Ney upgrade: absolute-discount interpolation with
    // CONTINUATION backoff — same one-equi-join probe shape, model
    // stats partial-aggregable over the bigram-TYPE relation
    "kn_bigram_logprob" -> ((s, dir) =>
      TextAnalysis.knBigramLogProb(t(s, dir, "documents"))),
    // CCNet's bucket step over the bigram scores: exact-rank thirds via
    // the public ExactRank under a constant group — no corpus ntile
    "perplexity_buckets" -> ((s, dir) =>
      TextAnalysis.perplexityBuckets(t(s, dir, "documents"))),
    // CCNet selection end-to-end: per-LANGUAGE bigram LM, documents
    // scored by their own language's model, per-language thirds via the
    // window-free ExactRank, keep = head+middle
    "ccnet_select" -> ((s, dir) =>
      TextAnalysis.ccnetSelect(t(s, dir, "documents"))),
    "tfidf_topk" -> ((s, dir) => TextAnalysis.tfidfTopK(t(s, dir, "documents"))),
    "bm25_rank" -> ((s, dir) => TextAnalysis.bm25(t(s, dir, "documents"))),
    // RM3-lite pseudo-relevance feedback: pass-1 top-10 docs nominate
    // 3 expansion terms, pass 2 re-ranks with the expanded set — one
    // lazy plan, no driver round-trip between passes
    "bm25_prf" -> ((s, dir) => TextAnalysis.bm25Prf(t(s, dir, "documents"))),
    // the search-serving complement: FLAT postings (one row per
    // token x doc — never a per-token array, the stop-word skew bomb)
    // and exact phrase serving via row-local position intersection.
    // Registered presentation serializes the position list CSV (the
    // baskets convention) — the ArrayType relation stays the engine API
    "inverted_index" -> ((s, dir) =>
      InvertedIndex.invertedIndexLines(t(s, dir, "documents"))),
    "phrase_search" -> ((s, dir) =>
      InvertedIndex.phraseSearch(t(s, dir, "documents"))),
    // the index PERSISTED bucketed on token and served back: the term
    // equality filters prune the scan to one bucket's files (Spark
    // bucket pruning — plan-pinned), bit-identical to the in-flight
    // serve, same oracle text
    "phrase_persisted" -> ((s, dir) => {
      graft.sources.TableSink.writeBucketed(
        InvertedIndex.postings(t(s, dir, "documents")),
        "graft_postings", "token", 8)
      InvertedIndex.phraseFromPostings(s.table("graft_postings"))
    }),
    // T5 span corruption: md5-PRNG deterministic masking, numbered
    // sentinels, (input, target) pair assembly via doc-bounded windows
    "span_corruption" -> ((s, dir) =>
      TextAnalysis.spanCorruption(t(s, dir, "documents"))),
    // fill-in-the-middle: md5 coin picks causal vs FIM per doc, two md5
    // cuts split prefix/middle/suffix, PSM sentinel reassembly — pure
    // row-local projection, zero shuffle
    "fim_transform" -> ((s, dir) =>
      TextAnalysis.fimTransform(t(s, dir, "documents"))),
    // BERT masked-LM corruption: 15% positions selected, 80/10/10
    // mask/random/keep off disjoint windows of ONE md5 per (doc, pos);
    // row-local (random replacement indexes the SAME doc's tokens)
    "mlm_mask" -> ((s, dir) =>
      TextAnalysis.mlmMask(t(s, dir, "documents"))),
    // hybrid retrieval: RRF over the BM25 and query-cosine top lists —
    // rank-only signal, two-term INTEGER fusion, bounded final window
    "rrf_fusion" -> ((s, dir) =>
      Retrieval.rrfFusion(t(s, dir, "documents"), t(s, dir, "embeddings"))),
    // the semantic leg served from the PERSISTED bucketed IVF index:
    // driver-side probe choice → literal cells → statically pruned index
    // read. numProbes=12: the fixture's embeddings are near-isotropic
    // (random 64-dim vectors barely cluster), so covering query 0's true
    // top-20 — which spans cells ranked 1st/2nd/4th/12th by the query —
    // needs 12 of 16 probes for recall 1; a real embedding corpus
    // clusters far better and serves from 1-2 probes. Same oracle text
    // as rrf_fusion — bit-identical at recall 1. The coverage claim is
    // pinned at the driver's verify scale by PipelineSpec
    // "rrf_fusion_indexed's numProbes=12 covers recall 1" — a fixture
    // change fails THERE with a bump-the-probe-count message instead of
    // an opaque hash mismatch here.
    "rrf_fusion_indexed" -> ((s, dir) => {
      val tbl = "graft_ivf_rrf"
      graft.sources.TableSink.writeBucketed(
        Similarity.ivfIndexRelation(t(s, dir, "embeddings")), tbl,
        "cluster_b", 8)
      Retrieval.rrfFusionIndexed(t(s, dir, "documents"), s.table(tbl),
        numProbes = 12)
    }),
    // ---- deduplication ---------------------------------------------------
    "dedup_exact" -> ((s, dir) => Dedup.exact(t(s, dir, "documents"))),
    // the third blocking family (after LSH bands and PassJoin
    // segments): rank-windowed candidates from a constant-group
    // ExactRank sort, blocked equi-join — O(n·w), skew-proof
    "sorted_neighborhood" -> ((s, dir) =>
      Dedup.sortedNeighborhood(t(s, dir, "documents"))),
    // end-to-end entity resolution: SNM blocking -> banded-Levenshtein
    // verification (<=10% edits; the 3-arg threshold form keeps the DP
    // O(threshold·len) instead of O(len²)) -> the shared CC engine.
    // The |len_a-len_b| prefilter is lossless (lev >= length gap).
    "entity_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cand = Dedup.sortedNeighborhood(docs)
      val ta = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
      val tb = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
      // edit budget = 10% of the longer text, capped at 58 so the DP
      // band is a constant on any corpus (the cap is shared with the
      // oracle — the rule, not just the optimization)
      val budget = least(greatest(length(col("text_a")),
        length(col("text_b"))), lit(580))
      // equality short-circuit before the DP: near-dup corpora are
      // dominated by EXACT duplicates (lev = 0 by definition), and the
      // banded DP still costs O(58·len) on them — measured 4.3× on the
      // 10× audit corpus where the planted dup load concentrates
      val verified = cand.join(ta, "doc_a").join(tb, "doc_b")
        .filter(abs(length(col("text_a")) - length(col("text_b"))) * 10
          <= budget)
        .withColumn("d", when(col("text_a") === col("text_b"), lit(0))
          .otherwise(levenshtein(col("text_a"), col("text_b"), 58)))
        .filter(col("d") >= 0 && col("d") * 10 <= budget)
        .select(col("doc_a"), col("doc_b"))
      val clusters = Dedup.nearDupClusters(verified)
      val sizes = clusters.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
      clusters.join(sizes, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("n_members"))
        .orderBy(col("doc_id"))
    }),
    // character-level fuzzy dedup: EXACT edit-distance self-join over
    // 40-char document title prefixes at typo distance 2 — lossless
    // PassJoin segment blocking (see FuzzyJoin), so the oracle is the
    // clean all-pairs definition, no blocking heuristic in sight
    "fuzzy_pairs" -> ((s, dir) =>
      FuzzyJoin.fuzzyPairs(
        t(s, dir, "documents").select(col("doc_id"),
          substring(col("text"), 1, 40).as("title")),
        "doc_id", "title", 2)
        .orderBy(col("id_a"), col("id_b"))),
    "ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccard(t(s, dir, "documents"))),
    // asymmetric overlap: |A∩B| / min(|A|,|B|) — catches a short doc
    // embedded in a long one, which Jaccard's union denominator buries
    "ngram_containment" -> ((s, dir) =>
      Dedup.ngramContainment(t(s, dir, "documents"))),
    // substring-level dedup (the Lee et al. repeated-span shape): corpus
    // profile of cross-doc repeated k-grams, and the per-doc keep mask
    "repeated_spans" -> ((s, dir) => Dedup.repeatedSpans(t(s, dir, "documents"))),
    "span_dedup" -> ((s, dir) => Dedup.spanDedup(t(s, dir, "documents"))),
    // index-quality audit: LSH candidates vs the exact n-gram ground truth
    "lsh_recall" -> ((s, dir) => Dedup.lshRecall(t(s, dir, "documents"))),
    // the empirical S-curve: one row per banding config of the same
    // 16 hashes — analytic threshold beside measured volume + recall
    "lsh_scurve" -> ((s, dir) => Dedup.lshScurve(t(s, dir, "documents"))),
    "minhash_lsh" -> ((s, dir) => Dedup.minhashLsh(t(s, dir, "documents"))),
    // the bounded Jaccard near-dup product: per-doc k nearest by
    // est_jaccard over the SAME capped band candidates — both cut axes
    // map-side WindowGroupLimit
    "minhash_partners" -> ((s, dir) =>
      Dedup.minhashPartners(t(s, dir, "documents"))),
    // pair detection → canonical cluster assignment (connected components)
    "dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashLsh(t(s, dir, "documents"))
        .select(col("doc_a"), col("doc_b"))
      // member count via partial-aggregable groupBy joined back, not a
      // cluster_id window: a web-scale megacluster (identical boilerplate
      // in 10⁸ docs) must not colocate in one window task. The labels
      // relation is cached by nearDupClusters, so both consumers reuse it.
      val clusters = Dedup.nearDupClusters(pairs)
      val sizes = clusters.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
      clusters.join(sizes, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("n_members"))
        .orderBy(col("doc_id"))
    }),
    // the dedup endpoint: corpus minus non-canonical near-dup members
    "dedup_keep" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.keepCanonical(docs,
          Dedup.minhashLsh(docs).select(col("doc_a"), col("doc_b")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("lang"))
    }),
    // dedup diagnostics: per-doc novel-shingle counts + the cumulative
    // novelty curve (first-owner min per shingle type, window-free
    // prefix sum — a flattening curve says "run dedup")
    "ngram_coverage" -> ((s, dir) =>
      Dedup.ngramCoverage(t(s, dir, "documents"))),
    // quality-aware keep: per cluster the LONGEST member survives
    // (n_chars argmax, tie min id) via a partial-aggregable
    // max(struct(quality, -id)) — no per-cluster window, megacluster-safe
    "dedup_keep_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.keepBest(docs,
          Dedup.minhashLsh(docs).select(col("doc_a"), col("doc_b")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_doc"),
          sum(col("n_chars")).as("kept_chars"))
        .orderBy(col("lang"))
    }),
    // reward-model data prep: per near-dup cluster the (quality argmax,
    // quality argmin) preference pair — same content both ends, so the
    // contrast is quality not topic; both extremes one partial-aggregable
    // groupBy, equal-quality ties (and thus singletons) emit nothing
    "preference_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.preferencePairs(docs,
        Dedup.minhashLsh(docs).select(col("doc_a"), col("doc_b")))
    }),
    // continuous-ingestion dedup: a mod-10 batch probed against the rest
    // of the corpus as base — no base×base join anywhere in the plan
    "dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.minhashIncremental(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0))
    }),
    // the dedup base index BUILT ONCE and SERVED from persisted bucketed
    // tables (bands + signatures via TableSink — the ann_ivf_persisted
    // build-once/probe-many discipline): true cross-session IVM for
    // dedup. Result must be bit-identical to dedup_incremental's
    // in-flight build — the driver checks it against that very oracle.
    "dedup_persisted" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // DISK_ONLY so the corpus-proportional shingle+minhash pipeline runs
      // once and feeds BOTH table writes (bands + sigs), not twice — the
      // same house rule minhashIncremental itself follows.
      val sigs = Dedup.minhashSignatures(docs.filter(col("doc_id") % 10 =!= 0))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      graft.sources.TableSink.writeBucketed(
        Dedup.minhashBandIndex(sigs), "graft_dedup_bands", "b0", 8)
      graft.sources.TableSink.writeBucketed(sigs, "graft_dedup_sigs",
        "doc_id", 8)
      sigs.unpersist()
      Dedup.minhashProbeIndex(docs.filter(col("doc_id") % 10 === 0),
        s.table("graft_dedup_bands"), s.table("graft_dedup_sigs"))
    }),
    // dedup_persisted's APPEND half: the odd-id half of the base corpus
    // builds the bucketed band/signature tables, the even-id half is
    // INSERTed into them (same bucket spec, base untouched), and the
    // batch probes the combined index — bit-identical to probing an
    // index built in one shot, which is the dedup_incremental oracle
    "dedup_appended" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val rest = docs.filter(col("doc_id") % 10 =!= 0)
      val sigsA = Dedup.minhashSignatures(rest.filter(col("doc_id") % 2 === 1))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      graft.sources.TableSink.writeBucketed(
        Dedup.minhashBandIndex(sigsA), "graft_dedup_bands_app", "b0", 8)
      graft.sources.TableSink.writeBucketed(sigsA, "graft_dedup_sigs_app",
        "doc_id", 8)
      sigsA.unpersist()
      val sigsB = Dedup.minhashSignatures(rest.filter(col("doc_id") % 2 === 0))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      graft.sources.TableSink.appendBucketed(
        Dedup.minhashBandIndex(sigsB), "graft_dedup_bands_app", "b0", 8)
      graft.sources.TableSink.appendBucketed(sigsB, "graft_dedup_sigs_app",
        "doc_id", 8)
      sigsB.unpersist()
      Dedup.minhashProbeIndex(docs.filter(col("doc_id") % 10 === 0),
        s.table("graft_dedup_bands_app"), s.table("graft_dedup_sigs_app"))
    }),
    // STREAMING × INCREMENTAL DEDUP — the continuous-ingestion
    // composition the two halves existed for: the base corpus's band +
    // signature index is built ONCE into persisted bucketed tables
    // (dedup_persisted's build), then a checkpointed document STREAM
    // probes it per micro-batch through foreachBatch with idempotent
    // batch_id partitions (events_table_stream's exactly-once recipe),
    // across a forced stop/restart. No base×base join ever appears in a
    // plan, per-batch cost is O(|batch|) against the pre-bucketed index,
    // and each batch doc's best-match is row-independent — so the
    // restart-replayed union must be bit-identical to the one-shot
    // probe, which is exactly dedup_incremental's oracle text.
    "dedup_incremental_stream" -> ((s, dir) =>
      withStreamStage("graft_dedup_inc_s") { stage =>
      val in = stage + "/in"; val sink = stage + "/sink"
      val ckpt = stage + "/ckpt"
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      // base index built once, served from the catalog (never rebuilt
      // per batch — the entire point of the composition)
      val sigs = Dedup.minhashSignatures(docs.filter(col("doc_id") % 10 =!= 0))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      graft.sources.TableSink.writeBucketed(
        Dedup.minhashBandIndex(sigs), "graft_dedup_bands_strm", "b0", 8)
      graft.sources.TableSink.writeBucketed(sigs, "graft_dedup_sigs_strm",
        "doc_id", 8)
      sigs.unpersist()
      val batch = docs.filter(col("doc_id") % 10 === 0)
      def run(): Unit = {
        val stream = s.readStream.schema(
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("doc_id",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("text",
                org.apache.spark.sql.types.StringType))))
          .option("maxFilesPerTrigger", 2).parquet(in)
        val q = stream.writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            graft.streaming.StreamingOps.writeBatchIdempotent(
              Dedup.minhashProbeIndex(b,
                s.table("graft_dedup_bands_strm"),
                s.table("graft_dedup_sigs_strm")), sink, id)
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      batch.filter(col("doc_id") % 20 === 0).repartition(2)
        .write.mode("overwrite").parquet(in)
      run() // phase 1: drains the staged half, clean stop
      batch.filter(col("doc_id") % 20 =!= 0).repartition(2)
        .write.mode("append").parquet(in)
      run() // phase 2: restart from the checkpoint — new files only
      // materialize before withStreamStage deletes the sink files —
      // into a stable OVERWRITTEN warehouse table, not a cache (a cache
      // keyed on the per-invocation temp path grows the persist set
      // every call: the r12 soak's growth class)
      graft.sources.TableSink.saveTable(
        s.read.parquet(sink).drop("batch_id"), "graft_dedup_inc_s_result")
      s.table("graft_dedup_inc_s_result").orderBy(col("doc_id"))
    }),
    "simhash" -> ((s, dir) => Dedup.simhash(t(s, dir, "documents"))),
    "simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(t(s, dir, "documents"))),
    // the OUTPUT-BOUNDED pair product (k nearest partners per document;
    // <= k*n rows at any duplicate-class size — the scale-safe sibling
    // the r11 x100 probe motivated); WindowGroupLimit plan-pinned
    "simhash_partners" -> ((s, dir) =>
      Dedup.simhashPartners(t(s, dir, "documents"))),
    // image-modality near-dup: dHash through the REAL ImageIO decode
    // seam (PNG-lossless, so the oracle replays the byte math exactly),
    // candidates via the same chunk-blocked Hamming band join as simhash.
    // The corpus's near-dups are token-level (shifted positions), which a
    // POSITIONAL perceptual hash rightly does not pair — so the fixture
    // appends a deterministic first-char-perturbed twin per 50th doc
    // (the nfc_normalize synthesis discipline): each twin must land
    // within a few gradient bits of its source, exercising the band join
    // and the Hamming filter on genuinely near (not just identical) images
    "phash_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val twins = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"),
          concat(lit("~"), expr("substring(text, 2)")).as("text"))
      Multimodal.phashPairs(docs.unionByName(twins))
    }),
    // the bounded image near-dup product (simhash_partners' image twin):
    // per image, k nearest dHash partners over hot-bucket-capped bands
    "phash_partners" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val twins = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"),
          concat(lit("~"), expr("substring(text, 2)")).as("text"))
      Multimodal.phashPartners(docs.unionByName(twins))
    }),
    // the image-dedup COMPOSITION: phash pairs feed the same
    // pointer-jumping connected-components engine as text/embedding
    // dedup (the dedup family is generator-agnostic — cosine_clusters'
    // exact pattern with the perceptual-hash candidate generator)
    "phash_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val twins = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"),
          concat(lit("~"), expr("substring(text, 2)")).as("text"))
      val pairs = Multimodal.phashPairs(docs.unionByName(twins))
        .select(col("doc_a"), col("doc_b"))
      val clusters = Dedup.nearDupClusters(pairs)
      val sizes = clusters.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
      clusters.join(sizes, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("n_members"))
        .orderBy(col("doc_id"))
    }),
    // ---- similarity search over embeddings -------------------------------
    "cosine_pairs" -> ((s, dir) => Similarity.cosinePairs(t(s, dir, "embeddings"), 0.4)),
    // embedding-cosine near-dup, end-to-end: pair detection by cosine
    // similarity -> connected-component clustering (the same
    // pointer-jumping engine as dedup_clusters, fed by a different
    // candidate generator — the dedup family is generator-agnostic)
    "cosine_clusters" -> ((s, dir) => {
      val pairs = Similarity.cosinePairs(t(s, dir, "embeddings"), 0.4)
        .select(col("vec_id").as("doc_a"), col("other_id").as("doc_b"))
      // member count via partial-aggregable groupBy joined back, not a
      // cluster_id window — same megacluster reasoning as dedup_clusters:
      // embedding-cosine dedup is exactly what finds a boilerplate
      // megacluster, and it must not colocate in one window task. The
      // labels relation is cached by nearDupClusters, so both sides of
      // the join reuse it.
      val clusters = Dedup.nearDupClusters(pairs)
      val sizes = clusters.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
      clusters.join(sizes, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("n_members"))
        .orderBy(col("doc_id"))
    }),
    "ann_topk" -> ((s, dir) => Similarity.bruteForceTopK(t(s, dir, "embeddings"))),
    "ann_lsh_topk" -> ((s, dir) => Similarity.lshTopK(t(s, dir, "embeddings"))),
    // OR-construction: 2 independent 8-plane tables — the scale knob pair
    // (planes up with log2(corpus) to cap bucket volume, tables up to buy
    // the recall back)
    "ann_lsh_multi" -> ((s, dir) =>
      Similarity.lshTopKMulti(t(s, dir, "embeddings"), numTables = 2)),
    "ann_ivf_topk" -> ((s, dir) => Similarity.ivfTopK(t(s, dir, "embeddings"))),
    // IVF with a PERSISTED bucketed index: the cell-assigned index
    // relation is built once and written bucketed on the cell id (its one
    // shuffle happens at WRITE time), read back from the catalog, and the
    // cell-equi serve join reads it pre-partitioned — the
    // build-once/probe-many shape of a production ANN service, where the
    // corpus-sized index side must not reshuffle per query batch.
    // Results are identical to ann_ivf_topk (same centroids, same
    // arithmetic) so the driver checks this against that very oracle
    // text; TableSinkSpec holds the no-exchange bucketed-read guarantee.
    "ann_ivf_persisted" -> ((s, dir) => {
      val tbl = "graft_ivf_index"
      graft.sources.TableSink.writeBucketed(
        Similarity.ivfIndexRelation(t(s, dir, "embeddings")), tbl,
        "cluster_b", 8)
      Similarity.ivfTopKFromIndex(t(s, dir, "embeddings"), s.table(tbl))
    }),
    // the BATCHED indexed serve (r13 verdict item 7): one plan serves a
    // query batch from the persisted bucketed index — distributed
    // bounded probe ranking, union-of-probed-cells literal IN (static
    // multi-cell bucket pruning, plan-pinned), per-query cell-equi join.
    // Bit-identical per query to the single-query serve at the same
    // probe count (spec-pinned).
    "ann_batch_serve" -> ((s, dir) => {
      val tbl = "graft_ivf_batch"
      graft.sources.TableSink.writeBucketed(
        Similarity.ivfIndexRelation(t(s, dir, "embeddings")), tbl,
        "cluster_b", 8)
      Similarity.queryTopKBatchFromIndex(s.table(tbl), maxQueries = 8,
        numProbes = 2)
    }),
    // STREAMING ANN SERVE composition (the dedup_incremental_stream
    // shape for similarity): the IVF index is built ONCE over the corpus
    // and persisted bucketed on the cell id; a checkpointed query-vector
    // stream probes it per micro-batch via exactly-once foreachBatch
    // batch_id partitions, across a forced stop/restart. Bit-identical
    // to the one-shot probe of the same query set — the oracle replays
    // that batch definition. At 100 TB this is the ANN service loop:
    // index shuffle paid at write time, each query batch reads the
    // pre-partitioned cells, no base rebuild anywhere in the stream.
    "ann_ivf_stream" -> ((s, dir) =>
      withStreamStage("graft_ann_s") { stage =>
        val in = stage + "/in"; val sink = stage + "/sink"
        val ckpt = stage + "/ckpt"
        val emb = t(s, dir, "embeddings")
        graft.sources.TableSink.writeBucketed(
          Similarity.ivfIndexRelation(emb), "graft_ann_stream_idx",
          "cluster_b", 8)
        val queries = emb.filter(col("vec_id") % 10 === 0)
        def run(): Unit = {
          val stream = s.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 2).parquet(in)
          val q = stream.writeStream
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
              graft.streaming.StreamingOps.writeBatchIdempotent(
                Similarity.ivfTopKFromIndex(b,
                  s.table("graft_ann_stream_idx")), sink, id)
            }
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        queries.filter(col("vec_id") % 20 === 0).repartition(2)
          .write.mode("overwrite").parquet(in)
        run() // phase 1: drains the staged half, clean stop
        queries.filter(col("vec_id") % 20 =!= 0).repartition(2)
          .write.mode("append").parquet(in)
        run() // phase 2: restart from the checkpoint — new files only
        graft.sources.TableSink.saveTable(
          s.read.parquet(sink).drop("batch_id"), "graft_ann_stream_result")
        s.table("graft_ann_stream_result").orderBy(col("vec_id"), col("rk"))
      }),
    // the bounded embedding k-NN JOIN (simhash_partners' vector twin):
    // per vector, k nearest by cosine over the whole corpus, blocked by
    // IVF cell assignment with the index side of each cell capped at
    // maxCell members — both cut axes on map-side WindowGroupLimit
    // (plan-pinned). Closes the partners product across all three
    // modalities: text fingerprints, images, embeddings.
    "ann_partners" -> ((s, dir) =>
      Similarity.annPartners(t(s, dir, "embeddings"))),
    // the auto-sized twin of the partners product (centroidsFor — the
    // ann_ivfpq_auto discipline applied to the load-bearing k-NN join;
    // hard_negatives and bitext_mine ride the same cell-blocked core,
    // so the sizing transfers to them through this measured form)
    "ann_partners_auto" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.annPartners(emb,
        numCentroids = Similarity.centroidsFor(emb.count()))
    }),
    // the INSERT half of IVF index maintenance (dedup_appended's shape
    // for ANN): the base four-fifths of the corpus builds the bucketed
    // index, the remaining fifth is assigned against the centroids
    // RECOVERED FROM THE INDEX (frozen coarse quantizer — the FAISS
    // discipline) and APPENDED under the same bucket spec at O(delta)
    // cost; the serve over the appended table is bit-identical to
    // probing a one-shot full rebuild, which is exactly the
    // ann_ivf_persisted oracle text. The base slice keeps every
    // vec_id < NumCentroids so the recovered quantizer IS the
    // parameterized full-corpus one.
    "ann_index_append" -> ((s, dir) => {
      val tbl = "graft_ivf_index_app"
      val emb = t(s, dir, "embeddings")
      val base = emb.filter(col("vec_id") % 5 =!= 4 ||
        col("vec_id") < Similarity.NumCentroids)
      val delta = emb.filter(col("vec_id") % 5 === 4 &&
        col("vec_id") >= Similarity.NumCentroids)
      graft.sources.TableSink.writeBucketed(
        Similarity.ivfIndexRelation(base), tbl, "cluster_b", 8)
      graft.sources.TableSink.appendBucketed(
        Similarity.ivfIndexDelta(delta, s.table(tbl)), tbl, "cluster_b", 8)
      Similarity.ivfTopKFromIndex(emb, s.table(tbl))
    }),
    // the COMPACTION close of the ANN index lifecycle (r13 verdict
    // item 5): base build + TWO delta append generations (3 file sets
    // per bucket), then compactBucketed rewrites to ONE file per bucket
    // under the same spec — the serve over the compacted index is
    // bit-identical to ann_ivf_persisted's one-shot build (same oracle
    // text); the file-count drop and preserved bucket pruning are
    // pinned in TableSinkSpec. At 100 TB this is the OPTIMIZE verb a
    // daily-append vector index needs before scan task count goes
    // generation-bound.
    "ann_index_compacted" -> ((s, dir) => {
      val tbl = "graft_ivf_index_cmp"
      val emb = t(s, dir, "embeddings")
      val base = emb.filter(col("vec_id") % 5 < 3 ||
        col("vec_id") < Similarity.NumCentroids)
      def gen(r: Int) = emb.filter(col("vec_id") % 5 === r &&
        col("vec_id") >= Similarity.NumCentroids)
      graft.sources.TableSink.writeBucketed(
        Similarity.ivfIndexRelation(base), tbl, "cluster_b", 8)
      graft.sources.TableSink.appendBucketed(
        Similarity.ivfIndexDelta(gen(3), s.table(tbl)), tbl, "cluster_b", 8)
      graft.sources.TableSink.appendBucketed(
        Similarity.ivfIndexDelta(gen(4), s.table(tbl)), tbl, "cluster_b", 8)
      graft.sources.TableSink.compactBucketed(s, tbl, "cluster_b", 8)
      Similarity.ivfTopKFromIndex(emb, s.table(tbl))
    }),
    // the HEAD-BOUNDED audit twin of the index LIFECYCLE (the r13
    // pq_recall treatment, applied where the r14 x100 notch caught the
    // serve-everything form going quadratic under a frozen quantizer —
    // BENCH_NOTES r14): the same base build + two append generations +
    // compaction as ann_index_compacted, but served through the BOUNDED
    // batch serve (first-8 query head, 2 probes) instead of probing
    // every corpus vector. Work is build O(N·nlist) + serve O(head ·
    // cell-pop), so the lifecycle finally has honest x100 rows. Append
    // and compaction preserve the index ROWS bit-exactly (frozen
    // quantizer + rewrite-in-place), so the serve is bit-identical to
    // ann_batch_serve over the one-shot index — same oracle text.
    "ann_lifecycle_serve" -> ((s, dir) => {
      val tbl = "graft_ivf_index_lc"
      val emb = t(s, dir, "embeddings")
      val base = emb.filter(col("vec_id") % 5 < 3 ||
        col("vec_id") < Similarity.NumCentroids)
      def gen(r: Int) = emb.filter(col("vec_id") % 5 === r &&
        col("vec_id") >= Similarity.NumCentroids)
      graft.sources.TableSink.writeBucketed(
        Similarity.ivfIndexRelation(base), tbl, "cluster_b", 8)
      graft.sources.TableSink.appendBucketed(
        Similarity.ivfIndexDelta(gen(3), s.table(tbl)), tbl, "cluster_b", 8)
      graft.sources.TableSink.appendBucketed(
        Similarity.ivfIndexDelta(gen(4), s.table(tbl)), tbl, "cluster_b", 8)
      graft.sources.TableSink.compactBucketed(s, tbl, "cluster_b", 8)
      Similarity.queryTopKBatchFromIndex(s.table(tbl), maxQueries = 8,
        numProbes = 2)
    }),
    // PQ encoding (Jégou et al.): per (vector, subspace) the nearest
    // codeword by squared L2 — 8 subspaces × 16 codewords, flat rows,
    // broadcast codebook, map-side argmin window. The 64×-compression
    // complement to quantize_embeddings' scalar int8.
    "pq_encode" -> ((s, dir) =>
      Similarity.pqEncode(t(s, dir, "embeddings"))),
    // IVF-PQ (IVFADC) serve: IVF-cell candidates scored from their PQ
    // CODES via the asymmetric-distance lookup table — every LUT entry an
    // exact floor(d2·1e6) integer, so the ADC sum and ranking are
    // hash-exact. The corpus side of the serve join carries 4-byte codes
    // instead of 256-byte vectors — the index-fits-on-disk path at 100 TB.
    "ann_ivfpq_topk" -> ((s, dir) =>
      Similarity.ivfpqTopK(t(s, dir, "embeddings"))),
    // the CORPUS-ADAPTIVE twin (r13 verdict item 2): centroid count from
    // centroidsFor(count) so expected cell population stays constant —
    // the sizing that keeps the in-cell candidate join LINEAR at x100
    // where the frozen-16-centroid form grows cell populations 100×.
    // Oracle mirrors the sizing as a scalar subquery over embeddings.
    "ann_ivfpq_auto" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfpqTopK(emb,
        numCentroids = Similarity.centroidsFor(emb.count()))
    }),
    // the HIERARCHICAL-assignment twin (FAISS IMI shape): auto nlist +
    // two-level coarse quantization — once nlist grows with the corpus,
    // the flat N·nlist assignment is the dominant superlinear stage
    // (measured, BENCH_NOTES r14) and the √nlist-way hierarchy cuts it
    // to N·2√nlist. Own oracle (two-level argmax replayed exactly).
    "ann_ivfpq_imi" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfpqTopK(emb,
        numCentroids = Similarity.centroidsFor(emb.count()),
        twoLevel = true)
    }),
    // measured IVFADC retrieval quality: exact counts of true/candidate/
    // hit pairs over the bounded query head — lsh_recall's discipline for
    // the PQ serve, so quantization-quality regressions fail the hash gate
    // k-NN majority-vote label quality over the exact neighbor lists:
    // exact counts + e6 accuracy, argmin-struct vote (no window)
    "knn_label_eval" -> ((s, dir) =>
      Similarity.knnLabelEval(t(s, dir, "embeddings"))),
    // Matryoshka truncation recall: full-dim exact top-k vs the same
    // scan on the first 16 dims — the measured-quality row for serving
    // prefix embeddings (pq_recall's discipline, truncation knob)
    "matryoshka_recall" -> ((s, dir) =>
      Similarity.matryoshkaEval(t(s, dir, "embeddings"))),
    "pq_recall" -> ((s, dir) =>
      Similarity.pqRecall(t(s, dir, "embeddings"))),
    // measured quality for the r14 quantizers (the "quality held" leg of
    // corpus-adaptive sizing): same exact-count recall row, candidates
    // from the auto-sized flat and two-level IMI serves respectively
    "pq_recall_auto" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqRecall(emb,
        numCentroids = Similarity.centroidsFor(emb.count()))
    }),
    "pq_recall_imi" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqRecall(emb,
        numCentroids = Similarity.centroidsFor(emb.count()),
        twoLevel = true)
    }),
    // RESIDUAL PQ (the true FAISS IVFADC): codes encode v − centroid[cell]
    // — residuals are centered, so the same 4-byte budget spends itself on
    // a tighter distribution. Codebook = residual slices of vectors 16..31
    // (the first 16 ARE the centroids; their residuals are zero).
    "pq_encode_residual" -> ((s, dir) =>
      Similarity.pqEncodeResidual(t(s, dir, "embeddings"))),
    // the residual-space IVFADC serve: query LUT and candidate codes both
    // in residual space — the shared centroid cancels, so the ADC sum
    // estimates ||q−b||². Wins when the corpus clusters (production
    // embeddings); measurably loses on the near-isotropic fixture —
    // pq_residual_gain / pq_recall_residual carry the honest numbers.
    "ann_ivfpq_residual" -> ((s, dir) =>
      Similarity.ivfpqResidualTopK(t(s, dir, "embeddings"))),
    // ADC shortlist (top-20 by codes) + full-precision cosine rerank —
    // the standard two-stage IVFPQ serve; the rerank join touches kAdc
    // vectors per query, never the cell population
    "ann_ivfpq_rerank" -> ((s, dir) =>
      Similarity.ivfpqRerankTopK(t(s, dir, "embeddings"))),
    // THE REGISTERED PRIMARIES of the IVFPQ family (r14 verdict item 3):
    // same index math as the serve-everything twins above, answered for
    // the bounded first-ServeHead query batch — build O(N·assign) +
    // serve O(head·cell) instead of the O(N·cell) every-vector-a-query
    // audit shape (which stays registered for oracle continuity). This
    // is the 100 TB serving economics: the index side never depends on
    // how many queries arrive.
    "ann_ivfpq_serve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfpqTopK(emb, queries = Similarity.serveHead(emb))
    }),
    "ann_ivfpq_auto_serve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfpqTopK(emb,
        numCentroids = Similarity.centroidsFor(emb.count()),
        queries = Similarity.serveHead(emb))
    }),
    "ann_ivfpq_imi_serve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfpqTopK(emb,
        numCentroids = Similarity.centroidsFor(emb.count()),
        twoLevel = true, queries = Similarity.serveHead(emb))
    }),
    "ann_ivfpq_residual_serve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfpqResidualTopK(emb, queries = Similarity.serveHead(emb))
    }),
    "ann_ivfpq_rerank_serve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfpqRerankTopK(emb, queries = Similarity.serveHead(emb))
    }),
    // the residual-vs-raw coding tradeoff as ONE row of exact integers:
    // total reconstruction error under the same codebook budget (raw wins
    // on the near-isotropic fixture, residual wins on clustered corpora —
    // the row makes the choice a measurement, not an assumption)
    "pq_residual_gain" -> ((s, dir) =>
      Similarity.pqResidualGain(t(s, dir, "embeddings"))),
    // measured-quality rows for the two new serves (exact presence counts
    // against the brute-force ground truth, candidates head-restricted)
    "pq_recall_residual" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqRecallWith(emb,
        qs => Similarity.ivfpqResidualTopK(emb, queries = qs))
    }),
    "pq_recall_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqRecallWith(emb,
        qs => Similarity.ivfpqRerankTopK(emb, queries = qs))
    }),
    // hard-negative mining for contrastive training: per anchor, the k
    // highest-cosine DIFFERENT-label vectors — annPartners' bounded
    // dataflow with a label-mismatch predicate in the candidate join
    "hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(t(s, dir, "embeddings"))),
    // margin-based bitext mining (Artetxe–Schwenk / CCMatrix): best
    // cross-lingual partner per source doc by cosine normalized against
    // both sides' k-NN neighborhood averages; IVF-cell-blocked candidate
    // join, exact-integer margin arithmetic
    "bitext_mine" -> ((s, dir) =>
      Similarity.bitextMine(t(s, dir, "documents"), t(s, dir, "embeddings"))),
    "quantize_embeddings" -> ((s, dir) =>
      Similarity.quantizeEmbeddings(t(s, dir, "embeddings"))),
    // the IVF recall knob: queries probe their top-2 cells (index side
    // unchanged) — pairs with ann_lsh_multi's OR-construction as the two
    // standard ways to buy ANN recall without growing the index
    "ann_ivf_multiprobe" -> ((s, dir) =>
      Similarity.ivfTopKMultiprobe(t(s, dir, "embeddings"))),
    // the IVF recall-vs-probe-count curve: exact presence counts per
    // probe setting vs the brute-force ground truth — recall monotone by
    // construction, exhaustive at 16 probes (n_hit == n_true, spec-pinned)
    "ivf_probe_recall" -> ((s, dir) =>
      Similarity.ivfProbeRecall(t(s, dir, "embeddings"))),
    // KMeans-trained IVF through the same serving dataflow. Lloyd's
    // iterations aren't SQL-expressible, so the driver-facing columns are
    // structural accuracy-contract booleans (approx_stats precedent): the
    // oracle emits literal TRUE and a malformed/low-recall index flips a
    // boolean and fails the hash gate. Score-exactness and tighter recall
    // are asserted in PipelineSpec.
    "ann_ivf_trained" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // trains on (at most) the first 2000 vectors — deterministic, and at
      // any sf below that the full corpus, so the sf0.01 gate is unchanged
      val res = Similarity.ivfTopKTrained(emb, 5, maxTrainVectors = 2000)
      val perQ = res.groupBy(col("vec_id")).agg(
        max(col("rk")).as("max_rk"), count(lit(1)).as("n"),
        countDistinct(col("cluster")).as("n_cl"))
      val structural = perQ.agg(
        (max(when(col("max_rk") === col("n") && col("n") <= 5, 0)
          .otherwise(1)) === 0).as("rk_contiguous"),
        (max(when(col("n_cl") === 1, 0).otherwise(1)) === 0)
          .as("one_cluster_per_query"))
      // recall probed on a deterministic 250-query sample: the exact
      // ground truth is the expensive part of this row (the full-corpus
      // brute force is its own registered query, ann_topk) and a fixed
      // subsample bounds that cost while keeping the boolean meaningful;
      // PipelineSpec asserts recall on the full query set
      val trueTopK = Similarity.bruteForceTopK(emb, 5, maxQueries = 250)
        .select(col("vec_id"), col("other_id"))
      val nTrue = trueTopK.agg(count(lit(1)).as("n_true"))
      val nHit = res.select(col("vec_id"), col("other_id"))
        .join(trueTopK, Seq("vec_id", "other_id"))
        .agg(count(lit(1)).as("n_hit"))
      structural.crossJoin(nHit).crossJoin(nTrue)
        .select(col("rk_contiguous"), col("one_cluster_per_query"),
          (col("n_hit") >= col("n_true") * 0.1).as("recall_ge_10pct"))
    }),
    // HASH-EXACT Lloyd's k-means (r15 — the oracle-replayable twin of
    // ann_ivf_trained's float KMeans): components e6-quantized first,
    // then every Lloyd round in pure integer arithmetic — BIGINT
    // squared-L2 argmin, floored-integer centroid means in shifted
    // space — so assignments AND centroids join the hash gate instead
    // of hiding behind structural booleans
    "kmeans_assign" -> ((s, dir) =>
      Similarity.kmeansLloyd(t(s, dir, "embeddings"))),
    "kmeans_centroids" -> ((s, dir) =>
      Similarity.kmeansCentroidsLong(t(s, dir, "embeddings"))),
    // SemDeDup corpus verdict — same structural-oracle pattern: n_total is
    // oracle-exact, the invariants are computed from the materialized
    // relations and the oracle emits literal TRUE (see ann_ivf_trained)
    "semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedup(t(s, dir, "embeddings"), maxTrainVectors = 2000)),
    // JL dense reduction: pre-sign LSH plane coordinates, exact oracle
    "random_projection" -> ((s, dir) =>
      Similarity.randomProjection(t(s, dir, "embeddings"))),
    // distributed Gram + driver-local spectral solve (structural
    // oracle; the projection-variance boolean is the distributed
    // cross-check of the driver algebra)
    "pca_summary" -> ((s, dir) =>
      Similarity.pcaSummary(t(s, dir, "embeddings"))),
    // the LEARNED quality filter layered on the rule filters: hashed-
    // token logistic regression trained on gopher verdicts, scored
    // row-locally; structural oracle (ann_ivf_trained pattern) with a
    // holdout-accuracy + beats-majority contract
    // the corpus-contract stoplist mirrors gopher_quality's registration
    "quality_model" -> ((s, dir) =>
      QualityModel.learnedQuality(t(s, dir, "documents"),
        stopList = Seq("the", "a"))),
    // O4 over token sequences + the end-to-end cleaning pipeline
    "text_cooccur" -> ((s, dir) => TextAnalysis.tokenCoOccurrence(t(s, dir, "documents"))),
    "pipeline_clean" -> ((s, dir) => TextAnalysis.cleanCorpus(t(s, dir, "documents"))),
    // ---- unordered association rules (FPGrowth-shaped, 2-itemsets) -------
    "assoc_rules" -> ((s, dir) => MarketBasket.rules(t(s, dir, "lineitem"))),
    // SEQUENTIAL rules — the reference domain's temporal extension:
    // P(next order has b | current has a) over consecutive order pairs
    // per customer (lead window per customer, basket-bounded transition
    // join, exact-integer confidence)
    "next_purchase_rules" -> ((s, dir) => MarketBasket.nextPurchaseRules(
      t(s, dir, "orders"), t(s, dir, "lineitem"))),
    // scale-invariant fractional support (r10 audit: the count-2 anchor was
    // the surface's one superlinear decade row); oracle computes the same
    // ceil(fraction * n) admission, so parity holds at every SF
    "fpgrowth_rules" -> ((s, dir) => MarketBasket.fpgrowthRules(t(s, dir, "lineitem"),
      minSupportFraction = Some(MarketBasket.ScaleInvariantSupport))),
    "rolling_fingerprint" -> ((s, dir) =>
      TextAnalysis.rollingFingerprint(t(s, dir, "documents"))),
    // ---- multimodal column plumbing (stubbed decode) ---------------------
    "multimodal_meta" -> ((s, dir) => Multimodal.mediaMeta(t(s, dir, "documents"))),
    "media_frames" -> ((s, dir) => Multimodal.sampleFrames(t(s, dir, "documents"))),
    // *_stub: self-describing registry names (r13 verdict) — these two
    // serve DETERMINISTIC STUB kernels whose value is the Spark-side
    // plumbing (mapPartitions codec seam, batch shape, binary in/out);
    // their REAL twins are registered alongside: image_embed_real (the
    // ImageIO-decoded embedding) and media_decode_real (the ImageIO
    // decode → resize → re-decode round trip)
    // the stub codecs (embedStub / resizeMedia) stay as TEST SEAMS only —
    // PipelineSpec pins them against their Catalyst twins; every
    // REGISTERED media path runs the real kernels (media_decode_real,
    // audio_decode_real, video_decode_real, media_hamming/cosine families)
    // the REAL javax.imageio kernels, driver-checked (ann_ivf_trained
    // accuracy-contract pattern): synthesize a solid PNG per doc_id,
    // decode → resize → re-decode, emit DECODED dims + exact pixel check;
    // the oracle recomputes the dims from doc_id and emits literal TRUE
    "media_decode_real" -> ((s, dir) =>
      Multimodal.imageRoundTrip(t(s, dir, "documents"), maxDim = 4)),
    // REAL image embeddings: 8×8 grayscale PNG per doc (positional
    // downsample), decoded back through ImageIO, quadrant luminance +
    // gradient-energy features read from the CODEC's raster (PNG is
    // lossless, so the oracle replays the byte math); presentation is
    // the 8 scalar features — the ArrayType relation is the engine API
    "image_embed_real" -> ((s, dir) => {
      val emb = Multimodal.imageEmbeddings(t(s, dir, "documents"))
      emb.select(col("vec_id").as("doc_id") +:
          (0 until 8).map(i =>
            element_at(col("embedding"), i + 1).cast("long").as(s"f$i")): _*)
        .orderBy(col("doc_id"))
    }),
    // the multimodal retrieval loop with zero stub in the path: decode →
    // embed → bounded k-NN join through the ann_partners core (IVF-cell
    // blocked, capped index side, both cuts map-side WindowGroupLimit)
    "image_ann_partners" -> ((s, dir) =>
      Multimodal.imageAnnPartners(t(s, dir, "documents"))),
    // the AUDIO leg of the same loop: WAV encode→decode energy-profile
    // embedding (window sums kept as magnitudes, not gradient signs)
    "audio_embed_real" -> ((s, dir) => {
      val emb = Multimodal.audioEmbeddings(t(s, dir, "documents"))
      emb.select(col("vec_id").as("doc_id") +:
          (0 until 8).map(i =>
            element_at(col("embedding"), i + 1).cast("long").as(s"f$i")): _*)
        .orderBy(col("doc_id"))
    }),
    "audio_ann_partners" -> ((s, dir) =>
      Multimodal.audioAnnPartners(t(s, dir, "documents"))),
    // the VIDEO leg: Y4M demux temporal luma-profile embedding
    "video_embed_real" -> ((s, dir) => {
      val emb = Multimodal.videoEmbeddings(t(s, dir, "documents"))
      emb.select(col("vec_id").as("doc_id") +:
          (0 until 8).map(i =>
            element_at(col("embedding"), i + 1).cast("long").as(s"f$i")): _*)
        .orderBy(col("doc_id"))
    }),
    "video_ann_partners" -> ((s, dir) =>
      Multimodal.videoAnnPartners(t(s, dir, "documents"))),
    // REAL audio kernel (javax.sound.sampled WAV round-trip) through the
    // same mapPartitions codec seam — header decode + lossless-PCM
    // payload check, oracle recomputes the format from doc_id arithmetic
    "audio_decode_real" -> ((s, dir) =>
      Multimodal.audioRoundTrip(t(s, dir, "documents"))),
    // REAL video kernel (pure-JVM YUV4MPEG2 demux round-trip) through the
    // same seam — header parse + frame walk + exact constant-plane luma
    // check, oracle recomputes dims/frames/luma from doc_id arithmetic
    "video_decode_real" -> ((s, dir) =>
      Multimodal.videoRoundTrip(t(s, dir, "documents"))),
    // the bounded VIDEO near-dup product — the partners relation's third
    // modality: per-doc synthetic C420 stream through the REAL Y4M demux
    // → per-frame mean luma → 64 temporal gradient bits → the same
    // generator-agnostic capped partner core as simhash/phash. The
    // oracle replays every fingerprint bit from doc_id's integer
    // arithmetic (videoRoundTrip discipline) + the shared partner replay
    "video_phash_partners" -> ((s, dir) =>
      Multimodal.videoPhashPartners(t(s, dir, "documents"))),
    // the audio leg: window-energy gradient bits through the real WAV
    // encode -> decode seam; oracle replays them from doc_id arithmetic
    "audio_phash_partners" -> ((s, dir) =>
      Multimodal.audioPhashPartners(t(s, dir, "documents"))),
    // ---- deterministic sampling / splits (training-data pipeline) --------
    "dataset_split" -> ((s, dir) => Sampling.datasetSplit(t(s, dir, "documents"))),
    // CURRICULUM ordering (r14 — Bengio et al.'s easy-to-hard schedule
    // as a data-prep relation): documents ranked globally by a
    // difficulty proxy (subword token count, the house tokenizer
    // convention), cut into EXACT quartile tiers via the window-free
    // ExactRank global pass — ((rnk−1)·4) div n is pure integer math, so
    // tier boundaries are hash-exact — then md5-shuffled WITHIN each
    // tier (a second ExactRank pass, 4 groups) so each curriculum phase
    // streams in deterministic shuffled order. No global ORDER BY
    // window anywhere: both passes parallelize at partition width.
    "curriculum_order" -> ((s, dir) => {
      val c = t(s, dir, "documents").select(col("doc_id"),
          size(regexp_extract_all(col("text"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .cast("long").as("n_subword_tokens"))
        .withColumn("g", lit(0))
      val ranked = ExactRank.exactRank(c, Seq("g"),
        Seq("n_subword_tokens", "doc_id"))
      val tiered = ranked
        .withColumn("tier", expr("CAST(((rnk - 1) * 4) div n_group AS INT)"))
        .withColumn("k", md5(concat_ws("|", lit("cur"), col("doc_id"))))
        .select(col("doc_id"), col("n_subword_tokens"), col("tier"), col("k"))
      ExactRank.exactRank(tiered, Seq("tier"), Seq("k", "doc_id"),
          rankCol = "pos_in_tier")
        .select(col("doc_id"), col("n_subword_tokens"), col("tier"),
          col("pos_in_tier"))
        .orderBy(col("tier"), col("pos_in_tier"))
    }),
    // the curriculum TRAINING LAYOUT (r14 — pack_sequences composed
    // with curriculum_order): each difficulty tier is its own token
    // stream, laid in the tier's shuffled order and cut every 512
    // tokens — the per-phase loader relation a curriculum schedule
    // consumes. One grouped window-free prefix-sum pass (4 groups).
    "pack_curriculum" -> ((s, dir) => {
      val c = t(s, dir, "documents").select(col("doc_id"),
          size(regexp_extract_all(col("text"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .cast("long").as("n_subword_tokens"))
        .withColumn("g", lit(0))
      val ranked = ExactRank.exactRank(c, Seq("g"),
        Seq("n_subword_tokens", "doc_id"))
      val tiered = ranked
        .withColumn("tier", expr("CAST(((rnk - 1) * 4) div n_group AS INT)"))
        .withColumn("k", md5(concat_ws("|", lit("cur"), col("doc_id"))))
        .select(col("doc_id"), col("n_subword_tokens"), col("tier"), col("k"))
      val cur = ExactRank.exactRank(tiered, Seq("tier"), Seq("k", "doc_id"),
        rankCol = "pos_in_tier")
      Packing.packGrouped(cur.select(col("tier").as("grp"),
        col("pos_in_tier").as("ord"), col("doc_id"),
        col("n_subword_tokens").as("len")))
    }),
    // DSIR importance weighting: hashed-ngram target/raw log ratio — one
    // scan fits BOTH distributions (conditional agg), 256-row broadcast
    // model, integer-e6 scores; selection is a bounded TakeOrdered
    "dsir_weights" -> ((s, dir) => Dsir.dsirWeights(t(s, dir, "documents"))),
    "dsir_select" -> ((s, dir) => Dsir.dsirSelect(t(s, dir, "documents"))),
    // GPT-style concat-and-chunk sequence packing over ONE GLOBAL token
    // stream (pack_sequences is the per-shard layout; this is the
    // (sequence, doc, span) assignment relation): the global offset is
    // ONE window-free exactPrefixSum pass; the rest is row-local span
    // arithmetic + a bounded explode
    "pack_spans" -> ((s, dir) =>
      Packing.packSequences(t(s, dir, "documents"))),
    "pack_summary" -> ((s, dir) =>
      Packing.packSummary(t(s, dir, "documents"))),
    // packing on the LEARNED tokenizer's budgets: bpeTrainedEncode's
    // per-doc BPE token counts feed the same window-free packing core —
    // the tokenizer-agnostic seam demonstrated with a real tokenizer
    "pack_bpe" -> ((s, dir) =>
      Packing.packFromLengths(
        TextAnalysis.bpeTrainedEncode(t(s, dir, "documents"))
          .select(col("doc_id"), col("n_bpe_tokens").as("len")))),
    // THE full pretraining-data pipeline, composed end-to-end: Gopher
    // gate -> C4 line repair -> MinHash-LSH canonical dedup -> DSIR
    // selection (target lang + top-k importance-weighted raw docs) ->
    // sequence packing on the LEARNED tokenizer's real budgets (BPE
    // trained on the curated corpus itself). Every stage is individually
    // oracle-checked; this row checks their COMPOSITION. The curated
    // corpus is operator-scope cached (CacheScope) because the tokenizer
    // legitimately reads it twice (train + encode) — everything upstream
    // stays one lazy plan per source.
    "pipeline_dsir_pack" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val gKeep = TextAnalysis.gopherQuality(docs, stopList = Seq("the", "a"))
        .filter(col("keep")).select(col("doc_id"))
      val repaired = TextAnalysis.c4LineFilter(docs.join(gKeep, Seq("doc_id")),
          minLineWords = 50, requireTerminalPunct = false)
        .filter(col("keep"))
        .select(col("doc_id"), col("clean_text").as("text"))
      val cleaned = repaired.join(docs.select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      val kept = Dedup.keepCanonical(cleaned,
        Dedup.minhashLsh(cleaned).select(col("doc_a"), col("doc_b")))
      val sel = Dsir.dsirSelect(kept, k = 100).select(col("doc_id"))
      // matchingActions = 2: the BPE trainer's word-type collect is a
      // legitimate internal Dataset action over this relation — releasing
      // on it (the default first-match) would recompute the entire
      // curation chain for the encode action that follows
      val corpus = graft.operators.CacheScope.selfReleasing(
        kept.filter(col("lang") === "en").select(col("doc_id"), col("text"))
          .unionByName(
            kept.select(col("doc_id"), col("text")).join(sel, Seq("doc_id"))),
        matchingActions = 2)
      Packing.packFromLengths(
        TextAnalysis.bpeTrainedEncode(corpus)
          .select(col("doc_id"), col("n_bpe_tokens").as("len")))
    }),
    // continuous-ingestion packing: the delta packs onto the end of the
    // base stream — base contributes ONE broadcast aggregate, O(|delta|)
    "pack_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Packing.packIncremental(docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0))
    }),
    // STREAMING PACKING composition: a checkpointed doc stream packs
    // onto the END of the base corpus's token stream per micro-batch,
    // across a forced stop/restart. The only cross-batch state is a
    // batch_id-keyed totals table (#batches rows): batch N's offset =
    // base total (one pre-stream scalar) + Σ totals[batch < N], written
    // with the same idempotent-partition recipe as the spans — replay
    // overwrites both, offsets never double-count. One staged file per
    // phase + maxFilesPerTrigger=1 pins batch composition, so the
    // replayed union is deterministic and the oracle replays it as a
    // (phase, doc_id)-ordered prefix sum.
    // STREAMING writes into the snapshot-versioned table: base = v1,
    // each micro-batch upserts version batch_id+2 (idempotent across the
    // forced restart — a replayed batch overwrites its own version), and
    // the result reads every version through its manifest. freshStageDir
    // (not withStreamStage): the returned plan reads the table lazily.
    "snapshot_stream" -> ((s, dir) => {
      val stage = freshStageDir("graft_snap_s")
      val in = stage + "/in"; val ckpt = stage + "/ckpt"
      val root = stage + "/tbl"
      val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      val delta = docs.filter(col("doc_id") % 10 === 0)
      graft.sources.TableSink.writeSnapshot(
        docs.filter(col("doc_id") % 10 =!= 0), root, 1)
      def run(): Unit = {
        val stream = s.readStream.schema(
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("doc_id",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("n_chars",
                org.apache.spark.sql.types.LongType))))
          .option("maxFilesPerTrigger", 1).parquet(in)
        val q = stream.writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            graft.sources.TableSink.writeSnapshotUpsert(b, root, id.toInt + 2)
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      delta.filter(col("doc_id") % 20 === 0).coalesce(1)
        .write.mode("overwrite").parquet(in)
      run() // phase 1: batch 0 -> v2, clean stop
      delta.filter(col("doc_id") % 20 =!= 0).coalesce(1)
        .write.mode("append").parquet(in)
      run() // phase 2: restart from the checkpoint -> batch 1 -> v3
      (1 to 3).map(v =>
          graft.sources.TableSink.readSnapshot(s, root, v)
            .agg(lit(v).as("version"), count(lit(1)).as("n_docs"),
              sum(col("n_chars")).as("sum_chars")))
        .reduce(_.unionByName(_)).orderBy(col("version"))
    }),
    "pack_stream" -> ((s, dir) =>
      withStreamStage("graft_pack_s") { stage =>
      val in = stage + "/in"; val sink = stage + "/sink"
      val ckpt = stage + "/ckpt"; val totals = stage + "/totals"
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val delta = docs.filter(col("doc_id") % 10 === 0)
      // the base corpus contributes ONE scalar, computed once before the
      // stream starts — never rescanned per batch
      val baseTotal = Packing.totalTokens(
        docs.filter(col("doc_id") % 10 =!= 0)).collect()(0).getLong(0)
      def run(): Unit = {
        val stream = s.readStream.schema(
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("doc_id",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("text",
                org.apache.spark.sql.types.StringType))))
          .option("maxFilesPerTrigger", 1).parquet(in)
        val q = stream.writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            val prior = scala.util.Try(s.read.parquet(totals)).toOption
              .map(_.filter(col("batch_id") < id)
                .agg(coalesce(sum(col("n_tokens")), lit(0L)).as("p")))
              .getOrElse(s.range(1).select(lit(0L).as("p")))
            val off = prior.select((col("p") + lit(baseTotal)).as("base_off"))
            graft.streaming.StreamingOps.writeBatchIdempotent(
              Packing.packOnto(b, off), sink, id)
            graft.streaming.StreamingOps.writeBatchIdempotent(
              Packing.totalTokens(b), totals, id)
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      delta.filter(col("doc_id") % 20 === 0).coalesce(1)
        .write.mode("overwrite").parquet(in)
      run() // phase 1: drains the staged file, clean stop
      delta.filter(col("doc_id") % 20 =!= 0).coalesce(1)
        .write.mode("append").parquet(in)
      run() // phase 2: restart from the checkpoint — new file only
      graft.sources.TableSink.saveTable(
        s.read.parquet(sink).drop("batch_id"), "graft_pack_s_result")
      s.table("graft_pack_s_result").orderBy(col("seq_id"), col("doc_id"))
    }),
    // longest-first round-robin sharding: balanced-bytes output shards
    // via the window-free ExactRank under a constant group
    "shard_rebalance" -> ((s, dir) =>
      Sampling.shardRebalance(t(s, dir, "documents"))),
    // cluster-aware split: every near-dup cluster member shares one
    // split, so test can never hold a near-copy of a train document
    "leakage_safe_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashLsh(docs).select(col("doc_a"), col("doc_b"))
      Sampling.leakageSafeSplit(docs, Dedup.nearDupClusters(pairs))
    }),
    // exactly k per stratum: md5-ranked window-free cut (the count
    // request the fraction samplers can't answer)
    "sample_exact_k" -> ((s, dir) =>
      Sampling.sampleExactK(t(s, dir, "documents"))),
    // grouped K-fold: every near-dup cluster in ONE fold (md5 of the
    // representative, mod 5) — leakage-safe cross-validation splits
    "group_kfold" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashLsh(docs).select(col("doc_a"), col("doc_b"))
      Sampling.groupKFold(docs, Dedup.nearDupClusters(pairs))
    }),
    "weighted_sample" -> ((s, dir) =>
      Sampling.weightedSample(t(s, dir, "documents"))),
    // the full pretraining-prep chain in ONE lazy plan: sub-document
    // dedup -> length-weighted corpus mixing -> token-budget packing.
    // Each stage is individually oracle-checked; this row checks their
    // COMPOSITION (column contracts between stages hold end-to-end)
    "pipeline_pretrain" -> ((s, dir) => {
      val cleaned = TextAnalysis.passageDedup(t(s, dir, "documents"))
        .select(col("doc_id"), col("clean_text").as("text"))
      val kept = Sampling.weightedSample(cleaned).select(col("doc_id"))
      Sampling.packSequences(cleaned.join(kept, Seq("doc_id")))
    }),
    // the full QUALITY chain in ONE lazy plan: Gopher document filter ->
    // C4 line repair -> CCNet perplexity cut (keep head+middle over the
    // REPAIRED corpus — model, vocab, and rank thirds all computed on the
    // filtered text, not the raw corpus) -> passage dedup. Each stage is
    // individually oracle-checked; this row checks their COMPOSITION, and
    // a PlanSpec pin holds it to one lazy plan (no intermediate
    // materialization — the pipeline_pretrain discipline).
    "pipeline_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val gKeep = TextAnalysis.gopherQuality(docs, stopList = Seq("the", "a"))
        .filter(col("keep")).select(col("doc_id"))
      val repaired = TextAnalysis.c4LineFilter(docs.join(gKeep, Seq("doc_id")),
          minLineWords = 50, requireTerminalPunct = false)
        .filter(col("keep"))
        .select(col("doc_id"), col("clean_text").as("text"))
      val lmKeep = TextAnalysis.bigramBucketLabels(repaired)
        .filter(col("bucket") =!= "tail").select(col("doc_id"))
      TextAnalysis.passageDedup(repaired.join(lmKeep, Seq("doc_id")))
    }),
    // per-domain contribution cap (uniform deterministic within-domain pick)
    "domain_cap" -> ((s, dir) => Sampling.domainCap(t(s, dir, "documents"))),
    // sqrt-temperature domain rebalancing (multilingual mixing)
    "temperature_mix" -> ((s, dir) => Sampling.temperatureMix(t(s, dir, "documents"))),
    // token-budget mixture assembly: each source keeps md5-shuffled docs
    // until its token budget fills — per-source running totals via the
    // window-free exactPrefixSum (a hot source must not single-task)
    "token_budget_mix" -> ((s, dir) =>
      Sampling.tokenBudgetMix(t(s, dir, "documents"))),
    // UniMax epoch planning (r14): ascending-size water-fill of a
    // corpus-derived token budget under a per-domain epoch cap — the
    // published fair-sampling answer to temperature mixing's unbounded
    // rare-domain oversampling. Emits the epoch PLAN (one row per
    // domain); the 1.9×-total budget + 2-epoch cap land 7 of the 20
    // fixture sources on the cap branch and 13 on the budget branch.
    // Oracle replays the sequential recurrence as a recursive CTE.
    "unimax_mix" -> ((s, dir) =>
      Sampling.unimaxMix(t(s, dir, "documents"))),
    "stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(t(s, dir, "documents"))),
    "pack_sequences" -> ((s, dir) =>
      Sampling.packSequences(t(s, dir, "documents"))),
    // exact global shuffle order via uniform md5 buckets (lazy, no hot key)
    "corpus_shuffle" -> ((s, dir) =>
      Sampling.corpusShuffle(t(s, dir, "documents"))),
    // ---- URL canonicalization (host-keyed curation) ----------------------
    // RFC 3986 syntax-based normalization over deterministically messy
    // URLs (mixed case, explicit default ports, userinfo, fragments, an
    // unparseable class -> NULL url_norm). Row-local regex chain shared
    // verbatim with the oracle — no shuffle beyond the presentation sort.
    "url_normalize" -> ((s, dir) =>
      Url.normalize(messyUrls(t(s, dir, "documents"))).orderBy(col("doc_id"))),
    // per-HOST contribution cap: normalize, quarantine unparseable rows,
    // then reuse domain_cap's salted two-phase exact rank keyed on the
    // parsed host — the key real crawls actually cap on
    "host_cap" -> ((s, dir) =>
      Url.hostCap(messyUrls(t(s, dir, "documents")), maxPerHost = 10)),
    // link extraction + canonicalization (crawl-graph step): every href
    // in deterministic real-shaped HTML becomes a row, absolute targets
    // normalize to canonical URLs, relative ones surface NULL url_norm
    "html_links" -> ((s, dir) =>
      Url.extractLinks(htmlFixturePages(s, dir))
        .orderBy(col("doc_id"), col("pos"))),
    // base-URL reference resolution (RFC 3986 §5.2, string-expressible
    // subset): relative/protocol-relative/fragment links resolve against
    // each page's base URL to REAL hosts before normalization — most of
    // a real crawl graph is relative links
    "html_links_resolved" -> ((s, dir) =>
      Url.resolveLinks(htmlFixturePages(s, dir))
        .orderBy(col("doc_id"), col("pos"))),
    // crawl authority end-to-end: the RESOLVED link edge relation (so
    // relative links contribute real-host edges) through the SAME
    // exact-integer rank recurrence as page_rank — the html_extract ->
    // html_links_resolved -> link_rank -> host_cap chain
    "link_rank" -> ((s, dir) => {
      val edges = Url.resolveLinks(htmlFixturePages(s, dir))
        .filter(col("url_norm").isNotNull)
        .select(concat(lit("d"), col("doc_id").cast("string")).as("src"),
          col("host").as("dst"))
        .distinct()
      Graph.pageRank(edges)
    }),
    // Kleinberg HITS over the SAME resolved doc->host edge relation:
    // docs are hubs, hosts authorities — unnormalized exact-BIGINT
    // sweeps (ranking-identical to the L2-normalized form at any fixed
    // round count), oracle unrolls the two sweeps verbatim
    "hits_scores" -> ((s, dir) => {
      val edges = Url.resolveLinks(htmlFixturePages(s, dir))
        .filter(col("url_norm").isNotNull)
        .select(concat(lit("d"), col("doc_id").cast("string")).as("src"),
          col("host").as("dst"))
        .distinct()
      Graph.hits(edges)
    }),
  )

  /** Deterministic messy-URL corpus for the URL operators: both engines
    * synthesize the same mixed-case / default-port / userinfo / fragment /
    * schemeless URL per document (the html_extract discipline), so the
    * oracle checks real normalization work, not a pre-clean column.
    * doc_id%6 picks the mess class, doc_id%5 the host — ~30 hosts, enough
    * population per host for the cap to bite.
    */
  def oracleSql: Map[String, String] = oracleSqlMap

  private lazy val oracleSqlMap: Map[String, String] =
    distinctKeys("oracleSql", oracleSqlMain ++ oracleSqlRest)
}
