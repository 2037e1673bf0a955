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
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline computation: P(neighbor | product) over
    * purchase sequences (SURVEY.md §0).
    */
  def entry(spark: SparkSession): DataFrame =
    crystalballPairs(spark, "/root/testdata/sf0.001")

  // ---- helpers ----------------------------------------------------------

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(spark, dir, name)

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
      val edges = CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
        .filter(col("cnt") >= 2)
        .select(col("product").as("src"), col("neighbor").as("dst"))
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
      val edges = CoOccurrence.counts(BasketSource.basketsFromLineitem(s, dir))
        .filter(col("cnt") >= 2)
        .select(col("product").as("src"), col("neighbor").as("dst"))
      Graph.modularity(edges, Graph.lpaConverged(edges))
    }),
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
    "media_embedding_stub" -> ((s, dir) => Multimodal.mediaEmbedding(t(s, dir, "documents"))),
    "media_resize_stub" -> ((s, dir) => Multimodal.resizeMedia(t(s, dir, "documents"))),
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
  private def messyUrls(docs: DataFrame): DataFrame = {
    val m = pmod(col("doc_id"), lit(6))
    val k = pmod(col("doc_id"), lit(5)).cast("string")
    val id = col("doc_id").cast("string")
    docs.select(col("doc_id"),
      when(m === 0, concat(lit("HTTP://WWW.Example"), k,
          lit(".COM:80/path/"), id, lit("?a=1#frag")))
        .when(m === 1, concat(lit("https://user:pw@Sub.Example"), k,
          lit(".org:443/Article/"), id))
        .when(m === 2, concat(lit("https://example"), k,
          lit(".net:8443/x?q="), id, lit("&b=2")))
        .when(m === 3, concat(lit("http://example"), k, lit(".com")))
        .when(m === 4, concat(lit("ftp://Files.example"), k,
          lit(".io/pub/"), id, lit("#sec")))
        .otherwise(concat(lit("not a url "), id)).as("url"))
  }

  /** DuckDB oracle twins. Shared SQL prelude for basket derivation mirrors
    * BasketSource.fromLineitem / CoOccurrence exactly (FIXTURES.md §2).
    */
  private val basketsCte =
    """WITH baskets AS (
      |  SELECT CAST(l_orderkey AS VARCHAR) AS customer,
      |         list(CAST(l_partkey AS VARCHAR)
      |              ORDER BY l_linenumber, CAST(l_partkey AS VARCHAR)) AS products
      |  FROM lineitem GROUP BY l_orderkey
      |)""".stripMargin

  /** Oracle twin of [[messyUrls]] + [[Url.normalize]]'s parse stage: the
    * CASE arms mirror the Spark when-chain byte-for-byte and the regexes
    * are the [[Url]] constants verbatim (Java/RE2-shared subset).
    */
  private val urlParseCte: String = {
    val (sc, au, pa, qu, ui, po) = (Url.SchemeRe, Url.AuthorityRe,
      Url.PathRe, Url.QueryRe, Url.UserinfoRe, Url.PortRe)
    // NOTE: the queries embed this via a second stripMargin, so no line
    // here may BEGIN with '|' (a leading '||' would lose a pipe there)
    s"""WITH urls AS (
      |  SELECT doc_id, CASE CAST(doc_id % 6 AS INTEGER)
      |    WHEN 0 THEN 'HTTP://WWW.Example' || CAST(doc_id % 5 AS VARCHAR) ||
      |      '.COM:80/path/' || CAST(doc_id AS VARCHAR) || '?a=1#frag'
      |    WHEN 1 THEN 'https://user:pw@Sub.Example' || CAST(doc_id % 5 AS VARCHAR) ||
      |      '.org:443/Article/' || CAST(doc_id AS VARCHAR)
      |    WHEN 2 THEN 'https://example' || CAST(doc_id % 5 AS VARCHAR) ||
      |      '.net:8443/x?q=' || CAST(doc_id AS VARCHAR) || '&b=2'
      |    WHEN 3 THEN 'http://example' || CAST(doc_id % 5 AS VARCHAR) || '.com'
      |    WHEN 4 THEN 'ftp://Files.example' || CAST(doc_id % 5 AS VARCHAR) ||
      |      '.io/pub/' || CAST(doc_id AS VARCHAR) || '#sec'
      |    ELSE 'not a url ' || CAST(doc_id AS VARCHAR) END AS url
      |  FROM documents
      |), p AS (
      |  SELECT doc_id, url,
      |    lower(regexp_extract(url, '$sc', 1)) AS scheme,
      |    regexp_replace(regexp_extract(url, '$au', 1), '$ui', '') AS hostport
      |  FROM urls
      |), p2 AS (
      |  SELECT doc_id, url, scheme,
      |    lower(regexp_replace(hostport, '$po', '')) AS host,
      |    regexp_extract(hostport, '$po', 1) AS port,
      |    regexp_extract(url, '$pa', 1) AS raw_path,
      |    regexp_extract(url, '$qu', 1) AS query
      |  FROM p
      |), n AS (
      |  SELECT doc_id, url, scheme, host,
      |    CASE WHEN raw_path = '' THEN '/' ELSE raw_path END AS path,
      |    CASE WHEN (scheme = 'http' AND port = '80')
      |         OR (scheme = 'https' AND port = '443')
      |         OR port = '' THEN '' ELSE ':' || port END AS kept_port,
      |    CASE WHEN query = '' THEN '' ELSE '?' || query END AS kept_query
      |  FROM p2
      |)""".stripMargin
  }

  private val cooccurCte =
    basketsCte +
      """, exploded AS (
      |  SELECT customer AS bid, unnest(products) AS product,
      |         generate_subscripts(products, 1) AS pos
      |  FROM baskets
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
      |  SELECT product, neighbor, count(*) AS cnt FROM pairs GROUP BY 1, 2
      |)""".stripMargin

  /** [[cooccurCte]] with the maxWindow cap expressed as a position-delta
    * predicate: CoOccurrence.windowPairs scans j in (i, i+cap], so the SQL
    * twin keeps exactly the pairs with b.pos - a.pos <= cap (before the
    * first-repeat termination, which is cap-independent).
    */
  private def cooccurCappedCte(cap: Int) =
    basketsCte +
      s""", exploded AS (
      |  SELECT customer AS bid, unnest(products) AS product,
      |         generate_subscripts(products, 1) AS pos
      |  FROM baskets
      |), currents AS (
      |  SELECT bid, product, pos,
      |         lead(pos) OVER (PARTITION BY bid, product ORDER BY pos) AS next_same
      |  FROM exploded
      |), pairs AS (
      |  SELECT a.product, b.product AS neighbor
      |  FROM currents a JOIN exploded b
      |    ON a.bid = b.bid AND b.pos > a.pos AND b.pos - a.pos <= $cap
      |   AND (a.next_same IS NULL OR b.pos < a.next_same)
      |), counts AS (
      |  SELECT product, neighbor, count(*) AS cnt FROM pairs GROUP BY 1, 2
      |)""".stripMargin

  /** Unrolled fixed-point PageRank oracle over the co-occurrence graph
    * (mirrors Graph.pageRank: integer e9 ranks, `div` per-edge splits,
    * dangling mass leaks). DuckDB sums BIGINT into HUGEINT and its `//`
    * is floor division — all ranks are non-negative, so CASTs back to
    * BIGINT keep it value- and dtype-identical to Spark's `div` on LONG.
    */
  private def pageRankSql(iterations: Int, dampingPct: Int = 85,
      scale: Long = 1000000000L, edgesWith: String = null,
      materialize: Boolean = false): String = {
    val base = (100L - dampingPct) * scale / 100L
    // default edge relation: the co-occurrence graph; callers may swap
    // in any WITH-prefix that defines edges(src, dst) — link_rank feeds
    // the crawl link graph through the identical rank recurrence
    val prefix = Option(edgesWith).getOrElse(cooccurCte +
      ", edges AS (SELECT product AS src, neighbor AS dst FROM counts)")
    // long unrolls (pagerank_converged's 40 rounds) MATERIALIZE the
    // shared relations and every round — inlined, DuckDB's binder
    // re-expands the whole upstream chain per round and the plan grows
    // superlinearly; the short unrolls keep their original inlined text
    val m = if (materialize) " MATERIALIZED" else ""
    val head = prefix +
      s""",
      |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
      |wd AS$m (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
      |nodes AS$m (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      |r0 AS (SELECT node, CAST($scale AS BIGINT) AS rank_e9 FROM nodes)""".stripMargin
    val iters = (1 to iterations).map { i =>
      s""",
      |s$i AS (SELECT wd.dst, CAST(sum(rank_e9 // deg) AS BIGINT) AS s
      |  FROM wd JOIN r${i - 1} ON wd.src = r${i - 1}.node GROUP BY wd.dst),
      |r$i AS$m (SELECT node, CAST($base AS BIGINT) +
      |  CAST(($dampingPct * coalesce(s, CAST(0 AS BIGINT))) // 100 AS BIGINT) AS rank_e9
      |  FROM nodes LEFT JOIN s$i ON nodes.node = s$i.dst)""".stripMargin
    }.mkString
    head + iters + s"\nSELECT node, rank_e9 FROM r$iterations ORDER BY node"
  }

  /** Unrolled PERSONALIZED-PageRank oracle (mirrors
    * Graph.personalizedPageRank over the cnt >= 2 co-occurrence graph,
    * khop's round-hundred seed rule): [[pageRankSql]]'s exact integer
    * recurrence with r0 mass and the per-round base term gated on seed
    * membership — both row-local CASEs over the seed-annotated node
    * relation, so the unroll stays bit-exact.
    */
  private def pprSql(iterations: Int, dampingPct: Int = 85,
      scale: Long = 1000000000L): String = {
    val base = (100L - dampingPct) * scale / 100L
    val head = cooccurCte +
      s""", edges AS (
      |  SELECT product AS src, neighbor AS dst FROM counts WHERE cnt >= 2
      |),
      |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
      |wd AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
      |nodes0 AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      |seeds AS (SELECT DISTINCT src AS node FROM edges
      |  WHERE CAST(src AS BIGINT) % 100 = 0),
      |nodes AS (SELECT n.node, (s.node IS NOT NULL) AS is_seed
      |  FROM nodes0 n LEFT JOIN seeds s ON n.node = s.node),
      |r0 AS (SELECT node, is_seed,
      |  CAST(CASE WHEN is_seed THEN $scale ELSE 0 END AS BIGINT) AS rank_e9
      |  FROM nodes)""".stripMargin
    val iters = (1 to iterations).map { i =>
      s""",
      |s$i AS (SELECT wd.dst, CAST(sum(rank_e9 // deg) AS BIGINT) AS s
      |  FROM wd JOIN r${i - 1} ON wd.src = r${i - 1}.node GROUP BY wd.dst),
      |r$i AS (SELECT node, is_seed,
      |  CAST(CASE WHEN is_seed THEN $base ELSE 0 END AS BIGINT) +
      |  CAST(($dampingPct * coalesce(s, CAST(0 AS BIGINT))) // 100 AS BIGINT) AS rank_e9
      |  FROM nodes LEFT JOIN s$i ON nodes.node = s$i.dst)""".stripMargin
    }.mkString
    head + iters + s"\nSELECT node, rank_e9 FROM r$iterations ORDER BY node"
  }

  /** Unrolled HyperANF oracle (mirrors Graph.hyperAnf over the cnt >= 2
    * co-occurrence graph): the singleton register per node from the
    * house md5 idiom (hex bucket + leading-zero-bit rho via
    * leading-'0' strip and a 3-bit CASE), `rounds` max-merge rounds,
    * and per radius the exact integer harmonic denominator and the
    * HUGEINT-floored estimate — every column integer, every row
    * hash-comparable.
    */
  private def hyperAnfSql(rounds: Int): String =
    hyperAnfCte(rounds) +
      """
      |SELECT node, radius, n_regs, s_scaled,
      |  CAST((CAST(172288 AS HUGEINT) * 281474976710656) //
      |    (10 * s_scaled) AS BIGINT) AS ball_e2
      |FROM b ORDER BY node, radius""".stripMargin

  /** `anf_function`: the per-radius aggregate of [[hyperAnfSql]]'s ball
    * relation — the neighborhood function N(r) plus the effective-
    * diameter flag (first radius whose mass reaches 90% of the final
    * radius's, checked in exact integer cross-multiplication).
    */
  private def anfFunctionSql(rounds: Int): String =
    hyperAnfCte(rounds) +
      s""",
      |est AS (
      |  SELECT radius, node,
      |    CAST((CAST(172288 AS HUGEINT) * 281474976710656) //
      |      (10 * s_scaled) AS BIGINT) AS ball_e2
      |  FROM b
      |), nf AS (
      |  SELECT radius, count(*) AS n_nodes,
      |    CAST(sum(ball_e2) AS BIGINT) AS sum_ball_e2
      |  FROM est GROUP BY radius
      |), fin AS (SELECT sum_ball_e2 AS total FROM nf WHERE radius = $rounds)
      |SELECT radius, n_nodes, sum_ball_e2,
      |  (sum_ball_e2 * 10 >= total * 9) AS reached_90pct
      |FROM nf CROSS JOIN fin ORDER BY radius""".stripMargin

  /** `harmonic_centrality`: per node Σ_r Δball_e2/r off the shared
    * ball CTE — the lag window replays the engine's constant-4-row
    * per-node partitions.
    */
  private def harmonicCentralitySql(rounds: Int): String =
    hyperAnfCte(rounds) +
      """,
      |est AS (
      |  SELECT node, radius,
      |    CAST((CAST(172288 AS HUGEINT) * 281474976710656) //
      |      (10 * s_scaled) AS BIGINT) AS ball_e2
      |  FROM b
      |), d AS (
      |  SELECT node, radius, ball_e2,
      |    lag(ball_e2) OVER (PARTITION BY node ORDER BY radius) AS prev
      |  FROM est)
      |SELECT node, CAST(sum((ball_e2 - prev) // radius) AS BIGINT) AS harmonic_e2
      |FROM d WHERE radius > 0 GROUP BY node ORDER BY node""".stripMargin

  private def hyperAnfCte(rounds: Int): String = {
    val head = cooccurCte +
      s""", edges AS MATERIALIZED (
      |  SELECT product AS src, neighbor AS dst FROM counts WHERE cnt >= 2
      |),
      |anodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      |g0 AS MATERIALIZED (
      |  SELECT node,
      |    CAST(('0x' || substr(h, 1, 1)) AS BIGINT) AS j,
      |    CASE WHEN st = '' THEN 41
      |      ELSE (10 - length(st)) * 4 + 1 +
      |        CASE WHEN substr(st, 1, 1) = '1' THEN 3
      |          WHEN substr(st, 1, 1) IN ('2', '3') THEN 2
      |          WHEN substr(st, 1, 1) IN ('4', '5', '6', '7') THEN 1
      |          ELSE 0 END
      |    END AS m
      |  FROM (SELECT node, h, ltrim(substr(h, 2, 10), '0') AS st
      |    FROM (SELECT node, md5(concat_ws('|', 'anf', node)) AS h
      |      FROM anodes))
      |)""".stripMargin
    val iters = (1 to rounds).map { r =>
      s""",
      |g$r AS MATERIALIZED (
      |  SELECT x.node, x.j, max(x.m) AS m FROM (
      |    SELECT e.src AS node, p.j, p.m
      |    FROM edges e JOIN g${r - 1} p ON p.node = e.dst
      |    UNION ALL SELECT node, j, m FROM g${r - 1}) x
      |  GROUP BY 1, 2)""".stripMargin
    }.mkString
    val balls = (0 to rounds).map { r =>
      s"""SELECT node, CAST($r AS INTEGER) AS radius, count(*) AS n_regs,
      |    (16 - count(*)) * (CAST(1 AS BIGINT) << 48) +
      |      sum(CAST(1 AS BIGINT) << (48 - m)) AS s_scaled
      |  FROM g$r GROUP BY node""".stripMargin
    }.mkString("\n  UNION ALL ")
    head + iters +
      s""",
      |b AS (
      |  $balls
      |)""".stripMargin
  }

  /** Shared walk unroll for `random_walks` / `walk_skipgram` (mirrors
    * Graft.randomWalks over the cnt >= 2 co-occurrence graph, khop's
    * seed rule, 2 reps × 4 steps): per step, each walker's next node is
    * the neighbor minimizing md5(salt|seed|rep|step|dst) — the engine's
    * min(struct(h, dst)) argmin is exactly QUALIFY row_number() ORDER BY
    * (h, dst) = 1. Ends with `walks AS (seed, rep, step, node)`.
    */
  private def walkCte(steps: Int, reps: Int, salt: String = "walk"): String = {
    val repVals = (0 until reps).map(r => s"($r)").mkString(", ")
    val head = cooccurCte +
      s""", edges AS (
      |  SELECT product AS src, neighbor AS dst FROM counts WHERE cnt >= 2
      |),
      |seeds AS (SELECT DISTINCT src AS node FROM edges
      |  WHERE CAST(src AS BIGINT) % 100 = 0),
      |w0 AS (SELECT s.node AS seed, r.rep, s.node AS cur
      |  FROM seeds s CROSS JOIN (VALUES $repVals) AS r(rep))""".stripMargin
    val iters = (1 to steps).map { i =>
      s""",
      |c$i AS (SELECT w.seed, w.rep, e.dst,
      |  md5(concat_ws('|', '$salt', w.seed, CAST(w.rep AS VARCHAR),
      |    '$i', e.dst)) AS h
      |  FROM w${i - 1} w JOIN edges e ON w.cur = e.src),
      |w$i AS (SELECT seed, rep, dst AS cur FROM c$i
      |  QUALIFY row_number() OVER (PARTITION BY seed, rep ORDER BY h, dst) = 1)""".stripMargin
    }.mkString
    val union = (0 to steps).map { i =>
      s"SELECT seed, rep, $i AS step, cur AS node FROM w$i"
    }.mkString("\n  UNION ALL ")
    head + iters + s",\nwalks AS (\n  $union\n)"
  }

  /** Unrolled node2vec-walk oracle (mirrors Graph.node2vecWalks over
    * the cnt >= 2 graph, khop's seeds, 2 reps × 4 steps): per step the
    * candidate weight is the return/common/outward CASE off the
    * previous node (NULL prev at step 1 fails both tests → uniform 2),
    * draws come from a 4-row VALUES table filtered t < wt, and the
    * engine's min(struct(h, dst)) is QUALIFY row_number ORDER BY
    * (h, dst) = 1.
    */
  private def node2vecSql(steps: Int, reps: Int,
      salt: String = "n2v"): String = {
    val repVals = (0 until reps).map(r => s"($r)").mkString(", ")
    val head = cooccurCte +
      s""", edges AS MATERIALIZED (
      |  SELECT DISTINCT product AS src, neighbor AS dst
      |  FROM counts WHERE cnt >= 2
      |),
      |seeds AS (SELECT DISTINCT src AS node FROM edges
      |  WHERE CAST(src AS BIGINT) % 100 = 0),
      |tt(t) AS (VALUES (0), (1), (2), (3)),
      |v0 AS (SELECT s.node AS seed, r.rep,
      |    CAST(NULL AS VARCHAR) AS prev, s.node AS cur
      |  FROM seeds s CROSS JOIN (VALUES $repVals) AS r(rep))""".stripMargin
    val iters = (1 to steps).map { i =>
      s""",
      |vc$i AS (
      |  SELECT w.seed, w.rep, w.cur, e.dst,
      |    CASE WHEN e.dst = w.prev THEN 1
      |      WHEN a.src IS NOT NULL THEN 4 ELSE 2 END AS wt
      |  FROM v${i - 1} w
      |  JOIN edges e ON w.cur = e.src
      |  LEFT JOIN edges a ON a.src = w.prev AND a.dst = e.dst),
      |v$i AS (
      |  SELECT seed, rep, cur AS prev, dst AS cur FROM (
      |    SELECT c.seed, c.rep, c.cur, c.dst,
      |      md5(concat_ws('|', '$salt', c.seed, CAST(c.rep AS VARCHAR),
      |        '$i', c.dst, CAST(tt.t AS VARCHAR))) AS h
      |    FROM vc$i c JOIN tt ON tt.t < c.wt)
      |  QUALIFY row_number() OVER (PARTITION BY seed, rep ORDER BY h, dst) = 1)""".stripMargin
    }.mkString
    val union = (0 to steps).map { i =>
      s"SELECT seed, rep, $i AS step, cur AS node FROM v$i"
    }.mkString("\n  UNION ALL ")
    head + iters +
      s"\nSELECT seed, rep, step, node FROM (\n  $union\n)" +
      "\nORDER BY seed, rep, step"
  }

  /** Unrolled synchronous label-propagation oracle (mirrors
    * Graph.labelPropagation over the cnt >= 2 co-occurrence graph):
    * each round's QUALIFY argmax (ORDER BY c DESC, lbl) is exactly the
    * engine's min(struct(-cnt, lbl)) — max neighbor-label count, ties to
    * the smallest label. `adj` is MATERIALIZED: every round re-reads it,
    * and inlined it would re-expand the whole basket derivation per round.
    */
  private def lpaSql(iterations: Int): String = {
    val head = cooccurCte +
      """, und AS (
      |  SELECT DISTINCT least(product, neighbor) AS u,
      |    greatest(product, neighbor) AS v
      |  FROM counts WHERE product <> neighbor AND cnt >= 2
      |), adj AS MATERIALIZED (
      |  SELECT u AS node, v AS nbr FROM und
      |  UNION ALL SELECT v, u FROM und
      |), l0 AS (SELECT DISTINCT node, node AS lbl FROM adj)""".stripMargin
    val iters = (1 to iterations).map { i =>
      s""",
      |c$i AS (SELECT a.node, l.lbl, count(*) AS c
      |  FROM adj a JOIN l${i - 1} l ON a.nbr = l.node GROUP BY 1, 2),
      |l$i AS MATERIALIZED (SELECT node, lbl FROM c$i
      |  QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) = 1)""".stripMargin
    }.mkString
    head + iters +
      s"\nSELECT node, lbl AS community FROM l$iterations ORDER BY node"
  }

  /** Oracle for the CONVERGENCE-TERMINATED monotone LPA
    * (Graph.lpaConverged): the same per-round argmax as [[lpaSql]],
    * clamped by `least(current, candidate)`. The engine loops until no
    * label changes; the oracle replays it as a FIXED unroll — the
    * monotone update makes post-convergence rounds no-ops, so ANY
    * unroll count at or above the engine's convergence round yields
    * the identical labeling. `unrollRounds` must therefore stay >= the
    * fixture's convergence round (engine asserts convergence within
    * its own maxRounds=50; PipelineSpec pins the sf0.01 convergence
    * round well under the unroll).
    */
  private def lpaConvergedCte(unrollRounds: Int): String = {
    val head = cooccurCte +
      """, und AS (
      |  SELECT DISTINCT least(product, neighbor) AS u,
      |    greatest(product, neighbor) AS v
      |  FROM counts WHERE product <> neighbor AND cnt >= 2
      |), adj AS MATERIALIZED (
      |  SELECT u AS node, v AS nbr FROM und
      |  UNION ALL SELECT v, u FROM und
      |), l0 AS (SELECT DISTINCT node, node AS lbl FROM adj)""".stripMargin
    val iters = (1 to unrollRounds).map { i =>
      s""",
      |c$i AS (SELECT a.node, l.lbl, count(*) AS c
      |  FROM adj a JOIN l${i - 1} l ON a.nbr = l.node GROUP BY 1, 2),
      |m$i AS (SELECT node, lbl AS cand FROM c$i
      |  QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) = 1),
      |l$i AS MATERIALIZED (SELECT l.node, least(l.lbl, m.cand) AS lbl
      |  FROM l${i - 1} l JOIN m$i m ON l.node = m.node)""".stripMargin
    }.mkString
    head + iters +
      s",\nlabels AS (SELECT node, lbl AS community FROM l$unrollRounds)"
  }

  /** `modularity_lpa`: Newman modularity of the converged LPA
    * communities over the same undirected significant graph, in EXACT
    * integer arithmetic — per community c the numerator
    * q_num = 4·m·e_c − d_c² (HUGEINT/DECIMAL(38,0) multiply, BIGINT
    * result), where Q = Σ_c q_num / (4m²). The `und`/`labels` CTEs come
    * from [[lpaConvergedCte]] verbatim, so the community definition
    * cannot drift between the two queries.
    */
  private def modularityLpaSql(unrollRounds: Int): String =
    lpaConvergedCte(unrollRounds) +
      """,
      |mm AS (SELECT count(*) AS m FROM und),
      |ec AS (
      |  SELECT lu.community, count(*) AS e_in
      |  FROM und
      |  JOIN labels lu ON und.u = lu.node
      |  JOIN labels lv ON und.v = lv.node
      |  WHERE lu.community = lv.community
      |  GROUP BY 1
      |), dc AS (
      |  SELECT l.community, count(*) AS d_tot FROM (
      |    SELECT u AS node FROM und UNION ALL SELECT v FROM und) x
      |  JOIN labels l ON x.node = l.node GROUP BY 1
      |), nn AS (
      |  SELECT community, count(*) AS n_nodes FROM labels GROUP BY 1)
      |SELECT nn.community, nn.n_nodes,
      |  CAST(coalesce(ec.e_in, 0) AS BIGINT) AS e_in,
      |  CAST(dc.d_tot AS BIGINT) AS d_tot,
      |  CAST(CAST(4 AS HUGEINT) * mm.m * coalesce(ec.e_in, 0) -
      |    CAST(dc.d_tot AS HUGEINT) * dc.d_tot AS BIGINT) AS q_num
      |FROM nn
      |JOIN dc ON nn.community = dc.community
      |LEFT JOIN ec ON nn.community = ec.community
      |CROSS JOIN mm
      |ORDER BY nn.community""".stripMargin

  /** Oracle for kcore_decompose (Graph.kcoreDecompose): a fixed unroll
    * of the synchronous peel — each round keeps exactly the nodes with
    * >= k surviving neighbors. Post-convergence rounds are no-ops
    * (dropping nobody leaves every degree unchanged), so any unroll at
    * or above the engine's convergence round is the identical core;
    * PipelineSpec pins sf0.01 convergence within the unroll (the
    * lpaConvergedCte contract).
    */
  private def kcoreSql(k: Int, unrollRounds: Int): String = {
    val head = cooccurCte +
      """, und AS (
      |  SELECT DISTINCT least(product, neighbor) AS u,
      |    greatest(product, neighbor) AS v
      |  FROM counts WHERE product <> neighbor AND cnt >= 2
      |), adj AS MATERIALIZED (
      |  SELECT u AS node, v AS nbr FROM und
      |  UNION ALL SELECT v, u FROM und
      |), n0 AS (SELECT DISTINCT node FROM adj)""".stripMargin
    val iters = (1 to unrollRounds).map { i =>
      s""",
      |n$i AS MATERIALIZED (
      |  SELECT a.node FROM adj a
      |  JOIN n${i - 1} s ON a.node = s.node
      |  JOIN n${i - 1} t ON a.nbr = t.node
      |  GROUP BY a.node HAVING count(*) >= $k)""".stripMargin
    }.mkString
    head + iters +
      s"""
      |SELECT a.node, count(*) AS core_deg FROM adj a
      |JOIN n$unrollRounds s ON a.node = s.node
      |JOIN n$unrollRounds t ON a.nbr = t.node
      |GROUP BY a.node ORDER BY a.node""".stripMargin
  }

  /** Chained-replace BPE encode (mirrors TextAnalysis.bpeEncode): each
    * word becomes ` c1  c2 ... cn ` — single-space borders, double-space
    * separators — the representation in which ONE SQL replace of
    * `' a  b '` by `' ab '` is exactly one left-to-right greedy merge
    * pass (the consumed trailing space regenerates as the replacement's
    * trailing space, so chains like `aaaa` → `aa aa` fall out of plain
    * scan-order replacement). Merges fold in rank order — the same
    * sequential semantics the engine's token-array loop implements.
    */
  private val bpeEncodedExpr: String =
    graft.operators.TextAnalysis.DefaultMerges
      .foldLeft("regexp_replace(w, '(?s)(.)', ' \\1 ', 'g')") {
        case (acc, (a, b)) => s"replace($acc, ' $a  $b ', ' ${a + b} ')"
      }

  /** Rounds the bpe_train / pipeline_tokenizer oracles unroll — must
    * equal TextAnalysis.bpeTrain's default merges.
    */
  private val BpeOracleRounds = 64

  /** Rounds the vocabulary-scale twin unrolls: the largest chain
    * DuckDB's binder accepts is ~300 dependent CTE rounds (max
    * expression depth 1000, ~3 per round), so the exact-parity leg runs
    * at 256 and the 1024-merge leg (`bpe_train_1k`) verifies
    * structurally.
    */
  private val BpeVocabRounds = 256

  /** The unrolled BPE-training CTE chain: word-type relation → `rounds`
    * rounds of (pair-count p_i, argmax b_i, greedy-merge e_{i+1}) over
    * the space-encoded form. Shared by bpe_train (emits the b_i rules)
    * and pipeline_tokenizer (applies e_rounds back to the documents).
    *
    * `wordCte` names the word-type head CTE — parameterized at the
    * definition site (r13 advice) so a composing oracle whose WITH list
    * already binds `w` (pipeline_dsir_pack's DSIR weights) renames it
    * here instead of post-hoc string surgery that would silently
    * mis-bind if this chain ever referenced `w` in another form.
    */
  private def bpeTrainOracleChain(rounds: Int,
      wordCte: String = "w"): String = {
    // every chain CTE is MATERIALIZED: e_i is referenced twice per round
    // (pair count + next merge) — inlined, the chain re-expands
    // exponentially and re-opens the parquet scan per expansion
    def round(i: Int) = s""",
      |p$i AS MATERIALIZED (
      |  SELECT syms[i] AS a, syms[i + 1] AS b, sum(freq) AS cnt FROM (
      |    SELECT freq, syms, unnest(generate_series(1, len(syms) - 1)) AS i FROM
      |      (SELECT freq, string_split(trim(enc), '  ') AS syms FROM e$i))
      |  GROUP BY 1, 2),
      |b$i AS MATERIALIZED (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
      |e${i + 1} AS MATERIALIZED (SELECT word, freq,
      |  replace(enc, ' ' || (SELECT a FROM b$i) || '  ' || (SELECT b FROM b$i) || ' ',
      |               ' ' || (SELECT a FROM b$i) || (SELECT b FROM b$i) || ' ') AS enc
      |  FROM e$i)""".stripMargin
    s"""WITH $wordCte AS MATERIALIZED (
      |  SELECT token AS word, count(*) AS freq FROM (
      |    SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token FROM documents)
      |  GROUP BY token),
      |e0 AS MATERIALIZED (SELECT word, freq,
      |  regexp_replace(word, '(?s)(.)', ' \\1 ', 'g') AS enc FROM $wordCte)""".stripMargin +
      (0 until rounds).map(round).mkString
  }

  /** The partkey word-type head (shared by both vocabulary-scale BPE
    * oracles): each lineitem row contributes its partkey string as one
    * word occurrence — the exact relation the engine trains on.
    */
  private val bpeVocabWordsCte =
    // NOT s-interpolated, so \1 below is already the literal backslash-1
    // the DuckDB replacement needs (the s"" interpolator would require \\1)
    """WITH w AS MATERIALIZED (
      |  SELECT CAST(l_partkey AS VARCHAR) AS word, count(*) AS freq
      |  FROM lineitem GROUP BY 1),
      |e0 AS MATERIALIZED (SELECT word, freq,
      |  regexp_replace(word, '(?s)(.)', ' \1 ', 'g') AS enc FROM w)""".stripMargin

  /** [[bpeTrainOracleChain]] over the partkey vocabulary with the final
    * rule union BATCHED through intermediate CTEs (64 per batch): a flat
    * 256-way UNION ALL parses as a left-deep tree and trips DuckDB's
    * max-expression-depth on its own, independent of the CTE chain.
    */
  private def bpeVocabOracleSql(rounds: Int): String = {
    def round(i: Int) = s""",
      |p$i AS MATERIALIZED (
      |  SELECT syms[i] AS a, syms[i + 1] AS b, sum(freq) AS cnt FROM (
      |    SELECT freq, syms, unnest(generate_series(1, len(syms) - 1)) AS i FROM
      |      (SELECT freq, string_split(trim(enc), '  ') AS syms FROM e$i))
      |  GROUP BY 1, 2),
      |b$i AS MATERIALIZED (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
      |e${i + 1} AS MATERIALIZED (SELECT word, freq,
      |  replace(enc, ' ' || (SELECT a FROM b$i) || '  ' || (SELECT b FROM b$i) || ' ',
      |               ' ' || (SELECT a FROM b$i) || (SELECT b FROM b$i) || ' ') AS enc
      |  FROM e$i)""".stripMargin
    val batchSize = 64
    val starts = 0 until rounds by batchSize
    val batches = starts.map { s =>
      val u = (s until math.min(s + batchSize, rounds)).map { i =>
        s"SELECT CAST(${i + 1} AS INT) AS round, a AS sym_a, b AS sym_b, " +
          s"CAST(cnt AS BIGINT) AS cnt FROM b$i"
      }.mkString(" UNION ALL ")
      s",\nu${s / batchSize} AS MATERIALIZED ($u)"
    }.mkString
    val finalSel = starts.indices
      .map(j => s"SELECT * FROM u$j").mkString(" UNION ALL ")
    bpeVocabWordsCte + (0 until rounds).map(round).mkString + batches +
      s"\nSELECT * FROM ($finalSel) ORDER BY round"
  }

  /** The unrolled unigram-LM hard-EM oracle (Kudo 2018; engine twin
    * [[operators.TextAnalysis.unigramTrain]]): seed-substring vocab →
    * per round, a `maxWordLen`-level Viterbi DP chain (dp level i =
    * best-scoring segmentation of each word's length-i prefix, argmax
    * by `ORDER BY sc DESC, seg` — exactly the engine's tie-break) →
    * usage counts → re-scored pieces. Every dp level is MATERIALIZED:
    * levels are referenced by up to `maxPieceLen` successors, and
    * inlined they would re-expand exponentially (the
    * [[bpeTrainOracleChain]] lesson).
    */
  private def unigramOracleSql(vocabSize: Int = 256, rounds: Int = 2,
      maxPieceLen: Int = 4, maxWordLen: Int = 16,
      fertility: Boolean = false): String = {
    def dpChain(r: Int, scoreCte: String,
        withScores: Boolean = true): String = {
      val sb = new StringBuilder
      sb.append(s""",
        |d${r}_0 AS (SELECT word, freq, CAST(0 AS BIGINT) AS sc, '' AS seg
        |  FROM words)""".stripMargin)
      for (i <- 1 to maxWordLen) {
        val branches = (math.max(0, i - maxPieceLen) until i).map { j =>
          s"""      SELECT d.word, d.freq, d.sc + w.s_e6 AS sc,
             |        CASE WHEN d.seg = '' THEN substr(d.word, ${j + 1}, ${i - j})
             |          ELSE d.seg || ' ' || substr(d.word, ${j + 1}, ${i - j}) END AS seg
             |      FROM d${r}_$j d JOIN $scoreCte w
             |        ON w.piece = substr(d.word, ${j + 1}, ${i - j})
             |      WHERE length(d.word) >= $i""".stripMargin
        }.mkString("\n      UNION ALL\n")
        sb.append(s""",
          |d${r}_$i AS MATERIALIZED (
          |  SELECT word, freq, sc, seg FROM (
          |    SELECT *, row_number() OVER (PARTITION BY word
          |      ORDER BY sc DESC, seg) AS rn
          |    FROM (
          |$branches
          |    )
          |  ) WHERE rn = 1)""".stripMargin)
      }
      sb.append(s""",
        |seg$r AS MATERIALIZED (
        |""".stripMargin +
        (1 to maxWordLen).map(i =>
          s"  SELECT word, freq, seg FROM d${r}_$i WHERE length(word) = $i")
          .mkString("\n  UNION ALL\n") + (if (withScores) ")," else ")"))
      if (withScores) sb.append(s"""
        |usage$r AS MATERIALIZED (
        |  SELECT piece, CAST(sum(freq) AS BIGINT) AS usage FROM (
        |    SELECT freq, unnest(string_split(seg, ' ')) AS piece FROM seg$r)
        |  GROUP BY piece),
        |t$r AS (SELECT CAST(sum(usage) AS BIGINT) AS tot FROM usage$r),
        |w$r AS MATERIALIZED (
        |  SELECT piece, CAST(floor(ln(CAST(usage AS DOUBLE)
        |    / CAST(tot AS DOUBLE)) * 1000000.0) AS BIGINT) AS s_e6
        |  FROM usage$r CROSS JOIN t$r)""".stripMargin)
      sb.toString
    }
    val head = s"""WITH words AS MATERIALIZED (
      |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS word
      |    FROM documents)
      |  WHERE length(word) <= $maxWordLen GROUP BY word),
      |seeds AS MATERIALIZED (
      |  SELECT substr(word, i, l) AS piece, CAST(sum(freq) AS BIGINT) AS cnt
      |  FROM (
      |    SELECT word, freq, i, l FROM
      |      (SELECT word, freq, unnest(range(1, length(word) + 1)) AS i
      |       FROM words)
      |      CROSS JOIN (SELECT unnest(range(1, ${maxPieceLen + 1})) AS l)
      |    WHERE i + l - 1 <= length(word))
      |  GROUP BY 1),
      |chars AS MATERIALIZED (
      |  SELECT piece, cnt FROM seeds WHERE length(piece) = 1),
      |multi AS (SELECT piece, cnt FROM (
      |    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS r
      |    FROM seeds WHERE length(piece) >= 2)
      |  WHERE r <= $vocabSize - (SELECT count(*) FROM chars)),
      |v0 AS (SELECT * FROM chars UNION ALL SELECT * FROM multi),
      |t0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM v0),
      |w0 AS MATERIALIZED (
      |  SELECT piece, CAST(floor(ln(CAST(cnt AS DOUBLE)
      |    / CAST(tot AS DOUBLE)) * 1000000.0) AS BIGINT) AS s_e6
      |  FROM v0 CROSS JOIN t0)""".stripMargin
    val chains = (1 to rounds)
      .map(r => dpChain(r, s"w${r - 1}")).mkString
    if (!fertility)
      head + chains + s"""
        |SELECT u.piece, u.usage, w.s_e6 AS score_e6
        |FROM usage$rounds u JOIN w$rounds w USING (piece)
        |ORDER BY piece""".stripMargin
    else {
      // one more Viterbi chain under the LEARNED scores (no re-score),
      // then per-document budgets over the word occurrences; words the
      // pruned vocab cannot segment (or >maxWordLen chars) are
      // uncovered — they never reach seg${rounds + 1}
      val app = dpChain(rounds + 1, s"w$rounds", withScores = false)
      head + chains + app + s""",
        |pp AS MATERIALIZED (
        |  SELECT word, CAST(len(string_split(seg, ' ')) AS BIGINT)
        |    AS n_pieces
        |  FROM seg${rounds + 1}),
        |docw AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+'))
        |    AS word
        |  FROM documents)
        |SELECT doc_id,
        |  count(*) AS n_words,
        |  CAST(sum(CASE WHEN pp.n_pieces IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_covered,
        |  CAST(coalesce(sum(pp.n_pieces), 0) AS BIGINT) AS n_pieces,
        |  CAST(coalesce(sum(CASE WHEN pp.n_pieces IS NOT NULL
        |    THEN length(docw.word) END), 0) AS BIGINT) AS n_chars_covered
        |FROM docw LEFT JOIN pp USING (word)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }
  }

  /** Distinct token-trigram shingles per document (mirrors Dedup.shingles). */
  /** Per-document bigram-LM scores (shared by bigram_logprob and
    * perplexity_buckets): add-one-smoothed conditional surprisal, e6
    * integer contract.
    */
  /** DSIR per-doc log-importance scores (`doc_scores`): hashed
    * unigram+bigram features, ONE conditional aggregate for both the
    * target (lang='en') and raw bucket counts, add-one smoothing over
    * the 256-bucket space, per-bucket log ratio floored to an e6
    * integer model-side so document scores are exact integer sums.
    */
  private val dsirWeightsCte =
    """WITH arrs AS (
      |  SELECT doc_id, lang = 'en' AS is_target, string_split(text, ' ') AS arr
      |  FROM documents
      |), uni AS (
      |  SELECT doc_id, is_target, unnest(arr) AS feat FROM arrs
      |), bi AS (
      |  SELECT doc_id, is_target, arr[i - 1] || ' ' || arr[i] AS feat
      |  FROM (SELECT doc_id, is_target, arr, unnest(range(2, len(arr) + 1)) AS i
      |        FROM arrs)
      |), feats AS (
      |  SELECT * FROM uni UNION ALL SELECT * FROM bi
      |), counts AS (
      |  SELECT substr(md5(feat), 1, 2) AS bkt, count(*) AS rc,
      |    sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS tc
      |  FROM feats GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(rc) AS BIGINT) AS rt, CAST(sum(tc) AS BIGINT) AS tt
      |  FROM counts
      |), w AS (
      |  SELECT bkt,
      |    CAST(floor((ln(CAST(tc + 1 AS DOUBLE) / CAST(tt + 256 AS DOUBLE))
      |              - ln(CAST(rc + 1 AS DOUBLE) / CAST(rt + 256 AS DOUBLE)))
      |      * 1000000.0) AS BIGINT) AS w_e6
      |  FROM counts CROSS JOIN tot
      |), doc_scores AS (
      |  SELECT f.doc_id, bool_or(f.is_target) AS is_target,
      |    count(*) AS n_feats, CAST(sum(w.w_e6) AS BIGINT) AS score_e6
      |  FROM feats f JOIN w ON substr(md5(f.feat), 1, 2) = w.bkt
      |  GROUP BY f.doc_id)
      |""".stripMargin

  private val bigramDocScoresCte =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), bg AS (
      |  SELECT doc_id, t[i - 1] AS w1, t[i] AS w2
      |  FROM (SELECT doc_id, t, unnest(range(2, len(t) + 1)) AS i FROM toks)
      |), model AS (
      |  SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY w1, w2
      |), ctx AS (
      |  SELECT w1, CAST(sum(cnt) AS BIGINT) AS ctx_cnt FROM model GROUP BY w1
      |), voc AS (
      |  SELECT count(DISTINCT tok) AS v FROM (
      |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |), scored AS (
      |  SELECT m.w1, m.w2,
      |    CAST(floor(-ln((CAST(m.cnt AS DOUBLE) + 1.0)
      |        / (CAST(c.ctx_cnt AS DOUBLE) + CAST(voc.v AS DOUBLE)))
      |      * 1000000.0) AS BIGINT) AS s_e6
      |  FROM model m JOIN ctx c USING (w1) CROSS JOIN voc
      |), doc_scores AS (
      |  SELECT doc_id, count(*) AS n_bigrams,
      |    CAST(sum(s_e6) AS BIGINT) AS surprisal_e6,
      |    CAST(CAST(sum(s_e6) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |      AS avg_surprisal_e6
      |  FROM bg JOIN scored USING (w1, w2)
      |  GROUP BY doc_id
      |)
      |""".stripMargin

  private val shinglesCte =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      |  FROM toks
      |)""".stripMargin

  private lazy val phraseSearchSql: String =
    """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS arr FROM documents
        |), p AS (
        |  SELECT doc_id, arr[i] AS token, CAST(i - 1 AS BIGINT) AS pos
        |  FROM (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS i FROM t)
        |), a AS (
        |  SELECT doc_id, list(pos ORDER BY pos) AS pa FROM p
        |  WHERE token = 'table' GROUP BY doc_id
        |), b AS (
        |  SELECT doc_id, list(pos ORDER BY pos) AS pb FROM p
        |  WHERE token = 'hash' GROUP BY doc_id
        |), hits AS (
        |  SELECT a.doc_id,
        |    CAST(len(list_intersect(list_transform(pa, x -> x + 1), pb)) AS BIGINT) AS n_hits
        |  FROM a JOIN b USING (doc_id))
        |SELECT doc_id, n_hits FROM hits WHERE n_hits > 0
        |ORDER BY doc_id""".stripMargin

  private lazy val ngramCoverageSql: String =
    shinglesCte +
      """, owner AS (
      |  SELECT shingle, min(doc_id) AS owner FROM sh GROUP BY shingle
      |), per AS (
      |  SELECT s.doc_id, count(*) AS n_shingles,
      |    CAST(sum(CASE WHEN o.owner = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      |  FROM sh s JOIN owner o USING (shingle) GROUP BY s.doc_id)
      |SELECT doc_id, n_shingles, n_novel,
      |  CAST(sum(n_novel) OVER (ORDER BY doc_id) AS BIGINT) AS cum_novel
      |FROM per ORDER BY doc_id""".stripMargin

  /** Positional 8-gram span CTE (substring-dedup family) — every window of
    * 8 consecutive whitespace tokens, occurrences kept (no DISTINCT:
    * unlike shingle sets, substring dedup counts every occurrence).
    */
  private val spansCte =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), g AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(t) - 6),
      |      i -> array_to_string(t[i:i+7], ' '))) AS gram
      |  FROM toks
      |)
      |""".stripMargin

  /** Contamination oracle, shared by the broadcast-join and Bloom-filter
    * engine paths (both produce the identical exact result).
    */
  private val contaminationSql =
    shinglesCte +
      s""", bench AS (SELECT DISTINCT shingle FROM sh
      |  WHERE doc_id % 97 = 0 AND doc_id <= ${TextAnalysis.MaxBenchmarkDocId}),
      |totals AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
      |hits AS (
      |  SELECT s.doc_id, count(*) AS n_contaminated
      |  FROM sh s JOIN bench USING (shingle) GROUP BY s.doc_id)
      |SELECT t.doc_id, t.n_shingles,
      |  CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
      |  CAST(coalesce(h.n_contaminated, 0) AS DOUBLE) / CAST(t.n_shingles AS DOUBLE) AS contamination,
      |  t.doc_id % 97 = 0 AND t.doc_id <= ${TextAnalysis.MaxBenchmarkDocId} AS is_benchmark
      |FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Generated SQL for the 64-bit SimHash fingerprint (mirrors
    * Dedup.simhash's ascii-decoded md5 nibble bits exactly).
    */
  /** Oracle twin of `Multimodal.phashFingerprints`: the engine's hash
    * reads PNG-decoded raster samples, but PNG grayscale is lossless, so
    * the decoded pixel IS the synthesized byte — replayed here as
    * positional text bytes (pixel k = byte at the downsampled position
    * k·len/72, integer floor on both sides). Bit y·8+x of the 64-bit
    * dHash is pixel(x+1,y) > pixel(x,y); chunks c0..c3 are 16-bit slices.
    */
  private lazy val phashFpCte: String = {
    val n = Multimodal.PhashPixels
    val hw = Multimodal.HashW
    val pxCols = (0 until n).map(k =>
      s"ascii(substr(text, 1 + (($k * length(text)) // $n), 1)) AS p$k")
      .mkString(",\n    ")
    def chunk(j: Int) = (0 until 16).map { b =>
      val k = j * 16 + b
      val y = k / (hw - 1)
      val x = k % (hw - 1)
      s"(CASE WHEN p${y * hw + x + 1} > p${y * hw + x} THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    val chunkCols = (0 until 4).map(j =>
      s"CAST(${chunk(j)} AS BIGINT) AS c$j").mkString(",\n    ")
    s"""WITH imgs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, '~' || substr(text, 2)
      |  FROM documents WHERE doc_id % 50 = 0
      |), px AS (
      |  SELECT doc_id,
      |    $pxCols
      |  FROM imgs
      |), fp AS (
      |  SELECT doc_id,
      |    $chunkCols
      |  FROM px
      |)""".stripMargin
  }

  /** Shared gradient-fingerprint CTE generator for the synthetic
    * media fixtures: per doc, 64 gradient-sign bits of the sequence
    * `(doc_id·mult + step·i) mod m`, packed as the family's 4×16-bit
    * chunks (c0..c3). `video_phash_partners` replays the Y4M mean-luma
    * recipe with (7, 13, 220); `audio_phash_partners` replays the WAV
    * window-energy recipe with (11, 17, 199). A broken container
    * writer, parser, frame-walk, or sample decode on the Spark side
    * flips bits and fails the hash gate.
    */
  private def gradientFpCte(mult: Int, step: Int, mod: Int): String = {
    def chunk(c: Int) =
      s"""CAST(list_sum(list_transform(range(0, 16), b ->
         |      CASE WHEN (doc_id * $mult + $step * (16 * $c + b + 1)) % $mod
         |              > (doc_id * $mult + $step * (16 * $c + b)) % $mod
         |           THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END))
         |      AS BIGINT) AS c$c""".stripMargin
    s"""WITH fp AS (
       |  SELECT doc_id,
       |    ${(0 until 4).map(chunk).mkString(",\n    ")}
       |  FROM documents
       |)""".stripMargin
  }

  private lazy val videoFpCte: String = gradientFpCte(7, 13, 220)
  private lazy val audioFpCte: String = gradientFpCte(11, 17, 199)

  /** The capped-partner replay shared by `simhash_partners`,
    * `phash_partners`, `video_phash_partners` and `audio_phash_partners`
    * — identical SQL over
    * whichever fingerprint CTE defines `fp(doc_id, c0..c3)`: first
    * maxBucket=64 members per (chunk, value) bucket, pairs within the
    * cap, Hamming ≤ 12, per-doc top-5 by (hamming, partner). */
  private val partnersReplaySql: String =
    """, ch AS (
      |  SELECT doc_id, 0 AS ci, c0 AS cv FROM fp
      |  UNION ALL SELECT doc_id, 1, c1 FROM fp
      |  UNION ALL SELECT doc_id, 2, c2 FROM fp
      |  UNION ALL SELECT doc_id, 3, c3 FROM fp),
      |capped AS (
      |  SELECT doc_id, ci, cv FROM (
      |    SELECT doc_id, ci, cv,
      |      row_number() OVER (PARTITION BY ci, cv ORDER BY doc_id) AS br
      |    FROM ch) WHERE br <= 64),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM capped x JOIN capped y
      |    ON x.ci = y.ci AND x.cv = y.cv AND x.doc_id < y.doc_id),
      |r AS (SELECT doc_id AS doc_b, c0 AS d0, c1 AS d1, c2 AS d2, c3 AS d3 FROM fp),
      |pairs AS (
      |  SELECT c.doc_a, c.doc_b,
      |    CAST(bit_count(xor(f.c0, r.d0)) + bit_count(xor(f.c1, r.d1))
      |       + bit_count(xor(f.c2, r.d2)) + bit_count(xor(f.c3, r.d3)) AS INTEGER) AS hamming
      |  FROM cand c JOIN fp f ON f.doc_id = c.doc_a
      |    JOIN r ON r.doc_b = c.doc_b
      |  WHERE bit_count(xor(f.c0, r.d0)) + bit_count(xor(f.c1, r.d1))
      |      + bit_count(xor(f.c2, r.d2)) + bit_count(xor(f.c3, r.d3)) <= 12),
      |mirrored AS (
      |  SELECT doc_a AS doc_id, doc_b AS partner, hamming FROM pairs
      |  UNION ALL
      |  SELECT doc_b AS doc_id, doc_a AS partner, hamming FROM pairs)
      |SELECT doc_id, partner, hamming, rk FROM (
      |  SELECT doc_id, partner, hamming,
      |    CAST(row_number() OVER (PARTITION BY doc_id
      |      ORDER BY hamming, partner) AS INTEGER) AS rk
      |  FROM mirrored)
      |WHERE rk <= 5 ORDER BY doc_id, rk""".stripMargin

  private val simhashFpCte: String = {
    val hvs = (1 to 16).map { nib =>
      s"(ascii(substr(m, $nib, 1)) - CASE WHEN ascii(substr(m, $nib, 1)) >= 97 THEN 87 ELSE 48 END) AS hv$nib"
    }.mkString(",\n    ")
    val votes = (0 until 64).map { b =>
      s"sum(CASE WHEN ((hv${b / 4 + 1} >> ${b % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS v$b"
    }.mkString(",\n    ")
    val chunks = (0 until 4).map { c =>
      val bits = (0 until 16)
        .map(i => s"(CASE WHEN v${c * 16 + i} > 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      s"CAST($bits AS BIGINT) AS c$c"
    }.mkString(",\n    ")
    s"""WITH tokens AS (
       |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       |), h AS (
       |  SELECT doc_id, md5(tok) AS m FROM tokens
       |), hx AS (
       |  SELECT doc_id,
       |    $hvs
       |  FROM h
       |), votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM hx GROUP BY doc_id
       |), fp AS (
       |  SELECT doc_id,
       |    $chunks
       |  FROM votes
       |)""".stripMargin
  }

  /** Generated SQL for the 8-plane sign-random-projection bucket (mirrors
    * Similarity.bucketOf: md5-derived weights, 0-based dims). `table`
    * selects the independent hash table (globally-numbered planes, same
    * as the engine's OR-construction).
    */
  private def lshBucketExprFor(table: Int): String =
    (0 until Similarity.NumPlanes).map { p =>
      val plane = table * Similarity.NumPlanes + p
      val w = s"((ascii(substr(md5('${plane}_' || CAST(i - 1 AS VARCHAR)), 1, 1)) - " +
        s"CASE WHEN ascii(substr(md5('${plane}_' || CAST(i - 1 AS VARCHAR)), 1, 1)) >= 97 THEN 87 ELSE 48 END) - 7.5)"
      s"(CASE WHEN list_sum(list_transform(range(1, 65), i -> v[i] * $w)) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  private val lshBucketExpr: String = lshBucketExprFor(0)

  private val embedCte =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), n AS (
      |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
      |)""".stripMargin

  private val dotExpr =
    "list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))"

  /** Shared by `cusum_alerts` and `cusum_stream`: the streaming replay
    * must reproduce the batch fold bit-for-bit, so both rows hold to
    * one text — the max(0,·) recurrence unrolled to prefix sums minus
    * a running min over exact integer cents.
    */
  private lazy val cusumOracleSql: String =
    s"""WITH c AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |), k AS (
      |  SELECT CAST(floor(CAST(sum(cents) AS DOUBLE) / count(*)) AS BIGINT)
      |    AS kk FROM c
      |), p AS (
      |  SELECT user_id, ts, event_id,
      |    sum(cents - kk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pf
      |  FROM c CROSS JOIN k
      |), r AS (
      |  SELECT user_id,
      |    pf - least(min(pf) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cusum
      |  FROM p)
      |SELECT user_id, count(*) AS n_events,
      |  CAST(max(cusum) AS BIGINT) AS max_cusum_cents,
      |  CAST(sum(CASE WHEN cusum >= ${operators.Events.CusumThresholdCents}
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms
      |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Shared by `ann_ivf_topk` and `ann_ivf_persisted`: the persisted-index
    * serve is defined to reproduce the in-flight serve bit-for-bit. */
  private lazy val annIvfTopKOracle =
    embedCte +
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
      |    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id)
      |SELECT vec_id, cluster, other_id, cos_e6, CAST(rk AS INTEGER) AS rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_e6 DESC, other_id) AS rk
      |  FROM p)
      |WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin

  /** `ann_batch_serve`: the head-query multi-probe replay of
    * [[annIvfTopKOracle]] — queries are the first 8 corpus vectors, each
    * probing its top-2 cells (crk <= 2); candidates come from the full
    * crk = 1 index side. The engine's literal-IN pruning is a scan
    * optimization with no result-set effect, so the oracle needs no
    * counterpart for it.
    */
  private lazy val annBatchServeOracle =
    embedCte +
      s""", cents AS (
      |  SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 16
      |), scored AS (
      |  SELECT a.vec_id, a.v, a.nrm, c.cent_id,
      |    CAST(floor(list_sum(list_transform(range(1, 65), i -> a.v[i] * c.cv[i])) / (a.nrm * c.cnrm) * 1000000.0) AS BIGINT) AS cscore
      |  FROM n a CROSS JOIN cents c
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cscore DESC, cent_id) AS crk
      |  FROM scored
      |), assigned AS (
      |  SELECT vec_id, v, nrm, cent_id AS cluster FROM ranked WHERE crk = 1
      |), head AS (SELECT vec_id FROM n ORDER BY vec_id LIMIT 8),
      |probes AS (
      |  SELECT r.vec_id, r.v, r.nrm, r.cent_id AS cluster
      |  FROM ranked r JOIN head h ON r.vec_id = h.vec_id WHERE r.crk <= 2
      |), p AS (
      |  SELECT a.vec_id AS vec_id, b.cluster AS cluster, b.vec_id AS other_id,
      |    CAST(floor($dotExpr / (a.nrm * b.nrm) * 1000000.0) AS BIGINT) AS cos_e6
      |  FROM probes a JOIN assigned b
      |    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id)
      |SELECT vec_id, cluster, other_id, cos_e6, CAST(rk AS INTEGER) AS rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_e6 DESC, other_id) AS rk
      |  FROM p)
      |WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin

  /** `ann_partners`: the within-cell all-pairs definition with the
    * index-side cell cap replayed exactly (QUALIFY row_number ≤ maxCell
    * by vec_id — inactive at gate scale, mirrored anyway so the oracle
    * stays definitionally in lockstep with the operator's bound). */
  private lazy val annPartnersOracle =
    embedCte + annPartnersOracleBody(64)

  /** The annPartners replay body over ANY `n(vec_id, v, nrm)` CTE —
    * shared by the raw-embedding and image-descriptor modalities
    * (`dims` only changes the dot-product width). */
  private def annPartnersOracleBody(dims: Int,
      centsWhere: String = "vec_id < 16"): String =
      s""", cents AS (
      |  SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n WHERE $centsWhere
      |), scored AS (
      |  SELECT a.vec_id, a.v, a.nrm, c.cent_id,
      |    CAST(floor(list_sum(list_transform(range(1, ${dims + 1}), i -> a.v[i] * c.cv[i])) / (a.nrm * c.cnrm) * 1000000.0) AS BIGINT) AS cscore
      |  FROM n a CROSS JOIN cents c
      |), assigned AS (
      |  SELECT vec_id, v, nrm, cent_id AS cluster FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cscore DESC, cent_id) AS crk
      |    FROM scored) WHERE crk = 1
      |), capped AS (
      |  SELECT vec_id, v, nrm, cluster FROM assigned
      |  QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY vec_id) <= 256
      |), p AS (
      |  SELECT a.vec_id AS vec_id, b.vec_id AS other_id,
      |    CAST(floor(list_sum(list_transform(range(1, ${dims + 1}), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) * 1000000.0) AS BIGINT) AS cos_e6
      |  FROM assigned a JOIN capped b
      |    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id)
      |SELECT vec_id, other_id, cos_e6, CAST(rk AS INTEGER) AS rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_e6 DESC, other_id) AS rk
      |  FROM p)
      |WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin

  /** The PQ subspace/codebook/distance CTE chain shared by `pq_encode`
    * and `ann_ivfpq_topk`: 8 contiguous 8-dim subspaces, codewords = the
    * m-th subvectors of the first 16 vectors, d2_e6 = floor(1e6 · squared
    * L2) between every (vector, subspace) slice and every codeword —
    * `dist` doubles as the encode argmin input and the IVFADC lookup
    * table.
    */
  private val pqDistCtes = pqDistCtesFrom("n")

  /** [[pqDistCtes]] parameterized by the vector source CTE and the
    * codebook row filter — the seam the RESIDUAL variants use to slice
    * `v - centroid` (CTE `rn`) with codewords from vectors 16..31
    * (the first 16 are the centroids themselves, whose residuals are
    * identically zero). Defaults reproduce the raw text byte-for-byte.
    */
  private def pqDistCtesFrom(src: String,
      cbWhere: String = "vec_id < 16",
      codeIdExpr: String = "vec_id"): String =
    s""", ms AS (
      |  SELECT CAST(range AS INTEGER) AS m FROM range(0, 8)
      |), subs AS (
      |  SELECT vec_id, m, list_transform(range(1, 9), i -> v[m * 8 + i]) AS sv
      |  FROM $src CROSS JOIN ms
      |), cb AS (
      |  SELECT m, $codeIdExpr AS code_id, sv AS cw FROM subs WHERE $cbWhere
      |), dist AS (
      |  SELECT s.vec_id, s.m, c.code_id,
      |    CAST(floor(list_sum(list_transform(range(1, 9), i -> (s.sv[i] - c.cw[i]) * (s.sv[i] - c.cw[i]))) * 1000000.0) AS BIGINT) AS d2_e6
      |  FROM subs s JOIN cb c ON s.m = c.m
      |)""".stripMargin

  /** `pq_encode`: the per-(vector, subspace) argmin over the shared
    * distance relation (ties → lowest codeword id). */
  private lazy val pqEncodeOracle =
    embedCte + pqDistCtes +
      """
      |SELECT vec_id, m, code_id AS code, d2_e6 FROM dist
      |QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2_e6, code_id) = 1
      |ORDER BY vec_id, m""".stripMargin

  /** `ann_ivfpq_topk`: IVF cell assignment + PQ codes + the ADC sum over
    * `dist`-as-LUT, ranked ascending. The sum is CAST to BIGINT — the
    * DuckDB sum(BIGINT)→HUGEINT escape (the cusum lesson). */
  /** Exact brute-force cosine top-k over the bounded query head — the
    * ground-truth relation ann_topk registers and pq_recall reuses.
    */
  private lazy val annTopkOracle =
    embedCte +
      s""", q AS (
      |  SELECT * FROM n ORDER BY vec_id LIMIT ${Similarity.MaxBruteForceQueries}
      |), p AS (
      |  SELECT a.vec_id AS vec_id, b.vec_id AS other_id,
      |    CAST(floor($dotExpr / (a.nrm * b.nrm) * 1000000.0) AS BIGINT) AS cos_e6
      |  FROM q a JOIN n b ON a.vec_id <> b.vec_id)
      |SELECT vec_id, other_id, cos_e6, CAST(rk AS INTEGER) AS rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_e6 DESC, other_id) AS rk
      |  FROM p)
      |WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin

  /** The multiprobe IVF top-k select, parameterized by the probe count —
    * the `ann_ivf_multiprobe` oracle (p = 2) and every leg of the
    * `ivf_probe_recall` curve share this one text, so the curve can
    * never drift from the serve it measures.
    */
  private def multiprobeSql(p: Int): String =
    embedCte +
      s""", cents AS (
      |  SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 16
      |), scored AS (
      |  SELECT a.vec_id, a.v, a.nrm, c.cent_id,
      |    CAST(floor(list_sum(list_transform(range(1, 65), i -> a.v[i] * c.cv[i])) / (a.nrm * c.cnrm) * 1000000.0) AS BIGINT) AS cscore
      |  FROM n a CROSS JOIN cents c
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cscore DESC, cent_id) AS crk
      |  FROM scored
      |), assigned AS (
      |  SELECT vec_id AS other_id, v AS vb, nrm AS nrm_b, cent_id AS cell
      |  FROM ranked WHERE crk = 1
      |), probes AS (
      |  SELECT vec_id, v, nrm, cent_id AS cell FROM ranked WHERE crk <= $p
      |), p AS (
      |  SELECT q.vec_id AS vec_id, a.other_id,
      |    CAST(floor(list_sum(list_transform(range(1, 65), i -> q.v[i] * a.vb[i])) / (q.nrm * a.nrm_b) * 1000000.0) AS BIGINT) AS cos_e6
      |  FROM probes q JOIN assigned a
      |    ON q.cell = a.cell AND q.vec_id <> a.other_id)
      |SELECT vec_id, other_id, cos_e6, CAST(rk AS INTEGER) AS rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_e6 DESC, other_id) AS rk
      |  FROM p)
      |WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin

  /** ivf_probe_recall: one presence-count row per probe setting, each
    * leg the [[multiprobeSql]] text verbatim against the [[annTopkOracle]]
    * ground truth restricted to the bounded query head.
    */
  private def ivfProbeRecallOracle(probes: Seq[Int]): String = {
    val rows = probes.map { p =>
      s""",
      |cand$p AS (SELECT c.vec_id, c.other_id
      |  FROM (${multiprobeSql(p)}
      |  ) c JOIN qs USING (vec_id)
      |), row$p AS (
      |  SELECT CAST($p AS INTEGER) AS num_probes,
      |    CAST(sum(tt.t) AS BIGINT) AS n_true,
      |    CAST(sum(cc.m) AS BIGINT) AS n_candidates,
      |    CAST(sum(CASE WHEN tt.t IS NOT NULL AND cc.m IS NOT NULL
      |         THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
      |  FROM (SELECT vec_id, other_id, 1 AS t FROM truth) tt
      |  FULL OUTER JOIN (SELECT vec_id, other_id, 1 AS m FROM cand$p) cc
      |    USING (vec_id, other_id)
      |)""".stripMargin
    }.mkString
    s"""WITH truth AS ($annTopkOracle
      |), qs AS (
      |  SELECT vec_id FROM embeddings ORDER BY vec_id
      |  LIMIT ${Similarity.MaxBruteForceQueries}
      |)""".stripMargin + rows +
      probes.map(p => s"SELECT * FROM row$p").mkString(
        "\n", "\nUNION ALL\n", "\nORDER BY num_probes")
  }

  /** pq_recall: both legs replayed whole (nested WITH inside each CTE
    * body — truth is [[annTopkOracle]], cand is [[annIvfpqOracle]]
    * verbatim, so this oracle can never drift from the two it audits),
    * joined on the truth's bounded query head with the engine's
    * full-outer presence aggregation.
    */
  private lazy val pqRecallOracle = pqRecallOracleWith(annIvfpqOracle)

  /** [[pqRecallOracle]] parameterized by the candidate serve's oracle,
    * so the auto-sized and IMI quantizers carry their own
    * measured-quality rows without re-stating the recall aggregation. */
  private def pqRecallOracleWith(candSql: String) =
    s"""WITH truth AS ($annTopkOracle
      |), cand0 AS ($candSql
      |), qs AS (SELECT DISTINCT vec_id FROM truth
      |), cand AS (
      |  SELECT c.vec_id, c.other_id FROM cand0 c JOIN qs USING (vec_id)
      |)
      |SELECT CAST(sum(tt.t) AS BIGINT) AS n_true,
      |  CAST(sum(cc.c) AS BIGINT) AS n_candidates,
      |  CAST(sum(CASE WHEN tt.t IS NOT NULL AND cc.c IS NOT NULL
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
      |FROM (SELECT vec_id, other_id, 1 AS t FROM truth) tt
      |FULL OUTER JOIN (SELECT vec_id, other_id, 1 AS c FROM cand) cc
      |  USING (vec_id, other_id)""".stripMargin

  /** Matryoshka recall: annTopkOracle is truth; the candidate leg is
    * the same exact scan with vectors sliced to the first 16 dims
    * BEFORE the norm, so cosine geometry is the truncated space's own.
    */
  private lazy val matryoshkaOracle = {
    val d = 16
    s"""WITH truth AS ($annTopkOracle
      |), cand AS (
      |  WITH e AS (
      |    SELECT vec_id,
      |      list_transform(embedding[1:$d], x -> CAST(x AS DOUBLE)) AS v
      |    FROM embeddings
      |  ), n AS (
      |    SELECT vec_id, v,
      |      sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
      |  ), q AS (
      |    SELECT * FROM n ORDER BY vec_id
      |    LIMIT ${operators.Similarity.MaxBruteForceQueries}
      |  ), p AS (
      |    SELECT a.vec_id AS vec_id, b.vec_id AS other_id,
      |      CAST(floor(list_sum(list_transform(range(1, ${d + 1}),
      |        i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) * 1000000.0)
      |        AS BIGINT) AS cos_e6
      |    FROM q a JOIN n b ON a.vec_id <> b.vec_id)
      |  SELECT vec_id, other_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY cos_e6 DESC, other_id) AS rk
      |    FROM p)
      |  WHERE rk <= 5
      |)
      |SELECT CAST($d AS INT) AS dims,
      |  CAST(sum(tt.t) AS BIGINT) AS n_true,
      |  CAST(sum(cc.c) AS BIGINT) AS n_candidates,
      |  CAST(sum(CASE WHEN tt.t IS NOT NULL AND cc.c IS NOT NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
      |FROM (SELECT vec_id, other_id, 1 AS t FROM truth) tt
      |FULL OUTER JOIN (SELECT vec_id, other_id, 1 AS c FROM cand) cc
      |  USING (vec_id, other_id)""".stripMargin
  }

  private lazy val annIvfpqOracle = annIvfpqOracleWith("vec_id < 16")

  /** `ann_ivfpq_auto` mirrors Similarity.centroidsFor(count): the same
    * IVFADC body with the centroid count derived from the corpus —
    * parameterized here at the definition site (the bpeTrainOracleChain
    * discipline) so the fixed and auto forms can never drift apart.
    */
  private lazy val annIvfpqAutoOracle = annIvfpqOracleWith(
    "vec_id < (SELECT greatest(4, least(4096, count(*) // 256)) FROM embeddings)")

  private def annIvfpqOracleWith(centsWhere: String) =
    embedCte + ivfAssignHeader(centsWhere) + ivfpqOracleTail

  /** The flat-quantizer cell-assignment CTEs (cents → cscored →
    * assigned) — shared by the raw, auto-sized, and residual IVFADC
    * oracles. */
  private def ivfAssignHeader(centsWhere: String) =
      s""", cents AS (
      |  SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n WHERE $centsWhere
      |), cscored AS (
      |  SELECT a.vec_id, c.cent_id,
      |    CAST(floor(list_sum(list_transform(range(1, 65), i -> a.v[i] * c.cv[i])) / (a.nrm * c.cnrm) * 1000000.0) AS BIGINT) AS cscore
      |  FROM n a CROSS JOIN cents c
      |), assigned AS (
      |  SELECT vec_id, cent_id AS cluster FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cscore DESC, cent_id) AS crk
      |    FROM cscored) WHERE crk = 1
      |)""".stripMargin

  /** The residual relation: every vector minus its assigned cell's
    * centroid, shaped (vec_id, v) so [[pqDistCtesFrom]] slices it
    * exactly like the raw `n`. */
  private val residualCte =
      """, rn AS (
      |  SELECT a.vec_id, list_transform(range(1, 65), i -> b.v[i] - c.cv[i]) AS v
      |  FROM assigned a JOIN n b ON a.vec_id = b.vec_id
      |  JOIN cents c ON a.cluster = c.cent_id
      |)""".stripMargin

  /** The residual PQ distance chain: [[pqDistCtesFrom]] over `rn` with
    * codewords = residual slices of vectors 16..31 renumbered 0..15
    * (the first 16 vectors ARE the centroids — zero residuals). */
  private val residualDistCtes = pqDistCtesFrom("rn",
    cbWhere = "vec_id >= 16 AND vec_id < 32", codeIdExpr = "vec_id - 16")

  /** `pq_encode_residual`: the per-(vector, subspace) argmin over the
    * residual distance relation — pqEncodeOracle's text with the
    * residual chain swapped in. */
  private lazy val pqEncodeResidualOracle =
    embedCte + ivfAssignHeader("vec_id < 16") + residualCte +
      residualDistCtes +
      """
      |SELECT vec_id, m, code_id AS code, d2_e6 FROM dist
      |QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2_e6, code_id) = 1
      |ORDER BY vec_id, m""".stripMargin

  /** `ann_ivfpq_residual`: the IVFADC serve with codes and LUT both in
    * residual space — assignment header + residual distance chain + the
    * shared ADC tail verbatim. */
  private lazy val annIvfpqResidualOracle =
    embedCte + ivfAssignHeader("vec_id < 16") + residualCte +
      residualDistCtes + ivfpqAdcCtes + ivfpqTopSelect(5)

  /** `ann_ivfpq_rerank`: the raw IVFADC chain kept as CTEs with the
    * shortlist cut at kAdc = 20, then each (query, candidate) joins
    * back its full-precision vectors and re-ranks by exact cosine. */
  private lazy val annIvfpqRerankOracle =
    embedCte + ivfAssignHeader("vec_id < 16") + pqDistCtes +
      ivfpqAdcCtes +
      """, shortlist AS (
      |  SELECT vec_id, other_id FROM adc
      |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY adc_e6, other_id) <= 20
      |), rr AS (
      |  SELECT s.vec_id, s.other_id,
      |    CAST(floor(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) * 1000000.0) AS BIGINT) AS cos_e6
      |  FROM shortlist s JOIN n a ON s.vec_id = a.vec_id
      |  JOIN n b ON s.other_id = b.vec_id)
      |SELECT vec_id, other_id, cos_e6, CAST(rk AS INTEGER) AS rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_e6 DESC, other_id) AS rk
      |  FROM rr)
      |WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin

  /** `pq_residual_gain`: both encodes replayed whole (nested WITH, the
    * pqRecall discipline) and reduced to one row of exact integer
    * totals — the residual-coding win as a hash-gated VALUE. */
  private lazy val pqResidualGainOracle =
    s"""WITH raw AS ($pqEncodeOracle
      |), res AS ($pqEncodeResidualOracle
      |)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM raw) AS n_rows,
      |  (SELECT CAST(sum(d2_e6) AS BIGINT) FROM raw) AS raw_err_e6,
      |  (SELECT CAST(sum(d2_e6) AS BIGINT) FROM res) AS residual_err_e6""".stripMargin

  /** The IVFADC body shared by every assignment strategy's oracle (flat
    * fixed/auto, two-level IMI): consumes an `assigned(vec_id, cluster)`
    * CTE and replays cap → pairs → codes → ADC → top-k.
    */
  private lazy val ivfpqOracleTail = pqDistCtes + ivfpqAdcCtes +
    ivfpqTopSelect(5)

  /** The ADC chain as CTEs (codes → cap → pairs → adc) — consumes
    * `assigned` and `dist`, shared verbatim by every quantizer's serve
    * oracle; the rerank oracle keeps composing after `adc` instead of
    * selecting, which is why the final SELECT lives apart. */
  private val ivfpqAdcCtes =
      """, codes AS (
      |  SELECT vec_id AS other_id, m, code_id AS code FROM dist
      |  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d2_e6, code_id) = 1
      |), icapped AS (
      |  SELECT vec_id, cluster FROM assigned
      |  QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY vec_id) <= 256
      |), pairs AS (
      |  SELECT a.vec_id, b.vec_id AS other_id
      |  FROM assigned a JOIN icapped b
      |    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
      |), adc AS (
      |  SELECT p.vec_id, p.other_id, CAST(sum(l.d2_e6) AS BIGINT) AS adc_e6
      |  FROM pairs p
      |  JOIN codes k ON k.other_id = p.other_id
      |  JOIN dist l ON l.vec_id = p.vec_id AND l.m = k.m AND l.code_id = k.code
      |  GROUP BY p.vec_id, p.other_id)""".stripMargin

  private def ivfpqTopSelect(k: Int): String =
      s"""
      |SELECT vec_id, other_id, adc_e6, CAST(rk AS INTEGER) AS rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY adc_e6, other_id) AS rk
      |  FROM adc)
      |WHERE rk <= $k ORDER BY vec_id, rk""".stripMargin

  /** `ann_ivfpq_imi` mirrors Similarity.twoLevelAssign under the auto
    * sizing: supers = first ⌈√nc⌉ vectors, cells parented to their
    * nearest super, each vector routed super-first then within the
    * chosen super's children — every argmax the shared e6-floored
    * (score desc, id) convention — then the common IVFADC tail.
    */
  private lazy val annIvfpqImiOracle =
    embedCte +
      s""", params AS (
      |  SELECT greatest(4, least(4096, count(*) // 256)) AS nc,
      |    CAST(ceil(sqrt(greatest(4, least(4096, count(*) // 256)))) AS BIGINT) AS l1
      |  FROM embeddings
      |), sups AS (
      |  SELECT vec_id AS sup_id, v AS sv, nrm AS snrm FROM n
      |  WHERE vec_id < (SELECT l1 FROM params)
      |), cents AS (
      |  SELECT vec_id AS cent_id, v AS cv, cnrm FROM (
      |    SELECT vec_id, v, nrm AS cnrm FROM n
      |    WHERE vec_id < (SELECT nc FROM params))
      |), pscored AS (
      |  SELECT c.cent_id, c.cv, c.cnrm, s.sup_id,
      |    CAST(floor(list_sum(list_transform(range(1, 65), i -> c.cv[i] * s.sv[i])) / (c.cnrm * s.snrm) * 1000000.0) AS BIGINT) AS sscore
      |  FROM cents c CROSS JOIN sups s
      |), parents AS (
      |  SELECT cent_id, cv, cnrm, sup_id AS parent FROM (
      |    SELECT *, row_number() OVER (PARTITION BY cent_id ORDER BY sscore DESC, sup_id) AS srk
      |    FROM pscored) WHERE srk = 1
      |), vscored AS (
      |  SELECT a.vec_id, a.v, a.nrm, s.sup_id,
      |    CAST(floor(list_sum(list_transform(range(1, 65), i -> a.v[i] * s.sv[i])) / (a.nrm * s.snrm) * 1000000.0) AS BIGINT) AS sscore
      |  FROM n a CROSS JOIN sups s
      |), vsuper AS (
      |  SELECT vec_id, v, nrm, sup_id AS parent FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sscore DESC, sup_id) AS srk
      |    FROM vscored) WHERE srk = 1
      |), cscored AS (
      |  SELECT x.vec_id, p.cent_id,
      |    CAST(floor(list_sum(list_transform(range(1, 65), i -> x.v[i] * p.cv[i])) / (x.nrm * p.cnrm) * 1000000.0) AS BIGINT) AS cscore
      |  FROM vsuper x JOIN parents p ON x.parent = p.parent
      |), assigned AS (
      |  SELECT vec_id, cent_id AS cluster FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cscore DESC, cent_id) AS crk
      |    FROM cscored) WHERE crk = 1
      |)""".stripMargin + ivfpqOracleTail

  /** `hard_negatives`: the annPartners replay with the anchor's label
    * carried through and a label-mismatch predicate on the candidate
    * join; the cell cap is applied BEFORE the label filter (cap on cell
    * membership, mirroring the operator's bound). */
  private lazy val hardNegativesOracle =
    embedCte +
      """, lab AS (
      |  SELECT vec_id, label FROM embeddings
      |), cents AS (
      |  SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 16
      |), scored AS (
      |  SELECT a.vec_id, a.v, a.nrm, c.cent_id,
      |    CAST(floor(list_sum(list_transform(range(1, 65), i -> a.v[i] * c.cv[i])) / (a.nrm * c.cnrm) * 1000000.0) AS BIGINT) AS cscore
      |  FROM n a CROSS JOIN cents c
      |), assigned AS (
      |  SELECT s.vec_id, s.v, s.nrm, l.label, s.cluster FROM (
      |    SELECT vec_id, v, nrm, cent_id AS cluster FROM (
      |      SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cscore DESC, cent_id) AS crk
      |      FROM scored) WHERE crk = 1) s
      |  JOIN lab l ON s.vec_id = l.vec_id
      |), capped AS (
      |  SELECT vec_id, v, nrm, label, cluster FROM assigned
      |  QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY vec_id) <= 256
      |), p AS (
      |  SELECT a.vec_id, a.label, b.vec_id AS neg_id,
      |    CAST(floor(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) * 1000000.0) AS BIGINT) AS cos_e6
      |  FROM assigned a JOIN capped b
      |    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id AND a.label <> b.label)
      |SELECT vec_id, label, neg_id, cos_e6, CAST(rk AS INTEGER) AS rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_e6 DESC, neg_id) AS rk
      |  FROM p)
      |WHERE rk <= 5 ORDER BY vec_id, rk""".stripMargin

  /** `bitext_mine`: cell-blocked cross-lingual candidates (positive
    * cosine only, so both k-NN denominators are positive by
    * construction), both language sides capped at 256/cell (mirroring
    * the engine's maxCell bound; inactive at gate scale),
    * forward/backward top-4 averages as exact-integer
    * sums over counts, and the margin's one double division replayed in
    * the same operation order. */
  private lazy val bitextMineOracle =
    embedCte +
      """, cents AS (
      |  SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 16
      |), cscored AS (
      |  SELECT a.vec_id, a.v, a.nrm, c.cent_id,
      |    CAST(floor(list_sum(list_transform(range(1, 65), i -> a.v[i] * c.cv[i])) / (a.nrm * c.cnrm) * 1000000.0) AS BIGINT) AS cscore
      |  FROM n a CROSS JOIN cents c
      |), assigned AS (
      |  SELECT vec_id, v, nrm, cent_id AS cluster FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cscore DESC, cent_id) AS crk
      |    FROM cscored) WHERE crk = 1
      |), el AS (
      |  SELECT a.vec_id, a.v, a.nrm, a.cluster, d.lang
      |  FROM assigned a JOIN documents d ON a.vec_id = d.doc_id
      |  WHERE d.lang IN ('en', 'de')
      |), src AS (
      |  SELECT vec_id AS src_id, v AS va, nrm AS nrm_a, cluster FROM el WHERE lang = 'en'
      |  QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY vec_id) <= 256
      |), tgt AS (
      |  SELECT vec_id AS tgt_id, v AS vb, nrm AS nrm_b, cluster FROM el WHERE lang = 'de'
      |  QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY vec_id) <= 256
      |), cand AS (
      |  SELECT s.src_id, t.tgt_id,
      |    CAST(floor(list_sum(list_transform(range(1, 65), i -> s.va[i] * t.vb[i])) / (s.nrm_a * t.nrm_b) * 1000000.0) AS BIGINT) AS cos_e6
      |  FROM src s JOIN tgt t ON s.cluster = t.cluster
      |), cpos AS (
      |  SELECT * FROM cand WHERE cos_e6 > 0
      |), wnn AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY src_id ORDER BY cos_e6 DESC, tgt_id) AS frk,
      |    row_number() OVER (PARTITION BY tgt_id ORDER BY cos_e6 DESC, src_id) AS brk
      |  FROM cpos
      |), favg AS (
      |  SELECT src_id, CAST(sum(cos_e6) AS BIGINT) AS f_sum, count(*) AS f_n
      |  FROM wnn WHERE frk <= 4 GROUP BY src_id
      |), bavg AS (
      |  SELECT tgt_id, CAST(sum(cos_e6) AS BIGINT) AS b_sum, count(*) AS b_n
      |  FROM wnn WHERE brk <= 4 GROUP BY tgt_id
      |), sc AS (
      |  SELECT c.src_id, c.tgt_id, c.cos_e6,
      |    CAST(floor(c.cos_e6 * 2000000.0 / (CAST(f.f_sum AS DOUBLE) / f.f_n + CAST(b.b_sum AS DOUBLE) / b.b_n)) AS BIGINT) AS margin_e6
      |  FROM cpos c
      |  JOIN favg f ON c.src_id = f.src_id
      |  JOIN bavg b ON c.tgt_id = b.tgt_id)
      |SELECT src_id, tgt_id, cos_e6, margin_e6 FROM (
      |  SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY margin_e6 DESC, tgt_id) AS mrk
      |  FROM sc)
      |WHERE mrk = 1 AND margin_e6 >= 1000000
      |ORDER BY src_id""".stripMargin

  /** Image-descriptor replay: pixel k of the 8×8 thumbnail is the text
    * byte at `k·len/64` (PNG grayscale is lossless, so the engine's
    * decoded-raster features equal this byte math bit-for-bit); quadrant
    * q = (k div 32)·2 + (k mod 8 div 4); features are luminance sums and
    * in-patch |horizontal gradient| sums — all exact integers, making the
    * 8-dim cosine's IEEE operands cross-engine reproducible. */
  private val imageEmbedFeatCte =
    """WITH px AS (
      |  SELECT doc_id, k,
      |    ascii(text[CAST(least((k * length(text)) // 64,
      |      length(text) - 1) + 1 AS BIGINT)]) AS p
      |  FROM documents CROSS JOIN (SELECT unnest(range(0, 64)) AS k)
      |), g AS (
      |  SELECT doc_id, k, p,
      |    lead(p) OVER (PARTITION BY doc_id ORDER BY k) AS pn
      |  FROM px
      |), feat AS (
      |  SELECT doc_id, (k // 32) * 2 + ((k % 8) // 4) AS q,
      |    sum(p) AS lum,
      |    sum(CASE WHEN k % 4 < 3 THEN abs(pn - p) ELSE 0 END) AS grad
      |  FROM g GROUP BY doc_id, q
      |)""".stripMargin

  private lazy val imageAnnPartnersOracle =
    imageEmbedFeatCte +
      """, n AS (
      |  SELECT doc_id AS vec_id,
      |    list_transform(list(lum ORDER BY q) || list(grad ORDER BY q),
      |      x -> CAST(x AS DOUBLE)) AS v,
      |    sqrt(list_sum(list_transform(
      |      list(lum ORDER BY q) || list(grad ORDER BY q),
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM feat GROUP BY doc_id
      |)""".stripMargin +
      annPartnersOracleBody(8)

  /** Audio/video embedding replay: the codecs are lossless (PCM-in-WAV;
    * constant-luma C420 planes), so the per-index decoded value is pure
    * doc_id arithmetic; 64 leading windows/frames group into 8 sum
    * features (`feat`) and assemble into the `n(vec_id, v, nrm)` shape
    * the shared annPartners body consumes.
    */
  private def docArithmeticEmbedCte(valueExpr: String): String =
    s"""WITH wins AS (
      |  SELECT doc_id, w, $valueExpr AS s
      |  FROM documents CROSS JOIN (SELECT unnest(range(0, 64)) AS w)
      |), feat AS (
      |  SELECT doc_id, w // 8 AS q, CAST(sum(s) AS DOUBLE) AS f
      |  FROM wins GROUP BY doc_id, q
      |), n AS (
      |  SELECT doc_id AS vec_id, list(f ORDER BY q) AS v,
      |    sqrt(list_sum(list_transform(list(f ORDER BY q), x -> x * x))) AS nrm
      |  FROM feat GROUP BY doc_id
      |)""".stripMargin

  // window w holds AudioFpWinSamples (4) identical decoded samples of
  // value (doc_id*11 + w*17) mod 199 — the audioWindowSums recipe
  private val audioEmbedValueExpr = "4 * ((doc_id * 11 + w * 17) % 199)"
  // frame w's constant-plane mean luma — the videoMeanLumas recipe
  private val videoEmbedValueExpr = "16 + (doc_id * 7 + w * 13) % 220"

  private def mediaEmbedScalarsSql(valueExpr: String): String =
    docArithmeticEmbedCte(valueExpr) +
      """
      |SELECT doc_id,
      |  CAST(max(CASE WHEN q = 0 THEN f END) AS BIGINT) AS f0,
      |  CAST(max(CASE WHEN q = 1 THEN f END) AS BIGINT) AS f1,
      |  CAST(max(CASE WHEN q = 2 THEN f END) AS BIGINT) AS f2,
      |  CAST(max(CASE WHEN q = 3 THEN f END) AS BIGINT) AS f3,
      |  CAST(max(CASE WHEN q = 4 THEN f END) AS BIGINT) AS f4,
      |  CAST(max(CASE WHEN q = 5 THEN f END) AS BIGINT) AS f5,
      |  CAST(max(CASE WHEN q = 6 THEN f END) AS BIGINT) AS f6,
      |  CAST(max(CASE WHEN q = 7 THEN f END) AS BIGINT) AS f7
      |FROM feat GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Shared by `asof_join` and `asof_join_bucketized` (identical
    * semantics by construction — TemporalJoinSpec pins the equivalence).
    */
  private val asofOracleSql =
    """WITH c AS (
      |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
      |), p AS (
      |  SELECT user_id, ts, event_id AS p_event_id, value AS p_value
      |  FROM events WHERE event_type = 'purchase'
      |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
      |)
      |SELECT c.event_id, c.user_id, c.value,
      |  p.p_event_id AS purchase_event_id, p.p_value AS purchase_value
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin

  /** Shared by `rrf_fusion` and `rrf_fusion_indexed` (identical
    * results by construction at gate scale — the probe set covers the
    * true top-20, so the indexed serve is bit-identical).
    */
  private lazy val rrfFusionSql: String =
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
        |), lexs AS (
        |  SELECT doc_id, CAST(sum(term_e6) AS BIGINT) AS bm25_e6
        |  FROM per GROUP BY doc_id ORDER BY bm25_e6 DESC, doc_id LIMIT 20
        |), lex AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY bm25_e6 DESC, doc_id) AS BIGINT) AS lex_rk
        |  FROM lexs
        |), e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), nn AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
        |), qv AS (SELECT * FROM nn WHERE vec_id = 0),
        |p AS (
        |  SELECT b.vec_id AS doc_id,
        |    CAST(floor(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
        |      / (a.nrm * b.nrm) * 1000000.0) AS BIGINT) AS cos_e6
        |  FROM qv a JOIN nn b ON b.vec_id <> a.vec_id
        |), sems AS (
        |  SELECT doc_id, cos_e6,
        |    CAST(row_number() OVER (ORDER BY cos_e6 DESC, doc_id) AS BIGINT) AS sem_rk
        |  FROM p
        |), sem AS (SELECT doc_id, sem_rk FROM sems WHERE sem_rk <= 20),
        |fused AS (
        |  SELECT COALESCE(l.doc_id, s2.doc_id) AS doc_id, l.lex_rk, s2.sem_rk,
        |    COALESCE(CAST(floor(1000000.0 / (60 + l.lex_rk)) AS BIGINT), 0) +
        |    COALESCE(CAST(floor(1000000.0 / (60 + s2.sem_rk)) AS BIGINT), 0) AS rrf_e6
        |  FROM lex l FULL OUTER JOIN sem s2 ON l.doc_id = s2.doc_id
        |), ranked AS (
        |  SELECT CAST(row_number() OVER (ORDER BY rrf_e6 DESC, doc_id) AS BIGINT) AS rk,
        |    doc_id, lex_rk, sem_rk, rrf_e6
        |  FROM fused)
        |SELECT rk, doc_id, lex_rk, sem_rk, rrf_e6
        |FROM ranked WHERE rk <= 20 ORDER BY rk""".stripMargin

  /** The full-pipeline composition oracle: every stage's existing CTE
    * fragment chained into ONE WITH RECURSIVE list, retargeted at the
    * previous stage's output (`chainFrag` strips the fragment's WITH and
    * rebinds its `FROM documents` scans). The BPE chain's word CTE is
    * named `bw` at its definition site (the `wordCte` parameter) to
    * avoid colliding with DSIR's weight CTE `w`.
    */
  private lazy val pipelineDsirPackSql: String = {
    def chainFrag(frag: String, src: String): String =
      frag.replaceAll("^WITH RECURSIVE ", "").replaceAll("^WITH ", "")
        .replace("FROM documents", s"FROM $src")
        .replaceAll("\\s+$", "")
    val quality = gopherC4CleanCte.replaceAll("^WITH ", "")
    val minhash = chainFrag(minhashScoredCte, "cleaned")
    val dsir = chainFrag(dsirWeightsCte, "kept")
    val bpe =
      chainFrag(bpeTrainOracleChain(BpeOracleRounds, wordCte = "bw"),
        "corpus")
    s"""WITH RECURSIVE $quality, cleaned AS (
      |  SELECT c.doc_id, c.text, d.lang
      |  FROM cl c JOIN documents d USING (doc_id)
      |), $minhash, pairs AS (
      |  SELECT doc_a, doc_b FROM scored
      |), edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION SELECT doc_b AS src, doc_a AS dst FROM pairs
      |), reach AS (
      |  SELECT src AS node, dst AS r FROM edges
      |  UNION
      |  SELECT reach.node, edges.dst FROM reach JOIN edges ON reach.r = edges.src
      |), ccl AS (
      |  SELECT node AS doc_id, least(node, min(r)) AS cluster_id
      |  FROM reach GROUP BY node
      |), kept AS (
      |  SELECT c.* FROM cleaned c
      |  WHERE c.doc_id NOT IN (SELECT doc_id FROM ccl WHERE doc_id <> cluster_id)
      |), $dsir, sel AS (
      |  SELECT doc_id FROM doc_scores WHERE NOT is_target
      |  ORDER BY score_e6 DESC, doc_id LIMIT 100
      |), corpus AS (
      |  SELECT doc_id, text FROM kept WHERE lang = 'en'
      |  UNION ALL
      |  SELECT k.doc_id, k.text FROM kept k JOIN sel USING (doc_id)
      |), $bpe, v AS (
      |  SELECT word, CAST(len(string_split(trim(enc), '  ')) AS BIGINT) AS n_bpe
      |  FROM e$BpeOracleRounds
      |), dw AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS word
      |  FROM corpus
      |), agg AS (
      |  SELECT doc_id, CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens
      |  FROM dw JOIN v USING (word) GROUP BY doc_id
      |), lens AS (
      |  SELECT corpus.doc_id, coalesce(agg.n_bpe_tokens, CAST(0 AS BIGINT)) AS len
      |  FROM corpus LEFT JOIN agg USING (doc_id)
      |), offs AS (
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
  }

  /** Gopher document gate + C4 line repair over `documents`, ending at
    * `cl(doc_id, text)` (the repaired surviving corpus) — the shared
    * quality prefix of pipeline_quality and pipeline_dsir_pack. */
  private val gopherC4CleanCte: String =
    """WITH gc AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS w,
        |    string_split(text, chr(10)) AS ln
        |  FROM documents
        |), gs AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
        |      / CAST(len(w) AS DOUBLE) AS mean_word_len,
        |    CAST(CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
        |       + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT)
        |       AS DOUBLE) / CAST(len(w) AS DOUBLE) AS symbol_ratio,
        |    CAST(len(list_filter(ln, l -> l LIKE '-%' OR l LIKE '*%')) AS DOUBLE)
        |      / CAST(len(ln) AS DOUBLE) AS bullet_frac,
        |    CAST(len(list_filter(ln, l -> l LIKE '%...')) AS DOUBLE)
        |      / CAST(len(ln) AS DOUBLE) AS ellipsis_frac,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
        |      / CAST(len(w) AS DOUBLE) AS alpha_frac,
        |    CAST(len(list_filter(['the','a'], y -> list_contains(w, y))) AS BIGINT) AS n_stop_hits
        |  FROM gc
        |), gk AS (
        |  SELECT doc_id FROM gs
        |  WHERE n_words >= 50 AND n_words <= 100000
        |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |    AND symbol_ratio <= 0.1 AND bullet_frac < 0.9
        |    AND ellipsis_frac < 0.3 AND alpha_frac >= 0.8
        |    AND n_stop_hits >= 2
        |), cs AS (
        |  SELECT d.doc_id,
        |    list_filter(string_split(d.text, chr(10)),
        |      l -> len(string_split(l, ' ')) >= 50
        |        AND NOT contains(lower(l), 'javascript')
        |        AND NOT contains(lower(l), 'lorem ipsum')
        |        AND NOT contains(l, '{')) AS kept
        |  FROM documents d JOIN gk USING (doc_id)
        |), cl AS (
        |  SELECT doc_id, coalesce(array_to_string(kept, chr(10)), '') AS text
        |  FROM cs WHERE len(kept) >= 1
        |)""".stripMargin

  private lazy val c4LineFilterOracle: String =
    """WITH c AS (
          |  SELECT doc_id, string_split(text, chr(10)) AS ln FROM documents
          |), s AS (
          |  SELECT doc_id, ln,
          |    list_filter(ln, l -> len(string_split(l, ' ')) >= 50
          |      AND NOT contains(lower(l), 'javascript')
          |      AND NOT contains(lower(l), 'lorem ipsum')
          |      AND NOT contains(l, '{')) AS kept
          |  FROM c
          |)
          |SELECT doc_id,
          |  CAST(len(ln) AS BIGINT) AS n_lines,
          |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
          |  coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
          |  len(kept) >= 1 AS keep
          |FROM s ORDER BY doc_id""".stripMargin

  private lazy val gopherQualityOracleSql: String =
    """WITH c AS (
          |  SELECT doc_id, text, string_split(text, ' ') AS w,
          |    string_split(text, chr(10)) AS ln
          |  FROM documents
          |), s AS (
          |  SELECT doc_id,
          |    CAST(len(w) AS BIGINT) AS n_words,
          |    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
          |      / CAST(len(w) AS DOUBLE) AS mean_word_len,
          |    CAST(CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
          |       + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT)
          |       AS DOUBLE) / CAST(len(w) AS DOUBLE) AS symbol_ratio,
          |    CAST(len(list_filter(ln, l -> l LIKE '-%' OR l LIKE '*%')) AS DOUBLE)
          |      / CAST(len(ln) AS DOUBLE) AS bullet_frac,
          |    CAST(len(list_filter(ln, l -> l LIKE '%...')) AS DOUBLE)
          |      / CAST(len(ln) AS DOUBLE) AS ellipsis_frac,
          |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
          |      / CAST(len(w) AS DOUBLE) AS alpha_frac,
          |    CAST(len(list_filter(['the','a'],
          |      y -> list_contains(w, y))) AS BIGINT) AS n_stop_hits
          |  FROM c
          |)
          |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
          |  ellipsis_frac, alpha_frac, n_stop_hits,
          |  (n_words >= 50 AND n_words <= 100000
          |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
          |   AND symbol_ratio <= 0.1 AND bullet_frac < 0.9
          |   AND ellipsis_frac < 0.3 AND alpha_frac >= 0.8
          |   AND n_stop_hits >= 2) AS keep
          |FROM s ORDER BY doc_id""".stripMargin

  private lazy val langIdOracleSql: String =
    """WITH c AS (
          |  SELECT doc_id, lang AS lang_label,
          |    CAST(len(list_filter(string_split(text, ' '),
          |      x -> list_contains(['the','a','and','of','to','is'], x))) AS BIGINT) AS score_en,
          |    CAST(len(list_filter(string_split(text, ' '),
          |      x -> list_contains(['el','la','de','los','que','y'], x))) AS BIGINT) AS score_es,
          |    CAST(len(list_filter(string_split(text, ' '),
          |      x -> list_contains(['de5','shi4','zai4'], x))) AS BIGINT) AS score_zh
          |  FROM documents
          |)
          |SELECT doc_id, lang_label, score_en, score_es, score_zh,
          |  CASE WHEN score_es > score_en AND score_es > score_zh THEN 'es'
          |       WHEN score_zh > score_en AND score_zh >= score_es THEN 'zh'
          |       ELSE 'en' END AS lang_pred
          |FROM c ORDER BY doc_id""".stripMargin

  private lazy val curriculumOrderOracleSql: String =
    """WITH c AS (
          |  SELECT doc_id,
          |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_subword_tokens
          |  FROM documents
          |), r AS (
          |  SELECT doc_id, n_subword_tokens,
          |    row_number() OVER (ORDER BY n_subword_tokens, doc_id) AS rnk,
          |    count(*) OVER () AS n
          |  FROM c
          |), t AS (
          |  SELECT doc_id, n_subword_tokens,
          |    CAST(((rnk - 1) * 4) // n AS INTEGER) AS tier,
          |    md5(concat_ws('|', 'cur', CAST(doc_id AS VARCHAR))) AS k
          |  FROM r)
          |SELECT doc_id, n_subword_tokens, tier,
          |  CAST(row_number() OVER (PARTITION BY tier ORDER BY k, doc_id) AS BIGINT) AS pos_in_tier
          |FROM t ORDER BY tier, pos_in_tier""".stripMargin

  def oracleSql: Map[String, String] = oracleSqlMap

  private lazy val oracleSqlMap: Map[String, String] = distinctKeys("oracleSql", Seq(
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
    "value_histogram" ->
      """SELECT CAST(floor(value / 50.0) AS INTEGER) AS bucket, count(*) AS n,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,
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
    "lang_id_ngram" ->
      s"""WITH g AS MATERIALIZED (
        |  SELECT doc_id, lang, unnest(list_concat(
        |    CASE WHEN length(text) >= 2 THEN
        |      list_transform(generate_series(1, length(text) - 1), i -> substr(text, i, 2))
        |      ELSE [] END,
        |    CASE WHEN length(text) >= 3 THEN
        |      list_transform(generate_series(1, length(text) - 2), i -> substr(text, i, 3))
        |      ELSE [] END)) AS gram
        |  FROM documents),
        |lp AS MATERIALIZED (
        |  SELECT lang, gram, r FROM (
        |    SELECT lang, gram,
        |      row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, gram) AS r
        |    FROM g WHERE doc_id < ${operators.TextAnalysis.LangIdTrainDocs}
        |    GROUP BY lang, gram) WHERE r <= 100),
        |dp AS MATERIALIZED (
        |  SELECT doc_id, gram, r FROM (
        |    SELECT doc_id, gram,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, gram) AS r
        |    FROM g GROUP BY doc_id, gram) WHERE r <= 100),
        |langs AS (SELECT DISTINCT lang FROM documents
        |          WHERE doc_id < ${operators.TextAnalysis.LangIdTrainDocs}),
        |d AS (
        |  SELECT dp.doc_id, langs.lang,
        |    sum(CASE WHEN lp.r IS NULL THEN 100 ELSE abs(dp.r - lp.r) END) AS dist
        |  FROM dp CROSS JOIN langs
        |  LEFT JOIN lp ON lp.lang = langs.lang AND lp.gram = dp.gram
        |  GROUP BY 1, 2),
        |best AS (
        |  SELECT doc_id, lang, dist,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY dist, lang) AS rb
        |  FROM d)
        |SELECT documents.doc_id, documents.lang AS lang_label,
        |  coalesce(best.lang, (SELECT min(lang) FROM langs)) AS lang_pred,
        |  CAST(coalesce(best.dist, 0) AS BIGINT) AS best_dist
        |FROM documents
        |LEFT JOIN best ON best.doc_id = documents.doc_id AND best.rb = 1
        |ORDER BY documents.doc_id""".stripMargin,
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
  ) ++ oracleSqlRest)

  /** MinHash+LSH near-dup pair SQL (mirrors Dedup.minhashLsh) — also the
    * edge relation for the clustering oracle's recursive CTE.
    */
  /** Shared MinHash replay prefix: shingles → 56-bit md5 hash → 16
    * universal-hash min aggregates → capped band rows → undirected
    * candidate pairs (`cand`), with `mh` in scope for scoring and
    * `scored` the threshold-filtered est_jaccard pair relation.
    */
  private lazy val minhashScoredCte: String = {
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
        |), bands_all AS (
        |  $bandRows
        |), bands AS (
        |  -- the hot-bucket cap, replayed exactly: first MaxBandBucket
        |  -- members per (band, b0..b3) bucket by doc_id, mirroring
        |  -- minhashLsh's pre-join WindowGroupLimit cut
        |  SELECT doc_id, band, ${(0 until rowsPerBand).map(r => s"b$r").mkString(", ")} FROM bands_all
        |  QUALIFY row_number() OVER (
        |    PARTITION BY band, ${(0 until rowsPerBand).map(r => s"b$r").mkString(", ")}
        |    ORDER BY doc_id) <= ${Dedup.MaxBandBucket}
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y
        |    ON x.band = y.band AND $bandJoin AND x.doc_id < y.doc_id
        |), scored AS (
        |  SELECT doc_a, doc_b,
        |    CAST($agree AS DOUBLE) / ${Dedup.NumHashes}.0 AS est_jaccard
        |  FROM cand JOIN mh a ON a.doc_id = doc_a JOIN mh b ON b.doc_id = doc_b
        |  WHERE CAST($agree AS DOUBLE) / ${Dedup.NumHashes}.0 >= 0.25)
        |""".stripMargin
  }

  /** The S-curve oracle: ONE signature relation, one exact-Jaccard
    * truth, then per banding config the capped band self-join (QUALIFY
    * row_number ≤ maxBucket — the engine's WindowGroupLimit cut) with
    * NO est-Jaccard filter, presence-joined against truth.
    */
  private lazy val lshScurveSql: String = {
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

  private lazy val minhashLshSql: String =
    minhashScoredCte +
      """SELECT doc_a, doc_b, est_jaccard
      |FROM scored ORDER BY doc_a, doc_b""".stripMargin

  // both orientations of the undirected scored pairs, per-doc top-k by
  // (est_jaccard desc, partner id) — minhashPartners' rank cut replayed
  private lazy val minhashPartnersSql: String =
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
  private lazy val minhashIncrementalSql: String = {
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

  private lazy val oracleSqlRest: Seq[(String, String)] = Seq(
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
    "ann_ivfpq_topk" -> annIvfpqOracle,
    "ann_ivfpq_auto" -> annIvfpqAutoOracle,
    "ann_ivfpq_imi" -> annIvfpqImiOracle,
    "pq_encode_residual" -> pqEncodeResidualOracle,
    "ann_ivfpq_residual" -> annIvfpqResidualOracle,
    "ann_ivfpq_rerank" -> annIvfpqRerankOracle,
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
    "media_resize_stub" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(length(text) AS BIGINT) AS n_units,
        |  CAST(least(64, length(text)) AS BIGINT) AS out_units,
        |  CAST(octet_length(encode(substring(text, 1, 64))) AS BIGINT) AS out_bytes,
        |  md5(substring(text, 1, 64)) AS thumb_md5
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
    "media_embedding_stub" -> {
      val dims = (0 until Multimodal.EmbedDims).map { i =>
        val a = s"ascii(substr(md5(substr(text, ${1 + i * 7}, 7)), 1, 1))"
        s"CAST(floor(((CAST($a - CASE WHEN $a >= 97 THEN 87 ELSE 48 END AS DOUBLE)) / 15.0 - 0.5) * 1000000.0) AS BIGINT) AS e$i"
      }.mkString(",\n  ")
      s"""SELECT doc_id,
         |  $dims
         |FROM documents ORDER BY doc_id""".stripMargin
    },
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
  private def htmlFixturePages(s: SparkSession, dir: String): DataFrame = {
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
  private lazy val htmlPagesCte: String = {
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
  private def urlNormChain(src: String, urlCol: String, out: String,
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
  private lazy val htmlLinksCte: String =
    htmlPagesCte + urlNormChain("l2", "href", "links", "u")

  /** Url.DotSegmentPasses as a nested regexp_replace SQL expression. */
  private def dotRemoveSql(e: String): String =
    Url.DotSegmentPasses.foldLeft(e) { case (acc, (p, r)) =>
      s"regexp_replace($acc, '$p', '$r', 'g')"
    }

  /** The html_links_resolved dataflow — RFC 3986 §5.2 reference
    * resolution against each page's base URL (Url.resolveLinks' twin),
    * ending in `rlinks(doc_id, pos, href, host, url_norm)`.
    */
  private lazy val resolvedLinksCte: String = {
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

  private lazy val oracleSqlRest2: Seq[(String, String)] = Seq(
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
