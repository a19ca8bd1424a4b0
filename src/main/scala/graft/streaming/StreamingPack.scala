package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{QueryPack, Tables}
import graft.domain.TimeCodec
import graft.operators.DerivedSignalLog
import graft.projection.SignalProjection

/** End-to-end streaming replay, oracle-checked: the derived signal log is
  * serialized to JSON-lines event files (delete events naturally shrink to
  * `{"action","id"}` because to_json drops nulls — matching the
  * reference's 2-field delete payload), replayed through the incremental
  * foreachBatch projection in multiple micro-batches, and the final state
  * table must equal the one-shot batch fold — and therefore the same
  * DuckDB oracle as `p4_tombstone_delete`.
  */
object StreamingPack extends QueryPack {

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Ephemeral replay scratch (staged input files, checkpoints, state).
    * These dirs live exactly as long as one query and their durability is
    * irrelevant — a replay bench should not measure scratch-dir fsync
    * latency — so prefer tmpfs when the host has it. A production
    * deployment points checkpointLocation at durable shared storage
    * (HDFS/S3); that choice is per-query config, not this helper.
    */
  private def scratch(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val d = Files.createTempDirectory(base, prefix)
    // deleteOnExit() never removes non-empty directories, so it leaked
    // every state/checkpoint/output tree into tmpfs (RAM-backed) for the
    // process lifetime AND after exit — a long bench run accumulates one
    // per streaming query. One shutdown hook drains the registry with a
    // real recursive delete.
    scratchDirs.add(d)
    d.toAbsolutePath.toString
  }

  private val scratchDirs =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    scratchDirs.forEach { d =>
      try {
        import scala.jdk.CollectionConverters._
        // same close discipline as stageDoubleDelivery's Files.list —
        // moot at JVM exit, but the pattern should not have exceptions
        val walk = Files.walk(d)
        val all = try walk.iterator().asScala.toSeq finally walk.close()
        all.reverseIterator
          .foreach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
      } catch { case _: Throwable => () }
    }))

  /** Double delivery without staging a copy: the table's parquet is
    * symlinked TWICE under distinct names into a fresh `in/` dir — the
    * file source tracks files by path, so the same bytes are delivered
    * twice, and maxFilesPerTrigger=1 puts the deliveries in separate
    * micro-batches. (A union of two sources would NOT do this: per-source
    * file limits admit one file from EACH source into batch 0.) ONE
    * definition shared by every redelivery query (s7/s10/s16) — the
    * delivery-ordering-sensitive staging must not fork, same policy as
    * stageSplitWire.
    */
  private def stageDoubleDelivery(tmp: String, dir: String, table: String): String = {
    val in = java.nio.file.Paths.get(tmp, "in")
    Files.createDirectory(in)
    // ABSOLUTE target: a symlink to a relative path resolves relative to
    // the LINK's directory (the scratch dir), not the caller's cwd — a
    // relative fixture dir (scale/x300m on the dev CLI) would stage
    // dangling links and the stream would silently read zero files.
    val src = java.nio.file.Paths.get(dir, s"$table.parquet").toAbsolutePath
    // Layout dispatch (r16, the tableStream discipline): the testdata
    // fixtures keep the table as ONE file — two symlinks stage the two
    // deliveries; the scale fixtures keep a DIRECTORY of part files —
    // symlink each part under a delivery-prefixed name, so every key's
    // second arrival still lands in a later micro-batch (file-source
    // ordering falls back to path when mtimes tie, and delivery1-* <
    // delivery2-* lexicographically).
    if (Files.isDirectory(src)) {
      import scala.jdk.CollectionConverters._
      // Files.list holds a directory handle until closed (r16 ADVICE:
      // consuming the iterator alone leaked one per staged scratch dir)
      val listing = Files.list(src)
      val parts =
        try listing.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .toSeq.sortBy(_.getFileName.toString)
        finally listing.close()
      for (d <- 1 to 2; (p, i) <- parts.zipWithIndex)
        Files.createSymbolicLink(
          in.resolve(f"delivery$d-$i%05d.parquet"), p.toAbsolutePath)
    } else {
      Files.createSymbolicLink(in.resolve("delivery1.parquet"), src)
      Files.createSymbolicLink(in.resolve("delivery2.parquet"), src)
    }
    in.toString
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bench note (r6): s1's ~3 s is SCALE-INVARIANT machinery — phase
    // timings are identical at sf0.001 and sf0.1 (writeEventLog 0.5 s,
    // 2-batch replay 2.4 s, final read 0.2 s at BOTH scales): streaming
    // query start/stop, per-batch planning, and state-store commits, not
    // per-event work. Per-event cost is ~0 here and the fixed cost
    // amortizes to nothing on a production-length stream; shrinking it
    // further means fewer micro-batches, which would un-test cross-batch
    // state.
    "s1_stream_replay" -> ((s, dir) => {
      val tmp = scratch("graft-stream-")
      val events = stagedEventLog(s, dir)

      // Per-workload tuning, the multi-tenant idiom: a child session
      // (shared SparkContext, independent SQLConf) runs the streaming
      // fold at micro-batch-sized shuffle width. A micro-batch carries
      // ~half the log; 32-wide stages are pure scheduling overhead for
      // it (AQE cannot coalesce in streaming). The batch analytics keep
      // the parent session's width. Buckets likewise size to the state
      // (~150 keys here): each bucket is a per-generation file + rename,
      // so B follows state volume, not a fixed constant.
      val ss = tunedChild(s, width = 4)
      val proj = new StreamingProjection(ss, s"$tmp/state", numBuckets = 4)
      val q = proj.runFileStream(events, s"$tmp/chk", maxFilesPerTrigger = 1)
      q.awaitTermination()

      proj.view
        .select(col("id"), col("seq"), col("action"), col("title"),
          col("content"), col("priority"), col("author"),
          TimeCodec.parseRfc3339(col("created_at")).as("created_at"),
          TimeCodec.parseRfc3339(col("updated_at")).as("updated_at"))
        .orderBy("id")
    }),

    // s2: the event-time window aggregation a12 declares, executed through
    // TRUE Structured Streaming — readStream over the events parquet,
    // streaming groupBy(window(...)), complete-mode memory sink. Complete
    // mode emits the full aggregation state, so the result is
    // deterministic and shares a12's exact batch oracle — the strongest
    // form of the batch/streaming unification claim. (Production uses
    // watermark + append for bounded state — WindowedStreamSpec covers
    // that contract, including what the watermark holds back.)
    "s2_stream_window" -> ((s, dir) => {
      val ss = tunedChild(s, width = 4, noData = false)
      val chk = scratch("graft-s2-")
      val q = eventsStream(ss, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
            .cast("double").as("total"))
        .writeStream
        .outputMode("complete")
        .format("memory").queryName("graft_s2_win")
        .option("checkpointLocation", s"$chk/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table("graft_s2_win")
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy("window_start", "event_type")
    }),

    // s3: stream-stream inner join — click→purchase attribution within a
    // 30-minute window, both sides TRUE streaming frames. Watermarks on
    // both sides plus the time-range predicate are what BOUND the join
    // state: Spark retains only rows inside the watermark horizon, so
    // state is O(events per 90 min of event time), not O(stream) — the
    // property that makes an unbounded stream-stream join runnable at
    // all. Inner-join matches emit as they are found (append mode), so
    // one AvailableNow replay yields exactly the batch join — one truth,
    // checked against the batch oracle.
    "s3_stream_join" -> ((s, dir) => {
      val ss = tunedChild(s, width = 4, noData = false)
      val chk = scratch("graft-s3-")
      val clicks = eventsStream(ss, dir)
        .where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
        .withWatermark("click_ts", "1 hour")
      val purchases = eventsStream(ss, dir)
        .where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
      val q = clicks.join(purchases,
          col("user_id") === col("p_user") &&
            col("purchase_ts") >= col("click_ts") &&
            col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")
        .writeStream
        .outputMode("append")
        .format("memory").queryName("graft_s3_join")
        .option("checkpointLocation", s"$chk/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table("graft_s3_join").orderBy("click_id", "purchase_id")
    }),

    // s4: the PRODUCTION form of s2 — watermark + APPEND mode. Complete
    // mode (s2) re-emits the whole aggregation state every batch and
    // retains every window forever: correct, but state and sink grow with
    // distinct windows — a scale-killer at 100× key cardinality. Append
    // mode emits each window EXACTLY ONCE, when the watermark proves it
    // closed, and then evicts its state — state is O(windows inside the
    // watermark horizon), the only shape that runs forever on 100 TB/day.
    // Determinism: the final watermark under AvailableNow is
    // max(event time) − 1 h, so every window with start <
    // trunc(max)−2 h is provably closed and emitted
    // (WindowedStreamSpec proves the emission contract); both the query
    // and the oracle cut at that boundary, excluding the watermark-held
    // tail the stream must NOT have emitted yet.
    "s4_window_append" -> ((s, dir) => {
      val ss = tunedChild(s, width = 4, noData = true)
      val chk = scratch("graft-s4-")
      val q = eventsStream(ss, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
            .cast("double").as("total"))
        .writeStream
        .outputMode("append")
        .format("memory").queryName("graft_s4_win")
        .option("checkpointLocation", s"$chk/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val maxHour = Tables(s, dir, "events")
        .select(date_trunc("hour", max(col("ts"))).as("h")).head().getTimestamp(0)
      val cutoff = new java.sql.Timestamp(maxHour.getTime - 2L * 3600 * 1000)
      ss.table("graft_s4_win")
        .where(col("w.start") < lit(cutoff))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy("window_start", "event_type")
    }),

    // s8: a13's sessionization in TRUE streaming — session_window +
    // watermark + APPEND mode, the production shape for "user sessions
    // over an unbounded clickstream". Session state is merged
    // incrementally (windows extend/merge as events arrive) and a session
    // is emitted EXACTLY ONCE when the watermark passes its close time
    // (last event + gap), then evicted — state is O(open sessions), the
    // only shape that survives an unbounded stream. Determinism: both the
    // query and the oracle keep only sessions provably closed at the
    // final watermark, with a 1 s margin because Spark tracks the
    // watermark in millis while event time is micros — the boundary
    // session could otherwise land on different sides cross-engine.
    "s8_session_append" -> ((s, dir) => {
      val ss = tunedChild(s, width = 4, noData = true)
      val chk = scratch("graft-s8-")
      val q = eventsStream(ss, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
        .writeStream
        .outputMode("append")
        .format("memory").queryName("graft_s8_sess")
        .option("checkpointLocation", s"$chk/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val maxTs = Tables(s, dir, "events").agg(max(col("ts"))).head().getTimestamp(0)
      val cutoff = new java.sql.Timestamp(maxTs.getTime - 3600L * 1000 - 1000)
      ss.table("graft_s8_sess")
        .where(col("sw.end") < lit(cutoff))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    }),

    // s5: s3's OUTER half — left-outer click-attribution where a purchase
    // with no preceding click emits null-padded, but only after the
    // watermark proves no matching click can still arrive. This is the
    // semantics that make outer joins well-defined on unbounded streams:
    // the emission is gated on watermark progress, and the state for the
    // emitted row is evicted. Far-future sentinel rows (filtered out of
    // the result by id < 0) advance the watermark past every real window;
    // a second sentinel + restart gives the engine the data-bearing batch
    // it needs to drain the last held rows (StreamJoinSpec proves the
    // full drain equals the batch left-outer join).
    "s5_stream_outer_join" -> ((s, dir) => {
      val tmp = scratch("graft-s5-")
      val sent = stagedSentinels(s, dir)

      // noData off: every real outer row flushes inside the second
      // sentinel's DATA batch (eviction runs under the watermark set by
      // batch 0), so the trailing no-data batch would be one more full
      // state-commit round emitting only the filtered-out -1 sentinel.
      val ss = tunedChild(s, width = 4, noData = false)
      // Both sentinel files exist up front, and the sentinel side-channel
      // is rate-limited to ONE file per micro-batch — so a single
      // AvailableNow run executes ≥2 batches: batch 0 (events + first
      // sentinel) sets the watermark past every real window, and the
      // second sentinel's batch is the DATA-BEARING batch state expiry
      // needs to flush every unmatched outer row. Through round 7 this
      // flush was a second start() with a restart between (5.09 s — the
      // suite's #1 query three rounds running, all of it query-start +
      // state-store reload machinery); the restart-drain behavior itself
      // is StreamJoinSpec's pinned claim, so the measured query keeps the
      // cheaper single-start shape. Each side is a streaming UNION of the
      // events parquet read in place (no staging copy of the fact table —
      // only the 2-row sentinel files are ever written) and the sentinel
      // side-channel; one watermark sits on the merged stream, exactly as
      // it would over a multi-topic source. (Either sentinel order works:
      // both are far-future, so whichever lands in batch 0 advances the
      // watermark past all real data and the other's batch flushes.)
      val sentSchema = s.read.parquet(sent).schema
      def side(tpe: String, u: String, t: String, id: String): DataFrame =
        eventsStream(ss, dir)
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
          .unionByName(ss.readStream.schema(sentSchema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "*.parquet").parquet(sent))
          .where(col("event_type") === tpe)
          .select(col("user_id").as(u), col("ts").as(t), col("event_id").as(id))
          .withWatermark(t, "1 hour")
      val joined = side("purchase", "p_user", "p_ts", "p_id")
        .join(side("click", "c_user", "c_ts", "c_id"),
          col("p_user") === col("c_user") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts"),
          "left_outer")
      // File sink: the production shape for a drained outer join (and
      // what the spec's restart variant recovers through).
      val q = joined.writeStream
        .outputMode("append")
        .format("parquet").option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      s.read.parquet(s"$tmp/out")
        .where(col("p_id") >= 0)
        .select(col("p_user").as("user_id"), col("p_id").as("purchase_id"),
          col("c_id").as("click_id"), col("p_ts").as("purchase_ts"),
          col("c_ts").as("click_ts"))
        .orderBy(col("purchase_id"), col("click_id")) // Spark asc = NULLS FIRST
    }),

    // s6: the LOW-LATENCY projection — the same LWW-by-seq fold as
    // s1/p3/p4, but held as per-key state in Spark's own state store via
    // flatMapGroupsWithState, emitting the new materialized row on every
    // update (reference's continuous consumer loop,
    // data-plane/internal/projection/signal.go:38-67). The replay
    // converges to the batch fold, so it shares s1's oracle — the
    // strongest unification claim for the stateful-API path.
    "s6_live_projection" -> ((s, dir) => {
      val tmp = scratch("graft-s6-")
      val events = stagedEventLog(s, dir)
      val ss = tunedChild(s, width = 4, noData = false)
      val raw = ss.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("seq", "long").add("value", "string"))
        .option("maxFilesPerTrigger", "1") // 2 files -> cross-batch state
        .json(events)
      val q = LiveProjection(ss, SignalProjection.decode(raw))
        .writeStream.outputMode("update")
        .format("memory").queryName("graft_s6_live")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // Update mode emits one row per key per touching batch; the served
      // view is the latest emission per key, tombstones filtered — the
      // same read the update-stream consumer (e.g. a cache) would hold.
      // the latest emission per key is the ONE shared LWW fold — not an
      // inline re-derivation (s12/s14 call the same helper; the fold's
      // tie and payload handling must have exactly one definition)
      SignalProjection.latestByKey(ss.table("graft_s6_live"))
        .where(!col("deleted"))
        .select(col("id"), col("seq"), col("action"), col("title"),
          col("content"), col("priority"), col("author"),
          TimeCodec.parseRfc3339(col("created_at")).as("created_at"),
          TimeCodec.parseRfc3339(col("updated_at")).as("updated_at"))
        .orderBy("id")
    }),

    // s7: streaming exact dedup on the RocksDB state store — the
    // at-least-once ingestion guard for append-only training-data
    // pipelines (no LWW fold to absorb redelivery). The documents table
    // is delivered TWICE (simulated redelivery) across micro-batches;
    // dropDuplicates(doc_id) holds seen-keys in RocksDB (off-heap,
    // incremental checkpoints — the only provider that survives
    // unbounded key cardinality at 100 TB). The deduped stream must equal
    // the documents table exactly, so fingerprint-grouping its output
    // replays d1's batch oracle verbatim.
    "s7_stream_dedup" -> ((s, dir) => {
      val tmp = scratch("graft-s7-")
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      // The oracle equivalence (stream dedup-by-doc_id == documents table)
      // assumes doc_id is unique in documents; a duplicate key with
      // differing text would make dropDuplicates' arbitrary pick flake the
      // hash check — check the assumption instead of relying on it.
      val keyStats = docs.agg(count(lit(1)), countDistinct(col("doc_id"))).head()
      require(keyStats.getLong(0) == keyStats.getLong(1),
        s"s7 oracle requires unique doc_id: ${keyStats.getLong(0)} rows, " +
          s"${keyStats.getLong(1)} distinct keys")
      val ss = tunedChild(s, width = 4, noData = false)
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // Redelivery via the shared double-delivery staging: the second
      // arrival of every key must hit RocksDB seen-key state, never
      // intra-batch dedup.
      val in = stageDoubleDelivery(tmp, dir, "documents")
      // layout-robust schema (r16 review finding — this was the one site
      // the 45dc08e layout fix missed: spark.read on the table PATH
      // handles both the single-file and directory-of-parts layouts,
      // while a pathGlobFilter on the parent dir dies with
      // UNABLE_TO_INFER_SCHEMA on the scale fixtures)
      val full = graft.Tables.raw(s, dir, "documents").schema
      val q = ss.readStream.schema(full)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(in)
        .select(col("doc_id"), col("text"))
        .dropDuplicates("doc_id")
        .writeStream
        .outputMode("append")
        .format("memory").queryName("graft_s7_dedup")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table("graft_s7_dedup")
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id")
    }),

    // s11: stream-STATIC enrichment join — each purchase event in the
    // stream is enriched with a batch-computed per-user dimension (here
    // the user's lifetime event count), the lookup-table pattern every
    // production stream runs against its warehouse. Stream-static inner
    // joins are STATELESS: the static side is planned per micro-batch
    // (broadcast here — the per-user frame is agg-bounded), no watermark
    // and no state store, so this is scale-safe by construction; the
    // batch oracle is the same join, proving the streamed rows bit-equal
    // the warehouse view.
    "s11_stream_enrich" -> ((s, dir) => {
      val ss = tunedChild(s, width = 4)
      val tmp = scratch("graft-s11-")
      val stats = Tables(ss, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("user_total"))
      val q = eventsStream(ss, dir)
        .where(col("event_type") === "purchase")
        .join(stats, "user_id")
        .select(col("event_id"), col("user_id"), col("user_total"))
        .writeStream
        .outputMode("append")
        .format("memory").queryName("graft_s11_enr")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table("graft_s11_enr").orderBy("event_id")
    }),

    // s9: STREAMING curation — CurationPipeline.rowFeatures applied to a
    // readStream of the documents table, unchanged: the same fused
    // compiled projection (langid, stopword quality, trigram repetition)
    // runs per-row, stateless, watermark-free, and append-emits as docs
    // arrive. This is the batch/stream unification argument made
    // executable — curation-at-ingest needs no second implementation, so
    // the batch oracle (pipeline1's feature CTEs) checks the stream
    // bit-for-bit. Scale: a stateless projection is the best possible
    // streaming shape — zero state store, zero shuffle, per-batch cost
    // proportional only to arriving data.
    "s9_stream_curation" -> ((s, dir) => {
      val tmp = scratch("graft-s9-")
      val ss = tunedChild(s, width = 4)
      val stream = documentsStream(s, ss, dir)
        .select(col("doc_id"), col("lang"), col("text"))
      val q = graft.operators.CurationPipeline.rowFeatures(stream)
        .select(col("doc_id"), col("lang_ok"), col("quality_ok"),
          col("repetition_ok"))
        .withColumn("stream_keep",
          (col("lang_ok") === 1 && col("quality_ok") === 1 &&
            col("repetition_ok") === 1).cast("int"))
        .writeStream
        .outputMode("append")
        .format("memory").queryName("graft_s9_cur")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table("graft_s9_cur").orderBy("doc_id")
    }),

    // s10: STREAMING sketch maintenance — the KMV distinct sketch as
    // streaming aggregation state. Mergeable bounded sketches are THE
    // streaming-friendly aggregate: state is ≤K longs per key no matter
    // how many events arrive, every micro-batch merges map-side, and
    // unlike s2's complete-mode window demo this complete-mode sink is
    // scale-safe BY CONSTRUCTION — the served table is (keys × K) longs,
    // independent of stream length. The events file is delivered TWICE
    // across micro-batches (s7's symlink trick): batch 2 merges into
    // batch 1's sketch state AND, because KMV is a function of the
    // distinct hash SET, redelivery leaves the estimate unchanged — so
    // the result still equals a20b's single-pass batch oracle.
    "s10_stream_kmv" -> ((s, dir) => {
      import s.implicits._
      val tmp = scratch("graft-s10-")
      val ss = tunedChild(s, width = 4, noData = false)
      val in = java.nio.file.Paths.get(stageDoubleDelivery(tmp, dir, "events"))
      // the ACTUAL file schema (whatever ts flavor this fixture carries)
      // -- never a hand-declared encoding; re-hardcoding ts was the r8
      // regression class (see eventsStream), and these queries never
      // read ts anyway
      val rawSchema = graft.Tables.raw(ss, dir, "events").schema
      val kmv = new graft.functions.KmvAggregator(64)
      val q = ss.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(in.toString)
        .select(col("event_type"),
          graft.functions.md5Prefix60(col("user_id").cast("string")).as("h"))
        .as[(String, Long)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(kmv.toColumn.name("est"))
        .toDF("event_type", "est")
        .writeStream.outputMode("complete")
        .format("memory").queryName("graft_s10_kmv")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table("graft_s10_kmv")
        .select(col("event_type"), round(col("est"), 6).as("est_users"))
        .orderBy("event_type")
    }),

    // s12: LATE-DATA timestamp-LWW — the one behavior the reference
    // explicitly declares future work (data-plane/README.md:157-166): its
    // Redis apply is a blind log-order upsert, correct only while arrival
    // order == event-time order. Here the log is delivered adversarially
    // OUT OF ORDER (split by event-id parity, odd half a micro-batch
    // before the even half, so nearly every key sees cross-batch arrivals
    // in the wrong time order) and the fold orders by the ENVELOPE event
    // time `ets` (the Kafka record-timestamp analog — present for deletes
    // too, whose 2-field payloads carry no updated_at) with seq as
    // tiebreak: max_by(payload, struct(ets, seq)). A blind arrival-order
    // upsert fails this oracle; the ts-aware merge converges to the batch
    // time-fold regardless of delivery order (LateDataSpec replays the
    // divergence cases synthetically, including a late row that must LOSE
    // and one that must WIN). Production adds a watermark on ets to bound
    // how late a row may still be applied; the fold itself needs no
    // watermark — it is order-independent by construction.
    "s12_late_lww" -> ((s, dir) => {
      val tmp = scratch("graft-s12-")
      val events = stagedLateWire(s, dir)
      val ss = tunedChild(s, width = 4, noData = true)
      val store = new BucketedStateStore(ss, s"$tmp/state", numBuckets = 4,
        key = "id", seq = "_ord")
      val raw = ss.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("seq", "long").add("ets", "long").add("value", "string"))
        .option("maxFilesPerTrigger", "1")
        .json(events)
      val q = raw.writeStream
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, batchId: Long) =>
          // the SAME decode as s1/s6 (one validity rule) with the
          // envelope time carried through, then the same fold/merge with
          // the ordering column swapped seq → (ets, seq).
          val dec = SignalProjection.decode(b, carry = Seq("ets"))
            .withColumn("_ord", struct(col("ets"), col("seq")))
          val latest = SignalProjection.latestByKey(dec, "id", "_ord").persist()
          try store.merge(latest, batchId) finally latest.unpersist()
        }
        .start()
      q.awaitTermination()
      store.read()
        .getOrElse(sys.error("s12: no state written"))
        .where(col("action") =!= graft.domain.SignalSchema.Deleted)
        .select(col("id"), col("seq"), col("action"), col("title"),
          col("content"), col("priority"), col("author"),
          TimeCodec.parseRfc3339(col("created_at")).as("created_at"),
          TimeCodec.parseRfc3339(col("updated_at")).as("updated_at"))
        .orderBy("id")
    }),

    // s13: tombstone COMPACTION surfaced end-to-end — replay the log
    // through the bucketed store (s1's machinery), drop tombstones older
    // than the log horizon (BucketedStateStore.compact, the Kafka
    // log-compaction analog), then read the remaining state INCLUDING
    // surviving tombstones: merge→compact→read must equal the batch fold
    // with old tombstones dropped. The horizon (max(seq) div 2) is
    // deterministic and replayed by the oracle, so the row proves both
    // directions — pre-horizon tombstones vanish, post-horizon tombstones
    // and every live row survive byte-for-byte. (StoreProps covers the
    // bucket-level invariants; this is the user-visible contract.)
    "s13_state_compaction" -> ((s, dir) => {
      val tmp = scratch("graft-s13-")
      val events = stagedEventLog(s, dir)
      val ss = tunedChild(s, width = 4)
      val proj = new StreamingProjection(ss, s"$tmp/state", numBuckets = 4)
      val q = proj.runFileStream(events, s"$tmp/chk", maxFilesPerTrigger = 1)
      q.awaitTermination()
      val horizon = DerivedSignalLog.log(s, dir)
        .agg(max(col("seq"))).head().getLong(0) / 2
      // Compaction generation derived by the store (currentMaxGen + 1):
      // strictly newer than any replay batchId so readers pick it up,
      // but finite — a MaxValue sentinel would permanently shadow every
      // later merge — and the per-bucket 2-generation retention then
      // ages the pre-compaction state out.
      proj.store.compact(horizon)
      proj.store.read()
        .getOrElse(sys.error("s13: no state written"))
        .select(col("id"), col("seq"), col("action"), col("title"),
          col("content"), col("priority"), col("author"),
          TimeCodec.parseRfc3339(col("created_at")).as("created_at"),
          TimeCodec.parseRfc3339(col("updated_at")).as("updated_at"))
        .orderBy("id")
    }),

    // s14: streaming NEAR-dup claims at ingest — the MinHash/LSH analog
    // of s7's exact streaming dedup, and the incremental form of d3's
    // candidate index: each arriving micro-batch computes its docs' LSH
    // bucket signatures (the SAME compiled pipeline as d2/d3, shared via
    // signaturesOf) and merges a per-bucket MIN-doc_id claim into the
    // bucketed store. Min is a semilattice fold — order-independent and
    // idempotent, the s10/KMV argument — so the claim table converges to
    // the batch answer under ANY delivery order; the staged wire proves
    // it adversarially (the HIGH-id half arrives first and claims every
    // bucket, the LOW half arrives a micro-batch later and must steal
    // every contested claim). Flagging is a READ-time join of corpus
    // signatures (parent session, full width — the corpus-sized pass)
    // against the final claim table: a doc is a near-dup candidate iff
    // some bucket of its signature is claimed by a lower doc_id. Scale:
    // state is one narrow row per DISTINCT bucket; merge cost is
    // O(buckets touched per batch); at 100 TB the knob is the store's
    // bucket count, exactly as in s1.
    "s14_stream_neardup" -> ((s, dir) => {
      val tmp = scratch("graft-s14-")
      val wire = stagedNeardupWire(s, dir)
      val ss = tunedChild(s, width = 4, noData = false)
      val store = new BucketedStateStore(ss, s"$tmp/state", numBuckets = 4,
        key = "bkey", seq = "_ord")
      val schema = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text")).schema
      val q = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(wire)
        .writeStream
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, batchId: Long) =>
          val claims = graft.operators.DedupPack.signaturesOf(b)
            .select(concat_ws(":", col("band"), col("minhash")).as("bkey"),
              col("doc_id"), (-col("doc_id")).as("_ord"))
          val latest = SignalProjection.latestByKey(claims, "bkey", "_ord").persist()
          try store.merge(latest, batchId) finally latest.unpersist()
        }
        .start()
      q.awaitTermination()
      val winners = store.read()
        .getOrElse(sys.error("s14: no claims written"))
        .select(col("bkey"), col("doc_id").as("winner"))
      graft.operators.DedupPack
        .signaturesOf(Tables(s, dir, "documents"))
        .select(concat_ws(":", col("band"), col("minhash")).as("bkey"),
          col("doc_id"))
        .join(winners, "bkey")
        .groupBy("doc_id")
        .agg(max((col("winner") < col("doc_id")).cast("int")).as("is_neardup"))
        .orderBy("doc_id")
    }),

    // s15: TIME-TRAVEL state read — what the per-bucket generation layout
    // buys beyond idempotent replay: any retained batch boundary is a
    // consistent snapshot (the Delta/Iceberg version-read analog). The
    // log replays through the s1 projection in two micro-batches (the
    // parity wire: odd seqs in batch 0, even in batch 1), then the view
    // is read AS OF generation 0 — per bucket, the newest generation ≤ 0;
    // buckets first touched by batch 1 have no snapshot and contribute
    // nothing. The oracle folds ONLY the odd-seq half: the snapshot must
    // equal the projection of exactly the events consumed by that batch,
    // proving generations are batch-consistent, not merely replayable.
    // Retention bounds how far back readAt reaches (2 gens/bucket here;
    // production sizes retention to its audit horizon).
    "s15_state_time_travel" -> ((s, dir) => {
      val tmp = scratch("graft-s15-")
      val wire = stagedLateWire(s, dir) // (seq, ets, value): ets unused here
      val ss = tunedChild(s, width = 4)
      val proj = new StreamingProjection(ss, s"$tmp/state", numBuckets = 4)
      val q = proj.runFileStream(wire, s"$tmp/chk", maxFilesPerTrigger = 1)
      q.awaitTermination()
      proj.store.readAt(0)
        .getOrElse(sys.error("s15: no snapshot at generation 0"))
        .where(col("action") =!= graft.domain.SignalSchema.Deleted)
        .select(col("id"), col("seq"), col("action"), col("title"),
          col("content"), col("priority"), col("author"),
          TimeCodec.parseRfc3339(col("created_at")).as("created_at"),
          TimeCodec.parseRfc3339(col("updated_at")).as("updated_at"))
        .orderBy("id")
    }),

    // s16: STREAMING quantile-sketch maintenance — a43's bottom-K-by-hash
    // sampler as streaming aggregation state, the exact pairing s10 gives
    // the KMV sketch: state is K (hash, payload) pairs per key no matter
    // how long the stream runs, every micro-batch merges map-side, and
    // because the sample is a pure function of the row SET (min-payload
    // hash ties — HashSampleProps' redelivery law), the doubled delivery
    // (s7's symlink trick, second copy in its own micro-batch) leaves the
    // sample bit-identical — so the streamed estimates replay a43's batch
    // oracle verbatim. This is the complete-mode sink that is scale-safe
    // BY CONSTRUCTION: the served table is keys × K pairs, independent of
    // stream length.
    "s16_stream_quantiles" -> ((s, dir) => {
      import s.implicits._
      val tmp = scratch("graft-s16-")
      val ss = tunedChild(s, width = 4, noData = false)
      val in = java.nio.file.Paths.get(stageDoubleDelivery(tmp, dir, "events"))
      // the ACTUAL file schema (whatever ts flavor this fixture carries)
      // -- never a hand-declared encoding; re-hardcoding ts was the r8
      // regression class (see eventsStream), and these queries never
      // read ts anyway
      val rawSchema = graft.Tables.raw(ss, dir, "events").schema
      val agg = new graft.functions.HashSampleAggregator(128)
      val q = ss.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(in.toString)
        .select(col("event_type"),
          graft.functions.md5Prefix60(col("event_id").cast("string")).as("h"),
          round(col("value") * 100, 0).cast("long").as("x"))
        .as[(String, Long, Long)]
        .groupByKey(_._1).mapValues(t => (t._2, t._3))
        .agg(agg.toColumn.name("sample"))
        .toDF("event_type", "sample")
        .writeStream.outputMode("complete")
        .format("memory").queryName("graft_s16_qs")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      def estAt(q0: Double): Column =
        graft.functions.HashSampleAggregator.centQuantile(col("sample"), q0)
      ss.table("graft_s16_qs")
        .select(col("event_type"), size(col("sample")).as("n_sample"),
          estAt(0.5).as("est_p50"), estAt(0.9).as("est_p90"))
        .orderBy("event_type")
    }),

    // s17: STREAMING top-K leaderboard — the third bounded aggregate
    // streaming-ified (KMV → s10, hash-sample → s16, bounded heap →
    // here): top-5 events by value per type held as ≤K rows of state per
    // key forever. Unlike the set-function sketches, a heap is NOT
    // redelivery-idempotent (a duplicate row would enter twice), so the
    // delivery is the parity SPLIT, not the symlink double: odd event-ids
    // in batch 0, even in batch 1 — cross-batch merges must displace
    // batch-0 entries when higher-valued evens arrive, which is the
    // re-rank the bounded merge exists for. At-least-once sources guard
    // the heap with upstream dedup (s7's RocksDB dropDuplicates);
    // exactly-once file/Kafka replay (this path) needs none. State and
    // shuffle volume are K·keys at any stream length (TopKProps laws).
    "s17_stream_topk" -> ((s, dir) => {
      import s.implicits._
      val tmp = scratch("graft-s17-")
      val wire = stagedEventSplit(s, dir)
      val ss = tunedChild(s, width = 4, noData = false)
      val topk = new graft.functions.TopKAggregator[(Long, Long)](
        5, _._2, _._1)
      val q = ss.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("event_id", "long").add("event_type", "string").add("xc", "long"))
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(wire)
        .as[(Long, String, Long)]
        .groupByKey(_._2).mapValues(t => (t._1, t._3))
        .agg(topk.toColumn.name("top"))
        .toDF("event_type", "top")
        .writeStream.outputMode("complete")
        .format("memory").queryName("graft_s17_topk")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table("graft_s17_topk")
        .select(col("event_type"), posexplode(col("top")).as(Seq("i", "r")))
        .select(col("event_type"), (col("i") + 1).cast("int").as("rank"),
          col("r._1").as("event_id"),
          (col("r._2").cast("double") / 100).as("value"))
        .orderBy("event_type", "rank")
    }),

    // s18: STREAMING count-min — the FOURTH bounded aggregate
    // streaming-ified (KMV set sketch → s10, hash-sample → s16, bounded
    // heap → s17, counter grid → here): live key-frequency state that
    // never grows, d·w longs forever. Counting is NOT
    // redelivery-idempotent (a duplicate row increments twice), so the
    // delivery is the parity SPLIT (s17's discipline, each row exactly
    // once): odd event-ids in batch 0, even in batch 1. Cell-wise
    // integer addition is associative AND commutative, so the
    // cross-batch merged grid equals a44's single-pass batch grid
    // EXACTLY — the streamed point estimates replay a44's DuckDB oracle
    // verbatim, the strongest form of streaming-equals-batch this suite
    // uses. Probing stays batch-side (the serving read): the ≤ d·w-cell
    // grid broadcasts against the probe keys like a44's.
    "s18_stream_count_min" -> ((s, dir) => {
      import s.implicits._
      val tmp = scratch("graft-s18-")
      val wire = stagedUserSplit(s, dir)
      val ss = tunedChild(s, width = 4, noData = false)
      val (d, w) =
        (graft.functions.CountMinAggregator.Depth, graft.functions.CountMinAggregator.Width)
      val cms = new graft.functions.CountMinAggregator(d, w)
      val q = ss.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("event_id", "long").add("user_id", "long"))
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(wire)
        .select(graft.functions.md5Prefix60(col("user_id").cast("string")).as("h"))
        .as[Long]
        .groupByKey(_ => 0)
        .agg(cms.toColumn.name("grid"))
        .toDF("k", "grid")
        .writeStream.outputMode("complete")
        .format("memory").queryName("graft_s18_cms")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // streamed grid → (j, pos, n) cells (zero cells dropped to mirror
      // a44's data-built grid), then a44's SHARED probe+estimate helpers
      // (ExtrasPack.cmsProbes/cmsEstimates — one definition, the two
      // forms replay the same oracle and must never fork)
      val grid = ss.table("graft_s18_cms")
        .select(posexplode(col("grid")).as(Seq("idx", "n")))
        .where(col("n") > 0)
        .select((col("idx") / w).cast("int").as("j"),
          pmod(col("idx"), lit(w)).cast("long").as("pos"), col("n"))
      val perUser = Tables(ss, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
        .withColumn("h", graft.functions.md5Prefix60(col("user_id").cast("string")))
      graft.analytics.ExtrasPack.cmsEstimates(
        graft.analytics.ExtrasPack.cmsProbes(perUser), grid)
    }),

    // s19: STREAMING quality gate with a BATCH-trained language model —
    // the train-once/serve-stream split (e5/e7/t18's doctrine) applied to
    // t19: the bigram model (context counts, bigram counts, vocab, gate
    // mean) is trained in batch and written as a model ARTIFACT; the
    // document stream is then scored per micro-batch via foreachBatch —
    // Spark's production pattern for stream-static scoring with
    // per-batch aggregates (a per-doc streaming aggregation would park
    // every doc's transitions in watermark state for no reason; a doc's
    // rows are atomic within a batch, so per-batch scoring is exact).
    // Model joins BROADCAST (the artifact is vocab-sized — the thing
    // that makes LM serving scale-free); delivery is 2 micro-batches
    // split by doc parity, so the result proves batch-composition
    // invariance: scores depend only on the frozen model, never on how
    // the stream was batched. Output ≡ batch t19 + pipeline5's gate, so
    // the oracle is the shared CTE chain.
    "s19_stream_lm_gate" -> ((s, dir) => {
      val tmp = scratch("graft-s19-")
      val model = stagedLmModel(s, dir)
      // ---- serve time (stream): 2 parity-split deliveries
      val docs = Tables(s, dir, "documents").select("doc_id", "text")
      docs.where(col("doc_id") % 2 === 0).coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
      docs.where(col("doc_id") % 2 === 1).coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
      val ss = tunedChild(s, width = 4, noData = false)
      // stream-static pattern: the frozen model artifact is read ONCE,
      // before the stream starts, and the frames are closed over — not
      // re-listed/re-read from disk on every micro-batch of a
      // serving-lifetime query (the trigger here is AvailableNow, but
      // the production form is continuous).
      val ctx = ss.read.parquet(s"$model/ctx")
      val big = ss.read.parquet(s"$model/big")
      val cons = ss.read.parquet(s"$model/cons")
      val q = ss.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(s"$tmp/in")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select(col("doc_id"),
              explode(graft.functions.bigram_context_hashes(col("text"))).as("t"))
            .select(col("doc_id"), col("t.uh"), col("t.bh"))
            .join(broadcast(ctx), Seq("uh"), "left")
            .join(broadcast(big), Seq("bh"), "left")
            .crossJoin(broadcast(cons))
            .select(col("doc_id"), col("tot_q"), col("n_docs"),
              round(lit(1000000.0) *
                ((coalesce(col("bc"), lit(0L)) + lit(1)).cast("double") /
                 (coalesce(col("uc"), lit(0L)) + col("v")).cast("double")), 0)
                .cast("long").as("p6"))
            .groupBy("doc_id", "tot_q", "n_docs")
            .agg(count(lit(1)).as("n_trans"), sum(col("p6")).as("sum_p6"))
            // gate on exact integers (pipeline5's fixed-point discipline):
            // avgq is a quantized long, the threshold is cross-multiplied
            // decimal arithmetic — no double corpus-sum anywhere.
            // overflow-safe floor-div split — see bigramLmScores' avgq
            .withColumn("avgq", expr("(sum_p6 div n_trans) * 1000000L + " +
              "((sum_p6 % n_trans) * 1000000L) div n_trans"))
            .select(col("doc_id"), col("n_trans"),
              (col("sum_p6").cast("double") / col("n_trans").cast("double"))
                .as("avg_p6"),
              (col("avgq").cast("decimal(38,0)") * 2 * col("n_docs") >=
                col("tot_q")).cast("int").as("fluent"))
            .write.mode("append").parquet(s"$tmp/out")
          ()
        }
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out").orderBy("doc_id")
    }),

    // s20: streaming distribution-DRIFT monitor — the data-quality gate a
    // production ingest runs beside every pipeline: per event-time hour,
    // how far does the stream's event_type mix drift from the corpus
    // reference distribution, and which windows breach the alert
    // threshold? The statistic is total-variation distance, stated in
    // the exact integer form TV·2·n_w·N_ref = Σ_t |o_t·N_ref − c_t·n_w|
    // (o_t observed in the window, c_t reference count): pure long
    // arithmetic — no per-type division, no float sum, so the per-window
    // result and the 5 %-TV alert flag (drift_num·10 > n_w·N_ref,
    // cross-multiplied) replay bit-exactly cross-engine; the human-facing
    // `tv` is ONE terminal IEEE division. Dataflow: windowed counts are
    // s2's streaming aggregate (bounded state: windows × types rows);
    // the reference model is one batch partial+final agg bounded at
    // |types| rows, BROADCAST into a windows × types frame (missing
    // types coalesce to 0 — a vanished type is drift, which an inner
    // join would silently ignore); the final fold shuffles on the
    // window key only. At production scale the integer products bound
    // the exact form to N_ref < ~3e9 events; past that the reference
    // collapses to per-mille shares (same statistic, quantized) — the
    // knob, not a different operator.
    "s20_stream_drift" -> ((s, dir) => {
      val ss = tunedChild(s, width = 4, noData = false)
      val chk = scratch("graft-s20-")
      val q = eventsStream(ss, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("o"))
        .writeStream
        .outputMode("complete")
        .format("memory").queryName("graft_s20_drift")
        .option("checkpointLocation", s"$chk/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val observed = ss.table("graft_s20_drift")
        .select(col("w.start").as("window_start"), col("event_type"), col("o"))
      val ref = Tables(ss, dir, "events")
        .groupBy("event_type").agg(count(lit(1)).as("c"))
      val nRef = ref.agg(sum(col("c")).as("n_ref"))
      val windows = observed.groupBy("window_start").agg(sum(col("o")).as("n_w"))
      windows
        .crossJoin(broadcast(ref))
        .join(observed, Seq("window_start", "event_type"), "left")
        .crossJoin(broadcast(nRef))
        .groupBy("window_start", "n_w", "n_ref")
        .agg(sum(abs(coalesce(col("o"), lit(0L)) * col("n_ref") -
          col("c") * col("n_w"))).as("drift_num"))
        .select(col("window_start"), col("n_w"), col("drift_num"),
          (col("drift_num").cast("double") /
            (lit(2L) * col("n_w") * col("n_ref")).cast("double")).as("tv"),
          (col("drift_num") * 10 > col("n_w") * col("n_ref"))
            .cast("int").as("is_drift"))
        .orderBy("window_start")
    }),

    // s21: streaming INGEST decontamination — d9's Bloom gate run where a
    // production pipeline actually runs it: on the document stream as it
    // lands, not as a batch sweep after the corpus is assembled. The
    // frozen artifact is the eval set's m-bit probe bitmap
    // ([[graft.operators.DedupPack.bloomBitmap]] — the SAME builder as
    // d9/pipeline4, so batch and stream probe bit-identical filters),
    // built once before the stream starts and closed over as a broadcast
    // literal; each micro-batch is then a pure stateless map+filter —
    // no join, no streaming state, nothing accumulates at any ingest
    // rate, and executors scale it embarrassingly. Delivery is 2
    // parity-split micro-batches (s19's discipline), proving the flag
    // depends only on the frozen bitmap, never on batching. Output ≡
    // batch d9, so the oracle is shared verbatim.
    "s21_stream_decontam" -> ((s, dir) => {
      val tmp = scratch("graft-s21-")
      val bitmap = graft.operators.DedupPack.bloomBitmap(s, dir)
      val docs = Tables(s, dir, "documents").select("doc_id", "text")
      docs.where(col("doc_id") % 2 === 0).coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
      docs.where(col("doc_id") % 2 === 1).coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
      val ss = tunedChild(s, width = 4, noData = false)
      val q = ss.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(s"$tmp/in")
        .select(col("doc_id"),
          graft.functions.bloom_hits(
            graft.functions.shingle_hashes(col("text"), 3),
            bitmap, graft.operators.DedupPack.BloomK).as("n_bloom_hits"))
        .where(col("doc_id") % 97 =!= 0 && col("n_bloom_hits") > 0)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", s"$tmp/out")
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out").orderBy("doc_id")
    }),

    // s22: the COMPLETE quality-filter canon at the ingest edge — the
    // "compose into streaming unchanged" claim t25/t26/t27/t28 make,
    // PROVEN as one streaming query: C4 line rewrite (t28's kernel over
    // the constructed pages) → Gopher A1.1 (t26's rules) AND A1.2
    // (t27's kernel) evaluated ON THE CLEANED TEXT → one canon verdict
    // per document. Everything is a stateless compiled projection, so
    // the whole canon chains as SELECTs on the same stream — no
    // stream-stream join, no state store, no watermark; per-batch cost
    // is scan-bandwidth exactly like the batch forms (§3g). This also
    // exercises the t26/t27 line rules on genuinely MULTILINE text in
    // the driver-hash path: the cleaned pages are '\n'-joined kept
    // lines, so dup-line/bullet/ellipsis arithmetic runs non-trivially
    // here even though the raw corpus is single-line (the planted-row
    // specs remain the bite proof; this pins the composed arithmetic).
    // The oracle rebuilds the same chain from the shared CTE builders —
    // c4Ctes → gopherCtes/repetitionCtes over the cleaned relation — so
    // batch SQL and the streaming dataflow cannot drift.
    "s22_stream_canon_gate" -> ((s, dir) => {
      val tmp = scratch("graft-s22-")
      val ss = tunedChild(s, width = 4)
      val stream = documentsStream(s, ss, dir)
        .select(col("doc_id"), col("text"))
      val cleaned = graft.operators.TextPack.c4Filters(
          graft.operators.TextPack.c4Pages(stream))
        .select(col("doc_id"), col("kept").as("c4_kept"),
          col("clean_text").as("text"))
      val gophered = graft.operators.TextPack
        .gopherRules(cleaned, carry = Seq("c4_kept", "text"))
        .select(col("doc_id"), col("text"), col("c4_kept"),
          col("n_words"), col("pass").as("gopher_pass"))
      val out = graft.operators.TextPack
        .repetitionRules(gophered,
          carry = Seq("c4_kept", "n_words", "gopher_pass"))
        .select(col("doc_id"), col("c4_kept"), col("n_words"),
          col("gopher_pass"), col("pass").as("rep_pass"))
        .withColumn("canon_keep",
          (col("c4_kept") === 1 && col("gopher_pass") === 1 &&
            col("rep_pass") === 1).cast("int"))
      val q = out.writeStream
        .outputMode("append")
        .format("memory").queryName("graft_s22_canon")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table("graft_s22_canon").orderBy("doc_id")
    }),

    // s23: SERVE the learned quality scorer at the ingest edge — the
    // FineWeb-Edu/DCLM deployment shape t29 trains for: distill the
    // canon into pocket weights OFFLINE (the batch trainer, bounded
    // driver pulls — the stagedLmModel artifact pattern), then score
    // every arriving document with ONE literal-weight compiled
    // projection chained after the same stateless canon feature chain
    // s22 composes. No stream-stream join, no state store, no
    // watermark: the scorer adds a dot product over 26 integer margins
    // to a scan that already computes the margins' counters, so the
    // per-event cost is the canon's scan-bandwidth plus ~27 multiplies.
    // Exact Long end to end — the stream's scores equal the batch
    // trainer's bit for bit, which is what lets the oracle replay
    // training AND serving in one CTE chain.
    "s23_stream_quality_score" -> ((s, dir) => {
      val tmp = scratch("graft-s23-")
      // Train offline on the same corpus (the model artifact; t29's
      // exact loop — shared code, shared weights, shared pinned frame),
      // STAGED once per process per dir like stagedLmModel (r16 review
      // finding: s23 cited the artifact pattern but re-trained per
      // invocation, so the serve timing carried the whole batch front;
      // the weights are a pure deterministic function of the corpus —
      // same bits every time, t29/x18/x20 keep pricing the training
      // itself).
      val w = stagedPocket(s, dir)
      // Serve on the stream: canon features -> literal-weight score.
      val ss = tunedChild(s, width = 4)
      val stream = documentsStream(s, ss, dir)
        .select(col("doc_id"), col("text"))
      val scored = graft.operators.TextPack.canonFeats(stream)
        .select(col("doc_id"), col("canon_keep"),
          graft.operators.TextPack.canonMargin(w).as("score"))
        .select(col("doc_id"), col("canon_keep"), col("score"),
          (col("score") > 0).cast("int").as("pred"))
        .withColumn("agree",
          (col("pred") === col("canon_keep")).cast("int"))
      val q = scored.writeStream
        .outputMode("append")
        .format("memory").queryName("graft_s23_score")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table("graft_s23_score").orderBy("doc_id")
    })
  )

  /** Streaming source over the documents table, robust to BOTH fixture
    * layouts (found the hard way when s23's first scale run died with
    * UNABLE_TO_INFER_SCHEMA): the testdata dirs keep documents.parquet
    * as a single FILE beside the other tables — a pathGlobFilter on the
    * parent picks it out — while the scale/ fixtures (ScaleUp output)
    * keep it as a DIRECTORY of part files, where that same glob matches
    * nothing. Same rows either way.
    */
  private def documentsStream(s: SparkSession, ss: SparkSession,
      dir: String): DataFrame = tableStream(s, ss, dir, "documents")

  /** The layout dispatch itself, generalized to ANY fixture table (r16
    * review finding: the fix was special-cased to documents, leaving
    * eventsStream one ScaleUp-emitted events fixture away from the same
    * UNABLE_TO_INFER_SCHEMA death). Schema always comes from a batch
    * read of the table PATH ([[graft.Tables.raw]] — spark.read handles
    * both layouts); the streaming reader picks the glob per layout.
    */
  private def tableStream(s: SparkSession, ss: SparkSession,
      dir: String, table: String): DataFrame = {
    val schema = graft.Tables.raw(s, dir, table).schema
    val path = new java.io.File(dir, s"$table.parquet")
    if (path.isDirectory)
      ss.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(path.toString)
    else
      ss.readStream.schema(schema)
        .option("pathGlobFilter", s"$table.parquet")
        .parquet(dir)
  }

  /** The serialized event log for `dir`, staged ONCE per process and
    * shared by every replay query (s1/s6/...): the log is a pure,
    * deterministic function of the input tables — it is the FIXTURE
    * (the topic's existing bytes), not query work, so re-serializing it
    * per invocation only pads replay timings. Checkpoints stay strictly
    * per-invocation; only the immutable input files are shared.
    */
  private val stagedLogs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stagedEventLog(s: SparkSession, dir: String): String =
    stagedLogs.computeIfAbsent(dir, { d =>
      val out = s"${scratch("graft-eventlog-")}/events"
      writeEventLog(s, d, out)
      out
    })

  /** s19's bigram-LM model artifact (context counts, bigram counts, one
    * (tot_q, n_docs, v) constants row), staged ONCE per process and per dir:
    * the model is a pure, deterministic function of the documents table —
    * like [[stagedEventLog]] it is the train-time ARTIFACT the serving
    * query deploys against (t18's cachedMerges precedent), so re-training
    * it per invocation only pads the replay timing.
    */
  private val stagedModels =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** s23's pocket weights, staged ONCE per process per dir — the same
    * artifact discipline as [[stagedLmModel]]: the weights are a pure,
    * deterministic function of the documents table (exact integer
    * training, spec-pinned bit-equal to an independent replay), so
    * re-training per invocation only pads the SERVE timing; the trainer
    * itself stays priced by t29/x18/x20, which train unconditionally.
    */
  private val stagedPockets =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
  private def stagedPocket(s: SparkSession, dir: String): Array[Long] =
    stagedPockets.computeIfAbsent(dir, { d =>
      graft.operators.TextPack.trainPocket(
        graft.operators.TextPack.trainFrame(s, d))
    })
  private def stagedLmModel(s: SparkSession, dir: String): String =
    stagedModels.computeIfAbsent(dir, { d =>
      val out = s"${scratch("graft-lm-model-")}/model"
      val corpus = Tables(s, d, "documents")
      val pairsB = corpus.select(col("doc_id"),
          explode(graft.functions.bigram_context_hashes(col("text"))).as("t"))
        .select(col("doc_id"), col("t.uh"), col("t.bh"))
      pairsB.groupBy("uh").agg(count(lit(1)).as("uc"))
        .write.parquet(s"$out/ctx")
      pairsB.groupBy("bh").agg(count(lit(1)).as("bc"))
        .write.parquet(s"$out/big")
      // gate constants as EXACT integers: a decimal sum of the quantized
      // per-doc longs + the doc count (the double mean it replaces was
      // merge-order-sensitive in its last ulps — pipeline5's discipline).
      graft.operators.TextPack.bigramLmScores(corpus)
        .agg(sum(col("avgq").cast("decimal(38,0)")).as("tot_q"),
          count(lit(1)).as("n_docs"))
        .crossJoin(pairsB.select(countDistinct(col("uh")).as("v")))
        .write.parquet(s"$out/cons")
      out
    })

  /** Stage a two-half adversarial wire under its own scratch dir: each
    * half written as ONE file with an explicit name + mtime — the unit of
    * delivery ordering (the file source admits one file per micro-batch
    * in modification-time order; the names second the ordering for
    * readability). One definition for every split wire (s12/s14/s17) —
    * the part-file discovery / rename / mtime logic must not fork.
    */
  private def stageSplitWire(
      first: (DataFrame, String), second: (DataFrame, String),
      format: String): String = {
    val tmp = scratch("graft-wire-")
    val events = java.nio.file.Paths.get(tmp, "events")
    Files.createDirectory(events)
    def stage(half: DataFrame, name: String, mtime: Long): Unit = {
      val stageDir = s"$tmp/stage-$name"
      // An empty half would surface downstream as the generic "no part
      // file" (parquet) or a silent one-batch wire (json) — fail here
      // with the split rule's name so a degenerate fixture (one event-id
      // parity / doc_id side empty at a tiny or skewed scale) is
      // diagnosable.
      require(!half.isEmpty,
        s"stageSplitWire: the '$name' half of the split is empty — " +
          "the fixture cannot exercise a two-batch adversarial delivery")
      half.coalesce(1).write.format(format).save(stageDir)
      val part = new java.io.File(stageDir).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(s".$format"))
        .getOrElse(sys.error(s"no part file in $stageDir"))
      val dst = events.resolve(name)
      Files.move(part.toPath, dst)
      // batch ORDER of the adversarial wires rides entirely on these
      // mtimes, and File.setLastModified reports failure by returning
      // false (some mounts/permissions) — a silent false would deliver
      // the halves in arbitrary order and fail s15's readAt oracle with
      // no hint that the FIXTURE, not the store, was wrong
      require(dst.toFile.setLastModified(mtime),
        s"stageSplitWire: setLastModified($mtime) failed for $dst")
    }
    stage(first._1, s"a-${first._2}.$format", 1000000L)
    stage(second._1, s"b-${second._2}.$format", 2000000L)
    events.toString
  }

  /** s12's adversarial wire, staged once per process (same fixture
    * argument as [[stagedEventLog]]): odd event-ids on time, even late.
    */
  private val stagedLateWires =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stagedLateWire(s: SparkSession, dir: String): String =
    stagedLateWires.computeIfAbsent(dir, { d =>
      val log = DerivedSignalLog.logWithEventTime(s, d)
      val eventCols = log.columns.filterNot(c => c == "seq" || c == "ets").map(col)
      val wire = log.select(col("seq"), col("ets"),
        to_json(struct(eventCols.toIndexedSeq: _*),
          Map("timestampFormat" -> TsFmt)).as("value"))
      stageSplitWire(
        (wire.where(col("seq") % 2 === 1), "ontime"),
        (wire.where(col("seq") % 2 === 0), "late"), "json")
    })

  /** s5's sentinel side-channel, staged once per process per dir (r18
    * optimization — the same fixture-staging memo discipline as
    * [[stagedLateWire]]/[[stagedNeardupWire]]): the two far-future
    * sentinel files are a pure, deterministic function of the events
    * table (max ts), so re-deriving max(ts) and re-writing them per
    * invocation only pads the replay timing; the join itself stays fully
    * priced. Sentinels must survive the per-side event_type filters
    * (withWatermark sits AFTER the filter): one purchase-typed and one
    * click-typed row on disjoint negative users, click strictly later so
    * the pair cannot join. Built as driver-side literals from one
    * max(ts) scan — no per-sentinel TakeOrdered jobs.
    * The sentinel scheme (users -1/-2, result filter p_id >= 0) assumes
    * real ids are non-negative; a data-generator change to negative ids
    * would silently corrupt the oracle comparison — fail loudly instead.
    */
  private val stagedSentinelDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stagedSentinels(s: SparkSession, dir: String): String =
    stagedSentinelDirs.computeIfAbsent(dir, { d =>
      val out = s"${scratch("graft-s5-sent-")}/sent"
      val e = Tables(s, d, "events")
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      val stats = e.agg(max(col("ts")), min(col("event_id")), min(col("user_id"))).head()
      require(stats.getLong(1) >= 0 && stats.getLong(2) >= 0,
        s"s5 sentinels need non-negative ids: min(event_id)=${stats.getLong(1)}, " +
          s"min(user_id)=${stats.getLong(2)}")
      val maxTs = stats.getTimestamp(0)
      def writeSentinel(days: Int): Unit = {
        val day = 86400000L
        s.createDataFrame(Seq(
            (-1L, new java.sql.Timestamp(maxTs.getTime + days * day), -1L, "purchase"),
            (-2L, new java.sql.Timestamp(maxTs.getTime + (days + 1) * day), -2L, "click")))
          .toDF("event_id", "ts", "user_id", "event_type")
          .coalesce(1).write.mode("append").parquet(out)
      }
      writeSentinel(30)
      writeSentinel(60)
      out
    })

  /** s14's adversarial delivery, staged once per process: the documents
    * table split at the doc_id midpoint — the HIGH half first (claims
    * buckets with high ids), the LOW half a micro-batch later (must
    * steal every contested claim).
    */
  private val stagedNeardupWires =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stagedNeardupWire(s: SparkSession, dir: String): String =
    stagedNeardupWires.computeIfAbsent(dir, { d =>
      val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
      val mid = docs.agg(((min(col("doc_id")) + max(col("doc_id"))) / 2)
        .cast("long")).head().getLong(0)
      stageSplitWire(
        (docs.where(col("doc_id") > mid), "high"),
        (docs.where(col("doc_id") <= mid), "low"), "parquet")
    })

  /** s17's delivery, staged once per process: the (event_id, event_type,
    * value-cents) projection of the events table split by event-id
    * parity. A SPLIT (each row delivered exactly once), not the symlink
    * redelivery double: a bounded heap is not a set function.
    */
  private val stagedEventSplits =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stagedEventSplit(s: SparkSession, dir: String): String =
    stagedEventSplits.computeIfAbsent(dir, { d =>
      val ev = Tables(s, d, "events").select(col("event_id"), col("event_type"),
        round(col("value") * 100, 0).cast("long").as("xc"))
      stageSplitWire(
        (ev.where(col("event_id") % 2 === 1), "odd"),
        (ev.where(col("event_id") % 2 === 0), "even"), "parquet")
    })

  /** s18's delivery, staged once per process: the (event_id, user_id)
    * projection split by event-id parity — a SPLIT, not the symlink
    * double, because counting is not redelivery-idempotent.
    */
  private val stagedUserWires =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stagedUserSplit(s: SparkSession, dir: String): String =
    stagedUserWires.computeIfAbsent(dir, { d =>
      val ev = Tables(s, d, "events").select(col("event_id"), col("user_id"))
      stageSplitWire(
        (ev.where(col("event_id") % 2 === 1), "odd"),
        (ev.where(col("event_id") % 2 === 0), "even"), "parquet")
    })

  /** Serialize the derived signal log to JSON-lines event files — the
    * wire format of the reference's topic. Delete events naturally shrink
    * to `{"action","id"}` because to_json drops nulls. 2 files → 2
    * micro-batches: exercises cross-batch state without padding the bench.
    */
  private def writeEventLog(s: SparkSession, dir: String, out: String): Unit = {
    val log = DerivedSignalLog.log(s, dir)
    val eventCols = log.columns.filterNot(_ == "seq").map(col)
    log.select(col("seq"),
        to_json(struct(eventCols.toIndexedSeq: _*),
          Map("timestampFormat" -> TsFmt)).as("value"))
      .repartition(2)
      .write.json(out)
  }

  /** Child session tuned for micro-batch-sized shuffles (see s1 note).
    * `width` also sets the number of STATE STORE partitions for stateful
    * queries — every partition pays a per-batch commit (delta file +
    * rename) regardless of data volume, so micro-batch-scale replays want
    * it small; a production deployment sizes it to state volume instead.
    *
    * `noData` controls the no-data flush batch after the last data batch:
    * REQUIRED wherever emission is gated on the watermark advancing past
    * the final data — s4/s8/s12 pin it true EXPLICITLY (a drifted
    * default would leave those sinks silently empty or stale; r16 review
    * finding: this doc once claimed they were pinned while they relied
    * on the default). s5 is the stated exception: its outer join's
    * null-extension completes within the staged wire's own data batches,
    * and the flush round was measured as the suite's single largest
    * per-query fixed cost — so it pins FALSE deliberately (see the s5
    * scaladoc). Queries whose sinks don't gate on the watermark
    * (complete-mode, eager inner joins, update-mode folds, streaming
    * dedup) pin FALSE where the flush round showed up in timings and
    * otherwise leave the safe default true — the flush is then one
    * harmless extra planning round.
    */
  private def tunedChild(
      s: SparkSession, width: Int = 8, noData: Boolean = true): SparkSession = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", width.toString)
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData.toString)
    // AQE is a no-op inside streaming stages but still re-optimizes every
    // micro-batch-sized BATCH job these replays run (foreachBatch merges,
    // staged reads) — pure planning overhead at micro-batch data volumes.
    // A production deployment running corpus-sized batch jobs on the same
    // session would keep it on.
    ss.conf.set("spark.sql.adaptive.enabled", "false")
    // Batch-source SPLIT size (r18 optimization; guide §6 input splits):
    // each staged wire file is one micro-batch's delivery, and at the
    // default 128 MB split a whole batch parses in ONE task — measured
    // (StreamDiag, s12): the JSON-decode job is 0.76 s single-task while
    // width-4 sits idle; JSON/text decode is ~100× more CPU per byte
    // than a parquet scan, so splits must be sized to CPU, not bytes.
    // 1 MB splits fan one wire file across the replay width — measured
    // (interleaved same-JVM A/B, min of 3): s1 2.64→2.09, s13
    // 3.25→2.72, s15 2.64→2.11, s6 2.33→1.84, s12 2.90→2.56 s; the
    // parquet-wire queries are unchanged (one row group stays one
    // split). Like `width`, this is MICRO-BATCH-sized tuning the child
    // session exists for — a production stream's batches are many
    // files × hundreds of MB, where the default split is right; the
    // dial keeps it overridable per deploy.
    ss.conf.set("spark.sql.files.maxPartitionBytes",
      s.conf.get("graft.stream.replayMaxPartitionBytes", "1m"))
    ss
  }

  /** The events table as a streaming frame. The streaming reader needs an
    * explicit schema; instead of assuming one physical encoding for `ts`
    * (r8 lesson: the fixture flipped from TIMESTAMP(NANOS) to naive
    * TIMESTAMP(MICROS) and the hardcoded nanos divisor silently shrank
    * every timestamp 1000×), take the schema a batch read of the same file
    * actually produces, then apply the SAME normalization as graft.Tables —
    * one shared expression, so batch and stream cannot drift.
    */
  private def eventsStream(ss: SparkSession, dir: String): DataFrame = {
    val rawSchema = graft.Tables.raw(ss, dir, "events").schema
    tableStream(ss, ss, dir, "events").withColumn("ts",
      graft.Tables.normalizeTsExpr("ts", rawSchema("ts").dataType))
  }

  // Streaming replay must converge to exactly the batch fold: same oracle
  // as the batch projection.
  override def oracles: Map[String, String] = Map(
    "s1_stream_replay" -> (DerivedSignalLog.SQL_CTE +
      """SELECT id, seq, action, title, content, priority, author, created_at, updated_at
        |FROM signals ORDER BY id""".stripMargin),

    // Identical to a12's oracle: streaming and batch declare the same
    // aggregation, so they share one truth.
    "s2_stream_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // The batch formulation of the same join — micros-truncated
    // timestamps BEFORE the range comparison, matching the Spark side.
    "s3_stream_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
        |  a.ts AS click_ts, b.ts AS purchase_ts
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        | AND a.event_type = 'click' AND b.event_type = 'purchase'
        |ORDER BY click_id, purchase_id""".stripMargin,

    // a12's aggregation restricted to the windows the final watermark
    // (max event time − 1 h) has provably closed — the append-mode
    // emission set, excluding the held-back tail.
    "s4_window_append" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events
        |WHERE date_trunc('hour', CAST(ts AS TIMESTAMP)) <
        |  (SELECT date_trunc('hour', max(CAST(ts AS TIMESTAMP))) - INTERVAL 2 HOUR FROM events)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // The batch left-outer formulation; NULLS FIRST matches Spark's
    // ascending-null ordering.
    "s5_stream_outer_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT p.user_id AS user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        |  p.ts AS purchase_ts, c.ts AS click_ts
        |FROM (SELECT * FROM e WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |ORDER BY purchase_id, click_id NULLS FIRST""".stripMargin,

    // The live fold converges to the batch fold: s1's oracle.
    "s6_live_projection" -> (DerivedSignalLog.SQL_CTE +
      """SELECT id, seq, action, title, content, priority, author, created_at, updated_at
        |FROM signals ORDER BY id""".stripMargin),

    // Dedup of the doubled delivery == the documents table, so
    // fingerprint-grouping replays d1's oracle.
    "s7_stream_dedup" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    // a13's batch sessionization restricted to sessions the final
    // watermark (max event time − 1 h, 1 s micros/millis margin) has
    // provably closed: close time = last event + the 30 min gap.
    "s8_session_append" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM g)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sess
        |HAVING max(ts) + INTERVAL 30 MINUTE <
        |  (SELECT max(CAST(ts AS TIMESTAMP)) FROM events)
        |    - INTERVAL 1 HOUR - INTERVAL 1 SECOND
        |ORDER BY user_id, session_start""".stripMargin,

    // Shares a20b's estimator replay: streaming sketch state converges
    // to the batch sketch of the same hash set.
    "s10_stream_kmv" ->
      graft.analytics.ExtrasPack.oracles("a20b_kmv_distinct"),

    // The batch restatement of the streamed per-row features — shares
    // pipeline1's CTE chain, whose canon join is row-preserving.
    "s11_stream_enrich" ->
      """WITH st AS (SELECT user_id, count(*) AS user_total FROM events GROUP BY user_id)
        |SELECT event_id, user_id, user_total
        |FROM events JOIN st USING (user_id)
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "s9_stream_curation" ->
      (graft.operators.CurationPipeline.curationCtes +
        """
          |SELECT doc_id, lang_ok, quality_ok, repetition_ok,
          |  CAST(lang_ok = 1 AND quality_ok = 1 AND repetition_ok = 1 AS INTEGER)
          |    AS stream_keep
          |FROM lab ORDER BY doc_id""".stripMargin),

    // The batch TIME-fold: winner per key by (ets DESC, seq DESC) — what
    // the ts-aware merge must converge to no matter the delivery order.
    "s12_late_lww" ->
      s"""WITH signal_log AS (
         |  ${DerivedSignalLog.LOG_SELECT_ETS}),
         |w AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY id ORDER BY ets DESC, seq DESC) AS rn
         |  FROM signal_log)
         |SELECT id, seq, action, title, content, priority, author, created_at, updated_at
         |FROM w WHERE rn = 1 AND action <> 'deleted' ORDER BY id""".stripMargin,

    // s1's fold WITH tombstones visible, minus tombstones older than the
    // compaction horizon (max seq div 2) — exactly what compact() keeps.
    "s13_state_compaction" -> (DerivedSignalLog.SQL_CTE +
      """SELECT id, seq, action, title, content, priority, author, created_at, updated_at
        |FROM signal_view
        |WHERE NOT (action = 'deleted' AND seq < (SELECT max(event_id) // 2 FROM events))
        |ORDER BY id""".stripMargin),

    // The batch restatement of the claim table: per-bucket min doc_id
    // over d2/d3's replayed signature pipeline — a doc is a near-dup
    // candidate iff some bucket of its signature has a lower-id claimant.
    "s14_stream_neardup" ->
      (graft.operators.DedupPack.shinglesCte +
        """, claims AS (
          |  SELECT band, minhash, min(doc_id) AS winner
          |  FROM sig GROUP BY band, minhash)
          |SELECT s.doc_id,
          |  CAST(max(CASE WHEN c.winner < s.doc_id THEN 1 ELSE 0 END) AS INTEGER)
          |    AS is_neardup
          |FROM sig s JOIN claims c ON c.band = s.band AND c.minhash = s.minhash
          |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin),

    // The generation-0 snapshot folds exactly the odd-seq half the first
    // micro-batch consumed.
    "s15_state_time_travel" ->
      (DerivedSignalLog.sqlCteFiltered("seq % 2 = 1") +
        """SELECT id, seq, action, title, content, priority, author, created_at, updated_at
          |FROM signals ORDER BY id""".stripMargin),

    // Streaming sample state converges to the batch sketch of the same
    // row set (redelivery is a no-op): a43's oracle verbatim.
    "s16_stream_quantiles" ->
      graft.analytics.ExtrasPack.oracles("a43_sketch_quantiles"),

    // The split-delivered, cross-batch-merged counter grid equals the
    // single-pass batch grid exactly (cell-wise integer addition is
    // associative + commutative): a44's oracle verbatim.
    "s18_stream_count_min" ->
      graft.analytics.ExtrasPack.oracles("a44_count_min"),

    // The batch leaderboard: rank by (value-cents DESC, event_id) ≤ 5 —
    // the bounded heap's (ord DESC, tie ASC) contract as a window.
    "s17_stream_topk" ->
      """WITH x AS (
        |  SELECT event_type, event_id, CAST(round(value * 100, 0) AS BIGINT) AS xc
        |  FROM events),
        |r AS (
        |  SELECT event_type, event_id, xc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY xc DESC, event_id) AS rank
        |  FROM x)
        |SELECT event_type, CAST(rank AS INTEGER) AS rank, event_id,
        |  CAST(xc AS DOUBLE) / 100 AS value
        |FROM r WHERE rank <= 5 ORDER BY event_type, rank""".stripMargin,

    // s19 ≡ batch t19 + the half-mean gate: stream-static scoring
    // against the frozen model must be invariant to batching, so the
    // oracle is the shared batch CTE chain.
    "s19_stream_lm_gate" ->
      s"""${graft.operators.TextPack.bigramLmCtes},
         |mean AS (SELECT CAST(sum(avgq) AS HUGEINT) AS tot_q, count(*) AS n_docs FROM sc)
         |SELECT doc_id, n_trans, avg_p6,
         |  CAST(CAST(avgq AS HUGEINT) * 2 * n_docs >= tot_q AS INTEGER) AS fluent
         |FROM sc, mean ORDER BY doc_id""".stripMargin,

    // s20: the batch formulation — hourly type counts vs the global
    // reference, the same integer TV numerator and cross-multiplied
    // alert, one terminal division for `tv`.
    "s20_stream_drift" ->
      """WITH e AS (
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w, event_type FROM events),
        |ref AS (SELECT event_type, count(*) AS c FROM e GROUP BY 1),
        |nr AS (SELECT CAST(count(*) AS BIGINT) AS n_ref FROM e),
        |o AS (SELECT w, event_type, count(*) AS o FROM e GROUP BY 1, 2),
        |nw AS (SELECT w, CAST(sum(o) AS BIGINT) AS n_w FROM o GROUP BY w),
        |x AS (
        |  SELECT nw.w, nw.n_w, ref.c, coalesce(o.o, 0) AS o, nr.n_ref
        |  FROM nw CROSS JOIN ref CROSS JOIN nr
        |  LEFT JOIN o ON o.w = nw.w AND o.event_type = ref.event_type),
        |d AS (
        |  SELECT w, n_w, n_ref,
        |    CAST(sum(abs(o * n_ref - c * n_w)) AS BIGINT) AS drift_num
        |  FROM x GROUP BY w, n_w, n_ref)
        |SELECT w AS window_start, n_w, drift_num,
        |  CAST(drift_num AS DOUBLE) / CAST(2 * n_w * n_ref AS DOUBLE) AS tv,
        |  CAST(drift_num * 10 > n_w * n_ref AS INTEGER) AS is_drift
        |FROM d ORDER BY window_start""".stripMargin,

    // s21 ≡ batch d9 by construction (same bitmap builder, same compiled
    // probe kernel, stateless per-doc gate) — the oracle is d9's, shared
    // verbatim so the two can never drift.
    "s21_stream_decontam" ->
      graft.operators.DedupPack.oracles("d9_bloom_decontaminate"),

    // s22: the composed canon replayed from the SHARED CTE builders —
    // t28's page/clean chain, then t26's and t27's rule chains over the
    // cleaned relation. Batch SQL and streaming dataflow share one
    // definition per stage, so they cannot drift.
    "s22_stream_canon_gate" ->
      s"""WITH ${graft.operators.TextPack.c4Ctes},
         |${graft.operators.TextPack.canonCleanedCte},
         |${graft.operators.TextPack.gopherCtes("cleaned", "gp")},
         |${graft.operators.TextPack.repetitionCtes("cleaned", "rp")}
         |SELECT c.doc_id, c.c4_kept, g.n_words,
         |  g.pass AS gopher_pass, r.pass AS rep_pass,
         |  CAST(c.c4_kept = 1 AND g.pass = 1 AND r.pass = 1 AS INTEGER) AS canon_keep
         |FROM cleaned c JOIN gpr g ON c.doc_id = g.doc_id
         |  JOIN rpp r ON c.doc_id = r.doc_id
         |ORDER BY c.doc_id""".stripMargin,

    // s23: the distill-then-SCORE serve side (r14 verdict #1b) — the
    // pocket weights learned by the t29 trainer applied at the ingest
    // edge as one stateless compiled projection, chained after the same
    // canon feature chain s22 composes. The oracle replays TRAINING AND
    // SCORING from the builders t29's oracle shares verbatim
    // (canonFeatureCtes + canonPocketCtes), so the served scorer cannot
    // drift from the trained one.
    "s23_stream_quality_score" ->
      s"""WITH ${graft.operators.TextPack.canonFeatureCtes},
         |${graft.operators.TextPack.canonPocketCtes}
         |SELECT doc_id, canon_keep, score,
         |  CAST(score > 0 AS INTEGER) AS pred,
         |  CAST(CAST(score > 0 AS INTEGER) = canon_keep AS INTEGER) AS agree
         |FROM sc ORDER BY doc_id""".stripMargin
  )

}
