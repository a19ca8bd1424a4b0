package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.projection.SignalProjection

/** Keyed state table for the streaming projection: hash-bucketed parquet
  * with per-bucket generations.
  *
  * Layout: `dir/bucket=<b>/gen=<batchId>/part-*.parquet`
  *
  * Why this shape (the 100 TB design):
  *   - **Incremental merge.** A micro-batch only rewrites the buckets its
  *     keys hash into: merge cost is O(touched state), not O(total state).
  *     With B buckets and a batch touching k keys, at most min(k, B)
  *     buckets are read+rewritten. B scales with state size (config), so
  *     bucket files stay executor-memory-sized.
  *   - **Idempotent replay = exactly-once.** Generations are named by the
  *     Structured Streaming batchId. If a batch is replayed after a crash,
  *     the same gen directory is rewritten and the swap is a no-op
  *     semantically — the checkpoint + idempotent sink contract
  *     (strictly stronger than the reference's at-least-once + idempotent
  *     Redis apply, consumer.go:46-51).
  *   - **Readers never block.** A query reads the latest complete
  *     generation per bucket; an in-flight merge writes to a staging dir
  *     and renames (the classic HDFS commit pattern; on object stores or
  *     for multi-writer setups this slot is where a table format like
  *     Delta/Iceberg would plug in).
  *
  * Tombstones (action='deleted') are retained in state so late replays of
  * older events cannot resurrect deleted keys; [[compact]] drops them once
  * the log horizon passes (the same role as Kafka compaction tombstone
  * retention).
  */
class BucketedStateStore(
    spark: SparkSession,
    dir: String,
    numBuckets: Int = 8,
    key: String = "id",
    seq: String = "seq") {

  private val root = new Path(dir)
  private def fs: FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def bucketOf(c: Column): Column = pmod(xxhash64(c), lit(numBuckets))

  /** Layout manifest (r16 review finding): `bucketOf` decides which
    * buckets a merge reads AND where it writes, so reopening an existing
    * state dir with a different `numBuckets`/`key`/`seq` silently splits
    * keys across two bucket sets — merge never reads the old copy,
    * read() unions and serves BOTH rows, and a tombstone can only ever
    * hide one of them. The manifest is stamped on the store's first
    * write (temp + rename, the `_dropped` marker discipline) and every
    * instance validates against it ONCE before its first read or merge;
    * a mismatch fails loudly with the original parameters in the
    * message.
    *
    * Pre-manifest dirs (older checkpoints) get an EXPLICIT adoption gate
    * (r16 ADVICE: the r16 form silently stamped the OPENING instance's
    * parameters on first write — so opening an old checkpoint with the
    * wrong numBuckets both performed the split-key merge the manifest
    * exists to prevent AND canonized the wrong layout as manifest
    * truth): first contact (read OR merge) with a manifest-less dir
    * that already has bucket dirs throws unless
    * `graft.store.adoptLayout=true`, and adoption validates the one
    * direction the layout itself can refute — an existing `bucket=N`
    * with N ≥ numBuckets proves the original store was wider (the
    * other direction is unprovable from a sparse listing, which is why
    * adoption is an explicit operator claim, not an inference). Fresh
    * dirs (no bucket dirs yet) stamp on first write as before.
    */
  private val manifestDesc = s"numBuckets=$numBuckets,key=$key,seq=$seq"
  private def manifestPath = new Path(root, "_store_manifest")
  @volatile private var manifestOk = false
  private def checkManifest(stampIfAbsent: Boolean): Unit = {
    if (manifestOk) return
    val mp = manifestPath
    if (fs.exists(mp)) {
      val in = fs.open(mp)
      val got = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
      require(got == manifestDesc,
        s"state dir $dir was written with [$got] but opened with " +
          s"[$manifestDesc] — a mismatched layout silently splits keys " +
          "across bucket sets; open the store with the original parameters")
      manifestOk = true
    } else {
      // Manifest absent. A dir that ALREADY has bucket data predates the
      // manifest — the opening instance's parameters are a claim, not a
      // fact, so require the operator to make the claim explicitly
      // before any read/merge touches the buckets (and refuse outright
      // when the layout itself disproves it).
      val preManifest = allBuckets
      if (preManifest.nonEmpty) {
        require(spark.conf.getOption("graft.store.adoptLayout")
            .contains("true"),
          s"state dir $dir has bucket data but no layout manifest (a " +
            "pre-manifest checkpoint); opening it with the wrong " +
            "parameters would silently split keys across bucket sets. " +
            "If these opening parameters ARE the original ones " +
            s"[$manifestDesc], set graft.store.adoptLayout=true to " +
            "adopt and stamp them")
        val maxB = preManifest.max
        require(maxB < numBuckets,
          s"state dir $dir holds bucket=$maxB but was opened with " +
            s"numBuckets=$numBuckets — the original store was wider; " +
            "the adoption claim is refuted by the layout itself")
        // Validated adoption STAMPS immediately, read path included (r17
        // verdict #4: validate-only left manifestOk unset, so a read-only
        // consumer of an adopted legacy dir re-listed every bucket and
        // re-validated on every read until some merge stamped). Writing
        // the manifest the operator just claimed IS the point of the
        // claim — adoption is a one-time explicit upgrade action, after
        // which the dir is an ordinary manifest'd store. On the READ
        // path the stamp is best-effort (review finding: a consumer
        // with r-x-only access to the dir could previously read an
        // adopted legacy dir and now couldn't at all): a stamp failure
        // logs and memoizes the validation for THIS instance only —
        // the claim is not canonized, but reads proceed; a WRITE path
        // failure propagates (a merge needs write access regardless).
        if (stampIfAbsent) stampManifest()
        else try stampManifest()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[store] adoption of $dir validated but the manifest stamp " +
              s"failed (${e.getMessage}) — likely a read-only consumer; " +
              "memoizing the validation for this instance only")
          manifestOk = true
        }
      } else if (stampIfAbsent && fs.exists(root)) {
        stampManifest()
      }
    }
  }

  private def stampManifest(): Unit = {
    val tmp = new Path(root, "_store_manifest.tmp")
    val out = fs.create(tmp, true)
    try out.write(manifestDesc.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.rename(tmp, manifestPath)) manifestOk = true
    else {
      // Hadoop filesystems report rename failure by returning false; the
      // benign cause is a CONCURRENT stamper winning the race, in which
      // case the manifest now exists and re-validating it terminates.
      // Any other cause must fail loudly here — recursing while the
      // manifest is still absent would re-enter the adoption branch and
      // this method forever (review finding: the r18 refactor's
      // adoption-path stamp closed that loop; the exists() guard is the
      // termination proof).
      require(fs.exists(manifestPath),
        s"could not stamp layout manifest $manifestPath (rename returned " +
          "false and no concurrent stamp exists)")
      checkManifest(stampIfAbsent = false)
    }
  }

  private def bucketPath(b: Long): Path = new Path(root, s"bucket=$b")
  private def genPath(b: Long, g: Long): Path = new Path(bucketPath(b), s"gen=$g")

  private def listGens(b: Long): Seq[Long] = {
    val bp = bucketPath(b)
    if (!fs.exists(bp)) Seq.empty
    else fs.listStatus(bp).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
  }

  private def latestGenPaths(
      buckets: Seq[Long], maxGen: Long = Long.MaxValue): Seq[String] =
    buckets.flatMap { b =>
      val gens = listGens(b).filter(_ <= maxGen)
      if (gens.isEmpty) None
      else {
        // skip generations emptied by compaction (no data files)
        val p = genPath(b, gens.max)
        val hasData = fs.listStatus(p).exists(_.getPath.getName.startsWith("part-"))
        if (hasData) Some(p.toString) else None
      }
    }

  private def allBuckets: Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .map(_.getPath.getName.stripPrefix("bucket=").toLong)

  /** Current state (tombstones included); None if no state yet. */
  def read(): Option[DataFrame] = {
    checkManifest(stampIfAbsent = false)
    readBuckets(allBuckets)
  }

  /** TIME-TRAVEL read: state as of generation `maxGen` (inclusive) —
    * each bucket serves its newest generation ≤ maxGen; buckets first
    * touched later have no state yet and contribute nothing. This is
    * what the per-bucket generation layout buys beyond idempotent
    * replay: any still-retained batch boundary is a consistent snapshot
    * (the Delta/Iceberg version-read analog), bounded by the retention
    * window (2 generations/bucket here; production sizes retention to
    * its audit horizon).
    *
    * FAILS LOUDLY when the snapshot has aged out: a bucket whose needed
    * generation was deleted by retention is indistinguishable from one
    * first touched later by directory listing alone, and silently
    * skipping it would return a cross-epoch mix. Retention therefore
    * records each bucket's first-dropped generation (`_dropped` marker,
    * written once = the minimum ever dropped); if a bucket has no
    * retained generation ≤ maxGen but DID drop one ≤ maxGen, the
    * snapshot is unservable and this throws instead of lying.
    */
  def readAt(maxGen: Long): Option[DataFrame] = {
    checkManifest(stampIfAbsent = false)
    // ONE listing per bucket (r16 review finding: the aged-out guard and
    // latestGenPaths each listed every bucket — doubled metadata RPCs on
    // an object store): the guard decision and the served path come from
    // the same listGens result.
    val paths = allBuckets.flatMap { b =>
      val eligible = listGens(b).filter(_ <= maxGen)
      if (eligible.isEmpty) {
        val marker = new Path(bucketPath(b), "_dropped")
        if (fs.exists(marker)) {
          val in = fs.open(marker)
          val minDropped =
            try new String(in.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8).trim.toLong
            finally in.close()
          if (minDropped <= maxGen)
            throw new IllegalStateException(
              s"readAt($maxGen): bucket $b's generation <= $maxGen was " +
                s"deleted by retention (oldest dropped: $minDropped) — " +
                "the snapshot is no longer servable; raise retention or " +
                "read a newer generation")
        }
        None
      } else {
        // skip generations emptied by compaction (no data files)
        val p = genPath(b, eligible.max)
        val hasData =
          fs.listStatus(p).exists(_.getPath.getName.startsWith("part-"))
        if (hasData) Some(p.toString) else None
      }
    }
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  private def readBuckets(buckets: Seq[Long]): Option[DataFrame] = {
    val paths = latestGenPaths(buckets)
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }

  /** Merge one micro-batch (already reduced to per-key latest) into state.
    * Only buckets containing batch keys are read and rewritten.
    */
  def merge(batchLatest: DataFrame, gen: Long): Unit = {
    checkManifest(stampIfAbsent = false)
    val withBucket = batchLatest.withColumn("_bucket", bucketOf(col(key)))
    // Tiny driver-side collect: at most numBuckets longs (config-bounded,
    // scale-independent) — not a data collect.
    val affected = withBucket.select(col("_bucket")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    if (affected.isEmpty) return

    val oldState = readBuckets(affected)
      .map(_.withColumn("_bucket", bucketOf(col(key))))
    val combined = oldState match {
      case Some(old) => old.unionByName(withBucket)
      case None => withBucket
    }
    // ONE exchange per merge, not two (r18, guide §2.1): repartition to
    // the bucket layout the write needs FIRST, then fold grouped by
    // (_bucket, key) — _bucket is a function of the key, so the fold is
    // unchanged, and the bucket partitioning satisfies the aggregate's
    // distribution, eliding the fold's own key shuffle. (Both inputs are
    // already per-key latest — the batch by foreachBatch's reduction, the
    // old state by construction — so the dropped map-side combine had
    // nothing to combine.)
    val merged = SignalProjection.latestByKey(
      combined.repartition(numBuckets, col("_bucket")), key, seq,
      alsoGroup = Seq("_bucket"))
    writeBuckets(merged, affected, gen, prePartitioned = true)
  }

  /** Write `data` (carrying a `_bucket` column) as generation `gen` of
    * every bucket in `affected` — buckets with no rows get an empty
    * generation, which supersedes (hides) their older data.
    */
  private def writeBuckets(data: DataFrame, affected: Seq[Long], gen: Long,
      prePartitioned: Boolean = false): Unit = {
    val staging = new Path(root, s"_staging_gen_$gen")
    fs.delete(staging, true)
    // co-locate each bucket into one task before the partitioned write:
    // one file per bucket per generation instead of (shuffle-partitions ×
    // buckets) small files — fewer renames, and readers open exactly one
    // file per bucket. At larger state, raise numBuckets, not files/bucket.
    // `prePartitioned` callers (merge) already hold exactly this layout —
    // re-shuffling it here would undo the one-exchange plan they built.
    val laid = if (prePartitioned) data
      else data.repartition(numBuckets, col("_bucket"))
    laid.write.partitionBy("_bucket").parquet(staging.toString)

    // Stamp/validate the layout manifest once the root exists (the
    // staging write above created it on a fresh store).
    checkManifest(stampIfAbsent = true)

    affected.foreach { b =>
      val src = new Path(staging, s"_bucket=$b")
      val dst = genPath(b, gen)
      fs.delete(dst, true) // idempotent replay of the same batchId
      // fs.delete reports failure by returning FALSE like rename below;
      // renaming into a still-existing dst is the nastier failure — HDFS
      // then moves src INSIDE dst (gen=N/_bucket=b/part-*), whose
      // underscore dir is invisible to Spark and to the part- hasData
      // check, so the generation reads EMPTY and supersedes the bucket's
      // older data: a silent wipe. Verify the target is gone before
      // renaming (r16 review finding).
      require(!fs.exists(dst),
        s"could not delete existing $dst for idempotent replay — failing " +
          "the batch so the checkpoint retries instead of committing an " +
          "empty generation")
      fs.mkdirs(dst.getParent)
      if (fs.exists(src)) {
        // Hadoop FileSystems report most rename failures by returning
        // FALSE (quota, concurrent delete, S3A copy failure) — not by
        // throwing. Swallowing it would let foreachBatch commit the
        // batchId with the generation never created: a silent
        // exactly-once violation readers can't detect. Fail the batch
        // so the checkpoint retries it.
        require(fs.rename(src, dst), s"rename $src -> $dst failed")
      } else fs.mkdirs(dst) // bucket emptied (e.g. by compaction)
      // retain only the 2 newest generations per bucket; record the FIRST
      // drop (the minimum ever, since oldest go first) so readAt can fail
      // loudly on aged-out snapshots instead of silently skipping.
      // Marker commit is write-temp-then-rename: a crash mid-write must
      // not leave an empty marker that turns readAt's diagnostic into a
      // NumberFormatException.
      val dropped = listGens(b).sorted.dropRight(2)
      dropped.headOption.foreach { g0 =>
        val marker = new Path(bucketPath(b), "_dropped")
        if (!fs.exists(marker)) {
          val tmp = new Path(bucketPath(b), "_dropped.tmp")
          val out = fs.create(tmp, true)
          try out.write(g0.toString.getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          require(fs.rename(tmp, marker), s"rename $tmp -> $marker failed")
        }
      }
      dropped.foreach(g => fs.delete(genPath(b, g), true))
    }
    fs.delete(staging, true)
  }

  /** Newest generation across all buckets; -1 if the store is empty. */
  def currentMaxGen: Long =
    allBuckets.flatMap(listGens).foldLeft(-1L)(math.max)

  /** Version TOKEN for serving-layer cache invalidation: the SUM over
    * buckets of (newest generation + 1). [[currentMaxGen]] is wrong for
    * that job — a multi-bucket batch renames bucket dirs sequentially,
    * and max() already reaches its final value on the FIRST rename, so a
    * reader racing the batch could cache a mixed view under a token that
    * never moves again. The sum moves with EVERY bucket rename.
    *
    * The +1 per bucket (r16 review finding): with the raw gen sum, an
    * EMPTY store (no buckets, token 0) and the store right after
    * micro-batch 0 (every touched bucket's max gen = the batchId 0,
    * token 0) were indistinguishable — a server whose first request
    * cached the empty view before batch 0 committed would keep serving
    * it until batch 1; and a bucket dir created by mkdirs before its
    * first rename contributed −1, letting the token transiently DECREASE
    * into a collision with a pre-batch value. With +1: empty store = 0,
    * any committed generation ≥ 1, a gen-less bucket dir contributes 0 —
    * the token strictly increases with every completed rename.
    */
  def currentGenToken: Long =
    allBuckets.map(b => listGens(b).foldLeft(-1L)(math.max) + 1).sum

  /** Drop tombstones older than `horizonSeq` (log-compaction analog),
    * writing the compacted buckets as generation `currentMaxGen + 1` —
    * the only gen that supersedes every existing one WITHOUT shadowing
    * future `merge(batchId)` writes. Returns the gen readers should
    * treat as current (resume the stream with batchIds above it): the
    * new gen if any bucket was rewritten, else the unchanged max (a
    * tombstone-free store compacts to a no-op — no empty generation
    * churn).
    */
  def compact(horizonSeq: Long): Long = {
    val g = currentMaxGen + 1
    if (compact(horizonSeq, g).nonEmpty) g else g - 1
  }

  /** Drop tombstones older than `horizonSeq` (log-compaction analog).
    * BUCKET-SELECTIVE: only buckets that actually hold a pre-horizon
    * tombstone are read and rewritten — untouched buckets keep their
    * current generation files verbatim (readers always take the newest
    * generation per bucket, so serving mixed generations is the normal
    * read path — the same property `readAt` proves). At 100× state size
    * a compaction epoch therefore costs O(buckets-with-old-tombstones),
    * not O(total state). Returns the rewritten bucket ids.
    *
    * The rewrite is deliberately not `merge`, which can only upsert: a
    * merge would resurrect the tombstones from the old generation it
    * unions with.
    *
    * `gen` must be strictly newer than every existing generation (readers
    * serve the newest gen per bucket, so anything else would be a no-op
    * shadowed by current state) and finite: a sentinel like Long.MaxValue
    * would permanently shadow every later merge(batchId) — and retention
    * keeps the top-2 gens, so the wedge would never age out. Prefer the
    * 1-arg overload, which derives the successor gen itself.
    */
  def compact(horizonSeq: Long, gen: Long): Seq[Long] = {
    val cur = currentMaxGen
    require(gen > cur && gen < Long.MaxValue,
      s"compact gen=$gen must be a finite generation newer than the " +
        s"current max ($cur); use compact(horizonSeq) to derive it")
    read() match {
      case None => Seq.empty
      case Some(st) =>
        // Tombstone compaction is a SIGNAL-schema operation on an
        // otherwise schema-generic store (key/seq are parameters, the
        // tombstone marker is not): fail loudly and early on a store
        // without the signal action column (s14's claims store, s12's
        // struct-ordered store) instead of an opaque AnalysisException
        // mid-scan — and share the ONE Deleted constant so a marker
        // change can never silently turn compact into a no-op that
        // retains every tombstone forever (r16 review finding).
        require(st.columns.contains("action"),
          s"compact() requires the signal read-model 'action' column; " +
            s"this store's schema is [${st.columns.mkString(", ")}]")
        val tombstone =
          col("action") === graft.domain.SignalSchema.Deleted
        // Which buckets hold a pre-horizon tombstone? One filtered scan
        // (the action/seq predicates push down to the parquet readers),
        // then a driver collect bounded by numBuckets longs — config-
        // bounded like merge()'s, never a data collect.
        val affected = st
          .where(tombstone && col(seq) < horizonSeq)
          .select(bucketOf(col(key)).as("_bucket")).distinct()
          .collect().map(_.getLong(0)).toSeq.sorted
        if (affected.nonEmpty) {
          val kept = readBuckets(affected).get
            .where(!(col("action") === graft.domain.SignalSchema.Deleted &&
              col(seq) < horizonSeq))
            .withColumn("_bucket", bucketOf(col(key)))
          writeBuckets(kept, affected, gen)
        }
        affected
    }
  }
}
