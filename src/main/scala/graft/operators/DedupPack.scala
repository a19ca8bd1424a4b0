package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.functions.{cosine_similarity, md5Prefix16, shingle_hashes, shingle_hashes_bag, winnow_fingerprints, wordShinglesOf}

/** Deduplication operators for training-data pipelines (SURVEY §7.1-6):
  * exact, MinHash+LSH, n-gram Jaccard, SimHash, embedding-cosine near-dup.
  *
  * Scale architecture: the LSH pipeline (d2→d3) is the 100 TB path —
  * shingle → per-band minhash (one groupBy doc,band with map-side partial
  * min) → band-bucket self-join (shuffle on (band,sig), only colliding
  * buckets pair up). Exact pairwise Jaccard (d4) exists to *verify* LSH
  * candidates and is deliberately restricted to a bounded sample — the
  * all-pairs form is O(n²) and must never run on the full corpus.
  */
object DedupPack extends QueryPack {

  private val NumBands = 4
  /** LSH tables for d6 near-dup pair search (fewer than e4's query-time
    * 16: strong-pair recall is 0.93 already and candidate volume doubles
    * per table — see SimilarityPack.lshBuckets).
    */
  private val NeardupTables = 8
  /** Affine-permutation MinHash (h_i(x) = (a_i·x + b_i) mod P): ONE md5
    * per shingle, then NumBands cheap modular permutations folded into a
    * single aggregation — no row explosion, 4 map-side mins per doc.
    * P = 2^31-1 (prime); a_i·(h mod P) < 2^63 so arithmetic stays exact.
    */
  private val P = 2147483647L
  private val A = Seq(1299721L, 15485863L, 32452843L, 49979687L)

  /** d9 Bloom filter geometry: m bits (power of two ⇒ the bitmap is
    * m/64 longs), k probes per gram. At this corpus the bench set is
    * ~4k grams ⇒ load kn/m ≈ 0.2, per-gram false-positive rate
    * (1−e^(−kn/m))^k ≈ 0.5 % — production sizes m to the eval-gram
    * count the same way (m ≈ 10·kn keeps the rate sub-percent).
    */
  private[graft] val BloomM = 1 << 16
  private[graft] val BloomK = 3
  private val B = Seq(7L, 11L, 13L, 17L)

  /** (doc_id, band, minhash-sig) — the MinHash signature matrix. Shingle
    * construction + hashing run inside the compiled
    * [[graft.functions.ShingleHashes]] expression (the r1 HOF+md5
    * pipeline executed interpreted and dominated d2/d3); the only shuffle
    * is the per-doc partial-min aggregation, which carries NumBands longs
    * per doc regardless of document size.
    */
  private def signatures(s: SparkSession, dir: String): DataFrame =
    signaturesOf(Tables(s, dir, "documents"))

  /** The signature pipeline over any (doc_id, text) frame — batch OR a
    * streaming micro-batch (s14 maintains bucket claims incrementally
    * from exactly this computation; per-band min is an order-independent
    * fold, so signatures of a batch ARE the signatures of its docs).
    */
  private[graft] def signaturesOf(docs: DataFrame): DataFrame = {
    val sh = docs
      .where(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), explode(shingle_hashes(col("text"), 3)).as("hs"))
    val hm = col("hs") % P
    val mins = (0 until NumBands).map { i =>
      min((hm * A(i) + B(i)) % P).as(s"s$i")
    }
    val stackArgs = (0 until NumBands).map(i => s"$i, s$i").mkString(", ")
    sh.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .selectExpr("doc_id", s"stack($NumBands, $stackArgs) AS (band, minhash)")
  }

  /** Distinct LSH candidate pairs (doc_a < doc_b), unordered — shared by
    * d3 and d7. The signature matrix is materialized first: without it
    * Spark recomputes the whole shingle+hash pipeline for BOTH self-join
    * sides (measured ~2× at sf0.1). At any scale the matrix is tiny next
    * to the corpus — NumBands longs per doc. An EAGER localCheckpoint
    * rather than persist(): same reuse, but the blocks are owned by the
    * RDD (ContextCleaner frees them when the query's frames go out of
    * scope) instead of pinned forever in the session's CacheManager —
    * a long-lived driver running many queries must not accumulate one
    * leaked signature cache per call (round-6 advice).
    *
    * Fault-tolerance trade (applies to every localCheckpoint in this
    * file and its imitators — candidatePairs, d6, d11, d12, a29,
    * pipeline3): checkpointing TRUNCATES lineage and the blocks live
    * unreplicated on executors, so on a multi-executor cluster losing an
    * executor makes the checkpointed data unrecoverable — the query
    * fails and must be rerun, where persist() would have recomputed the
    * lost partitions from lineage. The right production dial: keep
    * localCheckpoint where rerunning the query is acceptable (these are
    * batch analytics, and the recompute-from-lineage path costs the same
    * work anyway), or switch to reliable `checkpoint()` on HDFS/object
    * storage — same API, durable blocks — where mid-query executor loss
    * must be survivable.
    *
    * Skew guard for 100 TB: a degenerate (band, minhash) bucket — near-
    * empty or boilerplate documents all sharing a signature — generates
    * df² candidate pairs from one bucket, and the SCALING.md measurement
    * proved it: uncapped, the candidate graph grew 101× for 10× docs
    * (repetitive/boilerplate documents keep their signatures under the
    * fixture scaler's word shuffle, so every replica lands in the same
    * bucket — exactly how template boilerplate behaves on the open web).
    * So the cap is ON, same policy as d13's fingerprint df cap: a bucket
    * claimed by more than [[MaxBandDf]] docs is boilerplate by definition
    * and is dropped BEFORE the self-join; its members still pair via
    * their other (discriminative) bands. The cap is replayed in every
    * pair-building oracle (the `sigk` CTE in [[shinglesCte]]), so
    * correctness stays hash-checked whatever the df distribution. Per-
    * bucket join work is bounded at MaxBandDf² — hot-key skew impossible
    * by construction; AQE skew splitting remains the runtime backstop
    * for the aggregation stages.
    */
  private[graft] def lshPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = signatures(s, dir).localCheckpoint(true)
    val shards = bandShardsOf(s, sig)
    if (shards <= 1) lshPairsOf(sig)
    else {
      // graft.dedup.bandShards (r14 verdict #4 — the §3f spill lever):
      // §3f measured the 50 M-doc d3 cell at the ONSET of the spill
      // regime (21.3 GB mem / 3.9 GB disk — the df aggregation and
      // bucket self-join over the whole 200 M-row signature matrix
      // recycle aggregation buffers) and that more shuffle partitions
      // are NOT the lever (sp=768 probe). This is the lever t23's
      // dfShards proved: BANDS PARTITION THE KEY SPACE, so the df agg +
      // capped self-join run per band-group, each pass over ~1/G of the
      // matrix, MATERIALIZED sequentially (eager localCheckpoint — the
      // next pass starts only after the previous released its scratch);
      // the union then needs one global distinct because the same doc
      // pair can emerge from bands in different groups. Output
      // identical to shards=1 BY CONSTRUCTION (per-bucket work never
      // crosses a band boundary) — spec-pinned value-equal. Default 1:
      // the re-scan trade (G passes over the checkpointed matrix) only
      // pays where the one-pass scratch exceeds the node budget.
      val parts = (0 until shards).map { g =>
        rawPairsOf(sig.where(pmod(col("band"), lit(shards)) === g))
          .localCheckpoint(true)
      }
      parts.reduce(_ union _).distinct()
    }
  }

  /** Shard-count selection (r15 verdict #2 — the knob, self-set from a
    * budget): an EXPLICIT `graft.dedup.bandShards` wins, unchanged (the
    * manual dial stays honored); otherwise a positive
    * `graft.dedup.scratchBudgetBytes` — the per-node scratch a deploy is
    * willing to spend on the one-pass df agg + capped self-join — picks
    * the SMALLEST shard count whose projected per-shard scratch fits:
    * shards = ⌈sigRows · [[ScratchBytesPerSigRow]] / budget⌉, clamped to
    * [1, NumBands] (band groups beyond NumBands are empty passes).
    * Neither conf set → 1, today's default. The count feeding the model
    * is over the already-checkpointed signature matrix (NumBands rows
    * per doc — one cheap scan of narrow pinned blocks), taken only on
    * the auto path.
    */
  private[graft] def bandShardsOf(s: SparkSession, sig: DataFrame): Int =
    s.conf.getOption("graft.dedup.bandShards").map(_.toInt).getOrElse {
      s.conf.getOption("graft.dedup.scratchBudgetBytes").map(_.toLong)
        .filter(_ > 0) match {
        case Some(budget) =>
          val rows = sig.count()
          val base = scratchBytesPerRow(s, sig)
          val prior = autoBandShards(rows, budget, base)
          // Runtime spill probe (r17 verdict next-#1): the prior's
          // spill-to-width ratio is the §3f fixture family's — a corpus
          // with much heavier band-collision rates recycles aggregation
          // buffers harder and would under-shard in exactly the
          // direction the budget exists to prevent. The probe runs ONLY
          // when its evidence could move the pick: an explicit per-row
          // conf is absolute, `graft.dedup.scratchProbe=false` opts
          // out, and a prior already at the NumBands clamp cannot shard
          // further (so at e.g. x10000m, where the prior already picks
          // the max, the probe costs nothing).
          val confSet = s.conf
            .getOption("graft.dedup.scratchBytesPerSigRow").exists(_.toLong > 0)
          val probeOff =
            s.conf.getOption("graft.dedup.scratchProbe").contains("false")
          val perRow =
            if (confSet || probeOff || prior >= NumBands) base
            else derivedScratchPerRow(base, probedSpillPerRow(s, sig))
          val n = autoBandShards(rows, budget, perRow)
          System.err.println(
            s"[dedup] bandShards auto-selected $n (sig rows $rows, " +
              s"$perRow B/row, scratch budget $budget B)")
          n
        case None => 1
      }
    }

  /** The selection rule itself, pure (spec-pinned at the §3f-addendum
    * measured points): smallest shard count whose projected one-pass
    * scratch per shard fits the budget.
    */
  private[graft] def autoBandShards(nSigRows: Long, budgetBytes: Long,
      perRowBytes: Long = ScratchBytesPerSigRow): Int = {
    val need = nSigRows * perRowBytes
    // clamp in LONG before narrowing: a huge need/budget ratio (tiny
    // typo'd budget on a big matrix) overflowed the Int cast and wrapped
    // NEGATIVE, auto-picking 1 shard — fully unsharded under the tiniest
    // stated budget, the opposite of the lever's job (review finding)
    val raw = (need + budgetBytes - 1) / budgetBytes
    math.min(NumBands.toLong, math.max(1L, raw)).toInt
  }

  /** Per-row scratch PRIOR for the auto-shard model, derived FROM THE
    * MATRIX ITSELF (r16 verdict next-#3 — the r16 form hard-coded the
    * fixture family's 112 B, which silently miscalibrates on a corpus
    * whose signature rows are wider, e.g. a string/binary minhash or
    * extra carried columns): scratch/row = [[ScratchMultiplier]] ×
    * [[sampledSigRowBytes]] (the matrix's own sampled in-memory row
    * width). On THIS engine's (long doc_id, int band, long minhash)
    * schema the sampled width is 28 B, so the derivation reproduces the
    * §3f-measured 112 B exactly — every committed auto-pick cell stays
    * valid, and a wider matrix now scales the model instead of
    * overflowing the budget silently. An explicit
    * `graft.dedup.scratchBytesPerSigRow` conf wins (the manual
    * calibration stays available); a degenerate/empty sample falls back
    * to the measured constant. Since r18 this is the PRIOR that
    * [[derivedScratchPerRow]] floors with — [[bandShardsOf]] raises it
    * by runtime spill evidence when that could change the pick.
    */
  private[graft] def scratchBytesPerRow(s: SparkSession, sig: DataFrame,
      fraction: Double = 0.05): Long =
    s.conf.getOption("graft.dedup.scratchBytesPerSigRow").map(_.toLong)
      .filter(_ > 0).getOrElse {
        val w = sampledSigRowBytes(sig, fraction)
        if (w <= 0) ScratchBytesPerSigRow else ScratchMultiplier * w
      }

  /** The r18 derivation arithmetic, pure (spec-pinned): the fixture
    * prior floors, the corpus's own observed spill raises. Max, not
    * replace — spill demand grows superlinearly in rows-per-pass (§3f
    * measured 63 B/row at 60 M rows vs 105-125 B at 200 M), so the
    * max-sharded probe regime LOWER-BOUNDS the unsharded ratio: evidence
    * can only make the model more conservative (more shards), never let
    * a spill-free probe talk it below the measured prior, and
    * over-sharding is the cheap direction (§3f: x3000m shards=2 and
    * shards=4 within noise of each other, both 1.7× faster than
    * unsharded). probed ≤ 0 (no spill at probe scale, probe skipped,
    * empty slice) keeps the prior — "fixture fallback on no evidence".
    */
  private[graft] def derivedScratchPerRow(priorPerRowBytes: Long,
      probedPerRowBytes: Long): Long =
    math.max(priorPerRowBytes, probedPerRowBytes)

  /** Observed (memory+disk) spill bytes per signature row, measured by
    * RUNNING one band group of the real pair-building workload at
    * maximum sharding (pmod(band, NumBands) == 0 — the exact slice a
    * shards=NumBands pass executes) under a TaskMetrics listener. This
    * is the cheapest slice of real work that reproduces the corpus's own
    * bucket-collision dynamics; its cost is ~1/NumBands of one pass,
    * paid only on the auto path where the full job is about to run
    * anyway. Returns 0 when the slice is empty or nothing spilled.
    *
    * Attribution is JOB-SCOPED, not session-wide: the probe's actions
    * run under a unique job group, the listener learns which stages
    * belong to that group from each job-start event's properties, and
    * only task-end events from those stages are counted — a CONCURRENT
    * job's spill during the probe (a multi-tenant driver) cannot
    * inflate the reading. The caller's own job group / description /
    * interrupt-on-cancel local properties are SAVED AND RESTORED, not
    * cleared (review finding: clearJobGroup would have dropped the
    * tenant's cancellation scope for the hours-long main passes that
    * follow). The residual race (a task-end delivered before its
    * job-start) only under-counts, which degrades toward the fixture
    * prior — never past it.
    *
    * The probe is OPTIONAL EVIDENCE, so it must never fail the query it
    * serves (review finding — same contract as the HttpServe TTL
    * derivation probe): any non-fatal failure inside it logs and
    * returns 0, i.e. the fixture prior carries the pick exactly as if
    * the probe had been skipped.
    */
  private[graft] def probedSpillPerRow(s: SparkSession, sig: DataFrame): Long = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
    // the probe replays the real pair-building workload, so it needs the
    // real signature schema; anything else (a caller modeling shard
    // counts over a synthetic frame) is "no evidence", not an error
    if (!Seq("doc_id", "band", "minhash").forall(sig.columns.contains))
      return 0L
    val sc = s.sparkContext
    val slice = sig.where(pmod(col("band"), lit(NumBands)) === 0)
    val group = s"graft-scratch-probe-${java.util.UUID.randomUUID()}"
    val spill = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val ours = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = js.properties
        if (p != null && group == p.getProperty("spark.jobGroup.id"))
          js.stageIds.foreach(id => ours.add(id))
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null && ours.contains(te.stageId)) {
          spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          tasks.incrementAndGet()
        }
      }
    }
    val groupKeys =
      Seq("spark.jobGroup.id", "spark.job.description",
        "spark.job.interruptOnCancel")
    try {
      sc.addSparkListener(listener)
      val saved = groupKeys.map(k => k -> sc.getLocalProperty(k))
      sc.setJobGroup(group,
        "dedup scratch probe (one band group at max sharding)")
      val rows =
        try {
          val n = slice.count()
          if (n > 0) rawPairsOf(slice).count()
          n
        } finally {
          // restore the CALLER's group (setLocalProperty(k, null) is
          // Spark's documented removal form, so a caller with no group
          // gets none back)
          saved.foreach { case (k, v) => sc.setLocalProperty(k, v) }
          // listener delivery is async: poll until the task counter
          // stops moving (200 ms quiet, 2 s cap) — the
          // Bench.MetricsListener settle discipline; a late task only
          // under-counts spill, degrading toward the fixture prior
          val deadline = System.nanoTime() + 2000000000L
          var last = -1L
          while (System.nanoTime() < deadline && tasks.get() != last) {
            last = tasks.get()
            Thread.sleep(200)
          }
        }
      if (rows <= 0) 0L
      else {
        val perRow = spill.get() / rows
        System.err.println(
          s"[dedup] scratch probe: ${spill.get()} spill B over $rows sig " +
            s"rows (1 of $NumBands band groups) -> $perRow B/row observed")
        perRow
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[dedup] scratch probe failed (${e.getMessage}); the fixture " +
            "prior carries the pick")
        0L
    } finally sc.removeSparkListener(listener)
  }

  /** The matrix's own average row footprint (bytes), over a bounded
    * sample: 8 B UnsafeRow header + fixed-width fields at their
    * in-memory width + variable-width fields (string/binary) at their
    * sampled lengths plus an 8 B offset/length word — the standard
    * Tungsten row layout, which is also what the aggregation hash maps
    * and shuffle buffers hold. One cheap scan of a FRACTION of the
    * already-pinned narrow matrix (the auto path only), seeded for
    * replay stability. Strings are sized with octet_length — UTF-8
    * BYTES, what UnsafeRow stores — not length()'s character count
    * (r17 ADVICE: on a non-ASCII corpus the character count undercounts
    * the row width, which is exactly the silent under-sharding class
    * this derivation exists to eliminate); length() is already
    * byte-accurate for binary.
    */
  private[graft] def sampledSigRowBytes(sig: DataFrame,
      fraction: Double = 0.05): Long = {
    import org.apache.spark.sql.types.{BinaryType, StringType}
    val width = sig.schema.fields.map { f =>
      f.dataType match {
        case StringType =>
          coalesce(octet_length(col(f.name)).cast("long"), lit(0L)) + lit(8L)
        case BinaryType =>
          coalesce(length(col(f.name)).cast("long"), lit(0L)) + lit(8L)
        case dt => lit(dt.defaultSize.toLong)
      }
    }.reduce(_ + _) + lit(8L)
    val r = sig.sample(fraction, 17L).agg(avg(width)).head()
    if (r.isNullAt(0)) 0L else math.ceil(r.getDouble(0)).toLong
  }

  /** Scratch-to-row-width multiplier, MEASURED not guessed (the §3f
    * calibration restated as a ratio): §3f-addendum's shards=1 spill
    * cells read ~63 B/sig-row at 60 M rows (x3000m: 4.1 GB over 15 M
    * docs × 4 bands) and ~105-125 B/sig-row at 200 M rows (x10000m:
    * 21.1 GB mem + 3.9 GB disk over 50 M docs × 4 — the df aggregation
    * and bucket self-join recycle buffers superlinearly at the onset).
    * 112 B — 4× the 28 B row — is the 50 M-doc regime's figure,
    * deliberately conservative at smaller scale where the measured curve
    * says over-sharding is free or better (x3000m shards=2 and shards=4
    * both ~44 s vs 76 s unsharded). With a 4 GB budget the derived
    * model lands on the measured optima: x3000m → 2 (spill eliminated,
    * 1.7× faster), x10000m → 4 (clamped; ~9× less scratch for +24 %
    * wall). Since r18 this is the PRIOR/FLOOR of the derivation, not its
    * whole ratio term: [[probedSpillPerRow]]'s runtime evidence raises
    * it per corpus (see [[derivedScratchPerRow]]).
    */
  private[operators] val ScratchMultiplier = 4L

  /** The §3f fixture-family figure (4 × the 28 B signature row) — now
    * the FALLBACK when the sampled derivation has no evidence (empty
    * matrix) and the default of [[autoBandShards]]'s pure form.
    */
  private[operators] val ScratchBytesPerSigRow = 112L

  /** [[lshPairs]] over an already-materialized signature matrix (d11
    * shares its matrix between candidate generation and the agreement
    * count, so signatures are computed exactly once).
    */
  /** Signatures surviving the boilerplate df cap — the ONE definition of
    * the cap policy (lshPairsOf for intra-corpus pairs, d15 for the
    * cross-corpus join; d11 once drifted on an inline copy). The df
    * filter joins on (band, minhash): co-partitioned with the
    * aggregation that produced it — never a broadcast of a corpus-
    * growing table.
    */
  private def cappedSignatures(sig: DataFrame): DataFrame =
    sig.join(
      sig.groupBy("band", "minhash").agg(count(lit(1)).as("df"))
        .where(col("df") <= MaxBandDf)
        .select("band", "minhash"), Seq("band", "minhash"))

  private def lshPairsOf(sig: DataFrame): DataFrame =
    rawPairsOf(sig).distinct()

  /** The capped bucket self-join WITHOUT the terminal distinct — the
    * band-sharded path dedups once globally across its shard union.
    */
  private def rawPairsOf(sig: DataFrame): DataFrame = {
    val keep = cappedSignatures(sig)
    val a = keep.select(col("band"), col("minhash"), col("doc_id").as("doc_a"))
    val b = keep.select(col("band"), col("minhash"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "minhash"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
  }

  /** LSH bucket df cap (see [[lshPairs]]): sized to the largest
    * legitimate template family a curator wants fully linked (the bench
    * corpus's densest real cluster claims 21 docs in one bucket;
    * production sizes it the same way). Everything larger is boilerplate
    * whose all-pairs linkage carries no information d7's components
    * don't already get from the capped buckets.
    */
  private[operators] val MaxBandDf = 24

  /** The LSH candidate graph, MATERIALIZED on the given session — so the
    * corpus-sized build (signature aggregation + banded self-join) runs
    * at this session's shuffle width, regardless of what width the
    * caller iterates at afterwards (g1 hands the result to a width-4
    * child; WidthSplitSpec pins that the build itself honors the
    * caller). Eager localCheckpoint: reused without recompute, blocks
    * GC-owned rather than CacheManager-pinned.
    */
  private[graft] def candidatePairs(s: SparkSession, dir: String): DataFrame =
    lshPairs(s, dir).localCheckpoint(true)

  /** Edge-count bound for the single-task union-find path: 4M edges is
    * ~64 MB of packed longs in one task — far below executor memory, far
    * above any plausible candidate graph for corpora that fit this bench.
    * Operational knob `graft.components.maxUnionFindEdges` overrides it
    * (smaller executors lower it; the scaling-curve bench sets 0 to
    * drive the at-scale propagation path on real data — see SCALING.md).
    */
  private val UnionFindMaxEdges = 4L << 20
  private def unionFindMaxEdges(s: SparkSession): Long =
    s.conf.getOption("graft.components.maxUnionFindEdges")
      .map(_.toLong).getOrElse(UnionFindMaxEdges)

  /** Connected-component labels over the LSH near-dup graph,
    * size-adaptive (single-task union-find under [[UnionFindMaxEdges]]
    * edges, iterative label propagation above) — the shared first stage
    * of d7 / d10 / x7. Returns (doc_id, label) for docs that appear in
    * any candidate pair; callers left-join and coalesce to doc_id.
    */
  private[graft] def clusterLabels(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val pairs = lshPairs(s, dir).persist(StorageLevel.MEMORY_AND_DISK)
    val labels =
      if (pairs.count() <= unionFindMaxEdges(s)) unionFindComponents(s, pairs)
      else propagateComponents(s, pairs)
    pairs.unpersist()
    labels
  }

  /** Bounded-graph components: ship the (narrow) edge list to ONE
    * executor task and run union-find with path compression, always
    * attaching the larger root under the smaller — so each tree's root
    * IS the least doc_id of its component, no second pass needed.
    */
  private[graft] def unionFindComponents(s: SparkSession, pairs: DataFrame): DataFrame = {
    import s.implicits._
    pairs.select(col("doc_a"), col("doc_b")).as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        val nodes = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) { parent(a) = a; nodes += a }
          if (!parent.contains(b)) { parent(b) = b; nodes += b }
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        nodes.iterator.map(n => (n, find(n)))
      }
      .toDF("doc_id", "label")
      .localCheckpoint(true)
  }

  /** Unbounded-graph components: iterative min-label propagation entirely
    * in DataFrame ops — each round propagates labels across edges AND
    * shortcuts pointer chains (label[label[v]]), so convergence is
    * O(log n) rounds, not O(component diameter).
    *
    * Iteration mechanics, each one load-bearing (measured at sf0.01):
    *   - `localCheckpoint` per round truncates the logical plan — the
    *     naive nested plan makes Catalyst re-analysis grow
    *     super-linearly (minutes by round ~30). Lazy checkpoint: the
    *     changed-count is the materializing action, one job per round.
    *   - the label frame is the candidate-graph NODE SET; while it fits
    *     a broadcast it is hinted into the joins and coalesced to 1
    *     partition (rounds cost ~0.35 s of fixed planning overhead,
    *     nothing else). The fit decision SELF-SELECTS per call (r16 —
    *     the same discipline as trainFrameWidth/scratchBudgetBytes: the
    *     at-scale form must not live in a comment): nodes ≤
    *     [[BroadcastNodeLimit]] (8 M rows ≈ 128 MB of packed id/label
    *     pairs, safely inside executor broadcast memory at any plausible
    *     heap) → broadcast + single-partition labels; above it the
    *     IDENTICAL loop runs shuffle joins at session width — same
    *     exact min-label algebra, so the labels are value-identical by
    *     construction (spec-pinned). `graft.components
    *     .broadcastNodeLimit` overrides (0 forces the shuffle path —
    *     the scaling capture's lever). The node count is one count()
    *     over the just-checkpointed seed frame.
    *   - never nest propagation rounds without a checkpoint between:
    *     the self-referencing pointer join doubles plan references per
    *     nesting level (measured 10× slower at depth 3).
    */
  private[graft] def propagateComponents(s: SparkSession, pairs: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
      .localCheckpoint(true)
    val nodeLimit = s.conf.getOption("graft.components.broadcastNodeLimit")
      .map(_.toLong).getOrElse(BroadcastNodeLimit)
    val small = labels.count() <= nodeLimit
    def hinted(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    def shaped(df: DataFrame): DataFrame = if (small) df.coalesce(1) else df
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 64) {
      val viaNbr = edges
        .join(hinted(labels.select(col("doc_id").as("dst"), col("label"))), "dst")
        .select(col("src").as("doc_id"), col("label"))
      val viaPtr = labels.select(col("doc_id"), col("label").as("ptr"))
        .join(hinted(labels.select(col("doc_id").as("ptr"), col("label"))), "ptr")
        .select(col("doc_id"), col("label"))
      val next = shaped(
        labels.unionAll(viaNbr).unionAll(viaPtr)
          .groupBy("doc_id").agg(min(col("label")).as("label")))
        .localCheckpoint(false)
      changed = next
        .join(hinted(labels.select(col("doc_id"), col("label").as("old"))), "doc_id")
        .where(col("label") < col("old")).count()
      labels = next
      rounds += 1
    }
    edges.unpersist()
    labels
  }

  /** Node-set size up to which the propagation loop broadcasts its label
    * frame (≈ 128 MB of packed (id, label) pairs at 8 M rows — inside
    * any plausible executor broadcast budget); beyond it the identical
    * loop runs shuffle joins. Override: `graft.components
    * .broadcastNodeLimit` (0 forces the shuffle path).
    */
  private[operators] val BroadcastNodeLimit = 8L << 20

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // d1: exact dedup — hash-groupBy on content fingerprint, keep the
    // smallest doc_id per group. One shuffle on the 128-bit hash.
    "d1_dedup_exact" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id")),

    // d2: MinHash signatures (4 bands, word-3-gram shingles). Hashes are
    // md5-prefix so the DuckDB oracle reproduces them bit-for-bit.
    "d2_minhash_signatures" -> ((s, dir) =>
      signatures(s, dir).orderBy("doc_id", "band")),

    // d3: LSH candidate pairs — docs sharing any band signature. The
    // self-join keys on (band, minhash): only same-bucket docs pair.
    "d3_lsh_pairs" -> ((s, dir) =>
      lshPairs(s, dir).orderBy("doc_a", "doc_b")),

    // d15: CROSS-CORPUS (incremental) dedup — the production shape d1-d7
    // don't cover: a NEW batch (here sources src10+) deduped AGAINST the
    // already-ingested reference corpus (src0-src9), the "dedup this
    // crawl snapshot against everything we already have" step that runs
    // on every ingest. Same capped LSH machinery as d3 (one signature
    // matrix over both sides, boilerplate df cap applied to the COMBINED
    // claims — a bucket boilerplate across corpora is boilerplate), but
    // the bucket join is new-side × ref-side instead of a self-join, and
    // the output is a per-new-doc DECISION RECORD (partner count, best
    // band agreement, is_dup at ≥ 2 of 4 bands ⇒ est. Jaccard ≥ 0.5 by
    // d11's estimator) — every new doc gets a row, so the ingest
    // pipeline can act on hits and audit misses. At scale the reference
    // side is the PRE-COMPUTED signature store (NumBands longs per doc,
    // the thing s14 maintains incrementally); the join is bucket-keyed
    // with per-bucket work bounded at df² by the cap, and no stage ever
    // touches reference document text — only its signatures.
    "d15_cross_dedup" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      // try_cast + coalesce: an unknown catalog name classifies as the
      // REFERENCE side (the conservative read for a decontamination
      // split — unknowns are checked against, never treated as fresh);
      // the oracle states the same TRY_CAST + COALESCE, so the split is
      // total on both engines instead of an ANSI cast failure.
      val side = docs.select(col("doc_id"),
        (expr("coalesce(try_cast(substring(source, 4) AS INT), 0)") >= 10)
          .as("is_new"))
      val sig = signatures(s, dir).localCheckpoint(true)
      // the SHARED cap policy (cappedSignatures) — never an inline copy
      val keep = cappedSignatures(sig).join(side, "doc_id")
      val ns = keep.where(col("is_new"))
        .select(col("band"), col("minhash"), col("doc_id"))
      val rs = keep.where(!col("is_new"))
        .select(col("band"), col("minhash"), col("doc_id").as("ref_id"))
      val hits = ns.join(rs, Seq("band", "minhash"))
        .groupBy(col("doc_id"), col("ref_id"))
        .agg(count(lit(1)).as("shared"))
      val agg = hits.groupBy("doc_id")
        .agg(count(lit(1)).as("n_ref_partners"), max(col("shared")).as("best_shared"))
      side.where(col("is_new"))
        .select(col("doc_id"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_ref_partners"), lit(0L)).as("n_ref_partners"),
          coalesce(col("best_shared"), lit(0L)).as("best_shared"),
          (coalesce(col("best_shared"), lit(0L)) >= 2).cast("int").as("is_dup"))
        .orderBy("doc_id")
    }),

    // d11: signature-based Jaccard ESTIMATION for the LSH candidate pairs —
    // the scale path between candidate generation (d3) and exact
    // verification (d4): est = (matching minhashes)/NumBands is the
    // standard unbiased MinHash estimator, computed from the tiny
    // signature matrix alone — the documents are never re-read, so the
    // verification pass costs O(pairs · NumBands), not O(pairs · doc
    // length) like exact Jaccard. The ratio is one IEEE division of an
    // integer agreement count. Joins are all on the narrow sig frame
    // (NumBands longs per doc), materialized once (eager checkpoint —
    // GC-owned blocks, see lshPairs).
    "d11_minhash_estimate" -> ((s, dir) => {
      val sig = signatures(s, dir).localCheckpoint(true)
      // the capped candidate builder (lshPairsOf) — NOT a private
      // re-derivation: an uncapped inline copy here once grew 5.3× per
      // 3× data at x30 while d3 stayed sub-linear (SCALING.md)
      val cand = lshPairsOf(sig)
      val x = sig.select(col("doc_id").as("doc_a"), col("band"),
        col("minhash").as("ma"))
      val y = sig.select(col("doc_id").as("doc_b"), col("band"),
        col("minhash").as("mb"))
      cand.join(x, "doc_a")
        .join(y, Seq("doc_b", "band"))
        .where(col("ma") === col("mb"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_agree"))
        .select(col("doc_a"), col("doc_b"), col("n_agree"),
          (col("n_agree").cast("double") / lit(NumBands).cast("double"))
            .as("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    }),

    // d7: dedup cluster assignment — the final stage of the pipeline:
    // connected components over the LSH candidate pairs, keep the lowest
    // doc_id per cluster. The graph is the CANDIDATE set — only docs with
    // an LSH collision, orders smaller than the corpus — so labeling is
    // size-adaptive on the known (persisted) edge count:
    //   - bounded (≤ UnionFindMaxEdges): one executor task runs
    //     union-find with path compression and union-by-min — O(E·α(E)),
    //     a single narrow shuffle of 2-long rows, zero iteration. NOT a
    //     driver collect; the graph never leaves the executors.
    //   - unbounded: iterative min-label propagation with pointer
    //     jumping, O(log n) rounds (see propagateComponents).
    // Oracle: the same components via a DuckDB recursive closure.
    "d7_dedup_clusters" -> ((s, dir) => {
      val labels = clusterLabels(s, dir)
      Tables(s, dir, "documents").select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("label"), col("doc_id")).as("keep_id"),
          (coalesce(col("label"), col("doc_id")) === col("doc_id"))
            .cast("int").as("is_kept"))
        .orderBy("doc_id")
    }),

    // d10: cluster-level dedup that keeps the BEST document per near-dup
    // cluster — the production form of d7's min-id convention: real
    // pipelines keep the longest/highest-quality member (here: most
    // tokens, ties to the lower doc_id) and drop the rest. The per-cluster
    // argmax is an aggregate (max_by over a (n_tokens, -doc_id) struct),
    // NOT a window: partial aggregation collapses each cluster map-side,
    // so a pathological mega-cluster costs one row per map task, where a
    // row_number window would sort the whole cluster in one task. The
    // join back on cluster is AQE-skew-splittable.
    "d10_cluster_keep_best" -> ((s, dir) => {
      val labels = clusterLabels(s, dir)
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("label"), col("doc_id")).as("cluster"))
      val best = scored.groupBy("cluster")
        .agg(
          max_by(col("doc_id"), struct(col("n_tokens"), (-col("doc_id")).as("neg")))
            .as("keep_id"),
          count(lit(1)).as("cluster_size"))
      scored.join(best, "cluster")
        .select(col("doc_id"), col("cluster"), col("n_tokens"),
          (col("doc_id") === col("keep_id")).cast("int").as("is_kept"),
          col("cluster_size"))
        .orderBy("doc_id")
    }),

    // d4: exact n-gram Jaccard on a bounded sample (doc_id < 150) — the
    // verification stage of the LSH pipeline. Inverted-index join on
    // shingle, never all-pairs on full data.
    "d4_ngram_jaccard" -> ((s, dir) => {
      val sh = Tables(s, dir, "documents")
        .where(col("doc_id") < 150 && size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), explode(wordShinglesOf(col("toks"), 3)).as("sh"))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = sh.as("x").join(sh.as("y"), col("x.sh") === col("y.sh") &&
          col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_both"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (col("n_both").cast("double") / (col("na") + col("nb") - col("n_both"))).as("jaccard"))
        .where(col("jaccard") >= 0.05)
        .orderBy("doc_a", "doc_b")
    }),

    // d8: benchmark decontamination — flag corpus documents sharing any
    // word n-gram with a held-out benchmark/eval set (here: doc_id % 97,
    // a deterministic stand-in for an external eval suite). Grams travel
    // as 64-bit polynomial hashes from the compiled
    // [[graft.functions.ShingleHashes]] expression (the gram-string HOF
    // pipeline ran interpreted: 3.6 s at sf0.1 vs ~1 s hashed), and the
    // benchmark gram set is tiny at ANY corpus scale (eval suites are
    // megabytes), so the join is a broadcast hash join: the corpus side
    // streams through map tasks, no shuffle of corpus grams ever
    // happens — the same architecture GPT-3/Llama-style n-gram
    // decontamination runs at 100 TB. (This synthetic corpus needs w=3
    // for non-trivial overlap; real pipelines use w=8..13 — same
    // dataflow.)
    "d8_decontaminate" -> ((s, dir) => {
      val grams = Tables(s, dir, "documents")
        .where(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), explode(shingle_hashes(col("text"), 3)).as("g"))
      val bench = grams.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("bench_id"), col("g"))
      grams.where(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(countDistinct(col("g")).as("n_shared"),
          countDistinct(col("bench_id")).as("n_bench_docs"))
        .orderBy("doc_id")
    }),

    // d9: Bloom-filter decontamination — d8's scale escape hatch for when
    // the eval-gram set outgrows a broadcast join build side (pretraining
    // pipelines decontaminate against MANY benchmarks plus their
    // paraphrases; the union can reach billions of grams). The eval set
    // compresses to a FIXED m-bit bitmap (m is config, here 2^16 = 8 KB;
    // production 2^30+ bits is still just 128 MB broadcast — size-
    // INDEPENDENT of eval-set growth), each corpus gram probes k=3
    // positions via Kirsch-Mitzenmacher double hashing in the compiled
    // [[graft.functions.BloomHits]] kernel, and a doc is flagged when any
    // gram passes. One corpus-side map pass, zero shuffles of corpus
    // grams, no join at all — strictly cheaper than d8's broadcast join
    // at any scale. False positives are the documented trade (ON PURPOSE
    // in the output: n_bloom_hits ≥ d8's exact n_shared, and docs can
    // appear that d8 never flags — in decontamination a false positive
    // only discards a good document, never leaks an eval answer, so the
    // filter errs the safe way); every position and bit test is 64-bit
    // integer arithmetic, so the DuckDB oracle replays the bitmap and
    // probes exactly and the output — false positives included — is
    // hash-checked like an exact operator. The bitmap build is a bounded
    // driver pull (≤ m/64 longs, config-sized — the e5/IvfIndex
    // pretrained-artifact residency), in production a one-time artifact
    // shipped like the eval suites themselves.
    "d9_bloom_decontaminate" -> ((s, dir) =>
      bloomHitCounts(s, dir).orderBy("doc_id")),

    // d5: SimHash — 16-bit signature from per-bit majorities of token
    // hashes. Bit-twiddling kept cross-engine (md5-prefix hash, shift/and).
    "d5_simhash" -> ((s, dir) => {
      val words = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
        .withColumn("h", md5Prefix16(col("w")))
      val bitSums = (0 until 16).map { j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j")
      }
      val sig = (0 until 16).map { j =>
        when(col(s"s$j") > 0, 1 << j).otherwise(0)
      }.reduce(_ + _)
      words.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"), sig.as("simhash16"))
        .orderBy("doc_id")
    }),

    // d6: embedding-cosine near-dup pairs — the 100 TB path: multi-table
    // random-hyperplane LSH buckets (SimilarityPack), equi-self-join on
    // (table, bucket) so ONLY same-bucket vectors are scored, exact
    // cosine + threshold on the candidates. The plan is hash-join + agg —
    // no nested-loop, no all-pairs. Deterministic hyperplanes make the
    // bucketing reproducible, so the DuckDB oracle replays it exactly
    // (plane constants embedded in the SQL) and the result is
    // hash-checked like any exact operator. Misses (pairs separated by
    // every table) are the documented approximation; d6b brute-verifies
    // a bounded sample and RecallSpec gates the miss rate.
    "d6_embed_neardup" -> ((s, dir) => {
      // fanIfSerial (r18 §10): the fixture's single-split scan made the
      // pinned LSH frame ONE partition (plan showed UnknownPartitioning(0)
      // with 1 task), so the bucket-code pass, the pin write, and every
      // downstream exchange read serially; no-op on multi-split inputs.
      val sig = SimilarityPack
        .lshBuckets(s, Tables.fanIfSerial(Tables(s, dir, "embeddings")),
          NeardupTables)
        .localCheckpoint(true) // eager: GC-owned blocks, see lshPairs

      val a = sig.select(col("table"), col("bucket"),
        col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val b = sig.select(col("table"), col("bucket"),
        col("vec_id").as("vec_b"), col("embedding").as("eb"))
      // Score→filter→dedup, in that order: a pair colliding in m tables
      // is scored m (≤ NeardupTables) times — redundant compiled flops —
      // but the dedup shuffle then carries only the pairs ABOVE the
      // threshold (3 narrow columns), not millions of candidates dragging
      // two 64-float embeddings each. Dedup-first measured 24 s at sf0.1;
      // this shape runs in ~2 s. At 100 TB the trade is even more lopsided:
      // recomputing a dot product is always cheaper than shuffling wide rows.
      // eval_once (r18 §10, guide §4.4): unbarriered, the threshold
      // filter was cloned into the join condition while the projection
      // kept its own copy — every ABOVE-threshold pair paid the cosine
      // twice. The barrier pins one evaluation per candidate; candidates
      // below threshold cost exactly what they did before.
      a.join(b, Seq("table", "bucket"))
        .where(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          graft.functions.eval_once(
            round(cosine_similarity(col("ea"), col("eb")), 6)).as("cos_sim"))
        .where(col("cos_sim") >= 0.35)
        .dropDuplicates("vec_a", "vec_b")
        .orderBy("vec_a", "vec_b")
    }),

    // d6b: brute-force near-dup on a bounded sample (vec_id < 500, an
    // absolute bound independent of corpus size) — the exact verifier for
    // d6's LSH path, same role d4 plays for d3. All-pairs is ONLY legal
    // under a hard bound like this.
    "d6b_neardup_brute" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings").where(col("vec_id") < 500)
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          // eval_once: same §4.4 clone as d6 — see the d6 note
          graft.functions.eval_once(
            round(cosine_similarity(col("ea"), col("eb")), 6)).as("cos_sim"))
        .where(col("cos_sim") >= 0.35)
        .orderBy("vec_a", "vec_b")
    }),

    // d12: SemDeDup-style semantic deduplication — cluster the corpus
    // with the pretrained IVF coarse quantizer, then drop every vector
    // that has a more-senior (lower-id) near-duplicate (cosine >= τ) in
    // ITS OWN cluster. Clustering is what makes semantic dedup tractable:
    // pairwise scoring is confined to within-cluster pairs, O(Σ cᵢ²)
    // instead of O(n²), and at 100 TB the knob is k — enough centroids
    // that clusters stay bounded (SemDeDup runs k≈√n; our k=16 fits the
    // test corpus). Same score→filter→dedup ordering as d6: the dedup
    // shuffle carries only above-threshold ids, never embeddings, and
    // the final keep-filter is a broadcast anti-join (the dropped set is
    // small by construction). Deterministic end-to-end: the oracle
    // replays assignment from the same centroid constants (e5's
    // machinery) and the same rounded-cosine threshold.
    "d12_semdedup" -> ((s, dir) => {
      val asg = semAssign(s, dir)
        .localCheckpoint(true) // eager: GC-owned blocks, see lshPairs
      asg.join(semDropped(asg), Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("cid"))
        .orderBy("vec_id")
    }),

    // d13: span-level near-dup candidates from winnowed fingerprints —
    // the MOSS/plagiarism-detection shape, and what winnowing (t5) exists
    // for: two docs sharing ≥ MinSharedFps selected k-gram windows share
    // substantial verbatim spans, a different signal from d3's
    // whole-document MinHash resemblance. The document-frequency cap does
    // double duty at scale: it removes boilerplate fingerprints (the ones
    // that match everything) AND bounds the pair join's per-bucket work —
    // a fingerprint with df docs generates df² pairs, so df ≤ MaxFpDf
    // caps the worst bucket at MaxFpDf², making hot-key skew impossible
    // by construction rather than mitigated after the fact.
    // g1: PageRank over the near-dup candidate graph — graph analytics
    // beyond labeling (d7): rank = which documents sit at the center of
    // duplication clusters (template/boilerplate hubs worth human review).
    // All arithmetic is FIXED-POINT INTEGER (rank scaled by 1e6, damping
    // 0.85 as ·850 div 1000·deg): integer sums are exact and
    // order-independent, so the result is identical at any partitioning
    // AND across engines — the trick that makes an iterative numeric
    // algorithm hash-checkable. Five unrolled iterations; each is one
    // src-shuffle join + one dst-aggregation on the CANDIDATE graph
    // (orders smaller than the corpus), the same per-round shape as d7's
    // label propagation. Every node has deg ≥ 1 by construction, so
    // there is no dangling mass.
    "g1_pagerank" -> ((s0, dir) => {
      import org.apache.spark.storage.StorageLevel
      // TWO stages, TWO widths — the production split: the candidate-
      // graph BUILD (signature aggregation + banded self-join) is the
      // corpus-sized step, so it runs on the CALLER's session at its
      // full shuffle width and is materialized eagerly (candidatePairs;
      // WidthSplitSpec pins the width). Only THEN does a narrow child
      // session take over: the iteration touches a few-hundred-row
      // graph, where 32-partition shuffles × (2 stages × 5 iterations)
      // are pure task-scheduling overhead — measured 4.1 s at 32
      // partitions vs 2.5 s at 4 for the iteration. Re-rooting the
      // materialized RDD in the child costs one row conversion, never a
      // recompute.
      val pairsWide = candidatePairs(s0, dir)
      val s = s0.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val pairs = s.createDataFrame(pairsWide.rdd, pairsWide.schema)
      // The edge list is pre-joined with the degree column ONCE: the
      // iteration then touches a single cached narrow frame per round
      // instead of re-joining deg. rank is localCheckpoint'd each round —
      // the naive nested plan multiplies the analyzed tree ~3× per
      // iteration (measured 4.4 s at sf0.1; 1.3 s with truncation), the
      // same lesson as propagateComponents.
      val half = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      val edges = half.unionAll(
        half.select(col("dst").as("src"), col("src").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val edgesDeg = edges.join(deg, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nodes = edgesDeg.select(col("src").as("node")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      var rank = nodes.withColumn("r", lit(1000000L))
      for (_ <- 1 to PageRankIters) {
        val contrib = edgesDeg.join(rank, col("node") === col("src"))
          .select(col("dst").as("node"),
            expr("(r * 850) div (1000 * deg)").as("c"))
          .groupBy("node").agg(sum(col("c")).as("s"))
        rank = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(150000L) + coalesce(col("s"), lit(0L))).as("r"))
          .localCheckpoint(false)
      }
      // Materialize the final rank eagerly so the iteration caches can
      // be dropped HERE instead of leaking for the session's lifetime
      // (round-6 advice) — the returned plan reads only the final RDD.
      val fin = rank.localCheckpoint(true)
      edgesDeg.unpersist()
      nodes.unpersist()
      fin.select(col("node").as("doc_id"), col("r").as("rank_fp"))
        .orderBy("doc_id")
    }),

    // g2: per-node triangle counts on the candidate graph — the local
    // clustering signal: a doc whose dup-neighbors are themselves mutual
    // dups sits inside a template clique (mass-produced boilerplate),
    // vs. a star pattern (one doc paraphrased many ways). Edges are
    // oriented a<b<c so every triangle is enumerated exactly once by two
    // equi-joins — no nested loop. The enumeration cost is Σ deg², which
    // the candidate graph bounds (it is orders smaller than the corpus);
    // the production refinement at extreme skew orients edges by
    // (degree, id) instead of id so each triangle is found at its
    // lowest-degree vertex — same joins, same count.
    "g2_triangle_counts" -> ((s, dir) => {
      // doc_a < doc_b by construction; eager checkpoint (GC-owned
      // blocks, see lshPairs) — the three join views + the node list all
      // read the one materialized edge RDD.
      val pairs = candidatePairs(s, dir)
      val ab = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      val bc = pairs.select(col("doc_a").as("b"), col("doc_b").as("c"))
      val ac = pairs.select(col("doc_a").as("a"), col("doc_b").as("c"))
      val tri = ab.join(bc, "b").join(ac, Seq("a", "c"))
      val counts = tri
        .select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
      pairs.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
        .orderBy("doc_id")
    }),

    "d13_winnow_pairs" -> ((s, dir) => {
      val fps = Tables(s, dir, "documents")
        .where(col("n_chars") >= graft.functions.WinnowFingerprints.GramLen)
        .select(col("doc_id"), explode(winnow_fingerprints(col("text"))).as("fp"))
        .localCheckpoint(true) // eager: GC-owned blocks, see lshPairs
      // df join is fp→fp: co-partitioned with the aggregation that
      // produced it, narrow rows either side — never a broadcast
      // dependency (the distinct-fp table grows with the corpus).
      val keep = fps.join(
        fps.groupBy("fp").agg(count(lit(1)).as("df"))
          .where(col("df") <= MaxFpDf), "fp")
      val a = keep.select(col("fp"), col("doc_id").as("doc_a"))
      val b = keep.select(col("fp"), col("doc_id").as("doc_b"))
      a.join(b, "fp")
        .where(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= MinSharedFps)
        .orderBy("doc_a", "doc_b")
    }),

    // d14: EXACT substring-run dedup — the operator suffix arrays serve
    // in single-node pipelines (Lee et al.'21, "Deduplicating Training
    // Data Makes Language Models Better": remove verbatim repeats ≥ L
    // tokens), re-expressed Spark-first. A suffix array is inherently
    // sequential and memory-resident; the same ≥L-token shared runs fall
    // out of relational primitives that scale: (1) every L-token window
    // gets a positional Horner hash from the compiled ShingleHashesBag
    // pass (one hash per position, document order — no window strings
    // materialized); (2) windows shared between two docs equi-join on
    // the hash — ONE shuffle keyed by window hash, never all-pairs, with
    // d13's df-cap making hot buckets impossible by construction
    // (a window in > RunMaxDf docs is boilerplate and is dropped; at
    // this corpus max df is 4 so the cap never fires — it is the scale
    // guard); (3) consecutive shared windows merge into maximal runs by
    // the classic islands trick on the pair's DIAGONAL (pa − pb): within
    // a diagonal, consecutive pa values share one island id
    // (pa − row_number), and each island IS a maximal run of
    // count + L − 1 shared tokens. The islands window partitions by
    // (doc_a, doc_b, diag) — bounded by the pair's overlap length, never
    // corpus-sized. Output: every maximal shared run ≥ L tokens with its
    // start offsets — the spans a curation pipeline would excise, vs
    // d13's winnowed SAMPLE of spans (probabilistic selection, pair-level
    // signal only). All integer arithmetic — hash-checked exactly.
    // fanIfSerial (r18): the shingling posexplode is the per-row cost
    // and otherwise runs inside the fixture's ONE scan task; no-op on
    // any multi-split input.
    "d14_substring_runs" -> ((s, dir) =>
      substringRuns(Tables.fanIfSerial(
          Tables(s, dir, "documents").select(col("doc_id"), col("text"))))
        .orderBy("doc_a", "doc_b", "start_a", "start_b")),

    // d16: CONTAINMENT dedup — the asymmetric overlap |A∩B| / min(|A|,|B|)
    // (Broder'97's "containment"; the CCNet/Dolma sub-document signal).
    // Jaccard (d4) misses inclusion: a doc quoting 90 % of a shorter doc
    // scores J = |A∩B|/|A∪B| ≈ small when sizes differ, but containment
    // ≈ 0.9 — exactly the quote/wrapper/expansion relationship a curator
    // dedups by keeping the container. Scale path, not brute: pairs come
    // from the SAME capped LSH candidate graph as d6/d7 (bounded bucket
    // fan-out, no all-pairs), then EXACT shingle-set intersection only
    // for candidates — join candidates to A's shingles keyed by doc_a
    // (intermediate bounded by pairs-per-doc × doc size, linear), then
    // one equi-join keyed by (doc_b, shingle) computes the intersection,
    // partial-agg combined. The per-doc set sizes join back (inter is
    // candidate-bounded — AQE broadcasts it). Direction is derived, not
    // assumed: container = the larger shingle set, ties to the lesser
    // doc_id (doc_a). Exact integer counts; the one terminal IEEE
    // division replays identically in the oracle.
    "d16_containment_dedup" -> ((s, dir) => {
      val sh = Tables(s, dir, "documents")
        .where(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), explode(wordShinglesOf(col("toks"), 3)).as("sh"))
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = candidatePairs(s, dir)
        .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_both"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
          (col("n_both").cast("double") / least(col("na"), col("nb")).cast("double"))
            .as("containment"),
          when(col("na") >= col("nb"), col("doc_a")).otherwise(col("doc_b"))
            .as("container_id"),
          when(col("na") >= col("nb"), col("doc_b")).otherwise(col("doc_a"))
            .as("containee_id"))
        .where(col("containment") >= 0.5)
        .orderBy("doc_a", "doc_b")
    })
  )

  /** The d9 Bloom-gate dataflow over `dir`'s documents (see the d9 entry
    * comment above for the full design): corpus docs (doc_id % 97 ≠ 0)
    * whose 3-gram hashes pass the eval-set (% 97 = 0) bitmap, with their
    * probe-hit counts. Shared verbatim by d9 and pipeline4's
    * decontamination gate.
    */
  /** The frozen decontamination artifact: the eval set's (doc_id % 97 = 0)
    * 3-gram probe positions as an m-bit bitmap. m is config
    * (`graft.bloom.m`, power of two), defaulting to the bench constant
    * the oracle replays. Production sizes m to the EVAL-set gram count
    * (m ≈ 10·k·n keeps the false-positive rate sub-percent) — an
    * operating decision, not a dataflow change: the SCALING.md capture
    * grows the eval set 30× with the corpus (a fixture-scaler artifact;
    * real benchmark suites don't grow with training data), saturating a
    * fixed m=2^16 bitmap to ~99 % FP rate so the hit-gate stops
    * filtering; re-sized (2^20) the pass is flat per-doc again. The
    * bitmap stays a driver-broadcast array of m/64 longs — 2 MB at
    * m=2^24, still broadcast-cheap. Shared by the batch gate (d9,
    * pipeline4) and the streaming ingest gate (s21), so the two paths
    * probe bit-identical filters.
    */
  private[graft] def bloomBitmap(s: SparkSession, dir: String): Array[Long] = {
    val m = s.conf.getOption("graft.bloom.m").map(_.toInt).getOrElse(BloomM)
    val grams = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(shingle_hashes(col("text"), 3)).as("g"))
    def positions(g: Column): Seq[Column] = (0 until BloomK).map { i =>
      (g % m + (lit(1L) + g % (m - 1)) * i) % m
    }
    // eval-side bitmap: distinct probe positions of bench grams; the
    // collect is bounded by m bits regardless of eval-set size
    val setBits = grams.where(col("doc_id") % 97 === 0)
      .select(explode(array(positions(col("g")): _*)).as("pos"))
      .distinct().collect().map(_.getLong(0))
    graft.functions.BloomHits.bitmap(m, setBits)
  }

  private[graft] def bloomHitCounts(s: SparkSession, dir: String): DataFrame = {
    val bitmap = bloomBitmap(s, dir)
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        // eval_once (r18, guide §4.4): the n_bloom_hits > 0 filter
        // otherwise pushes below this projection carrying a clone of
        // the whole shingle+probe chain — every document was shingled
        // and probed TWICE (d9 and pipeline4's decontam stage).
        graft.functions.eval_once(graft.functions.bloom_hits(
          shingle_hashes(col("text"), 3), bitmap, BloomK)).as("n_bloom_hits"))
      .where(col("doc_id") % 97 =!= 0 && col("n_bloom_hits") > 0)
  }

  /** The d14 maximal-shared-run dataflow over any (doc_id, text) frame
    * (see the d14 entry comment above for the full design). Parameterized
    * on the doc frame so d14 runs it over the whole table while
    * pipeline4 runs it over the corpus subset.
    */
  private[graft] def substringRuns(docs: DataFrame): DataFrame = {
    val L = RunL
    val win = docs.select(col("doc_id"),
      posexplode(shingle_hashes_bag(col("text"), L)).as(Seq("pos", "h")))
    // df-cap join is h→h: co-partitioned with its aggregation (d13's
    // shape) — never a broadcast of a corpus-growing table
    val keep = win.join(
      win.groupBy("h").agg(countDistinct("doc_id").as("df"))
        .where(col("df") <= RunMaxDf), "h")
    val a = keep.select(col("h"), col("doc_id").as("doc_a"), col("pos").as("pa"))
    val b = keep.select(col("h"), col("doc_id").as("doc_b"), col("pos").as("pb"))
    val islands = Window
      .partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pa"))
    a.join(b, "h")
      .where(col("doc_a") < col("doc_b"))
      .withColumn("diag", col("pa") - col("pb"))
      .withColumn("island", col("pa") - row_number().over(islands))
      .groupBy("doc_a", "doc_b", "diag", "island")
      .agg(min(col("pa")).as("start_a"), min(col("pb")).as("start_b"),
        (count(lit(1)) + lit(L - 1)).cast("int").as("run_tokens"))
      .select("doc_a", "doc_b", "start_a", "start_b", "run_tokens")
  }

  /** d13 span-dup policy: ignore fingerprints shared by more than MaxFpDf
    * docs (boilerplate + skew cap); flag pairs sharing ≥ MinSharedFps.
    */
  private val MaxFpDf = 20
  private val MinSharedFps = 5

  /** d14 run policy: L-token windows (a shared run is ≥ L verbatim
    * tokens — Lee et al. use 50 BPE tokens at web scale; 8 fits this
    * corpus's ~100-token docs), df-cap as d13.
    */
  private[operators] val RunL = 8
  private[operators] val RunMaxDf = 8

  /** g1 power iterations (unrolled identically in the oracle). */
  private val PageRankIters = 5

  /** Cosine threshold for semantic (embedding-cluster) dedup. */
  private[operators] val SemTau = 0.35

  /** d12/pipeline3 cluster-size target: within-cluster pairwise work is
    * O(Σ cᵢ²) ≈ n·c̄, so holding the MEAN cluster size at a constant while
    * k grows with the corpus is what makes SemDeDup linear-in-n (the
    * SCALING.md x10 capture measured the fixed-k=16 alternative at ~n²:
    * 6.6× cost for 3.3× data). c̄ = 512 keeps the k=16 pretrained path —
    * and therefore the hash-checked oracle — exactly as-is below 8 192
    * vectors, the same auto-switch design as [[unionFindMaxEdges]].
    * Override knob: `graft.semdedup.targetClusterSize`.
    */
  private val SemTargetClusterSize = 512
  private def semTargetClusterSize(s: SparkSession): Int =
    s.conf.getOption("graft.semdedup.targetClusterSize")
      .map(_.toInt).getOrElse(SemTargetClusterSize)

  /** IVF cluster assignment of the embeddings table — the clustering that
    * bounds d12/pipeline3 pairwise scoring to within-cluster pairs.
    * Size-adaptive: below k·target vectors the committed k=16 pretrained
    * quantizer serves (deterministic constants, replayed by the oracle);
    * above it, k = ⌈n/target⌉ centroids are trained by the same
    * deterministic fixed-seed Lloyd's iteration the e10 surface exposes
    * ([[IvfIndex.kmeans]]: init = first k by vec_id, lowest-index argmin
    * ties), so the scaled path is equally deterministic — SemScaleSpec
    * pins that any co-assignment-preserving refinement still drops every
    * junior exact-duplicate (identical vectors co-assign under ANY
    * centroid set). More centroids = FEWER cross-pair comparisons, the
    * knob SemDeDup itself scales with corpus size (k ≈ √n in the paper;
    * linear-in-n here keeps c̄ constant because the comparison stage, not
    * assignment, is the scale cost).
    */
  private[operators] def semAssign(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val base = IvfIndex.Pretrained
    val target = semTargetClusterSize(s)
    val n = emb.count()
    if (n <= base.length.toLong * target)
      IvfIndex.assign(emb, base)
        .select(col("vec_id"), col("cid"), col("embedding"))
    else {
      val cents = {
        val k = math.ceil(n.toDouble / target).toInt
        // Train on a bounded deterministic sample (hash-gated, same
        // salted-draw machinery as x1/x6): Lloyd's cost is k·|train|·dim
        // per iteration, so an unbounded train set makes TRAINING the
        // quadratic term (k ∝ n ⇒ k·n; measured 1.33× over linear at
        // x30 before this gate). Sampled, training is k·S·dim — linear
        // in n.
        val sampleTarget = math.max(16384L, 8L * k)
        val train =
          if (n <= sampleTarget) emb
          else emb.where(pmod(xxhash64(col("vec_id")), lit(1000000L)) <
            lit(math.ceil(1000000.0 * sampleTarget / n).toLong))
        IvfIndex.kmeans(s, train, k, iters = 3)
      }
      // Assignment: flat k·dim per row while k is small; past
      // SemTwoLevelK centroids, the e14 two-level coarse tier (nearest
      // of ⌈√k⌉ centroid GROUPS, then nearest member within — ~2√k·dim
      // per row), which keeps full-corpus assignment sub-quadratic as
      // k ∝ n grows. Group misassignment can only LOSE cross-cluster
      // comparisons — the same approximation dial as k itself;
      // SemScaleSpec pins that exact duplicates still co-assign
      // (identical vectors take identical argmins at both levels).
      if (cents.length <= semTwoLevelK(s))
        IvfIndex.assign(emb, cents)
          .select(col("vec_id"), col("cid"), col("embedding"))
      else {
        val (gc, members) = IvfIndex.groupCentroids(cents,
          math.ceil(math.sqrt(cents.length.toDouble)).toInt)
        emb.withColumn("cid",
            IvfIndex.assignTwoLevelCol(col("embedding"), cents, gc, members))
          .select(col("vec_id"), col("cid"), col("embedding"))
      }
    }
  }

  /** Centroid count beyond which [[semAssign]] switches to the
    * two-level coarse tier. 64 keeps every bench/SCALING capture on the
    * flat path it was measured with while giving the spec a forcing
    * handle; at production scale any k in the tens of thousands rides
    * the two-level tier automatically. Override knob
    * `graft.semdedup.twoLevelK` exists so the crossover can be MEASURED
    * on one corpus (graft.tools.AssignCrossover forces flat with a huge
    * value vs the default tier) — SCALING.md §5 records the measured
    * points; it is a measurement handle, not a tuning surface.
    */
  private val SemTwoLevelK = 64
  private def semTwoLevelK(s: SparkSession): Int =
    s.conf.getOption("graft.semdedup.twoLevelK")
      .map(_.toInt).getOrElse(SemTwoLevelK)

  /** The SemDeDup drop set: every vec_id with a more-senior (lower-id)
    * within-cluster near-duplicate. Same score→filter→dedup staging as
    * d6 — the distinct shuffle carries bare ids, never embeddings.
    */
  private[operators] def semDropped(asg: DataFrame): DataFrame = {
    val a = asg.select(col("cid"), col("vec_id").as("id_a"),
      col("embedding").as("ea"))
    val b = asg.select(col("cid"), col("vec_id").as("id_b"),
      col("embedding").as("eb"))
    a.join(b, Seq("cid"))
      .where(col("id_a") < col("id_b"))
      .where(round(cosine_similarity(col("ea"), col("eb")), 6) >= SemTau)
      .select(col("id_b").as("vec_id")).distinct()
  }

  /** DuckDB CTE chain `base/dists/asg/drp` replaying [[semAssign]] +
    * [[semDropped]] from the shared centroid constants — shared by the
    * d12 and pipeline3 oracles.
    */
  private[operators] val semCtes: String = {
    val distE = IvfIndex.distListSql(IvfIndex.Pretrained, "e")
    s"""WITH base AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |dists AS (
       |  SELECT vec_id, e, $distE AS d FROM base),
       |asg AS (
       |  SELECT vec_id, e,
       |    CAST(list_position(d, list_min(d)) - 1 AS INTEGER) AS cid
       |  FROM dists),
       |drp AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE round(list_cosine_similarity(a.e, b.e), 6) >= $SemTau)""".stripMargin
  }

  /** Same Horner-mod-prime hash as graft.functions.ShingleHashes,
    * replayed per shingle string (variable `sh`) via list_reduce over its
    * code points. Shared by the d2/d3/d7 signature CTE, d8, and the
    * hashed repetition features (t8, pipeline1/2).
    */
  private[operators] val polyHashSql =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(range(1, len(sh) + 1), i -> CAST(ascii(substr(sh, i, 1)) AS BIGINT))), " +
      s"(acc, c) -> (acc * ${graft.functions.WinnowFingerprints.Base} + c) % " +
      s"${graft.functions.WinnowFingerprints.Mod})"

  private[graft] val shinglesCte = {
    val minsSql = (0 until NumBands).map { i =>
      s"min((hm * ${A(i)} + ${B(i)}) % $P) AS s$i" }.mkString(",\n    ")
    val unpivot = (0 until NumBands).map { i =>
      s"SELECT doc_id, $i AS band, s$i AS minhash FROM mins" }
      .mkString("\n  UNION ALL ")
    val polyHash = polyHashSql
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(list_transform(range(1, len(ws) - 1),
       |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS sh
       |  FROM w WHERE len(ws) >= 3),
       |hashed AS (
       |  SELECT doc_id,
       |    $polyHash % $P AS hm
       |  FROM sh),
       |mins AS (
       |  SELECT doc_id,
       |    $minsSql
       |  FROM hashed GROUP BY doc_id),
       |sig AS (
       |  $unpivot),
       |sigk AS (
       |  SELECT sig.* FROM sig JOIN (
       |    SELECT band, minhash FROM sig GROUP BY band, minhash
       |    HAVING count(*) <= $MaxBandDf) ok USING (band, minhash))
       |""".stripMargin
  }

  /** THE capped candidate-pair rule as SQL over `sigk` — ONE definition
    * for every oracle that consumes the capped signature matrix (r16
    * review finding: six verbatim copies of this join could drift one
    * policy change apart — the exact fork [[componentsCte]] exists to
    * prevent, now applied to the pair rule all its consumers share).
    */
  private[graft] val CandidatePairsSql: String =
    "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b\n" +
    "  FROM sigk a JOIN sigk b\n" +
    "    ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id"

  /** The recursive connected-components CTE chain over `sigk` (cand →
    * edges → reach → comp(doc_id, cluster)) — the SQL replay of the
    * shared [[clusterLabels]] component stage, appended after
    * [[shinglesCte]] (with its WITH rewritten to WITH RECURSIVE) by
    * every oracle that consumes cluster labels (d7, d10, x7, x9). ONE
    * definition: the representative rule (least of the component) must
    * not fork across the four consumers.
    */
  private[graft] val componentsCte: String =
    s""", cand AS (
      |  $CandidatePairsSql),
      |edges AS (
      |  SELECT doc_a AS a, doc_b AS b FROM cand
      |  UNION SELECT doc_b, doc_a FROM cand),
      |reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |comp AS (
      |  SELECT a AS doc_id, least(a, min(b)) AS cluster FROM reach GROUP BY a)
      |""".stripMargin

  override def oracles: Map[String, String] = Map(
    "d1_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    "d2_minhash_signatures" ->
      (shinglesCte + "SELECT doc_id, band, minhash FROM sig ORDER BY doc_id, band"),

    "d3_lsh_pairs" ->
      (shinglesCte +
        s"""$CandidatePairsSql
          |ORDER BY doc_a, doc_b""".stripMargin),

    // d15: the same capped sigk matrix split by source side, bucket-joined
    // new × reference, then the per-new-doc partner/agreement fold and
    // the ≥ 2-band dup flag — every new doc emitted (left join, zeros).
    "d15_cross_dedup" ->
      (shinglesCte +
        """, ns AS (
          |  SELECT s.doc_id, s.band, s.minhash FROM sigk s
          |  JOIN documents d USING (doc_id)
          |  WHERE COALESCE(TRY_CAST(substr(d.source, 4) AS INTEGER), 0) >= 10),
          |rs AS (
          |  SELECT s.doc_id AS ref_id, s.band, s.minhash FROM sigk s
          |  JOIN documents d USING (doc_id)
          |  WHERE COALESCE(TRY_CAST(substr(d.source, 4) AS INTEGER), 0) < 10),
          |hits AS (
          |  SELECT ns.doc_id, rs.ref_id, count(*) AS shared
          |  FROM ns JOIN rs USING (band, minhash)
          |  GROUP BY 1, 2),
          |agg AS (
          |  SELECT doc_id, count(*) AS n_ref_partners, max(shared) AS best_shared
          |  FROM hits GROUP BY doc_id)
          |SELECT d.doc_id,
          |  CAST(coalesce(a.n_ref_partners, 0) AS BIGINT) AS n_ref_partners,
          |  CAST(coalesce(a.best_shared, 0) AS BIGINT) AS best_shared,
          |  CAST(coalesce(a.best_shared, 0) >= 2 AS INTEGER) AS is_dup
          |FROM documents d LEFT JOIN agg a USING (doc_id)
          |WHERE COALESCE(TRY_CAST(substr(d.source, 4) AS INTEGER), 0) >= 10
          |ORDER BY d.doc_id""".stripMargin),

    // d16: the d3/d11 capped candidate CTE, then EXACT intersection via
    // the d4-style shingle equi-join restricted to candidates, set sizes
    // from the same sh CTE, containment as the one terminal division,
    // direction = larger-set-wins with the lesser doc_id on ties.
    "d16_containment_dedup" ->
      (shinglesCte +
        s""", cand AS (
          |  $CandidatePairsSql),
          |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
          |inter AS (
          |  SELECT c.doc_a, c.doc_b, count(*) AS n_both
          |  FROM cand c
          |  JOIN sh x ON x.doc_id = c.doc_a
          |  JOIN sh y ON y.doc_id = c.doc_b AND y.sh = x.sh
          |  GROUP BY 1, 2)
          |SELECT doc_a, doc_b, na, nb, containment, container_id, containee_id
          |FROM (
          |  SELECT i.doc_a, i.doc_b, na.n AS na, nb.n AS nb,
          |    CAST(n_both AS DOUBLE) / least(na.n, nb.n) AS containment,
          |    CASE WHEN na.n >= nb.n THEN i.doc_a ELSE i.doc_b END AS container_id,
          |    CASE WHEN na.n >= nb.n THEN i.doc_b ELSE i.doc_a END AS containee_id
          |  FROM inter i
          |  JOIN sizes na ON i.doc_a = na.doc_id
          |  JOIN sizes nb ON i.doc_b = nb.doc_id)
          |WHERE containment >= 0.5
          |ORDER BY doc_a, doc_b""".stripMargin),

    "d11_minhash_estimate" ->
      (shinglesCte +
        s""", cand AS (
          |  $CandidatePairsSql)
          |SELECT c.doc_a, c.doc_b, count(*) AS n_agree,
          |  CAST(count(*) AS DOUBLE) / CAST($NumBands AS DOUBLE) AS est_jaccard
          |FROM cand c
          |JOIN sig x ON x.doc_id = c.doc_a
          |JOIN sig y ON y.doc_id = c.doc_b AND y.band = x.band AND y.minhash = x.minhash
          |GROUP BY c.doc_a, c.doc_b
          |ORDER BY doc_a, doc_b""".stripMargin),

    // Same LSH pairs, then components as a recursive transitive closure;
    // cluster representative = least reachable doc_id (== Spark's
    // min-label fixpoint).
    "d7_dedup_clusters" ->
      (shinglesCte.replaceFirst("WITH ", "WITH RECURSIVE ") + componentsCte +
        """SELECT d.doc_id,
          |  coalesce(c.cluster, d.doc_id) AS keep_id,
          |  CAST(coalesce(c.cluster, d.doc_id) = d.doc_id AS INTEGER) AS is_kept
          |FROM documents d LEFT JOIN comp c USING (doc_id)
          |ORDER BY d.doc_id""".stripMargin),

    // d7's recursive-CTE component construction, then the keep-best argmax
    // stated as the window spec the Spark aggregate must reproduce.
    "d10_cluster_keep_best" ->
      (shinglesCte.replaceFirst("WITH ", "WITH RECURSIVE ") + componentsCte +
        """, scored AS (
          |  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster,
          |    len(string_split(d.text, ' ')) AS n_tokens
          |  FROM documents d LEFT JOIN comp c USING (doc_id)),
          |r AS (
          |  SELECT doc_id, cluster, n_tokens,
          |    row_number() OVER (PARTITION BY cluster ORDER BY n_tokens DESC, doc_id) AS rn,
          |    count(*) OVER (PARTITION BY cluster) AS cluster_size
          |  FROM scored)
          |SELECT doc_id, cluster, CAST(n_tokens AS INTEGER) AS n_tokens,
          |  CAST(rn = 1 AS INTEGER) AS is_kept, cluster_size
          |FROM r ORDER BY doc_id""".stripMargin),

    "d4_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 150),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS sh
        |  FROM w WHERE len(ws) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_both
        |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, y.doc_id)
        |SELECT doc_a, doc_b, jaccard FROM (
        |  SELECT doc_a, doc_b,
        |    CAST(n_both AS DOUBLE) / (na.n + nb.n - n_both) AS jaccard
        |  FROM inter
        |  JOIN sizes na ON inter.doc_a = na.doc_id
        |  JOIN sizes nb ON inter.doc_b = nb.doc_id)
        |WHERE jaccard >= 0.05 ORDER BY doc_a, doc_b""".stripMargin,

    // Same trigram poly hash as the d2/d3 oracles (ShingleHashes replay).
    "d8_decontaminate" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS sh
        |  FROM w WHERE len(ws) >= 3),
        |g AS (SELECT DISTINCT doc_id, $polyHashSql AS g FROM sh),
        |bench AS (SELECT doc_id AS bench_id, g FROM g WHERE doc_id % 97 = 0)
        |SELECT c.doc_id, count(DISTINCT c.g) AS n_shared,
        |  count(DISTINCT b.bench_id) AS n_bench_docs
        |FROM g c JOIN bench b USING (g) WHERE c.doc_id % 97 <> 0
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,

    // d9: replay the Bloom filter bit for bit — the bench grams' probe
    // positions form the set-bit set; a corpus gram hits iff all k of its
    // probe rows find their position in that set (the join matches each
    // probe row at most once, so HAVING count(*) = k is exact even when a
    // gram's k positions collide). Same integer double-hashing arithmetic
    // as graft.functions.BloomHits — false positives reproduce exactly.
    "d9_bloom_decontaminate" -> {
      val m = BloomM
      val posSql = s"((g % $m) + i * (1 + g % ${m - 1})) % $m"
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS sh
        |  FROM w WHERE len(ws) >= 3),
        |g AS (SELECT DISTINCT doc_id, $polyHashSql AS g FROM sh),
        |ks AS (SELECT unnest([${(0 until BloomK).mkString(", ")}]) AS i),
        |bits AS (
        |  SELECT DISTINCT $posSql AS pos
        |  FROM g CROSS JOIN ks WHERE doc_id % 97 = 0),
        |probe AS (
        |  SELECT doc_id, g, $posSql AS pos
        |  FROM g CROSS JOIN ks WHERE doc_id % 97 <> 0),
        |hit AS (
        |  SELECT doc_id, g FROM probe JOIN bits USING (pos)
        |  GROUP BY doc_id, g HAVING count(*) = $BloomK)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bloom_hits
        |FROM hit GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "d5_simhash" -> {
      val bitSums = (0 until 16).map { j =>
        s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j" }.mkString(",\n    ")
      val sig = (0 until 16).map(j => s"CASE WHEN s$j > 0 THEN ${1 << j} ELSE 0 END")
        .mkString(" + ")
      s"""WITH words AS (
         |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
         |  FROM documents),
         |hashed AS (
         |  SELECT doc_id, CAST(concat('0x', substr(md5(w), 1, 4)) AS INTEGER) AS h
         |  FROM words),
         |sums AS (
         |  SELECT doc_id,
         |    $bitSums
         |  FROM hashed GROUP BY doc_id)
         |SELECT doc_id, CAST($sig AS INTEGER) AS simhash16
         |FROM sums ORDER BY doc_id""".stripMargin
    },

    "d6_embed_neardup" -> {
      // Replays the multi-table LSH bucketing with the SAME hyperplane
      // constants the Spark side uses (shared bucketColsSql generator, so
      // the d6/e4 oracles and the Spark expression can't drift apart),
      // then scores only same-bucket pairs — candidate sets match exactly.
      val sameBucket = (0 until NeardupTables)
        .map(t => s"a.b$t = b.b$t").mkString(" OR ")
      s"""WITH sig AS (
         |  SELECT vec_id, embedding,
         |    ${SimilarityPack.bucketColsSql(NeardupTables)}
         |  FROM embeddings)
         |SELECT vec_a, vec_b, cos_sim FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
         |                                 CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
         |  FROM sig a JOIN sig b ON a.vec_id < b.vec_id AND ($sameBucket))
         |WHERE cos_sim >= 0.35 ORDER BY vec_a, vec_b""".stripMargin
    },

    // d12: replays IVF assignment from the same pretrained centroid
    // constants (shared distListSql generator with the e5 oracle) and the
    // same rounded-cosine threshold, restated as "keep vec_id iff no
    // lower-id same-cluster vector is within τ".
    "d12_semdedup" ->
      (semCtes +
        """
          |SELECT vec_id, cid FROM asg
          |WHERE vec_id NOT IN (SELECT vec_id FROM drp)
          |ORDER BY vec_id""".stripMargin),

    // g1: the shared signature CTE rebuilds the candidate graph, then the
    // five power iterations are UNROLLED as chained CTEs (standard SQL
    // forbids aggregates over a recursive reference) — same integer
    // fixed-point arithmetic, so the values match bit for bit.
    "g1_pagerank" -> {
      val iters = (0 until 5).map { i =>
        s"""pr${i + 1} AS (
           |  SELECT n.node, 150000 + COALESCE(c.s, 0) AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, CAST(sum((p.r * 850) // (1000 * d.deg)) AS BIGINT) AS s
           |    FROM edges e
           |    JOIN pr$i p ON p.node = e.src
           |    JOIN deg d ON d.src = e.src
           |    GROUP BY e.dst) c USING (node))""".stripMargin
      }.mkString(",\n")
      shinglesCte +
        s""",
           |cand AS (
           |  $CandidatePairsSql),
           |edges AS (
           |  SELECT doc_a AS src, doc_b AS dst FROM cand
           |  UNION ALL SELECT doc_b, doc_a FROM cand),
           |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
           |$iters
           |SELECT node AS doc_id, r AS rank_fp FROM pr5 ORDER BY doc_id""".stripMargin
    },

    // g2: the same ordered two-join triangle enumeration over the shared
    // candidate-pair CTE.
    "g2_triangle_counts" ->
      (shinglesCte +
        s""",
          |cand AS (
          |  $CandidatePairsSql),
          |tri AS (
          |  SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
          |  FROM cand ab
          |  JOIN cand bc ON bc.doc_a = ab.doc_b
          |  JOIN cand ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b),
          |m AS (SELECT unnest([a, b, c]) AS doc_id FROM tri),
          |nodes AS (
          |  SELECT DISTINCT doc_id
          |  FROM (SELECT doc_a AS doc_id FROM cand UNION ALL SELECT doc_b FROM cand))
          |SELECT n.doc_id,
          |  CAST(COALESCE(t.n, 0) AS BIGINT) AS n_triangles
          |FROM nodes n LEFT JOIN (SELECT doc_id, count(*) AS n FROM m GROUP BY doc_id) t
          |  USING (doc_id)
          |ORDER BY doc_id""".stripMargin),

    // d13: TextPack.winnowCtes replays the compiled winnowing; then the
    // same df-cap + shared-count policy.
    "d13_winnow_pairs" ->
      (TextPack.winnowCtes +
        s""",
           |df AS (SELECT fp, count(*) AS df FROM fpd GROUP BY fp),
           |keep AS (SELECT doc_id, fp FROM fpd JOIN df USING (fp) WHERE df <= $MaxFpDf)
           |SELECT doc_a, doc_b, n_shared FROM (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
           |  FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |WHERE n_shared >= $MinSharedFps
           |ORDER BY doc_a, doc_b""".stripMargin),

    // d14: replay positional window hashes (same Horner fold over the
    // single-space-joined L-token window), the df-cap, the pair join,
    // and the diagonal islands-and-gaps merge — all integer, exact.
    "d14_substring_runs" -> {
      val L = RunL
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |p AS (
         |  SELECT doc_id, unnest(range(0, len(ws) - $L + 1)) AS pos, ws
         |  FROM w WHERE len(ws) >= $L),
         |shs AS (
         |  SELECT doc_id, pos,
         |    array_to_string(list_slice(ws, pos + 1, pos + $L), ' ') AS sh
         |  FROM p),
         |g AS (SELECT doc_id, pos, $polyHashSql AS h FROM shs),
         |dfh AS (SELECT h, count(DISTINCT doc_id) AS df FROM g GROUP BY h),
         |keep AS (SELECT doc_id, pos, g.h FROM g JOIN dfh USING (h) WHERE df <= $RunMaxDf),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
         |  FROM keep a JOIN keep b ON a.h = b.h AND a.doc_id < b.doc_id),
         |runs AS (
         |  SELECT doc_a, doc_b, pa, pb, pa - pb AS diag,
         |    pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS island
         |  FROM pairs)
         |SELECT doc_a, doc_b,
         |  CAST(min(pa) AS INTEGER) AS start_a, CAST(min(pb) AS INTEGER) AS start_b,
         |  CAST(count(*) + $L - 1 AS INTEGER) AS run_tokens
         |FROM runs GROUP BY doc_a, doc_b, diag, island
         |ORDER BY doc_a, doc_b, start_a, start_b""".stripMargin
    },

    "d6b_neardup_brute" ->
      """SELECT vec_a, vec_b, cos_sim FROM (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                 CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE a.vec_id < 500 AND b.vec_id < 500)
        |WHERE cos_sim >= 0.35 ORDER BY vec_a, vec_b""".stripMargin
  )
}
