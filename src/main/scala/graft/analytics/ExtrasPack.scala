package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}
import graft.functions.{md5Prefix60, EvRow, LatestAggregator}
import graft.operators.DerivedSignalLog

/** Typed order row for the top-K aggregate (top-level so spark.implicits
  * can derive its encoder).
  */
final case class ORow(o_custkey: Long, o_orderkey: Long,
    o_orderdate: java.sql.Timestamp)

/** Second wave of engine-completeness operators: bag-semantics set ops,
  * skew-mitigation (salting) with provably identical results, stable
  * dataset splits, edit-distance, typed custom aggregation (UDAF surface),
  * sketch aggregates.
  */
object ExtrasPack extends QueryPack {

  /** a44 count-min geometry (shared with the typed aggregate and s18's
    * streaming form via [[graft.functions.CountMinAggregator]]): d depth
    * rows × w counters. ~1500 distinct users over w = 512 counters ⇒ ~3
    * keys/cell mean collision mass per row; min over d = 3 rows keeps
    * the visible overestimate small but nonzero on purpose (the checked
    * output shows est ≥ exact, not est = exact). Production sizes
    * w ≈ e/ε for additive error ε·N and d = ln(1/δ) — the grid stays
    * KBs at any N.
    */
  private val CmsDepth = graft.functions.CountMinAggregator.Depth
  private val CmsWidth = graft.functions.CountMinAggregator.Width

  /** One (j, pos) cell struct per depth row for hash h — the Column
    * replay of [[graft.functions.CountMinAggregator.position]], shared
    * by a44's grid/probes and s18's streamed-grid probes.
    */
  private[graft] def cmsCells(h: Column): Column = {
    val (d, w) = (CmsDepth, CmsWidth)
    explode(array((0 until d).map { j =>
      struct(lit(j).as("j"), ((h % w + (lit(1L) + h % (w - 1)) * j) % w).as("pos"))
    }: _*))
  }

  /** The a44/s18 probe side — exact counts for every 7th user, flattened
    * to their d cms cells. ONE definition: s18's streaming twin replays
    * the identical oracle, so the probe rule (%7), hash, and cell
    * flattening must never fork between the batch and streamed forms.
    * Input is any frame with (user_id, n_events, h) — a44 passes its
    * shared per-user frame; s18 derives one from the batch table.
    */
  private[graft] def cmsProbes(perUser: DataFrame): DataFrame =
    perUser.where(col("user_id") % 7 === 0)
      .select(col("user_id"), col("n_events").as("n_exact"),
        cmsCells(col("h")).as("c"))
      .select(col("user_id"), col("n_exact"),
        col("c.j").as("j"), col("c.pos").as("pos"))

  /** Point estimates: MIN over each probe's d cells against a
    * (j, pos, n) grid — broadcast, the grid is ≤ d×w rows by
    * construction.
    */
  private[graft] def cmsEstimates(probes: DataFrame, grid: DataFrame): DataFrame =
    probes.join(broadcast(grid), Seq("j", "pos"))
      .groupBy("user_id", "n_exact")
      .agg(min(col("n")).as("cms_est"))
      .orderBy("user_id")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // a18: multiset (bag) set ops — INTERSECT ALL / EXCEPT ALL preserve
    // duplicate cardinalities (vs a9's set semantics).
    "a18_multiset_ops" -> ((s, dir) => {
      val l = Tables(s, dir, "lineitem").select(col("l_suppkey").as("key"))
        .where(col("l_quantity") > 45)
      val r = Tables(s, dir, "lineitem").select(col("l_suppkey").as("key"))
        .where(col("l_discount") >= 0.08)
      l.intersectAll(r).groupBy("key").agg(count(lit(1)).as("n"))
        .select(lit("intersect_all").as("op"), col("key"), col("n"))
        .unionAll(
          l.exceptAll(r).groupBy("key").agg(count(lit(1)).as("n"))
            .select(lit("except_all").as("op"), col("key"), col("n")))
        .orderBy("op", "key")
    }),

    // a19: salted aggregation — the standard hot-key mitigation: spread
    // each group over N salt shards (map-side), aggregate shards, then
    // re-aggregate. Result is EXACTLY the plain groupBy (the oracle is the
    // plain groupBy); the plan trades one big skewed shuffle for two even
    // ones. At 100 TB this is the difference between a straggler task and
    // an even stage; AQE skew-join handles joins, salting handles aggs.
    "a19_salted_agg" -> ((s, dir) => {
      val salted = Tables(s, dir, "events")
        .withColumn("_salt", pmod(col("event_id"), lit(16)))
        .groupBy(col("event_type"), col("_salt"))
        .agg(count(lit(1)).as("pn"),
          sum(col("value").cast(DecimalType(12, 2))).as("pv"))
      salted.groupBy(col("event_type"))
        .agg(sum(col("pn")).as("n"),
          sum(col("pv")).cast("double").as("total"))
        .orderBy("event_type")
    }),

    // a20: sketch aggregates (HLL++ approx distinct) — approximate by
    // design ⇒ rows-only check; the exact twin is a11.
    "a20_approx_distinct" -> ((s, dir) => {
      // fanIfSerial was tried here (r18) and REVERTED by measurement:
      // HLL register updates are cheap per row, so the fan's payload
      // shuffle lost more than the parallelism bought (1.18→1.60 s).
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // a20b: KMV distinct sketch — the deterministic counterpart to a20's
    // HLL: bounded mergeable state (K smallest distinct hashes, map-side
    // combine, K·groups shuffle volume), and because the state is a pure
    // function of the hash set the DuckDB oracle replays the estimate
    // exactly — a HASH-CHECKED sketch. RecallSpec gates its error vs a11.
    "a20b_kmv_distinct" -> ((s, dir) => {
      import s.implicits._
      val kmv = new graft.functions.KmvAggregator(64)
      Tables(s, dir, "events")
        .select(col("event_type"),
          graft.functions.md5Prefix60(col("user_id").cast("string")).as("h"))
        .as[(String, Long)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(kmv.toColumn.name("est"))
        .toDF("event_type", "est")
        .select(col("event_type"), round(col("est"), 6).as("est_users"))
        .orderBy("event_type")
    }),

    // a30: sketch SET OPERATIONS — theta-style audience overlap from two
    // KMV sketches. The whole corpus reduces to two ≤K-long sketches
    // (bounded mergeable state, map-side combine); intersection/union
    // estimates are then pure array expressions over those sketches:
    // θ = min of the two K-th hashes, P = |intersection ≤ θ|, overlap ≈
    // P/θ_norm — the audience-overlap query every OLAP sketch library
    // ships, here with a deterministic estimator the DuckDB oracle
    // replays exactly (same doubles, same division order). A sub-K
    // sketch is an EXACT set — its sampling threshold is θ = 1, not its
    // max hash (standard theta-sketch exact-mode handling): using the
    // max would shrink θ below the true sampling rate and inflate
    // P/(θ/Norm). So each side contributes its K-th hash only when at
    // capacity and Norm (= θ of 1) otherwise; θ = least of the two.
    // Both-sub-K then falls out: θ = Norm, the ≤θ filter is a no-op, and
    // P/(Norm/Norm) = P — the exact overlap, no special-case gate
    // needed (per-set est() keeps its own sub-K exact gate).
    "a30_sketch_overlap" -> ((s, dir) => {
      import s.implicits._
      val K = 64
      val sk = new graft.functions.KmvSketchAggregator(K)
      val sketches = Tables(s, dir, "events")
        .where(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          graft.functions.md5Prefix60(col("user_id").cast("string")).as("h"))
        .as[(String, Long)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(sk.toColumn.name("mins"))
        .toDF("event_type", "mins")
      def est(c: Column): Column =
        when(size(c) < K, size(c).cast("double"))
          .otherwise(lit((K - 1).toDouble) /
            (element_at(c, -1).cast("double") / graft.functions.KmvAggregator.Norm))
      val a = sketches.where(col("event_type") === "click").select(col("mins").as("ma"))
      val b = sketches.where(col("event_type") === "purchase").select(col("mins").as("mb"))
      // θ contribution per side, in LONG space (hashes are 60-bit; a
      // double round-trip would be lossy): K-th hash at capacity, Norm
      // (2^60 — exactly representable, so th/Norm is later an exact 1.0)
      // for an exact sub-K set.
      def thOf(c: Column): Column =
        when(size(c) < K, lit(1L << 60)).otherwise(element_at(c, -1))
      a.crossJoin(b)
        .withColumn("th", least(thOf(col("ma")), thOf(col("mb"))))
        .withColumn("p",
          size(filter(array_intersect(col("ma"), col("mb")), x => x <= col("th"))))
        .withColumn("est_click_users", est(col("ma")))
        .withColumn("est_purchase_users", est(col("mb")))
        .withColumn("est_overlap",
          col("p").cast("double") /
            (col("th").cast("double") / graft.functions.KmvAggregator.Norm))
        .select(col("est_click_users"), col("est_purchase_users"), col("est_overlap"),
          (col("est_overlap") /
            ((col("est_click_users") + col("est_purchase_users")) - col("est_overlap")))
            .as("est_jaccard"))
    }),

    // a43: QUANTILE sketch — bottom-K-by-hash uniform sampling as a
    // bounded mergeable aggregate (HashSampleAggregator), completing the
    // sketch family: KMV counts distinct (a20b), theta intersects (a30),
    // this one estimates QUANTILES. Hashing the unique event_id makes the
    // K-row sample a pure function of the row set — deterministic at any
    // partitioning, exactly replayable cross-engine (row_number over hash
    // order ≤ K), which t-digest/GK sketches are not. State is K pairs
    // per group no matter the corpus size; quantiles of the sample carry
    // the standard ~1/√K error (RecallSpec gates it against a15's exact
    // percentiles). Values quantize to cents (a38's convention) so the
    // sampled payloads are integers and the only doubles are the final
    // /100 displays.
    "a43_sketch_quantiles" -> ((s, dir) => {
      import s.implicits._
      val K = 128
      val agg = new graft.functions.HashSampleAggregator(K)
      val sampled = Tables(s, dir, "events")
        .select(col("event_type"),
          graft.functions.md5Prefix60(col("event_id").cast("string")).as("h"),
          round(col("value") * 100, 0).cast("long").as("x"))
        .as[(String, Long, Long)]
        .groupByKey(_._1).mapValues(t => (t._2, t._3))
        .agg(agg.toColumn.name("sample"))
        .toDF("event_type", "sample")
      def estAt(q: Double): Column =
        graft.functions.HashSampleAggregator.centQuantile(col("sample"), q)
      sampled.select(col("event_type"), size(col("sample")).as("n_sample"),
          estAt(0.5).as("est_p50"), estAt(0.9).as("est_p90"))
        .orderBy("event_type")
    }),

    // a44: COUNT-MIN sketch — the bounded-memory FREQUENCY sketch,
    // completing the family (distinct a20b, overlap a30, quantiles a43,
    // now point frequencies): a d×w counter grid (here 3×512 = 1536
    // cells) whose size never grows with the stream; each key increments
    // one cell per depth row (probe positions by the same integer double
    // hashing as d9's Bloom filter), and a point estimate is the MIN over
    // its d cells — an overestimate by construction (collisions only add),
    // never an under. The grid IS a partial+final aggregate: map-side
    // combine caps every task's contribution at d×w cells, merging grids
    // is cell-wise addition, so the sketch builds in one narrow shuffle
    // of ≤ d×w rows per task at ANY scale — the streaming/distributed
    // heavy-hitter primitive (a29 is its exact, corpus-sized twin). The
    // probe set (every 7th user) joins the 1536-row grid as a broadcast;
    // output carries the exact count next to the estimate so the
    // overestimate invariant est ≥ exact is visible in the checked rows.
    // All integer arithmetic — the DuckDB oracle replays grid and probes
    // exactly; collisions reproduce, so this sketch is hash-checked too.
    "a44_count_min" -> ((s, dir) => {
      // ONE events scan: both the grid and the probes derive from the
      // same per-user count frame. The grid value is identical to the
      // per-event formulation (every event of a user hashes to the same
      // cells, so Σ-per-cell of events = Σ-per-cell of user counts) but
      // the explode volume is d×users, not d×events, and the corpus is
      // not scanned a second time for the probe side.
      val perUser = Tables(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
        .withColumn("h", graft.functions.md5Prefix60(col("user_id").cast("string")))
        .localCheckpoint(true)
      val sketch = perUser
        .select(cmsCells(col("h")).as("c"), col("n_events"))
        .groupBy(col("c.j").as("j"), col("c.pos").as("pos"))
        .agg(sum(col("n_events")).as("n"))
      cmsEstimates(cmsProbes(perUser), sketch)
    }),

    // a45: median/MAD robust outlier screen per event_type — the robust
    // twin of a38's z-score rule: mean and σ are dragged by the very
    // outliers they are supposed to flag, median ± 3·MAD (Hampel's rule)
    // is not. Both statistics are EXACT DISCRETE quantiles computed
    // t22-style: values quantize to cents (their native precision,
    // a38's convention), the corpus folds to a (type, cents) HISTOGRAM
    // whose row count is bounded by the cents VALUE SPACE — never the
    // event count — and the lower median is the smallest cents value
    // whose running count reaches ceil(n/2): one ordered pass over the
    // bounded histogram per type, no global sort, no percentile_approx
    // error bound, exactly replayable cross-engine (which t-digest/GK
    // are not). The deviation histogram derives FROM the value histogram
    // (|x − med| re-keys it, counts re-aggregate — both frames bounded),
    // so the corpus is scanned and shuffled ONCE; the outlier census is
    // a filtered sum over the same bounded frame. Every output is an
    // exact integer — no IEEE boundary anywhere in median, MAD, or the
    // |x − med| > 3·MAD census.
    "a45_median_mad" -> ((s, dir) => {
      // the one corpus-sized stage: one (type, cents) partial+final agg,
      // materialized once — median, deviation histogram, and census all
      // derive from this bounded frame
      val hist = Tables(s, dir, "events")
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("x"))
        .groupBy("event_type", "x").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val tot = hist.groupBy("event_type").agg(sum(col("c")).as("n"))
      def lowerMedian(h: DataFrame, key: String, out: String): DataFrame = {
        val w = Window.partitionBy("event_type").orderBy(col(key))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        h.withColumn("cum", sum(col("c")).over(w))
          .join(broadcast(tot), "event_type")
          .where(col("cum") * 2 >= col("n"))
          .groupBy("event_type").agg(min(col(key)).as(out))
      }
      val med = lowerMedian(hist, "x", "med")
      val dev = hist.join(broadcast(med), "event_type")
        .select(col("event_type"), abs(col("x") - col("med")).as("d"), col("c"))
        .groupBy("event_type", "d").agg(sum(col("c")).as("c"))
      val mad = lowerMedian(dev, "d", "mad")
      val outliers = dev.join(broadcast(mad), "event_type")
        .where(col("d") > col("mad") * 3)
        .groupBy("event_type").agg(sum(col("c")).as("n_out_raw"))
      tot.join(med, "event_type").join(mad, "event_type")
        .join(outliers, Seq("event_type"), "left")
        .select(col("event_type"), col("n"),
          col("med").as("median_cents"), col("mad").as("mad_cents"),
          coalesce(col("n_out_raw"), lit(0L)).as("n_outliers"))
        .orderBy("event_type")
    }),

    // t6: stable train/val split — hash-based deterministic sharding (the
    // training-data staple: reproducible splits that survive reshuffling
    // and scale-out, no RNG). 90/10 by md5 bucket.
    "t6_stable_split" -> ((s, dir) => {
      val bucket = pmod(md5Prefix60(col("text")), lit(100))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          bucket.as("bucket"),
          when(bucket < 90, "train").otherwise("val").as("split"))
        .orderBy("doc_id")
    }),

    // t7: edit distance to a reference token (fuzzy matching / OCR-noise
    // style dedup primitive).
    "t7_edit_distance" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          levenshtein(substring(col("text"), 1, 10), lit("key agg row")).as("dist"))
        .orderBy("doc_id")
    }),

    // a21: per-group top-K via a bounded-heap aggregate — same semantics
    // and ORACLE as a5's row_number window, radically different plan:
    // map-side partial aggregation bounds every group to K rows before
    // the shuffle (see TopKAggregator). The two queries sharing one
    // oracle proves the rewrite.
    "a21_topk_per_group" -> ((s, dir) => {
      import s.implicits._
      implicit val seqEnc: org.apache.spark.sql.Encoder[Seq[ORow]] =
        org.apache.spark.sql.Encoders.kryo[Seq[ORow]]
      // order by epoch MICROS, not Timestamp.getTime (milliseconds):
      // two orders within the same millisecond would tie under getTime
      // and resolve by orderkey, while the shared a5 oracle's ORDER BY
      // o_orderdate compares full microsecond precision — a latent
      // hash divergence the moment fixture timestamps gain sub-ms parts
      val topk = new graft.functions.TopKAggregator[ORow](
        3,
        // floorDiv, not truncating /: getTime rounds toward zero, so a
        // pre-epoch timestamp's seconds component would be off by one and
        // collide across the epoch boundary (e.g. 1969-12-31T23:59:59.5
        // vs 1970-01-01T00:00:00.5). Irrelevant for the 1992+ fixture but
        // the helper claims generality.
        r => Math.floorDiv(r.o_orderdate.getTime, 1000L) * 1000000L +
          r.o_orderdate.getNanos / 1000,
        _.o_orderkey)
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .as[ORow]
        .groupByKey(_.o_custkey)
        .agg(topk.toColumn.name("top"))
        .flatMap { case (_, rows) =>
          rows.zipWithIndex.map { case (r, i) =>
            (r.o_custkey, r.o_orderkey, r.o_orderdate, i + 1) } }
        .toDF("o_custkey", "o_orderkey", "o_orderdate", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // sql1: the SQL-text interface — the engine accepts full ANSI SQL over
    // registered views (parse → analyze → optimize → execute through
    // Catalyst), a capability the reference entirely lacks (its "query
    // language" is three HTTP routes, SURVEY §2.6).
    "sql1_full_sql" -> ((s, dir) => {
      Tables(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem")
      s.sql(
        """SELECT l_returnflag, count(*) AS n,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
          |FROM graft_lineitem
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    // a25: explicit GROUPING SETS — the general form behind a7's rollup
    // and a8's cube — with grouping() flags composed into a grouping id,
    // through the SQL interface. Physically one ExpandExec feeding the
    // same two-phase hash aggregate as any groupBy: rows are replicated
    // once per grouping set map-side, so the shuffle carries |sets|×rows
    // of PARTIALLY AGGREGATED data, not |sets| full passes of the table.
    "a25_grouping_sets" -> ((s, dir) => {
      Tables(s, dir, "lineitem").createOrReplaceTempView("graft_li_gs")
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS rf,
          |  coalesce(l_linestatus, 'ALL') AS ls,
          |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
          |  count(*) AS n,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
          |FROM graft_li_gs
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY gid, rf, ls""".stripMargin)
    }),

    // a23: correlated scalar subquery (TPC-H Q17 shape) through the SQL
    // interface — Catalyst decorrelates it into an aggregate + join; the
    // reference (and many engines) can't express this at all. Numeric
    // note: l_quantity is integer-valued, so the per-key double sums are
    // EXACT and the 0.5*avg threshold is bit-identical across engines.
    "a23_correlated_subquery" -> ((s, dir) => {
      Tables(s, dir, "lineitem").createOrReplaceTempView("graft_l")
      Tables(s, dir, "part").createOrReplaceTempView("graft_p")
      s.sql(
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(24,2)) AS total,
          |  count(*) AS n
          |FROM graft_l l1 JOIN graft_p ON p_partkey = l1.l_partkey
          |WHERE p_brand = 'Brand#1'
          |  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
          |                    FROM graft_l l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)
    }),

    // sql2: the 8-relation TPC-H Q8 shape (national market share) through
    // the SQL text interface — the full optimizer gauntlet in one query:
    // Catalyst must reorder the comma-join into the star shape, broadcast
    // every dim (region→nation→customer chain, the filtered part, supplier,
    // and nation a second time under a different alias), and leave
    // lineitem⋈orders as the only real shuffle; AQE coalesces the
    // post-agg stage. The self-referenced nation view under two aliases
    // exercises plan-node reuse. Money math follows the house rule:
    // DECIMAL until the boundary, the market-share ratio is ONE double
    // division of two exact sums.
    "sql2_market_share" -> ((s, dir) => {
      Seq("lineitem", "orders", "customer", "supplier", "part", "nation", "region")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_q8_$t"))
      s.sql(
        """WITH rev AS (
          |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
          |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
          |         * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS volume,
          |    n2.n_name AS supp_nation
          |  FROM graft_q8_lineitem, graft_q8_orders, graft_q8_customer,
          |       graft_q8_supplier, graft_q8_part,
          |       graft_q8_nation n1, graft_q8_nation n2, graft_q8_region
          |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          |    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
          |    AND p_type = 'PROMO')
          |SELECT o_year,
          |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
          |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
          |    / CAST(sum(volume) AS DOUBLE) AS mkt_share,
          |  CAST(sum(volume) AS DOUBLE) AS total_volume
          |FROM rev GROUP BY o_year ORDER BY o_year""".stripMargin)
    }),

    // p2: the typed-Dataset/UDAF surface — LWW fold via a custom
    // Aggregator over Dataset[EvRow]; must equal the untyped fold
    // (same oracle as p4_tombstone_delete).
    "p2_typed_latest" -> ((s, dir) => {
      import s.implicits._
      val log = DerivedSignalLog.log(s, dir).as[EvRow]
      log.groupByKey(_.id)
        .agg(LatestAggregator.toColumn.name("r"))
        .map(_._2)
        .filter(_.action != "deleted")
        .toDF()
        .select(col("id"), col("seq"), col("action"), col("title"),
          col("content"), col("priority"), col("author"),
          col("created_at"), col("updated_at"))
        .orderBy("id")
    })
  )

  override def oracles: Map[String, String] = Map(
    // a45: the identical bounded-histogram discrete quantiles — lower
    // median = smallest key whose running count reaches ceil(n/2)
    // (cum·2 ≥ n), replayed for the value and deviation histograms, then
    // the same integer census.
    "a45_median_mad" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS x
        |  FROM events),
        |hist AS (
        |  SELECT event_type, x, CAST(count(*) AS BIGINT) AS c
        |  FROM ev GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY 1),
        |med AS (
        |  SELECT event_type, min(x) AS med FROM (
        |    SELECT h.event_type, x, n,
        |      sum(c) OVER (PARTITION BY h.event_type ORDER BY x) AS cum
        |    FROM hist h JOIN tot USING (event_type))
        |  WHERE cum * 2 >= n GROUP BY event_type),
        |dev AS (
        |  SELECT h.event_type, abs(x - med) AS d, CAST(sum(c) AS BIGINT) AS c
        |  FROM hist h JOIN med USING (event_type) GROUP BY 1, 2),
        |mad AS (
        |  SELECT event_type, min(d) AS mad FROM (
        |    SELECT v.event_type, d, n,
        |      sum(c) OVER (PARTITION BY v.event_type ORDER BY d) AS cum
        |    FROM dev v JOIN tot USING (event_type))
        |  WHERE cum * 2 >= n GROUP BY event_type),
        |outl AS (
        |  SELECT v.event_type, CAST(sum(c) AS BIGINT) AS n_out
        |  FROM dev v JOIN mad USING (event_type)
        |  WHERE d > mad * 3 GROUP BY 1)
        |SELECT t.event_type, n, med AS median_cents, mad AS mad_cents,
        |  coalesce(n_out, CAST(0 AS BIGINT)) AS n_outliers
        |FROM tot t JOIN med USING (event_type) JOIN mad USING (event_type)
        |  LEFT JOIN outl USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "a18_multiset_ops" ->
      """WITH l AS (SELECT l_suppkey AS key FROM lineitem WHERE l_quantity > 45),
        |     r AS (SELECT l_suppkey AS key FROM lineitem WHERE l_discount >= 0.08)
        |SELECT 'intersect_all' AS op, key, count(*) AS n
        |  FROM (SELECT key FROM l INTERSECT ALL SELECT key FROM r) GROUP BY key
        |UNION ALL
        |SELECT 'except_all' AS op, key, count(*) AS n
        |  FROM (SELECT key FROM l EXCEPT ALL SELECT key FROM r) GROUP BY key
        |ORDER BY op, key""".stripMargin,

    "a19_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Replays the KMV estimator: K-th smallest distinct 60-bit hash,
    // (K-1)/u_K, exact below K — same doubles, same division.
    "a20b_kmv_distinct" -> {
      val K = 64
      s"""WITH h AS (
         |  SELECT DISTINCT event_type,
         |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM events),
         |r AS (
         |  SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS nd
         |  FROM h)
         |SELECT event_type,
         |  round(CASE WHEN nd < $K THEN CAST(nd AS DOUBLE)
         |        ELSE ($K - 1) / (CAST(h AS DOUBLE) / 1152921504606846976) END, 6) AS est_users
         |FROM r
         |WHERE rn = CASE WHEN nd < $K THEN nd ELSE $K END
         |ORDER BY event_type""".stripMargin
    },

    // a30: replay both KMV sketches (K smallest distinct hashes per
    // type), then the same theta-intersection arithmetic — same doubles,
    // same division order, down to the parenthesization of the union
    // denominator, including the sub-K exact-set θ clamp to 2^60.
    "a30_sketch_overlap" -> {
      val K = 64
      val norm = "1152921504606846976"
      s"""WITH h AS (
         |  SELECT DISTINCT event_type,
         |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM events WHERE event_type IN ('click', 'purchase')),
         |r AS (
         |  SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM h),
         |sk AS (
         |  SELECT event_type, list(h ORDER BY h) AS mins
         |  FROM r WHERE rn <= $K GROUP BY event_type),
         |ab AS (
         |  SELECT a.mins AS ma, b.mins AS mb,
         |    least(CASE WHEN len(a.mins) < $K THEN $norm ELSE a.mins[len(a.mins)] END,
         |          CASE WHEN len(b.mins) < $K THEN $norm ELSE b.mins[len(b.mins)] END) AS th
         |  FROM (SELECT mins FROM sk WHERE event_type = 'click') a,
         |       (SELECT mins FROM sk WHERE event_type = 'purchase') b),
         |e AS (
         |  SELECT
         |    CASE WHEN len(ma) < $K THEN CAST(len(ma) AS DOUBLE)
         |         ELSE ${K - 1} / (CAST(ma[len(ma)] AS DOUBLE) / $norm) END AS est_click_users,
         |    CASE WHEN len(mb) < $K THEN CAST(len(mb) AS DOUBLE)
         |         ELSE ${K - 1} / (CAST(mb[len(mb)] AS DOUBLE) / $norm) END AS est_purchase_users,
         |    CAST(len(list_filter(list_intersect(ma, mb), x -> x <= th)) AS DOUBLE)
         |      / (CAST(th AS DOUBLE) / $norm) AS est_overlap
         |  FROM ab)
         |SELECT est_click_users, est_purchase_users, est_overlap,
         |  est_overlap / ((est_click_users + est_purchase_users) - est_overlap) AS est_jaccard
         |FROM e""".stripMargin
    },

    // a43: the sample is replayed literally — the K smallest DISTINCT
    // event-id hashes per type with the aggregator's min-payload tie rule
    // (`hd`: a 60-bit collision keeps one row, the minimum payload —
    // without it the oracle would keep both collision rows and diverge in
    // exactly the case the tie handling exists for), payloads listed in
    // value order, the same floor(q·(n−1))+1 pick.
    "a43_sketch_quantiles" -> {
      val K = 128
      s"""WITH h AS (
         |  SELECT event_type,
         |    CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
         |    CAST(round(value * 100, 0) AS BIGINT) AS x
         |  FROM events),
         |hd AS (
         |  SELECT event_type, h, min(x) AS x FROM h GROUP BY event_type, h),
         |r AS (
         |  SELECT event_type, h, x,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM hd),
         |sm AS (
         |  SELECT event_type, list(x ORDER BY x) AS xs
         |  FROM r WHERE rn <= $K GROUP BY event_type)
         |SELECT event_type, CAST(len(xs) AS INTEGER) AS n_sample,
         |  CAST(xs[CAST(floor(0.5 * (len(xs) - 1)) AS INTEGER) + 1] AS DOUBLE) / 100 AS est_p50,
         |  CAST(xs[CAST(floor(0.9 * (len(xs) - 1)) AS INTEGER) + 1] AS DOUBLE) / 100 AS est_p90
         |FROM sm ORDER BY event_type""".stripMargin
    },

    // a44: replay the d×w grid and the min-over-cells point query with
    // the same integer double-hashed positions — collisions (the only
    // source of overestimate) reproduce exactly.
    "a44_count_min" -> {
      val (d, w) = (CmsDepth, CmsWidth)
      val posSql = s"((h % $w) + (1 + h % ${w - 1}) * j) % $w"
      s"""WITH ks AS (SELECT unnest([${(0 until d).mkString(", ")}]) AS j),
         |h AS (
         |  SELECT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM events),
         |cells AS (
         |  SELECT j, $posSql AS pos, count(*) AS n
         |  FROM h CROSS JOIN ks GROUP BY 1, 2),
         |probes AS (
         |  SELECT user_id, count(*) AS n_exact FROM events
         |  WHERE user_id % 7 = 0 GROUP BY user_id),
         |ph AS (
         |  SELECT user_id, n_exact,
         |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM probes),
         |pp AS (SELECT user_id, n_exact, j, $posSql AS pos FROM ph CROSS JOIN ks)
         |SELECT user_id, n_exact, min(n) AS cms_est
         |FROM pp JOIN cells USING (j, pos)
         |GROUP BY user_id, n_exact ORDER BY user_id""".stripMargin
    },

    "t6_stable_split" ->
      """SELECT doc_id,
        |  CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 100 AS bucket,
        |  CASE WHEN CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 100 < 90
        |       THEN 'train' ELSE 'val' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t7_edit_distance" ->
      """SELECT doc_id, CAST(levenshtein(substr(text, 1, 10), 'key agg row') AS INTEGER) AS dist
        |FROM documents ORDER BY doc_id""".stripMargin,

    // a21 shares a5's oracle: two plans, one truth.
    "a21_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "a25_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, rf, ls""".stripMargin,

    "a23_correlated_subquery" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(24,2)) AS total,
        |  count(*) AS n
        |FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,

    "sql1_full_sql" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Textually the same query modulo view names — both engines aggregate
    // in exact DECIMAL and cast at the boundary, so the ratio is one
    // IEEE division of identical operands.
    "sql2_market_share" ->
      """WITH rev AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |         * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS volume,
        |    n2.n_name AS supp_nation
        |  FROM lineitem, orders, customer, supplier, part,
        |       nation n1, nation n2, region
        |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        |    AND p_type = 'PROMO')
        |SELECT o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
        |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(sum(volume) AS DOUBLE) AS mkt_share,
        |  CAST(sum(volume) AS DOUBLE) AS total_volume
        |FROM rev GROUP BY o_year ORDER BY o_year""".stripMargin,

    "p2_typed_latest" -> (DerivedSignalLog.SQL_CTE +
      """SELECT id, seq, action, title, content, priority, author, created_at, updated_at
        |FROM signals ORDER BY id""".stripMargin)
    // a20_approx_distinct: rows-only (sketch is approximate by design)
  )
}
