package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryPack, Tables}
import graft.functions.tokens

/** Classic relational operator coverage (SURVEY §2.6 — everything the
  * reference lacks but a complete engine needs): multi-way joins,
  * aggregations, window functions, rollup/cube, set ops, semi/anti joins,
  * event-time windows, sessionization, as-of join.
  *
  * Numeric discipline: money columns are cast to DECIMAL before summing, so
  * the aggregation itself is EXACT and independent of partial-aggregation
  * order at any partitioning/scale. The exact decimal aggregate is then
  * cast to DOUBLE once at the output boundary (one correctly-rounded
  * conversion, bit-identical across engines), and ratios are a single IEEE
  * double division of those exact operands — so the result hash-matches
  * the DuckDB oracle without depending on either engine's decimal
  * formatting or rounding internals.
  *
  * Scale notes per query are inline; the common principles: dimension
  * tables are broadcast (no shuffle of the fact side beyond the agg),
  * filters sit directly on scans (parquet pushdown), every aggregation is
  * partial+final, and every output is deterministically ordered.
  */
object RelationalPack extends QueryPack {

  /** The closed event-type vocabulary the a16 pivot / a41 unpivot pair
    * hardcodes (a pivot's column set must be static). One definition —
    * a fixture regeneration adding a 6th type shows up as ONE edit plus
    * loud crosscheck failures, not a silently-dropped row class.
    */
  private[analytics] val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  private def dec(c: String): Column = col(c).cast(DecimalType(12, 2))
  /** extendedprice * (1 - discount), exact, scale 4. */
  private val discPrice: Column =
    (dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast(DecimalType(18, 4))
  private def ts(s: String): Column = lit(s).cast("timestamp")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // a1: scan-heavy aggregation (TPC-H Q1 shape). One pass over lineitem,
    // partial agg per partition, 6-group final — shuffle carries ~6 rows
    // per map task regardless of input size.
    "a1_pricing_summary" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          sum(discPrice * (lit(1) + dec("l_tax"))).cast("double").as("sum_charge"),
          (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // a2: selective 3-way join + agg + top-K (TPC-H Q3 shape). customer is
    // the small filtered side → broadcast; orders⋈lineitem shuffles on
    // orderkey. Top-10 via TakeOrderedAndProject.
    "a2_topk_revenue" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders").where(col("o_orderdate") < ts("1998-01-01 00:00:00"))
      val l = Tables(s, dir, "lineitem").where(col("l_shipdate") > ts("1998-01-01 00:00:00"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(discPrice).cast(DecimalType(24, 4)).as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    }),

    // a3: 6-way star join (TPC-H Q5 shape). region/nation/supplier are
    // broadcast dims; the only big shuffle is lineitem⋈orders on orderkey.
    "a3_regional_join" -> ((s, dir) => {
      val r = Tables(s, dir, "region").where(col("r_name") === "ASIA")
      val n = Tables(s, dir, "nation")
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
               col("o_orderdate") < ts("1997-01-01 00:00:00"))
      val su = Tables(s, dir, "supplier")
      val l = Tables(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(su),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(discPrice).cast(DecimalType(24, 4)).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }),

    // a4: selective filter + global agg (TPC-H Q6 shape) — pure scan with
    // pushed predicates, no shuffle beyond the single-row final agg.
    "a4_filter_sum" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
               col("l_shipdate") < ts("1997-01-01 00:00:00") &&
               col("l_discount").between(0.05, 0.07) &&
               col("l_quantity") < 24)
        .agg(
          sum((dec("l_extendedprice") * dec("l_discount")).cast(DecimalType(18, 4)))
            .cast(DecimalType(24, 4)).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // a22: fact-to-dimension join with conditional aggregation (TPC-H Q14
    // shape): part is the broadcast dim; promo share as an exact decimal
    // ratio cast to double at the end.
    "a22_promo_revenue" -> ((s, dir) => {
      val p = Tables(s, dir, "part")
      val l = Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= ts("1996-09-01 00:00:00") &&
               col("l_shipdate") < ts("1996-11-01 00:00:00"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", discPrice)
            .otherwise(lit(0).cast(DecimalType(18, 4))))
            .cast("double").as("promo_revenue"),
          sum(discPrice).cast("double").as("total_revenue"))
        .withColumn("promo_share", col("promo_revenue") / col("total_revenue"))
    }),

    // a5: ranking window — top-3 most recent orders per customer.
    // Single shuffle on o_custkey; rank computed per partition.
    "a5_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          row_number().over(w).as("rn"))
        .where(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    // a6: analytic windows — running (decimal-exact) sum + lag per user.
    "a6_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .where(col("user_id") < 25)
        .select(col("user_id"), col("event_id"),
          sum(col("value").cast(DecimalType(12, 2)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_value"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .orderBy("user_id", "event_id")
    }),

    // a27: full outer join — the join-matrix cell a2/a3 (inner), a10
    // (semi/anti), a14 (as-of) and a24 (range) don't cover: preserved
    // rows on BOTH sides with null padding. Same shuffle/broadcast
    // physics as an inner join; the semantic content is the null
    // handling, which the coalesced key and the two exclusive sides
    // exercise (18 customer-only + 1163 order-only rows at sf0.01).
    "a27_outer_join" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").where(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_name"))
      val o = Tables(s, dir, "orders").where(col("o_totalprice") > 400000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("key"),
          col("c_name"), col("n_big"))
        .orderBy("key")
    }),

    // a28: semi-structured extraction — pull a typed value out of the
    // events.props JSON payload (get_json_object is codegen'd; no UDF,
    // no full from_json struct materialization for a single field) and
    // aggregate it relationally. Closes the data-model claim that JSON
    // payload columns are first-class analytics inputs, not just opaque
    // strings to round-trip.
    "a28_json_extract" -> ((s, dir) => {
      val k = get_json_object(col("props"), "$.k").cast("int")
      Tables(s, dir, "events")
        .select(col("event_type"), k.as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_k"),
          sum(col("k")).as("sum_k"),
          (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
        .orderBy("event_type")
    }),

    // a29: exact heavy hitters — users whose event count exceeds 1.2× the
    // per-user mean, the frequent-items primitive (frequent domains/URLs/
    // authors in a curation run). Two-phase: per-key counts (map-side
    // partial, one narrow shuffle), then the 1-row global totals broadcast
    // back as a scalar — the threshold compare stays in integers
    // (n·users·5 > total·6) so no engine can disagree on the boundary.
    // Scale: the per-key aggregate is the only data-sized work; the
    // totals frame derives from the (already tiny) per-key frame, not
    // from a second corpus scan. The per-key frame is materialized with
    // an eager checkpoint, not persist(): same single-scan guarantee,
    // but the blocks are GC-owned instead of leaking in the session's
    // CacheManager (round-6 advice; see DedupPack.lshPairs).
    "a29_heavy_hitters" -> ((s, dir) => {
      val per = Tables(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
        .localCheckpoint(true)
      val tot = per.agg(sum(col("n_events")).as("total"),
        count(lit(1)).as("n_users"))
      per.crossJoin(broadcast(tot))
        .where(col("n_events") * col("n_users") * 5 > col("total") * 6)
        .select(col("user_id"), col("n_events"),
          (col("n_events").cast("double") / col("total")).as("share"))
        .orderBy(desc("n_events"), col("user_id"))
    }),

    // a31: consecutive-duplicate compaction — keep an event only when it
    // CHANGES the per-user event_type (lag-based change detection), the
    // standard cleanup for retry storms / sensor repeats, and the
    // relational twin of log compaction. One user-partitioned window —
    // shuffles once on user_id, each partition scans ordered — then a
    // pure filter; no self-join.
    "a31_dedup_consecutive" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .where(col("prev").isNull || col("event_type") =!= col("prev"))
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy("event_id")
    }),

    // a32: ordered conversion funnel — signup → click-after-signup →
    // purchase-after-that-click, the step-sequence analysis an event
    // engine exists to answer (the reference's signal log is exactly this
    // event stream). Stage k's earliest qualifying time feeds stage k+1's
    // strict lower bound, so each stage shuffles only its filtered event
    // slice for the per-user min-agg, and the previous stage's ≤1-row-per-
    // user frame joins in as a broadcast (PlanSpec pins the shape). Times
    // compare as integer epoch-micros (both engines truncate the parquet
    // ns timestamps identically), so stage boundaries are exact.
    "a32_funnel" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val t1 = ev.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("us")).as("t1"))
      val t2 = ev.where(col("event_type") === "click")
        .join(t1, "user_id").where(col("us") > col("t1"))
        .groupBy("user_id").agg(min(col("us")).as("t2"))
      val t3 = ev.where(col("event_type") === "purchase")
        .join(t2, "user_id").where(col("us") > col("t2"))
        .groupBy("user_id").agg(min(col("us")).as("t3"))
      t1.join(t2.select("user_id", "t2"), Seq("user_id"), "left")
        .join(t3.select("user_id", "t3"), Seq("user_id"), "left")
        .select(col("user_id"),
          (lit(1) + col("t2").isNotNull.cast("int") + col("t3").isNotNull.cast("int"))
            .as("reached"),
          col("t1"), col("t2"), col("t3"))
        .orderBy("user_id")
    }),

    // a33: retention cohorts — users grouped by first-active day, counted
    // on each later active day (the activity grid behind every retention
    // curve). distinct(user, day) bounds the frame at users×days rows;
    // first-day derives from that frame (no second scan) and joins back
    // co-partitioned on user_id; the final (cohort, offset) agg is
    // partial+final on a tiny key space. All-integer outputs.
    "a33_retention" -> ((s, dir) => {
      val act = Tables(s, dir, "events")
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .distinct()
      val first = act.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      act.join(first, "user_id")
        .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // a26: RANGE-framed window — per-user trailing-10-minute count/sum,
    // the value-based frame a6's ROWS frame can't express (peers by
    // event-time distance, not row position). Both engines evaluate the
    // frame over integer epoch-micros so the bounds are exact; ties
    // (equal timestamps) are peers by SQL semantics in both.
    "a26_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-600000000L, 0L)
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("value"))
        .withColumn("n_10m", count(lit(1)).over(w))
        .withColumn("sum_10m",
          sum(col("value").cast(DecimalType(12, 2))).over(w).cast("double"))
        .select("event_id", "user_id", "n_10m", "sum_10m")
        .orderBy("event_id")
    }),

    // a36: first/last/second-touch attribution — the marketing-analytics
    // classic (which channel opened, which closed) and the
    // first_value/last_value/nth_value window coverage. The full-frame
    // windows need an explicit UNBOUNDED FOLLOWING upper bound (both
    // engines default last_value's frame to CURRENT ROW — a silent
    // wrong-answer otherwise); per-user constants then collapse through
    // the same user_id-partitioned aggregate, reusing the window's
    // exchange. Converted flag stays integer.
    "a36_attribution" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("first_touch", first(col("event_type")).over(full))
        .withColumn("last_touch", last(col("event_type")).over(full))
        .withColumn("second_touch", nth_value(col("event_type"), 2).over(full))
        .groupBy("user_id", "first_touch", "second_touch", "last_touch")
        .agg(count(lit(1)).as("n_events"),
          max((col("event_type") === "purchase").cast("int")).as("converted"))
        .orderBy("user_id")
    }),

    // a37: exact per-group Pearson correlation + population covariance
    // (n_chars vs whitespace token count per language) — the
    // feature-relationship scan a curation pass runs before trusting a
    // proxy metric. Both moments come from EXACT integer sums (counts,
    // sums, sums of squares/products — one partial+final agg), and the
    // closed forms are then a handful of IEEE ops; sqrt IS correctly
    // rounded by IEEE-754 (unlike log/exp), so the result is
    // bit-identical cross-engine. At 100 TB the long sums would move to
    // DECIMAL(38) — same shape, no overflow.
    "a37_correlation" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("lang"), col("n_chars").as("x"),
          size(tokens(col("text"))).cast("long").as("y"))
      docs.groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("lang"), col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
              sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
            .as("pearson_r"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("n")).cast("double")).as("covar_pop"))
        .orderBy("lang")
    }),

    // a42: gap-fill / resample — each user's event history regularized
    // to a daily grid (their first→last active day) with the day's
    // closing value carried FORWARD through silent days: sequence()
    // generates the grid, the per-day close is an exact max_by argmax on
    // (epoch-micros, event_id), and the fill is last(..., ignoreNulls)
    // over an unbounded-preceding frame — the standard warehouse
    // resample (IoT/finance "last observation carried forward"). No
    // arithmetic touches the carried value, so equality is exact. Scale:
    // grid size is Σ per-user active spans (generate-side, not a join
    // blow-up); the fill window partitions by user — multi-year spans
    // would band the window by (user, month) with a carried boundary
    // row, the a34 offsets trick in time.
    "a42_daily_gapfill" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"),
          unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      val daily = ev.groupBy("user_id", "day")
        .agg(max_by(col("value"), struct(col("us"), col("event_id"))).as("close"),
          count(lit(1)).as("n_events"))
      // derive the span from the already-aggregated daily frame, not the
      // raw events (daily contains every active (user, day), so min/max
      // agree) — grouping raw events again would scan the corpus twice
      val grid = daily.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("close"), ignoreNulls = true).over(w).as("filled_close"))
        .orderBy("user_id", "day")
    }),

    // a40: behavioral diversity per user — GINI IMPURITY of the
    // event-type mix, 1 − Σpᵢ² = (n² − Σnᵢ²)/n². The entropy-style
    // diversity metric, but exactly rational: a log-entropy would hinge
    // on libm ulps, while Gini is integer sums and ONE division — same
    // determinism argument as t9/t14. Two stacked aggs, both partial+
    // final — the (user, type) exchange carries map-combined counts and
    // the user rollup exchange carries the already-tiny per-pair frame,
    // so no shuffle ever moves raw events.
    "a40_gini_diversity" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(sum(col("c")).as("n"),
          sum(col("c") * col("c")).as("ss"),
          count(lit(1)).as("n_types"))
        .select(col("user_id"), col("n"), col("n_types"),
          ((col("n") * col("n") - col("ss")).cast("double") /
            (col("n") * col("n")).cast("double")).as("gini"))
        .orderBy("user_id")
    }),

    // a41: UNPIVOT (melt) — a16's wide per-user matrix folded back to
    // long form via stack(), the wide→long reshape every feature store
    // needs in both directions. stack is a per-row Expand (no shuffle,
    // no join); zero-count cells are dropped so the long form is sparse,
    // and the round trip a16 ∘ a41 is the identity on non-zero cells
    // (which is exactly what the oracle states).
    "a41_unpivot" -> ((s, dir) => {
      val wide = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
        .na.fill(0L)
      val stackArgs = EventTypes.map(t => s"'$t', $t").mkString(", ")
      wide.select(col("user_id"),
          expr(s"stack(${EventTypes.size}, $stackArgs) AS (event_type, n)"))
        .where(col("n") > 0)
        .orderBy("user_id", "event_type")
    }),

    // a39: Markov transition matrix over per-user event sequences —
    // P(next | current) from lead() pairs, the behavioral model behind
    // next-action prediction and anomalous-session scoring. One
    // user-partitioned window (a35's exchange shape), then counts
    // collapse to a ≤|types|² frame whose per-from totals broadcast
    // back; probabilities are single IEEE divisions of exact counts.
    "a39_markov_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val trans = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .where(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = trans.groupBy("from_type").agg(sum(col("n")).as("total"))
      trans.join(broadcast(totals), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          (col("n").cast("double") / col("total").cast("double")).as("prob"))
        .orderBy("from_type", "to_type")
    }),

    // a38: z-score outlier flagging per event_type — anomaly screening
    // with an INTEGER-EXACT predicate: values quantize to cents (their
    // native precision), moments are exact integer sums (one partial+
    // final agg, broadcast back), and |z| > 2 rewrites to
    // (x·n − Sx)² > 4·(n·Sxx − Sx²) in DECIMAL(38,0) — no float ever
    // enters the DECISION, so no engine can disagree on a boundary row.
    // The reported z itself is one division + one IEEE-exact sqrt of
    // those exact operands. DuckDB replays the compare in HUGEINT.
    // Carrying bound (t16's caveat applies here too): num² ≈ (x·n)² must
    // fit 38 digits, i.e. exact while max|x_cents|·n < 10¹⁹ — e.g. $10M
    // values across 10¹⁰ rows. Past that, non-ANSI Spark NULLs the
    // DECIMAL product where the oracle's HUGEINT stays exact, so
    // is_outlier would go NULL (loud in a hash check) rather than flip.
    "a38_outliers" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("value") * 100, 0).cast("long").as("x"))
      val st = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      ev.join(broadcast(st), "event_type")
        .withColumn("num",
          col("x").cast(dec) * col("n").cast(dec) - col("sx").cast(dec))
        .withColumn("den",
          col("n").cast(dec) * col("sxx").cast(dec) -
            col("sx").cast(dec) * col("sx").cast(dec))
        .select(col("event_id"), col("event_type"), col("value"),
          (col("num").cast("double") / sqrt(col("den").cast("double"))).as("z"),
          (col("num") * col("num") > col("den") * lit(4)).cast("int").as("is_outlier"))
        .orderBy("event_id")
    }),

    // a35: SCD2 validity intervals — turn the per-user event log into
    // versioned state periods: keep state CHANGES (a31's lag filter),
    // then close each period with the next change's time (lead; NULL =
    // current). This is the slowly-changing-dimension build every
    // warehouse derives from a CDC log, and composes with a14's as-of
    // join for time-travel lookups. Both windows share the user_id
    // partitioning and (us, event_id) sort, so the plan shuffles and
    // sorts ONCE — the second window reuses the first's exchange+sort
    // (PlanSpec pins a single data-sized Exchange). Versions order by
    // (us, event_id), so the output key (user_id, version) is total.
    "a35_scd2_intervals" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .where(col("prev").isNull || col("event_type") =!= col("prev"))
        .withColumn("version", row_number().over(w))
        .withColumn("valid_to", lead(col("us"), 1).over(w))
        .select(col("user_id"), col("event_type").as("state"), col("version"),
          col("us").as("valid_from"), col("valid_to"))
        .orderBy("user_id", "version")
    }),

    // a34: quality deciles per language — ntile(10) / percent_rank /
    // cume_dist over (n_chars DESC, doc_id), the bucketing step of every
    // quality-threshold curation pass ("keep the top 2 deciles per
    // language"). A naive PARTITION BY lang window puts an entire
    // language in ONE task — a wall at 100 TB (en is half the corpus) —
    // so the global rank is computed scale-safely instead, x2-style:
    // rows band by n_chars range (bands never interleave under the
    // (n_chars DESC, doc_id) order), row_number runs per (lang, band),
    // and the tiny (lang, band) count frame's running offsets broadcast
    // back — parallelism is langs×bands, no language-sized task. ntile's
    // remainder rule (first n%10 buckets one row larger) is replayed in
    // closed form from the rank; percent_rank/cume_dist are single IEEE
    // divisions of exact counts (the (lang, doc_id) total order has no
    // ties, so rank IS row_number). In production the bands come from an
    // approx-quantile sample; a fixed 16-char width suffices here.
    "a34_quality_deciles" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("band", expr("n_chars DIV 16"))
      val wb = Window.partitionBy("lang", "band")
        .orderBy(col("n_chars").desc, col("doc_id"))
      val counts = docs.groupBy("lang", "band").agg(count(lit(1)).as("cnt"))
      val woff = Window.partitionBy("lang").orderBy(col("band").desc)
      val offs = counts
        .withColumn("off", coalesce(
          sum(col("cnt")).over(woff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n_lang", sum(col("cnt")).over(Window.partitionBy("lang")))
      docs.withColumn("rn", row_number().over(wb))
        .join(broadcast(offs), Seq("lang", "band"))
        .withColumn("rank", col("off") + col("rn"))
        .withColumn("q", expr("n_lang DIV 10"))
        .withColumn("r", col("n_lang") % 10)
        .withColumn("decile",
          when(col("rank") <= col("r") * (col("q") + 1),
            expr("(rank - 1) DIV (q + 1)") + 1)
            .otherwise(col("r") + expr("(rank - 1 - r * (q + 1)) DIV q") + 1)
            .cast("int"))
        .withColumn("pct_rank",
          when(col("n_lang") === 1, lit(0.0))
            .otherwise((col("rank") - 1).cast("double") / (col("n_lang") - 1).cast("double")))
        .withColumn("cume",
          col("rank").cast("double") / col("n_lang").cast("double"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("decile"), col("pct_rank"), col("cume"))
        .orderBy("doc_id")
    }),

    // a7: hierarchical rollup over (event_type, day).
    "a7_rollup" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"),
          col("value"))
        .rollup(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total"))
        .orderBy(asc_nulls_first("event_type"), asc_nulls_first("day"))
    }),

    // a8: full cube over (lang, source).
    "a8_cube" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .orderBy(asc_nulls_first("lang"), asc_nulls_first("source"))
    }),

    // a9: set operations — union/intersect/except of two key sets.
    "a9_setops" -> ((s, dir) => {
      val a = Tables(s, dir, "customer")
        .where(col("c_acctbal") > 5000).select(col("c_custkey").as("key"))
      val b = Tables(s, dir, "orders")
        .where(col("o_totalprice") > 300000).select(col("o_custkey").as("key")).distinct()
      a.union(b).distinct().select(lit("union").as("op"), col("key"))
        .unionAll(a.intersect(b).select(lit("intersect").as("op"), col("key")))
        .unionAll(a.except(b).select(lit("except").as("op"), col("key")))
        .orderBy("op", "key")
    }),

    // a10: semi/anti joins (EXISTS / NOT EXISTS). Both plan as broadcast
    // or shuffled hash semi-joins — no row multiplication.
    "a10_semi_anti" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").select(col("o_custkey"))
      val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(lit("with_orders").as("op"), col("c_custkey").as("key"))
      val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(lit("no_orders").as("op"), col("c_custkey").as("key"))
      semi.unionAll(anti).orderBy("op", "key")
    }),

    // a11: exact distinct aggregation (expands to two-phase agg).
    "a11_distinct_agg" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // a12: event-time tumbling window — the streaming-native `window()`
    // operator run in batch; identical group keys under watermarking.
    "a12_tumbling_window" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))
        .orderBy("window_start", "event_type")
    }),

    // a17: sliding event-time windows (2h window, 1h slide) — each event
    // lands in 2 windows; Spark's window() generates them without row
    // explosion in the plan (the oracle mirrors via explicit union).
    "a17_sliding_window" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))
        .orderBy("window_start", "event_type")
    }),

    // a13: session windows (30-min gap) — streaming-native session_window
    // in batch; oracle mirrors via gaps-and-islands. New session starts
    // when gap >= 30 min.
    "a13_session_window" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
        .orderBy("user_id", "session_start")
    }),

    // a15: exact interpolated percentiles per group (two-pass sort-based
    // aggregate; for 100 TB you'd switch to approx_percentile sketches —
    // same call shape, documented trade-off).
    "a15_percentiles" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(percentile(col("value"), lit(0.5)), 4).as("p50"),
          round(percentile(col("value"), lit(0.95)), 4).as("p95"),
          round(min(col("value")), 4).as("vmin"),
          round(max(col("value")), 4).as("vmax"))
        .orderBy("event_type")
    }),

    // a16: pivot (dynamic columns from event_type); explicit value list so
    // no driver-side distinct scan.
    "a16_pivot" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    }),

    // a24: RANGE (interval) join — for each event, how many events of the
    // same user fall in the preceding 30 minutes. The naive formulation
    // is a non-equi join ⇒ BroadcastNestedLoopJoin, O(n²) — dead at any
    // scale. The scalable rewrite is BINNING: bucket time into
    // window-sized bins, probe each row's 2 candidate bins, and the range
    // join becomes an equi-join on (user_id, bin) + a residual filter —
    // one hash-partitioned shuffle, no row explosion beyond the fixed ×2
    // probe factor (PlanSpec pins the no-nested-loop plan). This is the
    // standard trick engines with native range-join optimizers apply
    // internally; here it is explicit.
    "a24_range_join" -> ((s, dir) =>
      RelationalPack.binnedPriorCount(
        Tables(s, dir, "events").select(col("user_id"), col("event_id"), col("ts")))),

    // a14: AS-OF join — for each order, the latest event (by ts) of its
    // pseudo-user at or before the order date. Implemented the scalable
    // way: tag + union + single window over (key, time) — one shuffle,
    // no range-join row explosion, works at any skew.
    "a14_asof_join" -> ((s, dir) => {
      val e = Tables(s, dir, "events").select(
        col("user_id").as("key"), col("ts").as("t"), lit(0).as("side"),
        col("event_id"), col("value"), lit(null).cast("long").as("o_orderkey"))
      val o = Tables(s, dir, "orders").select(
        (col("o_custkey") % 150).as("key"), col("o_orderdate").as("t"), lit(1).as("side"),
        lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"),
        col("o_orderkey"))
      val w = Window.partitionBy(col("key"))
        .orderBy(col("t"), col("side"), col("event_id"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.unionAll(o)
        .select(col("key"), col("side"), col("o_orderkey"),
          last(col("event_id"), ignoreNulls = true).over(w).as("last_event_id"),
          last(col("value"), ignoreNulls = true).over(w).as("last_event_value"))
        .where(col("side") === 1)
        .select(col("o_orderkey"), col("key"), col("last_event_id"), col("last_event_value"))
        .orderBy("o_orderkey")
    })
  )

  /** The a24 binning core over any `(user_id, event_id, ts)` frame —
    * extracted so RangeJoinProps can drive it with random event sets.
    * Window is fixed at 30 minutes (= the bin width; probing bins
    * {b-1, b} covers exactly the half-open window (ts-30min, ts)).
    * The range predicate lives INSIDE the left join: an event whose
    * probe bins hold only out-of-window rows must still surface with
    * n_prior = 0, not vanish. The equi pair (key, bin) keeps the hash
    * join; the residual range is a post-join filter on the same plan.
    */
  private[graft] def binnedPriorCount(e: DataFrame): DataFrame = {
    val winSec = 1800L
    val left = e.withColumn("pbin",
      explode(array(floor(col("ts").cast("long") / winSec) - 1,
        floor(col("ts").cast("long") / winSec))))
      .select(col("user_id").as("lk"), col("event_id"), col("ts"), col("pbin"))
    val right = e.select(col("user_id").as("rk"),
      col("ts").as("rts"),
      floor(col("ts").cast("long") / winSec).as("rbin"))
    left.join(right,
        col("lk") === col("rk") && col("pbin") === col("rbin") &&
        col("rts") > col("ts") - expr("INTERVAL 30 MINUTES") &&
        col("rts") < col("ts"), "left_outer")
      .groupBy(col("event_id"))
      .agg(count(col("rts")).as("n_prior"))
      .orderBy("event_id")
  }

  private val D = "DECIMAL(12,2)"
  private val discPriceSql =
    s"CAST(CAST(l_extendedprice AS $D) * (1 - CAST(l_discount AS $D)) AS DECIMAL(18,4))"

  override def oracles: Map[String, String] = Map(
    "a1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS $D)) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS $D)) AS DOUBLE) AS sum_base_price,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum($discPriceSql * (1 + CAST(l_tax AS $D))) AS DOUBLE) AS sum_charge,
         |  CAST(sum(CAST(l_quantity AS $D)) AS DOUBLE) / count(*) AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a2_topk_revenue" ->
      s"""SELECT l_orderkey, o_orderdate,
         |  CAST(sum($discPriceSql) AS DECIMAL(24,4)) AS revenue
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "a3_regional_join" ->
      s"""SELECT n_name, CAST(sum($discPriceSql) AS DECIMAL(24,4)) AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "a4_filter_sum" ->
      s"""SELECT
         |  CAST(sum(CAST(CAST(l_extendedprice AS $D) * CAST(l_discount AS $D) AS DECIMAL(18,4))) AS DECIMAL(24,4)) AS revenue,
         |  count(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "a22_promo_revenue" ->
      s"""SELECT promo_revenue, total_revenue,
         |  promo_revenue / total_revenue AS promo_share
         |FROM (
         |  SELECT
         |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN $discPriceSql
         |             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
         |    CAST(sum($discPriceSql) AS DOUBLE) AS total_revenue
         |  FROM lineitem, part
         |  WHERE l_partkey = p_partkey
         |    AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-11-01 00:00:00')""".stripMargin,

    "a5_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "a6_window_running" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER
        |    (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_value,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
        |FROM events WHERE user_id < 25 ORDER BY user_id, event_id""".stripMargin,

    "a27_outer_join" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000),
        |o AS (SELECT o_custkey, count(*) AS n_big FROM orders
        |      WHERE o_totalprice > 400000 GROUP BY 1)
        |SELECT coalesce(c_custkey, o_custkey) AS key, c_name, n_big
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        |ORDER BY key""".stripMargin,

    "a28_json_extract" ->
      """SELECT event_type, count(k) AS n_k, CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(sum(k) AS DOUBLE) / count(k) AS avg_k
        |FROM (SELECT event_type, CAST(props->>'k' AS INTEGER) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a29_heavy_hitters" ->
      """WITH per AS (
        |  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
        |tot AS (
        |  SELECT CAST(sum(n_events) AS BIGINT) AS total, count(*) AS n_users FROM per)
        |SELECT user_id, n_events, CAST(n_events AS DOUBLE) / total AS share
        |FROM per, tot
        |WHERE n_events * n_users * 5 > total * 6
        |ORDER BY n_events DESC, user_id""".stripMargin,

    "a31_dedup_consecutive" ->
      """SELECT event_id, user_id, event_type FROM (
        |  SELECT event_id, user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        |  FROM events)
        |WHERE prev IS NULL OR event_type <> prev
        |ORDER BY event_id""".stripMargin,

    "a32_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |t1 AS (SELECT user_id, min(us) AS t1 FROM ev
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |t2 AS (SELECT ev.user_id, min(us) AS t2 FROM ev JOIN t1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t1 GROUP BY ev.user_id),
        |t3 AS (SELECT ev.user_id, min(us) AS t3 FROM ev JOIN t2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t2 GROUP BY ev.user_id)
        |SELECT user_id,
        |  1 + CAST(t2 IS NOT NULL AS INTEGER) + CAST(t3 IS NOT NULL AS INTEGER) AS reached,
        |  t1, t2, t3
        |FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "a33_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        |  FROM events),
        |first AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id)
        |SELECT cohort_day, CAST(datediff('day', cohort_day, day) AS INTEGER) AS day_offset,
        |  count(*) AS n_users
        |FROM act JOIN first USING (user_id)
        |GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin,

    "a36_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
        |  FROM events),
        |t AS (
        |  SELECT user_id, event_type,
        |    first_value(event_type) OVER w AS first_touch,
        |    nth_value(event_type, 2) OVER w AS second_touch,
        |    last_value(event_type) OVER w AS last_touch
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, first_touch, second_touch, last_touch,
        |  count(*) AS n_events,
        |  max(CAST(event_type = 'purchase' AS INTEGER)) AS converted
        |FROM t
        |GROUP BY user_id, first_touch, second_touch, last_touch
        |ORDER BY user_id""".stripMargin,

    // Closed forms replayed from the same exact integer sums — NOT
    // DuckDB's corr()/covar_pop() aggregates, whose internal float
    // accumulation order is engine-private.
    "a37_correlation" ->
      """WITH m AS (
        |  SELECT lang, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM (SELECT lang, n_chars AS x,
        |          CAST(len(string_split(text, ' ')) AS BIGINT) AS y
        |        FROM documents)
        |  GROUP BY lang)
        |SELECT lang, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |       * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS pearson_r,
        |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * n AS DOUBLE) AS covar_pop
        |FROM m ORDER BY lang""".stripMargin,

    "a42_daily_gapfill" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id, value
        |  FROM events),
        |daily AS (
        |  SELECT user_id, day, value AS close, n_events FROM (
        |    SELECT user_id, day, value,
        |      row_number() OVER (PARTITION BY user_id, day
        |                         ORDER BY us DESC, event_id DESC) AS rn,
        |      count(*) OVER (PARTITION BY user_id, day) AS n_events
        |    FROM ev)
        |  WHERE rn = 1),
        |grid AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(CAST(min(day) AS TIMESTAMP),
        |                                CAST(max(day) AS TIMESTAMP),
        |                                INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM ev GROUP BY user_id)
        |SELECT user_id, day,
        |  coalesce(n_events, 0) AS n_events,
        |  last_value(close IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_close
        |FROM grid LEFT JOIN daily USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,

    "a40_gini_diversity" ->
      """WITH per AS (
        |  SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2),
        |agg AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(c * c) AS BIGINT) AS ss, count(*) AS n_types
        |  FROM per GROUP BY user_id)
        |SELECT user_id, n, n_types,
        |  CAST(n * n - ss AS DOUBLE) / CAST(n * n AS DOUBLE) AS gini
        |FROM agg ORDER BY user_id""".stripMargin,

    // The unpivot restated as the sparse long-form aggregate it folds
    // back into — the round trip with a16 is the identity on non-zero
    // cells, so the oracle is just the per-(user, type) count.
    "a41_unpivot" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events
        |GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    "a39_markov_transitions" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
        |  FROM events),
        |tr AS (
        |  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n FROM (
        |    SELECT event_type,
        |      lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS next_type
        |    FROM ev)
        |  WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS total FROM tr GROUP BY 1)
        |SELECT from_type, to_type, n, CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS prob
        |FROM tr JOIN tot USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    "a38_outliers" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, value,
        |    CAST(round(value * 100, 0) AS BIGINT) AS x
        |  FROM events),
        |st AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM ev GROUP BY event_type),
        |j AS (
        |  SELECT event_id, ev.event_type, value,
        |    CAST(x AS HUGEINT) * CAST(n AS HUGEINT) - CAST(sx AS HUGEINT) AS num,
        |    CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
        |      - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS den
        |  FROM ev JOIN st USING (event_type))
        |SELECT event_id, event_type, value,
        |  CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE)) AS z,
        |  CAST(num * num > den * 4 AS INTEGER) AS is_outlier
        |FROM j ORDER BY event_id""".stripMargin,

    "a35_scd2_intervals" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
        |  FROM events),
        |ch AS (
        |  SELECT user_id, event_id, us, event_type FROM (
        |    SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |                                    ORDER BY us, event_id) AS prev
        |    FROM ev)
        |  WHERE prev IS NULL OR event_type <> prev)
        |SELECT user_id, event_type AS state,
        |  CAST(row_number() OVER w AS INTEGER) AS version,
        |  us AS valid_from,
        |  lead(us) OVER w AS valid_to
        |FROM ch
        |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |ORDER BY user_id, version""".stripMargin,

    // The oracle is the plain window formulation — the banded two-level
    // rank must reproduce ntile/percent_rank/cume_dist exactly.
    "a34_quality_deciles" ->
      """SELECT doc_id, lang, n_chars,
        |  CAST(ntile(10) OVER w AS INTEGER) AS decile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM documents
        |WINDOW w AS (PARTITION BY lang ORDER BY n_chars DESC, doc_id)
        |ORDER BY doc_id""".stripMargin,

    "a26_range_frame" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_10m,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_10m
        |FROM (SELECT event_id, user_id,
        |        epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "a7_rollup" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY ROLLUP(event_type, day)
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,

    "a8_cube" ->
      """SELECT lang, source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY CUBE(lang, source)
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,

    "a9_setops" ->
      """WITH a AS (SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000),
        |     b AS (SELECT DISTINCT o_custkey AS key FROM orders WHERE o_totalprice > 300000)
        |SELECT 'union' AS op, key FROM (SELECT key FROM a UNION SELECT key FROM b)
        |UNION ALL SELECT 'intersect' AS op, key FROM (SELECT key FROM a INTERSECT SELECT key FROM b)
        |UNION ALL SELECT 'except' AS op, key FROM (SELECT key FROM a EXCEPT SELECT key FROM b)
        |ORDER BY op, key""".stripMargin,

    "a10_semi_anti" ->
      """SELECT 'with_orders' AS op, c_custkey AS key FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'no_orders' AS op, c_custkey AS key FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY op, key""".stripMargin,

    "a11_distinct_agg" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a12_tumbling_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "a17_sliding_window" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |x AS (
        |  SELECT date_trunc('hour', ts) AS ws, event_type, value FROM e
        |  UNION ALL
        |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, event_type, value FROM e)
        |SELECT ws AS window_start, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM x GROUP BY ws, event_type ORDER BY window_start, event_type""".stripMargin,

    "a13_session_window" ->
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
        |FROM s GROUP BY user_id, sess ORDER BY user_id, session_start""".stripMargin,

    "a15_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.95), 4) AS p95,
        |  round(min(value), 4) AS vmin,
        |  round(max(value), 4) AS vmax
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a16_pivot" -> {
      val cells = EventTypes.map(t =>
        s"count(*) FILTER (WHERE event_type = '$t') AS $t").mkString(",\n  ")
      s"""SELECT user_id,
         |  $cells
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    },

    // The oracle states the range join directly — DuckDB plans its own
    // range join; the binned rewrite must agree row for row.
    "a24_range_join" ->
      """SELECT e.event_id, count(p.ts) AS n_prior
        |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
        |LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) p
        |  ON p.user_id = e.user_id
        |  AND p.ts > e.ts - INTERVAL 30 MINUTE AND p.ts < e.ts
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,

    "a14_asof_join" ->
      """WITH u AS (
        |  SELECT user_id AS key, CAST(ts AS TIMESTAMP) AS t, 0 AS side, event_id, value,
        |         CAST(NULL AS BIGINT) AS o_orderkey
        |  FROM events
        |  UNION ALL
        |  SELECT o_custkey % 150 AS key, o_orderdate AS t, 1 AS side,
        |         CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value,
        |         o_orderkey
        |  FROM orders),
        |w AS (
        |  SELECT key, side, o_orderkey,
        |    last_value(event_id IGNORE NULLS) OVER win AS last_event_id,
        |    last_value(value IGNORE NULLS) OVER win AS last_event_value
        |  FROM u
        |  WINDOW win AS (PARTITION BY key ORDER BY t, side, event_id, o_orderkey
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT o_orderkey, key, last_event_id, last_event_value
        |FROM w WHERE side = 1 ORDER BY o_orderkey""".stripMargin
  )
}
