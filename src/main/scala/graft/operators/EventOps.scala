package graft.operators

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import graft.functions.NumericFunctions.{decSum, roundN}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics over the `events` table, batch-side. The same
  * transformations run as a Structured Streaming job in
  * [[graft.streaming.EventStream]]; keeping the logic `Column`-based means
  * one definition serves both (Spark's unified batch/stream model).
  *
  * JSON props are parsed with `from_json` once into a typed struct — at
  * 100 TB you never re-parse JSON per expression; parse once, project many.
  */
object EventOps {

  val propsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** from_json + struct field access + agg (extension surface — the
    * reference never parses JSON, FIXTURES.md §2).
    */
  def jsonPropStats(t: Tables): DataFrame =
    t.events
      .withColumn("k", from_json(col("props"), propsSchema).getField("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        // explicit sum/count instead of avg(): the int sum is exact in any
        // order, and sum/count is one deterministic IEEE division — avg()'s
        // internal accumulation strategy is engine-version-dependent
        roundN(sum("k").cast("double") / count(col("k")), 4).as("avg_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  /** MapType surface: parse props as a whole `map<string,long>` (no
    * schema for specific keys — the shape for payloads whose key set is
    * open-ended), explode the entries, aggregate per key. The map explode
    * runs inside the scan projection; only (key, value) pairs reach the
    * low-cardinality aggregate.
    */
  def propsMapStats(t: Tables): DataFrame =
    t.events
      .select(explode(from_json(col("props"), MapType(StringType, LongType)))
        .as(Seq("key", "v")))
      .groupBy("key")
      .agg(
        count(lit(1)).as("n"),
        min("v").as("min_v"),
        max("v").as("max_v"),
        sum("v").as("sum_v"))
      .orderBy("key")

  /** Map higher-order functions over the parsed props payload:
    * `map_filter` (entries above a threshold), `transform_values`
    * (per-entry rescale), `map_values` + `aggregate` (fold the rescaled
    * values) — the lambda surface for MapType, per-row and codegen-
    * friendly; the only shuffle is the final per-type rollup. Parse once,
    * transform many: the JSON decode happens in one projection and every
    * map op reuses the typed map.
    */
  def propsMapTransform(t: Tables): DataFrame =
    t.events
      .filter(col("props").isNotNull)
      .select(
        col("event_type"),
        from_json(col("props"), MapType(StringType, LongType)).as("m"))
      .select(
        col("event_type"),
        size(map_filter(col("m"), (_, v) => v > 50)).as("n_high"),
        aggregate(
          map_values(transform_values(col("m"), (_, v) => v * 2L)),
          lit(0L), (acc, x) => acc + x).as("sum_doubled"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("n_high").as("n_high_entries"),
        sum("sum_doubled").as("total_doubled"))
      .orderBy("event_type")

  /** get_json_object string-path variant of the same extraction. */
  def jsonGetObject(t: Tables): DataFrame =
    t.events
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .filter(col("k") > 50)

  /** Tumbling event-time window (1 hour): the batch twin of the streaming
    * windowed aggregation. `window()` is a plain projection — groups land
    * hash-partitioned by (window, type), no global state.
    */
  def hourlyTypeCounts(t: Tables): DataFrame =
    t.events
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        roundN(decSum(col("value")), 2).as("total_value"))
      .orderBy("hour_start", "event_type")

  /** Interval join: events matched into arbitrary (unaligned, possibly
    * overlapping) time windows WITHOUT an equi key — the shape Spark's
    * planner turns into a BroadcastNestedLoopJoin (or worse, a cartesian
    * product) if written as the naive `e.ts >= w.start && e.ts < w.end`
    * range join. Instead both sides are mapped onto hour buckets — each
    * window explodes into the buckets it covers, each event lands in
    * exactly one — and the match becomes a plain equi-join on the bucket
    * followed by the precise containment filter. An event has one bucket,
    * so no (event, window) pair can match twice and the aggregate needs
    * no dedup.
    *
    * The windows here are derived from the data (the topK busiest hours,
    * each opened from hour+10 min for 90 minutes, deliberately crossing
    * an hour boundary so multi-bucket explode is exercised), standing in
    * for campaign/maintenance/incident windows at scale. Cost: one small
    * aggregate for the windows, one bucket equi-join (the exploded window
    * side is windows × ~2 rows — broadcast at any realistic window
    * count), no shuffle of the event side beyond its aggregate.
    */
  def intervalJoinBusyWindows(t: Tables, topK: Int = 20): DataFrame = {
    val ev = t.events.select(col("user_id"), col("ts"))
    val eb = ev.withColumn("bucket", date_trunc("hour", col("ts")))
    eb.join(busyWindowBuckets(t, topK), Seq("bucket"))
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy("w_start", "w_end")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("w_start")
  }

  /** The bucket-exploded window table behind [[intervalJoinBusyWindows]]:
    * (w_start, w_end, bucket) with one row per hour bucket a window
    * covers. Shared with the stream–static twin, where it is the static
    * dimension each micro-batch probes.
    */
  private[graft] def busyWindowBuckets(t: Tables, topK: Int): DataFrame =
    t.events
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("h")).limit(topK)
      .select(
        (col("h") + expr("interval 10 minutes")).as("w_start"),
        (col("h") + expr("interval 100 minutes")).as("w_end"))
      .withColumn(
        "bucket",
        explode(sequence(
          date_trunc("hour", col("w_start")),
          // end is exclusive: the bucket of the last covered microsecond
          date_trunc("hour", col("w_end") - expr("interval 1 microsecond")),
          expr("interval 1 hour"))))

  /** Native session windows (`session_window`, Spark 3.2+): per-user
    * 30-minute-gap sessions as a plain GROUP BY — the fully declarative
    * third formulation of sessionization beside the lag/running-sum
    * islands ([[userSessions]]) and the stateful streaming
    * flatMapGroupsWithState twin. One shuffle on the grouping key; the
    * gap-merge happens inside the aggregation operator, so Catalyst owns
    * the whole plan (and the same expression runs in streaming mode).
    * Boundary semantics: a window is [first_ts, last_ts + gap) —
    * half-open, so an event arriving at EXACTLY last_ts + gap starts a
    * new session; the oracle's island break mirrors that with `>= gap`.
    */
  def nativeSessionWindows(t: Tables): DataFrame =
    t.events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        roundN(decSum(col("value")), 2).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")

  /** Sliding windows: 2-hour windows every hour — each event lands in the
    * two epoch-aligned windows covering it, the shape behind "trailing 2 h
    * rate" dashboards. Spark expands the window set per row before the
    * aggregate (same Expand-based plan family as rollup), so the cost is
    * 2× rows into one exchange — no self-join.
    */
  def slidingTypeCounts(t: Tables): DataFrame =
    t.events
      .groupBy(
        window(col("ts"), "2 hours", "1 hour").getField("start").as("win_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        roundN(decSum(col("value")), 2).as("total_value"))
      .orderBy("win_start", "event_type")

  /** Gap-fill / resample: densify the hourly count series per event type so
    * every hour between a type's first and last event appears, zero-filled.
    * The hour spine is generated engine-side with `sequence(min, max,
    * 1 hour)` + `explode` — a generator over ONE aggregated row per type,
    * so spine size is span-hours × types, independent of event volume (at
    * 100 TB the spine is still tiny; the only data-sized work is the
    * hourly pre-aggregation, which combines map-side). A left join from
    * spine to counts fills the gaps; the spine side is broadcastable by
    * construction.
    */
  def gapFillHourly(t: Tables): DataFrame = {
    val hourly = t.events
      .groupBy(
        date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val spine = t.events
      .groupBy(col("event_type"))
      .agg(
        min(date_trunc("hour", col("ts"))).as("h0"),
        max(date_trunc("hour", col("ts"))).as("h1"))
      .select(
        col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("hour_start"))
    spine
      .join(hourly, Seq("event_type", "hour_start"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .select("event_type", "hour_start", "n")
  }

  /** Sessionization in batch: a session break is a >30-minute gap per user;
    * session id = running count of breaks (lag + windowed sum) — the batch
    * equivalent of `mapGroupsWithState` session logic, fully parallel per
    * user partition.
    */
  def userSessions(t: Tables): DataFrame =
    userSessionsWithEnd(t).drop("end_sec")

  /** [[userSessions]] plus each session's end (floor-seconds of its last
    * event) — the column the streaming twin's closed-session contract needs
    * (a session is emitted by the stream iff a break closed it or the final
    * watermark passed end_sec + 30 min; see EventStream.sessionize).
    */
  def userSessionsWithEnd(t: Tables): DataFrame = {
    val byUser   = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    // floor-seconds via unix_timestamp (NTZ has no direct bigint cast);
    // the oracle mirrors this with floor(epoch(ts))
    val tsSec    = unix_timestamp(col("ts").cast("timestamp"))
    val gapSec   = tsSec - lag(tsSec, 1).over(byUser)
    val isBreak  = when(gapSec.isNull || gapSec > 1800, 1).otherwise(0)
    t.events
      .withColumn("brk", isBreak)
      .withColumn("ts_sec", tsSec)
      .withColumn("session_id", sum("brk").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("events_in_session"),
        // round-1 driver hash-fail: double sums accumulate in engine-
        // dependent order; decimal accumulation is exact → order-free
        roundN(decSum(col("value")), 2).as("session_value"),
        max("ts_sec").as("end_sec"))
      .orderBy("user_id", "session_id")
  }

  /** Event funnel: users who clicked and later purchased (self-join on
    * user with time predicate — a range join; at scale, bucket by user so
    * the join is key-equi on user_id with the time filter applied post-join).
    */
  def clickToPurchase(t: Tables): DataFrame = {
    val clicks = t.events.filter(col("event_type") === "click")
      .select(col("user_id").as("u"), col("ts").as("click_ts"))
    val buys = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u2"), col("ts").as("buy_ts"))
    clicks
      .join(buys, col("u") === col("u2") && col("buy_ts") > col("click_ts"))
      .groupBy(col("u").as("user_id"))
      .agg(count(lit(1)).as("click_buy_pairs"))
      .orderBy("user_id")
  }

  /** AS-OF join (forward): every click matched to the first purchase of
    * the same user at-or-after the click. Spark has no asof-join operator;
    * the naive form is a user⋈user range join whose output explodes
    * quadratically in events-per-user. This formulation unions both event
    * slices into one stream sorted DESCENDING and takes a running
    * `min(purchase_ts)` over `[unboundedPreceding, currentRow]` — at each
    * click the frame holds exactly the events with ts at-or-after it, so
    * the running min is the next purchase. ONE shuffle on user_id and no
    * join; the growing frame evaluates incrementally (O(events) per user —
    * an `[current, unboundedFollowing]` frame would rescan the tail per
    * row, O(events²)). At equal ts the purchase sorts first in descending
    * order (desc on the boolean), keeping at-or-after ties eligible.
    */
  def nextPurchaseAsof(t: Tables): DataFrame = {
    val ev = t.events
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (col("event_type") === "purchase").as("is_p"))
      .withColumn("p_ts", when(col("is_p"), col("ts")))
    val w = Window
      .partitionBy("user_id")
      .orderBy(desc("ts"), desc("is_p"), desc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("next_purchase_ts", min("p_ts").over(w))
      .filter(!col("is_p"))
      .select("event_id", "user_id", "ts", "next_purchase_ts")
      .withColumnRenamed("ts", "click_ts")
  }

  /** AS-OF join with TOLERANCE (round 12) — [[nextPurchaseAsof]] with a
    * max-staleness bound (pandas `merge_asof(tolerance=…)`): a match
    * further than `tolMinutes` ahead is nulled out, the "a purchase two
    * weeks later doesn't attribute to this click" rule every attribution
    * window enforces. Same single-shuffle no-join plan — the bound is a
    * post-window projection on exact epoch-second arithmetic, so the
    * variant costs nothing over the unbounded as-of.
    */
  def nextPurchaseAsofTolerance(t: Tables, tolMinutes: Int = 120): DataFrame =
    nextPurchaseAsof(t)
      .withColumn("next_purchase_ts",
        // direct timestamp comparison (exact to the microsecond on both
        // engines) — an epoch-seconds cast would truncate sub-second
        // parts and disagree at the boundary
        when(col("next_purchase_ts") <=
          col("click_ts") + expr(s"INTERVAL $tolMinutes MINUTE"),
          col("next_purchase_ts")))
      .withColumn("matched", col("next_purchase_ts").isNotNull)

  /** AS-OF join (backward) — [[nextPurchaseAsof]]'s mirror, completing the
    * as-of pair: every click matched to the LAST purchase of the same user
    * at-or-before the click (the classic "most recent state as of event
    * time" lookup). Same single-shuffle union-and-scan shape, flipped:
    * ascending order with a running `max(purchase_ts)` over
    * `[unboundedPreceding, currentRow]` — at each click the frame holds
    * exactly the events at-or-before it. At equal ts the purchase sorts
    * FIRST in ascending order (desc on the boolean), keeping at-or-before
    * ties eligible, mirroring the forward variant's tie rule.
    */
  def prevPurchaseAsof(t: Tables): DataFrame = {
    val ev = t.events
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (col("event_type") === "purchase").as("is_p"))
      .withColumn("p_ts", when(col("is_p"), col("ts")))
    val w = Window
      .partitionBy("user_id")
      .orderBy(asc("ts"), desc("is_p"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("prev_purchase_ts", max("p_ts").over(w))
      .filter(!col("is_p"))
      .select("event_id", "user_id", "ts", "prev_purchase_ts")
      .withColumnRenamed("ts", "click_ts")
  }

  /** Hourly volume-anomaly detection — per (event_type, hour), flag hours
    * whose count exceeds 2× the trailing-24h average (the
    * monitoring-alert query over an event firehose). The trailing frame
    * is a RANGE window over the epoch-hour index — a true 24-CALENDAR-hour
    * baseline, so hour gaps shrink the observed sample instead of
    * silently stretching the window back in time (the ROWS-frame bug
    * class); a verdict is emitted once at least half the baseline window
    * (≥12 observed hours) exists. The verdict itself is exact-integer
    * cross-multiplication (`n·w > 2·Σ` — no division, no float), so the
    * whole report hash-gates. One exchange: the hourly pre-aggregation;
    * the window then runs over #types×#hours rows, never raw events.
    */
  def hourlyAnomalies(t: Tables): DataFrame = {
    val hourly = t.events
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("epoch_hour",
        (unix_micros(col("hour_start").cast("timestamp")) / 3600000000L)
          .cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("epoch_hour")
      .rangeBetween(-24, -1)
    hourly
      .withColumn("trailing_sum", sum(col("n")).over(w))
      .withColumn("trailing_n", count(col("n")).over(w))
      .filter(col("trailing_n") >= 12)
      .withColumn("anomalous",
        col("n") * col("trailing_n") > col("trailing_sum") * 2)
      .select("event_type", "hour_start", "n", "trailing_sum",
        "trailing_n", "anomalous")
      .orderBy("event_type", "hour_start")
  }

  /** Ordered funnel analysis — view → click → purchase, each step STRICTLY
    * after the previous step's earliest completion (the product-analytics
    * "conversion funnel" query). The naive formulation is one self-join
    * per step (3 shuffles of the full event log, each keyed differently);
    * this one is the single-exchange shape: filter to the funnel's event
    * types, ONE groupBy(user) collecting that user's funnel events, then
    * the per-user step timestamps fall out of array expressions — no
    * second pass over the log, no join. Per-user funnel-event cardinality
    * is the only memory bound (bounded in any real product corpus; a
    * pathological user would be salted or capped upstream).
    */
  def funnelSteps(t: Tables,
                  steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.size == 3, "funnelSteps is specialized to 3 steps")
    val ev = t.events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("ts"), col("event_type"))
      .groupBy("user_id")
      .agg(collect_list(struct(col("ts"), col("event_type"))).as("evs"))
    ev
      .withColumn("t1", expr(
        s"array_min(transform(filter(evs, e -> e.event_type = '${steps(0)}'), e -> e.ts))"))
      .withColumn("t2", expr(
        s"array_min(transform(filter(evs, e -> e.event_type = '${steps(1)}' AND e.ts > t1), e -> e.ts))"))
      .withColumn("t3", expr(
        s"array_min(transform(filter(evs, e -> e.event_type = '${steps(2)}' AND e.ts > t2), e -> e.ts))"))
      .select("user_id", "t1", "t2", "t3")
  }

  /** Gate query: users reaching each funnel stage. Fully hash-gated — the
    * oracle derives the same strictly-ordered step times via correlated
    * min-joins (a THIRD formulation), so agreement proves the ordered
    * semantics, not just event counts.
    */
  def funnelCounts(t: Tables): DataFrame =
    // count(col), not sum(when): a corpus with zero funnel events must
    // report 0 per stage like the oracle's count(*), never a NULL row
    funnelSteps(t).agg(
      count(col("t1")).as("u1"),
      count(col("t2")).as("u2"),
      count(col("t3")).as("u3"))
      .select(expr(
        """stack(3,
          |  'step1_view',     u1,
          |  'step2_click',    u2,
          |  'step3_purchase', u3
          |) AS (stage, n_users)""".stripMargin))
      .orderBy("stage")

  /** Retention cohort matrix (round 12): users grouped by their
    * first-active day (the cohort), each later active day counted at its
    * day offset — the (cohort_day, day_offset) → distinct-users matrix
    * every engagement dashboard draws. Offsets capped at `maxOffset`
    * (the matrix a dashboard renders is bounded; at 100 TB the cap also
    * bounds the output to cohorts × maxOffset rows). Shape: one distinct
    * over (user, day) — event volume collapses to user-days immediately —
    * one per-user min, one user-keyed join (first-day table is
    * user-cardinality, co-partitioned with the distinct's exchange), one
    * count-distinct aggregate. All exact counts: fully hash-gated.
    */
  def retentionCohorts(t: Tables, maxOffset: Int = 7): DataFrame = {
    val days = t.events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val first = days.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
    days.join(first, "user_id")
      .withColumn("day_offset", datediff(col("d"), col("cohort_day")))
      .filter(col("day_offset") <= maxOffset)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }
}
