package graft.ops

import graft.{Dx, Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table: gap-based
  * sessionization and an as-of (attribution) join. The reference's closest
  * surface is its incremental ledger scan (SURVEY §2.9 T1) — neither
  * operator exists there; both are staples of large-scale behavioral /
  * training-telemetry pipelines, so the engine carries them first-class
  * with full DuckDB oracles.
  *
  * 100 TB design notes:
  *  - Both operators shuffle ONCE, keyed by user_id, then do all work
  *    inside per-user sorted windows — the classic "sessionize in one
  *    exchange" shape. No global window, no self-join.
  *  - The as-of join is the union+last_value formulation: tag both sides,
  *    one window pass computes "most recent touch at or before each
  *    target" — O(n log n) per user vs the O(n·m) range self-join naive
  *    shape; no range explosion, no broadcast requirement on either side.
  *  - Timestamps compare as epoch MICROS (long) — exact integer math,
  *    bit-identical in both engines (the parquet nanos are already
  *    micro-truncated by [[graft.Tables]]).
  */
object Events {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")

  /** Session gap: a new session starts after 30 idle minutes. */
  val SESSION_GAP_US: Long = 1800L * 1000000L

  // ---------------------------------------------------------------- q66

  /** Gap-based sessionization: per user, events ordered by (ts, event_id)
    * — the id tiebreak pinned so both engines assign identical session
    * boundaries when timestamps collide — split where the gap to the
    * previous event exceeds [[SESSION_GAP_US]]; session index is the
    * running count of boundary flags. Emits one row per session with
    * exact-decimal value totals ([[Dx.dsum]]). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val order = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"value",
        (unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(order))
          .as("gap_us"))
      .withColumn("session_idx",
        sum(when($"gap_us".isNull || $"gap_us" > SESSION_GAP_US, 1)
          .otherwise(0)).over(run).cast("long"))
      .groupBy($"user_id", $"session_idx")
      .agg(
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        count(lit(1)).cast("long").as("n_events"),
        Dx.dsum($"value").as("total_value"))
      .orderBy($"user_id", $"session_idx")
  }

  private val sessionizeOracle =
    s"""WITH e AS (
       |  SELECT user_id, event_id, ts, value,
       |         epoch_us(ts) - LAG(epoch_us(ts)) OVER
       |           (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
       |  FROM events
       |), s AS (
       |  SELECT *, CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > $SESSION_GAP_US
       |                          THEN 1 ELSE 0 END)
       |             OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |            AS BIGINT) AS session_idx
       |  FROM e
       |)
       |SELECT user_id, session_idx,
       |       MIN(ts) AS session_start, MAX(ts) AS session_end,
       |       CAST(COUNT(*) AS BIGINT) AS n_events,
       |       ${Dx.sqlDsum("value")} AS total_value
       |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q67

  /** As-of attribution join: each `purchase` is attributed to the user's
    * most recent `view`/`click` at or before the purchase instant.
    *
    * Formulation: ONE scan tags rows (touch=0 / target=1), a single
    * per-user window ordered by (ts, tag, event_id) carries the last
    * non-null touch forward (`last(_, ignoreNulls)`), then targets are
    * filtered out. Tag ordering makes a same-instant touch visible to its
    * purchase (≤ semantics); event_id breaks residual ties — both pinned
    * in the oracle's ORDER BY so attribution is deterministic.
    * Purchases with no prior touch keep NULL attribution (left semantics).
    * DuckDB could state this as `ASOF JOIN`, but the window formulation is
    * used on both sides so tie-breaks match exactly. */
  def asofAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"tag", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .filter($"event_type".isin("view", "click", "purchase"))
      .select($"user_id", $"ts", $"event_id",
        when($"event_type" === "purchase", 1).otherwise(0).as("tag"),
        when($"event_type" =!= "purchase", $"event_id").as("touch_id"),
        when($"event_type" =!= "purchase", $"ts").as("touch_ts"),
        when($"event_type" =!= "purchase", $"event_type").as("touch_type"))
      .select($"user_id", $"ts", $"event_id", $"tag",
        last($"touch_id", ignoreNulls = true).over(w).as("last_touch_id"),
        last($"touch_ts", ignoreNulls = true).over(w).as("last_touch_ts"),
        last($"touch_type", ignoreNulls = true).over(w).as("last_touch_type"))
      .filter($"tag" === 1)
      .select($"event_id", $"user_id", $"ts",
        $"last_touch_id", $"last_touch_ts", $"last_touch_type",
        (unix_micros($"ts") - unix_micros($"last_touch_ts"))
          .as("touch_gap_us"))
      .orderBy($"event_id")
  }

  private val asofOracle =
    """WITH tagged AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS tag,
      |         CASE WHEN event_type <> 'purchase' THEN event_id END AS touch_id,
      |         CASE WHEN event_type <> 'purchase' THEN ts END AS touch_ts,
      |         CASE WHEN event_type <> 'purchase' THEN event_type END AS touch_type
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')
      |), w AS (
      |  SELECT *,
      |    LAST_VALUE(touch_id IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY ts, tag, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_touch_id,
      |    LAST_VALUE(touch_ts IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY ts, tag, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_touch_ts,
      |    LAST_VALUE(touch_type IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY ts, tag, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_touch_type
      |  FROM tagged
      |)
      |SELECT event_id, user_id, ts, last_touch_id, last_touch_ts,
      |       last_touch_type,
      |       CAST(epoch_us(ts) - epoch_us(last_touch_ts) AS BIGINT)
      |         AS touch_gap_us
      |FROM w WHERE tag = 1 ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q78

  /** Anchor for the integer day axis (any fixed date works; pinned so
    * both engines compute identical offsets). */
  private val DAY_EPOCH = "1970-01-01"

  /** 7-day trailing moving average of daily event counts — the smoothing
    * pass every ops dashboard runs. The frame is a RANGE over an integer
    * day offset (days since epoch), so the window is CALENDAR-correct
    * even when days are missing from the data: a gap day simply
    * contributes nothing, and the average divides by the frame's actual
    * row count on both engines (explicit sum/count, not the builtin avg,
    * so the arithmetic is pinned). Daily grain first (one agg collapses
    * the events), then an unpartitioned-but-tiny window over ≤ a few
    * thousand day rows — date-grain data, never event-grain, crosses the
    * window. */
  def dailyMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // TIMESTAMP bucket (date_trunc), matching the trend reports' type —
    // a DATE-typed output column desyncs the comparator's pandas dtypes
    val daily = events(spark, dir)
      .select(date_trunc("day", $"ts").as("day"))
      .groupBy($"day")
      .agg(count(lit(1)).cast("long").as("n_events"))
      .withColumn("day_off",
        datediff($"day".cast("date"), lit(DAY_EPOCH).cast("date")))
    val w = Window.orderBy($"day_off").rangeBetween(-6, 0)
    daily
      .select($"day", $"n_events",
        (sum($"n_events").over(w).cast("double") /
          count(lit(1)).over(w)).as("ma7"))
      .orderBy($"day")
  }

  private val dailyMovingAvgOracle =
    s"""WITH daily AS (
       |  SELECT date_trunc('day', ts) AS day,
       |         CAST(COUNT(*) AS BIGINT) AS n_events,
       |         CAST(date_trunc('day', ts) AS DATE) - DATE '$DAY_EPOCH'
       |           AS day_off
       |  FROM events GROUP BY 1, 3)
       |SELECT day, n_events,
       |       CAST(SUM(n_events) OVER w AS DOUBLE)
       |         / COUNT(*) OVER w AS ma7
       |FROM daily
       |WINDOW w AS (ORDER BY day_off RANGE BETWEEN 6 PRECEDING
       |             AND CURRENT ROW)
       |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q73

  /** Semi-structured extraction: pull the numeric `k` field out of the
    * JSON `props` payload and aggregate per event type — the C16
    * (json_build) surface run in reverse. Extraction happens in the
    * scan's projection so only (event_type, k) reaches the aggregate;
    * at 100 TB the JSON string never crosses an exchange. Missing or
    * malformed payloads extract NULL and are counted separately rather
    * than silently skewing the sums. */
  def propsExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).cast("long").as("n_events"),
        count(when($"k".isNull, lit(1))).cast("long").as("n_missing"),
        sum($"k").as("total_k"),
        // explicit zero-denominator guard: an event_type with NO
        // parseable k must yield NULL under ANSI mode too (bare x/0
        // null-on-div-by-zero is non-ANSI Spark; DuckDB's NULL/0 is NULL)
        when(count($"k") > 0, sum($"k").cast("double") / count($"k"))
          .as("avg_k"))
      .orderBy($"event_type")
  }

  /** DuckDB's json_extract_string THROWS on malformed JSON where Spark's
    * get_json_object returns NULL — the json_valid guard restores the
    * null-on-malformed semantics the Spark side (and any robust 100 TB
    * ingest) has. */
  private val propsExtractOracle =
    """WITH e AS (
      |  SELECT event_type,
      |         CASE WHEN json_valid(props)
      |              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
      |         END AS k
      |  FROM events)
      |SELECT event_type,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(COUNT(*) FILTER (k IS NULL) AS BIGINT) AS n_missing,
      |       CAST(SUM(k) AS BIGINT) AS total_k,
      |       CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q95

  /** Ordered conversion funnel view → click → purchase: per user, the
    * first view, the first click AT OR AFTER that view, and the first
    * purchase at or after that click — the classic sequential funnel
    * (an unordered "did all three" count would credit a purchase that
    * preceded its view). One row out: stage reach counts plus exact and
    * mean inter-stage latencies.
    *
    * Scale shape: ONE user-keyed exchange; the three stage timestamps are
    * per-user window minima layered over the same partitioning (no
    * self-join per stage — the naive funnel is events⋈events⋈events),
    * then a user-grain collapse and a 1-row global aggregate. Latency
    * sums are exact integer micros; the means divide those sums as the
    * last step, so both engines agree bitwise. */
  def eventFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
    val staged = events(spark, dir)
      .select($"user_id", $"event_type", $"ts")
      .withColumn("v_ts",
        min(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("c_ts",
        min(when($"event_type" === "click" && $"ts" >= $"v_ts", $"ts"))
          .over(w))
      .withColumn("p_ts",
        min(when($"event_type" === "purchase" && $"ts" >= $"c_ts", $"ts"))
          .over(w))
    staged
      .groupBy($"user_id")
      .agg(max($"v_ts").as("v_ts"), max($"c_ts").as("c_ts"),
        max($"p_ts").as("p_ts"))
      .agg(
        count(lit(1)).cast("long").as("n_users"),
        count($"v_ts").cast("long").as("n_viewed"),
        count($"c_ts").cast("long").as("n_clicked"),
        count($"p_ts").cast("long").as("n_purchased"),
        sum(unix_micros($"c_ts") - unix_micros($"v_ts"))
          .cast("long").as("view_to_click_us_total"),
        sum(unix_micros($"p_ts") - unix_micros($"c_ts"))
          .cast("long").as("click_to_purchase_us_total"),
        (sum(unix_micros($"c_ts") - unix_micros($"v_ts")).cast("double") /
          count($"c_ts")).as("view_to_click_us_avg"),
        (sum(unix_micros($"p_ts") - unix_micros($"c_ts")).cast("double") /
          count($"p_ts")).as("click_to_purchase_us_avg"))
  }

  private val funnelOracle =
    """WITH b AS (
      |  SELECT user_id, event_type, ts,
      |         MIN(CASE WHEN event_type = 'view' THEN ts END)
      |           OVER (PARTITION BY user_id) AS v_ts
      |  FROM events
      |), b2 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= v_ts
      |                     THEN ts END)
      |              OVER (PARTITION BY user_id) AS c_ts
      |  FROM b
      |), b3 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= c_ts
      |                     THEN ts END)
      |              OVER (PARTITION BY user_id) AS p_ts
      |  FROM b2
      |), u AS (
      |  SELECT user_id, MAX(v_ts) AS v_ts, MAX(c_ts) AS c_ts,
      |         MAX(p_ts) AS p_ts
      |  FROM b3 GROUP BY 1
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |       CAST(COUNT(v_ts) AS BIGINT) AS n_viewed,
      |       CAST(COUNT(c_ts) AS BIGINT) AS n_clicked,
      |       CAST(COUNT(p_ts) AS BIGINT) AS n_purchased,
      |       CAST(SUM(epoch_us(c_ts) - epoch_us(v_ts)) AS BIGINT)
      |         AS view_to_click_us_total,
      |       CAST(SUM(epoch_us(p_ts) - epoch_us(c_ts)) AS BIGINT)
      |         AS click_to_purchase_us_total,
      |       CAST(SUM(epoch_us(c_ts) - epoch_us(v_ts)) AS DOUBLE)
      |         / COUNT(c_ts) AS view_to_click_us_avg,
      |       CAST(SUM(epoch_us(p_ts) - epoch_us(c_ts)) AS DOUBLE)
      |         / COUNT(p_ts) AS click_to_purchase_us_avg
      |FROM u""".stripMargin

  // ---------------------------------------------------------------- q97

  /** Weekly retention cohorts: users grouped by the ISO week of their
    * first event; for each (cohort, week offset), how many of the
    * cohort's users were active that week and the retention rate — the
    * standard triangular cohort table. Both engines truncate weeks to
    * Monday (ISO), and the offset is an exact integer (day difference of
    * two week-truncated dates is always a multiple of 7), so the only
    * double is the final rate division.
    *
    * Scale shape: ONE scan; events collapse to DISTINCT (user, week) —
    * the only corpus-sized exchange — and the per-user cohort is a
    * window MIN over that frame, not a self-join (a join back to a
    * groupBy re-executes the scan+distinct subtree: Spark DataFrames
    * don't share unpersisted subplans, and the first cut of this
    * operator measured 3 scans for exactly that reason). Cohort size
    * never needs its own aggregate either: every user is active in
    * their own first week, so the offset-0 row of each cohort IS the
    * cohort size — recovered by a window over the week-grain (tiny)
    * aggregate. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perUser = Window.partitionBy($"user_id")
    val perCohort = Window.partitionBy($"cohort_wk")
    events(spark, dir)
      .select($"user_id", date_trunc("week", $"ts").as("wk"))
      .distinct()
      .withColumn("cohort_wk", min($"wk").over(perUser))
      .withColumn("week_offset",
        (datediff($"wk".cast("date"), $"cohort_wk".cast("date")) / 7)
          .cast("long"))
      .groupBy($"cohort_wk", $"week_offset")
      .agg(count(lit(1)).cast("long").as("n_active"))
      .withColumn("cohort_size",
        sum(when($"week_offset" === 0, $"n_active")).over(perCohort)
          .cast("long"))
      .select($"cohort_wk", $"week_offset", $"n_active", $"cohort_size",
        ($"n_active".cast("double") / $"cohort_size").as("retention"))
      .orderBy($"cohort_wk", $"week_offset")
  }

  private val retentionOracle =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
      |), c AS (
      |  SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY 1
      |), sizes AS (
      |  SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS cohort_size
      |  FROM c GROUP BY 1
      |), j AS (
      |  SELECT c.cohort_wk,
      |         CAST((CAST(u.wk AS DATE) - CAST(c.cohort_wk AS DATE)) // 7
      |              AS BIGINT) AS week_offset
      |  FROM uw u JOIN c ON u.user_id = c.user_id
      |)
      |SELECT j.cohort_wk, j.week_offset,
      |       CAST(COUNT(*) AS BIGINT) AS n_active,
      |       s.cohort_size,
      |       CAST(COUNT(*) AS DOUBLE) / s.cohort_size AS retention
      |FROM j JOIN sizes s ON j.cohort_wk = s.cohort_wk
      |GROUP BY 1, 2, s.cohort_size
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q109

  /** Within-session event-type transition matrix — the first-order Markov
    * view of user behavior (what follows what), the behavioral-analytics
    * twin of q95's fixed funnel: every adjacent pair inside a session
    * (q66's boundaries: same user, gap ≤ 30 min, (ts, event_id) order)
    * counts one (from_type, to_type) transition; `share` is each cell's
    * exact fraction of all transitions.
    *
    * 100 TB shape: the SAME single user-keyed exchange as q66 — session
    * index, the lead() pair, and the boundary filter all ride the one
    * per-user window stack; the transition agg collapses to |types|² ≤ 25
    * rows, so the global share window runs over a dimension-sized frame
    * (one tiny task), never over event-sized data. */
  def sessionTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val order = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"event_type",
        (unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(order))
          .as("gap_us"))
      .withColumn("session_idx",
        sum(when($"gap_us".isNull || $"gap_us" > SESSION_GAP_US, 1)
          .otherwise(0)).over(run).cast("long"))
      .withColumn("to_type", lead($"event_type", 1).over(order))
      .withColumn("to_session", lead($"session_idx", 1).over(order))
    val cells = tagged
      .filter($"to_type".isNotNull && $"to_session" === $"session_idx")
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).cast("long").as("transitions"))
    val all = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("share",
        $"transitions".cast("double") / sum($"transitions").over(all))
      .orderBy($"from_type", $"to_type")
  }

  private val transitionsOracle =
    s"""WITH e AS (
       |  SELECT user_id, event_id, ts, event_type,
       |         epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), si AS (
       |  SELECT *,
       |         SUM(CASE WHEN gap_us IS NULL OR gap_us > $SESSION_GAP_US
       |                  THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS session_idx
       |  FROM e
       |), s AS (
       |  SELECT *,
       |         LEAD(event_type) OVER w AS to_type,
       |         LEAD(session_idx) OVER w AS to_session
       |  FROM si
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), c AS (
       |  SELECT event_type AS from_type, to_type,
       |         CAST(COUNT(*) AS BIGINT) AS transitions
       |  FROM s
       |  WHERE to_type IS NOT NULL AND to_session = session_idx
       |  GROUP BY 1, 2
       |)
       |SELECT from_type, to_type, transitions,
       |       CAST(transitions AS DOUBLE) / SUM(transitions) OVER () AS share
       |FROM c ORDER BY from_type, to_type""".stripMargin

  val all: Seq[Query] = Seq(
    Query("q66_sessionization",
      "gap-based sessions per user (30 min), one shuffle + per-user windows",
      sessionize, Some(sessionizeOracle), headline = false),
    Query("q67_asof_attribution",
      "as-of join: purchases attributed to the latest prior view/click via union+window",
      asofAttribution, Some(asofOracle), headline = false),
    Query("q73_props_extract",
      "JSON props field extraction + per-type aggregates (scan-stage projection)",
      propsExtract, Some(propsExtractOracle), headline = false),
    Query("q78_daily_moving_avg",
      "7-day trailing moving average via a calendar-correct integer RANGE frame",
      dailyMovingAvg, Some(dailyMovingAvgOracle), headline = false),
    Query("q95_event_funnel",
      "ordered view→click→purchase funnel: stage reach + exact inter-stage latency in one exchange",
      eventFunnel, Some(funnelOracle), headline = false),
    Query("q97_retention_cohorts",
      "weekly retention cohort table: first-event ISO-week cohorts × week offset, exact counts + rates",
      retentionCohorts, Some(retentionOracle), headline = false),
    Query("q109_session_transitions",
      "within-session event-type transition matrix (first-order Markov counts + exact shares)",
      sessionTransitions, Some(transitionsOracle), headline = false))
}
