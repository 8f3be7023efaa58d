package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream analytics over the `events` table — windowed aggregation
  * and gap-based sessionization (the watermark/window surface of SURVEY
  * §2.9 T6, exercised as first-class operators).
  */
object EventAnalytics {

  /** As-of join — each `left` row paired with the LATEST `right` row at
    * or before its timestamp, per key (trade/quote matching, attribution,
    * slowly-changing-dimension lookups). Spark has no native ASOF JOIN;
    * the naive range join is O(|L|·|R|) per key. This is the standard
    * LINEAR formulation: union both sides tagged, one window per key
    * carrying the last-seen right row forward, keep the left rows.
    *
    * Scale shape: ONE shuffle (window partitioned by key); per-task state
    * is a single right-row struct, never a buffered range. Deterministic
    * under ties: at equal timestamps the right row sorts first (so a
    * same-instant right row IS visible to the left row — "at or before"),
    * and duplicate timestamps within a side tie-break on `seqCol`
    * (highest wins, being last in window order).
    *
    * Output: struct columns `l` (every left column) and `r` (the matched
    * right row, NULL when no right row precedes).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      seqCol: String): DataFrame = {
    val lp = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), col(seqCol).as("__seq"),
      lit(1).as("__is_l"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(right.schema).as("__r"))
    val rp = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), col(seqCol).as("__seq"),
      lit(0).as("__is_l"),
      lit(null).cast(left.schema).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__is_l"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lp.unionByName(rp)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_l") === 1)
      .select(col("__l").as("l"), col("__m").as("r"))
  }

  /** [[asOfJoin]] with a staleness bound (pandas `merge_asof(tolerance=)`
    * semantics): a match older than `toleranceUs` microseconds is nulled
    * out — attribution windows ("credit the click only if within 24 h")
    * without a second pass. Same single-shuffle plan; the tolerance is a
    * post-match null-out, not a join-condition change, so carried state
    * stays O(1) per task.
    */
  def asOfJoinWithin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      seqCol: String,
      toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, s"tolerance must be non-negative, got $toleranceUs")
    asOfJoin(left, right, keyCol, tsCol, seqCol)
      .withColumn("r",
        when(col("r").isNotNull &&
          unix_micros(col(s"l.$tsCol")) - unix_micros(col(s"r.$tsCol")) <= toleranceUs,
          col("r")))
  }

  /** Gap-based sessionization: within each user's timeline, a new session
    * starts when the gap to the previous event exceeds `maxGapMinutes`.
    * Adds `session_seq` (1-based per user).
    *
    * Scale shape: one window partitioned BY USER — parallelism is the
    * number of users, each task holds one user's events (bounded), never
    * a global sort. Ordering ties broken on `orderCol` so the session
    * numbering is deterministic.
    */
  def sessionize(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      maxGapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(orderCol))
    val gapUs = maxGapMinutes * 60L * 1000000L
    val prevTs = lag(unix_micros(col(tsCol)), 1).over(w)
    events
      .withColumn("__new_session",
        when(prevTs.isNull || unix_micros(col(tsCol)) - prevTs > gapUs, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("__new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Per-session statistics: event count, start (unix micros), duration
    * (micros), value sum. Exact-integer times keep the output
    * oracle-comparable.
    */
  def sessionStats(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      orderCol: String,
      valueCol: String,
      maxGapMinutes: Int = 30): DataFrame =
    sessionize(events, userCol, tsCol, orderCol, maxGapMinutes)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol)))).as("duration_us"),
        round(sum(col(valueCol)), 3).as("sum_value"))

  /** Ordered conversion funnel: how many users complete each prefix of
    * `steps` with strictly increasing timestamps (the classic
    * signup → view → click → purchase product-analytics query). A user
    * counts for step i iff events e_0 < e_1 < … < e_i exist with
    * `typeCol(e_j) = steps(j)`; each step matches the EARLIEST qualifying
    * event after the previous step's match — greedy-earliest is optimal
    * here (minimizing t_j can only enlarge the candidate set for t_{j+1}),
    * so this computes the exact per-step user counts.
    *
    * Scale shape: one filtered min-aggregation per step, shuffled on the
    * user key. The carried frame is one row per user still in the funnel —
    * it shrinks monotonically, and each step's join probes the raw events
    * (filtered to ONE event type, so the scan prunes on `typeCol`) against
    * that per-user frame. k steps = k shuffles of strictly decreasing
    * size; no global window, no per-user event buffering.
    *
    * Output: one row per step — `step_idx` (0-based), `step`, `n_users`.
    */
  /** Multi-touch conversion ATTRIBUTION: for every conversion event,
    * which marketing touch gets the credit — `first_touch` (the user's
    * earliest qualifying touch before the conversion) and `last_touch`
    * (the latest), counted per (first, last) pair. The two classic
    * single-touch models read off the two margins of this output; a
    * linear/positional model needs the same window with a collected
    * touch count, same plan shape.
    *
    * A touch attributes to a conversion when it sorts STRICTLY before it
    * in the user's (ts, id) order — the id tiebreak makes simultaneous
    * touch/conversion rows deterministic across engines. Conversions
    * with no preceding touch report NULL (counted, not dropped: unattributed
    * conversions are the number a marketing report most needs).
    *
    * Scale shape: ONE window shuffle partitioned by user (running
    * first/last over a `[unbounded, current-1]` frame — no self-join,
    * no pair enumeration), then a map-side-combined count over at most
    * (|touch types|+1)² groups.
    */
  def attribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      convType: String,
      touchTypes: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes.map(x => x: Any): _*), col(typeCol))
    events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .groupBy("first_touch", "last_touch")
      .agg(count(lit(1)).as("conversions"))
  }

  /** First-order path analysis: counts of consecutive (event_type →
    * next event_type) transitions within each user's timeline — the
    * transition matrix behind "where do users go after X" and Markov-
    * chain journey models.
    *
    * Scale shape: ONE window shuffle partitioned by user (state = one
    * lookahead row per task) followed by a map-side-combined count over
    * the (from, to) pairs — at most |types|² groups. Ordering within a
    * user is (ts, id): the id tiebreak makes same-timestamp transitions
    * deterministic across engines and partitionings.
    */
  def transitions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull) // each user's last event has no successor
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Top-`k` most frequent length-`len` event-type paths (consecutive
    * event sequences per user) — the sequence-mining generalization of
    * [[transitions]]: "what are the commonest click→view→purchase style
    * journeys". One window shuffle per user (same key as every other
    * per-user operator, so a pre-partitioned pipeline reuses the
    * exchange), `len-1` lead()s over it, then the heavy-hitters plan:
    * hash aggregate with map-side partials + `TakeOrderedAndProject`, so
    * only k rows per partition survive into the final ordering no matter
    * the event volume. Ties break lexicographically for determinism.
    */
  def topPaths(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      k: Int,
      len: Int = 3): DataFrame = {
    require(len >= 2, s"path length must be >= 2, got $len")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val steps = col(typeCol) +: (1 until len).map(i => lead(col(typeCol), i).over(w))
    events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      // materialize the window steps before filtering: a window
      // expression is not allowed directly in a Filter
      .select(concat_ws(">", steps: _*).as("path"), steps.last.as("__last"))
      .filter(col("__last").isNotNull) // windows running off the user's tail
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // per-step frames of (user, earliest completion ts), built iteratively
    val reached = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val f = events.filter(col(typeCol) === step)
          .select(col(userCol).as("__u2"), col(tsCol).as("__ts"))
        Some(prev match {
          case None =>
            f.groupBy(col("__u2").as("__u")).agg(min(col("__ts")).as("__t"))
          case Some(p) =>
            f.join(p, f("__u2") === p("__u") && f("__ts") > p("__t"))
              .groupBy(f("__u2").as("__u")).agg(min(col("__ts")).as("__t"))
        })
    }.flatten
    reached.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step_idx"), lit(step).as("step"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** [[funnel]] with a conversion deadline: step i+1 counts only when it
    * happens within `maxGapUs` of the user's step-i completion — the
    * product-analytics semantic ("purchased within 24 h of clicking")
    * that an unbounded funnel overstates. Same shrinking per-step frame
    * shape as [[funnel]]: k joins of monotonically decreasing size, no
    * global window, no event buffering; the gap predicate rides the
    * existing join, adding no shuffle.
    *
    * "Completion" is GREEDY first-qualifying-event: each step anchors at
    * the user's EARLIEST event that satisfies the deadline from the
    * previous anchor, the standard product-analytics convention (and the
    * one a per-step min-aggregate can compute in k bounded joins). This
    * can undercount relative to an exists-any-compliant-chain definition:
    * with a 24 h gap, a@0h, b@10h, b@20h, c@35h anchors b at 10h and
    * rejects c, even though the chain a→b@20h→c@35h is fully compliant.
    * The chain-existence semantic is a per-user sequence scan (state
    * linear in events per user); this operator deliberately trades it
    * for the aggregate shape that needs no such state.
    */
  def funnelWithin(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxGapUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapUs > 0, s"maxGapUs must be positive, got $maxGapUs")
    val reached = steps.scanLeft(Option.empty[DataFrame]) {
      case (prev, step) =>
        val f = events.filter(col(typeCol) === step)
          .select(col(userCol).as("__u2"), col(tsCol).as("__ts"))
        Some(prev match {
          case None =>
            f.groupBy(col("__u2").as("__u")).agg(min(col("__ts")).as("__t"))
          case Some(p) =>
            f.join(p, f("__u2") === p("__u") && f("__ts") > p("__t") &&
                unix_micros(f("__ts")) - unix_micros(p("__t")) <= maxGapUs)
              .groupBy(f("__u2").as("__u")).agg(min(col("__ts")).as("__t"))
        })
    }.flatten
    reached.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step_idx"), lit(step).as("step"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Chain-existence deadline funnel — the EXACT semantic that
    * [[funnelWithin]]'s greedy anchoring deliberately trades away: a user
    * counts for step i iff SOME strictly-increasing event chain
    * e_0 < e_1 < … < e_i exists with `typeCol(e_j) = steps(j)` and every
    * consecutive gap ≤ `maxGapUs`. With a 24 h gap and events a@0h,
    * b@10h, b@20h, c@35h, [[funnelWithin]] anchors b at 10 h and rejects
    * c; this operator finds the compliant chain a→b@20h→c@35h and counts
    * the user at every step.
    *
    * The construction is the reachability DP run as k dataflow steps:
    * frame_i = DISTINCT (user, ts) of step-i-typed events t such that
    * SOME frame_{i-1} row m has m < t ≤ m + maxGapUs — a left-SEMI join
    * (existence, not enumeration), so no pair ever survives a stage.
    * frame_i is exactly the set of feasible step-i anchor times, hence
    * membership at step i ⟺ a compliant chain prefix exists (induction
    * on i).
    *
    * Scale shape: k semi-joins, each equi-keyed on the user with the gap
    * band as a residual predicate; per-stage fanout is bounded by (step-i
    * events × step-i+1 events) PER USER — the same per-key band-join
    * envelope as [[asOfJoin]] — and each frame is at most the distinct
    * (user, ts) pairs of ONE event type. Map-side-combined distincts keep
    * the carried frames minimal; no global window, no per-user event
    * buffering, no O(events) state.
    *
    * Output: one row per step — `step_idx` (0-based), `step`, `n_users`.
    */
  def funnelExists(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxGapUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapUs > 0, s"maxGapUs must be positive, got $maxGapUs")
    val reached = steps.scanLeft(Option.empty[DataFrame]) {
      case (prev, step) =>
        val f = events.filter(col(typeCol) === step)
          .select(col(userCol).as("__u"), col(tsCol).as("__t"))
          .distinct()
        Some(prev match {
          case None => f
          case Some(p0) =>
            val p = p0.select(col("__u").as("__pu"), col("__t").as("__pt"))
            f.join(p,
                f("__u") === p("__pu") && f("__t") > p("__pt") &&
                  unix_micros(f("__t")) - unix_micros(p("__pt")) <= maxGapUs,
                "leftsemi")
        })
    }.flatten
    reached.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count_distinct(col("__u")).as("n_users"))
        .select(lit(i).as("step_idx"), lit(step).as("step"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Per-transition latency of the [[funnel]]: for each consecutive step
    * pair, how long the users who advanced took — count, mean, min, max
    * seconds between the two anchor timestamps. The anchors are exactly
    * [[funnel]]'s (earliest step-i event, then earliest LATER step-i+1
    * event), so `n_users` of transition i equals `funnel`'s count at
    * step i+1 — the same report, widened from "how many converted" to
    * "how fast".
    *
    * Plan shape: the per-step (user, anchor-ts) frames are the funnel's
    * shrinking per-user aggregates; each transition is ONE equi-join of
    * frame i with frame i+1 on the user key (frame i+1's users are a
    * subset, so the join is |frame i+1|-sized) and an O(1)-row stats
    * aggregate. Durations aggregate as exact integer micros (the long
    * sum is exact; the single double division + 6-dp round happens once,
    * per transition, on both engines identically).
    *
    * Output: (step_idx INT — 0-based transition index, transition
    * "a→b", n_users, mean_s, min_s, max_s), one row per transition.
    */
  def funnelLatency(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.length >= 2, "funnelLatency needs at least two steps")
    val reached = steps.scanLeft(Option.empty[DataFrame]) {
      case (prev, step) =>
        val f = events.filter(col(typeCol) === step)
          .select(col(userCol).as("__u2"), col(tsCol).as("__ts"))
        Some(prev match {
          case None =>
            f.groupBy(col("__u2").as("__u")).agg(min(col("__ts")).as("__t"))
          case Some(p) =>
            f.join(p, f("__u2") === p("__u") && f("__ts") > p("__t"))
              .groupBy(f("__u2").as("__u")).agg(min(col("__ts")).as("__t"))
        })
    }.flatten
    reached.sliding(2).toSeq.zipWithIndex.map { case (Seq(a, b0), i) =>
      val b = b0.select(col("__u").as("__bu"), col("__t").as("__bt"))
      val durUs = unix_micros(col("__bt")) - unix_micros(col("__t"))
      a.join(b, col("__u") === col("__bu"))
        .select(durUs.as("__d"))
        .agg(
          count(lit(1)).as("n_users"),
          sum(col("__d")).as("__sum"),
          min(col("__d")).as("__min"),
          max(col("__d")).as("__max"))
        .select(
          lit(i).as("step_idx"),
          lit(s"${steps(i)}→${steps(i + 1)}").as("transition"),
          col("n_users"),
          round(col("__sum").cast("double") / (col("n_users") * lit(1000000.0)), 6)
            .as("mean_s"),
          round(col("__min").cast("double") / 1000000.0, 6).as("min_s"),
          round(col("__max").cast("double") / 1000000.0, 6).as("max_s"))
    }.reduce(_.unionByName(_))
  }

  /** Weekly cohort retention: users are cohorted by the epoch-week of
    * their first event; for each (cohort, week-offset) cell, the number
    * of cohort members active that week and the retained fraction.
    * Weeks are integer `unix_micros div 604800000000` — exact integer
    * arithmetic, no calendar/locale week-start ambiguity across engines.
    *
    * Scale shape: one distinct over (user, week) — the raw event volume
    * collapses to at most |users|·|weeks| rows before anything else —
    * then a per-user min and a join back on the user key (same
    * partitioning, no extra shuffle under AQE), and a final tiny
    * aggregation keyed by (cohort, offset). State is never
    * O(events); the only full-data pass is the map-side-combined
    * distinct.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val activity = events
      // integral floor division via the pmod identity (not `/`, which is
      // double division, and not `div`, which truncates toward zero and
      // would disagree with DuckDB's floor `//` for pre-1970 timestamps)
      .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("__us"))
      .select(col("__u"),
        expr(s"(__us - pmod(__us, ${weekUs}L)) div ${weekUs}L").as("week"))
      .distinct()
    val cohorts = activity.groupBy("__u").agg(min("week").as("cohort_week"))
    val sizes = cohorts.groupBy("cohort_week").agg(count(lit(1)).as("__n0"))
    activity.join(cohorts, "__u")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .join(sizes, "cohort_week")
      .select(
        col("cohort_week"),
        date_format(timestamp_micros(col("cohort_week") * weekUs), "yyyy-MM-dd")
          .as("cohort_start"),
        col("week_offset"), col("n_users"),
        round(col("n_users").cast("double") / col("__n0"), 6).as("retention"))
  }

  /** Per-event session assignment for a micro-batch of one user's events,
    * continuing from carried state. Shared by the batch window path and
    * the stateful streaming path so both produce identical numbering.
    */
  final case class SessionState(lastTsUs: Long, sessionSeq: Long)
  final case class SessionedEvent(
      user_id: Long, event_id: Long, ts_us: Long, session_seq: Long)

  /** Stateful streaming sessionization via `flatMapGroupsWithState` —
    * the custom-state surface of Structured Streaming: session numbering
    * survives across micro-batches (a gap that spans two batches does
    * NOT restart numbering, which the per-batch window formulation
    * cannot express).
    *
    * Scale shape: state is one (lastTs, seq) pair per user key — O(users)
    * state store entries, no per-event state growth. Events within a
    * batch are sorted per group in memory; groups are the unit of
    * parallelism.
    */
  def streamingSessionize(
      events: org.apache.spark.sql.Dataset[(Long, Long, Long)], // (user_id, event_id, ts_us)
      maxGapMinutes: Int = 30): org.apache.spark.sql.Dataset[SessionedEvent] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
    implicit val outEnc: Encoder[SessionedEvent] = Encoders.product[SessionedEvent]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    val gapUs = maxGapMinutes * 60L * 1000000L

    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (user: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[SessionState]) =>
        var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
        val out = rows.toVector.sortBy(r => (r._3, r._2)).map { case (_, eventId, tsUs) =>
          val newSession = st.lastTsUs == Long.MinValue || tsUs - st.lastTsUs > gapUs
          st = SessionState(tsUs, if (newSession) st.sessionSeq + 1 else st.sessionSeq)
          SessionedEvent(user, eventId, tsUs, st.sessionSeq)
        }
        state.update(st)
        out.iterator
    }
  }

  /** Streaming hourly counts with a watermark — the T6 surface: late rows
    * beyond `watermarkDelay` are dropped, state for closed windows is
    * evicted. Feed with `spark.readStream`; aggregate matches the batch
    * `window()` group-by exactly for in-order data.
    */
  def streamingHourlyCounts(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      watermarkDelay: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 hour").as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour_start"), col(keyCol), col("n"))

  /** Watermarked STREAM-STREAM interval join — the ad-tech canonical
    * "which click followed which impression": clicks join impressions
    * of the same user landing within `maxGap` of the impression. Both
    * sides carry watermarks AND the join condition bounds the time
    * skew, which is what lets Structured Streaming EVICT join state:
    * an impression older than watermark + maxGap can never match a
    * future click, so per-side state is O(events per watermark+gap
    * window), never O(stream history) — without the bound the state
    * store grows forever and the job dies at day 3, the classic
    * stream-join production failure. Inner join ⇒ append-mode output;
    * the batch equivalent on static frames is the same expression,
    * which is how the spec pins correctness.
    */
  def streamingClickAttribution(
      impressions: DataFrame,
      clicks: DataFrame,
      userCol: String,
      impTsCol: String,
      clickTsCol: String,
      impIdCol: String,
      clickIdCol: String,
      maxGap: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val i = impressions.withWatermark(impTsCol, watermarkDelay).as("i")
    val c = clicks.withWatermark(clickTsCol, watermarkDelay).as("c")
    i.join(c,
        col(s"i.$userCol") === col(s"c.$userCol") &&
          col(s"c.$clickTsCol") >= col(s"i.$impTsCol") &&
          col(s"c.$clickTsCol") <= col(s"i.$impTsCol") + expr(s"INTERVAL $maxGap"),
        "inner")
      .select(col(s"i.$userCol").as(userCol),
        col(s"i.$impIdCol").as(impIdCol),
        col(s"c.$clickIdCol").as(clickIdCol),
        ((col(s"c.$clickTsCol").cast("long")) -
          col(s"i.$impTsCol").cast("long")).as("gap_seconds"))
  }

  /** Streaming event-id dedup with bounded state: an at-least-once
    * ingestion (retried producers, replayed partitions) becomes
    * effectively-once events. `dropDuplicatesWithinWatermark` keys state
    * by `idCol` and evicts entries once the watermark passes — state is
    * O(events per watermark window), never O(stream history). Duplicates
    * arriving within `watermarkDelay` of the original are suppressed;
    * the batch equivalent over a static frame is a plain
    * `dropDuplicates(idCol)`.
    */
  def streamingDedupEvents(
      stream: DataFrame,
      tsCol: String,
      idCol: String,
      watermarkDelay: String = "30 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCol)

  /** Sliding-window counts: `window(ts, winDur, slideDur)` replicates each
    * event into winDur/slideDur overlapping windows BEFORE the aggregate —
    * a map-side expand feeding a partial-combined hash agg, so the shuffle
    * carries (windows x keys) partial rows per task, never the event
    * stream itself. The streaming variant is the same plan plus a
    * watermark; batch output below matches it for in-order data.
    */
  def slidingCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      winDur: String,
      slideDur: String): DataFrame =
    events
      .groupBy(window(col(tsCol), winDur, slideDur).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 3).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col(keyCol), col("n"), col("sum_value"))

  /** Per-(user, day) activity z-scores: days whose event count deviates
    * from that user's mean by more than `zCut` sigmas. Two aggregates —
    * per-day counts, then per-user moment sums — and one join on the user
    * key; all sums are integers (exact), the mean/variance/z arithmetic is
    * a fixed IEEE double expression, so the result is deterministic and
    * oracle-checkable despite being "statistics". Variance uses the moment
    * identity (sumsq − sum²/n)/(n−1); users need `minDays` observed days,
    * and z is rounded to 6 decimals BEFORE the cut filter (float-compare
    * rule).
    */
  def dailyCountAnomalies(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      minDays: Int,
      zCut: Double): DataFrame = {
    val byDay = events
      .groupBy(col(userCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val byUser = byDay
      .groupBy(col(userCol).as("u"))
      .agg(
        count(lit(1)).as("days"),
        sum(col("n")).as("sum_n"),
        sum(col("n") * col("n")).as("sum_n2"))
    val mean = col("sum_n").cast("double") / col("days")
    val variance = (col("sum_n2").cast("double") -
      col("sum_n").cast("double") * col("sum_n") / col("days")) / (col("days") - 1)
    byDay
      .join(byUser, col(userCol) === col("u"))
      .filter(col("days") >= minDays && variance > 0)
      .withColumn("z", round((col("n") - mean) / sqrt(variance), 6))
      .filter(abs(col("z")) > zCut)
      .select(col(userCol), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"), col("z"))
  }

  /** Kaplan–Meier survival curve for time-to-conversion: S(t) = the
    * probability a user has NOT yet converted t days after their first
    * `startType` event, with users who never convert CENSORED at their
    * last activity — the estimator that uses non-converters' partial
    * observation instead of discarding them (a plain mean
    * time-to-convert is biased low by exactly those drop-outs).
    *
    * Shape: the stream collapses to one (duration, is_event) row per
    * user, then to the per-day histogram; at-risk counts come from ONE
    * cumulative window over the bounded day axis (the ksTest pattern),
    * and the survival product is carried as a cumulative sum of
    * 12-dp-rounded `ln(1 − d/n)` terms (decimal, order-free) —
    * exponentiated and 6-dp-rounded once per output row, so both
    * engines replay the curve digit-for-digit. Output: one row per
    * distinct conversion day.
    */
  def survivalCurve(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      startType: String,
      eventType: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val perUser = events
      .groupBy(col(userCol).as("u"))
      .agg(
        min(when(col(typeCol) === startType, col(tsCol))).as("t0"),
        min(when(col(typeCol) === eventType, col(tsCol))).as("tc"),
        max(col(tsCol)).as("tlast"))
      .filter(col("t0").isNotNull)
      // conversions strictly before the start are not conversions OF the
      // start; such users are censored like any non-converter
      .withColumn("is_event", col("tc").isNotNull && col("tc") >= col("t0"))
      .withColumn("dur",
        when(col("is_event"), datediff(col("tc"), col("t0")))
          .otherwise(datediff(col("tlast"), col("t0"))).cast("long"))
    val hist = perUser.groupBy(col("dur"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("is_event"), 1L).otherwise(0L)).as("d"))
    val wc = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val risk = hist
      .withColumn("n_le", sum(col("n_total")).over(wc))
      .withColumn("n_all", sum(col("n_total")).over(
        wAll.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      // at risk at day t = everyone whose observed duration is >= t
      .withColumn("n_risk", col("n_all") - col("n_le") + col("n_total"))
    risk
      // d = n_risk extinguishes the curve: ln(0) is not a number either
      // engine rounds — carry a cumulative zero flag instead
      .withColumn("lnterm",
        when(col("d") > 0 && col("d") < col("n_risk"),
          round(log(lit(1.0) - col("d").cast("double") /
            col("n_risk").cast("double")), 12))
          .otherwise(lit(0.0))
        .cast(DecimalType(28, 12)))
      .withColumn("extinct",
        max(when(col("d") >= col("n_risk"), 1).otherwise(0)).over(wc))
      .withColumn("lnsum", sum(col("lnterm")).over(wc))
      .filter(col("d") > 0)
      .select(col("dur").as("day"), col("n_risk"), col("d").as("n_events"),
        when(col("extinct") === 1, lit(0.0))
          .otherwise(round(exp(col("lnsum").cast("double")), 6))
          .as("survival"))
      .orderBy("day")
  }

  /** Robust (median/MAD) companion to [[dailyCountAnomalies]]: flags
    * (event-type, day) cells whose daily volume deviates from that
    * type's MEDIAN by more than `cut` robust standard deviations
    * (MAD · 1.4826 — the normal-consistency constant). Mean/σ anomaly
    * detection is itself corrupted by the outliers it hunts; the
    * median/MAD pair has a 50% breakdown point, so one crazy ingest day
    * cannot mask another. Shape: one events scan collapses to the
    * (types × days) grid, then two per-type exact-percentile aggregates
    * (state bounded by days-per-type — swap in [[Sketches.gridQuantiles]]
    * if the day axis ever outgrows memory). Types whose MAD is 0 (half
    * the days identical) yield NULL scores and are never flagged rather
    * than dividing by zero. Scores are rounded to 6 dp BEFORE the cut
    * filter so the flag set is engine-stable.
    */
  def anomalyMadDaily(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      cut: Double): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("event_type"),
        date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val med = daily.groupBy(col("event_type").as("__t"))
      .agg(percentile(col("n"), lit(0.5)).as("med"))
    val dev = daily.join(med, col("event_type") === col("__t"))
      .withColumn("ad", abs(col("n") - col("med")))
    val mad = dev.groupBy(col("event_type").as("__t2"))
      .agg(percentile(col("ad"), lit(0.5)).as("mad"))
    dev.join(mad, col("event_type") === col("__t2"))
      .withColumn("score",
        when(col("mad") > 0.0,
          round((col("n") - col("med")) / (lit(1.4826) * col("mad")), 6)))
      .filter(abs(col("score")) >= cut)
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"), round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
        col("score"))
      .orderBy("event_type", "day")
  }

  /** Point-in-time rolling features: for EVERY event row, aggregates over
    * that key's trailing `windowUs`-microsecond window ending at (and
    * including) the row — the leakage-free feature-engineering primitive
    * ("activity in the 24 h before this event") that a naive band
    * self-join computes in O(n·w) pairs. A RANGE window frame computes it
    * in one pass: ONE shuffle (partition by key), per-task state is the
    * sliding frame, and rows with equal timestamps are frame PEERS in
    * both engines (deterministic under ties without a seq column).
    *
    * Returns the row id with trailing count, 3-dp-rounded value sum, and
    * count of rows matching `matchType` (a FILTERed count) — the float
    * rounding bounds segment-tree-vs-sequential summation divergence.
    */
  def rollingFeatures(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      typeCol: String,
      matchType: String,
      windowUs: Long): DataFrame = {
    require(windowUs > 0, s"window must be positive, got $windowUs")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowUs, Window.currentRow)
    events.select(
      col(idCol),
      col(keyCol),
      count(lit(1)).over(w).as("n_win"),
      round(sum(col(valueCol)).over(w), 3).as("sum_win"),
      sum(when(col(typeCol) === matchType, 1L).otherwise(0L)).over(w)
        .as("n_match_win"))
  }

  /** Time-series regularization: per key, an hourly series from the key's
    * first to its last event hour with GAP HOURS FILLED IN — `n = 0` for
    * hours with no events — and the last observed event type carried
    * forward across the gap (forward fill). The resample + ffill step
    * that turns an irregular event stream into the regular grid
    * feature pipelines and charting layers expect.
    *
    * Formulation: no calendar-grid join. One hourly aggregate per
    * (key, hour), then `lead(hour)` per key, and each observed bucket
    * EXPLODES `sequence(h, next_h - 1)` — emitting itself plus exactly
    * the empty buckets that follow it, which inherit its `last_type`
    * (the forward fill falls out of the formulation; no
    * last-ignore-nulls second window). ONE shuffle (the per-key hourly
    * aggregate; the window reuses its partitioning). The in-bucket
    * "last event" is taken by `max_by` over a composite bigint
    * (in-bucket micro offset ⊕ seq) — a scalar both engines order
    * identically, sidestepping struct-ordering differences.
    *
    * Scale: output volume is Σ per-key spans — bounded by keys × horizon
    * hours, not by event count; the explode is generated adjacent to its
    * predecessor so no skewed single task materializes the grid.
    */
  def gapFillHourly(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      seqCol: String): DataFrame = {
    val us = unix_micros(col(tsCol))
    val hourUs = 3600000000L
    val h = (us / hourUs).cast("long")
    val inBucketOrd = (us - h * hourUs) * 10000000L + col(seqCol)
    // ONE physical shuffle: hash-partitioning on the key alone satisfies
    // both the (key, hour) aggregate's clustering AND the window's
    // partitioning, so the explicit repartition replaces what would
    // otherwise be two back-to-back exchanges ((key, h) then (key))
    val hourly = events
      .repartition(col(keyCol))
      .groupBy(col(keyCol), h.as("h"))
      .agg(
        count(lit(1)).as("n"),
        max_by(col(typeCol), inBucketOrd).as("last_type"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("h"))
    hourly
      .withColumn("next_h", lead(col("h"), 1).over(w))
      .select(
        col(keyCol), col("h"), col("n"), col("last_type"),
        explode(sequence(col("h"),
          coalesce(col("next_h") - 1, col("h")))).as("bucket_h"))
      .select(
        col(keyCol),
        col("bucket_h"),
        date_format(timestamp_micros(col("bucket_h") * hourUs),
          "yyyy-MM-dd HH:00:00").as("bucket_start"),
        when(col("bucket_h") === col("h"), col("n")).otherwise(0L).as("n"),
        col("last_type").as("carried_type"))
  }

  /** Deterministic A/B readout: users split by `userCol % 2` (the
    * reproducible stand-in for an assignment table — swap in a real one
    * by joining it upstream), per-user metric = sum of `valueCol`, then
    * a Welch z on the two user-level populations:
    *
    *   z = (mean₁ − mean₀) / √(var₀/n₀ + var₁/n₁)
    *
    * One row: n/mean/var per arm, diff, z. Two aggregates end-to-end —
    * user-level (map-side combined, shuffle keyed on the user) and the
    * 1-row arm rollup; nothing driver-side, so the same plan holds over
    * any user count. Exactness: per-event values are 2-dp, so the
    * per-user and per-arm sums are exact DECIMALs; means/variances are
    * a fixed sequence of double ops over those exact sums (deterministic
    * across engines — no float accumulation anywhere), rounded once at
    * the output. Variance is the n−1 sample form; z is NULL for a
    * degenerate arm (n < 2 or zero variance) rather than ±Inf.
    */
  def abTest(events: DataFrame, userCol: String, valueCol: String): DataFrame = {
    val perUser = events
      .groupBy(col(userCol).as("u"))
      // re-narrowed to (18,2): keeps x·x inside both engines' 38-digit
      // decimal ceiling (DuckDB errors rather than widens past 38); a
      // per-user total beyond 1e16 would overflow — not a realistic
      // metric magnitude
      .agg(sum(col(valueCol).cast(DecimalType(18, 2)))
        .cast(DecimalType(18, 2)).as("x"))
      .select((col("u") % 2).cast("int").as("variant"), col("x"))
    val perArm = perUser.groupBy(col("variant"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum((col("x") * col("x")).cast(DecimalType(38, 4))).as("sxx"))
      .select(col("variant"), col("n"),
        (col("sx").cast("double") / col("n")).as("mean"),
        when(col("n") > 1,
          (col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") / col("n")) /
            (col("n") - 1)).as("variance"))
    perArm.agg(
        max(when(col("variant") === 0, col("n"))).as("n_0"),
        max(when(col("variant") === 1, col("n"))).as("n_1"),
        max(when(col("variant") === 0, col("mean"))).as("m_0"),
        max(when(col("variant") === 1, col("mean"))).as("m_1"),
        max(when(col("variant") === 0, col("variance"))).as("v_0"),
        max(when(col("variant") === 1, col("variance"))).as("v_1"))
      .select(
        col("n_0"), col("n_1"),
        round(col("m_0"), 6).as("mean_0"), round(col("m_1"), 6).as("mean_1"),
        round(col("v_0"), 6).as("var_0"), round(col("v_1"), 6).as("var_1"),
        round(col("m_1") - col("m_0"), 6).as("diff"),
        when(col("v_0") / col("n_0") + col("v_1") / col("n_1") > 0.0,
          round((col("m_1") - col("m_0")) /
            sqrt(col("v_0") / col("n_0") + col("v_1") / col("n_1")), 6))
          .as("z_score"))
  }
}
