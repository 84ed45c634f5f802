package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType}

/** Sequence analytics over the event stream — the ClickHouse
  * `windowFunnel`/`retention` aggregate pair (the analytics its users run
  * on exactly the klogs-shaped table this engine maintains).
  *
  * Semantics (declarative, so the DuckDB oracle can state them as EXISTS
  * joins rather than replaying an imperative scan):
  *
  *  - [[windowFunnel]]: per user, the funnel LEVEL = the largest k such
  *    that there exist distinct events e₁ … e_k with cond_i(e_i),
  *    ts₁ ≤ ts₂ ≤ … ≤ ts_k, and ts_k − ts₁ ≤ window. The window anchors
  *    at the CHAIN'S OWN first event (any qualifying chain counts), not
  *    at the user's first event.
  *  - [[retention]]: per user, flag₁ = saw a cond₁ event; flag_k = saw a
  *    cond₁ event AND a cond_k event at-or-after it.
  *
  * Scale shape: both are ONE map-side-combined aggregation over the
  * events scan. Funnel state per (user) is the sorted event list of that
  * user's QUALIFYING events only (non-matching rows are dropped before
  * the shuffle), folded by a higher-order `aggregate` into n longs;
  * retention needs just 1 + n running min/max timestamps — no joins, no
  * per-pair blowup, group cardinality = users.
  */
object Funnel {

  /** Greedy fold, exact for the EXISTS semantics above: for each level
    * keep the LATEST possible chain-start timestamp reaching that level —
    * a later start weakly dominates (the extension test is
    * `ts − start ≤ window`), so if any chain reaches level k the greedy
    * state does too (standard exchange argument). Each event's update for
    * level k reads the PRE-event state of level k−1, so one event never
    * powers two adjacent levels of the same chain.
    *
    * `conds` must be row-disjoint or chain-distinctness needs care; the
    * usual funnel conds (disjoint event types) satisfy this trivially.
    */
  def windowFunnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      windowMs: Long,
      conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty, "windowFunnel needs at least one condition")
    val n = conds.length
    val flags = array(conds.map(_.cast(BooleanType)): _*)
    val ev = events
      .select(col(userCol).as("user"),
        unix_millis(col(tsCol)).as("ts"), flags.as("f"))
      .where(col("user").isNotNull && exists(col("f"), x => coalesce(x, lit(false))))
    // equal-timestamp tiebreak: FIRST-MATCHING-CONDITION INDEX ascending.
    // Any witness chain is level-ordered, so ordering same-ts events by
    // their condition index makes every legal chain a subsequence of the
    // processed order — without it the struct sort falls back to the raw
    // flags array, which orders cond₃ BEFORE cond₁ at equal ts and the
    // fold misses chains the declarative semantics admit (caught by
    // FunnelSpec's equal-ts case).
    val condIdx = coalesce(array_position(col("f"), lit(true)), lit(0L))
    val sorted = sort_array(collect_list(
      struct(col("ts"), condIdx.as("ci"), col("f"))))
    def fold(sortedEvents: Column): Column =
      aggregate(
        sortedEvents,
        array((1 to n).map(_ => lit(null).cast(LongType)): _*),
        (st, e) => {
          val ts = e.getField("ts")
          val f = e.getField("f")
          // greatest() skips nulls, which is exactly the null-state merge
          val upd = (1 to n).map { k =>
            val fk = coalesce(f.getItem(k - 1), lit(false))
            if (k == 1) when(fk, greatest(st.getItem(0), ts))
              .otherwise(st.getItem(0))
            else when(fk && st.getItem(k - 2).isNotNull &&
                (ts - st.getItem(k - 2) <= windowMs),
              greatest(st.getItem(k - 1), st.getItem(k - 2)))
              .otherwise(st.getItem(k - 1))
          }
          array(upd: _*)
        })
    ev.groupBy("user")
      .agg(size(filter(fold(sorted), x => x.isNotNull)).as("level"))
  }

  /** Sequence-pattern match per user — ClickHouse
    * `sequenceMatch('(?1).*(?2).*…')`: does a chain of events satisfying
    * cond₁ … cond_n in STRICTLY increasing timestamp order exist?
    * Returns the matched prefix depth and the full-match flag.
    *
    * The fold is the greedy earliest chain — advance the cursor on the
    * first event satisfying the next condition strictly after the current
    * chain tip — which matches iff ANY chain matches (taking the earliest
    * feasible event at each step only widens what can follow; the
    * standard subsequence-matching exchange argument). Strict ordering
    * makes equal-timestamp events mutually unchainable, so tie order
    * cannot change the result. The equivalent declarative form is nested
    * earliest-firsts: m₁ = min ts(cond₁), m_k = min ts(cond_k) > m_{k−1};
    * depth = largest k with m_k defined — which is how the oracle states
    * it in SQL.
    *
    * Same scale shape as [[windowFunnel]]: qualifying rows only into one
    * map-side-combined aggregation, state = sorted qualifying events per
    * user, no joins.
    */
  def sequenceMatch(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty, "sequenceMatch needs at least one condition")
    val n = conds.length
    val flags = array(conds.map(_.cast(BooleanType)): _*)
    val ev = events
      .select(col(userCol).as("user"),
        unix_millis(col(tsCol)).as("ts"), flags.as("f"))
      .where(col("user").isNotNull && exists(col("f"), x => coalesce(x, lit(false))))
    val condIdx = coalesce(array_position(col("f"), lit(true)), lit(0L))
    val sorted = sort_array(collect_list(
      struct(col("ts"), condIdx.as("ci"), col("f"))))
    // state = [matched-prefix length, chain tip ts]
    def fold(sortedEvents: Column): Column =
      aggregate(
        sortedEvents,
        array(lit(0L), lit(Long.MinValue)),
        (st, e) => {
          val idx = st.getItem(0)
          val tip = st.getItem(1)
          val ts = e.getField("ts")
          val advance = idx < n &&
            coalesce(element_at(e.getField("f"),
              (idx + 1).cast(org.apache.spark.sql.types.IntegerType)),
              lit(false)) &&
            ts > tip
          array(when(advance, idx + 1).otherwise(idx),
            when(advance, ts).otherwise(tip))
        })
    ev.groupBy("user")
      .agg(fold(sorted).getItem(0).as("depth"))
      .withColumn("matched", col("depth") === n)
  }

  /** Non-overlapping sequence-match count per user — ClickHouse
    * `sequenceCount('(?1).*(?2)…')`: how many DISJOINT strictly
    * time-increasing cond₁…cond_n chains fit in the user's timeline.
    *
    * Greedy earliest-completion, which maximizes the count (the
    * interval-scheduling exchange argument: finishing a chain as early as
    * possible never blocks a later chain another strategy could fit);
    * after a chain completes, the next one must start strictly after its
    * final event. The oracle replays the same greedy as a recursive CTE
    * of nested earliest-mins — agreement of the imperative fold and the
    * declarative recursion is the check.
    */
  def sequenceCount(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty, "sequenceCount needs at least one condition")
    val n = conds.length
    val flags = array(conds.map(_.cast(BooleanType)): _*)
    val ev = events
      .select(col(userCol).as("user"),
        unix_millis(col(tsCol)).as("ts"), flags.as("f"))
      .where(col("user").isNotNull && exists(col("f"), x => coalesce(x, lit(false))))
    val condIdx = coalesce(array_position(col("f"), lit(true)), lit(0L))
    val sorted = sort_array(collect_list(
      struct(col("ts"), condIdx.as("ci"), col("f"))))
    // state = [chains completed, matched-prefix length, chain tip ts]
    def fold(sortedEvents: Column): Column =
      aggregate(
        sortedEvents,
        array(lit(0L), lit(0L), lit(Long.MinValue)),
        (st, e) => {
          val cnt = st.getItem(0)
          val idx = st.getItem(1)
          val tip = st.getItem(2)
          val ts = e.getField("ts")
          val advance = idx < n &&
            coalesce(element_at(e.getField("f"),
              (idx + 1).cast(org.apache.spark.sql.types.IntegerType)),
              lit(false)) &&
            ts > tip
          val idxAdv = when(advance, idx + 1).otherwise(idx)
          val completed = idxAdv === n
          array(
            when(completed, cnt + 1).otherwise(cnt),
            when(completed, lit(0L)).otherwise(idxAdv),
            when(advance, ts).otherwise(tip))
        })
    ev.groupBy("user")
      .agg(fold(sorted).getItem(0).as("n_chains"))
  }

  /** Gap-based session reconstruction — the batch twin of the streaming
    * `session_window` (same semantics Spark's session windows implement:
    * a session extends while consecutive events are ≤ `gapMs` apart).
    * Returns one row per session: user, ordinal session number (by time),
    * start/end millis, event count.
    *
    * One hash exchange on user (the window partition), then two narrow
    * window passes — the break flag via `lag`, the session number via a
    * running sum — and the per-session aggregate rides the same
    * partitioning.
    */
  def sessionize(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapMs: Long): DataFrame = {
    // ORDER BY ts alone: equal-timestamp events sort in any order, but the
    // ts-value SEQUENCE each user sees is identical under every such
    // order, so break positions — and the per-session aggregates — are
    // deterministic without a tiebreak column
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user").orderBy("ts")
    val withBreaks = events
      .where(col(userCol).isNotNull)
      .select(col(userCol).as("user"), unix_millis(col(tsCol)).as("ts"))
      .withColumn("is_break",
        when(col("ts") - lag(col("ts"), 1).over(byUser) > gapMs ||
          lag(col("ts"), 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("session", sum(col("is_break")).over(
        byUser.rowsBetween(Long.MinValue, 0)))
    withBreaks.groupBy("user", "session")
      .agg(min(col("ts")).as("start_ms"), max(col("ts")).as("end_ms"),
        count(lit(1)).as("n_events"))
  }

  /** Retention flags per user: `r1` = any cond₁ event; `r_k` = a cond₁
    * event followed (at-or-after) by a cond_k event — i.e.
    * `min ts(cond₁) ≤ max ts(cond_k)`. Output columns `r1 … rN`.
    */
  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty, "retention needs at least one condition")
    val ts = unix_millis(col(tsCol))
    val first = min(when(conds.head, ts))
    val aggs =
      first.isNotNull.as("r1") +:
        conds.tail.zipWithIndex.map { case (c, i) =>
          // coalesce: no cond_k event → max is NULL → the comparison is
          // NULL, and the flag must read false, not null
          coalesce(first.isNotNull && (max(when(c, ts)) >= first),
            lit(false)).as(s"r${i + 2}")
        }
    events.where(col(userCol).isNotNull)
      .groupBy(col(userCol).as("user"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
