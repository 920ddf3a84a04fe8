package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential conversion funnels over an event stream — "did the user
  * click, THEN view, THEN purchase, each strictly after the previous
  * stage's first completion?" The per-stage anchor is the EARLIEST
  * qualifying event (first-touch attribution), which makes the result
  * a pure function of the event set: no window ordering, no session
  * state, deterministic under any partitioning.
  *
  * Scale shape: per stage, one narrow filter on the event scan, one
  * map-side-combining min aggregation keyed by user, and one join
  * against the (users × stages-so-far) frame — which is user-cardinality
  * sized, orders of magnitude below event cardinality, so each round
  * shuffles the small side of a shrinking funnel. Stage count is the
  * (small, fixed) number of rounds; nothing is quadratic.
  */
object Funnel {

  /** Per-user funnel over `stages` (event-type values, in order):
    * returns user_id, t_<i> (epoch-micros of the first stage-i event
    * strictly after t_<i-1>, null if never), and stage_reached. Users
    * appear even at stage 0.
    */
  def firstTouch(events: DataFrame, user: Column, etype: Column,
      ts: Column, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events.select(user.as("user_id"), etype.as("et"),
      unix_micros(ts).as("us"))
    val users = ev.select(col("user_id")).distinct()
    val withStages = stages.zipWithIndex.foldLeft(users) {
      case (acc, (stage, i)) =>
        val tPrev = if (i == 0) lit(Long.MinValue) else col(s"t$i")
        val anchored =
          if (i == 0) ev.filter(col("et") === stage)
            .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
          else acc.select(col("user_id"), tPrev.as("__prev"))
            .filter(col("__prev").isNotNull)
            .join(ev.filter(col("et") === stage), Seq("user_id"))
            .filter(col("us") > col("__prev"))
            .groupBy(col("user_id")).agg(min(col("us")).as(s"t${i + 1}"))
        acc.join(anchored.select(col("user_id"), col(s"t${i + 1}")),
          Seq("user_id"), "left")
    }
    // ascending fold nests later stages outermost, so the deepest
    // non-null stage wins
    val reached = stages.indices.foldLeft(lit(0L)) {
      case (acc, i) => when(col(s"t${i + 1}").isNotNull, lit(i + 1L))
        .otherwise(acc)
    }
    withStages.withColumn("stage_reached", reached)
  }

  /** Weekly retention cohorts: users grouped by their first-active
    * epoch-week; for each (cohort, weeks-since) cell, how many of the
    * cohort's users were active that week. Weeks are pure integer
    * arithmetic on event time (epoch-micros div day div 7) — no
    * calendar functions, so the bucketing is identical in any engine
    * and timezone-free.
    *
    * Scale shape: one narrow projection, one distinct on (user, week)
    * — map-side combining collapses each user's events per week before
    * the shuffle — one min-agg for cohorts, one user-keyed join of two
    * user-cardinality relations, one final count agg. Events appear
    * only in the first distinct; everything after is user-sized.
    */
  def retentionCohorts(events: DataFrame, user: Column, ts: Column)
      : DataFrame = {
    // Integer *floor* division, never `/` and never bare `div`: a float
    // division of epoch micros can land 1 ulp under an exact midnight
    // boundary and truncate into the previous day, and Spark's `div`
    // truncates toward zero while the DuckDB oracle's `//` floors —
    // pre-1970 timestamps would bucket into different weeks across
    // engines. Subtracting pmod (always non-negative) before `div`
    // makes the dividend exactly divisible, so truncation == floor.
    val weeks = events
      .select(user.as("user_id"), ts.as("ts"))
      .select(col("user_id"),
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))" +
          " div 86400000000").as("day"))
      .select(col("user_id"),
        expr("(day - pmod(day, 7)) div 7").as("week"))
      .distinct()
    val cohorts = weeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    weeks.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(count(lit(1)).as("n_users"))
  }
}
