package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the ingestion contract
  * check every production pipeline runs before letting a batch into
  * the corpus (null fractions, value domains, ranges, referential
  * integrity). The design constraint at 100 TB is pass count, not
  * expressiveness: N checks must cost ONE scan, so every check is a
  * conditional count fused into a single aggregation (map-side
  * combined, whole-stage codegen) — never one job per check, which is
  * how naive validators turn a 20-check contract into 20 full scans.
  *
  * A predicate evaluating to NULL counts as a VIOLATION: SQL boolean
  * semantics would let `value BETWEEN 1 AND 50` silently pass null
  * values that the contract author almost certainly meant to catch —
  * the same null-hostile stance the dedup/sketch operators take.
  * Checks that need another table (foreign keys) compose by passing a
  * pre-joined frame and asserting on the join result's nullness.
  */
object Expectations {

  /** The one-row fused aggregation: (n_rows, v_<check>...). Split out
    * so the SAME counts can run as a complete-mode STREAMING
    * aggregation (state = this one row, N+1 longs however long the
    * stream runs) and be drained before [[report]] unpacks it.
    */
  def counts(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    // plain identifiers only: the names become column names (v_<name>)
    // and are resolved with col(), where '.' or '`' would parse as
    // struct access / quoting instead of the literal name
    checks.foreach { case (n, _) =>
      require(n.matches("[A-Za-z0-9_]+"),
        s"check name '$n' must be [A-Za-z0-9_]+")
    }
    // duplicate names would create two v_<name> columns and surface
    // later as an unrelated-looking AMBIGUOUS_REFERENCE — fail here
    require(checks.map(_._1).distinct.size == checks.size,
      "check names must be unique")
    val aggs = checks.map { case (n, p) =>
      // coalesce(0): sum over ZERO rows is NULL — an empty batch has
      // zero violations, not unknown ones
      coalesce(sum(when(coalesce(p, lit(false)), lit(0L))
        .otherwise(lit(1L))), lit(0L)).as(s"v_$n")
    }
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Unpack a [[counts]] row into the per-check report. An empty
    * input (n_rows = 0) passes vacuously: 0 violations, 0 ppm,
    * passed = 1 — an empty batch satisfies every contract.
    */
  def report(one: DataFrame, checkNames: Seq[String]): DataFrame = {
    val entries = array(checkNames.map { n =>
      struct(lit(n).as("check_name"), col(s"v_$n").as("n_violations"))
    }: _*)
    one.select(col("n_rows"), explode(entries).as("c"))
      .select(col("c.check_name").as("check_name"), col("n_rows"),
        col("c.n_violations").as("n_violations"),
        when(col("n_rows") === 0, lit(0L))
          .otherwise(expr("c.n_violations * 1000000 div n_rows"))
          .as("violation_ppm"),
        when(col("c.n_violations") === 0, lit(1L)).otherwise(lit(0L))
          .as("passed"))
  }

  /** Evaluate `checks` (name → boolean predicate) in one pass:
    * (check_name, n_rows, n_violations, violation_ppm, passed) with
    * passed as 0/1 and ppm in integer parts-per-million. Row order is
    * unspecified — callers order by check_name.
    */
  def validate(df: DataFrame, checks: Seq[(String, Column)]): DataFrame =
    report(counts(df, checks), checks.map(_._1))
}
