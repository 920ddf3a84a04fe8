package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass walk-time statistics over a building_transportation array —
  * the station features and their row-validity signal of the scrape
  * parse layer (PropertiesFrame.fromRaw), as a native codegen'd
  * expression.
  *
  * Replaces four higher-order trees over the same derived array
  * `__walk_times = transform(filter(bt, t -> t <> ''), parse)`:
  * `exists(wt, isNull)` + `size(wt)` in the validity Filter and
  * `size(wt)` / `array_min(wt)` / `aggregate(wt, 0.0, +) / size(wt)`
  * in the output projection. Every HOF is CodegenFallback, so their
  * presence dropped the whole parse Project AND the validity Filter
  * out of whole-stage codegen (round-17 plan, operators (7)-(9)).
  *
  * Exact equivalences, element order preserved:
  *   - entries equal to "" are skipped (the `filter`; a null entry is
  *     skipped too — `t <> ''` is null-false in a filter predicate);
  *   - parse per entry = full-width-digit normalization, then Java
  *     regex `^.*歩(\d+)分$` via Matcher.find (RegExpExtract's exact
  *     call shape), group(1) parsed as double — null on no-match
  *     (`extractOrNull.cast("double")`, and `(\d+)` can never capture
  *     "");
  *   - n_bad  = count of kept entries that parse null
  *     (`exists(wt, isNull)` ⇔ n_bad > 0);
  *   - n_stations = count of kept entries (`size(wt)`);
  *   - wmin   = min over parsed non-null values (`array_min` skips
  *     nulls); null when none parsed;
  *   - wavg   = left-fold sum in array order divided by n_stations —
  *     the identical IEEE op sequence as `aggregate(wt, 0.0, +) /
  *     size(wt)`; null when no entries survive the filter (the old
  *     0.0/0 NaN could only reach rows the validity filter drops).
  *
  * NULL array → NULL struct (the old chain was null-propagating too,
  * and such rows fail the validity filter either way).
  */
case class WalkTimeStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WalkTimeStats.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"walk_time_stats requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WalkTimeStats.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WalkTimeStats.stats($c);")

  override protected def withNewChildInternal(
      newChild: Expression): WalkTimeStats = copy(child = newChild)

  override def prettyName: String = "walk_time_stats"
}

object WalkTimeStats {

  val Schema: StructType = StructType(Seq(
    StructField("n_bad", IntegerType, nullable = false),
    StructField("n_stations", LongType, nullable = false),
    StructField("wmin", DoubleType, nullable = true),
    StructField("wavg", DoubleType, nullable = true)))

  // precompiled once per JVM (immutable, thread-safe; Matcher is
  // per-call) — same pattern string the Column form fed regexp_extract
  private val WalkPattern = java.util.regex.Pattern.compile("^.*歩(\\d+)分$")

  def stats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var kept = 0L
    var bad = 0
    var sum = 0.0
    var min = Double.NaN
    var haveMin = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (s.numBytes() > 0) {
          kept += 1
          val m = WalkPattern.matcher(
            graft.functions.JpText.normDigits(s.toString))
          if (m.find()) {
            val v = java.lang.Double.parseDouble(m.group(1))
            sum += v
            if (!haveMin || v < min) { min = v; haveMin = true }
          } else bad += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      bad,
      kept,
      if (haveMin) java.lang.Double.valueOf(min) else null,
      if (kept > 0) java.lang.Double.valueOf(sum / kept.toDouble) else null))
  }

  /** Column API. */
  def walk_time_stats(transportation: Column): Column =
    Bridge.column(WalkTimeStats(Bridge.expression(transportation)))
}
