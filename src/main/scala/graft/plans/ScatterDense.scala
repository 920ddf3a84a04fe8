package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructType}

/** Scatter a sparse (idx, w) entry list into a dense double vector of
  * fixed length `len` — the dense-APSS vector synthesis
  * (Search.densePairs), as a native codegen'd expression.
  *
  * Replaces `transform(sequence(0, len-1), i ->
  * coalesce(element_at(map_from_entries(entries), i), 0.0))` (round
  * 17): the higher-order `transform` is CodegenFallback, so the whole
  * synthesis Project ran INTERPRETED, paying per-element lambda
  * dispatch plus an O(len) linear map probe per output slot — O(len²)
  * boxed work per document. This expression is one zero-filled
  * double[len] plus one O(entries) scatter, emitted as an
  * UnsafeArrayData — and it keeps the surrounding Project inside
  * whole-stage codegen. Values are identical by construction: absent
  * indices are 0.0, present indices carry their entry's weight
  * (duplicate indices cannot occur — entries come from a per-(doc,
  * term) aggregate joined to a distinct vocabulary).
  *
  * Entries must be non-null structs of (int idx in [0, len), double
  * w); an out-of-range idx throws rather than silently mis-scoring.
  *
  * DUPLICATE idx values overwrite (last wins) — where the replaced
  * map_from_entries form threw under mapKeyDedupPolicy=EXCEPTION.
  * Accepted because duplicates are impossible by construction at the
  * only call site (entries come from a per-(doc, term) aggregate
  * inner-joined to a DISTINCT vocabulary index, so one idx per doc at
  * most) and a per-entry seen-check would put a branch + bitmap in
  * the hot scatter loop; any NEW caller must either guarantee the
  * same per-key-distinct invariant or dedup first.
  */
case class ScatterDense(child: Expression, len: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s.fields(0).dataType == IntegerType &&
          s.fields(1).dataType == DoubleType =>
      if (len >= 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"len must be >= 0, got $len")
    case other => TypeCheckResult.TypeCheckFailure(
      s"scatter_dense requires array<struct<idx:int,w:double>>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ScatterDense.scatter(input.asInstanceOf[ArrayData], len)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ScatterDense.scatter($c, $len);")

  override protected def withNewChildInternal(
      newChild: Expression): ScatterDense = copy(child = newChild)

  override def prettyName: String = "scatter_dense"
}

object ScatterDense {

  def scatter(entries: ArrayData, len: Int): UnsafeArrayData = {
    val out = new Array[Double](len)
    val n = entries.numElements()
    var i = 0
    while (i < n) {
      val e = entries.getStruct(i, 2)
      val idx = e.getInt(0)
      if (idx < 0 || idx >= len) throw new IllegalStateException(
        s"scatter_dense: index $idx outside vector length $len")
      out(idx) = e.getDouble(1)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column API. */
  def scatter_dense(entries: Column, len: Int): Column =
    Bridge.column(ScatterDense(Bridge.expression(entries), len))
}
