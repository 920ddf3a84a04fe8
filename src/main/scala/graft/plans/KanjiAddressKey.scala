package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The geocode join key (F11 _build_address_kanji,
  * libs/otokuna/analysis.py:31-54) as a native codegen'd expression —
  * the last UDF on the ingest hot path. The Scala logic lives in
  * Parsers.buildAddressKanjiFn; this node inlines a static call into
  * whole-stage codegen instead of paying the UDF's encoder round-trip
  * per row.
  */
case class KanjiAddressKey(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kanji_address_key requires string input, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    KanjiAddressKey.evalImpl(input.asInstanceOf[UTF8String])

  // The helper must NOT be named `eval`: the class inherits
  // eval(InternalRow), and scalac suppresses the static forwarder for
  // any companion method whose name collides with an inherited member —
  // Janino then can't resolve the call and the whole stage silently
  // falls back to interpreted execution.
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.KanjiAddressKey.evalImpl($c);")

  override protected def withNewChildInternal(newChild: Expression): KanjiAddressKey =
    copy(child = newChild)

  override def prettyName: String = "kanji_address_key"
}

object KanjiAddressKey {

  def evalImpl(s: UTF8String): UTF8String =
    UTF8String.fromString(
      graft.functions.Parsers.buildAddressKanjiFn(s.toString))

  def kanji_address_key(c: Column): Column =
    Bridge.column(KanjiAddressKey(Bridge.expression(c)))
}
