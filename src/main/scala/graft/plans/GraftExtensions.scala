package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the graft-native SQL
  * functions so `spark.sql("SELECT rolling_hash(text) ...")` works.
  *
  * Wire up via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.rollingHashDescriptor)
    ext.injectFunction(GraftExtensions.kanjiAddressKeyDescriptor)
  }
}

object GraftExtensions {

  val rollingHashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
    (children: Seq[Expression]) => RollingHash(children.head))

  val kanjiAddressKeyDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kanji_address_key"),
    new ExpressionInfo(classOf[KanjiAddressKey].getName, "kanji_address_key"),
    (children: Seq[Expression]) => KanjiAddressKey(children.head))

  /** Imperative registration for an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    Seq(rollingHashDescriptor, kanjiAddressKeyDescriptor).foreach {
      case (ident, info, builder) =>
        registry.registerFunction(ident, info, builder)
    }
  }
}
