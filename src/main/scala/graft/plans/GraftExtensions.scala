package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the graft-native SQL
  * functions so `spark.sql("SELECT rolling_hash(text) ...")` works,
  * and the [[PushAggBelowJoin]] optimizer rule (eager aggregation
  * below fact-fact joins) so naive SQL/DataFrame formulations get the
  * narrow-shuffle plan automatically.
  *
  * Wire up via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => PushAggBelowJoin)
  }
}

object GraftExtensions {

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _)
        if v >= Int.MinValue.toLong && v <= Int.MaxValue.toLong => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects an int-range integer literal parameter, got $other")
  }

  private def litLong(e: Expression, fn: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal parameter, got $other")
  }

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

  val dotProductDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  val shingleHashesDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_hashes"),
    new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
    (children: Seq[Expression]) =>
      ShingleHashes(children(0), litInt(children(1), "shingle_hashes")))

  val minhashSignatureDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_signature"),
    (children: Seq[Expression]) =>
      MinhashSignature(children(0), litInt(children(1), "minhash_signature")))

  val srpSignatureDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("srp_signature"),
    new ExpressionInfo(classOf[SrpSignature].getName, "srp_signature"),
    (children: Seq[Expression]) => SrpSignature(children(0),
      litInt(children(1), "srp_signature"),
      litLong(children(2), "srp_signature")))

  private def litBinary(e: Expression, fn: String): Array[Byte] = e match {
    case Literal(v: Array[Byte], org.apache.spark.sql.types.BinaryType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a binary literal parameter, got $other")
  }

  val bloomAnyContainDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_any_contain"),
    new ExpressionInfo(classOf[BloomAnyContain].getName, "bloom_any_contain"),
    (children: Seq[Expression]) =>
      BloomAnyContain(children(0), litBinary(children(1), "bloom_any_contain")))

  val tokenNgramStatsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("token_ngram_stats"),
    new ExpressionInfo(classOf[TokenNgramStats].getName, "token_ngram_stats"),
    (children: Seq[Expression]) =>
      TokenNgramStats(children(0), litInt(children(1), "token_ngram_stats")))

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    rollingHashDescriptor, kanjiAddressKeyDescriptor, dotProductDescriptor,
    shingleHashesDescriptor, minhashSignatureDescriptor,
    srpSignatureDescriptor, tokenNgramStatsDescriptor,
    bloomAnyContainDescriptor)

  /** Imperative registration for an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    descriptors.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(PushAggBelowJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushAggBelowJoin
  }
}
