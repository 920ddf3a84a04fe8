package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token n-gram frequency profile — the single-pass core of
  * the Gopher/C4-style repetition filters a pretraining corpus pass
  * runs on every document: n-gram count, distinct n-gram count, and the
  * highest single n-gram frequency, fused into one codegen'd expression
  * (one token scan + one hash map per row, no shuffle, no explode).
  *
  * Tokenization: single-space split, empties dropped — the filtered
  * token stream of the vocab/keyword passes (q49/q55), mirrored by
  * `list_filter(string_split(text, ' '), x -> x <> '')` in DuckDB.
  * Grams are n consecutive tokens joined by one space. Fewer than n
  * tokens ⇒ all-zero struct (no grams). NULL text ⇒ NULL struct.
  *
  * The equivalent declarative form (explode → groupBy(doc, gram) →
  * groupBy(doc)) pays two shuffles of the whole token stream; this is a
  * narrow map over the corpus scan.
  */
case class TokenNgramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = TokenNgramStats.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_ngram_stats requires a string input, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    TokenNgramStats.evalImpl(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenNgramStats.evalImpl($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): TokenNgramStats = copy(child = newChild)

  override def prettyName: String = "token_ngram_stats"
}

object TokenNgramStats {

  val Schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_tf", LongType, nullable = false)))

  // Named evalImpl, not eval: a companion method named after an
  // inherited member (Expression.eval) gets no static forwarder, so the
  // generated Java could never resolve it (silent interpreted fallback).
  def evalImpl(s: UTF8String, n: Int): InternalRow = {
    val raw = s.toString.split(" ", -1)
    // drop empty tokens (double/leading/trailing spaces)
    var nTok = 0
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { raw(nTok) = raw(i); nTok += 1 }
      i += 1
    }
    val nGrams = nTok - n + 1
    if (nGrams <= 0) return InternalRow(0L, 0L, 0L)
    val counts = new java.util.HashMap[String, Array[Long]](nGrams * 2)
    val sb = new java.lang.StringBuilder
    var top = 0L
    i = 0
    while (i < nGrams) {
      val gram =
        if (n == 1) raw(i)
        else {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(raw(i + j))
            j += 1
          }
          sb.toString
        }
      var c = counts.get(gram)
      if (c == null) { c = Array(0L); counts.put(gram, c) }
      c(0) += 1
      if (c(0) > top) top = c(0)
      i += 1
    }
    InternalRow(nGrams.toLong, counts.size().toLong, top)
  }

  /** Column API (casts non-string inputs like the split() formulation). */
  def token_ngram_stats(c: Column, n: Int): Column =
    Bridge.column(TokenNgramStats(Bridge.expression(c.cast("string")), n))
}
