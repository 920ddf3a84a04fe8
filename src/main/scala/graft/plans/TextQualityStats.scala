package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass counts behind the q30 document-quality metrics —
  * (n_tokens, n_punct, n_stop) over a single-space-tokenized text — as
  * a native codegen'd expression.
  *
  * Replaces three separate expression trees (round 17):
  * `size(split(text,' '))`, a `regexp_replace` length diff for the
  * punctuation count, and a higher-order `filter(tokens, isin(...))`
  * for the stopword count — the HOF made the whole projection
  * CodegenFallback-interpreted, and the quality composite re-evaluated
  * the ratio subtrees a second time (no cross-tree CSE interpreted).
  * Equivalences, each exact:
  *   - n_tokens = count(' ') + 1  ≡ size(split(text, " ")) (split with
  *     limit −1 keeps trailing empties; "" → [""], size 1);
  *   - n_punct  = count of chars in [.,!?;:'"()\[\]{}-]  ≡ length(text)
  *     − length(regexp_replace(text, class, "")) (all-ASCII class, so
  *     UTF-16 char counting and code-point counting agree);
  *   - n_stop   = count of tokens equal to a stopword  ≡
  *     size(filter(split(text," "), isin(stopwords))).
  * The float ratio/score arithmetic stays OUTSIDE this expression, in
  * the caller's Column algebra, so the IEEE op sequence (and the
  * DuckDB oracle match) is unchanged — this node only supplies the
  * integer counts.
  *
  * `stopwords` is a literal set fixed at plan time (the q30 English
  * five); matching is exact byte equality on UTF-8.
  */
case class TextQualityStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_quality_stats requires a string input, got $other")
  }

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any =
    TextQualityStats.stats(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val sw = ctx.addReferenceObj("stopBytes", stopBytes,
      "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextQualityStats.stats($c, $sw);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TextQualityStats = copy(child = newChild)

  override def prettyName: String = "text_quality_stats"
}

object TextQualityStats {

  private def isPunct(b: Byte): Boolean = (b: @annotation.switch) match {
    case '.' | ',' | '!' | '?' | ';' | ':' | '\'' | '"' | '(' | ')' |
         '[' | ']' | '{' | '}' | '-' => true
    case _ => false
  }

  def stats(s: UTF8String, stopwords: Array[Array[Byte]]): InternalRow = {
    val bytes = s.getBytes
    var tokens = 1
    var punct = 0
    var stop = 0
    var segStart = 0
    var i = 0
    def segMatches(from: Int, until: Int): Boolean = {
      val len = until - from
      var k = 0
      while (k < stopwords.length) {
        val w = stopwords(k)
        if (w.length == len) {
          var j = 0
          while (j < len && bytes(from + j) == w(j)) j += 1
          if (j == len) return true
        }
        k += 1
      }
      false
    }
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ') {
        tokens += 1
        if (segMatches(segStart, i)) stop += 1
        segStart = i + 1
      } else if (isPunct(b)) punct += 1
      i += 1
    }
    if (segMatches(segStart, bytes.length)) stop += 1
    new GenericInternalRow(Array[Any](tokens, punct, stop))
  }

  /** Column API. */
  def text_quality_stats(text: Column, stopwords: Seq[String]): Column =
    Bridge.column(TextQualityStats(Bridge.expression(text), stopwords))
}
