package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term-frequency entries — `array<struct<tk,tf>>` of the
  * non-empty single-space tokens of a text with their in-document
  * counts, first-appearance order — as a native codegen'd expression.
  *
  * This is the per-document half of the tokenize→tf aggregation the
  * APSS pipeline ran as `explode(split(text,' ')) → filter(tk <> '') →
  * groupBy(doc_id, tk).count()` (Search.tfFrame): the grouping key
  * (doc_id, tk) never crosses documents, so the whole (doc, term)
  * aggregate — a full Exchange plus hash aggregate over the exploded
  * token stream, the largest shuffle of the q95 row — is computable
  * row-locally in one token scan (guide §2.4: remove shuffles
  * outright; the TokenNgramStats precedent).
  *
  * Exact equivalences:
  *   - tokenization = split on the single space character with
  *     trailing empties kept, then empties dropped — byte-scanning for
  *     0x20 yields the identical non-empty token multiset ("" →
  *     [""] → nothing; runs of spaces → empty segments → dropped);
  *   - tf = occurrence count per distinct token (long, like
  *     `count(lit(1))`);
  *   - entry ORDER is first-appearance (deterministic pure function
  *     of the text — safe under task retry); downstream consumers are
  *     aggregates/joins, which are order-insensitive.
  *
  * NULL text → NULL array (split(null) → null; the old explode
  * generated nothing — callers explode/inline this array, so null and
  * empty both contribute zero rows, identically).
  */
case class TokenTf(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(TokenTf.EntryType,
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_tf requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TokenTf.entries(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TokenTf.entries($c);")

  override protected def withNewChildInternal(
      newChild: Expression): TokenTf = copy(child = newChild)

  override def prettyName: String = "token_tf"
}

object TokenTf {

  val EntryType: StructType = StructType(Seq(
    StructField("tk", StringType, nullable = false),
    StructField("tf", LongType, nullable = false)))

  def entries(s: UTF8String): ArrayData = {
    val bytes = s.getBytes // defensive: may alias a reused buffer — every
    //                        emitted token below is copied out of it
    val n = bytes.length
    // first-appearance order: LinkedHashMap iteration is insertion order
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var segStart = 0
    var i = 0
    def addToken(from: Int, until: Int): Unit = {
      if (until > from) {
        // copy the token bytes: the result array outlives this row's
        // scan buffer (fromBytes over a slice of `bytes` would alias it)
        val tok = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, from, until))
        val c = counts.get(tok)
        if (c == null) counts.put(tok, Array(1L)) else c(0) += 1L
      }
    }
    while (i < n) {
      if (bytes(i) == ' ') { addToken(segStart, i); segStart = i + 1 }
      i += 1
    }
    addToken(segStart, n)
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def token_tf(text: Column): Column =
    Bridge.column(TokenTf(Bridge.expression(text)))
}
