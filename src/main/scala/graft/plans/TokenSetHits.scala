package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-word-set token hit counts over a single-space-tokenized text,
  * one pass — `hits[k] = |{tokens(text) ∩* wordSets(k)}|` counted with
  * multiplicity, exactly `size(filter(split(text," "), isin(set_k)))`
  * for every k at once. The langId / stopword-family primitive as a
  * native codegen'd expression (round 17): the higher-order filter ×
  * isin form was CodegenFallback-interpreted and re-scanned the token
  * array once per language. Matching is byte equality on UTF-8, which
  * is string equality.
  */
case class TokenSetHits(child: Expression, wordSets: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_set_hits requires a string input, got $other")
  }

  @transient private lazy val setsBytes: Array[Array[Array[Byte]]] =
    wordSets.map(_.map(_.getBytes("UTF-8")).toArray).toArray

  override def nullSafeEval(input: Any): Any =
    TokenSetHits.hits(input.asInstanceOf[UTF8String], setsBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val sets = ctx.addReferenceObj("wordSets", setsBytes, "byte[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TokenSetHits.hits($c, $sets);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenSetHits = copy(child = newChild)

  override def prettyName: String = "token_set_hits"
}

object TokenSetHits {

  def hits(s: UTF8String, sets: Array[Array[Array[Byte]]]): ArrayData = {
    val bytes = s.getBytes
    val out = new Array[Int](sets.length)
    var segStart = 0
    def seg(from: Int, until: Int): Unit = {
      val len = until - from
      var k = 0
      while (k < sets.length) {
        val words = sets(k)
        var w = 0
        var hit = false
        while (!hit && w < words.length) {
          val word = words(w)
          if (word.length == len) {
            var j = 0
            while (j < len && bytes(from + j) == word(j)) j += 1
            hit = j == len
          }
          w += 1
        }
        if (hit) out(k) += 1
        k += 1
      }
    }
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { seg(segStart, i); segStart = i + 1 }
      i += 1
    }
    seg(segStart, bytes.length)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column API. */
  def token_set_hits(text: Column, wordSets: Seq[Seq[String]]): Column =
    Bridge.column(TokenSetHits(Bridge.expression(text), wordSets))
}
