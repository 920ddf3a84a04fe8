package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text, hashed to longs — fused
  * into one codegen'd expression. Semantically identical (bit-for-bit)
  * to `transform(TextFunctions.shingles(text, n), g => xxhash64(g))`:
  * single-space tokenization keeping empties (Spark `split(c, " ")`),
  * n-grams joined with one space, first-occurrence-distinct on the
  * GRAM (so a hash collision still yields the same duplicate hashes),
  * and Spark's own XXH64 with the xxhash64 seed (42) over the gram's
  * UTF-8 bytes.
  *
  * The Column-API formulation runs three nested higher-order lambdas
  * per row in the interpreter — the dominant cost of the Jaccard /
  * MinHash shingling scan; this loop is plain JIT'd Java.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.eval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleHashes.eval($c, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {

  private final val Seed = 42L // the xxhash64 SQL function's seed

  def eval(s: UTF8String, n: Int): ArrayData = {
    // Spark split(c, " ") semantics: regex split with limit -1 — empty
    // tokens (double spaces, leading/trailing) are KEPT
    val toks = s.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val nGrams = toks.length - n + 1
    val seen = new java.util.LinkedHashSet[String](nGrams * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = XXH64.hashUTF8String(UTF8String.fromString(it.next()), Seed)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def shingle_hashes(c: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c), n))
}
