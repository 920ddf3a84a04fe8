package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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

  // NULL text yields an EMPTY array, not null — matching the lambda
  // formulation, where the when(size >= n) condition on a null token
  // array falls to the otherwise(array()) branch
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleHashes.empty()
    else ShingleHashes.evalImpl(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val jt = CodeGenerator.javaType(dataType)
    ev.copy(
      code = childGen.code + code"""
        $jt ${ev.value} = ${childGen.isNull} ?
          graft.plans.ShingleHashes.empty() :
          graft.plans.ShingleHashes.evalImpl(${childGen.value}, $n);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {

  private final val Seed = 42L // the xxhash64 SQL function's seed

  def empty(): ArrayData = new GenericArrayData(Array.empty[Long])

  // Named evalImpl, not eval: a companion method named after an
  // inherited member (Expression.eval) gets no static forwarder, so the
  // generated Java could never resolve it (silent interpreted fallback).
  def evalImpl(s: UTF8String, n: Int): ArrayData = {
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

  /** Column API. The cast keeps the split()-formulation's implicit
    * string coercion for non-string inputs (a no-op on strings).
    */
  def shingle_hashes(c: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c.cast("string")), n))
}
