package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over pre-hashed shingles as one codegen'd loop —
  * bit-identical to `TextFunctions.minhashSignatureFromHashes` (the
  * nested-transform Column formulation): h_j(x) = (a_j·(x mod p) + b_j)
  * mod p with the same fixed-LCG seeds, minimum per plane, k planes.
  *
  * The Column formulation interprets k×|shingles| lambda applications
  * per row and materializes k intermediate arrays; this is two tight
  * JIT'd loops (reduce each shingle mod p once, then scan per plane)
  * with zero allocation beyond the output.
  */
case class MinhashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<long> input, got $other")
  }

  // a NULL hashes array yields k nulls, not null — matching the lambda
  // formulation, whose outer transform runs over the non-null seed
  // literal and array_min(transform(null, ...)) is null per plane
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinhashSignature.allNull(k)
    else MinhashSignature.evalImpl(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val jt = CodeGenerator.javaType(dataType)
    ev.copy(
      code = childGen.code + code"""
        $jt ${ev.value} = ${childGen.isNull} ?
          graft.plans.MinhashSignature.allNull($k) :
          graft.plans.MinhashSignature.evalImpl(${childGen.value}, $k);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinhashSignature = copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinhashSignature {

  private val P = graft.functions.TextFunctions.MinhashPrime

  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]

  private def seeds(k: Int): (Array[Long], Array[Long]) =
    seedCache.computeIfAbsent(k, { _ =>
      val s = graft.functions.TextFunctions.minhashSeeds(k)
      (s.map(_._1).toArray, s.map(_._2).toArray)
    })

  def allNull(k: Int): ArrayData = new GenericArrayData(new Array[Any](k))

  // Named evalImpl, not eval: a companion method named after an
  // inherited member (Expression.eval) gets no static forwarder, so the
  // generated Java could never resolve it (silent interpreted fallback).
  def evalImpl(hashes: ArrayData, k: Int): ArrayData = {
    // null ELEMENTS are skipped like array_min skips the null the
    // lambda maps them to; empty (or all-null) input → k nulls
    val total = hashes.numElements()
    var n = 0
    val reduced = new Array[Long](total)
    var i = 0
    while (i < total) {
      if (!hashes.isNullAt(i)) {
        val r = hashes.getLong(i) % P
        reduced(n) = if (r < 0) r + P else r // pmod
        n += 1
      }
      i += 1
    }
    if (n == 0) return allNull(k)
    val (as, bs) = seeds(k)
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = as(j)
      val b = bs(j)
      var m = Long.MaxValue
      var t = 0
      while (t < n) {
        // a, b, reduced < p < 2^31 → a*x + b stays within 62 bits
        val v = (a * reduced(t) + b) % P
        if (v < m) m = v
        t += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def minhash_signature(c: Column, k: Int): Column =
    Bridge.column(MinhashSignature(Bridge.expression(c), k))
}
