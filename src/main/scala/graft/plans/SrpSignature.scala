package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Signed-random-projection (SRP) signature: `nPlanes` sign bits of dot
  * products against seeded Gaussian hyperplanes — the sign-LSH primitive
  * for cosine similarity (a pair at cosine c agrees per bit with
  * probability 1 − arccos(c)/π).
  *
  * A native codegen'd Catalyst expression: the 64-dim × nPlanes inner
  * loop runs per ROW on the signature-building scan, which higher-order
  * `transform`/`aggregate` lambdas would interpret element-by-element.
  * Hyperplanes are derived from (seed, nPlanes, dim) via
  * `java.util.Random`'s fixed Gaussian algorithm, so signatures are
  * deterministic across JVMs and runs; the matrix is computed once per
  * executor and cached.
  */
case class SrpSignature(child: Expression, nPlanes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"srp_signature requires array<float> or array<double>, got $other")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (isFloat) SrpSignature.signF(a, nPlanes, seed)
    else SrpSignature.signD(a, nPlanes, seed)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "signF" else "signD"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SrpSignature.$fn($c, $nPlanes, ${seed}L);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SrpSignature = copy(child = newChild)

  override def prettyName: String = "srp_signature"
}

object SrpSignature {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]

  private def planes(seed: Long, nPlanes: Int,
      dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((seed, nPlanes, dim), { _ =>
      val rnd = new java.util.Random(seed)
      Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    })

  def signF(a: ArrayData, nPlanes: Int, seed: Long): ArrayData = {
    val dim = a.numElements()
    val ps = planes(seed, nPlanes, dim)
    val bits = new Array[Int](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val pl = ps(p)
      var acc = 0.0
      var d = 0
      while (d < dim) { acc += a.getFloat(d).toDouble * pl(d); d += 1 }
      bits(p) = if (acc >= 0) 1 else 0
      p += 1
    }
    new GenericArrayData(bits)
  }

  def signD(a: ArrayData, nPlanes: Int, seed: Long): ArrayData = {
    val dim = a.numElements()
    val ps = planes(seed, nPlanes, dim)
    val bits = new Array[Int](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val pl = ps(p)
      var acc = 0.0
      var d = 0
      while (d < dim) { acc += a.getDouble(d) * pl(d); d += 1 }
      bits(p) = if (acc >= 0) 1 else 0
      p += 1
    }
    new GenericArrayData(bits)
  }

  /** Column API. */
  def srp_signature(c: Column, nPlanes: Int, seed: Long): Column =
    Bridge.column(SrpSignature(Bridge.expression(c), nPlanes, seed))
}
