package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** True iff ANY element of an `array<bigint>` might be in a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] — the map-side prefilter
  * of benchmark decontamination ([[graft.operators.Decontaminate]]): a
  * corpus document whose shingle hashes all miss the benchmark bloom
  * provably shares no shingle with the benchmark (bloom filters have no
  * false negatives) and never reaches the shuffle.
  *
  * The filter bytes ride the expression tree to executors and
  * deserialize once per task (transient lazy); the per-row loop is a
  * fused scan over the array (no higher-order `exists` lambda, which
  * Spark interprets per element). False positives only admit extra
  * candidates — the exact verify join downstream keeps results exact.
  */
case class BloomAnyContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_any_contain requires an array<bigint> input, got $other")
  }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  def anyContain(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && filter.mightContainLong(arr.getLong(i))) {
        return true
      }
      i += 1
    }
    false
  }

  override def nullSafeEval(v: Any): Any = anyContain(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomAnyContain", this,
      classOf[BloomAnyContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.anyContain($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomAnyContain = copy(child = newChild)

  override def prettyName: String = "bloom_any_contain"
}

object BloomAnyContain {

  def serialize(filter: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    bos.toByteArray
  }

  def bloom_any_contain(arr: Column, filter: BloomFilter): Column =
    bloom_any_contain(arr, serialize(filter))

  def bloom_any_contain(arr: Column, bloomBytes: Array[Byte]): Column =
    Bridge.column(BloomAnyContain(Bridge.expression(arr), bloomBytes))
}
