package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash of a single-space-tokenized text — token rolling hashes,
  * per-bit ±1 majority vote — as ONE native codegen'd expression
  * (round 17).
  *
  * Replaces the TextFunctions.simhash higher-order tree
  * (`bind(transform(tokens, rolling_hash), hashes →
  * aggregate(...)×nBits)`): transform/aggregate are CodegenFallback,
  * so every simhash projection ran INTERPRETED, paying per-token
  * lambda dispatch × nBits per document plus the boxed intermediate
  * arrays. This expression is one pass over the string (per-segment
  * rolling hash exactly as [[RollingHash.hash]], UTF-16 chars) with a
  * primitive vote array.
  *
  * Bit-exact equivalences with the replaced tree (and the q32/q36
  * DuckDB oracle it replays):
  *   - tokens = split(text, " ") with limit −1: EVERY single-space
  *     segment including empties (leading/trailing/doubled) — an empty
  *     segment hashes to 0 and still votes, exactly as before;
  *   - per token h = fold(h·31 + char) mod 1e9+7;
  *   - bit b < 30 reads bit b of h; bits ≥ 30 read bit (b−30) mod 30
  *     of the second-round LCG (h·1103515245 + 12345) mod 1073741789
  *     (h ≥ 0, so pmod ≡ %);
  *   - signature = Σ_b (vote_b > 0 ? 1 << b : 0), nBits ≤ 62.
  */
case class SimhashText(child: Expression, nBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (nBits >= 1 && nBits <= 62) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"nBits out of range: $nBits")
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_text requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    SimhashText.simhash(input.asInstanceOf[UTF8String], nBits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimhashText.simhash($c, $nBits);")

  override protected def withNewChildInternal(
      newChild: Expression): SimhashText = copy(child = newChild)

  override def prettyName: String = "simhash_text"
}

object SimhashText {

  def simhash(s: UTF8String, nBits: Int): Long = {
    // UTF-16 iteration like RollingHash.hash (identical for BMP text)
    val str = s.toString
    val votes = new Array[Long](nBits)
    def emit(h: Long): Unit = {
      val lcg =
        if (nBits > 30) (h * 1103515245L + 12345L) % 1073741789L else 0L
      var b = 0
      while (b < nBits) {
        val mixed = if (b < 30) h else lcg
        val shift = if (b < 30) b else (b - 30) % 30
        votes(b) += (if (((mixed >> shift) & 1L) == 1L) 1L else -1L)
        b += 1
      }
    }
    var h = 0L
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == ' ') { emit(h); h = 0L }
      else h = (h * 31L + c.toLong) % RollingHash.Mod
      i += 1
    }
    emit(h)
    var sig = 0L
    var b = 0
    while (b < nBits) {
      if (votes(b) > 0) sig += 1L << b
      b += 1
    }
    sig
  }

  /** Column API. */
  def simhash_text(c: Column, nBits: Int): Column =
    Bridge.column(SimhashText(Bridge.expression(c), nBits))
}
