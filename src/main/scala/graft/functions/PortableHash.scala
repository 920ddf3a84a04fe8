package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A 32-bit engine-portable hash built only from %, *, >> and xor —
  * operations Spark and DuckDB evaluate identically on BIGINT — so any
  * operator keyed on it (sketches, samplers, shard routers) can be
  * replayed exactly by the SQL oracle. This is the degski/Wang
  * xorshift-multiply finalizer: two multiply-xorshift rounds give good
  * avalanche for id-like inputs, unlike the repo's LCG order key
  * (fine for ORDERING, but its low bits are far too regular to feed a
  * k-minimum-values estimator).
  *
  * All intermediates fit comfortably in a long: the value is < 2^32
  * and the multiplier < 2^27, so products stay under 2^59.
  */
object PortableHash {

  val Mod: Long = 4294967296L // 2^32
  val Mult: Long = 73244475L  // 0x45d9f3b

  /** hash32 as a Column expression (pure arithmetic — whole-stage
    * codegen, no UDF). Input is cast to long and wrapped into
    * [0, 2^32) first; nonneg ids pass through unchanged.
    */
  def hash32(c: Column): Column = {
    val h0 = pmod(c.cast("long"), lit(Mod))
    val h1 = pmod(h0.bitwiseXOR(shiftright(h0, 16)) * Mult, lit(Mod))
    val h2 = pmod(h1.bitwiseXOR(shiftright(h1, 16)) * Mult, lit(Mod))
    h2.bitwiseXOR(shiftright(h2, 16))
  }

  /** The same four steps as DuckDB SQL, for CTE-stepwise oracles:
    * returns the four SELECT expressions over a column named `h`
    * (step 0 takes the raw column name).
    */
  def hash32SqlSteps(x: String): Seq[String] = Seq(
    s"(($x % $Mod) + $Mod) % $Mod",
    s"(xor(h, h >> 16) * $Mult) % $Mod",
    s"(xor(h, h >> 16) * $Mult) % $Mod",
    s"xor(h, h >> 16)")
}
