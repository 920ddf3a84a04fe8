package graft

import graft.functions.{JpText, Parsers}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based parser checks (SURVEY §5.1): inputs generated from the
  * grammar with expected values known by construction, including
  * full-width digit variants. Uses raw ScalaCheck Gens sampled under a
  * fixed seed (the scalatest bridge module is not on the offline
  * classpath). Inputs are batched into one DataFrame per property so
  * each property costs one Spark job.
  */
class ParsersPropertySpec extends SparkSpec {
  import spark.implicits._

  private val N = 60

  private def samples[A](g: Gen[A]): Seq[A] =
    (0 until N).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  /** Run a parser over many inputs in one job; returns values in order. */
  private def parseAll(inputs: Seq[String], f: Column => Column): Seq[Any] =
    inputs.zipWithIndex.toDF("s", "i")
      .select(col("i"), f(col("s")).as("v")).orderBy("i").collect()
      .map(r => if (r.isNullAt(1)) null else r.get(1)).toSeq

  private def digits(n: Long, fullWidth: Boolean): String = {
    val s = n.toString
    if (fullWidth) s.map(c => JpText.FullWidthDigits(c - '0')) else s
  }

  test("F1: 築N年 parses to N for any N, either digit width") {
    val cases = samples(Gen.zip(Gen.choose(0L, 99L), Gen.oneOf(false, true)))
    val got = parseAll(cases.map { case (n, fw) => s"築${digits(n, fw)}年" },
      Parsers.parseAge(_))
    assert(got === cases.map(_._1))
  }

  test("F2: (地下B地上)?N階建 parses above-ground floors") {
    val cases = samples(Gen.zip(Gen.choose(1L, 80L),
      Gen.option(Gen.choose(1L, 5L)), Gen.oneOf(false, true)))
    val inputs = cases.map { case (n, basement, fw) =>
      basement.map(b => s"地下${digits(b, fw)}地上").getOrElse("") +
        s"${digits(n, fw)}階建"
    }
    assert(parseAll(inputs, Parsers.parseFloors(_)) === cases.map(_._1))
  }

  test("F5: X.Y万円 parses to truncated JPY") {
    val cases = samples(Gen.zip(Gen.choose(0L, 99L), Gen.choose(0L, 9L)))
    val inputs = cases.map { case (man, dec) => s"$man.${dec}万円" }
    val expected = cases.map { case (man, dec) =>
      (s"$man.$dec".toDouble * 10000).toLong
    }
    assert(parseAll(inputs, c => Parsers.parseMoney(c, "万円")) === expected)
  }

  test("F6: floor ranges are sorted min<=max for any B-floor combo") {
    val genFloor = Gen.oneOf(
      Gen.choose(1, 40).map(_.toString),
      Gen.choose(1, 3).map(b => s"B$b"))
    val cases = samples(Gen.zip(genFloor, Gen.option(genFloor)))
    val inputs = cases.map { case (f1, f2opt) =>
      f2opt.map(f2 => s"$f1-${f2}階").getOrElse(s"${f1}階")
    }
    def floorVal(s: String): Long =
      if (s.startsWith("B")) -s.drop(1).toLong + 1 else s.toLong
    val rows = inputs.zipWithIndex.toDF("s", "i")
      .select(col("i"), Parsers.parseFloorRange(col("s")).as("fr"))
      .orderBy("i").collect()
    rows.zip(cases).foreach { case (r, (f1, f2opt)) =>
      val fr = r.getStruct(1)
      val vals = (f1 +: f2opt.toSeq).map(floorVal)
      assert(fr.getLong(0) === vals.min, s"min for $f1-$f2opt")
      assert(fr.getLong(1) === vals.max, s"max for $f1-$f2opt")
    }
  }

  test("F7: areas round-trip for any two-decimal value") {
    val cases = samples(Gen.zip(Gen.choose(5L, 500L), Gen.choose(0L, 99L)))
    val valueStrs = cases.map { case (whole, frac) => f"$whole.$frac%02d" }
    assert(parseAll(valueStrs.map(_ + "m2"), Parsers.parseArea(_)) ===
      valueStrs.map(_.toDouble))
  }

  test("F3: walk minutes parse for any station prefix") {
    val cases = samples(Gen.zip(
      Gen.alphaStr.map(_.take(10)), Gen.choose(1L, 60L),
      Gen.oneOf(false, true)))
    val inputs = cases.map { case (prefix, mins, fw) =>
      s"${prefix}線/駅 歩${digits(mins, fw)}分"
    }
    assert(parseAll(inputs, Parsers.parseTransportation(_)) ===
      cases.map(_._2.toDouble))
  }

  test("int2kanji never throws over its documented range") {
    samples(Gen.choose(0L, 99999999L)).foreach { n =>
      assert(JpText.int2kanji(n).nonEmpty)
    }
  }

  test("TopKByKey property: any inputs, k, and merge split = sort-take") {
    // exercises the hand-written buffer insertion/merge directly (no
    // Spark job): random scores with heavy ties, random k, random
    // partial-buffer splits — the finish must equal the reference
    // sort-take under the total (score DESC, id ASC) order
    val gen = Gen.listOfN(120,
      Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 500L)))
    (0 until 30).foreach { i =>
      val agg = new graft.plans.TopKByKey(i % 7 + 1)
      val k = i % 7 + 1
      val xs = gen.pureApply(Gen.Parameters.default, Seed(9000L + i))
        .distinctBy(_._2) // ids are unique row keys by contract
      val want = xs.sortBy { case (s, id) => (-s, id) }.take(k)
      val nParts = i % 4 + 1
      val bufs = xs.grouped(math.max(1, xs.size / nParts)).toSeq
        .map(_.foldLeft(agg.zero) { (b, x) =>
          agg.reduce(b, (Long.box(x._1), Long.box(x._2)))
        })
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) === want, s"iteration $i (k=$k)")
    }
  }
}
