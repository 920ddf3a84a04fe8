package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Round-17 optimization-round expression pins: the two custom
  * codegen'd expressions that replaced interpreted higher-order-
  * function formulations must be VALUE-IDENTICAL to the forms they
  * replaced (scatter_dense vs map_from_entries+transform/element_at in
  * the dense-APSS vector synthesis; text_quality_stats vs
  * size(split)/regexp-length-diff/filter-isin in q30's quality
  * metrics).
  */
class ExprOptSpec extends SparkSpec {
  import spark.implicits._

  test("scatter_dense equals the map_from_entries/transform synthesis") {
    val rows = Seq(
      (1L, Seq((0, 1.5), (3, -2.0))),
      (2L, Seq((4, 0.25))),
      (3L, Seq.empty[(Int, Double)]),
      (4L, Seq((0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0), (4, 5.0))),
    ).toDF("id", "pairs")
      .select(col("id"), expr(
        "transform(pairs, p -> named_struct('idx', p._1, 'w', p._2))")
        .as("entries"))
    val vlen = 5
    val oldForm = rows.select(col("id"),
      map_from_entries(col("entries")).as("m"))
      .select(col("id"), transform(sequence(lit(0), lit(vlen - 1)),
        i => coalesce(element_at(col("m"), i), lit(0.0))).as("v"))
      .orderBy("id").collect().map(_.getSeq[Double](1))
    val newForm = rows.select(col("id"),
      graft.plans.ScatterDense.scatter_dense(col("entries"), vlen).as("v"))
      .orderBy("id").collect().map(_.getSeq[Double](1))
    assert(newForm.toSeq === oldForm.toSeq)
  }

  test("scatter_dense rejects an out-of-range index loudly") {
    val rows = Seq((1L, Seq((7, 1.0)))).toDF("id", "pairs")
      .select(col("id"), expr(
        "transform(pairs, p -> named_struct('idx', p._1, 'w', p._2))")
        .as("entries"))
    val e = intercept[Exception] {
      rows.select(graft.plans.ScatterDense.scatter_dense(col("entries"), 5))
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("simhash_text equals the replaced higher-order formulation") {
    import graft.plans.RollingHash.rolling_hash
    import TextFunctions.{bind, shiftRight, tokens}
    // the exact tree TextFunctions.simhash used before round 17
    def legacySimhash(c: org.apache.spark.sql.Column,
        nBits: Int): org.apache.spark.sql.Column =
      bind(transform(tokens(c), tk => rolling_hash(tk)), hashes => {
        val bits = transform(sequence(lit(0), lit(nBits - 1)), b => {
          val vote = aggregate(hashes, lit(0L), (acc, h) => {
            val mixed = when(b < 30, h)
              .otherwise(pmod(h * 1103515245L + 12345L, lit(1073741789L)))
            val shift = when(b < 30, b).otherwise(pmod(b - 30, lit(30)))
            acc + when(shiftRight(mixed, shift.cast("int"))
              .bitwiseAND(1L) === 1L, 1L).otherwise(-1L)
          })
          when(vote > 0, TextFunctions.shl(lit(1L), b.cast("int")))
            .otherwise(lit(0L))
        })
        aggregate(bits, lit(0L), (acc, x) => acc + x)
      })
    val texts = Seq("the quick brown fox", "", "a  b ", " leading",
      "one", "日本語 テキスト mixed ascii", "x " * 200 + "tail")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (nBits <- Seq(32, 62, 8)) {
      val legacy = texts
        .select(col("id"), legacySimhash(col("text"), nBits).as("s"))
        .orderBy("id").collect().map(_.getLong(1)).toSeq
      val fused = texts
        .select(col("id"), TextFunctions.simhash(col("text"), nBits).as("s"))
        .orderBy("id").collect().map(_.getLong(1)).toSeq
      assert(fused === legacy, s"nBits=$nBits")
    }
  }

  test("langId via token_set_hits equals the replaced HOF formulation") {
    import TextFunctions.{bind, tokens, LangStopwords}
    // the exact tree TextFunctions.langId used before round 17
    def legacyLangId(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      bind(tokens(c), t => {
        val counts = LangStopwords.map { case (lang, words) =>
          lang -> size(filter(t, tk => tk.isin(words: _*)))
        }
        val allZero = counts.map(_._2 === 0).reduce(_ && _)
        counts.zipWithIndex.foldLeft(when(allZero, lit("unknown"))) {
          case (acc, ((lang, _), i)) =>
            val mine = counts(i)._2
            val isMax = counts.map(_._2).map(o => mine >= o).reduce(_ && _)
            acc.when(isMax, lit(lang))
        }
      })
    val texts = Seq(
      "the cat is on a mat and so is the dog",
      "der hund und die katze das ist gut",
      "el perro y la casa es los",
      "le chat est une merveille et les autres",
      "我 是 的 了 在",
      "nothing matches here xyz",
      "", "the der el le 我",      // 5-way tie → declaration order (en)
      "the the der").zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val legacy = texts.select(col("id"), legacyLangId(col("text")).as("l"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    val fused = texts.select(col("id"),
        TextFunctions.langId(col("text")).as("l"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(fused === legacy)
  }

  test("text_quality_stats equals the split/regexp/filter formulations") {
    val texts = Seq(
      "the quick brown fox, jumps! over the lazy dog.",
      "a b  c",              // double space → empty token
      "",                    // empty doc
      "trailing space ",     // trailing empty token
      "the",                 // single stopword, no spaces
      "日本語 テキスト the (括弧) and -- end;",
      "[{(\"'.,!?;:-)}]",    // all punctuation
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val sw = TextFunctions.EnglishStopwords
    val legacy = texts.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[.,!?;:'\"()\\[\\]{}-]", "")))
        .as("n_punct"),
      size(filter(split(col("text"), " "), tk => tk.isin(sw: _*)))
        .as("n_stop"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3)))
    val st = graft.plans.TextQualityStats.text_quality_stats(
      col("text"), sw)
    val fused = texts.select(col("doc_id"),
        st.getField("n_tokens").cast("long").as("n_tokens"),
        st.getField("n_punct").as("n_punct"),
        st.getField("n_stop").as("n_stop"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(fused.toSeq === legacy.toSeq)
  }
}
