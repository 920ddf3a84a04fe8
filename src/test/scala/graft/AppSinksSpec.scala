package graft

import java.nio.file.Files

import graft.sources.Sinks
import graft.transform.AppServe
import org.apache.spark.sql.functions._

class AppSinksSpec extends SparkSpec {
  import spark.implicits._

  test("F14: iso2date / date2dataid") {
    assert(AppServe.iso2date("2021-07-04T12:30:45") === "2021-07-04")
    assert(AppServe.date2dataid("2021-07-04") === 1625356800L)
  }

  test("F15: JST formatting (UTC+9)") {
    assert(AppServe.formatJst(1609140469.0) === "2020-12-28 16:27:49")
    val viaColumn = Seq(1609140469.0).toDF("ts")
      .select(AppServe.formatJst(col("ts"))).as[String].head()
    assert(viaColumn === "2020-12-28 16:27:49")
  }

  test("A7+P4: latest prediction per date from listing keys") {
    val keys = Seq(
      "pred/2021-07-04T01:00:00/東京都/prediction.parquet",
      "pred/2021-07-04T13:00:00/東京都/prediction.parquet",
      "pred/2021-07-05T02:00:00/東京都/prediction.parquet",
      "pred/not-a-match.txt").toDF("key")
    val out = AppServe.latestPerDate(keys).orderBy("date")
      .select("date", "time").as[(String, String)].collect().toSeq
    assert(out === Seq(("2021-07-04", "13:00:00"), ("2021-07-05", "02:00:00")))
  }

  test("O3: job-info sort and JSON round trip (K5)") {
    val jobs = Seq(
      AppServe.JobInfo("j2", 2.0, "u1", "url", "cond", "r", "s", "p"),
      AppServe.JobInfo("j1", 1.0, "u2", "url", "cond", "r", "s", "p"),
      AppServe.JobInfo("j3", 1.0, "u1", "url", "cond", "r", "s", "p"))
      .toDF()
    val sorted = AppServe.sortJobs(jobs).select("job_id").as[String].collect()
    assert(sorted.toSeq === Seq("j3", "j1", "j2"))
    val dir = Files.createTempDirectory("graft_jobs").resolve("jobs").toString
    Sinks.writeJson(jobs, dir)
    val back = spark.read.json(dir)
    assert(back.count() === 3)
    assert(back.columns.sorted.toSeq ===
      jobs.columns.sorted.toSeq)
  }

  test("K2: parquet upsert keeps the latest row per key; batch wins ties") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert")
      .resolve("store").toString
    val b1 = Seq(("a", 1L, "v1"), ("b", 1L, "v1"), ("c", 1L, "v1"))
      .toDF("k", "ver", "v")
    graft.sources.Sinks.upsertParquet(b1, dir, Seq("k"), "ver")
    // b updated, c re-delivered at the same version, d inserted
    val b2 = Seq(("b", 2L, "v2"), ("c", 1L, "v1-redelivered"), ("d", 5L, "v5"))
      .toDF("k", "ver", "v")
    graft.sources.Sinks.upsertParquet(b2, dir, Seq("k"), "ver")
    val got = spark.read.parquet(dir).as[(String, Long, String)]
      .collect().toSet
    assert(got === Set(("a", 1L, "v1"), ("b", 2L, "v2"),
      ("c", 1L, "v1-redelivered"), ("d", 5L, "v5")))
    // a stale batch never regresses a newer snapshot row
    graft.sources.Sinks.upsertParquet(
      Seq(("b", 1L, "stale")).toDF("k", "ver", "v"), dir, Seq("k"), "ver")
    val after = spark.read.parquet(dir).filter($"k" === "b")
      .select("v").as[String].collect().toSeq
    assert(after === Seq("v2"))
  }

  test("K1: CSV sink JSON-encodes array columns") {
    val df = Seq(("a", Seq("x", "y"))).toDF("id", "arr")
    val dir = Files.createTempDirectory("graft_csv").resolve("out").toString
    Sinks.writeCsv(df, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.select("arr").as[String].head() === """["x","y"]""")
  }

  test("K4: zip repack preserves names, bytes, and mtimes") {
    val dir = Files.createTempDirectory("graft_zip_sink")
    val out = dir.resolve("repack.zip")
    val mtime = 1609140468L // even (2 s zip resolution)
    Sinks.writeZip(Seq(("p1.html", "abc".getBytes, mtime),
      ("p2.html", "def".getBytes, mtime + 2)), out)
    val zf = new java.util.zip.ZipFile(out.toFile)
    val entries = zf.entries().asIterator()
    val e1 = entries.next()
    assert(e1.getName === "p1.html")
    assert(e1.getTime === mtime * 1000L)
    assert(new String(zf.getInputStream(e1).readAllBytes()) === "abc")
    zf.close()
  }

  test("K3: html page sink writes page_%06d names") {
    val dir = Files.createTempDirectory("graft_html_sink")
    Sinks.writeHtmlPages(Seq(1 -> "<html>1</html>", 42 -> "<html>42</html>"), dir)
    assert(Files.exists(dir.resolve("page_000001.html")))
    assert(Files.exists(dir.resolve("page_000042.html")))
  }

  test("K8: compaction merges small files, preserves data, sizes output") {
    val in = Files.createTempDirectory("graft_compact_in").toString
    val out = Files.createTempDirectory("graft_compact_out").toString
    val docs = graft.Tables(spark, sfDir, "documents")
    docs.repartition(16).write.mode("overwrite").parquet(in)
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files(in).length === 16)
    val total = files(in).map(_.length).sum
    val target = total / 3 // expect ceil(total / (total/3)) = 3..4 files
    val n = Sinks.compactParquet(spark, in, out, target)
    assert(files(out).length === n && n >= 3 && n <= 4)
    // content identical both directions
    val back = spark.read.parquet(out)
    assert(back.exceptAll(docs).count() === 0)
    assert(docs.exceptAll(back).count() === 0)
  }
}
