package graft

import org.apache.spark.sql.functions._

class CoreQueriesSpec extends SparkSpec {

  test("every registered query runs at sf0.001 and has stable column order") {
    SparkEntry.defs.foreach { d =>
      val df = d.fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"${d.name}: no columns")
      assert(df.count() >= 0, s"${d.name}: failed to execute")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle names are a subset of query names") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("q05 latest-per-user keeps exactly one row per user") {
    val df = SparkEntry.queries("q05_window_latest")(spark, sfDir)
    val users = df.select("user_id").count()
    val distinct = df.select("user_id").distinct().count()
    assert(users === distinct)
  }

  test("q06 keep-first dedup keeps the earliest event per (user, type)") {
    val deduped = SparkEntry.queries("q06_dedup_first")(spark, sfDir)
    val ev = Tables(spark, sfDir, "events")
    val minIds = ev.groupBy("user_id", "event_type")
      .agg(min(struct(col("ts"), col("event_id"))).getField("event_id")
        .as("first_id"))
    val joined = deduped.join(minIds, Seq("user_id", "event_type"))
    assert(joined.filter(col("event_id") =!= col("first_id")).count() === 0L)
  }

  test("q18 split sizes are exact and disjointly cover the table") {
    val orders = Tables(spark, sfDir, "orders")
    val n = orders.count()
    val splits = operators.Splits.threeWay(orders, 0.1875, 0.25, 123L)
    val nVal = (n * 0.1875).toLong
    val nTest = (n * 0.25).toLong
    assert(splits("val").count() === nVal)
    assert(splits("test").count() === nTest)
    assert(splits("train").count() === n - nVal - nTest)
    val keyUnion = splits.values.map(_.select("o_orderkey")).reduce(_ unionAll _)
    assert(keyUnion.distinct().count() === n)
  }

  test("q07 outlier filter drops only exact-quantile matches") {
    val out = SparkEntry.queries("q07_quantile_outlier")(spark, sfDir).head()
    val total = Tables(spark, sfDir, "lineitem").count()
    assert(out.getAs[Long]("n_kept") <= total)
    assert(out.getAs[Double]("q_qty") > 0.0)
  }
}
