package graft

import graft.transform.QueryService
import graft.transform.QueryService._

class QueryServiceSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = QueryService.cached(Tables(spark, sfDir, "orders"))

  test("O4: filter + sort + project + limit compose into one plan") {
    val out = QueryService.run(df, Request(
      filters = Seq(Filter("o_orderstatus", Eq, "F"),
        Filter("o_totalprice", Gt, 100000.0)),
      sorts = Seq(Sort("o_totalprice", ascending = false)),
      columns = Seq("o_orderkey", "o_totalprice"),
      limit = Some(10)))
    val rows = out.collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getDouble(1) > 100000.0))
    val prices = rows.map(_.getDouble(1)).toSeq
    assert(prices === prices.sorted.reverse)
    assert(out.columns.toSeq === Seq("o_orderkey", "o_totalprice"))
  }

  test("memoized computes once; later callers read the snapshot") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_memo").toString
    var computes = 0
    def frame = { computes += 1; Tables(spark, sfDir, "region") }
    val first = QueryService.memoized(spark, store, "serve_2024-01-05")(frame)
    assert(first.count() === Tables(spark, sfDir, "region").count())
    assert(computes === 1)
    // a hit must not evaluate the by-name compute at all
    val second = QueryService.memoized(spark, store, "serve_2024-01-05") {
      fail("memo hit recomputed the frame"); ???
    }
    assert(second.count() === first.count())
    assert(computes === 1)
    // different key → fresh compute
    QueryService.memoized(spark, store, "serve_2024-01-06")(frame)
    assert(computes === 2)
  }

  test("contains filter and empty request") {
    val contains = QueryService.run(df,
      Request(filters = Seq(Filter("o_orderpriority", Contains, "URGENT"))))
    assert(contains.count() > 0)
    assert(QueryService.run(df, Request()).count() === df.count())
  }
}
