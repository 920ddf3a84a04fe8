package graft

import org.apache.spark.sql.DataFrame

/** The streaming family under the RocksDB state store provider. The
  * default (HDFSBackedStateStoreProvider) keeps every key's state on
  * the executor HEAP — at 100 TB-stream state that is the first thing
  * to fall over; RocksDB spills to local disk and is the provider a
  * real deployment runs. These specs drain each stateful query once
  * under each provider and require identical results — the state
  * store is storage, not semantics.
  *
  * Queries covered: every stateful streaming entry in the registry
  * (count-min, HLL, expectations, top-k, decay, and the foreachBatch
  * upsert-store maintainer). The q227 store is idempotent by contract
  * (same batches, same keyed merge winner), so a second drain in the
  * same JVM reaches the same state.
  */
class RocksDbStateSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val StatefulQueries = Seq(
    "q118_stream_count_min", "q142_stream_hll", "q149_stream_expectations",
    "q156_stream_topk", "q169_stream_decay", "q227_stream_upsert_snapshot")

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))

  test("every stateful streaming query drains identically under RocksDB") {
    val byName = SparkEntry.queries
    StatefulQueries.foreach { name =>
      val fn = byName(name)
      val default = rows(fn(spark, sfDir))
      spark.conf.set(ProviderKey, RocksDb)
      val rocks =
        try rows(fn(spark, sfDir))
        finally spark.conf.unset(ProviderKey)
      assert(rocks === default, s"$name diverged under RocksDB state store")
      assert(default.nonEmpty, s"$name returned no rows")
    }
  }
}
