package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O4: the interactive serving surface the reference delegates to Dtale
  * (app/app.py:302-309) — declarative filter / sort / project / limit
  * over a cached frame, so every interaction is one Catalyst plan over
  * an in-memory dataset instead of a pandas copy.
  */
object QueryService {

  sealed trait Op
  case object Eq extends Op
  case object Ne extends Op
  case object Lt extends Op
  case object Le extends Op
  case object Gt extends Op
  case object Ge extends Op
  case object Contains extends Op

  final case class Filter(column: String, op: Op, value: Any)

  final case class Sort(column: String, ascending: Boolean = true)

  final case class Request(
      filters: Seq[Filter] = Nil,
      sorts: Seq[Sort] = Nil,
      columns: Seq[String] = Nil,
      limit: Option[Int] = None)

  private def toPredicate(f: Filter): Column = {
    val c = col(f.column)
    f.op match {
      case Eq => c === f.value
      case Ne => c =!= f.value
      case Lt => c < f.value
      case Le => c <= f.value
      case Gt => c > f.value
      case Ge => c >= f.value
      case Contains => c.contains(f.value.toString)
    }
  }

  /** Apply a request to a frame. Filters are conjunctive; projection is
    * applied last so sort columns need not survive it.
    */
  def run(df: DataFrame, req: Request): DataFrame = {
    val filtered = req.filters.foldLeft(df)((d, f) => d.filter(toPredicate(f)))
    val sorted =
      if (req.sorts.isEmpty) filtered
      else filtered.orderBy(req.sorts.map(s =>
        if (s.ascending) col(s.column).asc else col(s.column).desc): _*)
    val limited = req.limit.map(sorted.limit).getOrElse(sorted)
    if (req.columns.isEmpty) limited
    else limited.select(req.columns.map(col): _*)
  }

  /** Serve a dataset repeatedly: cache once, answer many requests —
    * the in-process half of the reference's memo (app/app.py:172-196).
    */
  def cached(df: DataFrame): DataFrame = df.cache()

  /** Cross-process memo — the Redis serving-frame memo
    * (app/app.py:172-196) re-expressed storage-side: the first caller
    * materializes the frame to `<storeDir>/<key>` parquet; every later
    * caller, in this or ANY other Spark application, reads the snapshot
    * instead of recomputing (`compute` is by-name and never evaluated on
    * a hit). Publication is atomic like the Redis SETNX pattern: losers
    * of a write race rename-fail and clean up their staging dir, so
    * readers only ever see one complete snapshot — and the payload stays
    * distributed parquet, with no Redis-value-sized ceiling. Keys should
    * be content-versioned (the reference keys by data date).
    */
  def memoized(spark: org.apache.spark.sql.SparkSession, storeDir: String,
      key: String)(compute: => DataFrame): DataFrame = {
    import org.apache.hadoop.fs.Path
    val dest = new Path(storeDir, key)
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(dest, "_SUCCESS"))) {
      val staging = new Path(storeDir,
        s".${key}__staging_${java.util.UUID.randomUUID()}")
      compute.write.mode("overwrite").parquet(staging.toString)
      // lost race → the winner's snapshot stands, ours is cleaned up
      graft.sources.SnapshotIO.publishIfAbsent(fs, staging, dest)
    }
    spark.read.parquet(dest.toString)
  }
}
