package graft.sources

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.operators.Checkpoints.TruncateOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sinks (SURVEY §2.1 K1-K5). Parquet replaces pickle (K2/S6); CSV keeps
  * the reference's to_csv surface with array columns JSON-encoded
  * (pandas wrote python tuple reprs — not a parseable interchange
  * format, so we do better on purpose); JSON covers the job-info record
  * sink (K5).
  */
object Sinks {

  /** K1/K2: columnar result sink. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** K2 variant: hive-layout partitioned parquet sink (`col=value`
    * directories). This is the storage shape that buys partition
    * pruning downstream: a reader filtering on a partition column
    * never lists, opens, or scans the other directories — at 100 TB
    * the difference between a full-corpus scan and touching one
    * partition. Mirrors the reference's date-keyed S3 prefixes
    * (svc/generate_base_path.py:14-15) as real partition columns.
    */
  def writePartitionedParquet(df: DataFrame, path: String,
      partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Dynamic-partition backfill: overwrite ONLY the partitions the
    * incoming frame actually carries, leaving every sibling partition
    * untouched — the reprocessing primitive a date-partitioned 100 TB
    * store lives on (re-run one bad day without rewriting or even
    * listing the other 3,650). Spark's default static overwrite would
    * truncate the whole root first; `partitionOverwriteMode=dynamic`
    * (set per-write, not session-wide) scopes the delete to the
    * partitions present in `df`. Atomicity is per partition directory
    * (same contract as any hive-layout writer); cross-partition
    * transactionality needs a table format's log.
    */
  def backfillPartitions(df: DataFrame, path: String,
      partCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(path)

  /** Targeted key erasure from a partitioned store — the
    * right-to-be-forgotten pass: delete every row whose `keyCol`
    * appears in `keys`, rewriting ONLY the partitions that contain
    * such rows. Three steps, none of which touches an unaffected
    * partition's data twice: (1) one scan finds the affected
    * partition values (semi-join against the broadcast key set);
    * (2) the affected partitions — and only they, via a pruned scan —
    * are anti-joined and rewritten through the dynamic-overwrite
    * sink; (3) partitions whose rows were ALL erased are deleted
    * explicitly, because a dynamic overwrite cannot write an empty
    * partition — without this step a fully-erased user's data would
    * silently SURVIVE, the worst possible failure mode for an erasure
    * primitive. Returns the number of rows erased.
    *
    * The key set broadcasts (erasure requests are tiny against a
    * 100 TB store); the semi/anti joins therefore never shuffle the
    * store. Single-writer contract, like every sink here.
    */
  def eraseKeys(spark: org.apache.spark.sql.SparkSession, path: String,
      partCol: String, keyCol: String, keys: DataFrame): Long = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val k = broadcast(keys.select(col(keyCol)).distinct())
    val store = spark.read.parquet(path)
    val hit = store.join(k, Seq(keyCol), "semi")
    val affected = hit.select(col(partCol)).distinct().collect()
      .map(_.get(0))
    if (affected.isEmpty) return 0L
    val erased = hit.count()
    val scoped = store.filter(col(partCol).isin(affected: _*))
    // localCheckpoint: the remainder must be MATERIALIZED before the
    // write — its lineage reads the very path the overwrite mutates,
    // and survivors must be known before the store changes
    val remaining = scoped.join(k, Seq(keyCol), "anti").truncated
    val survivors = remaining.select(col(partCol)).distinct().collect()
      .map(_.get(0)).toSet
    // partitions with survivors: rewrite in place (dynamic overwrite)
    backfillPartitions(remaining, path, Seq(partCol))
    // partitions erased entirely: remove their directories outright
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    affected.filterNot(survivors).foreach { v =>
      fs.delete(
        new org.apache.hadoop.fs.Path(path, s"$partCol=$v"), true)
    }
    erased
  }

  /** Resolve the live snapshot of an upsert store for reading. A
    * versioned store (round 9 layout: `_snapshots/` + `_manifest/`
    * pointer files, [[SnapshotIO.publishVersion]]) resolves through
    * its newest manifest; a legacy flat store — or any plain parquet
    * directory, e.g. fresh [[compactParquet]] output — reads as
    * itself. Retention contract (matches SnapshotIO's module doc): a
    * resolved snapshot dir is complete and immutable, and survives
    * until `keep` FURTHER publishes land — so a reader is safe as long
    * as fewer than `keep` publishes happen between its resolve and the
    * end of its scan (the manifest and its snapshot dir are pruned at
    * the same cutoff, not staggered).
    */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val resolved = SnapshotIO.resolveSnapshot(fs, root)
      .map(_.toString).getOrElse(path)
    spark.read.parquet(resolved)
  }

  /** Time travel on a versioned upsert store: read generation `seq`
    * exactly as it was published. Retention-bounded — a pruned
    * generation throws with the retained range rather than silently
    * reading something else.
    */
  def readSnapshotAt(spark: org.apache.spark.sql.SparkSession,
      path: String, seq: Long): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    SnapshotIO.resolveSnapshotAt(fs, root, seq) match {
      case Some(p) => spark.read.parquet(p.toString)
      case None =>
        val kept = SnapshotIO.generations(fs, root).map(_._1)
        throw new java.io.IOException(
          s"generation $seq of $path is not retained " +
            s"(kept: ${kept.mkString("[", ",", "]")})")
    }
  }

  /** Keep-latest upsert into a plain-parquet snapshot — MERGE semantics
    * without a table format: union the current snapshot with the batch,
    * keep the best row per key (greatest `orderCol`; the incoming batch
    * wins ties, so re-delivering a batch is idempotent), publish via
    * [[SnapshotIO.publishVersion]]. Since round 9 the store is
    * VERSIONED — each upsert writes an immutable numbered snapshot dir
    * and atomically adds a new manifest pointer file, so a concurrent
    * reader ([[readSnapshot]]) never sees a missing or partial store;
    * the pre-round-9 two-rename swap had a documented absence window.
    * One shuffle on the key — the compaction a log-structured table
    * (Delta/Iceberg) eventually pays anyway, without the dependency.
    * Single-writer by contract; concurrent writers need a real table
    * format's log. The batch must carry at most ONE candidate row per
    * key: the fresh-table fast path writes it verbatim, so a
    * multi-row-per-key batch would survive unmerged — collapse first
    * (as StreamJoin.upsertSink does per micro-batch). Legacy flat
    * stores are read as generation 0 and upgraded in place.
    */
  def upsertParquet(batch: DataFrame, path: String, keyCols: Seq[String],
      orderCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val current = SnapshotIO.resolveSnapshot(fs, root)
      .map(_.toString)
      .orElse(if (fs.exists(new Path(root, "_SUCCESS"))) Some(path)
        else None)
    val merged = current match {
      case None => batch
      case Some(cur) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          .orderBy(col(orderCol).desc, col("__src").desc)
        spark.read.parquet(cur).withColumn("__src", lit(0))
          .unionByName(batch.withColumn("__src", lit(1)))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn", "__src")
    }
    val staging = new Path(root,
      s".staging_${java.util.UUID.randomUUID()}")
    merged.write.mode("overwrite").parquet(staging.toString)
    SnapshotIO.publishVersion(fs, root, staging)
  }

  /** K1: CSV sink; array columns serialized as JSON strings. */
  def writeCsv(df: DataFrame, path: String): Unit = {
    val flat = df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType =>
          d.withColumn(f.name, to_json(col(f.name)))
        case _ => d
      }
    }
    flat.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** K5: JSON-lines sink. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Date-partitioned parquet layout (`dt=YYYY-MM-DD/`) — the daily-drop
    * layout (reference: date-keyed S3 prefixes,
    * svc/generate_base_path.py:14-15). Readers with a `dt` predicate get
    * Catalyst partition pruning: only matching directories are scanned.
    */
  def writePartitionedByDate(df: DataFrame, tsCol: String,
      path: String): Unit =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("overwrite")
      .partitionBy("dt")
      .parquet(path)

  /** K7: ORC sink — the second columnar interchange format (Spark
    * ships the ORC datasource in-box). Same overwrite contract as the
    * parquet sink; q112 grades the write→read round-trip against the
    * parquet-derived oracle, so type fidelity (strings, longs,
    * doubles, dates) is checked end to end rather than assumed.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = spark.read.orc(path)

  /** K8: small-file compaction — the operational pass every long-lived
    * 100 TB table needs. Incremental sinks (per-batch appends, CDC
    * upserts, streaming micro-batches) accrete files far smaller than
    * a sane scan split; readers then pay per-file open/footer costs
    * and lose large sequential reads. This rewrites a parquet
    * directory into ⌈total_bytes / targetBytes⌉ files of roughly
    * equal size and returns the file count. Compaction writes to a
    * NEW path (swap is the caller's transaction, same as table
    * formats do) and goes through coalesce — a narrow, shuffle-free
    * merge of input splits.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
      inPath: String, outPath: String,
      targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0)
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(inPath)
    val rootFs = root.getFileSystem(hconf)
    // a versioned upsert store compacts its LIVE snapshot
    val p = SnapshotIO.resolveSnapshot(rootFs, root).getOrElse(root)
    val fs = p.getFileSystem(hconf)
    val total = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1, ((total + targetBytes - 1) / targetBytes).toInt)
    spark.read.parquet(p.toString).coalesce(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** K3: one file per page, page_%06d.html (dumping.py:223-226). */
  def writeHtmlPages(pages: Seq[(Int, String)], dir: Path): Unit = {
    Files.createDirectories(dir)
    pages.foreach { case (page, html) =>
      Files.writeString(dir.resolve(f"page_$page%06d.html"), html)
    }
  }

  /** K4: zip repack preserving mtimes (svc/zip_property_data.py:34-100).
    * Entry times carry the original file mtimes (2 s zip resolution).
    */
  def writeZip(files: Seq[(String, Array[Byte], Long)], out: Path): Unit = {
    val zos = new ZipOutputStream(Files.newOutputStream(out))
    try files.foreach { case (name, bytes, mtimeSec) =>
      val e = new ZipEntry(name)
      e.setTime(mtimeSec * 1000L)
      zos.putNextEntry(e)
      zos.write(bytes)
      zos.closeEntry()
    } finally zos.close()
  }
}
