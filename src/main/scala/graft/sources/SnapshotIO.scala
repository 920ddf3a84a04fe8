package graft.sources

import java.io.IOException

import org.apache.hadoop.fs.{FileSystem, Path}

/** Snapshot publication for plain-parquet stores — the shared
  * staging-dir + rename machinery under [[Sinks.upsertParquet]] and
  * `QueryService.memoized`.
  *
  * One filesystem subtlety both must handle: with an EXISTING directory
  * at `dest`, HDFS-semantics `rename(staging, dest)` does not fail — it
  * moves `staging` INSIDE `dest` and reports success. Every publish
  * therefore re-checks for the nested artifact after the rename and
  * cleans it up, so a lost race never leaks a second snapshot into the
  * store.
  */
object SnapshotIO {

  /** Publish `staging` as `dest` only if no snapshot exists yet (the
    * SETNX shape). Returns true when this caller's staging became the
    * snapshot; on a lost race the staging dir is deleted and false is
    * returned — `dest` then holds the winner's complete snapshot.
    */
  def publishIfAbsent(fs: FileSystem, staging: Path, dest: Path): Boolean = {
    fs.mkdirs(dest.getParent)
    if (fs.exists(dest)) { fs.delete(staging, true); return false }
    if (!fs.rename(staging, dest)) { fs.delete(staging, true); return false }
    val nested = new Path(dest, staging.getName)
    if (fs.exists(nested)) { fs.delete(nested, true); false } else true
  }

  /** Replace `dest` with `staging` (the upsert shape), rotating the old
    * snapshot through a trash dir and restoring it on any failure, so a
    * complete snapshot always survives. Two renames cannot be one
    * atomic operation on a filesystem without a metadata log, so a
    * concurrent reader can observe a brief window with no `dest`; it
    * never observes a partial or mixed one. Single-writer by contract.
    */
  def swap(fs: FileSystem, staging: Path, dest: Path): Unit = {
    val trash = new Path(dest.getParent,
      s".${dest.getName}__old_${java.util.UUID.randomUUID()}")
    val hadOld = fs.exists(dest)
    if (hadOld && !fs.rename(dest, trash)) {
      fs.delete(staging, true)
      throw new IOException(s"cannot rotate the current snapshot at $dest")
    }
    if (!fs.rename(staging, dest)) {
      if (hadOld) fs.rename(trash, dest) // restore; never lose the store
      fs.delete(staging, true)
      throw new IOException(s"snapshot swap failed for $dest")
    }
    val nested = new Path(dest, staging.getName)
    if (fs.exists(nested)) {
      // a concurrent writer violated the single-writer contract and we
      // renamed INTO its dest: undo and surface the conflict
      fs.delete(nested, true)
      throw new IOException(s"concurrent writer detected on $dest")
    }
    if (hadOld) fs.delete(trash, true)
  }
}
