package graft.sources

import java.io.IOException
import java.nio.charset.StandardCharsets

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

  // ------------------------------------------------------------------
  // Versioned store (round 9): manifest-pointer publication.
  //
  // The pre-round-9 two-rename swap left a window where a concurrent
  // reader saw no directory at all. This store removes it the way table
  // formats do, with none of the dependency: snapshots are IMMUTABLE
  // numbered directories and the "current" pointer is a new FILE per
  // generation —
  //
  //   root/_snapshots/s<seq12>_<uuid>/   parquet snapshot (never mutated)
  //   root/_manifest/m<seq12>            content = snapshot dir name
  //
  // A publish renames the staged snapshot into _snapshots, then stages
  // and renames a pointer file to the NEW name m<seq+1> — rename to a
  // fresh name is atomic on HDFS and POSIX alike, and nothing existing
  // is deleted or replaced, so every reader resolves either the old
  // generation or the new one, both complete. Old generations are
  // pruned only once `keep` newer ones exist; a reader must lag `keep`
  // whole upserts mid-scan to ever see a vanished file (the same
  // bounded-retention contract a table format's snapshot expiry has).
  //
  // A legacy flat store (parquet files directly under root, the
  // pre-round-9 layout) reads as generation 0 and is upgraded by the
  // first versioned publish; its root-level files are removed by the
  // same pruning rule.
  // ------------------------------------------------------------------

  private val SnapshotsDir = "_snapshots"
  private val ManifestDir = "_manifest"

  private def seqOf(name: String): Option[Long] = {
    val core = name.stripPrefix("m").stripPrefix("s")
    val digits = core.takeWhile(_.isDigit)
    if (digits.length == 12) Some(digits.toLong) else None
  }

  private def manifests(fs: FileSystem, root: Path): Seq[(Long, Path)] = {
    val dir = new Path(root, ManifestDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .flatMap(st => seqOf(st.getPath.getName).map(_ -> st.getPath))
      .sortBy(_._1)
  }

  /** Pointer contents of `mpath`, or None when the manifest vanished
    * between a directory listing and this open — a concurrent prune
    * expiring an old generation. Absence, not an error: the listing
    * path must tolerate it the same way resolveSnapshotAt treats an
    * already-pruned seq.
    */
  private def readPointer(fs: FileSystem, root: Path,
      mpath: Path): Option[Path] =
    try {
      val in = fs.open(mpath)
      val name = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim finally in.close()
      Some(new Path(new Path(root, SnapshotsDir), name))
    } catch {
      case _: java.io.FileNotFoundException => None
    }

  /** The live snapshot directory of a versioned store, or None when no
    * generation has been published (callers then fall back to the
    * legacy flat layout). If the newest manifest vanished mid-read, it
    * can only have been pruned because newer publishes landed — so
    * rather than silently settling for an older survivor of the stale
    * listing, the directory is re-listed ONCE and the fresh newest
    * generation returned; the stale survivor remains the last-resort
    * fallback (consistent, merely older).
    */
  def resolveSnapshot(fs: FileSystem, root: Path): Option[Path] = {
    def attempt(): (Boolean, Option[Path]) = {
      var sawVanished = false
      val hit = manifests(fs, root).reverseIterator
        .flatMap { case (_, mpath) =>
          val p = readPointer(fs, root, mpath)
          if (p.isEmpty) sawVanished = true
          p
        }
        .nextOption()
      (sawVanished, hit)
    }
    val (stale, first) = attempt()
    if (!stale) first
    else attempt()._2.orElse(first)
  }

  /** Every RETAINED generation of the store, ascending (seq, snapshot
    * dir) — the time-travel surface. Bounded by the publish `keep`,
    * so this lists at most `keep` entries; a generation pruned between
    * the listing and the pointer read is simply omitted.
    */
  def generations(fs: FileSystem, root: Path): Seq[(Long, Path)] =
    manifests(fs, root).flatMap { case (seq, mpath) =>
      readPointer(fs, root, mpath).map(seq -> _)
    }

  /** Snapshot dir of generation `seq`, or None if never published or
    * already pruned past the retention bound — pruned is absence, not
    * an error, mirroring a table format's expired snapshots.
    */
  def resolveSnapshotAt(fs: FileSystem, root: Path,
      seq: Long): Option[Path] =
    manifests(fs, root).find(_._1 == seq)
      .flatMap { case (_, mpath) => readPointer(fs, root, mpath) }

  /** Publish `staging` as the next generation of the versioned store at
    * `root`. Single-writer by contract (generation numbers are taken
    * as max+1, not reserved). `keep` ≥ 1 bounds retained generations.
    */
  def publishVersion(fs: FileSystem, root: Path, staging: Path,
      keep: Int = 4): Unit = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val snaps = new Path(root, SnapshotsDir)
    val mans = new Path(root, ManifestDir)
    fs.mkdirs(snaps)
    fs.mkdirs(mans)
    val prev = manifests(fs, root)
    val seq = prev.lastOption.map(_._1 + 1).getOrElse(1L)
    val snapName = f"s$seq%012d_${java.util.UUID.randomUUID()}"
    val snapDest = new Path(snaps, snapName)
    if (!fs.rename(staging, snapDest)) {
      fs.delete(staging, true)
      throw new IOException(s"cannot stage snapshot generation $seq at $snapDest")
    }
    // pointer file: stage under a unique temp name, rename to the NEW
    // final name — atomic, replaces nothing
    val tmp = new Path(mans, s".m_tmp_${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(snapName.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val mDest = new Path(mans, f"m$seq%012d")
    if (!fs.rename(tmp, mDest)) {
      fs.delete(tmp, true)
      fs.delete(snapDest, true)
      throw new IOException(
        s"manifest $mDest already exists — concurrent writer on $root")
    }
    // prune: generations ≤ seq − keep (manifest first, then dirs; an
    // orphaned snapshot from a crashed publish is caught by the same
    // seq rule once enough generations pass)
    val cutoff = seq - keep
    manifests(fs, root).filter(_._1 <= cutoff)
      .foreach { case (_, p) => fs.delete(p, false) }
    // stale pointer temps: a publish that crashed between create(tmp)
    // and rename leaves .m_tmp_* behind, and the seq-based prune never
    // matches them — sweep them here (single-writer contract: any
    // .m_tmp_ still present at this point is not ours and not live)
    fs.listStatus(mans).toSeq
      .filter(_.getPath.getName.startsWith(".m_tmp_"))
      .foreach(st => fs.delete(st.getPath, false))
    if (fs.exists(snaps)) fs.listStatus(snaps).toSeq
      .filter(st => seqOf(st.getPath.getName).exists(_ <= cutoff))
      .foreach(st => fs.delete(st.getPath, true))
    // legacy flat files (generation 0) age out under the same rule
    if (cutoff >= 0 && fs.exists(new Path(root, "_SUCCESS"))) {
      fs.listStatus(root).toSeq
        .filter(_.isFile)
        .filter { st =>
          val n = st.getPath.getName
          n == "_SUCCESS" || n.endsWith(".parquet")
        }
        .foreach(st => fs.delete(st.getPath, false))
    }
  }
}
