package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Tiny-file + listing plumbing for the persisted-index segment protocol,
  * shared by the dedup indexes ([[graft.operators.Dedup]]) and the vector
  * index ([[graft.operators.Ivf]]). The protocol itself (sequence sidecars,
  * fold markers, visibility rules) is documented at the Dedup segment-notes
  * block; this object is only the atomic-publish and listing primitives.
  */
private[graft] object Segments {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
  def conf(spark: SparkSession): Configuration = spark.sparkContext.hadoopConfiguration

  /** Atomic small-file publish: temp write + rename-overwrite (the mark
    * protocol of [[graft.streaming.Ingest.Marks]]). */
  def writeAtomic(fs: FileSystem, conf: Configuration, dst: Path, content: String): Unit = {
    fs.mkdirs(dst.getParent)
    val tmp = new Path(dst.getParent, s".${dst.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    FileContext.getFileContext(dst.toUri, conf).rename(tmp, dst, Options.Rename.OVERWRITE)
  }

  def readSmall(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()
  }

  /** The segment's committed sequence number, or None if uncommitted. */
  def readSeq(fs: FileSystem, dir: Path): Option[Long] = {
    val p = new Path(dir, "_SEQ")
    if (fs.exists(p)) scala.util.Try(readSmall(fs, p).trim.toLong).toOption else None
  }

  def listDirs(fs: FileSystem, parent: Path): Seq[Path] =
    if (!fs.exists(parent)) Seq.empty
    else fs.listStatus(parent).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
      .map(_.getPath)

  def listFiles(fs: FileSystem, parent: Path): Seq[Path] =
    if (!fs.exists(parent)) Seq.empty
    else fs.listStatus(parent).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("."))
      .map(_.getPath)

  /** The fold markers under `root/_folded`: marker name -> the relative
    * segment names it lists as folded. */
  def readMarkers(fs: FileSystem, root: Path): Map[String, Seq[String]] =
    listFiles(fs, new Path(root, "_folded"))
      .map(p => p.getName -> readSmall(fs, p).split("\n").map(_.trim).filter(_.nonEmpty).toSeq)
      .toMap

  /** Finish a crashed [[swapInto]]: if the final tree is missing but a
    * COMMITTED staged tree (its `_SUCCESS` present) exists, rename it
    * into place. Call at the entry of any maintenance op that stages —
    * the one crash window swapping leaves (between delete and rename)
    * then self-heals on the next call instead of stranding the index. */
  def healSwap(fs: FileSystem, stagingDir: Path, finalDir: Path): Unit =
    if (!fs.exists(finalDir) && fs.exists(new Path(stagingDir, "_SUCCESS"))) {
      fs.rename(stagingDir, finalDir); ()
    }

  /** Swap a fully-written staged tree into place over `finalDir`. The
    * staged tree must be durably complete (parquet `_SUCCESS`) BEFORE
    * this call: a crash before it leaves the old tree untouched (partial
    * staging is overwritten on rerun), a crash between the delete and
    * the rename leaves the complete staged tree for [[healSwap]] — at no
    * point does neither complete tree exist on disk. This is what makes
    * an in-place rewrite of a store FROM ITS OWN CONTENTS crash-safe:
    * the read plan streams from the old tree while the write lands in
    * the sibling, with no reliance on executor-memory checkpoints that a
    * crash would lose. */
  def swapInto(fs: FileSystem, stagingDir: Path, finalDir: Path): Unit = {
    require(fs.exists(new Path(stagingDir, "_SUCCESS")),
      s"staged tree $stagingDir is not committed (_SUCCESS missing)")
    if (fs.exists(finalDir)) { fs.delete(finalDir, true); () }
    fs.rename(stagingDir, finalDir); ()
  }

  // NAMED-SEGMENT NAME REUSE (the folded-name hazard, and why there is no
  // write-time guard): a segment written under a name a live fold marker
  // lists as folded is INVISIBLE to readers. For a crash-REPLAYED batch
  // that is exactly right — its rows already live in the compacted
  // segment, and the replayed rewrite must stay excluded (spec-pinned in
  // the replay-after-fold tests). The writer cannot distinguish that
  // legitimate replay from the hazardous case — a streaming-checkpoint
  // RESET restarting batch ids at 0 against an index whose markers
  // survived GC — so the contract lives with the operator instead: a
  // checkpoint reset requires a fresh index (or a fresh segment-name
  // prefix); name collisions with LIVE segments would clobber them under
  // overwrite semantics anyway, folded or not.
}
