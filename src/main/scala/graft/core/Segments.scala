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
}
