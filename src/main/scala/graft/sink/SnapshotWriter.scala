package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Versioned snapshot store over plain parquet — the minimal time-travel
 * /rollback layer a lake-format table gives for free, for environments
 * where the fact tables are bare parquet directories (this one). Each
 * write lands in an immutable `v=NNNNNNNN` directory; a `_LATEST`
 * pointer file flips atomically afterwards, so readers either see the
 * previous complete version or the new complete version, never a
 * partial write. Old versions are pruned to `keep` — rollback is
 * "point `_LATEST` back", exposed as [[rollback]].
 *
 * Scale: the pointer file is one metadata read per query; version
 * directories are immutable so caches/object stores never see
 * overwritten bytes (the same property lake formats rely on).
 */
object SnapshotWriter {

  private val Latest = "_LATEST"
  private val Committed = "_COMMITTED"

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def versionDirs(f: FileSystem, root: Path): Seq[(Long, Path)] =
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(s => s.getPath.getName.stripPrefix("v=").toLong -> s.getPath)
      .sortBy(_._1)

  private def readPointer(f: FileSystem, root: Path): Option[Long] = {
    val p = new Path(root, Latest)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        if (s.isEmpty) None else Some(s.toLong)
      } finally in.close()
    }
  }

  private def writePointer(f: FileSystem, root: Path, v: Long): Unit = {
    // write-then-rename-with-OVERWRITE: the pointer flip is the atomic
    // commit. A delete-then-rename pair would open a window where
    // `_LATEST` does not exist and a concurrent read() throws — the
    // FileContext rename replaces the old pointer in one operation.
    val tmp = new Path(root, Latest + ".tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      root.toUri, f.getConf)
    fc.rename(f.makeQualified(tmp), f.makeQualified(new Path(root, Latest)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Write `df` as the next version and flip `_LATEST` to it.
    * @return the new version number */
  def write(spark: SparkSession, df: DataFrame, root: String,
            keep: Int = 3): Long = {
    require(keep >= 1, s"must keep at least the new version, got $keep")
    val f = fs(spark)
    val rootP = new Path(root)
    val next = versionDirs(f, rootP).lastOption.map(_._1 + 1).getOrElse(0L)
    val dir = new Path(rootP, f"v=$next%08d")
    df.write.mode(SaveMode.ErrorIfExists).parquet(dir.toString)
    writePointer(f, rootP, next)
    // marker AFTER the pointer flip: its presence proves this version
    // was once committed, so the pointer-absent fallback in read()
    // can never serve a version whose flip never happened
    f.create(new Path(dir, Committed), true).close()
    // prune everything older than the keep window — but never a version
    // the pointer might still name (the pointer was just flipped to
    // `next`, so anything below the window is unreachable)
    versionDirs(f, rootP).dropRight(keep)
      .foreach { case (_, p) => f.delete(p, true) }
    next
  }

  /** Read the version `_LATEST` names (or a pinned historical one). */
  def read(spark: SparkSession, root: String,
           version: Option[Long] = None): DataFrame = {
    val f = fs(spark)
    val rootP = new Path(root)
    // belt-and-braces: if the pointer is momentarily absent (non-HDFS
    // stores without atomic replace), fall back to the highest version
    // carrying a `_COMMITTED` marker — the marker is written after the
    // pointer flip, so a writer that crashed after fully writing its
    // directory but before its first flip is never served by THIS
    // fallback (the weaker legacy fallback below has its own gate)
    val dirs = versionDirs(f, rootP)
    val v = version.orElse(readPointer(f, rootP))
      .orElse(dirs.reverse
        .find { case (_, p) => f.exists(new Path(p, Committed)) }
        .map(_._1))
      // legacy roots: versions written before the `_COMMITTED` marker
      // existed carry none — serve the newest directory that finished
      // its parquet job (Spark's own `_SUCCESS`). Gated to roots with
      // MORE THAN ONE version directory: a pre-marker store in real use
      // has accumulated history, whereas a fresh root whose only dir is
      // a fully-written-but-never-committed first write (crash between
      // the parquet job and the pointer flip) must be refused — with a
      // single dir, _SUCCESS alone cannot distinguish the two
      .orElse(if (dirs.length > 1) dirs.reverse
        .find { case (_, p) => f.exists(new Path(p, "_SUCCESS")) }
        .map(_._1)
      else None)
      .getOrElse(
        throw new IllegalStateException(s"no snapshot at $root"))
    spark.read.parquet(new Path(rootP, f"v=$v%08d").toString)
  }

  /** Available versions, oldest first. */
  def versions(spark: SparkSession, root: String): Seq[Long] =
    versionDirs(fs(spark), new Path(root)).map(_._1)

  /** Point `_LATEST` back at a retained historical version. */
  def rollback(spark: SparkSession, root: String, version: Long): Unit = {
    val f = fs(spark)
    val rootP = new Path(root)
    require(versionDirs(f, rootP).exists(_._1 == version),
      s"version $version is not retained at $root")
    writePointer(f, rootP, version)
  }
}
