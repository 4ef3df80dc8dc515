package graft

import org.apache.spark.sql.SaveMode

import graft.sink.SnapshotWriter
import graft.sources.ParquetConnector

class SnapshotSpec extends SparkSpec {

  test("snapshot write/read/prune/rollback lifecycle") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-snap")
      .toString + "/fact"
    def ver(n: Int) = (1 to n).map(i => (i.toLong, s"v$n")).toDF("k", "tag")

    assert(SnapshotWriter.write(spark, ver(1), root, keep = 2) === 0L)
    assert(SnapshotWriter.write(spark, ver(2), root, keep = 2) === 1L)
    assert(SnapshotWriter.read(spark, root).count() === 2)
    // pinned historical read
    assert(SnapshotWriter.read(spark, root, Some(0L)).count() === 1)

    // third write prunes v0 (keep=2)
    assert(SnapshotWriter.write(spark, ver(3), root, keep = 2) === 2L)
    assert(SnapshotWriter.versions(spark, root) === Seq(1L, 2L))
    intercept[Exception](SnapshotWriter.read(spark, root, Some(0L)).count())

    // rollback flips the pointer to a retained version
    SnapshotWriter.rollback(spark, root, 1L)
    assert(SnapshotWriter.read(spark, root).count() === 2)
    assert(SnapshotWriter.read(spark, root).select("tag").distinct()
      .collect().map(_.getString(0)).toSeq === Seq("v2"))
    intercept[IllegalArgumentException](
      SnapshotWriter.rollback(spark, root, 0L))
  }

  test("read falls back to the newest complete version when the pointer is absent") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-snap2")
      .toString + "/fact"
    SnapshotWriter.write(spark, Seq((1L, "v0")).toDF("k", "tag"), root)
    SnapshotWriter.write(spark, Seq((1L, "v1"), (2L, "v1")).toDF("k", "tag"),
      root)
    // simulate a store without atomic replace, observed mid-flip: the
    // pointer file is momentarily gone. write() flips the pointer only
    // AFTER the version directory is complete, so the highest v= dir is
    // always a safe answer.
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "_LATEST"))
    assert(SnapshotWriter.read(spark, root).count() === 2)
    assert(SnapshotWriter.read(spark, root).select("tag").distinct()
      .collect().map(_.getString(0)).toSeq === Seq("v1"))
  }

  test("read serves a legacy store with neither pointer nor _COMMITTED markers") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-snap3")
      .toString + "/fact"
    SnapshotWriter.write(spark, Seq((1L, "v0")).toDF("k", "tag"), root)
    SnapshotWriter.write(spark, Seq((1L, "v1"), (2L, "v1")).toDF("k", "tag"),
      root)
    // versions written before the marker existed: no _COMMITTED anywhere
    // and (mid-flip on a non-atomic store) no pointer either — the
    // newest version directory must still be served, as it was before
    // the marker was introduced
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "_LATEST"))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "v=00000000", "_COMMITTED"))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "v=00000001", "_COMMITTED"))
    assert(SnapshotWriter.read(spark, root).count() === 2)
    assert(SnapshotWriter.read(spark, root).select("tag").distinct()
      .collect().map(_.getString(0)).toSeq === Seq("v1"))
  }

  test("read refuses a torn first-ever write (no pointer, no markers)") {
    // a writer that crashed mid-parquet on a fresh root: version dir
    // with partial files but no _SUCCESS, no _COMMITTED, no _LATEST —
    // the legacy fallback must NOT serve it
    val root = java.nio.file.Files.createTempDirectory("graft-snap-torn")
      .toString + "/fact"
    val torn = java.nio.file.Paths.get(root, "v=00000000")
    java.nio.file.Files.createDirectories(torn)
    java.nio.file.Files.write(torn.resolve("part-00000.parquet"),
      Array[Byte](1, 2, 3))
    intercept[IllegalStateException](SnapshotWriter.read(spark, root))
  }

  test("read refuses a fresh root whose only version was never committed") {
    import spark.implicits._
    // a writer on a FRESH root that crashed after the parquet job
    // (_SUCCESS present) but before the pointer flip / _COMMITTED
    // marker: the single version dir is fully written yet was never
    // committed, and the legacy _SUCCESS fallback (gated to >1 version
    // dirs) must refuse it rather than serve a never-committed version
    val root = java.nio.file.Files.createTempDirectory("graft-snap4")
      .toString + "/fact"
    SnapshotWriter.write(spark, Seq((1L, "v0")).toDF("k", "tag"), root)
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "_LATEST"))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "v=00000000", "_COMMITTED"))
    intercept[IllegalStateException](SnapshotWriter.read(spark, root))
  }

  test("parquet connector mergeSchema reconciles evolved table schemas") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evo").toString
    val conn = ParquetConnector(dir)
    conn.write(Seq((1L, "a")).toDF("k", "v"), "t", SaveMode.Overwrite)
    // schema evolves: a new column appears in later files
    conn.write(Seq((2L, "b", 9.5)).toDF("k", "v", "score"), "t",
      SaveMode.Append)
    val merged = ParquetConnector(dir, mergeSchema = true).read(spark, "t")
      .select("k", "v", "score")
    val rows = merged.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows.toSeq === Seq((1L, "a", None), (2L, "b", Some(9.5))))
  }
}
