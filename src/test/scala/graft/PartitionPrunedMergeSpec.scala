package graft

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.sink.UpsertWriter

class PartitionPrunedMergeSpec extends SparkSpec {

  private def fileSnapshot(dir: String): Seq[(String, Long, Long)] = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val p = new Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isFile)
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
      .sortBy(_._1)
  }

  test("partition-pruned merge rewrites only touched partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ppm").toString +
      "/fact"
    val init = Seq(
      (1L, 10, "a"), (2L, 10, "b"),
      (3L, 20, "c"), (4L, 20, "d"),
      (5L, 30, "e")
    ).toDF("k", "day", "v")
    val n0 = UpsertWriter.upsertPartitionPruned(spark, init, dir,
      keys = Seq("k", "day"), partitionBy = Seq("day"))
    assert(n0 === 5)

    val day10Before = fileSnapshot(s"$dir/day=10")
    val day30Before = fileSnapshot(s"$dir/day=30")
    assert(day10Before.nonEmpty)

    // batch: update (3, 20), insert (6, 20), open new partition day=40
    val batch = Seq((3L, 20, "C!"), (6L, 20, "f"), (7L, 40, "g"))
      .toDF("k", "day", "v")
    val n1 = UpsertWriter.upsertPartitionPruned(spark, batch, dir,
      keys = Seq("k", "day"), partitionBy = Seq("day"))
    assert(n1 === 4, "touched partitions hold 4 rows after the merge")

    // contents: day=20 merged by key, day=40 created, others intact
    val got = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(1))).toSet
    assert(got === Set(
      (1L, 10, "a"), (2L, 10, "b"),
      (3L, 20, "C!"), (4L, 20, "d"), (6L, 20, "f"),
      (5L, 30, "e"), (7L, 40, "g")))

    // the untouched partitions were not rewritten: identical file
    // names, lengths, and modification times
    assert(fileSnapshot(s"$dir/day=10") === day10Before)
    assert(fileSnapshot(s"$dir/day=30") === day30Before)
  }

  test("empty batch is a no-op; partition column must be in the keys") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ppm2")
      .toString + "/fact"
    val init = Seq((1L, 10, "a")).toDF("k", "day", "v")
    UpsertWriter.upsertPartitionPruned(spark, init, dir,
      Seq("k", "day"), Seq("day"))
    val before = fileSnapshot(s"$dir/day=10")
    assert(UpsertWriter.upsertPartitionPruned(spark,
      init.filter("k < 0"), dir, Seq("k", "day"), Seq("day")) === 0L)
    assert(fileSnapshot(s"$dir/day=10") === before)
    intercept[IllegalArgumentException] {
      UpsertWriter.upsertPartitionPruned(spark, init, dir,
        keys = Seq("k"), partitionBy = Seq("day"))
    }
  }

  test("current-state scan partition-prunes to the touched directories") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ppm3")
      .toString + "/fact"
    (1 to 100).map(i => (i.toLong, i % 10, s"v$i")).toDF("k", "day", "v")
      .write.partitionBy("day").parquet(dir)
    // the predicate the merge builds: equality on the partition column
    val pruned = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("day") <=> 3)
    val exec = pruned.queryExecution.executedPlan.collectLeaves()
      .head.asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
    assert(exec.toString.contains("PartitionFilters:"), exec.toString)
    assert(pruned.collect().length === 10)
    // pruned scan opened exactly the files of the one touched directory
    val day3Files = new java.io.File(s"$dir/day=3").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(day3Files > 0)
    assert(exec.metrics("numFiles").value === day3Files,
      "scan must list only the touched partition's files")
  }

  test("crash between promote renames: history restored, nothing lost") {
    import spark.implicits._
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)

    // whole-table path: the promote died after target→backup, before
    // staging→target — live table is GONE, history sits at __old
    val dir1 = java.nio.file.Files.createTempDirectory("graft-cr1")
      .toString + "/fact"
    UpsertWriter.upsert(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      dir1, Seq("k"))
    fs.rename(new Path(dir1), new Path(dir1 + "__old"))
    assert(!fs.exists(new Path(dir1)))
    val n1 = UpsertWriter.upsert(spark,
      Seq((2L, "B!"), (3L, "c")).toDF("k", "v"), dir1, Seq("k"))
    assert(n1 === 3, "history must be restored before the merge")
    assert(spark.read.parquet(dir1).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "a"), (2L, "B!"), (3L, "c")))

    // partition-pruned path: one partition's swap died mid-rename
    val dir2 = java.nio.file.Files.createTempDirectory("graft-cr2")
      .toString + "/fact"
    UpsertWriter.upsertPartitionPruned(spark,
      Seq((1L, 10, "a"), (2L, 20, "b")).toDF("k", "day", "v"),
      dir2, Seq("k", "day"), Seq("day"))
    fs.mkdirs(new Path(dir2 + "__old"))
    fs.rename(new Path(dir2, "day=10"), new Path(dir2 + "__old/day=10"))
    assert(!fs.exists(new Path(dir2, "day=10")))
    UpsertWriter.upsertPartitionPruned(spark,
      Seq((1L, 10, "A!")).toDF("k", "day", "v"),
      dir2, Seq("k", "day"), Seq("day"))
    assert(spark.read.parquet(dir2).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getString(1))).toSet ===
      Set((1L, 10, "A!"), (2L, 20, "b")))
    assert(!fs.exists(new Path(dir2 + "__old")))
  }

  test("per-partition backups live OUTSIDE the table root") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ppm4")
      .toString
    val dir = base + "/fact"
    val init = Seq((1L, 10, "a"), (2L, 20, "b")).toDF("k", "day", "v")
    UpsertWriter.upsertPartitionPruned(spark, init, dir,
      Seq("k", "day"), Seq("day"))

    // simulate the crash window: a backup left at the new out-of-root
    // location (<root>__old/day=…). Readers of the table root must be
    // unaffected — the old in-root layout (day=10__old INSIDE the root)
    // was discovered as a real partition, duplicating stale rows and
    // corrupting partition-column type inference during the window.
    Seq((1L, "stale")).toDF("k", "v").write
      .parquet(s"${dir}__old/day=10")
    assert(spark.read.parquet(dir).count() === 2)
    assert(spark.read.parquet(dir).filter("v = 'stale'").count() === 0)

    // the next merge still succeeds and clears the leftover backup root
    UpsertWriter.upsertPartitionPruned(spark,
      Seq((1L, 10, "A!")).toDF("k", "day", "v"), dir,
      Seq("k", "day"), Seq("day"))
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"${dir}__old")),
      "backup root must be cleaned up after a successful swap")
    // and the table root itself holds only real partition directories
    val entries = fs.listStatus(new Path(dir)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
    assert(entries.forall(e => e.startsWith("day=") && !e.contains("__old")),
      s"table root must never contain backup directories, got $entries")
    assert(spark.read.parquet(dir).filter("k = 1").select("v")
      .collect().map(_.getString(0)).toSeq === Seq("A!"))
  }
}
