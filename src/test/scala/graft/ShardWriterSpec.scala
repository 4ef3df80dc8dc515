package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** [[CorpusStats.writeTrainingShards]]: the materialized shard files
  * must agree with the returned manifest row for row (ids, token
  * counts, position contiguity), store rows in epoch-shuffle order,
  * and overwrite bit-identically on a re-run. */
class ShardWriterSpec extends SparkSpec {

  private def docs =
    graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  private def readBack(path: String) =
    spark.read.parquet(path)
      .select(col("shard_id").cast("long").as("shard_id"), col("doc_id"),
        col("n_tok"), col("shuffle_pos"))

  test("files match the manifest: counts, tokens, contiguous positions") {
    val path = java.nio.file.Files.createTempDirectory("graft-shards")
      .toString + "/corpus"
    val manifest = CorpusStats.writeTrainingShards(docs, "doc_id", "text",
        tokensPerShard = 8000L, path = path)
      .orderBy("shard_id").collect()
    assert(manifest.length >= 4, "fixture should span several shards")

    val files = readBack(path)
    val byShard = files.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("shuffle_pos")).as("first_pos"),
        max(col("shuffle_pos")).as("last_pos"))
      .orderBy("shard_id").collect()
    assert(byShard.length === manifest.length)
    manifest.zip(byShard).foreach { case (m, f) =>
      assert(m.getLong(0) === f.getLong(0)) // shard_id
      assert(m.getLong(1) === f.getLong(1), s"n_docs of shard ${m.get(0)}")
      assert(m.getLong(2) === f.getLong(2), s"n_tokens of shard ${m.get(0)}")
      assert(m.getLong(3) === f.getLong(3) && m.getLong(4) === f.getLong(4))
    }
    // positions within a shard are contiguous, and consecutive shards
    // tile 1..N with no gap or overlap (the greedy sequential fill)
    manifest.foreach { m =>
      assert(m.getLong(4) - m.getLong(3) + 1 === m.getLong(1),
        s"shard ${m.get(0)} positions not contiguous")
    }
    manifest.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(3) === a.getLong(4) + 1,
          s"gap between shards ${a.get(0)} and ${b.get(0)}")
      case _ =>
    }
    assert(manifest.head.getLong(3) === 1L)
    assert(manifest.last.getLong(4) === docs.count())
    // no document lost or duplicated across the shard files
    assert(files.select("doc_id").distinct().count() === docs.count())
    // shard sizes respect the budget: every shard except possibly the
    // last is filled past the threshold by at most one document
    manifest.dropRight(1).foreach { m =>
      assert(m.getLong(2) >= 1L, s"empty shard ${m.get(0)}")
    }
  }

  test("rows inside each shard file are stored in epoch-shuffle order") {
    val path = java.nio.file.Files.createTempDirectory("graft-shards2")
      .toString + "/corpus"
    CorpusStats.writeTrainingShards(docs, "doc_id", "text", 25000L, path)
    val shardDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      // one file per shard (the write hash-partitions by shard id), so
      // reading it preserves the stored row order — which must be the
      // ascending shuffle positions a trainer streams
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"${d.getName} has ${parts.length} files")
      val pos = spark.read.parquet(parts.head.getPath)
        .select("shuffle_pos").collect().map(_.getLong(0)).toSeq
      assert(pos === pos.sorted, s"${d.getName} rows out of shuffle order")
    }
  }

  test("null text ships as an empty document, never to the default partition") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-shards-null")
      .toString + "/corpus"
    val mixed = Seq((1L, "alpha beta gamma"), (2L, null), (3L, "delta"))
      .toDF("doc_id", "text")
    val manifest = CorpusStats.writeTrainingShards(mixed, "doc_id", "text",
      1000L, path).collect()
    // one shard, all three docs accounted — a null n_tok would have
    // nulled the prefix sum and routed doc 2 to
    // shard_id=__HIVE_DEFAULT_PARTITION__ outside the manifest
    assert(manifest.map(_.getLong(1)).sum === 3L)
    assert(!manifest.exists(_.isNullAt(0)))
    val dirs = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(!dirs.exists(_.contains("HIVE_DEFAULT")), dirs)
    assert(readBack(path).select("doc_id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
  }

  test("a re-run overwrites with identical shards; salts permute") {
    val path = java.nio.file.Files.createTempDirectory("graft-shards3")
      .toString + "/corpus"
    def snapshot() = readBack(path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    CorpusStats.writeTrainingShards(docs, "doc_id", "text", 20000L, path)
    val first = snapshot()
    CorpusStats.writeTrainingShards(docs, "doc_id", "text", 20000L, path)
    assert(snapshot() === first, "re-run must be bit-identical")
    // a different epoch salt delivers a different permutation of the
    // same corpus (same doc set, different positions)
    CorpusStats.writeTrainingShards(docs, "doc_id", "text", 20000L, path,
      epochSalt = "epoch1")
    val second = snapshot()
    assert(second.map(_._2).toSet === first.map(_._2).toSet)
    assert(second !== first)
  }

  test("exact BPE accounting flows through shard delivery end to end") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft-shards4")
      .toString + "/corpus"
    val model = graft.operators.Bpe.fit(docs, "doc_id", "text",
      nMerges = 64)
    val manifest = CorpusStats.writeTrainingShards(docs, "doc_id", "text",
      20000L, path, tokenCount =
        Some(graft.operators.Bpe.tokenCount(col("text"), model)))
    // delivered token accounting must equal the exact corpus total —
    // and differ from the whitespace-estimate delivery (the
    // approximation this variant retires is measurable end to end)
    val exactTotal = docs.select(
      sum(graft.operators.Bpe.tokenCount(col("text"), model).cast("long")))
      .head().getLong(0)
    assert(manifest.agg(sum(col("n_tokens"))).head().getLong(0)
      === exactTotal)
    val estTotal = CorpusStats.writeTrainingShards(docs, "doc_id", "text",
      20000L, path).agg(sum(col("n_tokens"))).head().getLong(0)
    assert(estTotal !== exactTotal)
  }
}
