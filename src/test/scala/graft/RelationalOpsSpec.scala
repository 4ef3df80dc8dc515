package graft

import org.apache.spark.sql.functions._

import graft.ops.relational

class RelationalOpsSpec extends SparkSpec {

  test("keepFirstMatch keeps exactly one deterministic right row per key (J4/J6)") {
    import spark.implicits._
    val left = Seq(1, 2, 3).toDF("k")
    val right = Seq((1, "b", 20), (1, "a", 10), (2, "c", 30)).toDF("k", "v", "ord")
    val got = relational.keepFirstMatch(left, right, Seq("k"),
        Seq(col("ord").asc))
      .orderBy("k").collect().map(r => (r.getInt(0), Option(r.get(1)))).toSeq
    assert(got === Seq((1, Some("a")), (2, Some("c")), (3, None)))
  }

  test("argmaxPerGroup returns the whole max row per group (A2)") {
    import spark.implicits._
    val df = Seq(("p1", 1, "old"), ("p1", 5, "new"), ("p2", 2, "only"))
      .toDF("g", "ts", "payload")
    val got = relational.argmaxPerGroup(df, Seq("g"), col("ts"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(got === Seq(("p1", "new"), ("p2", "only")))
  }

  test("asOfJoin picks latest right ≤ left ts, preserves unmatched lefts (J8)") {
    import spark.implicits._
    val docs = Seq((1, 100), (2, 5), (3, 250)).toDF("doc_id", "doc_ts")
    val rates = Seq((10, 50, 1.1), (11, 90, 1.2), (12, 200, 1.3))
      .toDF("rate_id", "rate_ts", "rate")
    val got = relational.asOfJoin(docs, rates, lit(true),
        col("doc_ts"), col("rate_ts"), col("doc_id"),
        Seq(col("rate_id").desc))
      .orderBy("doc_id")
      .collect().map(r => (r.getInt(0), Option(r.get(2)).map(_ => r.getDouble(4))))
      .toSeq
    assert(got === Seq((1, Some(1.2)), (2, None), (3, Some(1.3))))
  }

  test("asOfJoin default-rate composition matches GarmentTotalHutang:213 (M5)") {
    import spark.implicits._
    val docs = Seq((1, 10)).toDF("doc_id", "doc_ts")
    val rates = Seq((1, 99, 2.0)).toDF("rate_id", "rate_ts", "rate")
    val got = relational.asOfJoin(docs, rates, lit(true), col("doc_ts"),
        col("rate_ts"), col("doc_id"))
      .select(graft.functions.business.defaultRate(col("rate")))
      .collect().head.getDouble(0)
    assert(got === 1.0)
  }

  test("notInKeepNulls keeps NULL rows (P4 JS semantics vs SQL NOT IN)") {
    import spark.implicits._
    val df = Seq(Some("dev"), Some("alice"), None).toDF("createdBy")
    val got = relational.notInKeepNulls(df, col("createdBy"),
      Seq("dev", "unit-test")).collect().map(r => Option(r.getString(0))).toSeq
    assert(got.toSet === Set(Some("alice"), None))
  }

  test("incrementalScan is strict-greater by default, inclusive on demand (S2)") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("ts")
    assert(relational.incrementalScan(df, col("ts"), lit(2)).count() === 1)
    assert(relational.incrementalScan(df, col("ts"), lit(2),
      inclusive = true).count() === 2)
  }

  test("contiguousRowNumber matches the single-reducer window bit-for-bit (A5)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // keys arrive shuffled; ordering is unique (the operator's contract)
    val df = (1 to 1000).map(i => (i * 7919 % 1000, s"k$i"))
      .toDF("sort_key", "payload").repartition(13)
    val scalable = relational.contiguousRowNumber(df,
        Seq(col("sort_key"), col("payload")), "row_id",
        numPartitions = Some(7))
    // the data never collapses onto one reducer
    assert(scalable.rdd.getNumPartitions > 1)
    val window = df.withColumn("row_id",
      row_number().over(Window.orderBy(col("sort_key"), col("payload")))
        .cast("long"))
    def key(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("row_id"), r.getAs[Int]("sort_key"),
        r.getAs[String]("payload"))).toSet
    assert(key(scalable) === key(window))
  }

  test("contiguousRowNumberSampledRange: bit-identical to the default " +
      "form; boundaries only govern balance, never values") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i * 7919 % 1000, s"k$i", s"payload-$i"))
      .toDF("sort_key", "payload", "extra").repartition(13)
    val order = Seq(col("sort_key"), col("payload"))
    def key(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("row_id"), r.getAs[Int]("sort_key"),
        r.getAs[String]("payload"), r.getAs[String]("extra"))).toSet
    val default = relational.contiguousRowNumber(df, order, "row_id",
      numPartitions = Some(7))
    val sampled = relational.contiguousRowNumberSampledRange(df, order,
      "row_id", numPartitions = Some(7))
    assert(key(sampled) === key(default))
    assert(sampled.columns.toSet === (df.columns :+ "row_id").toSet)
    // a DIFFERENT (cheap, degenerate) sample source shifts boundaries
    // but must not move a single counter value — correctness is
    // boundary-independent by construction
    val skewedSrc = df.filter(col("sort_key") < 50)
      .select(col("sort_key"), col("payload"))
    val adversarial = relational.contiguousRowNumberSampledRange(df, order,
      "row_id", numPartitions = Some(7), sampleSource = Some(skewedSrc))
    assert(key(adversarial) === key(default))
    // single-bucket degenerate case (empty sample source) still exact
    val empty = relational.contiguousRowNumberSampledRange(df, order,
      "row_id", numPartitions = Some(7),
      sampleSource = Some(df.filter(lit(false))
        .select(col("sort_key"), col("payload"))))
    assert(key(empty) === key(default))
  }

  test("sampledBoundaryBucket: plan size capped independent of the " +
      "partition count; null key fields never become boundaries") {
    import spark.implicits._
    // null sort keys in the DATA (the order stays a unique total order
    // through the payload tiebreak; window semantics put nulls first)
    val df = (1 to 1000).map(i =>
        (if (i % 97 == 0) null.asInstanceOf[Integer]
         else Integer.valueOf(i * 7919 % 1000), s"k$i"))
      .toDF("sort_key", "payload").repartition(13)
    val order = Seq(col("sort_key"), col("payload"))
    def key(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("row_id"),
        Option(r.getAs[Integer]("sort_key")),
        r.getAs[String]("payload"))).toSet
    val default = relational.contiguousRowNumber(df, order, "row_id",
      numPartitions = Some(7))
    def caseWhens(d: org.apache.spark.sql.DataFrame): Int =
      d.queryExecution.analyzed.collect { case p =>
        p.expressions.flatMap(_.collect {
          case c: org.apache.spark.sql.catalyst.expressions.CaseWhen => c
        })
      }.flatten.size
    // a production-scale partition count with a small cap: the embedded
    // when-tree must stay cap-sized (one CaseWhen per boundary), values
    // bit-identical — boundaries only govern balance
    spark.conf.set("spark.graft.counter.maxBoundaries", "8")
    try {
      val capped = relational.contiguousRowNumberSampledRange(df, order,
        "row_id", numPartitions = Some(512))
      val whens = caseWhens(capped)
      assert(whens <= 8,
        s"when-tree must be cap-sized (<= 8 boundaries), got $whens")
      assert(key(capped) === key(default))
    } finally spark.conf.unset("spark.graft.counter.maxBoundaries")
    // default cap: n = 4096 must embed at most 1024 boundaries
    val wide = relational.contiguousRowNumberSampledRange(df, order,
      "row_id", numPartitions = Some(4096))
    assert(caseWhens(wide) <= 1024)
    assert(key(wide) === key(default))
  }

  test("contiguousRowNumberViaJoin: narrow-shuffle twin is bit-identical " +
      "to the default form (and to the window) on a unique total order") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i * 7919 % 1000, s"k$i", s"wide-payload-$i"))
      .toDF("sort_key", "payload", "extra").repartition(13)
    val order = Seq(col("sort_key"), col("payload"))
    def key(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("row_id"), r.getAs[Int]("sort_key"),
        r.getAs[String]("payload"), r.getAs[String]("extra"))).toSet
    val narrow = relational.contiguousRowNumberViaJoin(df, order, "row_id",
      numPartitions = Some(7))
    val default = relational.contiguousRowNumber(df, order, "row_id",
      numPartitions = Some(7))
    assert(key(narrow) === key(default))
    // same output surface: input columns + the counter, no temp leakage
    assert(narrow.columns.toSet === (df.columns :+ "row_id").toSet)
    assert(narrow.schema("row_id").dataType ===
      org.apache.spark.sql.types.LongType)
    // the wide payload never enters a sort: the only Sort operators in
    // the narrow plan order the projected key columns, not 'extra'
    val plan = narrow.queryExecution.executedPlan.toString()
    plan.linesIterator.filter(_.contains("Sort ")).foreach { l =>
      assert(!l.contains("extra"), l)
    }
  }

  test("TotalHutangFact: auto, wide and narrow counter forms are all " +
      "bit-identical on the q63 sources") {
    val srcs = graft.queries.PipelineQueries
      .totalHutangSources(spark, "/root/testdata/sf0.001")
    val auto = graft.pipelines.TotalHutangFact.transform(srcs)
    val wide = graft.pipelines.TotalHutangFact.transformWideCounter(srcs)
      .select(auto.columns.map(col): _*)
    val narrow = graft.pipelines.TotalHutangFact.transformNarrowCounter(srcs)
      .select(auto.columns.map(col): _*)
    assert(auto.count() === wide.count())
    assert(auto.count() === narrow.count())
    assert(auto.exceptAll(wide).count() === 0L)
    assert(wide.exceptAll(auto).count() === 0L)
    assert(auto.exceptAll(narrow).count() === 0L)
    assert(narrow.exceptAll(auto).count() === 0L)
  }

  test("contiguousRowNumberAuto: the sort budget dispatches wide vs " +
      "narrow, both bit-identical to the single-reducer window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // (k, payload) is a unique total order (31 ⊥ 500 ⇒ k unique)
    val df = (1 to 500).map(i => (i * 31 % 500, "p" * 8 + i))
      .toDF("k", "payload").repartition(9)
    val order = Seq(col("k"), col("payload"))
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "payload", "row_id").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2)).toSeq
    val oracle = key(df.withColumn("row_id",
      row_number().over(Window.orderBy(order: _*)).cast("long")))
    // an effectively-infinite budget forces the wide twin (no join in
    // the plan); a 1-byte budget forces the narrow join-back
    val wide = relational.contiguousRowNumberAuto(df, order, "row_id",
      sortBudgetBytes = Some(Long.MaxValue))
    val narrow = relational.contiguousRowNumberAuto(df, order, "row_id",
      sortBudgetBytes = Some(1L))
    assert(!wide.queryExecution.executedPlan.toString.contains("Join"))
    assert(narrow.queryExecution.executedPlan.toString.contains("Join"))
    assert(key(wide) === oracle)
    assert(key(narrow) === oracle)
    // the documented conf is the no-code knob for the same dispatch
    spark.conf.set("spark.graft.counter.sortBudgetBytes", "1")
    try {
      val viaConf = relational.contiguousRowNumberAuto(df, order, "row_id")
      assert(viaConf.queryExecution.executedPlan.toString.contains("Join"))
      assert(key(viaConf) === oracle)
    } finally spark.conf.unset("spark.graft.counter.sortBudgetBytes")
    // default budget (aggregate BlockManager capacity) keeps a tiny
    // input on the wide form
    val auto = relational.contiguousRowNumberAuto(df, order, "row_id")
    assert(!auto.queryExecution.executedPlan.toString.contains("Join"))
    assert(key(auto) === oracle)
  }

  test("contiguousPrefixSum matches the single-reducer window bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 1000).map(i => (i * 7919 % 1000, s"k$i", (i % 97).toLong))
      .toDF("sort_key", "payload", "v").repartition(13)
    val scalable = relational.contiguousPrefixSum(df,
      Seq(col("sort_key"), col("payload")), col("v"), "cum",
      numPartitions = Some(7))
    assert(scalable.rdd.getNumPartitions > 1)
    val window = df.withColumn("cum",
      sum(col("v")).over(Window.orderBy(col("sort_key"), col("payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    def key(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("cum"), r.getAs[Int]("sort_key"),
        r.getAs[String]("payload"), r.getAs[Long]("v"))).toSet
    assert(key(scalable) === key(window))
    graft.ops.materialize.releaseAll()
  }

  test("shardManifest: greedy fill conserves tokens, shards are contiguous") {
    import graft.operators.CorpusStats
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val m = CorpusStats.shardManifest(docs, "doc_id", "text", 2048L)
      .orderBy("shard_id").collect()
    val totalTok = docs.select(
      sum(graft.operators.TextAnalysis.tokenCount(col("text")).cast("long")))
      .collect().head.getLong(0)
    // conservation + every doc in exactly one shard
    assert(m.map(_.getAs[Long]("n_tokens")).sum === totalTok)
    assert(m.map(_.getAs[Long]("n_docs")).sum === docs.count())
    // shard ids are 0..max contiguous, doc ranges non-overlapping & ordered
    assert(m.map(_.getAs[Long]("shard_id")).toSeq ===
      (0L until m.length.toLong))
    m.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      case _ =>
    }
    // greedy fill: every non-final shard crosses the budget only via its
    // final doc — removing that doc would leave it under budget
    m.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("n_tokens") >= 2048L - 99,
        s"shard ${r.getAs[Long]("shard_id")} underfull: $r")
    }
    graft.ops.materialize.releaseAll()
  }

  test("explodePreservingParent keeps parents with null/empty children (J5/U3)") {
    import spark.implicits._
    val df = Seq((1, Seq("a", "b")), (2, Seq.empty[String]))
      .toDF("id", "items")
    val got = relational.explodePreservingParent(df, "items", "item")
      .orderBy("id", "item")
      .collect().map(r => (r.getInt(0), Option(r.getString(1)))).toSeq
    assert(got === Seq((1, Some("a")), (1, Some("b")), (2, None)))
  }
}
