package graft.tools
import graft.core.Sessions
import graft.queries.Registry
import scala.jdk.CollectionConverters._
object Scratch {
  private def gcMillis: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  private def dumpStacks(tag: String): Unit = {
    System.err.println(s"==== STACK DUMP $tag ====")
    Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
      System.err.println(s"-- ${t.getName} ${t.getState}")
      st.take(12).foreach(f => System.err.println(s"   $f"))
    }
  }
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, "scratch")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q55_category_rules")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_SCRATCH_ROUNDS", "4").toInt
    for (round <- 1 to rounds; name <- names) {
      val q = Registry.all.find(_.name == name).get
      val g0 = gcMillis
      val t0 = System.nanoTime()
      @volatile var done = false
      val watchdog = new Thread(() => {
        Thread.sleep(20000)
        if (!done) dumpStacks(s"$name r$round stuck >20s")
      })
      watchdog.setDaemon(true)
      watchdog.start()
      val n = sys.env.get("SPARK_GRAFT_SCRATCH_MODE") match {
        case Some("write") =>
          val df = q.build(spark, dir).repartition(1)
          df.write.mode("overwrite").parquet(s"/tmp/scratch_dump/$name")
          -1L
        case Some("explain") =>
          println(q.build(spark, dir).repartition(1)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          -1L
        case Some("explain-count") =>
          println(q.build(spark, dir).groupBy().count()
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          -1L
        case Some("buckets") =>
          import org.apache.spark.sql.functions._
          val e = graft.core.Tables.load(spark, dir, "embeddings")
          val base = e.select(col("vec_id").cast("long").as("id"),
            col("embedding").cast("array<double>").as("v"))
          val bs = (0 until 8).map(t => graft.operators.Similarity
            .lshBucket(col("v"), graft.operators.Similarity
              .hyperplanes(6, 64, 42L + t)))
          val t0 = System.nanoTime()
          val n = base.select(col("id"), col("v"),
              posexplode(array(bs: _*)).as(Seq("tbl", "bucket")))
            .queryExecution.toRdd.count()
          println(f"[buckets] rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f s")
          n
        case Some("buckets2") =>
          import org.apache.spark.sql.functions._
          val e = graft.core.Tables.load(spark, dir, "embeddings")
          val base = e.select(col("vec_id").cast("long").as("id"),
            col("embedding").cast("array<double>").as("v"))
          val bs = (0 until 8).map(t => graft.operators.Similarity
            .lshBucket(col("v"), graft.operators.Similarity
              .hyperplanes(6, 64, 42L + t)))
          def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
            val t0 = System.nanoTime()
            val n = df.queryExecution.toRdd.count()
            println(f"[$tag] rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f s")
          }
          // (b) bucket compute only, no explode
          time("proj-only")(base.select(col("id"), bs.head.as("b0")))
          time("proj-8")(base.select(col("id") +: bs.zipWithIndex
            .map { case (b, i) => b.as(s"b$i") }: _*))
          // (a) explode + payload copy, no dot work
          time("explode-const")(base.select(col("id"), col("v"),
            posexplode(array((0 until 8).map(i => lit(i.toLong)): _*))))
          // (c) explode of real buckets, no v payload
          time("explode-nopayload")(base.select(col("id"),
            posexplode(array(bs: _*))))
          -1L
        case Some("q63stages") =>
          import org.apache.spark.sql.functions._
          val srcs = graft.queries.PipelineQueries
            .totalHutangSources(spark, dir)
          // by-name df: the counters run driver-side jobs (sizes
          // collect) at CONSTRUCTION time, which must be inside t0
          def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
            val t0 = System.nanoTime()
            val n = df.queryExecution.toRdd.count()
            println(f"[$tag] rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f s")
            spark.catalog.clearCache()
            graft.ops.materialize.releaseAll()
          }
          // legs selectable for big fixtures where a full sweep is
          // hours: SPARK_GRAFT_SCRATCH_LEGS=auto,narrow (default all)
          val legs = sys.env.getOrElse("SPARK_GRAFT_SCRATCH_LEGS",
            "no-counter,wide,narrow,auto").split(",").toSet
          // everything except the counter (constant row_id)
          if (legs("no-counter"))
            time("no-counter")(graft.pipelines.TotalHutangFact
              .withCounter(srcs, (d, _, as) => d.withColumn(as, lit(0L))))
          if (legs("wide"))
            time("wide")(graft.pipelines.TotalHutangFact
              .transformWideCounter(srcs))
          if (legs("narrow"))
            time("narrow")(graft.pipelines.TotalHutangFact
              .transformNarrowCounter(srcs))
          if (legs("auto"))
            time("auto")(graft.pipelines.TotalHutangFact.transform(srcs))
          -1L
        case Some("q63auto") =>
          // print the auto-counter's dispatch inputs at this fixture:
          // the q63 payload's Catalyst size estimate vs the default
          // sort budget (aggregate BlockManager capacity) — analysis
          // only, no jobs run
          import org.apache.spark.sql.functions._
          val srcs = graft.queries.PipelineQueries
            .totalHutangSources(spark, dir)
          graft.pipelines.TotalHutangFact.withCounter(srcs, (d, _, as) => {
            val root = d.queryExecution.optimizedPlan.stats.sizeInBytes
            // the OPERATOR's own rule — probe and dispatch share code
            val (est, budget) = graft.ops.relational.counterSortEstimate(d)
            println(f"[q63auto] rootEst=${root.toDouble / 1e9}%.3g GB " +
              f"est=${est.toDouble / 1e9}%.3f GB " +
              f"budget=${budget.toDouble / 1e9}%.2f GB" +
              s" -> ${if (est > budget) "narrow" else "wide"}")
            d.withColumn(as, lit(0L))
          })
          -1L
        case Some("probe") =>
          import spark.implicits._
          import org.apache.spark.sql.functions._
          val df = Seq((0.0, 0.0, 1.0)).toDF("z", "zz", "one")
          println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
          try println("0/0 = " + df.select(col("z") / col("zz")).head())
          catch { case e: Exception => println("0/0 threw: " + e.getClass) }
          try println("1/0 = " + df.select(col("one") / col("z")).head())
          catch { case e: Exception => println("1/0 threw: " + e.getClass) }
          println("NaN>=0.4 = " + df.select(
            lit(Double.NaN) >= lit(0.4)).head())
          println("max(NaN,0.9) = " + Seq(Double.NaN, 0.9).toDF("x")
            .agg(max(col("x"))).head())
          println("greatest(NaN,0.9) = " + df.select(
            greatest(lit(Double.NaN), lit(0.9))).head())
          -1L
        case _ => q.build(spark, dir).count()
      }
      done = true
      spark.catalog.clearCache() // match Bench: no cross-round cache reuse
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] r$round $name rows=$n time=$sec%.2f s gc=${(gcMillis - g0) / 1000.0}%.2f s")
    }
    spark.stop()
  }
}
