package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.concurrent.Executors

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col

import graft.control.WatermarkManager
import graft.runner.{Pipelines, Serve}
import graft.sources.ParquetConnector

/**
 * Concurrent pipeline scheduling — the reference staggers 22 nightly
 * timer jobs whose windows routinely overlap (`DailyOperationTimer/
 * function.json:6` … `WeavingSCTimer/function.json:6`); one Spark
 * session must therefore run several pipelines at once without their
 * control rows, watermarks, or shared sinks interfering.
 *
 * `Serve(maxConcurrentRuns = N)` admits N runs in FAIR scheduler pools
 * (one pool per pipeline, `Sessions.local` runs FAIR by default); the
 * same pipeline never overlaps itself. Shared-path hazards are locked
 * at the source: control-log appends serialize per control path
 * (WatermarkManager), merges serialize per TARGET path only
 * (UpsertWriter — so different facts still merge concurrently, but two
 * pipelines maintaining the shared dim-time cannot lose each other's
 * batches).
 */
object ConcurrentServeSpec {
  /** Overlap gauge: tasks of sleepy transforms bump a shared counter
    * for the duration of their sleep, so the spec can assert ACTUAL
    * overlap (or its absence) without brittle wall-clock thresholds —
    * one run's merge evaluates its transform in two sequential stages,
    * so per-run internal concurrency stays 1 with single-row sources. */
  private val cur = new java.util.concurrent.atomic.AtomicInteger(0)
  private val high = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { cur.set(0); high.set(0) }
  def maxObserved: Int = high.get()
  def enter(ms: Long): Unit = {
    val c = cur.incrementAndGet()
    high.accumulateAndGet(c, math.max)
    try Thread.sleep(ms) finally { cur.decrementAndGet(); () }
  }
}

class ConcurrentServeSpec extends SparkSpec {

  private def post(port: Int, path: String): (Int, String) = {
    val resp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** A pipeline over its own source table whose transform sleeps inside
    * a Spark task (`sleepMs` per run) — slow enough that overlap vs
    * serialization is unambiguous in wall-clock, and it writes real
    * rows so the merge/watermark path is exercised end to end. */
  private def sleepy(pname: String, src: String, sleepMs: Long,
                     dates: Seq[String] = Nil) =
    new graft.pipelines.Pipeline {
      val name = pname
      val sources = Seq(src)
      val factKeys = Seq("id")
      override def dateColumns: Seq[String] = dates
      def transform(t: Map[String, org.apache.spark.sql.DataFrame]) = {
        val ms = sleepMs
        val sleep = org.apache.spark.sql.functions.udf { (id: Long) =>
          ConcurrentServeSpec.enter(ms); true
        }
        t(src).filter(sleep(col("id")))
      }
    }

  private def writeFixture(dir: String, sources: Seq[String]): ParquetConnector = {
    import spark.implicits._
    val conn = ParquetConnector(s"$dir/lake")
    sources.foreach { s =>
      conn.write(Seq(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          java.sql.Date.valueOf("2024-01-01"))
      ).toDF("id", "lastmodifiedutc", "docdate"), s, SaveMode.Overwrite)
    }
    conn
  }

  /** Fire the same POST for each name concurrently; return (results,
    * wall seconds). */
  private def firePar(port: Int, names: Seq[String]): (Seq[(Int, String)], Double) = {
    val pool = Executors.newFixedThreadPool(names.size)
    val t0 = System.nanoTime()
    val rs =
      try names.map(n => pool.submit(() => post(port, s"/api/$n")))
        .map(_.get())
      finally pool.shutdown()
    (rs, (System.nanoTime() - t0) / 1e9)
  }

  test("3 pipelines run concurrently in FAIR pools: isolated control " +
      "rows + watermarks, and wall-clock beats the serial sum") {
    val dir = Files.createTempDirectory("graft-conc").toString
    val names = Seq("conc-a", "conc-b", "conc-c")
    val conn = writeFixture(dir, names.map(n => s"src-$n"))
    val sleepMs = 1500L
    names.foreach(n => Pipelines.register(sleepy(n, s"src-$n", sleepMs)))
    val h = Serve.start(spark, conn, s"$dir/dwh", s"$dir/dwh/control",
      port = 0, maxConcurrentRuns = 3)
    try {
      assert(spark.sparkContext.getSchedulingMode.toString == "FAIR",
        "session must run the FAIR scheduler")
      ConcurrentServeSpec.reset()
      val (rs, wall) = firePar(h.port, names)
      rs.foreach { case (s, b) =>
        assert(s == 200 && b.contains("\"status\":\"Successful\""), b)
      }
      // each run got its own named FAIR pool
      names.foreach(n => assert(
        spark.sparkContext.getPoolForName(n).isDefined, s"no pool for $n"))
      // overlap actually happened: the gauge saw >= 2 transforms
      // sleeping at once (deterministic — no wall-clock threshold)
      assert(ConcurrentServeSpec.maxObserved >= 2,
        s"no overlap observed (max=${ConcurrentServeSpec.maxObserved})")
      // control-log isolation: exactly one Successful row per pipeline,
      // no lost appends, no cross-pipeline interleaving artifacts
      val control = new WatermarkManager(spark, s"$dir/dwh/control")
      val rows = control.log.collect()
      assert(rows.length == 3, rows.mkString("\n"))
      names.foreach { n =>
        val mine = rows.filter(_.getString(0) == n)
        assert(mine.length == 1 && mine.head.getString(4) == "Successful",
          mine.mkString("\n"))
        // the watermark advanced to THIS pipeline's run start
        assert(control.lastWatermark(n) == mine.head.getTimestamp(1))
      }
      // every fact landed with its rows
      names.foreach(n =>
        assert(spark.read.parquet(s"$dir/dwh/$n").count() == 1, n))

      // wall-clock vs serial, warm vs warm: the first (cold) concurrent
      // round above paid JIT/codegen warmup, so time a serial round and
      // a SECOND concurrent round and compare those — each run sleeps
      // ~2×1.5 s (two sequential stages evaluate the transform), so the
      // margin is sleep-dominated, not scheduler noise
      val t0 = System.nanoTime()
      names.foreach(n => assert(post(h.port, s"/api/$n")._1 == 200))
      val serial = (System.nanoTime() - t0) / 1e9
      val (rs2, wall2) = firePar(h.port, names)
      rs2.foreach { case (s, b) => assert(s == 200, b) }
      assert(wall2 < serial,
        f"concurrent $wall2%.1f s should beat serial $serial%.1f s")
      info(f"cold concurrent=$wall%.2f s; warm serial=$serial%.2f s vs " +
        f"warm concurrent=$wall2%.2f s (speedup ${serial / wall2}%.1f x)")
    } finally {
      h.stop()
      names.foreach(Pipelines.unregister)
    }
  }

  test("the same pipeline never overlaps itself even with free permits") {
    val dir = Files.createTempDirectory("graft-conc-self").toString
    val conn = writeFixture(dir, Seq("src-self"))
    val sleepMs = 1200L
    Pipelines.register(sleepy("conc-self", "src-self", sleepMs))
    val h = Serve.start(spark, conn, s"$dir/dwh", s"$dir/dwh/control",
      port = 0, maxConcurrentRuns = 3)
    try {
      ConcurrentServeSpec.reset()
      val (rs, _) = firePar(h.port, Seq("conc-self", "conc-self"))
      rs.foreach { case (s, b) =>
        assert(s == 200 && b.contains("\"status\":\"Successful\""), b)
      }
      // serialized: the gauge never saw two transforms sleeping at once
      assert(ConcurrentServeSpec.maxObserved == 1,
        s"same-pipeline runs overlapped (max=${ConcurrentServeSpec.maxObserved})")
      val control = new WatermarkManager(spark, s"$dir/dwh/control")
      assert(control.log.filter(
        col("description") === "conc-self" &&
          col("status") === "Successful").count() == 2)
    } finally {
      h.stop()
      Pipelines.unregister("conc-self")
    }
  }

  test("two pipelines maintaining the shared dim-time concurrently " +
      "lose neither batch (per-path merge lock)") {
    val dir = Files.createTempDirectory("graft-conc-dim").toString
    import spark.implicits._
    val conn = ParquetConnector(s"$dir/lake")
    // disjoint date ranges so a lost dim-time batch is detectable
    conn.write(Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Date.valueOf("2024-03-01")),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
        java.sql.Date.valueOf("2024-03-02"))
    ).toDF("id", "lastmodifiedutc", "docdate"), "src-dim-a", SaveMode.Overwrite)
    conn.write(Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Date.valueOf("2024-04-01")),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
        java.sql.Date.valueOf("2024-04-02"))
    ).toDF("id", "lastmodifiedutc", "docdate"), "src-dim-b", SaveMode.Overwrite)
    Pipelines.register(sleepy("conc-dim-a", "src-dim-a", 800L,
      dates = Seq("docdate")))
    Pipelines.register(sleepy("conc-dim-b", "src-dim-b", 800L,
      dates = Seq("docdate")))
    val h = Serve.start(spark, conn, s"$dir/dwh", s"$dir/dwh/control",
      port = 0, maxConcurrentRuns = 2)
    try {
      val (rs, _) = firePar(h.port, Seq("conc-dim-a", "conc-dim-b"))
      rs.foreach { case (s, b) =>
        assert(s == 200 && b.contains("\"status\":\"Successful\""), b)
      }
      // dim-time holds BOTH pipelines' dates: a lost update would drop
      // one side's range
      val dims = spark.read.parquet(s"$dir/dwh/dim-time")
        .select("cal_date").as[java.sql.Date].collect().map(_.toString).toSet
      assert(Set("2024-03-01", "2024-03-02", "2024-04-01", "2024-04-02")
        .subsetOf(dims), dims.toSeq.sorted.mkString(","))
    } finally {
      h.stop()
      Pipelines.unregister("conc-dim-a")
      Pipelines.unregister("conc-dim-b")
    }
  }
}
