package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, TextAnalysis}

/**
 * The kernel entry points must not depend on the `graft_*` function
 * registry: operator Columns carry the Catalyst expression directly
 * ([[graft.plans.Kernels]] via the `org.apache.spark.sql.graft`
 * bridge), so they analyze on ANY session — including sessions whose
 * registry never saw [[graft.plans.GraftExtensions]] and Columns built
 * on threads with no active session. This was a real failure mode of
 * the previous name-based `call_function` formulation (r15 advice):
 * a foreign-thread Column against an extension-less session failed
 * analysis with "undefined function".
 */
class KernelColumnSpec extends SparkSpec {

  private val kernelNames = Seq("graft_dot", "graft_intersect_count",
    "graft_topk", "graft_shingle_hashes", "graft_nfc",
    "graft_window_hashes", "graft_kmv", "graft_pq_encode",
    "graft_adc_dist", "graft_minhash", "graft_lsh_bucket",
    "graft_simhash64", "graft_quantize_int8", "graft_tokens",
    "graft_md5h60", "graft_window_grams", "graft_eq_count",
    "graft_count_in")

  test("kernel Columns analyze on a session whose registry has NO " +
      "graft_* functions (no name lookup happens at all)") {
    import spark.implicits._
    // newSession: isolated SessionState → its own FunctionRegistry.
    // Drop every graft_* registration so a name-based formulation
    // would fail analysis; the expression-carrying Columns must not.
    val bare = spark.newSession()
    kernelNames.foreach(n =>
      bare.sessionState.functionRegistry.dropFunction(FunctionIdentifier(n)))
    assert(kernelNames.forall(n =>
      !bare.sessionState.functionRegistry
        .functionExists(FunctionIdentifier(n))),
      "test setup: registry should have no graft_* functions")

    val df = bare.createDataFrame(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, (1 to 40).map(i => s"tok$i").mkString(" "))))
      .toDF("id", "body")

    // scalar kernels end-to-end on the extension-less session
    val scalarOut = df.select(
        size(TextAnalysis.tokens(col("body"))).as("ntok"),
        TextAnalysis.langId(col("body")).as("lang"),
        Dedup.md5Hash60(col("body")).as("h60"),
        Dedup.simHash64OfHashes(
          Dedup.sortedShingleHashes(TextAnalysis.tokens(col("body")), 2))
          .as("sh"))
      .collect()
    assert(scalarOut.length === 3 && scalarOut.forall(!_.anyNull))
    assert(scalarOut.head.getString(1) === "en")

    // aggregate kernel (graft_topk) through a full operator
    val corpus = bare.createDataFrame(Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.0, 1.0))))
      .toDF("id", "vec")
    val knn = Similarity.cosineTopK(corpus, corpus, "id", "vec", k = 2)
    assert(knn.count() === 6)

    // and the same operators still work via SQL text on a session WITH
    // the extensions (the registry remains the SQL-text surface)
    val sqlHits = spark.sql(
      "SELECT size(graft_tokens('a b  c'))").collect().head.getInt(0)
    assert(sqlHits === 3)
  }

  test("kernel Columns can be CONSTRUCTED on a thread with no active " +
      "session and used afterwards") {
    import spark.implicits._
    @volatile var built: Option[org.apache.spark.sql.Column] = None
    val t = new Thread(() => {
      SparkSession.clearActiveSession()
      // construction must not require an active session (the old code
      // silently skipped registration here and failed later analysis)
      built = Some(TextAnalysis.tokenCount(col("body")))
    })
    t.start(); t.join()
    val out = Seq("one two three").toDF("body")
      .select(built.get.as("n")).collect().head.getInt(0)
    assert(out === 3)
  }
}
