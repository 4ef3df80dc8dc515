package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dedup

/**
 * The fused `graft_minhash` kernel replaces the exploded aggregate
 * signature formulation; the q36/q37/q94/q114 oracles replay the
 * signature arithmetic bit-exactly in SQL, so kernel ≡ aggregate must
 * hold bit-for-bit on both base-hash paths, and eval ≡ codegen.
 */
class MinHashKernelSpec extends SparkSpec {

  private def docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  private def sigMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap

  test("kernel ≡ aggregate formulation, md5 oracle path, bit-exact") {
    val kernel = sigMap(Dedup.minHashSignatures(
      docs, "doc_id", "text", n = 3, k = 64,
      baseHash = Some(Dedup.md5Hash60)))
    val agg = sigMap(Dedup.minHashSignaturesAgg(
      docs, "doc_id", "text", n = 3, k = 64,
      baseHash = Some(Dedup.md5Hash60)))
    assert(kernel.keySet === agg.keySet)
    assert(kernel.nonEmpty)
    kernel.foreach { case (id, sig) => assert(sig === agg(id), s"doc $id") }
  }

  test("kernel ≡ aggregate formulation, fused xxhash64 path, bit-exact") {
    val kernel = sigMap(Dedup.minHashSignatures(
      docs, "doc_id", "text", n = 3, k = 32))
    val agg = sigMap(Dedup.minHashSignaturesAgg(
      docs, "doc_id", "text", n = 3, k = 32))
    assert(kernel.keySet === agg.keySet)
    assert(kernel.nonEmpty)
    kernel.foreach { case (id, sig) => assert(sig === agg(id), s"doc $id") }
  }

  test("docs with no shingles are dropped, like the aggregate path") {
    import spark.implicits._
    val tiny = Seq((1L, "only two"), (2L, "a b c d"), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val kernel = Dedup.minHashSignatures(tiny, "doc_id", "text",
      n = 3, k = 8, baseHash = Some(Dedup.md5Hash60))
    val agg = Dedup.minHashSignaturesAgg(tiny, "doc_id", "text",
      n = 3, k = 8, baseHash = Some(Dedup.md5Hash60))
    assert(sigMap(kernel) === sigMap(agg))
    assert(sigMap(kernel).keySet === Set(2L)) // only the 4-token doc shingles
  }

  test("an unrecognized base hash still works via the aggregate fallback") {
    val custom: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => xxhash64(c)
    val viaPublic = sigMap(Dedup.minHashSignatures(
      docs.limit(50), "doc_id", "text", n = 3, k = 8,
      baseHash = Some(custom)))
    val viaAgg = sigMap(Dedup.minHashSignaturesAgg(
      docs.limit(50), "doc_id", "text", n = 3, k = 8,
      baseHash = Some(custom)))
    assert(viaPublic === viaAgg)
    assert(viaPublic.nonEmpty)
  }

  test("kernel: codegen ≡ interpreted, bit-exact") {
    def withConf[T](pairs: (String, String)*)(f: => T): T = {
      val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f
      finally saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    }
    def run() = sigMap(Dedup.minHashSignatures(
      docs, "doc_id", "text", n = 3, k = 64,
      baseHash = Some(Dedup.md5Hash60)))
    val gen = run()
    val interp = withConf(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")(run())
    assert(gen === interp)
  }
}
