package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * sf1 fixture generator for the scale rehearsal (VERDICT r9 task 1).
 *
 * Produces a 10× replica-union of the driver's sf0.1 tables at
 * `testdata_sf1/` INSIDE the repo (the driver's /root/testdata is
 * read-only). Replica k of a row gets every key/id column offset by
 * k·10⁸ — all keys in the source are < 10⁸ and both sides of every FK
 * are offset identically, so join cardinalities scale exactly 10×.
 *
 * Content perturbation is chosen so the DATA DISTRIBUTION scales
 * honestly — naive row duplication would turn every document into a
 * 10-way exact-duplicate cluster and quadratically inflate the
 * near-dup candidate space, measuring a data artifact instead of the
 * plan:
 *  - documents.text: per-replica alphabet rotation (a caesar cipher
 *    over [a-z], [A-Z], [0-9] separately). Length-preserving, so
 *    n_chars stays valid and bytes scale exactly 10×; word shapes and
 *    within-replica duplicate structure are identical to the
 *    original; across replicas shingle vocabularies are disjoint, so
 *    the dup/near-dup structure is 10 independent copies of sf0.1's.
 *  - embeddings.embedding: rotate the vector by k dimensions — norms,
 *    pairwise distances, and cluster structure are preserved within a
 *    replica; replicas land in different orientations.
 * Everything else (prices, dates, flags) is copied verbatim: 10×
 * density in the same value ranges, which is what a grown corpus
 * looks like.
 */
object GenScale {
  private val Stride = 100000000L // > every source key; FK-consistent offset
  private val Replicas = 10

  private def rot(s: String, k: Int): String =
    s.drop(k % s.length) + s.take(k % s.length)

  /** Union of `Replicas` copies of `df`, each with its key columns
    * offset and an optional per-replica content transform applied. */
  private def replicate(df: DataFrame, keyCols: Seq[String],
                        perturb: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until Replicas).map { k =>
      val keyed = keyCols.foldLeft(df) { (d, c) =>
        d.withColumn(c, col(c) + lit(k * Stride))
      }
      perturb(keyed, k)
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "testdata_sf1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit = {
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/$t.parquet")
      System.err.println(s"[genscale] wrote $t")
    }

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digits = "0123456789"
    val from = lower + upper + digits

    write(replicate(read("documents"), Seq("doc_id"), { (d, k) =>
      if (k == 0) d
      else {
        val to = rot(lower, k) + rot(upper, k) + rot(digits, k)
        d.withColumn("text", translate(col("text"), from, to))
      }
    }), "documents", 16)

    write(replicate(read("embeddings"), Seq("vec_id"), { (d, k) =>
      if (k == 0) d
      else d.withColumn("embedding", expr(
        s"concat(slice(embedding, ${k + 1}, size(embedding) - $k), " +
          s"slice(embedding, 1, $k))"))
    }), "embeddings", 8)

    val id = (d: DataFrame, _: Int) => d
    write(replicate(read("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"), id), "lineitem", 32)
    write(replicate(read("orders"),
      Seq("o_orderkey", "o_custkey"), id), "orders", 16)
    write(replicate(read("customer"), Seq("c_custkey"), id), "customer", 4)
    write(replicate(read("supplier"), Seq("s_suppkey"), id), "supplier", 2)
    write(replicate(read("part"), Seq("p_partkey"), id), "part", 4)
    write(replicate(read("events"),
      Seq("event_id", "user_id"), id), "events", 8)
    // tiny dims: FKs (c_nationkey etc.) are NOT offset, so keep the dims
    // as-is — every replica shares the same 25 nations / 5 regions
    write(read("nation"), "nation", 1)
    write(read("region"), "region", 1)

    spark.stop()
  }
}
