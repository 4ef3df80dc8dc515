package graft

import org.apache.spark.sql.functions._

import graft.ops.skew

class SkewSpec extends SparkSpec {

  private def skewed = {
    import spark.implicits._
    // key 1 is hot (100 rows), keys 2-9 have 1 row each
    (Seq.fill(100)(1) ++ (2 to 9)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }
      .toDF("k", "payload")
  }

  private def dim = {
    import spark.implicits._
    (1 to 9).map(k => (k, s"name$k")).toDF("k", "name")
  }

  test("saltedJoin produces exactly the plain-join result") {
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "payload", "name").collect().toSet
    val salted = skew.saltedJoin(skewed, dim, "k", salts = 4,
        saltBy = col("payload"))
      .select("k", "payload", "name").collect().toSet
    assert(salted === plain)
    assert(salted.size === 108)
  }

  test("hotKeys finds only keys above threshold") {
    val hot = skew.hotKeys(skewed, "k", threshold = 10)
      .collect().map(_.getInt(0)).toSeq
    assert(hot === Seq(1))
  }

  test("skewAwareJoin = salted hot path ∪ plain tail, same result set") {
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "payload", "name").collect().toSet
    val got = skew.skewAwareJoin(skewed, dim, "k", hotThreshold = 10,
        salts = 4, saltBy = col("payload"))
      .select("k", "payload", "name").collect().toSet
    assert(got === plain)
  }

  test("salts actually spread the hot key across sub-partitions") {
    import spark.implicits._
    val salts = skewed.filter(col("k") === 1)
      .withColumn("__salt", pmod(hash(col("payload")), lit(4)))
      .groupBy("__salt").count().collect()
    assert(salts.length === 4, "hot key should hit all 4 salt buckets")
  }
}
