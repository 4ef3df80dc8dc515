package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("tokenCount ignores repeated spaces and empties") {
    import spark.implicits._
    val df = Seq("a  b c", "", "   ").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(3, 0, 0))
  }

  test("punctCount counts sentence punctuation only") {
    import spark.implicits._
    val df = Seq("Hi, there! How are you? fine;").toDF("text")
      .select(TextAnalysis.punctCount(col("text")))
    assert(df.collect().head.getInt(0) === 4)
  }

  test("avgTokenLen = non-space chars / tokens, null on empty") {
    import spark.implicits._
    val df = Seq("ab cd", "").toDF("text")
      .select(TextAnalysis.avgTokenLen(col("text")))
    val got = df.collect().map(r => Option(r.get(0)))
    assert(got(0) === Some(2.0) && got(1) === None)
  }

  test("langId picks dominant marker language, 'und' when none") {
    import spark.implicits._
    val df = Seq(
      "the cat and the dog is here",
      "el perro y la casa de que los",
      "der hund und die katze das nicht",
      "le chat et les maisons du une",
      "zzz qqq www"
    ).toDF("text").select(TextAnalysis.langId(col("text")))
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("en", "es", "de", "fr", "und"))
  }

  test("fingerprint is stable across case and whitespace") {
    import spark.implicits._
    val df = Seq("Hello  World", "hello world").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) === fps(1))
  }

  test("rollingHash stays in [0, 1e9+7) and differs across token orders") {
    import spark.implicits._
    val df = Seq("x y z", "z y x", "x y z").toDF("text")
      .select(TextAnalysis.rollingHash(col("text")))
    val hs = df.collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0 && h < 1000000007L))
    assert(hs(0) !== hs(1))
    assert(hs(0) === hs(2))
  }
}
