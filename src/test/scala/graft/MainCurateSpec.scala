package graft

import java.nio.file.Files

/** The CLI --curate mode body: documents parquet in, split-partitioned
  * curated corpus out. */
class MainCurateSpec extends SparkSpec {
  import spark.implicits._

  test("runCurate writes a split-partitioned curated corpus") {
    val dir = Files.createTempDirectory("graft-curate").toFile
    val in = s"$dir/in"; val out = s"$dir/out"
    val longText = (0 until 26).map(i => ("" + ('a' + i).toChar) * 2).mkString(" ")
    Seq(
      (1L, longText),           // survives
      (2L, longText),           // exact dup of 1 -> dropped
      (3L, "too short"))        // quality-gated
      .toDF("doc_id", "text")
      .write.parquet(in)
    val n = Main.runCurate(spark, in, out)
    assert(n == 1L)
    val row = spark.read.parquet(out).select("doc_id", "split")
      .as[(Long, String)].collect().toSeq
    assert(row.map(_._1) == Seq(1L))
    assert(Set("train", "val", "test").contains(row.head._2))
  }

  test("runCurate applies the --block-terms/--block-phrases gate") {
    val dir = Files.createTempDirectory("graft-curate-block").toFile
    val in = s"$dir/in"; val out = s"$dir/out"
    val clean = "the quick brown fox jumps over the lazy dog again and again"
    val term = "the quick brown fox jumps over the banned dog again and again"
    val phrase = "the quick brown fox jumps over a very bad phrase again and again"
    Seq((1L, clean), (2L, term), (3L, phrase)).toDF("doc_id", "text").write.parquet(in)
    assert(Main.runCurate(spark, in, out,
      blockTerms = Set("banned"), blockPhrases = Set("very bad phrase")) == 1L)
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("runCurate applies the --keep-langs language gate") {
    val dir = Files.createTempDirectory("graft-curate-langs").toFile
    val in = s"$dir/in"; val out = s"$dir/out"
    val en = "the quick brown fox jumps over the lazy dog again and again"
    val de = "der schnelle braune fuchs springt und der hund schläft und träumt"
    Seq((1L, en), (2L, de)).toDF("doc_id", "text").write.parquet(in)
    assert(Main.runCurate(spark, in, out, keepLangs = Set("en")) == 1L)
    val kept = spark.read.parquet(out).select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toSeq
    assert(kept == Seq((1L, "en")))
  }
}
