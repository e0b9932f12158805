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
}
