package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bloom-prefiltered decontamination scale path returns EXACTLY the
  * direct form's answer — the bloom only prunes shuffle volume; its false
  * positives die in the exact join.
  */
class DecontaminateSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def docs = graft.Tables.load(spark, dir, "documents")

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSeq

  test("bloom form equals direct form on the testdata corpus") {
    val direct = Decontaminate.overlap(docs, "doc_id", "text", col("source") === "src0")
    val bloom = Decontaminate.overlap(docs, "doc_id", "text", col("source") === "src0",
      useBloom = true)
    val d = collect(direct)
    assert(d.nonEmpty)
    assert(d == collect(bloom))
  }

  test("bloom form stays exact even at an absurd false-positive rate") {
    // tiny capacity -> most probes are false positives -> the exact join
    // must still filter every one of them out
    val direct = Decontaminate.overlap(docs, "doc_id", "text", col("source") === "src0")
    val noisy = Decontaminate.overlap(docs, "doc_id", "text", col("source") === "src0",
      useBloom = true, expectedEvalShingles = 8L, fpp = 0.5)
    assert(collect(direct) == collect(noisy))
  }

  test("direct form matches the catalog decontaminate query") {
    val catalog = graft.Queries.all("decontaminate")(spark, dir)
      .select("doc_id", "n_sh", "n_overlap", "overlap_bp", "contaminated")
    val lib = Decontaminate.overlap(docs, "doc_id", "text", col("source") === "src0")
    assert(collect(catalog) == collect(lib))
  }
}
