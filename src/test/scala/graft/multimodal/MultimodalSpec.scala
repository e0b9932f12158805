package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: fake-codec decode, resize, featurize,
  * size-based repartition.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal.FakeCodec

  private def img(w: Int, h: Int, c: Int, seed: Int): Array[Byte] =
    FakeCodec.encode(w, h, c, Array.tabulate(w * h * c)(i => ((i * 31 + seed) % 251).toByte))

  private def df = Seq(
    (1L, img(4, 2, 1, 0)),
    (2L, img(8, 8, 3, 7)),
    (3L, Array[Byte](1, 2)), // corrupt: too short
    (4L, null.asInstanceOf[Array[Byte]]))
    .toDF("id", "payload")

  test("withMeta decodes dimensions and flags invalid payloads") {
    val out = Multimodal.withMeta(df, "payload").orderBy("id").collect()
    val m1 = out(0).getAs[Row]("meta")
    assert(m1.getAs[Int]("width") == 4 && m1.getAs[Int]("height") == 2)
    assert(m1.getAs[Boolean]("valid"))
    val m2 = out(1).getAs[Row]("meta")
    assert(m2.getAs[Int]("channels") == 3 && m2.getAs[Long]("n_bytes") == 8 * 8 * 3 + 5)
    assert(!out(2).getAs[Row]("meta").getAs[Boolean]("valid"))
    assert(!out(3).getAs[Row]("meta").getAs[Boolean]("valid"))
  }

  test("resize produces target dimensions, passes invalid through as null") {
    val out = Multimodal.resize(df, "payload", 2, 2).orderBy("id").collect()
    val decoded = FakeCodec.decode(out(0).getAs[Array[Byte]]("payload"))
    assert(decoded.exists { case (w, h, c, px) => w == 2 && h == 2 && c == 1 && px.length == 4 })
    assert(out(2).isNullAt(1) && out(3).isNullAt(1))
  }

  test("featurize is deterministic with the requested dimensionality") {
    val out1 = Multimodal.featurize(df, "payload", 16).orderBy("id").collect()
    val out2 = Multimodal.featurize(df, "payload", 16).orderBy("id").collect()
    def f(rows: Array[org.apache.spark.sql.Row], i: Int): List[Float] =
      rows(i).getSeq[Float](rows(i).fieldIndex("features")).toList
    assert(f(out1, 0).length == 16)
    assert(f(out1, 0) == f(out2, 0))
    assert(f(out1, 1) != f(out1, 0))
    assert(out1(3).isNullAt(out1(3).fieldIndex("features")))
  }

  test("frameSample keeps every stride-th frame with its index") {
    val video = Seq(
      (1L, Array(img(2, 2, 1, 0), img(2, 2, 1, 1), img(2, 2, 1, 2), img(2, 2, 1, 3), img(2, 2, 1, 4))),
      (2L, Array(img(2, 2, 1, 9))))
      .toDF("id", "frames")
    val out = Multimodal.frameSample(video, "frames", stride = 2)
      .orderBy("id", "frame_idx").collect()
    assert(out.map(r => (r.getAs[Long]("id"), r.getAs[Int]("frame_idx"))).toSeq ==
      Seq((1L, 0), (1L, 2), (1L, 4), (2L, 0)))
    // the kept frame is the original payload, decodable
    assert(FakeCodec.decode(out(1).getAs[Array[Byte]]("frame")).exists(_._1 == 2))
    assert(!out.head.schema.fieldNames.contains("frames"))
  }

  test("phash sets the above-mean pixel bits; dup payloads collide") {
    val ramp = FakeCodec.encode(4, 4, 1, Array.tabulate(16)(_.toByte)) // mean 7
    val d = Seq(
      (1L, ramp),
      (2L, ramp),                                   // identical -> same hash
      (3L, FakeCodec.encode(4, 4, 1, Array.fill(16)(5.toByte))), // flat -> 0
      (4L, Array[Byte](1, 2)),                      // undecodable -> null
      (5L, FakeCodec.encode(2, 2, 1, Array.tabulate(4)(_.toByte)))) // 4 px < 16 bits
      .toDF("id", "payload")
    val out = Multimodal.phash(d, "payload", bits = 16).orderBy("id").collect()
    // pixels 0..15, mean 7 -> bits 8..15 set = 0xFF00
    assert(out(0).getAs[Long]("phash") == 0xFF00L)
    assert(out(1).getAs[Long]("phash") == 0xFF00L)
    assert(out(2).getAs[Long]("phash") == 0L)
    assert(out(3).isNullAt(out(3).fieldIndex("phash")))
    // a payload with fewer pixels than `bits` must NOT hash: a truncated
    // hash would collide with any image sharing its first 4 bytes
    assert(out(4).isNullAt(out(4).fieldIndex("phash")))
  }

  test("repartitionBySize targets byte budget per partition") {
    val big = Multimodal.repartitionBySize(df, "payload", bytesPerPartition = 100L)
    assert(big.rdd.getNumPartitions >= 2)
    val one = Multimodal.repartitionBySize(df, "payload", bytesPerPartition = 1L << 30)
    assert(one.rdd.getNumPartitions == 1)
  }
  test("audioFeatures frames 1-D payloads into windowed energies; short/invalid are null") {
    val samples = Array.tabulate(12)(i => (i * 10).toByte) // 0,10,...,110
    val d = Seq(
      (1L, FakeCodec.encode(12, 1, 1, samples)),
      (2L, FakeCodec.encode(4, 1, 1, Array[Byte](1, 2, 3, 4))), // shorter than one window
      (3L, Array[Byte](1, 2)), // corrupt
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val out = Multimodal.audioFeatures(d, "payload", win = 8, stride = 2)
      .select("id", "energies").collect().map(r => r.getLong(0) ->
        Option(r.getSeq[Long](1)).map(_.toSeq)).toMap
    // windows at offsets 0 and 2: sums of 8 consecutive multiples of 10
    assert(out(1L) == Some(Seq(280L, 440L, 600L)))
    assert(out(2L).isEmpty && out(3L).isEmpty && out(4L).isEmpty)
  }
}
