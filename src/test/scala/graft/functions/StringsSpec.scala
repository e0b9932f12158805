package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scalar surface goldens: sanitize (path/RecordPathFactory.kt:120,126-129),
  * filename parse (accounting/TopicPartitionOffsetRange.kt:50-61), path
  * templating (path/FormattedPathFactoryTest.kt:12-62).
  */
class StringsSpec extends SparkSpec {
  import spark.implicits._

  test("sanitizeId strips non [a-zA-Z0-9_-] and substitutes defaults") {
    val d = Seq(Tuple1("user@radar!"), Tuple1("!!!"), Tuple1(null: String)).toDF("id")
    val out = d.select(Strings.sanitizeId(col("id"), "unknown")).as[String].collect().toSeq
    assert(out == Seq("userradar", "unknown", "unknown"))
  }

  test("filename metadata extraction with and without end offset") {
    val d = Seq(
      "android_phone_light+1+0000000018+0000000020.avro",
      "application_server_status+0+0003018784.avro").toDF("f")
    val out = d.select(
      Strings.filenameTopic(col("f")),
      Strings.filenamePartition(col("f")),
      Strings.filenameStartOffset(col("f")),
      Strings.filenameEndOffset(col("f"))).collect()
    assert(out(0).getString(0) == "android_phone_light")
    assert(out(0).getInt(1) == 1)
    assert(out(0).getLong(2) == 18L)
    assert(out(0).getLong(3) == 20L)
    assert(out(1).getString(0) == "application_server_status")
    assert(out(1).getInt(1) == 0)
    assert(out(1).getLong(2) == 3018784L)
    assert(out(1).isNullAt(3))
  }

  test("templatePath golden: full template") {
    val d = Seq(1609581900.0).toDF("t") // 2021-01-02T10:05:00Z
    val ts = Times.doubleToTimestamp(col("t"))
    val path = Strings.templatePath(
      "${topic}/${projectId}/${userId}/${sourceId}/${time:yyyyMM}/${time:dd}/${filename}",
      Map(
        "topic" -> lit("t"), "projectId" -> lit("p"), "userId" -> lit("u"),
        "sourceId" -> lit("s"),
        "filename" -> concat(Times.timeBin(ts), lit(".csv.gz"))),
      ts)
    val out = d.select(path).as[String].head
    assert(out == "t/p/u/s/202101/02/20210102_1000.csv.gz")
  }

  test("templatePath default layout") {
    val d = Seq(1609581900.0).toDF("t")
    val ts = Times.doubleToTimestamp(col("t"))
    val path = Strings.templatePath(
      "${projectId}/${userId}/${topic}/${filename}",
      Map(
        "topic" -> lit("t"), "projectId" -> lit("p"), "userId" -> lit("u"),
        "filename" -> concat(Times.timeBin(ts), lit(".csv.gz"))),
      ts)
    assert(d.select(path).as[String].head == "p/u/t/20210102_1000.csv.gz")
  }

  test("unknown template parameter fails fast at plan time") {
    intercept[IllegalArgumentException] {
      Strings.templatePath("${nope}", Map.empty, lit(null))
    }
  }

  test("base64Unpadded matches unpadded golden") {
    val d = Seq("hello").toDF("s")
    val out = d.select(Strings.base64Unpadded(col("s").cast("binary"))).as[String].head
    assert(out == "aGVsbG8") // padded form would be aGVsbG8=
  }
}
