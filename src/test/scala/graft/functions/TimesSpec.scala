package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time cascade + binning goldens from the reference
  * (RadarHdfsRestructureTest.kt:27-59, see FIXTURES.md §5).
  */
class TimesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("key", StructType(Seq(
      StructField("start", LongType)))),
    StructField("value", StructType(Seq(
      StructField("time", DoubleType))))))

  private def df(rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      schema)

  test("value.time wins: 1493711175.0 -> bin 20170502_0700") {
    val d = df(Row(Row(0L), Row(1493711175.0)))
    val out = d.select(Times.timeBin(Times.eventTime(d)).as("bin")).head.getString(0)
    assert(out == "20170502_0700")
  }

  test("key.start (epoch ms) fallback one hour earlier -> 20170502_0600") {
    val d = df(Row(Row((1493711175L - 3600) * 1000), Row(null)))
    val out = d.select(Times.timeBin(Times.eventTime(d)).as("bin")).head.getString(0)
    assert(out == "20170502_0600")
  }

  test("no candidate -> unknown_date") {
    val d = df(Row(Row(null), Row(null)))
    val out = d.select(Times.timeBin(Times.eventTime(d)).as("bin")).head.getString(0)
    assert(out == "unknown_date")
  }

  test("cascade is schema-gated: absent fields never break the plan") {
    import spark.implicits._
    val d = Seq((1493711175.0, "x")).toDF("sometime", "other")
    // none of the cascade paths resolve -> null timestamp, unknown bin
    val out = d.select(Times.timeBin(Times.eventTime(d)).as("bin")).head.getString(0)
    assert(out == "unknown_date")
  }

  test("double <-> timestamp round trip keeps microsecond precision") {
    import spark.implicits._
    val d = Seq(1580219820.03).toDF("t")
    val out = d.select(
      Times.timestampToDouble(Times.doubleToTimestamp(col("t"))).as("t2"))
      .head.getDouble(0)
    assert(math.abs(out - 1580219820.03) < 1e-6)
  }
}
