package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located join via bucketing: same buckets on both sides -> equi-join
  * plans with NO shuffle exchange, and results match the plain join.
  */
class BucketingSpec extends SparkSpec {

  test("hasShuffle sees exchanges through AdaptiveSparkPlanExec (AQE on)") {
    // under AQE the executed plan is an AdaptiveSparkPlanExec LEAF — a
    // blind .exists returned false for every query, letting a bucketing
    // regression (shuffle reintroduced) pass the check silently
    val dir = "/root/testdata/sf0.001"
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(
        Bucketing.hasShuffle(
          lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))),
        "an adaptive-wrapped plan with a genuine exchange must report a shuffle")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("bucketed equi-join is shuffle-free and result-identical") {
    val dir = "/root/testdata/sf0.001"
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")

    Bucketing.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 8, Some("l_orderkey"))
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 8, Some("o_orderkey"))

    // disable broadcast so the join must co-locate (at real scale both
    // sides are fact-sized and broadcast is off the table anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // AQE wraps plans in AdaptiveSparkPlanExec, hiding exchanges from static
    // inspection; turn it off so hasShuffle sees the real plan shape
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bucketed = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plain = lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))

      assert(Bucketing.hasShuffle(plain.queryExecution.sparkSession
        .table("lineitem_b").join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))) == false,
        "bucketed join should plan without a shuffle exchange")
      assert(Bucketing.hasShuffle(
        lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))),
        "plain join should need a shuffle (sanity)")

      val a = bucketed.orderBy("o_orderpriority").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val b = plain.orderBy("o_orderpriority").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(a == b && a.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.sql("DROP TABLE IF EXISTS orders_b")
    }
  }
}
