package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` normalization — downstream operators always see a plain
    * (UTC-instant) timestamp column, whatever the parquet encoding:
    *   - TIMESTAMP(NANOS): Spark only reads it as a nanosecond LongType
    *     (`spark.sql.legacy.parquet.nanosAsLong=true`, set by
    *     [[Sessions.build]]) — floor-divide to micros exactly like DuckDB's
    *     parquet reader does;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads TIMESTAMP_NTZ,
    *     which time functions (`unix_micros`, ...) reject — cast to
    *     TIMESTAMP. The session timezone is pinned UTC, so the cast
    *     reinterprets the stored wall-clock value as the same UTC instant
    *     DuckDB's naive TIMESTAMP arithmetic uses: bit-exact, no shift. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
}
