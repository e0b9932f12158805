package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins (SURVEY §7 scale plan).
  *
  * On a 100 TB deployment the fact tables are written once, bucketed by
  * their join key; every subsequent equi-join on that key is shuffle-free
  * (both sides arrive pre-partitioned, Spark plans a SortMergeJoin with no
  * Exchange). This is the batch analog of the reference's fixed
  * partition-by-path layout: pay the partitioning cost at write time, reuse
  * it on every read.
  */
object Bucketing {

  /** Persist `df` as a bucketed catalog table (overwriting). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCol: Option[String] = None): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** True iff the executed plan of `df` contains a shuffle exchange.
    * AQE-aware: under adaptive execution (the engine session's default)
    * the executed plan is an AdaptiveSparkPlanExec LEAF — a blind
    * `.exists` would never traverse into the real plan and report false
    * for any query, letting a bucketing regression pass silently. */
  def hasShuffle(df: DataFrame): Boolean = {
    def scan(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p.exists {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scan(a.executedPlan)
      case _ => false
    }
    scan(df.queryExecution.executedPlan)
  }
}
