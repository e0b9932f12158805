package graft

/** Dev utility: time one named query N times (default 3) against a scale
  * dir — the single-query feedback loop for plan iteration that Bench (one
  * timed pass over the whole catalog) is too coarse for.
  *
  * Besides wall time, each rep reports the DELTA in Spark's codegen
  * metrics — janino compilation invocations and generated CLASS COUNTS
  * (histogram sample counts, not byte totals) — so a slow rep-1 can be
  * attributed: a large compile delta on rep 1 that vanishes by rep 2 is
  * janino/classloading cost, not the query.
  *
  * Usage: runMain graft.BenchOne <name> [sfDir] [reps]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.build("graft-bench-one")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val fn = SparkEntry.queries(name)
    import org.apache.spark.metrics.source.CodegenMetrics
    def compiles: Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    def generatedClasses: Long =
      CodegenMetrics.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount
    val stats = (1 to reps).map { _ =>
      val c0 = compiles; val b0 = generatedClasses
      val t0 = System.nanoTime()
      // noop sink materializes EVERY column: count() would let the
      // optimizer prune projection-only queries down to scan+count and the
      // timing would no longer respond to the expressions under test
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, compiles - c0, generatedClasses - b0)
    }
    val times = stats.map(_._1)
    println(s"""{"query":"$name","times":[${times.mkString(",")}],"min":${times.min},""" +
      s""""compiles":[${stats.map(_._2).mkString(",")}],""" +
      s""""classes":[${stats.map(_._3).mkString(",")}]}""")
    spark.stop()
  }
}
