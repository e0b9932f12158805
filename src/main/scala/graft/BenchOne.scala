package graft

/** Dev utility: time one named query N times (default 3) against a scale
  * dir — the single-query feedback loop for plan iteration that Bench (one
  * timed pass over the whole catalog) is too coarse for.
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
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      // noop sink materializes EVERY column: count() would let the
      // optimizer prune projection-only queries down to scan+count and the
      // timing would no longer respond to the expressions under test
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"""{"query":"$name","times":[${times.mkString(",")}],"min":${times.min}}""")
    spark.stop()
  }
}
