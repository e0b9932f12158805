package graft

import org.apache.spark.sql.functions._

/** Dev scratch main for A/B experiments — not part of any surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = Sessions.build("graft-scratch")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    val qs = Seq("jaccard_ppjoin", "containment_ppjoin", "subset_ppjoin")
    (1 to 3).foreach { rep =>
      qs.foreach { q =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"rep$rep $q%22s construct=${(t1 - t0) / 1e9}%.3f exec=${(t2 - t1) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
