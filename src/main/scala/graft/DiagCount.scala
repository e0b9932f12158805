package graft

/** Dev utility: row-count one or more catalog queries against a scale
  * dir without writing anything — the cheapest way to attribute a
  * rehearsal blowup to candidate mass (e.g. LSH band collisions vs
  * verified pairs at the 100x corpus).
  *
  * Usage: runMain graft.DiagCount <sfDir> <name> [name...]
  */
object DiagCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = Sessions.build("graft-diag-count")
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"""[diag-count] $name rows=$n%,d sec=${(System.nanoTime() - t0) / 1e9}%.1f""")
    }
    spark.stop()
  }
}
