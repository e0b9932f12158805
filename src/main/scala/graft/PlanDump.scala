package graft

/** Dump `.explain("formatted")` for named queries, one file per query —
  * the per-round before/after plan evidence (plans/r{N}/<q>_<suffix>.txt).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <query...>
  * Core count pinned like [[Plans]] so partition counts in the dumped
  * plans don't vary with the box.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args.drop(3).toSeq
    val spark = Sessions.build("graft-plan-dump", "8")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        Plans.planText(spark, sfDir, n))
    }
    println(s"wrote ${names.size} plans to $outDir")
    spark.stop()
  }
}
