package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev scratch: per-stage decomposition of one query's execution — wall,
  * task time, task count, input records/bytes, shuffle read/write — for the
  * warm (second) rep, so codegen noise is excluded. Answers "how many times
  * does the scan stage actually run" and "which stages carry the seconds".
  *
  * Usage: runMain graft.StageProbe <query> [sfDir] [reps]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.build("graft-stage-probe")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val fn = SparkEntry.queries(name)

    case class St(id: Int, name: String, tasks: Int, wallMs: Long,
      taskMs: Long, inRec: Long, inMB: Double, sRead: Double, sWrite: Double,
      submitted: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    @volatile var record = false
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        if (!record) return
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages += St(si.stageId, si.name.takeWhile(_ != '\n'), si.numTasks, wall,
          m.executorRunTime, m.inputMetrics.recordsRead,
          m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          si.submissionTime.getOrElse(-1L))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    (1 to reps).foreach { r =>
      record = r == reps
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"rep $r: $sec%.3f s")
    }
    Thread.sleep(500)
    val sorted = stages.sortBy(_.submitted)
    println(f"${"stage"}%6s ${"tasks"}%5s ${"wall"}%7s ${"task"}%7s ${"inRec"}%9s ${"inMB"}%7s ${"shRd"}%7s ${"shWr"}%7s  name")
    sorted.foreach { s =>
      println(f"${s.id}%6d ${s.tasks}%5d ${s.wallMs}%6dms ${s.taskMs}%6dms ${s.inRec}%9d ${s.inMB}%7.1f ${s.sRead}%7.2f ${s.sWrite}%7.2f  ${s.name.take(70)}")
    }
    println(f"stages=${sorted.size} wallSum=${sorted.map(_.wallMs).sum}ms taskSum=${sorted.map(_.taskMs).sum}ms " +
      f"scanStages=${sorted.count(_.inRec > 0)} scanRecords=${sorted.map(_.inRec).sum}")
    spark.stop()
  }
}
