package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Memory/spill rehearsal: run each query and record Spark's task-level
  * memory metrics — total memoryBytesSpilled / diskBytesSpilled and the
  * per-task peakExecutionMemory maximum — alongside wall time. Wall-clock
  * rehearsals alone can hide an operator that only survives a scale-up by
  * spilling; this pins whether the heaviest families stay in memory at
  * the 10x corpus, and any row that spills gets a note or a fix.
  *
  * Metrics come from a SparkListener accumulating over task ends; the
  * listener bus is asynchronous, so counters are read only after the
  * drain quiesces (no growth across two consecutive polls).
  *
  * Usage: runMain graft.BenchSpill [out.md] [sfDir] [reps] [query...]
  * (defaults: BENCHSPILL.md, /root/testdata/sf0.1, 2 reps, the heaviest
  * catalog families; metrics reported for the LAST rep — warm, so JIT
  * and codegen allocations don't inflate the peak).
  */
object BenchSpill {

  /** The heaviest catalog families by warm BENCHMED time: the span pass,
    * the full curate pipelines, the graph finishers, the surprisal
    * backbone, the pair-join family, and the ANN graph build. */
  val Default: Seq[String] = Seq(
    "span_dedup", "corpus_curate_span", "corpus_curate",
    "kcore_docs", "doc_pagerank", "ppl_buckets",
    "jaccard_ppjoin", "knn_graph", "chunk_dedup", "bpe_encode")

  private[graft] final class TaskMetricsAcc extends SparkListener {
    val memSpilled = new AtomicLong(0L)
    val diskSpilled = new AtomicLong(0L)
    val peakTask = new AtomicLong(0L)
    val tasks = new AtomicLong(0L)
    /** stageId -> (memSpilled, stage name) — attributes a run's spill to
      * the physical stages producing it, so a spilling family points at
      * its plan fragment instead of needing the (disabled) UI. */
    val stageSpill = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        memSpilled.addAndGet(m.memoryBytesSpilled)
        diskSpilled.addAndGet(m.diskBytesSpilled)
        peakTask.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
        if (m.memoryBytesSpilled > 0)
          stageSpill.merge(te.stageId, m.memoryBytesSpilled, Long.box(_) + _)
        tasks.incrementAndGet()
      }
    }
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      // RDD operation scopes name the physical operators in the stage
      // (WholeStageCodegen(n)/Exchange/ObjectHashAggregate...), which is
      // what identifies a spiller; the stage's call-site name is usually
      // an AQE thread-pool lambda
      val scopes = sc.stageInfo.rddInfos
        .flatMap(_.scope).map(_.name).distinct.mkString(", ")
      stageNames.put(sc.stageInfo.stageId,
        if (scopes.nonEmpty) scopes else sc.stageInfo.name)
    }
    /** Top spilling stages as "stageId name: MiB" lines. */
    def topSpillStages(n: Int): Seq[String] = {
      import scala.jdk.CollectionConverters._
      stageSpill.asScala.toSeq.sortBy(-_._2).take(n).map { case (sid, b) =>
        f"stage $sid (${stageNames.getOrDefault(sid, "?")}): ${b / 1048576}%d MiB"
      }
    }
    /** Wait for the async listener bus to quiesce: task count unchanged
      * across two consecutive polls. */
    def settle(): Unit = {
      var prev = -1L
      var cur = tasks.get()
      while (prev != cur) {
        Thread.sleep(200)
        prev = cur
        cur = tasks.get()
      }
    }
  }

  /** Drain still-queued TaskEnd events before attaching a measuring
    * listener: the listener bus is ASYNC, so events from a job that
    * already returned (e.g. a warm-up rep) are delivered to listeners
    * added later and would contaminate their totals. A throwaway
    * listener absorbs the queue and is removed once it quiesces. */
  private[graft] def drainBus(sc: org.apache.spark.SparkContext): Unit = {
    val sink = new TaskMetricsAcc
    sc.addSparkListener(sink)
    sink.settle()
    sc.removeSparkListener(sink)
  }

  private def mb(bytes: Long): String = f"${bytes / 1024.0 / 1024.0}%.1f"

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("BENCHSPILL.md")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val names = if (args.length > 3) args.drop(3).toSeq else Default
    require(reps >= 1, "reps must be >= 1")
    val missing = names.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(", ")}")

    val spark = Sessions.build("graft-bench-spill")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    val rows = names.map { name =>
      val fn = SparkEntry.queries(name)
      // warm-up reps: JIT/codegen churn allocates but is not the steady state
      (1 until reps).foreach { _ =>
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      drainBus(spark.sparkContext)
      val acc = new TaskMetricsAcc
      spark.sparkContext.addSparkListener(acc)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      acc.settle()
      spark.sparkContext.removeSparkListener(acc)
      acc.topSpillStages(3).foreach(s => println(s"[spill-stage] $name $s"))
      (name, wall, acc.tasks.get(), acc.memSpilled.get(), acc.diskSpilled.get(),
        acc.peakTask.get())
    }

    val sb = new StringBuilder
    sb ++= "# BENCHSPILL — task memory/spill at the rehearsal corpus\n\n"
    sb ++= s"`runMain graft.BenchSpill $out $sfDir $reps` — metrics from the\n"
    sb ++= s"last of $reps reps (warm) in one session on `$sfDir`\n"
    sb ++= s"(local[${Sessions.cpus}]). `peak task mem` is the maximum single-task\n"
    sb ++= "peakExecutionMemory (execution memory actually reserved — the number\n"
    sb ++= "that must fit an executor's per-task share at production scale);\n"
    sb ++= "spill columns are totals across all tasks of the run.\n\n"
    sb ++= "| query | wall (s) | tasks | mem spilled (MiB) | disk spilled (MiB) | peak task mem (MiB) |\n"
    sb ++= "|---|---|---|---|---|---|\n"
    rows.sortBy(-_._6).foreach { case (name, wall, tasks, ms, ds, peak) =>
      sb ++= f"| $name | $wall%.2f | $tasks | ${mb(ms)} | ${mb(ds)} | ${mb(peak)} |\n"
    }
    Files.write(Paths.get(out), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $out (${rows.size} queries)")
    spark.stop()
  }
}
