package graft

import org.apache.spark.sql.functions._

import graft.similarity.IVF

/** Measured IVF index-sizing rehearsal — the spill boundary BenchSpill
  * exposed, driven from the fix side: the all-vectors kNN-graph build
  * (the knn_graph / knn_graph_scaled chain) at a CHOSEN nlist over a
  * chosen corpus, reporting wall plus the task-level memory metrics
  * (memory/disk bytes spilled, max single-task peakExecutionMemory).
  *
  * The claim under test: per-(query, list) candidate-join state is
  * proportional to corpus/nlist, so holding nlist FIXED while the corpus
  * grows (knn_graph_scaled pins 64 for oracle parity) grows per-task
  * state linearly — 1 GiB peak at the 10x corpus, spill beyond — while
  * growing nlist with n (constant per-list size) holds per-task state
  * flat no matter the corpus. Fixed nprobe keeps per-query candidate
  * WORK constant under that sizing; recall tuning (raising nprobe) is an
  * orthogonal knob that multiplies work, not per-task join state.
  *
  * The second knob this rehearsal exposes is `spark.sql.shuffle.
  * partitions`. Under the pre-round-12 rank-window plan the ranking
  * phase's per-task SORT state was candidate mass / shuffle partitions,
  * so a pinned partition count turned into sort spill even under
  * perfect index sizing (measured: 17 GiB spilled at the 100x corpus,
  * BENCHSCALE.md). With ranking on the `graft_topk` bounded aggregate
  * that state is queries x k structs and the knob stops mattering for
  * memory — the rehearsal keeps it so the before/after stays
  * re-measurable.
  *
  * Usage: runMain graft.IvfSizingRehearsal [sfDir] [shufflePartitions]
  * [nlist...] (defaults: /tmp/graft-scale100, 0 = session default,
  * nlist 640 — the per-list-312 sizing that matches the committed 10x
  * knn_graph_scaled rehearsal point).
  */
object IvfSizingRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-scale100")
    val parts = if (args.length > 1) args(1).toInt else 0
    val nlists = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(640)
    require(nlists.forall(_ >= 1), s"nlist must be >= 1: ${nlists.mkString(", ")}")
    val spark = Sessions.build("graft-ivf-sizing")
    if (parts > 0) spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    val emb = Tables.load(spark, sfDir, "embeddings").cache()
    val n = emb.count()

    nlists.foreach { nlist =>
      BenchSpill.drainBus(spark.sparkContext)
      val acc = new BenchSpill.TaskMetricsAcc
      spark.sparkContext.addSparkListener(acc)
      val t0 = System.nanoTime()
      val index = IVF.build(emb, "vec_id", "embedding", nlist = nlist, iters = 1)
      IVF.search(index, emb, "vec_id", "embedding", k = 5, nprobe = 4)
        .select(col("query_id").as("vec_id"), col("neighbor_id"), col("dot"),
          col("rank"))
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      acc.settle()
      spark.sparkContext.removeSparkListener(acc)
      val mb = 1024.0 * 1024.0
      println(f"""{"rehearsal":"ivf_sizing","sfDir":"$sfDir","vectors":$n,""" +
        f""""shufflePartitions":${spark.conf.get("spark.sql.shuffle.partitions")},""" +
        f""""nlist":$nlist,"perList":${n / nlist},"wallSec":$wall%.2f,""" +
        f""""tasks":${acc.tasks.get()},"memSpilledMiB":${acc.memSpilled.get() / mb}%.1f,""" +
        f""""diskSpilledMiB":${acc.diskSpilled.get() / mb}%.1f,""" +
        f""""peakTaskMiB":${acc.peakTask.get() / mb}%.1f}""")
    }
    spark.stop()
  }
}
