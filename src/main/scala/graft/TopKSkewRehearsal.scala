package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** A/B rehearsal for per-query top-k under a planted HOT QUERY — the
  * "one probe lands in a corpus-scale IVF list" / "one BM25 term is a
  * stopword" case, where a single query owns most of the scored
  * candidate mass.
  *
  * Candidates: n rows, 90% owned by ONE query (`0`) and the rest spread
  * over 999 tame queries; integer scores with heavy ties. Both plans
  * select each query's k best (score DESC, id ASC) and are forced
  * through an identical downstream count.
  *
  * The rank window — even SHARDED over (query, id-hash) — must sort the
  * hot query's whole candidate slice in each task; the `graft_topk`
  * bounded aggregate (the production path in
  * [[Similarity.topKPerQuery]]) prunes every map task to <= k rows per
  * query before the exchange, so the hot query contributes exactly one
  * k-entry heap per task no matter how many candidates it owns. Three
  * legs: the pre-round-12 rank window (now reachable only via
  * topKPerQuery's explicit `forceWindow` opt-in), the payload frame on
  * the round-13 `graft_topk_payload` aggregate (the DEFAULT for frames
  * carrying extra columns), and the bare frame on `graft_topk`.
  * Reported per plan: wall seconds, max task ms, median task ms, and
  * the max/p50 skew ratio; the spill metrics BenchSpill pins at corpus
  * scale are flat here only because the planted corpus fits — the 100x
  * sizing rehearsal (BENCHSCALE.md) is where the window spills 17 GiB.
  *
  * Usage: runMain graft.TopKSkewRehearsal [nCandidates] [k]
  */
object TopKSkewRehearsal {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000000)
    val k = if (args.length > 1) args(1).toInt else 10
    val spark = Sessions.build("graft-topk-skew")
    val durs = scala.collection.mutable.ArrayBuffer.empty[Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        durs.synchronized { durs += t.taskInfo.duration }
    })

    val cand = spark.range(n.toLong).select(
        when(pmod(col("id"), lit(10L)) < 9, lit(0L))
          .otherwise(pmod(col("id") * 2654435761L, lit(999L)) + 1L)
          .as("query_id"),
        col("id").as("neighbor_id"),
        pmod(col("id") * 40503L, lit(1000L)).as("dot"))
      .repartition(32)
      .cache()
    cand.count()

    // window variant: the pre-round-12 sharded two-phase rank window,
    // now an explicit opt-in
    val viaWindow = Similarity
      .topKPerQuery(cand.withColumn("__payload", lit(1)), "dot", k,
        forceWindow = true)
      .drop("__payload")
    // payload-aggregate variant: the same payload frame on the DEFAULT
    // path — graft_topk_payload carries the extra column in the heap
    val viaPayload = Similarity
      .topKPerQuery(cand.withColumn("__payload", lit(1)), "dot", k)
      .drop("__payload")
    // aggregate variant: the bare frame rides graft_topk
    val viaAgg = Similarity.topKPerQuery(cand, "dot", k)

    // the listener bus is async: straggler TaskEnd events from the
    // previous rep/variant must not land after the clear and pollute the
    // next measurement's task stats — poll until the count stops moving
    def drain(): Unit = {
      var prev = -1
      var cur = durs.synchronized(durs.size)
      while (prev != cur) {
        Thread.sleep(200); prev = cur; cur = durs.synchronized(durs.size)
      }
    }
    def measure(label: String)(df: => DataFrame): Unit = (1 to 2).foreach { rep =>
      drain()
      durs.synchronized(durs.clear())
      val t0 = System.nanoTime()
      val cnt = df.filter(col("rank") <= k).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val d = durs.synchronized(durs.toVector).sorted
      val mx = d.lastOption.getOrElse(0L)
      val p50 = if (d.isEmpty) 0L else d(d.size / 2)
      println(f"[topk-skew] $label%-18s rep=$rep rows=$cnt%7d wall=$wall%6.2fs " +
        f"taskMax=${mx}%6dms taskP50=${p50}%5dms max/p50=${mx.toDouble / math.max(p50, 1)}%5.1fx")
    }

    measure("rank-window-OLD")(viaWindow)
    measure("topk-payload-NEW")(viaPayload)
    measure("graft_topk-NEW")(viaAgg)
    spark.stop()
  }
}
