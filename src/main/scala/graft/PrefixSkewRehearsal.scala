package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ShardedPrefix

/** A/B rehearsal for the quota/budget selections under a planted
  * mega-stratum — the "one domain is half the crawl" case that pins one
  * reducer when the per-group rank/running-sum is a single window.
  *
  * Corpus: n docs, 90% in ONE source (`mega`) and the rest spread over 9
  * tame sources; each doc carries a stable uniform hash key and a token
  * count. Both plans compute the per-source (rank, running sum) in
  * (h, doc_id) order — exactly domain_mix/token_budget_mix's selection
  * backbone — and are forced through an identical downstream count.
  *
  * The single `row_number/sum over (partition by source)` ships all 0.9n
  * mega-source rows to one task and sorts them there; ShardedPrefix
  * range-shards the uniform key so every task sorts ~0.9n/shards rows and
  * the mega-source's totals ride the tiny (source, shard) side table.
  * Reported per plan: wall seconds, max task ms, median task ms, and the
  * max/p50 skew ratio.
  *
  * Usage: runMain graft.PrefixSkewRehearsal [nDocs]
  */
object PrefixSkewRehearsal {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val spark = Sessions.build("graft-prefix-skew")
    val durs = scala.collection.mutable.ArrayBuffer.empty[Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        durs.synchronized { durs += t.taskInfo.duration }
    })

    import graft.text.Hashing.{P, TokenHashA}
    val docs = spark.range(n.toLong).select(
        col("id").as("doc_id"),
        when(pmod(col("id"), lit(10L)) < 9, lit("mega"))
          .otherwise(concat(lit("src"), pmod(col("id"), lit(9L)))).as("source"),
        expr(s"(id % ${P}L * ${TokenHashA}L) % ${P}L").as("h"),
        (pmod(col("id"), lit(50L)) + 1).as("n_tokens"))
      .repartition(32)
      .cache()
    docs.count()

    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val oldWindow = docs
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
    val newSharded = ShardedPrefix.withRankAndSum(
      docs, Seq("source"), "h", "doc_id",
      rankName = "rank", sumCol = Some("n_tokens"), cumName = "cum",
      orderRange = Some((0L, P - 1))) // the static-range production path

    // async-bus drain: straggler TaskEnd events from the previous
    // rep/variant must not land after the clear (same device as
    // TopKSkewRehearsal / BenchSpill.drainBus)
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
      // the filter consumes both rank and cum so neither column is pruned
      val cnt = df.filter(col("cum") <= col("rank") * 26).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val d = durs.synchronized(durs.toVector).sorted
      val mx = d.lastOption.getOrElse(0L)
      val p50 = if (d.isEmpty) 0L else d(d.size / 2)
      println(f"[skew] $label%-24s rep=$rep rows=$cnt%9d wall=$wall%6.2fs " +
        f"taskMax=${mx}%6dms taskP50=${p50}%5dms max/p50=${mx.toDouble / math.max(p50, 1)}%5.1fx")
    }

    measure("prefix-window-OLD")(oldWindow)
    measure("prefix-sharded-NEW")(newSharded)
    spark.stop()
  }
}
