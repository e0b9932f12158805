package graft

import org.apache.spark.sql.functions._

import graft.similarity.IVFPQ

/** Measured rehearsal for the IVFPQ shortlist fallback's salt knob
  * ([[graft.similarity.IVFPQ.search]] `saltBuckets`): the non-broadcast
  * probed join is keyed on `__list` alone, so a deliberately TINY nlist
  * under a huge query batch caps the exchange at nlist active partitions,
  * each building every one of its list's |Q|*nprobe/nlist LUTs — the
  * exact regime (huge |Q|) the fallback exists for. Salting splits each
  * list bucket by query hash: per-partition build state and parallelism
  * both improve by the bucket count, for one extra scan multiple of the
  * compact codes projection.
  *
  * The rehearsal builds a deliberately undersized index (nlist far below
  * core count) over the blowup corpus, takes a deterministic query slice
  * (`vec_id % 1e6 < perCopy` — the same ids from every blowup copy) with
  * `maxBroadcastQueries = 0` (forced fallback), and runs the same search
  * at each salt setting — reporting wall, spill, peak task memory, and an
  * order-independent result fingerprint (count + bit_xor of whole-row
  * hashes, one job) that must be identical across every salt value. The
  * candidate mass is |Q| * nprobe * corpus/nlist ADC rows — size the
  * query slice accordingly (the default sweep is ~2.5e8 candidates).
  *
  * Usage: runMain graft.IvfpqSaltRehearsal [sfDir] [nlist] [perCopy]
  * [salt...] (defaults: /tmp/graft-scale100, nlist 8, perCopy 50 —
  * 5k queries on the 100x corpus — salts 1 32).
  */
object IvfpqSaltRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-scale100")
    val nlist = if (args.length > 1) args(1).toInt else 8
    val perCopy = if (args.length > 2) args(2).toInt else 50
    val salts = if (args.length > 3) args.drop(3).map(_.toInt).toSeq else Seq(1, 32)
    require(nlist >= 1, "nlist must be >= 1")
    require(perCopy >= 1, "perCopy must be >= 1")
    require(salts.nonEmpty && salts.forall(_ >= 1), "salts must be >= 1")
    val spark = Sessions.build("graft-ivfpq-salt")

    val emb = Tables.load(spark, sfDir, "embeddings").cache()
    val n = emb.count()
    // ScaleBlowup strides copy k's ids by k*1e6: `% 1e6 < perCopy` picks
    // the SAME original ids out of every copy — deterministic, spread
    // across the id space, no limit()-order dependence
    val queries = emb.filter(col("vec_id") % 1000000L < perCopy).cache()
    val nQ = queries.count()
    require(nQ > 0, s"query slice is empty: no vec_id % 1e6 < $perCopy in $sfDir")
    println(s"[salt-rehearsal] corpus=$n vectors, nlist=$nlist, |Q|=$nQ (forced fallback)")
    val index = IVFPQ.build(emb, "vec_id", "embedding", nlist = nlist, m = 8, ksub = 16)
    val codes = index.codes.cache()
    codes.count() // isolate search cost from the build lineage
    val idx = index.copy(codes = codes)

    val results = salts.map { s =>
      def run() = IVFPQ.search(idx, emb, queries, "vec_id", "embedding",
        k = 10, nprobe = 2, shortlist = 16,
        maxBroadcastQueries = 0L, saltBuckets = s)
      run().write.format("noop").mode("overwrite").save() // warm-up rep
      BenchSpill.drainBus(spark.sparkContext)
      val acc = new BenchSpill.TaskMetricsAcc
      spark.sparkContext.addSparkListener(acc)
      val t0 = System.nanoTime()
      run().write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      acc.settle()
      spark.sparkContext.removeSparkListener(acc)
      // order-independent content fingerprint, one job (xor coalesced:
      // bit_xor over zero rows is null, and an empty result should read
      // as (0, 0), not NPE)
      val fp = run()
        .agg(count(lit(1)).as("n"),
          coalesce(bit_xor(xxhash64(col("query_id"), col("neighbor_id"),
            col("dot"), col("rank"))), lit(0L)).as("x"))
        .head()
      println(f"[salt-rehearsal] salt=$s%-3d wall=$wall%8.1fs " +
        f"memSpill=${acc.memSpilled.get() / 1048576}%6d MiB " +
        f"diskSpill=${acc.diskSpilled.get() / 1048576}%6d MiB " +
        f"peakTask=${acc.peakTask.get() / 1048576}%5d MiB " +
        f"tasks=${acc.tasks.get()}%6d rows=${fp.getLong(0)} xor=${fp.getLong(1)}")
      (s, fp.getLong(0), fp.getLong(1))
    }
    val (_, n0, x0) = results.head
    results.foreach { case (s, n, x) =>
      require(n == n0 && x == x0,
        s"salt=$s result fingerprint ($n, $x) != salt=${salts.head} ($n0, $x0)")
    }
    println(s"[salt-rehearsal] all ${salts.size} salt settings content-identical")
    spark.stop()
  }
}
