package graft

import org.apache.spark.sql.functions._

import graft.similarity.{IVF, IVFPQ}

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
  * order-independent result fingerprint (count + bit_xor + decimal sum
  * of whole-row hashes, one job — the sum makes it multiplicity-
  * sensitive where xor alone cancels even counts) that must be
  * identical across every salt value. The
  * candidate mass is |Q| * nprobe * corpus/nlist ADC rows — size the
  * query slice accordingly (the default sweep is ~2.5e8 candidates).
  *
  * Usage: runMain graft.IvfpqSaltRehearsal [sfDir] [nlist] [perCopy]
  * [salt...] (defaults: /tmp/graft-scale100, nlist 8, perCopy 50 —
  * 5k queries on the 100x corpus — salts 1 0 32; salt 0 = the AUTO
  * default: 1 when the query batch broadcasts or nlist >=
  * defaultParallelism, else `ceil(4 * defaultParallelism / nlist)` —
  * the capped-exchange rule in IVF.scala/IVFPQ.scala that these rows
  * adjudicate against the tuned settings).
  */
object IvfpqSaltRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-scale100")
    val nlist = if (args.length > 1) args(1).toInt else 8
    val perCopy = if (args.length > 2) args(2).toInt else 50
    val salts = if (args.length > 3) args.drop(3).map(_.toInt).toSeq else Seq(1, 0, 32)
    require(nlist >= 1, "nlist must be >= 1")
    require(perCopy >= 1, "perCopy must be >= 1")
    require(salts.nonEmpty && salts.forall(_ >= 0), "salts must be >= 0 (0 = auto)")
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
    // per-family sweep: warm-up rep, measured rep with task metrics, then
    // an order-independent content fingerprint, one job. bit_xor alone
    // cancels rows with even multiplicity (a duplicated row replacing a
    // distinct one can fingerprint identically), so a sum of the same
    // hashes rides along — multiplicity shifts that cancel in xor don't
    // cancel in both. Decimal sum: a Long sum of 64-bit hashes overflows
    // after a handful of rows, which under ANSI arithmetic throws.
    // Coalesced: aggregates over zero rows are null, and an empty result
    // should read as (0, 0, 0), not NPE.
    def sweep(family: String)(run: Int => org.apache.spark.sql.DataFrame): Unit = {
      val results = salts.map { s =>
        run(s).write.format("noop").mode("overwrite").save() // warm-up rep
        BenchSpill.drainBus(spark.sparkContext)
        val acc = new BenchSpill.TaskMetricsAcc
        spark.sparkContext.addSparkListener(acc)
        val t0 = System.nanoTime()
        run(s).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        acc.settle()
        spark.sparkContext.removeSparkListener(acc)
        val rowHash = xxhash64(col("query_id"), col("neighbor_id"),
          col("dot"), col("rank"))
        val fp = run(s)
          .agg(count(lit(1)).as("n"),
            coalesce(bit_xor(rowHash), lit(0L)).as("x"),
            coalesce(sum(rowHash.cast("decimal(38,0)")),
              lit(0L).cast("decimal(38,0)")).as("s"))
          .head()
        println(f"[salt-rehearsal] $family%-5s salt=$s%-3d wall=$wall%8.1fs " +
          f"memSpill=${acc.memSpilled.get() / 1048576}%6d MiB " +
          f"diskSpill=${acc.diskSpilled.get() / 1048576}%6d MiB " +
          f"peakTask=${acc.peakTask.get() / 1048576}%5d MiB " +
          f"tasks=${acc.tasks.get()}%6d rows=${fp.getLong(0)} " +
          f"xor=${fp.getLong(1)} sum=${fp.getDecimal(2)}")
        (s, (fp.getLong(0), fp.getLong(1), fp.getDecimal(2)))
      }
      val (_, fp0) = results.head
      results.foreach { case (s, fp) =>
        require(fp == fp0,
          s"$family salt=$s result fingerprint $fp != salt=${salts.head} $fp0")
      }
      println(s"[salt-rehearsal] $family: all ${salts.size} salt settings content-identical")
    }

    val index = IVFPQ.build(emb, "vec_id", "embedding", nlist = nlist, m = 8, ksub = 16)
    val codes = index.codes.cache()
    codes.count() // isolate search cost from the build lineage
    val idx = index.copy(codes = codes)
    sweep("ivfpq") { s =>
      IVFPQ.search(idx, emb, queries, "vec_id", "embedding",
        k = 10, nprobe = 2, shortlist = 16,
        maxBroadcastQueries = 0L, saltBuckets = s)
    }
    codes.unpersist(blocking = false)

    // the IVF rung in the same regime (same undersized nlist, same query
    // batch): its probe join is keyed on __list alone too, so without
    // salt the exact-dot candidate scan runs at nlist active partitions
    val ivfIndex = {
      val built = IVF.build(emb, "vec_id", "embedding", nlist = nlist)
      val assigned = built.assigned.cache()
      assigned.count() // isolate search cost from the build lineage
      built.copy(assigned = assigned)
    }
    // maxBroadcastQueries = 0 forces the fallback here too: the auto row
    // (salt 0) must adjudicate the derive rule in the capped regime, not
    // collapse to the broadcast path on this deliberately small |Q|
    sweep("ivf") { s =>
      IVF.search(ivfIndex, queries, "vec_id", "embedding",
        k = 10, nprobe = 2, saltBuckets = s, maxBroadcastQueries = 0L)
    }
    spark.stop()
  }
}
