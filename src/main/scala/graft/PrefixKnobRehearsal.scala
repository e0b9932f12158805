package graft

import org.apache.spark.sql.functions._

import graft.dedup.Containment

/** Dev utility: same-session A/B of the prefix-join knobs
  * (`positionalFilter`, `collapseSiblings`) on [[Containment.pairs]] /
  * [[Containment.subsets]] at a chosen corpus — the warm-time counterpart
  * of the 100x BenchSpill A/Bs, for attributing a BENCHMED movement to a
  * knob instead of re-running the whole catalog.
  *
  * Usage: runMain graft.PrefixKnobRehearsal [sfDir] [reps] [labelFilter]
  * (labelFilter: only time blocks whose label contains it — e.g.
  * "jaccard" to A/B one family at an expensive corpus)
  */
object PrefixKnobRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val labelFilter = if (args.length > 2) args(2) else ""
    val spark = Sessions.build("graft-prefix-knob")
    // every timed block reads only the documents table — warm just it
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      if (!label.contains(labelFilter)) return
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prefix-knob] $label%-42s min=${times.min}%6.2f " +
        s"reps=${times.map(t => f"$t%.2f").mkString(", ")}")
    }

    time("jaccard positional=on collapse=on (catalog)") {
      graft.dedup.Jaccard.pairs(docs, "doc_id", "text", minBp = 8000L,
        native = true, maxDf = Queries.NgramMaxDf)
    }
    time("jaccard positional=on collapse=off") {
      graft.dedup.Jaccard.pairs(docs, "doc_id", "text", minBp = 8000L,
        native = true, maxDf = Queries.NgramMaxDf, collapseSiblings = false)
    }
    time("jaccard pairsAuto (default: materialize)") {
      graft.dedup.Jaccard.pairsAuto(docs, "doc_id", "text", minBp = 8000L,
        native = true, maxDf = Queries.NgramMaxDf, directMaxDocs = 0L)
    }
    time("jaccard pairsAuto materialize=false (lean)") {
      graft.dedup.Jaccard.pairsAuto(docs, "doc_id", "text", minBp = 8000L,
        native = true, maxDf = Queries.NgramMaxDf, directMaxDocs = 0L,
        materialize = false)
    }
    time("pairs positional=on  collapse=on (catalog)") {
      Containment.pairs(docs, "doc_id", "text", minBp = 9000L,
        native = true, maxDf = Queries.NgramMaxDf)
    }
    time("pairs positional=off collapse=on") {
      Containment.pairs(docs, "doc_id", "text", minBp = 9000L,
        native = true, maxDf = Queries.NgramMaxDf, positionalFilter = false)
    }
    time("pairs positional=off collapse=off") {
      Containment.pairs(docs, "doc_id", "text", minBp = 9000L,
        native = true, maxDf = Queries.NgramMaxDf,
        collapseSiblings = false, positionalFilter = false)
    }
    time("pairs positional=on  collapse=off") {
      Containment.pairs(docs, "doc_id", "text", minBp = 9000L,
        native = true, maxDf = Queries.NgramMaxDf,
        collapseSiblings = false, positionalFilter = true)
    }
    time("subsets plain positional=off (catalog)") {
      Containment.subsets(docs, "doc_id", "text", minBp = 9000L,
        native = true, maxDf = Queries.NgramMaxDf, collapseSiblings = false)
    }
    time("subsets plain positional=on") {
      Containment.subsets(docs, "doc_id", "text", minBp = 9000L,
        native = true, maxDf = Queries.NgramMaxDf,
        collapseSiblings = false, positionalFilter = true)
    }
    time("subsets subsetsAuto (default: materialize)") {
      Containment.subsetsAuto(docs, "doc_id", "text", minBp = 9000L,
        native = true, maxDf = Queries.NgramMaxDf)
    }
    time("subsets subsetsAuto materialize=false (lean)") {
      Containment.subsetsAuto(docs, "doc_id", "text", minBp = 9000L,
        native = true, maxDf = Queries.NgramMaxDf, materialize = false)
    }
    time("pairs pairsAuto (default: materialize)") {
      Containment.pairsAuto(docs, "doc_id", "text", minBp = 9000L,
        native = true, maxDf = Queries.NgramMaxDf, directMaxDocs = 0L)
    }
    time("pairs pairsAuto materialize=false (lean)") {
      Containment.pairsAuto(docs, "doc_id", "text", minBp = 9000L,
        native = true, maxDf = Queries.NgramMaxDf, directMaxDocs = 0L,
        materialize = false)
    }
    spark.stop()
  }
}
