package graft.catalyst

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

/** The bounded top-k aggregate: buffer semantics (heap bounds, ties,
  * serde, merge), SQL-level behavior (nulls, k clamping, determinism
  * across partitionings), and exact parity with the rank-window
  * formulation it replaced.
  */
class TopKAggregateSpec extends SparkSpec with TableDrivenPropertyChecks {

  // ---- buffer unit behavior ----

  test("buffer keeps the k best under (score desc, id asc), any insert order") {
    val buf = new TopKBuffer(3)
    Seq((5L, 10L), (1L, 1L), (9L, 7L), (5L, 2L), (9L, 8L), (0L, 0L))
      .foreach { case (s, i) => buf.insert(s, i) }
    val got = buf.toSortedArrayData.array.toSeq
      .map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      .map(r => (r.getLong(0), r.getLong(1)))
    // best: 9@7, 9@8 (tie -> lower id first), then 5@2 beats 5@10
    assert(got == Seq((9L, 7L), (9L, 8L), (5L, 2L)))
  }

  test("buffer under capacity returns what it has, sorted") {
    val buf = new TopKBuffer(5)
    buf.insert(2L, 2L); buf.insert(7L, 1L)
    val got = buf.toSortedArrayData.array.toSeq
      .map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got == Seq((7L, 1L), (2L, 2L)))
  }

  test("serde round-trip and merge preserve the kept set") {
    val a = new TopKBuffer(4)
    val b = new TopKBuffer(4)
    Seq((3L, 3L), (8L, 1L), (8L, 9L)).foreach { case (s, i) => a.insert(s, i) }
    Seq((5L, 5L), (8L, 0L), (1L, 2L)).foreach { case (s, i) => b.insert(s, i) }
    val aRound = TopKBuffer.deserialize(a.serialize(), 4)
    aRound.absorb(b)
    val got = aRound.toSortedArrayData.array.toSeq
      .map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got == Seq((8L, 0L), (8L, 1L), (8L, 9L), (5L, 5L)))
  }

  test("heap never exceeds k and evicts exactly the worst") {
    val buf = new TopKBuffer(2)
    (1L to 100L).foreach(i => buf.insert(i % 13, i))
    assert(buf.size == 2)
    val got = buf.toSortedArrayData.array.toSeq
      .map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      .map(r => (r.getLong(0), r.getLong(1)))
    // best score is 12, smallest ids with score 12 are 12 and 25
    assert(got == Seq((12L, 12L), (12L, 25L)))
  }

  // ---- SQL-level behavior ----

  test("graft_topk over SQL: ranks, null skipping, k larger than group") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(5L), Some(1L)), ("a", Some(9L), Some(2L)),
      ("a", None, Some(3L)), ("a", Some(7L), None),
      ("b", Some(4L), Some(4L))).toDF("g", "s", "i")
    val out = df.groupBy(col("g"))
      .agg(call_function("graft_topk", col("s"), col("i"), lit(10)).as("tk"))
      .select(col("g"), expr("transform(tk, e -> e.id)").as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // null score and null id rows are skipped; under-full groups keep all
    assert(out("a") == Seq(2L, 1L))
    assert(out("b") == Seq(4L))
  }

  test("graft_topk rejects fractional score/id instead of silently truncating") {
    import spark.implicits._
    val df = Seq((0.9, 1L), (0.1, 2L)).toDF("s", "i")
    // a Cast would send every score in (0,1) to 0L and degenerate the
    // ranking; the registration must refuse the frame outright
    val e = intercept[Exception] {
      df.groupBy(lit(1))
        .agg(call_function("graft_topk", col("s"), col("i"), lit(1)))
        .collect()
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("null score/id rows are dropped on ALL ranking paths identically") {
    import spark.implicits._
    val rows = Seq(
      ("a", Some(5L), Some(1L)), ("a", None, Some(2L)), ("a", Some(3L), None),
      ("b", None, Some(9L))) // query b has ONLY null-scored candidates
    val bare = rows.toDF("query_id", "s", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("s"))
    val viaAgg = Similarity.topKPerQuery(bare, "s", 3)
      .select("query_id", "neighbor_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaPayload = Similarity
      .topKPerQuery(bare.withColumn("payload", lit(1)), "s", 3)
      .select("query_id", "neighbor_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaWindow = Similarity
      .topKPerQuery(bare.withColumn("payload", lit(1)), "s", 3, forceWindow = true)
      .select("query_id", "neighbor_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // nulls are not ranked candidates: query b vanishes on every path
    assert(viaAgg == Set(("a", 1L)))
    assert(viaPayload == viaAgg, "payload aggregate must share the null contract")
    assert(viaWindow == viaAgg, "window opt-in must share the null contract")
  }

  test("graft_topk rejects a non-literal or non-positive k") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("s", "i")
    intercept[Exception] {
      df.select(call_function("graft_topk", col("s"), col("i"), col("s")))
        .collect()
    }
    intercept[Exception] {
      df.groupBy(lit(1))
        .agg(call_function("graft_topk", col("s"), col("i"), lit(0)))
        .collect()
    }
  }

  // ---- parity with the window formulation ----

  /** Deterministic pseudo-random candidates: 40 queries x ~200 candidates
    * with heavy score ties (scores mod 17) — the tie-break regime where a
    * wrong comparator shows up immediately. */
  private def candidates = {
    spark.range(8000).select(
      (col("id") % 40).as("query_id"),
      (col("id") * 2654435761L % 100003).as("neighbor_id"),
      (col("id") * 40503L % 17).as("dot"))
      .distinct()
  }

  test("aggregate path matches the rank-window formulation exactly") {
    val viaAgg = Similarity.topKPerQuery(candidates, "dot", 5)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    val viaWindow = candidates
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
    assert(viaAgg.columns.toSeq == viaWindow.columns.toSeq)
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
    // and the plan is the aggregate, not a window
    val p = viaAgg.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), "expected the bounded aggregate")
    assert(!p.contains("Window"), "no rank window on the aggregate path")
  }

  test("result is identical across partitionings (1, 3, 16 slices)") {
    val expected = Similarity.topKPerQuery(candidates, "dot", 4)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    for (n <- Seq(1, 3, 16)) {
      val got = Similarity.topKPerQuery(candidates.repartition(n), "dot", 4)
        .orderBy(col("query_id"), col("rank")).collect().toSeq
      assert(got == expected, s"partitioning $n diverged")
    }
  }

  test("payload-column frames ride graft_topk_payload, never a window") {
    val extra = candidates.withColumn("payload", lit("x"))
    val out = Similarity.topKPerQuery(extra, "dot", 3)
    assert(out.columns.toSeq ==
      Seq("query_id", "neighbor_id", "dot", "payload", "rank"))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("graft_topk_payload") && p.contains("ObjectHashAggregate"),
      "payload frames must use the bounded payload aggregate")
    assert(!p.contains("Window"), "no rank window on the payload path")
    assert(out.collect().forall(_.getString(3) == "x"))
  }

  test("payload path: mixed-type payloads (string/array/null) survive serde across partitionings") {
    import spark.implicits._
    // strings, arrays, and nulls exercise the UnsafeRow payload serde —
    // values must survive the exchange's serialize/deserialize and the
    // heap's eviction shuffling intact, on any input partitioning
    val df = spark.range(2000).select(
        (col("id") % 20).as("query_id"),
        (col("id") * 2654435761L % 100003).as("neighbor_id"),
        (col("id") * 40503L % 17).as("dot"))
      .distinct()
      .withColumn("tag",
        when(col("neighbor_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("t"), col("neighbor_id"))))
      .withColumn("arr", array(col("neighbor_id"), col("dot")))
    val expected = Similarity
      .topKPerQuery(df, "dot", 4, forceWindow = true)
      .orderBy(col("query_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3)), r.getSeq[Long](4), r.getLong(5))).toSeq
    for (n <- Seq(1, 3, 16)) {
      val got = Similarity.topKPerQuery(df.repartition(n), "dot", 4)
        .orderBy(col("query_id"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.getString(3)), r.getSeq[Long](4), r.getLong(5))).toSeq
      assert(got == expected, s"payload path diverged from window at partitioning $n")
    }
  }

  test("payload path preserves the extra columns' nullability in the output schema") {
    // the window path kept the input schema's non-null flags; the payload
    // aggregate must too (its payload struct field mirrors the payload
    // expression's nullability), or downstream required-field sinks break
    val extra = candidates
      .withColumn("tag", concat(lit("t"), col("neighbor_id"))) // non-nullable
    val out = Similarity.topKPerQuery(extra, "dot", 3)
    val viaWindow = Similarity.topKPerQuery(extra, "dot", 3, forceWindow = true)
    assert(out.schema("tag").nullable == viaWindow.schema("tag").nullable,
      s"payload path loosened nullability: ${out.schema("tag")} vs window ${viaWindow.schema("tag")}")
  }

  test("bare and payload buffers keep identical (score, id) sets on any stream") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // the two buffers deliberately keep separate sift loops (the bare one
    // is primitive-only); this pins them to the shared TopKOrdering so
    // the loops cannot drift apart silently
    val genRows = Gen.listOf(for {
      s <- Gen.choose(-5L, 5L)
      i <- Gen.choose(0L, 60L)
    } yield (s, i)).map(_.distinct)
    val prop = Prop.forAll(genRows, Gen.choose(1, 6)) { (rows, k) =>
      val bare = new TopKBuffer(k)
      val pay = new TopKPayloadBuffer(k)
      rows.foreach { case (s, i) => bare.insert(s, i); pay.insert(s, i, null) }
      def kept(ad: org.apache.spark.sql.catalyst.util.GenericArrayData) =
        ad.array.toSeq.map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
          .map(r => (r.getLong(0), r.getLong(1)))
      kept(bare.toSortedArrayData) == kept(pay.toSortedArrayData)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("payload buffer equals sort-take with payload integrity, any inserts/k/merge split") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genRows = Gen.listOf(for {
      s <- Gen.choose(-5L, 5L)
      i <- Gen.choose(0L, 60L)
    } yield (s, i)).map(_.distinct)
    val prop = Prop.forAll(genRows, Gen.choose(1, 6), Gen.choose(0.0, 1.0)) {
      (rows, k, frac) =>
        // payload = a string derived from the id, so misplaced payloads
        // are visible; reference is plain sort-take carrying payloads
        val expected = rows.sortBy { case (s, i) => (-s, i) }.take(k)
          .map { case (s, i) => (s, i, s"p$i") }
        val cut = (rows.size * frac).toInt
        val (la, lb) = rows.splitAt(cut)
        val a = new TopKPayloadBuffer(k)
        la.foreach { case (s, i) => a.insert(s, i, s"p$i") }
        val b = new TopKPayloadBuffer(k)
        lb.foreach { case (s, i) => b.insert(s, i, s"p$i") }
        a.absorb(b)
        val got = a.toSortedArrayData.array.toSeq
          .map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
          .map(r => (r.getLong(0), r.getLong(1), r.get(2, null).toString))
        got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("sort-based aggregation fallback (threshold exceeded) stays hash-identical") {
    // production raises the ObjectHashAggregate fallback threshold to 1M
    // (Sessions.build); if a task ever holds MORE distinct groups, Spark
    // flips to sort-based aggregation, which serializes/sorts/merges the
    // typed buffers on a different code path — force that flip at
    // threshold 2 and pin exact parity with the hash path
    val s = spark.newSession()
    s.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
    val cand = s.range(8000).select(
      (col("id") % 40).as("query_id"),
      (col("id") * 2654435761L % 100003).as("neighbor_id"),
      (col("id") * 40503L % 17).as("dot")).distinct()
    val got = Similarity.topKPerQuery(cand, "dot", 5)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val expected = Similarity.topKPerQuery(candidates, "dot", 5)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(got == expected, "sort-based fallback diverged from the hash path")
  }

  // ---- buffer property: any insert/merge tree equals sort-take ----

  test("buffer equals the sort-take reference for any inserts, k, and merge split") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genRows = Gen.listOf(for {
      s <- Gen.choose(-5L, 5L) // heavy ties, including negatives
      i <- Gen.choose(0L, 60L)
    } yield (s, i)).map(_.distinct) // unique ids per group, per the contract
    val prop = Prop.forAll(genRows, Gen.choose(1, 6), Gen.choose(0.0, 1.0)) {
      (rows, k, frac) =>
        // reference: plain sort by (score desc, id asc), take k
        val expected = rows.sortBy { case (s, i) => (-s, i) }.take(k)
        // split the stream at an arbitrary point, build two partial
        // buffers (one serde round-tripped), merge — the partial/final
        // aggregation shape on an arbitrary partitioning
        val cut = (rows.size * frac).toInt
        val (la, lb) = rows.splitAt(cut)
        val a = new TopKBuffer(k); la.foreach { case (s, i) => a.insert(s, i) }
        val b = new TopKBuffer(k); lb.foreach { case (s, i) => b.insert(s, i) }
        val merged = TopKBuffer.deserialize(a.serialize(), k)
        merged.absorb(TopKBuffer.deserialize(b.serialize(), k))
        val got = merged.toSortedArrayData.array.toSeq
          .map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
          .map(r => (r.getLong(0), r.getLong(1)))
        got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
