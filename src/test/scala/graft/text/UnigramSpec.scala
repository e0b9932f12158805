package graft.text

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram-LM trainer/encoder: agreement with a sequential reference
  * (seed selection, both hard-EM rounds, final costs), segmentation
  * tie-break semantics, unused-piece dropout, partitioning independence,
  * and blank-doc encode rows. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def bitlen(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong

  /** piece -> (count, costBits) over the CURRENT table. */
  private def withCosts(counts: Seq[(String, Long)]): Map[String, (Long, Long)] = {
    val total = counts.map(_._2).sum
    counts.map { case (p, c) => p -> (c, bitlen(total) - bitlen(c)) }.toMap
  }

  /** Sequential greedy minimal-bits segmentation (Unigram.segSyms). */
  private def seg(w: String, costs: Map[String, Long]): List[String] = {
    val out = mutable.ListBuffer.empty[String]
    var pos = 0
    while (pos < w.length) {
      val cands = (Unigram.MaxPieceLen to 1 by -1).flatMap { l =>
        if (pos + l <= w.length) {
          val sub = w.substring(pos, pos + l)
          val k = costs.get(sub).map(_ * (12 / l))
            .orElse(if (l == 1) Some(Unigram.UnkCostBits * 12) else None)
          k.map(kk => (kk, (Unigram.MaxPieceLen - l).toLong, l))
        } else None
      }
      val l = cands.min._3
      out += w.substring(pos, pos + l)
      pos += l
    }
    out.toList
  }

  /** Sequential hard-EM trainer (Unigram.train). */
  private def refTrain(
      vocab: Map[String, Long],
      topMulti: Int = 48,
      iters: Int = 2): Seq[(String, Long, Long)] = {
    val subs = for {
      (w, f) <- vocab.toSeq
      l <- 1 to Unigram.MaxPieceLen
      i <- 0 to w.length - l
    } yield (w.substring(i, i + l), f)
    val counts = subs.groupMapReduce(_._1)(_._2)(_ + _)
    val singles = counts.filter(_._1.length == 1).toSeq.sortBy(_._1)
    val multis = counts.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(topMulti)
    val alphabet = singles.map(_._1)
    var table = withCosts(singles ++ multis)
    for (_ <- 1 to iters) {
      val costs = table.map { case (p, (_, b)) => p -> b }
      val usage = mutable.Map.empty[String, Long]
      for ((w, f) <- vocab; p <- seg(w, costs))
        usage(p) = usage.getOrElse(p, 0L) + f
      val ns = alphabet.map(c => (c, usage.getOrElse(c, 0L)))
      val nm = usage.filter(_._1.length > 1).toSeq.sortBy(_._1)
      table = withCosts(ns ++ nm)
    }
    table.toSeq.map { case (p, (c, b)) => (p, c, b) }.sortBy(_._1)
  }

  private val corpus = Map(
    "abab" -> 5L, "ababab" -> 3L, "banana" -> 4L,
    "bandana" -> 2L, "cab" -> 7L, "a" -> 9L)

  private def run(vocab: Map[String, Long], parts: Int = 1): Seq[(String, Long, Long)] =
    Unigram.train(vocab.toSeq.toDF("w", "freq").repartition(parts), "w", "freq")
      .orderBy("piece").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("matches the sequential trainer on a structured corpus") {
    assert(run(corpus) === refTrain(corpus))
  }

  test("training is partitioning-independent") {
    assert(run(corpus, parts = 7) === run(corpus, parts = 1))
  }

  test("unused multi-char pieces drop out; the alphabet never does") {
    val got = run(Map("zzzz" -> 10L))
    val pieces = got.map(_._1)
    // zzz (2 bits over 3 chars) beats zz and zzzz per scaled cost; after
    // round 1 only {zzz, z} carry usage, so the other multis drop
    assert(pieces.contains("z") && pieces.contains("zzz"))
    assert(!pieces.contains("zz") && !pieces.contains("zzzz"))
    // single-char rows survive even at zero usage
    val lone = run(Map("qr" -> 4L))
    assert(lone.map(_._1).contains("q") && lone.map(_._1).contains("r"))
  }

  test("segmentation picks cheapest bits-per-char, longest piece on ties") {
    // "ab" at cost 4 ties "a" at cost 2 on k = 24; the longer piece wins
    val pieces = Seq(
      Unigram.Piece("a", 1, 2), Unigram.Piece("b", 1, 3),
      Unigram.Piece("c", 1, 3), Unigram.Piece("ab", 1, 4),
      Unigram.Piece("abc", 1, 9))
    val got = Unigram.segmentVocab(Seq("abc", "abab", "cba").toDF("w"), "w", pieces)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // abc: "ab"(24) ties "a"(24), beats "abc"(36) -> ab, then c
    assert(got("abc") === List("ab", "c"))
    assert(got("abab") === List("ab", "ab"))
    assert(got("cba") === List("c", "b", "a"))
  }

  test("encode matches the reference and keeps blank docs at zero") {
    val table = refTrain(corpus)
    val costs = table.map { case (p, _, b) => p -> b }.toMap
    val docs = Seq(
      (1L, "abab cab a"), (2L, "banana bandana"), (3L, ""), (4L, "  "),
      (5L, "ababab a a cab")).toDF("doc_id", "text")
    val pieces = table.map { case (p, c, b) => Unigram.Piece(p, c, b) }
    val got = Unigram.encode(docs, "doc_id", "text", pieces)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = Seq(
      (1L, "abab cab a"), (2L, "banana bandana"), (3L, ""), (4L, "  "),
      (5L, "ababab a a cab")).map { case (id, text) =>
      val words = text.split(" ", -1).filter(_.nonEmpty)
      val ss = words.flatMap(w => seg(w, costs))
      (id, ss.length.toLong, ss.map(costs).sum)
    }
    assert(got === expected)
  }
}
