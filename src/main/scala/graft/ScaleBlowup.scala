package graft

import org.apache.spark.sql.functions._

/** Deterministic corpus blowup for scale rehearsals: replicate the
  * `documents` and `embeddings` tables `factor`x (copying the other tables
  * verbatim) so the dedup/similarity families can be timed at 10x the
  * usual sf without new testdata.
  *
  * Copy k of a document keeps the token count but replaces every 4th token
  * with a (k, position)-salted token: 3 of every 4 shingle windows cross a
  * salted position, so a copy shares only ~25% of its shingles with the
  * original (Jaccard ~0.14, far below every near-dup threshold). The
  * corpus therefore grows 10x while the NEAR-DUP PAIR STRUCTURE stays that
  * of the original slice — the rehearsal measures how the algorithms scale
  * with corpus size, not with a synthetic duplication explosion. (Exact
  * hash families see each copy as a distinct doc for the same reason.)
  *
  * The salt must differ per copy UNDER THE ENGINE'S WORD CODE, which is
  * (token length, first char) — `Text.wordCode = length * base + ascii` —
  * not the full string. The original `z<k>p<i>` salt collided there for
  * every same-digit-count pair of copies (z1p0 and z2p0: length 4, first
  * 'z'), which made all those copies' shingle SETS identical — the 100x
  * rehearsal surfaced ~20M manufactured exact-duplicate pairs in clusters
  * of ~90 "identical" docs, a pathology no real 100x corpus has. The salt
  * token is now `<c><xx...><i>` with first char c = 'a' + k % 26 and
  * k / 26 extra pad chars: (first, length) is injective in k, and the
  * >= 8-char length collides with no vocabulary word of the test corpus.
  *
  * Copy k of an embedding flips the sign of every dimension where
  * (dim + k) % 7 == 0 — same norm, rotated direction, so IVF/cosine see
  * genuinely new vectors.
  *
  * Usage: runMain graft.ScaleBlowup [srcSfDir] [outDir] [factor] [mode]
  * — mode `salted` (default) as above; mode `template` keeps every
  * copy's text VERBATIM (ids still strided) and writes ONLY the
  * documents table: the sibling-HEAVY counterpart corpus
  * (TemplateRehearsal's planted-hazard shape, persisted so the
  * prefix-join knob matrix can run on both corpus shapes).
  */
object ScaleBlowup {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft-scale10"
    val factor = if (args.length > 2) args(2).toInt else 10
    val mode = if (args.length > 3) args(3) else "salted"
    require(factor >= 1, "factor must be >= 1")
    require(mode == "salted" || mode == "template",
      s"mode must be salted or template, got '$mode'")
    val spark = Sessions.build("graft-scale-blowup")

    val idStride = 1000000L
    val docs = spark.read.parquet(s"$src/documents.parquet")
    // ids above the stride would collide across copies (copy k of id x ==
    // copy k+1 of id x - stride) and silently corrupt every id-keyed
    // operator under rehearsal — fail loudly instead
    val maxDocId = docs.agg(max(col("doc_id"))).head().getLong(0)
    require(maxDocId < idStride,
      s"doc_id $maxDocId >= stride $idStride: raise idStride to avoid copy collisions")
    if (mode == "template") {
      (0 until factor)
        .map(k => docs.withColumn("doc_id", col("doc_id") + lit(k * idStride)))
        .reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      println(s"[scale-blowup] template corpus: ${factor}x verbatim copies at $out")
      spark.stop()
      return
    }
    val docCopies = (0 until factor).map { k =>
      if (k == 0) docs
      else {
        // (first char, length) must be injective in k — see the Scaladoc
        val mark = s"${('a' + k % 26).toChar}${"x" * (6 + k / 26)}"
        docs
          .withColumn("doc_id", col("doc_id") + lit(k * idStride))
          .withColumn("text", array_join(
            transform(split(col("text"), " "),
              (t, i) => when(i % 4 === 0, concat_ws("", lit(mark), i)).otherwise(t)),
            " "))
          .withColumn("n_chars", length(col("text")))
      }
    }
    docCopies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVecId = emb.agg(max(col("vec_id"))).head().getLong(0)
    require(maxVecId < idStride,
      s"vec_id $maxVecId >= stride $idStride: raise idStride to avoid copy collisions")
    val embCopies = (0 until factor).map { k =>
      if (k == 0) emb
      else emb
        .withColumn("vec_id", col("vec_id") + lit(k * idStride))
        .withColumn("embedding",
          transform(col("embedding"),
            (x, i) => when((i + lit(k)) % 7 === 0, -x).otherwise(x)))
    }
    embCopies.reduce(_ unionByName _)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // relational facts scale too: orders/lineitem replicate with the order
    // key shifted by a copy stride on BOTH tables, so the FK relationship
    // (and therefore every join/aggregate shape) is preserved while the
    // fact volume grows factor-x. Dimension keys (cust/part/supp) stay
    // unscaled — copies reuse the dimension rows, exactly how a larger SF
    // behaves relative to small dims. Events replicate with shifted ids
    // (user_id kept: more events per user, the realistic growth axis).
    val okStride = 10000000L
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val maxOk = orders.agg(max(col("o_orderkey"))).head().getLong(0)
    require(maxOk < okStride,
      s"o_orderkey $maxOk >= stride $okStride: raise okStride to avoid collisions")
    (0 until factor).map { k =>
      if (k == 0) orders else orders.withColumn("o_orderkey", col("o_orderkey") + lit(k * okStride))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")
    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    (0 until factor).map { k =>
      if (k == 0) lineitem else lineitem.withColumn("l_orderkey", col("l_orderkey") + lit(k * okStride))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    // Tables.load normalizes ts to a plain timestamp whatever the parquet
    // encoding (nanos-as-long or NTZ micros); shift copy k by k seconds so
    // copies spread inside sessions instead of stacking 10 events on one
    // instant
    val events = Tables.load(spark, src, "events")
    (0 until factor).map { k =>
      if (k == 0) events
      else events
        .withColumn("event_id", col("event_id") + lit(k * okStride))
        .withColumn("ts", col("ts") + expr(s"INTERVAL '$k' SECOND"))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    Tables.names.filterNot(Set("documents", "embeddings", "orders", "lineitem", "events"))
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
    println(s"wrote ${factor}x blowup of $src to $out")
    spark.stop()
  }
}
