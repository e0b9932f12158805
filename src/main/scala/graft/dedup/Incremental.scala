package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.{Hashing, Text}

/** Incremental (cross-corpus) deduplication: dedup a NEW batch against an
  * existing REFERENCE corpus — the crawl-refresh shape, where the
  * reference is already curated and must not be re-processed.
  *
  * Two guards, both one-sided joins:
  *  - exact: text fingerprint, new left-semi'd against reference
  *    fingerprints to find drops;
  *  - near: LSH band keys, new bands equi-joined to reference bands
  *    (never all-pairs), candidates verified with the exact shingle-set
  *    Jaccard before dropping.
  *
  * Scale: the reference side's fingerprints and bands are pure projections
  * a production run persists once (the "index"); each refresh then
  * shuffles only the NEW batch plus the band-key slice of the reference
  * it collides with. Within-batch duplicates are deliberately untouched —
  * this operator's contract is purely "not already in the reference"; run
  * the normal in-corpus dedup on the batch separately.
  */
object Incremental {

  /** Rows of `newDocs` that neither exactly nor nearly (>= minBp Jaccard
    * over 3-shingle sets) duplicate any reference document. */
  def survivors(
      newDocs: DataFrame,
      refDocs: DataFrame,
      idCol: String,
      textCol: String,
      minBp: Long,
      native: Boolean = false): DataFrame = {
    def fp(d: DataFrame) =
      d.select(col(idCol).as("__id"),
        (if (native) call_function("graft_fingerprint", col(textCol))
         else Text.fingerprint(col(textCol))).as("__fp"))
    val exactDrop = fp(newDocs)
      .join(fp(refDocs).select(col("__fp")), Seq("__fp"), "left_semi")
      .select(col("__id"))

    // docs under 3 tokens have EMPTY shingle sets and all share the P-1
    // sentinel signature — without this prefilter every short new doc
    // band-collides with every short reference doc (an M x N candidate
    // blow-up) only for the Jaccard verify to discard each pair; dropping
    // them from the band legs is semantics-neutral (the exact-fingerprint
    // guard still catches short duplicates)
    def bandKeys(d: DataFrame) = {
      val keys = (0 until Hashing.Bands)
        .map(b => concat_ws("#", lit(b), col(s"band_$b")))
      MinHash.bands(d.filter(size(split(col(textCol), " ")) >= 3),
          idCol, textCol, native = native)
        .select(col(idCol).as("__id"), explode(array(keys: _*)).as("__key"))
    }
    def sets(d: DataFrame) = MinHash.withShingles(d, idCol, textCol, native)
      .select(col(idCol).as("__sid"), array_distinct(col("__sh")).as("__set"))
    val cand = bandKeys(newDocs).as("n")
      .join(bandKeys(refDocs).as("r"), col("n.__key") === col("r.__key"))
      .select(col("n.__id").as("nid"), col("r.__id").as("rid"))
      .distinct()
    val nearDrop = cand
      .join(sets(newDocs).as("sa"), col("nid") === col("sa.__sid"))
      .join(sets(refDocs).as("sb"), col("rid") === col("sb.__sid"))
      .withColumn("inter",
        size(array_intersect(col("sa.__set"), col("sb.__set"))).cast(LongType))
      .withColumn("szsum",
        (size(col("sa.__set")) + size(col("sb.__set"))).cast(LongType))
      .withColumn("jaccard_bp",
        floor(col("inter").cast(DoubleType) * 10000d /
          (col("szsum") - col("inter")).cast(DoubleType)).cast(LongType))
      .filter(col("jaccard_bp") >= minBp)
      .select(col("nid").as("__id"))
      .distinct()

    val drops = exactDrop.union(nearDrop).distinct().withColumnRenamed("__id", idCol)
    newDocs.join(drops, Seq(idCol), "left_anti")
  }
}
