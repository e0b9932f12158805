package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-global exact span deduplication (the C4-style "remove repeated
  * spans" pass): documents are cut into fixed-width non-overlapping token
  * chunks, every chunk occurrence after the corpus-wide first one is
  * dropped, and each document is re-assembled from its surviving chunks in
  * original order. Catches boilerplate and quoted passages that whole-doc
  * dedup misses, without the quadratic cost of substring comparison.
  *
  * First occurrence is defined by (doc id, chunk index) order, so the
  * result is deterministic on any partitioning. Physical shape: one
  * explode (narrow), one hash exchange on the chunk text for the
  * keep-first window, one exchange back on doc id for re-assembly —
  * shuffle linear in corpus token count, nothing driver-side. At 100 TB
  * the chunk window's sort key is the chunk text already being shuffled,
  * so there is no extra wide state; a hot identical chunk (classic
  * boilerplate) concentrates its occurrences on one partition, which is
  * exactly the row set the window must see together.
  */
object ChunkDedup {

  /** Per-document dedup summary: (idCol, n_chunks, n_kept, dedup_text).
    * `dedup_text` is the space-joined surviving chunks (empty string when
    * every chunk of the document was seen earlier in the corpus). */
  def dedupChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 32): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    val chunks = docs
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__tk"))
      .select(col("__id"), posexplode(expr(
        s"""transform(sequence(0, (size(__tk) - 1) div $chunkTokens),
           | i -> array_join(slice(__tk, i * $chunkTokens + 1, $chunkTokens), ' '))"""
          .stripMargin)).as(Seq("chunk_idx", "chunk")))
    val w = Window.partitionBy(col("chunk")).orderBy(col("__id"), col("chunk_idx"))
    chunks
      .withColumn("keep", row_number().over(w) === 1)
      .groupBy(col("__id").as(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          expr("transform(array_sort(filter(collect_list(struct(chunk_idx, chunk, keep)), " +
            "x -> x.keep)), x -> x.chunk)"),
          " ").as("dedup_text"))
  }
}
