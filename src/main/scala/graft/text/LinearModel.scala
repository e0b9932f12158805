package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Hashed bag-of-words linear classifier inference — the fastText-shaped
  * quality/toxicity/language filter every production curation pipeline
  * runs over its full corpus: tokens hash into a fixed feature space,
  * each feature id carries a trained integer weight, and a document's
  * logit is the sum of its token weights. The heuristic packs
  * ([[Text]] ratios, `quality_ensemble`) are hand-written rules; this is
  * the complementary LEARNED filter whose weights arrive from offline
  * training.
  *
  * Scale shape: a hashed model is small by construction (`buckets`
  * rows — KBs to MBs even at fastText's 2M default), so the weight
  * lookup is a broadcast hash join against the exploded token stream:
  * one narrow explode, a map-side join, one hash aggregate back to doc
  * granularity. No shuffle of the corpus beyond the per-doc sum, no
  * driver-side weight vector, and adding n-gram features only widens the
  * explode. Weights stay integers (fixed-point, the way quantized
  * fastText exports them) so scores are exact on any engine.
  */
object LinearModel {

  /** Score documents against a weights model. `weights(featureCol,
    * weightCol)` maps feature id -> integer weight and is broadcast.
    * Tokens map to feature ids by word code mod `buckets` (the hashing
    * trick; collisions are part of the model, exactly as in training).
    * Output: (idCol, n_tokens, logit, keep) with keep = logit >= 0.
    * Documents whose tokens all miss the weights table score 0. */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      featureCol: String,
      weightCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val feats = docs
      .select(col(idCol).as("__id"), explode(Text.tokens(col(textCol))).as("__tok"))
      .select(col("__id"), (Text.wordCode(col("__tok")) % buckets).as("__feature"))
    val w = broadcast(weights.select(
      col(featureCol).cast(LongType).as("__feature"),
      col(weightCol).cast(LongType).as("__weight")))
    feats
      .join(w, Seq("__feature"), "left")
      .groupBy(col("__id").as(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__weight"), lit(0L))).as("logit"))
      .withColumn("keep", col("logit") >= 0)
  }

  /** A deterministic stand-in weights table for the catalog/oracle path:
    * weight(f) = (f * TokenHashA mod P) mod 17 - 8, an integer in
    * [-8, 8]. A real deployment loads trained weights from parquet; the
    * plumbing (broadcast join, hashed features, integer sums) is
    * identical. */
  def hashWeights(docs: DataFrame, buckets: Int): DataFrame = {
    import Hashing.{P, TokenHashA}
    docs.sparkSession.range(buckets).select(
      col("id").as("feature"),
      (col("id") * TokenHashA % P % 17 - 8).as("weight"))
  }
}
