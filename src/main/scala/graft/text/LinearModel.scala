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
    * Documents whose tokens all miss the weights table score 0.
    * PRECONDITION shared with [[train]]: feed single-space-token-model
    * text (the pipeline's clean_text). Raw text with doubled/leading
    * whitespace contributes empty tokens that hash to feature 0 — the
    * DuckDB twin replays the identical behavior (string_split keeps
    * empties), so the engines agree, but a scoring corpus whose
    * whitespace hygiene differs from the training corpus would shift
    * logits through that phantom feature. */
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

  /** Batch-perceptron training for the hashed linear model — the missing
    * half of the learned-filter loop ([[score]] infers; this produces the
    * weights it consumes). Pure integer arithmetic, so training is
    * deterministic on any partitioning and the DuckDB oracle replays the
    * gradient folds bit for bit (the quality_train catalog entry).
    *
    * Algorithm: `iters` synchronous rounds of the batch perceptron over
    * the hashed feature counts. Round t scores every doc against w_t
    * (pred = [logit >= 0]), and w_{t+1,f} = w_{t,f} +
    * sum_docs((y_d - pred_d) * count_{d,f}) — all integers, no learning
    * rate to tune, errors of +1/-1 per doc. This is the integer-exact
    * member of the logistic-regression family (the sigmoid is the only
    * float in LR, and it only gates the step size).
    *
    * Scale shape: the per-doc feature counts are built ONCE (one explode
    * + one map-side-combinable aggregate, persisted across rounds); each
    * round costs one broadcast of the O(buckets) weight table, one
    * per-doc sum, one per-feature gradient aggregate, and an O(buckets)
    * driver collect — the IVF-centroid device. The corpus is never
    * collected, sorted, or re-tokenized.
    *
    * `labelCol` must be 0/1 (castable to long). Output: dense
    * (feature, weight), `buckets` rows. */
  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      buckets: Int,
      iters: Int = 3): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = docs.sparkSession
    import spark.implicits._
    val fc = docs
      .select(col(idCol).as("__id"), explode(Text.tokens(col(textCol))).as("__tok"))
      .select(col("__id"), (Text.wordCode(col("__tok")) % buckets).as("__feature"))
      .groupBy(col("__id"), col("__feature"))
      .agg(count(lit(1)).as("__c"))
      .persist()
    // persisted like fc: the label frame is consumed once per round, and
    // in the catalog it is itself a corpus-scale teacher pipeline
    // (qualityTrain's ensemble join) that must not re-run per iteration
    val lab = docs.select(col(idCol).as("__id"), col(labelCol).cast(LongType).as("__y"))
      .persist()
    try {
      val w = Array.fill(buckets)(0L)
      for (_ <- 1 to iters) {
        val wDf = broadcast(w.toSeq.zipWithIndex
          .map { case (wt, f) => (f.toLong, wt) }.toDF("__feature", "__w"))
        val logit = fc.join(wDf, Seq("__feature"))
          .groupBy(col("__id"))
          .agg(sum(col("__c") * col("__w")).as("__logit"))
        // docs with zero features have no logit row: left join + coalesce
        // scores them 0 (pred 1), same as score()'s empty-sum convention
        val err = lab.join(logit, Seq("__id"), "left")
          .select(col("__id"),
            (col("__y") - when(coalesce(col("__logit"), lit(0L)) >= 0, 1L)
              .otherwise(0L)).as("__err"))
          .filter(col("__err") =!= 0L)
        val grad = fc.join(err, Seq("__id"))
          .groupBy(col("__feature"))
          .agg(sum(col("__err") * col("__c")).as("__g"))
          .collect()
        grad.foreach(r => w(r.getLong(0).toInt) += r.getLong(1))
      }
      w.toSeq.zipWithIndex.map { case (wt, f) => (f.toLong, wt) }
        .toDF("feature", "weight")
    } finally { fc.unpersist(); lab.unpersist() }
  }

  /** Persist a trained weights table — O(buckets) rows, one file. */
  def saveWeights(weights: DataFrame, path: String): Unit =
    weights.select(col("feature"), col("weight"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Reload persisted weights for [[score]] — a pure parquet scan. */
  def loadWeights(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

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
