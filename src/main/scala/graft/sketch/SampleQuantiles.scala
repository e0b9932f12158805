package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Mergeable per-group quantile estimation by deterministic bottom-k
  * sampling — the quantile member of the sketch family (HLL =
  * cardinality, CMS = frequency, KMV = bottom-k distinct): what are a
  * group's value quantiles, answered from a fixed-size uniform sample
  * instead of a per-group sort of the whole corpus.
  *
  * The sample is the k rows with the smallest [[HLL.mix]] hash of the
  * row id — the same deterministic uniform-without-replacement device as
  * the KMV sketch, so it is reproducible on any engine, partitioning, or
  * day (unlike rand()-based sampling), and MERGEABLE: bottom-k of a
  * union is the bottom-k of the per-part bottom-k's, which is exactly
  * what a 1000-executor tree aggregation or a day-over-day incremental
  * refresh needs. Quantiles are then floor-rank order statistics of the
  * sample in EXACT integer arithmetic: position 1 + (n-1)*q/100 (integer
  * division) of the sample sorted by (value, id) — the "lower"
  * interpolation rule, engine-portable, and EXACT whenever the group has
  * at most k rows (the sample is then the whole group).
  *
  * Scale shape: the bottom-k ids are ONE `graft_topk` bounded aggregate
  * on the negated hash (bottom-k under (h ASC, id ASC) is top-k under
  * (-h DESC, id ASC); HLL.mix stays in [0, 2^31) so the negation is
  * exact) — map-side partial aggregation prunes every task to k rows
  * per group BEFORE the exchange, so a crawl domain with 10^9 docs
  * contributes k-entry heap buffers to the shuffle, and nothing ever
  * sorts a group's hash stream. The sampled ROWS (the payload an
  * aggregate can't carry) come back through a shuffle-hash join against
  * the groups x k winner sliver. Everything after that is windows over
  * <= k rows per group plus one broadcast-joined exact count. Standard
  * error of a sample quantile q is sqrt(q(1-q)/k) in rank space — k=64
  * gives ~6 rank points at the median; callers needing tighter bounds
  * raise k, never re-sort.
  */
object SampleQuantiles {

  /** Default sample size per group. */
  val K = 64

  /** Deterministic uniform bottom-k sample per group: input columns of
    * `cols` plus `h` (the sample hash). `idCol` must be unique per row.
    * An input frame that ALREADY carries an `h` column is refused loudly:
    * withColumn would silently replace the caller's data with the internal
    * hash and the trailing select would project `h` twice — a duplicate-
    * named output whose downstream resolution is ambiguous at best
    * (streaming's read-time merge drops its own prior `h` before calling
    * back in for exactly this reason). */
  def bottomK(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      k: Int = K): DataFrame = {
    require(!df.columns.contains("h"),
      "bottomK emits its sample hash as 'h'; rename or drop the input's h column")
    val withH = df.withColumn("h", HLL.mix(col(idCol)))
    val winners = graft.similarity.Similarity
      .bottomKIds(withH, groupCols, idCol, "h", k)
    // shuffle-hash, not sort-merge: the join-back would otherwise
    // re-introduce the very corpus sort the aggregate removed (build
    // side is groups x k ids; per-partition slivers stay tiny)
    withH.join(winners.hint("shuffle_hash"), groupCols :+ idCol)
      .select((df.columns :+ "h").map(col): _*)
  }

  /** Floor-rank order statistics of an already-selected sample (what the
    * batch query and the streaming read-time merge share): one row per
    * group with `n_sample` and one `p{q}` column per requested percent. */
  def quantilesOfSample(
      sample: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      idCol: String,
      percents: Seq[Int] = Seq(10, 25, 50, 75, 90)): DataFrame = {
    val gc = groupCols.map(col)
    val wv = Window.partitionBy(gc: _*).orderBy(col(valueCol), col(idCol))
    val ranked = sample
      .withColumn("__vrk", row_number().over(wv).cast(LongType))
      .withColumn("__ns", count(lit(1)).over(Window.partitionBy(gc: _*)))
    val qCols: Seq[Column] = percents.map { q =>
      // floor-rank position in exact integer arithmetic (div, not fp /)
      val pos = expr(s"1L + (__ns - 1L) * ${q}L div 100L")
      max(when(col("__vrk") === pos, col(valueCol))).as(s"p$q")
    }
    ranked
      .groupBy(gc: _*)
      .agg(max(col("__ns")).as("n_sample"), qCols: _*)
  }

  /** Per-group quantile estimates from the bottom-k sample: one row per
    * group with `n_rows` (exact), `n_sample`, and one `p{q}` column per
    * requested percent, each the floor-rank order statistic of the
    * sample's `valueCol`. */
  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      idCol: String,
      k: Int = K,
      percents: Seq[Int] = Seq(10, 25, 50, 75, 90)): DataFrame = {
    val gc = groupCols.map(col)
    val sample = bottomK(df, groupCols, idCol, k)
    // no broadcast hint: at the advertised scale (groups = crawl domains)
    // the count table is one row per GROUP and can outgrow the driver; the
    // optimizer broadcasts it when small and hash-joins when not — both
    // sides are already group-sized, so the join is cheap either way
    val exact = df.groupBy(gc: _*).agg(count(lit(1)).as("n_rows"))
    quantilesOfSample(sample, groupCols, valueCol, idCol, percents)
      .join(exact, groupCols)
      .select(gc ++ (Seq("n_rows", "n_sample") ++ percents.map(q => s"p$q")).map(col): _*)
  }
}
