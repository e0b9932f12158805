package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space outlier detection — the curation pass that catches
  * mislabeled, off-topic, or garbage documents whose embedding sits far
  * from its group's center (per-source, per-cluster, or per-language):
  * compute each group's centroid, score every member by squared L2
  * distance to it, flag the farthest `topK` per group.
  *
  * Scale shape: vectors never collect anywhere — the centroid is computed
  * in the dimension-exploded layout ((group, dim) partial sums, one hash
  * exchange over rows x dim, the layout every distributed vector
  * aggregate reduces to), and the resulting centroid table is tiny
  * (groups x dim) so the distance pass re-joins it BROADCAST against the
  * exploded vectors: one narrow explode, a map-side join, one hash
  * aggregate back to vector granularity, one per-group rank window. All
  * arithmetic is exact integers on the quantized grid (the library-wide
  * q = round(x * 1000) convention), and the centroid mean uses integer
  * division truncating toward zero — identical in Spark `div` and ANSI
  * `//` — so distances are bit-equal on any engine. */
object Outliers {

  /** Per-vector distance report: (idCol, groupCol, dist, is_outlier) with
    * is_outlier = the vector ranks in its group's `topK` farthest from
    * the group centroid (ties broken by id for determinism). The group
    * column passes through with its own type — string sources/languages
    * group as themselves (an earlier revision cast to long, which would
    * have collapsed every non-numeric group into one null group). */
  def byCentroid(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      groupCol: String,
      topK: Int = 3): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val dims = emb
      .select(col(idCol).as("__id"), col(groupCol).as("__g"),
        call_function("graft_quantize", col(vecCol)).as("__q"))
      .select(col("__id"), col("__g"),
        posexplode(col("__q")).as(Seq("__dim", "__qv")))
    val cent = dims.groupBy(col("__g"), col("__dim"))
      .agg(expr("sum(__qv) div count(1)").as("__cv"))
    val dist = dims
      .join(broadcast(cent), Seq("__g", "__dim"))
      .groupBy(col("__id"), col("__g"))
      .agg(sum((col("__qv") - col("__cv")) * (col("__qv") - col("__cv")))
        .as("dist"))
    // the outlier set is a per-group top-K selection: pick it with the
    // graft_topk bounded aggregate (a plain per-group window would hold
    // an ENTIRE group — a whole source or language, a large corpus
    // fraction — in one task's sort; the aggregate holds O(topK) state
    // per group), then flag the full report by joining the
    // groups x topK winner sliver back.
    val winners = Similarity
      .topKPerQuery(dist, "dist", topK, queryCol = "__g", idCol = "__id")
      .select(col("__g"), col("__id"), lit(true).as("__out"))
    dist
      .join(winners, Seq("__g", "__id"), "left")
      .select(col("__id").as(idCol), col("__g").as(groupCol), col("dist"),
        coalesce(col("__out"), lit(false)).as("is_outlier"))
  }
}
