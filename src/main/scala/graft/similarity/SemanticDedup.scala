package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** SemDeDup-style semantic deduplication over an embedding column: cluster
  * the corpus with the deterministic IVF coarse quantizer, then inside each
  * cluster drop every vector that has a higher-similarity twin with a
  * smaller id. Near-duplicate pairs that land in different clusters are
  * (by design) not compared — that is the SemDeDup approximation, and it is
  * what bounds the cost: the quadratic term is per-cluster, never corpus-
  * wide.
  *
  * Scale: the corpus shuffles once on cluster id (the IVF build); the
  * within-cluster self-join is quadratic only in cluster size, so `nlist`
  * grows with the corpus (clusters of ~10⁴ vectors keep the join tractable
  * at any total scale). Scoring is the exact integer dot on quantized
  * vectors via the codegen'd graft_qdot kernel — deterministic across
  * engines, so the keep/drop verdicts are hash-pinnable.
  */
object SemanticDedup {

  /** Per-vector verdict: (idCol, list, keep). `keep=false` iff some same-
    * cluster vector with a smaller id scores ≥ `minDot` against it (the
    * smallest id of each semantic group survives). Requires a
    * GraftExtensions session (native kernels). */
  def prune(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      minDot: Long): DataFrame = {
    val assigned = IVF.build(emb, idCol, vecCol, nlist).assigned
    val dup = assigned.as("x")
      .join(assigned.as("y"),
        col("x.__list") === col("y.__list") && col("x.__id") > col("y.__id"))
      .filter(call_function("graft_qdot", col("x.__v"), col("y.__v")) >= minDot)
      .select(col("x.__id").as("__id"))
      .distinct()
    assigned
      .join(dup.withColumn("__dup", lit(true)), Seq("__id"), "left")
      .select(
        col("__id").as(idCol),
        col("__list").cast(LongType).as("list"),
        col("__dup").isNull.as("keep"))
  }
}
