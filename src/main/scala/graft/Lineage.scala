package graft

import org.apache.spark.sql.DataFrame

/** Shared lineage-truncation seam for query-path intermediates that are
  * consumed by several downstream branches (guide §5: materialize an
  * intermediate to truncate a multiply-consumed plan).
  *
  * Mode is decided by the session, not the call site: when the
  * SparkContext has a checkpoint directory configured (cluster runs —
  * `sc.setCheckpointDir`, as `CorpusPipeline.truncateLineage` does from
  * its `cfg.checkpointDir`), the frame takes a RELIABLE checkpoint there,
  * so losing an executor after truncation cannot strand an
  * unrecomputable lineage; otherwise (local mode, single-JVM services)
  * it takes the cheaper `localCheckpoint`, whose executor-pinned,
  * non-replicated blocks live in the same process that would die anyway.
  *
  * EAGER deliberately (both branches): consumers of the truncated frame
  * run concurrently inside one downstream job, and a lazy checkpoint
  * would let each re-run the full upstream lineage once — the exact
  * repeated-execution shape truncation exists to remove. The cost is
  * that building the caller's plan executes the upstream once at
  * DataFrame-construction time, inside the same run that consumes it —
  * nothing persists across runs.
  *
  * `-Dgraft.truncate=off` is the measurement escape hatch (interleaved
  * A/B of truncated vs raw plans inside one JVM); production default is
  * ON.
  */
object Lineage {
  def truncate(df: DataFrame): DataFrame =
    if (sys.props.get("graft.truncate").contains("off")) df
    else if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
