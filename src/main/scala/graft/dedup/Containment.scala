package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Prefix-filtered containment joins — the scale path for the asymmetric
  * "short document quoted inside a long one" family, where symmetric
  * Jaccard prefix filtering ([[Jaccard.pairs]]) does not directly apply
  * because the denominator is one side's set, not the union.
  *
  * The filter generalizes: for overlap `inter >= ceil(t * n_c)` where
  * `n_c` is the size of the CONSTRAINED side's set C, any
  * `ceil(t*n_c)`-subset of C must intersect C's prefix of length
  * `n_c - ceil(t*n_c) + 1` under any fixed per-set order (pigeonhole: the
  * suffix has only `ceil(t*n_c) - 1` elements). So joining C's prefix
  * against the OTHER side's full token list finds every qualifying pair —
  * the join input drops from full x full (df^2 per shingle) to
  * full x prefix (df x df_prefix), and ordering prefixes by global shingle
  * rarity (corpus frequency asc, value asc — same order as
  * [[Jaccard.pairs]]) makes the retained prefix tokens precisely the rare
  * ones, collapsing the hot-shingle buckets that drive the quadratic term.
  *
  * Which side is constrained differs per operator:
  *   - [[pairs]] (min-denominator containment): the SMALLER set is the
  *     denominator, so orient each unordered pair by (set size, id) and
  *     probe with the smaller side's prefix.
  *   - [[subsets]] (directional, later-doc denominator): the LATER doc's
  *     set is the denominator regardless of size. Since round 14 the
  *     candidate join still uses the MIN-denominator orientation above —
  *     a superset of the later-denominator qualifiers (see the
  *     in-function proof) — because the sibling collapse runs the join
  *     over set REPRESENTATIVES, whose ids say nothing about their
  *     members' earlier/later order; each direction's threshold applies
  *     during membership expansion instead.
  *
  * Verification is exact in both: candidates re-join the full (df-capped)
  * sets and compute the true intersection with array_intersect, so the
  * output is identical to the direct co-occurrence plan — both are pinned
  * by the same DuckDB oracle.
  */
object Containment {

  /** (exploded full rows with sizes, rarity-ordered prefix rows). Shared
    * candidate-generation scaffolding: explode the capped sets once,
    * repartition on the shingle so the frequency aggregate, the probe join
    * build, and the prefix ranking all reuse one exchange. */
  private def explodedAndPrefix(sets: DataFrame, minBp: Long): (DataFrame, DataFrame) = {
    val exploded = sets
      .select(col("__id"), size(col("__set")).as("__n"), explode(col("__set")).as("__x"))
      .repartition(col("__x"))
    val freq = exploded.groupBy(col("__x")).agg(count(lit(1)).as("__f"))
    val ranked = exploded
      .join(freq, "__x")
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("__id")).orderBy(col("__f"), col("__x"))))
    // prefix length n - ceil(t*n) + 1, exact in integer arithmetic:
    // ceil(minBp*n/10000) = floor((minBp*n + 9999)/10000)
    val prefix = ranked
      .filter(col("__rn") <= col("__n") - floor((col("__n") * minBp + 9999) / 10000) + 1)
      .select(col("__id"), col("__n"), col("__x"))
    (exploded, prefix)
  }

  /** Min-denominator candidate generation shared by [[pairs]] and
    * [[subsets]]: probe = the (size, id)-smaller side of each unordered
    * pair — min(|A|,|B|) is its size, so its prefix is the one the
    * pigeonhole argument covers. Output (id_1, id_2) distinct, id_1 <
    * id_2. */
  private def minSideCandidates(exploded: DataFrame, prefix: DataFrame): DataFrame =
    prefix.as("a")
      .join(exploded.as("b"),
        col("a.__x") === col("b.__x") &&
          (col("a.__n") < col("b.__n") ||
            (col("a.__n") === col("b.__n") && col("a.__id") < col("b.__id"))))
      .select(
        least(col("a.__id"), col("b.__id")).as("id_1"),
        greatest(col("a.__id"), col("b.__id")).as("id_2"))
      .distinct()

  /** All pairs with floor(10000*|A∩B| / min(|A|,|B|)) >= minBp over
    * df-capped 3-gram shingle sets. Output (id_1, id_2, inter, min_n,
    * containment_bp), id_1 < id_2 — same result as the direct
    * co-occurrence containment plan. */
  def pairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minBp: Long,
      native: Boolean = false,
      maxDf: Long = Long.MaxValue,
      collapseSiblings: Boolean = true): DataFrame = {
    require(minBp >= 1 && minBp <= 10000, "minBp in [1, 10000]")
    val capped = Jaccard.cappedSets(df, idCol, textCol, native, maxDf)
    val (sets, membership) =
      if (collapseSiblings) {
        val (r, m) = Jaccard.collapse(capped); (r, Some(m))
      } else (capped, None)
    val (exploded, prefix) = explodedAndPrefix(sets, minBp)
    val cand = minSideCandidates(exploded, prefix)
    // shuffle-hash verification for the same reason as [[Jaccard.pairs]]:
    // never sort probe rows carrying full shingle arrays
    val repPairs = cand
      .join(sets.as("sa").hint("shuffle_hash"), col("id_1") === col("sa.__id"))
      .join(sets.as("sb").hint("shuffle_hash"), col("id_2") === col("sb.__id"))
      .select(
        col("id_1"), col("id_2"),
        size(array_intersect(col("sa.__set"), col("sb.__set"))).cast(LongType).as("inter"),
        least(size(col("sa.__set")), size(col("sb.__set"))).cast(LongType).as("min_n"))
      .withColumn("containment_bp", expr("inter * 10000 div min_n"))
      .filter(col("containment_bp") >= minBp)
      .select("id_1", "id_2", "inter", "min_n", "containment_bp")
    membership match {
      case None => repPairs
      case Some(mem) =>
        // within a group inter = min_n = |set| and containment = 10000 bp
        // by construction ([[Jaccard.expandByMembership]])
        Jaccard.expandByMembership(repPairs, mem,
          payload = Seq("inter", "min_n", "containment_bp"),
          withinPayload = Seq(col("ma.__n").as("inter"),
            col("ma.__n").as("min_n"), lit(10000L).as("containment_bp")))
    }
  }

  /** Directional near-subset pruning: docs whose df-capped shingle set is
    * >= minBp contained in an EARLIER doc, flagged with their best
    * container (highest containment, ties to the smallest id). Output
    * (doc_id, contained_in, inter, cont_bp) — same result as the direct
    * plan behind subset_docs. */
  def subsets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minBp: Long,
      native: Boolean = false,
      maxDf: Long = Long.MaxValue): DataFrame = {
    require(minBp >= 1 && minBp <= 10000, "minBp in [1, 10000]")
    val (sets, membership) =
      Jaccard.collapse(Jaccard.cappedSets(df, idCol, textCol, native, maxDf))
    val (exploded, prefix) = explodedAndPrefix(sets, minBp)
    // Rep-level candidates use the MIN-denominator prefix filter (the
    // [[pairs]] orientation), a superset of the later-denominator
    // qualifiers: inter >= ceil(t*n_later) implies
    // inter >= ceil(t*min(n_1, n_2)) since n_later >= min. The
    // directional probe can't run at rep level — a group's members span
    // arbitrary ids, so either member of a pair may be the later doc.
    val cand = minSideCandidates(exploded, prefix)
    val repCand = cand
      .join(sets.as("sa").hint("shuffle_hash"), col("id_1") === col("sa.__id"))
      .join(sets.as("sb").hint("shuffle_hash"), col("id_2") === col("sb.__id"))
      .select(
        col("id_1"), col("id_2"),
        size(array_intersect(col("sa.__set"), col("sb.__set"))).cast(LongType).as("inter"),
        size(col("sa.__set")).cast(LongType).as("__n1"),
        size(col("sb.__set")).cast(LongType).as("__n2"))
      .filter(col("inter") * 10000 >= least(col("__n1"), col("__n2")) * minBp)
    // Per-direction expansion keeps ONLY the candidate that can win per
    // (doc, container group): all members of a container group tie on
    // cont_bp (identical sets), ties break to the smallest container id,
    // and the group's minimum id IS its rep — so the rep is the sole
    // potential winner whenever it precedes the doc, and emission is
    // O(contained-group members), never members x members. Both
    // directions ride ONE pass over repCand (an explode, then a single
    // membership join) — two direction branches would re-execute the
    // whole candidate+verification chain once each (measured 3x wall on
    // the catalog entry).
    val directed = repCand
      .select(explode(array(
        struct(col("id_1").as("__container"), col("id_2").as("__crep"),
          col("inter"), expr("inter * 10000 div __n2").as("cont_bp")),
        struct(col("id_2").as("__container"), col("id_1").as("__crep"),
          col("inter"), expr("inter * 10000 div __n1").as("cont_bp")))).as("__d"))
      .select(col("__d.__container").as("__container"),
        col("__d.__crep").as("__crep"),
        col("__d.inter").as("inter"), col("__d.cont_bp").as("cont_bp"))
      .filter(col("cont_bp") >= minBp)
    val cross = directed
      .join(membership.as("m"), col("__crep") === col("m.__rep"))
      .filter(col("m.__id") > col("__container"))
      .select(col("m.__id").as("doc_id"), col("__container").as("contained_in"),
        col("inter"), col("cont_bp"))
    // within a group, every non-rep member is 10000-bp contained in the
    // rep (identical sets, rep = smallest id = best possible container
    // from the group)
    val within = membership.filter(col("__id") =!= col("__rep"))
      .select(col("__id").as("doc_id"), col("__rep").as("contained_in"),
        col("__n").as("inter"), lit(10000L).as("cont_bp"))
    cross.unionAll(within)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("cont_bp").desc, col("contained_in").asc)))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("contained_in"), col("inter"), col("cont_bp"))
  }

  /** Direct co-occurrence formulation of [[pairs]] — result-identical,
    * no prefix machinery; the full-x-full join is fine on small corpora
    * and quadratic on hot shingles at scale ([[pairsAuto]] dispatches). */
  def pairsDirect(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minBp: Long,
      native: Boolean = false,
      maxDf: Long = Long.MaxValue): DataFrame = {
    require(minBp >= 1 && minBp <= 10000, "minBp in [1, 10000]")
    val sets = Jaccard.cappedSets(df, idCol, textCol, native, maxDf)
    val exploded = sets
      .select(col("__id"), explode(col("__set")).as("__x"))
      .repartition(col("__x"))
    val sizes = sets.select(col("__id"), size(col("__set")).cast(LongType).as("__n"))
    exploded.as("a")
      .join(exploded.as("b"), col("a.__x") === col("b.__x") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_1"), col("b.__id").as("id_2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("na"), col("id_1") === col("na.__id"))
      .join(sizes.as("nb"), col("id_2") === col("nb.__id"))
      .withColumn("min_n", least(col("na.__n"), col("nb.__n")))
      .withColumn("containment_bp", expr("inter * 10000 div min_n"))
      .filter(col("containment_bp") >= minBp)
      .select("id_1", "id_2", "inter", "min_n", "containment_bp")
  }

  /** Size-dispatched containment pairs: [[pairsDirect]] up to
    * `directMaxDocs` input documents, prefix-filtered [[pairs]] above —
    * the same crossover logic (and default) as [[Jaccard.pairsAuto]]. */
  def pairsAuto(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minBp: Long,
      native: Boolean = false,
      maxDf: Long = Long.MaxValue,
      directMaxDocs: Long = Jaccard.DirectMaxDocs,
      materialize: Boolean = true): DataFrame = {
    // same persist-before-dispatch as Jaccard.pairsAuto (count + pairs
    // must not traverse an expensive lineage twice), with the same
    // materialize-then-unpersist discipline so the corpus-sized cache
    // never outlives the call; `materialize = false` keeps the lazy plan,
    // and a caller-persisted input is reused as-is, never unpersisted
    if (!materialize) {
      if (df.count() <= directMaxDocs)
        pairsDirect(df, idCol, textCol, minBp, native, maxDf)
      else pairs(df, idCol, textCol, minBp, native, maxDf)
    } else if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) {
      val out =
        if (df.count() <= directMaxDocs)
          pairsDirect(df, idCol, textCol, minBp, native, maxDf)
        else pairs(df, idCol, textCol, minBp, native, maxDf)
      out.localCheckpoint()
    } else {
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val out =
          if (cached.count() <= directMaxDocs)
            pairsDirect(cached, idCol, textCol, minBp, native, maxDf)
          else pairs(cached, idCol, textCol, minBp, native, maxDf)
        out.localCheckpoint()
      } finally cached.unpersist(blocking = false)
    }
  }
}
