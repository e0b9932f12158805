package graft

import scala.util.chaining._

import graft.text.{Hashing, Text}

/** DuckDB oracle SQL twins for every query in [[Queries.all]].
  *
  * Each SQL statement is runnable by DuckDB over views named after the
  * testdata tables and must produce the same column names, compatible types,
  * and the same row order as the Spark query. The heavier hash/similarity
  * oracles are generated from the exact integer constants in
  * [[graft.text.Hashing]] so both engines compute identical 64-bit values.
  */
object Oracles {
  import Hashing._

  // -- shared expression fragments -------------------------------------------

  /** The [[graft.sketch.HLL.mix]] three-round integer hash of doc_id as
    * chained CTEs (x0/x1 -> x with `h`), carrying `carry` columns through —
    * shared by the KMV, sample-quantile, and quantile-error oracles so a
    * single definition cannot desynchronize from the Scala mix. */
  private def mixCtes(carry: String): String =
    s"""x0 AS (SELECT $carry,
       |  (doc_id % $P) * $TokenHashA % $P AS a1 FROM documents),
       |x1 AS (SELECT $carry,
       |  xor(a1, a1 >> 15) % $P * $TokenHashB % $P AS a3 FROM x0),
       |x AS (SELECT $carry,
       |  xor(a3, a3 >> 13) % $P * $TokenHashA % $P AS h FROM x1)""".stripMargin

  /** DuckDB replay of the Public Suffix List algorithm over a CTE
    * `hosts(host)`: the rules table is GENERATED from the same committed
    * resource [[graft.functions.Psl.rules]] parses (rule DATA is shared;
    * the matching logic — longest match, `*.` wildcard one-extra-label,
    * `!` exception prevails, default rule `*` — is re-expressed
    * independently in SQL). Yields a CTE `pslrd(host, public_suffix,
    * reg_domain)` with one row per distinct non-null host. */
  private lazy val pslCtes: String = {
    val r = graft.functions.Psl.rules
    def row(s: String, kind: String) = s"('$s', ${s.count(_ == '.') + 1}, '$kind')"
    val rows = (r.normal.toSeq.sorted.map(row(_, "n")) ++
      r.wildcards.toSeq.sorted.map(row(_, "w")) ++
      r.exceptions.toSeq.sorted.map(row(_, "x"))).mkString(",\n  ")
    s"""psl_rules(sfx, nlab, kind) AS (VALUES
       |  $rows),
       |psl_n AS (SELECT host, string_split(host, '.') AS labs,
       |   len(string_split(host, '.')) AS nlabs
       |  FROM (SELECT DISTINCT host FROM hosts WHERE host IS NOT NULL)),
       |psl_m AS (SELECT h.host,
       |   CASE r.kind WHEN 'x' THEN r.nlab - 1
       |     WHEN 'w' THEN r.nlab + 1 ELSE r.nlab END AS eff, r.kind
       |  FROM psl_n h JOIN psl_rules r
       |    ON (r.kind = 'w' AND right(h.host, len(r.sfx) + 1) = '.' || r.sfx)
       |    OR (r.kind <> 'w' AND (h.host = r.sfx
       |        OR right(h.host, len(r.sfx) + 1) = '.' || r.sfx))),
       |psl_p AS (SELECT h.host,
       |   COALESCE(MAX(CASE WHEN m.kind = 'x' THEN m.eff END),
       |            MAX(CASE WHEN m.kind <> 'x' THEN m.eff END), 1) AS psn
       |  FROM psl_n h LEFT JOIN psl_m m USING (host) GROUP BY h.host),
       |pslrd AS (SELECT n.host,
       |   array_to_string(n.labs[n.nlabs - p.psn + 1 : n.nlabs], '.') AS public_suffix,
       |   CASE WHEN n.nlabs > p.psn
       |     THEN array_to_string(n.labs[n.nlabs - p.psn : n.nlabs], '.') END AS reg_domain
       |  FROM psl_n n JOIN psl_p p USING (host))""".stripMargin
  }

  /** Whitespace tokens of a text expression. */
  private def tokensOf(c: String) = s"string_split($c, ' ')"
  private val tokensE = tokensOf("text")

  /** BPE train-then-encode over the corpus vocabulary, rounds unrolled
    * with the same chr(1)/chr(2) marker-bracket device as the
    * bpe_train_merges oracle, but CARRYING the word through so the final
    * CTE `bsyms(w, syms)` maps every vocabulary word to its encoded
    * symbol sequence (and `beb1..3` expose the learned merges). */
  private val bpeEncCtes: String = {
    def round(i: Int) =
      s"""bey$i AS (SELECT freq,
         |  string_split(rtrim(ltrim(enc, chr(1)), chr(2)), chr(2) || chr(1)) AS syms
         | FROM be$i),
         |bep$i AS (SELECT syms[t.j] AS lhs, syms[t.j + 1] AS rhs, freq
         | FROM bey$i, UNNEST(range(1, len(syms))) AS t(j)),
         |beb$i AS (SELECT lhs, rhs, CAST(SUM(freq) AS BIGINT) AS cnt
         | FROM bep$i GROUP BY 1, 2 ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1),
         |be${i + 1} AS (SELECT w, freq,
         |  replace(enc, chr(1) || b.lhs || chr(2) || chr(1) || b.rhs || chr(2),
         |    chr(1) || b.lhs || b.rhs || chr(2)) AS enc
         | FROM be$i CROSS JOIN beb$i b)""".stripMargin
    s"""bt AS (SELECT doc_id, w FROM
       |  (SELECT doc_id, unnest($tokensE) AS w FROM documents) WHERE w <> ''),
       |bvocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM bt GROUP BY 1),
       |be1 AS (SELECT w, freq,
       |  regexp_replace(w, '(.)', chr(1) || '\\1' || chr(2), 'g') AS enc FROM bvocab),
       |${round(1)},
       |${round(2)},
       |${round(3)},
       |bsyms AS (SELECT w,
       |  string_split(rtrim(ltrim(enc, chr(1)), chr(2)), chr(2) || chr(1)) AS syms
       | FROM be4)""".stripMargin
  }

  /** Per-doc BPE token counts off [[bpeEncCtes]]'s `bsyms`. LEFT JOIN from
    * documents so an all-whitespace/empty doc (whose words are all
    * filtered by bt's empty-token guard) still emits n_tokens = 0 —
    * matching BPE.tokenCounts' docs-left-join semantics instead of
    * silently dropping the doc from the packing/budget row set. */
  private val bpeCountCte: String =
    """bcnt AS (SELECT d.doc_id,
      |  CAST(coalesce(SUM(len(s.syms)), 0) AS BIGINT) AS n_tokens
      | FROM documents d LEFT JOIN bt ON bt.doc_id = d.doc_id
      | LEFT JOIN bsyms s ON s.w = bt.w GROUP BY d.doc_id)""".stripMargin

  /** One greedy minimal-bits segmentation pass of the unigram-LM chain
    * ([[graft.text.Unigram]]): a recursive CTE advancing a cursor
    * through every vocabulary word, picking at each position the piece
    * from `costs` that minimizes scaled bits-per-character
    * (cost * 12/len, exact since 12 = lcm(1..4)), longest piece on
    * ties — the LATERAL arg-min mirrors the engine's array_min struct
    * comparison. Every character is in the piece table (the alphabet is
    * permanent), so the cursor always advances. */
  private def unigramSegCte(name: String, costs: String): String =
    s"""$name AS (
       |  SELECT w, freq, CAST(0 AS BIGINT) AS pos,
       |    CAST(NULL AS VARCHAR) AS piece, CAST(0 AS BIGINT) AS cost
       |  FROM uvocab
       |  UNION ALL
       |  SELECT r.w, r.freq, r.pos + length(b.piece), b.piece, b.cost_bits
       |  FROM $name r, LATERAL (
       |    SELECT c.piece, c.cost_bits FROM $costs c
       |    WHERE c.piece = substring(r.w, CAST(r.pos + 1 AS INT), length(c.piece))
       |    ORDER BY c.cost_bits * (12 // length(c.piece)) ASC,
       |      length(c.piece) DESC
       |    LIMIT 1) b
       |  WHERE r.pos < length(r.w))""".stripMargin

  /** The full unigram-LM training replay: seed costs (every character
    * plus the top-48 multi-char substrings, integer bit costs
    * bitlen(total) - bitlen(count)), then 2 hard-EM rounds of
    * segment -> usage-recount -> re-cost. Multi-char pieces that go
    * unused in a round drop out; the single-char alphabet is permanent
    * (count 0 keeps a row). Ends at `ucost2`, the final piece table. */
  private val unigramCtes: String = {
    def emRound(i: Int): String =
      s"""${unigramSegCte(s"useg$i", s"ucost${i - 1}")},
         |uuse$i AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
         | FROM useg$i WHERE piece IS NOT NULL GROUP BY 1),
         |utab$i AS (
         | SELECT a.piece, CAST(coalesce(u.cnt, 0) AS BIGINT) AS cnt
         |  FROM ualpha a LEFT JOIN uuse$i u USING (piece)
         | UNION ALL
         | SELECT piece, cnt FROM uuse$i WHERE length(piece) > 1),
         |ucost$i AS (SELECT piece, cnt,
         |  CAST(length(bin(tt.total)) - length(bin(cnt)) AS BIGINT) AS cost_bits
         | FROM utab$i, (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM utab$i) tt)"""
        .stripMargin
    s"""utok AS (SELECT w FROM
       |  (SELECT unnest($tokensE) AS w FROM documents) WHERE w <> ''),
       |uvocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM utok GROUP BY 1),
       |usub AS (SELECT t.p AS p, freq FROM uvocab, UNNEST(flatten([
       |  list_transform(range(1, length(w) + 1), i -> substring(w, CAST(i AS INT), 1)),
       |  list_transform(range(1, length(w)), i -> substring(w, CAST(i AS INT), 2)),
       |  list_transform(range(1, length(w) - 1), i -> substring(w, CAST(i AS INT), 3)),
       |  list_transform(range(1, length(w) - 2), i -> substring(w, CAST(i AS INT), 4))
       |  ])) AS t(p)),
       |useed AS (SELECT p, CAST(SUM(freq) AS BIGINT) AS cnt FROM usub GROUP BY 1),
       |ualpha AS (SELECT p AS piece FROM useed WHERE length(p) = 1),
       |utab0 AS (
       | SELECT p AS piece, cnt FROM useed WHERE length(p) = 1
       | UNION ALL
       | (SELECT p, cnt FROM useed WHERE length(p) > 1
       |  ORDER BY cnt DESC, p ASC LIMIT 48)),
       |ucost0 AS (SELECT piece, cnt,
       |  CAST(length(bin(tt.total)) - length(bin(cnt)) AS BIGINT) AS cost_bits
       | FROM utab0, (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM utab0) tt),
       |${emRound(1)},
       |${emRound(2)}""".stripMargin
  }

  /** Integer word codes: length(w)*WordBase + ascii(first char). */
  private def codesOf(c: String) =
    s"list_transform(${tokensOf(c)}, w -> length(w)*$WordBase + ascii(w))"
  private val codesE = codesOf("text")

  /** The cleanup chain (stripHtml -> stripUrls -> normalizeWs) in SQL. */
  private def cleanOf(c: String) =
    s"trim(regexp_replace(regexp_replace(regexp_replace($c, " +
      "'<[^>]*>', '', 'g'), 'https?://[^ ]+', '', 'g'), '[ \\t\\n\\r\\f\\x0b]+', ' ', 'g'))"

  /** 3-word shingle hashes over a `codes` list column. */
  private val shinglesE =
    s"list_transform(range(1, len(codes)-1), i -> " +
      s"(codes[i]*$ShingleS1 + codes[i+1]*$ShingleS2 + codes[i+2]) % $ShingleM)"

  /** j-th minhash over a `sh` shingle-list column. */
  private def minhashE(j: Int): String =
    s"coalesce(list_min(list_transform(sh, x -> ((x % $P) * ${A(j)} + ${B(j)}) % $P)), ${P - 1})"

  /** CTE chain documents -> codes -> shingles -> 16 minhash columns. */
  private val minhashCtes: String = {
    val ms = (0 until K).map(j => s"${minhashE(j)} AS m$j").mkString(", ")
    s"WITH c AS (SELECT doc_id, $codesE AS codes FROM documents), " +
      s"s AS (SELECT doc_id, $shinglesE AS sh FROM c), " +
      s"m AS (SELECT doc_id, $ms FROM s)"
  }

  private def bandE(b: Int): String =
    s"concat_ws('_', " + (b * RowsPerBand until (b + 1) * RowsPerBand)
      .map(j => s"m$j").mkString(", ") + ")"

  /** Quantized embedding vector. */
  private val quantE =
    s"list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $QuantScale) AS BIGINT))"

  /** Exact integer dot product of two BIGINT list columns. */
  private def dotE(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a)+1), i -> $a[i]*$b[i])) AS BIGINT)"

  /** SRP bucket id from the deterministic +-1 hyperplane matrix. */
  private val srpBucketE: String =
    SrpMatrix.zipWithIndex.map { case (plane, p) =>
      val lits = plane.mkString("[", ",", "]") + "::BIGINT[]"
      s"(CASE WHEN ${dotE("v", s"($lits)")} > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** Shared by containment_pairs (direct co-occurrence plan) and
    * containment_ppjoin (prefix-filtered plan) — same declared semantics:
    * asymmetric containment |A∩B| / min(|A|,|B|) over the df-capped sets. */
  private lazy val containmentSql =
    s"""WITH c AS (SELECT doc_id, $codesE AS codes FROM documents),
       |sets AS (SELECT doc_id, list_distinct($shinglesE) AS sh FROM c),
       |ex0 AS (SELECT doc_id, unnest(sh) AS x FROM sets),
       |ex AS (SELECT doc_id, x FROM (
       | SELECT doc_id, x, count(*) OVER (PARTITION BY x) AS df FROM ex0)
       | WHERE df <= ${Queries.NgramMaxDf}),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ex GROUP BY doc_id),
       |pairs AS (
       | SELECT a.doc_id AS id_1, b.doc_id AS id_2, CAST(COUNT(*) AS BIGINT) AS inter
       | FROM ex a JOIN ex b ON a.x = b.x AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT id_1, id_2, inter,
       | least(na.n, nb.n) AS min_n,
       | CAST(inter * 10000 // least(na.n, nb.n) AS BIGINT) AS containment_bp
       |FROM pairs JOIN sizes na ON id_1 = na.doc_id JOIN sizes nb ON id_2 = nb.doc_id
       |WHERE CAST(inter * 10000 // least(na.n, nb.n) AS BIGINT) >= 9000
       |ORDER BY id_1, id_2""".stripMargin

  /** Shared by subset_docs (direct plan) and subset_ppjoin (prefix-filtered
    * plan): directional containment, the later doc's set as denominator,
    * best containing earlier doc per flagged doc. */
  private lazy val subsetSql =
    s"""WITH c AS (SELECT doc_id, $codesE AS codes FROM documents),
       |sets AS (SELECT doc_id, list_distinct($shinglesE) AS sh FROM c),
       |ex0 AS (SELECT doc_id, unnest(sh) AS x FROM sets),
       |ex AS (SELECT doc_id, x FROM (
       | SELECT doc_id, x, count(*) OVER (PARTITION BY x) AS df FROM ex0)
       | WHERE df <= ${Queries.NgramMaxDf}),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ex GROUP BY doc_id),
       |pairs AS (
       | SELECT a.doc_id AS id_1, b.doc_id AS id_2, CAST(COUNT(*) AS BIGINT) AS inter
       | FROM ex a JOIN ex b ON a.x = b.x AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |scored AS (SELECT id_1, id_2, inter,
       |  CAST(inter * 10000 // nb.n AS BIGINT) AS cont_bp
       | FROM pairs JOIN sizes nb ON id_2 = nb.doc_id),
       |best AS (SELECT id_1, id_2, inter, cont_bp,
       |  row_number() OVER (PARTITION BY id_2
       |   ORDER BY cont_bp DESC, id_1 ASC) AS rn
       | FROM scored WHERE cont_bp >= 9000)
       |SELECT id_2 AS doc_id, id_1 AS contained_in, inter, cont_bp
       |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** Shared by ngram_jaccard_pairs (direct co-occurrence plan) and
    * jaccard_ppjoin (prefix-filtered plan) — same declared semantics:
    * exact Jaccard over the df-capped shingle sets. */
  private val ngramJaccardSql =
    s"""WITH c AS (SELECT doc_id, $codesE AS codes FROM documents),
       |sets AS (SELECT doc_id, list_distinct($shinglesE) AS sh FROM c),
       |ex0 AS (SELECT doc_id, unnest(sh) AS x FROM sets),
       |ex AS (SELECT doc_id, x FROM (
       | SELECT doc_id, x, count(*) OVER (PARTITION BY x) AS df FROM ex0)
       | WHERE df <= ${Queries.NgramMaxDf}),
       |sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
       |pairs AS (
       | SELECT a.doc_id AS id_1, b.doc_id AS id_2, COUNT(*) AS inter
       | FROM ex a JOIN ex b ON a.x = b.x AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT id_1, id_2,
       | CAST(floor(inter * 10000.0 / (na.n + nb.n - inter)) AS BIGINT) AS jaccard_bp
       |FROM pairs JOIN sizes na ON id_1 = na.doc_id JOIN sizes nb ON id_2 = nb.doc_id
       |WHERE CAST(floor(inter * 10000.0 / (na.n + nb.n - inter)) AS BIGINT) >= 8000
       |ORDER BY id_1, id_2""".stripMargin

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  private val stopIn = inList(Queries.Stopwords)

  /** Brute-force exact top-k (shared by cosine_topk and ann_recall). */
  private val cosineTopkSql =
    s"""WITH q AS (SELECT vec_id AS query_id, $quantE AS qv FROM embeddings WHERE vec_id < 8),
       |c AS (SELECT vec_id AS neighbor_id, $quantE AS cv FROM embeddings),
       |s AS (SELECT query_id, neighbor_id, ${dotE("qv", "cv")} AS dot
       | FROM c, q WHERE neighbor_id <> query_id),
       |r AS (SELECT query_id, neighbor_id, dot,
       | row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS "rank"
       | FROM s)
       |SELECT query_id, neighbor_id, dot, "rank" FROM r WHERE "rank" <= 10
       |ORDER BY query_id, "rank"""".stripMargin

  /** Shared refined-IVF CTE chain (used by ivf_topk and ann_recall): seed
    * centroids = quantized vectors of the 16 smallest ids; ONE spherical
    * Lloyd refinement — assign to seeds, per-(list, dim) EXACT integer
    * floor mean ((s - pmod(s, n)) / n with an exactly-divisible numerator,
    * so DuckDB's truncating // equals Spark's floor; an emptied list keeps
    * its seed), then each refined centroid rescaled onto the quantized
    * unit sphere with floor((coord * QuantScale) / sqrt(dot(c, c))) — the
    * BIGINT multiply happens before the double divide, the same shape (and
    * therefore bit-identical IEEE result) as IVF.build's driver-side
    * rescale. The final assign + probe run against the refined centroids;
    * `cand` keeps the probe rank `rn` so one chain serves several nprobe
    * settings. */
  /** The index half of the IVF chain (everything through the refined
    * assignment) — shared by ivfCandCtes and the IVF-PQ composition. */
  private def ivfAssignCtes(nlist: Int = 16): String =
    s"""e AS (SELECT vec_id, $quantE AS v FROM embeddings),
       |cent0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $nlist),
       |cseed AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS l, v AS c FROM cent0),
       |a0s AS (SELECT e.vec_id, e.v, cseed.l, ${dotE("e.v", "cseed.c")} AS s
       | FROM e CROSS JOIN cseed),
       |a0 AS (SELECT vec_id, v, l AS list FROM (
       | SELECT vec_id, v, l,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, l ASC) AS rn
       | FROM a0s) WHERE rn = 1),
       |dims AS (SELECT CAST(t.d AS BIGINT) AS d FROM UNNEST(range($Dim)) AS t(d)),
       |m1 AS (SELECT a0.list AS l, dims.d,
       |  CAST(SUM(a0.v[dims.d + 1]) AS BIGINT) AS s, COUNT(*) AS n
       | FROM a0 CROSS JOIN dims GROUP BY 1, 2),
       |craw AS (SELECT cseed.l,
       |  list(COALESCE((m1.s - ((m1.s % m1.n + m1.n) % m1.n)) // m1.n,
       |                cseed.c[dims.d + 1]) ORDER BY dims.d) AS c
       | FROM cseed CROSS JOIN dims
       | LEFT JOIN m1 ON m1.l = cseed.l AND m1.d = dims.d
       | GROUP BY cseed.l),
       |cent AS (SELECT l, CASE WHEN ${dotE("c", "c")} = 0 THEN c
       |  ELSE list_transform(c, x ->
       |   CAST(floor((x * $QuantScale) / sqrt(CAST(${dotE("c", "c")} AS DOUBLE))) AS BIGINT))
       |  END AS c FROM craw),
       |ascore AS (SELECT e.vec_id, e.v, cent.l, ${dotE("e.v", "cent.c")} AS s
       | FROM e CROSS JOIN cent),
       |assign AS (SELECT vec_id, v, l AS list FROM (
       | SELECT vec_id, v, l,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, l ASC) AS rn
       | FROM ascore) WHERE rn = 1)""".stripMargin

  private def ivfCandCtes(probeMax: Int, querySel: String = "vec_id < 8",
      nlist: Int = 16): String =
    s"""${ivfAssignCtes(nlist)},
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE $querySel),
       |qscore AS (SELECT q.query_id, q.qv, cent.l, ${dotE("q.qv", "cent.c")} AS s
       | FROM q CROSS JOIN cent),
       |probe AS (SELECT query_id, qv, list, rn FROM (
       | SELECT query_id, qv, l AS list,
       |  row_number() OVER (PARTITION BY query_id ORDER BY s DESC, l DESC) AS rn
       | FROM qscore) WHERE rn <= $probeMax),
       |cand AS (SELECT p.query_id, p.rn, a.vec_id AS neighbor_id,
       |  ${dotE("p.qv", "a.v")} AS dot
       | FROM probe p JOIN assign a ON p.list = a.list WHERE a.vec_id <> p.query_id)""".stripMargin

  /** Shared product-quantization CTE chain (pq_topk and pq_recall),
    * replaying PQ.train/encode/search exactly: 8 subspaces x 8 dims, 16
    * codewords seeded from the 16 smallest ids' subvectors, ONE Lloyd
    * round with exact integer floor means (emptied codewords keep their
    * seed), nearest-codeword assignment by argmax(2<x,c> - <c,c>) with
    * ties to the lower code, and ADC scores as the sum of 8 per-subspace
    * integer dots. Ends in `pscore(query_id, neighbor_id, adot)`. */
  /** Codebook-train + encode half of the PQ chain, over a source CTE named
    * `pe(vec_id, v)` — shared by pqCtes (raw vectors) and the IVF-PQ
    * composition (residuals). Ends in `pcb(sp, code, cw)` and
    * `penc(vec_id, sp, code)`. */
  private val pqIndexCtes: String = {
    val subL2 = (sv: String, cw: String) => s"2 * ${dotE(sv, cw)} - ${dotE(cw, cw)}"
    s"""psub AS (SELECT pe.vec_id, CAST(u.m AS BIGINT) AS sp,
       |  list_slice(pe.v, u.m * 8 + 1, u.m * 8 + 8) AS sv
       | FROM pe, UNNEST(range(8)) AS u(m)),
       |ps0 AS (SELECT vec_id, v FROM pe ORDER BY vec_id LIMIT 16),
       |pseed AS (SELECT CAST(u.m AS BIGINT) AS sp,
       |  row_number() OVER (PARTITION BY u.m ORDER BY vec_id) - 1 AS code,
       |  list_slice(v, u.m * 8 + 1, u.m * 8 + 8) AS cw
       | FROM ps0, UNNEST(range(8)) AS u(m)),
       |pa0 AS (SELECT vec_id, sp, sv, code FROM (
       | SELECT s.vec_id, s.sp, s.sv, c.code,
       |  row_number() OVER (PARTITION BY s.vec_id, s.sp
       |   ORDER BY ${subL2("s.sv", "c.cw")} DESC, c.code ASC) AS rn
       | FROM psub s JOIN pseed c ON s.sp = c.sp) WHERE rn = 1),
       |pdims AS (SELECT CAST(t.d AS BIGINT) AS d FROM UNNEST(range(8)) AS t(d)),
       |pm1 AS (SELECT pa0.sp, pa0.code, pdims.d,
       |  CAST(SUM(pa0.sv[pdims.d + 1]) AS BIGINT) AS s, COUNT(*) AS n
       | FROM pa0 CROSS JOIN pdims GROUP BY 1, 2, 3),
       |pcb AS (SELECT pseed.sp, pseed.code,
       |  list(COALESCE((pm1.s - ((pm1.s % pm1.n + pm1.n) % pm1.n)) // pm1.n,
       |                pseed.cw[pdims.d + 1]) ORDER BY pdims.d) AS cw
       | FROM pseed CROSS JOIN pdims
       | LEFT JOIN pm1 ON pm1.sp = pseed.sp AND pm1.code = pseed.code
       |  AND pm1.d = pdims.d
       | GROUP BY pseed.sp, pseed.code),
       |penc AS (SELECT vec_id, sp, code FROM (
       | SELECT s.vec_id, s.sp, c.code,
       |  row_number() OVER (PARTITION BY s.vec_id, s.sp
       |   ORDER BY ${subL2("s.sv", "c.cw")} DESC, c.code ASC) AS rn
       | FROM psub s JOIN pcb c ON s.sp = c.sp) WHERE rn = 1)""".stripMargin
  }

  private val pqCtes: String =
    s"""pe AS (SELECT vec_id, $quantE AS v FROM embeddings),
       |$pqIndexCtes,
       |pq AS (SELECT vec_id AS query_id, sp, sv AS qv FROM psub WHERE vec_id < 8),
       |plut AS (SELECT pq.query_id, pq.sp, pcb.code, ${dotE("pq.qv", "pcb.cw")} AS pd
       | FROM pq JOIN pcb ON pq.sp = pcb.sp),
       |pscore AS (SELECT l.query_id, en.vec_id AS neighbor_id,
       |  CAST(SUM(l.pd) AS BIGINT) AS adot
       | FROM penc en JOIN plut l ON l.sp = en.sp AND l.code = en.code
       | WHERE en.vec_id <> l.query_id GROUP BY 1, 2)""".stripMargin

  /** Binary-quantization CTE chain (bq_topk and bq_recall), replaying
    * BQ.encode/search exactly: quantize, pack 32 sign bits per word (bit b
    * of word w set iff element w*32+b+1 > 0 — every packed word a small
    * positive BIGINT, so `1::BIGINT << b` replays the kernel's packing
    * bit for bit), then Hamming distance as the summed popcount of the
    * per-word XOR. Ends in `hs(query_id, neighbor_id, hamming)`. */
  private val bqCtes: String = {
    // the kernel packs ceil(dim/32) words; this replay assumes an exact
    // multiple so the truncating division below matches — fail loudly if
    // Dim ever changes rather than silently dropping the tail dimensions
    require(Dim % 32 == 0,
      s"bqCtes replays 32-bit word packing and requires Dim % 32 == 0, got $Dim")
    val words = Dim / 32
    val hamE = (1 to words)
      .map(i => s"bit_count(xor(c.code[$i], q.qcode[$i]))").mkString(" + ")
    s"""pe AS (SELECT vec_id, $quantE AS v FROM embeddings),
       |bqc AS (SELECT vec_id, list_transform(range($words), w ->
       |  CAST(list_sum(list_transform(range(32), b ->
       |   CASE WHEN v[w * 32 + b + 1] > 0 THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT)) AS code
       | FROM pe),
       |bq AS (SELECT vec_id AS query_id, code AS qcode FROM bqc WHERE vec_id < 8),
       |hs AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |  CAST($hamE AS BIGINT) AS hamming
       | FROM bqc c CROSS JOIN bq q WHERE c.vec_id <> q.query_id)""".stripMargin
  }

  /** IVF-PQ composition, replaying IVFPQ.build/search: coarse assignment
    * from the refined IVF chain, integer residuals v - c_list, PQ
    * codebooks trained/encoded on the residuals, and the MIPS ADC
    * decomposition <q, v> ~= <q, c_list> + ADC(q, codes) — the centroid
    * term exact per probed list, the residual term summed from the
    * per-query LUT of the FULL query vector against the residual
    * codebooks. Shortlist 50 by adot, exact rerank; ends in
    * `iptop(query_id, neighbor_id, dot, rnk)`. */
  private val ivfpqCtes: String =
    s"""${ivfAssignCtes()},
       |rres AS (SELECT a.vec_id,
       |  list_transform(range(1, $Dim + 1), i -> a.v[i] - c.c[i]) AS r
       | FROM assign a JOIN cent c ON c.l = a.list),
       |pe AS (SELECT vec_id, r AS v FROM rres),
       |$pqIndexCtes,
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
       |qscore AS (SELECT q.query_id, cent.l, ${dotE("q.qv", "cent.c")} AS s
       | FROM q CROSS JOIN cent),
       |probe AS (SELECT query_id, list, centdot FROM (
       | SELECT query_id, l AS list, s AS centdot,
       |  row_number() OVER (PARTITION BY query_id ORDER BY s DESC, l DESC) AS rn
       | FROM qscore) WHERE rn <= 4),
       |qsub AS (SELECT q.query_id, CAST(u.m AS BIGINT) AS sp,
       |  list_slice(q.qv, u.m * 8 + 1, u.m * 8 + 8) AS sv
       | FROM q, UNNEST(range(8)) AS u(m)),
       |qlut AS (SELECT qs.query_id, qs.sp, pcb.code, ${dotE("qs.sv", "pcb.cw")} AS pd
       | FROM qsub qs JOIN pcb ON qs.sp = pcb.sp),
       |ipadc AS (SELECT p.query_id, a.vec_id AS neighbor_id,
       |  MIN(p.centdot) + CAST(SUM(l.pd) AS BIGINT) AS adot
       | FROM assign a
       | JOIN probe p ON p.list = a.list AND a.vec_id <> p.query_id
       | JOIN penc en ON en.vec_id = a.vec_id
       | JOIN qlut l ON l.query_id = p.query_id AND l.sp = en.sp AND l.code = en.code
       | GROUP BY 1, 2),
       |ipshort AS (SELECT query_id, neighbor_id FROM (
       | SELECT query_id, neighbor_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY adot DESC, neighbor_id ASC) AS rk
       | FROM ipadc) WHERE rk <= 50),
       |iprer AS (SELECT sh.query_id, sh.neighbor_id, ${dotE("q.qv", "e.v")} AS dot
       | FROM ipshort sh JOIN q ON q.query_id = sh.query_id
       | JOIN e ON e.vec_id = sh.neighbor_id),
       |iptop AS (SELECT query_id, neighbor_id, dot,
       | row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS rnk
       | FROM iprer)""".stripMargin

  /** Deterministic IVF ANN top-k at nprobe 4 (the ivf_topk catalog entry). */
  private val ivfTopkSql =
    s"""WITH ${ivfCandCtes(4)},
       |r AS (SELECT query_id, neighbor_id, dot,
       | row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS "rank"
       | FROM cand)
       |SELECT query_id, neighbor_id, dot, "rank" FROM r WHERE "rank" <= 10
       |ORDER BY query_id, "rank"""".stripMargin

  /** Banded-LSH near-duplicate pairs at >= 0.5 Jaccard (shared by
    * minhash_neardup and neardup_by_source). */
  private val minhashNearDupSql: String = {
    // band legs exclude empty-shingle (sub-3-token) docs, mirroring
    // MinHash.candidatePairs' sentinel-signature guard
    val bandSelects = (0 until Bands).map { b =>
      s"SELECT doc_id, $b AS bi, ${bandE(b)} AS k FROM mf"
    }.mkString(" UNION ALL ")
    s"""$minhashCtes, mf AS (SELECT m.* FROM m JOIN s USING (doc_id) WHERE len(s.sh) > 0), bands AS ($bandSelects),
       |cand AS (
       | SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
       | FROM bands a JOIN bands b ON a.bi = b.bi AND a.k = b.k AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct(sh) AS st FROM s),
       |scored AS (
       | SELECT id_1, id_2,
       |  len(list_intersect(sa.st, sb.st)) AS inter,
       |  len(sa.st) + len(sb.st) AS szsum
       | FROM cand JOIN sets sa ON id_1 = sa.doc_id JOIN sets sb ON id_2 = sb.doc_id)
       |SELECT id_1, id_2,
       | CAST(floor(inter * 10000.0 / (szsum - inter)) AS BIGINT) AS jaccard_bp
       |FROM scored
       |WHERE CAST(floor(inter * 10000.0 / (szsum - inter)) AS BIGINT) >= 5000
       |ORDER BY id_1, id_2""".stripMargin
  }

  /** Heuristic quality-ensemble scoring CTE chain (quality_ensemble and
    * cluster_best); ends in `qscored(doc_id, n_tokens, stop_ratio_bp,
    * top_token_bp, mean_token_len_bp, score)`. */
  private lazy val qualityCtes: String =
    s"""qe AS (SELECT doc_id, unnest($tokensE) AS w FROM documents),
       |qcc AS (SELECT doc_id, w, COUNT(*) AS c FROM qe GROUP BY 1, 2),
       |qrep AS (SELECT doc_id,
       |  CAST(floor(MAX(c) * 10000.0 / CAST(SUM(c) AS BIGINT)) AS BIGINT) AS top_token_bp
       | FROM qcc GROUP BY 1),
       |qbase AS (SELECT doc_id,
       |  CAST(len($tokensE) AS BIGINT) AS n_tokens,
       |  CAST(floor(len(list_filter($tokensE, w -> w IN $stopIn)) * 10000.0
       |    / len($tokensE)) AS BIGINT) AS stop_ratio_bp,
       |  CAST(floor(CAST(coalesce(list_sum(list_transform($tokensE, w -> length(w))), 0)
       |    AS BIGINT) * 10000.0 / len($tokensE)) AS BIGINT) AS mean_token_len_bp
       | FROM documents),
       |qscored AS (SELECT b.doc_id, n_tokens, stop_ratio_bp, top_token_bp,
       |  mean_token_len_bp,
       |  CAST(least(n_tokens, 100) * 10
       |   + CASE WHEN stop_ratio_bp BETWEEN 100 AND 4000 THEN 1000 ELSE 0 END
       |   + CASE WHEN top_token_bp < 2000 THEN 1000 ELSE 0 END
       |   + CASE WHEN mean_token_len_bp BETWEEN 30000 AND 120000 THEN 1000 ELSE 0 END
       |   AS BIGINT) AS score
       | FROM qbase b JOIN qrep USING (doc_id))""".stripMargin

  /** Batch-perceptron training chain (quality_train and
    * quality_train_infer), replaying LinearModel.train exactly: feature
    * counts per (doc, 1024-bucket hashed word code), labels = quality
    * ensemble score >= 3500, three unrolled rounds of logit -> error
    * (y - [logit >= 0]) -> per-feature gradient -> weight update, all in
    * BIGINT. Zero-feature docs score 0 via the LEFT JOIN (pred 1), the
    * same convention as the engine. Ends in `tw3(feature, w)` (dense,
    * 1024 rows) with `ttoks`/`fc`/`lab` available upstream. */
  private lazy val trainCtes: String = {
    val rounds = (1 to 3).map { r =>
      s"""tl$r AS (SELECT fc.doc_id, CAST(SUM(fc.c * tw${r - 1}.w) AS BIGINT) AS logit
         | FROM fc JOIN tw${r - 1} USING (feature) GROUP BY 1),
         |te$r AS (SELECT lab.doc_id,
         |  lab.y - (CASE WHEN coalesce(tl$r.logit, 0) >= 0 THEN 1 ELSE 0 END) AS err
         | FROM lab LEFT JOIN tl$r USING (doc_id)),
         |tg$r AS (SELECT fc.feature, CAST(SUM(te$r.err * fc.c) AS BIGINT) AS g
         | FROM fc JOIN te$r USING (doc_id) GROUP BY 1),
         |tw$r AS (SELECT tw${r - 1}.feature, tw${r - 1}.w + coalesce(tg$r.g, 0) AS w
         | FROM tw${r - 1} LEFT JOIN tg$r USING (feature))""".stripMargin
    }.mkString(",\n")
    s"""$qualityCtes,
       |ttoks AS (SELECT doc_id, unnest(${tokensOf("text")}) AS tok FROM documents),
       |fc AS (SELECT doc_id,
       |  (length(tok) * $WordBase + ascii(tok)) % 1024 AS feature,
       |  CAST(COUNT(*) AS BIGINT) AS c
       | FROM ttoks GROUP BY 1, 2),
       |lab AS (SELECT doc_id, CASE WHEN score >= 3500 THEN 1 ELSE 0 END AS y
       | FROM qscored),
       |tw0 AS (SELECT CAST(t.i AS BIGINT) AS feature, CAST(0 AS BIGINT) AS w
       | FROM UNNEST(range(1024)) AS t(i)),
       |$rounds""".stripMargin
  }

  /** Min-label recursive closure over the minhash near-pair graph — the
    * shared tail of neardup_components and cluster_best. Splice after
    * `minhashCtes` with its WITH upgraded to WITH RECURSIVE; ends in
    * `comp(doc_id, component)` covering only docs incident to a pair. */
  /** The symmetric jaccard >= 5000bp near-pair edge list — the graph every
    * graph finisher (components, k-core) peels or closes over. Splice after
    * `minhashCtes`; ends in `edges(u, v)` with both directions listed. */
  private val edgeCtes: String = {
    val bandSelects = (0 until Bands).map { b =>
      s"SELECT doc_id, $b AS bi, ${bandE(b)} AS k FROM mf"
    }.mkString(" UNION ALL ")
    s"""mf AS (SELECT m.* FROM m JOIN s USING (doc_id) WHERE len(s.sh) > 0), bands AS ($bandSelects),
       |cand AS (
       | SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
       | FROM bands a JOIN bands b ON a.bi = b.bi AND a.k = b.k AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_distinct(sh) AS st FROM s),
       |pairs AS (SELECT id_1, id_2 FROM (
       |  SELECT id_1, id_2,
       |   len(list_intersect(sa.st, sb.st)) AS inter,
       |   len(sa.st) + len(sb.st) AS szsum
       |  FROM cand JOIN sets sa ON id_1 = sa.doc_id JOIN sets sb ON id_2 = sb.doc_id)
       | WHERE CAST(floor(inter * 10000.0 / (szsum - inter)) AS BIGINT) >= 5000),
       |edges AS (SELECT id_1 AS u, id_2 AS v FROM pairs
       |          UNION SELECT id_2, id_1 FROM pairs)""".stripMargin
  }

  private val componentCtes: String =
    s"""$edgeCtes,
       |reach(node, lab) AS (
       |  SELECT u, u FROM edges
       |  UNION
       |  SELECT e.u, r.lab FROM edges e JOIN reach r ON r.node = e.v),
       |comp AS (SELECT node AS doc_id, MIN(lab) AS component
       | FROM reach GROUP BY node)""".stripMargin

  /** The FULL curation pipeline mirrored stage by stage: cleanup ->
    * annotate (tokens + lang) -> quality gates -> exact dedup -> minhash
    * near-dedup -> split. The near-dedup finisher is either keep-min-id
    * per duplicate component (corpus_curate) or keep-best-by-ensemble-score
    * (corpus_curate_best, ties to the smaller id), mirroring
    * [[graft.pipelines.CorpusPipeline.nearDedup]] / `nearDedupBest`. */
  private def curateSql(
      keepBest: Boolean,
      spanGrams: Option[Int] = None,
      nearDupMinBp: Long = 9000L): String = {
    val scores = Text.LangMarkers.zipWithIndex.map { case ((_, ws), i) =>
      s"len(list_filter(${tokensOf("clean_text")}, w -> w IN ${inList(ws)})) AS s$i"
    }.mkString(", ")
    val g = Text.LangMarkers.indices.map(i => s"s$i").mkString("greatest(", ", ", ")")
    val cases = Text.LangMarkers.zipWithIndex
      .map { case ((lang, _), i) => s"WHEN s$i = g THEN '$lang'" }.mkString(" ")
    val ms = (0 until K).map(j => s"${minhashE(j)} AS m$j").mkString(", ")
    val bandSelects = (0 until Bands).map { b =>
      s"SELECT doc_id, $b AS bi, ${bandE(b)} AS k FROM m2"
    }.mkString(" UNION ALL ")
    val ct = tokensOf("clean_text")
    // who gets dropped from each near-dup component: everyone but the
    // min-id member, or everyone but the best-scoring member
    val finisher =
      if (!keepBest)
        """dropped AS (SELECT node AS doc_id FROM
          |  (SELECT node, MIN(lab) AS comp FROM reach GROUP BY node)
          | WHERE node <> comp)""".stripMargin
      else
        s"""bm AS (SELECT node AS doc_id, MIN(lab) AS comp FROM reach GROUP BY node),
           |mem AS (SELECT e.doc_id, b.comp, e.clean_text FROM ex e JOIN bm b USING (doc_id)),
           |bqc AS (SELECT doc_id, w, COUNT(*) AS c FROM
           |  (SELECT doc_id, unnest($ct) AS w FROM mem) GROUP BY 1, 2),
           |brep AS (SELECT doc_id,
           |  CAST(floor(MAX(c) * 10000.0 / CAST(SUM(c) AS BIGINT)) AS BIGINT) AS top_bp
           | FROM bqc GROUP BY 1),
           |bsc AS (SELECT m.doc_id, m.comp,
           |  CAST(least(nt, 100) * 10
           |   + CASE WHEN sr BETWEEN 100 AND 4000 THEN 1000 ELSE 0 END
           |   + CASE WHEN r.top_bp < 2000 THEN 1000 ELSE 0 END
           |   + CASE WHEN ml BETWEEN 30000 AND 120000 THEN 1000 ELSE 0 END
           |   AS BIGINT) AS score
           | FROM (SELECT doc_id, comp,
           |    CAST(len($ct) AS BIGINT) AS nt,
           |    CAST(floor(len(list_filter($ct, w -> w IN $stopIn)) * 10000.0
           |      / len($ct)) AS BIGINT) AS sr,
           |    CAST(floor(CAST(coalesce(list_sum(list_transform($ct, w -> length(w))), 0)
           |      AS BIGINT) * 10000.0 / len($ct)) AS BIGINT) AS ml
           |   FROM mem) m JOIN brep r USING (doc_id)),
           |dropped AS (SELECT doc_id FROM (
           |  SELECT doc_id,
           |   row_number() OVER (PARTITION BY comp ORDER BY score DESC, doc_id ASC) AS rn
           |  FROM bsc) WHERE rn <> 1)""".stripMargin
    s"""WITH RECURSIVE cl AS (SELECT doc_id, ${cleanOf("text")} AS clean_text FROM documents),
       |a0 AS (SELECT doc_id, clean_text,
       |  CAST(len($ct) AS BIGINT) AS n_tokens, $scores FROM cl),
       |ann AS (SELECT doc_id, clean_text, n_tokens,
       |  CASE WHEN g <= 0 THEN 'und' $cases END AS pred_lang
       | FROM (SELECT *, $g AS g FROM a0)),
       |q1 AS (SELECT * FROM ann WHERE n_tokens >= 5),
       |rep AS (SELECT doc_id FROM (
       |  SELECT doc_id, CAST(floor(MAX(c) * 10000.0 / CAST(SUM(c) AS BIGINT)) AS BIGINT) AS top_bp
       |  FROM (SELECT doc_id, w, COUNT(*) AS c FROM
       |    (SELECT doc_id, unnest($ct) AS w FROM q1) GROUP BY 1, 2)
       |  GROUP BY 1) WHERE top_bp <= 5000),
       |qual AS (SELECT q1.* FROM q1 JOIN rep USING (doc_id)),
       |ex AS (SELECT qual.* FROM qual
       | JOIN (SELECT MIN(doc_id) AS doc_id FROM qual GROUP BY clean_text) k USING (doc_id)),
       |c2 AS (SELECT doc_id, ${codesOf("clean_text")} AS codes FROM ex),
       |s2 AS (SELECT doc_id, $shinglesE AS sh FROM c2),
       |m2 AS (SELECT doc_id, $ms FROM s2),
       |bands2 AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
       | FROM bands2 a JOIN bands2 b ON a.bi = b.bi AND a.k = b.k AND a.doc_id < b.doc_id),
       |sets2 AS (SELECT doc_id, list_distinct(sh) AS st FROM s2),
       |npairs AS (SELECT id_1, id_2 FROM (
       |  SELECT id_1, id_2,
       |   len(list_intersect(sa.st, sb.st)) AS inter,
       |   len(sa.st) + len(sb.st) AS szsum
       |  FROM cand JOIN sets2 sa ON id_1 = sa.doc_id JOIN sets2 sb ON id_2 = sb.doc_id)
       | WHERE CAST(floor(inter * 10000.0 / (szsum - inter)) AS BIGINT) >= $nearDupMinBp),
       |nedges AS (SELECT id_1 AS u, id_2 AS v FROM npairs
       |           UNION SELECT id_2, id_1 FROM npairs),
       |reach(node, lab) AS (
       |  SELECT u, u FROM nedges
       |  UNION
       |  SELECT e.u, r.lab FROM nedges e JOIN reach r ON r.node = e.v),
       |$finisher,
       |fin AS (SELECT * FROM ex WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
       |${spanStageSql(spanGrams)}
       |SELECT doc_id, clean_text, n_tokens, pred_lang,
       | CASE WHEN (doc_id % $P * $TokenHashA) % $P % 100 < 80 THEN 'train'
       |      WHEN (doc_id % $P * $TokenHashA) % $P % 100 < 90 THEN 'val'
       |      ELSE 'test' END AS split
       |FROM fin2 ORDER BY doc_id""".stripMargin
  }

  /** Optional position-level span-dedup stage between the doc-dedup
    * survivors (`fin`) and the split — mirrors the spanDedupGrams stage of
    * [[graft.pipelines.CorpusPipeline.curate]]: n_tokens becomes the KEPT
    * count and the minTokens gate re-applies. Identity when disabled. */
  private def spanStageSql(spanGrams: Option[Int]): String = spanGrams match {
    case None => "fin2 AS (SELECT * FROM fin)"
    case Some(k) =>
      s"""sp_tk AS (SELECT doc_id, ${tokensOf("clean_text")} AS tk FROM fin),
         |sp_g AS (SELECT doc_id, CAST(t.p AS BIGINT) AS pos,
         |  array_to_string(list_slice(tk, t.p + 1, t.p + $k), ' ') AS gram
         | FROM sp_tk, UNNEST(range(len(tk) - ${k - 1})) AS t(p) WHERE len(tk) >= $k),
         |sp_red AS (SELECT doc_id, pos FROM (
         |  SELECT doc_id, pos,
         |   row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
         |  FROM sp_g) WHERE rn > 1),
         |sp_cov AS (SELECT DISTINCT doc_id, pos + u.i AS cpos
         | FROM sp_red, UNNEST(range($k)) AS u(i)),
         |sp_toks AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos, tk[t.i + 1] AS tok
         | FROM sp_tk, UNNEST(range(len(tk))) AS t(i)),
         |sp AS (SELECT t.doc_id,
         |  COALESCE(string_agg(tok, ' ' ORDER BY t.pos) FILTER (WHERE c.cpos IS NULL), '')
         |   AS clean_text,
         |  CAST(SUM(CASE WHEN c.cpos IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_tokens
         | FROM sp_toks t LEFT JOIN sp_cov c ON t.doc_id = c.doc_id AND t.pos = c.cpos
         | GROUP BY t.doc_id),
         |fin2 AS (SELECT f.doc_id, s.clean_text, s.n_tokens, f.pred_lang
         | FROM fin f JOIN sp s ON f.doc_id = s.doc_id WHERE s.n_tokens >= 5)""".stripMargin
  }

  /** DSIR importance-scoring chain (dsir_weights and dsir_resample);
    * ends in `dw(doc_id, n_tokens, score_millis, millis_per_token)`. */
  private val dsirCtes: String =
    """e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |cc AS (SELECT tok, COUNT(*) AS cnt_c FROM e GROUP BY 1),
      |te AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents WHERE lang = 'en'),
      |tc AS (SELECT tok, COUNT(*) AS cnt_t FROM te GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt_c) AS BIGINT) AS total_c, COUNT(*) AS vocab FROM cc),
      |ttot AS (SELECT COUNT(*) AS total_t FROM te),
      |b AS (SELECT e.doc_id,
      |  ((COALESCE(tc.cnt_t, 0) + 1) * tot.total_c * 1000)
      |   // (cc.cnt_c * (ttot.total_t + tot.vocab)) - 1000 AS dev
      | FROM e JOIN cc USING (tok) LEFT JOIN tc USING (tok)
      |  CROSS JOIN tot CROSS JOIN ttot),
      |s AS (SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(dev) AS BIGINT) AS score_millis FROM b GROUP BY 1),
      |dw AS (SELECT doc_id, n_tokens, score_millis,
      | CAST((score_millis * 1000 - ((score_millis * 1000 % n_tokens + n_tokens) % n_tokens))
      |  // n_tokens AS BIGINT) AS millis_per_token
      | FROM s)""".stripMargin

  // -- the oracle catalog ----------------------------------------------------

  val all: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
         | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
         | CAST(SUM(CAST(round(l_extendedprice*(1 - l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
         | COUNT(*) AS n_rows
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      s"""SELECT l_orderkey,
         | CAST(SUM(CAST(round(l_extendedprice*(1 - l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
         |FROM lineitem GROUP BY l_orderkey
         |ORDER BY revenue_cents DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q5_region_join" ->
      s"""SELECT r_name, c_mktsegment, COUNT(*) AS n_orders,
         | CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_total_cents
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, c_mktsegment ORDER BY r_name, c_mktsegment""".stripMargin,

    "q6_forecast" ->
      """SELECT
        | CAST(SUM(CAST(round(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        | AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        | WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "q14_brand" ->
      """SELECT p_brand,
        | CAST(SUM(CAST(round(l_extendedprice*(1 - l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "semi_join_big_spenders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,

    "q2_min_cost_supp" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |  MIN(CAST(round(l_extendedprice*100) AS BIGINT)) AS min_cost_cents
        | FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (
        |  PARTITION BY l_partkey ORDER BY min_cost_cents, l_suppkey) AS rn FROM ps)
        |SELECT l_partkey AS p_partkey, s_name, min_cost_cents
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rn = 1 ORDER BY p_partkey""".stripMargin,

    "q7_nation_volume" ->
      """SELECT sn.supp_nation, cn.cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(SUM(CAST(round(l_extendedprice*(1 - l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN (SELECT n_nationkey, n_name AS supp_nation FROM nation) sn ON s_nationkey = sn.n_nationkey
        |JOIN (SELECT n_nationkey, n_name AS cust_nation FROM nation) cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(SUM(CAST(round(l_extendedprice*(1 - l_discount)*100) AS BIGINT)) AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY n_name, l_year DESC""".stripMargin,

    "q10_returned_top" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(SUM(CAST(round(l_extendedprice*(1 - l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3 ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin,

    "q13_order_dist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        | SELECT c_custkey, COUNT(o_orderkey) AS c_count
        | FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q17_small_qty" ->
      """WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23' AND p_size <= 5),
        |lp AS (SELECT l.* FROM lineitem l JOIN pk ON l_partkey = p_partkey),
        |a AS (SELECT l_partkey AS a_partkey, SUM(l_quantity) AS sum_q, COUNT(*) AS cnt_q
        |      FROM lp GROUP BY 1)
        |SELECT CAST(coalesce(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)), 0) AS BIGINT) // 7
        |         AS avg_yearly_cents,
        |       COUNT(*) AS n_rows
        |FROM lp JOIN a ON l_partkey = a_partkey
        |WHERE l_quantity * 5 * cnt_q < sum_q""".stripMargin,

    "q18_big_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        | CAST(round(o_totalprice*100) AS BIGINT) AS total_cents, sum_qty
        |FROM (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING CAST(SUM(l_quantity) AS BIGINT) > 300) q
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey""".stripMargin,

    "q19_disjunctive" ->
      """SELECT
        | CAST(SUM(CAST(round(l_extendedprice*(1 - l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | COUNT(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        | OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        | OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q12_priority_buckets" ->
      """SELECT l_linestatus,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate
        |GROUP BY 1 ORDER BY l_linestatus""".stripMargin,

    "q15_top_supplier" ->
      """WITH r AS (SELECT l_suppkey,
        |  CAST(SUM(CAST(round(l_extendedprice*(1 - l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
        | GROUP BY 1)
        |SELECT s_suppkey, s_name, revenue_cents
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE revenue_cents = (SELECT MAX(revenue_cents) FROM r)
        |ORDER BY s_suppkey""".stripMargin,

    "q22_rich_inactive" ->
      """WITH b AS (SELECT CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents, * FROM customer),
        |t AS (SELECT CAST(SUM(bal_cents) AS BIGINT) AS total_cents, COUNT(*) AS n_cust FROM b)
        |SELECT c_nationkey, COUNT(*) AS n_custs,
        | CAST(SUM(bal_cents) AS BIGINT) AS sum_bal_cents
        |FROM b, t
        |WHERE bal_cents * n_cust > total_cents
        | AND NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 150000)
        |GROUP BY 1 ORDER BY c_nationkey""".stripMargin,

    "q8_market_share" ->
      """WITH vol AS (
        | SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(round(l_extendedprice*(1 - l_discount)*100) AS BIGINT) AS cents,
        |  sn.n_name AS supp_nation
        | FROM lineitem
        | JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation sn ON s_nationkey = sn.n_nationkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation cn ON c_nationkey = cn.n_nationkey
        | JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA')
        |SELECT o_year,
        | CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) AS BIGINT) AS nation_cents,
        | CAST(SUM(cents) AS BIGINT) AS total_cents,
        | CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) * 10000
        |   // SUM(cents) AS BIGINT) AS share_bp
        |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q11_important_parts" ->
      """WITH v AS (
        | SELECT l_partkey,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS value_cents
        | FROM lineitem
        | WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |   JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7')
        | GROUP BY l_partkey),
        |t AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents FROM v)
        |SELECT l_partkey, value_cents FROM v CROSS JOIN t
        |WHERE value_cents * 1000 > total_cents
        |ORDER BY value_cents DESC, l_partkey""".stripMargin,

    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        | CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        | AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        | AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q20_excess_suppliers" ->
      """WITH sp AS (
        | SELECT l_suppkey, l_partkey,
        |  CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01' THEN l_quantity ELSE 0 END)
        |   AS BIGINT) AS qty_1996,
        |  CAST(SUM(l_quantity) AS BIGINT) AS qty_total
        | FROM lineitem
        | WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        | GROUP BY l_suppkey, l_partkey)
        |SELECT s_suppkey, s_name FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |WHERE s_suppkey IN (SELECT l_suppkey FROM sp WHERE 2*qty_1996 > qty_total)
        |ORDER BY s_suppkey""".stripMargin,

    "q21_waiting_suppliers" ->
      """WITH l AS (SELECT l_orderkey, l_suppkey,
        |  l_shipdate > o_orderdate + INTERVAL 30 DAY AS is_late
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F')
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM l l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |WHERE l1.is_late
        | AND EXISTS (SELECT 1 FROM l l2
        |  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        | AND NOT EXISTS (SELECT 1 FROM l l3
        |  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |   AND l3.is_late)
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin,

    "q1_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS n_rows,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, returnflag, linestatus""".stripMargin,

    "median_order_cents" ->
      """SELECT o_orderpriority,
        | quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.5) AS median_cents,
        | COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "pivot_events" ->
      """SELECT user_id,
        | CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        | CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        | CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        | CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "unpivot_lineitem" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        | SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        | UNION ALL
        | SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        | UNION ALL
        | SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem)
        |WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,

    // exact twins + literal TRUE flags: the compare fails iff the Spark
    // sketches (HLL++ distinct, approx median) leave their error bounds
    "sketch_events" ->
      """SELECT event_type,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        | COUNT(*) AS n,
        | TRUE AS hll_within_tol,
        | TRUE AS median_within_tol
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "cube_events" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        | coalesce(bin, 'ALL') AS bin,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
        | CAST(GROUPING(event_type, bin) AS BIGINT) AS gid
        |FROM (SELECT event_type, strftime(ts, '%Y%m%d_%H00') AS bin, value FROM events)
        |GROUP BY CUBE (event_type, bin)
        |ORDER BY gid, event_type, bin""".stripMargin,

    "running_revenue" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
        |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // half-life EWMA: exact integer fold (acc + x) // 2 over the per-user
    // event list ordered by event id; pure lambda (no outer capture, so
    // DuckDB's list_reduce is safe here), seeded via list_prepend(0)
    "user_ewma" ->
      """WITH per AS (SELECT user_id, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |g AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  list(cents ORDER BY event_id) AS xs FROM per GROUP BY 1)
        |SELECT user_id, n_events,
        | CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), xs),
        |  (acc, x) -> (acc + x) // 2) AS BIGINT) AS ewma_cents
        |FROM g ORDER BY user_id""".stripMargin,

    "asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |c0 AS (SELECT user_id, ts, event_id, value,
        |  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        | FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, ts, event_id AS click_id, value AS click_value
        | FROM c0 WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.value,
        | coalesce(c.click_id, -1) AS click_id,
        | coalesce(c.click_value, -1.0) AS click_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    // forward as-of: first click at-or-after each purchase (native ASOF
    // with the inequality reversed)
    "asof_forward" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |c0 AS (SELECT user_id, ts, event_id, value,
        |  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        | FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, ts, event_id AS click_id, value AS click_value
        | FROM c0 WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.value,
        | coalesce(c.click_id, -1) AS click_id,
        | coalesce(c.click_value, -1.0) AS click_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
        |ORDER BY p.event_id""".stripMargin,

    // nearest as-of: closer of the backward/forward matches, ties backward
    "asof_nearest" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |c0 AS (SELECT user_id, ts, event_id, value,
        |  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        | FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, ts, event_id AS click_id, value AS click_value
        | FROM c0 WHERE rn = 1),
        |b AS (SELECT p.event_id, MAX(c.ts) AS rts FROM p JOIN c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts GROUP BY p.event_id),
        |f AS (SELECT p.event_id, MIN(c.ts) AS rts FROM p JOIN c
        |  ON p.user_id = c.user_id AND c.ts >= p.ts GROUP BY p.event_id),
        |pick AS (SELECT p.event_id, p.user_id, p.value,
        |  CASE WHEN f.rts IS NULL THEN b.rts
        |       WHEN b.rts IS NULL THEN f.rts
        |       WHEN epoch_us(f.rts) - epoch_us(p.ts)
        |            < epoch_us(p.ts) - epoch_us(b.rts) THEN f.rts
        |       ELSE b.rts END AS rts
        | FROM p LEFT JOIN b ON p.event_id = b.event_id
        |        LEFT JOIN f ON p.event_id = f.event_id)
        |SELECT pick.event_id, pick.user_id, pick.value,
        | coalesce(c.click_id, -1) AS click_id,
        | coalesce(c.click_value, -1.0) AS click_value
        |FROM pick LEFT JOIN c
        | ON pick.user_id = c.user_id AND pick.rts = c.ts
        |ORDER BY pick.event_id""".stripMargin,

    "sessionize" ->
      """WITH x AS (SELECT user_id, ts, event_id,
        |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |   THEN 1 ELSE 0 END AS flag
        | FROM events),
        |y AS (SELECT user_id, ts,
        |  SUM(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS UNBOUNDED PRECEDING) AS session_id
        | FROM x)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        | MIN(epoch_us(ts)) AS session_start_us,
        | MAX(epoch_us(ts)) AS session_end_us,
        | COUNT(*) AS n_events
        |FROM y GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,

    "time_bin_hourly" ->
      """SELECT strftime(ts, '%Y%m%d_%H00') AS bin, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY 1, 2 ORDER BY bin, event_type""".stripMargin,

    "dedup_keeplast" ->
      """SELECT event_id, user_id, event_type, value FROM (
        | SELECT event_id, user_id, event_type, value,
        |  row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
        | FROM events) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "dedup_keepfirst" ->
      """SELECT event_id, user_id, event_type, value FROM (
        | SELECT event_id, user_id, event_type, value,
        |  row_number() OVER (PARTITION BY user_id, event_type, value ORDER BY event_id ASC) AS rn
        | FROM events) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "intervals_islands" ->
      """SELECT user_id, MIN(event_id) AS range_from, MAX(event_id) AS range_to,
        | COUNT(*) AS n_offsets
        |FROM (SELECT user_id, event_id,
        |  event_id - row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS isl
        | FROM events)
        |GROUP BY user_id, isl ORDER BY user_id, range_from""".stripMargin,

    "anti_join_unseen" ->
      """SELECT event_id, user_id, event_type FROM events e
        |WHERE NOT EXISTS (
        | SELECT 1 FROM (
        |  SELECT user_id, MIN(event_id) AS range_from, MAX(event_id) AS range_to
        |  FROM events WHERE event_type = 'view' GROUP BY user_id) s
        | WHERE s.user_id = e.user_id
        |  AND e.event_id >= s.range_from AND e.event_id <= s.range_to)
        |ORDER BY event_id""".stripMargin,

    "sanitize_ids" ->
      """SELECT event_id,
        | CASE WHEN regexp_replace(coalesce(props, ''), '[^a-zA-Z0-9_-]+', '', 'g') = ''
        |  THEN 'unknown'
        |  ELSE regexp_replace(coalesce(props, ''), '[^a-zA-Z0-9_-]+', '', 'g') END AS clean_props
        |FROM events ORDER BY event_id""".stripMargin,

    "filename_meta" -> {
      val fname = "event_type || '+' || CAST(user_id % 4 AS VARCHAR) || '+' || " +
        "lpad(CAST(event_id*1000 + 37 AS VARCHAR), 10, '0') || '.avro'"
      val re = """([^/+]+)\+(\d+)\+(\d+)(?:\+(\d+))?\.avro$"""
      s"""SELECT event_id,
         | regexp_extract(fname, '$re', 1) AS topic,
         | CAST(regexp_extract(fname, '$re', 2) AS INTEGER) AS partition,
         | CAST(regexp_extract(fname, '$re', 3) AS BIGINT) AS start_offset
         |FROM (SELECT event_id, $fname AS fname FROM events) ORDER BY event_id""".stripMargin
    },

    "flatten_nested" ->
      """SELECT event_id, user_id AS "k.user_id", event_type AS "k.event_type",
        | value AS "v.value", props AS "v.props"
        |FROM events ORDER BY event_id""".stripMargin,

    "time_cascade" ->
      """SELECT event_id,
        | strftime(make_timestamp(CAST(
        |  (CASE WHEN event_id % 3 = 0 THEN event_id*97 + 3600 ELSE event_id*97 END)
        |   * 1000000 AS BIGINT)), '%Y%m%d_%H00') AS bin
        |FROM events ORDER BY event_id""".stripMargin,

    "dedup_ignorefields" ->
      """SELECT event_id, user_id, event_type FROM (
        | SELECT event_id, user_id, event_type,
        |  row_number() OVER (PARTITION BY event_type ORDER BY event_id DESC) AS rn
        | FROM events) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "extraction_semijoin" ->
      """SELECT event_id, user_id, strftime(ts, '%Y%m%d_%H00') AS bin
        |FROM events e
        |WHERE EXISTS (SELECT 1 FROM events v
        | WHERE v.event_type = 'view' AND v.user_id = e.user_id
        |  AND strftime(v.ts, '%Y%m%d_%H00') = strftime(e.ts, '%Y%m%d_%H00'))
        |ORDER BY event_id""".stripMargin,

    "limit_per_group" ->
      """SELECT event_id, user_id, rn FROM (
        | SELECT event_id, user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        | FROM events) WHERE rn <= 3 ORDER BY event_id""".stripMargin,

    "offset_assign" ->
      """SELECT event_id, user_id,
        | (row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1)
        |  + user_id * 1000000 AS offset
        |FROM events ORDER BY event_id""".stripMargin,

    "timestamp_sets" ->
      """SELECT user_id, strftime(ts, '%Y%m%d_%H00') AS bin,
        | COUNT(DISTINCT ts) AS n_times
        |FROM events GROUP BY 1, 2 ORDER BY user_id, bin""".stripMargin,

    "json_flatten" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k
        |FROM events ORDER BY event_id""".stripMargin,

    "base64_unpadded" ->
      """SELECT doc_id, rtrim(to_base64(CAST(substr(text, 1, 32) AS BLOB)), '=') AS b64
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_tokens" ->
      s"""SELECT doc_id, len($tokensE) AS n_tokens, n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,

    "bpe_tokens" ->
      s"""SELECT doc_id, len(regexp_extract_all(text, '${Text.BpePattern}')) AS n_bpe
         |FROM documents ORDER BY doc_id""".stripMargin,

    // frequency-weighted adjacent char-pair counts over the vocabulary:
    // pairs are 2-char substrings, top 32 with a deterministic tie-break
    "bpe_merge_pairs" ->
      s"""WITH tok AS (SELECT w FROM
         |  (SELECT unnest($tokensE) AS w FROM documents) WHERE w <> ''),
         |vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY 1),
         |pairs AS (SELECT t.p AS p, freq FROM vocab,
         | UNNEST(list_transform(range(1, length(w)), i -> substring(w, i, 2))) AS t(p)),
         |pc AS (SELECT p, CAST(SUM(freq) AS BIGINT) AS cnt FROM pairs GROUP BY 1),
         |r AS (SELECT p, cnt,
         |  row_number() OVER (ORDER BY cnt DESC, p ASC) AS "rank" FROM pc)
         |SELECT CAST("rank" AS BIGINT) AS "rank", p AS pair, cnt FROM r
         |WHERE "rank" <= 32 ORDER BY "rank"""".stripMargin,

    "bpe_encode" ->
      s"""WITH $bpeEncCtes,
         |bmt AS (SELECT lhs || rhs AS merged, 255 + MIN(step) AS tid FROM (
         |  SELECT 1 AS step, lhs, rhs FROM beb1
         |  UNION ALL SELECT 2, lhs, rhs FROM beb2
         |  UNION ALL SELECT 3, lhs, rhs FROM beb3) GROUP BY 1),
         |bdw AS (SELECT doc_id, i AS wpos, toks[i] AS w FROM
         |  (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |  UNNEST(range(1, len(toks) + 1)) AS t(i) WHERE toks[i] <> ''),
         |bds AS (SELECT doc_id, wpos, j AS spos, syms[j] AS sym FROM
         |  (SELECT doc_id, wpos, syms FROM bdw JOIN bsyms USING (w)),
         |  UNNEST(range(1, len(syms) + 1)) AS t(j)),
         |bdi AS (SELECT doc_id, wpos, spos, COALESCE(m.tid, ascii(sym)) AS tid
         |  FROM bds LEFT JOIN bmt m ON m.merged = bds.sym)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bpe,
         |  string_agg(CAST(tid AS VARCHAR), ',' ORDER BY wpos, spos) AS token_ids
         |FROM bdi GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // token_pack with REAL BPE counts: the learned merges re-applied to
    // the vocabulary, summed per doc, then the identical packing body
    "token_pack_bpe" ->
      s"""WITH $bpeEncCtes,
         |$bpeCountCte,
         |d AS (SELECT doc_id, n_tokens,
         |  CASE WHEN (doc_id % $P * $TokenHashA) % $P % 100 < 80 THEN 'train'
         |       WHEN (doc_id % $P * $TokenHashA) % $P % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split,
         |  doc_id % 64 AS shard
         | FROM bcnt),
         |c AS (SELECT doc_id, split, shard, n_tokens,
         |  CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY split, shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         | FROM d)
         |SELECT doc_id, split, shard, n_tokens,
         | cum_before // 512 AS pack_id,
         | cum_before % 512 AS pack_offset
         |FROM c ORDER BY split, shard, doc_id""".stripMargin,

    // token_budget_mix with REAL BPE counts, same admission body
    "token_budget_mix_bpe" ->
      s"""WITH $bpeEncCtes,
         |$bpeCountCte,
         |d AS (SELECT b.doc_id, doc.source, b.n_tokens,
         |  (b.doc_id % $P * $TokenHashA) % $P AS h,
         |  CASE WHEN doc.source IN ('src0', 'src1') THEN 1000 ELSE 400 END AS budget
         | FROM bcnt b JOIN documents doc USING (doc_id)),
         |c AS (SELECT doc_id, source, n_tokens, budget,
         |  SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |   ROWS UNBOUNDED PRECEDING) AS cum FROM d)
         |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         | CAST(cum AS BIGINT) AS cum
         |FROM c WHERE cum <= budget ORDER BY source, cum""".stripMargin,

    // iterated BPE: 3 rounds unrolled; symbols ride as chr(1)-prefixed,
    // chr(2)-suffixed brackets so non-overlapping replace() applies the
    // merge with exactly BPE's greedy left-to-right semantics (prefix AND
    // suffix markers make partial-symbol matches impossible), and no
    // list_reduce lambda ever captures an outer column
    "bpe_train_merges" -> {
      def roundCtes(i: Int) =
        s"""sy$i AS (SELECT freq,
           |  string_split(rtrim(ltrim(enc, chr(1)), chr(2)), chr(2) || chr(1)) AS syms
           | FROM s$i),
           |pc$i AS (SELECT syms[t.j] AS lhs, syms[t.j + 1] AS rhs, freq
           | FROM sy$i, UNNEST(range(1, len(syms))) AS t(j)),
           |best$i AS (SELECT lhs, rhs, CAST(SUM(freq) AS BIGINT) AS cnt
           | FROM pc$i GROUP BY 1, 2 ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1),
           |s${i + 1} AS (SELECT freq,
           |  replace(enc, chr(1) || b.lhs || chr(2) || chr(1) || b.rhs || chr(2),
           |    chr(1) || b.lhs || b.rhs || chr(2)) AS enc
           | FROM s$i CROSS JOIN best$i b)""".stripMargin
      s"""WITH tok AS (SELECT w FROM
         |  (SELECT unnest($tokensE) AS w FROM documents) WHERE w <> ''),
         |vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY 1),
         |s1 AS (SELECT freq,
         |  regexp_replace(w, '(.)', chr(1) || '\\1' || chr(2), 'g') AS enc FROM vocab),
         |${roundCtes(1)},
         |${roundCtes(2)},
         |${roundCtes(3)}
         |SELECT * FROM (
         | SELECT CAST(1 AS BIGINT) AS step, lhs, rhs, lhs || rhs AS merged, cnt FROM best1
         | UNION ALL SELECT 2, lhs, rhs, lhs || rhs, cnt FROM best2
         | UNION ALL SELECT 3, lhs, rhs, lhs || rhs, cnt FROM best3)
         |ORDER BY step""".stripMargin
    },

    // unigram-LM trainer: seed inventory + 2 hard-EM rounds, the greedy
    // segmentation running as a recursive CTE with a LATERAL arg-min
    "unigram_lm_train" ->
      s"""WITH RECURSIVE $unigramCtes
         |SELECT piece, cnt AS n_uses, cost_bits FROM ucost2
         |ORDER BY piece""".stripMargin,

    // unigram encoding under the trained table: third segmentation pass
    // over the vocabulary, corpus joined back on the word key; blank
    // docs keep an n_pieces=0 row (documents LEFT JOIN)
    "unigram_encode" ->
      s"""WITH RECURSIVE $unigramCtes,
         |${unigramSegCte("useg3", "ucost2")},
         |uenc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(cost) AS BIGINT) AS bits
         | FROM useg3 WHERE piece IS NOT NULL GROUP BY 1),
         |udw AS (SELECT doc_id, t.w AS w FROM
         |  (SELECT doc_id, $tokensE AS ts FROM documents),
         |  UNNEST(ts) AS t(w) WHERE t.w <> ''),
         |upd AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_pieces,
         |  CAST(SUM(bits) AS BIGINT) AS bits
         | FROM udw JOIN uenc USING (w) GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(p.n_pieces, 0) AS BIGINT) AS n_pieces,
         |  CAST(coalesce(p.bits, 0) AS BIGINT) AS total_bits
         |FROM documents d LEFT JOIN upd p USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Gopher repetition signals: bigram argmax with (count desc, gram asc)
    // tie-break; dup-5-gram coverage as a position-set union
    "repetition_signals" ->
      s"""WITH tk AS (SELECT doc_id, $tokensE AS ts FROM documents),
         |base AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(list_sum(list_transform(ts, w -> length(w))), 0) AS BIGINT) AS l
         | FROM tk),
         |bg AS (SELECT doc_id, t.g AS g FROM tk,
         |  UNNEST(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS t(g)
         | WHERE len(ts) >= 2),
         |bc AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
         |top AS (SELECT doc_id, g, c FROM (SELECT doc_id, g, c,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
         | FROM bc) WHERE rn = 1),
         |g5 AS (SELECT doc_id, t.i AS p, array_to_string(ts[t.i : t.i + 4], ' ') AS g
         | FROM tk, UNNEST(range(1, len(ts) - 3)) AS t(i) WHERE len(ts) >= 5),
         |gc AS (SELECT doc_id, g, COUNT(*) AS c, list(p) AS ps FROM g5 GROUP BY 1, 2),
         |ocp AS (SELECT doc_id, UNNEST(ps) AS p FROM gc WHERE c >= 2),
         |cov AS (SELECT DISTINCT doc_id, p + o.o AS cp FROM ocp, range(0, 5) o(o)),
         |cl AS (SELECT c.doc_id, CAST(SUM(length(tk.ts[c.cp])) AS BIGINT) AS dupchars
         | FROM cov c JOIN tk ON tk.doc_id = c.doc_id GROUP BY c.doc_id)
         |SELECT b.doc_id, b.n_tokens, b.l AS n_chars_tok,
         | top.g AS top_bigram, CAST(coalesce(top.c, 0) AS BIGINT) AS top_bigram_n,
         | CAST(CASE WHEN b.l > 0
         |   THEN coalesce(top.c * (length(top.g) - 1), 0) * 10000 // b.l
         |   ELSE 0 END AS BIGINT) AS top2gram_char_bp,
         | CAST(CASE WHEN b.l > 0 THEN coalesce(cl.dupchars, 0) * 10000 // b.l
         |   ELSE 0 END AS BIGINT) AS dup5gram_char_bp
         |FROM base b LEFT JOIN top USING (doc_id) LEFT JOIN cl USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // pii scrub: patterns interpolated from the SAME Pii constants the
    // engine compiles (written in the Java-regex ∩ RE2 subset)
    "pii_scrub" -> {
      val em = graft.text.Pii.EmailPattern
      val ip = graft.text.Pii.Ipv4Pattern
      val ph = graft.text.Pii.PhonePattern
      s"""WITH n AS (SELECT doc_id,
         |  'contact ' || source || '.user@mail.example.com ' || text ||
         |  ' call 555-' || (doc_id % 9000 + 1000) ||
         |  ' from 10.' || (doc_id % 256) || '.' || (doc_id * 7 % 256) || '.'
         |    || (doc_id * 11 % 256) || ' end' AS noisy
         | FROM documents),
         |s AS (SELECT doc_id, noisy,
         |  regexp_replace(regexp_replace(regexp_replace(noisy,
         |    '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'),
         |    '$ph', '<PHONE>', 'g') AS sc
         | FROM n)
         |SELECT doc_id,
         | CAST(len(regexp_extract_all(noisy, '$em')) AS BIGINT) AS n_emails,
         | CAST(len(regexp_extract_all(noisy, '$ip')) AS BIGINT) AS n_ips,
         | CAST(len(regexp_extract_all(noisy, '$ph')) AS BIGINT) AS n_phones,
         | CAST(len(regexp_extract_all(sc, '$em')) + len(regexp_extract_all(sc, '$ip'))
         |   + len(regexp_extract_all(sc, '$ph')) AS BIGINT) AS n_residual,
         | CAST(length(sc) AS BIGINT) AS scrubbed_len,
         | substr(sc, 1, 48) AS scrubbed_head
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "text_quality" ->
      s"""SELECT doc_id, n_tokens, n_stop,
         | CAST(floor(n_stop * 10000.0 / n_tokens) AS BIGINT) AS stop_ratio_bp,
         | CAST(floor(sum_len * 10000.0 / n_tokens) AS BIGINT) AS mean_token_len_bp
         |FROM (SELECT doc_id,
         |  len($tokensE) AS n_tokens,
         |  len(list_filter($tokensE, w -> w IN $stopIn)) AS n_stop,
         |  CAST(coalesce(list_sum(list_transform($tokensE, w -> length(w))), 0) AS BIGINT) AS sum_len
         | FROM documents) ORDER BY doc_id""".stripMargin,

    // integer-weighted heuristic quality ensemble (length + 3 binary rules)
    "quality_ensemble" ->
      s"""WITH $qualityCtes
         |SELECT doc_id, n_tokens, stop_ratio_bp, top_token_bp, mean_token_len_bp,
         | score, score >= 3000 AS keep
         |FROM qscored ORDER BY doc_id""".stripMargin,

    "corpus_curate" -> curateSql(keepBest = false),
    "corpus_curate_best" -> curateSql(keepBest = true),
    // doc-level near-dedup disabled (threshold above the 10000bp ceiling)
    // so near-identical docs survive into the span stage and the
    // position-level excision does the dedup work — trim, don't drop
    "corpus_curate_span" ->
      curateSql(keepBest = false, spanGrams = Some(4), nearDupMinBp = 10001L),

    "lang_id" -> {
      val scores = Text.LangMarkers.zipWithIndex.map { case ((_, ws), i) =>
        s"len(list_filter($tokensE, w -> w IN ${inList(ws)})) AS s$i"
      }.mkString(", ")
      val g = Text.LangMarkers.indices.map(i => s"s$i").mkString("greatest(", ", ", ")")
      val cases = Text.LangMarkers.zipWithIndex
        .map { case ((lang, _), i) => s"WHEN s$i = g THEN '$lang'" }.mkString(" ")
      s"""SELECT doc_id, lang,
         | CASE WHEN g <= 0 THEN 'und' $cases END AS pred_lang
         |FROM (SELECT doc_id, lang, $g AS g, * FROM
         | (SELECT doc_id, lang, $scores FROM documents))
         |ORDER BY doc_id""".stripMargin
    },

    "text_clean" ->
      """WITH n AS (SELECT doc_id,
        |  '<p class="x">' || text || '</p> <a>see</a> https://example.com/doc/' || doc_id || ' end' AS noisy
        | FROM documents),
        |c AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(regexp_replace(
        |   noisy, '<[^>]*>', '', 'g'), 'https?://[^ ]+', '', 'g'), '[ \t\n\r\f\x0b]+', ' ', 'g')) AS clean
        | FROM n)
        |SELECT doc_id,
        | CAST(len(string_split(clean, ' ')) AS BIGINT) AS n_clean_tokens,
        | array_to_string(list_slice(string_split(clean, ' '), 1, 8), ' ') AS head8
        |FROM c ORDER BY doc_id""".stripMargin,

    "stable_split" ->
      s"""SELECT lang,
         | CASE WHEN (doc_id % $P * $TokenHashA) % $P % 100 < 80 THEN 'train'
         |      WHEN (doc_id % $P * $TokenHashA) % $P % 100 < 90 THEN 'val'
         |      ELSE 'test' END AS split,
         | COUNT(*) AS n_docs
         |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,

    // top document-frequency shingles (boilerplate candidates)
    "boilerplate_ngrams" ->
      s"""WITH c AS (SELECT doc_id, $codesE AS codes FROM documents),
         |sets AS (SELECT doc_id, list_distinct($shinglesE) AS sh FROM c),
         |ex AS (SELECT doc_id, unnest(sh) AS x FROM sets)
         |SELECT x, CAST(COUNT(*) AS BIGINT) AS df FROM ex
         |GROUP BY x HAVING COUNT(*) >= 3
         |ORDER BY df DESC, x LIMIT 50""".stripMargin,

    // fixed-width 64-token length histogram per language
    "length_histogram" ->
      s"""SELECT lang,
         | CAST(len($tokensE) AS BIGINT) // 64 * 64 AS bucket_start,
         | CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM documents GROUP BY 1, 2 ORDER BY lang, bucket_start""".stripMargin,

    // per-doc duplicated-shingle occurrence share (Gopher dup-ngram signal)
    "dup_ngrams" ->
      s"""WITH c AS (SELECT doc_id, $codesE AS codes FROM documents),
         |sh AS (SELECT doc_id, unnest($shinglesE) AS x FROM c),
         |cc AS (SELECT doc_id, x, COUNT(*) AS c FROM sh GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_sh_total,
         | CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup,
         | CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) * 10000 // SUM(c) AS BIGINT)
         |  AS dup_ngram_bp
         |FROM cc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // n-gram overlap of each train doc (source <> src0) against the eval
    // corpus (source = src0): distinct-shingle membership counts
    "decontaminate" ->
      s"""WITH c AS (SELECT doc_id, source, $codesE AS codes FROM documents),
         |sets AS (SELECT doc_id, source, list_distinct($shinglesE) AS sh FROM c),
         |ex AS (SELECT doc_id, source, unnest(sh) AS x FROM sets),
         |ev AS (SELECT DISTINCT x FROM ex WHERE source = 'src0'),
         |tr AS (SELECT doc_id, x FROM ex WHERE source <> 'src0'),
         |sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM tr GROUP BY 1),
         |ov AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
         | FROM tr WHERE x IN (SELECT x FROM ev) GROUP BY 1)
         |SELECT s.doc_id, n_sh,
         | coalesce(n_overlap, 0) AS n_overlap,
         | CAST(coalesce(n_overlap, 0) * 10000 // greatest(n_sh, 1) AS BIGINT) AS overlap_bp,
         | CAST(coalesce(n_overlap, 0) * 10000 // greatest(n_sh, 1) AS BIGINT) >= 2000
         |  AS contaminated
         |FROM sizes s LEFT JOIN ov USING (doc_id) ORDER BY doc_id""".stripMargin,

    // exact-quota hash-ranked sampling per source domain
    "domain_mix" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  CASE WHEN source IN ('src0', 'src1') THEN 10000
         |       WHEN source IN ('src2', 'src3') THEN 5000
         |       ELSE 2500 END AS rate_bp,
         |  (doc_id % $P * $TokenHashA) % $P AS h FROM documents),
         |r AS (SELECT doc_id, source, rate_bp,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT)
         |   AS sample_rank,
         |  COUNT(*) OVER (PARTITION BY source) AS n_docs FROM d)
         |SELECT doc_id, source, sample_rank FROM r
         |WHERE sample_rank <= greatest(1, n_docs * rate_bp // 10000)
         |ORDER BY source, sample_rank""".stripMargin,

    // per (source, lang) doc/token/char totals + duplicate rate via the
    // rolling-hash fingerprint
    "corpus_report" ->
      s"""WITH d AS (SELECT source, lang, n_chars,
         |  CAST(len($tokensE) AS BIGINT) AS n_tokens,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), $codesE),
         |   (h, c) -> (h*$FpB + c) % $FpM) AS fp
         | FROM documents)
         |SELECT source, lang,
         | CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         | CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         | CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
         | CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
         | CAST((COUNT(*) - COUNT(DISTINCT fp)) * 10000 // COUNT(*) AS BIGINT) AS dup_bp
         |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // sequential token-budget packing per (split, shard): exclusive running
    // sum of token counts in doc_id order, pack = cum // 512
    "token_pack" ->
      s"""WITH d AS (SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  CASE WHEN (doc_id % $P * $TokenHashA) % $P % 100 < 80 THEN 'train'
         |       WHEN (doc_id % $P * $TokenHashA) % $P % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split,
         |  doc_id % 64 AS shard
         | FROM documents),
         |c AS (SELECT doc_id, split, shard, n_tokens,
         |  CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY split, shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         | FROM d)
         |SELECT doc_id, split, shard, n_tokens,
         | cum_before // 512 AS pack_id,
         | cum_before % 512 AS pack_offset
         |FROM c ORDER BY split, shard, doc_id""".stripMargin,

    // per-pack manifest: doc count, token mass, ordered segment lengths
    "pack_manifest" ->
      s"""WITH d AS (SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  CASE WHEN (doc_id % $P * $TokenHashA) % $P % 100 < 80 THEN 'train'
         |       WHEN (doc_id % $P * $TokenHashA) % $P % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split,
         |  doc_id % 64 AS shard
         | FROM documents),
         |c AS (SELECT doc_id, split, shard, n_tokens,
         |  CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY split, shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         | FROM d)
         |SELECT split, shard, cum_before // 512 AS pack_id,
         | COUNT(*) AS n_docs,
         | CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         | string_agg(CAST(n_tokens AS VARCHAR), ',' ORDER BY doc_id) AS segments
         |FROM c GROUP BY split, shard, pack_id
         |ORDER BY split, shard, pack_id""".stripMargin,

    // integer-exact rational tf-idf: floor(tf*N*10000 / (df*len)); `//` is
    // DuckDB integer division, SUM cast back from HUGEINT
    "tfidf_top_terms" ->
      """WITH e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM e GROUP BY 1, 2),
        |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (SELECT doc_id, term,
        |  (tf * n_docs * 10000) // (df * CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT)) AS score_bp
        | FROM tf JOIN dft USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, score_bp,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score_bp DESC, term) AS BIGINT) AS term_rank
        | FROM s)
        |SELECT doc_id, term, term_rank, score_bp FROM r
        |WHERE term_rank <= 3 ORDER BY doc_id, term_rank""".stripMargin,

    // winnowing (window-minimum shingle fingerprints), pairs sharing >= 2
    "winnow_pairs" ->
      s"""WITH c AS (SELECT doc_id, $codesE AS codes FROM documents),
         |s AS (SELECT doc_id, $shinglesE AS sh FROM c),
         |wins AS (SELECT doc_id, list_slice(sh, t.j + 1, t.j + 4) AS wd
         | FROM s, UNNEST(range(greatest(len(sh) - 4, 0) + 1)) AS t(j)
         | WHERE len(sh) > 0),
         |fps AS (SELECT DISTINCT doc_id, list_aggregate(wd, 'min') AS fp FROM wins),
         |capped AS (SELECT fp FROM (SELECT fp, COUNT(*) AS df FROM fps GROUP BY 1)
         | WHERE df <= ${Queries.NgramMaxDf}),
         |k AS (SELECT doc_id, fp FROM fps JOIN capped USING (fp))
         |SELECT a.doc_id AS id_1, b.doc_id AS id_2, CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |ORDER BY id_1, id_2""".stripMargin,

    // winnowing with the fingerprint df cap ACTIVE (8 < the sf0.01 max df
    // of 14) — the boilerplate hot-key gate verified while it FIRES
    "winnow_capped" ->
      s"""WITH c AS (SELECT doc_id, $codesE AS codes FROM documents),
         |s AS (SELECT doc_id, $shinglesE AS sh FROM c),
         |wins AS (SELECT doc_id, list_slice(sh, t.j + 1, t.j + 4) AS wd
         | FROM s, UNNEST(range(greatest(len(sh) - 4, 0) + 1)) AS t(j)
         | WHERE len(sh) > 0),
         |fps AS (SELECT DISTINCT doc_id, list_aggregate(wd, 'min') AS fp FROM wins),
         |capped AS (SELECT fp FROM (SELECT fp, COUNT(*) AS df FROM fps GROUP BY 1)
         | WHERE df <= ${Queries.WinnowCapDf}),
         |k AS (SELECT doc_id, fp FROM fps JOIN capped USING (fp))
         |SELECT a.doc_id AS id_1, b.doc_id AS id_2, CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |ORDER BY id_1, id_2""".stripMargin,

    // robust winnowing: the stateful rightmost-min fold replayed as a
    // recursive CTE stepping one window per level (all docs advance in
    // lockstep; depth = max window count). NOT list_reduce: DuckDB 1.0's
    // list_reduce with an outer-column capture in the lambda returns
    // different results in full-table runs than in restricted runs
    // (verified: doc 3 folds to 10 in the 500-doc run, 9 standalone —
    // 9 is correct), so the fold must avoid per-row lambdas entirely.
    "winnow_robust" ->
      s"""WITH RECURSIVE c AS (SELECT doc_id, $codesE AS codes FROM documents),
         |s AS (SELECT doc_id, $shinglesE AS sh FROM c),
         |shp AS (SELECT doc_id, CAST(t.i AS BIGINT) + 1 AS pos, sh[t.i + 1] AS h
         | FROM s, UNNEST(range(len(sh))) AS t(i) WHERE len(sh) >= 4),
         |wn AS (SELECT doc_id, CAST(t.j AS BIGINT) AS j,
         |  list_aggregate(list_slice(sh, t.j + 1, t.j + 4), 'min') AS m,
         |  t.j + 5 - list_position(list_reverse(list_slice(sh, t.j + 1, t.j + 4)),
         |    list_aggregate(list_slice(sh, t.j + 1, t.j + 4), 'min')) AS rpos
         | FROM s, UNNEST(range(len(sh) - 3)) AS t(j) WHERE len(sh) >= 4),
         |nw AS (SELECT doc_id, COUNT(*) AS n_windows FROM wn GROUP BY 1),
         |rec(doc_id, j, last, nf) AS (
         |  SELECT doc_id, CAST(0 AS BIGINT), rpos, CAST(1 AS BIGINT) FROM wn WHERE j = 0
         |  UNION ALL
         |  SELECT w.doc_id, w.j,
         |    CASE WHEN r.last >= w.j + 1 AND p.h = w.m THEN r.last ELSE w.rpos END,
         |    CASE WHEN r.last >= w.j + 1 AND p.h = w.m THEN r.nf ELSE r.nf + 1 END
         |  FROM rec r
         |  JOIN wn w ON w.doc_id = r.doc_id AND w.j = r.j + 1
         |  JOIN shp p ON p.doc_id = r.doc_id AND p.pos = r.last),
         |fin AS (SELECT r.doc_id, r.nf FROM rec r JOIN nw ON nw.doc_id = r.doc_id
         | WHERE r.j = nw.n_windows - 1)
         |SELECT s.doc_id, CAST(len(s.sh) AS BIGINT) AS n_shingles, fin.nf AS n_fp,
         | fin.nf * 10000 // len(s.sh) AS density_bp
         |FROM s JOIN fin ON fin.doc_id = s.doc_id
         |ORDER BY s.doc_id""".stripMargin,

    "bm25_topk" ->
      """WITH e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM e GROUP BY 1, 2),
        |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS sum_dl FROM tf),
        |ts AS (SELECT doc_id, term,
        |  (tf * n_docs * 10000) // (df * CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT)) AS score_bp
        | FROM tf JOIN dft USING (term) CROSS JOIN n),
        |tr AS (SELECT doc_id, term, score_bp,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY score_bp DESC, term) AS term_rank
        | FROM ts),
        |qterms AS (SELECT doc_id AS query_id, term FROM tr
        | WHERE doc_id < 4 AND term_rank <= 3),
        |parts AS (SELECT q.query_id, tf.doc_id,
        |  ((length(bin(n.n_docs)) - length(bin(dft.df))) * 22 * tf.tf * tot.sum_dl * 1000)
        |   // (10 * tf.tf * tot.sum_dl + 3 * tot.sum_dl + 9 * dl.dl * n.n_docs) AS part_millis
        | FROM qterms q JOIN tf USING (term) JOIN dft USING (term)
        |  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN n CROSS JOIN tot
        | WHERE tf.doc_id <> q.query_id),
        |sc AS (SELECT query_id, doc_id, CAST(SUM(part_millis) AS BIGINT) AS score_millis
        | FROM parts GROUP BY 1, 2),
        |rk AS (SELECT query_id, doc_id, score_millis,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |   ORDER BY score_millis DESC, doc_id ASC) AS BIGINT) AS "rank"
        | FROM sc)
        |SELECT query_id, doc_id, score_millis, "rank" FROM rk
        |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,

    "repetition_ratio" ->
      """WITH e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT doc_id, w, COUNT(*) AS c FROM e GROUP BY 1, 2)
        |SELECT doc_id,
        | CAST(floor(MAX(c) * 10000.0 / CAST(SUM(c) AS BIGINT)) AS BIGINT) AS top_token_bp,
        | COUNT(*) AS n_distinct_tokens
        |FROM c GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "pii_redact" -> {
      val em = Text.EmailPattern
      val ph = Text.PhonePattern
      s"""WITH n AS (SELECT doc_id,
         |  'contact user' || doc_id || '@example.com or +1-555-' ||
         |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' : ' || text AS noisy
         | FROM documents),
         |r AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(noisy, '$em', 0)) +
         |   len(regexp_extract_all(noisy, '$ph', 0)) AS BIGINT) AS n_pii,
         |  regexp_replace(regexp_replace(noisy, '$em', '<EMAIL>', 'g'),
         |   '$ph', '<PHONE>', 'g') AS red
         | FROM n)
         |SELECT doc_id, n_pii,
         | array_to_string(list_slice(string_split(red, ' '), 1, 6), ' ') AS head6
         |FROM r ORDER BY doc_id""".stripMargin
    },

    "fingerprint" ->
      s"""SELECT doc_id,
         | list_reduce(list_prepend(CAST(0 AS BIGINT), $codesE),
         |  (h, c) -> (h*$FpB + c) % $FpM) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "simhash16" -> {
      val bitTerms = (0 until SimHashBits).map { i =>
        s"(CASE WHEN 2*coalesce(CAST(list_sum(list_transform(codes, " +
          s"c -> ((c*$TokenHashA) % $P >> $i) & 1)) AS BIGINT), 0) > len(codes) " +
          s"THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"""SELECT doc_id, $bitTerms AS simhash
         |FROM (SELECT doc_id, $codesE AS codes FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    "minhash_signature" -> {
      val bands = (0 until Bands).map(b => s"${bandE(b)} AS band_$b").mkString(", ")
      s"""$minhashCtes
         |SELECT doc_id, $bands FROM m ORDER BY doc_id""".stripMargin
    },

    "minhash_pairs" -> {
      val bandSelects = (0 until Bands).map { b =>
        s"SELECT doc_id, $b AS bi, ${bandE(b)} AS k FROM mf"
      }.mkString(" UNION ALL ")
      s"""$minhashCtes, mf AS (SELECT m.* FROM m JOIN s USING (doc_id) WHERE len(s.sh) > 0), bands AS ($bandSelects)
         |SELECT a.doc_id AS id_1, b.doc_id AS id_2, COUNT(*) AS n_bands
         |FROM bands a JOIN bands b ON a.bi = b.bi AND a.k = b.k AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY id_1, id_2""".stripMargin
    },

    "dedup_keeplast_salted" ->
      """SELECT event_id, user_id, value FROM (
        | SELECT event_id, user_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        | FROM events) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "simhash_neardup" -> {
      val bitTerms = (0 until SimHashBits).map { i =>
        s"(CASE WHEN 2*coalesce(CAST(list_sum(list_transform(codes, " +
          s"c -> ((c*$TokenHashA) % $P >> $i) & 1)) AS BIGINT), 0) > len(codes) " +
          s"THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      // deliberately blocking-INDEPENDENT: brute-force all pairs, so any
      // recall gap in the Spark-side pigeonhole candidate generation shows
      // up as a row-count mismatch instead of being replicated here
      s"""WITH c AS (SELECT doc_id, $codesE AS codes FROM documents),
         |h AS (SELECT doc_id, $bitTerms AS sig FROM c)
         |SELECT x.doc_id AS id_1, y.doc_id AS id_2,
         |  CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming
         |FROM h x JOIN h y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.sig, y.sig)) <= 2 ORDER BY id_1, id_2""".stripMargin
    },

    "simhash64_neardup" -> {
      // 64-bit fingerprint = two independent 32-bit vote halves (TokenHashA
      // low, TokenHashB high) — identical integer math to
      // TextHashKernels.simhash64. Bit 63's weight is Long.MinValue; spelled
      // (-q - 1) so the literal stays BIGINT-typed (a bare
      // -9223372036854775808 parses as a negated HUGEINT), and placed last
      // in the left-associated sum so every prefix stays in range.
      val bitTerms = (0 until 64).map { i =>
        val (mult, sh) = if (i < 32) (TokenHashA, i) else (TokenHashB, i - 32)
        val weight =
          if (i == 63) "(-9223372036854775807 - 1)" else (1L << i).toString
        s"(CASE WHEN 2*coalesce(CAST(list_sum(list_transform(codes, " +
          s"c -> ((c*$mult) % $P >> $sh) & 1)) AS BIGINT), 0) > len(codes) " +
          s"THEN $weight ELSE 0 END)"
      }.mkString(" + ")
      // blocking-independent brute force, same rationale as simhash_neardup:
      // a recall gap in the Spark-side 4x16-bit pigeonhole blocks shows up
      // as a row-count mismatch instead of being replicated here
      s"""WITH c AS (SELECT doc_id, $codesE AS codes FROM documents),
         |h AS (SELECT doc_id, $bitTerms AS sig FROM c)
         |SELECT x.doc_id AS id_1, y.doc_id AS id_2,
         |  CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming
         |FROM h x JOIN h y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.sig, y.sig)) <= 3 ORDER BY id_1, id_2""".stripMargin
    },

    "minhash_neardup" -> minhashNearDupSql,

    // fraction of each doc's distinct shingles first seen in it
    "ngram_novelty" ->
      s"""WITH c AS (SELECT doc_id, $codesE AS codes FROM documents),
         |s AS (SELECT doc_id, $shinglesE AS sh FROM c),
         |x AS (SELECT s2.doc_id, t.v AS sh FROM
         | (SELECT doc_id, list_distinct(sh) AS st FROM s) s2, UNNEST(st) AS t(v)),
         |f AS (SELECT sh, MIN(doc_id) AS first_doc FROM x GROUP BY 1),
         |g AS (SELECT x.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |  CAST(SUM(CASE WHEN f.first_doc = x.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_novel
         | FROM x JOIN f USING (sh) GROUP BY 1)
         |SELECT doc_id, n_shingles, n_novel,
         | n_novel * 10000 // n_shingles AS novelty_bp
         |FROM g ORDER BY doc_id""".stripMargin,

    // near-dup pairs crossing the stable_split boundary
    "split_leakage" -> {
      val bandSelects = (0 until Bands).map { b =>
        s"SELECT doc_id, $b AS bi, ${bandE(b)} AS k FROM mf"
      }.mkString(" UNION ALL ")
      s"""$minhashCtes, mf AS (SELECT m.* FROM m JOIN s USING (doc_id) WHERE len(s.sh) > 0), bands AS ($bandSelects),
         |cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
         | FROM bands a JOIN bands b ON a.bi = b.bi AND a.k = b.k AND a.doc_id < b.doc_id),
         |sets AS (SELECT doc_id, list_distinct(sh) AS st FROM s),
         |pairs AS (SELECT id_1, id_2 FROM (
         |  SELECT id_1, id_2, len(list_intersect(sa.st, sb.st)) AS inter,
         |   len(sa.st) + len(sb.st) AS szsum
         |  FROM cand JOIN sets sa ON id_1 = sa.doc_id JOIN sets sb ON id_2 = sb.doc_id)
         | WHERE CAST(floor(inter * 10000.0 / (szsum - inter)) AS BIGINT) >= 5000),
         |spl AS (SELECT doc_id,
         |  CASE WHEN (doc_id % $P * $TokenHashA) % $P % 100 < 80 THEN 'train'
         |       WHEN (doc_id % $P * $TokenHashA) % $P % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split FROM documents)
         |SELECT least(sa.split, sb.split) AS split_a,
         | greatest(sa.split, sb.split) AS split_b,
         | sa.split <> sb.split AS leaky,
         | CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM pairs JOIN spl sa ON pairs.id_1 = sa.doc_id
         |JOIN spl sb ON pairs.id_2 = sb.doc_id
         |GROUP BY 1, 2, 3 ORDER BY split_a, split_b""".stripMargin
    },

    // recall curve of the 4x4 LSH banding vs exact Jaccard ground truth
    // (every co-occurring pair), per Jaccard decile; caught = exact pairs whose doc pair also
    // band-collides (the LSH verify uses the same shingle Jaccard, so the
    // caught set is exactly the intersection)
    "lsh_recall" ->
      s"""$minhashCtes,
         |sets AS (SELECT doc_id, list_distinct(sh) AS st FROM s),
         |sizes AS (SELECT doc_id, CAST(len(st) AS BIGINT) AS n FROM sets),
         |ex AS (SELECT doc_id, unnest(st) AS x FROM sets),
         |pairs AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2,
         |  CAST(COUNT(*) AS BIGINT) AS inter
         | FROM ex a JOIN ex b ON a.x = b.x AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |exact AS (SELECT id_1, id_2,
         |  CAST(floor(inter * 10000.0 / (na.n + nb.n - inter)) AS BIGINT) AS jaccard_bp
         | FROM pairs JOIN sizes na ON id_1 = na.doc_id JOIN sizes nb ON id_2 = nb.doc_id
         | WHERE CAST(floor(inter * 10000.0 / (na.n + nb.n - inter)) AS BIGINT) >= 1),
         |mf AS (SELECT m.* FROM m JOIN s USING (doc_id) WHERE len(s.sh) > 0),
         |bands AS (${(0 until Bands).map(b => s"SELECT doc_id, $b AS bi, ${bandE(b)} AS k FROM mf").mkString(" UNION ALL ")}),
         |cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
         | FROM bands a JOIN bands b ON a.bi = b.bi AND a.k = b.k AND a.doc_id < b.doc_id),
         |bucketed AS (SELECT id_1, id_2, least(jaccard_bp, 9999) // 1000 AS bucket
         | FROM exact),
         |n_all AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_exact
         | FROM bucketed GROUP BY bucket),
         |n_caught AS (SELECT b.bucket, CAST(COUNT(*) AS BIGINT) AS n_caught
         | FROM bucketed b JOIN cand c ON b.id_1 = c.id_1 AND b.id_2 = c.id_2
         | GROUP BY b.bucket)
         |SELECT a.bucket, a.n_exact, coalesce(c.n_caught, 0) AS n_caught,
         | CAST(coalesce(c.n_caught, 0) * 10000 // a.n_exact AS BIGINT) AS recall_bp
         |FROM n_all a LEFT JOIN n_caught c ON a.bucket = c.bucket
         |ORDER BY a.bucket""".stripMargin,

    // near-duplicate pair counts by (source, source) — which domains mirror
    // each other; pair legs joined back to documents for their sources
    "neardup_by_source" ->
      s"""WITH nd AS ($minhashNearDupSql)
         |SELECT least(da.source, db.source) AS source_1,
         | greatest(da.source, db.source) AS source_2,
         | CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM nd JOIN documents da ON nd.id_1 = da.doc_id
         |JOIN documents db ON nd.id_2 = db.doc_id
         |GROUP BY 1, 2 ORDER BY n_pairs DESC, source_1, source_2""".stripMargin,

    // min reachable id via recursive closure over the symmetric pair graph
    "neardup_components" ->
      s"""${minhashCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}, $componentCtes
         |SELECT doc_id, component FROM comp ORDER BY doc_id""".stripMargin,

    // per-label centroid in the dimension-exploded layout, exact integer
    // squared-L2 distance, 3 farthest per label flagged (// truncates
    // toward zero in DuckDB, matching Spark's div on negative sums)
    "embedding_outliers" ->
      s"""WITH q AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |  $quantE AS v FROM embeddings),
         |dims AS (SELECT vec_id, label, CAST(t.i AS BIGINT) AS dim, v[t.i + 1] AS qv
         | FROM q, UNNEST(range(len(v))) AS t(i)),
         |cent AS (SELECT label, dim,
         |  CAST(SUM(qv) AS BIGINT) // COUNT(*) AS cv FROM dims GROUP BY 1, 2),
         |dist AS (SELECT d.vec_id, d.label,
         |  CAST(SUM((d.qv - c.cv) * (d.qv - c.cv)) AS BIGINT) AS dist
         | FROM dims d JOIN cent c ON d.label = c.label AND d.dim = c.dim
         | GROUP BY 1, 2),
         |r AS (SELECT vec_id, label, dist,
         |  row_number() OVER (PARTITION BY label ORDER BY dist DESC, vec_id) AS rn
         | FROM dist)
         |SELECT vec_id, label, dist, rn <= 3 AS is_outlier
         |FROM r ORDER BY vec_id""".stripMargin,

    // exactly 5 eval docs per source, picked by ranking the stable hash
    "quota_split" ->
      s"""WITH h AS (SELECT doc_id, source,
         |  doc_id % $P * $TokenHashA % $P AS hv FROM documents),
         |r AS (SELECT doc_id, source,
         |  row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn
         | FROM h)
         |SELECT doc_id, source,
         | CASE WHEN rn <= 5 THEN 'eval' ELSE 'train' END AS split
         |FROM r ORDER BY doc_id""".stripMargin,

    // Unicode NFC composition; the injected decomposed accent makes the
    // normalization live on the ASCII corpus (n_chars shrinks by one)
    "nfc_normalize" ->
      """WITH raw AS (SELECT doc_id, 'e' || chr(769) || ' ' || text AS raw
        | FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS nfc_text,
        | length(raw) AS n_chars_raw,
        | length(nfc_normalize(raw)) AS n_chars_nfc
        |FROM raw ORDER BY doc_id""".stripMargin,

    // per-source mean ensemble quality in millis; sources under the
    // threshold gate out all their docs (the two-level domain filter)
    "domain_gate" ->
      s"""WITH $qualityCtes,
         |sc AS (SELECT d.doc_id, d.source, q.score
         | FROM documents d JOIN qscored q ON d.doc_id = q.doc_id),
         |bys AS (SELECT source,
         |  CAST(SUM(score) AS BIGINT) * 1000 // COUNT(*) AS source_mean_millis
         | FROM sc GROUP BY source)
         |SELECT sc.doc_id, sc.source, sc.score, b.source_mean_millis,
         | b.source_mean_millis >= 3400000 AS keep
         |FROM sc JOIN bys b ON sc.source = b.source
         |ORDER BY sc.doc_id""".stripMargin,

    // fastText-shaped hashed linear model: tokens -> 1024 feature buckets,
    // deterministic integer weights, per-doc logit sum, keep = logit >= 0
    "quality_logit" ->
      s"""WITH toks AS (SELECT doc_id, unnest(${tokensOf("text")}) AS tok FROM documents),
         |f AS (SELECT doc_id,
         |  (length(tok) * $WordBase + ascii(tok)) % 1024 AS feature FROM toks),
         |w AS (SELECT CAST(t.i AS BIGINT) AS feature,
         |  t.i * $TokenHashA % $P % 17 - 8 AS weight
         | FROM UNNEST(range(1024)) AS t(i))
         |SELECT f.doc_id, COUNT(*) AS n_tokens,
         | CAST(SUM(w.weight) AS BIGINT) AS logit,
         | CAST(SUM(w.weight) AS BIGINT) >= 0 AS keep
         |FROM f JOIN w USING (feature)
         |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin,

    // batch-perceptron training (LinearModel.train): labels distilled
    // from the quality ensemble (score >= 3500), three synchronous
    // integer gradient folds over the 1024-bucket hashed feature counts,
    // w_{t+1} = w_t + sum((y - [logit_t >= 0]) * count). Dense output.
    "quality_train" ->
      s"""WITH $trainCtes
         |SELECT feature, w AS weight FROM tw3 ORDER BY feature""".stripMargin,

    // train -> infer round trip: score the corpus with the weights the
    // perceptron chain just learned (quality_logit's plumbing, tw3's
    // weights)
    "quality_train_infer" ->
      s"""WITH $trainCtes,
         |qf AS (SELECT doc_id,
         |  (length(tok) * $WordBase + ascii(tok)) % 1024 AS feature FROM ttoks)
         |SELECT qf.doc_id, COUNT(*) AS n_tokens,
         | CAST(SUM(w.w) AS BIGINT) AS logit,
         | CAST(SUM(w.w) AS BIGINT) >= 0 AS keep
         |FROM qf JOIN tw3 w USING (feature)
         |GROUP BY qf.doc_id ORDER BY qf.doc_id""".stripMargin,

    // 2-core of the near-dup graph: 4 peel rounds unrolled as plain CTEs
    // (peeling has a unique fixpoint and near-dup clusters settle in 1-2
    // rounds, so a constant unroll replays KCore.run exactly)
    "kcore_docs" -> {
      val peel = (1 to 4).map { i =>
        s"""d$i AS (SELECT u, COUNT(*) AS c FROM alive${i - 1} GROUP BY u),
           |k$i AS (SELECT u FROM d$i WHERE c >= 2),
           |alive$i AS (SELECT e.u, e.v FROM alive${i - 1} e
           | JOIN k$i a ON e.u = a.u JOIN k$i b ON e.v = b.u)""".stripMargin
      }.mkString(",\n")
      s"""$minhashCtes, $edgeCtes,
         |alive0 AS (SELECT u, v FROM edges),
         |$peel
         |SELECT u AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_degree
         |FROM alive4 GROUP BY u ORDER BY doc_id""".stripMargin
    },

    // the one-table dedup audit: every method's removal mass side by side
    "dedup_report" ->
      s"""${minhashCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}, $componentCtes,
         |near_r AS (SELECT 'near_lsh' AS method,
         |  CAST(COUNT(*) FILTER (WHERE doc_id <> component) AS BIGINT) AS docs_affected,
         |  CAST(COUNT(*) FILTER (WHERE doc_id <> component) AS BIGINT) AS units_removed,
         |  'docs' AS unit FROM comp),
         |ex_r AS (SELECT 'exact' AS method,
         |  CAST(SUM(n_dups - 1) AS BIGINT) AS docs_affected,
         |  CAST(SUM(n_dups - 1) AS BIGINT) AS units_removed,
         |  'docs' AS unit FROM (
         |   SELECT COUNT(*) AS n_dups FROM documents GROUP BY text)),
         |ch_tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |ch_idx AS (SELECT doc_id, tk, unnest(range(((len(tk) - 1) // 32) + 1)) AS ci
         | FROM ch_tk),
         |ch AS (SELECT doc_id, ci,
         |  array_to_string(list_slice(tk, ci * 32 + 1, ci * 32 + 32), ' ') AS chunk
         | FROM ch_idx),
         |ch_f AS (SELECT doc_id,
         |  (row_number() OVER (PARTITION BY chunk ORDER BY doc_id, ci) = 1) AS keep
         | FROM ch),
         |ch_d AS (SELECT doc_id, COUNT(*) AS n_chunks,
         |  SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept FROM ch_f GROUP BY doc_id),
         |ch_r AS (SELECT 'chunk32' AS method,
         |  CAST(SUM(CASE WHEN n_kept < n_chunks THEN 1 ELSE 0 END) AS BIGINT)
         |   AS docs_affected,
         |  CAST(SUM(n_chunks - n_kept) AS BIGINT) AS units_removed,
         |  'chunks' AS unit FROM ch_d),
         |sp_g AS (SELECT doc_id, CAST(t.p AS BIGINT) AS pos,
         |  array_to_string(list_slice(tk, t.p + 1, t.p + 8), ' ') AS gram
         | FROM ch_tk, UNNEST(range(len(tk) - 7)) AS t(p) WHERE len(tk) >= 8),
         |sp_red AS (SELECT doc_id, pos FROM (
         |  SELECT doc_id, pos,
         |   row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
         |  FROM sp_g) WHERE rn > 1),
         |sp_cov AS (SELECT DISTINCT doc_id, pos + u.i AS cpos
         | FROM sp_red, UNNEST(range(8)) AS u(i)),
         |sp_r AS (SELECT 'span8' AS method,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS docs_affected,
         |  CAST(COUNT(*) AS BIGINT) AS units_removed,
         |  'tokens' AS unit FROM sp_cov)
         |SELECT * FROM ex_r UNION ALL SELECT * FROM near_r
         |UNION ALL SELECT * FROM ch_r UNION ALL SELECT * FROM sp_r
         |ORDER BY method""".stripMargin,

    "neardup_cluster_sizes" ->
      s"""${minhashCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}, $componentCtes,
         |csz AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
         | FROM comp GROUP BY 1)
         |SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
         |FROM csz GROUP BY 1 ORDER BY cluster_size""".stripMargin,

    "ivf_balance" ->
      s"""WITH ${ivfAssignCtes()},
         |occ AS (SELECT list, CAST(COUNT(*) AS BIGINT) AS n_vectors
         | FROM assign GROUP BY 1),
         |ls AS (SELECT CAST(t.l AS BIGINT) AS list FROM UNNEST(range(16)) AS t(l)),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM e)
         |SELECT ls.list, COALESCE(occ.n_vectors, 0) AS n_vectors,
         | COALESCE(occ.n_vectors, 0) * 10000 // tot.n_total AS share_bp
         |FROM ls LEFT JOIN occ ON occ.list = ls.list CROSS JOIN tot
         |ORDER BY ls.list""".stripMargin,

    "cluster_best" ->
      s"""${minhashCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}, $componentCtes,
         |$qualityCtes,
         |allc AS (SELECT d.doc_id, coalesce(cp.component, d.doc_id) AS component
         | FROM documents d LEFT JOIN comp cp ON cp.doc_id = d.doc_id),
         |rb AS (SELECT a.doc_id, a.component, q.score,
         |  row_number() OVER (PARTITION BY a.component
         |   ORDER BY q.score DESC, a.doc_id ASC) AS rn
         | FROM allc a JOIN qscored q ON q.doc_id = a.doc_id)
         |SELECT doc_id, component, score, rn = 1 AS is_rep
         |FROM rb ORDER BY doc_id""".stripMargin,

    // fixed-point PageRank, 3 iterations unrolled as plain CTEs (no
    // recursion needed for a constant iteration count); every division is
    // a floor over non-negative BIGINTs, so // here == Spark's div there
    "doc_pagerank" -> {
      val bandSelects = (0 until Bands).map { b =>
        s"SELECT doc_id, $b AS bi, ${bandE(b)} AS k FROM mf"
      }.mkString(" UNION ALL ")
      val iterCtes = (1 to 3).map { i =>
        s"""prc$i AS (SELECT e.dst AS id,
           |  CAST(SUM((r.r * 85) // (100 * prd.d)) AS BIGINT) AS s
           | FROM pre e JOIN pr${i - 1} r ON e.src = r.id
           | JOIN prd ON prd.src = e.src GROUP BY e.dst),
           |pr$i AS (SELECT d.doc_id AS id, prb.base + COALESCE(c.s, 0) AS r
           | FROM documents d CROSS JOIN prb LEFT JOIN prc$i c ON c.id = d.doc_id)""".stripMargin
      }.mkString(",\n")
      s"""$minhashCtes, mf AS (SELECT m.* FROM m JOIN s USING (doc_id) WHERE len(s.sh) > 0), bands AS ($bandSelects),
         |prp AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
         | FROM bands a JOIN bands b ON a.bi = b.bi AND a.k = b.k AND a.doc_id < b.doc_id),
         |pre AS (SELECT id_1 AS src, id_2 AS dst FROM prp
         | UNION ALL SELECT id_2, id_1 FROM prp),
         |prd AS (SELECT src, COUNT(*) AS d FROM pre GROUP BY src),
         |prn AS (SELECT COUNT(*) AS n FROM documents),
         |prb AS (SELECT (1000000000::BIGINT * 15 // 100) // n AS base,
         |  1000000000::BIGINT // n AS r0 FROM prn),
         |pr0 AS (SELECT doc_id AS id, prb.r0 AS r FROM documents CROSS JOIN prb),
         |$iterCtes
         |SELECT id AS doc_id, r AS rank_fp FROM pr3 ORDER BY doc_id""".stripMargin
    },

    // Heaps curve: shingle -> first doc, counted under a prefix ladder
    "vocab_growth" ->
      s"""WITH c AS (SELECT doc_id, $codesE AS codes FROM documents),
         |sx AS (SELECT doc_id, $shinglesE AS sh FROM c),
         |f AS (SELECT w, MIN(doc_id) AS fd FROM (
         | SELECT doc_id, unnest(list_distinct(sh)) AS w FROM sx)
         | GROUP BY w),
         |p AS (SELECT CAST(t.p AS BIGINT) AS prefix_docs
         | FROM UNNEST([16, 64, 256, 1024, 4096, 16384, 65536]) AS t(p))
         |SELECT prefix_docs,
         | CAST(SUM(CASE WHEN fd < prefix_docs THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_distinct_tokens
         |FROM f CROSS JOIN p GROUP BY prefix_docs
         |ORDER BY prefix_docs""".stripMargin,

    // bottom-k sample + KMV estimate: same three-round mix as the HLL,
    // est = (k-1) * P // h_k with h_k = max hash among the kept k
    "kmv_bottomk" ->
      s"""WITH ${mixCtes("source, doc_id")},
         |r AS (SELECT source, doc_id, h,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
         |   AS BIGINT) AS pos FROM x),
         |kept AS (SELECT * FROM r WHERE pos <= 10)
         |SELECT source, pos, doc_id, h,
         | 9::BIGINT * $P // MAX(h) OVER (PARTITION BY source) AS kmv_est
         |FROM kept ORDER BY source, pos""".stripMargin,

    // mergeable bottom-64 hash-sample quantiles: same three-round mix as
    // the KMV sketch selects the sample; quantiles are floor-rank order
    // statistics (pos = 1 + (n-1)*q//100) of the sample by (value, id)
    "sample_quantiles" ->
      s"""WITH ${mixCtes("source, doc_id, n_chars")},
         |r AS (SELECT source, doc_id, n_chars,
         |  row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS pos FROM x),
         |kept AS (SELECT * FROM r WHERE pos <= 64),
         |v AS (SELECT source, doc_id, n_chars,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
         |    AS BIGINT) AS vrk,
         |  COUNT(*) OVER (PARTITION BY source) AS ns FROM kept),
         |q AS (SELECT source, MAX(ns) AS n_sample,
         |  MAX(CASE WHEN vrk = 1 + (ns - 1) * 10 // 100 THEN n_chars END) AS p10,
         |  MAX(CASE WHEN vrk = 1 + (ns - 1) * 25 // 100 THEN n_chars END) AS p25,
         |  MAX(CASE WHEN vrk = 1 + (ns - 1) * 50 // 100 THEN n_chars END) AS p50,
         |  MAX(CASE WHEN vrk = 1 + (ns - 1) * 75 // 100 THEN n_chars END) AS p75,
         |  MAX(CASE WHEN vrk = 1 + (ns - 1) * 90 // 100 THEN n_chars END) AS p90
         | FROM v GROUP BY source),
         |c AS (SELECT source, COUNT(*) AS n_rows FROM documents GROUP BY source)
         |SELECT source, n_rows, n_sample, p10, p25, p50, p75, p90
         |FROM q JOIN c USING (source) ORDER BY source""".stripMargin,

    // quantile sketch accuracy gate: exact quantiles from the value
    // histogram, sampled estimate's rank-span error in bp of group size
    "quantile_error" ->
      s"""WITH ${mixCtes("source, doc_id, n_chars")},
         |r AS (SELECT source, doc_id, n_chars,
         |  row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS pos FROM x),
         |kept AS (SELECT * FROM r WHERE pos <= 64),
         |v AS (SELECT source, n_chars,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
         |    AS BIGINT) AS vrk,
         |  COUNT(*) OVER (PARTITION BY source) AS ns FROM kept),
         |est AS (SELECT source,
         |  MAX(CASE WHEN vrk = 1 + (ns - 1) * 25 // 100 THEN n_chars END) AS p25,
         |  MAX(CASE WHEN vrk = 1 + (ns - 1) * 50 // 100 THEN n_chars END) AS p50,
         |  MAX(CASE WHEN vrk = 1 + (ns - 1) * 75 // 100 THEN n_chars END) AS p75
         | FROM v GROUP BY source),
         |el AS (SELECT source, 25 AS q, p25 AS est_v FROM est
         | UNION ALL SELECT source, 50, p50 FROM est
         | UNION ALL SELECT source, 75, p75 FROM est),
         |hist AS (SELECT source, n_chars, COUNT(*) AS cnt
         | FROM documents GROUP BY 1, 2),
         |cum AS (SELECT source, n_chars, cnt,
         |  CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY n_chars) AS BIGINT) AS cum,
         |  CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n FROM hist),
         |pq AS (SELECT g.source, t.q, g.n, 1 + (g.n - 1) * t.q // 100 AS pos
         | FROM (SELECT DISTINCT source, n FROM cum) g
         | CROSS JOIN (VALUES (25), (50), (75)) t(q)),
         |ex AS (SELECT p.source, p.q, p.n, p.pos,
         |  MIN(CASE WHEN c.cum >= p.pos THEN c.n_chars END) AS exact_v
         | FROM pq p JOIN cum c ON c.source = p.source GROUP BY 1, 2, 3, 4),
         |sp AS (SELECT e.source, e.q, e.est_v,
         |  c.cum - c.cnt + 1 AS span_lo, c.cum AS span_hi
         | FROM el e JOIN cum c ON c.source = e.source AND c.n_chars = e.est_v)
         |SELECT x.source, x.q, x.n AS n_rows, x.exact_v, s.est_v,
         |  CAST(GREATEST(GREATEST(s.span_lo - x.pos, x.pos - s.span_hi), 0)
         |    * 10000 // x.n AS BIGINT) AS err_bp
         |FROM ex x JOIN sp s ON s.source = x.source AND s.q = x.q
         |ORDER BY x.source, x.q""".stripMargin,

    // audio frame energies + rolling-hash fingerprint replayed from the
    // same ascii byte positions the fake payload was built from; the fold
    // (acc*131 + e) % M equals sum(e_j * 131^(6-j)) mod M, unrolled here
    "audio_features" -> {
      val pows = (0 to 6).map(k => BigInt(131).pow(6 - k).toLong)
      val powCase = pows.zipWithIndex
        .map { case (p, j) => s"WHEN $j THEN ${p}" }.mkString(" ")
      s"""WITH s AS (SELECT doc_id, substr(text, 1, 32) AS t32 FROM documents
         | WHERE length(text) >= 32 AND octet_length(encode(substr(text, 1, 32))) = 32),
         |w AS (SELECT s.doc_id, t.j AS w_idx,
         |  CAST(SUM(ascii(substr(s.t32, CAST(t.j * 4 + g.i AS INT), 1)))
         |    AS BIGINT) AS energy
         | FROM s, range(0, 7) t(j), range(1, 9) g(i)
         | GROUP BY s.doc_id, t.j),
         |f AS (SELECT doc_id,
         |  CAST(SUM(energy * CASE w_idx $powCase END) % 1000000007 AS BIGINT) AS fp
         | FROM w GROUP BY doc_id)
         |SELECT w.doc_id, w.w_idx, w.energy, f.fp
         |FROM w JOIN f USING (doc_id)
         |ORDER BY doc_id, w_idx""".stripMargin
    },

    // url canonicalization: the oracle DERIVES the expected canonical form
    // analytically from (doc_id, source) — an independent reconstruction,
    // not a second run of the same parser
    "url_canonicalize" ->
      """WITH u AS (SELECT doc_id, source,
        |  CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END AS scheme_raw,
        |  CASE doc_id % 4
        |    WHEN 0 THEN source || '.example.com'
        |    WHEN 1 THEN 'WWW.' || source || '.Example.COM'
        |    WHEN 2 THEN source || '.news.co.uk'
        |    ELSE 'cdn.' || source || '.example.org' END AS host_raw,
        |  CASE doc_id % 5 WHEN 0 THEN ':443' WHEN 1 THEN ':8080' ELSE '' END AS port_raw,
        |  '/Docs/' || doc_id || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END AS path_raw,
        |  CASE doc_id % 3
        |    WHEN 0 THEN '?b=' || (doc_id % 7) || '&utm_source=feed&a=1'
        |    WHEN 1 THEN '?a=1&b=' || (doc_id % 7)
        |    ELSE '?utm_campaign=x&ref=home' END AS query_raw,
        |  CASE WHEN doc_id % 5 = 0 THEN '#Frag' ELSE '' END AS frag_raw
        | FROM documents)
        |SELECT doc_id,
        |  scheme_raw || '://' || host_raw || port_raw || path_raw || query_raw
        |    || frag_raw AS url_raw,
        |  'https://' || lower(host_raw)
        |    || CASE WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END
        |    || '/Docs/' || doc_id
        |    || CASE WHEN doc_id % 3 = 2 THEN ''
        |         ELSE '?a=1&b=' || (doc_id % 7) END AS url_canon
        |FROM u ORDER BY doc_id""".stripMargin,

    // url dedup: all four raw spellings of a page collapse to one key
    "url_dedup" ->
      """WITH k AS (SELECT doc_id,
        |  'https://h' || (doc_id // 4 % 50) || '.example.com/page/'
        |    || (doc_id // 4) AS url_key
        | FROM documents)
        |SELECT url_key, MIN(doc_id) AS keep_doc, COUNT(*) AS n_dups
        |FROM k GROUP BY url_key ORDER BY url_key""".stripMargin,

    // registered-domain stats, pinned against the full PSL-algorithm
    // replay (rules generated from the committed resource)
    "url_domain_stats" ->
      s"""WITH hosts AS (SELECT lower(CASE doc_id % 4
         |   WHEN 0 THEN source || '.example.com'
         |   WHEN 1 THEN 'www.' || source || '.example.com'
         |   WHEN 2 THEN source || '.news.co.uk'
         |   ELSE 'cdn.' || source || '.example.org' END) AS host FROM documents),
         |$pslCtes
         |SELECT p.reg_domain, COUNT(*) AS n_urls, COUNT(DISTINCT h.host) AS n_hosts
         |FROM hosts h JOIN pslrd p USING (host)
         |GROUP BY p.reg_domain ORDER BY reg_domain""".stripMargin,

    // the full PSL rule machinery on one synthetic frontier: normal
    // longest-match, wildcard (*.ck, *.kawasaki.jp), exception (!www.ck,
    // !city.kawasaki.jp), private-section (blogspot.com), the default
    // rule (unknown TLD), and a bare public suffix (null reg_domain)
    "url_psl_domains" ->
      s"""WITH hosts AS (SELECT CASE doc_id % 9
         |   WHEN 0 THEN source || '.example.com'
         |   WHEN 1 THEN source || '.shop.co.uk'
         |   WHEN 2 THEN source || '.web.ck'
         |   WHEN 3 THEN 'www.ck'
         |   WHEN 4 THEN source || '.city.kawasaki.jp'
         |   WHEN 5 THEN source || '.sub.kawasaki.jp'
         |   WHEN 6 THEN source || '.blogspot.com'
         |   WHEN 7 THEN 'cdn.' || source || '.unknowntld'
         |   ELSE 'co.uk' END AS host FROM documents),
         |$pslCtes
         |SELECT h.host, p.public_suffix, p.reg_domain, COUNT(*) AS n_urls
         |FROM hosts h JOIN pslrd p USING (host)
         |GROUP BY 1, 2, 3 ORDER BY host""".stripMargin,

    // cross-run frontier refresh: the canonical key is derived
    // analytically from (doc_id) as in url_dedup; seen keys drop, unseen
    // collapse keep-min within the batch, bad URLs (null key) all survive
    "url_frontier_refresh" ->
      """WITH u AS (SELECT doc_id,
        |  CASE WHEN doc_id % 13 = 0 THEN NULL
        |    ELSE 'https://h' || (doc_id // 4 % 50) || '.example.com/page/'
        |      || (doc_id // 4) END AS key
        | FROM documents),
        |ref AS (SELECT DISTINCT key FROM u WHERE doc_id % 7 < 3 AND key IS NOT NULL),
        |nw AS (SELECT * FROM u WHERE doc_id % 7 >= 3),
        |fresh AS (SELECT * FROM nw
        | WHERE key IS NULL OR key NOT IN (SELECT key FROM ref)),
        |keep AS (SELECT COALESCE(key, ' id:' || doc_id) AS k2,
        |  MIN(doc_id) AS kd FROM fresh GROUP BY 1)
        |SELECT f.doc_id, f.key AS url_key
        |FROM fresh f JOIN keep k ON k.kd = f.doc_id
        |ORDER BY f.doc_id""".stripMargin,

    // majority label propagation, 2 synchronous rounds unrolled; self-vote
    // included, ties to the smallest label — all deterministic
    "label_spread" -> {
      val bandSelects = (0 until Bands).map { b =>
        s"SELECT doc_id, $b AS bi, ${bandE(b)} AS k FROM mf"
      }.mkString(" UNION ALL ")
      val iterCtes = (1 to 2).map { i =>
        s"""v$i AS (SELECT e.dst AS id, l.lab FROM pre e JOIN lp${i - 1} l ON l.id = e.src
           | UNION ALL SELECT id, lab FROM lp${i - 1}),
           |c$i AS (SELECT id, lab, COUNT(*) AS c FROM v$i GROUP BY 1, 2),
           |lp$i AS (SELECT id, lab FROM (SELECT id, lab,
           |  row_number() OVER (PARTITION BY id ORDER BY c DESC, lab ASC) AS rn
           | FROM c$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""$minhashCtes, mf AS (SELECT m.* FROM m JOIN s USING (doc_id) WHERE len(s.sh) > 0), bands AS ($bandSelects),
         |prp AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
         | FROM bands a JOIN bands b ON a.bi = b.bi AND a.k = b.k AND a.doc_id < b.doc_id),
         |pre AS (SELECT id_1 AS src, id_2 AS dst FROM prp
         | UNION ALL SELECT id_2, id_1 FROM prp),
         |lp0 AS (SELECT doc_id AS id, lang AS lab FROM documents),
         |$iterCtes
         |SELECT d.doc_id, d.lang AS seed_lang, lp2.lab AS label,
         | lp2.lab <> d.lang AS changed
         |FROM documents d JOIN lp2 ON lp2.id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // triangle counts are orientation-invariant: the naive ordered 3-way
    // join (a < b < c by id) counts each triangle once, matching the
    // engine's degree-oriented plan exactly
    "triangle_count" -> {
      val bandSelects = (0 until Bands).map { b =>
        s"SELECT doc_id, $b AS bi, ${bandE(b)} AS k FROM mf"
      }.mkString(" UNION ALL ")
      s"""$minhashCtes, mf AS (SELECT m.* FROM m JOIN s USING (doc_id) WHERE len(s.sh) > 0), bands AS ($bandSelects),
         |p AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
         | FROM bands a JOIN bands b ON a.bi = b.bi AND a.k = b.k AND a.doc_id < b.doc_id),
         |tri AS (SELECT x.id_1 AS a, x.id_2 AS b, y.id_2 AS c
         | FROM p x JOIN p y ON y.id_1 = x.id_1 AND y.id_2 > x.id_2
         | JOIN p z ON z.id_1 = x.id_2 AND z.id_2 = y.id_2),
         |tn AS (SELECT t.n AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
         |  SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
         |  UNION ALL SELECT c FROM tri) t GROUP BY 1),
         |dg AS (SELECT t.n, CAST(COUNT(*) AS BIGINT) AS degree FROM (
         |  SELECT id_1 AS n FROM p UNION ALL SELECT id_2 FROM p) t GROUP BY 1)
         |SELECT d.doc_id, COALESCE(dg.degree, 0) AS degree,
         | COALESCE(tn.n_tri, 0) AS n_triangles
         |FROM documents d LEFT JOIN dg ON dg.n = d.doc_id
         |LEFT JOIN tn ON tn.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    "ngram_jaccard_pairs" -> ngramJaccardSql,
    "jaccard_ppjoin" -> ngramJaccardSql,

    // asymmetric containment |A∩B| / min(|A|,|B|) over the same df-capped
    // sets — direct and prefix-filtered plans, one declared semantics
    "containment_pairs" -> containmentSql,
    "containment_ppjoin" -> containmentSql,

    // directional containment: the later doc's set as denominator, best
    // containing earlier doc per flagged doc
    "subset_docs" -> subsetSql,
    "subset_ppjoin" -> subsetSql,

    "ivf_topk" -> ivfTopkSql,

    // recall@k of the refined IVF ANN path against the exact brute-force
    // top-k, at two probe widths from ONE shared candidate chain (rn <= 4
    // and rn <= 6 slices of the same probe ranking) — the quality curve a
    // pipeline reads before picking its scan fraction
    "ann_recall" ->
      s"""WITH ${ivfCandCtes(6)},
         |exact AS ($cosineTopkSql),
         |kk AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS k FROM exact GROUP BY 1),
         |cfg AS (SELECT CAST(unnest([4, 6]) AS BIGINT) AS nprobe),
         |topk AS (SELECT nprobe, query_id, neighbor_id FROM (
         |  SELECT cfg.nprobe, c.query_id, c.neighbor_id,
         |   row_number() OVER (PARTITION BY cfg.nprobe, c.query_id
         |    ORDER BY c.dot DESC, c.neighbor_id ASC) AS rk
         |  FROM cfg JOIN cand c ON c.rn <= cfg.nprobe) WHERE rk <= 10),
         |m AS (SELECT t.nprobe, e.query_id, CAST(COUNT(*) AS BIGINT) AS n_match
         | FROM exact e JOIN topk t USING (query_id, neighbor_id) GROUP BY 1, 2)
         |SELECT kk.query_id, cfg.nprobe, kk.k, coalesce(m.n_match, 0) AS n_match,
         | CAST(coalesce(m.n_match, 0) * 10000 // kk.k AS BIGINT) AS recall_bp
         |FROM kk CROSS JOIN cfg LEFT JOIN m
         | ON m.query_id = kk.query_id AND m.nprobe = cfg.nprobe
         |ORDER BY kk.query_id, cfg.nprobe""".stripMargin,

    "cosine_topk" -> cosineTopkSql,

    "pq_topk" ->
      s"""WITH $pqCtes,
         |r AS (SELECT query_id, neighbor_id, adot,
         | row_number() OVER (PARTITION BY query_id ORDER BY adot DESC, neighbor_id ASC) AS "rank"
         | FROM pscore)
         |SELECT query_id, neighbor_id, adot, "rank" FROM r WHERE "rank" <= 10
         |ORDER BY query_id, "rank"""".stripMargin,

    "pq_recall" ->
      s"""WITH $pqCtes,
         |pshort AS (SELECT query_id, neighbor_id FROM (
         | SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY adot DESC, neighbor_id ASC) AS rk
         | FROM pscore) WHERE rk <= 100),
         |prer AS (SELECT s.query_id, s.neighbor_id, ${dotE("q.v", "c.v")} AS dot
         | FROM pshort s JOIN pe q ON q.vec_id = s.query_id
         | JOIN pe c ON c.vec_id = s.neighbor_id),
         |ptop AS (SELECT query_id, neighbor_id FROM (
         | SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS rk
         | FROM prer) WHERE rk <= 10),
         |exact AS ($cosineTopkSql),
         |kk AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS k FROM exact GROUP BY 1),
         |mm AS (SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_match
         | FROM exact e JOIN ptop t USING (query_id, neighbor_id) GROUP BY 1)
         |SELECT kk.query_id, kk.k, coalesce(mm.n_match, 0) AS n_match,
         | CAST(coalesce(mm.n_match, 0) * 10000 // kk.k AS BIGINT) AS recall_bp
         |FROM kk LEFT JOIN mm ON mm.query_id = kk.query_id
         |ORDER BY kk.query_id""".stripMargin,

    "bq_topk" ->
      s"""WITH $bqCtes,
         |r AS (SELECT query_id, neighbor_id, hamming,
         | row_number() OVER (PARTITION BY query_id ORDER BY hamming ASC, neighbor_id ASC) AS "rank"
         | FROM hs)
         |SELECT query_id, neighbor_id, hamming, "rank" FROM r WHERE "rank" <= 10
         |ORDER BY query_id, "rank"""".stripMargin,

    "bq_recall" ->
      s"""WITH $bqCtes,
         |bshort AS (SELECT query_id, neighbor_id FROM (
         | SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY hamming ASC, neighbor_id ASC) AS rk
         | FROM hs) WHERE rk <= 100),
         |brer AS (SELECT s.query_id, s.neighbor_id, ${dotE("q.v", "c.v")} AS dot
         | FROM bshort s JOIN pe q ON q.vec_id = s.query_id
         | JOIN pe c ON c.vec_id = s.neighbor_id),
         |btop AS (SELECT query_id, neighbor_id FROM (
         | SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS rk
         | FROM brer) WHERE rk <= 10),
         |exact AS ($cosineTopkSql),
         |kk AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS k FROM exact GROUP BY 1),
         |mm AS (SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_match
         | FROM exact e JOIN btop t USING (query_id, neighbor_id) GROUP BY 1)
         |SELECT kk.query_id, kk.k, coalesce(mm.n_match, 0) AS n_match,
         | CAST(coalesce(mm.n_match, 0) * 10000 // kk.k AS BIGINT) AS recall_bp
         |FROM kk LEFT JOIN mm ON mm.query_id = kk.query_id
         |ORDER BY kk.query_id""".stripMargin,

    "blocklist_filter" -> {
      val termsLit = Queries.BlockTerms.map(t => s"'$t'").mkString("[", ", ", "]")
      val phraseCases = Queries.BlockPhrases.map(p =>
        s"(CASE WHEN contains(text, '$p') THEN ['$p'] ELSE CAST([] AS VARCHAR[]) END)")
        .mkString(" || ")
      s"""WITH h AS (SELECT doc_id,
         |  list_sort(list_intersect(list_distinct($tokensE), $termsLit) ||
         |   $phraseCases) AS hits
         | FROM documents)
         |SELECT doc_id, coalesce(array_to_string(hits, ','), '') AS hits,
         | CAST(len(hits) AS BIGINT) AS n_hits, len(hits) > 0 AS blocked
         |FROM h ORDER BY doc_id""".stripMargin
    },

    "heavy_hitters" -> {
      val seedRows = (0 until 4)
        .map(j => s"($j, ${Hashing.A(j)}, ${Hashing.B(j)})").mkString(", ")
      s"""WITH tok AS (SELECT unnest($tokensE) AS w FROM documents),
         |exact AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS exact_cnt,
         |  length(w) * $WordBase + ascii(w) AS code FROM tok GROUP BY w),
         |seeds AS (SELECT * FROM (VALUES $seedRows) t(j, a, bb)),
         |jb AS (SELECT e.w, e.exact_cnt, s.j,
         |  ((e.code % $P) * s.a + s.bb) % $P % 256 AS b
         | FROM exact e CROSS JOIN seeds s),
         |counters AS (SELECT j, b, CAST(SUM(exact_cnt) AS BIGINT) AS cnt
         | FROM jb GROUP BY 1, 2),
         |est AS (SELECT jb.w, jb.exact_cnt, MIN(c.cnt) AS est_cnt
         | FROM jb JOIN counters c USING (j, b) GROUP BY 1, 2),
         |tot AS (SELECT CAST(SUM(exact_cnt) AS BIGINT) AS n FROM exact)
         |SELECT w AS token, exact_cnt, est_cnt,
         | est_cnt * 10000 >= n * 300 AS heavy,
         | est_cnt >= exact_cnt AS sound
         |FROM est CROSS JOIN tot ORDER BY token""".stripMargin
    },

    // integer HLL: register index h%64, rank 26 - bitlength(h//64) via the
    // bin()-string trick (identical in both engines), fixed-point alpha
    // estimate over the dense 64-register vector
    "hll_distinct" ->
      s"""WITH c AS (SELECT source, $codesE AS codes FROM documents),
         |s AS (SELECT source, $shinglesE AS sh FROM c),
         |x0 AS (SELECT source, (t.v % $P) * $TokenHashA % $P AS a1
         | FROM s, UNNEST(sh) AS t(v)),
         |x1 AS (SELECT source, xor(a1, a1 >> 15) % $P * $TokenHashB % $P AS a3 FROM x0),
         |x AS (SELECT source, xor(a3, a3 >> 13) % $P * $TokenHashA % $P AS h FROM x1),
         |reg AS (SELECT source, h % 64 AS b,
         |  MAX(CASE WHEN h // 64 = 0 THEN 26
         |      ELSE 26 - length(bin(h // 64)) END) AS m
         | FROM x GROUP BY 1, 2),
         |gs AS (SELECT DISTINCT source FROM x),
         |dense AS (SELECT gs.source, CAST(t.b AS BIGINT) AS b, COALESCE(reg.m, 0) AS m
         | FROM gs CROSS JOIN UNNEST(range(64)) AS t(b)
         | LEFT JOIN reg ON reg.source = gs.source AND reg.b = t.b),
         |agg AS (SELECT source, CAST(SUM(1073741824 // (1 << m)) AS BIGINT) AS s,
         |  CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero
         | FROM dense GROUP BY 1),
         |ex AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_values,
         |  CAST(COUNT(DISTINCT h) AS BIGINT) AS exact_distinct FROM x GROUP BY 1)
         |SELECT ex.source, n_values, exact_distinct,
         | (2904064::BIGINT * 1073741824) // (1000 * agg.s) AS hll_est, v_zero,
         | abs((2904064::BIGINT * 1073741824) // (1000 * agg.s) - exact_distinct) * 10000
         |   // exact_distinct AS err_bp
         |FROM ex JOIN agg ON ex.source = agg.source
         |ORDER BY ex.source""".stripMargin,

    "hard_negatives" ->
      s"""WITH ${ivfCandCtes(4)},
         |lab AS (SELECT vec_id, label FROM embeddings),
         |neg AS (SELECT c.query_id, c.neighbor_id, l2.label, c.dot
         | FROM cand c
         | JOIN lab l1 ON l1.vec_id = c.query_id
         | JOIN lab l2 ON l2.vec_id = c.neighbor_id
         | WHERE l1.label <> l2.label),
         |r AS (SELECT query_id, neighbor_id, label, dot,
         | row_number() OVER (PARTITION BY query_id
         |  ORDER BY dot DESC, neighbor_id ASC) AS "rank"
         | FROM neg)
         |SELECT query_id, neighbor_id, label, dot, "rank" FROM r
         |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,

    // all-vectors kNN through the same replayed IVF chain (querySel TRUE)
    "knn_graph" ->
      s"""WITH ${ivfCandCtes(4, "TRUE")},
         |r AS (SELECT query_id, neighbor_id, dot,
         |  row_number() OVER (PARTITION BY query_id
         |   ORDER BY dot DESC, neighbor_id ASC) AS rnk FROM cand)
         |SELECT query_id AS vec_id, neighbor_id, dot, rnk AS "rank" FROM r
         |WHERE rnk <= 5 ORDER BY vec_id, rnk""".stripMargin,

    // the nlist-scaling knob measured: same kNN graph at nlist=64 (probe
    // fraction 1/16 instead of 1/4) — the index sizing a production corpus
    // grows with n
    "knn_graph_scaled" ->
      s"""WITH ${ivfCandCtes(4, "TRUE", nlist = 64)},
         |r AS (SELECT query_id, neighbor_id, dot,
         |  row_number() OVER (PARTITION BY query_id
         |   ORDER BY dot DESC, neighbor_id ASC) AS rnk FROM cand)
         |SELECT query_id AS vec_id, neighbor_id, dot, rnk AS "rank" FROM r
         |WHERE rnk <= 5 ORDER BY vec_id, rnk""".stripMargin,

    // mutual-kNN reciprocity filter, then min-reachable-id components
    "knn_clusters" ->
      s"""WITH RECURSIVE ${ivfCandCtes(4, "TRUE")},
         |knn AS (SELECT query_id, neighbor_id FROM (
         | SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id
         |   ORDER BY dot DESC, neighbor_id ASC) AS rnk FROM cand) WHERE rnk <= 5),
         |mut AS (SELECT a.query_id AS id_1, a.neighbor_id AS id_2
         | FROM knn a JOIN knn b
         |  ON a.query_id = b.neighbor_id AND a.neighbor_id = b.query_id
         | WHERE a.query_id < a.neighbor_id),
         |medges AS (SELECT id_1 AS u, id_2 AS v FROM mut
         |           UNION SELECT id_2, id_1 FROM mut),
         |mreach(node, lab) AS (
         |  SELECT u, u FROM medges
         |  UNION
         |  SELECT e.u, r.lab FROM medges e JOIN mreach r ON r.node = e.v),
         |mcomp AS (SELECT node AS vec_id, MIN(lab) AS component
         | FROM mreach GROUP BY node)
         |SELECT vec_id, component FROM mcomp ORDER BY vec_id""".stripMargin,

    "ivfpq_topk" ->
      s"""WITH $ivfpqCtes
         |SELECT query_id, neighbor_id, dot, rnk AS "rank" FROM iptop
         |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,

    "ivfpq_recall" ->
      s"""WITH $ivfpqCtes,
         |itop AS (SELECT query_id, neighbor_id FROM iptop WHERE rnk <= 10),
         |exact AS (SELECT query_id, neighbor_id FROM (
         | SELECT q.query_id, e.vec_id AS neighbor_id,
         |  row_number() OVER (PARTITION BY q.query_id
         |   ORDER BY ${dotE("q.qv", "e.v")} DESC, e.vec_id ASC) AS rk
         | FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id) WHERE rk <= 10),
         |kk AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS k FROM exact GROUP BY 1),
         |mm AS (SELECT x.query_id, CAST(COUNT(*) AS BIGINT) AS n_match
         | FROM exact x JOIN itop t USING (query_id, neighbor_id) GROUP BY 1)
         |SELECT kk.query_id, kk.k, coalesce(mm.n_match, 0) AS n_match,
         | CAST(coalesce(mm.n_match, 0) * 10000 // kk.k AS BIGINT) AS recall_bp
         |FROM kk LEFT JOIN mm ON mm.query_id = kk.query_id
         |ORDER BY kk.query_id""".stripMargin,

    // per-query mean/max |adot - exact dot| over every corpus vector
    "pq_distortion" ->
      s"""WITH $pqCtes,
         |exd AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  ${dotE("q.v", "c.v")} AS dot
         | FROM pe q JOIN pe c ON c.vec_id <> q.vec_id WHERE q.vec_id < 8),
         |er AS (SELECT p.query_id, abs(p.adot - exd.dot) AS err
         | FROM pscore p JOIN exd USING (query_id, neighbor_id))
         |SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n,
         | CAST(CAST(SUM(err) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_abs_err,
         | CAST(MAX(err) AS BIGINT) AS max_abs_err
         |FROM er GROUP BY 1 ORDER BY query_id""".stripMargin,

    "embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id AS id, $quantE AS v FROM embeddings),
         |b AS (SELECT id, v, $srpBucketE AS bucket FROM e),
         |p AS (SELECT l.id AS id_1, r.id AS id_2, ${dotE("l.v", "r.v")} AS dot
         | FROM b l JOIN b r ON l.bucket = r.bucket AND l.id < r.id)
         |SELECT id_1, id_2, dot FROM p WHERE dot >= 400000
         |ORDER BY id_1, id_2""".stripMargin,

    // SemDeDup: IVF assignment (same deterministic quantizer as ivf_topk),
    // then within-cluster smaller-id twin above the dot threshold => drop
    "semantic_dedup" ->
      s"""WITH e AS (SELECT vec_id, $quantE AS v FROM embeddings),
         |cent0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS l, v AS c FROM cent0),
         |ascore AS (SELECT e.vec_id, e.v, cent.l, ${dotE("e.v", "cent.c")} AS s
         | FROM e CROSS JOIN cent),
         |assign AS (SELECT vec_id, v, l AS list FROM (
         | SELECT vec_id, v, l,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, l ASC) AS rn
         | FROM ascore) WHERE rn = 1),
         |dup AS (SELECT DISTINCT x.vec_id
         | FROM assign x JOIN assign y ON x.list = y.list AND x.vec_id > y.vec_id
         | WHERE ${dotE("x.v", "y.v")} >= 400000)
         |SELECT a.vec_id, CAST(a.list AS BIGINT) AS list, (d.vec_id IS NULL) AS keep
         |FROM assign a LEFT JOIN dup d ON a.vec_id = d.vec_id
         |ORDER BY a.vec_id""".stripMargin,

    // corpus-global keep-first dedup of 32-token chunks, docs re-assembled
    "chunk_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |idx AS (SELECT doc_id, tk, unnest(range(((len(tk) - 1) // 32) + 1)) AS chunk_idx
        | FROM toks),
        |chunks AS (SELECT doc_id, chunk_idx,
        |  array_to_string(list_slice(tk, chunk_idx * 32 + 1, chunk_idx * 32 + 32), ' ') AS chunk
        | FROM idx),
        |flagged AS (SELECT doc_id, chunk_idx, chunk,
        |  (row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) = 1) AS keep
        | FROM chunks)
        |SELECT doc_id, COUNT(*) AS n_chunks,
        | CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | COALESCE(string_agg(chunk, ' ' ORDER BY chunk_idx) FILTER (WHERE keep), '') AS dedup_text
        |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // position-level exact substring dedup: 8-token sliding anchors,
    // corpus-wide keep-first, redundant spans excised token by token
    "span_dedup" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |grams AS (SELECT doc_id, CAST(t.p AS BIGINT) AS pos,
        |  array_to_string(list_slice(tk, t.p + 1, t.p + 8), ' ') AS gram
        | FROM tk, UNNEST(range(len(tk) - 7)) AS t(p) WHERE len(tk) >= 8),
        |red AS (SELECT doc_id, pos FROM (
        |  SELECT doc_id, pos,
        |   row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |  FROM grams) WHERE rn > 1),
        |covered AS (SELECT DISTINCT doc_id, pos + u.i AS cpos
        | FROM red, UNNEST(range(8)) AS u(i)),
        |toks AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos, tk[t.i + 1] AS tok
        | FROM tk, UNNEST(range(len(tk))) AS t(i))
        |SELECT t.doc_id, COUNT(*) AS n_tokens,
        | CAST(SUM(CASE WHEN c.cpos IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
        | COALESCE(string_agg(tok, ' ' ORDER BY t.pos) FILTER (WHERE c.cpos IS NULL), '')
        |  AS dedup_text
        |FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.cpos
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    // boilerplate-capped span dedup: keep-first semantics, except grams
    // occurring more than SpanGramMaxOcc times lose every occurrence
    "span_dedup_capped" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |grams AS (SELECT doc_id, CAST(t.p AS BIGINT) AS pos,
        |  array_to_string(list_slice(tk, t.p + 1, t.p + 8), ' ') AS gram
        | FROM tk, UNNEST(range(len(tk) - 7)) AS t(p) WHERE len(tk) >= 8),
        |red AS (SELECT doc_id, pos FROM (
        |  SELECT doc_id, pos,
        |   row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn,
        |   COUNT(*) OVER (PARTITION BY gram) AS occ
        |  FROM grams) WHERE occ > ${Queries.SpanGramMaxOcc} OR rn > 1),
        |covered AS (SELECT DISTINCT doc_id, pos + u.i AS cpos
        | FROM red, UNNEST(range(8)) AS u(i)),
        |toks AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos, tk[t.i + 1] AS tok
        | FROM tk, UNNEST(range(len(tk))) AS t(i))
        |SELECT t.doc_id, COUNT(*) AS n_tokens,
        | CAST(SUM(CASE WHEN c.cpos IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
        | COALESCE(string_agg(tok, ' ' ORDER BY t.pos) FILTER (WHERE c.cpos IS NULL), '')
        |  AS dedup_text
        |FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.cpos
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    // cross-corpus span excision vs the src0 reference: batch positions
    // inside an 8-gram the reference contains are removed, docs re-assembled
    "span_excise_ref" ->
      """WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
        |grams AS (SELECT doc_id, source, CAST(t.p AS BIGINT) AS pos,
        |  array_to_string(list_slice(tk, t.p + 1, t.p + 8), ' ') AS gram
        | FROM tk, UNNEST(range(len(tk) - 7)) AS t(p) WHERE len(tk) >= 8),
        |bench AS (SELECT DISTINCT gram FROM grams WHERE source = 'src0'),
        |hit AS (SELECT g.doc_id, g.pos FROM grams g JOIN bench b USING (gram)
        | WHERE g.source <> 'src0'),
        |covered AS (SELECT DISTINCT doc_id, pos + u.i AS cpos
        | FROM hit, UNNEST(range(8)) AS u(i)),
        |toks AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos, tk[t.i + 1] AS tok
        | FROM tk, UNNEST(range(len(tk))) AS t(i) WHERE source <> 'src0')
        |SELECT t.doc_id, COUNT(*) AS n_tokens,
        | CAST(SUM(CASE WHEN c.cpos IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
        | COALESCE(string_agg(tok, ' ' ORDER BY t.pos) FILTER (WHERE c.cpos IS NULL), '')
        |  AS dedup_text
        |FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.cpos
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    // span-level decontamination vs the src0 pseudo-benchmark: per training
    // doc, token positions inside an 8-gram the benchmark also contains
    "contamination_spans" ->
      """WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
        |grams AS (SELECT doc_id, source, CAST(t.p AS BIGINT) AS pos,
        |  array_to_string(list_slice(tk, t.p + 1, t.p + 8), ' ') AS gram
        | FROM tk, UNNEST(range(len(tk) - 7)) AS t(p) WHERE len(tk) >= 8),
        |bench AS (SELECT DISTINCT gram FROM grams WHERE source = 'src0'),
        |hit AS (SELECT g.doc_id, g.pos FROM grams g JOIN bench b USING (gram)
        | WHERE g.source <> 'src0'),
        |covered AS (SELECT DISTINCT doc_id, pos + u.i AS cpos
        | FROM hit, UNNEST(range(8)) AS u(i)),
        |cnt AS (SELECT doc_id, COUNT(*) AS contaminated_tokens
        | FROM covered GROUP BY doc_id)
        |SELECT d.doc_id,
        | CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        | COALESCE(c.contaminated_tokens, 0) AS contaminated_tokens
        |FROM documents d LEFT JOIN cnt c ON d.doc_id = c.doc_id
        |WHERE d.source <> 'src0'
        |ORDER BY d.doc_id""".stripMargin,

    "cdc_chunks" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |toks AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos, tk[t.i + 1] AS tok
        | FROM tk, UNNEST(range(len(tk))) AS t(i)),
        |flags AS (SELECT doc_id, pos, tok,
        |  CASE WHEN (length(tok)*$WordBase + ascii(tok)) % 13 = 0 THEN 1 ELSE 0 END AS flag
        | FROM toks),
        |cids AS (SELECT doc_id, pos, tok,
        |  COALESCE(CAST(SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS chunk_id
        | FROM flags),
        |chunks AS (SELECT doc_id, chunk_id, string_agg(tok, ' ' ORDER BY pos) AS chunk
        | FROM cids GROUP BY 1, 2),
        |flagged AS (SELECT doc_id, chunk_id, chunk,
        |  (row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_id) = 1) AS keep
        | FROM chunks)
        |SELECT doc_id, COUNT(*) AS n_chunks,
        | CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | COALESCE(string_agg(chunk, ' ' ORDER BY chunk_id) FILTER (WHERE keep), '') AS dedup_text
        |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // purchases joined to the containing click session of the same user
    "range_join" ->
      """WITH x AS (SELECT user_id, ts, event_id,
        |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) > 172800000000
        |   THEN 1 ELSE 0 END AS flag
        | FROM events WHERE event_type = 'click'),
        |y AS (SELECT user_id, ts,
        |  SUM(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS UNBOUNDED PRECEDING) AS session_id
        | FROM x),
        |sess AS (SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  MIN(epoch_us(ts)) AS session_start_us,
        |  MAX(epoch_us(ts)) AS session_end_us,
        |  COUNT(*) AS n_events
        | FROM y GROUP BY 1, 2),
        |p AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        | FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.event_id, p.ts_us, s.session_id,
        | s.session_start_us, s.session_end_us, s.n_events
        |FROM p JOIN sess s ON p.user_id = s.user_id
        | AND p.ts_us BETWEEN s.session_start_us AND s.session_end_us
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    // cross-user overlapping 2-day-gap sessions with the overlap window
    // (the naive quadratic overlap join the bucketized plan must equal)
    "interval_overlap" ->
      """WITH x AS (SELECT user_id, ts, event_id,
        |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) > 172800000000
        |   THEN 1 ELSE 0 END AS flag
        | FROM events WHERE event_type = 'click'),
        |y AS (SELECT user_id, ts,
        |  SUM(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS UNBOUNDED PRECEDING) AS session_id
        | FROM x),
        |sess AS (SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  MIN(epoch_us(ts)) AS session_start_us,
        |  MAX(epoch_us(ts)) AS session_end_us
        | FROM y GROUP BY 1, 2)
        |SELECT a.user_id AS user_1, a.session_id AS session_1,
        | b.user_id AS user_2, b.session_id AS session_2,
        | greatest(a.session_start_us, b.session_start_us) AS overlap_start_us,
        | least(a.session_end_us, b.session_end_us) AS overlap_end_us
        |FROM sess a JOIN sess b ON a.user_id < b.user_id
        | AND a.session_start_us <= b.session_end_us
        | AND b.session_start_us <= a.session_end_us
        |ORDER BY user_1, session_1, user_2, session_2""".stripMargin,

    // integer-exact unigram surprisal: bitlen(total) - bitlen(count) per token
    "unigram_surprisal" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        | FROM documents),
        |vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
        |scored AS (SELECT doc_id,
        |  length(bin(tot.total)) - length(bin(cnt)) AS bits
        | FROM toks JOIN vocab USING (tok) CROSS JOIN tot)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        | CAST(SUM(bits) AS BIGINT) AS surprisal_bits,
        | CAST(SUM(bits) * 1000 // COUNT(*) AS BIGINT) AS millibits_per_token
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // DSIR importance scores: fixed-point likelihood-ratio millis
    // ((cnt_t+1)*total_c*1000) // (cnt_c*(total_t+V)) centered at 1000 and
    // summed per doc; pmod-subtract floor division (sign-safe on both engines)
    "dsir_weights" ->
      s"""WITH $dsirCtes
         |SELECT doc_id, n_tokens, score_millis, millis_per_token
         |FROM dw ORDER BY doc_id""".stripMargin,

    // importance resampling on the DSIR scores: highest millis-per-token
    // docs admitted until the token budget, whole buckets via the
    // cumulated per-weight histogram, the crossing bucket by id order
    "dsir_resample" ->
      s"""WITH $dsirCtes,
         |h AS (SELECT millis_per_token AS wgt, CAST(SUM(n_tokens) AS BIGINT) AS bt
         | FROM dw GROUP BY 1),
         |c AS (SELECT wgt, bt,
         |  CAST(SUM(bt) OVER (ORDER BY wgt DESC) AS BIGINT) AS cum FROM h),
         |j AS (SELECT d.doc_id, d.n_tokens, c.wgt, c.cum, c.cum - c.bt AS cum_before
         | FROM dw d JOIN c ON c.wgt = d.millis_per_token),
         |fullb AS (SELECT doc_id, wgt, n_tokens FROM j WHERE cum <= 8000),
         |crossb AS (SELECT doc_id, wgt, n_tokens FROM (
         | SELECT doc_id, wgt, n_tokens, cum_before,
         |  SUM(n_tokens) OVER (PARTITION BY wgt ORDER BY doc_id) AS c2
         | FROM j WHERE cum > 8000 AND cum_before < 8000) WHERE c2 <= 8000 - cum_before)
         |SELECT doc_id, wgt AS millis_per_token, n_tokens FROM fullb
         |UNION ALL
         |SELECT doc_id, wgt AS millis_per_token, n_tokens FROM crossb
         |ORDER BY doc_id""".stripMargin,

    // bigram conditional surprisal: bitlen(cnt(prev)) - bitlen(cnt(prev,tok))
    // over exact integer counts; docs under 2 tokens have no bigrams
    "bigram_surprisal" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        | WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (SELECT doc_id, tk[i - 1] AS prev, tk[i] AS tok
        | FROM t, UNNEST(range(2, len(tk) + 1)) AS u(i)),
        |pc AS (SELECT prev, COUNT(*) AS cnt_prev FROM bi GROUP BY prev),
        |bc AS (SELECT prev, tok, COUNT(*) AS cnt_bi FROM bi GROUP BY prev, tok),
        |scored AS (SELECT bi.doc_id,
        |  length(bin(pc.cnt_prev)) - length(bin(bc.cnt_bi)) AS bits
        | FROM bi JOIN bc ON bi.prev = bc.prev AND bi.tok = bc.tok
        | JOIN pc ON bi.prev = pc.prev)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        | CAST(SUM(bits) AS BIGINT) AS surprisal_bits,
        | CAST(SUM(bits) * 1000 // COUNT(*) AS BIGINT) AS millibits_per_bigram
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // CCNet-style head/middle/tail tertiles by bigram-surprisal millibits;
    // cutoffs from the cumulated score histogram, ties share a bucket
    "ppl_buckets" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        | WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (SELECT doc_id, tk[i - 1] AS prev, tk[i] AS tok
        | FROM t, UNNEST(range(2, len(tk) + 1)) AS u(i)),
        |pc AS (SELECT prev, COUNT(*) AS cnt_prev FROM bi GROUP BY prev),
        |bc AS (SELECT prev, tok, COUNT(*) AS cnt_bi FROM bi GROUP BY prev, tok),
        |scored AS (SELECT bi.doc_id,
        |  length(bin(pc.cnt_prev)) - length(bin(bc.cnt_bi)) AS bits
        | FROM bi JOIN bc ON bi.prev = bc.prev AND bi.tok = bc.tok
        | JOIN pc ON bi.prev = pc.prev),
        |sc AS (SELECT doc_id,
        |  CAST(SUM(bits) * 1000 // COUNT(*) AS BIGINT) AS mbpb
        | FROM scored GROUP BY doc_id),
        |hist AS (SELECT mbpb, COUNT(*) AS c FROM sc GROUP BY mbpb),
        |cum AS (SELECT mbpb,
        |  SUM(c) OVER (ORDER BY mbpb ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
        |tot AS (SELECT COUNT(*) AS n FROM sc),
        |cuts AS (SELECT
        |  MIN(CASE WHEN cum * 3 >= n THEN mbpb END) AS t1,
        |  MIN(CASE WHEN cum * 3 >= n * 2 THEN mbpb END) AS t2
        | FROM cum CROSS JOIN tot)
        |SELECT sc.doc_id, sc.mbpb AS millibits_per_bigram,
        | CASE WHEN sc.mbpb <= c.t1 THEN 'head'
        |      WHEN sc.mbpb <= c.t2 THEN 'middle'
        |      ELSE 'tail' END AS bucket
        |FROM sc CROSS JOIN cuts c ORDER BY sc.doc_id""".stripMargin,

    // Kneser-Ney bigram bits: fixed-point millionth probabilities with
    // floor division at every step, bit cost 20 - bitlength(p_mil)
    "kn_bigram_bits" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        | WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (SELECT doc_id, tk[i - 1] AS prev, tk[i] AS tok
        | FROM t, UNNEST(range(2, len(tk) + 1)) AS u(i)),
        |bc AS (SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS c12
        | FROM bi GROUP BY prev, tok),
        |ls AS (SELECT prev, CAST(SUM(c12) AS BIGINT) AS c1,
        |  CAST(COUNT(*) AS BIGINT) AS n1l FROM bc GROUP BY prev),
        |rs AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n1r FROM bc GROUP BY tok),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1all FROM bc),
        |scored AS (SELECT bi.doc_id,
        |  (greatest(100 * bc.c12 - 75, 0) * 10000) // ls.c1
        |   + ((750000 * ls.n1l // ls.c1) * (rs.n1r * 1000000 // tot.n1all)) // 1000000
        |   AS p_mil
        | FROM bi JOIN bc ON bi.prev = bc.prev AND bi.tok = bc.tok
        | JOIN ls ON bi.prev = ls.prev
        | JOIN rs ON bi.tok = rs.tok CROSS JOIN tot),
        |bits AS (SELECT doc_id,
        |  CASE WHEN p_mil > 0 THEN greatest(20 - length(bin(p_mil)), 0)
        |       ELSE 21 END AS bits FROM scored)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        | CAST(SUM(bits) AS BIGINT) AS kn_bits,
        | CAST(SUM(bits) * 1000 // COUNT(*) AS BIGINT) AS millibits_per_bigram
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // incremental cross-corpus dedup: new batch (id >= 250) survives unless
    // exact-fingerprint or band-collision+Jaccard matched vs the reference
    "incremental_dedup" -> {
      val ms = (0 until K).map(j => s"${minhashE(j)} AS m$j").mkString(", ")
      val bandSelects = (0 until Bands)
        .map(b => s"SELECT doc_id, $b AS bi, ${bandE(b)} AS k FROM m")
        .mkString(" UNION ALL ")
      s"""WITH c AS (SELECT doc_id, $codesE AS codes FROM documents),
         |s AS (SELECT doc_id, $shinglesE AS sh FROM c),
         |m AS (SELECT doc_id, $ms FROM s WHERE len(sh) > 0),
         |bands AS ($bandSelects),
         |sets AS (SELECT doc_id, list_distinct(sh) AS st FROM s),
         |fps AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
         |  (h, cd) -> (h*$FpB + cd) % $FpM) AS fp FROM c),
         |exact_drop AS (SELECT DISTINCT n.doc_id FROM fps n JOIN fps r
         |  ON n.fp = r.fp AND n.doc_id >= 250 AND r.doc_id < 250),
         |cand AS (SELECT DISTINCT a.doc_id AS nid, b.doc_id AS rid
         |  FROM bands a JOIN bands b ON a.bi = b.bi AND a.k = b.k
         |  WHERE a.doc_id >= 250 AND b.doc_id < 250),
         |near_drop AS (SELECT DISTINCT nid AS doc_id FROM cand
         |  JOIN sets sa ON nid = sa.doc_id JOIN sets sb ON rid = sb.doc_id
         |  WHERE CAST(floor(len(list_intersect(sa.st, sb.st)) * 10000.0 /
         |   (len(sa.st) + len(sb.st) - len(list_intersect(sa.st, sb.st)))) AS BIGINT)
         |   >= 8000)
         |SELECT doc_id FROM documents WHERE doc_id >= 250
         | AND doc_id NOT IN (SELECT doc_id FROM exact_drop)
         | AND doc_id NOT IN (SELECT doc_id FROM near_drop)
         |ORDER BY doc_id""".stripMargin
    },

    // epoch upsampling: floor(epochs) copies + hash-gated fractional copy
    "epoch_upsample" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  CASE WHEN source IN ('src0', 'src1') THEN 32500
         |       WHEN source IN ('src2', 'src3') THEN 20000
         |       ELSE 10000 END AS rate_bp,
         |  (doc_id % $P * $TokenHashB) % $P % 10000 AS h FROM documents),
         |c AS (SELECT doc_id, source,
         |  rate_bp // 10000 + CASE WHEN h < rate_bp % 10000 THEN 1 ELSE 0 END AS n
         | FROM d)
         |SELECT * FROM (
         | SELECT doc_id, source, CAST(unnest(range(n)) AS BIGINT) AS copy_id FROM c
         | WHERE n > 0)
         |ORDER BY doc_id, copy_id""".stripMargin,

    // deterministic shuffle: hash rank -> shard, per-shard position
    "shuffle_shards" ->
      s"""WITH h AS (SELECT doc_id, (doc_id % $P * $TokenHashB) % $P AS h FROM documents)
         |SELECT doc_id, h % 16 AS shard,
         | CAST(row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) AS BIGINT) AS pos
         |FROM h ORDER BY shard, pos""".stripMargin,

    // per-source token budget: admit docs in hash-rank order until the
    // cumulative token count passes the budget
    "token_budget_mix" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  len(string_split(text, ' ')) AS n_tokens,
         |  (doc_id % $P * $TokenHashA) % $P AS h,
         |  CASE WHEN source IN ('src0', 'src1') THEN 1000 ELSE 400 END AS budget
         | FROM documents),
         |c AS (SELECT doc_id, source, n_tokens, budget,
         |  SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |   ROWS UNBOUNDED PRECEDING) AS cum FROM d)
         |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         | CAST(cum AS BIGINT) AS cum
         |FROM c WHERE cum <= budget ORDER BY source, cum""".stripMargin,

    // temperature (tau=2) resampled mixing: per-source budget proportional
    // to sqrt(source tokens), normalizer folded in sorted-source order so
    // the double sum is bit-identical to Spark's sequential fold
    "temperature_mix" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  (doc_id % $P * $TokenHashA) % $P AS h
         | FROM documents),
         |sizes AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS n_src
         | FROM d GROUP BY source),
         |z AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  list(sqrt(CAST(n_src AS DOUBLE)) ORDER BY source)), (a, x) -> a + x) AS z
         | FROM sizes),
         |budgets AS (SELECT source,
         |  CAST(floor(5000.0 * sqrt(CAST(n_src AS DOUBLE)) / z.z) AS BIGINT) AS budget
         | FROM sizes CROSS JOIN z),
         |c AS (SELECT d.doc_id, d.source, d.n_tokens, b.budget,
         |  SUM(d.n_tokens) OVER (PARTITION BY d.source ORDER BY d.h, d.doc_id
         |   ROWS UNBOUNDED PRECEDING) AS cum
         | FROM d JOIN budgets b ON d.source = b.source)
         |SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum, budget
         |FROM c WHERE cum <= budget ORDER BY source, cum""".stripMargin,

    // full-outer symmetric difference of two distinct key sets
    "cust_retention" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS ck FROM orders
        |  WHERE year(o_orderdate) = 1994),
        |b AS (SELECT DISTINCT o_custkey AS ck FROM orders
        |  WHERE year(o_orderdate) = 1995)
        |SELECT COALESCE(a.ck, b.ck) AS custkey,
        | CASE WHEN a.ck IS NOT NULL AND b.ck IS NOT NULL THEN 'retained'
        |      WHEN a.ck IS NOT NULL THEN 'churned'
        |      ELSE 'acquired' END AS status
        |FROM a FULL OUTER JOIN b ON a.ck = b.ck
        |ORDER BY custkey""".stripMargin,

    // per-nation revenue quartiles via partitioned ntile
    "nation_quartiles" ->
      """WITH rev AS (SELECT c_custkey, c_nationkey,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |q AS (SELECT c_nationkey, cents, c_custkey,
        |  CAST(ntile(4) OVER (PARTITION BY c_nationkey
        |   ORDER BY cents DESC, c_custkey) AS BIGINT) AS quartile FROM rev)
        |SELECT c_nationkey, quartile, COUNT(*) AS n_cust,
        | CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM q GROUP BY 1, 2 ORDER BY c_nationkey, quartile""".stripMargin,

    // fake-codec 4x4 -> 2x2 nearest-neighbor resize, sample positions replayed
    "multimodal_resize" ->
      """SELECT doc_id,
        | '0002000201' || hex(encode(substr(text, 1, 1))) ||
        |  hex(encode(substr(text, 3, 1))) || hex(encode(substr(text, 9, 1))) ||
        |  hex(encode(substr(text, 11, 1))) AS out_hex
        |FROM documents
        |WHERE length(text) >= 16 AND octet_length(encode(substr(text, 1, 16))) = 16
        |ORDER BY doc_id""".stripMargin,

    // aHash over the 16 synthesized pixels: mean-thresholded bits, docs
    // sharing a phash flagged duplicate candidates (dedup as a group-by)
    "image_phash" ->
      """WITH src AS (SELECT doc_id, substr(text, 1, 16) AS px FROM documents
        | WHERE length(text) >= 16 AND octet_length(encode(substr(text, 1, 16))) = 16),
        |pix AS (SELECT doc_id,
        |  list_transform(range(1, 17), i -> ascii(substr(px, CAST(i AS INT), 1))) AS p
        | FROM src),
        |m AS (SELECT doc_id, p, CAST(list_sum(p) AS BIGINT) // 16 AS mean FROM pix),
        |h AS (SELECT doc_id, CAST(list_sum(list_transform(range(1, 17),
        |  i -> CASE WHEN p[i] > mean THEN 1 << (i - 1) ELSE 0 END)) AS BIGINT) AS phash
        | FROM m)
        |SELECT doc_id, phash,
        | CAST(COUNT(*) OVER (PARTITION BY phash) AS BIGINT) AS n_same,
        | COUNT(*) OVER (PARTITION BY phash) > 1 AS is_dup
        |FROM h ORDER BY doc_id""".stripMargin,

    // stride-2 frame sampling of a synthesized 6-frame array<binary>
    "multimodal_frames" ->
      """SELECT doc_id, CAST(t.i AS BIGINT) AS frame_idx,
        | hex(encode(substr(text, t.i * 8 + 1, 8))) AS frame_hex
        |FROM documents CROSS JOIN (SELECT unnest([0, 2, 4]) AS i) t
        |WHERE length(text) >= 48 AND octet_length(encode(substr(text, 1, 48))) = 48
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes, sha256(text) AS sha
        |FROM documents ORDER BY doc_id""".stripMargin)
    // the hashed-gram production path is result-identical to the exact-text
    // path (collision-free at testdata scale; equality also spec-pinned in
    // SpanDedupSpec), so it shares span_dedup's oracle verbatim
    .pipe(m => m + ("span_dedup_hashed" -> m("span_dedup")))
}
