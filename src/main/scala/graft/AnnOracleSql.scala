package graft

/** DuckDB SQL builders replicating graft's ANN operators bit-for-bit,
  * so `ann_lsh` / `ann_ivf` / `ann_recall` are hash-checked rather
  * than rows-only. Replication is possible because the operators were
  * designed for it: the hyperplane-component mix is plain 63-bit-safe
  * integer arithmetic ([[graft.functions.expressions.HyperplaneConstants]]),
  * IVF/PQ centroid means are order-fixed sequential double folds
  * (sorted by vec_id; `list_reduce` here — no rounding step, so no
  * decimal-cast tie) with a single IEEE division, and every dot
  * product is a sequential double fold (DuckDB `list_dot_product`
  * evaluates the same order).
  */
object AnnOracleSql {

  /** corpus as double arrays (float→double promotion is exact). */
  val EmbCte: String =
    "e AS (SELECT vec_id, cast(embedding as double[]) as emb FROM embeddings)"

  private def cosine(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * " +
      s"sqrt(list_dot_product($b, $b)))"

  /** Exact brute-force top-k CTE `bf(query_id, neighbor_id, rank, cosine)`. */
  def bfCtes(k: Int, queryPred: String): String = s"""
    bf AS (
      SELECT query_id, neighbor_id, cast(rank as bigint) as rank, cosine FROM (
        SELECT q.vec_id as query_id, c.vec_id as neighbor_id,
          ${cosine("q.emb", "c.emb")} as cosine,
          row_number() OVER (PARTITION BY q.vec_id ORDER BY
            ${cosine("q.emb", "c.emb")} DESC, c.vec_id) as rank
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
        WHERE q.$queryPred) WHERE rank <= $k)"""

  /** Hyperplane signature CTEs `hp` + `sigs(vec_id, t, sig)` — the
    * same component mix as HyperplaneConstants.component. */
  def sigCtes(dim: Int, bits: Int, tables: Int): String = s"""
    hp AS (
      SELECT t.t, i.i,
        list_transform(range($dim), j -> (
          ((xor( ((t.t*$bits+i.i)*$dim + j) * 2654435761 % 2147483648,
                 (((t.t*$bits+i.i)*$dim + j) * 2654435761 % 2147483648) >> 15 )
            * 2246822519) % 2001 - 1000) / 1000.0)) as comp
      FROM (SELECT unnest(range($tables)) as t) t,
           (SELECT unnest(range($bits)) as i) i),
    sigs AS (
      SELECT e.vec_id, h.t,
        cast(sum(case when list_dot_product(e.emb, h.comp) > 0
          then 1 << ($bits-1-h.i) else 0 end) as int) as sig
      FROM e CROSS JOIN hp h GROUP BY 1, 2)"""

  /** Hybrid retrieval with reciprocal-rank fusion (mirrors
    * Similarity.hybridSearch): integer tf·tf lexical top-k, exact
    * cosine top-k, `Σ 1/(rrfK + rank)` fusion with fixed term order.
    * `idPred` is the query predicate over a bare id column. */
  def hybridSql(k: Int, rrfK: Int, idPred: String): String = s"""
    WITH $EmbCte, ${bfCtes(k, s"vec_id $idPred")},
    w AS (SELECT doc_id, word, count(*) as tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) as word
                FROM documents) GROUP BY 1, 2),
    qw AS (SELECT doc_id as query_id, word, tf as tf_q
           FROM w WHERE doc_id $idPred),
    lex AS (SELECT qw.query_id, w.doc_id,
              cast(sum(w.tf * qw.tf_q) as bigint) as lex_score
            FROM w JOIN qw USING (word)
            WHERE w.doc_id <> qw.query_id GROUP BY 1, 2),
    lext AS (SELECT query_id, doc_id, cast(lex_rank as bigint) as lex_rank
             FROM (SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY lex_score DESC, doc_id) as lex_rank
                   FROM lex) WHERE lex_rank <= $k),
    semt AS (SELECT query_id, neighbor_id as doc_id, rank as sem_rank
             FROM bf),
    fused AS (
      SELECT coalesce(l.query_id, s.query_id) as query_id,
        coalesce(l.doc_id, s.doc_id) as doc_id,
        l.lex_rank, s.sem_rank,
        coalesce(cast(1.0 as double) / ($rrfK + l.lex_rank), 0.0)
          + coalesce(cast(1.0 as double) / ($rrfK + s.sem_rank), 0.0)
          as rrf_score
      FROM lext l FULL JOIN semt s
        ON l.query_id = s.query_id AND l.doc_id = s.doc_id)
    SELECT query_id, doc_id, lex_rank, sem_rank, rrf_score,
      cast(hybrid_rank as bigint) as hybrid_rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY rrf_score DESC, doc_id) as hybrid_rank
          FROM fused)
    WHERE hybrid_rank <= $k"""

  /** Per-label centroid outliers (mirrors
    * Similarity.centroidOutliers): dyadic-exact per-label means
    * (identical to the label_centroids oracle), `list(... ORDER BY
    * dim)` assembles the centroid, and each cosine is the same fixed
    * sequential-fold / sqrt / multiply / divide chain as the Spark
    * side. */
  def centroidOutliersSql(k: Int): String = s"""
    WITH el AS (SELECT vec_id, label, cast(embedding as double[]) as emb
                FROM embeddings),
    cl AS (SELECT label, dim,
             (cast(sum(cast(v * 281474976710656.0 as decimal(28,0)))
                 as double) / 281474976710656.0) / count(*) as mean
           FROM (SELECT label, generate_subscripts(embedding, 1) - 1 as dim,
                   unnest(cast(embedding as double[])) as v
                 FROM embeddings)
           GROUP BY 1, 2),
    cent AS (SELECT label, list(mean ORDER BY dim) as cvec
             FROM cl GROUP BY 1),
    sc AS (SELECT e.label, e.vec_id,
             list_dot_product(e.emb, c.cvec) /
               (sqrt(list_dot_product(e.emb, e.emb)) *
                sqrt(list_dot_product(c.cvec, c.cvec))) as cosine
           FROM el e JOIN cent c USING (label))
    SELECT label, vec_id, cosine, cast(rn as bigint) as outlier_rank
    FROM (SELECT *, row_number() OVER (PARTITION BY label
            ORDER BY cosine ASC, vec_id) as rn FROM sc)
    WHERE rn <= $k"""

  /** IVF index-health audit (mirrors Similarity.cellStats): per-cell
    * population, corpus share, and imbalance factor in ppm — all
    * integer division, bit-portable. */
  def cellStatsSql(nlist: Int, iters: Int, sampleBudget: Int): String =
    s"""WITH $EmbCte, ${quantizerCtes(nlist, iters, sampleBudget)},
       sz AS (SELECT cluster, count(*) as n FROM tagged GROUP BY 1),
       tot AS (SELECT cast(sum(n) as bigint) as t FROM sz)
       SELECT cast(cluster as bigint) as cluster,
         cast(n as bigint) as n_vectors,
         cast(n * 1000000 // t as bigint) as share_ppm,
         cast(n * $nlist * 1000000 // t as bigint) as imbalance_ppm
       FROM sz, tot"""

  /** Frozen-quantizer k-means assignment + cell sizes (mirrors
    * Similarity.kmeansAssign). */
  def kmeansAssignSql(nlist: Int, iters: Int, sampleBudget: Int): String =
    s"""WITH $EmbCte, ${quantizerCtes(nlist, iters, sampleBudget)},
       sz AS (SELECT cluster, count(*) as cluster_size
              FROM tagged GROUP BY 1)
       SELECT t.neighbor_id as vec_id, cast(t.cluster as bigint) as cluster,
         sz.cluster_size
       FROM tagged t JOIN sz USING (cluster)"""

  /** JL random projection (mirrors Similarity.randomProjection): the
    * table-0 hyperplane component grid kept as dot-product VALUES —
    * `list_dot_product` is the same left-to-right fold as the kernel's
    * accumulation, so every double matches bit-for-bit. */
  def projectionSql(dim: Int, outDim: Int): String = s"""
    WITH $EmbCte,
    hp AS (
      SELECT r.r,
        list_transform(range($dim), j -> (
          ((xor( (r.r*$dim + j) * 2654435761 % 2147483648,
                 ((r.r*$dim + j) * 2654435761 % 2147483648) >> 15 )
            * 2246822519) % 2001 - 1000) / 1000.0)) as comp
      FROM (SELECT unnest(range($outDim)) as r) r)
    SELECT e.vec_id, cast(h.r as bigint) as proj_dim,
      list_dot_product(e.emb, h.comp) as proj
    FROM e CROSS JOIN hp h"""

  /** LSH top-k CTE `lsh_topk(query_id, neighbor_id, rank, cosine)`
    * (requires sigCtes). */
  def lshTopkCtes(k: Int, queryPred: String): String = s"""
    lsh_cand AS (
      SELECT q.vec_id as query_id, c.vec_id as neighbor_id
      FROM sigs q JOIN sigs c ON q.t = c.t AND q.sig = c.sig
      WHERE q.$queryPred AND c.vec_id <> q.vec_id
      GROUP BY 1, 2),
    lsh_topk AS (
      SELECT query_id, neighbor_id, cast(rank as bigint) as rank, cosine FROM (
        SELECT cand.query_id, cand.neighbor_id,
          ${cosine("qe.emb", "ce.emb")} as cosine,
          row_number() OVER (PARTITION BY cand.query_id
            ORDER BY ${cosine("qe.emb", "ce.emb")} DESC, cand.neighbor_id) as rank
        FROM lsh_cand cand
          JOIN e qe ON qe.vec_id = cand.query_id
          JOIN e ce ON ce.vec_id = cand.neighbor_id)
      WHERE rank <= $k)"""

  /** Coarse-quantizer CTE chain: absolute-budget sampled init `c0`,
    * `iters` unrolled Lloyd rounds (assign → ordered-fold means →
    * carry empty clusters), and full-corpus tagging
    * `tagged(neighbor_id, emb, cluster)`. The sample replicates
    * Similarity.trainCentroids: modulus M = ceil(n / budget) over the
    * salted sha60 of the vec_id — ~budget rows at any corpus size. */
  def quantizerCtes(nlist: Int, iters: Int, sampleBudget: Int): String = {
    val init = s"""
    samp AS (
      SELECT vec_id, emb FROM e, (SELECT count(*) as n FROM e) cnt
      WHERE ('0x' || substr(sha256('ivf:' || cast(vec_id as varchar)), 1, 15))::BIGINT
              % greatest(1, (n + ${sampleBudget - 1}) // $sampleBudget) = 0),
    c0 AS (
      SELECT cast(row_number() OVER (ORDER BY vec_id) as int) - 1 as cluster,
        emb as cent
      FROM (SELECT vec_id, emb FROM samp ORDER BY vec_id LIMIT $nlist))"""
    val rounds = (1 to iters).map { n =>
      val p = s"c${n - 1}"
      s"""
    a$n AS (
      SELECT vec_id, emb, cluster FROM (
        SELECT s.vec_id, s.emb, c.cluster,
          row_number() OVER (PARTITION BY s.vec_id
            ORDER BY list_dot_product(s.emb, c.cent) DESC, c.cluster) as rn
        FROM samp s CROSS JOIN $p c) WHERE rn = 1),
    m$n AS (
      SELECT cluster, dim,
        list_reduce(list(v ORDER BY vec_id), (a, b) -> a + b) / count(*)
          as mean
      FROM (SELECT vec_id, cluster, unnest(emb) as v,
              generate_subscripts(emb, 1) as dim FROM a$n)
      GROUP BY 1, 2),
    c$n AS (
      SELECT p.cluster, coalesce(m.cent, p.cent) as cent
      FROM $p p LEFT JOIN
        (SELECT cluster, list(mean ORDER BY dim) as cent
         FROM m$n GROUP BY 1) m USING (cluster))"""
    }.mkString(",")
    val cf = s"c$iters"
    val fin = s"""
    tagged AS (
      SELECT vec_id as neighbor_id, emb, cluster FROM (
        SELECT e.vec_id, e.emb, c.cluster,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY list_dot_product(e.emb, c.cent) DESC, c.cluster) as rn
        FROM e CROSS JOIN $cf c) WHERE rn = 1)"""
    init + "," + rounds + "," + fin
  }

  /** IVF CTE chain: quantizer + query probes + `ivf_topk(query_id,
    * neighbor_id, cluster, rank, cosine)`. */
  def ivfCtes(nlist: Int, nprobe: Int, k: Int, iters: Int,
              sampleBudget: Int, queryPred: String): String = {
    val cf = s"c$iters"
    val fin = s"""
    probes AS (
      SELECT vec_id as query_id, emb as q_emb, cluster FROM (
        SELECT e.vec_id, e.emb, c.cluster,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY list_dot_product(e.emb, c.cent) DESC, c.cluster) as rn
        FROM e CROSS JOIN $cf c WHERE e.$queryPred) WHERE rn <= $nprobe),
    ivf_topk AS (
      SELECT query_id, neighbor_id, cast(cluster as int) as cluster,
        cast(rank as bigint) as rank, cosine FROM (
        SELECT p.query_id, t.neighbor_id, t.cluster,
          ${cosine("p.q_emb", "t.emb")} as cosine,
          row_number() OVER (PARTITION BY p.query_id
            ORDER BY ${cosine("p.q_emb", "t.emb")} DESC, t.neighbor_id) as rank
        FROM tagged t JOIN probes p USING (cluster)
        WHERE t.neighbor_id <> p.query_id)
      WHERE rank <= $k)"""
    quantizerCtes(nlist, iters, sampleBudget) + "," + fin
  }

  /** Quantizer-blocked embedding near-dup pairs (mirrors
    * Dedup.embeddingNearDupQuantized). */
  def embeddingDedupSql(threshold: Double, nlist: Int, iters: Int,
                        sampleBudget: Int): String =
    s"""WITH $EmbCte, ${quantizerCtes(nlist, iters, sampleBudget)},
       pairs AS (
         SELECT a.neighbor_id as id_a, b.neighbor_id as id_b,
           cast(a.cluster as int) as cluster,
           ${cosine("a.emb", "b.emb")} as cosine
         FROM tagged a JOIN tagged b
           ON a.cluster = b.cluster AND a.neighbor_id < b.neighbor_id)
       SELECT id_a, id_b, cluster, cosine FROM pairs
       WHERE cosine >= $threshold"""

  /** SemDeDup-style keep flags (mirrors Dedup.semdedupKeep): a vector
    * is dropped iff it has a lower-id same-cluster neighbor at
    * cosine ≥ threshold. */
  def semdedupKeepSql(threshold: Double, nlist: Int, iters: Int,
                      sampleBudget: Int): String =
    s"""WITH $EmbCte, ${quantizerCtes(nlist, iters, sampleBudget)},
       dropped AS (
         SELECT DISTINCT b.neighbor_id as vec_id
         FROM tagged a JOIN tagged b
           ON a.cluster = b.cluster AND a.neighbor_id < b.neighbor_id
         WHERE ${cosine("a.emb", "b.emb")} >= $threshold)
       SELECT t.neighbor_id as vec_id, cast(t.cluster as int) as cluster,
         d.vec_id IS NULL as kept
       FROM tagged t LEFT JOIN dropped d ON d.vec_id = t.neighbor_id"""

  /** Per-cell SemDeDup pruning audit (mirrors Dedup.semdedupRate):
    * vectors / kept / pruned counts and the pruned fraction for every
    * quantizer cell at the given threshold. */
  def semdedupRateSql(threshold: Double, nlist: Int, iters: Int,
                      sampleBudget: Int): String =
    s"""WITH $EmbCte, ${quantizerCtes(nlist, iters, sampleBudget)},
       dropped AS (
         SELECT DISTINCT b.neighbor_id as vec_id
         FROM tagged a JOIN tagged b
           ON a.cluster = b.cluster AND a.neighbor_id < b.neighbor_id
         WHERE ${cosine("a.emb", "b.emb")} >= $threshold),
       flags AS (
         SELECT t.neighbor_id as vec_id, cast(t.cluster as int) as cluster,
           d.vec_id IS NULL as kept
         FROM tagged t LEFT JOIN dropped d ON d.vec_id = t.neighbor_id)
       SELECT cluster, count(*) as n_vectors,
         cast(sum(case when kept then 1 else 0 end) as bigint) as n_kept,
         cast(sum(case when kept then 0 else 1 end) as bigint) as n_pruned,
         cast(sum(case when kept then 0 else 1 end) as double) / count(*)
           as pruned_frac
       FROM flags GROUP BY 1"""

  /** SemDeDup threshold curve (mirrors Dedup.semdedupCurve): pairs
    * built once at the loosest cutoff, each candidate threshold a
    * filter + aggregate over the same pair rows. */
  def semdedupCurveSql(thresholds: Seq[Double], nlist: Int, iters: Int,
                       sampleBudget: Int): String = {
    val tList = thresholds.mkString(", ")
    s"""WITH $EmbCte, ${quantizerCtes(nlist, iters, sampleBudget)},
       pairs AS (
         SELECT a.neighbor_id as id_a, b.neighbor_id as id_b,
           ${cosine("a.emb", "b.emb")} as cosine
         FROM tagged a JOIN tagged b
           ON a.cluster = b.cluster AND a.neighbor_id < b.neighbor_id
         WHERE ${cosine("a.emb", "b.emb")} >= ${thresholds.min}),
       th AS (SELECT unnest(cast([$tList] as double[])) as threshold),
       hits AS (
         SELECT threshold, cast(count(*) as bigint) as n_pairs,
           cast(count(DISTINCT id_b) as bigint) as n_dropped
         FROM pairs, th WHERE cosine >= threshold GROUP BY 1),
       tot AS (SELECT cast(count(*) as bigint) as n_vectors
               FROM embeddings)
       SELECT t.threshold, n_vectors,
         coalesce(n_pairs, 0) as n_pairs,
         coalesce(n_dropped, 0) as n_dropped,
         n_vectors - coalesce(n_dropped, 0) as n_survivors,
         CASE WHEN n_vectors > 0 THEN
           coalesce(n_dropped, 0) * 1000000 // n_vectors END as pruned_ppm
       FROM th t LEFT JOIN hits USING (threshold), tot"""
  }

  /** Transitive-closure vs pairwise prune mass over one pair graph
    * (mirrors Dedup.semdedupComponentDrop): connected components via
    * a recursive reachability CTE, one survivor per component, next
    * to the lower-id-neighbor pairwise count. */
  def semdedupComponentDropSql(threshold: Double, nlist: Int, iters: Int,
                               sampleBudget: Int): String =
    s"""WITH RECURSIVE $EmbCte, ${quantizerCtes(nlist, iters, sampleBudget)},
       pairs AS (
         SELECT a.neighbor_id as id_a, b.neighbor_id as id_b
         FROM tagged a JOIN tagged b
           ON a.cluster = b.cluster AND a.neighbor_id < b.neighbor_id
         WHERE ${cosine("a.emb", "b.emb")} >= $threshold),
       edges AS (SELECT id_a as s, id_b as t FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
       nodes AS (SELECT id_a as id FROM pairs
                 UNION SELECT id_b FROM pairs),
       reach(id, r) AS (
         SELECT id, id FROM nodes
         UNION
         SELECT reach.id, e.t FROM reach JOIN edges e ON e.s = reach.r),
       cc AS (SELECT id, min(r) as label FROM reach GROUP BY 1),
       agg AS (SELECT cast(count(*) as bigint) as n_in_pairs,
                 cast(count(DISTINCT label) as bigint) as n_components
               FROM cc),
       pw AS (SELECT cast(count(DISTINCT id_b) as bigint)
                as n_dropped_pairwise FROM pairs),
       tot AS (SELECT cast(count(*) as bigint) as n_vectors
               FROM embeddings)
       SELECT n_vectors, n_in_pairs, n_components,
         n_in_pairs - n_components as n_dropped_component,
         n_dropped_pairwise,
         n_vectors - (n_in_pairs - n_components) as n_survivors_component
       FROM agg, pw, tot"""

  /** The unrolled ADC estimate over codebook list `l.lut` and code
    * row `x.codes` — a left-associated sum of m entries (matching
    * Spark's reduceLeft fold). */
  def pqEstSum(m: Int, ksub: Int): String =
    (0 until m).map(j =>
      s"l.lut[$j*$ksub + x.codes[${j + 1}] + 1]").mkString(" + ")

  /** Product-quantization codebook/encode CTE chain replicating
    * Similarity's PQ family bit-for-bit: absolute-budget sample
    * (salt "pq:"), per-subspace Lloyd with L2 assignment via the
    * x·c − c·c/2 score and ordered-fold means, full-corpus encode
    * `pcodes(vec_id, codes)`, and per-query flat LUT
    * `plutl(query_id, lut)` ordered by (sub, code). */
  def pqCodebookCtes(dim: Int, m: Int, ksub: Int, iters: Int,
                     sampleBudget: Int, queryPred: String): String = {
    val dsub = dim / m
    val score = (s: String, c: String) =>
      s"list_dot_product($s, $c.cent) - 0.5 * " +
        s"list_dot_product($c.cent, $c.cent)"
    val init = s"""
    psamp AS (
      SELECT vec_id, emb FROM e, (SELECT count(*) as n FROM e) cnt
      WHERE ('0x' || substr(sha256('pq:' || cast(vec_id as varchar)), 1, 15))::BIGINT
              % greatest(1, (n + ${sampleBudget - 1}) // $sampleBudget) = 0),
    subn AS (SELECT cast(unnest(range($m)) as int) as sub),
    psub AS (
      SELECT s.vec_id, t.sub,
        list_transform(range($dsub), i -> s.emb[t.sub*$dsub + i + 1]) as semb
      FROM psamp s CROSS JOIN subn t),
    pinit AS (SELECT vec_id FROM psamp ORDER BY vec_id LIMIT $ksub),
    pc0 AS (
      SELECT p.sub,
        cast(row_number() OVER (PARTITION BY p.sub ORDER BY p.vec_id) as int) - 1
          as code,
        p.semb as cent
      FROM psub p JOIN pinit USING (vec_id))"""
    val rounds = (1 to iters).map { r =>
      val p = s"pc${r - 1}"
      s"""
    pa$r AS (
      SELECT vec_id, sub, semb, code FROM (
        SELECT s.vec_id, s.sub, s.semb, c.code,
          row_number() OVER (PARTITION BY s.vec_id, s.sub
            ORDER BY ${score("s.semb", "c")} DESC, c.code) as rn
        FROM psub s JOIN $p c ON c.sub = s.sub) WHERE rn = 1),
    pm$r AS (
      SELECT sub, code, dim,
        list_reduce(list(v ORDER BY vec_id), (a, b) -> a + b) / count(*)
          as mean
      FROM (SELECT vec_id, sub, code, unnest(semb) as v,
              generate_subscripts(semb, 1) as dim FROM pa$r)
      GROUP BY 1, 2, 3),
    pc$r AS (
      SELECT p.sub, p.code, coalesce(mm.cent, p.cent) as cent
      FROM $p p LEFT JOIN
        (SELECT sub, code, list(mean ORDER BY dim) as cent
         FROM pm$r GROUP BY 1, 2) mm USING (sub, code))"""
    }.mkString(",")
    val cf = s"pc$iters"
    val fin = s"""
    esub AS (
      SELECT e.vec_id, t.sub,
        list_transform(range($dsub), i -> e.emb[t.sub*$dsub + i + 1]) as semb
      FROM e CROSS JOIN subn t),
    pcodes AS (
      SELECT vec_id, list(code ORDER BY sub) as codes FROM (
        SELECT s.vec_id, s.sub, c.code,
          row_number() OVER (PARTITION BY s.vec_id, s.sub
            ORDER BY ${score("s.semb", "c")} DESC, c.code) as rn
        FROM esub s JOIN $cf c ON c.sub = s.sub) WHERE rn = 1
      GROUP BY vec_id),
    plut AS (
      SELECT s.vec_id as query_id, s.sub, c.code,
        list_dot_product(s.semb, c.cent) as part
      FROM esub s JOIN $cf c ON c.sub = s.sub
      WHERE s.$queryPred),
    plutl AS (
      SELECT query_id, list(part ORDER BY sub, code) as lut
      FROM plut GROUP BY 1)"""
    init + "," + rounds + "," + fin
  }

  /** Full-corpus ADC top-k tail over the codebook CTEs. */
  def pqCtes(dim: Int, m: Int, ksub: Int, iters: Int, sampleBudget: Int,
             k: Int, queryPred: String): String =
    pqCodebookCtes(dim, m, ksub, iters, sampleBudget, queryPred) + s""",
    pest AS (
      SELECT l.query_id, x.vec_id as neighbor_id,
        ${pqEstSum(m, ksub)} as est_ip
      FROM pcodes x CROSS JOIN plutl l
      WHERE x.vec_id <> l.query_id),
    pq_topk AS (
      SELECT query_id, neighbor_id, cast(rank as bigint) as rank, est_ip
      FROM (
        SELECT query_id, neighbor_id, est_ip,
          row_number() OVER (PARTITION BY query_id
            ORDER BY est_ip DESC, neighbor_id) as rank
        FROM pest)
      WHERE rank <= $k)"""

  def pqSql(dim: Int, m: Int, ksub: Int, iters: Int, sampleBudget: Int,
            k: Int, queryPred: String): String =
    s"""WITH $EmbCte,
       ${pqCtes(dim, m, ksub, iters, sampleBudget, k, queryPred)}
       SELECT query_id, neighbor_id, rank, est_ip FROM pq_topk"""

  /** IVF+PQ (mirrors Similarity.annIvfPq): coarse-quantizer probes
    * restrict candidates to nprobe cells; scoring is the ADC sum
    * over the cell's codes — raw vectors appear nowhere at query
    * time. */
  def ivfPqSql(nlist: Int, nprobe: Int, k: Int, dim: Int, m: Int,
               ksub: Int, iters: Int, ivfSampleBudget: Int,
               pqSampleBudget: Int, queryPred: String): String = {
    val cf = s"c$iters"
    s"""WITH $EmbCte,
    ${quantizerCtes(nlist, iters, ivfSampleBudget)},
    ${pqCodebookCtes(dim, m, ksub, iters, pqSampleBudget, queryPred)},
    iprobes AS (
      SELECT vec_id as query_id, cast(cluster as int) as cluster FROM (
        SELECT e.vec_id, c.cluster,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY list_dot_product(e.emb, c.cent) DESC, c.cluster) as rn
        FROM e CROSS JOIN $cf c WHERE e.$queryPred) WHERE rn <= $nprobe),
    xt AS (
      SELECT t.neighbor_id, cast(t.cluster as int) as cluster, x.codes
      FROM tagged t JOIN pcodes x ON x.vec_id = t.neighbor_id),
    iest AS (
      SELECT l.query_id, x.neighbor_id, x.cluster,
        ${pqEstSum(m, ksub)} as est_ip
      FROM xt x
        JOIN iprobes p ON p.cluster = x.cluster
        JOIN plutl l ON l.query_id = p.query_id
      WHERE x.neighbor_id <> l.query_id)
    SELECT query_id, neighbor_id, cluster, cast(rank as bigint) as rank,
      est_ip
    FROM (
      SELECT query_id, neighbor_id, cluster, est_ip,
        row_number() OVER (PARTITION BY query_id
          ORDER BY est_ip DESC, neighbor_id) as rank
      FROM iest)
    WHERE rank <= $k"""
  }

  /** Recall of the PQ-ADC path vs brute force (mirrors
    * Similarity.annPqRecall). */
  def pqRecallSql(dim: Int, m: Int, ksub: Int, iters: Int,
                  sampleBudget: Int, k: Int, queryPred: String): String = s"""
    WITH $EmbCte, ${bfCtes(k, queryPred)},
    ${pqCtes(dim, m, ksub, iters, sampleBudget, k, queryPred)},
    bfn AS (SELECT query_id, count(*) as n_ex FROM bf GROUP BY 1)
    SELECT q.vec_id as query_id, 'pq' as method,
      CASE WHEN coalesce(b.n_ex, 0) = 0 THEN 1.0
           ELSE cast(coalesce(h.n, 0) as double) / b.n_ex END as recall
    FROM (SELECT vec_id FROM e WHERE $queryPred) q
      LEFT JOIN bfn b ON b.query_id = q.vec_id
      LEFT JOIN
      (SELECT query_id, count(*) as n FROM pq_topk
         JOIN bf USING (query_id, neighbor_id) GROUP BY 1) h
      ON h.query_id = q.vec_id"""

  /** CTEs for two-stage retrieval (mirrors Similarity.annTwoStage):
    * `pq_topk` at `shortlist`, exact-cosine re-rank →
    * `ts_topk(query_id, neighbor_id, rank, cosine)`. */
  def twoStageCtes(dim: Int, m: Int, ksub: Int, iters: Int,
                   sampleBudget: Int, shortlist: Int, k: Int,
                   queryPred: String): String = s"""
    ${pqCtes(dim, m, ksub, iters, sampleBudget, shortlist, queryPred)},
    rr AS (
      SELECT s.query_id, s.neighbor_id,
        ${cosine("q.emb", "c.emb")} as cosine
      FROM pq_topk s
        JOIN e q ON q.vec_id = s.query_id
        JOIN e c ON c.vec_id = s.neighbor_id),
    ts_topk AS (
      SELECT query_id, neighbor_id, cast(rank as bigint) as rank, cosine
      FROM (SELECT query_id, neighbor_id, cosine,
              row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) as rank
            FROM rr)
      WHERE rank <= $k)"""

  def twoStageSql(dim: Int, m: Int, ksub: Int, iters: Int,
                  sampleBudget: Int, shortlist: Int, k: Int,
                  queryPred: String): String = s"""
    WITH $EmbCte,
    ${twoStageCtes(dim, m, ksub, iters, sampleBudget, shortlist, k, queryPred)}
    SELECT query_id, neighbor_id, rank, cosine FROM ts_topk"""

  /** Recall of pq-alone AND twostage vs exact top-k, one row per
    * (query, method) — mirrors Similarity.annTwoStageRecall. The
    * pq-at-k set is pq_topk truncated to rank ≤ k (same est_ip
    * ordering). */
  def twoStageRecallSql(dim: Int, m: Int, ksub: Int, iters: Int,
                        sampleBudget: Int, shortlist: Int, k: Int,
                        queryPred: String): String = s"""
    WITH $EmbCte, ${bfCtes(k, queryPred)},
    ${twoStageCtes(dim, m, ksub, iters, sampleBudget, shortlist, k, queryPred)},
    bfn AS (SELECT query_id, count(*) as n_ex FROM bf GROUP BY 1),
    qs AS (SELECT vec_id FROM e WHERE $queryPred),
    pqh AS (SELECT query_id, count(*) as n
            FROM (SELECT query_id, neighbor_id FROM pq_topk
                  WHERE rank <= $k)
            JOIN bf USING (query_id, neighbor_id) GROUP BY 1),
    tsh AS (SELECT query_id, count(*) as n FROM ts_topk
            JOIN bf USING (query_id, neighbor_id) GROUP BY 1)
    SELECT q.vec_id as query_id, 'pq' as method,
      CASE WHEN coalesce(b.n_ex, 0) = 0 THEN 1.0
           ELSE cast(coalesce(h.n, 0) as double) / b.n_ex END as recall
    FROM qs q LEFT JOIN bfn b ON b.query_id = q.vec_id
      LEFT JOIN pqh h ON h.query_id = q.vec_id
    UNION ALL
    SELECT q.vec_id as query_id, 'twostage' as method,
      CASE WHEN coalesce(b.n_ex, 0) = 0 THEN 1.0
           ELSE cast(coalesce(h.n, 0) as double) / b.n_ex END as recall
    FROM qs q LEFT JOIN bfn b ON b.query_id = q.vec_id
      LEFT JOIN tsh h ON h.query_id = q.vec_id"""

  /** Per-label centroid drift (mirrors Similarity.centroidDrift):
    * dyadic-exact means per snapshot, cosine folded in dim order.
    * `curFrom` is a FROM-clause SQL fragment producing the current
    * snapshot's (label, embedding) rows. */
  def centroidDriftSql(curFrom: String): String = {
    def cents(src: String): String = s"""(
      SELECT label, dim,
        (cast(sum(cast(v * 281474976710656.0 as decimal(28,0)))
            as double) / 281474976710656.0) / count(*) as mean,
        count(*) as n_vectors
      FROM (SELECT label, generate_subscripts(embedding, 1) - 1 as dim,
              unnest(cast(embedding as double[])) as v
            FROM $src)
      GROUP BY 1, 2)"""
    s"""
    WITH a AS ${cents("embeddings")},
    b AS ${cents(s"($curFrom)")},
    j AS (SELECT a.label, a.dim, a.n_vectors as n_prev,
            b.n_vectors as n_cur,
            a.mean * b.mean as pp, a.mean * a.mean as aa,
            b.mean * b.mean as bb
          FROM a JOIN b ON a.label = b.label AND a.dim = b.dim)
    SELECT label, n_prev, n_cur,
      list_reduce(list_prepend(0.0, list(pp ORDER BY dim)),
          (x, y) -> x + y)
        / (sqrt(list_reduce(list_prepend(0.0, list(aa ORDER BY dim)),
            (x, y) -> x + y))
          * sqrt(list_reduce(list_prepend(0.0, list(bb ORDER BY dim)),
            (x, y) -> x + y))) as centroid_cosine
    FROM j GROUP BY 1, 2, 3"""
  }

  /** k-NN majority-vote classification (mirrors
    * Similarity.knnClassify): held-out queries, exact top-k over the
    * train side, (votes desc, label) tie-broken majority. */
  /** Mutual-kNN communities (mirrors Similarity.embeddingCommunities):
    * intra-cell top-k, mutual filter, recursive-CTE transitive
    * closure with min-id community labels. */
  def communitiesSql(k: Int, nlist: Int, iters: Int,
                     sampleBudget: Int): String =
    s"""WITH RECURSIVE $EmbCte, ${quantizerCtes(nlist, iters, sampleBudget)},
    tk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.neighbor_id as query_id, b.neighbor_id as neighbor_id,
          row_number() OVER (PARTITION BY a.neighbor_id ORDER BY
            ${cosine("a.emb", "b.emb")} DESC, b.neighbor_id) as rank
        FROM tagged a JOIN tagged b
          ON a.cluster = b.cluster AND a.neighbor_id <> b.neighbor_id)
      WHERE rank <= $k),
    mut AS (
      SELECT a.query_id as s, a.neighbor_id as t
      FROM tk a JOIN tk b
        ON b.query_id = a.neighbor_id AND b.neighbor_id = a.query_id),
    reach(id, r) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT reach.id, m.t FROM reach JOIN mut m ON m.s = reach.r),
    cc AS (SELECT id, min(r) as community_id FROM reach GROUP BY 1),
    sizes AS (
      SELECT community_id, cast(count(*) as bigint) as community_size
      FROM cc GROUP BY 1)
    SELECT cc.id as vec_id, cc.community_id, sizes.community_size,
      l.label as class_label, cc.id = cc.community_id as is_rep
    FROM cc JOIN sizes USING (community_id)
    JOIN embeddings l ON l.vec_id = cc.id"""

  /** Hard-negative mining (mirrors Similarity.hardNegatives): exact
    * per-anchor top-k over different-label vectors only. */
  def hardNegativesSql(k: Int, anchorMod: Int): String = s"""
    WITH el AS (SELECT vec_id, label,
                  cast(embedding as double[]) as emb FROM embeddings)
    SELECT anchor_id, anchor_label, neighbor_id, neg_label,
      cast(rank as bigint) as rank, cosine
    FROM (
      SELECT q.vec_id as anchor_id, q.label as anchor_label,
        c.vec_id as neighbor_id, c.label as neg_label,
        ${cosine("q.emb", "c.emb")} as cosine,
        row_number() OVER (PARTITION BY q.vec_id ORDER BY
          ${cosine("q.emb", "c.emb")} DESC, c.vec_id) as rank
      FROM el q JOIN el c
        ON c.vec_id <> q.vec_id AND c.label <> q.label
      WHERE q.vec_id % $anchorMod = 0)
    WHERE rank <= $k"""

  def knnClassifySql(k: Int, testMod: Int): String = s"""
    WITH $EmbCte,
    knn AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id as query_id, c.vec_id as neighbor_id,
          row_number() OVER (PARTITION BY q.vec_id ORDER BY
            ${cosine("q.emb", "c.emb")} DESC, c.vec_id) as rank
        FROM e q JOIN e c ON c.vec_id % $testMod <> 0
        WHERE q.vec_id % $testMod = 0) WHERE rank <= $k),
    v AS (SELECT query_id, l.label, count(*) as n_votes
          FROM knn JOIN embeddings l ON neighbor_id = l.vec_id
          GROUP BY 1, 2),
    p AS (SELECT query_id, label as pred_label, n_votes,
            row_number() OVER (PARTITION BY query_id
              ORDER BY n_votes DESC, label) as rn
          FROM v)
    SELECT p.query_id, q.label as true_label, p.pred_label,
      cast(p.n_votes as bigint) as n_votes,
      (q.label = p.pred_label) as correct
    FROM p JOIN embeddings q ON p.query_id = q.vec_id
    WHERE rn = 1"""

  /** MMR greedy selection (mirrors Similarity.mmrRerank): exact
    * top-`pool` candidates, k unrolled greedy rounds — the same
    * compile-time unrolling the Scala loop does, CTE per round. The
    * (1−λ) literal is the Scala double's exact decimal repr, so both
    * engines score with the identical constant. */
  def mmrSql(pool: Int, k: Int, lambda: Double,
             queryPred: String): String = {
    val lb = 1.0 - lambda
    val rounds = (2 to k).map { r =>
      s"""sel$r AS (
        SELECT query_id, neighbor_id, rel, $r as mmr_round FROM (
          SELECT c.query_id, c.neighbor_id, c.rel,
            row_number() OVER (PARTITION BY c.query_id
              ORDER BY $lambda * c.rel - $lb * m.ms DESC,
                c.neighbor_id) as rn
          FROM cand c
          JOIN (SELECT s.query_id, si.ca, max(si.sim) as ms
                FROM selu${r - 1} s JOIN sims si
                  ON si.query_id = s.query_id
                  AND si.cb = s.neighbor_id
                GROUP BY 1, 2) m
            ON m.query_id = c.query_id AND m.ca = c.neighbor_id
          WHERE NOT EXISTS (SELECT 1 FROM selu${r - 1} s2
            WHERE s2.query_id = c.query_id
              AND s2.neighbor_id = c.neighbor_id))
        WHERE rn = 1),
      selu$r AS (SELECT * FROM selu${r - 1}
        UNION ALL SELECT * FROM sel$r)"""
    }.mkString(",\n")
    s"""
    WITH $EmbCte, ${bfCtes(pool, queryPred)},
    cand AS (SELECT query_id, neighbor_id, cosine as rel FROM bf),
    sims AS (
      SELECT x.query_id, x.neighbor_id as ca, y.neighbor_id as cb,
        ${cosine("ea.emb", "eb.emb")} as sim
      FROM cand x JOIN cand y ON x.query_id = y.query_id
        AND x.neighbor_id <> y.neighbor_id
        JOIN e ea ON ea.vec_id = x.neighbor_id
        JOIN e eb ON eb.vec_id = y.neighbor_id),
    sel1 AS (
      SELECT query_id, neighbor_id, rel, 1 as mmr_round FROM (
        SELECT query_id, neighbor_id, rel,
          row_number() OVER (PARTITION BY query_id
            ORDER BY rel DESC, neighbor_id) as rn
        FROM cand) WHERE rn = 1),
    selu1 AS (SELECT * FROM sel1),
    $rounds
    SELECT query_id, neighbor_id, rel,
      cast(mmr_round as bigint) as mmr_round
    FROM selu$k"""
  }

  def lshSql(dim: Int, bits: Int, tables: Int, k: Int,
             queryPred: String): String =
    s"""WITH $EmbCte, ${sigCtes(dim, bits, tables)}, ${lshTopkCtes(k, queryPred)}
       SELECT query_id, neighbor_id, rank, cosine FROM lsh_topk"""

  def ivfSql(nlist: Int, nprobe: Int, k: Int, iters: Int, sampleBudget: Int,
             queryPred: String): String =
    s"""WITH $EmbCte, ${ivfCtes(nlist, nprobe, k, iters, sampleBudget, queryPred)}
       SELECT query_id, neighbor_id, cluster, rank, cosine FROM ivf_topk"""

  def recallSql(dim: Int, bits: Int, tables: Int, nlist: Int, nprobe: Int,
                k: Int, iters: Int, sampleBudget: Int,
                queryPred: String): String = s"""
    WITH $EmbCte, ${bfCtes(k, queryPred)}, ${sigCtes(dim, bits, tables)},
    ${lshTopkCtes(k, queryPred)},
    ${ivfCtes(nlist, nprobe, k, iters, sampleBudget, queryPred)},
    bfn AS (SELECT query_id, count(*) as n_ex FROM bf GROUP BY 1)
    SELECT q.vec_id as query_id, 'lsh' as method,
      CASE WHEN coalesce(b.n_ex, 0) = 0 THEN 1.0
           ELSE cast(coalesce(h.n, 0) as double) / b.n_ex END as recall
    FROM (SELECT vec_id FROM e WHERE $queryPred) q
      LEFT JOIN bfn b ON b.query_id = q.vec_id
      LEFT JOIN
      (SELECT query_id, count(*) as n FROM lsh_topk
         JOIN bf USING (query_id, neighbor_id) GROUP BY 1) h
      ON h.query_id = q.vec_id
    UNION ALL
    SELECT q.vec_id as query_id, 'ivf' as method,
      CASE WHEN coalesce(b.n_ex, 0) = 0 THEN 1.0
           ELSE cast(coalesce(h.n, 0) as double) / b.n_ex END as recall
    FROM (SELECT vec_id FROM e WHERE $queryPred) q
      LEFT JOIN bfn b ON b.query_id = q.vec_id
      LEFT JOIN
      (SELECT query_id, count(*) as n FROM ivf_topk
         JOIN bf USING (query_id, neighbor_id) GROUP BY 1) h
      ON h.query_id = q.vec_id"""

  /** Per-label cluster-quality audit (mirrors
    * Similarity.clusterQuality): dyadic-exact centroids, every
    * vector scored against every centroid with the portable cosine
    * chain, confusion = closer-to-another-centroid, nearest other
    * centroid by (cosine desc, label). */
  val clusterQualitySql: String = {
    val cc = (a: String, b: String) =>
      s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * " +
        s"sqrt(list_dot_product($b, $b)))"
    s"""
    WITH el AS (SELECT vec_id, label, cast(embedding as double[]) as emb
                FROM embeddings),
    cl AS (SELECT label, dim,
             (cast(sum(cast(v * 281474976710656.0 as decimal(28,0)))
                 as double) / 281474976710656.0) / count(*) as mean
           FROM (SELECT label, generate_subscripts(embedding, 1) - 1 as dim,
                   unnest(cast(embedding as double[])) as v
                 FROM embeddings)
           GROUP BY 1, 2),
    cent AS (SELECT label, list(mean ORDER BY dim) as cvec
             FROM cl GROUP BY 1),
    sc AS (SELECT e.vec_id, e.label, c.label as clabel,
             ${cc("e.emb", "c.cvec")} as cos
           FROM el e CROSS JOIN cent c),
    per AS (SELECT o.label, o.vec_id, o.cos as own_cos, t.other_max
            FROM (SELECT vec_id, label, cos FROM sc
                  WHERE label = clabel) o
            JOIN (SELECT vec_id, max(cos) as other_max FROM sc
                  WHERE label <> clabel GROUP BY 1) t USING (vec_id)),
    agg AS (SELECT label, cast(count(*) as bigint) as n_vectors,
              min(own_cos) as min_cos_own,
              cast(sum(CASE WHEN other_max > own_cos THEN 1 ELSE 0 END)
                as bigint) as n_confused
            FROM per GROUP BY 1),
    cc AS (SELECT a.label, b.label as nearest_label,
             ${cc("a.cvec", "b.cvec")} as nearest_centroid_cos,
             row_number() OVER (PARTITION BY a.label ORDER BY
               ${cc("a.cvec", "b.cvec")} DESC, b.label) as rn
           FROM cent a JOIN cent b ON a.label <> b.label)
    SELECT agg.label, n_vectors, min_cos_own, n_confused,
      n_confused * 1000000 // n_vectors as confused_ppm,
      cc.nearest_label, cc.nearest_centroid_cos
    FROM agg LEFT JOIN cc ON cc.label = agg.label AND cc.rn = 1"""
  }

  /** Mirrors Similarity.retrievalMrr: first same-label hit rank in
    * the exact and PQ-ADC top-k, reciprocal scaled by 2520 (exact
    * integer division for every rank ≤ 10). */
  def retrievalMrrSql(k: Int, dim: Int, m: Int, ksub: Int, iters: Int,
                      sampleBudget: Int, queryPred: String): String = s"""
    WITH $EmbCte,
    ${bfCtes(k, queryPred)},
    ${pqCtes(dim, m, ksub, iters, sampleBudget, k, queryPred)},
    lab AS (SELECT vec_id as neighbor_id, label as n_label
            FROM embeddings),
    ql AS (SELECT vec_id as query_id, label as q_label
           FROM embeddings WHERE $queryPred),
    hits AS (
      SELECT 'exact' as method, t.query_id,
        cast(min(t.rank) as bigint) as first_hit
      FROM bf t JOIN lab USING (neighbor_id) JOIN ql USING (query_id)
      WHERE n_label = q_label GROUP BY 1, 2
      UNION ALL
      SELECT 'pq' as method, t.query_id,
        cast(min(t.rank) as bigint) as first_hit
      FROM pq_topk t JOIN lab USING (neighbor_id) JOIN ql USING (query_id)
      WHERE n_label = q_label GROUP BY 1, 2),
    meth AS (SELECT 'exact' as method UNION ALL SELECT 'pq')
    SELECT q.query_id, meth.method,
      cast(coalesce(h.first_hit, 0) as bigint) as first_hit_rank,
      cast(coalesce(2520 // h.first_hit, 0) as bigint) as rr_x2520
    FROM ql q CROSS JOIN meth
    LEFT JOIN hits h ON h.query_id = q.query_id
      AND h.method = meth.method"""

  // ——— spectral family (graft.operators.Spectral) ———————————————
  // Exact power-of-two quantization (floor(x·2¹⁰) — float multiply by
  // a power of two is exact) makes every moment an order-independent
  // integer sum; products run 19×18 / 17×19 / 4×34 wide so DuckDB
  // leaves its overflow-prone int64 multiply path (an operand ≤ 18
  // digits wide keeps the physical bigint kernel) while staying
  // inside decimal(38).

  /** Quantized-code CTEs `qv(vec_id, qs)` + indexed pairs
    * `pe(i, j, qi, qj)` for j ≥ i (two-level correlated unnest —
    * DuckDB zips same-SELECT unnests, so the j range gets its own
    * level). */
  private val SpectralCtes: String = """
    qv AS (SELECT vec_id,
             list_transform(cast(embedding as double[]),
               x -> cast(floor(x * 1024.0) as bigint)) as qs
           FROM embeddings),
    eiv AS (SELECT vec_id, qs,
              unnest(generate_series(1, len(qs))) as ii FROM qv),
    prv AS (SELECT ii - 1 as i, qs[ii] as qi, qs,
              unnest(generate_series(ii, len(qs))) as jj FROM eiv),
    pe AS (SELECT cast(i as int) as i, cast(jj - 1 as int) as j,
             qi, qs[jj] as qj FROM prv),
    cov AS (SELECT i, j, cast(count(*) as bigint) as n_rows,
              cast(sum(qi * qj) as bigint) as s_ij,
              cast(sum(qi) as bigint) as s_i,
              cast(sum(qj) as bigint) as s_j
            FROM pe GROUP BY 1, 2),
    covn AS (SELECT *,
               cast(cast(n_rows as decimal(19,0))
                      * cast(s_ij as decimal(18,0))
                    - cast(s_i as decimal(19,0))
                      * cast(s_j as decimal(18,0))
                 as decimal(38,0)) as cov_num
             FROM cov)"""

  /** Mirrors Spectral.covariance. */
  def covarianceSql(): String = s"""
    WITH $SpectralCtes
    SELECT i, j, n_rows, s_ij, s_i, s_j,
      cast(cov_num as varchar) as cov_num FROM covn"""

  /** Full-matrix + two unnormalized power steps (mirrors
    * Spectral.powerIterate). */
  private val PowerCtes: String = s"""
    $SpectralCtes,
    mfull AS (SELECT i, j, cast(cov_num as decimal(17,0)) as c FROM covn
              UNION ALL
              SELECT j, i, cast(cov_num as decimal(17,0)) FROM covn
              WHERE i <> j),
    pv1 AS (SELECT i as dim, cast(sum(c) as decimal(19,0)) as v1
            FROM mfull GROUP BY 1),
    pv2 AS (SELECT m.i as dim, cast(sum(m.c * p.v1) as decimal(34,0)) as v2
            FROM mfull m JOIN pv1 p ON m.j = p.dim GROUP BY 1)"""

  /** Mirrors Spectral.powerIterate. */
  def powerIterateSql(): String = s"""
    WITH $PowerCtes
    SELECT pv2.dim, cast(pv1.v1 as varchar) as v1,
      cast(pv2.v2 as varchar) as v2
    FROM pv2 JOIN pv1 ON pv2.dim = pv1.dim"""

  /** Mirrors Spectral.isotropyAudit. */
  def isotropySql(): String = s"""
    WITH $SpectralCtes,
    ab AS (SELECT i, j, cov_num,
             CASE WHEN cov_num < 0 THEN -cov_num ELSE cov_num END as a
           FROM covn),
    tot AS (SELECT
              cast(sum(CASE WHEN i = j THEN 1 END) as bigint) as n_dims,
              cast(cast(sum(CASE WHEN i = j THEN cov_num END)
                as decimal(38,0)) as varchar) as trace,
              cast(cast(sum(CASE WHEN i <> j THEN a END)
                as decimal(38,0)) as varchar) as offdiag_abs
            FROM ab),
    topp AS (SELECT i as top_i, j as top_j,
               cast(a as varchar) as top_abs
             FROM (SELECT *, row_number() OVER (ORDER BY a DESC, i, j)
                     as rn FROM ab WHERE i <> j) q
             WHERE rn = 1)
    SELECT n_dims, trace, offdiag_abs, top_i, top_j, top_abs
    FROM tot, topp"""

  /** Mirrors Spectral.project. */
  def projectSql(): String = s"""
    WITH $PowerCtes,
    qd AS (SELECT vec_id, generate_subscripts(qs, 1) - 1 as dim,
             unnest(qs) as q FROM qv)
    SELECT qd.vec_id,
      cast(cast(sum(cast(qd.q as decimal(4,0)) * cast(pv2.v2 as decimal(34,0)))
        as decimal(38,0)) as varchar) as score
    FROM qd JOIN pv2 ON qd.dim = pv2.dim
    GROUP BY 1"""

  /** Matryoshka truncation audit (mirrors Similarity.annDimSweep):
    * per-dim truncated brute-force top-k via `emb[1:d]` list slices
    * (same sequential dot-product fold over the prefix), recall
    * graded against the full-dim exact top-k. */
  def dimSweepSql(k: Int, dims: Seq[Int], queryPred: String): String = {
    def tcos(a: String, b: String, d: Int): String = {
      val (sa, sb) = (s"$a[1:$d]", s"$b[1:$d]")
      s"list_dot_product($sa, $sb) / (sqrt(list_dot_product($sa, $sa)) * " +
        s"sqrt(list_dot_product($sb, $sb)))"
    }
    val topks = dims.map { d => s"""
    t$d AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id as query_id, c.vec_id as neighbor_id,
          row_number() OVER (PARTITION BY q.vec_id ORDER BY
            ${tcos("q.emb", "c.emb", d)} DESC, c.vec_id) as rank
        FROM e q JOIN e c ON c.vec_id <> q.vec_id
        WHERE q.$queryPred) WHERE rank <= $k)""" }.mkString(",")
    val legs = dims.map { d => s"""
    SELECT q.vec_id as query_id, cast($d as bigint) as dim,
      CASE WHEN coalesce(b.n_ex, 0) = 0 THEN 1.0
           ELSE cast(coalesce(h.n, 0) as double) / b.n_ex END as recall
    FROM (SELECT vec_id FROM e WHERE $queryPred) q
      LEFT JOIN bfn b ON b.query_id = q.vec_id
      LEFT JOIN
      (SELECT query_id, count(*) as n FROM t$d
         JOIN bf USING (query_id, neighbor_id) GROUP BY 1) h
      ON h.query_id = q.vec_id""" }.mkString("\n    UNION ALL")
    s"""WITH $EmbCte, ${bfCtes(k, queryPred)},
    bfn AS (SELECT query_id, count(*) as n_ex FROM bf GROUP BY 1),
    $topks
    $legs"""
  }

  /** Triplet-margin audit (mirrors Similarity.tripletAudit): nearest
    * same-label and other-label vectors per anchor, violation flag
    * on the fixed cosine chains. */
  def tripletAuditSql(anchorMod: Int, margin: Double): String = s"""
    WITH $EmbCte,
    lab AS (SELECT vec_id, label FROM embeddings),
    anc AS (
      SELECT e.vec_id as anchor_id, l.label as anchor_label,
        e.emb as q_emb
      FROM e JOIN lab l ON l.vec_id = e.vec_id
      WHERE e.vec_id % $anchorMod = 0),
    sc AS (
      SELECT a.anchor_id, a.anchor_label, c.vec_id as neighbor_id,
        ${cosine("a.q_emb", "c.emb")} as cosine,
        (lc.label = a.anchor_label) as same
      FROM anc a JOIN e c ON c.vec_id <> a.anchor_id
      JOIN lab lc ON lc.vec_id = c.vec_id),
    top AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY anchor_id, same
          ORDER BY cosine DESC, neighbor_id) as rn
        FROM sc) WHERE rn = 1)
    SELECT p.anchor_id, p.anchor_label, p.neighbor_id as pos_id,
      p.cosine as cos_pos, n.neighbor_id as neg_id,
      n.cosine as cos_neg,
      n.cosine + cast($margin as double) >= p.cosine as violated
    FROM (SELECT * FROM top WHERE same) p
    JOIN (SELECT * FROM top WHERE NOT same) n
      ON n.anchor_id = p.anchor_id"""

  /** PQ reconstruction-distortion histogram (mirrors
    * Similarity.pqDistortion): per-(vec, sub) assignment against the
    * final codebook, per-sub chain s·s − 2·(s·c) + c·c, sub-ordered
    * left fold, floor bucketing. */
  def pqDistortionSql(dim: Int, m: Int, ksub: Int, iters: Int,
                      sampleBudget: Int, binWidth: Double): String = {
    val cf = s"pc$iters"
    val score = (s: String, c: String) =>
      s"list_dot_product($s, $c.cent) - 0.5 * " +
        s"list_dot_product($c.cent, $c.cent)"
    s"""WITH $EmbCte,
    ${pqCodebookCtes(dim, m, ksub, iters, sampleBudget, "vec_id < 0")},
    passn AS (
      SELECT vec_id, sub, semb, code FROM (
        SELECT s.vec_id, s.sub, s.semb, c.code,
          row_number() OVER (PARTITION BY s.vec_id, s.sub
            ORDER BY ${score("s.semb", "c")} DESC, c.code) as rn
        FROM esub s JOIN $cf c ON c.sub = s.sub) WHERE rn = 1),
    pd AS (
      SELECT a.vec_id, a.sub,
        list_dot_product(a.semb, a.semb)
          - 2.0 * list_dot_product(a.semb, c.cent)
          + list_dot_product(c.cent, c.cent) as dj
      FROM passn a JOIN $cf c ON c.sub = a.sub AND c.code = a.code),
    pv AS (
      SELECT vec_id,
        list_reduce(list(dj ORDER BY sub), (a, b) -> a + b) as d
      FROM pd GROUP BY 1)
    SELECT bucket, count(*) as n_vectors,
      cast(bucket as double) * $binWidth as bucket_lo
    FROM (SELECT cast(floor(d / $binWidth) as bigint) as bucket FROM pv)
    GROUP BY 1"""
  }

  /** IVF nprobe tuning curve (mirrors Similarity.annNprobeCurve):
    * ONE quantizer fit, probe ranks computed once without a limit,
    * each swept nprobe filters `rn <= np` and grades recall@k vs the
    * exact top-k. */
  def nprobeCurveSql(nlist: Int, nprobes: Seq[Int], k: Int, iters: Int,
                     sampleBudget: Int, queryPred: String): String = {
    val cf = s"c$iters"
    val cos = (a: String, b: String) =>
      s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * " +
        s"sqrt(list_dot_product($b, $b)))"
    val topks = nprobes.map { np => s"""
    t$np AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, t.neighbor_id,
          row_number() OVER (PARTITION BY p.query_id
            ORDER BY ${cos("p.q_emb", "t.emb")} DESC, t.neighbor_id) as rank
        FROM tagged t JOIN (SELECT * FROM pr WHERE rn <= $np) p
          USING (cluster)
        WHERE t.neighbor_id <> p.query_id)
      WHERE rank <= $k)""" }.mkString(",")
    val legs = nprobes.map { np => s"""
    SELECT q.vec_id as query_id, cast($np as bigint) as nprobe,
      CASE WHEN coalesce(b.n_ex, 0) = 0 THEN 1.0
           ELSE cast(coalesce(h.n, 0) as double) / b.n_ex END as recall
    FROM (SELECT vec_id FROM e WHERE $queryPred) q
      LEFT JOIN bfn b ON b.query_id = q.vec_id
      LEFT JOIN
      (SELECT query_id, count(*) as n FROM t$np
         JOIN bf USING (query_id, neighbor_id) GROUP BY 1) h
      ON h.query_id = q.vec_id""" }.mkString("\n    UNION ALL")
    s"""WITH $EmbCte, ${bfCtes(k, queryPred)},
    bfn AS (SELECT query_id, count(*) as n_ex FROM bf GROUP BY 1),
    ${quantizerCtes(nlist, iters, sampleBudget)},
    pr AS (
      SELECT vec_id as query_id, emb as q_emb, cluster, rn FROM (
        SELECT e.vec_id, e.emb, c.cluster,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY list_dot_product(e.emb, c.cent) DESC, c.cluster) as rn
        FROM e CROSS JOIN $cf c WHERE e.$queryPred)),
    $topks
    $legs"""
  }
}
