package graft

import graft.functions.expressions.MinHashConstants

/** DuckDB SQL builders replicating graft's text-dedup operators
  * bit-for-bit (MinHash-LSH, SimHash, winnowing fingerprints), so
  * `dedup_minhash_lsh` / `ngram_jaccard` / `dedup_simhash` /
  * `doc_fingerprint` are hash-checked rather than rows-only.
  *
  * Replication rests on two design choices in the kernels:
  * the per-token content hash is the sha256-prefix
  * ([[graft.functions.expressions.TextHash]] ≡
  * `('0x' || substr(sha256(s),1,15))::BIGINT`), and every mix/fold is
  * plain 63-bit-safe integer arithmetic (xor / mask / multiply / mod)
  * with the per-permutation constants embedded as literals below.
  */
object TextOracleSql {

  val Sha60 = "('0x' || substr(sha256(%s), 1, 15))::BIGINT"

  private def sha60(col: String) = Sha60.format(col)

  /** The MinHashConstants.PermConsts table as VALUES literals. */
  private def permsCte(numPerm: Int): String = {
    val values = MinHashConstants.PermConsts.take(numPerm).zipWithIndex
      .map { case (c, i) => s"($i, $c)" }.mkString(", ")
    s"perms(i, c) AS (VALUES $values)"
  }

  /** Word k-shingle CTEs `docs` + `sh(doc_id, shingles)`, with the
    * whole-doc fallback below k tokens (matches WordShinglesKernel). */
  private def shingleCtes(k: Int): String = s"""
    docs AS (SELECT doc_id, string_split(text, ' ') as toks FROM documents),
    sh AS (
      SELECT doc_id,
        CASE WHEN len(toks) >= $k
          THEN list_transform(range(len(toks) - ${k - 1}),
                 i -> array_to_string(toks[i+1:i+$k], ' '))
          ELSE [array_to_string(toks, ' ')] END as shingles
      FROM docs)"""

  /** MinHash → banded-LSH → Jaccard-verified pairs
    * `jac(id_a, id_b, jaccard)`. Mirrors Dedup.minhashLsh: xor-mask-
    * multiply-shift mix per permutation, 31-bit multiply-accumulate
    * band fold, token-set Jaccard on candidates only. */
  /** MinHash signature CTEs `shx, hs, minv, sigl` — band-layout
    * independent (signatures depend only on numPerm), so one set
    * serves any number of band configurations. */
  private def sigCtes(numPerm: Int): String = s"""
    shx AS (SELECT doc_id, unnest(list_distinct(shingles)) as s FROM sh),
    hs AS (SELECT doc_id, ${sha60("s")} as h FROM shx),
    minv AS (
      SELECT doc_id, p.i,
        min(xor((xor(h, p.c) & 2147483647) * 2654435761,
                ((xor(h, p.c) & 2147483647) * 2654435761) >> 31)) as m
      FROM hs CROSS JOIN perms p GROUP BY 1, 2),
    sigl AS (SELECT doc_id, list(m ORDER BY i) as sig FROM minv GROUP BY 1)"""

  /** One banded-LSH CTE (default name `bands`) over `sigl` for a given
    * (bands, rowsPerBand) factorization — suffix the name to evaluate
    * several configurations against the SAME signatures. */
  private def bandCte(numPerm: Int, bands: Int,
                      name: String = "bands"): String = {
    val r = numPerm / bands
    s"""
    $name AS (
      SELECT doc_id, j.j as band_id,
        list_reduce(list_prepend(0, sig[j.j*$r+1 : j.j*$r+$r]),
          (acc, v) -> (acc * 2654435761 + (v & 2147483647)) % 2147483648)
          as band_hash
      FROM sigl, (SELECT unnest(range($bands)) as j) j)"""
  }

  /** MinHash signature + band CTEs `shx, hs, minv, sigl, bands`
    * shared by the pairwise and incremental dedup oracles. */
  private def sigBandCtes(numPerm: Int, bands: Int): String =
    sigCtes(numPerm) + "," + bandCte(numPerm, bands)

  /** Over-cap bucket skip list + capped candidate pairs (mirrors
    * Dedup.lshCandidates' maxBucket guard). CTE names are
    * parameterized so several band configurations can coexist in one
    * query (the parameter sweep). */
  private def cappedCandCte(maxBucket: Int, bandsName: String = "bands",
                            bigbName: String = "bigb",
                            candName: String = "cand"): String = s"""
    $bigbName AS (
      SELECT band_id, band_hash FROM $bandsName
      GROUP BY 1, 2 HAVING count(*) > $maxBucket),
    $candName AS (
      SELECT a.doc_id as id_a, b.doc_id as id_b
      FROM $bandsName a JOIN $bandsName b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
      WHERE NOT EXISTS (SELECT 1 FROM $bigbName g
        WHERE g.band_id = a.band_id AND g.band_hash = a.band_hash)
      GROUP BY 1, 2)"""

  private def lshPairCtes(numPerm: Int, bands: Int,
                          maxBucket: Int = 4096): String = {
    s"""
    ${sigBandCtes(numPerm, bands)},
    ${cappedCandCte(maxBucket)},
    sets AS (SELECT doc_id, list_distinct(shingles) as sset FROM sh),
    jac AS (
      SELECT id_a, id_b,
        cast(len(list_filter(sa.sset, x -> list_contains(sb.sset, x))) as double)
          / (len(sa.sset) + len(sb.sset)
             - len(list_filter(sa.sset, x -> list_contains(sb.sset, x))))
          as jaccard
      FROM cand
        JOIN sets sa ON sa.doc_id = id_a
        JOIN sets sb ON sb.doc_id = id_b)"""
  }

  /** Duplicate clusters = connected components of the MinHash-LSH
    * near-dup pair graph (mirrors Clusters.duplicateClusters over
    * Dedup.minhashLsh): transitive closure by recursive CTE, cluster
    * id = min reachable doc_id, singletons included. */
  private def clusterCtes(shingleK: Int, numPerm: Int, bands: Int,
                          threshold: Double): String =
    s"""WITH RECURSIVE ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
       ${lshPairCtes(numPerm, bands)},
       dup AS (SELECT id_a, id_b FROM jac WHERE jaccard >= $threshold),
       edges AS (SELECT id_a as s, id_b as t FROM dup
                 UNION SELECT id_b, id_a FROM dup),
       reach(id, r) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT reach.id, e.t FROM reach JOIN edges e ON e.s = reach.r),
       cc AS (SELECT id as doc_id, min(r) as cluster_id FROM reach GROUP BY 1),
       sizes AS (SELECT cluster_id, count(*) as cluster_size FROM cc GROUP BY 1)"""

  def dedupClustersSql(shingleK: Int, numPerm: Int, bands: Int,
                       threshold: Double): String =
    s"""${clusterCtes(shingleK, numPerm, bands, threshold)}
       SELECT doc_id, cluster_id, cluster_size,
         doc_id = cluster_id as is_canonical
       FROM cc JOIN sizes USING (cluster_id)"""

  /** Golden-record survivorship over the SAME closure (mirrors
    * Clusters.goldenRecords ∘ duplicateClusters): per-cluster merged
    * record — canonical text from the min-id survivor, max n_chars,
    * mode lang with smallest-value tie-break, distinct sources. */
  def goldenRecordsSql(shingleK: Int, numPerm: Int, bands: Int,
                       threshold: Double): String =
    s"""${clusterCtes(shingleK, numPerm, bands, threshold)},
       j AS (SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars,
               cc.cluster_id
             FROM documents d JOIN cc ON cc.doc_id = d.doc_id),
       lm AS (SELECT cluster_id, lang as lang_mode FROM (
           SELECT cluster_id, lang,
             row_number() OVER (PARTITION BY cluster_id
               ORDER BY count(*) DESC, lang) as rk
           FROM j GROUP BY cluster_id, lang)
         WHERE rk = 1),
       ag AS (SELECT cluster_id, count(*) as n_docs,
                max(n_chars) as max_n_chars,
                count(DISTINCT source) as n_sources
              FROM j GROUP BY 1)
       SELECT ag.cluster_id as canonical_doc_id, ag.n_docs,
         ag.max_n_chars, ag.n_sources, lm.lang_mode,
         d.text as canonical_text
       FROM ag
         JOIN lm USING (cluster_id)
         JOIN documents d ON d.doc_id = ag.cluster_id"""

  /** Cluster-size histogram over the SAME closure (mirrors
    * Clusters.clusterStats ∘ duplicateClusters): the dedup outcome
    * report — how much of the corpus is duplicated, at what cluster
    * granularity, and how many docs the apply step would remove. */
  def dedupStatsSql(shingleK: Int, numPerm: Int, bands: Int,
                    threshold: Double): String =
    s"""${clusterCtes(shingleK, numPerm, bands, threshold)}
       SELECT cluster_size,
         count(*) as n_clusters,
         cluster_size * count(*) as n_docs,
         (cluster_size - 1) * count(*) as n_docs_removable
       FROM sizes GROUP BY cluster_size"""

  def minhashLshSql(shingleK: Int, numPerm: Int, bands: Int,
                    threshold: Double): String =
    s"""WITH ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
       ${lshPairCtes(numPerm, bands)}
       SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= $threshold"""

  def ngramJaccardSql(shingleK: Int, numPerm: Int, bands: Int): String =
    s"""WITH ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
       ${lshPairCtes(numPerm, bands)}
       SELECT id_a, id_b, jaccard FROM jac"""

  /** Asymmetric containment over the same LSH candidates (mirrors
    * Dedup.ngramContainment). */
  def ngramContainmentSql(shingleK: Int, numPerm: Int, bands: Int): String =
    s"""WITH ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
       ${lshPairCtes(numPerm, bands)},
       cont AS (
         SELECT id_a, id_b,
           cast(len(list_filter(sa.sset, x -> list_contains(sb.sset, x)))
             as bigint) as n_shared,
           len(sa.sset) as na, len(sb.sset) as nb
         FROM cand
           JOIN sets sa ON sa.doc_id = id_a
           JOIN sets sb ON sb.doc_id = id_b)
       SELECT id_a, id_b, n_shared,
         cast(n_shared as double) / na as containment_a,
         cast(n_shared as double) / nb as containment_b
       FROM cont"""

  /** 60-bit SimHash pigeonhole pairs (mirrors Dedup.simhashPairs):
    * per-bit majority over token hashes, 4 × 15-bit chunks, candidate
    * join on any equal chunk, exact hamming verify. */
  def simhashSql(maxHamming: Int): String = s"""
    WITH tokh AS (
      SELECT doc_id, ${sha60("tok")} as h
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) as tok
            FROM documents)),
    bitcnt AS (
      SELECT doc_id, b.b as b,
        sum(case when ((h >> b.b) & 1) = 1 then 1 else -1 end) as cnt
      FROM tokh, (SELECT unnest(range(60)) as b) b GROUP BY 1, 2),
    chunks AS (
      SELECT doc_id, cast(b // 15 as int) as chunk_idx,
        cast(sum(case when cnt > 0 then 1 << (b % 15) else 0 end) as int)
          as chunk_val
      FROM bitcnt GROUP BY 1, 2),
    clist AS (
      SELECT doc_id, list(chunk_val ORDER BY chunk_idx) as chunks
      FROM chunks GROUP BY 1),
    sbigb AS (
      SELECT chunk_idx, chunk_val FROM chunks
      GROUP BY 1, 2 HAVING count(*) > 4096),
    scand AS (
      SELECT a.doc_id as id_a, b.doc_id as id_b
      FROM chunks a JOIN chunks b
        ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
       AND a.doc_id < b.doc_id
      WHERE NOT EXISTS (SELECT 1 FROM sbigb g
        WHERE g.chunk_idx = a.chunk_idx AND g.chunk_val = a.chunk_val)
      GROUP BY 1, 2),
    sham AS (
      SELECT id_a, id_b,
        cast(list_sum(list_transform(range(4),
          i -> bit_count(cast(xor(ca.chunks[i+1], cb.chunks[i+1]) as bigint))))
          as bigint) as hamming
      FROM scand
        JOIN clist ca ON ca.doc_id = id_a
        JOIN clist cb ON cb.doc_id = id_b)
    SELECT id_a, id_b, hamming FROM sham WHERE hamming <= $maxHamming"""

  /** Cross-corpus contamination check (mirrors Dedup.contamination):
    * distinct shared n-grams per (train, bench) pair + benchmark
    * coverage fraction. `benchPred` selects the benchmark subset. */
  def contaminationSql(ngramK: Int, benchPred: String): String = s"""
    WITH ${shingleCtes(ngramK)},
    tg AS (SELECT doc_id as train_doc, unnest(list_distinct(shingles)) as g
           FROM sh),
    bg AS (SELECT doc_id as bench_doc, unnest(list_distinct(shingles)) as g
           FROM sh WHERE $benchPred),
    bsz AS (SELECT doc_id as bench_doc,
              len(list_distinct(shingles)) as n_bench
            FROM sh WHERE $benchPred),
    pairs AS (
      SELECT train_doc, bench_doc, count(*) as shared_ngrams
      FROM tg JOIN bg USING (g)
      WHERE train_doc <> bench_doc
      GROUP BY 1, 2)
    SELECT train_doc, bench_doc, shared_ngrams,
      cast(shared_ngrams as double) / n_bench as contamination
    FROM pairs JOIN bsz USING (bench_doc)"""

  /** Winnowing fingerprints (mirrors TextAnalysis.fingerprints):
    * k-gram sha60 hashes, w-window minima, distinct per doc. */
  def fingerprintSql(k: Int, w: Int): String = s"""
    WITH ${shingleCtes(k)},
    hs AS (
      SELECT doc_id,
        list_transform(shingles, g -> ${sha60("g")}) as hashes
      FROM sh),
    wins AS (
      SELECT doc_id,
        CASE WHEN len(hashes) >= $w
          THEN list_transform(range(len(hashes) - ${w - 1}),
                 i -> list_min(hashes[i+1:i+$w]))
          ELSE [list_min(hashes)] END as mins
      FROM hs)
    SELECT doc_id, unnest(list_distinct(mins)) as fingerprint FROM wins"""

  /** Indexed eval-contamination scan (mirrors the
    * `versioned_keyed_read` composition in `contamination_indexed`):
    * train docs sharing any exact `chunkTokens`-token chunk with the
    * eval split, with the distinct shared-chunk count. */
  def contaminationIndexedSql(chunkTokens: Int, evalPred: String): String = s"""
    WITH ${chunkCtes(chunkTokens)},
    ex AS (SELECT doc_id, unnest(chunks) as chunk FROM ch),
    hs AS (SELECT doc_id, ${sha60("chunk")} as h FROM ex),
    ev AS (SELECT DISTINCT h FROM hs WHERE $evalPred)
    SELECT doc_id, count(DISTINCT h) as n_shared_chunks
    FROM hs JOIN ev USING (h)
    WHERE NOT ($evalPred)
    GROUP BY 1"""

  /** `docs` + `ch(doc_id, chunks)` with fixed-width token chunks
    * (mirrors CorpusClean.chunked). */
  private def chunkCtes(chunkTokens: Int): String = s"""
    docs AS (SELECT doc_id, string_split(text, ' ') as toks FROM documents),
    ch AS (
      SELECT doc_id,
        list_transform(range((len(toks) + ${chunkTokens - 1}) // $chunkTokens),
          i -> array_to_string(
                 toks[i*$chunkTokens+1 : i*$chunkTokens+$chunkTokens], ' '))
          as chunks
      FROM docs)"""

  /** Sliding-window chunking (mirrors TextAnalysis.docChunk): start
    * positions every `stride` tokens, `chunkTokens`-token windows. */
  def docChunkSql(chunkTokens: Int, stride: Int): String = s"""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') as toks
                  FROM documents),
    ex AS (SELECT doc_id, cast(len(toks) as bigint) as n_tokens,
             unnest(range((len(toks) - 1) // $stride + 1)) as i, toks
           FROM docs)
    SELECT doc_id, n_tokens, cast(i as bigint) as chunk_id,
      cast(i * $stride as bigint) as tok_start,
      least($chunkTokens, n_tokens - i * $stride) as n_chunk_tokens,
      array_to_string(
        toks[i*$stride+1 : i*$stride+$chunkTokens], ' ') as chunk_text
    FROM ex"""

  /** C4-style corpus-level paragraph dedup (mirrors
    * CorpusClean.paragraphDedup). */
  def paragraphDedupSql(chunkTokens: Int, maxFreq: Long): String = s"""
    WITH ${chunkCtes(chunkTokens)},
    ex AS (SELECT doc_id, generate_subscripts(chunks, 1) as chunk_id,
             unnest(chunks) as chunk FROM ch),
    freq AS (SELECT ${sha60("chunk")} as h, count(*) as n FROM ex GROUP BY 1),
    banned AS (SELECT h FROM freq WHERE n > $maxFreq),
    kept AS (SELECT doc_id, chunk_id, chunk FROM ex
             WHERE ${sha60("chunk")} NOT IN (SELECT h FROM banned)),
    agg AS (SELECT doc_id,
              string_agg(chunk, ' ' ORDER BY chunk_id) as text_clean,
              count(*) as n_kept
            FROM kept GROUP BY 1)
    SELECT c.doc_id, coalesce(a.text_clean, '') as text_clean,
      cast(len(c.chunks) as bigint) as n_chunks,
      cast(coalesce(a.n_kept, 0) as bigint) as n_chunks_kept
    FROM ch c LEFT JOIN agg a USING (doc_id)"""

  /** Intra-document duplicate-chunk removal (mirrors
    * CorpusClean.intraDocDedup). */
  def intraDocDedupSql(chunkTokens: Int): String = s"""
    WITH ${chunkCtes(chunkTokens)},
    ex AS (SELECT doc_id, generate_subscripts(chunks, 1) as chunk_id,
             unnest(chunks) as chunk FROM ch),
    firsts AS (
      SELECT doc_id, chunk_id, chunk,
        row_number() OVER (PARTITION BY doc_id, chunk ORDER BY chunk_id) as rn
      FROM ex),
    agg AS (SELECT doc_id,
              string_agg(chunk, ' ' ORDER BY chunk_id) as text_clean,
              count(*) as n_kept
            FROM firsts WHERE rn = 1 GROUP BY 1)
    SELECT c.doc_id, a.text_clean,
      cast(len(c.chunks) as bigint) as n_chunks,
      cast(a.n_kept as bigint) as n_chunks_kept
    FROM ch c JOIN agg a USING (doc_id)"""

  /** Per-source boilerplate strip (mirrors
    * CorpusClean.boilerplatePerSource): chunks in more than `maxDocs`
    * DISTINCT docs of the same source are removed from that source's
    * documents. */
  def boilerplatePerSourceSql(chunkTokens: Int, maxDocs: Long): String = s"""
    WITH docs AS (SELECT doc_id, source, string_split(text, ' ') as toks
                  FROM documents),
    ch AS (
      SELECT doc_id, source,
        list_transform(range((len(toks) + ${chunkTokens - 1}) // $chunkTokens),
          i -> array_to_string(
                 toks[i*$chunkTokens+1 : i*$chunkTokens+$chunkTokens], ' '))
          as chunks
      FROM docs),
    ex AS (SELECT doc_id, source,
             generate_subscripts(chunks, 1) as chunk_id,
             unnest(chunks) as chunk FROM ch),
    exh AS (SELECT doc_id, source, chunk_id, chunk,
              ${sha60("chunk")} as h FROM ex),
    occ AS (SELECT DISTINCT source, h, doc_id FROM exh),
    banned AS (SELECT source, h FROM occ
               GROUP BY 1, 2 HAVING count(*) > $maxDocs),
    kept AS (SELECT e.doc_id, e.chunk_id, e.chunk
             FROM exh e LEFT JOIN banned b
               ON b.source = e.source AND b.h = e.h
             WHERE b.h IS NULL),
    agg AS (SELECT doc_id,
              string_agg(chunk, ' ' ORDER BY chunk_id) as text_clean,
              count(*) as n_kept
            FROM kept GROUP BY 1)
    SELECT c.doc_id, c.source, coalesce(a.text_clean, '') as text_clean,
      cast(len(c.chunks) as bigint) as n_chunks,
      cast(coalesce(a.n_kept, 0) as bigint) as n_chunks_kept
    FROM ch c LEFT JOIN agg a USING (doc_id)"""

  /** Per-doc distinct-bigram novelty (mirrors
    * TextAnalysis.ngramNovelty): grouping by the portable 60-bit
    * bigram hash, first owner = min doc_id, all-integer ppm. */
  def ngramNoveltySql: String = s"""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') as toks
                  FROM documents),
    bg AS (SELECT DISTINCT doc_id,
             ${sha60("toks[i] || ' ' || toks[i+1]")} as h
           FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) as i
                 FROM docs WHERE len(toks) >= 2)),
    fo AS (SELECT h, min(doc_id) as first_doc FROM bg GROUP BY 1)
    SELECT doc_id,
      cast(count(*) as bigint) as n_distinct_bigrams,
      cast(sum(case when first_doc = doc_id then 1 else 0 end) as bigint)
        as n_novel,
      cast(sum(case when first_doc = doc_id then 1 else 0 end) * 1000000
        // count(*) as bigint) as novelty_ppm
    FROM bg JOIN fo USING (h)
    GROUP BY 1"""

  /** Stratified k-fold assignment (mirrors
    * TextAnalysis.stratifiedKFold): fold = salted hash mod k, rank =
    * row_number over (stratum, fold) by doc_id. */
  def stratifiedKFoldSql(strataCol: String, k: Int, salt: String): String = s"""
    SELECT doc_id, $strataCol,
      ${sha60(s"'$salt:' || cast(doc_id as varchar)")} % $k as fold,
      cast(row_number() OVER (
        PARTITION BY $strataCol,
          ${sha60(s"'$salt:' || cast(doc_id as varchar)")} % $k
        ORDER BY doc_id) as bigint) as fold_rank
    FROM documents"""

  /** Shared bigram-LM CTEs: token lists, unigram counts, vocab size,
    * per-doc adjacent pairs, bigram-type counts (mirrors
    * NgramLm.bigrams/uniCounts). */
  private def lmCtes: String = s"""
    docs AS (SELECT doc_id, string_split(text, ' ') as toks FROM documents),
    uni AS (SELECT word, count(*) as c_w
            FROM (SELECT unnest(toks) as word FROM docs) GROUP BY 1),
    v AS (SELECT count(*) as v FROM uni),
    ex AS (SELECT doc_id, unnest(range(len(toks) - 1)) as i, toks
           FROM docs WHERE len(toks) >= 2),
    bg AS (SELECT doc_id, toks[i+1] as word_a, toks[i+2] as word_b FROM ex),
    bi AS (SELECT word_a, word_b, count(*) as c_ab FROM bg GROUP BY 1, 2)"""

  /** Bigram LM model table (mirrors NgramLm.train): add-k smoothed
    * transition probability as integer ppb — hugeint widening matches
    * the Spark side's decimal(38,0). */
  def ngramLmSql(addK: Long, minPairCount: Long): String = s"""
    WITH $lmCtes
    SELECT word_a, word_b, c_ab, u.c_w as c_a,
      cast((cast(c_ab + $addK as hugeint) * 1000000000)
             // (u.c_w + $addK * v.v) as bigint) as p_ppb
    FROM bi JOIN uni u ON u.word = word_a CROSS JOIN v
    WHERE c_ab >= $minPairCount"""

  /** Per-doc LM scoring (mirrors NgramLm.scoreDocs with train = eval):
    * integer sum of transition ppb, one final IEEE division. */
  def lmScoreSql(addK: Long): String = s"""
    WITH $lmCtes,
    scored AS (
      SELECT bg.doc_id,
        cast((cast(bi.c_ab + $addK as hugeint) * 1000000000)
               // (u.c_w + $addK * v.v) as bigint) as p
      FROM bg
        JOIN bi USING (word_a, word_b)
        JOIN uni u ON u.word = bg.word_a
        CROSS JOIN v),
    agg AS (SELECT doc_id, count(*) as n_bigrams, sum(p) as sum_p_ppb
            FROM scored GROUP BY 1)
    SELECT d.doc_id, cast(len(d.toks) as bigint) as n_tokens,
      cast(coalesce(a.n_bigrams, 0) as bigint) as n_bigrams,
      cast(coalesce(a.sum_p_ppb, 0) as bigint) as sum_p_ppb,
      CASE WHEN coalesce(a.n_bigrams, 0) > 0
        THEN cast(a.sum_p_ppb as double) / a.n_bigrams END as lm_score
    FROM docs d LEFT JOIN agg a USING (doc_id)"""

  /** Deterministic MLM masking (mirrors TextAnalysis.mlmMask):
    * per-position salted-hash mask decision, [MASK] rewrite, count. */
  def mlmMaskSql(maskPct: Int, salt: String): String = s"""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') as toks
                  FROM documents),
    f AS (SELECT doc_id, toks,
            list_transform(range(len(toks)), i ->
              ${sha60(s"'$salt:' || cast(doc_id as varchar) || ':' || cast(i as varchar)")}
                % 100 < $maskPct) as flags
          FROM docs)
    SELECT doc_id, cast(len(toks) as bigint) as n_tokens,
      cast(len(list_filter(flags, x -> x)) as bigint) as n_masked,
      array_to_string(list_transform(range(len(toks)), i ->
        CASE WHEN flags[i+1] THEN '[MASK]' ELSE toks[i+1] END), ' ')
        as masked_text
    FROM f"""

  /** Hashed-token classifier CTEs `toks, ex, w(doc_id, score_raw)` —
    * THE weight formula, shared by the classifier oracle and the
    * quality-gate oracle (mirrors the Scala side's shared
    * `clfScoreRaw`, so the SQL twins can't silently diverge either). */
  private def clfCtes(bias: Long): String = s"""
    toks AS (SELECT doc_id, text, string_split(text, ' ') as toks
             FROM documents),
    ex AS (SELECT doc_id, unnest(toks) as t FROM toks),
    w AS (SELECT doc_id,
            cast($bias + sum((${sha60("t")} % 2001) - 1000) as bigint)
              as score_raw
          FROM ex GROUP BY 1)"""

  /** Curriculum ordering (mirrors TextAnalysis.curriculumOrder):
    * classifier-score bands best-first, salted-hash shuffle within a
    * band — the serial row_number the two-phase Spark plan must
    * reproduce exactly. */
  def curriculumOrderSql(salt: String): String = s"""
    WITH ${clfCtes(0L)},
    s AS (SELECT k.doc_id,
            cast(floor(cast(w.score_raw as double)
              / (len(k.toks) * 1000.0) * 10.0) as bigint) as band,
            ${sha60(s"'$salt:' || cast(k.doc_id as varchar)")} as h
          FROM toks k JOIN w USING (doc_id))
    SELECT doc_id, band,
      row_number() OVER (ORDER BY band DESC, h, doc_id) - 1
        as curriculum_rank
    FROM s"""

  /** Soft quality filter (mirrors TextAnalysis.qualityResample):
    * keep probability ∝ clamped classifier score, membership by
    * salted hash — the same IEEE divide/multiply/floor chain. */
  def qualityResampleSql(salt: String): String = s"""
    WITH ${clfCtes(0L)},
    s AS (SELECT k.doc_id,
            least(greatest(cast(floor((0.5 + cast(w.score_raw as double)
              / (len(k.toks) * 1000.0)) * 1000000.0) as bigint), 0),
              1000000) as keep_ppm
          FROM toks k JOIN w USING (doc_id))
    SELECT doc_id, keep_ppm FROM s
    WHERE ${sha60(s"'$salt:' || cast(doc_id as varchar)")} % 1000000
      < keep_ppm"""

  /** Hashed-token linear classifier (mirrors
    * TextAnalysis.qualityClassifier): integer weight sum, one final
    * IEEE division. */
  def qualityClassifierSql(bias: Long): String = s"""
    WITH ${clfCtes(bias)}
    SELECT k.doc_id, cast(len(k.toks) as bigint) as n_tokens, w.score_raw,
      cast(w.score_raw as double) / (len(k.toks) * 1000.0) as clf_score,
      (cast(w.score_raw as double) / (len(k.toks) * 1000.0)) > 0.0 as clf_keep
    FROM toks k JOIN w USING (doc_id)"""

  /** Composite quality gate (mirrors TextAnalysis.qualityGate):
    * the length/punct/stopword/repetition/classifier rule stack with
    * per-rule booleans and the final keep. */
  def qualityGateSql(minTokens: Double, maxPunct: Double,
                     minStopword: Double, maxDupBigram: Double): String = s"""
    WITH ${clfCtes(0L)},
    q AS (SELECT doc_id,
            cast(len(toks) as double) as n_tokens,
            cast(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) as double)
              / cast(length(text) as double) as punct_ratio,
            cast(len(list_filter(toks,
                x -> x in ('the','a','of','and','to','in','is','it')))
                as double)
              / cast(len(toks) as double) as stopword_ratio
          FROM toks),
    g AS (SELECT doc_id,
            CASE WHEN len(toks) >= 2
              THEN list_transform(range(len(toks) - 1),
                     i -> array_to_string(toks[i+1:i+2], ' '))
              ELSE [array_to_string(toks, ' ')] END as bg
          FROM toks),
    r AS (SELECT doc_id,
            (cast(len(bg) as double) - len(list_distinct(bg)))
              / cast(len(bg) as double) as dup_bigram_frac
          FROM g),
    c AS (SELECT k.doc_id,
            cast(w.score_raw as double) / (len(k.toks) * 1000.0)
              as clf_score
          FROM toks k JOIN w USING (doc_id))
    SELECT q.doc_id,
      q.n_tokens >= $minTokens as rule_length,
      q.punct_ratio <= $maxPunct as rule_punct,
      q.stopword_ratio >= $minStopword as rule_stopword,
      r.dup_bigram_frac <= $maxDupBigram as rule_repetition,
      c.clf_score > 0.0 as rule_classifier,
      (q.n_tokens >= $minTokens AND q.punct_ratio <= $maxPunct
        AND q.stopword_ratio >= $minStopword
        AND r.dup_bigram_frac <= $maxDupBigram
        AND c.clf_score > 0.0) as keep
    FROM q JOIN r USING (doc_id) JOIN c USING (doc_id)"""

  /** Temperature (α = 0.5) domain mixture sampling (mirrors
    * TextAnalysis.domainMix): integer weights via floor∘sqrt, one
    * fixed chain of exactly-rounded double ops for the rate. */
  def domainMixSql(budgetPpm: Long, salt: String): String = s"""
    WITH sz AS (SELECT source,
                  cast(sum(len(string_split(text, ' '))) as bigint) as m
                FROM documents GROUP BY 1),
    ws AS (SELECT source, m,
             cast(floor(sqrt(cast(m as double))) as bigint) as w FROM sz),
    tot AS (SELECT cast(sum(m) as bigint) as t,
              cast(sum(w) as bigint) as wsum FROM ws),
    rates AS (SELECT source,
        cast(floor(least(1.0,
               $budgetPpm * 1.0 / 1000000.0 * t * w
                 / (cast(wsum as double) * cast(m as double)))
             * 1000000.0) as bigint) as mix_rate_ppm
      FROM ws, tot)
    SELECT d.doc_id, d.source, r.mix_rate_ppm
    FROM documents d JOIN rates r USING (source)
    WHERE ${sha60(s"'$salt:' || cast(doc_id as varchar)")} % 1000000
            < r.mix_rate_ppm"""

  /** All-pairs MinHash-estimated near-dups (id_a < id_b) — mirrors
    * Dedup.estimatePairsSigned over the whole corpus, and therefore
    * also the ACCUMULATED output of the streaming indexed dedup
    * (Streams.indexedDedupStream), whose per-batch union is
    * batch-split independent by construction. */
  def estPairsSql(shingleK: Int, numPerm: Int, bands: Int,
                  threshold: Double): String = s"""
    WITH ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
    ${sigBandCtes(numPerm, bands)},
    ${cappedCandCte(4096)},
    est AS (
      SELECT id_a, id_b,
        cast(len(list_filter(range($numPerm),
               i -> sa.sig[i+1] = sb.sig[i+1])) as double) / $numPerm
          as est_jaccard
      FROM cand
        JOIN sigl sa ON sa.doc_id = id_a
        JOIN sigl sb ON sb.doc_id = id_b)
    SELECT id_a, id_b, est_jaccard FROM est
    WHERE est_jaccard >= $threshold"""

  /** One-pass LSH parameter sweep (mirrors Dedup.paramSweep): shared
    * signature CTEs, one band/candidate/estimate chain per bands
    * configuration, one summary row each — UNION ALL'd. */
  def paramSweepSql(shingleK: Int, numPerm: Int, bandConfigs: Seq[Int],
                    threshold: Double, maxBucket: Int = 4096): String = {
    val perConfig = bandConfigs.map { b =>
      s"""${bandCte(numPerm, b, s"bands_$b")},
      ${cappedCandCte(maxBucket, s"bands_$b", s"bigb_$b", s"cand_$b")},
      est_$b AS (
        SELECT cast(len(list_filter(range($numPerm),
                 i -> sa.sig[i+1] = sb.sig[i+1])) as bigint) as m
        FROM cand_$b
          JOIN sigl sa ON sa.doc_id = id_a
          JOIN sigl sb ON sb.doc_id = id_b)"""
    }.mkString(",")
    val rows = bandConfigs.map { b =>
      s"""SELECT cast($b as int) as bands,
        cast(${numPerm / b} as int) as rows_per_band,
        (SELECT count(*) FROM est_$b) as n_candidates,
        (SELECT count(*) FROM est_$b
         WHERE cast(m as double) / $numPerm >= $threshold) as n_dup_pairs"""
    }.mkString(" UNION ALL ")
    s"""
    WITH ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
    ${sigCtes(numPerm)},
    $perConfig
    $rows"""
  }

  /** Estimated-Jaccard histogram over capped LSH candidates (mirrors
    * Dedup.thresholdCurve): est_ppm = ⌊m·10⁶/numPerm⌋ is exact (m
    * integer, ·10⁶ exact in double, ÷ power of two exact), so both
    * engines land on identical bins. */
  def thresholdCurveSql(shingleK: Int, numPerm: Int, bands: Int,
                        maxBucket: Int = 4096): String = s"""
    WITH ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
    ${sigBandCtes(numPerm, bands)},
    ${cappedCandCte(maxBucket)},
    est AS (
      SELECT cast(len(list_filter(range($numPerm),
               i -> sa.sig[i+1] = sb.sig[i+1])) as bigint) as m
      FROM cand
        JOIN sigl sa ON sa.doc_id = id_a
        JOIN sigl sb ON sb.doc_id = id_b),
    g AS (
      SELECT cast(floor(m * 1000000.0 / $numPerm) as bigint) as est_ppm,
        count(*) as n_pairs
      FROM est GROUP BY 1)
    SELECT est_ppm, n_pairs,
      cast(sum(n_pairs) OVER (ORDER BY est_ppm DESC) as bigint)
        as n_pairs_at_or_above
    FROM g"""

  /** Incremental index dedup (mirrors Dedup.dedupAgainstIndex over a
    * Dedup.buildLshIndex of the `basePred` subset): delta docs that
    * share an LSH bucket with an indexed base doc, verified by
    * MinHash-ESTIMATED Jaccard (equal-component fraction) — the index
    * stores signatures only, never base text. */
  def incrementalDedupSql(shingleK: Int, numPerm: Int, bands: Int,
                          threshold: Double, basePred: String): String = s"""
    WITH ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
    ${sigBandCtes(numPerm, bands)},
    cand AS (
      SELECT b.doc_id as base_id, d.doc_id as delta_id
      FROM bands b JOIN bands d
        ON b.band_id = d.band_id AND b.band_hash = d.band_hash
      WHERE (b.$basePred) AND NOT (d.$basePred)
      GROUP BY 1, 2),
    est AS (
      SELECT base_id, delta_id,
        cast(len(list_filter(range($numPerm),
               i -> sa.sig[i+1] = sb.sig[i+1])) as double) / $numPerm
          as est_jaccard
      FROM cand
        JOIN sigl sa ON sa.doc_id = base_id
        JOIN sigl sb ON sb.doc_id = delta_id)
    SELECT base_id, delta_id, est_jaccard FROM est
    WHERE est_jaccard >= $threshold"""

  /** Duplicated-k-gram island CTEs `gx, hx, dup, hits, isl` shared by
    * the span report and the span-cut cleaner (mirrors
    * Dedup.duplicateSpans' discovery stages). */
  private def spanCtes(k: Int): String = s"""
    gx AS (SELECT sh.doc_id, generate_subscripts(shingles, 1) - 1 as pos,
             unnest(shingles) as g, len(docs.toks) as doc_len
           FROM sh JOIN docs USING (doc_id)),
    hx AS (SELECT doc_id, pos, doc_len, ${sha60("g")} as h FROM gx),
    dup AS (SELECT h FROM hx GROUP BY h
            HAVING count(distinct doc_id) >= 2),
    hits AS (SELECT doc_id, pos, doc_len FROM hx
             WHERE h IN (SELECT h FROM dup)),
    isl AS (SELECT doc_id, pos, doc_len,
              pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                as grp
            FROM hits)"""

  /** Cross-document duplicate substring spans (mirrors
    * Dedup.duplicateSpans): duplicated k-gram hash types, position
    * hits, gaps-and-islands span merge, span end capped at the doc's
    * last token (whole-doc fallback shingles). */
  def duplicateSpansSql(k: Int): String = s"""
    WITH ${shingleCtes(k)},
    ${spanCtes(k)}
    SELECT doc_id, cast(min(pos) as bigint) as span_start,
      cast(least(max(pos) + ${k - 1}, max(doc_len) - 1) as bigint)
        as span_end,
      cast(least(max(pos) + ${k - 1}, max(doc_len) - 1) - min(pos) + 1
        as bigint) as n_tokens,
      count(*) as n_dup_grams
    FROM isl GROUP BY doc_id, grp"""

  /** Span-cut cleaning (mirrors Dedup.spanClean): drop every token
    * covered by a cross-document duplicate span, reassemble in
    * position order. */
  def spanCleanSql(k: Int): String = s"""
    WITH ${shingleCtes(k)},
    ${spanCtes(k)},
    spans AS (SELECT doc_id, min(pos) as s,
                least(max(pos) + ${k - 1}, max(doc_len) - 1) as e
              FROM isl GROUP BY doc_id, grp),
    cov AS (SELECT doc_id, unnest(generate_series(s, e)) as pos
            FROM spans),
    tk AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 as pos,
             unnest(toks) as tok FROM docs),
    kept AS (SELECT tk.doc_id, tk.pos, tk.tok FROM tk
             WHERE NOT EXISTS (SELECT 1 FROM cov c
               WHERE c.doc_id = tk.doc_id AND c.pos = tk.pos)),
    agg AS (SELECT doc_id,
              string_agg(tok, ' ' ORDER BY pos) as text_clean,
              count(*) as n_kept
            FROM kept GROUP BY 1)
    SELECT d.doc_id, coalesce(a.text_clean, '') as text_clean,
      cast(len(d.toks) as bigint) as n_tokens,
      cast(coalesce(a.n_kept, 0) as bigint) as n_tokens_kept
    FROM docs d LEFT JOIN agg a USING (doc_id)"""

  /** Fuzzy decontamination summary (mirrors Dedup.contaminationFuzzy):
    * train docs LSH-colliding with a `benchPred` benchmark doc at
    * estimated Jaccard ≥ threshold, grouped per train doc. */
  def contaminationFuzzySql(shingleK: Int, numPerm: Int, bands: Int,
                            threshold: Double, benchPred: String): String = s"""
    WITH ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
    ${sigBandCtes(numPerm, bands)},
    cand AS (
      SELECT t.doc_id as train_id, b.doc_id as bench_id
      FROM bands t JOIN bands b
        ON t.band_id = b.band_id AND t.band_hash = b.band_hash
      WHERE (b.$benchPred) AND NOT (t.$benchPred)
      GROUP BY 1, 2),
    est AS (
      SELECT train_id, bench_id,
        cast(len(list_filter(range($numPerm),
               i -> st.sig[i+1] = sb.sig[i+1])) as double) / $numPerm as ej
      FROM cand
        JOIN sigl st ON st.doc_id = train_id
        JOIN sigl sb ON sb.doc_id = bench_id)
    SELECT train_id, cast(count(*) as bigint) as n_bench_hits,
      max(ej) as max_est_jaccard
    FROM est WHERE ej >= $threshold GROUP BY 1"""

  private def sqlLit(s: String): String = s.replace("'", "''")

  /** BPE encode under a frozen merge table (mirrors Bpe.encode /
    * BpeKernel.encodeDoc): each word starts as its character list;
    * each merge rule is one full left-to-right non-overlapping pass,
    * expressed as a `list_reduce` over the '|'-joined piece string —
    * merging is simply appending WITHOUT the '|' delimiter when the
    * accumulated tail piece equals `a` and the incoming piece equals
    * `b`. The merge chain is the nested fold below, in rank order —
    * byte-identical to the Scala kernel's pass loop. */
  private def bpeWordExpr(merges: Seq[(String, String)]): String =
    merges.foldLeft(
      "array_to_string(string_split(w, ''), '|')") { case (inner, (a, b)) =>
      s"""list_reduce(string_split($inner, '|'), (acc, x) ->
         CASE WHEN x = '${sqlLit(b)}'
                AND regexp_extract(acc, '[^|]*$$') = '${sqlLit(a)}'
           THEN acc || x ELSE acc || '|' || x END)"""
    }

  def bpeEncodeSql(merges: Seq[(String, String)]): String = {
    val wordExpr = bpeWordExpr(merges)
    s"""
    WITH enc AS (
      SELECT doc_id,
        array_to_string(list_transform(string_split(text, ' '),
          w -> $wordExpr), ' ') as encoded_text,
        cast(len(string_split(text, ' ')) as bigint) as n_words
      FROM documents)
    SELECT doc_id, encoded_text, n_words,
      cast(len(string_split_regex(encoded_text, '[ |]')) as bigint)
        as n_pieces,
      cast(len(string_split_regex(encoded_text, '[ |]')) as double)
        / cast(n_words as double) as pieces_per_word
    FROM enc"""
  }

  /** One-row LSH recall audit (mirrors SetJoin.lshRecallAudit): the
    * banded-LSH pair set vs the exact all-pairs ground truth at the
    * same shingles and threshold. Integer counts, one final double
    * division. */
  def dedupRecallSql(shingleK: Int, numPerm: Int, bands: Int,
                     tNum: Int, tDen: Int): String = {
    val thr = tNum.toDouble / tDen
    s"""WITH ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
       ${lshPairCtes(numPerm, bands)},
       lshp AS (
         SELECT least(id_a, id_b) as a_id, greatest(id_a, id_b) as b_id
         FROM jac WHERE jaccard >= $thr),
       ex AS (
         SELECT a_id, b_id FROM (
           SELECT a.doc_id as a_id, b.doc_id as b_id,
             cast(len(list_intersect(a.sset, b.sset)) as bigint) as i,
             cast(len(a.sset) + len(b.sset)
               - len(list_intersect(a.sset, b.sset)) as bigint) as u
           FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
         WHERE i * $tDen >= u * $tNum),
       c AS (SELECT
         (SELECT count(*) FROM ex) as n_exact,
         (SELECT count(*) FROM lshp) as n_lsh,
         (SELECT count(*) FROM ex JOIN lshp USING (a_id, b_id))
           as n_common)
       SELECT n_exact, n_lsh, n_common,
         CASE WHEN n_exact = 0 THEN NULL
              ELSE cast(n_common as double) / cast(n_exact as double)
         END as recall
       FROM c"""
  }

  /** Per-band-config recall audit (mirrors SetJoin.sweepRecall):
    * shared signature + exact-pair CTEs, one verified-LSH chain per
    * configuration, one summary row each. */
  def sweepRecallSql(shingleK: Int, numPerm: Int, bandConfigs: Seq[Int],
                     tNum: Int, tDen: Int,
                     maxBucket: Int = 4096): String = {
    val thr = tNum.toDouble / tDen
    val perConfig = bandConfigs.map { b =>
      s"""${bandCte(numPerm, b, s"bands_$b")},
      ${cappedCandCte(maxBucket, s"bands_$b", s"bigb_$b", s"cand_$b")},
      lshp_$b AS (
        SELECT least(id_a, id_b) as a_id, greatest(id_a, id_b) as b_id
        FROM (
          SELECT id_a, id_b,
            cast(len(list_filter(sa.sset, x -> list_contains(sb.sset, x)))
              as double)
            / (len(sa.sset) + len(sb.sset)
               - len(list_filter(sa.sset, x -> list_contains(sb.sset, x))))
              as jaccard
          FROM cand_$b
            JOIN sets sa ON sa.doc_id = id_a
            JOIN sets sb ON sb.doc_id = id_b)
        WHERE jaccard >= $thr)"""
    }.mkString(",")
    val rows = bandConfigs.map { b =>
      s"""SELECT cast($b as int) as bands,
        cast(${numPerm / b} as int) as rows_per_band,
        (SELECT count(*) FROM ex) as n_exact,
        (SELECT count(*) FROM lshp_$b) as n_lsh,
        (SELECT count(*) FROM ex JOIN lshp_$b USING (a_id, b_id))
          as n_common,
        CASE WHEN (SELECT count(*) FROM ex) = 0 THEN NULL
             ELSE cast((SELECT count(*) FROM ex JOIN lshp_$b
                        USING (a_id, b_id)) as double)
                  / cast((SELECT count(*) FROM ex) as double)
        END as recall"""
    }.mkString(" UNION ALL ")
    s"""
    WITH ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
    ${sigCtes(numPerm)},
    sets AS (SELECT doc_id, list_distinct(shingles) as sset FROM sh),
    ex AS (
      SELECT a_id, b_id FROM (
        SELECT a.doc_id as a_id, b.doc_id as b_id,
          cast(len(list_intersect(a.sset, b.sset)) as bigint) as i,
          cast(len(a.sset) + len(b.sset)
            - len(list_intersect(a.sset, b.sset)) as bigint) as u
        FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
      WHERE i * $tDen >= u * $tNum),
    $perConfig
    $rows"""
  }

  /** Exact set-similarity self-join (mirrors SetJoin
    * .similarityJoinExact): the naive all-pairs formulation — the
    * Spark side's prefix filter is a complete blocking, so its
    * verified output equals this quadratic reference exactly. Integer
    * intersection/union sizes, one final double division. */
  def exactJaccardJoinSql(shingleK: Int, tNum: Int, tDen: Int): String =
    s"""WITH ${shingleCtes(shingleK)},
       sets AS (SELECT doc_id, list_distinct(shingles) as sset FROM sh),
       pairs AS (
         SELECT a.doc_id as a_id, b.doc_id as b_id,
           cast(len(list_intersect(a.sset, b.sset)) as bigint) as n_inter,
           cast(len(a.sset) + len(b.sset)
             - len(list_intersect(a.sset, b.sset)) as bigint) as n_union
         FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
       SELECT a_id, b_id, n_inter, n_union,
         cast(n_inter as double) / cast(n_union as double) as jaccard
       FROM pairs WHERE n_inter * $tDen >= n_union * $tNum"""

  /** Per-language tokenizer fertility (mirrors Bpe.fertility): integer
    * word/piece sums per language, one final division. */
  def bpeFertilitySql(merges: Seq[(String, String)]): String = {
    val wordExpr = bpeWordExpr(merges)
    s"""
    WITH enc AS (
      SELECT lang,
        cast(len(string_split(text, ' ')) as bigint) as n_words,
        cast(len(string_split_regex(
          array_to_string(list_transform(string_split(text, ' '),
            w -> $wordExpr), ' '), '[ |]')) as bigint) as n_pieces
      FROM documents)
    SELECT lang, count(*) as n_docs,
      cast(sum(n_words) as bigint) as n_words,
      cast(sum(n_pieces) as bigint) as n_pieces,
      cast(sum(n_pieces) as double) / cast(sum(n_words) as double)
        as fertility
    FROM enc GROUP BY 1"""
  }

  /** Distributed BPE merge induction replay (mirrors
    * Bpe.trainDistributed): the full sampled word-count dictionary
    * (no cap — the distributed trainer has no driver dictionary to
    * bound), then `numMerges` unrolled rounds of adjacent-pair count
    * (≥ 2 only) → top-1 by (count desc, a, b) → the same
    * list_reduce merge fold as [[bpeWordExpr]], the winning pair
    * correlated in from the 1-row b_i CTE. CTEs are MATERIALIZED:
    * each w_i is referenced twice (pair count + next merge) and
    * DuckDB's default inlining re-evaluates the whole chain per
    * reference — exponential in rounds (measured: 12 rounds DNF
    * inlined, 0.2 s materialized). */
  def bpeTrainSql(numMerges: Int, sampleMod: Int): String = {
    val rounds = (1 to numMerges).map { r =>
      s"""p$r AS MATERIALIZED (
      SELECT l[i] as a, l[i+1] as b, cast(sum(c) as bigint) as cnt
      FROM (SELECT string_split(pw, '|') as l, c,
              unnest(generate_series(1, len(string_split(pw, '|')) - 1))
                as i
            FROM w${r - 1})
      GROUP BY 1, 2 HAVING cast(sum(c) as bigint) >= 2),
    b$r AS MATERIALIZED (
      SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
    w$r AS MATERIALIZED (
      SELECT list_reduce(string_split(pw, '|'), (acc, x) ->
        CASE WHEN x = b$r.b AND regexp_extract(acc, '[^|]*$$') = b$r.a
          THEN acc || x ELSE acc || '|' || x END) as pw, c
      FROM w${r - 1}, b$r)"""
    }.mkString(",\n    ")
    val legs = (1 to numMerges).map(r =>
      s"SELECT cast($r as bigint) as rank, a as piece_a, b as piece_b, " +
        s"cnt as pair_count FROM b$r")
      .mkString("\n    UNION ALL\n    ")
    s"""
    WITH dict AS MATERIALIZED (
      SELECT w, cast(count(*) as bigint) as c
      FROM (SELECT unnest(string_split(text, ' ')) as w
            FROM documents WHERE doc_id % $sampleMod = 0)
      WHERE w NOT LIKE '%|%'
      GROUP BY 1),
    w0 AS MATERIALIZED (
      SELECT array_to_string(string_split(w, ''), '|') as pw, c
      FROM dict),
    $rounds
    $legs"""
  }

  /** Lexical-vs-semantic dedup agreement (mirrors the
    * dedup_method_agreement registry row): the banded MinHash-LSH
    * pair set over documents against the label-blocked cosine pair
    * set over the aligned embeddings, FULL-OUTER joined on the
    * unordered id pair, one exact-count row + integer-ppm
    * agreement. Both pair pipelines are the already-oracled ones
    * (dedup_minhash_lsh / dedup_embedding). */
  def dedupMethodAgreementSql(shingleK: Int, numPerm: Int, bands: Int,
                              lexThreshold: Double,
                              semThreshold: Double): String = s"""
    WITH ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
    ${lshPairCtes(numPerm, bands)},
    lex AS (SELECT DISTINCT least(id_a, id_b) as id_a,
              greatest(id_a, id_b) as id_b
            FROM jac WHERE jaccard >= $lexThreshold),
    emb AS (SELECT vec_id, label, cast(embedding as double[]) as emb
            FROM embeddings),
    sem AS (SELECT a.vec_id as id_a, b.vec_id as id_b
            FROM emb a JOIN emb b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.emb, b.emb) /
                (sqrt(list_dot_product(a.emb, a.emb)) *
                 sqrt(list_dot_product(b.emb, b.emb)))
                >= $semThreshold),
    f AS (SELECT coalesce(l.id_a, s.id_a) as id_a,
            (l.id_a IS NOT NULL) as is_lex,
            (s.id_a IS NOT NULL) as is_sem
          FROM lex l FULL OUTER JOIN sem s
            ON l.id_a = s.id_a AND l.id_b = s.id_b),
    c AS (SELECT
            cast(sum(CASE WHEN is_lex THEN 1 ELSE 0 END) as bigint)
              as n_lexical,
            cast(sum(CASE WHEN is_sem THEN 1 ELSE 0 END) as bigint)
              as n_semantic,
            cast(sum(CASE WHEN is_lex AND is_sem THEN 1 ELSE 0 END)
              as bigint) as n_both,
            cast(count(*) as bigint) as n_union
          FROM f)
    SELECT n_lexical, n_semantic, n_both, n_union,
      CASE WHEN n_union > 0
        THEN cast(n_both * 1000000 // n_union as bigint) END
        as agreement_ppm
    FROM c"""

  /** Train/test leakage audit (mirrors Dedup.splitLeakageAudit):
    * banded-LSH near-dup pairs × the hash train/val/test split,
    * counted per unordered split pair. */
  def splitLeakageSql(shingleK: Int, numPerm: Int, bands: Int,
                      threshold: Double, trainPct: Int,
                      valPct: Int): String = s"""
    WITH ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
    ${lshPairCtes(numPerm, bands)},
    pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= $threshold),
    sp AS (SELECT doc_id,
        CASE WHEN b < $trainPct THEN 'train'
             WHEN b < ${trainPct + valPct} THEN 'val'
             ELSE 'test' END as split
      FROM (SELECT doc_id,
              ${sha60("cast(doc_id as varchar)")} % 100 as b
            FROM documents)),
    j AS (SELECT least(sa.split, sb.split) as split_lo,
            greatest(sa.split, sb.split) as split_hi
          FROM pairs
            JOIN sp sa ON sa.doc_id = pairs.id_a
            JOIN sp sb ON sb.doc_id = pairs.id_b)
    SELECT split_lo, split_hi, cast(count(*) as bigint) as n_pairs,
      split_lo != split_hi as is_leak
    FROM j GROUP BY 1, 2"""

  /** Leakage repair (mirrors Dedup.splitLeakageFix): drop the
    * lower-precedence member of every cross-split near-dup pair
    * (train > val > test), emit every doc with its kept flag. */
  def splitLeakageFixSql(shingleK: Int, numPerm: Int, bands: Int,
                         threshold: Double, trainPct: Int,
                         valPct: Int): String = s"""
    WITH ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
    ${lshPairCtes(numPerm, bands)},
    pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= $threshold),
    sp AS (SELECT doc_id,
        CASE WHEN b < $trainPct THEN 'train'
             WHEN b < ${trainPct + valPct} THEN 'val'
             ELSE 'test' END as split
      FROM (SELECT doc_id,
              ${sha60("cast(doc_id as varchar)")} % 100 as b
            FROM documents)),
    pr AS (SELECT doc_id, split,
        CASE split WHEN 'train' THEN 2 WHEN 'val' THEN 1
          ELSE 0 END as prec
      FROM sp),
    dropped AS (
      SELECT DISTINCT CASE WHEN pa.prec < pb.prec THEN pairs.id_a
        WHEN pb.prec < pa.prec THEN pairs.id_b END as doc_id
      FROM pairs
        JOIN pr pa ON pa.doc_id = pairs.id_a
        JOIN pr pb ON pb.doc_id = pairs.id_b
      WHERE pa.prec != pb.prec)
    SELECT sp.doc_id, sp.split, d.doc_id IS NULL as kept
    FROM sp LEFT JOIN dropped d ON d.doc_id = sp.doc_id"""

  /** DSIR importance resampling (mirrors Importance.dsirResample):
    * hashed-bigram bin counts, add-one-smoothed target/corpus ratio
    * in integer ppm, count-weighted mean score per doc, salted-hash
    * Bernoulli keep against the share-normalized probability. */
  def dsirResampleSql(targetCol: String, targetVal: String,
                      buckets: Int, salt: String): String = s"""
    WITH docs AS (SELECT doc_id, ($targetCol = '$targetVal') as is_target,
                    string_split(text, ' ') as toks FROM documents),
    occ AS (SELECT doc_id, is_target,
              ${sha60("toks[i] || ' ' || toks[i+1]")} % $buckets as bucket
            FROM (SELECT doc_id, is_target, toks,
                    unnest(range(1, len(toks))) as i
                  FROM docs WHERE len(toks) >= 2)),
    db AS (SELECT doc_id, is_target, bucket,
             cast(count(*) as bigint) as cnt
           FROM occ GROUP BY 1, 2, 3),
    bs AS (SELECT bucket, cast(sum(cnt) as bigint) as n_corpus,
             cast(sum(case when is_target then cnt else 0 end) as bigint)
               as n_target
           FROM db GROUP BY 1),
    bsr AS (SELECT bucket,
              (n_target + 1) * 1000000 // (n_corpus + 1) as ratio_ppm
            FROM bs),
    sh AS (SELECT greatest(cast(sum(n_target) as bigint) * 1000000
             // cast(sum(n_corpus) as bigint), 1) as share_ppm FROM bs),
    sc AS (SELECT doc_id, cast(sum(cnt) as bigint) as n_feats,
             cast(sum(cnt * ratio_ppm) as bigint)
               // cast(sum(cnt) as bigint) as score_ppm
           FROM db JOIN bsr USING (bucket) GROUP BY 1),
    base AS (
      SELECT d.doc_id, d.$targetCol,
        coalesce(sc.n_feats, 0) as n_feats,
        coalesce(sc.score_ppm, 0) as score_ppm,
        least(coalesce(sc.score_ppm * 1000000 // sh.share_ppm, 0), 1000000)
          as keep_prob_ppm
      FROM documents d LEFT JOIN sc USING (doc_id), sh)
    SELECT *,
      ${sha60(s"'$salt:' || cast(doc_id as varchar)")} % 1000000
        < keep_prob_ppm as kept
    FROM base"""

  /** Vocabulary coverage audit (mirrors TextAnalysis.vocabCoverage):
    * vocab = global top-`k` words (count desc, word asc), then
    * per-language in/out-of-vocab token mass in exact integers. */
  def vocabCoverageSql(k: Int): String = s"""
    WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) as w
                  FROM documents),
    wc AS (SELECT w, cast(count(*) as bigint) as cnt FROM toks GROUP BY 1),
    vocab AS (SELECT w FROM wc
              QUALIFY row_number() OVER (ORDER BY cnt DESC, w) <= $k)
    SELECT lang,
      cast(count(*) as bigint) as n_tokens,
      cast(sum(case when v.w IS NOT NULL then 1 else 0 end) as bigint)
        as n_in_vocab,
      cast((count(*) - sum(case when v.w IS NOT NULL then 1 else 0 end))
        * 1000000 // count(*) as bigint) as oov_ppm
    FROM toks t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY 1"""

  /** Shared waterfilling CTE chain (mirrors Mixture.tokenBudgetFit):
    * per-source masses → floor∘sqrt weights → caps → prefix sums in
    * cap/weight order → first waterline candidate under its own
    * ratio → per-source allocation. All sums exact bigint; the
    * waterline and allocation replicate Spark's double-op chain
    * (one subtract + one divide; one multiply + one floor). */
  /** The budget-INDEPENDENT prefix of the waterfilling chain:
    * per-source masses → weights/caps → cap/weight order → prefix
    * sums → weight total. Shared by the single-budget fit and the
    * budget-ladder curve. */
  private def massCtes(maxEpochsPct: Long): String = s"""
    sz AS (SELECT source,
             cast(sum(len(string_split(text, ' '))) as bigint) as m
           FROM documents GROUP BY 1
           HAVING sum(len(string_split(text, ' '))) > 0),
    base AS (SELECT source, m,
               cast(floor(sqrt(cast(m as double))) as bigint) as w,
               (m * $maxEpochsPct) // 100 as cap FROM sz),
    ordd AS (SELECT *, cast(cap as double) / cast(w as double) as r
             FROM base),
    pre AS (SELECT *,
              cast(coalesce(sum(cap) OVER wl, 0) as bigint) as cum_cap,
              cast(coalesce(sum(w) OVER wl, 0) as bigint) as cum_w
            FROM ordd
            WINDOW wl AS (ORDER BY r, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    tot AS (SELECT cast(sum(w) as bigint) as w_total FROM base)"""

  private def fitCtes(budgetTokens: Long, maxEpochsPct: Long): String = s"""
    ${massCtes(maxEpochsPct)},
    cand AS (SELECT cast($budgetTokens - cum_cap as double)
                      / cast(w_total - cum_w as double) as lambda,
                    r, source
             FROM pre, tot
             WHERE cast($budgetTokens - cum_cap as double)
                     / cast(w_total - cum_w as double) < r
             ORDER BY r, source LIMIT 1),
    lam AS (SELECT min(lambda) as lambda FROM cand),
    fit AS (SELECT b.source, b.m as m_tokens, b.w as weight,
              b.cap as cap_tokens,
              cast(CASE WHEN l.lambda IS NULL THEN b.cap
                   ELSE least(b.cap,
                     cast(floor(cast(b.w as double) * l.lambda) as bigint))
                   END as bigint) as alloc_tokens
            FROM ordd b, lam l)"""

  /** Mirrors Mixture.tokenBudgetFit. */
  def tokenBudgetFitSql(budgetTokens: Long, maxEpochsPct: Long): String = s"""
    WITH ${fitCtes(budgetTokens, maxEpochsPct)}
    SELECT source, m_tokens, weight, cap_tokens, alloc_tokens,
      cast(floor(1000000.0 * cast(alloc_tokens as double)
             / cast(m_tokens as double)) as bigint) as epochs_ppm
    FROM fit"""

  /** Mirrors Mixture.budgetSample — deliberately the DIRECT
    * per-source window cumsum in salted-hash order (the semantics),
    * which the engine's bucket-refined two-phase plan must reproduce
    * row-for-row. */
  def budgetSampleSql(budgetTokens: Long, salt: String): String = s"""
    WITH ${fitCtes(budgetTokens, maxEpochsPct = 100L)},
    tok AS (SELECT doc_id, source,
              cast(len(string_split(text, ' ')) as bigint) as n_tokens,
              ${sha60(s"'$salt:' || cast(doc_id as varchar)")} as h
            FROM documents),
    c AS (SELECT t.*,
            cast(coalesce(sum(n_tokens) OVER (PARTITION BY source
              ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              as bigint) as cum_before
          FROM tok t)
    SELECT c.doc_id, c.source, c.n_tokens
    FROM c JOIN fit USING (source)
    WHERE c.cum_before < fit.alloc_tokens"""

  /** Shared expansion CTE chain (mirrors Mixture.epochExpand):
    * `alloc div m` full copies of every document (epoch 0…full−1) +
    * the `alloc mod m` fractional epoch as the direct per-source
    * hash-order cumsum prefix at epoch = full. */
  private def expandCtes(budgetTokens: Long, maxEpochsPct: Long,
                         salt: String): String = s"""
    ${fitCtes(budgetTokens, maxEpochsPct)},
    ep AS (SELECT source, alloc_tokens // m_tokens as full_epochs,
             alloc_tokens % m_tokens as rem_tokens FROM fit),
    tok AS (SELECT doc_id, source,
              cast(len(string_split(text, ' ')) as bigint) as n_tokens,
              ${sha60(s"'$salt:' || cast(doc_id as varchar)")} as h
            FROM documents),
    c AS (SELECT t.*,
            cast(coalesce(sum(n_tokens) OVER (PARTITION BY source
              ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              as bigint) as cum_before
          FROM tok t),
    fullc AS (SELECT t.doc_id, t.source, t.n_tokens,
                unnest(range(e.full_epochs)) as epoch
              FROM tok t JOIN ep e USING (source)
              WHERE e.full_epochs > 0),
    fracc AS (SELECT c.doc_id, c.source, c.n_tokens,
                e.full_epochs as epoch
              FROM c JOIN ep e USING (source)
              WHERE c.cum_before < e.rem_tokens)"""

  /** Mirrors Mixture.epochExpand. */
  def epochExpandSql(budgetTokens: Long, maxEpochsPct: Long,
                     salt: String): String = s"""
    WITH ${expandCtes(budgetTokens, maxEpochsPct, salt)}
    SELECT * FROM fullc UNION ALL SELECT * FROM fracc"""

  /** Mirrors Mixture.mixtureManifest — the oracle is the SERIAL
    * global cumsum in (pack-hash, doc_id, epoch) order; the engine's
    * two-phase bucketed prefix sum must reproduce every offset. */
  def mixtureManifestSql(budgetTokens: Long, maxEpochsPct: Long,
                         salt: String, seqTokens: Long,
                         packSalt: String): String = s"""
    WITH ${expandCtes(budgetTokens, maxEpochsPct, salt)},
    expd2 AS (SELECT * FROM fullc UNION ALL SELECT * FROM fracc),
    man AS (SELECT doc_id, source, epoch, n_tokens,
              ${sha60(s"'$packSalt:' || cast(doc_id as varchar) || " +
                "':' || cast(epoch as varchar)")} as ph
            FROM expd2),
    pos AS (SELECT doc_id, source, epoch, n_tokens,
              cast(coalesce(sum(n_tokens) OVER (ORDER BY ph, doc_id, epoch
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                as bigint) as token_start
            FROM man)
    SELECT doc_id, source, epoch, n_tokens, token_start,
      token_start // $seqTokens as seq_id
    FROM pos"""

  /** Mirrors Mixture.mixtureCurve: the budget-independent prefix
    * once, then per-budget first-valid-candidate selection (filter
    * before rank — identical to the single-budget ORDER BY … LIMIT 1
    * semantics) and the same allocation double chain. */
  def mixtureCurveSql(budgets: Seq[Long], maxEpochsPct: Long): String = {
    val vals = budgets.distinct.sorted
      .map(b => s"(cast($b as bigint))").mkString(", ")
    s"""
    WITH ${massCtes(maxEpochsPct)},
    bud AS (SELECT * FROM (VALUES $vals) v(budget_tokens)),
    expd AS (SELECT p.*, t.w_total, b.budget_tokens
             FROM pre p, tot t, bud b),
    lamc AS (SELECT budget_tokens, lambda, r, source,
               row_number() OVER (PARTITION BY budget_tokens
                 ORDER BY r, source) as rn
             FROM (SELECT budget_tokens, r, source,
                     cast(budget_tokens - cum_cap as double)
                       / cast(w_total - cum_w as double) as lambda
                   FROM expd) q
             WHERE lambda < r),
    lam2 AS (SELECT budget_tokens, lambda FROM lamc WHERE rn = 1),
    curve AS (SELECT e.budget_tokens, e.source, e.m, e.cap,
                cast(CASE WHEN l.lambda IS NULL THEN e.cap
                     ELSE least(e.cap,
                       cast(floor(cast(e.w as double) * l.lambda)
                         as bigint))
                     END as bigint) as alloc_tokens
              FROM expd e LEFT JOIN lam2 l USING (budget_tokens))
    SELECT budget_tokens, source, alloc_tokens,
      cast(floor(1000000.0 * cast(alloc_tokens as double)
             / cast(m as double)) as bigint) as epochs_ppm,
      alloc_tokens = cap as saturated
    FROM curve"""
  }

  /** Mirrors the read-back of ONE Mixture.writeManifestShards shard:
    * the manifest rows whose seq_id lands in the given shard (layout
    * must prune but never change content). */
  def manifestShardSql(budgetTokens: Long, maxEpochsPct: Long,
                       salt: String, seqTokens: Long, packSalt: String,
                       seqsPerShard: Long, shard: Long): String = s"""
    SELECT *, cast($shard as bigint) as shard FROM (
      ${mixtureManifestSql(budgetTokens, maxEpochsPct, salt, seqTokens,
        packSalt)}
    ) m WHERE m.seq_id // $seqsPerShard = $shard"""

  /** Mirrors Experiment.bootstrapCi: deterministic Poisson-bootstrap
    * bracket for the per-source mean token count. */
  def bootstrapCiSql(b: Int, trim: Int, salt: String): String = {
    val (t0, t1, t2) = operators.Experiment.BootThresholds
    s"""
    WITH base AS (SELECT source,
             cast(len(string_split(text, ' ')) as bigint) as x, doc_id
           FROM documents),
    rs AS (SELECT rr.r, base.source, base.x, base.doc_id
           FROM base, (SELECT unnest(range(0, $b)) as r) rr),
    wu AS (SELECT source, r, x,
             ${sha60(s"'$salt:' || cast(r as varchar) || ':' || " +
      "cast(doc_id as varchar)")} % 1000000 as u
           FROM rs),
    ww AS (SELECT source, r, x,
             CASE WHEN u < $t0 THEN 0 WHEN u < $t1 THEN 1
                  WHEN u < $t2 THEN 2 ELSE 3 END as wt
           FROM wu),
    pr AS (SELECT source, r, cast(sum(wt * x) as bigint) as ws,
             cast(sum(wt) as bigint) as wn
           FROM ww GROUP BY 1, 2),
    pm AS (SELECT source, r,
             CASE WHEN wn = 0 THEN 0.0
                  ELSE cast(ws as double) / cast(wn as double) END
               as rmean
           FROM pr),
    rk AS (SELECT source, rmean,
             row_number() OVER (PARTITION BY source
               ORDER BY rmean, r) as ra,
             row_number() OVER (PARTITION BY source
               ORDER BY rmean DESC, r) as rd
           FROM pm),
    br AS (SELECT source,
             min(CASE WHEN ra = ${trim + 1} THEN rmean END) as ci_lo,
             min(CASE WHEN rd = ${trim + 1} THEN rmean END) as ci_hi
           FROM rk GROUP BY 1),
    tot AS (SELECT source, cast(count(*) as bigint) as n,
              cast(sum(x) as bigint) as sx
            FROM base GROUP BY 1)
    SELECT t.source, t.n,
      cast(t.sx as double) / cast(t.n as double) as mean,
      cast($b as bigint) as b, br.ci_lo, br.ci_hi
    FROM tot t JOIN br USING (source)"""
  }

  /** Mirrors the sketch leg alone (Overlap.kmvEstimateFromShards over
    * merged stream shards): per-pair KMV estimate with the signature
    * sizes — the streaming overlap monitor's oracle (k-min merge is
    * exact, so the batch derivation is the answer on any split). */
  def kmvOverlapSql(k: Int): String = s"""
    WITH hh AS (SELECT DISTINCT source, ${sha60("text")} as h
                FROM documents),
    sig AS (SELECT source, h FROM (
              SELECT source, h,
                row_number() OVER (PARTITION BY source ORDER BY h) as rn
              FROM hh) q WHERE rn <= $k),
    srcs AS (SELECT DISTINCT source FROM sig),
    prs AS (SELECT a.source as source_a, b.source as source_b
            FROM srcs a JOIN srcs b ON a.source < b.source),
    tg AS (SELECT p.source_a, p.source_b, s.h,
             max(CASE WHEN s.source = p.source_a THEN 1 ELSE 0 END)
               as in_a,
             max(CASE WHEN s.source = p.source_b THEN 1 ELSE 0 END)
               as in_b
           FROM sig s JOIN prs p
             ON s.source = p.source_a OR s.source = p.source_b
           GROUP BY 1, 2, 3)
    SELECT source_a, source_b,
      cast(count(*) as bigint) as m,
      cast(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
        as bigint) as m_both,
      cast(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
        as bigint) * 1000000
        // cast(count(*) as bigint) as kmv_est_ppm
    FROM (SELECT *, row_number() OVER (
            PARTITION BY source_a, source_b ORDER BY h) as rn
          FROM tg) q
    WHERE rn <= $k GROUP BY 1, 2"""

  /** Mirrors Overlap.sourceOverlap: exact pairwise content Jaccard +
    * the KMV coincidence estimate off k-min sha60 signatures. */
  def sourceOverlapSql(k: Int): String = s"""
    WITH hh AS (SELECT DISTINCT source, ${sha60("text")} as h
                FROM documents),
    sz AS (SELECT source, cast(count(*) as bigint) as n
           FROM hh GROUP BY 1),
    prs AS (SELECT a.source as source_a, a.n as n_a,
              b.source as source_b, b.n as n_b
            FROM sz a JOIN sz b ON a.source < b.source),
    itr AS (SELECT x.source as source_a, y.source as source_b,
              cast(count(*) as bigint) as n_inter
            FROM hh x JOIN hh y
              ON x.h = y.h AND x.source < y.source
            GROUP BY 1, 2),
    ex AS (SELECT p.source_a, p.source_b, p.n_a, p.n_b,
             cast(coalesce(i.n_inter, 0) as bigint) as n_inter
           FROM prs p LEFT JOIN itr i
             ON p.source_a = i.source_a AND p.source_b = i.source_b),
    sig AS (SELECT source, h FROM (
              SELECT source, h,
                row_number() OVER (PARTITION BY source ORDER BY h) as rn
              FROM hh) q WHERE rn <= $k),
    tg AS (SELECT p.source_a, p.source_b, s.h,
             max(CASE WHEN s.source = p.source_a THEN 1 ELSE 0 END)
               as in_a,
             max(CASE WHEN s.source = p.source_b THEN 1 ELSE 0 END)
               as in_b
           FROM sig s JOIN prs p
             ON s.source = p.source_a OR s.source = p.source_b
           GROUP BY 1, 2, 3),
    km AS (SELECT source_a, source_b,
             cast(count(*) as bigint) as m,
             cast(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
               as bigint) as m_both
           FROM (SELECT *, row_number() OVER (
                   PARTITION BY source_a, source_b ORDER BY h) as rn
                 FROM tg) q
           WHERE rn <= $k GROUP BY 1, 2)
    SELECT e.source_a, e.source_b, e.n_a, e.n_b, e.n_inter,
      e.n_inter * 1000000 // (e.n_a + e.n_b - e.n_inter)
        as jaccard_ppm,
      w.m_both * 1000000 // w.m as kmv_est_ppm,
      abs(w.m_both * 1000000 // w.m
        - e.n_inter * 1000000 // (e.n_a + e.n_b - e.n_inter))
        as kmv_err_ppm
    FROM ex e JOIN km w USING (source_a, source_b)"""

  /** Degree histogram of the near-dup pair graph (mirrors
    * Dedup.nearDupDegrees): pair endpoints counted per doc, degree-0
    * mass included via the documents left join. */
  def nearDupDegreesSql(shingleK: Int, numPerm: Int, bands: Int,
                        threshold: Double): String =
    s"""WITH ${permsCte(numPerm)}, ${shingleCtes(shingleK)},
       ${lshPairCtes(numPerm, bands)},
       prs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= $threshold),
       ends AS (SELECT id_a as doc_id FROM prs
                UNION ALL SELECT id_b as doc_id FROM prs),
       deg AS (SELECT d.doc_id, coalesce(e.c, 0) as degree
               FROM documents d LEFT JOIN
                 (SELECT doc_id, count(*) as c FROM ends GROUP BY 1) e
                 USING (doc_id))
       SELECT degree, count(*) as n_docs FROM deg GROUP BY 1"""
}
