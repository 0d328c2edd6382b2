package graft

/** Inline DuckDB oracle SQL for registry queries whose oracle is a
  * plain (non-parameterized) literal too long to sit readably inside
  * the declaration-only registry (Queries.scala). Generated oracles
  * with parameters stay in TextOracleSql / AnnOracleSql; short
  * literals stay inline. Each value is the exact string previously
  * inline — the Verify dump applies the same trimming either way. */
object InlineOracles {

  /** events-per-session point-in-interval oracle, shared by
    * range_join (explicit bucketed operator) and range_join_auto (the
    * optimizer rewrite of the plain BETWEEN join) — one oracle, two
    * physical plans. */
  private[graft] val rangeJoinOracleSql: String = s"""
        WITH e AS (SELECT user_id, epoch_us(ts) as ts, event_id FROM events),
        marked AS (
          SELECT user_id, ts, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > 1800000000 THEN 1
                 ELSE 0 END as new_session
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess_rows AS (
          SELECT user_id, ts,
            sum(new_session) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) as session_seq
          FROM marked),
        sessions AS (
          SELECT user_id, session_seq, min(ts) as session_start,
            max(ts) as session_end
          FROM sess_rows GROUP BY 1, 2)
        SELECT s.user_id, cast(s.session_seq as bigint) as session_seq,
          count(*) as events_in_session
        FROM e p JOIN sessions s
          ON p.user_id = s.user_id
         AND p.ts >= s.session_start AND p.ts <= s.session_end
        GROUP BY 1, 2"""

  /** Session-interval CTE chain over a filtered event subset: emits
    * `${p}sessions(user_id, ${p}seq, ${p}start, ${p}end)` — the
    * DuckDB replica of `Streams.sessionizeBatch` on
    * `events WHERE pred` (shared by the interval_join oracle). */
  private[graft] def sessionCte(p: String, pred: String,
                         gapUs: Long = 1800000000L): String = s"""
        ${p}e AS (SELECT user_id, epoch_us(ts) as ts, event_id
                  FROM events WHERE $pred),
        ${p}marked AS (
          SELECT user_id, ts, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > $gapUs THEN 1
                 ELSE 0 END as new_session
          FROM ${p}e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        ${p}rows AS (
          SELECT user_id, ts,
            sum(new_session) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
              as session_seq
          FROM ${p}marked),
        ${p}sessions AS (
          SELECT user_id, cast(session_seq as bigint) as ${p}seq,
            min(ts) as ${p}start, max(ts) as ${p}end
          FROM ${p}rows GROUP BY 1, 2)"""

  /** decimal-exact revenue term, shared by several oracles. */
  private[graft] val revSql =
    "cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(4,2)) - cast(l_discount as decimal(4,2)))"

  /** DuckDB view of events with ts as epoch-nanos (matches Spark). */
  private[graft] val eventsNs =
    "select event_id, epoch_us(ts) as ts, user_id, event_type, value, props from events"

  /** per-language marker-hit score projections (shared by lang_id and
    * the composed curation pipeline). */
  private[graft] val langScoresSql: String =
    operators.TextAnalysis.LangMarkers.map { case (l, ms) =>
      val set = ms.map(m => s"'$m'").mkString(", ")
      s"cast(len(list_filter(string_split(text, ' '), t -> t in ($set))) as int) as score_$l"
    }.mkString(",\n          ")

  /** argmax cascade: ties go to the lexicographically LAST language
    * (matches Spark's greatest over struct(score, lang)). */
  private[graft] val langCascadeSql: String = {
    val langsPref = operators.TextAnalysis.LangMarkers.map(_._1).sorted.reverse
    langsPref.map { l =>
      val conds = operators.TextAnalysis.LangMarkers.map(_._1)
        .filterNot(_ == l).map(o => s"score_$l >= score_$o")
        .mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n            ")
  }

  val silver_dim_customer: String = """
        SELECT concat_ws('-', n_name, cast(c_custkey as varchar)) as unique_id,
          c_custkey, c_name, c_mktsegment, n_name as nation_name,
          CASE WHEN r_name IN ('ASIA', 'AFRICA') THEN 'APJ-EMEA-SOUTH'
               WHEN r_name IN ('EUROPE', 'MIDDLE EAST') THEN 'EMEA'
               ELSE 'AMER' END as region_code
        FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey"""

  val dedup_embedding: String = """
        WITH e AS (SELECT vec_id, label, cast(embedding as double[]) as emb
                   FROM embeddings)
        SELECT a.vec_id as id_a, b.vec_id as id_b, a.label,
          list_dot_product(a.emb, b.emb) /
            (sqrt(list_dot_product(a.emb, a.emb)) *
             sqrt(list_dot_product(b.emb, b.emb))) as cosine
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.emb, b.emb) /
            (sqrt(list_dot_product(a.emb, a.emb)) *
             sqrt(list_dot_product(b.emb, b.emb))) >= 0.35"""

  val ann_bruteforce: String = """
        WITH q AS (SELECT vec_id as query_id, cast(embedding as double[]) as q_emb
                   FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id as neighbor_id, cast(embedding as double[]) as emb
              FROM embeddings)
        SELECT query_id, neighbor_id, rank, cosine FROM (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) as rank, cosine
          FROM (SELECT query_id, neighbor_id,
              list_dot_product(q_emb, emb) /
                (sqrt(list_dot_product(q_emb, q_emb)) *
                 sqrt(list_dot_product(emb, emb))) as cosine
            FROM q JOIN c ON neighbor_id != query_id))
        WHERE rank <= 5"""

  val ann_filtered: String = """
        WITH q AS (SELECT vec_id as query_id, cast(embedding as double[]) as q_emb
                   FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id as neighbor_id, cast(embedding as double[]) as emb
              FROM embeddings WHERE label % 2 = 0)
        SELECT query_id, neighbor_id, rank, cosine FROM (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) as rank, cosine
          FROM (SELECT query_id, neighbor_id,
              list_dot_product(q_emb, emb) /
                (sqrt(list_dot_product(q_emb, q_emb)) *
                 sqrt(list_dot_product(emb, emb))) as cosine
            FROM q JOIN c ON neighbor_id != query_id))
        WHERE rank <= 5"""

  val label_centroids: String = """
        SELECT label, dim,
          (cast(sum(cast(v * 281474976710656.0 as decimal(28,0)))
              as double) / 281474976710656.0) / count(*) as mean,
          count(*) as n_vectors
        FROM (SELECT label, generate_subscripts(embedding, 1) - 1 as dim,
                unnest(cast(embedding as double[])) as v
              FROM embeddings)
        GROUP BY 1, 2"""

  val ann_sq8: String = """
        WITH am AS (SELECT max(list_max(list_transform(embedding,
            x -> abs(cast(x as double))))) as absmax FROM embeddings),
        codes AS (
          SELECT vec_id, cd,
            cast(list_sum(list_transform(cd, x -> x * x)) as bigint)
              as n2
          FROM (SELECT vec_id, list_transform(embedding, x ->
              CASE WHEN am.absmax = 0 THEN 0
                   ELSE cast(greatest(-127, least(127,
                     floor(cast(x as double)
                       / (am.absmax / 127.0)
                       + 0.5))) as int) END) as cd
            FROM embeddings, am)),
        scored AS (
          SELECT q.vec_id as query_id, c.vec_id as neighbor_id,
            cast(list_sum(list_transform(range(len(q.cd)),
              i -> q.cd[i+1] * c.cd[i+1])) as bigint) as dot_i8,
            q.n2 as qn, c.n2 as cn
          FROM codes q JOIN codes c ON c.vec_id <> q.vec_id
          WHERE q.vec_id < 8)
        SELECT query_id, neighbor_id, rank, dot_i8, cosine_q FROM (
          SELECT query_id, neighbor_id, dot_i8,
            CASE WHEN qn = 0 OR cn = 0 THEN 0.0
                 ELSE cast(dot_i8 as double)
                   / (sqrt(cast(qn as double)) * sqrt(cast(cn as double)))
            END as cosine_q,
            row_number() OVER (PARTITION BY query_id ORDER BY
              CASE WHEN qn = 0 OR cn = 0 THEN 0.0
                   ELSE cast(dot_i8 as double)
                     / (sqrt(cast(qn as double))
                        * sqrt(cast(cn as double))) END DESC,
              neighbor_id) as rank
          FROM scored)
        WHERE rank <= 5"""

  val text_quality: String = """
        SELECT doc_id,
          cast(length(text) as double) as n_chars_measured,
          cast(len(string_split(text, ' ')) as double) as n_tokens,
          cast(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) as double)
            / cast(length(text) as double) as punct_ratio,
          cast(len(list_filter(string_split(text, ' '),
              t -> t in ('the','a','of','and','to','in','is','it'))) as double)
            / cast(len(string_split(text, ' ')) as double) as stopword_ratio,
          (cast(length(text) as double) - cast(len(string_split(text, ' ')) as double) + 1)
            / cast(len(string_split(text, ' ')) as double) as mean_token_len,
          least(cast(len(string_split(text, ' ')) as double) / 100.0, 1.0)
            * (1.0 - cast(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) as double)
                / cast(length(text) as double))
            * least(cast(len(list_filter(string_split(text, ' '),
                t -> t in ('the','a','of','and','to','in','is','it'))) as double)
                / cast(len(string_split(text, ' ')) as double) * 4.0, 1.0)
            as quality_score
        FROM documents"""

  val corpus_report: String = """
        SELECT count(*) as n_docs,
          cast(sum(len(string_split(text, ' '))) as bigint) as n_tokens,
          cast(sum(length(text)) as bigint) as n_chars_total,
          count(DISTINCT lang) as n_langs,
          count(DISTINCT source) as n_sources,
          cast(sum(len(string_split(text, ' '))) as double) / count(*)
            as mean_doc_tokens
        FROM documents"""

  val sequence_pack: String = """
        WITH t AS (SELECT doc_id,
                     cast(len(string_split(text, ' ')) as bigint) as n_tokens
                   FROM documents),
        c AS (SELECT doc_id, n_tokens,
                cast(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  as bigint) as token_start
              FROM t)
        SELECT doc_id, n_tokens, token_start,
          token_start // 2048 as seq_id,
          token_start % 2048 as seq_offset
        FROM c"""

  /** Packing-efficiency audit: mirrors TextAnalysis.packEfficiency
    * over the same serial cumsum the sequence_pack oracle uses. */
  private[graft] val pack_efficiency: String = """
        WITH t AS (SELECT doc_id,
                     cast(len(string_split(text, ' ')) as bigint) as n_tokens
                   FROM documents),
        c AS (SELECT doc_id, n_tokens,
                cast(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  as bigint) as token_start
              FROM t),
        spans AS (
          SELECT doc_id, n_tokens, token_start,
            token_start // 2048 as first_seq,
            (token_start + n_tokens - 1) // 2048 as last_seq
          FROM c),
        per AS (
          SELECT doc_id, n_tokens, token_start,
            unnest(generate_series(first_seq, last_seq)) as seq_id
          FROM spans)
        SELECT seq_id, count(*) as n_docs,
          cast(sum(case when token_start >= seq_id * 2048
            then 1 else 0 end) as bigint) as n_docs_starting,
          cast(sum(case when token_start < seq_id * 2048
            then 1 else 0 end) as bigint) as n_carried_in,
          cast(sum(least(token_start + n_tokens, (seq_id + 1) * 2048)
            - greatest(token_start, seq_id * 2048)) as bigint)
            as tokens_filled
        FROM per GROUP BY 1"""

  val inverted_index: String = """
        WITH wx AS (SELECT doc_id, unnest(string_split(text, ' ')) as word
                    FROM documents),
        tf AS (SELECT word, doc_id, count(*) as tf FROM wx GROUP BY 1, 2),
        stats AS (SELECT word, count(*) as df,
                    cast(sum(tf) as bigint) as cf FROM tf GROUP BY 1),
        ranked AS (
          SELECT word, doc_id, tf,
            row_number() OVER (PARTITION BY word
              ORDER BY tf DESC, doc_id) as posting_rank
          FROM tf)
        SELECT word, df, cf, cast(posting_rank as bigint) as posting_rank,
          doc_id, tf
        FROM ranked JOIN stats USING (word)
        WHERE posting_rank <= 8"""

  val word_pmi: String = """
        WITH toks AS (SELECT string_split(text, ' ') as w FROM documents),
        tot AS (SELECT cast(sum(len(w)) as double) as t_uni,
                  cast(sum(greatest(len(w) - 1, 0)) as double) as t_bi
                FROM toks),
        unic AS (SELECT word, count(*) as c_w
                 FROM (SELECT unnest(w) as word FROM toks) GROUP BY 1),
        bic AS (
          SELECT p['a'] as word_a, p['b'] as word_b, count(*) as c_ab
          FROM (SELECT unnest(list_transform(
                  range(greatest(len(w) - 1, 0)),
                  i -> {'a': w[i+1], 'b': w[i+2]})) as p
                FROM toks)
          GROUP BY 1, 2 HAVING count(*) >= 5)
        SELECT b.word_a, b.word_b, b.c_ab, ua.c_w as c_a, ub.c_w as c_b,
          ((cast(b.c_ab as double) * t.t_uni) * t.t_uni) /
            ((t.t_bi * cast(ua.c_w as double)) * cast(ub.c_w as double))
            as lift
        FROM bic b
          JOIN unic ua ON ua.word = b.word_a
          JOIN unic ub ON ub.word = b.word_b, tot t"""

  val graph_triangles: String = """
        WITH toks AS (SELECT string_split(text, ' ') as w
                      FROM documents),
        prs AS (
          SELECT p['a'] as a, p['b'] as b FROM (
            SELECT unnest(list_transform(range(greatest(len(w) - 1, 0)),
                     i -> {'a': w[i+1], 'b': w[i+2]})) as p
            FROM toks)
          WHERE p['a'] <> p['b']),
        edges AS (
          SELECT DISTINCT least(a, b) as a, greatest(a, b) as b
          FROM prs),
        deg AS (
          SELECT word, count(*) as deg FROM (
            SELECT a as word FROM edges
            UNION ALL SELECT b as word FROM edges)
          GROUP BY 1),
        tri AS (
          SELECT e1.a as va, e1.b as vb, e2.b as vc
          FROM edges e1
            JOIN edges e2 ON e2.a = e1.b
            JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
        tcount AS (
          SELECT word, count(*) as n_tri FROM (
            SELECT va as word FROM tri
            UNION ALL SELECT vb as word FROM tri
            UNION ALL SELECT vc as word FROM tri)
          GROUP BY 1)
        SELECT d.word, d.deg,
          coalesce(t.n_tri, 0) as n_tri,
          CASE WHEN d.deg < 2 THEN 0.0
               ELSE (cast(coalesce(t.n_tri, 0) as double) * 2.0)
                 / (cast(d.deg as double)
                    * cast(d.deg - 1 as double)) END as clustering
        FROM deg d LEFT JOIN tcount t USING (word)"""

  val text_repetition: String = """
        WITH t AS (SELECT doc_id, string_split(text, ' ') as toks
                   FROM documents),
        g AS (SELECT doc_id, toks,
          CASE WHEN len(toks) >= 2
            THEN list_transform(range(len(toks) - 1),
                   i -> array_to_string(toks[i+1:i+2], ' '))
            ELSE [array_to_string(toks, ' ')] END as bg,
          CASE WHEN len(toks) >= 3
            THEN list_transform(range(len(toks) - 2),
                   i -> array_to_string(toks[i+1:i+3], ' '))
            ELSE [array_to_string(toks, ' ')] END as tg
          FROM t)
        SELECT doc_id,
          cast(len(toks) as bigint) as n_tokens,
          (cast(len(toks) as double) - len(list_distinct(toks)))
            / cast(len(toks) as double) as dup_word_frac,
          (cast(len(bg) as double) - len(list_distinct(bg)))
            / cast(len(bg) as double) as dup_bigram_frac,
          (cast(len(tg) as double) - len(list_distinct(tg)))
            / cast(len(tg) as double) as dup_trigram_frac,
          (cast(len(bg) as double) - len(list_distinct(bg)))
            / cast(len(bg) as double) > 0.2 as is_repetitive
        FROM g"""

  val tfidf_topterms: String = """
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) as word
                   FROM documents),
        tf AS (SELECT doc_id, word, count(*) as tf FROM w GROUP BY 1, 2),
        df AS (SELECT word, count(distinct doc_id) as df FROM w GROUP BY 1),
        n AS (SELECT count(*) as n_docs FROM documents),
        scored AS (
          SELECT doc_id, word, tf,
            cast(tf * n_docs as double) / df as score
          FROM tf JOIN df USING (word) CROSS JOIN n)
        SELECT doc_id, word, tf, score, term_rank FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, word) as term_rank FROM scored)
        WHERE term_rank <= 3"""

  /** Same injected-addresses CTE as pii_pseudonymize/pii_pseudonym_map
    * (one shared address per doc_id%50 cohort + one unique). */
  private[graft] val pseudoPiiCte: String = """
        withpii AS (
          SELECT doc_id,
            text || ' contact user' || (doc_id % 50) ||
            '@mail.example.com or admin' || doc_id ||
            '@corp.example.org' as text
          FROM documents)"""

  private[graft] val emailReSql: String =
    """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""

  val pii_pseudonymize: String = s"""
        WITH $pseudoPiiCte
        SELECT doc_id,
          list_reduce(
            list_prepend(text, regexp_extract_all(text, '$emailReSql')),
            (acc, e) -> replace(acc, e,
              '<EMAIL_' || substr(sha256(e), 1, 8) || '>'))
            as pseudo_text,
          cast(len(regexp_extract_all(text, '$emailReSql')) as bigint)
            as n_entities,
          cast(len(list_distinct(regexp_extract_all(text, '$emailReSql')))
            as bigint) as n_distinct_entities
        FROM withpii"""

  val pii_pseudonym_map: String = s"""
        WITH $pseudoPiiCte,
        ents AS (
          SELECT DISTINCT unnest(regexp_extract_all(text, '$emailReSql'))
            as entity
          FROM withpii)
        SELECT entity,
          '<EMAIL_' || substr(sha256(entity), 1, 8) || '>' as token
        FROM ents"""

  val pii_scrub: String = """
        WITH withpii AS (
          SELECT doc_id,
            text || ' contact user' || doc_id ||
            '@mail.example.com at 10.0.' || (doc_id % 256) ||
            '.7 or 555-01' || lpad(cast(doc_id % 100 as varchar), 2, '0')
              as text
          FROM documents)
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
            '\b\d{3}-\d{4}\b', '<PHONE>', 'g') as clean_text,
          len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) as n_emails,
          len(regexp_extract_all(text,
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) as n_ips,
          len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) as n_phones
        FROM withpii"""

  val script_mix: String = """
        WITH ws AS (
          SELECT doc_id,
            text || repeat('ж', cast(doc_id % 4 as int)) ||
              repeat('中', cast(doc_id % 3 as int)) as text
          FROM documents)
        SELECT doc_id,
          cast(len(regexp_extract_all(text, '\p{Latin}')) as bigint)
            as n_latin,
          cast(len(regexp_extract_all(text, '\p{Cyrillic}')) as bigint)
            as n_cyrillic,
          cast(len(regexp_extract_all(text, '\p{Han}')) as bigint)
            as n_han,
          cast(len(regexp_extract_all(text, '[0-9]')) as bigint)
            as n_digit,
          CASE
            WHEN len(regexp_extract_all(text, '\p{Latin}'))
                   >= len(regexp_extract_all(text, '\p{Cyrillic}'))
             AND len(regexp_extract_all(text, '\p{Latin}'))
                   >= len(regexp_extract_all(text, '\p{Han}'))
              THEN 'latin'
            WHEN len(regexp_extract_all(text, '\p{Cyrillic}'))
                   >= len(regexp_extract_all(text, '\p{Han}'))
              THEN 'cyrillic'
            ELSE 'han'
          END as main_script
        FROM ws"""

  val pii_report: String = """
        WITH withpii AS (
          SELECT source,
            text ||
            CASE WHEN doc_id % 2 = 0
              THEN ' contact user' || doc_id || '@mail.example.com'
              ELSE '' END ||
            CASE WHEN doc_id % 3 = 0
              THEN ' from 10.0.' || (doc_id % 256) || '.7'
              ELSE '' END ||
            CASE WHEN doc_id % 5 = 0
              THEN ' call 555-01' || lpad(cast(doc_id % 100 as varchar), 2, '0')
              ELSE '' END as text
          FROM documents),
        c AS (
          SELECT source,
            len(regexp_extract_all(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) as ne,
            len(regexp_extract_all(text,
              '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) as ni,
            len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) as np
          FROM withpii)
        SELECT source, count(*) as n_docs,
          cast(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END) as bigint)
            as n_docs_with_pii,
          cast(sum(ne) as bigint) as n_emails,
          cast(sum(ni) as bigint) as n_ips,
          cast(sum(np) as bigint) as n_phones
        FROM c GROUP BY 1"""

  val market_basket: String = """
        WITH items AS (SELECT DISTINCT l_orderkey as ok, l_partkey as pk
                       FROM lineitem),
        sized AS (SELECT ok, pk FROM (
            SELECT ok, pk, count(*) OVER (PARTITION BY ok) as bsz
            FROM items) WHERE bsz <= 64),
        nb AS (SELECT count(DISTINCT ok) as n FROM sized),
        pairs AS (SELECT a.pk as part_a, b.pk as part_b,
                    count(*) as n_co
                  FROM sized a JOIN sized b
                    ON a.ok = b.ok AND a.pk < b.pk
                  GROUP BY 1, 2 HAVING count(*) >= 2),
        cnt AS (SELECT pk, count(*) as n FROM sized GROUP BY 1)
        SELECT part_a, part_b, n_co, ca.n as n_a, cb.n as n_b,
          cast(n_co as double) * cast((SELECT n FROM nb) as double)
            / (cast(ca.n as double) * cast(cb.n as double)) as lift
        FROM pairs
          JOIN cnt ca ON ca.pk = part_a
          JOIN cnt cb ON cb.pk = part_b"""

  val unpivot_event_counts: String = """
        WITH p AS (
          SELECT user_id,
            cast(sum(case when event_type = 'click' then 1 else 0 end) as bigint) as click,
            cast(sum(case when event_type = 'view' then 1 else 0 end) as bigint) as view
          FROM events GROUP BY 1)
        SELECT user_id, 'click' as event_type, click as n_events FROM p
        UNION ALL
        SELECT user_id, 'view' as event_type, view as n_events FROM p"""

  val value_histogram_eqdepth: String = """
        WITH ranked AS (
          SELECT event_type, value,
            row_number() OVER (PARTITION BY event_type ORDER BY value)
              as rn,
            count(*) OVER (PARTITION BY event_type) as n
          FROM events),
        qs AS (
          SELECT event_type, 0.25 as p, value as qv FROM ranked
            WHERE rn = ceil(0.25 * n)
          UNION ALL
          SELECT event_type, 0.5, value FROM ranked
            WHERE rn = ceil(0.5 * n)
          UNION ALL
          SELECT event_type, 0.75, value FROM ranked
            WHERE rn = ceil(0.75 * n)),
        fences AS (SELECT event_type, list(qv ORDER BY p) as farr
                   FROM qs GROUP BY 1)
        SELECT e.event_type,
          cast(len(list_filter(f.farr, x -> e.value > x)) as bigint)
            as bucket,
          count(*) as n, min(e.value) as lo, max(e.value) as hi
        FROM events e JOIN fences f USING (event_type)
        GROUP BY 1, 2"""

  val skew_report: String = """
        WITH c AS (SELECT user_id, count(*) as cnt
                   FROM events GROUP BY 1),
        t AS (SELECT sum(cnt) as t, count(*) as d FROM c),
        r AS (SELECT user_id, cnt,
                row_number() OVER (ORDER BY cnt DESC, user_id)
                  as key_rank
              FROM c)
        SELECT key_rank, user_id, cnt,
          cast(cast(cnt as hugeint) * 1000000 // t as bigint)
            as share_ppm,
          cast((cast(cnt as hugeint) * d + t - 1) // t as bigint)
            as salt_factor
        FROM r, t WHERE key_rank <= 20"""

  val cohort_retention: String = """
        WITH fw AS (SELECT user_id,
                      min(epoch_us(ts) // 86400000000) as cohort_day
                    FROM events GROUP BY 1),
        aw AS (SELECT DISTINCT user_id,
                 epoch_us(ts) // 86400000000 as day FROM events),
        sz AS (SELECT cohort_day, count(*) as cohort_size
               FROM fw GROUP BY 1),
        r AS (SELECT f.cohort_day, a.day - f.cohort_day as day_offset,
                count(distinct a.user_id) as n_active
              FROM aw a JOIN fw f USING (user_id) GROUP BY 1, 2)
        SELECT r.cohort_day, r.day_offset, r.n_active, sz.cohort_size,
          cast(r.n_active as double) / sz.cohort_size as retention_rate
        FROM r JOIN sz USING (cohort_day)"""

  val event_resample: String = """
        WITH e AS (SELECT event_type, epoch_us(ts) as ts FROM events),
        h AS (SELECT event_type, ts - ts % 3600000000 as hour_us,
                count(*) as n FROM e GROUP BY 1, 2),
        spans AS (SELECT event_type,
                min(ts) - min(ts) % 3600000000 as lo,
                max(ts) - max(ts) % 3600000000 as hi
              FROM e GROUP BY 1),
        grid AS (SELECT event_type,
                unnest(generate_series(lo, hi, 3600000000)) as hour_us
              FROM spans)
        SELECT g.event_type, g.hour_us, coalesce(h.n, 0) as n_events
        FROM grid g LEFT JOIN h USING (event_type, hour_us)"""

  val event_interpolate: String = """
        WITH e AS (SELECT event_type, epoch_us(ts) as ts, value
                   FROM events),
        h AS (SELECT event_type, ts - ts % 3600000000 as hour_us,
                cast(sum(cast(value as decimal(18,2))) as double)
                  / count(*) as v
              FROM e GROUP BY 1, 2),
        spans AS (SELECT event_type,
                min(ts) - min(ts) % 3600000000 as lo,
                max(ts) - max(ts) % 3600000000 as hi
              FROM e GROUP BY 1),
        grid AS (SELECT event_type,
                unnest(generate_series(lo, hi, 3600000000)) as hour_us
              FROM spans),
        j AS (SELECT g.event_type, g.hour_us, h.v
              FROM grid g LEFT JOIN h USING (event_type, hour_us)),
        wnd AS (SELECT event_type, hour_us, v,
            last_value(v IGNORE NULLS) OVER
              (PARTITION BY event_type ORDER BY hour_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as pv,
            last_value(CASE WHEN v IS NOT NULL THEN hour_us END
                IGNORE NULLS) OVER
              (PARTITION BY event_type ORDER BY hour_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as ph,
            first_value(v IGNORE NULLS) OVER
              (PARTITION BY event_type ORDER BY hour_us
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) as nv,
            first_value(CASE WHEN v IS NOT NULL THEN hour_us END
                IGNORE NULLS) OVER
              (PARTITION BY event_type ORDER BY hour_us
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) as nh
          FROM j)
        SELECT event_type, hour_us,
          CASE WHEN v IS NOT NULL THEN v
               WHEN pv IS NULL THEN nv
               WHEN nv IS NULL THEN pv
               ELSE pv + (nv - pv)
                 * (cast(hour_us - ph as double)
                    / cast(nh - ph as double)) END as value_f,
          v IS NOT NULL as observed
        FROM wnd"""

  val conversion_funnel: String = """
        WITH e AS (SELECT user_id, epoch_us(ts) as ts, event_type
                   FROM events),
        c AS (SELECT user_id, min(ts) as first_click_ts FROM e
              WHERE event_type = 'click' GROUP BY 1),
        p AS (SELECT user_id, ts FROM e WHERE event_type = 'purchase'),
        f AS (SELECT c.user_id, c.first_click_ts,
                min(CASE WHEN p.ts >= c.first_click_ts THEN p.ts END)
                  as first_purchase_ts
              FROM c LEFT JOIN p USING (user_id)
              GROUP BY 1, 2)
        SELECT user_id, first_click_ts, first_purchase_ts,
          first_purchase_ts IS NOT NULL as converted,
          first_purchase_ts - first_click_ts as us_to_convert
        FROM f"""

  val event_transitions: String = """
        WITH e AS (SELECT user_id, epoch_us(ts) as ts, event_id,
                     event_type FROM events),
        p AS (SELECT event_type as from_type,
                lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) as to_type
              FROM e),
        c AS (SELECT from_type, to_type, count(*) as n_pairs FROM p
              WHERE to_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n_pairs,
          cast(n_pairs as double) /
            cast(sum(n_pairs) OVER (PARTITION BY from_type) as double)
            as p_next
        FROM c"""

  val ts_forecast: String = """
        WITH e AS (SELECT event_type, epoch_us(ts) as ts FROM events),
        h AS (SELECT event_type, ts - ts % 3600000000 as hour_us,
                count(*) as n_raw
              FROM e GROUP BY 1, 2),
        spans AS (SELECT event_type,
                min(ts) - min(ts) % 3600000000 as lo,
                max(ts) - max(ts) % 3600000000 as hi
              FROM e GROUP BY 1),
        grid AS (SELECT event_type,
                unnest(generate_series(lo, hi, 3600000000)) as hour_us
              FROM spans),
        s AS (SELECT g.event_type, g.hour_us,
                coalesce(h.n_raw, 0) as n_events
              FROM grid g LEFT JOIN h USING (event_type, hour_us)),
        l AS (SELECT event_type, max(hour_us) as t_last
              FROM s GROUP BY 1),
        w AS (SELECT s.event_type, s.hour_us, s.n_events, l.t_last
              FROM s JOIN l USING (event_type)
              WHERE s.hour_us > l.t_last - 24 * 3600000000),
        m AS (SELECT event_type, avg(n_events) as mean_baseline
              FROM w GROUP BY 1)
        SELECT w.event_type,
          w.hour_us + 24 * 3600000000 as hour_us,
          w.hour_us as source_hour_us,
          cast(w.n_events as bigint) as forecast_n,
          m.mean_baseline
        FROM w JOIN m USING (event_type)
        WHERE w.hour_us + 24 * 3600000000 <= w.t_last + 24 * 3600000000"""

  val ts_anomaly: String = """
        WITH e AS (SELECT event_type, epoch_us(ts) as ts FROM events),
        h AS (SELECT event_type, ts - ts % 3600000000 as hour_us,
                count(*) as n_raw
              FROM e GROUP BY 1, 2),
        spans AS (SELECT event_type,
                min(ts) - min(ts) % 3600000000 as lo,
                max(ts) - max(ts) % 3600000000 as hi
              FROM e GROUP BY 1),
        grid AS (SELECT event_type,
                unnest(generate_series(lo, hi, 3600000000)) as hour_us
              FROM spans),
        s AS (SELECT g.event_type, g.hour_us,
                coalesce(h.n_raw, 0) as n_events
              FROM grid g LEFT JOIN h USING (event_type, hour_us)),
        w AS (SELECT event_type, hour_us, n_events,
                count(*) OVER tw as n_hist,
                sum(n_events) OVER tw as s1,
                sum(cast(n_events as decimal(19,0))
                  * cast(n_events as decimal(19,0))) OVER tw as s2
              FROM s WINDOW tw AS (PARTITION BY event_type
                ORDER BY hour_us
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        m AS (SELECT *,
                cast(s1 as double) / cast(n_hist as double) as mu,
                sqrt(greatest(
                  cast(s2 as double) / cast(n_hist as double)
                    - (cast(s1 as double) / cast(n_hist as double))
                      * (cast(s1 as double) / cast(n_hist as double)),
                  0.0)) as sd
              FROM w)
        SELECT event_type, hour_us, n_events, n_hist,
          CASE WHEN n_hist >= 12 THEN mu END as mean_trail,
          CASE WHEN n_hist >= 12 THEN sd END as std_trail,
          CASE WHEN n_hist >= 12 AND sd > 0 THEN
            (cast(n_events as double) - mu) / sd END as z_score,
          (n_hist >= 12 AND ((sd > 0 AND
              abs((cast(n_events as double) - mu) / sd) > 3.0)
            OR (sd = 0.0 AND cast(n_events as double) <> mu)))
            as is_anomaly
        FROM m"""

  val value_winsorize: String = """
        WITH ranked AS (
          SELECT event_type, value,
            row_number() OVER (PARTITION BY event_type ORDER BY value)
              as rn,
            count(*) OVER (PARTITION BY event_type) as n
          FROM events),
        fences AS (
          SELECT event_type,
            max(CASE WHEN rn = ceil(0.05 * n) THEN value END) as lo,
            max(CASE WHEN rn = ceil(0.95 * n) THEN value END) as hi
          FROM ranked GROUP BY 1)
        SELECT e.event_id, e.event_type, e.value,
          CASE WHEN e.value < f.lo THEN f.lo
               WHEN e.value > f.hi THEN f.hi
               ELSE e.value END as value_w,
          (e.value < f.lo OR e.value > f.hi) as clipped
        FROM events e JOIN fences f USING (event_type)"""

  val value_outliers: String = """
        WITH stats AS (
          SELECT event_type,
            cast(sum(cast(value as decimal(18,2))) as double) as s1,
            cast(sum(cast(value as decimal(18,2)) *
              cast(value as decimal(18,2))) as double) as s2,
            count(*) as n
          FROM events GROUP BY 1),
        ms AS (
          SELECT event_type, s1 / n as mean_value,
            sqrt((s2 / n) - (s1 / n) * (s1 / n)) as std_value
          FROM stats)
        SELECT event_id, event_type, value, mean_value, std_value
        FROM events JOIN ms USING (event_type)
        WHERE abs(value - mean_value) > 2.0 * std_value"""

  val anonymize_generalize: String = """
        WITH qi AS (SELECT c_custkey, cast(c_nationkey as bigint) as nat,
            cast(floor(c_acctbal / 100.0) as bigint) as b100,
            cast(floor(c_acctbal / 1000.0) as bigint) as b1000,
            cast(c_nationkey // 5 as bigint) as n5
          FROM customer),
        m AS (SELECT
          (SELECT min(c) FROM (SELECT count(*) c FROM qi
             GROUP BY nat, b100)) as m0,
          (SELECT min(c) FROM (SELECT count(*) c FROM qi
             GROUP BY nat, b1000)) as m1,
          (SELECT min(c) FROM (SELECT count(*) c FROM qi
             GROUP BY n5, b1000)) as m2,
          (SELECT min(c) FROM (SELECT count(*) c FROM qi
             GROUP BY n5)) as m3,
          (SELECT count(*) FROM qi) as m4),
        lvl AS (SELECT CASE WHEN m0 >= 10 THEN 0 WHEN m1 >= 10 THEN 1
            WHEN m2 >= 10 THEN 2 WHEN m3 >= 10 THEN 3 ELSE 4 END as l
          FROM m)
        SELECT c_custkey,
          CASE WHEN l <= 1 THEN cast(nat as varchar)
               WHEN l <= 3 THEN concat(cast(n5 * 5 as varchar), '-',
                 cast(n5 * 5 + 4 as varchar))
               ELSE '*' END as qi_nation,
          CASE WHEN l = 0 THEN cast(b100 * 100 as varchar)
               WHEN l <= 2 THEN cast(b1000 * 1000 as varchar)
               ELSE '*' END as qi_acctbal,
          cast(l as int) as gen_level
        FROM qi, lvl"""

  val t_closeness: String = """
        WITH gv AS (SELECT c_nationkey, c_mktsegment AS v, count(*) AS c_gv
                    FROM customer GROUP BY 1, 2),
        vc AS (SELECT v, sum(c_gv) AS c_v FROM gv GROUP BY 1),
        tot AS (SELECT sum(c_v) AS n FROM vc),
        j AS (SELECT gv.c_nationkey, gv.c_gv, vc.c_v, tot.n,
                sum(c_gv) OVER (PARTITION BY c_nationkey) AS n_g
              FROM gv JOIN vc USING (v) CROSS JOIN tot),
        g AS (SELECT c_nationkey,
                first(n_g) AS group_size,
                sum(abs(c_gv::HUGEINT * n - c_v::HUGEINT * n_g)) AS s_num,
                sum(c_v) AS s_cov,
                first(n) AS n
              FROM j GROUP BY 1)
        SELECT c_nationkey, CAST(group_size AS BIGINT) AS group_size,
          0.5 * (CAST(s_num AS DOUBLE)
                   / (CAST(group_size AS DOUBLE) * CAST(n AS DOUBLE))
                 + (1.0 - CAST(s_cov AS DOUBLE) / CAST(n AS DOUBLE)))
            AS tvd,
          (0.5 * (CAST(s_num AS DOUBLE)
                   / (CAST(group_size AS DOUBLE) * CAST(n AS DOUBLE))
                 + (1.0 - CAST(s_cov AS DOUBLE) / CAST(n AS DOUBLE)))
           > 0.15) AS at_risk
        FROM g"""

  val pipeline_incremental: String = """
        SELECT event_id, ts, user_id, event_type, value FROM (
          SELECT event_id, epoch_us(ts) as ts, user_id, event_type, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts) DESC, event_id DESC) as rn
          FROM events
          WHERE value >= 0 AND value <= 400
            AND event_type in ('click','view','purchase','signup','error')
            AND event_type <> 'error' AND user_id is not null)
        WHERE rn = 1"""

  val pipeline_incremental_gold: String = """
        WITH silver AS (
          SELECT event_type, value FROM (
            SELECT event_type, value,
              row_number() OVER (PARTITION BY user_id
                ORDER BY epoch_us(ts) DESC, event_id DESC) as rn
            FROM events
            WHERE value >= 0 AND value <= 400
              AND event_type in ('click','view','purchase','signup','error')
              AND event_type <> 'error' AND user_id is not null)
          WHERE rn = 1)
        SELECT event_type, count(*) as n_events,
          cast(sum(cast(value as decimal(12,2))) as double) as total_value
        FROM silver GROUP BY 1"""

  val stream_sessionize: String = """
        WITH e AS (SELECT user_id, epoch_us(ts) as ts, event_id FROM events),
        marked AS (
          SELECT user_id, ts, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > 1800000000 THEN 1
                 ELSE 0 END as new_session
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts,
            sum(new_session) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) as session_seq
          FROM marked)
        SELECT user_id, min(ts) as session_start,
          max(ts) as session_end, cast(count(*) as int) as n_events
        FROM sess GROUP BY user_id, session_seq"""

  val click_attribution: String = """
        WITH e AS (SELECT user_id, epoch_us(ts) as ts, event_id, event_type
                   FROM events),
        p AS (SELECT user_id, event_id as purchase_id, ts FROM e
              WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts, event_id FROM e
              WHERE event_type = 'click')
        SELECT p.purchase_id, p.user_id,
          cast(count(c.event_id) as bigint) as n_clicks
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id
         AND c.ts BETWEEN p.ts - 1800000000 AND p.ts
        GROUP BY 1, 2"""

  val time_travel: String = """
        SELECT 'version_as_of' as mode, cast(0 as int) as version,
          count(distinct user_id) as n_rows
        FROM events WHERE event_id % 2 = 0
        UNION ALL
        SELECT 'version_as_of' as mode, cast(1 as int) as version,
          count(distinct user_id) as n_rows
        FROM events
        UNION ALL
        SELECT 'timestamp_as_of' as mode, cast(0 as int) as version,
          count(distinct user_id) as n_rows
        FROM events WHERE event_id % 2 = 0"""

  val grouping_sets_pricing: String = """
        SELECT l_returnflag, l_linestatus,
          cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) as int)
            as gid,
          cast(sum(cast(l_quantity as decimal(12,2))) as double) as sum_qty,
          count(*) as n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          (l_returnflag), (l_linestatus))"""

  val window_frames: String = """
        SELECT o_custkey, o_orderkey,
          cast(first_value(price) OVER w as double) as first_price,
          cast(last_value(price) OVER wf as double) as last_price,
          cast(nth_value(price, 2) OVER wf as double) as second_price,
          cast(sum(price) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) as double)
            as trailing3_sum
        FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                cast(o_totalprice as decimal(12,2)) as price FROM orders)
        WINDOW w AS (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey),
          wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""

  val multimodal_framesample: String = """
        WITH m AS (
          SELECT doc_id as media_id,
            cast(4 + doc_id % 12 as int) as nf,
            (4 + doc_id % 8) * (4 + doc_id % 4) as fl
          FROM documents),
        fr AS (SELECT media_id, nf, fl, unnest(range(0, nf, 2)) as f
               FROM m),
        px AS (SELECT media_id, nf, f, unnest(range(fl)) as i FROM fr)
        SELECT media_id, nf as n_frames, cast(f as int) as frame_idx,
          cast(f * 40 as bigint) as ts_ms,
          cast((media_id * 31 + f * 7) % 256 as int) as first_byte,
          cast(sum((media_id * 31 + f * 7 + i) % 256) as bigint)
            as sum_bytes
        FROM px GROUP BY media_id, nf, f"""

  val multimodal_resize: String = """
        WITH m AS (
          SELECT doc_id as media_id,
            (8 + doc_id % 32) as w, (8 + doc_id % 16) as h,
            cast(doc_id % 256 as int) as ra,
            cast(doc_id * 7 % 256 as int) as ga,
            cast(doc_id * 13 % 256 as int) as ba,
            cast(doc_id * 17 % 256 as int) as rb,
            cast(doc_id * 23 % 256 as int) as gb,
            cast(doc_id * 29 % 256 as int) as bb
          FROM documents),
        t AS (
          SELECT media_id, cast(w // 2 as int) as tw,
            cast(h // 2 as int) as th,
            (w // 2) // 2 as xmid, w // 2 as half,
            ra, ga, ba, rb, gb, bb
          FROM m)
        SELECT media_id, tw as thumb_w, th as thumb_h,
          ra as tl_red, ga as tl_green, ba as tl_blue,
          cast(((CASE WHEN 2*xmid < half THEN ra ELSE rb END) * 2 +
                (CASE WHEN 2*xmid + 1 < half THEN ra ELSE rb END) * 2) // 4
            as int) as mid_red,
          cast(((CASE WHEN 2*xmid < half THEN ga ELSE gb END) * 2 +
                (CASE WHEN 2*xmid + 1 < half THEN ga ELSE gb END) * 2) // 4
            as int) as mid_green,
          cast(((CASE WHEN 2*xmid < half THEN ba ELSE bb END) * 2 +
                (CASE WHEN 2*xmid + 1 < half THEN ba ELSE bb END) * 2) // 4
            as int) as mid_blue,
          rb as tr_red, gb as tr_green, bb as tr_blue
        FROM t"""

  val multimodal_mixed: String = """
        SELECT doc_id as media_id,
          CASE cast(doc_id % 3 as int)
            WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
          END as kind,
          CASE cast(doc_id % 3 as int)
            WHEN 0 THEN cast(8 + doc_id % 32 as int)
            WHEN 1 THEN 0
            ELSE cast(4 + doc_id % 8 as int)
          END as width,
          CASE cast(doc_id % 3 as int)
            WHEN 0 THEN cast(8 + doc_id % 16 as int)
            WHEN 1 THEN 0
            ELSE cast(4 + doc_id % 4 as int)
          END as height,
          CASE cast(doc_id % 3 as int)
            WHEN 0 THEN 1
            WHEN 1 THEN cast(100 + doc_id % 400 as int)
            ELSE cast(4 + doc_id % 12 as int)
          END as n_frames
        FROM documents"""

  val ts_changepoint: String = """
        WITH e AS (SELECT event_type, epoch_us(ts) as ts FROM events),
        h AS (SELECT event_type, ts - ts % 3600000000 as hour_us,
                count(*) as n_raw
              FROM e GROUP BY 1, 2),
        spans AS (SELECT event_type,
                min(ts) - min(ts) % 3600000000 as lo,
                max(ts) - max(ts) % 3600000000 as hi
              FROM e GROUP BY 1),
        grid AS (SELECT event_type,
                unnest(generate_series(lo, hi, 3600000000)) as hour_us
              FROM spans),
        s AS (SELECT g.event_type, g.hour_us,
                coalesce(h.n_raw, 0) as n_events
              FROM grid g LEFT JOIN h USING (event_type, hour_us)),
        t AS (SELECT event_type, cast(sum(n_events) as bigint) as n_total,
                cast(count(*) as bigint) as n_hours
              FROM s GROUP BY 1),
        sc AS (SELECT s.event_type, s.hour_us,
                cast(row_number() OVER w as bigint) as t_idx,
                cast(sum(s.n_events) OVER (PARTITION BY s.event_type
                  ORDER BY s.hour_us ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) as bigint) as cum_n,
                t.n_total, t.n_hours,
                cast(t.n_total as double) / cast(t.n_hours as double) as mu
              FROM s JOIN t USING (event_type)
              WINDOW w AS (PARTITION BY s.event_type ORDER BY s.hour_us)),
        cu AS (SELECT *,
                cast(cum_n as double) - cast(t_idx as double) * mu as cusum
              FROM sc)
        SELECT event_type, hour_us as change_hour_us, cusum,
          n_hours, n_total,
          cast(cum_n as double) / cast(t_idx as double) as mean_before,
          CASE WHEN n_hours > t_idx THEN
            cast(n_total - cum_n as double)
              / cast(n_hours - t_idx as double) END as mean_after
        FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                ORDER BY abs(cusum) DESC, hour_us) as pick FROM cu)
        WHERE pick = 1"""

  val decayed_popularity: String = """
        WITH e AS (SELECT event_type, epoch_us(ts) as ts FROM events),
        tr AS (SELECT max(ts) as t_ref FROM e),
        w AS (SELECT event_type,
                cast(1000000 as bigint)
                  >> least((t_ref - ts) // 86400000000, 62) as w_ppm
              FROM e, tr),
        agg AS (SELECT event_type, count(*) as n_events,
                  cast(sum(w_ppm) as bigint) as decayed_mass
                FROM w GROUP BY 1),
        tot AS (SELECT cast(sum(decayed_mass) as bigint) as t_mass FROM agg)
        SELECT event_type, n_events, decayed_mass,
          cast(decayed_mass * 1000000 // t_mass as bigint)
            as decayed_share_ppm,
          cast(row_number() OVER (ORDER BY decayed_mass DESC, event_type)
            as bigint) as decay_rank
        FROM agg, tot"""

  val doclen_histogram: String = """
        WITH b AS (
          SELECT lang,
            cast(length(bin(greatest(
              cast(len(string_split(text, ' ')) as bigint), 1))) - 1
              as bigint) as bucket
          FROM documents),
        c AS (SELECT lang, bucket, count(*) as n_docs
              FROM b GROUP BY 1, 2),
        t AS (SELECT lang, cast(sum(n_docs) as bigint) as lang_docs
              FROM c GROUP BY 1)
        SELECT c.lang, c.bucket,
          cast(1::BIGINT << cast(bucket as int) as bigint) as lo_tokens,
          cast((1::BIGINT << (cast(bucket as int) + 1)) - 1 as bigint)
            as hi_tokens,
          n_docs,
          cast((n_docs * 1000000) // lang_docs as bigint) as share_ppm
        FROM c JOIN t USING (lang)"""

  val corpus_drift: String = """
        WITH curr AS (
          SELECT lang, CASE WHEN doc_id % 7 = 0 THEN 'web-rescrape'
                            ELSE source END as source
          FROM documents WHERE doc_id % 10 <> 0),
        p AS (SELECT lang, source, count(*) as n_prev
              FROM documents GROUP BY 1, 2),
        c AS (SELECT lang, source, count(*) as n_cur
              FROM curr GROUP BY 1, 2),
        j AS (SELECT coalesce(p.lang, c.lang) as lang,
                coalesce(p.source, c.source) as source,
                coalesce(n_prev, 0) as n_prev,
                coalesce(n_cur, 0) as n_cur
              FROM p FULL OUTER JOIN c
                ON p.lang = c.lang AND p.source = c.source),
        t AS (SELECT cast(sum(n_prev) as bigint) as t_prev,
                cast(sum(n_cur) as bigint) as t_cur FROM j)
        SELECT lang, source, n_prev, n_cur,
          cast((n_prev * 1000000) // t_prev as bigint) as prev_ppm,
          cast((n_cur * 1000000) // t_cur as bigint) as cur_ppm,
          cast((n_cur * 1000000) // t_cur
            - (n_prev * 1000000) // t_prev as bigint) as drift_ppm
        FROM j, t"""

  val stream_mix_drift: String = """
        WITH curr AS (
          SELECT lang, CASE WHEN doc_id % 7 = 0 THEN 'web-rescrape'
                            ELSE source END as source
          FROM documents WHERE doc_id % 10 <> 0),
        p AS (SELECT lang, source, count(*) as n_prev
              FROM documents GROUP BY 1, 2),
        c AS (SELECT lang, source, count(*) as n_cur
              FROM curr GROUP BY 1, 2),
        j AS (SELECT coalesce(p.lang, c.lang) as lang,
                coalesce(p.source, c.source) as source,
                coalesce(n_prev, 0) as n_prev,
                coalesce(n_cur, 0) as n_cur
              FROM p FULL OUTER JOIN c
                ON p.lang = c.lang AND p.source = c.source),
        t AS (SELECT cast(sum(n_prev) as bigint) as t_prev,
                cast(sum(n_cur) as bigint) as t_cur FROM j)
        SELECT lang, source, n_prev, n_cur,
          cast((n_prev * 1000000) // t_prev as bigint) as prev_ppm,
          cast((n_cur * 1000000) // t_cur as bigint) as cur_ppm,
          cast((n_cur * 1000000) // t_cur
            - (n_prev * 1000000) // t_prev as bigint) as drift_ppm
        FROM j, t"""

  val ks_drift: String = """
        WITH p0 AS (SELECT cast(len(string_split(text, ' ')) as bigint)
                      as v FROM documents),
        c0 AS (SELECT CASE WHEN doc_id % 4 = 0 THEN least(v, 5)
                           ELSE v END as v
               FROM (SELECT doc_id,
                       cast(len(string_split(text, ' ')) as bigint) as v
                     FROM documents WHERE doc_id % 10 <> 0)),
        pc AS (SELECT v, count(*) as c_prev FROM p0 GROUP BY 1),
        cc AS (SELECT v, count(*) as c_cur FROM c0 GROUP BY 1),
        j AS (SELECT coalesce(pc.v, cc.v) as v,
                coalesce(c_prev, 0) as c_prev,
                coalesce(c_cur, 0) as c_cur
              FROM pc FULL OUTER JOIN cc ON pc.v = cc.v),
        t AS (SELECT cast(sum(c_prev) as bigint) as n_prev,
                cast(sum(c_cur) as bigint) as n_cur FROM j),
        k AS (SELECT v,
                abs(cast((sum(c_prev) OVER (ORDER BY v) * 1000000)
                      // t.n_prev as bigint)
                  - cast((sum(c_cur) OVER (ORDER BY v) * 1000000)
                      // t.n_cur as bigint)) as gap_ppm,
                t.n_prev, t.n_cur
              FROM j, t)
        SELECT gap_ppm as ks_ppm, v as at_value, n_prev, n_cur
        FROM k ORDER BY gap_ppm DESC, v LIMIT 1"""

  val user_rfm: String = """
        WITH e AS (SELECT user_id, epoch_us(ts) as ts, value
              FROM events),
        tr AS (SELECT max(ts) as t_ref FROM e),
        pu AS (SELECT user_id,
                cast((t.t_ref - max(ts)) // 86400000000 as bigint)
                  as recency_days,
                count(*) as frequency,
                cast(sum(cast(value as decimal(18,2))) as double)
                  as monetary
              FROM e, tr t GROUP BY user_id, t.t_ref),
        nn AS (SELECT count(*) as n FROM pu),
        rr AS (SELECT recency_days as v,
                row_number() OVER (ORDER BY recency_days) as rn FROM pu),
        fr AS (SELECT v FROM rr, nn WHERE rn = ceil(0.2 * n)
               UNION ALL SELECT v FROM rr, nn WHERE rn = ceil(0.4 * n)
               UNION ALL SELECT v FROM rr, nn WHERE rn = ceil(0.6 * n)
               UNION ALL SELECT v FROM rr, nn WHERE rn = ceil(0.8 * n)),
        ff0 AS (SELECT frequency as v,
                row_number() OVER (ORDER BY frequency) as rn FROM pu),
        ff AS (SELECT v FROM ff0, nn WHERE rn = ceil(0.2 * n)
               UNION ALL SELECT v FROM ff0, nn WHERE rn = ceil(0.4 * n)
               UNION ALL SELECT v FROM ff0, nn WHERE rn = ceil(0.6 * n)
               UNION ALL SELECT v FROM ff0, nn WHERE rn = ceil(0.8 * n)),
        fm0 AS (SELECT monetary as v,
                row_number() OVER (ORDER BY monetary) as rn FROM pu),
        fm AS (SELECT v FROM fm0, nn WHERE rn = ceil(0.2 * n)
               UNION ALL SELECT v FROM fm0, nn WHERE rn = ceil(0.4 * n)
               UNION ALL SELECT v FROM fm0, nn WHERE rn = ceil(0.6 * n)
               UNION ALL SELECT v FROM fm0, nn WHERE rn = ceil(0.8 * n))
        SELECT user_id, recency_days, frequency, monetary,
          r_score, f_score, m_score,
          concat(cast(r_score as varchar), cast(f_score as varchar),
            cast(m_score as varchar)) as rfm_segment
        FROM (SELECT u.*,
            cast(5 - (SELECT count(*) FROM fr
              WHERE cast(u.recency_days as double) > cast(fr.v as double))
              as bigint) as r_score,
            cast(1 + (SELECT count(*) FROM ff
              WHERE cast(u.frequency as double) > cast(ff.v as double))
              as bigint) as f_score,
            cast(1 + (SELECT count(*) FROM fm WHERE u.monetary > fm.v)
              as bigint) as m_score
          FROM pu u)"""

  val image_dedup: String = """
        SELECT width, height, red, green, blue,
          min(media_id) as keep_media_id, count(*) as n_copies
        FROM (SELECT doc_id as media_id,
                cast(8 + doc_id % 32 as int) as width,
                cast(8 + doc_id % 16 as int) as height,
                cast(doc_id % 256 as int) as red,
                cast(doc_id * 7 % 256 as int) as green,
                cast(doc_id * 13 % 256 as int) as blue
              FROM documents)
        GROUP BY 1, 2, 3, 4, 5"""

  val table_diff: String = """
        WITH curr AS (
          SELECT doc_id, text,
            CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END as lang,
            source
          FROM documents WHERE doc_id % 10 <> 0
          UNION ALL
          SELECT doc_id + 1000000, text, lang, source
          FROM documents WHERE doc_id < 10)
        SELECT doc_id, diff_status FROM (
          SELECT coalesce(p.doc_id, c.doc_id) as doc_id,
            CASE WHEN p.doc_id IS NULL THEN 'added'
                 WHEN c.doc_id IS NULL THEN 'removed'
                 WHEN p.text <> c.text OR p.lang <> c.lang
                   OR p.source <> c.source THEN 'changed' END
              as diff_status
          FROM documents p FULL OUTER JOIN curr c
            ON p.doc_id = c.doc_id)
        WHERE diff_status IS NOT NULL"""

  val event_paths: String = """
        WITH e AS (SELECT user_id, epoch_us(ts) as ts, event_id,
                event_type FROM events),
        w AS (SELECT event_type as e0,
                lead(event_type, 1) OVER u as e1,
                lead(event_type, 2) OVER u as e2
              FROM e
              WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id)),
        p AS (SELECT e0 || '>' || e1 || '>' || e2 as path,
                count(*) as n_paths
              FROM w WHERE e2 IS NOT NULL GROUP BY 1),
        t AS (SELECT cast(sum(n_paths) as bigint) as tt FROM p)
        SELECT path, n_paths, share_ppm, path_rank FROM (
          SELECT path, n_paths,
            cast((n_paths * 1000000) // t.tt as bigint) as share_ppm,
            cast(row_number() OVER (ORDER BY n_paths DESC, path)
              as bigint) as path_rank
          FROM p, t)
        WHERE path_rank <= 20"""

  val value_outliers_mad: String = """
        WITH med AS (
          SELECT event_type, value as med FROM (
            SELECT event_type, value,
              row_number() OVER (PARTITION BY event_type
                ORDER BY value) as rn,
              count(*) OVER (PARTITION BY event_type) as n
            FROM events) WHERE rn = ceil(0.5 * n)),
        dev AS (SELECT e.event_id, e.event_type, e.value, m.med,
                  abs(e.value - m.med) as dev
                FROM events e JOIN med m USING (event_type)),
        mad AS (
          SELECT event_type, dev as mad FROM (
            SELECT event_type, dev,
              row_number() OVER (PARTITION BY event_type
                ORDER BY dev) as rn,
              count(*) OVER (PARTITION BY event_type) as n
            FROM dev) WHERE rn = ceil(0.5 * n))
        SELECT d.event_id, d.event_type, d.value, d.med, a.mad,
          0.6745 * d.dev / a.mad as mod_z
        FROM dev d JOIN mad a USING (event_type)
        WHERE a.mad > 0 AND 0.6745 * d.dev / a.mad > 3.5"""

  /** De-seasonalized MAD anomalies (mirrors
    * TimeSeries.seasonalAnomaly): the ts_decompose residual chain,
    * then the value_outliers_mad rank-copy median/MAD pattern. */
  val ts_seasonal_anomaly: String = """
        WITH e AS (SELECT event_type, epoch_us(ts) as ts FROM events),
        h AS (SELECT event_type, ts - ts % 3600000000 as hour_us,
                count(*) as n FROM e GROUP BY 1, 2),
        spans AS (SELECT event_type,
                min(ts) - min(ts) % 3600000000 as lo,
                max(ts) - max(ts) % 3600000000 as hi
              FROM e GROUP BY 1),
        grid AS (SELECT event_type,
                unnest(generate_series(lo, hi, 3600000000)) as hour_us
              FROM spans),
        s AS (SELECT g.event_type, g.hour_us,
                coalesce(h.n, 0) as n_events
              FROM grid g LEFT JOIN h USING (event_type, hour_us)),
        f AS (SELECT event_type, hour_us, n_events,
                cast(sum(n_events) OVER w as bigint) as frame_sum,
                cast(count(*) OVER w as bigint) as frame_n,
                (hour_us // 3600000000) % 24 as hod
              FROM s
              WINDOW w AS (PARTITION BY event_type ORDER BY hour_us
                ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)),
        f2 AS (SELECT *,
                CASE WHEN frame_n = 24
                     THEN 24 * n_events - frame_sum END as det_num
               FROM f),
        seas AS (SELECT event_type, hod,
                cast(sum(det_num) as bigint) as s_num,
                count(*) as s_cnt
              FROM f2 WHERE det_num IS NOT NULL GROUP BY 1, 2),
        res AS (
          SELECT f2.event_type, f2.hour_us, f2.n_events,
            cast(f2.n_events as double)
              - cast(frame_sum as double) / 24.0
              - cast(s_num as double)
                / (24.0 * cast(s_cnt as double)) as residual
          FROM f2 JOIN seas USING (event_type, hod)
          WHERE det_num IS NOT NULL),
        med AS (
          SELECT event_type, residual as med FROM (
            SELECT event_type, residual,
              row_number() OVER (PARTITION BY event_type
                ORDER BY residual) as rn,
              count(*) OVER (PARTITION BY event_type) as n
            FROM res) WHERE rn = ceil(0.5 * n)),
        dev AS (SELECT r.event_type, r.hour_us, r.n_events, r.residual,
                  m.med, abs(r.residual - m.med) as dev
                FROM res r JOIN med m USING (event_type)),
        mad AS (
          SELECT event_type, dev as mad FROM (
            SELECT event_type, dev,
              row_number() OVER (PARTITION BY event_type
                ORDER BY dev) as rn,
              count(*) OVER (PARTITION BY event_type) as n
            FROM dev) WHERE rn = ceil(0.5 * n))
        SELECT d.event_type, d.hour_us, d.n_events, d.residual, d.med,
          a.mad, 0.6745 * d.dev / a.mad as mod_z
        FROM dev d JOIN mad a USING (event_type)
        WHERE a.mad > 0 AND 0.6745 * d.dev / a.mad > 3.5"""

  val bm25_search: String = """
        WITH sized AS (SELECT doc_id, text,
                cast(len(string_split(text, ' ')) as bigint) as dl
              FROM documents),
        postings AS (SELECT doc_id, dl, word, count(*) as tf
              FROM (SELECT doc_id, dl,
                      unnest(string_split(text, ' ')) as word
                    FROM sized)
              GROUP BY 1, 2, 3),
        dfreq AS (SELECT word, count(*) as df FROM postings GROUP BY 1),
        totals AS (SELECT count(*) as n_docs_total,
                cast(sum(dl) as bigint) as total_tokens
              FROM sized),
        qterms AS (SELECT DISTINCT doc_id as query_id, word
              FROM postings WHERE doc_id < 4),
        contribs AS (
          SELECT q.query_id, p.doc_id, p.word,
            (cast(t.n_docs_total as double) / cast(f.df as double)) *
              ((cast(p.tf as double) * 2.2) /
                (cast(p.tf as double) + 1.2 *
                  (0.25 + 0.75 * cast(p.dl as double) /
                    (cast(t.total_tokens as double)
                      / cast(t.n_docs_total as double))))) as contrib
          FROM postings p
            JOIN qterms q USING (word)
            JOIN dfreq f USING (word)
            CROSS JOIN totals t
          WHERE p.doc_id <> q.query_id),
        summed AS (
          SELECT query_id, doc_id,
            list_reduce(list_prepend(0.0,
              list(contrib ORDER BY word)), (a, x) -> a + x) as bm25
          FROM contribs GROUP BY 1, 2)
        SELECT query_id, doc_id, cast(rank as bigint) as rank, bm25
        FROM (SELECT query_id, doc_id, bm25,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY bm25 DESC, doc_id) as rank
              FROM summed)
        WHERE rank <= 10"""

  val skyline_2d: String = """
        WITH a AS (SELECT o_custkey, count(*) as n_orders,
            cast(sum(cast(o_totalprice as decimal(12,2))) as double)
              as total_spend
          FROM orders GROUP BY 1)
        SELECT r.o_custkey, r.n_orders, r.total_spend FROM a r
        WHERE NOT EXISTS (SELECT 1 FROM a s
          WHERE s.n_orders >= r.n_orders
            AND s.total_spend >= r.total_spend
            AND (s.n_orders > r.n_orders
              OR s.total_spend > r.total_spend))"""

  val token_gini: String = """
        WITH s AS (SELECT lang, doc_id,
                cast(len(string_split(text, ' ')) as bigint) as n_tok
              FROM documents),
        r AS (SELECT lang, n_tok,
                row_number() OVER (PARTITION BY lang
                  ORDER BY n_tok, doc_id) as i
              FROM s),
        g AS (SELECT lang, count(*) as n_docs,
                cast(sum(n_tok) as bigint) as total_tokens,
                sum(cast(i as hugeint) * n_tok) as iwx
              FROM r GROUP BY 1)
        SELECT lang, n_docs, total_tokens,
          (2.0 * cast(iwx as double)
            - cast(n_docs + 1 as double) * cast(total_tokens as double))
          / (cast(n_docs as double) * cast(total_tokens as double))
            as gini
        FROM g"""

  val shard_balance: String = """
        SELECT doc_id, n_tok,
          cast(size_rank as bigint) as size_rank,
          cast(size_rank % 16 as bigint) as shard
        FROM (SELECT doc_id,
                cast(len(string_split(text, ' ')) as bigint) as n_tok,
                row_number() OVER (ORDER BY
                  len(string_split(text, ' ')) DESC, doc_id) - 1
                  as size_rank
              FROM documents)"""

  val moments_profile: String = """
        WITH m AS (SELECT source, cast(count(*) as bigint) as n,
            cast(sum(len(string_split(text, ' '))) as bigint) as s1,
            cast(sum(len(string_split(text, ' '))
              * len(string_split(text, ' '))) as bigint) as s2,
            cast(sum(len(string_split(text, ' '))
              * len(string_split(text, ' '))
              * len(string_split(text, ' '))) as bigint) as s3
          FROM documents GROUP BY 1)
        SELECT source, n, s1, s2, s3,
          cast(s1 as double) / cast(n as double) as mean_tokens,
          cast(cast(n as hugeint) * s2 - cast(s1 as hugeint) * s1
            as varchar) as var_num,
          cast(cast(n as hugeint) * s2 - cast(s1 as hugeint) * s1
            as double) / (cast(n as double) * cast(n as double))
            as var_tokens,
          cast(sign(cast(n as hugeint) * n * s3
            - 3 * cast(n as hugeint) * s1 * s2
            + 2 * cast(s1 as hugeint) * s1 * s1) as bigint) as skew_sign
        FROM m"""

  val ivm_delta_retract: String = """
        WITH g AS (
          SELECT n_name,
            strftime(o_orderdate, '%Y-%m') as sales_month,
            sum(cast(l_extendedprice as decimal(12,2))
              * (cast(1 as decimal(4,2))
                 - cast(l_discount as decimal(4,2)))) as rev,
            count(*) as n_items
          FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
          WHERE (l_orderkey % 10 != 0 AND l_orderkey % 20 != 1)
            OR l_orderkey % 10 = 0
          GROUP BY 1, 2)
        SELECT n_name, sales_month, cast(rev as double) as total_revenue,
          cast(n_items as bigint) as n_items
        FROM g"""

  val compaction_plan: String = """
        WITH e AS (SELECT epoch_us(ts) as ts FROM events),
        pd AS (SELECT ts - ts % 86400000000 as day_us,
            cast(count(*) as bigint) as n_rows
          FROM e GROUP BY 1),
        b AS (SELECT day_us, n_rows,
            cast(coalesce(sum(n_rows) OVER (ORDER BY day_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              // 2000 as bigint) as bin_id
          FROM pd)
        SELECT day_us, n_rows, bin_id,
          cast(sum(n_rows) OVER (PARTITION BY bin_id) as bigint)
            as bin_rows,
          cast(count(*) OVER (PARTITION BY bin_id) as bigint)
            as bin_parts
        FROM b"""

  val image_phash_dedup: String = """
        WITH m AS (SELECT doc_id as media_id,
            8 + doc_id % 32 as w, 8 + doc_id % 16 as h,
            (doc_id % 256) + (doc_id * 7 % 256)
              + (doc_id * 13 % 256) as luma,
            (doc_id * 17 % 256) + (doc_id * 23 % 256)
              + (doc_id * 29 % 256) as lumb
          FROM documents),
        g AS (SELECT *, w // 2 as half FROM m),
        colc AS (SELECT media_id, x * 8 // w as cx,
            sum(CASE WHEN x < half THEN 1 ELSE 0 END) as na,
            sum(CASE WHEN x >= half THEN 1 ELSE 0 END) as nb
          FROM (SELECT media_id, w, half, unnest(range(w)) as x FROM g)
          GROUP BY 1, 2),
        rowc AS (SELECT media_id, y * 8 // h as cy, count(*) as rowspan
          FROM (SELECT media_id, h, unnest(range(h)) as y FROM g)
          GROUP BY 1, 2),
        tot AS (SELECT media_id, w, h,
            h * (half * luma + (w - half) * lumb) as total,
            luma, lumb
          FROM g),
        bits AS (SELECT c.media_id, r.cy, c.cx,
            CASE WHEN r.rowspan * (c.na * t.luma + c.nb * t.lumb) * 64
              > t.total THEN 1 ELSE 0 END as bit
          FROM colc c JOIN rowc r USING (media_id)
            JOIN tot t USING (media_id)),
        bytes AS (SELECT media_id, cy,
            cast(sum(bit * (1 << cx)) as int) as b
          FROM bits GROUP BY 1, 2),
        hashed AS (SELECT t.media_id, cast(t.w as int) as width,
            cast(t.h as int) as height,
            (SELECT string_agg(printf('%02x', b), '' ORDER BY cy)
             FROM bytes y WHERE y.media_id = t.media_id) as ahash
          FROM tot t)
        SELECT media_id, width, height, ahash,
          min(media_id) OVER (PARTITION BY ahash) as canonical_id,
          cast(count(*) OVER (PARTITION BY ahash) as bigint) as group_size,
          media_id = min(media_id) OVER (PARTITION BY ahash)
            as is_canonical
        FROM hashed"""

  val multimodal_audio_features: String = """
        WITH m AS (SELECT doc_id as media_id, 100 + doc_id % 400 as n
          FROM documents),
        s AS (SELECT media_id, cast(i // 50 as int) as window_idx,
            (media_id * 37 + i * 11) % 256 as amp
          FROM (SELECT media_id, n, unnest(range(n)) as i FROM m))
        SELECT media_id, window_idx,
          cast(count(*) as bigint) as n_samples,
          cast(sum(amp) as bigint) as sum_amp,
          cast(min(amp) as bigint) as min_amp,
          cast(max(amp) as bigint) as max_amp
        FROM s GROUP BY 1, 2"""

  val ivm_delta_gold: String = """
        WITH g AS (
          SELECT n_name,
            strftime(o_orderdate, '%Y-%m') as sales_month,
            sum(cast(l_extendedprice as decimal(12,2))
              * (cast(1 as decimal(4,2))
                 - cast(l_discount as decimal(4,2)))) as rev,
            count(*) as n_items
          FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2)
        SELECT n_name, sales_month, cast(rev as double) as total_revenue,
          cast(n_items as bigint) as n_items
        FROM g"""

  val stream_moments: String = """
        WITH m AS (SELECT source, cast(count(*) as bigint) as n,
            cast(sum(len(string_split(text, ' '))) as bigint) as s1,
            cast(sum(len(string_split(text, ' '))
              * len(string_split(text, ' '))) as bigint) as s2,
            cast(sum(len(string_split(text, ' '))
              * len(string_split(text, ' '))
              * len(string_split(text, ' '))) as bigint) as s3
          FROM documents GROUP BY 1)
        SELECT source, n, s1, s2, s3,
          cast(s1 as double) / cast(n as double) as mean_tokens,
          cast(cast(n as hugeint) * s2 - cast(s1 as hugeint) * s1
            as varchar) as var_num,
          cast(cast(n as hugeint) * s2 - cast(s1 as hugeint) * s1
            as double) / (cast(n as double) * cast(n as double))
            as var_tokens,
          cast(sign(cast(n as hugeint) * n * s3
            - 3 * cast(n as hugeint) * s1 * s2
            + 2 * cast(s1 as hugeint) * s1 * s1) as bigint) as skew_sign
        FROM m"""

  /** Mirrors Expectations.metrics over EventSuite — shared by the
    * batch `expectations` row and its streaming twin (associative
    * counters: merged micro-batch shards equal the one-shot pass). */
  val expectations_metrics: String = {
    val cases = Seq(
      ("value is non-negative", "value >= 0"),
      ("value within sane bound", "value <= 400"),
      ("event_type is known",
        "event_type in ('click','view','purchase','signup','error')"),
      ("no error events", "event_type <> 'error'"),
      ("user present", "user_id is not null"))
    cases.map { case (n, p) =>
      s"""SELECT '$n' as constraint_name,
         cast(sum(case when $p then 1 else 0 end) as bigint) as passed_records,
         cast(sum(case when $p then 0 else 1 end) as bigint) as failed_records
         FROM events"""
    }.mkString("\nUNION ALL\n")
  }

  /** Mirrors the fact-side orphan counters of Expectations.refIntegrity
    * for lineitem's three dimension relationships — the oracle of the
    * streaming orphan monitor (frozen dims ⇒ associative counts). */
  val stream_ref_integrity: String = """
        WITH f AS (
          SELECT 'lineitem_orders' as relation, l_orderkey as key
          FROM lineitem
          UNION ALL SELECT 'lineitem_part', l_partkey FROM lineitem
          UNION ALL SELECT 'lineitem_supplier', l_suppkey FROM lineitem),
        p AS (
          SELECT 'lineitem_orders' as relation, o_orderkey as key
          FROM orders
          UNION ALL SELECT 'lineitem_part', p_partkey FROM part
          UNION ALL SELECT 'lineitem_supplier', s_suppkey FROM supplier),
        pd AS (SELECT DISTINCT relation, key FROM p),
        fc AS (SELECT f.relation,
                 cast(count(*) as bigint) as n_fk_rows,
                 cast(sum(CASE WHEN f.key IS NULL THEN 1 ELSE 0 END)
                   as bigint) as n_null_fk,
                 cast(sum(CASE WHEN f.key IS NOT NULL
                     AND pd.key IS NULL THEN 1 ELSE 0 END)
                   as bigint) as n_orphan_rows
               FROM f LEFT JOIN pd ON f.relation = pd.relation
                 AND f.key = pd.key
               GROUP BY 1)
        SELECT relation, n_fk_rows, n_null_fk, n_orphan_rows,
          n_orphan_rows * 1000000 // n_fk_rows as orphan_ppm
        FROM fc"""

  /** Mirrors Expectations.refIntegrity over the star schema's five
    * declared relationships. */
  val ref_integrity: String = """
        WITH f AS (
          SELECT 'orders_customer' as relation, o_custkey as key
          FROM orders
          UNION ALL SELECT 'lineitem_orders', l_orderkey FROM lineitem
          UNION ALL SELECT 'lineitem_part', l_partkey FROM lineitem
          UNION ALL SELECT 'lineitem_supplier', l_suppkey FROM lineitem
          UNION ALL SELECT 'customer_nation', c_nationkey FROM customer),
        p AS (
          SELECT 'orders_customer' as relation, c_custkey as key
          FROM customer
          UNION ALL SELECT 'lineitem_orders', o_orderkey FROM orders
          UNION ALL SELECT 'lineitem_part', p_partkey FROM part
          UNION ALL SELECT 'lineitem_supplier', s_suppkey FROM supplier
          UNION ALL SELECT 'customer_nation', n_nationkey FROM nation),
        pd AS (SELECT DISTINCT relation, key FROM p),
        fc AS (SELECT f.relation,
                 cast(count(*) as bigint) as n_fk_rows,
                 cast(sum(CASE WHEN f.key IS NULL THEN 1 ELSE 0 END)
                   as bigint) as n_null_fk,
                 cast(sum(CASE WHEN f.key IS NOT NULL
                     AND pd.key IS NULL THEN 1 ELSE 0 END)
                   as bigint) as n_orphan_rows
               FROM f LEFT JOIN pd ON f.relation = pd.relation
                 AND f.key = pd.key
               GROUP BY 1),
        rf AS (SELECT DISTINCT relation, key FROM f
               WHERE key IS NOT NULL),
        pc AS (SELECT p.relation,
                 cast(count(*) as bigint) as n_pk_rows,
                 cast(sum(CASE WHEN rf.key IS NULL THEN 1 ELSE 0 END)
                   as bigint) as n_unreferenced_pk
               FROM p LEFT JOIN rf ON p.relation = rf.relation
                 AND p.key = rf.key
               GROUP BY 1)
        SELECT fc.relation, n_fk_rows, n_null_fk, n_orphan_rows,
          n_orphan_rows * 1000000 // n_fk_rows as orphan_ppm,
          n_pk_rows, n_unreferenced_pk
        FROM fc JOIN pc ON fc.relation = pc.relation"""

  /** Mirrors Expectations.freshnessAudit on events (30 min
    * threshold). */
  val freshness_audit: String = """
        WITH a AS (SELECT event_type,
            cast(count(*) as bigint) as n_events,
            cast(max(epoch_us(ts)) as bigint) as max_ts_us
          FROM events GROUP BY 1)
        SELECT event_type, n_events, max_ts_us,
          cast((SELECT max(max_ts_us) FROM a) - max_ts_us as bigint)
            as lag_us,
          ((SELECT max(max_ts_us) FROM a) - max_ts_us) > 1800000000
            as stale
        FROM a"""

  /** Mirrors the histogram-quantile readout (Profile.histQuantiles
    * over merged stream shards): exact equi-width bin counts, integer
    * ceil selection, one exact power-of-two multiply for bin_lo. */
  val stream_quantiles: String = """
        WITH h AS (SELECT event_type,
            cast(floor(value / 4.0) as bigint) as bin,
            cast(count(*) as bigint) as cnt
          FROM events GROUP BY 1, 2),
        c AS (SELECT *,
            cast(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin)
              as bigint) as cum,
            cast(sum(cnt) OVER (PARTITION BY event_type)
              as bigint) as n
          FROM h),
        q AS (SELECT unnest(cast([250000, 500000, 750000, 900000,
            990000] as bigint[])) as q_ppm)
        SELECT c.event_type, q.q_ppm, c.n,
          (q.q_ppm * c.n + 999999) // 1000000 as k,
          c.bin, cast(c.bin as double) * 4.0 as bin_lo
        FROM c, q
        WHERE c.cum >= (q.q_ppm * c.n + 999999) // 1000000
          AND c.cum - c.cnt < (q.q_ppm * c.n + 999999) // 1000000"""

  val join_size_estimate: String = """
        WITH c AS (SELECT l_partkey, cast(count(*) as bigint) as cnt
                   FROM lineitem GROUP BY 1),
        r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, l_partkey)
                as key_rank FROM c),
        h AS (SELECT cast(count(*) as bigint) as n_hh,
                cast(coalesce(sum(cnt), 0) as bigint) as hh_rows,
                cast(coalesce(sum(cnt * cnt), 0) as bigint) as hh_pairs
              FROM r WHERE key_rank <= 50),
        t AS (SELECT cast(count(*) as bigint) as n_keys,
                cast(sum(cnt) as bigint) as n_rows,
                cast(sum(cnt * cnt) as bigint) as actual_pairs FROM c),
        e AS (SELECT n_rows, n_keys, n_hh, actual_pairs,
                cast(hh_pairs + CASE WHEN n_keys > n_hh THEN
                  (n_rows - hh_rows) % (n_keys - n_hh)
                    * ((n_rows - hh_rows) // (n_keys - n_hh) + 1)
                    * ((n_rows - hh_rows) // (n_keys - n_hh) + 1)
                  + (n_keys - n_hh - (n_rows - hh_rows) % (n_keys - n_hh))
                    * ((n_rows - hh_rows) // (n_keys - n_hh))
                    * ((n_rows - hh_rows) // (n_keys - n_hh))
                ELSE 0 END as bigint) as est_pairs
              FROM t, h)
        SELECT n_rows, n_keys, n_hh, actual_pairs, est_pairs,
          abs(est_pairs - actual_pairs) * 1000000 // actual_pairs
            as err_ppm
        FROM e"""

  val q1_pricing: String = s"""
        SELECT l_returnflag, l_linestatus,
          cast(sum(cast(l_quantity as decimal(12,2))) as double) as sum_qty,
          cast(sum(cast(l_extendedprice as decimal(12,2))) as double) as sum_base_price,
          cast(sum($revSql) as double) as sum_disc_price,
          cast(sum($revSql * (cast(1 as decimal(4,2)) + cast(l_tax as decimal(4,2)))) as double) as sum_charge,
          count(*) as count_order,
          cast(sum(cast(l_quantity as decimal(12,2))) as double) / count(*) as avg_qty,
          cast(sum(cast(l_extendedprice as decimal(12,2))) as double) / count(*) as avg_price
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus"""

  val rank_topk: String = s"""
        WITH spend AS (
          SELECT c_custkey, c_name, c_nationkey,
            cast(sum($revSql) as double) as total_spend
          FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2, 3)
        SELECT nation, customer_name, customer_spend, customer_rank FROM (
          SELECT n_name as nation, c_name as customer_name,
            total_spend as customer_spend,
            rank() OVER (PARTITION BY n_name
                         ORDER BY total_spend DESC, c_custkey) as customer_rank
          FROM spend JOIN nation ON c_nationkey = n_nationkey)
        WHERE customer_rank <= 3"""

  val merge_upsert: String = s"""
        WITH e AS ($eventsNs),
        base AS (SELECT event_id, ts, user_id, event_type, value, props FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) as rn
          FROM e WHERE event_id % 2 = 0) WHERE rn = 1),
        upd AS (SELECT event_id, ts, user_id, event_type, value, props FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) as rn
          FROM e WHERE event_id % 2 = 1) WHERE rn = 1)
        SELECT b.* FROM base b
          WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.user_id = b.user_id)
        UNION ALL
        SELECT * FROM upd"""

  val stream_curation: String = s"""
        WITH toks AS (SELECT doc_id, text, string_split(text, ' ') as toks
                      FROM documents),
        ex AS (SELECT doc_id, unnest(toks) as t FROM toks),
        w AS (SELECT doc_id,
                cast(sum((('0x' || substr(sha256(t), 1, 15))::BIGINT % 2001)
                         - 1000) as bigint) as score_raw
              FROM ex GROUP BY 1),
        scored AS (
          SELECT k.text, cast(len(k.toks) as bigint) as n_tokens,
            cast(w.score_raw as double) / (len(k.toks) * 1000.0) as clf_score
          FROM toks k JOIN w USING (doc_id))
        SELECT DISTINCT
          ('0x' || substr(sha256(text), 1, 15))::BIGINT as text_hash,
          n_tokens, clf_score
        FROM scored WHERE clf_score > 0.0"""

  val stream_profile: String = s"""
        WITH e AS ($eventsNs)
        SELECT 'event_id' as col_name, count(*) as n_rows,
          count(*) - count(event_id) as n_nulls,
          cast(min(event_id) as double) as min_num,
          cast(max(event_id) as double) as max_num,
          cast(NULL as varchar) as min_str,
          cast(NULL as varchar) as max_str
        FROM e
        UNION ALL SELECT 'ts', count(*), count(*) - count(ts),
          cast(min(ts) as double), cast(max(ts) as double),
          cast(NULL as varchar), cast(NULL as varchar) FROM e
        UNION ALL SELECT 'user_id', count(*), count(*) - count(user_id),
          cast(min(user_id) as double), cast(max(user_id) as double),
          cast(NULL as varchar), cast(NULL as varchar) FROM e
        UNION ALL SELECT 'event_type', count(*),
          count(*) - count(event_type),
          cast(NULL as double), cast(NULL as double),
          min(event_type), max(event_type) FROM e
        UNION ALL SELECT 'value', count(*), count(*) - count(value),
          min(value), max(value),
          cast(NULL as varchar), cast(NULL as varchar) FROM e"""

  val curation_pipeline: String = s"""
        WITH lang AS (
          SELECT doc_id, CASE $langCascadeSql END as predicted_lang
          FROM (SELECT doc_id, lang, $langScoresSql FROM documents)),
        q AS (SELECT doc_id,
          least(cast(len(string_split(text, ' ')) as double) / 100.0, 1.0)
            * (1.0 - cast(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) as double)
                / cast(length(text) as double))
            * least(cast(len(list_filter(string_split(text, ' '),
                t -> t in ('the','a','of','and','to','in','is','it'))) as double)
                / cast(len(string_split(text, ' ')) as double) * 4.0, 1.0)
            as quality_score
          FROM documents),
        rep AS (SELECT doc_id,
            (cast(len(bg) as double) - len(list_distinct(bg)))
              / cast(len(bg) as double) as dup_bigram_frac
          FROM (SELECT doc_id,
              CASE WHEN len(toks) >= 2
                THEN list_transform(range(len(toks) - 1),
                       i -> array_to_string(toks[i+1:i+2], ' '))
                ELSE [array_to_string(toks, ' ')] END as bg
            FROM (SELECT doc_id, string_split(text, ' ') as toks
                  FROM documents))),
        canon AS (SELECT min(doc_id) as doc_id FROM documents
                  GROUP BY sha256(text))
        SELECT l.doc_id, predicted_lang, quality_score, dup_bigram_frac
        FROM lang l JOIN q USING (doc_id) JOIN rep USING (doc_id)
        WHERE predicted_lang = 'en' AND quality_score >= 0.1
          AND dup_bigram_frac <= 0.05
          AND EXISTS (SELECT 1 FROM canon c WHERE c.doc_id = l.doc_id)"""

  val customer_value_tiles: String = s"""
        WITH spend AS (
          SELECT c_custkey, c_name, c_nationkey,
            cast(sum($revSql) as double) as total_spend
          FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2, 3)
        SELECT c_custkey, c_nationkey, total_spend,
          ntile(4) OVER w as value_quartile,
          percent_rank() OVER w as pct_rank
        FROM spend
        WINDOW w AS (PARTITION BY c_nationkey
                     ORDER BY total_spend DESC, c_custkey)"""

  val running_revenue: String = s"""
        WITH rev AS (
          SELECT o_custkey, o_orderdate, o_orderkey,
            sum($revSql) as order_rev
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2, 3)
        SELECT o_custkey, o_orderkey,
          cast(order_rev as double) as order_revenue,
          cast(sum(order_rev) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS UNBOUNDED PRECEDING) as double) as cum_revenue
        FROM rev"""

  val asof_join: String = s"""
        WITH e AS ($eventsNs),
        clicks AS (SELECT event_id, user_id, ts, value FROM e
                   WHERE event_type = 'click'),
        purchases AS (SELECT user_id, ts, max(event_id) as event_id,
                        max(value) as value
                      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT c.event_id, c.user_id, c.ts, c.value,
          p.event_id as matched_event_id, p.value as matched_value
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts"""

  val asof_join_forward: String = s"""
        WITH e AS ($eventsNs),
        clicks AS (SELECT event_id, user_id, ts, value FROM e
                   WHERE event_type = 'click'),
        purchases AS (SELECT user_id, ts, max(event_id) as event_id,
                        max(value) as value
                      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT c.event_id, c.user_id, c.ts, c.value,
          p.event_id as matched_event_id, p.value as matched_value
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts <= p.ts"""

  val asof_join_tolerance: String = s"""
        WITH e AS ($eventsNs),
        clicks AS (SELECT event_id, user_id, ts, value FROM e
                   WHERE event_type = 'click'),
        purchases AS (SELECT user_id, ts, max(event_id) as event_id,
                        max(value) as value
                      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT c.event_id, c.user_id, c.ts, c.value,
          CASE WHEN p.ts >= c.ts - 600000000 THEN p.event_id END
            as matched_event_id,
          CASE WHEN p.ts >= c.ts - 600000000 THEN p.value END
            as matched_value
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts"""

  val interval_join: String = s"""
        WITH ${sessionCte("browse_", "event_type in ('click','view')")},
        ${sessionCte("buy_", "event_type in ('purchase','signup')")}
        SELECT b.user_id, b.browse_seq, b.browse_start, b.browse_end,
          y.buy_seq, y.buy_start, y.buy_end,
          least(b.browse_end, y.buy_end) -
            greatest(b.browse_start, y.buy_start) as overlap_us
        FROM browse_sessions b JOIN buy_sessions y
          ON b.user_id = y.user_id
         AND b.browse_start <= y.buy_end
         AND y.buy_start <= b.browse_end"""

  val dp_release: String = s"""
        WITH f AS (SELECT c_nationkey,
                (c_acctbal < 0) as truth,
                (${TextOracleSql.Sha60.format("'dp:' || c_custkey")} % 4
                  = 0) as flip
              FROM customer)
        SELECT c_nationkey, count(*) as n,
          cast(sum(cast(truth as bigint)) as bigint) as n_true,
          cast(sum(cast(truth <> flip as bigint)) as bigint) as n_reported,
          (cast(sum(cast(truth <> flip as bigint)) as double)
            - cast(count(*) as double) * 0.25) / 0.5 as n_estimated
        FROM f GROUP BY 1"""

  val sessionize: String = s"""
        WITH e AS (SELECT user_id, epoch_us(ts) as ts, event_id FROM events),
        marked AS (
          SELECT user_id, ts, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > 1800000000 THEN 1
                 ELSE 0 END as new_session
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts,
            sum(new_session) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) as session_seq
          FROM marked)
        SELECT user_id, cast(session_seq as bigint) as session_seq,
          min(ts) as session_start,
          max(ts) as session_end, cast(count(*) as int) as n_events
        FROM sess GROUP BY 1, 2"""

  val session_window_agg: String = s"""
        WITH e AS (SELECT user_id, epoch_us(ts) as ts, event_id FROM events),
        marked AS (
          SELECT user_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= 1800000000 THEN 1
                 ELSE 0 END as new_session
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts,
            sum(new_session) OVER (PARTITION BY user_id
              ORDER BY ts ROWS UNBOUNDED PRECEDING) as session_seq
          FROM marked)
        SELECT user_id, min(ts) as session_start,
          max(ts) + 1800000000 as session_end,
          cast(count(*) as int) as n_events
        FROM sess GROUP BY user_id, session_seq"""

  val versioned_changes: String = s"""
        WITH e AS ($eventsNs),
        base AS (SELECT event_id, ts, user_id, event_type, value, props FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) as rn
          FROM e WHERE event_id % 2 = 0) WHERE rn = 1),
        upd AS (SELECT event_id, ts, user_id, event_type, value, props FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) as rn
          FROM e WHERE event_id % 2 = 1) WHERE rn = 1),
        v1 AS (
          SELECT b.* FROM base b
            WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.user_id = b.user_id)
          UNION ALL
          SELECT * FROM upd)
        SELECT *, 'insert' as _change_type FROM
          (SELECT * FROM v1 EXCEPT ALL SELECT * FROM base)
        UNION ALL
        SELECT *, 'delete' as _change_type FROM
          (SELECT * FROM base EXCEPT ALL SELECT * FROM v1)"""

  val dsir_mix_report: String = s"""
        WITH scored AS (
          SELECT * FROM (${TextOracleSql.dsirResampleSql(
            "lang", "en", 1024, "dsir")})),
        pl AS (SELECT lang, cast(count(*) as bigint) as n_docs,
            cast(sum(CASE WHEN kept THEN 1 ELSE 0 END) as bigint)
              as n_kept
          FROM scored GROUP BY 1),
        tot AS (SELECT cast(sum(n_docs) as bigint) as t_docs,
            greatest(cast(sum(n_kept) as bigint), 1) as t_kept
          FROM pl)
        SELECT lang, n_docs, n_kept,
          n_kept * 1000000 // n_docs as kept_ppm,
          n_docs * 1000000 // t_docs as share_before_ppm,
          n_kept * 1000000 // t_kept as share_after_ppm
        FROM pl, tot"""

  val stream_watermark_drop: String = s"""
        WITH md AS (SELECT greatest(1, (count(*) + 1999) // 2000) as m
          FROM events),
        e AS (SELECT event_id, epoch_us(ts) as ts,
            ${TextOracleSql.Sha60.format(
              "'arr:' || cast(event_id as varchar)")} as arr
          FROM events, md
          WHERE ${TextOracleSql.Sha60.format(
            "'wmd:' || cast(event_id as varchar)")} % md.m = 0),
        r AS (SELECT *, row_number() OVER (ORDER BY arr, event_id) as rn,
                count(*) OVER () as n FROM e),
        b AS (SELECT *,
                (rn - 1) // greatest((n + 3) // 4, 1) as batch FROM r),
        mx AS (SELECT batch, max(ts) as mt FROM b GROUP BY 1),
        wmb AS (SELECT batch, max(mt) OVER (ORDER BY batch
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            - 86400000000 as wm
          FROM mx),
        acc AS (SELECT b.ts - b.ts % 3600000000 as ws
          FROM b JOIN wmb USING (batch)
          WHERE wm IS NULL
            OR b.ts - b.ts % 3600000000 + 3600000000 > wm)
        SELECT ws as window_start_us, cast(count(*) as bigint) as n
        FROM acc GROUP BY 1"""

  val training_epoch: String = s"""
        WITH lang AS (
          SELECT doc_id, CASE $langCascadeSql END as predicted_lang
          FROM (SELECT doc_id, lang, $langScoresSql FROM documents)),
        q AS (SELECT doc_id,
          least(cast(len(string_split(text, ' ')) as double) / 100.0, 1.0)
            * (1.0 - cast(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) as double)
                / cast(length(text) as double))
            * least(cast(len(list_filter(string_split(text, ' '),
                t -> t in ('the','a','of','and','to','in','is','it'))) as double)
                / cast(len(string_split(text, ' ')) as double) * 4.0, 1.0)
            as quality_score
          FROM documents),
        rep AS (SELECT doc_id,
            (cast(len(bg) as double) - len(list_distinct(bg)))
              / cast(len(bg) as double) as dup_bigram_frac
          FROM (SELECT doc_id,
              CASE WHEN len(toks) >= 2
                THEN list_transform(range(len(toks) - 1),
                       i -> array_to_string(toks[i+1:i+2], ' '))
                ELSE [array_to_string(toks, ' ')] END as bg
            FROM (SELECT doc_id, string_split(text, ' ') as toks
                  FROM documents))),
        canon AS (SELECT min(doc_id) as doc_id FROM documents
                  GROUP BY sha256(text)),
        surv AS (
          SELECT l.doc_id
          FROM lang l JOIN q USING (doc_id) JOIN rep USING (doc_id)
          WHERE predicted_lang = 'en' AND quality_score >= 0.1
            AND dup_bigram_frac <= 0.05
            AND EXISTS (SELECT 1 FROM canon c WHERE c.doc_id = l.doc_id)),
        t AS (SELECT d.doc_id,
                cast(len(string_split(d.text, ' ')) as bigint) as n_tokens
              FROM documents d JOIN surv USING (doc_id)),
        c AS (SELECT doc_id, n_tokens,
                cast(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  as bigint) as token_start
              FROM t)
        SELECT doc_id, n_tokens, token_start,
          token_start // 2048 as seq_id,
          token_start % 2048 as seq_offset
        FROM c"""

  val watermark_curve: String = s"""
        WITH e AS (SELECT event_id, event_type, epoch_us(ts) as ts,
            ${TextOracleSql.Sha60.format(
              "'arr:' || cast(event_id as varchar)")} as arr
          FROM events),
        w AS (SELECT *, max(ts) OVER (ORDER BY arr, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) as wm
          FROM e),
        dl AS (SELECT * FROM (VALUES (3600000000), (86400000000),
            (604800000000)) AS t(delay_us)),
        f AS (SELECT event_type, delay_us,
            CASE WHEN wm IS NOT NULL AND ts < wm - delay_us
              THEN 1 ELSE 0 END as late,
            CASE WHEN wm IS NOT NULL AND ts < wm - delay_us
              THEN wm - delay_us - ts ELSE 0 END as lateness
          FROM w, dl)
        SELECT event_type, cast(delay_us as bigint) as delay_us,
          cast(count(*) as bigint) as n_events,
          cast(sum(late) as bigint) as n_late,
          cast(sum(late) * 1000000 // count(*) as bigint) as late_ppm,
          cast(max(lateness) as bigint) as max_late_us
        FROM f GROUP BY 1, 2"""

  val langid_confusion: String = s"""
        WITH pred AS (
          SELECT doc_id, lang, CASE $langCascadeSql END as predicted_lang
          FROM (SELECT doc_id, lang, $langScoresSql FROM documents)),
        cells AS (
          SELECT lang, predicted_lang, cast(count(*) as bigint) as n_docs
          FROM pred GROUP BY 1, 2)
        SELECT lang, predicted_lang, n_docs,
          cast(n_docs * 1000000 // sum(n_docs) OVER (PARTITION BY lang)
            as bigint) as share_of_true_ppm,
          lang = predicted_lang as is_correct
        FROM cells"""

  val session_stats: String = s"""
        WITH e AS (SELECT user_id, epoch_us(ts) as ts, event_id
                   FROM events),
        marked AS (
          SELECT user_id, ts, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > 1800000000 THEN 1
                 ELSE 0 END as new_session
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts,
            sum(new_session) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
              as session_seq
          FROM marked),
        islands AS (
          SELECT user_id, session_seq, min(ts) as session_start,
            max(ts) as session_end, count(*) as n_ev
          FROM sess GROUP BY 1, 2)
        SELECT cast(n_ev as bigint) as n_events,
          cast(count(*) as bigint) as n_sessions,
          cast(sum(session_end - session_start) as bigint)
            as total_duration_us,
          cast(sum(session_end - session_start) as double)
            / cast(count(*) as double) as mean_duration_us
        FROM islands GROUP BY 1"""

  val late_arrival_audit: String = s"""
        WITH e AS (SELECT event_id, event_type, epoch_us(ts) as ts,
            ${TextOracleSql.Sha60.format(
              "'arr:' || cast(event_id as varchar)")} as arr
          FROM events),
        w AS (SELECT *, max(ts) OVER (ORDER BY arr, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) as wm
          FROM e),
        f AS (SELECT event_type,
            CASE WHEN wm IS NOT NULL AND ts < wm - 604800000000
              THEN 1 ELSE 0 END as late,
            CASE WHEN wm IS NOT NULL AND ts < wm - 604800000000
              THEN wm - 604800000000 - ts ELSE 0 END as lateness
          FROM w)
        SELECT event_type, cast(count(*) as bigint) as n_events,
          cast(sum(late) as bigint) as n_late,
          cast(sum(late) * 1000000 // count(*) as bigint) as late_ppm,
          cast(max(lateness) as bigint) as max_late_us
        FROM f GROUP BY 1"""

  val ab_test: String = s"""
        WITH pu AS (
          SELECT user_id,
            CASE WHEN sum(CASE WHEN event_type = 'purchase'
              THEN 1 ELSE 0 END) >= 14 THEN 1 ELSE 0 END as conv,
            ${TextOracleSql.Sha60.format(
              "'ab:' || cast(user_id as varchar)")} % 2 as v
          FROM events GROUP BY 1),
        c AS (SELECT
            cast(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) as bigint)
              as n_control,
            cast(sum(CASE WHEN v = 0 THEN conv ELSE 0 END) as bigint)
              as conv_control,
            cast(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) as bigint)
              as n_treat,
            cast(sum(CASE WHEN v = 1 THEN conv ELSE 0 END) as bigint)
              as conv_treat
          FROM pu)
        SELECT n_control, conv_control, n_treat, conv_treat,
          CASE WHEN n_control > 0
            THEN conv_control * 1000000 // n_control END
            as conv_control_ppm,
          CASE WHEN n_treat > 0
            THEN conv_treat * 1000000 // n_treat END as conv_treat_ppm,
          CASE WHEN n_control > 0 AND n_treat > 0
            THEN conv_treat * 1000000 // n_treat
              - conv_control * 1000000 // n_control END as lift_ppm,
          CASE WHEN n_control = 0 OR n_treat = 0
            OR conv_treat + conv_control = 0
            OR conv_treat + conv_control = n_treat + n_control THEN NULL
          ELSE
            ((cast(conv_treat as double) / cast(n_treat as double)
              - cast(conv_control as double) / cast(n_control as double))
             * (cast(conv_treat as double) / cast(n_treat as double)
              - cast(conv_control as double) / cast(n_control as double)))
            / (((cast(conv_treat + conv_control as double)
                 / cast(n_treat + n_control as double))
                * (1.0 - cast(conv_treat + conv_control as double)
                   / cast(n_treat + n_control as double))
                * cast(n_treat + n_control as double))
               / cast(n_treat * n_control as double))
          END as z_squared
        FROM c"""

  /** Three-way branch merge: mirrors VersionedTable.threeWayMerge's
    * null-safe image comparisons field by field (presence flag +
    * IS NOT DISTINCT FROM per value column ≡ Spark's struct <=>,
    * keys being non-null). */
  private[graft] val branch_merge: String = """
        WITH base AS (
          SELECT c_custkey, c_name, c_acctbal FROM customer),
        ours AS (
          SELECT c_custkey, c_name,
            CASE WHEN c_custkey % 4 = 0 THEN c_acctbal + 10.0
                 ELSE c_acctbal END as c_acctbal
          FROM base WHERE c_custkey % 7 <> 1
          UNION ALL SELECT 3000001, 'branch-ours', 111.0),
        theirs AS (
          SELECT c_custkey, c_name,
            CASE WHEN c_custkey % 6 = 0 THEN c_acctbal + 20.0
                 ELSE c_acctbal END as c_acctbal
          FROM base WHERE c_custkey % 9 <> 2
          UNION ALL SELECT 3000002, 'branch-theirs', 222.0),
        k AS (
          SELECT c_custkey FROM base
          UNION SELECT c_custkey FROM ours
          UNION SELECT c_custkey FROM theirs),
        j AS (
          SELECT k.c_custkey,
            b.c_custkey IS NOT NULL as bp, o.c_custkey IS NOT NULL as op,
            t.c_custkey IS NOT NULL as tp,
            b.c_name as bn, b.c_acctbal as bb,
            o.c_name as o_n, o.c_acctbal as ob,
            t.c_name as tn, t.c_acctbal as tb
          FROM k
          LEFT JOIN base b USING (c_custkey)
          LEFT JOIN ours o USING (c_custkey)
          LEFT JOIN theirs t USING (c_custkey)),
        a AS (
          SELECT *,
            (op = bp AND (NOT op OR (o_n IS NOT DISTINCT FROM bn
              AND ob IS NOT DISTINCT FROM bb))) as eq_ob,
            (tp = bp AND (NOT tp OR (tn IS NOT DISTINCT FROM bn
              AND tb IS NOT DISTINCT FROM bb))) as eq_tb,
            (op = tp AND (NOT op OR (o_n IS NOT DISTINCT FROM tn
              AND ob IS NOT DISTINCT FROM tb))) as eq_ot
          FROM j),
        r AS (
          SELECT c_custkey,
            CASE WHEN eq_ob AND eq_tb THEN 'unchanged'
                 WHEN eq_ot THEN 'both'
                 WHEN eq_ob THEN 'theirs'
                 WHEN eq_tb THEN 'ours'
                 ELSE 'conflict' END as action,
            bn, bb, o_n, ob, tn, tb
          FROM a)
        SELECT c_custkey, action,
          CASE action WHEN 'conflict' THEN NULL WHEN 'theirs' THEN tn
               WHEN 'unchanged' THEN bn ELSE o_n END as c_name,
          CASE action WHEN 'conflict' THEN NULL WHEN 'theirs' THEN tb
               WHEN 'unchanged' THEN bb ELSE ob END as c_acctbal,
          action = 'conflict' as is_conflict
        FROM r"""

  /** Quality-score calibration: mirrors TextAnalysis
    * .qualityCalibration — the text_quality score chain binned by
    * floor(score·10), the text_repetition bigram gate, and the
    * dedup_exact content-hash grouping, folded to per-bin integer
    * rates. */
  private[graft] val quality_calibration: String = """
        WITH qs AS (
          SELECT doc_id,
            least(cast(floor(
              (least(cast(len(string_split(text, ' ')) as double) / 100.0,
                     1.0)
               * (1.0 - cast(len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))
                    as double) / cast(length(text) as double))
               * least(cast(len(list_filter(string_split(text, ' '),
                     t -> t in ('the','a','of','and','to','in','is','it')))
                    as double)
                   / cast(len(string_split(text, ' ')) as double) * 4.0,
                   1.0)) * 10.0) as bigint), 9) as score_bin
          FROM documents),
        bgr AS (
          SELECT doc_id,
            CASE WHEN len(toks) >= 2
              THEN list_transform(range(len(toks) - 1),
                     i -> array_to_string(toks[i+1:i+2], ' '))
              ELSE [array_to_string(toks, ' ')] END as bg
          FROM (SELECT doc_id, string_split(text, ' ') as toks
                FROM documents)),
        rep AS (
          SELECT doc_id,
            cast((cast(len(bg) as double) - len(list_distinct(bg)))
              / cast(len(bg) as double) > 0.2 as bigint) as is_rep
          FROM bgr),
        hh AS (SELECT doc_id, sha256(text) as h FROM documents),
        sz AS (SELECT h, count(*) as n_copies FROM hh GROUP BY 1),
        dup AS (
          SELECT doc_id, cast(sz.n_copies > 1 as bigint) as is_dup
          FROM hh JOIN sz USING (h)),
        j AS (
          SELECT qs.score_bin, dup.is_dup, rep.is_rep
          FROM qs JOIN dup USING (doc_id) JOIN rep USING (doc_id))
        SELECT score_bin, count(*) as n_docs,
          cast(sum(is_dup) as bigint) as n_dup,
          cast(sum(is_rep) as bigint) as n_repetitive,
          (1000000 * cast(sum(is_dup) as bigint)) // count(*) as dup_ppm,
          (1000000 * cast(sum(is_rep) as bigint)) // count(*)
            as repetitive_ppm
        FROM j GROUP BY 1"""

  /** Hourly-series autocorrelation: mirrors TimeSeries.autocorr —
    * zero-filled per-type hour grid, dev = n·x − S as decimal(19,0)
    * (19×12 keeps DuckDB on hugeint), exact decimal(38,0) sums, one
    * IEEE division for acf. */
  private[graft] val ts_autocorr: String = """
        WITH e AS (SELECT event_type, epoch_us(ts) as ts FROM events),
        hourly AS (
          SELECT event_type, ts - ts % 3600000000 as hour_us,
            count(*) as n_raw
          FROM e GROUP BY 1, 2),
        bounds AS (
          SELECT event_type,
            min(ts) - min(ts) % 3600000000 as lo,
            max(ts) - max(ts) % 3600000000 as hi
          FROM e GROUP BY 1),
        grid AS (
          SELECT event_type,
            unnest(generate_series(lo, hi, 3600000000)) as hour_us
          FROM bounds),
        s AS (
          SELECT g.event_type, g.hour_us,
            cast(coalesce(h.n_raw, 0) as bigint) as x
          FROM grid g LEFT JOIN hourly h
            ON h.event_type = g.event_type AND h.hour_us = g.hour_us),
        st AS (
          SELECT event_type, cast(count(*) as bigint) as n,
            cast(sum(x) as bigint) as sx
          FROM s GROUP BY 1),
        d AS (
          SELECT s.event_type, s.hour_us,
            cast(cast(st.n as decimal(19,0)) * cast(s.x as decimal(12,0))
                 - cast(st.sx as decimal(19,0)) as decimal(19,0)) as dev
          FROM s JOIN st ON st.event_type = s.event_type),
        lags AS (SELECT unnest(generate_series(1, 24)) as lag),
        num AS (
          SELECT a.event_type, l.lag, cast(count(*) as bigint) as n_terms,
            cast(sum(a.dev * b.dev) as decimal(38,0)) as acf_num
          FROM d a CROSS JOIN lags l
          JOIN d b ON b.event_type = a.event_type
                  AND b.hour_us = a.hour_us + l.lag * 3600000000
          GROUP BY 1, 2),
        den AS (
          SELECT event_type, cast(sum(dev * dev) as decimal(38,0))
            as acf_den
          FROM d GROUP BY 1)
        SELECT n.event_type, cast(n.lag as bigint) as lag, n.n_terms,
          cast(n.acf_num as varchar) as acf_num,
          cast(d2.acf_den as varchar) as acf_den,
          cast(n.acf_num as double) / cast(d2.acf_den as double) as acf
        FROM num n JOIN den d2 ON d2.event_type = n.event_type"""

  /** Debounce audit (mirrors TimeSeries.debounce): one lag window per
    * (user, type), gap vs the immediately preceding event, 10-minute
    * threshold. */
  private[graft] val event_debounce: String = s"""
        WITH e AS ($eventsNs),
        w AS (SELECT event_id, user_id, event_type, ts,
                lag(ts) OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) as prev_ts
              FROM e)
        SELECT event_id, user_id, event_type, ts, prev_ts,
          ts - prev_ts as gap_us,
          coalesce(ts - prev_ts <= 600000000, false) as is_bounce
        FROM w"""

  /** Pairwise lead/lag cross-correlation (mirrors
    * TimeSeries.crosscorr): same per-type dense-grid dev series as
    * ts_autocorr, hash-joined on the shifted hour per (pair, lag);
    * exact decimal sums published as digit strings, xcorr as the one
    * fixed √·√ IEEE chain with a constant-series NULL guard. */
  private[graft] val ts_crosscorr: String = """
        WITH e AS (SELECT event_type, epoch_us(ts) as ts FROM events),
        hourly AS (
          SELECT event_type, ts - ts % 3600000000 as hour_us,
            count(*) as n_raw
          FROM e GROUP BY 1, 2),
        bounds AS (
          SELECT event_type,
            min(ts) - min(ts) % 3600000000 as lo,
            max(ts) - max(ts) % 3600000000 as hi
          FROM e GROUP BY 1),
        grid AS (
          SELECT event_type,
            unnest(generate_series(lo, hi, 3600000000)) as hour_us
          FROM bounds),
        s AS (
          SELECT g.event_type, g.hour_us,
            cast(coalesce(h.n_raw, 0) as bigint) as x
          FROM grid g LEFT JOIN hourly h
            ON h.event_type = g.event_type AND h.hour_us = g.hour_us),
        st AS (
          SELECT event_type, cast(count(*) as bigint) as n,
            cast(sum(x) as bigint) as sx
          FROM s GROUP BY 1),
        d AS (
          SELECT s.event_type, s.hour_us,
            cast(cast(st.n as decimal(19,0)) * cast(s.x as decimal(12,0))
                 - cast(st.sx as decimal(19,0)) as decimal(19,0)) as dev
          FROM s JOIN st ON st.event_type = s.event_type),
        den AS (
          SELECT event_type, cast(sum(dev * dev) as decimal(38,0)) as den
          FROM d GROUP BY 1),
        lags AS (SELECT unnest(generate_series(-12, 12)) as lag),
        num AS (
          SELECT a.event_type as type_a, b.event_type as type_b, l.lag,
            cast(count(*) as bigint) as n_terms,
            cast(sum(a.dev * b.dev) as decimal(38,0)) as xcorr_num
          FROM d a CROSS JOIN lags l
          JOIN d b ON b.hour_us = a.hour_us + l.lag * 3600000000
                  AND a.event_type < b.event_type
          GROUP BY 1, 2, 3)
        SELECT n.type_a, n.type_b, cast(n.lag as bigint) as lag,
          n.n_terms,
          cast(n.xcorr_num as varchar) as xcorr_num,
          cast(da.den as varchar) as den_a,
          cast(db.den as varchar) as den_b,
          CASE WHEN da.den > 0 AND db.den > 0 THEN
            cast(n.xcorr_num as double) /
              (sqrt(cast(da.den as double)) * sqrt(cast(db.den as double)))
          END as xcorr
        FROM num n JOIN den da ON da.event_type = n.type_a
                   JOIN den db ON db.event_type = n.type_b"""

  /** Chi-square independence audit: mirrors Profile.chi2Independence
    * width for width (19×12 decimal products keep DuckDB on its
    * hugeint kernel; final decimal(38,0) casts align both engines'
    * result types; the per-cell χ² is the same two-cast/mul/div IEEE
    * chain). */
  private[graft] val chi2_drift: String = """
        WITH cells AS (
          SELECT source, lang, count(*) as observed
          FROM documents GROUP BY 1, 2),
        rt AS (SELECT source, cast(sum(observed) as bigint) as row_total
               FROM cells GROUP BY 1),
        ct AS (SELECT lang, cast(sum(observed) as bigint) as col_total
               FROM cells GROUP BY 1),
        tot AS (SELECT cast(sum(observed) as bigint) as n_total FROM cells),
        f AS (
          SELECT rt.source, ct.lang,
            cast(coalesce(c.observed, 0) as bigint) as observed,
            rt.row_total, ct.col_total, tot.n_total
          FROM rt CROSS JOIN ct CROSS JOIN tot
          LEFT JOIN cells c ON c.source = rt.source AND c.lang = ct.lang),
        d AS (
          SELECT *,
            cast(cast(n_total as decimal(19,0))
                   * cast(observed as decimal(12,0)) -
                 cast(row_total as decimal(19,0))
                   * cast(col_total as decimal(12,0))
                 as decimal(38,0)) as dev_num,
            cast(cast(cast(n_total as decimal(19,0))
                        * cast(row_total as decimal(12,0))
                      as decimal(26,0))
                   * cast(col_total as decimal(12,0))
                 as decimal(38,0)) as dev_den
          FROM f)
        SELECT source, lang, observed, row_total, col_total, n_total,
          cast(dev_num as varchar) as dev_num,
          cast(dev_den as varchar) as dev_den,
          (cast(dev_num as double) * cast(dev_num as double))
            / cast(dev_den as double) as cell_chi2,
          ((cast(dev_num as double) * cast(dev_num as double))
            / cast(dev_den as double)) > 6.635 as dependent_99
        FROM d"""

  /** Gopher rule battery: mirrors TextAnalysis.gopherRules counter by
    * counter — integer cross-multiplied thresholds, no float
    * division, so every boolean is bit-portable. */
  private[graft] val gopher_rules: String = """
        WITH c AS (
          SELECT doc_id,
            cast(len(string_split(text, ' ')) as bigint) as n_words,
            cast(list_sum(list_transform(string_split(text, ' '),
              x -> len(x))) as bigint) as word_chars,
            cast((len(text) - len(replace(text, '#', ''))) +
              (len(text) - len(replace(text, '…', ''))) +
              ((len(text) - len(replace(text, '...', ''))) // 3)
              as bigint) as n_symbols,
            cast(len(list_filter(string_split(text, ' '),
              x -> regexp_matches(x, '[A-Za-z]'))) as bigint)
              as n_alpha_words,
            cast(cast(list_contains(string_split(text, ' '), 'the') as int)
              + cast(list_contains(string_split(text, ' '), 'be') as int)
              + cast(list_contains(string_split(text, ' '), 'to') as int)
              + cast(list_contains(string_split(text, ' '), 'of') as int)
              + cast(list_contains(string_split(text, ' '), 'and') as int)
              + cast(list_contains(string_split(text, ' '), 'that') as int)
              + cast(list_contains(string_split(text, ' '), 'have') as int)
              + cast(list_contains(string_split(text, ' '), 'with') as int)
              as bigint) as n_stop_hits,
            cast(len(string_split(text, chr(10))) as bigint) as n_lines,
            cast(len(list_filter(string_split(text, chr(10)),
              x -> x LIKE '%...')) as bigint) as n_ellipsis_lines,
            cast(len(list_filter(string_split(text, chr(10)),
              x -> x LIKE '- %' OR x LIKE '* %' OR x LIKE '• %'))
              as bigint) as n_bullet_lines
          FROM documents)
        SELECT *,
          (r_word_count AND r_mean_word_len AND r_symbol_ratio AND
           r_alpha_words AND r_stopwords AND r_ellipsis_lines AND
           r_bullet_lines) as pass
        FROM (
          SELECT *,
            (n_words >= 50 AND n_words <= 100000) as r_word_count,
            (3 * n_words <= word_chars AND
             word_chars <= 10 * n_words) as r_mean_word_len,
            (10 * n_symbols <= n_words) as r_symbol_ratio,
            (5 * n_alpha_words >= 4 * n_words) as r_alpha_words,
            (n_stop_hits >= 2) as r_stopwords,
            (10 * n_ellipsis_lines <= 3 * n_lines) as r_ellipsis_lines,
            (10 * n_bullet_lines <= 9 * n_lines) as r_bullet_lines
          FROM c)"""

  /** DLT-shaped per-stage expectation metrics for the bronze→silver→
    * gold chain (mirrors Pipeline.run's event log). */
  val pipeline_event_log: String = {
    def cnt(seq: Int, flow: String, name: String, pred: String,
            from: String) =
      s"""SELECT cast($seq as int) as stage_seq, '$flow' as flow_name,
         '$name' as constraint_name,
         cast(sum(case when $pred then 1 else 0 end) as bigint) as passed_records,
         cast(sum(case when $pred then 0 else 1 end) as bigint) as failed_records
         FROM $from"""
    val silverPreds = Seq(
      ("value is non-negative", "value >= 0"),
      ("value within sane bound", "value <= 400"),
      ("event_type is known",
        "event_type in ('click','view','purchase','signup','error')"),
      ("no error events", "event_type <> 'error'"),
      ("user present", "user_id is not null"))
    s"""
        WITH e AS ($eventsNs),
        dedup AS (SELECT event_id, ts, user_id, event_type, value, props FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) as rn FROM e) WHERE rn = 1),
        silver AS (SELECT * FROM dedup
          WHERE value >= 0 AND value <= 400
            AND event_type in ('click','view','purchase','signup','error')
            AND event_type <> 'error' AND user_id is not null),
        gold AS (SELECT event_type, count(*) as n_events,
            cast(sum(cast(value as decimal(12,2))) as double) as total_value
          FROM silver GROUP BY 1)
        ${cnt(0, "bronze_events", "user present", "user_id is not null", "e")}
        UNION ALL
        ${cnt(0, "bronze_events", "props present", "props is not null", "e")}
        UNION ALL
        ${silverPreds.map { case (n, p) =>
        cnt(1, "silver_events", n, p, "dedup") }
      .mkString("\n        UNION ALL\n        ")}
        UNION ALL
        ${cnt(2, "gold_event_counts", "type has events", "n_events > 0", "gold")}
        UNION ALL
        ${cnt(2, "gold_event_counts", "total within bound",
        "total_value <= 10000000", "gold")}"""
  }

  /** Count-Min sketch audit (mirrors TextAnalysis.countMinAudit):
    * identical sha60 cell hashes, integer counters, min-over-rows
    * estimates — the sketch is SQL-replicable so the frame
    * hash-checks exactly. */
  val sketch_countmin: String = {
    val width = 64; val depth = 4
    val probes = Seq("the", "table", "spark", "value", "zzzmissing")
    val sha = TextOracleSql.Sha60
    def cell(r: String, w: String) =
      sha.format(s"'cms:' || cast($r as varchar) || ':' || $w") + s" % $width"
    val probeVals = probes.map(p => s"('$p')").mkString(", ")
    val probeList = probes.map(p => s"'$p'").mkString(", ")
    s"""
        WITH tokens AS (SELECT unnest(string_split(text, ' ')) as w
                        FROM documents),
        rws AS (SELECT unnest(range($depth)) as r),
        counters AS (
          SELECT r, ${cell("r", "w")} as cell, count(*) as n
          FROM tokens CROSS JOIN rws GROUP BY 1, 2),
        probes(word) AS (VALUES $probeVals),
        tc AS (SELECT w as word, count(*) as true_count FROM tokens
               WHERE w IN ($probeList) GROUP BY 1),
        est AS (SELECT p.word,
                  cast(min(coalesce(c.n, 0)) as bigint) as cm_estimate
                FROM probes p CROSS JOIN rws r
                LEFT JOIN counters c ON c.r = r.r
                  AND c.cell = ${cell("r.r", "p.word")}
                GROUP BY 1)
        SELECT e.word,
          cast(coalesce(tc.true_count, 0) as bigint) as true_count,
          e.cm_estimate,
          e.cm_estimate - coalesce(tc.true_count, 0) as overcount,
          e.cm_estimate >= coalesce(tc.true_count, 0) as never_undercounts
        FROM est e LEFT JOIN tc ON tc.word = e.word"""
  }

  /** Mergeable-sketch quantile audit (mirrors the percentile_approx
    * contract query): exact nearest-rank fences and the in-band
    * contract boolean; the sketch's 1e-4 rank error sits far inside
    * the ±2% band, so the boolean is TRUE by construction. */
  val approx_quantiles_audit: String = {
    val one = (pct: Int) => {
      val (lo, hi) = (pct - 2, math.min(pct + 2, 100))
      s"""SELECT event_type, cast($pct as bigint) as pct,
        max(CASE WHEN rn = ceil($pct / 100.0 * n) THEN value END)
          as exact_value,
        max(CASE WHEN rn = ceil($lo / 100.0 * n) THEN value END)
          as band_lo,
        max(CASE WHEN rn = ceil($hi / 100.0 * n) THEN value END)
          as band_hi,
        TRUE as approx_in_band
      FROM ranked GROUP BY 1"""
    }
    s"""
        WITH ranked AS (
          SELECT event_type, value,
            row_number() OVER (PARTITION BY event_type ORDER BY value)
              as rn,
            count(*) OVER (PARTITION BY event_type) as n
          FROM events)
        ${Seq(50, 90, 99).map(one).mkString("\nUNION ALL\n")}"""
  }

  /** Batch-grained expectation metrics rolled up to the global audit
    * counts (mirrors Pipeline.runIncremental's per-batch log). */
  val pipeline_incremental_log: String = {
    val cnt = (seq: Int, flow: String, name: String, pred: String) =>
      s"""SELECT cast($seq as int) as stage_seq, '$flow' as flow_name,
         '$name' as constraint_name,
         cast(sum(case when $pred then 1 else 0 end) as bigint) as passed_records,
         cast(sum(case when $pred then 0 else 1 end) as bigint) as failed_records
         FROM events"""
    val silverPreds = Seq(
      ("value is non-negative", "value >= 0"),
      ("value within sane bound", "value <= 400"),
      ("event_type is known",
        "event_type in ('click','view','purchase','signup','error')"),
      ("no error events", "event_type <> 'error'"),
      ("user present", "user_id is not null"))
    (cnt(0, "bronze_events", "user present", "user_id is not null") +:
      silverPreds.map { case (n, p) => cnt(1, "silver_events", n, p) })
      .mkString("\nUNION ALL\n")
  }

  /** Snapshot drift gate (mirrors Profile.profileDiff): profile of
    * the committed documents drop vs the registry's synthetic
    * incoming drop, diffed over |columns|-row frames. */
  val profile_diff: String = {
    def side(rel: String, num: Seq[(String, String)],
             str: Seq[String]): String = {
      val blocks = num.map { case (n, e) =>
        s"""SELECT '$n' as col_name, count(*) as n_rows,
           cast(sum(case when $e is null then 1 else 0 end) as bigint)
             as n_nulls,
           count(distinct $e) as n_distinct,
           cast(min($e) as double) as min_num,
           cast(max($e) as double) as max_num FROM $rel"""
      } ++ str.map { n =>
        s"""SELECT '$n' as col_name, count(*) as n_rows,
           cast(sum(case when $n is null then 1 else 0 end) as bigint)
             as n_nulls,
           count(distinct $n) as n_distinct,
           cast(NULL as double) as min_num,
           cast(NULL as double) as max_num FROM $rel"""
      }
      blocks.mkString("\nUNION ALL\n")
    }
    s"""
        WITH curt AS (
          SELECT doc_id, text,
            CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END as lang,
            n_chars,
            cast(len(string_split(text, ' ')) as bigint) as n_words
          FROM documents WHERE doc_id % 10 != 0),
        pp AS (${side("documents",
        Seq("doc_id" -> "doc_id", "n_chars" -> "n_chars"),
        Seq("text", "lang", "source"))}),
        cc AS (${side("curt",
        Seq("doc_id" -> "doc_id", "n_chars" -> "n_chars",
          "n_words" -> "n_words"),
        Seq("text", "lang"))})
        SELECT coalesce(pp.col_name, cc.col_name) as col_name,
          CASE WHEN pp.col_name IS NULL THEN 'added'
               WHEN cc.col_name IS NULL THEN 'removed'
               ELSE 'common' END as status,
          pp.n_rows as rows_prev, cc.n_rows as rows_cur,
          pp.n_nulls as nulls_prev, cc.n_nulls as nulls_cur,
          pp.n_distinct as distinct_prev, cc.n_distinct as distinct_cur,
          CASE WHEN pp.col_name IS NOT NULL AND cc.col_name IS NOT NULL
            THEN cast(cc.n_nulls as double) / cc.n_rows
               - cast(pp.n_nulls as double) / pp.n_rows END
            as null_frac_drift,
          CASE WHEN pp.col_name IS NOT NULL AND cc.col_name IS NOT NULL
            THEN coalesce(cc.min_num < pp.min_num, false)
              OR coalesce(cc.max_num > pp.max_num, false) END
            as range_widened
        FROM pp FULL JOIN cc ON pp.col_name = cc.col_name"""
  }

  /** Single-pass column profile over events (mirrors
    * Profile.tableProfile): per-column aggregate blocks; ts profiles
    * as epoch-µs to match the Spark-side long canonicalization. */
  val table_profile: String = {
    val numCols = Seq("event_id" -> "event_id", "ts" -> "epoch_us(ts)",
      "user_id" -> "user_id", "value" -> "value")
    val strCols = Seq("event_type", "props")
    val numSql = numCols.map { case (n, e) =>
      s"""SELECT '$n' as col_name, count(*) as n_rows,
         cast(sum(case when $e is null then 1 else 0 end) as bigint)
           as n_nulls,
         count(distinct $e) as n_distinct,
         cast(min($e) as double) as min_num,
         cast(max($e) as double) as max_num,
         cast(NULL as varchar) as min_str,
         cast(NULL as varchar) as max_str
         FROM events"""
    }
    val strSql = strCols.map { n =>
      s"""SELECT '$n' as col_name, count(*) as n_rows,
         cast(sum(case when $n is null then 1 else 0 end) as bigint)
           as n_nulls,
         count(distinct $n) as n_distinct,
         cast(NULL as double) as min_num,
         cast(NULL as double) as max_num,
         min($n) as min_str, max($n) as max_str
         FROM events"""
    }
    (numSql ++ strSql).mkString("\nUNION ALL\n")
  }

  /** Exact type-1 per-group quantiles (mirrors the two-phase
    * bucket-selection operator): value at rank ceil(p·n). */
  val value_quantiles: String = {
    val one = (q: String) =>
      s"""SELECT event_type, cast($q as double) as p,
         value as quantile_value
         FROM ranked WHERE rn = ceil($q * n)"""
    s"""
        WITH ranked AS (
          SELECT event_type, value,
            row_number() OVER (PARTITION BY event_type ORDER BY value) as rn,
            count(*) OVER (PARTITION BY event_type) as n
          FROM events)
        ${Seq("0.25", "0.5", "0.75").map(one).mkString("\nUNION ALL\n")}"""
  }

  /** Pairwise Pearson correlation over cents-fixed lineitem columns
    * (mirrors Profile.columnCorr): exact decimal(38,0) power sums,
    * corr as the one fixed IEEE chain with a zero-variance NULL
    * guard. Generated from the column list so the pair set and the
    * cents fixing stay in lockstep with the operator. */
  private[graft] def columnCorrSql(table: String,
                                   cols: Seq[String]): String = {
    val cent = cols.map(c =>
      s"cast(cast($c as decimal(12,2)) * 100 as bigint) as $c").mkString(", ")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val sums = (Seq("count(*) as n") ++
      cols.map(c => s"cast(sum(cast($c as decimal(38,0))) as decimal(38,0)) as s_$c") ++
      cols.map(c => s"cast(sum(cast($c * $c as decimal(38,0))) as decimal(38,0)) as ss_$c") ++
      pairs.map { case (x, y) =>
        s"cast(sum(cast($x * $y as decimal(38,0))) as decimal(38,0)) as sp_${x}__$y" })
      .mkString(",\n            ")
    val legs = pairs.map { case (x, y) => s"""
        SELECT '$x' as col_x, '$y' as col_y, n,
          cast(s_$x as varchar) as sum_x, cast(s_$y as varchar) as sum_y,
          cast(ss_$x as varchar) as sum_x2,
          cast(ss_$y as varchar) as sum_y2,
          cast(sp_${x}__$y as varchar) as sum_xy,
          CASE WHEN cast(n as double) * cast(ss_$x as double)
                 - cast(s_$x as double) * cast(s_$x as double) > 0
                AND cast(n as double) * cast(ss_$y as double)
                 - cast(s_$y as double) * cast(s_$y as double) > 0
               THEN (cast(n as double) * cast(sp_${x}__$y as double)
                 - cast(s_$x as double) * cast(s_$y as double))
                 / (sqrt(cast(n as double) * cast(ss_$x as double)
                     - cast(s_$x as double) * cast(s_$x as double))
                  * sqrt(cast(n as double) * cast(ss_$y as double)
                     - cast(s_$y as double) * cast(s_$y as double)))
               END as corr
        FROM m""" }.mkString("\n        UNION ALL")
    s"""
        WITH c AS (SELECT $cent FROM $table),
        m AS (
          SELECT $sums
          FROM c)
        $legs"""
  }

  val column_corr: String =
    columnCorrSql("lineitem",
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))

  /** Seasonal decomposition over the dense hourly grid (mirrors
    * TimeSeries.decompose, period 24): centered 24-term MA trend on
    * full frames only, per-(type, hour-of-day) seasonal from the
    * integer detrended numerator, residual as the fixed three-term
    * double chain. */
  val ts_decompose: String = """
        WITH e AS (SELECT event_type, epoch_us(ts) as ts FROM events),
        h AS (SELECT event_type, ts - ts % 3600000000 as hour_us,
                count(*) as n FROM e GROUP BY 1, 2),
        spans AS (SELECT event_type,
                min(ts) - min(ts) % 3600000000 as lo,
                max(ts) - max(ts) % 3600000000 as hi
              FROM e GROUP BY 1),
        grid AS (SELECT event_type,
                unnest(generate_series(lo, hi, 3600000000)) as hour_us
              FROM spans),
        s AS (SELECT g.event_type, g.hour_us,
                coalesce(h.n, 0) as n_events
              FROM grid g LEFT JOIN h USING (event_type, hour_us)),
        f AS (SELECT event_type, hour_us, n_events,
                cast(sum(n_events) OVER w as bigint) as frame_sum,
                cast(count(*) OVER w as bigint) as frame_n,
                (hour_us // 3600000000) % 24 as hod
              FROM s
              WINDOW w AS (PARTITION BY event_type ORDER BY hour_us
                ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)),
        f2 AS (SELECT *,
                CASE WHEN frame_n = 24
                     THEN 24 * n_events - frame_sum END as det_num
               FROM f),
        seas AS (SELECT event_type, hod,
                cast(sum(det_num) as bigint) as s_num,
                count(*) as s_cnt
              FROM f2 WHERE det_num IS NOT NULL GROUP BY 1, 2)
        SELECT f2.event_type, f2.hour_us, f2.n_events,
          CASE WHEN frame_n = 24
               THEN cast(frame_sum as double) / 24.0 END as trend,
          CASE WHEN det_num IS NOT NULL
               THEN cast(s_num as double)
                 / (24.0 * cast(s_cnt as double)) END as seasonal,
          CASE WHEN det_num IS NOT NULL
               THEN cast(n_events as double)
                 - cast(frame_sum as double) / 24.0
                 - cast(s_num as double)
                   / (24.0 * cast(s_cnt as double)) END as residual
        FROM f2 LEFT JOIN seas USING (event_type, hod)"""

}
