"""DuckDB oracle SQL for the documents/events/lineitem/folding queries.

These run against the driver's pre-registered views (documents, events,
lineitem, ...). Semantics mirror ``functions/text_analysis.py`` and
``functions/dedup.py`` exactly: integer-exact outputs, md5 as the portable
hash, identical normalization.
"""

from __future__ import annotations

_NORM = ("trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")
_PUNCT = "[,.;:!?()\\[\\]{}\"''«»…—-]"
_STOP_EN = "('the','a','of','to','and','in','on','for','with')"
_MARK_DE = "('der','die','das','und','nicht','ein')"
_MARK_ES = "('el','la','de','y','no','que')"

_TOKENS_CTE = f"""
toks AS (
  SELECT doc_id,
         unnest(string_split({_NORM}, ' ')) AS tok
  FROM documents
)"""

# word 3-gram shingles of the normalized text; docs with <3 tokens fall back
# to the whole normalized text (functions/text_analysis.shingles)
_SHINGLES_CTE = f"""
words AS (
  SELECT doc_id,
         unnest(string_split({_NORM}, ' ')) AS tok,
         generate_subscripts(string_split({_NORM}, ' '), 1) AS ord,
         len(string_split({_NORM}, ' ')) AS n
  FROM documents
),
shingles AS (
  SELECT w1.doc_id, w1.tok || ' ' || w2.tok || ' ' || w3.tok AS shingle
  FROM words w1
  JOIN words w2 ON w2.doc_id = w1.doc_id AND w2.ord = w1.ord + 1
  JOIN words w3 ON w3.doc_id = w1.doc_id AND w3.ord = w1.ord + 2
  UNION ALL
  SELECT doc_id, {_NORM} AS shingle FROM documents
  WHERE len(string_split({_NORM}, ' ')) < 3
)"""


def _minhash_aggs(k: int) -> str:
    return ",\n         ".join(
        f"MIN(md5('s{i}' || '|' || shingle)) AS minhash_{i}"
        for i in range(k))


# MinHash-LSH candidate pairs over the shingle CTE (mirrors
# functions/dedup.lsh_candidate_pairs: 8 minhashes, 4 bands of 2)
_LSH_PAIRS_CTE = """
sig8 AS (
  SELECT doc_id,
         {aggs}
  FROM shingles GROUP BY doc_id
),
banded8 AS (
  SELECT doc_id, 0 AS band, minhash_0 || '#' || minhash_1 AS key FROM sig8
  UNION ALL
  SELECT doc_id, 1, minhash_2 || '#' || minhash_3 FROM sig8
  UNION ALL
  SELECT doc_id, 2, minhash_4 || '#' || minhash_5 FROM sig8
  UNION ALL
  SELECT doc_id, 3, minhash_6 || '#' || minhash_7 FROM sig8
),
lshp AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded8 a JOIN banded8 b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)"""


def _lsh_pairs_cte() -> str:
    return _LSH_PAIRS_CTE.format(aggs=_minhash_aggs(8))


def _simhash_sql(bits: int = 32) -> str:
    # per-token 32-bit hash == Spark conv(substr(md5(tok),1,8),16,10):
    # bit b lives in hex char (8 - b//4), at position (b % 4) in the nibble.
    votes = ",\n    ".join(
        "SUM(CASE WHEN ((strpos('0123456789abcdef', "
        f"substr(h8, {8 - b // 4}, 1)) - 1) >> {b % 4}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits))
    sim = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({2 ** b} AS BIGINT) "
        f"ELSE 0 END)" for b in range(bits))
    return f"""
WITH {_TOKENS_CTE},
hashes AS (
  SELECT doc_id, substr(md5(tok), 1, 8) AS h8 FROM toks WHERE tok <> ''
),
votes AS (
  SELECT doc_id,
    {votes}
  FROM hashes GROUP BY doc_id
)
SELECT doc_id, CAST({sim} AS BIGINT) AS simhash FROM votes"""


DOC_SQL: dict[str, str] = {
    "doc_token_stats": f"""
SELECT doc_id,
       CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
         AS n_chars_nospace
FROM documents""",

    "doc_quality": f"""
WITH {_TOKENS_CTE}
SELECT d.doc_id,
       CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens,
       CAST((SELECT COUNT(*) FROM toks t WHERE t.doc_id = d.doc_id
             AND t.tok IN {_STOP_EN}) AS BIGINT) AS stop_hits,
       CAST((SELECT COUNT(*) FROM toks t WHERE t.doc_id = d.doc_id
             AND regexp_matches(t.tok, '^[0-9]+$')) AS BIGINT) AS digit_tokens,
       CAST(length(text) - length(regexp_replace(text, '{_PUNCT}', '', 'g'))
            AS BIGINT) AS punct_chars,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents d""",

    "doc_langid": f"""
WITH {_TOKENS_CTE},
hits AS (
  SELECT d.doc_id,
         CAST((SELECT COUNT(*) FROM toks t WHERE t.doc_id = d.doc_id
               AND t.tok IN {_MARK_DE}) AS BIGINT) AS hits_de,
         CAST((SELECT COUNT(*) FROM toks t WHERE t.doc_id = d.doc_id
               AND t.tok IN {_STOP_EN}) AS BIGINT) AS hits_en,
         CAST((SELECT COUNT(*) FROM toks t WHERE t.doc_id = d.doc_id
               AND t.tok IN {_MARK_ES}) AS BIGINT) AS hits_es
  FROM documents d
)
SELECT doc_id, hits_de, hits_en, hits_es,
       CASE WHEN greatest(hits_de, hits_en, hits_es) = 0 THEN 'unk'
            WHEN hits_de = greatest(hits_de, hits_en, hits_es) THEN 'de'
            WHEN hits_en = greatest(hits_de, hits_en, hits_es) THEN 'en'
            ELSE 'es' END AS pred_lang
FROM hits""",

    "doc_fingerprints": f"""
WITH {_SHINGLES_CTE},
sig AS (
  SELECT doc_id,
         {_minhash_aggs(4)}
  FROM shingles GROUP BY doc_id
)
SELECT d.doc_id, md5({_NORM}) AS md5_norm,
       s.minhash_0, s.minhash_1, s.minhash_2, s.minhash_3
FROM documents d LEFT JOIN sig s ON s.doc_id = d.doc_id""",

    "dedup_exact": f"""
SELECT md5({_NORM}) AS text_key,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id,
       CAST(COUNT(*) AS BIGINT) AS dup_count
FROM documents GROUP BY 1""",

    "dedup_minhash_lsh": f"""
WITH {_SHINGLES_CTE},
sig AS (
  SELECT doc_id,
         {_minhash_aggs(8)}
  FROM shingles GROUP BY doc_id
),
banded AS (
  SELECT doc_id, 0 AS band, minhash_0 || '#' || minhash_1 AS key FROM sig
  UNION ALL
  SELECT doc_id, 1, minhash_2 || '#' || minhash_3 FROM sig
  UNION ALL
  SELECT doc_id, 2, minhash_4 || '#' || minhash_5 FROM sig
  UNION ALL
  SELECT doc_id, 3, minhash_6 || '#' || minhash_7 FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id""",

    "dedup_ngram_jaccard": f"""
WITH {_SHINGLES_CTE},
{_lsh_pairs_cte()},
sh AS (SELECT DISTINCT doc_id, shingle FROM shingles),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS inter_size
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN lshp l ON l.doc_a = a.doc_id AND l.doc_b = b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter_size,
       sa.sz AS size_a, sb.sz AS size_b
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.inter_size * 1000000 >= 800000 * (sa.sz + sb.sz - i.inter_size)""",

    "dedup_simhash": _simhash_sql(32),

    "events_hourly": """
SELECT user_id,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 10000, 0) AS BIGINT)) AS BIGINT) AS value_e4
FROM events GROUP BY 1, 2""",

    "lineitem_pricing": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_qty_e2,
       CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_base_e2,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS sum_disc_e2,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2""",

    "folding_assign": """
SELECT doc_id,
       CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % 5 + 1 AS INT) AS fold
FROM documents""",
}


DOC_SQL["events_sessionize"] = """
WITH ev AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
marked AS (
  SELECT user_id, event_id, ts, es,
         CASE WHEN lag(es) OVER w IS NULL
                OR es - lag(es) OVER w > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts, es,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(event_id) AS BIGINT) AS first_event,
       CAST(MAX(es) - MIN(es) AS BIGINT) AS duration_sec
FROM sess GROUP BY 1, 2"""

DOC_SQL["orders_by_region"] = """
SELECT r.r_name, strftime(o.o_orderdate, '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_e2
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2"""

# multimodal feature extraction: the deterministic fake decode is 8-dim
# feature = first 8 sha256 digest bytes / 255 (functions/multimodal.
# decode_stub); the query emits the byte signature, replicated here from
# DuckDB's own sha256 over the identical UTF-8 payload
DOC_SQL["multimodal_features"] = """
SELECT doc_id AS media_id,
       (['image','audio','video'])[(doc_id % 3) + 1] AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256,
       array_to_string(
         list_transform(range(8),
                        i -> ('0x' || substr(sha256(text), 2*i + 1, 2))::INT),
         ',') AS feature_sig
FROM documents"""

DOC_SQL["dedup_clusters"] = f"""
WITH RECURSIVE {_SHINGLES_CTE.lstrip()},
{_lsh_pairs_cte()},
sh AS (SELECT DISTINCT doc_id, shingle FROM shingles),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS inter_size
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN lshp l ON l.doc_a = a.doc_id AND l.doc_b = b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE i.inter_size * 1000000 >= 800000 * (sa.sz + sb.sz - i.inter_size)
),
edges AS (
  SELECT CAST(doc_a AS VARCHAR) AS a, CAST(doc_b AS VARCHAR) AS b FROM pairs
  UNION
  SELECT CAST(doc_b AS VARCHAR), CAST(doc_a AS VARCHAR) FROM pairs
),
reach(node, root) AS (
  SELECT a AS node, a AS root FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.b AS node, r.root FROM reach r JOIN edges e ON e.a = r.node
)
SELECT CAST(node AS BIGINT) AS doc_id,
       CAST(MIN(root) AS BIGINT) AS cluster_id
FROM reach GROUP BY node"""

DOC_SQL["multimodal_frame_sample"] = """
-- constant 700 ms frame grid up to the max derivable duration (9*1500+500),
-- joined on ts <= duration-1 (DuckDB's generate_series takes no lateral
-- column parameters); identical row set to Spark's per-row sequence()
SELECT CAST(d.doc_id AS BIGINT) AS media_id,
       CAST(s.g AS BIGINT) AS frame_ts_ms
FROM documents d
JOIN (SELECT generate_series AS g FROM generate_series(0, 13300, 700)) s
  ON s.g <= greatest(((d.doc_id % 10) * 1500 + 500) - 1, 0)
WHERE d.doc_id % 3 = 2"""

# real PPM decode check: the encoder writes pixel (x,y,c) value
# (doc_id*31 + y*7 + x*3 + c*11) % 256 at w=4+id%5, h=3+id%4 (even ids);
# the oracle recomputes the exact channel sums from that closed form —
# independent of both the Python encoder and the parser it feeds
DOC_SQL["multimodal_decode_ppm"] = """
WITH ppm AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
  FROM documents WHERE doc_id % 2 = 0
),
ys AS (SELECT doc_id, w, h,
              unnest(generate_series(0, h - 1)) AS y FROM ppm),
xs AS (SELECT doc_id, w, h, y,
              unnest(generate_series(0, w - 1)) AS x FROM ys)
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(MIN(w) AS INT) AS width, CAST(MIN(h) AS INT) AS height,
       CAST(SUM((doc_id*31 + y*7 + x*3) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((doc_id*31 + y*7 + x*3 + 11) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((doc_id*31 + y*7 + x*3 + 22) % 256) AS BIGINT) AS sum_b
FROM xs GROUP BY doc_id ORDER BY media_id"""

# real WAV decode check: interleaved PCM16 sample i value
# ((doc_id*131 + i*17) % 65536) - 32768 over nch*n samples,
# rate=8000+(id%3)*4000, nch=2 (odd ids), n=16+id%9 per channel
DOC_SQL["multimodal_decode_wav"] = """
WITH wav AS (
  SELECT doc_id, 8000 + (doc_id % 3) * 4000 AS rate,
         2 AS nch, 16 + doc_id % 9 AS n
  FROM documents WHERE doc_id % 2 = 1
),
ws AS (SELECT doc_id, rate, nch, n,
              unnest(generate_series(0, nch * n - 1)) AS i FROM wav)
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(MIN(rate) AS INT) AS sample_rate,
       CAST(MIN(nch) AS INT) AS n_channels,
       CAST(MIN(n) AS BIGINT) AS n_samples,
       CAST(SUM((doc_id*131 + i*17) % 65536 - 32768) AS BIGINT) AS amp_sum
FROM ws GROUP BY doc_id ORDER BY media_id"""

# capstone: the end-to-end training-data curation pass — quality gate +
# language gate + exact-dedup canonical + near-dup cluster representative,
# composed from the SAME individually-checked CTE bodies (nested WITHs are
# plain subqueries to DuckDB). Every predicate is integer-exact.
DOC_SQL["corpus_select"] = f"""
WITH q AS ({DOC_SQL['doc_quality']}),
l AS ({DOC_SQL['doc_langid']}),
e AS ({DOC_SQL['dedup_exact']}),
c AS ({DOC_SQL['dedup_clusters']}),
nm AS (SELECT doc_id, md5({_NORM}) AS text_key FROM documents)
SELECT d.doc_id, l.pred_lang, q.n_tokens
FROM documents d
JOIN q ON q.doc_id = d.doc_id
JOIN l ON l.doc_id = d.doc_id
JOIN nm ON nm.doc_id = d.doc_id
JOIN e ON e.text_key = nm.text_key
LEFT JOIN c ON c.doc_id = d.doc_id
WHERE q.n_tokens >= 10
  AND q.stop_hits * 20 >= q.n_tokens
  AND q.digit_tokens * 2 <= q.n_tokens
  AND l.pred_lang = 'en'
  AND e.canonical_doc_id = d.doc_id
  AND (c.doc_id IS NULL OR c.cluster_id = d.doc_id)
ORDER BY d.doc_id"""

# SimHash near-pair search: band the 32-bit signature into 4 byte-slices,
# candidates share a band bucket, exact Hamming via xor+bit_count (mirrors
# functions/dedup.simhash_near_pairs; recall exact for hamming <= 3)
DOC_SQL["dedup_simhash_pairs"] = f"""
WITH sim AS ({_simhash_sql(32)}),
sbanded AS (
  SELECT doc_id, 0 AS band, (simhash >> 0) & 255 AS key FROM sim
  UNION ALL SELECT doc_id, 1, (simhash >> 8) & 255 FROM sim
  UNION ALL SELECT doc_id, 2, (simhash >> 16) & 255 FROM sim
  UNION ALL SELECT doc_id, 3, (simhash >> 24) & 255 FROM sim
),
scand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sbanded a JOIN sbanded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
FROM scand c
JOIN sim sa ON sa.doc_id = c.doc_a
JOIN sim sb ON sb.doc_id = c.doc_b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3"""


# Contrastive negatives over the symmetrized SimHash near-dup graph —
# the generic sampler body lives in duck.negative_samples_over_sql (md5
# bucket targeting + arg-min, engine-portable hex parse).
from .duck import negative_samples_over_sql as _neg_sql  # noqa: E402

DOC_SQL["doc_negative_pairs"] = _neg_sql(
    # the SimHash scan is MATERIALIZED once and unioned twice — the inlined
    # two-copy form is the known DuckDB CTE-inlining cost pattern (ADVICE r3)
    "WITH sp AS MATERIALIZED (" + DOC_SQL["dedup_simhash_pairs"] + ") "
    "SELECT CAST(doc_a AS VARCHAR) AS src, CAST(doc_b AS VARCHAR) AS dst "
    "FROM sp "
    "UNION "
    "SELECT CAST(doc_b AS VARCHAR), CAST(doc_a AS VARCHAR) FROM sp",
    k=3)


# TF-IDF top-5 terms per document: identical whitespace tokenization,
# ln(N/df) idf, ranking on the 1e6-rounded score (integer comparisons —
# raw-double ordering is one-ulp fragile across engines)
DOC_SQL["doc_tfidf_topk"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE term <> '' GROUP BY 1, 2
),
dfc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
         CAST(round(tf.tf * ln((SELECT n FROM nn) / CAST(dfc.df AS DOUBLE))
                    * 1000000, 0) AS BIGINT) AS score_e6
  FROM tf JOIN dfc USING (term)
)
SELECT doc_id, term, tf, df, score_e6,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY score_e6 DESC, term) AS INT) AS rank
FROM scored QUALIFY rank <= 5 ORDER BY doc_id, rank"""


def bm25_sql(query_terms: tuple[str, ...], k1: float = 1.2,
             b: float = 0.75) -> str:
    """BM25 oracle: identical parenthesization and a fixed-order
    expression sum of per-term conditional aggregates (see
    text_analysis.bm25_scores determinism note); k1/b as repr literals."""
    terms_in = ", ".join(f"'{t}'" for t in query_terms)
    rk1, rb = repr(float(k1)), repr(float(b))
    caggs = ",\n         ".join(
        f"SUM(CASE WHEN term = '{t}' THEN contrib END) AS c{i}"
        for i, t in enumerate(query_terms))
    score = " + ".join(f"COALESCE(c{i}, 0.0)"
                       for i in range(len(query_terms)))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE term IN ({terms_in}) GROUP BY 1, 2
),
dfc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
lens AS (SELECT doc_id, CAST(len(string_split({_NORM}, ' ')) AS BIGINT)
                AS dl FROM documents),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
              CAST(SUM(CAST(len(string_split({_NORM}, ' ')) AS BIGINT))
                   AS DOUBLE) AS sum_dl
       FROM documents),
j AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (((SELECT n FROM nn) - CAST(dfc.df AS DOUBLE)) + 0.5)
                  / (CAST(dfc.df AS DOUBLE) + 0.5))
         * (CAST(tf.tf AS DOUBLE) * {repr(float(k1) + 1.0)})
         / (CAST(tf.tf AS DOUBLE)
            + {rk1} * ({repr(1.0 - float(b))}
                       + {rb} * (CAST(l.dl AS DOUBLE)
                                 / ((SELECT sum_dl FROM nn)
                                    / (SELECT n FROM nn)))))
           AS contrib
  FROM tf JOIN dfc ON dfc.term = tf.term JOIN lens l ON l.doc_id = tf.doc_id
),
g AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
         {caggs}
  FROM j GROUP BY doc_id
)
SELECT doc_id, n_hits,
       CAST(round(({score}) * 1000000, 0) AS BIGINT) AS score_e6
FROM g ORDER BY doc_id"""


# |z| > 3 per-user event-rate anomalies, cross-multiplied into pure
# integer arithmetic: (c*n - s)^2 > 9*(n*q - s^2) == z^2 > 9
DOC_SQL["events_anomalies"] = """
WITH hourly AS (
  SELECT user_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(n_events) AS BIGINT) AS sum_events,
         CAST(SUM(n_events * n_events) AS BIGINT) AS sumsq
  FROM hourly GROUP BY 1
)
SELECT h.user_id, h.hour, h.n_events, s.n_hours, s.sum_events
FROM hourly h JOIN stats s ON s.user_id = h.user_id
WHERE s.n_hours >= 3
  AND (h.n_events * s.n_hours - s.sum_events)
      * (h.n_events * s.n_hours - s.sum_events)
      > 9 * (s.n_hours * s.sumsq - s.sum_events * s.sum_events)
ORDER BY 1, 2"""

# deterministic stratified sampling: md5-threshold per language stratum
# (rates: de 80, en 50, es 80, unk 10 percent)
DOC_SQL["doc_sample_stratified"] = f"""
WITH lang AS ({DOC_SQL['doc_langid']}),
b AS (
  SELECT doc_id, pred_lang,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 100 AS INT) AS bucket
  FROM lang
)
SELECT doc_id, pred_lang, bucket FROM b
WHERE bucket < CASE pred_lang WHEN 'de' THEN 80 WHEN 'en' THEN 50
                              WHEN 'es' THEN 80 ELSE 10 END
ORDER BY doc_id"""


# PII scrub: patterns duplicated deliberately (independent derivation —
# they are part of the operator spec, RE2-compatible by construction);
# dirty text is the same deterministic function of (text, doc_id) as
# functions/text_analysis.dirty_text_col.
DOC_SQL["doc_pii_scrub"] = r"""
WITH dirty AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com from 10.'
              || CAST(doc_id % 256 AS VARCHAR) || '.0.'
              || CAST(doc_id % 100 AS VARCHAR)
              || ' call +1 555 01'
              || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
              || ' done' AS t
  FROM documents
),
red AS (
  SELECT doc_id, t,
         regexp_replace(
           regexp_replace(
             regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
           '\+\d[\d ]{5,}\d', '<PHONE>', 'g') AS r
  FROM dirty
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(t,
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(t, '\+\d[\d ]{5,}\d')) AS BIGINT)
         AS n_phones,
       CAST(length(r) AS BIGINT) AS n_chars_redacted,
       md5(r) AS redacted_md5
FROM red"""


# BPE-ish pre-tokenizer count (pattern duplicated deliberately, same
# whitespace normalization as doc_token_stats for the ws count)
DOC_SQL["doc_token_bpe"] = r"""
SELECT doc_id,
       CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
            'g')), ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text,
            ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS BIGINT)
         AS n_bpe_tokens
FROM documents"""


# benchmark-contamination: distinct word-3-gram overlap vs the
# doc_id % 50 == 0 benchmark slice; 10%-overlap flag cross-multiplied
DOC_SQL["doc_contamination"] = f"""
WITH {_SHINGLES_CTE},
dsh AS (SELECT DISTINCT doc_id, shingle FROM shingles
        WHERE doc_id % 50 <> 0),
bsh AS (SELECT DISTINCT shingle FROM shingles WHERE doc_id % 50 = 0),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
        FROM dsh GROUP BY 1),
ov AS (SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
       FROM dsh d JOIN bsh b ON b.shingle = d.shingle GROUP BY 1)
SELECT tot.doc_id, tot.n_shingles,
       COALESCE(ov.n_overlap, 0) AS n_overlap,
       CAST(COALESCE(ov.n_overlap, 0) * 10 >= tot.n_shingles AS INT)
         AS is_contaminated
FROM tot LEFT JOIN ov ON ov.doc_id = tot.doc_id"""
