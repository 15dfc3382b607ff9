"""DuckDB oracle SQL builders for the driver's correctness gate.

Each builder returns ANSI-ish SQL runnable by DuckDB. KG queries read the
deterministic synthetic fixtures directly via ``read_parquet`` (the
transcripts table is not among the driver's pre-registered views); document/
embedding/event/lineitem queries use the pre-registered views.

The no-frames KG queries transcribe the engine's relational semantics into
SQL end-to-end (tokenizer FSM as one regex, window cumulative positions,
self-join pair enumeration, group joins, priority dedup) — an independent
execution of the same logical plan on a different engine.
"""

from __future__ import annotations

# The tokenizer FSM as one RE2-compatible regex: word-run | digit-run |
# single mapped punctuation char (see operators/textproc.py for the
# derivation from tokenizer.py:76-105). Number of matches == number of terms
# emitted for a non-entity, non-URL whitespace token.
FSM_SQL = ("([^0-9,.…:;—?!(){}\\[\\]«»\"\\n\\-]"
           "[^,.…:;—?!(){}\\[\\]«»\"\\n]*)"
           "|([0-9]+)"
           "|([,.…:;—?!(){}\\[\\]«»\"\\n\\-])")

# URL predicate equivalent to urlparse scheme+netloc+path (textproc.is_url)
# on ``://``-containing words: netloc = run up to the first /, ? or #; path
# must start with / and be non-empty... path='/' alone is also non-empty.
URL_SQL = "regexp_matches({w}, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]+/')"

ENT_SQL = ("(length({w}) > 2 AND substr({w},1,1) = '[' "
           "AND substr({w},length({w}),1) = ']')")


def _words_cte(transcripts_path: str) -> str:
    """Per-word rows with per-word term counts (no-frames parse)."""
    w = "u.word"
    return f"""
words AS (
  SELECT conv_id, turn_idx, u.word, u.ord,
         CASE
           WHEN {ENT_SQL.format(w=w)} THEN 1
           WHEN {URL_SQL.format(w=w)} THEN 1
           ELSE len(regexp_extract_all(u.word, '{FSM_SQL}'))
         END AS term_count,
         CASE WHEN {ENT_SQL.format(w=w)}
              THEN lower(substr(u.word, 2, length(u.word) - 2)) END AS ent_value
  FROM (
    SELECT conv_id, turn_idx,
           unnest(string_split_regex(trim(text), '\\s+')) AS word,
           generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS ord
    FROM read_parquet('{transcripts_path}')
    WHERE trim(text) <> ''
  ) u
)"""


def _mentions_cte(transcripts_path: str, synonyms_path: str) -> str:
    return f"""
WITH {_words_cte(transcripts_path)},
turn_terms AS (
  SELECT conv_id, turn_idx, CAST(SUM(term_count) AS BIGINT) AS n_terms
  FROM words GROUP BY conv_id, turn_idx
),
turn_off AS (
  SELECT conv_id, turn_idx, n_terms,
         CAST(COALESCE(SUM(n_terms) OVER (
             PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS term_offset
  FROM turn_terms
),
word_pos AS (
  SELECT conv_id, turn_idx, word, ord, ent_value,
         CAST(COALESCE(SUM(term_count) OVER (
             PARTITION BY conv_id, turn_idx ORDER BY ord
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS pos_in_turn
  FROM words
),
syn AS (
  SELECT lower(trim(value)) AS sid, MIN(group_id) AS group_id
  FROM read_parquet('{synonyms_path}') GROUP BY 1
),
mentions AS (
  SELECT wp.conv_id, wp.turn_idx,
         CAST(wp.pos_in_turn AS BIGINT) AS pos_in_turn,
         CAST(t.term_offset + wp.pos_in_turn AS BIGINT) AS ind_in_doc,
         wp.ent_value AS value,
         CAST(ROW_NUMBER() OVER (PARTITION BY wp.conv_id
              ORDER BY wp.turn_idx, wp.pos_in_turn) - 1 AS BIGINT) AS ent_id,
         COALESCE('g' || CAST(s.group_id AS VARCHAR),
                  'u:' || trim(wp.ent_value)) AS group_key
  FROM word_pos wp
  JOIN turn_off t USING (conv_id, turn_idx)
  LEFT JOIN syn s ON s.sid = trim(wp.ent_value)
  WHERE wp.ent_value IS NOT NULL
)"""


def _sq(s: str) -> str:
    return s.replace("'", "''")


def _frames_kg_cte(transcripts_path: str, synonyms_path: str, frames_lex,
                   negation_words: tuple[str, ...]) -> str:
    """CTE chain for the FULL-frames parse: per-term rows -> greedy
    longest-match frame scan -> post-scan positions -> mentions + frame hits.

    The reference's scan (frames.py:47-86) tries span sizes
    ``max_variant_len-1 .. 1`` greedily left-to-right; an s-word hit consumes
    the next s-1 terms. The scan is realized for ARBITRARY span via a
    recursive ``walk`` CTE (round-2 verdict item 6 — the previous closed-form
    parity trick only covered span <= 2): per turn, the walk state is the
    current input position; each step emits one OUTPUT term and advances by
    the longest-hit span at that position (or 1). Recursion depth = output
    terms of the longest turn (bounded, ~60 on these fixtures); breadth = one
    row per turn per step — DuckDB evaluates it breadth-first. Candidate
    phrases per span come from static ``lead()`` columns, NULL-propagating
    through non-word terms exactly like the engine's span validity check.
    """
    var_rows = []
    for phrase, fid in sorted(frames_lex.variants.items()):
        nw = len(phrase.split())
        if 1 <= nw < frames_lex.max_variant_len:
            var_rows.append(f"('{_sq(phrase)}', '{_sq(fid)}', {nw})")
    pol_rows = [f"('{_sq(fid)}', '{_sq(p)}')"
                for fid, p in sorted(frames_lex.polarity.items())]
    assert var_rows and pol_rows, "frames oracle needs a non-empty lexicon"
    neg_list = ", ".join(f"'{_sq(w.lower())}'" for w in negation_words)

    max_span = max(1, frames_lex.max_variant_len - 1)
    # lead columns: span s needs lemmas at offsets 0..s-1
    lead_cols = "".join(
        f",\n         lead(lemma, {i}) OVER sw AS lem{i}"
        for i in range(1, max_span))
    # phrase expression per span (NULL-propagating through non-word terms)
    def _phrase(s: str = "s", span: int = 1) -> str:
        parts = [f"{s}.lemma"] + [f"{s}.lem{i}" for i in range(1, span)]
        return " || ' ' || ".join(parts)
    var_joins = "\n".join(
        f"  LEFT JOIN fvar f{sp} ON f{sp}.nw = {sp} "
        f"AND f{sp}.phrase = {_phrase('s', sp)}"
        for sp in range(max_span, 0, -1))
    fid_coalesce = "COALESCE(" + ", ".join(
        f"f{sp}.frame_id" for sp in range(max_span, 0, -1)) + ")"
    span_case = ("CASE " + " ".join(
        f"WHEN f{sp}.frame_id IS NOT NULL THEN {sp}"
        for sp in range(max_span, 1, -1)) + " ELSE 1 END"
        if max_span > 1 else "1")
    w = "u.word"
    # single mapped punctuation chars (dash included); '\n' cannot occur
    # inside a whitespace-split word
    return f"""
WITH RECURSIVE words AS (
  SELECT conv_id, turn_idx, u.word, u.ord,
         {ENT_SQL.format(w=w)} AS is_ent,
         {URL_SQL.format(w=w)} AS is_url,
         CASE WHEN {ENT_SQL.format(w=w)}
              THEN lower(substr(u.word, 2, length(u.word) - 2)) END AS ent_value
  FROM (
    SELECT conv_id, turn_idx,
           unnest(string_split_regex(trim(text), '\\s+')) AS word,
           generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS ord
    FROM read_parquet('{transcripts_path}')
    WHERE trim(text) <> ''
  ) u
),
terms0 AS (
  SELECT conv_id, turn_idx, ord, is_ent, is_url, ent_value,
         CASE WHEN is_ent OR is_url THEN [word]
              ELSE regexp_extract_all(word, '{FSM_SQL}') END AS toks
  FROM words
),
terms1 AS (
  SELECT conv_id, turn_idx, ord, is_ent, is_url, ent_value,
         unnest(toks) AS tok, generate_subscripts(toks, 1) AS sub
  FROM terms0
),
terms AS (
  SELECT conv_id, turn_idx, ord, sub, ent_value, tok,
         CASE WHEN is_ent THEN 'e'
              WHEN is_url THEN 't'
              WHEN regexp_matches(tok, '^[0-9]+$') THEN 't'
              WHEN length(tok) = 1
                   AND tok IN (',','.','…',':',';','—','?','!','(',')','{{','}}',
                               '[',']','«','»','"','-') THEN 't'
              ELSE 'w' END AS kind,
         CAST(ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
              ORDER BY ord, sub) - 1 AS BIGINT) AS tidx
  FROM terms1
),
fvar(phrase, frame_id, nw) AS (VALUES {", ".join(var_rows)}),
fpol(frame_id, pol) AS (VALUES {", ".join(pol_rows)}),
lem AS (
  SELECT *, CASE WHEN kind = 'w' THEN lower(tok) END AS lemma
  FROM terms
),
seq AS (
  SELECT *{lead_cols}
  FROM lem
  WINDOW sw AS (PARTITION BY conv_id, turn_idx ORDER BY tidx)
),
best AS MATERIALIZED (
  -- longest-match candidate at each input position (sizes {max_span}..1).
  -- The chosen span at a position depends only on the lemmas FORWARD of it,
  -- never on consumption state, so it can be precomputed position-locally;
  -- MATERIALIZED so the recursion below never re-evaluates the scan.
  SELECT s.conv_id, s.turn_idx, s.tidx,
         {fid_coalesce} AS fid,
         {span_case} AS span,
         ROW_NUMBER() OVER (PARTITION BY s.conv_id, s.turn_idx
                            ORDER BY s.tidx) AS crank
  FROM seq s
{var_joins}
  WHERE {fid_coalesce} IS NOT NULL
),
take(conv_id, turn_idx, crank, tidx, span, fid, taken, last_end) AS (
  -- greedy consumption re-stated over CANDIDATE positions only (sparse):
  -- non-candidate positions always advance by one and cannot affect state,
  -- so recursion depth = candidates per turn, not terms per turn. A
  -- candidate is taken iff no earlier TAKEN hit covers it; coverage is the
  -- running max end (contiguous, forward-only).
  SELECT conv_id, turn_idx, crank, tidx, span, fid, TRUE, tidx + span - 1
  FROM best WHERE crank = 1
  UNION ALL
  SELECT c.conv_id, c.turn_idx, c.crank, c.tidx, c.span, c.fid,
         c.tidx > t.last_end,
         CASE WHEN c.tidx > t.last_end THEN c.tidx + c.span - 1
              ELSE t.last_end END
  FROM take t
  JOIN best c ON c.conv_id = t.conv_id AND c.turn_idx = t.turn_idx
             AND c.crank = t.crank + 1
),
hits_taken AS (
  SELECT conv_id, turn_idx, tidx, span, fid FROM take WHERE taken
),
consumed AS (
  SELECT conv_id, turn_idx, unnest(range(tidx + 1, tidx + span)) AS ctidx
  FROM hits_taken WHERE span > 1
),
emitted0 AS (
  SELECT t.conv_id, t.turn_idx, t.tidx, t.kind, t.ent_value, t.lemma,
         h.fid AS hit_fid, (h.fid IS NOT NULL) AS hit
  FROM lem t
  LEFT JOIN hits_taken h ON h.conv_id = t.conv_id
                        AND h.turn_idx = t.turn_idx AND h.tidx = t.tidx
  LEFT JOIN consumed c ON c.conv_id = t.conv_id
                      AND c.turn_idx = t.turn_idx AND c.ctidx = t.tidx
  WHERE c.ctidx IS NULL
),
emitted AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                                 ORDER BY tidx) - 1 AS BIGINT) AS out_pos,
         hit AND COALESCE(NOT lag(hit) OVER ew
                          AND lag(kind) OVER ew = 'w'
                          AND lag(lemma) OVER ew IN ({neg_list}), FALSE)
           AS negated
  FROM emitted0
  WINDOW ew AS (PARTITION BY conv_id, turn_idx ORDER BY tidx)
),
fturn AS (
  SELECT conv_id, turn_idx, CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM emitted GROUP BY 1, 2
),
foff AS (
  SELECT conv_id, turn_idx, n_terms,
         CAST(COALESCE(SUM(n_terms) OVER (
             PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS term_offset
  FROM fturn
),
syn AS (
  SELECT lower(trim(value)) AS sid, MIN(group_id) AS group_id
  FROM read_parquet('{synonyms_path}') GROUP BY 1
),
mentions AS (
  SELECT e.conv_id, e.turn_idx,
         e.out_pos AS pos_in_turn,
         CAST(o.term_offset + e.out_pos AS BIGINT) AS ind_in_doc,
         e.ent_value AS value,
         CAST(ROW_NUMBER() OVER (PARTITION BY e.conv_id
              ORDER BY e.turn_idx, e.out_pos) - 1 AS BIGINT) AS ent_id,
         COALESCE('g' || CAST(s.group_id AS VARCHAR),
                  'u:' || trim(e.ent_value)) AS group_key
  FROM emitted e
  JOIN foff o USING (conv_id, turn_idx)
  LEFT JOIN syn s ON s.sid = trim(e.ent_value)
  WHERE e.kind = 'e'
),
fhits AS (
  SELECT e.conv_id, e.turn_idx,
         e.out_pos AS pos_in_turn,
         CAST(o.term_offset + e.out_pos AS BIGINT) AS ind_in_doc,
         e.hit_fid AS frame_id, e.negated
  FROM emitted e
  JOIN foff o USING (conv_id, turn_idx)
  WHERE e.hit
)"""


def frame_hits_sql(transcripts_path: str, synonyms_path: str, frames_lex,
                   negation_words: tuple[str, ...]) -> str:
    """T4-T6 oracle: the full greedy frame scan with negation, hash-checked
    (closes the round-1 ``kg_frame_hits`` rows-only gap)."""
    return (_frames_kg_cte(transcripts_path, synonyms_path, frames_lex,
                           negation_words) + """
SELECT conv_id, turn_idx, pos_in_turn, ind_in_doc, frame_id, negated
FROM fhits
ORDER BY conv_id, turn_idx, pos_in_turn""")


def frame_role_labels_sql(transcripts_path: str, synonyms_path: str,
                          frames_lex,
                          negation_words: tuple[str, ...]) -> str:
    """S5 completion oracle: every frame hit exploded over the lexicon's
    per-role effect/state annotations (``get_frame_effects`` /
    ``get_frame_states``, ``rusentiframes/collection.py:86-115``) — a
    VALUES literal join on frame_id; probs integer-exact as percent."""
    rows = []
    for kind, m in (("effect", frames_lex.effects),
                    ("state", frames_lex.states)):
        for fid, entries in sorted(m.items()):
            for role, lab, p in entries:
                rows.append(f"('{_sq(fid)}', '{kind}', '{_sq(role)}', "
                            f"'{_sq(lab)}', {int(round(p * 100))})")
    assert rows, "frame_role_labels oracle needs effect/state entries"
    return (_frames_kg_cte(transcripts_path, synonyms_path, frames_lex,
                           negation_words) + f""",
fann(frame_id, kind, role, label, prob_pct) AS (VALUES {", ".join(rows)})
SELECT h.conv_id, h.turn_idx, h.pos_in_turn, h.ind_in_doc, h.frame_id,
       h.negated, a.kind, a.role, a.label, CAST(a.prob_pct AS INT) AS prob_pct
FROM fhits h JOIN fann a ON a.frame_id = h.frame_id
ORDER BY h.conv_id, h.turn_idx, h.pos_in_turn, a.kind, a.role""")


def doc_opinions_effect_sql(transcripts_path: str, synonyms_path: str,
                            frames_lex,
                            negation_words: tuple[str, ...],
                            role: str = "a1",
                            dist_bound: int = 50) -> str:
    """The effect-labeled distant-supervision variant: the J4b vote uses the
    given role's EFFECT label (how the theme is affected) instead of the
    a0->a1 polarity; frames without an effect for that role contribute no
    vote (the ``try_provide`` -> None path). Single-annotator output."""
    eff_rows = [f"('{_sq(fid)}', '{_sq(lab)}')"
                for fid, lab in sorted(
                    frames_lex.role_effect_map(role).items())]
    assert eff_rows, "doc_opinions_effect oracle needs role effects"
    return (_frames_kg_cte(transcripts_path, synonyms_path, frames_lex,
                           negation_words) + f""",
{_cand_cte(dist_bound)},
feff(frame_id, eff) AS (VALUES {", ".join(eff_rows)}),
votes AS (
  SELECT c.conv_id, c.s_group, c.t_group,
         SUM((CASE WHEN p.eff = 'pos' THEN 1 ELSE -1 END)
             * (CASE WHEN f.negated THEN -1 ELSE 1 END)) AS vote
  FROM cand c
  JOIN fhits f ON f.conv_id = c.conv_id AND f.turn_idx = c.turn_idx
              AND f.ind_in_doc > c.s_ind AND f.ind_in_doc < c.t_ind
  JOIN feff p ON p.frame_id = f.frame_id
  WHERE c.s_ind < c.t_ind AND c.s_group <> c.t_group
  GROUP BY 1, 2, 3
)
SELECT conv_id, s_group, t_group,
       CASE WHEN vote > 0 THEN 'pos' ELSE 'neg' END AS label
FROM votes WHERE vote <> 0
ORDER BY conv_id, s_group, t_group""")


def _cand_cte(dist_bound: int = 50) -> str:
    """The J2/J3 candidate-pair CTE over frames-mode mentions — shared by
    the three-annotator union and the single-annotator effect variant."""
    return f"""cand AS (
  SELECT m1.conv_id, m1.turn_idx,
         m1.ent_id AS s_ent_id, m2.ent_id AS t_ent_id,
         m1.ind_in_doc AS s_ind, m2.ind_in_doc AS t_ind,
         m1.group_key AS s_group, m2.group_key AS t_group
  FROM mentions m1
  JOIN mentions m2
    ON m1.conv_id = m2.conv_id AND m1.turn_idx = m2.turn_idx
   AND m1.ent_id <> m2.ent_id
   AND abs(m1.ind_in_doc - m2.ind_in_doc) <= {dist_bound}
)"""


def _frames_doc_ops_cte(seed_path: str, dist_bound: int = 50,
                        no_label: str = "nolabel") -> str:
    """cand/votes/doc_ops CTEs on top of ``_frames_kg_cte`` (frames-mode
    mentions + hits): the three-annotator union with priorities 0/1/2."""
    return f""",
{_cand_cte(dist_bound)},
nolabel_ops AS (
  SELECT DISTINCT conv_id, s_group, t_group,
         '{no_label}' AS label, 2 AS priority
  FROM cand WHERE s_group <> t_group
),
votes AS (
  SELECT c.conv_id, c.s_group, c.t_group,
         SUM((CASE WHEN p.pol = 'pos' THEN 1 ELSE -1 END)
             * (CASE WHEN f.negated THEN -1 ELSE 1 END)) AS vote
  FROM cand c
  JOIN fhits f ON f.conv_id = c.conv_id AND f.turn_idx = c.turn_idx
              AND f.ind_in_doc > c.s_ind AND f.ind_in_doc < c.t_ind
  JOIN fpol p ON p.frame_id = f.frame_id
  WHERE c.s_ind < c.t_ind AND c.s_group <> c.t_group
  GROUP BY 1, 2, 3
),
frame_ops AS (
  SELECT conv_id, s_group, t_group,
         CASE WHEN vote > 0 THEN 'pos' ELSE 'neg' END AS label, 1 AS priority
  FROM votes WHERE vote <> 0
),
seed_g AS (
  SELECT o.conv_id,
         COALESCE('g' || CAST(ss.group_id AS VARCHAR),
                  'u:' || lower(trim(o.source_value))) AS s_group,
         COALESCE('g' || CAST(st.group_id AS VARCHAR),
                  'u:' || lower(trim(o.target_value))) AS t_group,
         o.label, o.seq
  FROM read_parquet('{seed_path}') o
  LEFT JOIN syn ss ON ss.sid = lower(trim(o.source_value))
  LEFT JOIN syn st ON st.sid = lower(trim(o.target_value))
),
pre_ops AS (
  SELECT conv_id, s_group, t_group, label, 0 AS priority
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, s_group, t_group
                                 ORDER BY seq) AS rn
    FROM seed_g WHERE s_group <> t_group
  ) WHERE rn = 1
),
doc_ops AS (
  SELECT * FROM pre_ops
  UNION ALL SELECT * FROM frame_ops
  UNION ALL SELECT * FROM nolabel_ops
)"""


def triples_frames_sql(transcripts_path: str, synonyms_path: str,
                       seed_path: str, frames_lex,
                       negation_words: tuple[str, ...],
                       dist_bound: int = 50, window: int = 50) -> str:
    """Full EP1 WITH the frame-connotation annotator — the flagship oracle
    (closes the round-1 ``kg_triples`` rows-only gap)."""
    return (_frames_kg_cte(transcripts_path, synonyms_path, frames_lex,
                           negation_words)
            + _frames_doc_ops_cte(seed_path, dist_bound) + f""",
expanded AS (
  SELECT o.conv_id,
         ms.turn_idx AS turn_idx,
         ms.ent_id AS s_ent_id, mt.ent_id AS t_ent_id,
         ms.value AS s_value, mt.value AS t_value,
         o.s_group, o.t_group, o.label, o.priority,
         CAST(abs(ms.ind_in_doc - mt.ind_in_doc) AS BIGINT) AS term_dist
  FROM doc_ops o
  JOIN mentions ms ON ms.conv_id = o.conv_id AND ms.group_key = o.s_group
  JOIN mentions mt ON mt.conv_id = o.conv_id AND mt.group_key = o.t_group
  WHERE ms.ent_id <> mt.ent_id
    AND ms.turn_idx = mt.turn_idx
    AND abs(ms.ind_in_doc - mt.ind_in_doc) < {window}
),
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, s_ent_id, t_ent_id
                                 ORDER BY priority) AS rn
    FROM expanded
  ) WHERE rn = 1
)
SELECT conv_id, turn_idx, s_ent_id, t_ent_id, s_value, t_value,
       s_group, t_group, label, term_dist
FROM deduped
ORDER BY conv_id, s_ent_id, t_ent_id""")


def opinion_rollup_frames_sql(transcripts_path: str, synonyms_path: str,
                              seed_path: str, frames_lex,
                              negation_words: tuple[str, ...]) -> str:
    """A1 AVERAGE over the frame-labeled deduped triples (multi-class
    inputs: pos/neg from the connotation annotator, labels from the seed,
    nolabel elsewhere)."""
    base = triples_frames_sql(transcripts_path, synonyms_path, seed_path,
                              frames_lex, negation_words)
    prefix = base.split("\nSELECT conv_id, turn_idx, s_ent_id")[0]
    return prefix + """
SELECT conv_id, s_group, t_group,
       CASE WHEN SUM(CASE label WHEN 'pos' THEN 1 WHEN 'neg' THEN -1
                     ELSE 0 END) > 0 THEN 'pos'
            WHEN SUM(CASE label WHEN 'pos' THEN 1 WHEN 'neg' THEN -1
                     ELSE 0 END) < 0 THEN 'neg'
            ELSE 'nolabel' END AS label,
       CAST(COUNT(*) AS BIGINT) AS n_contexts
FROM deduped
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3"""


def eval_prf_frames_sql(transcripts_path: str, synonyms_path: str,
                        seed_path: str, frames_lex,
                        negation_words: tuple[str, ...]) -> str:
    """J14+A4 oracle over the frame-labeled rollup: etalon = pos/neg rollup
    opinions, test = deterministic md5 label flip, Extraction-mode full
    outer comparison, per-doc per-class counts + P/R."""
    base = triples_frames_sql(transcripts_path, synonyms_path, seed_path,
                              frames_lex, negation_words)
    prefix = base.split("\nSELECT conv_id, turn_idx, s_ent_id")[0]
    return prefix + """,
rollup AS (
  SELECT conv_id, s_group, t_group,
         CASE WHEN SUM(CASE label WHEN 'pos' THEN 1 WHEN 'neg' THEN -1
                       ELSE 0 END) > 0 THEN 'pos'
              WHEN SUM(CASE label WHEN 'pos' THEN 1 WHEN 'neg' THEN -1
                       ELSE 0 END) < 0 THEN 'neg'
              ELSE 'nolabel' END AS label
  FROM deduped GROUP BY 1, 2, 3
),
etalon AS (
  SELECT conv_id, s_group, t_group, label
  FROM rollup WHERE label IN ('pos', 'neg')
),
test AS (
  SELECT conv_id, s_group, t_group,
         CASE WHEN substr(md5(conv_id || '|' || s_group || '|' || t_group),
                          1, 1) < '4'
              THEN CASE label WHEN 'pos' THEN 'neg'
                              WHEN 'neg' THEN 'pos' ELSE label END
              ELSE label END AS label
  FROM etalon
),
cmp AS (
  SELECT COALESCE(e.conv_id, t.conv_id) AS conv_id,
         e.label AS etalon_label, t.label AS test_label,
         COALESCE(e.label = t.label, FALSE) AS comparison
  FROM etalon e
  FULL OUTER JOIN test t
    ON e.conv_id = t.conv_id AND e.s_group = t.s_group
   AND e.t_group = t.t_group
),
per AS (
  SELECT conv_id, 'pos' AS label,
         CAST(SUM(CASE WHEN comparison AND test_label = 'pos'
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN test_label = 'pos' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_test,
         CAST(SUM(CASE WHEN etalon_label = 'pos' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_etalon
  FROM cmp GROUP BY conv_id
  UNION ALL
  SELECT conv_id, 'neg',
         CAST(SUM(CASE WHEN comparison AND test_label = 'neg'
                       THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN test_label = 'neg' THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN etalon_label = 'neg' THEN 1 ELSE 0 END) AS BIGINT)
  FROM cmp GROUP BY conv_id
)
SELECT conv_id, label, tp, n_test, n_etalon,
       round(CASE WHEN n_test <> 0 THEN tp::DOUBLE / n_test
                  WHEN n_etalon > 0 THEN 0.0 ELSE 1.0 END, 6) AS prec,
       round(CASE WHEN n_etalon <> 0 THEN tp::DOUBLE / n_etalon
                  WHEN n_etalon > 0 THEN 0.0 ELSE 1.0 END, 6) AS rec
FROM per
ORDER BY conv_id, label"""


def doc_opinions_frames_sql(transcripts_path: str, synonyms_path: str,
                            seed_path: str, frames_lex,
                            negation_words: tuple[str, ...]) -> str:
    """Three-annotator doc-opinion union (predefined 0 / frames 1 /
    nolabel 2)."""
    return (_frames_kg_cte(transcripts_path, synonyms_path, frames_lex,
                           negation_words)
            + _frames_doc_ops_cte(seed_path) + """
SELECT conv_id, s_group, t_group, label, CAST(priority AS INT) AS priority
FROM doc_ops
ORDER BY conv_id, s_group, t_group, priority""")


def mentions_noframes_sql(transcripts_path: str, synonyms_path: str) -> str:
    return (_mentions_cte(transcripts_path, synonyms_path) + """
SELECT conv_id, turn_idx, ent_id, pos_in_turn, ind_in_doc, value, group_key
FROM mentions
ORDER BY conv_id, ent_id""")


def mention_tones_sql(transcripts_path: str, synonyms_path: str) -> str:
    """RuSentiLex tone oracle: recompute the deterministic fixture tone
    (hexint(md5(sid)[:15]) % 3 - 1, the engine-portable hex parse) per
    distinct synonym sid and LEFT JOIN it onto the mention table —
    missing term -> 0, the reference ``Lexicon.get_score`` default."""
    return (_mentions_cte(transcripts_path, synonyms_path) + f""",
tone_lex AS (
  SELECT term,
         CAST(CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) % 3 - 1
              AS INT) AS tone
  FROM (SELECT DISTINCT lower(trim(value)) AS term
        FROM read_parquet('{synonyms_path}'))
)
SELECT m.conv_id, m.turn_idx, m.ind_in_doc, m.value,
       CAST(COALESCE(t.tone, 0) AS INT) AS tone
FROM mentions m
LEFT JOIN tone_lex t ON t.term = lower(trim(m.value))
ORDER BY m.conv_id, m.turn_idx, m.ind_in_doc""")


def turn_stats_noframes_sql(transcripts_path: str) -> str:
    return f"""
WITH {_words_cte(transcripts_path)}
SELECT conv_id, turn_idx, CAST(SUM(term_count) AS BIGINT) AS n_terms,
       CAST(SUM(CASE WHEN ent_value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mentions
FROM words GROUP BY conv_id, turn_idx
ORDER BY conv_id, turn_idx"""


def triples_noframes_sql(transcripts_path: str, synonyms_path: str,
                         seed_path: str, dist_bound: int = 50,
                         window: int = 50,
                         no_label: str = "nolabel",
                         entity_types: dict | None = None,
                         whitelist: tuple | None = None) -> str:
    """Full EP1 (frames lexicon empty) in one SQL statement.

    ``whitelist`` (with ``entity_types``, value(lower) -> type) applies the
    J12 entity-type filter AFTER mention numbering — ent_id / ind_in_doc
    keep their unfiltered values, exactly like the engine
    (``pipeline.attach_entity_types`` filters the numbered mention table
    once, feeding both the pair stage and the expansion stage)."""
    mname = "mentions"
    wcte = ""
    if whitelist is not None:
        rows = ", ".join(
            f"('{_sq(v)}', '{_sq(t)}')"
            for v, t in sorted((entity_types or {}).items()))
        wl = ", ".join(f"'{_sq(t)}'" for t in sorted(whitelist))
        wcte = f""",
etypes(value, ent_type) AS (VALUES {rows}),
wmentions AS (
  SELECT m.* FROM mentions m
  JOIN etypes e ON e.value = m.value
  WHERE e.ent_type IN ({wl})
)"""
        mname = "wmentions"
    return (_mentions_cte(transcripts_path, synonyms_path) + wcte + f""",
cand AS (
  SELECT m1.conv_id, m1.group_key AS s_group, m2.group_key AS t_group
  FROM {mname} m1
  JOIN {mname} m2
    ON m1.conv_id = m2.conv_id AND m1.turn_idx = m2.turn_idx
   AND m1.ent_id <> m2.ent_id
   AND abs(m1.ind_in_doc - m2.ind_in_doc) <= {dist_bound}
),
nolabel_ops AS (
  -- priority 2: the frame-connotation annotator (priority 1) sits between
  -- predefined and nolabel; it emits nothing with an empty frames lexicon
  SELECT DISTINCT conv_id, s_group, t_group,
         '{no_label}' AS label, 2 AS priority
  FROM cand WHERE s_group <> t_group
),
seed_g AS (
  SELECT o.conv_id,
         COALESCE('g' || CAST(ss.group_id AS VARCHAR),
                  'u:' || lower(trim(o.source_value))) AS s_group,
         COALESCE('g' || CAST(st.group_id AS VARCHAR),
                  'u:' || lower(trim(o.target_value))) AS t_group,
         o.label, o.seq
  FROM read_parquet('{seed_path}') o
  LEFT JOIN syn ss ON ss.sid = lower(trim(o.source_value))
  LEFT JOIN syn st ON st.sid = lower(trim(o.target_value))
),
pre_ops AS (
  SELECT conv_id, s_group, t_group, label, 0 AS priority
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, s_group, t_group
                                 ORDER BY seq) AS rn
    FROM seed_g WHERE s_group <> t_group
  ) WHERE rn = 1
),
doc_ops AS (
  SELECT * FROM pre_ops UNION ALL SELECT * FROM nolabel_ops
),
expanded AS (
  SELECT o.conv_id,
         ms.turn_idx AS turn_idx,
         ms.ent_id AS s_ent_id, mt.ent_id AS t_ent_id,
         ms.value AS s_value, mt.value AS t_value,
         o.s_group, o.t_group, o.label, o.priority,
         CAST(abs(ms.ind_in_doc - mt.ind_in_doc) AS BIGINT) AS term_dist
  FROM doc_ops o
  JOIN {mname} ms ON ms.conv_id = o.conv_id AND ms.group_key = o.s_group
  JOIN {mname} mt ON mt.conv_id = o.conv_id AND mt.group_key = o.t_group
  WHERE ms.ent_id <> mt.ent_id
    AND ms.turn_idx = mt.turn_idx
    AND abs(ms.ind_in_doc - mt.ind_in_doc) < {window}
),
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, s_ent_id, t_ent_id
                                 ORDER BY priority) AS rn
    FROM expanded
  ) WHERE rn = 1
)
SELECT conv_id, turn_idx, s_ent_id, t_ent_id, s_value, t_value,
       s_group, t_group, label, term_dist
FROM deduped
ORDER BY conv_id, s_ent_id, t_ent_id""")


def doc_opinions_noframes_sql(transcripts_path: str, synonyms_path: str,
                              seed_path: str, dist_bound: int = 50,
                              no_label: str = "nolabel") -> str:
    """Doc-level opinions (union of annotators, with priority)."""
    base = triples_noframes_sql(transcripts_path, synonyms_path, seed_path,
                                dist_bound=dist_bound)
    # reuse CTE prefix up to doc_ops by rebuilding: simpler to re-emit
    prefix = base.split(",\nexpanded AS")[0]
    return prefix + """
SELECT conv_id, s_group, t_group, label, CAST(priority AS INT) AS priority
FROM doc_ops
ORDER BY conv_id, s_group, t_group, priority"""


def opinion_rollup_noframes_sql(transcripts_path: str, synonyms_path: str,
                                seed_path: str) -> str:
    """A1 AVERAGE label aggregation over the deduped mention triples:
    sign(sum(int labels)) per synonym pair (labeling/single.py:6-24)."""
    base = triples_noframes_sql(transcripts_path, synonyms_path, seed_path)
    prefix = base.split("\nSELECT conv_id, turn_idx, s_ent_id")[0]
    return prefix + """
SELECT conv_id, s_group, t_group,
       CASE WHEN SUM(CASE label WHEN 'pos' THEN 1 WHEN 'neg' THEN -1
                     ELSE 0 END) > 0 THEN 'pos'
            WHEN SUM(CASE label WHEN 'pos' THEN 1 WHEN 'neg' THEN -1
                     ELSE 0 END) < 0 THEN 'neg'
            ELSE 'nolabel' END AS label,
       CAST(COUNT(*) AS BIGINT) AS n_contexts
FROM deduped
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3"""


def canonical_nodes_sql(transcripts_path: str, synonyms_path: str,
                        aliases_path: str) -> str:
    """Canonicalization oracle: connected components over group keys via a
    recursive transitive-closure CTE (min node id per component)."""
    w = "u.word"
    return f"""
WITH RECURSIVE
ment AS (
  SELECT lower(substr(u.word, 2, length(u.word) - 2)) AS value
  FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
    FROM read_parquet('{transcripts_path}')
    WHERE trim(text) <> ''
  ) u
  WHERE {ENT_SQL.format(w=w)}
),
syn AS (
  SELECT lower(trim(value)) AS sid, MIN(group_id) AS group_id
  FROM read_parquet('{synonyms_path}') GROUP BY 1
),
grp AS (
  SELECT COALESCE('g' || CAST(s.group_id AS VARCHAR), 'u:' || m.value)
           AS group_key,
         CAST(COUNT(*) AS BIGINT) AS n_mentions
  FROM ment m LEFT JOIN syn s ON s.sid = m.value
  GROUP BY 1
),
al AS (
  SELECT COALESCE('g' || CAST(sa.group_id AS VARCHAR),
                  'u:' || lower(trim(a.value_a))) AS src,
         COALESCE('g' || CAST(sb.group_id AS VARCHAR),
                  'u:' || lower(trim(a.value_b))) AS dst
  FROM read_parquet('{aliases_path}') a
  LEFT JOIN syn sa ON sa.sid = lower(trim(a.value_a))
  LEFT JOIN syn sb ON sb.sid = lower(trim(a.value_b))
),
edges AS (
  SELECT src AS a, dst AS b FROM al WHERE src <> dst
  UNION
  SELECT dst AS a, src AS b FROM al WHERE src <> dst
),
reach(node, root) AS (
  SELECT a AS node, a AS root FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.b AS node, r.root
  FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (SELECT node, MIN(root) AS component FROM reach GROUP BY node)
SELECT g.group_key,
       COALESCE(c.component, g.group_key) AS canon_id,
       g.n_mentions
FROM grp g LEFT JOIN comp c ON c.node = g.group_key
ORDER BY g.group_key"""


_TOKEN_MAP = {
    ",": "<[,]>", ".": "<[.]>", "…": "<[…]>", ":": "<[:]>", ";": "<[;]>",
    "-": "<[-]>", "—": "<[long_dash]>", "?": "<[?]>", "!": "<[!]>",
    "(": "<[OPEN_BRACKET]>", ")": "<[CLOSED_BRACKET]>",
    "{": "<[OPEN_BRACKET]>", "}": "<[CLOSED_BRACKET]>",
    "[": "<[OPEN_BRACKET]>", "]": "<[CLOSED_BRACKET]>",
    "«": "<[QUOTE]>", "»": "<[QUOTE]>", '"': "<[QUOTE]>",
}


def samples_noframes_sql(transcripts_path: str, synonyms_path: str,
                         seed_path: str, types_map: dict[str, str],
                         dist_bound: int = 50, window: int = 50,
                         text_b_template: str | None = None) -> str:
    """EP2 oracle (no-frames): the full sample table — #S/#O/#E masking as a
    per-sample ordered string aggregation over the term stream, entity
    columns, uint labels, content-derived ids (operators/samples.py).
    ``text_b_template`` adds the pair provider's second segment: the inner
    span between the mentions, index-masked at the SPAN ends."""
    text_b_col = ""
    if text_b_template is not None:
        pre, _, post = text_b_template.partition("{context}")
        pre = _sq(pre.format(subject="#S", object="#O"))
        post = _sq(post.format(subject="#S", object="#O"))
        text_b_col = f"""
  '{pre}' || string_agg(
    CASE WHEN t.kind = 'e' THEN
           CASE WHEN t.tidx = least(d.s_pos, d.t_pos) THEN '#S'
                WHEN t.tidx = greatest(d.s_pos, d.t_pos) THEN '#O'
                WHEN COALESCE('g' || CAST(s.group_id AS VARCHAR),
                              'u:' || t.ent_value) = d.s_group THEN '#S'
                WHEN COALESCE('g' || CAST(s.group_id AS VARCHAR),
                              'u:' || t.ent_value) = d.t_group THEN '#O'
                ELSE '#E' END
         ELSE t.ttext END, ' ' ORDER BY t.tidx)
    FILTER (WHERE t.tidx BETWEEN least(d.s_pos, d.t_pos)
                             AND greatest(d.s_pos, d.t_pos))
    || '{post}' AS text_b,"""
    tok_case = " ".join(
        f"WHEN tok = '{_sq(c)}' THEN '{_sq(v)}'"
        for c, v in sorted(_TOKEN_MAP.items()))
    if types_map:
        trows = ", ".join(f"('{_sq(k)}', '{_sq(v)}')"
                          for k, v in sorted(types_map.items()))
        types_cte = f"etypes(value, ent_type) AS (VALUES {trows})"
    else:
        types_cte = ("etypes(value, ent_type) AS "
                     "(SELECT NULL, NULL WHERE FALSE)")
    w = "u.word"
    return f"""
WITH words AS (
  SELECT conv_id, turn_idx, u.word, u.ord,
         {ENT_SQL.format(w=w)} AS is_ent,
         {URL_SQL.format(w=w)} AS is_url,
         CASE WHEN {ENT_SQL.format(w=w)}
              THEN lower(substr(u.word, 2, length(u.word) - 2)) END AS ent_value
  FROM (
    SELECT conv_id, turn_idx,
           unnest(string_split_regex(trim(text), '\\s+')) AS word,
           generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS ord
    FROM read_parquet('{transcripts_path}')
    WHERE trim(text) <> ''
  ) u
),
terms1 AS (
  SELECT conv_id, turn_idx, ord, is_ent, is_url, ent_value,
         unnest(toks) AS tok, generate_subscripts(toks, 1) AS sub
  FROM (
    SELECT *, CASE WHEN is_ent OR is_url THEN [word]
                   ELSE regexp_extract_all(word, '{FSM_SQL}') END AS toks
    FROM words
  )
),
terms AS (
  SELECT conv_id, turn_idx, ent_value,
         CASE WHEN is_ent THEN 'e'
              WHEN is_url OR regexp_matches(tok, '^[0-9]+$')
                   OR (length(tok) = 1 AND NOT regexp_matches(tok, '^[0-9]$')
                       AND ({" OR ".join(f"tok = '{_sq(c)}'" for c in sorted(_TOKEN_MAP))}))
                   THEN 't'
              ELSE 'w' END AS kind,
         CASE WHEN is_ent THEN ent_value
              WHEN is_url THEN '<[URL]>'
              WHEN regexp_matches(tok, '^[0-9]+$') THEN '<[NUMBER]>'
              {tok_case}
              ELSE tok END AS ttext,
         CAST(ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
              ORDER BY ord, sub) - 1 AS BIGINT) AS tidx
  FROM terms1
),
syn AS (
  SELECT lower(trim(value)) AS sid, MIN(group_id) AS group_id
  FROM read_parquet('{synonyms_path}') GROUP BY 1
),
{types_cte},
mentions AS (
  SELECT t.conv_id, t.turn_idx,
         t.tidx AS pos_in_turn,
         CAST(o.term_offset + t.tidx AS BIGINT) AS ind_in_doc,
         t.ent_value AS value,
         CAST(ROW_NUMBER() OVER (PARTITION BY t.conv_id
              ORDER BY t.turn_idx, t.tidx) - 1 AS BIGINT) AS ent_id,
         COALESCE('g' || CAST(s.group_id AS VARCHAR),
                  'u:' || trim(t.ent_value)) AS group_key
  FROM terms t
  JOIN (
    SELECT conv_id, turn_idx, n_terms,
           CAST(COALESCE(SUM(n_terms) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS term_offset
    FROM (SELECT conv_id, turn_idx, COUNT(*) AS n_terms
          FROM terms GROUP BY 1, 2)
  ) o USING (conv_id, turn_idx)
  LEFT JOIN syn s ON s.sid = trim(t.ent_value)
  WHERE t.kind = 'e'
),
cand AS (
  SELECT m1.conv_id, m1.group_key AS s_group, m2.group_key AS t_group
  FROM mentions m1
  JOIN mentions m2
    ON m1.conv_id = m2.conv_id AND m1.turn_idx = m2.turn_idx
   AND m1.ent_id <> m2.ent_id
   AND abs(m1.ind_in_doc - m2.ind_in_doc) <= {dist_bound}
),
nolabel_ops AS (
  SELECT DISTINCT conv_id, s_group, t_group, 'nolabel' AS label, 2 AS priority
  FROM cand WHERE s_group <> t_group
),
seed_g AS (
  SELECT o.conv_id,
         COALESCE('g' || CAST(ss.group_id AS VARCHAR),
                  'u:' || lower(trim(o.source_value))) AS s_group,
         COALESCE('g' || CAST(st.group_id AS VARCHAR),
                  'u:' || lower(trim(o.target_value))) AS t_group,
         o.label, o.seq
  FROM read_parquet('{seed_path}') o
  LEFT JOIN syn ss ON ss.sid = lower(trim(o.source_value))
  LEFT JOIN syn st ON st.sid = lower(trim(o.target_value))
),
pre_ops AS (
  SELECT conv_id, s_group, t_group, label, 0 AS priority
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, s_group, t_group
                                 ORDER BY seq) AS rn
    FROM seed_g WHERE s_group <> t_group
  ) WHERE rn = 1
),
doc_ops AS (SELECT * FROM pre_ops UNION ALL SELECT * FROM nolabel_ops),
deduped AS (
  SELECT * FROM (
    SELECT e.*, ROW_NUMBER() OVER (PARTITION BY conv_id, s_ent_id, t_ent_id
                                   ORDER BY priority) AS rn
    FROM (
      SELECT o.conv_id, ms.turn_idx AS turn_idx,
             ms.ent_id AS s_ent_id, mt.ent_id AS t_ent_id,
             ms.pos_in_turn AS s_pos, mt.pos_in_turn AS t_pos,
             o.s_group, o.t_group, o.label, o.priority
      FROM doc_ops o
      JOIN mentions ms ON ms.conv_id = o.conv_id AND ms.group_key = o.s_group
      JOIN mentions mt ON mt.conv_id = o.conv_id AND mt.group_key = o.t_group
      WHERE ms.ent_id <> mt.ent_id
        AND ms.turn_idx = mt.turn_idx
        AND abs(ms.ind_in_doc - mt.ind_in_doc) < {window}
    ) e
  ) WHERE rn = 1
)
SELECT
  'o' || d.conv_id || '_' || CAST(d.s_ent_id AS VARCHAR) || '_'
      || CAST(d.t_ent_id AS VARCHAR) || '_i0' AS id,
  d.conv_id AS doc_id,
  CAST(d.turn_idx AS INT) AS sent_ind,
  CAST(CASE d.label WHEN 'nolabel' THEN 0 WHEN 'pos' THEN 1
       WHEN 'neg' THEN 2 END AS INT) AS label,
  string_agg(
    CASE WHEN t.kind = 'e' THEN
           CASE WHEN t.tidx = d.s_pos THEN '#S'
                WHEN t.tidx = d.t_pos THEN '#O'
                WHEN COALESCE('g' || CAST(s.group_id AS VARCHAR),
                              'u:' || t.ent_value) = d.s_group THEN '#S'
                WHEN COALESCE('g' || CAST(s.group_id AS VARCHAR),
                              'u:' || t.ent_value) = d.t_group THEN '#O'
                ELSE '#E' END
         ELSE t.ttext END, ' ' ORDER BY t.tidx) AS text_a,{text_b_col}
  string_agg(replace(t.ent_value, ',', ''), ',' ORDER BY t.tidx)
    FILTER (WHERE t.kind = 'e') AS entity_values,
  string_agg(COALESCE(ty.ent_type, ''), ',' ORDER BY t.tidx)
    FILTER (WHERE t.kind = 'e') AS entity_types,
  string_agg(CAST(t.tidx AS VARCHAR), ',' ORDER BY t.tidx)
    FILTER (WHERE t.kind = 'e') AS entities,
  d.s_pos AS s_ind,
  d.t_pos AS t_ind
FROM deduped d
JOIN terms t ON t.conv_id = d.conv_id AND t.turn_idx = d.turn_idx
LEFT JOIN syn s ON t.kind = 'e' AND s.sid = trim(t.ent_value)
LEFT JOIN etypes ty ON t.kind = 'e' AND ty.value = t.ent_value
GROUP BY d.conv_id, d.turn_idx, d.s_ent_id, d.t_ent_id, d.s_pos, d.t_pos,
         d.s_group, d.t_group, d.label
ORDER BY id"""


def knn_bruteforce_sql(n_queries: int = 10, k: int = 10, dim: int = 64) -> str:
    """Exact arithmetic replica of functions/similarity.knn_bruteforce:
    sequential double fold for dot/norms, rounded-score ranking."""
    dot = ("list_sum(list_transform(range(1, {d} + 1), "
           "i -> (q.embedding[i]::DOUBLE) * (c.embedding[i]::DOUBLE)))"
           .format(d=dim))
    nq = ("list_sum(list_transform(range(1, {d} + 1), "
          "i -> (q.embedding[i]::DOUBLE) * (q.embedding[i]::DOUBLE)))"
          .format(d=dim))
    nc = ("list_sum(list_transform(range(1, {d} + 1), "
          "i -> (c.embedding[i]::DOUBLE) * (c.embedding[i]::DOUBLE)))"
          .format(d=dim))
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(round({dot} / (sqrt({nq}) * sqrt({nc})) * 100000, 0) AS BIGINT)
           AS cos_e5
  FROM embeddings q, embeddings c
  WHERE q.vec_id < {n_queries} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos_e5 DESC, neighbor_id) AS INT) AS rank,
       cos_e5
FROM scored
QUALIFY rank <= {k}
ORDER BY query_id, rank"""


def knn_ivf_sql(n_queries: int = 10, k: int = 10, dim: int = 64,
                n_lists: int = 16, nprobe: int = 4) -> str:
    """Replica of functions/similarity.knn_ivf: md5-sampled centroids,
    rounded-score argmax assignment, nprobe list probing, exact re-rank."""

    def cos(a, b):
        dot = (f"list_sum(list_transform(range(1, {dim} + 1), "
               f"i -> ({a}.embedding[i]::DOUBLE) * ({b}.embedding[i]::DOUBLE)))")
        na = (f"list_sum(list_transform(range(1, {dim} + 1), "
              f"i -> ({a}.embedding[i]::DOUBLE) * ({a}.embedding[i]::DOUBLE)))")
        nb = (f"list_sum(list_transform(range(1, {dim} + 1), "
              f"i -> ({b}.embedding[i]::DOUBLE) * ({b}.embedding[i]::DOUBLE)))")
        return (f"CAST(round({dot} / (sqrt({na}) * sqrt({nb})) * 100000, 0) "
                "AS BIGINT)")

    return f"""
WITH cent AS (
  SELECT vec_id, embedding,
         CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
              vec_id) AS INT) AS list_id
  FROM embeddings
  QUALIFY list_id <= {n_lists}
),
assigned AS (
  -- window aliases must be distinct across CTEs: an unqualified name in a
  -- later QUALIFY would resolve to the carried-through column (always 1),
  -- silently disabling the filter
  SELECT e.vec_id, e.embedding, c.list_id,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY {cos('e', 'c')} DESC, c.list_id) AS arn
  FROM embeddings e, cent c
  QUALIFY arn = 1
),
probed AS (
  SELECT q.vec_id AS query_id, q.embedding, c.list_id,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY {cos('q', 'c')} DESC, c.list_id) AS prn
  FROM assigned q, cent c
  WHERE q.vec_id < {n_queries}
  QUALIFY prn <= {nprobe}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, {cos('p', 'a')} AS cos_e5
  FROM probed p JOIN assigned a ON a.list_id = p.list_id
  WHERE p.query_id <> a.vec_id
)
SELECT query_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos_e5 DESC, neighbor_id) AS INT) AS rank,
       cos_e5
FROM scored
QUALIFY rank <= {k}
ORDER BY query_id, rank"""


def knn_lsh_sql(table_planes: list, n_queries: int = 10, k: int = 10,
                dim: int = 64, multiprobe: bool = True) -> str:
    """Replica of functions/similarity.knn_lsh: the per-table SRP bucket ids
    are recomputed from the SAME literal hyperplanes (inlined by the
    builder), candidates = same bucket in ANY table — or, with multi-probe
    (the engine default), hamming distance <= 1 between the per-table
    signatures (exactly the query-side hamming-1 bucket explosion) — then
    exact rounded-cosine rerank. The projection sum is written as an
    explicit left-associative chain so the float summation order matches
    Spark's sequential ``aggregate`` fold bit-for-bit (same bucket
    signs)."""

    def proj(prefix: str, plane: list[float]) -> str:
        return " + ".join(
            f"({prefix}.embedding[{i + 1}]::DOUBLE) * ({p!r})"
            for i, p in enumerate(plane))

    def bucket(prefix: str, planes: list[list[float]]) -> str:
        bits = [f"(CASE WHEN {proj(prefix, plane)} >= 0 "
                f"THEN {2 ** i} ELSE 0 END)"
                for i, plane in enumerate(planes)]
        return "(" + " + ".join(bits) + ")"

    bcols = ", ".join(
        f"{bucket('e', planes)} AS b{t}"
        for t, planes in enumerate(table_planes))
    if multiprobe:
        same_bucket = " OR ".join(
            f"bit_count(xor(q.b{t}, c.b{t})) <= 1"
            for t in range(len(table_planes)))
    else:
        same_bucket = " OR ".join(
            f"q.b{t} = c.b{t}" for t in range(len(table_planes)))
    dot = (f"list_sum(list_transform(range(1, {dim} + 1), "
           "i -> (q.embedding[i]::DOUBLE) * (c.embedding[i]::DOUBLE)))")
    nq = (f"list_sum(list_transform(range(1, {dim} + 1), "
          "i -> (q.embedding[i]::DOUBLE) * (q.embedding[i]::DOUBLE)))")
    nc = (f"list_sum(list_transform(range(1, {dim} + 1), "
          "i -> (c.embedding[i]::DOUBLE) * (c.embedding[i]::DOUBLE)))")
    return f"""
WITH b AS (
  SELECT e.vec_id, e.embedding, {bcols}
  FROM embeddings e
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(round({dot} / (sqrt({nq}) * sqrt({nc})) * 100000, 0) AS BIGINT)
           AS cos_e5
  FROM b q JOIN b c
    ON q.vec_id < {n_queries} AND q.vec_id <> c.vec_id
   AND ({same_bucket})
)
SELECT query_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos_e5 DESC, neighbor_id) AS INT) AS rank,
       cos_e5
FROM scored
QUALIFY rank <= {k}
ORDER BY query_id, rank"""


def dedup_embedding_sql(threshold: float = 0.95, bucket_dims: int = 4,
                        dim: int = 64) -> str:
    """Replica of functions/dedup.embedding_near_dup: sign buckets on the
    leading dims, exact cosine (float multiply THEN double cast, matching
    the engine's ``(x*y).cast('double')`` order) on same-bucket pairs.
    Explicit left-associative sums replicate the sequential fold."""
    bits = " + ".join(
        f"(CASE WHEN embedding[{d + 1}] >= 0 THEN {2 ** d} ELSE 0 END)"
        for d in range(bucket_dims))
    dot = " + ".join(
        f"CAST(a.embedding[{i + 1}] * c.embedding[{i + 1}] AS DOUBLE)"
        for i in range(dim))
    na = " + ".join(
        f"CAST(a.embedding[{i + 1}] * a.embedding[{i + 1}] AS DOUBLE)"
        for i in range(dim))
    nc = " + ".join(
        f"CAST(c.embedding[{i + 1}] * c.embedding[{i + 1}] AS DOUBLE)"
        for i in range(dim))
    t = int(round(threshold * 1_000_000))
    return f"""
WITH b AS (
  SELECT vec_id, embedding, ({bits}) AS bucket FROM embeddings
),
scored AS (
  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
         CAST(round(({dot}) / (sqrt({na}) * sqrt({nc})) * 1000000, 0)
              AS BIGINT) AS cos_e6
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
)
SELECT vec_a, vec_b, cos_e6 FROM scored WHERE cos_e6 >= {t}
ORDER BY vec_a, vec_b"""


def eval_micro_sql(synonyms_path: str, seed_path: str) -> str:
    """A5 micro P/R oracle over the same deterministic etalon/md5-flip
    comparison as eval_prf_noframes: corpus-level TP / test / etalon counts
    with the reference's 1e-5 zero-guards (metrics_pr.py:38-55)."""
    base = eval_prf_noframes_sql(synonyms_path, seed_path)
    prefix = base.split("\nper AS (")[0].rstrip().rstrip(",")
    return prefix + """
SELECT
  CAST(SUM(CASE WHEN comparison AND test_label IN ('pos', 'neg')
                THEN 1 ELSE 0 END) AS BIGINT) AS tp,
  CAST(SUM(CASE WHEN test_label IN ('pos', 'neg') THEN 1 ELSE 0 END)
       AS BIGINT) AS n_test,
  CAST(SUM(CASE WHEN etalon_label IN ('pos', 'neg') THEN 1 ELSE 0 END)
       AS BIGINT) AS n_etalon,
  round(SUM(CASE WHEN comparison AND test_label IN ('pos', 'neg')
                 THEN 1 ELSE 0 END)::DOUBLE
        / greatest(SUM(CASE WHEN test_label IN ('pos', 'neg')
                            THEN 1 ELSE 0 END)::DOUBLE, 1e-5), 6)
    AS prec_micro,
  round(SUM(CASE WHEN comparison AND test_label IN ('pos', 'neg')
                 THEN 1 ELSE 0 END)::DOUBLE
        / greatest(SUM(CASE WHEN etalon_label IN ('pos', 'neg')
                            THEN 1 ELSE 0 END)::DOUBLE, 1e-5), 6)
    AS rec_micro
FROM cmp"""


def eval_macro_sql(synonyms_path: str, seed_path: str) -> str:
    """A6+A7 oracle — the reference's macro aggregation
    (two_class_prf.py:86-114): per-doc P/R (with empty-set conventions)
    averaged over docs, THEN per-class F1 (0 when p*r == 0), THEN the final
    macro F1; accuracy = per-doc acc (metrics_acc.py 1e-5 guard) averaged."""
    base = eval_prf_noframes_sql(synonyms_path, seed_path)
    prefix = base.split("\nSELECT conv_id, label, tp")[0]
    return prefix + """,
prd AS (
  SELECT label,
         CASE WHEN n_test <> 0 THEN tp::DOUBLE / n_test
              WHEN n_etalon > 0 THEN 0.0 ELSE 1.0 END AS prec,
         CASE WHEN n_etalon <> 0 THEN tp::DOUBLE / n_etalon
              WHEN n_etalon > 0 THEN 0.0 ELSE 1.0 END AS rec
  FROM per
),
lab AS (
  SELECT AVG(CASE WHEN label = 'pos' THEN prec END) AS pos_prec,
         AVG(CASE WHEN label = 'pos' THEN rec END) AS pos_rec,
         AVG(CASE WHEN label = 'neg' THEN prec END) AS neg_prec,
         AVG(CASE WHEN label = 'neg' THEN rec END) AS neg_rec
  FROM prd
),
accd AS (
  SELECT conv_id,
         SUM(CASE WHEN comparison THEN 1 ELSE 0 END)::DOUBLE
           / greatest(COUNT(*)::DOUBLE, 1e-5) AS acc
  FROM cmp GROUP BY conv_id
),
accm AS (SELECT AVG(acc) AS acc FROM accd),
f1s AS (
  SELECT pos_prec, pos_rec, neg_prec, neg_rec,
         CASE WHEN pos_prec * pos_rec <> 0
              THEN 2 * pos_prec * pos_rec / (pos_prec + pos_rec)
              ELSE 0.0 END AS f1_pos,
         CASE WHEN neg_prec * neg_rec <> 0
              THEN 2 * neg_prec * neg_rec / (neg_prec + neg_rec)
              ELSE 0.0 END AS f1_neg
  FROM lab
)
SELECT round(acc, 6) AS acc,
       round(pos_prec, 6) AS pos_prec, round(pos_rec, 6) AS pos_rec,
       round(neg_prec, 6) AS neg_prec, round(neg_rec, 6) AS neg_rec,
       round(f1_pos, 6) AS f1_pos, round(f1_neg, 6) AS f1_neg,
       round((f1_pos + f1_neg) / 2, 6) AS f1
FROM f1s, accm"""


def eval_prf_noframes_sql(synonyms_path: str, seed_path: str) -> str:
    """J14+A4 oracle: etalon = predefined doc opinions from the seed file;
    test = deterministic md5-flip of labels; Extraction-mode full-outer
    comparison; per-doc per-class exact counts + per-row P/R divisions."""
    return f"""
WITH syn AS (
  SELECT lower(trim(value)) AS sid, MIN(group_id) AS group_id
  FROM read_parquet('{synonyms_path}') GROUP BY 1
),
seed_g AS (
  SELECT o.conv_id,
         COALESCE('g' || CAST(ss.group_id AS VARCHAR),
                  'u:' || lower(trim(o.source_value))) AS s_group,
         COALESCE('g' || CAST(st.group_id AS VARCHAR),
                  'u:' || lower(trim(o.target_value))) AS t_group,
         o.label, o.seq
  FROM read_parquet('{seed_path}') o
  LEFT JOIN syn ss ON ss.sid = lower(trim(o.source_value))
  LEFT JOIN syn st ON st.sid = lower(trim(o.target_value))
),
etalon AS (
  SELECT conv_id, s_group, t_group, label
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, s_group, t_group
                                 ORDER BY seq) AS rn
    FROM seed_g WHERE s_group <> t_group
  ) WHERE rn = 1
),
test AS (
  SELECT conv_id, s_group, t_group,
         CASE WHEN substr(md5(conv_id || '|' || s_group || '|' || t_group),
                          1, 1) < '4'
              THEN CASE label WHEN 'pos' THEN 'neg'
                              WHEN 'neg' THEN 'pos' ELSE label END
              ELSE label END AS label
  FROM etalon
),
cmp AS (
  SELECT COALESCE(e.conv_id, t.conv_id) AS conv_id,
         e.label AS etalon_label, t.label AS test_label,
         COALESCE(e.label = t.label, FALSE) AS comparison
  FROM etalon e
  FULL OUTER JOIN test t
    ON e.conv_id = t.conv_id AND e.s_group = t.s_group
   AND e.t_group = t.t_group
),
per AS (
  SELECT conv_id, 'pos' AS label,
         CAST(SUM(CASE WHEN comparison AND test_label = 'pos'
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN test_label = 'pos' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_test,
         CAST(SUM(CASE WHEN etalon_label = 'pos' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_etalon
  FROM cmp GROUP BY conv_id
  UNION ALL
  SELECT conv_id, 'neg',
         CAST(SUM(CASE WHEN comparison AND test_label = 'neg'
                       THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN test_label = 'neg' THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN etalon_label = 'neg' THEN 1 ELSE 0 END) AS BIGINT)
  FROM cmp GROUP BY conv_id
)
SELECT conv_id, label, tp, n_test, n_etalon,
       round(CASE WHEN n_test <> 0 THEN tp::DOUBLE / n_test
                  WHEN n_etalon > 0 THEN 0.0 ELSE 1.0 END, 6) AS prec,
       round(CASE WHEN n_etalon <> 0 THEN tp::DOUBLE / n_etalon
                  WHEN n_etalon > 0 THEN 0.0 ELSE 1.0 END, 6) AS rec
FROM per
ORDER BY conv_id, label"""


def eval_accuracy_sql(synonyms_path: str, seed_path: str) -> str:
    """A7 oracle — per-document accuracy over the deterministic
    etalon/md5-flip comparison with the reference's 1e-5 zero-guard
    (``metrics_acc.py``: correct / max(total, 1e-5) per document)."""
    base = eval_prf_noframes_sql(synonyms_path, seed_path)
    prefix = base.split("\nper AS (")[0].rstrip().rstrip(",")
    return prefix + """
SELECT conv_id,
       round(SUM(CASE WHEN comparison THEN 1 ELSE 0 END)::DOUBLE
             / greatest(COUNT(*)::DOUBLE, 1e-5), 6) AS acc
FROM cmp GROUP BY conv_id ORDER BY conv_id"""


def eval_context_prf_sql(transcripts_path: str, synonyms_path: str,
                         seed_path: str) -> str:
    """J15 oracle — CONTEXT-level comparison (``text_opinions.py:16-25``:
    keyed by doc + sentence + source id + target id, not by synonym
    groups): etalon = the deduped mention-level triples of the no-frames
    pipeline; test = deterministic md5 flip of pos/neg on the context key;
    per-doc per-class exact counts + P/R with the empty-set conventions."""
    base = triples_noframes_sql(transcripts_path, synonyms_path, seed_path)
    prefix = base.split("\nSELECT conv_id, turn_idx, s_ent_id")[0]
    return prefix + """,
ctx_test AS (
  SELECT conv_id, turn_idx, s_ent_id, t_ent_id,
         CASE WHEN substr(md5(conv_id || '|' || CAST(turn_idx AS VARCHAR)
                           || '|' || CAST(s_ent_id AS VARCHAR)
                           || '|' || CAST(t_ent_id AS VARCHAR)), 1, 1) < '4'
              THEN CASE label WHEN 'pos' THEN 'neg'
                              WHEN 'neg' THEN 'pos' ELSE label END
              ELSE label END AS label
  FROM deduped
),
ctx_cmp AS (
  SELECT COALESCE(e.conv_id, t.conv_id) AS conv_id,
         e.label AS etalon_label, t.label AS test_label,
         COALESCE(e.label = t.label, FALSE) AS comparison
  FROM deduped e
  FULL OUTER JOIN ctx_test t
    ON e.conv_id = t.conv_id AND e.turn_idx = t.turn_idx
   AND e.s_ent_id = t.s_ent_id AND e.t_ent_id = t.t_ent_id
),
ctx_per AS (
  SELECT conv_id, 'pos' AS label,
         CAST(SUM(CASE WHEN comparison AND test_label = 'pos'
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN test_label = 'pos' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_test,
         CAST(SUM(CASE WHEN etalon_label = 'pos' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_etalon
  FROM ctx_cmp GROUP BY conv_id
  UNION ALL
  SELECT conv_id, 'neg',
         CAST(SUM(CASE WHEN comparison AND test_label = 'neg'
                       THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN test_label = 'neg' THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN etalon_label = 'neg' THEN 1 ELSE 0 END) AS BIGINT)
  FROM ctx_cmp GROUP BY conv_id
)
SELECT conv_id, label, tp, n_test, n_etalon,
       round(CASE WHEN n_test <> 0 THEN tp::DOUBLE / n_test
                  WHEN n_etalon > 0 THEN 0.0 ELSE 1.0 END, 6) AS prec,
       round(CASE WHEN n_etalon <> 0 THEN tp::DOUBLE / n_etalon
                  WHEN n_etalon > 0 THEN 0.0 ELSE 1.0 END, 6) AS rec
FROM ctx_per
ORDER BY conv_id, label"""


def balanced_counts_sql(transcripts_path: str, synonyms_path: str,
                        seed_path: str, types_map: dict[str, str]) -> str:
    """A3 oracle — the class-balancing invariant of
    ``PandasBasedRowsStorage._balance`` (every label class oversampled to
    exactly the majority-class size): per-uint-label balanced row count
    (== majority size for every class) plus the distinct source-sample
    count the class was inflated from."""
    base = samples_noframes_sql(transcripts_path, synonyms_path, seed_path,
                                types_map)
    return f"""
WITH s AS ({base}),
c AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_src_ids
  FROM s GROUP BY label
),
m AS (SELECT MAX(n_src_ids) AS mx FROM c)
SELECT c.label, CAST(m.mx AS BIGINT) AS n_out, c.n_src_ids
FROM c, m ORDER BY c.label"""


def canonical_edges_sql(transcripts_path: str, synonyms_path: str,
                        seed_path: str, aliases_path: str) -> str:
    """North-rule graph materialization oracle — the canonical EDGE table:
    doc-level opinions (J9-deduped by annotator priority) with both
    endpoints re-pointed at their alias-connected-component canonical id
    (recursive transitive closure, min node id per component), aggregated
    per (src, dst, label)."""
    base = triples_noframes_sql(transcripts_path, synonyms_path, seed_path)
    prefix = base.split(",\nexpanded AS")[0]
    prefix = prefix.replace("WITH ", "WITH RECURSIVE ", 1)
    return prefix + _canonical_suffix(aliases_path)


def canonical_edges_frames_sql(transcripts_path: str, synonyms_path: str,
                               seed_path: str, aliases_path: str,
                               frames_lex,
                               negation_words: tuple[str, ...]) -> str:
    """FRAMES-mode canonical edge table — the doc_ops CTE is the full
    three-annotator union (predefined 0 / frame-connotation 1 / nolabel 2)
    instead of the noframes pair; suffix (alias CC + priority dedup +
    rollup) identical.  This is what the RUNNER materializes per bucket
    (``runner.run_bucket`` writes frames-live doc opinions), so the
    materialized-path queries check against this oracle."""
    return (_frames_kg_cte(transcripts_path, synonyms_path, frames_lex,
                           negation_words)
            + _frames_doc_ops_cte(seed_path)
            + _canonical_suffix(aliases_path))


def _canonical_suffix(aliases_path: str) -> str:
    """alias CC + priority dedup + (src, dst, label) rollup over a
    ``doc_ops`` CTE (shared by the noframes and frames variants)."""
    return f""",
al AS (
  SELECT COALESCE('g' || CAST(sa.group_id AS VARCHAR),
                  'u:' || lower(trim(a.value_a))) AS src,
         COALESCE('g' || CAST(sb.group_id AS VARCHAR),
                  'u:' || lower(trim(a.value_b))) AS dst
  FROM read_parquet('{aliases_path}') a
  LEFT JOIN syn sa ON sa.sid = lower(trim(a.value_a))
  LEFT JOIN syn sb ON sb.sid = lower(trim(a.value_b))
),
aledges AS (
  SELECT src AS a, dst AS b FROM al WHERE src <> dst
  UNION
  SELECT dst AS a, src AS b FROM al WHERE src <> dst
),
reach(node, root) AS (
  SELECT a AS node, a AS root FROM (SELECT DISTINCT a FROM aledges)
  UNION
  SELECT e.b AS node, r.root
  FROM reach r JOIN aledges e ON e.a = r.node
),
comp AS (SELECT node, MIN(root) AS component FROM reach GROUP BY node),
dedup_ops AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, s_group, t_group
                                 ORDER BY priority) AS rn
    FROM doc_ops
  ) WHERE rn = 1
)
SELECT COALESCE(cs.component, d.s_group) AS src,
       COALESCE(ct.component, d.t_group) AS dst,
       d.label,
       CAST(COUNT(*) AS BIGINT) AS n_ops
FROM dedup_ops d
LEFT JOIN comp cs ON cs.node = d.s_group
LEFT JOIN comp ct ON ct.node = d.t_group
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3"""


def opinion_rollup_first_sql(transcripts_path: str, synonyms_path: str,
                             seed_path: str, frames_lex,
                             negation_words: tuple[str, ...]) -> str:
    """A1 FIRST_APPEARED over the frame-labeled deduped triples
    (``single.py:6-14``): the label of the first text opinion in linkage
    order — re-derived deterministically as (priority, s_ent_id, t_ent_id)
    — per synonym pair."""
    base = triples_frames_sql(transcripts_path, synonyms_path, seed_path,
                              frames_lex, negation_words)
    prefix = base.split("\nSELECT conv_id, turn_idx, s_ent_id")[0]
    return prefix + """,
linked AS (
  SELECT conv_id, s_group, t_group, label,
         ROW_NUMBER() OVER (PARTITION BY conv_id, s_group, t_group
                            ORDER BY priority, s_ent_id, t_ent_id) AS lrn,
         COUNT(*) OVER (PARTITION BY conv_id, s_group, t_group)
           AS n_contexts
  FROM deduped
)
SELECT conv_id, s_group, t_group, label,
       CAST(n_contexts AS BIGINT) AS n_contexts
FROM linked WHERE lrn = 1
ORDER BY conv_id, s_group, t_group"""


def _cooccurrence_ctes(transcripts_path: str, synonyms_path: str,
                       aliases_path: str) -> str:
    """Shared CTE chain for the graph-analytics oracles: per-conversation
    canonical entity sets (alias connected components applied to synonym
    group keys) -> unordered co-occurrence pairs with node frequencies."""
    w = "u.word"
    return f"""
WITH RECURSIVE
ment AS (
  SELECT conv_id, lower(substr(u.word, 2, length(u.word) - 2)) AS value
  FROM (
    SELECT conv_id,
           unnest(string_split_regex(trim(text), '\\s+')) AS word
    FROM read_parquet('{transcripts_path}')
    WHERE trim(text) <> ''
  ) u
  WHERE {ENT_SQL.format(w=w)}
),
syn AS (
  SELECT lower(trim(value)) AS sid, MIN(group_id) AS group_id
  FROM read_parquet('{synonyms_path}') GROUP BY 1
),
al AS (
  SELECT COALESCE('g' || CAST(sa.group_id AS VARCHAR),
                  'u:' || lower(trim(a.value_a))) AS src,
         COALESCE('g' || CAST(sb.group_id AS VARCHAR),
                  'u:' || lower(trim(a.value_b))) AS dst
  FROM read_parquet('{aliases_path}') a
  LEFT JOIN syn sa ON sa.sid = lower(trim(a.value_a))
  LEFT JOIN syn sb ON sb.sid = lower(trim(a.value_b))
),
aledges AS (
  SELECT src AS a, dst AS b FROM al WHERE src <> dst
  UNION
  SELECT dst AS a, src AS b FROM al WHERE src <> dst
),
reach(node, root) AS (
  SELECT a AS node, a AS root FROM (SELECT DISTINCT a FROM aledges)
  UNION
  SELECT e.b AS node, r.root
  FROM reach r JOIN aledges e ON e.a = r.node
),
comp AS (SELECT node, MIN(root) AS component FROM reach GROUP BY node),
ents AS (
  SELECT DISTINCT m.conv_id,
         COALESCE(c.component,
                  COALESCE('g' || CAST(s.group_id AS VARCHAR),
                           'u:' || m.value)) AS canon
  FROM ment m
  LEFT JOIN syn s ON s.sid = m.value
  LEFT JOIN comp c
    ON c.node = COALESCE('g' || CAST(s.group_id AS VARCHAR),
                         'u:' || m.value)
),
pc AS (
  SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_node FROM ents GROUP BY 1
),
total AS (
  SELECT CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs FROM ents
),
co AS (
  SELECT a.canon AS e_a, b.canon AS e_b,
         CAST(COUNT(*) AS BIGINT) AS n_pair,
         MIN(pa.n_node) AS n_a, MIN(pb.n_node) AS n_b
  FROM ents a
  JOIN ents b ON a.conv_id = b.conv_id AND a.canon < b.canon
  JOIN pc pa ON pa.canon = a.canon
  JOIN pc pb ON pb.canon = b.canon
  GROUP BY 1, 2
)"""


def cooccurrence_sql(transcripts_path: str, synonyms_path: str,
                     aliases_path: str) -> str:
    """Entity co-occurrence oracle: unordered canonical-entity pairs sharing
    a conversation, with per-entity conversation frequencies and lift."""
    return _cooccurrence_ctes(transcripts_path, synonyms_path,
                              aliases_path) + """
SELECT e_a, e_b, n_pair, n_a, n_b, t.n_convs,
       (n_pair * t.n_convs) / (n_a * n_b) AS lift
FROM co, total t
ORDER BY e_a, e_b"""


def triangles_sql(transcripts_path: str, synonyms_path: str,
                  aliases_path: str, min_pair: int = 2) -> str:
    """Triangle-enumeration oracle over the co-occurrence graph thresholded
    at ``n_pair >= min_pair``.  With u < v normalized edges, the three-way
    self-join (a,b)x(b,c)x(a,c) yields each triangle exactly once."""
    return _cooccurrence_ctes(transcripts_path, synonyms_path,
                              aliases_path) + f""",
und AS (SELECT e_a AS u, e_b AS v FROM co WHERE n_pair >= {min_pair})
SELECT t1.u AS a, t1.v AS b, t2.v AS c
FROM und t1
JOIN und t2 ON t2.u = t1.v
JOIN und t3 ON t3.u = t1.u AND t3.v = t2.v
ORDER BY 1, 2, 3"""


def node_degrees_sql(transcripts_path: str, synonyms_path: str,
                     seed_path: str, aliases_path: str,
                     edges_sql: str | None = None) -> str:
    """Degree-profile oracle over the canonical edge table.  ``edges_sql``
    overrides the edge derivation (frames-mode for the materialized-sink
    path)."""
    edges = edges_sql or canonical_edges_sql(transcripts_path,
                                             synonyms_path,
                                             seed_path, aliases_path)
    return f"""
WITH e AS ({edges}),
o AS (
  SELECT src AS node, CAST(COUNT(DISTINCT dst) AS BIGINT) AS out_deg,
         CAST(SUM(n_ops) AS BIGINT) AS n_out_ops
  FROM e GROUP BY 1
),
i AS (
  SELECT dst AS node, CAST(COUNT(DISTINCT src) AS BIGINT) AS in_deg,
         CAST(SUM(n_ops) AS BIGINT) AS n_in_ops
  FROM e GROUP BY 1
)
SELECT COALESCE(o.node, i.node) AS node,
       CAST(COALESCE(out_deg, 0) AS BIGINT) AS out_deg,
       CAST(COALESCE(in_deg, 0) AS BIGINT) AS in_deg,
       CAST(COALESCE(n_out_ops, 0) AS BIGINT) AS n_out_ops,
       CAST(COALESCE(n_in_ops, 0) AS BIGINT) AS n_in_ops
FROM o FULL OUTER JOIN i ON o.node = i.node
ORDER BY 1"""


def pagerank_sql(transcripts_path: str, synonyms_path: str, seed_path: str,
                 aliases_path: str, n_iter: int = 5,
                 damping: float = 0.85, weighted: bool = False,
                 edges_sql: str | None = None) -> str:
    """Fixed-iteration PageRank oracle: the update
    r_{k+1}(v) = (1-d)/N + d*(sum_{u->v} r_k(u)/od(u) + dangling_k/N)
    unrolled into one CTE chain per iteration — same literals and operation
    shapes as the Spark side, so values agree to float noise (<< the 6dp
    comparison rounding).

    Every multiply-referenced CTE is ``MATERIALIZED``: DuckDB otherwise
    inlines them, and with r_{k} referencing r_{k-1} three times the
    evaluation tree is 3^iters copies of the regex-heavy edge scan —
    the unhinted form never finished at sf0.01.

    ``weighted=True`` matches the Spark ``weight_col="n_ops"`` walk: edge
    weight = sum(n_ops) per (src, dst), rank split by out-strength.
    ``edges_sql`` overrides the edge derivation (e.g. the frames-mode
    canonical edge table for the materialized-sink path)."""
    edges = edges_sql or canonical_edges_sql(transcripts_path, synonyms_path,
                                             seed_path, aliases_path)
    # repr-exact damping literals like pagerank_personalized_sql: an in-SQL
    # ``(1.0 - 0.85)`` is DECIMAL-exact 0.15 in DuckDB while Spark ships the
    # Python double 1.0-0.85 = 0.15000000000000002 — a one-ulp divergence
    one_minus_d, d = repr(1.0 - damping), repr(damping)
    ed_body = ("SELECT src, dst, CAST(SUM(n_ops) AS DOUBLE) AS w "
               "FROM e GROUP BY 1, 2" if weighted else
               "SELECT src, dst, CAST(1.0 AS DOUBLE) AS w "
               "FROM (SELECT DISTINCT src, dst FROM e)")
    sql = f"""
WITH e AS MATERIALIZED ({edges}),
ed AS MATERIALIZED ({ed_body}),
nodes AS MATERIALIZED (
  SELECT src AS node FROM ed UNION SELECT dst AS node FROM ed),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
od AS MATERIALIZED (
  SELECT src AS node, SUM(w) AS od
  FROM ed GROUP BY 1
),
r0 AS MATERIALIZED (
  SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    for k in range(1, n_iter + 1):
        p = k - 1
        sql += f""",
dang{p} AS MATERIALIZED (
  SELECT COALESCE(SUM(r.rank), 0) AS dm
  FROM r{p} r LEFT JOIN od ON od.node = r.node
  WHERE od.node IS NULL
),
contrib{p} AS MATERIALIZED (
  SELECT ed.dst AS node, SUM(r.rank * ed.w / od.od) AS m
  FROM ed
  JOIN r{p} r ON r.node = ed.src
  JOIN od ON od.node = ed.src
  GROUP BY 1
),
r{k} AS MATERIALIZED (
  SELECT nd.node,
         {one_minus_d} / (SELECT n FROM nn)
         + {d} * (COALESCE(c.m, 0)
                  + (SELECT dm FROM dang{p}) / (SELECT n FROM nn))
           AS rank
  FROM nodes nd LEFT JOIN contrib{p} c ON c.node = nd.node
)"""
    return sql + f"""
SELECT node, rank FROM r{n_iter} ORDER BY node"""


def pagerank_personalized_sql(transcripts_path: str, synonyms_path: str,
                              seed_path: str, aliases_path: str,
                              n_iter: int = 5, damping: float = 0.85,
                              n_seeds: int = 3) -> str:
    """Personalized-PageRank oracle: teleport vector concentrated on the
    ``n_seeds`` top-out-degree nodes (ties on node id — the khop seed
    rule); r0 = t and the update is
    r' = (1-d)*t + d*(sum_in r*w/od + dangling*t).
    Damping literals are emitted via ``repr`` so DuckDB parses the exact
    binary double Spark's ``F.lit(1.0 - damping)`` uses (a DECIMAL
    ``(1.0 - 0.85)`` would differ by one ulp).  MATERIALIZED everywhere a
    CTE is referenced more than once (see pagerank_sql)."""
    edges = canonical_edges_sql(transcripts_path, synonyms_path,
                                seed_path, aliases_path)
    one_minus_d, d = repr(1.0 - damping), repr(damping)
    sql = f"""
WITH e AS MATERIALIZED ({edges}),
ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM e),
edw AS MATERIALIZED (SELECT src, dst, CAST(1.0 AS DOUBLE) AS w FROM ed),
seeds AS MATERIALIZED (
  SELECT src AS node FROM ed GROUP BY 1
  ORDER BY COUNT(DISTINCT dst) DESC, src LIMIT {n_seeds}
),
sn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS ns FROM seeds),
nodes AS MATERIALIZED (
  SELECT node,
         CASE WHEN node IN (SELECT node FROM seeds)
              THEN 1.0 / (SELECT ns FROM sn) ELSE 0.0 END AS t
  FROM (SELECT src AS node FROM ed UNION SELECT dst AS node FROM ed)),
od AS MATERIALIZED (
  SELECT src AS node, SUM(w) AS od FROM edw GROUP BY 1
),
r0 AS MATERIALIZED (SELECT node, t AS rank FROM nodes)"""
    for k in range(1, n_iter + 1):
        p = k - 1
        sql += f""",
dang{p} AS MATERIALIZED (
  SELECT COALESCE(SUM(r.rank), 0) AS dm
  FROM r{p} r LEFT JOIN od ON od.node = r.node
  WHERE od.node IS NULL
),
contrib{p} AS MATERIALIZED (
  SELECT edw.dst AS node, SUM(r.rank * edw.w / od.od) AS m
  FROM edw
  JOIN r{p} r ON r.node = edw.src
  JOIN od ON od.node = edw.src
  GROUP BY 1
),
r{k} AS MATERIALIZED (
  SELECT nd.node,
         {one_minus_d} * nd.t
         + {d} * (COALESCE(c.m, 0)
                  + (SELECT dm FROM dang{p}) * nd.t) AS rank
  FROM nodes nd LEFT JOIN contrib{p} c ON c.node = nd.node
)"""
    return sql + f"""
SELECT node, rank FROM r{n_iter} ORDER BY node"""


def negative_samples_over_sql(edges_sql: str, k: int = 3,
                              buckets: int | None = None,
                              probes: int = 2) -> str:
    """Deterministic negative-sampling oracle over ANY (src, dst) edge
    SQL: identical md5 bucket targeting, linear-probe retries and
    (probe, md5) arg-min as the Spark operator (the hex-prefix base-16
    parse is the engine-portable pattern proven by folding_assign),
    positives excluded via NOT EXISTS.  ``buckets=None`` computes the same
    N-derived count as ``graph.buckets_for_nodes`` inside SQL (a scalar
    subquery modulus), so both engines always agree on the bucket layout."""
    if buckets is None:
        bexpr = "(SELECT b FROM bcnt)"
        pexpr = f"LEAST({probes}, (SELECT b FROM bcnt))"
    else:
        bexpr = str(buckets)
        pexpr = str(min(probes, buckets))

    def hexint(expr: str) -> str:
        return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM e),
nodes AS MATERIALIZED (
  SELECT src AS node FROM ed UNION SELECT dst AS node FROM ed),
bcnt AS MATERIALIZED (
  SELECT GREATEST(2, CAST(CEIL(COUNT(*) / 16.0) AS BIGINT)) AS b
  FROM nodes),
nb AS MATERIALIZED (
  SELECT node, {hexint('node')} % {bexpr} AS bucket FROM nodes),
ix AS (SELECT unnest(generate_series(0, {k - 1})) AS neg_idx),
pr AS (SELECT unnest(generate_series(0, {probes - 1})) AS probe
       ),
cand AS (
  SELECT ed.src, ed.dst, CAST(ix.neg_idx AS INT) AS neg_idx,
         pr.probe, nb.node
  FROM ed CROSS JOIN ix CROSS JOIN pr
  JOIN nb ON nb.bucket =
    ({hexint("ed.src || '|' || ed.dst || '|' || CAST(ix.neg_idx AS VARCHAR)")}
     + pr.probe) % {bexpr}
  WHERE pr.probe < {pexpr}
    AND nb.node <> ed.src AND nb.node <> ed.dst
    AND NOT EXISTS (SELECT 1 FROM ed e2
                    WHERE e2.src = ed.src AND e2.dst = nb.node)
)
SELECT src, dst, neg_idx,
       arg_min(node, lpad(CAST(probe AS VARCHAR), 7, '0')
                     || md5(node || '|' || src || '|' || dst || '|'
                            || CAST(neg_idx AS VARCHAR))) AS neg_dst
FROM cand GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""


def khop_sql(transcripts_path: str, synonyms_path: str, seed_path: str,
             aliases_path: str, k: int = 3, n_seeds: int = 3) -> str:
    """Min-hop reachability oracle: depth-bounded recursive walk from the
    top-out-degree seeds (ties broken on node id), MIN(hops) per node."""
    edges = canonical_edges_sql(transcripts_path, synonyms_path,
                                seed_path, aliases_path)
    return f"""
WITH RECURSIVE e AS MATERIALIZED ({edges}),
ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM e),
seeds AS (
  SELECT src AS node FROM ed GROUP BY 1
  ORDER BY COUNT(DISTINCT dst) DESC, src LIMIT {n_seeds}
),
walk(node, hops) AS (
  SELECT node, 0 FROM seeds
  UNION ALL
  SELECT ed.dst, w.hops + 1
  FROM walk w JOIN ed ON ed.src = w.node
  WHERE w.hops < {k}
)
SELECT node, CAST(MIN(hops) AS BIGINT) AS hops
FROM walk GROUP BY 1 ORDER BY 1"""


def kmeans_sql(k: int = 8, n_iter: int = 3, dim: int = 64) -> str:
    """Iteration-exact k-means oracle (functions/clustering.py): seeds by
    (md5(vec_id), vec_id), integer-sum centroid numerators (order-proof),
    sequential-fold distances via list_sum/list_transform (the knn-proven
    bit-identical pattern), argmin on the 0-dp rounded distance with a
    cluster-index tie-break; empty clusters keep their previous centroid.
    One CTE generation per Lloyd update, MATERIALIZED throughout (every
    c{t} is referenced twice)."""
    e6 = ("list_transform(embedding, x -> "
          "CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))")
    dist = (f"CAST(round(list_sum(list_transform(range(1, {dim + 1}), "
            "i -> (CAST(e.e6[i] AS DOUBLE) - c.cent[i])"
            " * (CAST(e.e6[i] AS DOUBLE) - c.cent[i]))), 0) AS BIGINT)")
    sums = ", ".join(f"SUM(e.e6[{d + 1}])" for d in range(dim))
    sql = f"""
WITH e AS MATERIALIZED (SELECT vec_id, {e6} AS e6 FROM embeddings),
c0 AS MATERIALIZED (
  SELECT CAST(ROW_NUMBER() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1
           AS cluster,
         list_transform(e6, v -> CAST(v AS DOUBLE)) AS cent
  FROM (SELECT vec_id, e6 FROM e
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})
)"""
    for t in range(n_iter):
        sql += f""",
p{t} AS MATERIALIZED (
  SELECT e.vec_id, c.cluster, {dist} AS dk
  FROM e CROSS JOIN c{t} c
),
a{t} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dk, cluster) AS rn
    FROM p{t}) WHERE rn = 1
),
s{t} AS MATERIALIZED (
  SELECT a.cluster, COUNT(*) AS n, [{sums}] AS sums
  FROM a{t} a JOIN e ON e.vec_id = a.vec_id GROUP BY 1
),
c{t + 1} AS MATERIALIZED (
  SELECT c.cluster,
         CASE WHEN s.cluster IS NULL THEN c.cent
              ELSE list_transform(s.sums, v -> CAST(v AS DOUBLE) / s.n)
         END AS cent
  FROM c{t} c LEFT JOIN s{t} s ON s.cluster = c.cluster
)"""
    return sql + f""",
pf AS (SELECT e.vec_id, c.cluster, {dist} AS dk
       FROM e CROSS JOIN c{n_iter} c)
SELECT vec_id, CAST(cluster AS INT) AS cluster FROM (
  SELECT vec_id, cluster,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dk, cluster) AS rn
  FROM pf) WHERE rn = 1 ORDER BY vec_id"""


def min_cost_paths_sql(transcripts_path: str, synonyms_path: str,
                       seed_path: str, aliases_path: str,
                       k: int = 4, n_seeds: int = 3) -> str:
    """Bounded Bellman-Ford oracle: depth-bounded recursive path walk with
    integer edge costs round(1e6 / sum(n_ops)), MIN(total) per node —
    equal to k relaxation rounds (min over <= k-edge paths; weights
    non-negative)."""
    edges = canonical_edges_sql(transcripts_path, synonyms_path,
                                seed_path, aliases_path)
    return f"""
WITH RECURSIVE e AS MATERIALIZED ({edges}),
ed AS MATERIALIZED (
  SELECT src, dst,
         CAST(round(1000000.0 / CAST(SUM(n_ops) AS DOUBLE), 0) AS BIGINT)
           AS w
  FROM e GROUP BY 1, 2),
seeds AS (
  SELECT src AS node FROM (SELECT DISTINCT src, dst FROM e) GROUP BY 1
  ORDER BY COUNT(DISTINCT dst) DESC, src LIMIT {n_seeds}
),
walk(node, cost, hops) AS (
  SELECT node, CAST(0 AS BIGINT), 0 FROM seeds
  UNION ALL
  SELECT ed.dst, w.cost + ed.w, w.hops + 1
  FROM walk w JOIN ed ON ed.src = w.node
  WHERE w.hops < {k}
)
SELECT node, MIN(cost) AS cost FROM walk GROUP BY 1 ORDER BY 1"""
