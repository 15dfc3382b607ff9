"""Deterministic synthetic fixture generator (FIXTURES.md F1-F4).

Produces, for a scale factor, the four input tables of the KG pipeline:

* ``transcripts.parquet``  — (conv_id, turn_idx, role, text, tool, ts); the
  Iceberg-transcript shape from BASELINE.json's input hint. Entity mentions are
  planted as single bracketed tokens ``[Value]``, matching the reference's
  built-in detector (``contrib/utils/pipelines/items/text/entities_default.py:14-17``).
* ``synonyms.parquet``     — (group_id, value) seed dictionary, the tabular form
  of the one-group-per-line CSV (``contrib/source/synonyms/utils.py:4-18``).
* ``frames.json``          — frame lexicon: variants + a0->a1 polarity,
  the minimal analog of RuSentiFrames
  (``contrib/source/rusentiframes/collection.py:56-115``).
* ``seed_opinions.parquet``— (conv_id, source_value, target_value, label, seq):
  predefined document-level opinions (``.opin.txt`` analog,
  ``contrib/source/rusentrel/opinions/converter.py:10-25``).

Everything is seeded (numpy PCG64, seed=42) — same sf => byte-identical tables
on every machine. No external data.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
DATA_VERSION = 6  # bump when generated fixture contents change

# ---------------------------------------------------------------- vocabularies

FILLER = (
    "the a of to and in on for with about while during over under system "
    "agent model data table query result plan engine cluster node task run "
    "value report update status check review deploy merge branch test case "
    "first second large small fast slow new old good again still quite very"
).split()

PUNCT_SUFFIX = [",", ".", "!", "?", ";", ":"]

# 15 synonym groups of surface forms (single whitespace tokens, per the
# bracket detector contract). Groups 0-9 are in the seed dictionary; groups
# 10-14 are open-world (exercise register-missed, ``synonyms/grouping.py:8-15``).
ENTITY_GROUPS: list[list[str]] = [
    ["USA", "America", "US"],
    ["Russia", "RF"],
    ["Moscow", "Moskva"],
    ["Washington", "DC"],
    ["UN", "UnitedNations"],
    ["NATO", "Alliance"],
    ["Merkel", "Chancellor"],
    ["Putin", "VVP"],
    ["EU", "Europe"],
    ["China", "PRC"],
    ["OpenAI"],
    ["DeepMind", "DM"],
    ["Spark", "ApacheSpark"],
    ["Iceberg"],
    ["Kafka"],
]
N_SEED_GROUPS = 10

ENTITY_TYPES = {
    0: "GPE", 1: "GPE", 2: "GEO", 3: "GEO", 4: "ORG", 5: "ORG",
    6: "PERSON", 7: "PERSON", 8: "GPE", 9: "GPE", 10: "ORG", 11: "ORG",
    12: "FRAMEWORK", 13: "FRAMEWORK", 14: "FRAMEWORK",
}

# Frame lexicon: 1-, 2- and 3-word variants are matchable; the single 4-word
# variant sets max_variant_len=4 and (by the reference's scan quirk,
# ``items/text/frames.py:56-60``: ctx sizes range over max-1..1) is itself
# never matched — replicated deliberately. The 3-word variants ("strike hard
# against", "push back against") exercise the greedy longest-match scan past
# span 2 in BOTH engines (the DuckDB oracle walks them via a recursive CTE).
FRAMES: dict[str, dict] = {
    # ``effects`` use the reference's '+'/'-' sign format
    # (``rusentiframes/labels_fmt.py:15-22`` RuSentiFramesEffectLabels-
    # Formatter), ``states`` the pos/neg word format, both as
    # [role, label, prob] triples keyed per role exactly like
    # ``collection.py:86-115`` get_frame_states/get_frame_effects; ``roles``
    # mirrors get_frame_roles. f_agree carries NO effects and f_praise NO
    # states — the missing-key paths (__check_has_* returning []) are part
    # of the reference contract.
    "f_attack":  {"variants": ["attack", "attacks", "strike hard against"], "polarity": "neg", "prob": 1.0,
                  "roles": {"a0": "attacker", "a1": "victim"},
                  "effects": [["a0", "-", 0.7], ["a1", "-", 1.0]],
                  "states": [["a1", "neg", 1.0]]},
    "f_support": {"variants": ["support", "supports", "stand with"], "polarity": "pos", "prob": 1.0,
                  "roles": {"a0": "supporter", "a1": "beneficiary"},
                  "effects": [["a1", "+", 1.0]],
                  "states": [["a0", "pos", 0.7]]},
    "f_blame":   {"variants": ["blame", "blames", "point finger"], "polarity": "neg", "prob": 0.9,
                  "roles": {"a0": "accuser", "a1": "accused"},
                  "effects": [["a1", "-", 0.9]],
                  "states": [["a1", "neg", 0.9]]},
    "f_praise":  {"variants": ["praise", "praises"], "polarity": "pos", "prob": 0.9,
                  "roles": {"a0": "praiser", "a1": "praised"},
                  "effects": [["a1", "+", 0.9]]},
    "f_threat":  {"variants": ["threaten", "threatens", "hold a grudge against"], "polarity": "neg", "prob": 1.0,
                  "roles": {"a0": "threatener", "a1": "threatened"},
                  "effects": [["a0", "-", 0.5], ["a1", "-", 1.0]],
                  "states": [["a1", "neg", 0.8]]},
    "f_agree":   {"variants": ["agree with", "agrees with"], "polarity": "pos", "prob": 0.8,
                  "roles": {"a0": "agreer", "a1": "position"},
                  "states": [["a0", "pos", 0.6]]},
    "f_oppose":  {"variants": ["oppose", "opposes", "push back against"], "polarity": "neg", "prob": 0.8,
                  "roles": {"a0": "opponent", "a1": "opposed"},
                  "effects": [["a1", "-", 0.8]],
                  "states": [["a0", "neg", 0.5]]},
}

NEG_WORDS = ["not", "no", "never"]
ROLES = ["user", "assistant", "tool"]
TOOLS = [None, "search", "calculator", "browser"]
LABELS = ["pos", "neg"]


def n_convs_for_sf(sf: float) -> int:
    return max(20, int(round(60000 * sf)))


def generate(out_dir: str, sf: float, seed: int = SEED,
             skew_group_frac: float | None = None) -> None:
    """Vectorized generation: every random quantity is drawn as one numpy
    batch (same content distributions as v2, ~100x faster at large sf).

    ``skew_group_frac``: planted-skew variant (SURVEY §4 Zipfian-entity
    risk) — that fraction of ALL mention draws is overridden to synonym
    group 0, so one group owns ~``frac + (1-frac)/|pools|`` of mentions
    corpus-wide (a single hot key through grouping, expansion and the
    canonical rollups). ``None`` (default) leaves the RNG stream and output
    byte-identical to the uniform fixture."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_convs = n_convs_for_sf(sf)

    all_surfaces = [(g, v) for g, grp in enumerate(ENTITY_GROUPS) for v in grp]
    frame_phrases_all = [v for f in FRAMES.values() for v in f["variants"]]
    filler = np.array(FILLER)
    punct = np.array(PUNCT_SUFFIX)
    neg_words = np.array(NEG_WORDS)
    phrases_arr = np.array(frame_phrases_all)
    roles_arr = np.array(ROLES)
    tools_arr = np.array([t if t is not None else "" for t in TOOLS])

    # ---- conversation / turn structure (batched draws)
    n_turns = rng.integers(3, 13, size=n_convs)
    total_turns = int(n_turns.sum())
    conv_of_turn = np.repeat(np.arange(n_convs), n_turns)
    turn_idx = np.concatenate([np.arange(k) for k in n_turns]).astype("int32")
    conv_id_strs = np.array([f"c{i:07d}" for i in range(n_convs)])

    # per-conv pool of entity groups (2-6) so same-group pairs occur
    pool_sizes = rng.integers(2, 7, size=n_convs)
    pools = [rng.choice(len(ENTITY_GROUPS), size=k, replace=False)
             for k in pool_sizes]

    # ---- filler tokens for every turn
    n_tok = rng.integers(8, 55, size=total_turns)
    tok_total = int(n_tok.sum())
    r = rng.random(tok_total)
    f_idx = rng.integers(0, len(filler), size=tok_total)
    f2_idx = rng.integers(0, len(filler), size=tok_total)
    p_draw = rng.random(tok_total)
    p_idx = rng.integers(0, len(punct), size=tok_total)
    nums = rng.integers(0, 5000, size=tok_total)
    urls = rng.integers(0, 99, size=tok_total)

    toks = np.where(r < 0.82, filler[f_idx], "")
    toks = np.where((r < 0.82) & (p_draw < 0.12),
                    np.char.add(toks, punct[p_idx]), toks)
    toks = np.where((r >= 0.82) & (r < 0.90), nums.astype(str), toks)
    toks = np.where((r >= 0.90) & (r < 0.93),
                    np.char.add("http://example.org/p/", urls.astype(str)),
                    toks)
    toks = np.where((r >= 0.93) & (r < 0.96),
                    np.char.add(np.char.add("(", filler[f_idx]), ")"), toks)
    mask_dash = r >= 0.96
    toks = np.where(mask_dash,
                    np.char.add(np.char.add(filler[f_idx], "-"),
                                filler[f2_idx]), toks)

    tok_bounds = np.zeros(total_turns + 1, dtype=np.int64)
    np.cumsum(n_tok, out=tok_bounds[1:])

    # ---- mentions and frame phrases per turn (batched counts/choices)
    n_m = rng.choice([0, 1, 2, 3], p=[0.25, 0.35, 0.3, 0.1],
                     size=total_turns)
    n_f = rng.choice([0, 1, 2], p=[0.5, 0.35, 0.15], size=total_turns)
    m_total = int(n_m.sum())
    f_total = int(n_f.sum())
    m_turn = np.repeat(np.arange(total_turns), n_m)
    m_pool_pick = rng.random(m_total)
    m_surface_pick = rng.random(m_total)
    m_broken = rng.random(m_total) < 0.02
    f_pick = rng.integers(0, len(phrases_arr), size=f_total)
    f_negate = rng.random(f_total) < 0.25
    f_neg_word = rng.integers(0, len(neg_words), size=f_total)
    # insertion positions drawn as fractions (applied to current length)
    m_pos_frac = rng.random(m_total)
    f_pos_frac = rng.random(f_total)

    # drawn AFTER every shared draw so the default (None) path leaves the
    # RNG stream untouched — uniform fixtures stay byte-identical
    m_skew = (rng.random(m_total) < skew_group_frac
              if skew_group_frac else None)

    mention_vals: list[str] = []
    for j in range(m_total):
        if m_skew is not None and m_skew[j]:
            grp = ENTITY_GROUPS[0]
        else:
            pool = pools[conv_of_turn[m_turn[j]]]
            g = int(pool[int(m_pool_pick[j] * len(pool))])
            grp = ENTITY_GROUPS[g]
        mention_vals.append(grp[int(m_surface_pick[j] * len(grp))])

    toks_list = toks.tolist()   # one bulk conversion; per-turn slicing is
    del toks                    # then pure-python (no numpy scalar boxing)
    texts = []
    roles = roles_arr[rng.integers(0, 3, size=total_turns)]
    tools = tools_arr[rng.integers(0, len(tools_arr), size=total_turns)]
    bounds = tok_bounds.tolist()
    nf_list, nm_list = n_f.tolist(), n_m.tolist()
    mi = fi = 0
    for t in range(total_turns):
        words = toks_list[bounds[t]:bounds[t + 1]]
        for _ in range(nf_list[t]):
            ph = phrases_arr[f_pick[fi]].split()
            if f_negate[fi]:
                ph = [neg_words[f_neg_word[fi]]] + ph
            pos = int(f_pos_frac[fi] * (len(words) + 1))
            words[pos:pos] = ph
            fi += 1
        for _ in range(nm_list[t]):
            tok = "[" + mention_vals[mi] + "]"
            if m_broken[mi]:
                tok += ","
            pos = int(m_pos_frac[mi] * (len(words) + 1))
            words.insert(pos, tok)
            mi += 1
        texts.append(" ".join(words))

    # ---- predefined opinions (~30% of convs with >=2 mentions)
    conv_has = rng.random(n_convs) < 0.3
    n_ops = rng.integers(1, 4, size=n_convs)
    mention_turn_conv = conv_of_turn[m_turn]
    vals_arr = np.array(mention_vals) if mention_vals else np.array([],
                                                                    dtype=str)
    conv_mention_bounds = np.searchsorted(mention_turn_conv,
                                          np.arange(n_convs + 1))
    op_pick = rng.random((n_convs, 3, 2))  # up to 3 ops x (src,tgt)
    op_lab = rng.integers(0, 2, size=(n_convs, 3))
    seed_rows = []
    for ci in range(n_convs):
        lo, hi = conv_mention_bounds[ci], conv_mention_bounds[ci + 1]
        if not conv_has[ci] or hi - lo < 2:
            continue
        for k in range(int(n_ops[ci])):
            s = vals_arr[lo + int(op_pick[ci, k, 0] * (hi - lo))]
            t = vals_arr[lo + int(op_pick[ci, k, 1] * (hi - lo))]
            seed_rows.append((conv_id_strs[ci], s, t,
                              LABELS[int(op_lab[ci, k])], k))

    base_us = int(datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp()
                  ) * 1_000_000
    ts_us = (base_us + conv_of_turn.astype("int64") * 3_600_000_000
             + turn_idx.astype("int64") * 7_000_000)

    tbl = pa.table({
        "conv_id": pa.array(conv_id_strs[conv_of_turn], pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array([t if t else None for t in tools], pa.string()),
        "ts": pa.array(ts_us, pa.timestamp("us", tz="UTC")),
    })
    # small row groups => a single file still yields many input splits
    # (Spark assigns splits by byte ranges over row groups)
    pq.write_table(tbl, os.path.join(out_dir, "transcripts.parquet"),
                   row_group_size=20_000)

    syn = pa.table({
        "group_id": pa.array([g for g, _ in all_surfaces if g < N_SEED_GROUPS], pa.int32()),
        "value": pa.array([v for g, v in all_surfaces if g < N_SEED_GROUPS], pa.string()),
    })
    pq.write_table(syn, os.path.join(out_dir, "synonyms.parquet"))

    ops = pa.table({
        "conv_id": pa.array([r[0] for r in seed_rows], pa.string()),
        "source_value": pa.array([r[1] for r in seed_rows], pa.string()),
        "target_value": pa.array([r[2] for r in seed_rows], pa.string()),
        "label": pa.array([r[3] for r in seed_rows], pa.string()),
        "seq": pa.array([r[4] for r in seed_rows], pa.int32()),
    })
    pq.write_table(ops, os.path.join(out_dir, "seed_opinions.parquet"))

    # alias evidence for canonicalization (CC merge work): chain the surfaces
    # of every open-world group, plus a few no-op in-dictionary aliases
    alias_rows: list[tuple[str, str]] = []
    for g, grp in enumerate(ENTITY_GROUPS):
        if g >= N_SEED_GROUPS and len(grp) > 1:
            for i in range(len(grp) - 1):
                alias_rows.append((grp[i], grp[i + 1]))
    alias_rows += [("USA", "America"), ("Moscow", "Moskva")]
    al = pa.table({
        "value_a": pa.array([a for a, _ in alias_rows], pa.string()),
        "value_b": pa.array([b for _, b in alias_rows], pa.string()),
    })
    pq.write_table(al, os.path.join(out_dir, "aliases.parquet"))

    with open(os.path.join(out_dir, "frames.json"), "w") as f:
        json.dump(FRAMES, f, indent=1, sort_keys=True)

    # value -> entity type map (for the J12 filter variants)
    types = {v: ENTITY_TYPES[g] for g, grp in enumerate(ENTITY_GROUPS) for v in grp}
    with open(os.path.join(out_dir, "entity_types.json"), "w") as f:
        json.dump(types, f, indent=1, sort_keys=True)

    with open(os.path.join(out_dir, "data_version.txt"), "w") as f:
        f.write(str(DATA_VERSION))


# ------------------------------------------------------------- lazy ensure

_SF_OF_DIR = {"sf0.001": 0.001, "sf0.01": 0.01, "sf0.1": 0.1, "sf1": 1.0,
              "sf3": 3.0, "sf10": 10.0}


def replicated_data_dir(factor: int) -> str:
    """``data/sf1x<factor>`` — the sf1 fixture replicated ``factor`` times
    with distinct conv_id prefixes (``r<i>:<conv>``), for the scaling-
    efficiency protocol: large enough that per-core compute dominates fixed
    driver overhead, deterministic, and generated in seconds (no re-run of
    the text synthesizer). Seed opinions are replicated with matching ids;
    lexicon files are shared copies. Written with ~50k-row parquet row
    groups so the scan splits well at any parallelism."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    base = repo_data_dir("/root/testdata/sf1")
    out = os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(
        __file__)), os.pardir, "data", f"sf1x{factor}"))
    marker = os.path.join(out, "data_version.txt")
    want = f"{DATA_VERSION}x{factor}"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == want:
                return out
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    for name in ("transcripts", "seed_opinions"):
        t = pq.read_table(os.path.join(base, f"{name}.parquet"))
        reps = []
        for i in range(factor):
            conv = pc.binary_join_element_wise(
                pa.array([f"r{i}"] * len(t), pa.string()),
                t.column("conv_id").cast(pa.string()), ":")
            reps.append(t.set_column(t.schema.get_field_index("conv_id"),
                                     "conv_id", conv))
        pq.write_table(pa.concat_tables(reps),
                       os.path.join(tmp, f"{name}.parquet"),
                       row_group_size=50_000)
    for name in ("synonyms.parquet", "aliases.parquet", "frames.json",
                 "entity_types.json"):
        shutil.copy(os.path.join(base, name), os.path.join(tmp, name))
    with open(os.path.join(tmp, "data_version.txt"), "w") as f:
        f.write(want)
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return out


def repo_data_dir(sf_dir: str) -> str:
    """Map a driver testdata dir (…/sf0.01) to this repo's generated KG
    fixture dir, generating it on first use (deterministic, seeded)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    if name.startswith("sf1x"):
        return replicated_data_dir(int(name[4:]))
    sf = _SF_OF_DIR.get(name)
    if sf is None:
        # treat unknown dirs as sf0.01-scale
        name, sf = "sf0.01", 0.01
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       os.pardir, "data", name)
    out = os.path.abspath(out)
    marker = os.path.join(out, "data_version.txt")
    current = None
    if os.path.exists(marker):
        with open(marker) as f:
            current = f.read().strip()
    if current != str(DATA_VERSION):
        import shutil
        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        generate(tmp, sf)
        try:
            shutil.rmtree(out, ignore_errors=True)
            os.replace(tmp, out)
        except OSError:
            # lost a concurrent race: keep whichever instance won
            shutil.rmtree(tmp, ignore_errors=True)
    return out


if __name__ == "__main__":
    import sys
    for name, sf in _SF_OF_DIR.items():
        if len(sys.argv) > 1 and name not in sys.argv[1:]:
            continue
        d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         os.pardir, "data", name)
        generate(os.path.abspath(d), sf)
        print("generated", d)
