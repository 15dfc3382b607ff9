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
DATA_VERSION = 2  # bump when generated fixture contents change

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

# Frame lexicon: 1- and 2-word variants are matchable; the single 3-word
# variant sets max_variant_len=3 and (by the reference's scan quirk,
# ``items/text/frames.py:56-60``: ctx sizes range over max-1..1) is itself
# never matched — replicated deliberately.
FRAMES: dict[str, dict] = {
    "f_attack":  {"variants": ["attack", "attacks", "strike against"], "polarity": "neg", "prob": 1.0},
    "f_support": {"variants": ["support", "supports", "stand with"], "polarity": "pos", "prob": 1.0},
    "f_blame":   {"variants": ["blame", "blames", "point finger"], "polarity": "neg", "prob": 0.9},
    "f_praise":  {"variants": ["praise", "praises"], "polarity": "pos", "prob": 0.9},
    "f_threat":  {"variants": ["threaten", "threatens"], "polarity": "neg", "prob": 1.0},
    "f_agree":   {"variants": ["agree with", "agrees with"], "polarity": "pos", "prob": 0.8},
    "f_oppose":  {"variants": ["oppose", "opposes", "push back against"], "polarity": "neg", "prob": 0.8},
}

NEG_WORDS = ["not", "no", "never"]
ROLES = ["user", "assistant", "tool"]
TOOLS = [None, "search", "calculator", "browser"]
LABELS = ["pos", "neg"]


def n_convs_for_sf(sf: float) -> int:
    return max(20, int(round(60000 * sf)))


def _make_turn_text(rng: np.random.Generator, mention_values: list[str],
                    frame_phrases: list[str]) -> str:
    """Compose one turn: filler + planted [mentions] + frame phrases +
    tokenizer stressors (punctuation, numbers, urls, brackets)."""
    n_tokens = int(rng.integers(8, 55))
    words: list[str] = []
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.82:
            w = FILLER[int(rng.integers(0, len(FILLER)))]
            if rng.random() < 0.12:
                w += PUNCT_SUFFIX[int(rng.integers(0, len(PUNCT_SUFFIX)))]
        elif r < 0.90:
            w = str(int(rng.integers(0, 5000)))
        elif r < 0.93:
            w = "http://example.org/p/" + str(int(rng.integers(0, 99)))
        elif r < 0.96:
            w = "(" + FILLER[int(rng.integers(0, len(FILLER)))] + ")"
        else:
            w = FILLER[int(rng.integers(0, len(FILLER)))] + "-" + \
                FILLER[int(rng.integers(0, len(FILLER)))]
        words.append(w)
    # plant frame phrases at random positions
    for ph in frame_phrases:
        pos = int(rng.integers(0, len(words) + 1))
        if rng.random() < 0.25:
            words[pos:pos] = [NEG_WORDS[int(rng.integers(0, len(NEG_WORDS)))]] + ph.split()
        else:
            words[pos:pos] = ph.split()
    # plant mentions
    for val in mention_values:
        pos = int(rng.integers(0, len(words) + 1))
        tok = "[" + val + "]"
        if rng.random() < 0.02:
            tok += ","  # breaks the bracket rule -> becomes bracket tokens
        words.insert(pos, tok)
    return " ".join(words)


def generate(out_dir: str, sf: float, seed: int = SEED) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_convs = n_convs_for_sf(sf)
    base_ts = datetime(2026, 1, 1, tzinfo=timezone.utc)

    all_surfaces = [(g, v) for g, grp in enumerate(ENTITY_GROUPS) for v in grp]
    frame_phrases_all = [v for f in FRAMES.values() for v in f["variants"]]

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    seed_rows: list[tuple[str, str, str, str, int]] = []

    for ci in range(n_convs):
        conv_id = f"c{ci:07d}"
        n_turns = int(rng.integers(3, 13))
        # per-conv pool of entity groups (2-6 groups) so same-group pairs occur
        pool = rng.choice(len(ENTITY_GROUPS), size=int(rng.integers(2, 7)),
                          replace=False)
        conv_mentions: list[str] = []
        for ti in range(n_turns):
            n_m = int(rng.choice([0, 1, 2, 3], p=[0.25, 0.35, 0.3, 0.1]))
            vals = []
            for _ in range(n_m):
                g = int(pool[int(rng.integers(0, len(pool)))])
                grp = ENTITY_GROUPS[g]
                vals.append(grp[int(rng.integers(0, len(grp)))])
            conv_mentions.extend(vals)
            n_f = int(rng.choice([0, 1, 2], p=[0.5, 0.35, 0.15]))
            phrases = [frame_phrases_all[int(rng.integers(0, len(frame_phrases_all)))]
                       for _ in range(n_f)]
            conv_ids.append(conv_id)
            turn_idxs.append(ti)
            roles.append(ROLES[int(rng.integers(0, 3))])
            texts.append(_make_turn_text(rng, vals, phrases))
            tools.append(TOOLS[int(rng.integers(0, len(TOOLS)))])
            tss.append(base_ts + timedelta(seconds=ci * 3600 + ti * 7))
        # predefined opinions for ~30% of convs, over values seen in the conv
        if rng.random() < 0.3 and len(conv_mentions) >= 2:
            n_op = int(rng.integers(1, 4))
            for k in range(n_op):
                s = conv_mentions[int(rng.integers(0, len(conv_mentions)))]
                t = conv_mentions[int(rng.integers(0, len(conv_mentions)))]
                lab = LABELS[int(rng.integers(0, 2))]
                seed_rows.append((conv_id, s, t, lab, k))

    tbl = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
    })
    pq.write_table(tbl, os.path.join(out_dir, "transcripts.parquet"))

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

_SF_OF_DIR = {"sf0.001": 0.001, "sf0.01": 0.01, "sf0.1": 0.1, "sf1": 1.0}


def repo_data_dir(sf_dir: str) -> str:
    """Map a driver testdata dir (…/sf0.01) to this repo's generated KG
    fixture dir, generating it on first use (deterministic, seeded)."""
    name = os.path.basename(os.path.normpath(sf_dir))
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
