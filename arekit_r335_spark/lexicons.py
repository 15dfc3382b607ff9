"""Dictionary loading + broadcast (SURVEY.md §2.1 S5/S6, §4 item 5).

Lexicons are tiny relative to the data (KBs vs TBs) — they are loaded once on
the driver and shipped as Spark broadcasts: consumed inside the parse pandas
UDF (frames) and via broadcast hash joins (synonym seed groups).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import pandas as pd


# the reference's two string-label formats (rusentiframes/labels_fmt.py):
# polarity/state labels are pos/neg words, effect labels are '+'/'-' signs
EFFECT_STOL = {"+": "pos", "-": "neg"}


@dataclass(frozen=True)
class FramesLexicon:
    """variant phrase (lowercase) -> frame_id, plus frame polarities and
    per-role effect/state labels.

    Reference: ``FrameVariantsCollection.fill_from_iterable``
    (``common/frames/variants/collection.py:25-45``) keyed by variant value;
    ``max_variant_len`` as in ``items/text/frames.py:16`` (max #terms over
    variants). Polarity = the a0->a1 connotation the reference looks up in
    ``contrib/source/rusentiframes/collection.py:56-66``. ``effects`` /
    ``states`` are the per-role [role, label, prob] triples of
    ``get_frame_effects`` / ``get_frame_states`` (``collection.py:86-115``;
    effect '+'/'-' signs normalized to pos/neg via the
    ``RuSentiFramesEffectLabelsFormatter`` mapping, ``labels_fmt.py:15-22``);
    frames without the key yield empty lists, like ``__check_has_*``.
    ``roles`` mirrors ``get_frame_roles`` (role -> description).
    """

    variants: dict[str, str]
    max_variant_len: int
    polarity: dict[str, str]      # frame_id -> pos|neg
    prob: dict[str, float]
    effects: dict[str, tuple] = None    # frame_id -> ((role, label, prob),)
    states: dict[str, tuple] = None
    roles: dict[str, dict] = None       # frame_id -> {role: description}

    def __post_init__(self):
        for f in ("effects", "states", "roles"):
            if getattr(self, f) is None:
                object.__setattr__(self, f, {})

    @staticmethod
    def from_json(path: str) -> "FramesLexicon":
        with open(path) as f:
            raw = json.load(f)
        variants: dict[str, str] = {}
        polarity: dict[str, str] = {}
        prob: dict[str, float] = {}
        effects: dict[str, tuple] = {}
        states: dict[str, tuple] = {}
        roles: dict[str, dict] = {}
        for fid, spec in raw.items():
            for v in spec["variants"]:
                # later registration overwrites an existed variant only when
                # asked; our lexicons are disjoint (collection.py:37-43)
                variants.setdefault(v.lower(), fid)
            polarity[fid] = spec["polarity"]
            prob[fid] = float(spec.get("prob", 1.0))
            effects[fid] = tuple(
                (r, EFFECT_STOL[lab], float(p))
                for r, lab, p in spec.get("effects", []))
            states[fid] = tuple(
                (r, lab, float(p)) for r, lab, p in spec.get("states", []))
            roles[fid] = dict(spec.get("roles", {}))
        max_len = max((len(v.split()) for v in variants), default=0)
        return FramesLexicon(variants, max_len, polarity, prob,
                             effects, states, roles)

    def role_effect_map(self, role: str = "a1") -> dict[str, str]:
        """frame_id -> the given role's effect label (frames without an
        effect for that role are absent — the annotator's null-lookup path,
        like ``try_get_frame_polarity`` returning None)."""
        return {fid: lab for fid, effs in self.effects.items()
                for r, lab, _p in effs if r == role}

    @staticmethod
    def empty() -> "FramesLexicon":
        return FramesLexicon({}, 0, {}, {})


def load_synonym_seed(path: str) -> pd.DataFrame:
    """Seed synonym groups as a small pandas frame (group_id:int, sid:str).

    sid = the collection's lookup key: the deterministic-lemmatized
    (lower+strip) value, mirroring ``StemmerBasedSynonymCollection``
    (``contrib/utils/synonyms/stemmer_based.py:16-19``). When one sid appears
    in several groups, the LAST registration wins for lookup, exactly like
    ``SynonymsCollection.__process_group`` with debug=False
    (``common/synonyms/base.py:109-126``).
    """
    df = pd.read_parquet(path)
    df = df.assign(sid=df["value"].astype(str).str.strip().str.lower())
    df = df.drop_duplicates(subset=["sid"], keep="last")
    return df[["group_id", "sid"]].reset_index(drop=True)


def load_synonyms_csv_lines(lines: list[str]) -> pd.DataFrame:
    """S6 — the reference's native synonym format: one group per line,
    comma-separated values (``contrib/source/synonyms/utils.py:4-18``).
    Returns the same (group_id, sid) frame as ``load_synonym_seed``."""
    rows = []
    for group_id, line in enumerate(lines):
        for value in line.split(","):
            v = value.strip()
            if v:
                rows.append((group_id, v.lower()))
    df = pd.DataFrame(rows, columns=["group_id", "sid"])
    return df.drop_duplicates(subset=["sid"], keep="last").reset_index(
        drop=True)


def load_entity_types(path: str) -> dict[str, str]:
    """Optional value(lower) -> entity type map for the J12 filter."""
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        raw = json.load(f)
    return {k.lower(): v for k, v in raw.items()}


@dataclass(frozen=True)
class KgInputs:
    """Paths of one fixture directory (datagen output)."""

    transcripts: str
    synonyms: str
    frames: str
    seed_opinions: str
    entity_types: str
    aliases: str = ""

    @staticmethod
    def at(dir_path: str) -> "KgInputs":
        return KgInputs(
            transcripts=os.path.join(dir_path, "transcripts.parquet"),
            synonyms=os.path.join(dir_path, "synonyms.parquet"),
            frames=os.path.join(dir_path, "frames.json"),
            seed_opinions=os.path.join(dir_path, "seed_opinions.parquet"),
            entity_types=os.path.join(dir_path, "entity_types.json"),
            aliases=os.path.join(dir_path, "aliases.parquet"),
        )
