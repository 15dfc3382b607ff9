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


class ToneLexicon:
    """S-family term→tone CSV lexicon (RuSentiLex shape).

    Reference: ``contrib/utils/lexicons/lexicon.py:4-37`` (``Lexicon`` —
    ``TermKey='term'``, ``ToneKey='tone'``, ``from_csv`` comma-separated,
    ``get_score`` returns the FIRST matching row's tone and 0 for a missing
    term) and ``rusentilex.py:10-36`` (``RuSentiLexLexicon``, the same frame
    read out of an archive). The driver-side API mirrors the reference;
    ``df`` is the broadcast-join side for the Spark path (terms are KBs —
    dictionary-sized, SURVEY.md §4 item 5)."""

    def __init__(self, df: pd.DataFrame):
        # first registration wins: get_score takes .values[0]
        self.df = df.drop_duplicates(subset=["term"],
                                     keep="first").reset_index(drop=True)
        self._scores = dict(zip(self.df["term"], self.df["tone"]))

    @classmethod
    def from_csv_lines(cls, lines: list[str]) -> "ToneLexicon":
        import io
        return cls(pd.read_csv(io.StringIO("\n".join(lines)), sep=","))

    @classmethod
    def from_csv(cls, filepath: str, separator: str = ",") -> "ToneLexicon":
        return cls(pd.read_csv(filepath, sep=separator))

    def get_score(self, lemma: str) -> int:
        return int(self._scores.get(lemma, 0))

    def has_term(self, term: str) -> bool:
        return term in self._scores

    def __contains__(self, item: str) -> bool:
        return item in self._scores

    def __iter__(self):
        return iter(self.df["term"])


class RelationLexicon:
    """Pairwise relation→tone lexicon: rows keyed ``left<->right``.

    Reference: ``contrib/utils/lexicons/relation.py:4-40`` — the
    constructor validates every key splits into exactly two parts on
    ``<->``; ``get_score(l, r)`` looks up ``l<->r`` first, falls back to
    the symmetric ``r<->l``, and returns None when neither exists."""

    SEP = "<->"

    def __init__(self, df: pd.DataFrame):
        for rel in df["relation"]:
            if len(str(rel).split(self.SEP)) != 2:
                raise ValueError(f"malformed relation key: {rel!r}")
        self._scores = dict(zip(df["relation"], df["tone"]))

    @classmethod
    def from_csv_lines(cls, lines: list[str]) -> "RelationLexicon":
        import io
        return cls(pd.read_csv(io.StringIO("\n".join(lines)), sep=","))

    def get_score(self, left: str, right: str):
        for key in (left + self.SEP + right, right + self.SEP + left):
            if key in self._scores:
                return int(self._scores[key])
        return None


def synthetic_tone_csv_lines(sids: list[str]) -> list[str]:
    """Deterministic fixture tone lexicon: one CSV row per sid with
    tone(sid) = hexint(md5(sid)[:15]) % 3 - 1 ∈ {-1, 0, 1} — the
    engine-portable md5 discipline (same hex-prefix base-16 parse as the
    folding/negative-sampling oracles), so the DuckDB oracle recomputes
    the identical tone in SQL with no fixture file round-trip."""
    import hashlib
    import io
    terms = sorted(set(sids))
    tones = [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
             % 3 - 1 for t in terms]
    buf = io.StringIO()
    pd.DataFrame({"term": terms, "tone": tones}).to_csv(buf, index=False)
    return buf.getvalue().splitlines()


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
