"""Pure-Python ORACLE: a literal transcription of the reference's
per-document algorithms, used ONLY by tests to verify the Spark engine's
triple parity (P/R gate of BASELINE.md).

This module deliberately re-implements the reference's control flow as
faithfully as possible (char-scan tokenizer, nested-loop pair enumeration,
insertion-ordered collections) and shares NO code with the Spark operators —
so an engine bug cannot cancel out against an oracle bug. Citations point at
the transcribed reference code in /root/reference (behavior transcription,
not code copying — the reference is studied, its lines re-stated).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlparse

# ---------------------------------------------------------------- tokenizer

_TOKEN_MAPPING = {
    ",": "<[,]>", ".": "<[.]>", "…": "<[…]>", ":": "<[:]>", ";": "<[;]>",
    "-": "<[-]>", "—": "<[long_dash]>", "?": "<[?]>", "!": "<[!]>",
    "(": "<[OPEN_BRACKET]>", ")": "<[CLOSED_BRACKET]>",
    "{": "<[OPEN_BRACKET]>", "}": "<[CLOSED_BRACKET]>",
    "[": "<[OPEN_BRACKET]>", "]": "<[CLOSED_BRACKET]>",
    "\n": "<[NEW_LINE]>", "«": "<[QUOTE]>", "»": "<[QUOTE]>", '"': "<[QUOTE]>",
}
_NEW_LINE = "<[NEW_LINE]>"
_DASH = "<[-]>"


@dataclass
class OToken:
    value: str


@dataclass
class OEntity:
    value: str            # lowercased (common/entities/base.py:7)
    ent_type: str | None = None
    id_in_doc: int = -1
    sent_ind: int = -1
    ind_in_doc: int = -1


@dataclass
class OFrame:
    frame_id: str
    negated: bool = False


def _try_create(ch):
    # Tokens.try_create (processing/text/tokens.py:79-87)
    return OToken(_TOKEN_MAPPING[ch]) if ch in _TOKEN_MAPPING else None


def _try_create_url(term):
    # Tokens.try_create_url (tokens.py:100-106)
    r = urlparse(term)
    return OToken("<[URL]>") if (r.scheme and r.netloc and r.path) else None


def _split_tokens(term):
    # DefaultTextTokenizer.__split_tokens char FSM (tokenizer.py:76-105)
    url = _try_create_url(term)
    if url is not None:
        return [url]
    out = []
    l = 0
    while l < len(term):
        token = _try_create(term[l])
        if token is not None:
            if token.value != _NEW_LINE:
                out.append(token)
            l += 1
        elif term[l].isdigit():
            k = l + 1
            while k < len(term) and term[k].isdigit():
                k += 1
            out.append(OToken("<[NUMBER]>"))
            l = k
        else:
            k = l + 1
            while k < len(term):
                token = _try_create(term[k])
                if token is not None and token.value != _DASH:
                    break
                k += 1
            out.append(term[l:k])
            l = k
    return out


def _parse_entities(words):
    # TextEntitiesParser.__process_word (entities_default.py:14-17)
    out = []
    for w in words:
        if len(w) > 2 and w[0] == "[" and w[-1] == "]":
            out.append(OEntity(value=w[1:-1].lower()))
        else:
            out.append(w)
    return out


def _tokenize(stream):
    # DefaultTextTokenizer.__process_parts (tokenizer.py:36-58)
    parsed = []
    for part in stream:
        if isinstance(part, str):
            for word in part.split():
                parsed.extend(_split_tokens(word))
        else:
            parsed.append(part)
    return parsed


def _scan_frames(terms, variants, max_variant_len):
    # FrameVariantsParser._iter_processed (frames.py:47-86), incl. the
    # reversed(range(1, max_len)) quirk; lemmatizer = lowercase normalizer
    # (frames_lemmatized.py seam).
    lemmas = [t.lower() if isinstance(t, str) else t for t in terms]
    out = []
    start_ind, last_ind = 0, 0
    while start_ind < len(lemmas):
        found = False
        for ctx_size in reversed(list(range(1, max_variant_len))):
            last_ind = start_ind + ctx_size - 1
            if last_ind >= len(lemmas):
                continue
            if not all(isinstance(lemmas[i], str)
                       for i in range(start_ind, last_ind + 1)):
                continue
            ctx_value = " ".join(lemmas[start_ind:last_ind + 1])
            if ctx_value not in variants:
                continue
            out.append(OFrame(variants[ctx_value]))
            found = True
            break
        if not found:
            out.append(terms[start_ind])
        start_ind = last_ind + 1
    return out


def _apply_negation(terms, negation_words):
    # FrameVariantsSentimentNegation.apply_core (frames_negation.py:19-31)
    for i, t in enumerate(terms):
        if not isinstance(t, OFrame):
            continue
        prep = terms[i - 1] if i > 0 else None
        t.negated = (isinstance(prep, str)
                     and prep.lower() in negation_words)
    return terms


def parse_doc(turn_texts, variants, max_variant_len, negation_words):
    """NewsParser.parse analog: list of per-turn term lists."""
    sentences = []
    for text in turn_texts:
        terms = _parse_entities(text.split())
        terms = _tokenize(terms)
        if variants and max_variant_len >= 2:
            terms = _scan_frames(terms, variants, max_variant_len)
            terms = _apply_negation(terms, negation_words)
        sentences.append(terms)
    return sentences


# ------------------------------------------------- positions & collections

def collect_frames(sentences):
    """Frame-hit position pass: (sent_ind, ind_in_doc, frame_id, negated)
    over the post-scan term stream (frame terms occupy one slot each,
    frames.py:70-79)."""
    out = []
    ind_in_doc = 0
    for s_ind, terms in enumerate(sentences):
        for term in terms:
            if isinstance(term, OFrame):
                out.append((s_ind, ind_in_doc, term.frame_id, term.negated))
            ind_in_doc += 1
    return out


def collect_entities(sentences, types_map=None):
    """EntityServiceProvider position pass (entity_service.py:152-168) +
    DocumentEntity ids by enumeration order."""
    entities = []
    ind_in_doc = 0
    for s_ind, terms in enumerate(sentences):
        for term in terms:
            if isinstance(term, OEntity):
                term.id_in_doc = len(entities)
                term.sent_ind = s_ind
                term.ind_in_doc = ind_in_doc
                if types_map is not None:
                    term.ent_type = types_map.get(term.value)
                entities.append(term)
            ind_in_doc += 1
    return entities


class OSynonyms:
    """StemmerBasedSynonymCollection with register-missed semantics
    (synonyms/base.py:31-42, 109-126; grouping.py:8-15). Group identity uses
    the engine's content-derived keys (seed 'g<idx>' / open 'u:<sid>') —
    pair-equivalent to the reference's insertion indexes (SURVEY.md §7)."""

    def __init__(self, seed_pairs):
        # seed_pairs: iterable of (group_id, value); LAST wins on sid clash
        # like __process_group with debug=False.
        self.by_sid = {}
        for gid, value in seed_pairs:
            self.by_sid[self._sid(value)] = f"g{gid}"

    @staticmethod
    def _sid(value):
        return value.strip().lower()

    def contains(self, value):
        return self._sid(value) in self.by_sid

    def register(self, value):
        sid = self._sid(value)
        self.by_sid[sid] = "u:" + sid

    def group_of(self, value, register_missed=True):
        sid = self._sid(value)
        if sid not in self.by_sid:
            if not register_missed:
                return None
            self.register(value)
        return self.by_sid[sid]


class OOpinionCollection:
    """OpinionCollection (collection.py:105-150): keyed by synonym pair,
    keep-first, loop rejection, end registration."""

    def __init__(self, synonyms):
        self.synonyms = synonyms
        self.by_key = {}
        self.ordered = []

    def register(self, s_value, t_value, label):
        s_value, t_value = s_value.lower(), t_value.lower()
        for v in (s_value, t_value):
            if not self.synonyms.contains(v):
                self.synonyms.register(v)
        sg = self.synonyms.group_of(s_value)
        tg = self.synonyms.group_of(t_value)
        if sg == tg:                       # is_loop (opinions/base.py:60-62)
            return False
        key = (sg, tg)
        if key in self.by_key:
            return False
        self.by_key[key] = (s_value, t_value, label, sg, tg)
        self.ordered.append(key)
        return True

    def has_synonymous(self, s_value, t_value):
        sg = self.synonyms.group_of(s_value.lower())
        tg = self.synonyms.group_of(t_value.lower())
        return (sg, tg) in self.by_key

    def __iter__(self):
        for k in self.ordered:
            yield self.by_key[k]


# ---------------------------------------------------------------- pipeline

@dataclass
class OConfig:
    dist_in_terms_bound: int = 50
    terms_per_context: int = 50
    dist_in_sents: int = 0
    type_whitelist: tuple | None = None
    no_label: str = "nolabel"
    negation_words: frozenset = frozenset({"not", "no", "never", "без", "не"})


def _entity_ignored(e, whitelist):
    # RuAttitudesEntityFilter analog (entity_filter.py:5-18): ignored unless
    # type in whitelist.
    if whitelist is None:
        return False
    return e.ent_type not in whitelist


def pair_based_opinions(entities, existed, synonyms, cfg: OConfig):
    """PairBasedOpinionAnnotationAlgorithm.iter_opinions + collection fill
    (pair_based.py:44-75, algo_based.py:33-49)."""
    collection = OOpinionCollection(synonyms)
    for e1 in entities:                    # iter_from_all: src outer
        for e2 in entities:                # tgt inner (base_pairs.py:26-42)
            if e1.id_in_doc == e2.id_in_doc:
                continue
            if _entity_ignored(e1, cfg.type_whitelist):
                continue
            if _entity_ignored(e2, cfg.type_whitelist):
                continue
            if abs(e1.sent_ind - e2.sent_ind) > cfg.dist_in_sents:
                continue
            if cfg.dist_in_terms_bound is not None and \
                    abs(e1.ind_in_doc - e2.ind_in_doc) > cfg.dist_in_terms_bound:
                continue
            if existed is not None and existed.has_synonymous(e1.value, e2.value):
                continue
            if e1 is e2:                  # source_entity == target_entity
                continue
            if collection.has_synonymous(e1.value, e2.value):
                continue
            collection.register(e1.value, e2.value, cfg.no_label)
    return collection


def frame_based_opinions(entities, frames_pos, synonyms, polarity,
                         cfg: OConfig):
    """Frame-connotation annotator (operators/connotation.py docstring):
    RuSentiFramesConnotationProvider.try_provide a0->a1 polarity
    (rusentiframes_sentiment.py:20-23, collection.py:56-66) applied as pair
    distant supervision; negation inverts (term_connotation.py:40-41);
    doc-level label = sign of the vote sum (A1 AVERAGE, single.py:14-24),
    zero-sum pairs fall through to the nolabel annotator."""
    votes = {}
    reps = {}
    for e1 in entities:
        for e2 in entities:
            if e1.id_in_doc == e2.id_in_doc:
                continue
            if _entity_ignored(e1, cfg.type_whitelist):
                continue
            if _entity_ignored(e2, cfg.type_whitelist):
                continue
            if abs(e1.sent_ind - e2.sent_ind) > cfg.dist_in_sents:
                continue
            if cfg.dist_in_terms_bound is not None and \
                    abs(e1.ind_in_doc - e2.ind_in_doc) > cfg.dist_in_terms_bound:
                continue
            if e1.sent_ind != e2.sent_ind:     # votes are same-turn contexts
                continue
            if e1.ind_in_doc >= e2.ind_in_doc:  # a0 (agent) precedes a1
                continue
            v = 0
            for (f_sent, f_ind, fid, negated) in frames_pos:
                if f_sent != e1.sent_ind:
                    continue
                if not (e1.ind_in_doc < f_ind < e2.ind_in_doc):
                    continue
                pol = polarity.get(fid)
                if pol is None:                 # try_provide -> None
                    continue
                dv = 1 if pol == "pos" else -1
                if negated:
                    dv = -dv
                v += dv
            if v == 0:
                continue
            sg = synonyms.group_of(e1.value)
            tg = synonyms.group_of(e2.value)
            if sg == tg:
                continue
            votes[(sg, tg)] = votes.get((sg, tg), 0) + v
            reps.setdefault((sg, tg), (e1.value, e2.value))
    collection = OOpinionCollection(synonyms)
    for key in sorted(votes):
        total = votes[key]
        if total == 0:
            continue
        s_value, t_value = reps[key]
        collection.register(s_value, t_value, "pos" if total > 0 else "neg")
    return collection


def predefined_opinions(seed_rows, synonyms):
    """PredefinedOpinionAnnotationAlgorithm passthrough + collection fill."""
    collection = OOpinionCollection(synonyms)
    for s, t, label in seed_rows:
        if collection.has_synonymous(s, t):
            continue
        collection.register(s, t, label)
    return collection


def expand_opinions(collection, entities, synonyms, cfg: OConfig):
    """TextOpinionPairsProvider.iter_from_opinion (text_opinion_pairs.py:46-78)
    + filter chain (extraction.py:25-50: J10 limitation, J11 distance, J12)."""
    by_group = {}
    for e in entities:
        by_group.setdefault(synonyms.group_of(e.value), []).append(e)
    out = []
    for (s_value, t_value, label, sg, tg) in collection:
        sources = by_group.get(sg)
        targets = by_group.get(tg)
        if not sources or not targets:
            continue
        for e1 in sources:
            for e2 in targets:
                if e1 is e2:
                    continue
                # J10 same sentence
                if e1.sent_ind != e2.sent_ind:
                    continue
                # J11 strict window + distinct ends (sample.py:28-62)
                if e1.id_in_doc == e2.id_in_doc:
                    continue
                if not (abs(e1.ind_in_doc - e2.ind_in_doc)
                        < cfg.terms_per_context):
                    continue
                # J12 type whitelist
                if _entity_ignored(e1, cfg.type_whitelist) or \
                        _entity_ignored(e2, cfg.type_whitelist):
                    continue
                out.append((e1, e2, label, sg, tg))
    return out


def extract_doc_triples(turn_texts, seed_rows, synonyms, variants,
                        max_variant_len, cfg: OConfig, types_map=None,
                        polarity=None):
    """Full EP1 for one document. Returns mention-level triples:
    (turn_idx, s_ent_id, t_ent_id, s_value, t_value, s_group, t_group, label).
    """
    sentences = parse_doc(turn_texts, variants, max_variant_len,
                          cfg.negation_words)
    entities = collect_entities(sentences, types_map)

    pre = predefined_opinions(seed_rows, synonyms)
    collections = [pre]
    if polarity:
        frames_pos = collect_frames(sentences)
        collections.append(frame_based_opinions(
            entities, frames_pos, synonyms, polarity, cfg))
    nol = pair_based_opinions(entities, existed=None, synonyms=synonyms,
                              cfg=cfg)
    collections.append(nol)

    seen = set()
    triples = []
    for collection in collections:         # predefined first (extraction.py:41-46)
        for (e1, e2, label, sg, tg) in expand_opinions(collection, entities,
                                                       synonyms, cfg):
            key = (e1.id_in_doc, e2.id_in_doc)
            if key in seen:
                continue
            seen.add(key)
            triples.append((e1.sent_ind, e1.id_in_doc, e2.id_in_doc,
                            e1.value, e2.value, sg, tg, label))
    return triples


def extract_all_triples(transcripts_pdf, seed_pdf, synonyms_seed_pairs,
                        variants, max_variant_len, cfg: OConfig,
                        types_map=None, polarity=None):
    """Run the oracle over a pandas transcripts table; returns a set of
    triple tuples (conv_id, turn_idx, s_ent_id, t_ent_id, s_value, t_value,
    s_group, t_group, label).

    The synonyms collection is shared across documents like the reference's
    single mutable instance — with content-derived keys the result is
    document-order independent.
    """
    synonyms = OSynonyms(synonyms_seed_pairs)
    seed_by_conv = {}
    if seed_pdf is not None and len(seed_pdf):
        for r in seed_pdf.sort_values(["conv_id", "seq"]).itertuples():
            seed_by_conv.setdefault(r.conv_id, []).append(
                (r.source_value, r.target_value, r.label))
    out = set()
    for conv_id, grp in transcripts_pdf.sort_values(
            ["conv_id", "turn_idx"]).groupby("conv_id", sort=True):
        triples = extract_doc_triples(
            list(grp["text"]), seed_by_conv.get(conv_id, []), synonyms,
            variants, max_variant_len, cfg, types_map, polarity=polarity)
        for t in triples:
            out.add((conv_id,) + t)
    return out
