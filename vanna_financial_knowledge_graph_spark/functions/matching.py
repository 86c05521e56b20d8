"""Pure mention detection (token trie) and rule-based triple extraction.

Replaces the reference's LLM extraction step (two-step enumerate-then-relate,
vanna_kg/ingestion/extraction/extractor.py:31-117) with deterministic rules:
mention enumeration honors the proper-noun requirement by construction (only
gazetteer names match — descriptions of unnamed things never do), and fact
generation pairs mentions within one sentence joined by a relation-verb
phrase, emitting self-contained facts with required date_context
(extractor.py:81-103 semantics).

Pure Python, no pyspark imports: the same functions power the single-node
golden-triple oracle and the Arrow-batched executors.
"""

from __future__ import annotations

import re

from .textops import (
    date_context,
    fact_uuid,
    normalize_relationship_type,
    norm_name,
    sentence_spans,
)

_RE_TOKEN = re.compile(r"[A-Za-z0-9][A-Za-z0-9&.'\-]*")


def _norm_tok(t: str) -> str:
    low = t.lower()
    return low.rstrip(".") or low

# Relation-verb lexicon: the gap text between two mentions must contain one
# of these for a (subj, pred, obj) fact to fire.
RELATION_VERBS = frozenset(
    """
    acquired acquires acquire announced announces announce reported reports
    report partnered partners launched launches launch appointed appoints
    hired hires sued sues fined fines invested invests increased increases
    decreased decreases raised raises cut cuts lowered lowers boosted boosts
    downgraded downgrades upgraded upgrades approved approves rejected
    rejects regulates regulated investigating investigated probes probed
    filed files issued issues signed signs opened opens expanded expands
    reduced reduces warned warns forecast forecasts projected projects
    beat beats missed misses exceeded exceeds posted posts unveiled unveils
    introduced introduces discontinued delayed delays settled settles paid
    pays agreed agrees named names promoted promotes joined joins led leads
    oversees oversaw supplies supplied competes competed surpassed surpasses
    outperformed underperformed recalled recalls halted halts resumed
    resumes merged merges divested divests spun bought buys sells sold
    """.split()
)


class Matcher:
    """Longest-match token-sequence gazetteer matcher.

    Built once per executor from the broadcast entry list (the Spark-side
    equivalent of the reference's "dictionary+gazetteer tries broadcast to
    executors" requirement). Matching is case-insensitive on normalized
    tokens; at each start position the longest gazetteer phrase wins and
    overlapping shorter matches are suppressed.
    """

    def __init__(self, entries: list[tuple[str, str, str, str, str]]) -> None:
        # trie: token -> child dict; terminal key "" -> payload
        self.trie: dict = {}
        self.max_len = 1
        for surface_norm, surface, kind, ref_uuid, entity_type in entries:
            # trie keys use the same token normalization as find(): lowered
            # with trailing periods stripped ("Inc." matches "inc")
            toks = [_norm_tok(t) for t in surface_norm.split(" ")]
            self.max_len = max(self.max_len, len(toks))
            node = self.trie
            for t in toks:
                node = node.setdefault(t, {})
            node[""] = (surface_norm, kind, ref_uuid, entity_type)

    def find(self, text: str) -> list[dict]:
        """All non-overlapping longest mentions in text with char offsets."""
        tokens = [(m.group(0), m.start(), m.end()) for m in _RE_TOKEN.finditer(text)]
        norms = [_norm_tok(t[0]) for t in tokens]
        out: list[dict] = []
        i, n = 0, len(tokens)
        while i < n:
            node = self.trie
            best: tuple[int, tuple] | None = None
            j = i
            while j < n and j - i < self.max_len:
                nxt = node.get(norms[j])
                if nxt is None:
                    break
                node = nxt
                if "" in node:
                    best = (j, node[""])
                j += 1
            if best is not None:
                j_end, (surface_norm, kind, ref_uuid, entity_type) = best
                begin, end = tokens[i][1], tokens[j_end][2]
                out.append(
                    {
                        "name": text[begin:end],
                        "name_norm": surface_norm,
                        "kind": kind,
                        "ref_uuid": ref_uuid,
                        "entity_type": entity_type,
                        "begin": begin,
                        "end": end,
                    }
                )
                i = j_end + 1
            else:
                # Fallback proper-noun rule (new-entity detection): a run of
                # >=2 capitalized tokens not in the gazetteer becomes an
                # unlinked entity mention (ref_uuid null). Mirrors the
                # reference's enumerate-unknown-entities behavior while
                # honoring the proper-noun requirement (extractor.py:48-63).
                if (
                    tokens[i][0][0].isupper()
                    and i + 1 < n
                    and tokens[i + 1][0][0].isupper()
                    and tokens[i][1] != 0  # skip sentence-initial capitals
                ):
                    k = i + 1
                    while (
                        k < n
                        and tokens[k][0][0].isupper()
                        and k - i < 5
                        and norms[k] not in self.trie  # don't swallow a
                        # gazetteer match starting mid-run
                    ):
                        k += 1
                    begin, end = tokens[i][1], tokens[k - 1][2]
                    surface = text[begin:end]
                    out.append(
                        {
                            "name": surface,
                            "name_norm": norm_name(surface),
                            "kind": "entity",
                            "ref_uuid": None,
                            "entity_type": "unknown",
                            "begin": begin,
                            "end": end,
                        }
                    )
                    i = k
                else:
                    i += 1
        return out


_MATCHER_CACHE: list[tuple[list, Matcher]] = []


def get_matcher(entries: list[tuple[str, str, str, str, str]]) -> Matcher:
    """Per-process matcher cache (executors deserialize the broadcast once;
    the trie is built once per worker). Holds a reference to the keyed list
    and compares with `is`, so a garbage-collected list can never alias a
    stale matcher (id() is only unique among live objects)."""
    if _MATCHER_CACHE and _MATCHER_CACHE[0][0] is entries:
        return _MATCHER_CACHE[0][1]
    m = Matcher(entries)
    _MATCHER_CACHE.clear()
    _MATCHER_CACHE.append((entries, m))
    return m


_MAX_GAP_CHARS = 90
_MAX_GAP_WORDS = 10


def extract_triples(
    chunk_uuid_: str,
    content: str,
    document_date: str,
    mentions: list[dict],
) -> list[dict]:
    """Rule-based fact generation over one chunk.

    For each sentence, consecutive mention pairs whose gap text contains a
    relation verb (and is short enough to be one clause) yield a fact row:
    predicate = UPPER_SNAKE normalization of the gap text (<=8 words,
    utils/text.py:12-28 semantics), content = the full sentence
    (self-contained proposition), date_context = in-text temporal phrase or
    the document-date fallback, topics = topic mentions in the sentence.
    """
    if not mentions:
        return []
    # Sentence spans computed from the segmentation regex's own match
    # offsets on the raw content — exact, even when a sentence spans a
    # newline (the old prefix re-find drifted and silently dropped facts).
    facts: list[dict] = []
    seq = 0
    for start, end, sent in sentence_spans(content):
        ms = [m for m in mentions if m["begin"] >= start and m["end"] <= end]
        if len(ms) < 2:
            continue
        ms.sort(key=lambda m: m["begin"])
        topics = sorted({m["name_norm"] for m in ms if m["kind"] == "topic"})
        for a, b in zip(ms, ms[1:]):
            gap = content[a["end"] : b["begin"]]
            if len(gap) > _MAX_GAP_CHARS:
                continue
            words = [w.lower() for w in _RE_TOKEN.findall(gap)]
            if len(words) > _MAX_GAP_WORDS:
                continue
            if not any(w in RELATION_VERBS for w in words):
                continue
            if a["kind"] != "entity":  # subject must be a named entity
                continue
            rel = normalize_relationship_type(gap)
            facts.append(
                {
                    "fact_uuid": fact_uuid(
                        chunk_uuid_, a["name_norm"], rel, b["name_norm"], seq
                    ),
                    "chunk_uuid": chunk_uuid_,
                    "content": sent,
                    "subject_name": a["name"],
                    "subject_norm": a["name_norm"],
                    "subject_type": a["entity_type"],
                    "object_name": b["name"],
                    "object_norm": b["name_norm"],
                    "object_kind": b["kind"],
                    "object_entity_type": b["entity_type"],
                    "relationship_type": rel,
                    "date_context": date_context(sent, document_date),
                    "topics": topics,
                }
            )
            seq += 1
    return facts
