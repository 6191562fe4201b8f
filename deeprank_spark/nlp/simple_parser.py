"""Deterministic rule-based tokenizer / tagger / lemmatizer / dependency linker.

Hermetic stand-in for the reference's pluggable parser backends (CoreNLP HTTP
at /root/reference/textcrafts/corenlp_api.py, stanfordnlp at
stanfordnlp_api.py, plugin ABC at parser_api.py:5-30). The reference treats
the parser as an exchangeable adapter that must produce, per sentence:

    triples: ((from_word, from_tag), rel, (to_word, to_tag)) dependency list
    lemmas / words / tags: aligned token arrays

This module produces the same shape with fully deterministic rules (no model,
no network, no randomness), so tests are hermetic and reproducible, and the
per-turn `text` column is never mutated (input_hint invariant).

The SAME code runs inside the Spark Arrow/pandas batch UDF (deeprank_spark.
parse) and inside the pytest oracle, so the deps fed to the Catalyst edge
pipeline and to the pure-Python reference-semantics oracle are identical by
construction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..wordlist import GEN_ADJS, GEN_NAMES, GEN_VERBS

TOKEN_RE = re.compile(r"[A-Za-z][A-Za-z0-9'\-]*|[0-9]+|[.,!?;:]")
SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")

DT_SET = {"the", "a", "an", "this", "that", "these", "those"}
IN_SET = {
    "on", "in", "at", "of", "to", "from", "with", "by", "for",
    "over", "under", "into", "about", "through", "between",
}
PRP_SET = {"i", "you", "he", "she", "it", "we", "they"}
CC_SET = {"and", "or", "but"}
WH_SET = {"who", "what", "when", "where", "why", "how", "which", "whom"}
MD_SET = {"can", "could", "will", "would", "shall", "should", "may", "might", "must"}
BE_MAP = {"is": "be", "are": "be", "was": "be", "were": "be", "been": "be", "am": "be", "be": "be"}
AUX_MAP = {"has": "have", "had": "have", "have": "have", "does": "do", "did": "do", "do": "do"}
VERB_SET = set(GEN_VERBS) | {v.rstrip("s") for v in GEN_VERBS}
ADJ_SET = set(GEN_ADJS)
NAME_SET = {n.lower() for n in GEN_NAMES}

NOUNISH = ("NN", "NNS", "NNP", "PRP")


def split_sentences(text: str) -> list[str]:
    """Split text into sentences on terminal punctuation + whitespace."""
    parts = [s.strip() for s in SENT_SPLIT_RE.split(text or "")]
    return [s for s in parts if s]


def tokenize(sent: str) -> list[str]:
    return TOKEN_RE.findall(sent or "")


def _tag_one(tok: str, prev_tag: str, is_first: bool) -> str:
    if tok in ".!?":
        return "."
    if tok == ",":
        return ","
    if tok in ";:":
        return ":"
    low = tok.lower()
    if low in DT_SET:
        return "DT"
    if low in IN_SET:
        return "IN"
    if low in PRP_SET:
        return "PRP"
    if low in CC_SET:
        return "CC"
    if low in WH_SET:
        return "WP"
    if low in MD_SET:
        return "MD"
    if low in BE_MAP or low in AUX_MAP:
        return "VBZ"
    if tok[0].isdigit():
        return "CD"
    if low in ADJ_SET:
        return "JJ"
    if low in VERB_SET:
        return "VBZ"
    if low.endswith("ly"):
        return "RB"
    if low.endswith("ing") and len(low) > 5:
        return "VBG"
    if low.endswith("ed") and len(low) > 4:
        return "VBN"
    if low.endswith("s") and not low.endswith("ss") and prev_tag in NOUNISH:
        return "VBZ"
    if tok[0].isupper() and (not is_first or low in NAME_SET):
        return "NNP"
    if low.endswith("s") and not low.endswith("ss"):
        return "NNS"
    return "NN"


def tag_tokens(tokens: list[str]) -> list[str]:
    tags: list[str] = []
    prev = ""
    for i, tok in enumerate(tokens):
        t = _tag_one(tok, prev, i == 0)
        tags.append(t)
        prev = t
    return tags


def lemma_of(tok: str, tg: str) -> str:
    low = tok.lower()
    if low in BE_MAP:
        return BE_MAP[low]
    if low in AUX_MAP:
        return AUX_MAP[low]
    if tg == "NNP":
        return tok
    if tg in ("VBZ", "NNS") and low.endswith("s") and not low.endswith("ss") and len(low) > 3:
        return low[:-1]
    if tg == "VBG" and low.endswith("ing") and len(low) > 5:
        return low[:-3]
    if tg in ("VBN", "VBD") and low.endswith("ed") and len(low) > 4:
        return low[:-2]
    return low


Dep = tuple  # ((from_word, from_tag), rel, (to_word, to_tag))


@dataclass
class ParsedSentence:
    words: list
    lemmas: list
    tags: list
    deps: list  # list[Dep]


def parse_sentence(sent: str) -> ParsedSentence:
    """Deterministic dependency linking.

    Head-selection rules (fixed cascade):
      root  = first verb (non-MD), else first noun-ish token, else token 0
      nsubj = last noun-ish token before root       -> (root, nsubj, subj)
      dobj  = first noun-ish after root w/o IN gap  -> (root, dobj, obj)
      nmod  = noun after a preposition              -> (root, nmod, noun) +
                                                       (noun, case, prep)
      det   = determiner -> next noun-ish           -> (noun, det, dt)
      amod  = adjective/adverb -> next noun-ish     -> (noun, amod, adj)
      compound = adjacent noun-noun (head = right)  -> (right, compound, left)
      punct = terminal . ! ?                        -> (root, punct, tok)
      dep   = anything left                         -> (root, dep, tok)
    """
    words = tokenize(sent)
    tags = tag_tokens(words)
    lemmas = [lemma_of(w, t) for w, t in zip(words, tags)]
    n = len(words)
    deps: list = []
    if n == 0:
        return ParsedSentence(words, lemmas, tags, deps)

    def nounish(i: int) -> bool:
        return tags[i] in NOUNISH

    root = next((i for i, t in enumerate(tags) if t.startswith("V") and t != "MD"), None)
    if root is None:
        root = next((i for i in range(n) if nounish(i)), 0)
    rw = (words[root], tags[root])

    attached = {root}

    def attach(gi: int, rel: str, di: int):
        deps.append(((words[gi], tags[gi]), rel, (words[di], tags[di])))
        attached.add(di)

    # nsubj: last noun-ish before root (compound heads win by "last")
    subj = next((i for i in range(root - 1, -1, -1) if nounish(i)), None)
    if subj is not None and subj != root:
        attach(root, "nsubj", subj)

    # compounds: adjacent noun-noun, head = right token
    for i in range(n - 1):
        if tags[i] in ("NN", "NNS", "NNP") and tags[i + 1] in ("NN", "NNS", "NNP"):
            attach(i + 1, "compound", i)

    # post-root nouns: dobj before any preposition, nmod (+case) after one
    prep: int | None = None
    seen_obj = False
    for i in range(root + 1, n):
        if tags[i] == "IN":
            prep = i
            continue
        if nounish(i) and i not in attached:
            if prep is None and not seen_obj:
                attach(root, "dobj", i)
                seen_obj = True
            else:
                attach(root, "nmod", i)
                if prep is not None:
                    attach(i, "case", prep)
                    prep = None

    # determiners / adjectives attach forward to the nearest noun-ish token
    for i in range(n):
        if tags[i] in ("DT", "JJ", "RB") and i not in attached:
            nxt = next((j for j in range(i + 1, n) if nounish(j)), None)
            if nxt is not None:
                attach(nxt, "det" if tags[i] == "DT" else "amod", i)

    # terminal punctuation -> root (drives the SENT->predicate rule)
    for i in range(n):
        if tags[i] == "." and i not in attached:
            deps.append((rw, "punct", (words[i], tags[i])))
            attached.add(i)

    # leftovers
    for i in range(n):
        if i not in attached:
            deps.append((rw, "dep", (words[i], tags[i])))
    return ParsedSentence(words, lemmas, tags, deps)


def parse_turn(text: str) -> ParsedSentence:
    """One transcript turn = one sentence unit (reference sentence-id model:
    deepRank.py:357-361 iterates positional sentence ids; the input_hint maps
    turn_idx onto them)."""
    return parse_sentence(text)
