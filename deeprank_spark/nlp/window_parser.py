"""Second deterministic parser backend — proves the plugin seam.

The reference ships TWO real parser adapters behind one plugin ABC
(/root/reference/textcrafts/corenlp_api.py and stanfordnlp_api.py behind
parser_api.py:5-30); the engine's seam must likewise accept more than one
backend. This module is a structurally different rule family from
simple_parser — suffix-hash tagging, LAST-verb root selection, backward
modifier attachment, left-headed compounds — emitting the identical
ParsedSentence shape, so the whole downstream Catalyst cascade and the
pure-python oracle run unchanged on top of it (tests/test_parser_backends
runs the full edges differential suite under both backends).

Rules are deliberately simple; the point is the SEAM, not linguistic
quality — on a cluster the same slot holds a model-backed UDF.
"""

from __future__ import annotations

from .simple_parser import ParsedSentence, tokenize

DT_SET = {"the", "a", "an"}
IN_SET = {"on", "in", "at", "of", "to", "with", "by", "for"}
WH_SET = {"who", "what", "when", "where", "why", "how"}

NOUNISH = ("NN", "NNS", "NNP", "PRP")


def _suffix_hash(low: str) -> int:
    """Deterministic small hash of the final trigram (no randomness)."""
    return sum((i + 1) * ord(c) for i, c in enumerate(low[-3:]))


def _tag_one(tok: str, idx: int) -> str:
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
    if low in WH_SET:
        return "WP"
    if tok[0].isdigit():
        return "CD"
    if tok[0].isupper() and idx > 0:
        return "NNP"
    if low.endswith("ing") and len(low) > 4:
        return "VBG"
    h = _suffix_hash(low)
    if h % 5 == 0:
        return "VBZ"
    if h % 5 == 1:
        return "JJ"
    if low.endswith("s") and not low.endswith("ss"):
        return "NNS"
    return "NN"


def _lemma(tok: str, tag: str) -> str:
    low = tok.lower()
    if tag == "NNP":
        return tok
    if low.endswith("ing") and len(low) > 5:
        return low[:-3]
    if low.endswith("ed") and len(low) > 4:
        return low[:-2]
    if low.endswith("s") and not low.endswith("ss") and len(low) > 3:
        return low[:-1]
    return low


def parse_sentence(sent: str) -> ParsedSentence:
    """Window linker: root = LAST verb (else last noun-ish, else 0);
    first noun-ish before root = nsubj; other noun-ish tokens alternate
    dobj/nmod on the root; DT/JJ attach BACKWARD to the previous noun-ish
    token; adjacent noun-noun compounds are LEFT-headed; punct/leftovers
    to root."""
    words = tokenize(sent)
    tags = [_tag_one(w, i) for i, w in enumerate(words)]
    lemmas = [_lemma(w, t) for w, t in zip(words, tags)]
    n = len(words)
    deps: list = []
    if n == 0:
        return ParsedSentence(words, lemmas, tags, deps)

    def nounish(i: int) -> bool:
        return tags[i] in NOUNISH

    root = next(
        (i for i in range(n - 1, -1, -1) if tags[i].startswith("V")), None
    )
    if root is None:
        root = next((i for i in range(n - 1, -1, -1) if nounish(i)), 0)
    rw = (words[root], tags[root])
    attached = {root}

    def attach(gi: int, rel: str, di: int):
        deps.append(((words[gi], tags[gi]), rel, (words[di], tags[di])))
        attached.add(di)

    subj = next((i for i in range(root) if nounish(i)), None)
    if subj is not None:
        attach(root, "nsubj", subj)

    # left-headed compounds (opposite of the simple backend)
    for i in range(n - 1):
        if tags[i] in ("NN", "NNS", "NNP") and tags[i + 1] in ("NN", "NNS", "NNP"):
            attach(i, "compound", i + 1)

    alt = 0
    for i in range(n):
        if nounish(i) and i not in attached and i != subj:
            attach(root, "dobj" if alt % 2 == 0 else "nmod", i)
            alt += 1

    # modifiers attach BACKWARD to the nearest preceding noun-ish token
    for i in range(n):
        if tags[i] in ("DT", "JJ") and i not in attached:
            prv = next((j for j in range(i - 1, -1, -1) if nounish(j)), None)
            if prv is not None:
                attach(prv, "det" if tags[i] == "DT" else "amod", i)

    for i in range(n):
        if tags[i] == "." and i not in attached:
            deps.append((rw, "punct", (words[i], tags[i])))
            attached.add(i)
    for i in range(n):
        if i not in attached:
            deps.append((rw, "dep", (words[i], tags[i])))
    return ParsedSentence(words, lemmas, tags, deps)


def parse_turn(text: str) -> ParsedSentence:
    return parse_sentence(text)
