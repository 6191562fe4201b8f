"""Test oracle: row-at-a-time reimplementation of the reference semantics.

Executes the reference's text-graph pipeline (edge rule cascade
/root/reference/textcrafts/deepRank.py:292-361, helper builders :721-772,
ranking :533-560, extraction :414-599) in plain Python + networkx over the
SAME deterministic parser the Spark engine uses. Tests compare the Spark
DataFrame implementation against this module; the two code paths share no
dataflow code.

Divergences from the reference, pinned deliberately (documented in SURVEY §7):
- tie order: total order (rank DESC, kind ASC, key ASC) instead of dict/set
  insertion order (which is hash-randomized in the reference).
- sentence length penalty applied to every ranked sentence (the reference's
  loop index stalls at the first sentence id missing from the graph,
  deepRank.py:546-556).
- bestWords yields exactly k survivors (the reference's counter consumes
  budget on filtered-out candidates, deepRank.py:504-516).
- WordNet SVO extensions are an empty pluggable dimension (no NLTK here).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import networkx as nx

from ..config import CraftParams
from ..nlp.simple_parser import ParsedSentence, parse_sentence
from ..wordlist import is_stop_word, is_word

SENT = "SENT"


def maybe_word(w) -> bool:
    """Reference maybeWord (deepRank.py:112-134)."""
    if not isinstance(w, str) or not w:
        return False
    if is_word(w) and len(w) > 1:
        return True
    if w in ("a", "A", "'s", "I") or (w[0].isupper() and w.endswith(".")):
        return True
    if w in ",.?;:-'()" or w == '"':
        return True
    if w.isdigit():
        return True
    parts = w.split("-")
    if len(parts) >= 2 and all(p and maybe_word(p) for p in parts):
        return True
    return False


def in_dict_ref(w: str) -> bool:
    from ..wordlist import in_dict

    return in_dict(w)


def is_clean_sent(lemmas) -> bool:
    """Reference isCleanSent (deepRank.py:171-184)."""
    if len(lemmas) < 3:
        return False
    for w in lemmas:
        if not w:
            return False
        if maybe_word(w) or in_dict_ref(w):
            continue
        return False
    return True


@dataclass
class DocGraph:
    parsed: list  # list[ParsedSentence]
    multi_edges: list = field(default_factory=list)   # (src, src_tag, rel, dst, dst_tag, sent_id)
    edges: set = field(default_factory=set)           # distinct 5-tuples
    noun_set: dict = field(default_factory=dict)      # lemma -> first noun sentence
    words2lemmas: set = field(default_factory=set)    # (word, lemma, tag)
    svos: list = field(default_factory=list)          # (subj, verb, obj, sent_id)


def digest(sent_texts: list[str], params: CraftParams | None = None) -> DocGraph:
    """Reference edgesInSent rule cascade over the configured deterministic
    parser backend (params.parser_backend — same plugin registry the Spark
    side resolves, nlp/backends.py)."""
    p = params or CraftParams()
    if p.parser_backend == "simple":
        pfn = parse_sentence
    else:
        from ..nlp.backends import get_parse_sentence

        pfn = get_parse_sentence(p.parser_backend)
    parsed = [pfn(s) for s in sent_texts]
    dg = DocGraph(parsed=parsed)

    # noun_set: first sentence where a lemma occurs with a noun tag
    # (make_noun_set, deepRank.py:735-742; incremental build == global min)
    for k, ps in enumerate(parsed):
        for l, t in zip(ps.lemmas, ps.tags):
            if l and t[:1] == "N" and l not in dg.noun_set:
                dg.noun_set[l] = k

    for k, ps in enumerate(parsed):
        d = {}
        for w, l, t in zip(ps.words, ps.lemmas, ps.tags):
            if w:
                d[w] = (l, t)  # last occurrence wins (w2l, deepRank.py:721-730)
        for w, (l, t) in d.items():
            dg.words2lemmas.add((w, l, t))

        def first_in(x, tx):
            if p.noun_defs and dg.noun_set.get(x) == k:
                yield (x, tx, "first_in", k, SENT)

        svo_edges_in_sent = []
        out = []
        for (fr, rel, to) in ps.deps:
            lfrom, ftag = d[fr[0]]
            lto, ttag = d[to[0]]
            so = ("subj" in rel) or ("obj" in rel)
            vn = ftag[:1] == "V" and ttag[:1] == "N" and so
            if rel == "punct" and ttag == ".":
                out.append((k, SENT, "predicate", lfrom, ftag))
            elif vn:
                if lfrom != lto:
                    svo_edges_in_sent.append((lfrom, ftag, rel, lto, ttag))
                out.append((lfrom, ftag, rel, lto, ttag))
                out.append((k, SENT, "about", lto, ttag))
                out.extend(first_in(lto, ttag))
                if p.noun_self:
                    out.append((lto, ttag, "self", lto, ttag))
            elif ttag[:1] == "N":
                out.append((lfrom, ftag, rel, lto, ttag))
                out.extend(first_in(lto, ttag))
                if p.noun_self:
                    out.append((lto, ttag, "self", lto, ttag))
            else:
                out.append((lto, ttag, rel, lfrom, ftag))
                if p.all_recs:
                    out.append((lto, ttag, "recommends", k, SENT))
            if ftag[:1] == "N" and ttag[:1] == "N" and rel == "compound":
                comp = lto + " " + lfrom
                out.append((lfrom, ftag, "fused", comp, ftag))
                out.append((lto, ttag, "fused", comp, ttag))
                out.extend(first_in(comp, ttag))
                if p.noun_self:
                    out.append((comp, ttag, "self", comp, ttag))

        # SVO assembly (to_svo, deepRank.py:754-772): last subj/obj per verb wins
        s, o = {}, {}
        for (f, ft, rel, t, tt) in svo_edges_in_sent:
            if not (is_word(f) and is_word(t)):
                continue
            if "subj" in rel:
                s[(f, ft)] = (t, tt)
            elif "obj" in rel:
                o[(f, ft)] = (t, tt)
        for vt in s:
            if vt in o:
                dg.svos.append((s[vt][0], vt[0], o[vt][0], k))

        for e in out:
            dg.multi_edges.append((*e, k))
            dg.edges.add(e)
    return dg


def nx_graph(dg: DocGraph) -> nx.DiGraph:
    """Graph build (deepRank.py:373-386): tags dropped, (src,dst) deduped."""
    g = nx.DiGraph()
    for (f, _tf, r, t, _tt) in sorted(dg.edges, key=lambda e: tuple(map(str, e))):
        g.add_edge(f, t, rel=r)
    return g


def pagerank(
    dg: DocGraph,
    params: CraftParams | None = None,
    pers: dict | None = None,
) -> dict:
    """runPagerank (deepRank.py:533-560): nx.pagerank + length adjustment."""
    p = params or CraftParams()
    g = nx_graph(dg)
    if g.number_of_nodes() == 0:
        return {}
    from .kernels import pagerank_nx

    d = pagerank_nx(
        list(g.edges()), pers=pers, alpha=p.damping, tol=p.tol, max_iter=p.max_iter
    )
    lens = [len(ps.words) for ps in dg.parsed]
    avg = sum(lens) / len(lens) if lens else 0.0
    for k in range(len(dg.parsed)):
        if k in d:
            d[k] = p.adjust_rank(d[k], lens[k], avg)
    return d


def ordered_nodes(ranks: dict) -> list:
    """Pinned total order: rank DESC (compared at the published 8-decimal
    precision, mirroring extract._topk), kind ASC ('S' < 'W'), key ASC."""
    def key(item):
        n, r = item
        if isinstance(n, int):
            return (-round(r, 8), "S", "%020d" % n)
        return (-round(r, 8), "W", n)

    return [n for n, _ in sorted(ranks.items(), key=key)]


def has_noun(dg: DocGraph, w: str) -> bool:
    return any(v in dg.noun_set for v in w.split(" "))


def _node_token(n) -> str:
    return "S%s" % n if isinstance(n, int) else "W" + str(n)


def giant_comp_nodes(dg: DocGraph, scc: bool = False):
    """maxcc (deepRank.py:398-406): None unless the graph has 1-3
    components, else the largest one. scc=False: weak CCs (engine
    divergence, SURVEY §2.9); scc=True: nx.strongly_connected_components,
    the reference's exact gate. Size ties break on the smaller component
    label (min node token), matching extract.giant_component_gate."""
    g = nx_graph(dg)
    if g.number_of_nodes() == 0:
        return None
    if scc:
        ccs = list(nx.strongly_connected_components(g))
    else:
        ccs = list(nx.connected_components(g.to_undirected()))
    if len(ccs) >= 4:
        return None
    return min(ccs, key=lambda c: (-len(c), min(_node_token(n) for n in c)))


def best_words(dg: DocGraph, ranks: dict, k: int, maxcc=None) -> list:
    out = []
    for n in ordered_nodes(ranks):
        if isinstance(n, int) or not isinstance(n, str):
            continue
        if maxcc is not None and n not in maxcc:
            continue
        if not maybe_word(n) or is_stop_word(n) or not has_noun(dg, n):
            continue
        out.append(n)
        if len(out) >= k:
            break
    return out


def best_sentences(dg: DocGraph, ranks: dict, k: int, maxcc=None) -> list:
    """Top-k clean sentences by rank, reordered into document order."""
    picked = []
    for n in ordered_nodes(ranks):
        if not isinstance(n, int):
            continue
        if maxcc is not None and n not in maxcc:
            continue
        if n >= len(dg.parsed) or not is_clean_sent(dg.parsed[n].lemmas):
            continue
        picked.append(n)
        if len(picked) >= k:
            break
    return sorted(picked)


def best_svos(dg: DocGraph, ranks: dict, k: int) -> list:
    scored = []
    for (subj, verb, obj, sent_id) in dg.svos:
        srank = ranks.get(subj)
        orank = ranks.get(obj)
        if srank and orank:
            score = (2 * srank + orank) / 3
            scored.append((score, (subj, verb, obj, sent_id)))
    scored.sort(key=lambda x: (-round(x[0], 8), x[1]))
    out, seen = [], set()
    for _, e in scored:
        if e in seen:
            continue
        seen.add(e)
        out.append(e)
        if len(out) >= k:
            break
    return out


def pers_dict(qdg: DocGraph, qranks: dict) -> dict:
    """Personalization vector from a query digest (deepRank.py:713-717)."""
    return {
        w: r
        for w, r in qranks.items()
        if isinstance(w, str) and maybe_word(w) and not is_stop_word(w)
    }


def query_answers(
    doc: DocGraph,
    query_text: str,
    params: CraftParams | None = None,
    max_answers: int = 3,
) -> list:
    """Entry point C (deep_talk/query.py:95-127): personalized rerank +
    shared-token sentence matching; returns answer sentence ids."""
    p = params or CraftParams()
    qdg = digest([query_text], p)
    qranks = pagerank(qdg, p)
    pr = pers_dict(qdg, qranks)
    reranked = pagerank(doc, p, pers=pr)

    doc_tokens = set()
    sent_of_token: dict = {}
    for (f, _tf, _r, t, _tt, k) in doc.multi_edges:
        for x in (f, t):
            if isinstance(x, str):
                doc_tokens.add(x)
                sent_of_token.setdefault(x, set()).add(k)
    q_tokens = {x for x in qranks if isinstance(x, str)}
    shared = {
        w for w in (q_tokens & doc_tokens)
        if maybe_word(w) and not is_stop_word(w)
    }
    good: set = set()
    for w in shared:
        good |= sent_of_token.get(w, set())

    summary = set(best_sentences(doc, reranked, p.sent_count))
    answers = []
    for n in ordered_nodes(reranked):
        if not isinstance(n, int) or n not in good:
            continue
        if n >= len(doc.parsed) or not is_clean_sent(doc.parsed[n].lemmas):
            continue
        answers.append(n)
        if len(answers) >= max_answers:
            break
    rest = [a for a in answers if a not in summary]
    return sorted(rest if rest else answers)
