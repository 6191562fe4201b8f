"""Built-in word lists (hermetic replacements for the reference's NLTK data).

The reference builds its dictionary from `nltk.corpus.words` plus local
`words.txt`/`kb.txt` files and its stopword set from `nltk.corpus.stopwords`
(/root/reference/textcrafts/deepRank.py:65-87). NLTK is not available here and
would not be hermetic anyway, so the engine ships:

- STOP_WORDS: the standard English stopword list (public-domain list).
- WORD_SET: a fixed dictionary covering the synthetic-corpus vocabulary plus
  common English words, so the reference's `inDict` suffix heuristics
  (deepRank.py:137-164) have the same shape over our fixtures.

Both are small enough to broadcast; Spark-side they are used via
`F.lit(array(...))`/broadcast joins, never per-row Python.
"""

from __future__ import annotations

STOP_WORDS = frozenset(
    """a about above after again against all am an and any are aren't as at be
    because been before being below between both but by can't cannot could
    couldn't did didn't do does doesn't doing don't down during each few for
    from further had hadn't has hasn't have haven't having he he'd he'll he's
    her here here's hers herself him himself his how how's i i'd i'll i'm i've
    if in into is isn't it it's its itself let's me more most mustn't my myself
    no nor not of off on once only or other ought our ours ourselves out over
    own same shan't she she'd she'll she's should shouldn't so some such than
    that that's the their theirs them themselves then there there's these they
    they'd they'll they're they've this those through to too under until up
    very was wasn't we we'd we'll we're we've were weren't what what's when
    when's where where's which while who who's whom why why's with won't would
    wouldn't you you'd you'll you're you've your yours yourself yourselves
    """.split()
)

# Nouns used by the synthetic transcript generator (Zipf-weighted -> hub lemmas)
GEN_NOUNS = (
    "cat mat dog house tree river engine model graph rank data table spark "
    "cluster node edge vertex query plan join shuffle partition executor "
    "driver memory disk network token word sentence document turn agent tool "
    "answer question summary keyword relation verb noun system user car road "
    "city book paper idea result test error value key index list set map "
    "batch stream state checkpoint metric lineage"
).split()

GEN_VERBS = (
    "sits walks barks runs reads writes builds ranks links joins groups "
    "filters scans sorts counts merges splits maps reduces shuffles caches "
    "parses answers asks summarizes extracts finds loads stores sends gets "
    "moves makes takes gives keeps holds shows opens closes starts stops"
).split()

GEN_ADJS = (
    "big small fast slow old new good bad red blue green long short high low "
    "deep wide dense sparse hot cold clean dirty heavy light strong weak"
).split()

GEN_NAMES = (
    "Alice Bob Carol Dave Erin Frank Grace Heidi Ivan Judy Mallory Oscar "
    "Peggy Trent Victor Wendy"
).split()

_COMMON_EXTRA = (
    "time year people way day man thing woman life child world school place "
    "work week case point company number group problem fact be have does done "
    "said say made went gone come came look looked want wanted use used find "
    "found give gave tell told become became leave left feel felt put bring "
    "brought begin began seem seemed help helped talk talked start started "
    "run ran walk walked sit sat bark barked president office senate congress "
    "law power state states united amendment removed remove elect elected "
    "vote impeachment trial court justice speed light mass energy relativity "
    "theory frame motion observer battery charge wheel door seat screen "
    "manual vehicle drive press touch button "
    # vocabulary of the driver-provided synthetic documents corpus
    "key agg row scan slow fast table value part hash merge batch line sort "
    "window customer query big small order data column join group stream "
    "filter spark supplier region nation"
).split()

# Base (lemma) forms of the generator verbs: the lemmatizer emits "hold"
# for "holds" etc., and isCleanSent checks LEMMAS against the dictionary.
_VERB_LEMMAS = tuple(v[:-1] if v.endswith("s") else v for v in GEN_VERBS)

WORD_SET = frozenset(
    w.lower()
    for w in (
        GEN_NOUNS + GEN_VERBS + list(_VERB_LEMMAS) + GEN_ADJS + GEN_NAMES
        + _COMMON_EXTRA
    )
) | frozenset(
    # function words: the reference's NLTK `words` dictionary contains
    # them, and isCleanSent (deepRank.py:171-184) relies on that — without
    # these every sentence containing "the" is judged unclean
    w for w in STOP_WORDS if "'" not in w
)


def in_dict(w: str) -> bool:
    """Reference `inDict` semantics (deepRank.py:137-164) over WORD_SET."""
    def ends_well(x: str) -> bool:
        return x.endswith(("ing", "ed", "ility", "ly", "er", "st"))

    if not w:
        return False
    if w in WORD_SET or w.capitalize().lower() in WORD_SET or w.lower() in WORD_SET:
        return True
    if ends_well(w):
        return True
    if w[-1] == "s":
        return ends_well(w[:-1])
    return False


def is_name(w: str) -> bool:
    """Reference `isName` (deepRank.py:104-105)."""
    return bool(w) and w.isalnum() and w[0].isupper()


def is_word(w: str) -> bool:
    """Reference `isWord` (deepRank.py:96-101)."""
    return isinstance(w, str) and len(w) > 1 and (is_name(w) or in_dict(w))


def is_stop_word(w: str) -> bool:
    return w.lower() in STOP_WORDS
