"""Porter2 / Snowball "english" stemmer (M.F. Porter, snowballstem.org,
"The English (Porter2) stemming algorithm", 2002 — public spec).

This is the EXACT algorithm behind SWI-Prolog's `snowball(english, W, V)`
that the reference's word-variant generator calls
(/root/reference/deep_talk/qpro.pro:296): SWI wraps libstemmer's english
module, which implements this spec. Shipping it closes the declared
Porter-1980-vs-Porter2 delta that functions/porter.py documents (classic
Porter stays available as the published-1980 anchor with its own 75
pinned paper vectors).

Implemented from the public spec text (snowballstem.org/algorithms/
english/stemmer.html), not translated from any engine. Semantics pinned
by tests/test_porter2.py: every rule branch has a vector, including the
spec's exceptional forms, the gener/commun/arsen R1 exception, the
longest-match-blocks-shorter-suffixes behaviour ('really' -> 'realli',
'feed' -> 'feed'), and the Y-marking round trip.

Pure python, no state: runs vectorized over Arrow batches
(stem2_series) in the engine and verbatim in the pytest oracle, so both
sides share one definition by construction.
"""

from __future__ import annotations

import pandas as pd

# Vowels AFTER y-marking: a consonant y has been rewritten to 'Y', so any
# remaining lowercase y is a vowel.
_VOW = set("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = set("cdeghkmnrt")

# Exceptional forms, checked on the lowercased word before anything else.
_EXCEPTIONS = {
    "skis": "ski", "skies": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "idly": "idl", "gently": "gentl", "ugly": "ugli", "early": "earli",
    "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

# Checked after step 1a: these stop the algorithm, word unchanged.
_EXCEPTIONS_1A = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"]
)

_STEP2 = sorted(
    [
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", "og"), ("li", ""),
    ],
    key=lambda r: -len(r[0]),
)
_STEP3 = sorted(
    [
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    ],
    key=lambda r: -len(r[0]),
)
_STEP4 = sorted(
    ["ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
     "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic"],
    key=lambda s: -len(s),
)
_STEP1B = ("eedly", "ingly", "edly", "eed", "ing", "ed")


def _mark_y(w: str) -> str:
    """Set initial y, or y after a vowel, to Y (a consonant marker).

    Left to right over the partially rewritten string, exactly like the
    snowball prelude: an already-marked Y is no longer a vowel, so in
    'sayyid' only the first y is marked."""
    if "y" not in w:
        return w
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOW:
            chars[i] = "Y"
    return "".join(chars)


def _std_region(w: str, start: int) -> int:
    """Position after the first non-vowel following a vowel, from
    `start`; len(w) if there is none (the region is then null)."""
    n = len(w)
    i = start
    while i < n and w[i] not in _VOW:
        i += 1
    while i < n and w[i] in _VOW:
        i += 1
    return i + 1 if i < n else n


def _r1(w: str) -> int:
    # Spec exception: if the word begins gener, commun or arsen, R1
    # starts right after that prefix (more conservative than the
    # standard rule for these stems: generate -> generat, general ->
    # general).
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            return len(pre)
    return _std_region(w, 0)


def _ends_short_syllable(w: str) -> bool:
    """(a) non-vowel, vowel, non-vowel other than w/x/Y at the end, or
    (b) the whole word is vowel + non-vowel."""
    n = len(w)
    if n == 2:
        return w[0] in _VOW and w[1] not in _VOW
    if n >= 3:
        return (
            w[-3] not in _VOW
            and w[-2] in _VOW
            and w[-1] not in _VOW
            and w[-1] not in "wxY"
        )
    return False


def _is_short(w: str, r1: int) -> bool:
    """A word is short iff it ends in a short syllable and R1 is null."""
    return r1 >= len(w) and _ends_short_syllable(w)


def porter2_stem(word: str) -> str:
    """Stem one lowercase word per the Snowball english spec.

    The caller lowercases; apostrophes are handled per the spec (they
    are word characters in snowball's model: leading ' dropped, then
    step 0 strips ', 's, 's')."""
    w = word
    if w.startswith("'"):
        w = w[1:]
    if len(w) <= 2:
        return w
    exc = _EXCEPTIONS.get(w)
    if exc is not None:
        return exc

    w = _mark_y(w)
    r1 = _r1(w)
    r2 = _std_region(w, r1)

    # step 0: longest of ' 's 's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: len(w) - len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        # replace by i if preceded by more than one letter, else by ie
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        # delete if the preceding part has a vowel NOT immediately
        # before the s (gap -> gaps stems, gas/this do not)
        if any(c in _VOW for c in w[:-2]):
            w = w[:-1]

    if w in _EXCEPTIONS_1A:
        return w  # exception list contains no Y-marked forms

    # step 1b: longest of eedly ingly edly eed ing ed; a matched suffix
    # whose condition fails blocks shorter ones (feed -> feed)
    suf = next((s for s in _STEP1B if w.endswith(s)), None)
    if suf in ("eedly", "eed"):
        if len(w) - len(suf) >= r1:
            w = w[: len(w) - len(suf)] + "ee"
    elif suf is not None:
        stem = w[: len(w) - len(suf)]
        if any(c in _VOW for c in stem):
            w = stem
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif w.endswith(_DOUBLES):
                w = w[:-1]
            elif _is_short(w, r1):
                w += "e"

    # step 1c: y/Y -> i if preceded by a non-vowel which is not the
    # first letter (cry -> cri, by -> by, say -> say)
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _VOW:
        w = w[:-1] + "i"

    # step 2 (longest match, then the R1 gate — a match outside R1
    # blocks the whole step: really -> realli)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) >= 3 and w[-3] in _LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: len(w) - len(suf)] + rep
            break

    # step 3 (R1 gate; 'ative' additionally requires R2)
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: len(w) - len(suf)]
                else:
                    w = w[: len(w) - len(suf)] + rep
            break

    # step 4 (R2 gate; 'ion' additionally requires preceding s/t)
    for suf in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: len(w) - len(suf)]
            break

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= r2:
        w = w[:-1]

    return w.replace("Y", "y")


def stem2_series(s: pd.Series) -> pd.Series:
    """Vectorized batch entry point for the Arrow UDF path."""
    return s.map(lambda x: porter2_stem(x.lower()) if isinstance(x, str) else x)
