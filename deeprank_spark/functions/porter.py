"""Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
Program 14(3) 1980 — public-domain algorithm; the base of the snowball
English stemmer the reference calls in its word-variant generator,
/root/reference/deep_talk/qpro.pro:296 `snowball(english, W, V)`).

This is a faithful implementation of the ORIGINAL 1980 algorithm (classic
Porter, the snowball project's "porter" stemmer). Divergence note vs the
reference: SWI-Prolog's snowball/3 'english' is Porter2, a later revision
of the same public spec; the delta (a handful of rule refinements) is
documented here and in COVERAGE.md — the 1980 paper carries an exact
published example set, which tests/test_variants.py pins verbatim.

Pure python, no model, no state: runs vectorized over Arrow batches
(stem_series) in the engine and verbatim in the pytest oracle, so both
sides share one definition by construction.
"""

from __future__ import annotations

import pandas as pd

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in the paper's [C](VC)^m[V] decomposition."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    n = len(word)
    return (
        n >= 3
        and _is_cons(word, n - 3)
        and not _is_cons(word, n - 2)
        and _is_cons(word, n - 1)
        and word[-1] not in "wxy"
    )


def _rule_step(word: str, rules, min_m: int) -> str:
    """Longest-matching suffix decides the step: replace iff
    m(stem) > min_m-... (condition m > threshold), else leave unchanged."""
    for suf, rep, extra in rules:
        if word.endswith(suf):
            stem = word[: len(word) - len(suf)]
            if _measure(stem) > min_m and (extra is None or extra(stem)):
                return stem + rep
            return word
    return word


_STEP2 = sorted(
    [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
        ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
        ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
        # documented departure in the author's canonical implementation
        # (porter.c on the snowball site): (m>0) LOGI -> LOG
        ("logi", "log"),
    ],
    key=lambda r: -len(r[0]),
)
_STEP3 = sorted(
    [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ],
    key=lambda r: -len(r[0]),
)
_STEP4 = sorted(
    [
        ("al", ""), ("ance", ""), ("ence", ""), ("er", ""), ("ic", ""),
        ("able", ""), ("ible", ""), ("ant", ""), ("ement", ""), ("ment", ""),
        ("ent", ""), ("ion", ""), ("ou", ""), ("ism", ""), ("ate", ""),
        ("iti", ""), ("ous", ""), ("ive", ""), ("ize", ""),
    ],
    key=lambda r: -len(r[0]),
)


def porter_stem(word: str) -> str:
    """Stem one lowercase word (caller lowercases; non-alpha pass through)."""
    w = word
    if len(w) < 3:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # step 1c: (*v*) y -> i
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m > 0), step 3 (m > 0)
    w = _rule_step(w, [(s, r, None) for s, r in _STEP2], 0)
    w = _rule_step(w, [(s, r, None) for s, r in _STEP3], 0)

    # step 4 (m > 1; 'ion' additionally requires stem ending s or t)
    w = _rule_step(
        w,
        [
            (s, r, (lambda st: st.endswith(("s", "t"))) if s == "ion" else None)
            for s, r in _STEP4
        ],
        1,
    )

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def stem_series(s: pd.Series) -> pd.Series:
    """Vectorized batch entry point for the Arrow UDF path."""
    return s.map(lambda x: porter_stem(x.lower()) if isinstance(x, str) else x)
