"""Reference scalar recognizers as pure Catalyst Column expressions.

Every predicate from /root/reference/textcrafts/deepRank.py:92-232 is
re-expressed as a `pyspark.sql.functions` expression — JVM-side, codegen'd,
usable inside higher-order array functions (forall) — never a Python UDF.
The word dictionary and stopword set are small literal IN-sets (Catalyst
turns them into InSet hash lookups); at a larger dictionary size these would
become broadcast joins instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..wordlist import STOP_WORDS, WORD_SET

_WORDS = sorted(WORD_SET)
_STOPS = sorted(STOP_WORDS)

_ENDS_WELL = ("ing", "ed", "ility", "ly", "er", "st")


def _ends_well(c: Column) -> Column:
    out = F.lit(False)
    for s in _ENDS_WELL:
        out = out | c.endswith(s)
    return out


def in_dict_col(w: Column) -> Column:
    """inDict (deepRank.py:137-164): dictionary membership + suffix heuristics."""
    low = F.lower(w)
    stem = F.when(w.endswith("s"), F.substring(w, 1, F.length(w) - 1)).otherwise(F.lit(""))
    return low.isin(_WORDS) | _ends_well(w) | (w.endswith("s") & _ends_well(stem))


def is_name_col(w: Column) -> Column:
    """isName (deepRank.py:104-105): all-alnum, first char upper."""
    return w.rlike("^[A-Z][A-Za-z0-9]*$")


def is_word_col(w: Column) -> Column:
    """isWord (deepRank.py:96-101)."""
    return (F.length(w) > 1) & (is_name_col(w) | in_dict_col(w))


def is_stop_col(w: Column) -> Column:
    return F.lower(w).isin(_STOPS)


def _is_spec(w: Column) -> Column:
    return w.isin("a", "A", "'s", "I") | (
        w.rlike("^[A-Z]") & w.endswith(".")
    )


def _is_punct(w: Column) -> Column:
    return w.isin(*list(",.?;:-'()"), '"')


def _has_dash(w: Column, part_pred) -> Column:
    """hasDash (deepRank.py:127-134); parts contain no further dashes with our
    tokenizer, so one recursion level is exact."""
    parts = F.split(w, "-")
    return (F.size(parts) >= 2) & F.forall(
        parts, lambda p: (F.length(p) > 0) & part_pred(p)
    )


def _maybe_word_nodash(w: Column) -> Column:
    return (
        (is_word_col(w) & (F.length(w) > 1))
        | _is_spec(w)
        | _is_punct(w)
        | w.rlike("^[0-9]+$")
    )


def maybe_word_col(w: Column) -> Column:
    """maybeWord (deepRank.py:112-116)."""
    return w.isNotNull() & (
        _maybe_word_nodash(w) | _has_dash(w, _maybe_word_nodash)
    )


def is_clean_sent_col(lemmas: Column) -> Column:
    """isCleanSent (deepRank.py:171-184) over a lemma array column."""
    ok = F.forall(
        lemmas,
        lambda x: x.isNotNull()
        & (F.length(x) > 0)
        & (maybe_word_col(x) | in_dict_col(x)),
    )
    return (F.size(lemmas) >= 3) & ok


def is_noun_tag(t: Column) -> Column:
    return F.substring(t, 1, 1) == "N"


def is_verb_tag(t: Column) -> Column:
    return F.substring(t, 1, 1) == "V"


def node_order_key(kind: Column, key: Column) -> Column:
    """Pinned deterministic tie-break key: sentence ids compare numerically
    (zero-padded), word keys lexically; kind 'S' sorts before 'W'."""
    return F.when(kind == "S", F.lpad(key, 20, "0")).otherwise(key)
