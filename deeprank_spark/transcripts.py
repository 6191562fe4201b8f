"""Deterministic synthetic transcript generator (the BASELINE input_hint shape).

Schema (fixed, declared — never inferred):

    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)

Two generators, same schema:

- `tiny_transcripts` / `small_transcripts`: driver-side pandas fixtures for
  pytest (seeded; include the literal reference docs "The cat sits on the
  mat." and "The cat walks. The dog barks." from /root/reference/test.py:8,17).
- `gen_transcripts_df`: fully distributed generator — `spark.range` plus
  Catalyst expressions only (xxhash64-derived picks, Zipf-skewed nouns so hub
  lemmas exist), so the same code can synthesize a 10^12-turn table on a real
  cluster with zero driver-side data movement.
"""

from __future__ import annotations

import datetime as _dt
import math
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .wordlist import GEN_ADJS, GEN_NAMES, GEN_NOUNS, GEN_VERBS

TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "python", "browser", "calculator"]
_EPOCH = _dt.datetime(2026, 1, 1, 0, 0, 0)


def _zipf_idx(rng: random.Random, n: int) -> int:
    """Zipf(s=1)-skewed index in [0, n): p(rank) ~ 1/rank."""
    u = rng.random()
    return min(n - 1, int(math.exp(u * math.log(n))) - 1)


def _sentence(rng: random.Random) -> str:
    nouns = GEN_NOUNS
    kind = rng.randrange(5)
    n1 = nouns[_zipf_idx(rng, len(nouns))]
    n2 = nouns[_zipf_idx(rng, len(nouns))]
    v = GEN_VERBS[rng.randrange(len(GEN_VERBS))]
    adj = GEN_ADJS[rng.randrange(len(GEN_ADJS))]
    name = GEN_NAMES[rng.randrange(len(GEN_NAMES))]
    if kind == 0:
        return f"The {n1} {v} the {n2}."
    if kind == 1:
        return f"The {adj} {n1} {v} on the {n2}."
    if kind == 2:
        return f"{name} {v} the {adj} {n2}."
    if kind == 3:
        return f"The {n1} {n2} {v} the {nouns[_zipf_idx(rng, len(nouns))]}."
    return f"The {n1} {v}."


def _rows(conv_id: str, sents: list[str], start: _dt.datetime, rng: random.Random):
    rows = []
    for i, s in enumerate(sents):
        tool = TOOLS[rng.randrange(len(TOOLS))] if rng.random() < 0.1 else None
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": i,
                "role": ROLES[i % 4],
                "text": s,
                "tool": tool,
                "ts": start + _dt.timedelta(seconds=30 * i),
            }
        )
    return rows


def tiny_transcripts() -> pd.DataFrame:
    """3 conversations incl. the literal reference micro-docs."""
    rng = random.Random(42)
    rows = []
    rows += _rows("c_cat", ["The cat sits on the mat."], _EPOCH, rng)
    rows += _rows("c_catdog", ["The cat walks.", "The dog barks."], _EPOCH, rng)
    rows += _rows(
        "c_mixed",
        [
            "Alice builds the graph engine.",
            "The graph engine ranks the data.",
            "The big data moves on the fast cluster.",
            "Bob reads the summary.",
            "The summary answers the question.",
        ],
        _EPOCH,
        rng,
    )
    return pd.DataFrame(rows)


def small_transcripts(n_convs: int = 40, max_turns: int = 24, seed: int = 42) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for c in range(n_convs):
        n = 3 + rng.randrange(max_turns - 2)
        sents = [_sentence(rng) for _ in range(n)]
        start = _EPOCH + _dt.timedelta(hours=c)
        rows += _rows(f"c{c:05d}", sents, start, rng)
    return pd.DataFrame(rows)


def transcripts_sdf(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    return spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)


def gen_transcripts_df(
    spark: SparkSession,
    n_convs: int = 1000,
    turns_per_conv: int = 50,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed generator: spark.range + expressions, no driver data.

    Deterministic in (n_convs, turns_per_conv, seed). Zipf-skewed noun picks
    create hub lemmas (skew-handling fixtures); one designated hub
    conversation (conv 0) is 8x longer than the rest to create a hub vertex
    partition.
    """
    n = n_convs * turns_per_conv + 7 * turns_per_conv  # conv 0 gets 8x turns
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    nouns = F.array(*[F.lit(w) for w in GEN_NOUNS])
    verbs = F.array(*[F.lit(w) for w in GEN_VERBS])
    adjs = F.array(*[F.lit(w) for w in GEN_ADJS])
    names = F.array(*[F.lit(w) for w in GEN_NAMES])
    roles = F.array(*[F.lit(r) for r in ROLES])
    tools = F.array(*[F.lit(t) for t in TOOLS])

    hub_extra = 7 * turns_per_conv
    conv = F.when(F.col("id") < turns_per_conv + hub_extra, F.lit(0)).otherwise(
        ((F.col("id") - F.lit(hub_extra)) / turns_per_conv).cast("long")
    )
    turn = F.when(F.col("id") < turns_per_conv + hub_extra, F.col("id")).otherwise(
        (F.col("id") - F.lit(hub_extra)) % turns_per_conv
    )

    def h(salt: int):
        return F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)))

    def uni(salt: int):  # uniform in [0,1)
        return (h(salt) % 1000000) / 1000000.0

    def zipf_pick(arr, size: int, salt: int):
        idx = F.least(
            F.lit(size - 1),
            (F.exp(uni(salt) * math.log(size)) - 1).cast("int"),
        )
        return F.element_at(arr, idx + 1)

    def flat_pick(arr, size: int, salt: int):
        return F.element_at(arr, (h(salt) % size).cast("int") + 1)

    n1 = zipf_pick(nouns, len(GEN_NOUNS), 1)
    n2 = zipf_pick(nouns, len(GEN_NOUNS), 2)
    n3 = zipf_pick(nouns, len(GEN_NOUNS), 3)
    v = flat_pick(verbs, len(GEN_VERBS), 4)
    adj = flat_pick(adjs, len(GEN_ADJS), 5)
    name = flat_pick(names, len(GEN_NAMES), 6)
    kind = (h(7) % 5).cast("int")

    text = (
        F.when(kind == 0, F.concat(F.lit("The "), n1, F.lit(" "), v, F.lit(" the "), n2, F.lit(".")))
        .when(kind == 1, F.concat(F.lit("The "), adj, F.lit(" "), n1, F.lit(" "), v, F.lit(" on the "), n2, F.lit(".")))
        .when(kind == 2, F.concat(name, F.lit(" "), v, F.lit(" the "), adj, F.lit(" "), n2, F.lit(".")))
        .when(kind == 3, F.concat(F.lit("The "), n1, F.lit(" "), n2, F.lit(" "), v, F.lit(" the "), n3, F.lit(".")))
        .otherwise(F.concat(F.lit("The "), n1, F.lit(" "), v, F.lit(".")))
    )

    return df.select(
        F.format_string("c%08d", conv).alias("conv_id"),
        turn.cast("int").alias("turn_idx"),
        F.element_at(roles, (turn % 4).cast("int") + 1).alias("role"),
        text.alias("text"),
        F.when(h(8) % 10 == 0, flat_pick(tools, len(TOOLS), 9)).alias("tool"),
        (F.lit(_EPOCH) + F.make_interval(secs=conv * 3600 + turn * 30)).alias("ts"),
    )
