"""Parse stage: transcripts -> `parsed` nested table (one Arrow UDF pass).

This is the engine's only Python hot-path stage, mirroring the reference's
external-parser boundary (CoreNLP HTTP per chunk, corenlp_api.py:20-34 —
Spark partitioning replaces that manual chunking). Everything downstream is
pure Catalyst.

Output schema (fixed):

    parsed(conv_id string, sent_id int,
           words array<string>, lemmas array<string>, tags array<string>,
           deps array<struct<fw,ftag,rel,tw,ttag>>)

`sent_id` is the reference's positional sentence id; for transcripts it IS
`turn_idx` (stable-ordering invariant), for the `documents` table it is the
sentence index after deterministic sentence splitting.

At 100 TB the parse is the dominant cost and is embarrassingly parallel:
mapInPandas keeps it one pass, no shuffle, no driver involvement; the `text`
column is read once and never mutated (per-turn equality invariant).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .nlp.simple_parser import split_sentences

DEP_STRUCT = StructType(
    [
        StructField("fw", StringType(), False),
        StructField("ftag", StringType(), False),
        StructField("rel", StringType(), False),
        StructField("tw", StringType(), False),
        StructField("ttag", StringType(), False),
    ]
)

PARSED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("sent_id", IntegerType(), False),
        StructField("words", ArrayType(StringType(), False), False),
        StructField("lemmas", ArrayType(StringType(), False), False),
        StructField("tags", ArrayType(StringType(), False), False),
        StructField("deps", ArrayType(DEP_STRUCT, False), False),
    ]
)


def _parse_batches_for(backend: str | None):
    """Batch-parse closure for a backend NAME: each Arrow worker resolves
    the module itself (pluggable seam, see nlp/backends.py)."""

    def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .nlp.backends import get_parse_turn

        parse_turn = get_parse_turn(backend)
        for pdf in batches:
            yield _parse_one(pdf, parse_turn)

    return _parse_batches


def _parse_one(pdf: pd.DataFrame, parse_turn) -> pd.DataFrame:
    out = {k: [] for k in ("conv_id", "sent_id", "words", "lemmas", "tags", "deps")}
    for conv_id, sent_id, text in zip(pdf["conv_id"], pdf["sent_id"], pdf["text"]):
        ps = parse_turn(text)
        out["conv_id"].append(conv_id)
        out["sent_id"].append(sent_id)
        out["words"].append(ps.words)
        out["lemmas"].append(ps.lemmas)
        out["tags"].append(ps.tags)
        out["deps"].append(
            [
                {"fw": f[0], "ftag": f[1], "rel": r, "tw": t[0], "ttag": t[1]}
                for (f, r, t) in ps.deps
            ]
        )
    return pd.DataFrame(out)


def parse_transcripts(transcripts: DataFrame, backend: str | None = None) -> DataFrame:
    """transcripts(conv_id, turn_idx, ..., text) -> parsed.

    `backend` names a parser plugin (nlp/backends.py); None = the default
    (or the DEEPRANK_PARSER_BACKEND env override).

    Width guard: a small corpus arrives as ONE parquet file -> one
    partition (file splitting only kicks in above maxPartitionBytes), and
    everything from the Arrow parse to the first shuffle then runs on a
    single core regardless of cluster size — measured 1-partition parse +
    cascade on a 32-thread session before this guard. When the input is
    narrower than the session's parallelism, round-robin repartition
    BEFORE the parse: the parse output (the engine's widest table) is
    what must be spread, and a narrow pre-parse shuffle of raw text is
    the cheapest place to buy that. Wide inputs (the 100-TB case: many
    files, thousands of partitions) are left untouched — no extra
    shuffle."""
    src = transcripts.select(
        "conv_id", F.col("turn_idx").cast("int").alias("sent_id"), "text"
    )
    if not src.isStreaming:  # .rdd is illegal on a stream; micro-batches
        # inherit the source's own partitioning there
        target = src.sparkSession.sparkContext.defaultParallelism
        if src.rdd.getNumPartitions() < target // 2:
            src = src.repartition(target)
    return src.mapInPandas(_parse_batches_for(backend), schema=PARSED_SCHEMA)


def documents_as_transcripts(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text) -> transcripts shape: one sentence per turn.

    Sentence splitting is a Catalyst expression (split on terminal
    punctuation + whitespace), so only the per-sentence parse is Python.
    """
    sents = documents.select(
        F.concat(F.lit("d"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.posexplode(
            F.filter(
                F.transform(
                    F.split(F.col("text"), r"(?<=[.!?])\s+"),
                    lambda s: F.trim(s),
                ),
                lambda s: F.length(s) > 0,
            )
        ).alias("turn_idx", "text"),
    )
    return sents.select(
        "conv_id",
        F.col("turn_idx").cast("int"),
        F.lit("user").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def split_sentences_py(text: str) -> list[str]:
    """Driver-side helper kept in sync with the Catalyst splitter."""
    return split_sentences(text)
