"""Engine configuration.

Mirrors the reference's parameter objects (craft_params defaults at
/root/reference/textcrafts/deepRank.py:13-31, talk_params at
deep_talk/qpro.py:14-27) as frozen dataclasses so every knob the reference
exposes has a declared, typed equivalent here.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class CraftParams:
    """Graph building / ranking / extraction knobs.

    Defaults match the reference exactly (deepRank.py:23-31).
    """

    all_recs: bool = True      # emit word -recommends-> sentence edges
    giant_comp: bool = False   # restrict extraction to giant component
    # gate on STRONGLY connected components (exact reference parity:
    # deepRank.py:398-406 uses nx.strongly_connected_components). False =
    # weak CCs, the round-1/2 documented divergence kept as the default so
    # existing oracles/behavior are unchanged.
    giant_comp_scc: bool = False
    noun_defs: bool = True     # emit noun -first_in-> sentence edges
    noun_self: bool = False    # emit noun self-loops

    sent_count: int = 5        # summary length (sentences)
    word_count: int = 6        # keyword count
    rel_count: int = 10        # SVO relation count
    dot_count: int = 16        # viz top-k (unused in engine)

    # parser plugin (nlp/backends.py; mirrors the reference's exchangeable
    # adapters behind parser_api.py:5-30). The oracle strategy pins only
    # the DEFAULT backend's outputs; any backend must flow through the
    # pipeline unchanged (tests/test_parser_backends.py).
    parser_backend: str = "simple"

    # PageRank kernel (networkx defaults, deepRank.py:535)
    damping: float = 0.85
    tol: float = 1.0e-6
    max_iter: int = 100

    @staticmethod
    def adjust_rank(rank: float, length: float, avg: float) -> float:
        """Sentence-length penalty (deepRank.py:34-39)."""
        return rank / (1.0 + math.log(1.0 + abs(length - avg)))


@dataclass
class TalkParams:
    """Dialog/query-engine knobs (qpro.py:14-27, query.py:9-26)."""

    personalize: int = 30     # top-k query nodes used as personalization
    max_answers: int = 3
    quest_memory: int = 1


@dataclass
class EngineConfig:
    """Top-level engine configuration."""

    craft: CraftParams = field(default_factory=CraftParams)
    talk: TalkParams = field(default_factory=TalkParams)

    # Distributed-kernel knobs (scale path)
    shuffle_partitions: int = 32
    salt_buckets: int = 0          # 0 = rely on map-side combine; >0 = explicit 2-phase agg
    checkpoint_interval: int = 8   # durable/reset superstep cadence (see pagerank.py)
    use_arrow: bool = True


DEFAULT = EngineConfig()
