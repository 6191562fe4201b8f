"""Stage-level profile of the scaling-criterion flagship job (VERDICT r3
next-round #4: find the ~40 s fixed per-run driver cost).

Runs the same work as bench.py --kernel-job but with a wall-clock timer
around every driver ACTION (each materialization boundary), so the
fixed-vs-parallel split is visible by comparing local[1] and local[4]
outputs stage by stage.

Usage: SPARK_GRAFT_CPUS=4 python tools/flagship_profile.py [n_convs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from deeprank_spark.config import CraftParams  # noqa: E402
from deeprank_spark.session import get_spark  # noqa: E402
from deeprank_spark.transcripts import gen_transcripts_df  # noqa: E402


def main(n_convs: int) -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    t_start = time.time()
    spark = get_spark(
        app_name="flagship-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    stages: dict[str, float] = {}
    stages["session_init"] = round(time.time() - t_start, 2)

    t0 = time.time()
    tr = gen_transcripts_df(
        spark, n_convs=n_convs, turns_per_conv=30, partitions=64
    ).localCheckpoint(eager=True)
    n_turns = tr.count()
    stages["gen_input_untimed"] = round(time.time() - t0, 2)

    from deeprank_spark import engine
    from deeprank_spark.operators.edges import (
        graph_edges,
        multi_edges_table,
        noun_set_table,
        svo_table,
        tokens_table,
        w2l_sentence,
    )
    from deeprank_spark.operators.extract import summary
    from deeprank_spark.parse import parse_transcripts

    p = CraftParams()
    job_t0 = time.time()

    def tick(name, fn):
        t = time.time()
        out = fn()
        stages[name] = round(time.time() - t, 2)
        return out

    mode = os.environ.get("DEEPRANK_DIGEST_MATERIALIZE", "checkpoint")

    def mat(df):
        if mode == "persist":
            df = df.persist()
            df.count()
            return df
        return df.localCheckpoint(eager=True)

    def mat_multi(df):
        # batch mode: cascade stays lazy and fuses into the kernel shuffle,
        # so its cost shows up inside pagerank_ranks (as it does in prod)
        return df if mode == "batch" else mat(df)

    parsed = tick("parse", lambda: mat(parse_transcripts(tr, backend=p.parser_backend)))
    toks = tokens_table(parsed)
    # lazy, mirroring engine.digest: the cascade resolves lemmas row-locally
    w2l = w2l_sentence(toks)
    nouns = noun_set_table(toks)
    multi = tick("edge_cascade", lambda: mat_multi(multi_edges_table(parsed, nouns, p)))
    from deeprank_spark.operators.edges import edges_table

    ed = edges_table(multi)
    ged = graph_edges(ed)
    from deeprank_spark.operators.edges import vertices_table

    verts = vertices_table(ged)
    svo = svo_table(parsed, p)
    d = engine.Digest(parsed, toks, w2l, nouns, multi, ed, ged, verts, svo)

    r = tick("pagerank_ranks", lambda: (lambda x: (x.persist(), x.count())[0])(
        engine.ranks(d, p)
    ))
    n_sum = [0]

    def run_summary():
        out = summary(r, d.parsed, params=p).orderBy("conv_id", "turn_idx")
        n_sum[0] = out.count()
        return out

    tick("summary", run_summary)
    stages["job_total"] = round(time.time() - job_t0, 2)
    print(json.dumps({
        "cpus": int(cpus),
        "n_convs": n_convs,
        "turns": n_turns,
        "summary_rows": n_sum[0],
        "digest_mode": mode,
        **stages,
    }))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30_000)
