"""tools/lineage_audit.py — must pass on healthy durable kernel runs and
FAIL when the durable state is altered (content integrity: the XOR-fold
of per-partition checksums is partition-layout-independent, so a
post-crash re-read can be verified against the lineage table)."""

import importlib.util
import os

from deeprank_spark.operators.components import components_distributed
from deeprank_spark.operators.pagerank import pagerank_distributed


def _load_audit():
    spec = importlib.util.spec_from_file_location(
        "lineage_audit",
        os.path.join(
            os.path.dirname(__file__), "..", "tools", "lineage_audit.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.audit


def test_lineage_audit_green_then_detects_corruption(tmp_path, spark):
    audit = _load_audit()
    edges = [(i, i + 1) for i in range(40)]
    e = spark.createDataFrame(edges, "src long, dst long")
    ck = str(tmp_path / "ck")
    components_distributed(
        e, checkpoint_dir=ck, run_id="cc", checkpoint_interval=2
    )
    rep = audit(spark, ck, "cc")
    assert rep["ok"], rep
    assert rep["newest"]["checksum_match"] and rep["newest"]["converged"]

    # corrupt the newest round's state: silently drop one row
    k = rep["newest"]["round"]
    path = os.path.join(ck, "cc", f"superstep={k}")
    st = spark.read.parquet(path)
    pdf = st.toPandas().iloc[:-1]  # materialize BEFORE the overwrite
    spark.createDataFrame(pdf, st.schema).write.mode("overwrite").parquet(path)
    rep2 = audit(spark, ck, "cc")
    assert not rep2["ok"]
    assert any("rows" in err or "checksum" in err for err in rep2["errors"])


def test_lineage_audit_empty_graph_run(tmp_path, spark):
    # an empty durable state still leaves a sentinel lineage row, so the
    # auditor can tell "empty by design" from "rows went missing"
    audit = _load_audit()
    e = spark.createDataFrame([], "src long, dst long")
    ck = str(tmp_path / "ck")
    components_distributed(e, checkpoint_dir=ck, run_id="cc")
    rep = audit(spark, ck, "cc")
    assert rep["ok"], rep
    assert rep["newest"]["rows"] == 0 and rep["newest"]["checksum_match"]


def test_lineage_audit_pagerank_rank_normalization(tmp_path, spark):
    # the double `rank` column goes through the same format_number(12)
    # normalization pagerank's own lineage writer uses
    audit = _load_audit()
    edges = [(i, (i * 7 + 1) % 23) for i in range(23)] + [(0, 5), (5, 11)]
    e = spark.createDataFrame(edges, "src long, dst long")
    ck = str(tmp_path / "ck")
    pagerank_distributed(
        e, checkpoint_dir=ck, run_id="pr", checkpoint_interval=3,
        num_partitions=4,
    )
    rep = audit(spark, ck, "pr")
    assert rep["ok"], rep
    assert rep["newest"]["checksum_match"]


def test_lineage_audit_scc_sections_layout(tmp_path, spark):
    # the multi-section protocol (done / rem_v / rem_e per round): the
    # auditor follows the marker's section list and lineage_of pointer
    from deeprank_spark.operators.scc import scc_distributed

    audit = _load_audit()
    edges = [(1, 2), (2, 3), (3, 1), (3, 10), (10, 11), (11, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    ck = str(tmp_path / "ck")
    scc_distributed(e, checkpoint_dir=ck, run_id="scc")
    rep = audit(spark, ck, "scc")
    assert rep["ok"], rep
    assert rep["newest"]["converged"] and rep["newest"]["checksum_match"]
    assert rep["newest"]["rows"] == 5  # all vertices labeled
