"""deeprank_spark — a from-scratch, PySpark-native link-graph analytics engine.

Rebuilds the query/data-processing capabilities of the reference text-graph
mining pipeline (ptarau/DeepRank, studied at /root/reference) as idiomatic
Spark DataFrame dataflow:

- transcripts (conv_id, turn_idx, role, text, tool, ts) -> deps -> edges
  (Catalyst expression pipeline, no per-row Python in the hot path)
- graph kernels: PageRank (damped 0.85, power iteration, networkx-equivalent
  semantics to allclose 1e-6), connected components (hash-min), label
  propagation, triangle count — each with a per-conversation Arrow/numpy
  fast path (applyInPandas; one shuffle total) and a distributed superstep
  path (SpMV join/agg loop with salting, checkpointed state, per-partition
  lineage, resume).
- extraction: keywords / summary / SVO relations per conversation,
  personalized query re-ranking (reference entry point C).
- training-data ops: exact/MinHash-LSH/SimHash/n-gram dedup, embedding
  similarity search, text quality stats, multimodal column plumbing.
"""

__version__ = "0.1.0"
