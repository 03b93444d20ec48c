"""mapreduce_llm_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of ``clems4ever/mapreduce-llm``
(reference at /root/reference, studied not copied): the chunk → LLM-map →
ordered-reduce text pipeline, generalized into a full relational/analytic
operator surface (scans, joins, aggregations, windows, set ops, scalar
function families, event-time analytics) plus LLM-data-pipeline operators
(dedup, similarity search, text statistics, multimodal plumbing) — all
expressed Spark-first on the DataFrame API so Catalyst/AQE pick the
physical plan.
"""

__version__ = "0.1.0"
