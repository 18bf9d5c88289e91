"""robokop_build_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
NCATS-Gamma/robokop-build (reference surveyed in SURVEY.md).

Pipeline: extract (posexplode spans + mention detection) → link (candidate
scoring + embedding rerank) → canonicalize (normalization map + connected
components) → materialize (Biolink (subj, pred, obj) triples + node tables,
partitioned by predicate, with lineage + metrics).

Everything is DataFrame-first: built-in pyspark.sql.functions where possible,
Arrow-vectorized pandas UDFs where genuinely needed, never per-row Python.
"""

__version__ = "0.1.0"
