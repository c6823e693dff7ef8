"""opensearch_jvector_plugin_spark — a PySpark-native full-text (BM25) index
and query engine.

A from-scratch re-expression of the index lifecycle of the reference plugin
``sam-herman/opensearch-jvector-plugin`` (per-segment index build -> segment
merge -> compact on-disk format with offset metadata + checksums -> per-segment
top-k query -> global top-k reduce), rebuilt Spark-first for BM25 full-text
search over transcript tables:

- ``sources``    : deterministic transcript synthesizer + readers
- ``functions``  : tokenizer + scalar text functions (Spark built-ins first)
- ``plans``      : scalable docID assignment, corpus statistics
- ``operators``  : postings codec, segment build, merge, WAND query, dedup,
                   similarity search, text analysis
- ``streaming``  : incremental index append via Structured Streaming

Everything crosses the Python/JVM boundary through Arrow (pandas UDFs /
``mapInPandas`` / ``applyInPandas``); there is no per-row Python anywhere in
the hot path.
"""

__version__ = "0.1.0"

ENGINE_NAME = "opensearch_jvector_plugin_spark"
FORMAT_VERSION = 1
