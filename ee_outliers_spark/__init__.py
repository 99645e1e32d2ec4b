"""ee_outliers_spark — a from-scratch PySpark-native inverted-index build +
BM25 query engine with the query and data-processing capabilities of
NVISOsecurity/ee-outliers (reference at /root/reference, read-only).

The reference delegates all distributed query execution to an Elasticsearch
cluster (app/helpers/es.py); this package re-owns that layer as Spark
DataFrame programs:

- ``tokenizer``    — deterministic analyzer shared by index build, query side
                     and the pure-Python oracle (ref: app/helpers/utils.py:522-534).
- ``corpus``       — Common-Crawl-style web_pages table synthesis + the
                     byte-identical html→text extraction invariant.
- ``index``        — SPIMI per-partition posting-list build, varbyte+delta-gap
                     compression, block-max metadata, LSM merge, BM25 top-k
                     (DataFrame path and block-max WAND path).
- ``queryparser``  — Lucene-subset query_string grammar (ref: es.py:238-250).
- ``operators``    — the analyzer layer: simplequery / terms / metrics /
                     sudden_appearance / word2vec-prob, decision frontiers,
                     whitelisting, plus training-data-pipeline operators
                     (dedup, similarity search, text analysis).
- ``functions``    — scalar metric functions (entropy, base64/hex/url length)
                     as Arrow-vectorized pandas UDFs (ref: app/analyzers/metrics.py).
"""

__version__ = "0.1.0"
