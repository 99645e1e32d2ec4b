"""Inverted-index build + BM25 query side (the Elasticsearch/Lucene layer the
reference delegates to — /root/reference/app/helpers/es.py — re-owned as
Spark DataFrame programs)."""
