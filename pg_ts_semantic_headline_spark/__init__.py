"""pg_ts_semantic_headline_spark — a PySpark-native positional inverted-index,
BM25 and whole-phrase headline engine with the query semantics of the
pg_ts_semantic_headline PostgreSQL extension, re-architected Spark-first.

Layout:
- functions/  pure text kernels (canonicalizer, unaccent, stemmers, lexize)
- plans/      driver-side query compiler + distributed DataFrame plans
              (phrase matching, headline, index build, BM25 search)
- operators/  training-data pipeline operators (dedup, similarity, text
              stats, multimodal plumbing)
- sources/    corpus loaders / normalizers
- streaming/  incremental index maintenance
"""

__version__ = "0.1.0"
