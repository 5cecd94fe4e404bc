"""Query-side engine: parser → logical Query tree → two executors.

- :mod:`lucene_solr_spark.query.bm25_df` — brute-force Catalyst-only
  scorer (milestone M1; the pinned rank-identity oracle, SURVEY §7.5).
- :mod:`lucene_solr_spark.query.executor` — the real engine: pruned
  segment scan → vectorized posting decode → block-max WAND top-k.
"""
