"""Operator library (SURVEY.md §2).

- :mod:`.relational` -- projections/filters (P1-P8), joins (J1-J8),
  aggregations (A1-A5), windows (W1-W3 + analytics), sorts (O1-O3),
  set ops (U1+).
- :mod:`.graph` -- vertex/edge DataFrames + iterative DataFrame
  PageRank / ArticleRank (G1-G4).
- :mod:`.dedup` -- exact, MinHash-LSH, SimHash, n-gram Jaccard.
- :mod:`.similarity` -- cosine top-k / LSH-bucketed ANN over embeddings.
- :mod:`.text` -- language-ID, quality scoring, token counting,
  fingerprinting.
- :mod:`.multimodal` -- opaque binary columns + Pandas-UDF decode
  plumbing.
"""
