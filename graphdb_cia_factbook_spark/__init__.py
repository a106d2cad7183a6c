"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ``jkaszpurenko/graphdb_cia_factbook``
(batch dataflow: CIA factbook scrape -> pandas relational preprocessing ->
Neo4j property graph -> GDS PageRank/ArticleRank), rebuilt Spark-first.

Layout
------
- ``session``    : SparkSession builder tuned for local[32] testing and
                   configured the way a 1000-executor cluster would be
                   (AQE, skew join, broadcast thresholds).
- ``schemas``    : explicit StructType registry (the reference declares
                   every dtype up front, preprocess_upload_neo4j.py:83-97;
                   we never infer).
- ``sources``    : schema-enforced scans + sinks + key-uniqueness
                   assertions (reference S2-S7).
- ``functions``  : the reference's scalar cleaning functions (currency /
                   year / percentage / population parsers, scrape_cia.py)
                   as native Catalyst column expressions -- no Python UDFs.
- ``operators``  : relational (latest-per-key, ranks, joins), graph
                   (DataFrame-Pregel PageRank/ArticleRank), dedup
                   (exact / MinHash-LSH / SimHash / n-gram Jaccard),
                   similarity (cosine top-k ANN), text analysis,
                   multimodal binary plumbing.
- ``streaming``  : Structured-Streaming surface (tumbling / sliding /
                   session windows, watermark dedup) with batch-equivalent
                   forms for oracle checking.
- ``plans``      : physical-plan introspection helpers (assert pushdown /
                   broadcast / codegen) used by tests and the bench.
"""

__version__ = "0.1.0"
