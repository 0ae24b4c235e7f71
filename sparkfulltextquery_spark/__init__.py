"""sparkfulltextquery_spark — a PySpark-native analytics + full-text query engine.

A brand-new engine with the query and data-processing capabilities of
``bigdata-iscas/SparkFullTextQuery`` (a full-text-search fork of Apache Spark
2.1.0-SNAPSHOT), re-expressed Spark-first: the relational surface is the
modern DataFrame/SQL API planned by Catalyst, and the full-text layer
(tokenize → posting lists → TF-IDF/BM25 → top-k search) plus the large-scale
training-data operators (dedup, similarity search, text analysis, multimodal
columns) are thin, shuffle-parallel libraries of DataFrame transformations.

Layout
------
- ``session``    : SparkSession bootstrap tuned for the target cluster
- ``sources``    : table loaders / writers (parquet, csv, json, text, jdbc)
- ``operators``  : relational query builders (joins, aggs, windows, set ops)
- ``functions``  : full-text + text-analysis column functions
- ``plans``      : query-plan inspection helpers (explain / pushdown checks)
- ``streaming``  : Structured Streaming operators (windows, watermark, dedup)

Reference parity notes cite files under /root/reference (Spark 2.1 fork);
see SURVEY.md for the complete operator inventory this package covers.
"""

__version__ = "0.1.0"

from sparkfulltextquery_spark.session import get_spark  # noqa: F401
