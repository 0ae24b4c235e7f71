"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``sparkfulltextquery_spark`` (registered via the
``@query`` decorator); this module just re-exports the registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import sparkfulltextquery_spark.operators  # noqa: E402,F401  (registers queries)
import sparkfulltextquery_spark.functions  # noqa: E402,F401
import sparkfulltextquery_spark.dedup  # noqa: E402,F401
import sparkfulltextquery_spark.similarity  # noqa: E402,F401
import sparkfulltextquery_spark.textstats  # noqa: E402,F401
import sparkfulltextquery_spark.curation  # noqa: E402,F401
import sparkfulltextquery_spark.multimodal  # noqa: E402,F401
import sparkfulltextquery_spark.streaming  # noqa: E402,F401
from sparkfulltextquery_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 5-way join + agg
    (q5_local_supplier_volume)."""
    from sparkfulltextquery_spark.operators.relational import q5_local_supplier_volume

    return q5_local_supplier_volume(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracles()
