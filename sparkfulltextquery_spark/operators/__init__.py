"""Relational operator coverage (SURVEY.md §2.2–2.9).

Each module registers named queries in ``sparkfulltextquery_spark.registry``;
importing this package pulls in the full set. The queries double as the
driver-checked correctness matrix and as living documentation of how every
reference operator maps to a modern PySpark plan.
"""

from sparkfulltextquery_spark.operators import (  # noqa: F401
    advanced,
    aggregates,
    funnels,
    generators,
    graph,
    joins,
    mutation,
    pyfuncs,
    rangejoin,
    relational,
    scalar_functions,
    scalar_functions_ext,
    setops,
    sql_surface,
    tpch,
    tpch2,
    tpcds,
    tpcds_sub,
    tpcds_tail,
    windows,
)
