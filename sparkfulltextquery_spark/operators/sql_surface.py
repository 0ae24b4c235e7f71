"""SQL-text surface — mirrors the reference's golden-file SQL test corpus
(sql/core/src/test/resources/sql-tests/inputs/: cte.sql, having.sql,
outer-join.sql, natural-join.sql, limit.sql, group-by-ordinal.sql, ...).

Each query here is a *SQL string* executed by spark.sql so the ANTLR-parser
entry point (SURVEY.md §3 entry A) is exercised, with the same ANSI SQL
runnable in DuckDB as the oracle. Where dialects diverge the two texts
differ minimally and the divergence is noted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table

_TABLES = ("orders", "lineitem", "customer", "nation", "region", "part", "supplier")


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in _TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


_CTE_SQL = """
    WITH big_orders AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_totalprice > 150000
    ),
    per_cust AS (
      SELECT o_custkey, count(*) AS n_big, round(sum(o_totalprice), 2) AS total_big
      FROM big_orders GROUP BY o_custkey
    )
    SELECT c_custkey, n_big, total_big
    FROM customer JOIN per_cust ON c_custkey = o_custkey
    WHERE n_big >= 2
"""


@query("sqlt_cte", oracle=_CTE_SQL)
def sqlt_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CTEs (reference cte.sql) — same text both engines."""
    _views(spark, sf_dir)
    return spark.sql(_CTE_SQL)


_HAVING_ORDINAL_SQL = """
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY 1
    HAVING count(*) > 100
"""


@query("sqlt_groupby_ordinal_having", oracle=_HAVING_ORDINAL_SQL)
def sqlt_groupby_ordinal_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ordinal + HAVING (reference group-by-ordinal.sql, having.sql)."""
    _views(spark, sf_dir)
    return spark.sql(_HAVING_ORDINAL_SQL)


_SCALAR_SUBQ_SQL = """
    SELECT o_orderkey, o_totalprice,
           round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 4) AS delta_from_avg
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.8
"""


@query("sqlt_scalar_subquery", oracle=_SCALAR_SUBQ_SQL)
def sqlt_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subqueries (reference optimizer/subquery.scala:107
    rewrites; modern Catalyst plans them as reused subquery broadcasts)."""
    _views(spark, sf_dir)
    return spark.sql(_SCALAR_SUBQ_SQL)


_CORRELATED_SQL = """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_acctbal > (SELECT coalesce(avg(o_totalprice), 0) * 0.03 FROM orders
                       WHERE o_custkey = c_custkey)
      AND c_custkey < 100
"""


@query("sqlt_correlated_subquery", oracle=_CORRELATED_SQL)
def sqlt_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery → decorrelated to left-outer join + agg
    (reference RewriteCorrelatedScalarSubquery, optimizer/subquery.scala:107)."""
    _views(spark, sf_dir)
    return spark.sql(_CORRELATED_SQL)


_NATURAL_JOIN_SQL = """
    SELECT n_name, r_name
    FROM (SELECT n_name, n_regionkey AS r_regionkey FROM nation)
    NATURAL JOIN region
"""


@query("sqlt_natural_join", oracle=_NATURAL_JOIN_SQL)
def sqlt_natural_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL JOIN (reference natural-join.sql; analyzer rule
    ResolveNaturalAndUsingJoin, Analyzer.scala:100)."""
    _views(spark, sf_dir)
    return spark.sql(_NATURAL_JOIN_SQL)


_LIMIT_OFFSET_SQL = """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 5
"""


@query("sqlt_limit_offset", oracle=_LIMIT_OFFSET_SQL)
def sqlt_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET (reference limit.sql; OFFSET is a modern addition)."""
    _views(spark, sf_dir)
    return spark.sql(_LIMIT_OFFSET_SQL)


_UNPIVOT_SPARK = """
    SELECT p_partkey, attr, val
    FROM part
    UNPIVOT (val FOR attr IN (p_brand AS brand, p_type AS type))
"""

_UNPIVOT_DUCK = """
    SELECT p_partkey, 'brand' AS attr, p_brand AS val FROM part
    UNION ALL
    SELECT p_partkey, 'type'  AS attr, p_type  AS val FROM part
"""


@query("sqlt_unpivot", oracle=_UNPIVOT_DUCK)
def sqlt_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (modern surface; reference-era spelled it via stack —
    see stack_unpivot). Dialects differ → oracle uses the UNION ALL form."""
    _views(spark, sf_dir)
    return spark.sql(_UNPIVOT_SPARK)


_VALUES_ARITH_SQL = """
    SELECT k,
           k + 7 AS plus,
           k * 3 AS times,
           CAST(k AS DOUBLE) / 4.0 AS div,
           k % 5 AS mod,
           -k AS neg
    FROM (VALUES (1), (2), (12), (100)) AS t(k)
"""


@query("sqlt_values_arithmetic", oracle=_VALUES_ARITH_SQL)
def sqlt_values_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES list + arithmetic operators (reference arithmetic.sql,
    literals.sql)."""
    return spark.sql(_VALUES_ARITH_SQL)


@query(
    "sqlt_xpath",
    oracle="SELECT 'hello' AS s, 7 AS i, 'x,y' AS arr, true AS bool",
)
def sqlt_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xpath_* family (reference expressions/xml/, registry :305-314).
    DuckDB has no xpath, but the inputs are constants, so the oracle states
    the expected values as literals — a real value check, not rows-only."""
    return spark.sql(
        """
        SELECT xpath_string('<a><b>hello</b></a>', '/a/b')          AS s,
               xpath_int('<a><b>7</b></a>', '/a/b')                 AS i,
               array_join(
                 xpath('<a><b>x</b><b>y</b></a>', '/a/b/text()'), ','
               )                                                    AS arr,
               xpath_boolean('<a><b>1</b></a>', '/a/b')             AS bool
        """
    )


_STAT_FREQ_CACHE: dict = {}


@query(
    "stat_freq_sample",
    oracle="""
    SELECT true AS freq_has_all_heavy,
           true AS sample_in_bounds,
           true AS quantiles_within_eps
    FROM (SELECT 1)
    """,
)
def stat_freq_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.stat surface: freqItems + sampleBy + approxQuantile (reference
    DataFrameStatFunctions.scala:66,224,332 — Greenwald-Khanna sketch).
    All three are approximate/seeded, so the driver-checked output is each
    one's PUBLISHED guarantee: freqItems(support=0.2) must contain every
    value whose true frequency exceeds the support; the 0.5-fraction
    stratified sample lands in [0.35, 0.65]·N (>7σ); each approxQuantile
    (eps=0.01) lies between the exact quantiles at q∓0.02.

    Eager by nature — freqItems/approxQuantile/sampleBy RETURN driver
    values, that's the API under test — so the cost is bounded two ways
    (ADVICE r03): the exact twins collapse to two jobs (N + all six
    percentile bounds in one combined aggregate, then the heavy-hitter
    groupBy which needs N; was four separate actions), and the verdict
    row is memoized per (session, sf_dir) so repeated plan-builds and
    plan-dumps don't re-run any jobs."""
    from pyspark.sql import functions as F

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _STAT_FREQ_CACHE:
        return _STAT_FREQ_CACHE[key]()

    o = load_table(spark, sf_dir, "orders")
    freq_items = set(
        o.stat.freqItems(["o_orderpriority"], support=0.2)
        .head()["o_orderpriority_freqItems"]
    )
    q25, q50, q75 = o.stat.approxQuantile("o_totalprice", [0.25, 0.5, 0.75], 0.01)
    sampled_n = o.sampleBy(
        "o_orderstatus", fractions={"O": 0.5, "F": 0.5, "P": 0.5}, seed=7
    ).count()
    # combined exact-twin job: N plus all six exact percentile bounds in
    # ONE aggregate (was three separate actions)
    row = o.agg(
        F.count(F.lit(1)).alias("n_total"),
        *[
            F.percentile("o_totalprice", F.lit(p)).alias(f"q{i}")
            for i, p in enumerate((0.23, 0.48, 0.73, 0.27, 0.52, 0.77))
        ],
    ).head()
    n_total = row.n_total
    lo25, lo50, lo75, hi25, hi50, hi75 = [float(row[f"q{i}"]) for i in range(6)]
    heavy = {
        r.o_orderpriority
        for r in o.groupBy("o_orderpriority")
        .count()
        .filter(F.col("count") > 0.2 * n_total)
        .collect()
    }
    verdict = (
        heavy.issubset(freq_items),
        bool(0.35 * n_total <= sampled_n <= 0.65 * n_total),
        bool(
            lo25 <= q25 <= hi25 and lo50 <= q50 <= hi50 and lo75 <= q75 <= hi75
        ),
    )
    schema = (
        "freq_has_all_heavy boolean, sample_in_bounds boolean, "
        "quantiles_within_eps boolean"
    )
    _STAT_FREQ_CACHE[key] = lambda: spark.createDataFrame([verdict], schema)
    return _STAT_FREQ_CACHE[key]()


_RANGE_TVF_SPARK = "SELECT id, id * id AS sq FROM range(0, 50, 3)"
_RANGE_TVF_DUCK = """
    SELECT id, id * id AS sq
    FROM (SELECT unnest(range(0, 50, 3)) AS id)
"""


@query("sqlt_range_table_function", oracle=_RANGE_TVF_DUCK)
def sqlt_range_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range(...) table-valued function in FROM position (reference
    ResolveTableValuedFunctions, analysis/ResolveTableValuedFunctions.scala)."""
    return spark.sql(_RANGE_TVF_SPARK)


@query(
    "fn_from_json",
    oracle="""
    SELECT event_id,
           cast(json_extract_string(props, '$.k') AS int)  AS k,
           to_json(json_extract(props, '$'))               AS rt
    FROM events WHERE event_id < 200
    """,
)
def fn_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json/to_json struct round trip (modern superset of the
    reference's GetJsonObject/JsonTuple — SURVEY.md §2.8 notes the snapshot
    predates from_json)."""
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    parsed = e.select(
        "event_id", F.from_json("props", "k INT").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.to_json("p").alias("rt"),
    )


@query(
    "fn_datetime_misc",
    oracle="""
    SELECT o_orderkey,
           round((1998 - year(o_orderdate)) * 12 + (1 - month(o_orderdate))
                 + (1 - day(o_orderdate)) / 31.0, 6)                 AS mb,
           (o_orderdate::DATE + ((8 - isodow(o_orderdate)) % 7
              + CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7 ELSE 0 END)
            * INTERVAL 1 DAY)::TIMESTAMP                              AS next_mon,
           weekofyear(o_orderdate)                                    AS woy,
           timezone('UTC', timezone('America/New_York', o_orderdate)) AS utc_ts,
           date_trunc('quarter', o_orderdate)::TIMESTAMP              AS q_start
    FROM orders WHERE o_orderkey < 300
    """,
)
def fn_datetime_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime functions with dialect-specific semantics, each REBUILT in
    the oracle from primitives so the check is exact: months_between's
    31-day fractional rule (stringExpressions-era Hive semantics — the
    end day here is the 1st, so the whole/fractional branches collapse to
    one closed form on midnight-aligned dates), next_day as an isodow
    offset, ISO weekofyear, to_utc_timestamp as a double timezone()
    rebase, and quarter trunc. histogram_numeric moved to its own
    invariant-checked query (agg_histogram_numeric)."""
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    ts = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.round(
            F.months_between(F.lit("1998-01-01").cast("timestamp"), ts), 6
        ).alias("mb"),
        F.next_day(ts.cast("date"), "Mon").cast("timestamp").alias("next_mon"),
        F.weekofyear(ts).alias("woy"),
        F.to_utc_timestamp(ts, "America/New_York").alias("utc_ts"),
        F.trunc(ts.cast("date"), "quarter").cast("timestamp").alias("q_start"),
    )


_RECURSIVE_BUCKETS_SQL = """
    WITH RECURSIVE buckets(b, lo, hi) AS (
      SELECT 0, CAST(0 AS DOUBLE), CAST(60000 AS DOUBLE)
      UNION ALL
      SELECT b + 1, hi, hi + 60000 FROM buckets WHERE b < 9
    )
    SELECT b, lo, hi, count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS revenue
    FROM buckets LEFT JOIN orders ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY b, lo, hi
"""


@query("sqlt_recursive_cte_buckets", oracle=_RECURSIVE_BUCKETS_SQL)
def sqlt_recursive_cte_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE generating a bucket ladder, theta-joined to a fact
    table (recursive CTEs are a modern surface absent in the reference
    snapshot — its cte.sql corpus covers only plain CTEs). The 10-row
    recursive side broadcasts; the fact side never shuffles."""
    _views(spark, sf_dir)
    return spark.sql(_RECURSIVE_BUCKETS_SQL)


_RECURSIVE_CLOSURE_SQL = """
    WITH RECURSIVE edge(node, parent) AS (
      SELECT * FROM (VALUES ('c1','root'),('c2','root'),('c11','c1'),
                            ('c12','c1'),('c21','c2'),('c111','c11'))
                 AS e(node, parent)
    ),
    anc(node, anc, depth) AS (
      SELECT node, parent, 1 FROM edge
      UNION ALL
      SELECT a.node, e.parent, a.depth + 1
      FROM anc a JOIN edge e ON a.anc = e.node
    )
    SELECT node, anc, depth FROM anc
"""


@query("sqlt_recursive_transitive_closure", oracle=_RECURSIVE_CLOSURE_SQL)
def sqlt_recursive_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive transitive closure over a VALUES edge list — the
    hierarchy-walk idiom (iterate-until-fixpoint inside one SQL statement,
    same text both engines)."""
    return spark.sql(_RECURSIVE_CLOSURE_SQL)


_LATERAL_TOPK_SQL = """
    SELECT c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) AS t
    WHERE c_custkey < 60
"""


@query("sqlt_lateral_topk", oracle=_LATERAL_TOPK_SQL)
def sqlt_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY ... LIMIT (the
    top-k-per-key join spelled relationally; Catalyst decorrelates it via
    DecorrelateInnerQuery into a ranked join rather than re-executing the
    inner query per row)."""
    _views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPK_SQL)


_GROUP_BY_ALL_SQL = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ALL
"""


@query("sqlt_group_by_all", oracle=_GROUP_BY_ALL_SQL)
def sqlt_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+/DuckDB shared dialect): grouping keys
    inferred as every non-aggregate select item — the analyzer resolution
    convenience layered on the same Aggregate plan."""
    _views(spark, sf_dir)
    return spark.sql(_GROUP_BY_ALL_SQL)


_LATERAL_ALIAS_SQL = """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net,
           round(net * (1 + l_tax), 4) AS net_taxed
    FROM lineitem
    WHERE l_orderkey < 100
"""


@query("sqlt_lateral_column_alias", oracle=_LATERAL_ALIAS_SQL)
def sqlt_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column alias (Spark 3.4+): a select item referencing a prior
    alias in the same SELECT — resolved by the analyzer into nested
    projections, no subquery needed. Same dialect in DuckDB."""
    _views(spark, sf_dir)
    return spark.sql(_LATERAL_ALIAS_SQL)


@query(
    "sqlt_pipe_syntax",
    oracle="""
    SELECT l_returnflag, count(*) AS n_bulk,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS net_rev
    FROM lineitem
    WHERE l_quantity > 45
    GROUP BY l_returnflag
    """,
)
def sqlt_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0 `|>` operators): the linear FROM-first
    form of the same logical plan — each |> stage maps 1:1 onto a plan node
    exactly as the DataFrame API does (§3 entry point A ∩ B). Oracle is the
    equivalent standard SQL."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity > 45
        |> AGGREGATE count(*) AS n_bulk,
                     round(sum(l_extendedprice * (1 - l_discount)), 2) AS net_rev
           GROUP BY l_returnflag
        """
    )


_NULL_ORDERING_SQL = """
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS v
      FROM orders WHERE o_orderkey < 300
    )
    SELECT o_orderkey, v,
           CAST(row_number() OVER (ORDER BY v ASC NULLS FIRST, o_orderkey)
                AS BIGINT) AS rk_nulls_first,
           CAST(row_number() OVER (ORDER BY v DESC NULLS LAST, o_orderkey)
                AS BIGINT) AS rk_nulls_last
    FROM t
"""


@query("sqlt_null_ordering", oracle=_NULL_ORDERING_SQL)
def sqlt_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null sort order made explicit (SURVEY §7 'hard parts': Spark defaults
    to NULLS FIRST on ASC, DuckDB to NULLS LAST — silent cross-engine
    divergence unless spelled out). Both rankings pin the explicit
    NULLS FIRST/LAST forms, which agree everywhere."""
    _views(spark, sf_dir)
    return spark.sql(_NULL_ORDERING_SQL)


@query(
    "sqlt_script_transform",
    oracle="""
    SELECT o_orderpriority AS p, count(*) AS n,
           cast(sum(o_orderkey) AS bigint) AS key_sum
    FROM orders GROUP BY o_orderpriority
    """,
)
def sqlt_script_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style script transform — SELECT TRANSFORM ... USING 'cat'
    (reference ScriptTransformation, sql/hive/.../hiveOperators.scala-era
    ScriptTransformationExec; Spark ≥3.0 runs the no-serde form without
    Hive). Rows are piped through an external process per partition —
    the escape hatch predating Pandas UDFs. The identity script ('cat')
    keeps it oracle-checkable: output re-parses as strings, so the query
    re-aggregates on the script's output to a typed result.

    Scale note: one OS process per partition task, rows stream through
    stdin/stdout — parallelism is the partition count, same as any
    mapPartitions; prefer Arrow-batched Pandas UDFs in new code."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p, count(*) AS n, cast(sum(cast(k AS bigint)) AS bigint) AS key_sum
        FROM (
          SELECT TRANSFORM(o_orderkey, o_orderpriority)
          USING 'cat' AS (k STRING, p STRING)
          FROM orders
        )
        GROUP BY p
        """
    )


# ---------------------------------------------------------------------------
# Golden-file closure (VERDICT r04 #2): the remaining
# sql-tests/inputs/*.sql families not yet mapped to an oracle query —
# outer-join.sql, order-by-ordinal.sql, null-propagation.sql,
# inline-table.sql, literals.sql.
# ---------------------------------------------------------------------------


@query(
    "sqlt_outer_join_coalesce_having",
    oracle="""
    WITH t1(int_col1) AS (VALUES (-234), (145), (367), (975), (298)),
         t2(int_col0, int_col1) AS
           (VALUES (-769, -244), (-800, -409), (940, 86), (-507, 304),
                   (-367, 158))
    SELECT CAST(SUM(COALESCE(t1.int_col1, t2.int_col0)) AS BIGINT) AS s,
           CAST(COALESCE(t1.int_col1, t2.int_col0) * 2 AS BIGINT) AS d
    FROM t1 RIGHT JOIN t2 ON t2.int_col0 = t1.int_col1
    GROUP BY GREATEST(COALESCE(t2.int_col1, 109), COALESCE(t1.int_col1, -449)),
             COALESCE(t1.int_col1, t2.int_col0)
    HAVING SUM(COALESCE(t1.int_col1, t2.int_col0))
             > COALESCE(t1.int_col1, t2.int_col0) * 2
    """,
)
def sqlt_outer_join_coalesce_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """outer-join.sql's SPARK-17099 regression shape: RIGHT JOIN whose
    GROUP BY keys and HAVING predicate are COALESCE expressions over both
    join sides — the aggregate must resolve the coalesce against the
    join output, not either input."""
    return spark.sql(
        """
        WITH t1 AS (SELECT * FROM VALUES (-234), (145), (367), (975), (298)
                    AS t1(int_col1)),
             t2 AS (SELECT * FROM VALUES (-769, -244), (-800, -409),
                    (940, 86), (-507, 304), (-367, 158)
                    AS t2(int_col0, int_col1))
        SELECT CAST(SUM(COALESCE(t1.int_col1, t2.int_col0)) AS BIGINT) AS s,
               CAST(COALESCE(t1.int_col1, t2.int_col0) * 2 AS BIGINT) AS d
        FROM t1 RIGHT JOIN t2 ON t2.int_col0 = t1.int_col1
        GROUP BY GREATEST(COALESCE(t2.int_col1, 109),
                          COALESCE(t1.int_col1, -449)),
                 COALESCE(t1.int_col1, t2.int_col0)
        HAVING SUM(COALESCE(t1.int_col1, t2.int_col0))
                 > COALESCE(t1.int_col1, t2.int_col0) * 2
        """
    )


@query(
    "sqlt_outer_join_on_false",
    oracle="""
    WITH t1(int_col1) AS (VALUES (97)), t2(int_col1) AS (VALUES (0))
    SELECT * FROM (
      SELECT COALESCE(t2.int_col1, t1.int_col1) AS int_col
      FROM t1 LEFT JOIN t2 ON false
    ) t WHERE t.int_col IS NOT NULL
    """,
)
def sqlt_outer_join_on_false(spark: SparkSession, sf_dir: str) -> DataFrame:
    """outer-join.sql's SPARK-17120 regression shape: LEFT JOIN ON false —
    the optimizer must keep the null-padded left rows (not collapse the
    join to an empty LocalRelation)."""
    return spark.sql(
        """
        WITH t1 AS (SELECT * FROM VALUES (97) AS t1(int_col1)),
             t2 AS (SELECT * FROM VALUES (0) AS t2(int_col1))
        SELECT * FROM (
          SELECT COALESCE(t2.int_col1, t1.int_col1) AS int_col
          FROM t1 LEFT JOIN t2 ON false
        ) t WHERE t.int_col IS NOT NULL
        """
    )


@query(
    "sqlt_orderby_ordinal",
    oracle="""
    WITH data(a, b) AS (VALUES (1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2))
    SELECT * FROM data ORDER BY 1 DESC, b DESC LIMIT 3
    """,
)
def sqlt_orderby_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """order-by-ordinal.sql: ORDER BY ordinal-position mixed with a column
    name (rule ResolveOrdinalInOrderByAndGroupBy). The LIMIT makes ordinal
    resolution observable through the order-insensitive compare: resolving
    1 to the wrong column selects a different top-3 set."""
    return spark.sql(
        """
        SELECT * FROM VALUES (1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2)
        AS data(a, b) ORDER BY 1 DESC, b DESC LIMIT 3
        """
    )


@query(
    "sqlt_null_propagation",
    oracle="""
    SELECT CAST(count(NULL) AS BIGINT)                        AS cnt_null,
           CAST(count(1 + NULL) AS BIGINT)                    AS cnt_expr_null,
           CAST(count(*) AS BIGINT)                           AS cnt_star,
           CAST(NULL AS BIGINT)                               AS sum_null,
           CAST(max(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS INT) AS any_null
    FROM (VALUES (1), (2), (3)) t(v)
    """,
)
def sqlt_null_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """null-propagation.sql: COUNT(NULL) and COUNT(expr-that-folds-to-NULL)
    are 0, never null; SUM over no non-null input is NULL; constant-folding
    must preserve these (NullPropagation optimizer rule)."""
    return spark.sql(
        """
        SELECT CAST(count(NULL) AS BIGINT)     AS cnt_null,
               CAST(count(1 + NULL) AS BIGINT) AS cnt_expr_null,
               CAST(count(*) AS BIGINT)        AS cnt_star,
               CAST(sum(CAST(NULL AS BIGINT)) AS BIGINT) AS sum_null,
               CAST(max(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS INT) AS any_null
        FROM VALUES (1), (2), (3) AS t(v)
        """
    )


@query(
    "sqlt_inline_table",
    oracle="""
    SELECT a, CAST(b AS BIGINT) AS b, arr, CAST(d AS DOUBLE) AS d
    FROM (VALUES ('one', 1 + 0, [0, 1], 2.0),
                 ('two', CAST(4 AS BIGINT), [2, 3], 3.0),
                 ('three', NULL, [4, 5], NULL)) data(a, b, arr, d)
    """,
)
def sqlt_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline-table.sql: VALUES with column aliases, NULL cells, int→long
    coercion across rows, foldable expressions, array-typed cells, and
    decimal/double coercion (rule ResolveInlineTables)."""
    return spark.sql(
        """
        SELECT a, b, arr, CAST(d AS DOUBLE) AS d
        FROM VALUES ('one', 1 + 0, array(0, 1), 2.0),
                    ('two', 4L, array(2, 3), 3.0D),
                    ('three', NULL, array(4, 5), NULL)
        AS data(a, b, arr, d)
        """
    )


@query(
    "sqlt_literals",
    oracle="""
    SELECT CAST(42 AS INT) AS i, CAST(9223372036854775807 AS BIGINT) AS big,
           3.14 AS dec_lit, CAST(2.5 AS DOUBLE) AS dbl,
           'sp''ark' AS s, true AS t, false AS f,
           CAST(NULL AS INT) AS n,
           TIMESTAMP '2016-03-11 20:54:00' AS ts,
           CAST(DATE '2016-03-11' AS TIMESTAMP) AS d,
           CAST('ab' AS BLOB) AS bin
    """,
)
def sqlt_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """literals.sql: typed literal syntax across int/bigint/decimal/double/
    string (with escaped quote)/boolean/null/timestamp/date/binary. DATE is
    cast to timestamp on both sides (pandas renders date vs
    midnight-timestamp differently — conftest discipline)."""
    return spark.sql(
        """
        SELECT 42 AS i, 9223372036854775807L AS big,
               3.14 AS dec_lit, CAST(2.5D AS DOUBLE) AS dbl,
               'sp\\'ark' AS s, true AS t, false AS f,
               CAST(NULL AS INT) AS n,
               TIMESTAMP '2016-03-11 20:54:00' AS ts,
               CAST(DATE '2016-03-11' AS TIMESTAMP) AS d,
               CAST('ab' AS BINARY) AS bin
        """
    )


_DISTRIBUTE_SORT_ORACLE = """
    SELECT l_returnflag, count(*) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem GROUP BY l_returnflag
"""


@query("sqlt_distribute_sort_by", oracle=_DISTRIBUTE_SORT_ORACLE)
def sqlt_distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-dialect DISTRIBUTE BY + SORT BY (reference analogue:
    sql/core SQLQuerySuite "distribute by"/"sort by" and the Hive
    clusterby/distributeby golden files): hash-repartition on the key,
    then sort within partitions only — no global order. The outer GROUP
    BY rides the same key, so Catalyst's EnsureRequirements reuses the
    DISTRIBUTE BY exchange: exactly one shuffle in the whole plan
    (asserted in tests/test_plans.py). At 100 TB this is the idiom for
    write-time layout control — cluster the output files by a key
    without paying a global sort."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n,
               sum(CAST(l_quantity AS BIGINT)) AS qty
        FROM (
          SELECT l_returnflag, l_quantity FROM lineitem
          DISTRIBUTE BY l_returnflag SORT BY l_returnflag
        )
        GROUP BY l_returnflag
        """
    )


@query("sqlt_cluster_by", oracle=_DISTRIBUTE_SORT_ORACLE)
def sqlt_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER BY key = DISTRIBUTE BY key SORT BY key in one clause (the
    Hive shorthand; reference golden family clusterby*.q). Same
    exchange-reuse property as sqlt_distribute_sort_by."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n,
               sum(CAST(l_quantity AS BIGINT)) AS qty
        FROM (
          SELECT l_returnflag, l_quantity FROM lineitem
          CLUSTER BY l_returnflag
        )
        GROUP BY l_returnflag
        """
    )


_PIVOT_CLAUSE_ORACLE = """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS F_qty,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS O_qty
    FROM lineitem
    GROUP BY l_returnflag
"""


@query("sqlt_pivot_clause", oracle=_PIVOT_CLAUSE_ORACLE)
def sqlt_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT clause (reference analogue: sql-tests/inputs/pivot.sql;
    Spark plans it as the same two-phase PivotFirst aggregate as
    DataFrame.pivot — one shuffle, value columns widened map-side).
    Oracle is the dialect-portable CASE-WHEN expansion."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT * FROM (
          SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS qty
          FROM lineitem
        )
        PIVOT (sum(qty) FOR l_linestatus IN ('F' AS F_qty, 'O' AS O_qty))
        """
    )


_UNPIVOT_CLAUSE_ORACLE = """
    WITH wide AS (
      SELECT l_returnflag,
             CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS f_qty,
             CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS o_qty
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, status, qty FROM (
      SELECT l_returnflag, 'f_qty' AS status, f_qty AS qty FROM wide
      UNION ALL
      SELECT l_returnflag, 'o_qty', o_qty FROM wide
    ) WHERE qty IS NOT NULL
"""


@query("sqlt_unpivot_clause", oracle=_UNPIVOT_CLAUSE_ORACLE)
def sqlt_unpivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNPIVOT clause (Spark 3.4+; reference analogue the stack()
    golden family): widen then melt back to (key, status, qty). UNPIVOT
    excludes NULL cells by default — mirrored in the oracle's WHERE.
    Plans as Expand (no shuffle beyond the aggregate)."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        WITH wide AS (
          SELECT l_returnflag,
                 sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END) AS f_qty,
                 sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END) AS o_qty
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, status, qty
        FROM wide UNPIVOT (qty FOR status IN (f_qty, o_qty))
        """
    )


_LATERAL_SQL = """
    SELECT o_orderkey, t.n_items, t.max_qty
    FROM orders, LATERAL (
      SELECT COUNT(*) AS n_items,
             COALESCE(MAX(CAST(l_quantity AS BIGINT)), -1) AS max_qty
      FROM lineitem WHERE l_orderkey = o_orderkey
    ) t
    WHERE o_orderkey % 50 = 0
"""


@query("sqlt_lateral_join", oracle=_LATERAL_SQL)
def sqlt_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table (SQL:1999; Spark 3.2+ LateralJoin,
    DuckDB lateral): the per-row subquery decorrelates to an aggregate
    left join — Catalyst's DecorrelateInnerQuery, the same rewrite the
    reference's RewriteCorrelatedScalarSubquery applies
    (subquery.scala:312). IDENTICAL text runs on both engines."""
    _views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)
