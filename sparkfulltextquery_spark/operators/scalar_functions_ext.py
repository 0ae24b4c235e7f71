"""Extended scalar-function coverage — the remaining §2.8 registry families
not exercised by the core suites: extra math (cbrt/hypot/log variants/
degrees/radians/rint/e/pi), extra string (overlay/encode/decode/char_length/
position/btrim), extra array (sequence/array_repeat/arrays_zip/zip_with/
array_min/max/remove/compact), map builders (map_from_entries/map_concat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table


@query(
    "fn_math_extended",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(cbrt(l_extendedprice), 6)                 AS cb,
           round(sqrt(l_quantity * l_quantity + l_extendedprice * l_extendedprice / 1000000), 6)
                                                           AS hyp,
           round(log2(l_extendedprice), 6)                 AS lg2,
           round(ln(1 + l_discount), 8)                    AS l1p,
           round(exp(l_discount) - 1, 8)                   AS em1,
           round(degrees(l_discount), 6)                   AS deg,
           round(radians(l_quantity), 6)                   AS rad,
           round(l_extendedprice / exp(1), 4)              AS div_e,
           round(pi() * l_quantity, 4)                     AS pi_q,
           cast(round(l_extendedprice, 0) AS bigint)       AS rint_v
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def fn_math_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cbrt/hypot/log2/log1p/expm1/degrees/radians/e/pi/rint
    (reference mathExpressions.scala, registry :184-236)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    p, q, d = F.col("l_extendedprice"), F.col("l_quantity"), F.col("l_discount")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.cbrt(p), 6).alias("cb"),
        F.round(F.hypot(q, p / F.lit(1000.0)), 6).alias("hyp"),
        F.round(F.log2(p), 6).alias("lg2"),
        F.round(F.log1p(d), 8).alias("l1p"),
        F.round(F.expm1(d), 8).alias("em1"),
        F.round(F.degrees(d), 6).alias("deg"),
        F.round(F.radians(q), 6).alias("rad"),
        F.round(p / F.exp(F.lit(1.0)), 4).alias("div_e"),
        F.round(F.lit(3.141592653589793) * q, 4).alias("pi_q"),
        F.round(p, 0).cast("bigint").alias("rint_v"),
    )


@query(
    "fn_string_extended",
    oracle="""
    SELECT p_partkey,
           length(p_name)                                   AS clen,
           strpos(p_type, 'a')                              AS pos_a,
           trim(p_brand, '#0123456789')                     AS brand_word,
           concat(substr(p_name, 1, 2), 'XX', substr(p_name, 5)) AS overlaid,
           p_name || '/' || p_brand                         AS joined,
           substr(upper(p_type), 2, 4)                      AS mid
    FROM part
    """,
)
def fn_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """char_length/position/btrim/overlay/|| concat (reference
    stringExpressions.scala trim family :439-475, registry string section)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.char_length("p_name").alias("clen"),
        F.position(F.lit("a"), F.col("p_type")).alias("pos_a"),
        F.btrim(F.col("p_brand"), F.lit("#0123456789")).alias("brand_word"),
        F.overlay(F.col("p_name"), F.lit("XX"), 3, 2).alias("overlaid"),
        F.concat_ws("/", F.col("p_name"), F.col("p_brand")).alias("joined"),
        F.substring(F.upper("p_type"), 2, 4).alias("mid"),
    )


@query(
    "fn_array_extended",
    oracle="""
    WITH t AS (
      SELECT n_nationkey AS k,
             range(1, n_nationkey % 5 + 2) AS seq_arr,
             ['x' , 'x', 'x'] AS rep3
      FROM nation
    )
    SELECT k,
           array_to_string(seq_arr, ',')             AS seq_arr,
           array_to_string(rep3, ',')                AS rep3,
           len(seq_arr)                              AS n,
           list_min(seq_arr)                         AS mn,
           list_max(seq_arr)                         AS mx,
           array_to_string(list_transform(seq_arr, x -> x * 10), ',') AS tens,
           array_to_string(list_transform(list_zip(seq_arr, seq_arr), t -> t[1] + t[2]), ',') AS zip_sum,
           array_to_string(list_filter(seq_arr, x -> x <> 2), ',')    AS no2
    FROM t
    """,
)
def fn_array_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence/array_repeat/array_min/array_max/arrays_zip/array_remove
    (reference collectionOperations.scala + complexTypeCreator.scala)."""
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    seq_arr = F.sequence(F.lit(1).cast("bigint"), (k % 5 + 1).cast("bigint"))
    t = n.select(
        k.alias("k"),
        seq_arr.alias("seq_arr"),
        F.array_repeat(F.lit("x"), 3).alias("rep3"),
    )
    def joined(c):
        return F.concat_ws(",", F.transform(c, lambda x: x.cast("string")))

    return t.select(
        "k",
        joined(F.col("seq_arr")).alias("seq_arr"),
        F.concat_ws(",", F.col("rep3")).alias("rep3"),
        F.size("seq_arr").alias("n"),
        F.array_min("seq_arr").alias("mn"),
        F.array_max("seq_arr").alias("mx"),
        joined(F.transform("seq_arr", lambda x: x * 10)).alias("tens"),
        # zip then element-wise combine — struct-in-array shapes normalize
        # differently across engines, so compare the zipped SUM instead
        joined(F.zip_with("seq_arr", "seq_arr", lambda a, b: a + b)).alias("zip_sum"),
        joined(F.array_remove("seq_arr", 2)).alias("no2"),
    )


@query(
    "fn_map_extended",
    oracle="""
    SELECT n_nationkey,
           map_extract(map_concat(map {'a': n_nationkey}, map {'b': n_regionkey}), 'b')[1]
             AS b_val,
           CAST(cardinality(map_concat(map {'a': n_nationkey}, map {'b': n_regionkey}))
                AS INT) AS n_keys
    FROM nation
    """,
)
def fn_map_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_concat/map_from_entries/cardinality (reference CreateMap:86 and
    collectionOperations MapKeys/Values)."""
    n = load_table(spark, sf_dir, "nation")
    m = F.map_concat(
        F.create_map(F.lit("a"), F.col("n_nationkey")),
        F.create_map(F.lit("b"), F.col("n_regionkey")),
    )
    return n.select(
        "n_nationkey",
        F.element_at(m, F.lit("b")).alias("b_val"),
        F.size(m).alias("n_keys"),
    )


@query(
    "fn_variant_json",
    oracle="""
    SELECT event_id,
           cast(json_extract_string(props, '$.k') AS int)           AS k,
           cast(json_extract_string(props, '$.k') AS int) % 10      AS k_mod,
           cast(cast(json_extract_string(props, '$.k') AS int) >= 50
                AS varchar)                                         AS is_high
    FROM events WHERE event_id < 250
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType semi-structured path access (Spark 4 parse_json +
    variant_get) — the open-schema successor to get_json_object: one binary
    variant column, typed path extraction at query time with pushdown-capable
    shredding. Generalizes the reference's GetJsonObject/JsonTuple
    (jsonExpressions.scala)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 250)
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k"),
        (F.variant_get(v, "$.k", "int") % 10).alias("k_mod"),
        (F.variant_get(v, "$.k", "int") >= 50).cast("string").alias("is_high"),
    )


@query(
    "fn_collation_case_insensitive",
    oracle="""
    SELECT lower(c_mktsegment) AS seg, count(*) AS n,
           count(CASE WHEN lower(c_mktsegment) = 'machinery' THEN 1 END) AS n_machinery
    FROM customer
    GROUP BY lower(c_mktsegment)
    """,
)
def fn_collation_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 collations): grouping and
    equality under UTF8_LCASE — the engine-level form of case-insensitive
    matching (vs the expression-level lower() the oracle uses). The output
    projects lower() so the group representative is engine-independent."""
    c = load_table(spark, sf_dir, "customer")
    seg_ci = F.collate("c_mktsegment", "UTF8_LCASE")
    return (
        c.groupBy(seg_ci.alias("_seg"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(
                F.when(seg_ci == F.lit("MACHINERY").try_cast("string collate UTF8_LCASE"), 1)
            ).alias("n_machinery"),
        )
        .select(F.lower(F.col("_seg").cast("string")).alias("seg"), "n", "n_machinery")
    )


@query(
    "fn_zorder_key",
    oracle=(
        lambda z: f"""
    SELECT l_orderkey, l_linenumber,
           {z} AS zkey
    FROM lineitem WHERE l_orderkey < 50
    """
    )(__import__(
        "sparkfulltextquery_spark.functions.layout", fromlist=["zorder_key_duck"]
    ).zorder_key_duck("l_suppkey", "l_partkey", bits=12)),
)
def fn_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key: bit-interleave of (l_suppkey,
    l_partkey) — the sort key behind multi-dimensional clustered rewrites
    (functions.layout.zorder_rewrite). Pure bitwise column expressions,
    bit-identical across engines."""
    from sparkfulltextquery_spark.functions.layout import zorder_key

    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 50)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        zorder_key("l_suppkey", "l_partkey", bits=12).alias("zkey"),
    )
