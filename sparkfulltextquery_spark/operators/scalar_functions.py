"""Scalar-function coverage (SURVEY.md §2.8) — the 229-function registry
surface (reference catalyst/analysis/FunctionRegistry.scala:160-395).

Organized as one query per family: string, fuzzy-match, datetime, math,
hash/crypto, conditional, array, map, JSON, regex. Every expression here is a
built-in `pyspark.sql.functions` call — JVM-side, codegen'd, no Python in the
hot path. Engine-specific functions (murmur3 hash, soundex, crc32, initcap,
parse_url, monotonically_increasing_id) live in rows-only queries since no
DuckDB oracle can agree on their outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfulltextquery_spark.registry import query
from sparkfulltextquery_spark.sources import load_table


@query(
    "fn_string_core",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                       AS up,
           lower(p_brand)                      AS lo,
           length(p_name)                      AS len,
           substr(p_name, 1, 5)                AS sub5,
           concat(p_brand, ':', p_type)        AS brand_type,
           trim('  ' || p_brand || ' ')        AS trimmed,
           lpad(cast(p_size AS varchar), 4, '0') AS size_pad,
           replace(p_type, ' ', '_')           AS type_us,
           reverse(p_brand)                    AS rev,
           repeat(p_brand, 2)                  AS rep2,
           strpos(p_name, 'a')                 AS pos_a,
           translate(p_brand, 'AB', 'ab')      AS trans,
           ascii(p_brand)                      AS first_ascii,
           left(p_type, 3)                     AS l3,
           right(p_type, 3)                    AS r3
    FROM part
    """,
)
def fn_string_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (reference stringExpressions.scala: Concat:46, Upper:251,
    trim:439, pad:638, StringInstr:497, StringTranslate:353, Substring:1020,
    Length:1060, Ascii:1124, StringRepeat:949, StringReverse:974)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").alias("len"),
        F.substring("p_name", 1, 5).alias("sub5"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.reverse("p_brand").alias("rev"),
        F.repeat("p_brand", 2).alias("rep2"),
        F.instr("p_name", "a").alias("pos_a"),
        F.translate("p_brand", "AB", "ab").alias("trans"),
        F.ascii("p_brand").alias("first_ascii"),
        F.substring("p_type", 1, 3).alias("l3"),
        F.substring(F.col("p_type"), F.length("p_type") - 2, 3).alias("r3"),
    )


@query(
    "fn_string_fuzzy",
    oracle="""
    SELECT c_custkey,
           levenshtein(c_name, 'Customer#000000042') AS lev_dist,
           c_name LIKE 'Customer#0000001%'           AS like_prefix,
           contains(c_name, '42')                    AS has_42,
           starts_with(c_name, 'Customer')           AS sw,
           ends_with(c_name, '7')                    AS ew
    FROM customer
    """,
)
def fn_string_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy + predicate matching — the reference's core full-text predicates:
    Levenshtein:1083 (edit distance), Like (regexpExpressions.scala:72),
    Contains/StartsWith/EndsWith (stringExpressions.scala:293-315)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.lit("Customer#000000042")).alias("lev_dist"),
        F.col("c_name").like("Customer#0000001%").alias("like_prefix"),
        F.col("c_name").contains("42").alias("has_42"),
        F.col("c_name").startswith("Customer").alias("sw"),
        F.col("c_name").endswith("7").alias("ew"),
    )


@query(
    "fn_string_spark_only",
    oracle="""
    SELECT p_partkey,
           array_to_string(
             list_transform(string_split(p_type, ' '),
                            w -> upper(w[1:1]) || lower(w[2:])), ' ') AS icap,
           format('{:,}', cast(round(p_retailprice * 100) as bigint) // 100)
             || '.' ||
             lpad((cast(round(p_retailprice * 100) as bigint) % 100)::VARCHAR,
                  2, '0')                                             AS fmt,
           base64(encode(p_brand))                                    AS b64,
           'example.com'                                              AS host
    FROM part
    """,
)
def fn_string_spark_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InitCap:930, FormatNumber:1270, Base64:1157, ParseUrl:709 — DuckDB
    lacks direct twins, so the oracle REBUILDS each semantics from
    primitives (per-word capitalize, {:,.2f} grouping format, blob base64,
    constant host) — exact value checks. SoundEx:1104 has no reasonable
    SQL rebuild; it is literal-pinned in tests/test_function_breadth.py
    instead."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.initcap("p_type").alias("icap"),
        F.format_number(F.col("p_retailprice"), 2).alias("fmt"),
        F.base64(F.encode(F.col("p_brand"), "utf-8")).alias("b64"),
        F.parse_url(
            F.concat(F.lit("http://example.com/"), F.col("p_brand"), F.lit("?q=1")),
            F.lit("HOST"),
        ).alias("host"),
    )


@query(
    "fn_datetime_core",
    oracle="""
    SELECT o_orderkey,
           cast(year(o_orderdate)      AS int) AS yr,
           cast(month(o_orderdate)     AS int) AS mo,
           cast(day(o_orderdate)       AS int) AS dy,
           cast(hour(o_orderdate)      AS int) AS hh,
           cast(dayofweek(o_orderdate) AS int) + 1 AS dow,
           cast(quarter(o_orderdate)   AS int) AS q,
           date_trunc('month', o_orderdate)    AS month_start,
           o_orderdate + INTERVAL 30 DAY       AS due_date,
           cast(datediff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS int)
             AS days_to_98,
           cast(last_day(cast(o_orderdate AS date)) AS timestamp) AS eom,
           o_orderdate + INTERVAL 2 MONTH      AS plus2m,
           strftime(o_orderdate, '%Y-%m')      AS ym,
           cast(epoch(o_orderdate) AS bigint)  AS unix_ts
    FROM orders WHERE o_orderkey < 500
    """,
)
def fn_datetime_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family (reference datetimeExpressions.scala: extractors
    :134-285, DateAdd:80, DateDiff:998, LastDay:591, AddMonths:789,
    DateFormatClass:326, UnixTimestamp:378, TruncDate:926).

    DuckDB dayofweek is 0=Sunday, Spark 1=Sunday → oracle adds 1."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    ts = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(ts).alias("yr"),
        F.month(ts).alias("mo"),
        F.dayofmonth(ts).alias("dy"),
        F.hour(ts).alias("hh"),
        F.dayofweek(ts).alias("dow"),
        F.quarter(ts).alias("q"),
        F.date_trunc("month", ts).alias("month_start"),
        # date outputs are cast to timestamp on BOTH sides: pandas renders
        # dates and midnight timestamps differently, which breaks value hashes
        F.date_add(ts.cast("date"), 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("1998-01-01").cast("date"), ts.cast("date")).alias("days_to_98"),
        F.last_day(ts.cast("date")).cast("timestamp").alias("eom"),
        F.add_months(ts.cast("date"), 2).cast("timestamp").alias("plus2m"),
        F.date_format(ts, "yyyy-MM").alias("ym"),
        F.unix_timestamp(ts).alias("unix_ts"),
    )


@query(
    "fn_datetime_window_bucket",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def fn_datetime_window_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimeWindow bucketing (reference expressions/TimeWindow.scala:29,
    registered as `window`, FunctionRegistry :349) — tumbling 1-hour buckets
    on the events table; identical semantics to the streaming window query."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "total",
        )
    )


@query(
    "fn_math_core",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1)                    AS r1,
           cast(floor(l_extendedprice) AS bigint)       AS fl,
           cast(ceil(l_extendedprice)  AS bigint)       AS ce,
           abs(l_quantity - 25)                         AS ab,
           round(sqrt(l_quantity), 6)                   AS sq,
           round(pow(l_discount, 2), 8)                 AS p2,
           round(ln(l_extendedprice), 6)                AS lg,
           round(log10(l_extendedprice), 6)             AS lg10,
           round(exp(l_discount), 6)                    AS ex,
           CAST(sign(l_quantity - 25) AS DOUBLE)        AS sg,
           cast(l_quantity AS bigint) % 7               AS md,
           ((cast(l_quantity AS bigint) - 30) % 7 + 7) % 7 AS pmd,
           round(sin(l_discount), 8)                    AS sn,
           round(atan2(l_quantity, l_extendedprice), 8) AS at2,
           greatest(l_quantity, 25.0)                   AS gr,
           least(l_quantity, 25.0)                      AS ls
    FROM lineitem WHERE l_orderkey < 300
    """,
)
def fn_math_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (reference mathExpressions.scala; pmod arithmetic.scala:368;
    Least/Greatest conditionalExpressions via arithmetic.scala:471/531)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    q = F.col("l_quantity")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.floor("l_extendedprice").alias("fl"),
        F.ceil("l_extendedprice").alias("ce"),
        F.abs(q - 25).alias("ab"),
        F.round(F.sqrt(q), 6).alias("sq"),
        F.round(F.pow("l_discount", F.lit(2)), 8).alias("p2"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("lg"),
        F.round(F.log10("l_extendedprice"), 6).alias("lg10"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        F.signum(q - 25).alias("sg"),
        (q.cast("bigint") % 7).alias("md"),
        F.pmod(q.cast("bigint") - 30, F.lit(7)).alias("pmd"),
        F.round(F.sin("l_discount"), 8).alias("sn"),
        F.round(F.atan2(q, F.col("l_extendedprice")), 8).alias("at2"),
        F.greatest(q, F.lit(25.0)).alias("gr"),
        F.least(q, F.lit(25.0)).alias("ls"),
    )


@query(
    "fn_hash_crypto",
    oracle="""
    SELECT doc_id,
           md5(text)                                        AS h_md5,
           sha256(text)                                     AS h_sha256,
           ('0x' || substr(md5(text), 1, 15))::BIGINT       AS h60
    FROM documents WHERE doc_id < 200
    """,
)
def fn_hash_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crypto hashes (reference misc.scala Md5:43, Sha2:73) plus the engine's
    portable 60-bit hash `h60` (first 15 hex chars of md5) — the
    cross-engine-deterministic primitive underlying MinHash/SimHash dedup
    (functions/hashes.py)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2(F.col("text"), 256).alias("h_sha256"),
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint").alias("h60"),
    )


@query(
    "fn_hash_partition",
    oracle="""
    SELECT CAST(100 AS BIGINT) AS n_rows,
           true AS m3_injective,
           true AS xx64_injective,
           true AS crc_in_u32,
           true AS mid_unique,
           true AS pid_nonneg,
           true AS fnames_from_source
    FROM (SELECT 1)
    """,
)
def fn_hash_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-internal hashes + id/metadata functions: Murmur3Hash
    (misc.scala:443 → F.hash), XxHash64 (:527), Crc32 (:164),
    MonotonicallyIncreasingID, SparkPartitionID, InputFileName. Hash values
    are engine-specific, so the driver-checked output is their CONTRACTS on
    this fixed corpus: both hashes are injective over the 100 distinct
    texts (deterministic for fixed data; collisions would need ~2³² texts),
    crc32 lands in unsigned-32 range, monotonic ids are globally unique,
    partition ids are non-negative, and every input_file_name points at the
    documents parquet."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    h = d.select(
        "doc_id",
        "text",
        F.hash("text").alias("murmur3"),
        F.xxhash64("text").alias("xx64"),
        F.crc32(F.encode(F.col("text"), "utf-8")).alias("crc"),
        F.monotonically_increasing_id().alias("mid"),
        F.spark_partition_id().alias("pid"),
        F.input_file_name().alias("fname"),
    )
    return h.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.countDistinct("murmur3") == F.countDistinct("text")).alias("m3_injective"),
        (F.countDistinct("xx64") == F.countDistinct("text")).alias("xx64_injective"),
        F.bool_and((F.col("crc") >= 0) & (F.col("crc") < 2**32)).alias("crc_in_u32"),
        (F.countDistinct("mid") == F.count(F.lit(1))).alias("mid_unique"),
        F.bool_and(F.col("pid") >= 0).alias("pid_nonneg"),
        F.bool_and(F.col("fname").contains("documents")).alias("fnames_from_source"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                          AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent,
           ifnull(nullif(o_custkey, 7), -1)             AS cust_or_neg
    FROM orders WHERE o_orderkey < 400
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditionals (reference conditionalExpressions.scala: If/CaseWhen;
    nullExpressions.scala: Coalesce/NullIf/Nvl)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status2"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("urgent"),
        F.nvl(F.nullif(F.col("o_custkey"), F.lit(7)), F.lit(-1)).alias("cust_or_neg"),
    )


@query(
    "fn_array_core",
    oracle="""
    WITH t AS (SELECT doc_id,
                      list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> x <> '') AS toks
               FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           len(toks)                                   AS n_toks,
           list_contains(toks, 'spark')                AS has_spark,
           toks[1]                                     AS first_tok,
           toks[-1]                                    AS last_tok,
           coalesce(array_to_string(list_sort(list_distinct(toks)), ','), '')   AS vocab,
           len(list_distinct(toks))                    AS n_vocab,
           coalesce(array_to_string(toks[1:3], ','), '')           AS first3,
           coalesce(array_to_string(list_sort(list_intersect(toks, ['spark', 'query', 'data'])), ','), '') AS kw_hits,
           list_position(toks, 'data')                 AS data_pos,
           coalesce(array_to_string(list_sort(flatten([toks[1:2], toks[1:2]])), ','), '') AS doubled_head
    FROM t
    """,
)
def fn_array_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (reference collectionOperations.scala: Size:32,
    SortArray:103, ArrayContains:187; complexTypeCreator.scala CreateArray:32;
    slice/element access via complexTypeExtractors.scala)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != "")
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.element_at("toks", 1).alias("first_tok"),
        F.element_at("toks", -1).alias("last_tok"),
        # array results are string-joined for the comparison layer (numpy vs
        # list rendering) — the array ops themselves are unchanged
        F.concat_ws(",", F.array_sort(F.array_distinct("toks"))).alias("vocab"),
        F.size(F.array_distinct("toks")).alias("n_vocab"),
        F.concat_ws(",", F.slice("toks", 1, 3)).alias("first3"),
        F.concat_ws(
            ",",
            F.array_sort(
                F.array_intersect(
                    "toks", F.array(F.lit("spark"), F.lit("query"), F.lit("data"))
                )
            ),
        ).alias("kw_hits"),
        F.array_position("toks", "data").cast("int").alias("data_pos"),
        F.concat_ws(
            ",", F.array_sort(F.flatten(F.array(F.slice("toks", 1, 2), F.slice("toks", 1, 2))))
        ).alias("doubled_head"),
    )


@query(
    "fn_array_lambda",
    oracle="""
    WITH t AS (SELECT doc_id,
                      list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> x <> '') AS toks
               FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           array_to_string(list_transform(toks, x -> length(x)), ',') AS tok_lens,
           len(list_filter(toks, x -> length(x) > 4))         AS n_long,
           cast(list_sum(list_transform(toks, x -> length(x))) AS bigint) AS total_chars
    FROM t
    """,
)
def fn_array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — transform/filter/aggregate. The modern
    replacement for the reference-era UDF-per-element pattern; stays fully
    JVM-side (no Python)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != "")
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.concat_ws(",", F.transform("toks", lambda x: F.length(x).cast("string"))).alias("tok_lens"),
        F.size(F.filter("toks", lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


@query(
    "fn_map_ops",
    oracle="""
    SELECT n_nationkey,
           array_to_string(list_sort(map_keys(map {'name': n_name, 'region': cast(n_regionkey AS varchar)})), ',')
             AS ks,
           map_extract(map {'name': n_name, 'region': cast(n_regionkey AS varchar)}, 'name')[1]
             AS name_v
    FROM nation
    """,
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (reference complexTypeCreator.scala CreateMap:86,
    collectionOperations.scala MapKeys:52) — outputs projected to sorted
    keys + a looked-up value so the comparison is order-insensitive."""
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"), F.lit("region"), F.col("n_regionkey").cast("string")
    )
    return n.select(
        "n_nationkey",
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("ks"),
        F.element_at(m, F.lit("name")).alias("name_v"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                  AS k_str,
           cast(json_extract_string(props, '$.k') AS bigint)  AS k_num
    FROM events WHERE event_id < 300
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction (reference jsonExpressions.scala GetJsonObject:111,
    JsonTuple:328) on the events.props JSON column."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_matches(p_name, '^[ab]')                   AS starts_ab,
           regexp_extract(p_name, '([a-z]+)', 1)             AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g')       AS devoweled,
           len(string_split_regex(p_name, '\\s+'))           AS n_words
    FROM part
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family (reference regexpExpressions.scala: RLike:125,
    RegExpExtract:314, RegExpReplace:212, StringSplit:180). Spark
    regexp_replace is global — DuckDB needs the 'g' flag to agree."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").rlike("^[ab]").alias("starts_ab"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.size(F.split(F.col("p_name"), r"\s+")).alias("n_words"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT n_nationkey,
           n_nationkey & 5                    AS b_and,
           n_nationkey | 8                    AS b_or,
           xor(n_nationkey, 3)                AS b_xor,
           n_nationkey << 2                   AS shl,
           n_nationkey >> 1                   AS shr
    FROM nation
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise ops (reference arithmetic.scala bitwise section) — used by the
    SimHash implementation in dedup."""
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        k.bitwiseAND(F.lit(5)).alias("b_and"),
        k.bitwiseOR(F.lit(8)).alias("b_or"),
        k.bitwiseXOR(F.lit(3)).alias("b_xor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 1).alias("shr"),
    )


@query(
    "fn_lambda_hof_tail",
    oracle="""
    WITH t AS (SELECT doc_id,
                      list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                  x -> x <> '') AS toks
               FROM documents WHERE doc_id < 300)
    SELECT doc_id,
           len(list_filter(toks, x -> x = 'spark')) > 0            AS has_spark,
           len(list_filter(toks, x -> length(x) = 0)) = 0          AS all_nonempty,
           cast(list_sum(list_transform(range(1, len(toks) + 1),
                                        i -> length(toks[i]) * i)) AS bigint)
             AS pos_weighted_len,
           cast(2 * list_sum(list_transform(toks, x -> length(x))) AS bigint)
             AS double_len
    FROM t
    """,
)
def fn_lambda_hof_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function tail beyond transform/filter/aggregate:
    exists / forall (reference-era users reach these via lateral-view
    explode; higherOrderFunctions.scala provides them natively), the
    TWO-ARG (value, index) lambda form of transform, and aggregate's
    4-arg `finish` projection — all whole-stage-codegen, no UDF."""
    from sparkfulltextquery_spark.functions.text import tokenize

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = tokenize(F.col("text"))
    return d.select(
        "doc_id",
        F.exists(toks, lambda t: t == "spark").alias("has_spark"),
        F.forall(toks, lambda t: F.length(t) > 0).alias("all_nonempty"),
        F.aggregate(
            F.transform(toks, lambda t, i: F.length(t).cast("long") * (i + 1)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("pos_weighted_len"),
        F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.length(t),
            lambda acc: acc * 2,
        ).alias("double_len"),
    )


@query(
    "fn_map_hof",
    oracle="""
    SELECT doc_id,
           2 * (n_chars % 7)                                    AS doubled_q,
           (CASE WHEN n_chars % 7  > 3 THEN 1 ELSE 0 END)
         + (CASE WHEN n_chars % 11 > 3 THEN 1 ELSE 0 END)       AS n_big,
           n_chars % 7 + 1                                      AS zipped_q,
           'Q,R'                                                AS keys_upper
    FROM documents WHERE doc_id < 300
    """,
)
def fn_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-lambda HOFs (higherOrderFunctions.scala: TransformValues,
    TransformKeys, MapFilter, MapZipWith): a per-row map is built,
    transformed, filtered, and zipped, then projected to scalars so the
    driver canonicalizer never sees a MapType. The oracle computes the
    same values arithmetically — DuckDB's map lambdas don't mirror
    Spark's, so the check is semantic, not structural."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    n = F.col("n_chars")
    m = F.create_map(F.lit("q"), n % 7, F.lit("r"), n % 11)
    m2 = F.create_map(F.lit("q"), F.lit(1), F.lit("r"), F.lit(2))
    return d.select(
        "doc_id",
        F.element_at(F.transform_values(m, lambda k, v: v * 2), F.lit("q")).alias(
            "doubled_q"
        ),
        F.size(F.map_filter(m, lambda k, v: v > 3)).alias("n_big"),
        F.element_at(
            F.map_zip_with(m, m2, lambda k, v1, v2: v1 + v2), F.lit("q")
        ).alias("zipped_q"),
        F.array_join(
            F.sort_array(F.map_keys(F.transform_keys(m, lambda k, v: F.upper(k)))), ","
        ).alias("keys_upper"),
    )
