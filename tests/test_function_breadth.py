"""Long-tail §2.8 function sweep: every expression here must parse, run, and
return the expected literal — one projection, evaluated once. Complements
the oracle-checked family queries by pinning ~50 more registry functions
(reference FunctionRegistry.scala:160-395)."""

from __future__ import annotations

import math

import pytest

# (sql expression, expected value or callable(v) -> bool)
CASES = [
    # math tail
    ("acos(1.0)", 0.0),
    ("asin(0.0)", 0.0),
    ("atan(0.0)", 0.0),
    ("tan(0.0)", 0.0),
    ("cot(1.0)", lambda v: abs(v - 1 / math.tan(1)) < 1e-12),
    ("sinh(0.0)", 0.0),
    ("cosh(0.0)", 1.0),
    ("tanh(0.0)", 0.0),
    ("bround(2.5, 0)", 2.0),  # banker's rounding
    ("bround(3.5, 0)", 4.0),
    ("factorial(5)", 120),
    ("pmod(-7, 3)", 2),
    ("positive(-3)", -3),
    ("negative(3)", -3),
    ("round(e(), 6)", round(math.e, 6)),
    ("round(pi(), 6)", round(math.pi, 6)),
    ("width_bucket(5.3, 0.2, 10.6, 5)", 3),
    ("getbit(11, 0)", 1),
    ("getbit(11, 2)", 0),
    # string tail
    ("bit_length('ab')", 16),
    ("octet_length('abc')", 3),
    ("char_length('abcd')", 4),
    ("space(3)", "   "),
    ("elt(2, 'a', 'b', 'c')", "b"),
    ("find_in_set('b', 'a,b,c')", 2),
    ("substring_index('a.b.c', '.', 2)", "a.b"),
    ("format_string('%d-%s', 7, 'x')", "7-x"),
    ("printf('%03d', 5)", "005"),
    ("concat_ws('-', 'a', 'b')", "a-b"),
    ("initcap('hello world')", "Hello World"),
    ("lcase('AbC')", "abc"),
    ("ucase('AbC')", "ABC"),
    ("locate('b', 'abc')", 2),
    ("ltrim('  x ')", "x "),
    ("rtrim(' x  ')", " x"),
    ("sentences('Hi there. Bye.')[0][0]", "Hi"),
    ("levenshtein('abc', 'abd')", 1),
    ("char(65)", "A"),
    # conditional / null tail
    ("ifnull(NULL, 7)", 7),
    ("nvl2(NULL, 1, 2)", 2),
    ("nullif(3, 3)", None),
    ("isnan(cast('NaN' as double))", True),
    ("nanvl(cast('NaN' as double), 9.0)", 9.0),
    ("try_divide(1, 0)", None),
    # round-3 additions: string/regex/url/bit tail
    ("mask('AbC-123')", "XxX-nnn"),
    ("mask('AbC-123', 'Q')", "QxQ-nnn"),
    ("url_encode('a b&c')", "a+b%26c"),
    ("url_decode('a+b%26c')", "a b&c"),
    ("parse_url('https://h/p?q=1', 'HOST')", "h"),
    ("split_part('a,b,c', ',', 2)", "b"),
    ("left('abcdef', 2)", "ab"),
    ("right('abcdef', 2)", "ef"),
    ("overlay('abcdef' PLACING 'ZZ' FROM 2)", "aZZdef"),
    ("repeat('ab', 3)", "ababab"),
    ("replace('aaa', 'a', 'b')", "bbb"),
    ("position('c' IN 'abc')", 3),
    ("startswith('abcd', 'ab')", True),
    ("endswith('abcd', 'cd')", True),
    ("contains('abcd', 'bc')", True),
    ("'aBc' ilike 'abc'", True),
    ("equal_null(NULL, NULL)", True),
    ("luhn_check('79927398713')", True),
    ("soundex('Robert')", "R163"),
    ("translate('abca', 'ab', 'xy')", "xycx"),
    ("regexp_count('a1b2c3', '[0-9]')", 3),
    ("regexp_instr('ab12', '[0-9]+')", 3),
    ("regexp_substr('ab12cd', '[0-9]+')", "12"),
    ("array_join(regexp_extract_all('a1b22', '([0-9]+)'), '-')", "1-22"),
    ("bit_count(7)", 3),
    ("bit_get(8, 3)", 1),
    ("hex(255)", "FF"),
    ("unhex('4142')", b"AB"),
    ("to_number('12,345', '99,999')", 12345),
    ("to_char(123.45, '999.99')", "123.45"),
    ("to_binary('abc', 'utf-8')", b"abc"),
    ("try_element_at(array(1, 2), 9)", None),
    ("try_to_timestamp('nope')", None),
    ("btrim('xxhixx', 'x')", "hi"),
    ("char(97)", "a"),
    ("ascii('a')", 97),
    ("crc32('abc')", 891568578),
    ("base64('ab')", "YWI="),
    ("string(unbase64('YWI='))", "ab"),
    ("decode(encode('hi', 'utf-8'), 'utf-8')", "hi"),
    ("format_number(1234567.891, 2)", "1,234,567.89"),
    # datetime tail
    ("timestamp_seconds(0)", lambda v: str(v).startswith("1970-01-01")),
    ("unix_millis(timestamp'1970-01-01 00:00:01Z')", 1000),
    ("unix_micros(timestamp'1970-01-01 00:00:01Z')", 1000000),
    ("date_trunc('QUARTER', '2024-05-15')", lambda v: "2024-04-01" in str(v)),
    ("trunc('2024-05-15', 'MM')", lambda v: "2024-05-01" in str(v)),
    ("quarter(date'2024-05-15')", 2),
    ("weekofyear(date'2024-01-04')", 1),
    ("dayofweek(date'2024-01-07')", 1),
    ("weekday(date'2024-01-07')", 6),
    ("last_day(date'2024-02-10')", lambda v: "2024-02-29" in str(v)),
    ("next_day(date'2024-01-01', 'FRI')", lambda v: "2024-01-05" in str(v)),
    ("round(months_between(date'2024-03-31', date'2024-02-29'), 2)", 1.0),
    ("add_months(date'2024-01-31', 1)", lambda v: "2024-02-29" in str(v)),
    ("datediff(date'2024-01-10', date'2024-01-03')", 7),
    ("date_add(date'2024-01-01', 9)", lambda v: "2024-01-10" in str(v)),
    ("dateadd(DAY, 9, date'2024-01-01')", lambda v: "2024-01-10" in str(v)),
    ("datepart('year', date'2024-05-05')", 2024),
    ("cast(make_ym_interval(1, 2) as string)", "INTERVAL '1-2' YEAR TO MONTH"),
    ("make_dt_interval(1, 2, 3, 4.5)", lambda v: v is not None),
    ("day(date'2024-05-09')", 9),
    ("to_date('09/05/2024', 'dd/MM/yyyy')", lambda v: "2024-05-09" in str(v)),
    ("date_format(date'2024-05-09', 'yyyy|MM|dd')", "2024|05|09"),
    ("from_unixtime(86400, 'yyyy-MM-dd')", "1970-01-02"),
    ("to_unix_timestamp('1970-01-02', 'yyyy-MM-dd')", 86400),
    ("try_add(9223372036854775807, 1)", None),
    # datetime tail
    ("day(date'2024-03-05')", 5),
    ("dayofyear(date'2024-02-01')", 32),
    ("date_part('year', date'2024-03-05')", 2024),
    ("extract(month FROM date'2024-03-05')", 3),
    ("make_date(2024, 2, 29)", lambda v: str(v) == "2024-02-29"),
    ("make_timestamp(2024, 1, 2, 3, 4, 5.0)", lambda v: "2024-01-02 03:04:05" in str(v)),
    ("unix_date(date'1970-01-02')", 1),
    ("date_from_unix_date(1)", lambda v: str(v) == "1970-01-02"),
    ("timestampdiff(HOUR, timestamp'2024-01-01 00:00:00', timestamp'2024-01-01 05:00:00')", 5),
    # collection tail
    ("array_size(array(1,2,3))", 3),
    ("array_compact(array(1, NULL, 2))", [1, 2]),
    ("array_append(array(1), 2)", [1, 2]),
    ("array_prepend(array(2), 1)", [1, 2]),
    ("array_insert(array(1,3), 2, 2)", [1, 2, 3]),
    ("slice(array(1,2,3,4), 2, 2)", [2, 3]),
    ("arrays_overlap(array(1,2), array(2,3))", True),
    ("array_union(array(1,2), array(2,3))", [1, 2, 3]),
    ("array_except(array(1,2), array(2))", [1]),
    ("exists(array(1,2,3), x -> x > 2)", True),
    ("forall(array(1,2,3), x -> x > 0)", True),
    ("reduce(array(1,2,3), 0, (a, x) -> a + x)", 6),
    ("map_entries(map('a', 1))[0].key", "a"),
    ("map_values(map('a', 1))[0]", 1),
    ("str_to_map('a:1,b:2', ',', ':')['b']", "2"),
    # misc / metadata
    ("typeof(1)", "int"),
    ("hash(42) IS NOT NULL", True),
    ("sha1('x')", lambda v: len(v) == 40),
    ("uuid() IS NOT NULL", True),
    ("current_date() IS NOT NULL", True),
    ("version() IS NOT NULL", True),
    ("assert_true(1 < 2) IS NULL", True),
]


@pytest.mark.parametrize("expr,expected", CASES, ids=[c[0][:40] for c in CASES])
def test_function_tail(spark, expr, expected):
    v = spark.sql(f"SELECT {expr} AS v").head().v
    if callable(expected):
        assert expected(v), f"{expr} -> {v!r}"
    elif isinstance(expected, float):
        assert v == pytest.approx(expected), f"{expr} -> {v!r}"
    else:
        assert v == expected, f"{expr} -> {v!r}"
