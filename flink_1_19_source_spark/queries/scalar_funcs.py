"""Built-in scalar function coverage (SURVEY §2.8).

One query per function family, each exercising the representative Flink
1.19 built-ins (upstream: flink-table-common BuiltInFunctionDefinitions)
through their Spark equivalents, DuckDB-oracled. Everything here is a pure
Catalyst expression — JVM-side, inside WholeStageCodegen.

Transcendental functions (LN/EXP/trig) are rounded to 9 decimals on both
sides: libm implementations may differ in the final ulp between the JVM
and DuckDB's C++; 1e-9 is far above ulp error and far below any semantic
difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import compat
from ..registry import register
from ..tables import load_table


@register(
    "f_string_family",
    oracle="""
    SELECT p_partkey,
           CONCAT(p_brand, '|', p_type) AS cat,
           UPPER(p_name) AS up, LOWER(p_brand) AS lo,
           SUBSTRING(p_name, 3, 5) AS sub,
           LENGTH(p_name) AS len,
           TRIM('  ' || p_brand || ' ') AS trimmed,
           LPAD(p_brand, 12, '*') AS padded,
           REPLACE(p_type, 'a', '@') AS replaced,
           REVERSE(p_brand) AS rev,
           POSITION('an' IN p_name) AS pos,
           LEFT(p_name, 4) AS l4, RIGHT(p_name, 4) AS r4,
           REPEAT(p_brand, 2) AS rep,
           ASCII(p_brand) AS asc_first,
           -- Flink SPLIT_INDEX yields NULL out-of-range; SPLIT_PART yields ''
           NULLIF(SPLIT_PART(p_type, ' ', 2), '') AS split2,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devowel,
           REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
           MD5(p_name) AS name_md5,
           -- DuckDB 1.0 has no INITCAP; emulate for single-word values
           UPPER(LEFT(p_brand, 1)) || LOWER(SUBSTRING(p_brand, 2)) AS inited
    FROM part WHERE p_partkey <= 50
    """,
    survey="2.8-string",
)
def f_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("|"), F.col("p_type")).alias("cat"),
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.substring("p_name", 3, 5).alias("sub"),
        F.length("p_name").alias("len"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.replace(F.col("p_type"), F.lit("a"), F.lit("@")).alias("replaced"),
        F.reverse("p_brand").alias("rev"),
        F.instr("p_name", "an").cast("long").alias("pos"),
        F.left(F.col("p_name"), F.lit(4)).alias("l4"),
        F.right(F.col("p_name"), F.lit(4)).alias("r4"),
        F.repeat("p_brand", 2).alias("rep"),
        F.ascii("p_brand").cast("long").alias("asc_first"),
        # Flink SPLIT_INDEX is 0-based; SQL SPLIT_PART is 1-based — shim maps
        compat.split_index(F.col("p_type"), " ", 1).alias("split2"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devowel"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.md5("p_name").alias("name_md5"),
        F.initcap("p_brand").alias("inited"),
    )


@register(
    "f_math_family",
    oracle="""
    SELECT p_partkey,
           ABS(p_size - 25) AS a,
           MOD(p_size, 7) AS m,
           ROUND(SQRT(p_retailprice), 9) AS sq,
           CAST(CEIL(p_retailprice / 100) AS DOUBLE) AS c,
           CAST(FLOOR(p_retailprice / 100) AS DOUBLE) AS f,
           ROUND(p_retailprice, 1) AS r1,
           CAST(SIGN(p_size - 25) AS DOUBLE) AS sg,
           POWER(p_size, 2) AS p2,
           ROUND(LN(p_retailprice), 9) AS lnp,
           ROUND(LOG10(p_retailprice), 9) AS log10p,
           ROUND(EXP(p_size / 50.0), 9) AS ex,
           ROUND(SIN(p_size), 9) AS sn,
           ROUND(ATAN2(p_size, 10), 9) AS at2,
           CAST(GREATEST(p_size, 20) AS BIGINT) AS g,
           CAST(LEAST(p_size, 20) AS BIGINT) AS l,
           BIN(p_size) AS b, HEX(p_size) AS h,
           ROUND(DEGREES(p_size / 50.0), 9) AS deg,
           ROUND(RADIANS(p_size), 9) AS rad,
           ROUND(PI(), 9) AS pi_const,
           FLOOR(p_retailprice * 10.0) / 10.0 AS truncated
    FROM part WHERE p_partkey <= 50
    """,
    survey="2.8-math",
)
def f_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    sz = F.col("p_size")
    pr = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.abs(sz - 25).alias("a"),
        (sz % 7).alias("m"),
        F.round(F.sqrt(pr), 9).alias("sq"),
        # Spark CEIL/FLOOR return BIGINT, DuckDB's return DOUBLE; the driver's
        # value-hash is dtype-sensitive — pin both sides to DOUBLE explicitly.
        F.ceil(pr / 100).cast("double").alias("c"),
        F.floor(pr / 100).cast("double").alias("f"),
        F.round(pr, 1).alias("r1"),
        F.signum(sz - 25).cast("double").alias("sg"),
        F.pow(sz, 2).alias("p2"),
        F.round(F.log(pr), 9).alias("lnp"),
        F.round(F.log10(pr), 9).alias("log10p"),
        F.round(F.exp(sz / 50.0), 9).alias("ex"),
        F.round(F.sin(sz), 9).alias("sn"),
        F.round(F.atan2(sz.cast("double"), F.lit(10.0)), 9).alias("at2"),
        # GREATEST/LEAST inherit the narrowest input type (int32 here) while
        # the oracle yields int64 — pin both sides to BIGINT explicitly.
        F.greatest(sz, F.lit(20)).cast("long").alias("g"),
        F.least(sz, F.lit(20)).cast("long").alias("l"),
        F.bin(sz).alias("b"),
        F.hex(sz).alias("h"),
        F.round(F.degrees(sz / 50.0), 9).alias("deg"),
        F.round(F.radians(sz), 9).alias("rad"),
        F.round(F.lit(3.141592653589793), 9).alias("pi_const"),
        compat.truncate(pr, 1).alias("truncated"),
    )


@register(
    "f_temporal_family",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS mo, DAY(o_orderdate) AS d,
           HOUR(o_orderdate) AS h,
           DAYOFWEEK(o_orderdate) + 1 AS dow,
           QUARTER(o_orderdate) AS q,
           WEEKOFYEAR(o_orderdate) AS woy,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS fmt,
           DATE_TRUNC('month', o_orderdate) AS mon_start,
           o_orderdate + INTERVAL 3 DAY AS plus3d,
           o_orderdate - INTERVAL 2 HOUR AS minus2h,
           DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
           EXTRACT(DOY FROM o_orderdate) AS doy,
           CAST(EPOCH(o_orderdate) AS BIGINT) AS unix_ts,
           -- string-typed on both sides: Spark returns DateType, DuckDB's
           -- pandas bridge widens DATE to datetime64 — compare as ISO strings
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS as_date,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
    FROM orders WHERE o_orderkey <= 100
    """,
    survey="2.8-temporal",
)
def f_temporal_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("d"),
        F.hour(d).alias("h"),
        # DuckDB DAYOFWEEK: 0=Sunday; Spark dayofweek: 1=Sunday
        F.dayofweek(d).alias("dow"),
        F.quarter(d).alias("q"),
        F.weekofyear(d).alias("woy"),
        F.date_format(d, "yyyy-MM-dd").alias("fmt"),
        F.date_trunc("month", d).alias("mon_start"),
        (d + F.expr("INTERVAL 3 DAYS")).alias("plus3d"),
        (d - F.expr("INTERVAL 2 HOURS")).alias("minus2h"),
        F.datediff(F.to_date(d), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
        F.dayofyear(d).cast("long").alias("doy"),
        F.unix_timestamp(d).alias("unix_ts"),
        d.cast("date").cast("string").alias("as_date"),
        F.last_day(d.cast("date")).cast("string").alias("month_end"),
    )


@register(
    "f_conditional_family",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status2,
           IF(o_orderpriority = '1-URGENT', 1, 0) AS urgent,
           NULLIF(o_orderstatus, o_orderstatus) AS always_null,
           IFNULL(NULLIF(o_orderstatus, 'F'), 'finished') AS status3,
           o_totalprice IS NOT NULL AS has_price,
           o_orderstatus IS NOT DISTINCT FROM 'O' AS is_open
    FROM orders WHERE o_orderkey <= 100
    """,
    survey="2.8-conditional",
)
def f_conditional_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    tp = F.col("o_totalprice")
    st = F.col("o_orderstatus")
    return o.select(
        "o_orderkey",
        F.when(tp > 200000, "big").when(tp > 100000, "mid").otherwise("small").alias("bucket"),
        F.coalesce(F.nullif(st, F.lit("O")), F.lit("open")).alias("status2"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("urgent"),
        F.nullif(st, st).alias("always_null"),
        F.nvl(F.nullif(st, F.lit("F")), F.lit("finished")).alias("status3"),
        tp.isNotNull().alias("has_price"),
        st.eqNullSafe(F.lit("O")).alias("is_open"),
    )


@register(
    "f_comparison_family",
    oracle="""
    SELECT p_partkey,
           NULLIF(p_brand, 'Brand#13') IS NOT DISTINCT FROM 'Brand#42' AS eq_ns,
           NULLIF(p_brand, 'Brand#13') IS DISTINCT FROM p_brand AS dist_from,
           (NULLIF(p_brand, 'Brand#13') = 'Brand#42') IS NULL AS cmp_unknown,
           p_size BETWEEN 10 AND 20 AS betw,
           p_size NOT BETWEEN 10 AND 20 AS not_betw,
           -- BETWEEN SYMMETRIC (Flink) emulated portably via LEAST/GREATEST
           p_size BETWEEN LEAST(30, 15) AND GREATEST(30, 15) AS betw_sym,
           p_brand IN ('Brand#11', 'Brand#22', 'Brand#33') AS in_set,
           p_type NOT IN ('zzz', 'yyy') AS not_in_set,
           p_name LIKE '%ros%' AS like_pct,
           p_type LIKE 'STANDARD_%' AS like_us,
           p_name ILIKE '%ROS%' AS ilike_pct,
           -- SIMILAR TO → regex (see dialect note in the Spark twin)
           regexp_matches(p_name, '^[a-z]+ [a-z]+') AS sim_to,
           (p_size > 25 AND p_retailprice > 1500.0)
             OR NOT (p_brand = 'Brand#11') AS logic3
    FROM part WHERE p_partkey <= 80
    """,
    survey="2.8-comparison",
)
def f_comparison_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison/logic predicate family (§2.8 row 1 — the most-used SQL
    surface): IS [NOT] DISTINCT FROM via ``eqNullSafe``, three-valued
    comparison (NULL = x IS NULL), [NOT] BETWEEN, BETWEEN SYMMETRIC
    (emulated with least/greatest — identical rewrite both engines), [NOT]
    IN, LIKE with both wildcards, ILIKE, and SIMILAR TO.

    SIMILAR TO dialect note (SURVEY §2.8): Flink's SIMILAR TO takes SQL
    regex anchored over the whole string; Spark's ``rlike`` is Java regex
    with substring search. The translation anchors explicitly (``^...``)
    and sticks to the POSIX-compatible subset so Java regex (Spark) and RE2
    (DuckDB oracle) agree; ``.rlike`` is the documented Spark carrier for
    the SIMILAR TO surface.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 80)
    nb = F.nullif(F.col("p_brand"), F.lit("Brand#13"))
    sz = F.col("p_size")
    return p.select(
        "p_partkey",
        nb.eqNullSafe(F.lit("Brand#42")).alias("eq_ns"),
        (~nb.eqNullSafe(F.col("p_brand"))).alias("dist_from"),
        (nb == "Brand#42").isNull().alias("cmp_unknown"),
        sz.between(10, 20).alias("betw"),
        (~sz.between(10, 20)).alias("not_betw"),
        sz.between(F.least(F.lit(30), F.lit(15)), F.greatest(F.lit(30), F.lit(15))).alias(
            "betw_sym"
        ),
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33").alias("in_set"),
        (~F.col("p_type").isin("zzz", "yyy")).alias("not_in_set"),
        F.col("p_name").like("%ros%").alias("like_pct"),
        F.col("p_type").like("STANDARD_%").alias("like_us"),
        F.col("p_name").ilike("%ROS%").alias("ilike_pct"),
        F.col("p_name").rlike("^[a-z]+ [a-z]+").alias("sim_to"),
        (
            ((sz > 25) & (F.col("p_retailprice") > 1500.0))
            | ~(F.col("p_brand") == "Brand#11")
        ).alias("logic3"),
    )


@register(
    "f_json_family",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
           json_extract_string(props, '$.k') AS k_str,
           props LIKE '{%' AS looks_json,
           JSON_VALID(props) AS valid
    FROM events WHERE event_id < 200
    """,
    survey="2.8-json",
)
def f_json_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.col("props").like("{%").alias("looks_json"),
        compat.is_json(F.col("props")).alias("valid"),
    )


@register(
    "f_collection_family",
    oracle="""
    SELECT doc_id,
           LEN(toks) AS cardinality,
           toks[1] AS first_tok,
           toks[LEN(toks)] AS last_tok,
           LIST_CONTAINS(toks, 'data') AS has_data,
           LEN(LIST_DISTINCT(toks)) AS n_distinct,
           LIST_POSITION(toks, 'data') AS data_pos,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(toks)), '|') AS sorted_joined,
           LIST_SORT(LIST_DISTINCT(toks))[1] AS min_tok
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 50)
    """,
    survey="2.8-collection",
)
def f_collection_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split("text", " ")
    dd = d.select("doc_id", toks.alias("toks"))
    t = F.col("toks")
    return dd.select(
        "doc_id",
        F.size(t).alias("cardinality"),
        F.element_at(t, 1).alias("first_tok"),
        F.element_at(t, -1).alias("last_tok"),
        F.array_contains(t, "data").alias("has_data"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
        # Flink ARRAY_POSITION / DuckDB LIST_POSITION: 1-based, NULL/0 when absent
        F.coalesce(F.array_position(t, "data"), F.lit(0)).cast("int").alias("data_pos"),
        F.array_join(F.array_sort(F.array_distinct(t)), "|").alias("sorted_joined"),
        F.array_min(F.array_distinct(t)).alias("min_tok"),
    )


@register(
    "f_map_family",
    oracle="""
    SELECT doc_id,
           -- DuckDB map subscript m['lang'] returns a LIST (crashes the
           -- driver's canonicalizer); index into it for the scalar value
           (m['lang'])[1] AS lang_val,
           CARDINALITY(m) AS n_keys,
           ARRAY_TO_STRING(LIST_SORT(map_keys(m)), ',') AS keys_sorted,
           LIST_CONTAINS(map_keys(m), 'source') AS has_source
    FROM (SELECT doc_id, MAP {'lang': lang, 'source': source} AS m
          FROM documents WHERE doc_id < 30)
    """,
    survey="2.8-collection",
)
def f_map_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    dd = d.select("doc_id", m.alias("m"))
    return dd.select(
        "doc_id",
        F.col("m").getItem("lang").alias("lang_val"),
        F.size("m").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_sorted"),
        F.array_contains(F.map_keys("m"), "source").alias("has_source"),
    )


@register(
    "f_cast_hash_family",
    oracle="""
    SELECT o_orderkey,
           CAST(TRUNC(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           TRY_CAST(o_orderstatus AS INTEGER) AS bad_cast,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec_str,
           MD5(CAST(o_orderkey AS VARCHAR)) AS key_md5,
           SHA256(o_orderstatus) AS status_sha
    FROM orders WHERE o_orderkey <= 100
    """,
    survey="2.8-cast 2.8-hash",
)
def f_cast_hash_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return o.select(
        "o_orderkey",
        # CAST(double AS BIGINT): Spark truncates toward zero; DuckDB rounds —
        # use explicit floor-style truncation semantics matched to Spark
        F.col("o_totalprice").cast("long").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderstatus").try_cast("int").alias("bad_cast"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_dec_str"),
        F.md5(F.col("o_orderkey").cast("string")).alias("key_md5"),
        F.sha2(F.col("o_orderstatus"), 256).alias("status_sha"),
    )


@register(
    "f_collection2_family",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_slice(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                    x -> x <> ''), 1, 8) AS a
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           array_to_string(list_filter(a, x -> x <> a[1]), ',') AS removed,
           array_to_string(list_reverse(a), ',') AS rev,
           array_to_string(a[2:4], ',') AS sliced,
           array_to_string(list_sort(list_distinct(
             list_concat(a, list_reverse(a[2:4])))), ',') AS union_sorted,
           list_max(a) AS mx, list_min(a) AS mn
    FROM t
    """,
    survey="2.8-collection",
)
def f_collection2_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection wave 2: ARRAY_REMOVE / ARRAY_REVERSE / ARRAY_SLICE /
    ARRAY_UNION / ARRAY_MAX / ARRAY_MIN (the 1.16–1.19 array-function
    wave). ARRAY_UNION's first-occurrence ordering is engine-specific,
    so the certified surface is the SORTED union (set semantics); the
    others compare element-exact via joined strings."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    a = F.slice(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != ""), 1, 8
    )
    t = d.select("doc_id", a.alias("a"))
    sliced = F.slice("a", 2, 3)
    return t.select(
        "doc_id",
        F.array_join(F.array_remove("a", F.col("a")[0]), ",").alias("removed"),
        F.array_join(F.reverse("a"), ",").alias("rev"),
        F.array_join(sliced, ",").alias("sliced"),
        F.array_join(
            F.array_sort(F.array_union("a", F.reverse(sliced))), ","
        ).alias("union_sorted"),
        F.array_max("a").alias("mx"),
        F.array_min("a").alias("mn"),
    )


@register(
    "f_map_family2",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             MAP(['lang', 'src'], [lang, source]) AS m1,
             MAP(['n'], [CAST(n_chars AS VARCHAR)]) AS m2
      FROM documents WHERE doc_id < 60
    )
    SELECT doc_id,
           array_to_string(list_sort(map_keys(map_concat(m1, m2))), ',') AS ks,
           array_to_string(list_sort(map_values(m1)), ',') AS vs,
           m1['lang'][1] AS lang_v,
           CAST(cardinality(map_concat(m1, m2)) AS BIGINT) AS n_entries,
           array_to_string(
             list_sort(list_transform(map_entries(m1),
                                      e -> e.key || '=' || e.value)), ',')
             AS entries
    FROM t
    """,
    survey="2.8-collection",
)
def f_map_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map wave 2: MAP_FROM_ARRAYS / map_concat (Flink MAP union via
    concat) / MAP_VALUES / MAP_ENTRIES / CARDINALITY / map element
    access — key/value/entry surfaces serialized sorted (map iteration
    order is engine-private, sorting is the portable comparison)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    m1 = F.map_from_arrays(
        F.array(F.lit("lang"), F.lit("src")), F.array(F.col("lang"), F.col("source"))
    )
    m2 = F.map_from_arrays(
        F.array(F.lit("n")), F.array(F.col("n_chars").cast("string"))
    )
    t = d.select("doc_id", m1.alias("m1"), m2.alias("m2"))
    mc = F.map_concat("m1", "m2")
    return t.select(
        "doc_id",
        F.array_join(F.array_sort(F.map_keys(mc)), ",").alias("ks"),
        F.array_join(F.array_sort(F.map_values("m1")), ",").alias("vs"),
        F.col("m1")["lang"].alias("lang_v"),
        F.size(mc).cast("long").alias("n_entries"),
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries("m1"),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"]),
                )
            ),
            ",",
        ).alias("entries"),
    )


@register(
    "f_str_to_map",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             'status=' || o_orderstatus || ',prio=' || o_orderpriority
               || ',cust=' || o_custkey AS s
      FROM orders WHERE o_orderkey <= 2000
    ), kv AS (
      SELECT o_orderkey, s,
             list_transform(string_split(s, ','),
                            p -> string_split(p, '=')) AS pairs
      FROM t
    )
    SELECT o_orderkey,
           CAST(len(pairs) AS INTEGER) AS n_keys,
           list_filter(pairs, p -> p[1] = 'status')[1][2] AS status_val,
           array_to_string(list_sort(list_transform(pairs,
                           p -> p[1] || '=' || p[2])), ',') AS entries
    FROM kv
    """,
    survey="2.8-collection 2.8-string",
)
def f_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STR_TO_MAP(text[, pairDelim, kvDelim]) (Flink 1.19 built-in
    [docs: functions#string]): parse a delimited k=v string into a MAP.
    Spark's str_to_map is the same function; map iteration order is
    engine-dependent, so the certified projection is cardinality, a
    point lookup, and the SORTED entries rendering — the normalization
    any engine needs for a reproducible map hash."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    s = F.concat(
        F.lit("status="), F.col("o_orderstatus"),
        F.lit(",prio="), F.col("o_orderpriority"),
        F.lit(",cust="), F.col("o_custkey").cast("string"),
    )
    m = F.expr("str_to_map(s, ',', '=')")
    return o.select("o_orderkey", s.alias("s")).select(
        "o_orderkey",
        F.size(m).alias("n_keys"),
        m["status"].alias("status_val"),
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(m),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"]),
                )
            ),
            ",",
        ).alias("entries"),
    )


@register(
    "f_math2_family",
    oracle="""
    SELECT p_partkey,
           ROUND((EXP(p_size / 50.0) - EXP(-(p_size / 50.0))) / 2, 9) AS snh,
           ROUND((EXP(p_size / 50.0) + EXP(-(p_size / 50.0))) / 2, 9) AS csh,
           ROUND((EXP(p_size / 25.0) - 1) / (EXP(p_size / 25.0) + 1), 9)
             AS tnh,
           ROUND(COT(p_size / 10.0), 9) AS ct,
           ROUND(LOG2(p_size), 9) AS lg2,
           ROUND(LOG(2, p_retailprice), 9) AS lgb,
           ROUND(CBRT(p_retailprice), 9) AS cb,
           CAST(FACTORIAL(p_size % 10) AS BIGINT) AS fact,
           CAST(((p_size - 25) % 7 + 7) % 7 AS INTEGER) AS pm,
           CAST(BIT_COUNT(p_size) AS INTEGER) AS bc,
           ROUND(SQRT(CAST(p_size * p_size + 100 AS DOUBLE)), 9) AS hyp,
           ROUND(EXP(1), 9) AS e_const,
           FLOOR(p_retailprice / 10) * 10 AS trunc_neg1
    FROM part WHERE p_partkey <= 60
    """,
    survey="2.8-math",
)
def f_math2_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math built-ins wave 2 [docs: systemfunctions#arithmetic]:
    SINH/COSH/TANH (DuckDB 1.0 lacks the hyperbolics — the oracle
    composes them from EXP; both sides agree at 9 digits on bounded
    inputs), COT, LOG2, two-arg LOG, CBRT, FACTORIAL, PMOD (the oracle
    replays Spark's always-positive semantics as ((x%n)+n)%n), BIN-free
    BIT_COUNT, HYPOT (composed as sqrt(x²+y²) in the oracle), the E()
    constant, and TRUNCATE with a negative digit count (floor to tens)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 60)
    sz = F.col("p_size")
    pr = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.round(F.sinh(sz / 50.0), 9).alias("snh"),
        F.round(F.cosh(sz / 50.0), 9).alias("csh"),
        F.round(F.tanh(sz / 50.0), 9).alias("tnh"),
        F.round(F.cot(sz / 10.0), 9).alias("ct"),
        F.round(F.log2(sz), 9).alias("lg2"),
        F.round(F.log(2.0, pr), 9).alias("lgb"),
        F.round(F.cbrt(pr), 9).alias("cb"),
        F.factorial(sz % 10).cast("long").alias("fact"),
        F.pmod(sz - 25, F.lit(7)).cast("int").alias("pm"),
        F.bit_count(sz).cast("int").alias("bc"),
        F.round(F.hypot(sz.cast("double"), F.lit(10.0)), 9).alias("hyp"),
        F.round(F.exp(F.lit(1.0)), 9).alias("e_const"),
        (F.floor(pr / 10) * 10).cast("double").alias("trunc_neg1"),
    )


@register(
    "f_try_family",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(p_brand AS INTEGER) AS bad_int,
           TRY_CAST(substr(p_brand, 7, 2) AS INTEGER) AS good_int,
           TRY_CAST(concat('1995-', lpad(CAST(p_size % 15 AS VARCHAR), 2, '0'),
                           '-10') AS DATE) IS NULL AS bad_month,
           CASE WHEN p_size = 25 THEN NULL
                ELSE p_retailprice / (p_size - 25) END AS try_div,
           string_split(p_name, ' ')[p_size] AS try_elem
    FROM part WHERE p_partkey <= 80
    """,
    survey="2.8-cast 2.8-conditional",
)
def f_try_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant evaluation family [docs: TRY_CAST; Flink returns
    NULL instead of raising on malformed casts]: TRY_CAST on a
    non-numeric string (NULL), on an extracted digit substring (value),
    and on an out-of-range calendar month (NULL — compared as IS NULL so
    the date/datetime widening mismatch never enters the hash);
    TRY_DIVIDE null-on-zero-denominator (the oracle replays it as a
    guarded CASE — DuckDB has no try_divide); try_element_at past the
    array end (DuckDB list indexing is natively NULL out-of-range).
    Strings like '3.5' are deliberately absent: DuckDB TRY_CAST rounds
    them into INTEGER while Spark nulls them — a real cross-engine
    semantic divergence this family pins around."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 80)
    return p.select(
        "p_partkey",
        F.expr("TRY_CAST(p_brand AS INT)").alias("bad_int"),
        F.expr("TRY_CAST(substring(p_brand, 7, 2) AS INT)").alias("good_int"),
        F.expr(
            "TRY_CAST(concat('1995-', lpad(CAST(p_size % 15 AS STRING), 2, '0'),"
            " '-10') AS DATE)"
        ).isNull().alias("bad_month"),
        F.try_divide(F.col("p_retailprice"), F.col("p_size") - 25).alias("try_div"),
        F.try_element_at(F.split("p_name", " "), F.col("p_size")).alias("try_elem"),
    )
