"""Scalar-function family queries (SURVEY.md §2C "Scalar functions").

Generalizes the reference's string handling (strings.Split/Join/
TrimSuffix in reference internal/cli/mapreduce.go:207,219,230) into the
full built-in function surface. Everything here is JVM-side whole-stage
codegen — no Python UDFs (those live in udfs.py deliberately).

Cross-engine semantics pinned for the oracle:
- day-of-week: Spark weekday() is Mon=0; DuckDB isodow is Mon=1 → use
  weekday+1 vs isodow.
- element_at / list indexing: both engines are 1-based.
- pmod: DuckDB lacks it → ((a % b) + b) % b on both sides.
- float arrays: cast elements to double BEFORE arithmetic on both
  sides; sequential fold order is identical, so sums match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_llm_spark.io import load_table
from mapreduce_llm_spark.registry import query


@query(
    "q_fn_string",
    oracle="""
    SELECT
        p_partkey,
        upper(p_name)                                   AS name_uc,
        lower(p_brand)                                  AS brand_lc,
        substr(p_type, 1, 8)                            AS type_prefix,
        length(p_name)                                  AS name_len,
        trim(concat('  ', p_name, '  '))                AS trimmed,
        concat(p_brand, ':', p_type)                    AS brand_type,
        regexp_extract(p_name, '([a-z]+)', 1)           AS first_word,
        regexp_replace(p_name, '[aeiou]', '_', 'g')     AS devoweled,
        len(string_split(p_name, ' '))                  AS n_words,
        reverse(p_brand)                                AS brand_rev,
        replace(p_type, 'ED', 'xx')                     AS type_repl,
        lpad(p_brand, 12, '*')                          AS brand_pad
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_uc"),
        F.lower("p_brand").alias("brand_lc"),
        F.substring("p_type", 1, 8).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_words"),
        F.reverse("p_brand").alias("brand_rev"),
        F.replace(F.col("p_type"), F.lit("ED"), F.lit("xx")).alias("type_repl"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT
        o_orderkey,
        year(o_orderdate)                                       AS yr,
        month(o_orderdate)                                      AS mth,
        isodow(o_orderdate)                                     AS dow_iso,
        dayofyear(o_orderdate)                                  AS doy,
        quarter(o_orderdate)                                    AS qtr,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)     AS month_start,
        date_diff('day', o_orderdate, TIMESTAMP '1999-01-01')   AS days_to_1999,
        o_orderdate + INTERVAL 90 DAY                           AS due_date,
        strftime(o_orderdate, '%Y-%m')                          AS ym_str
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mth"),
        (F.weekday("o_orderdate") + 1).alias("dow_iso"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1999-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_1999"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym_str"),
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT
        l_orderkey,
        l_linenumber,
        round(l_extendedprice, 1)                         AS price_r1,
        abs(l_discount - 0.05)                            AS disc_dev,
        CAST(ceil(l_quantity / 7) AS BIGINT)              AS qty_ceil,
        CAST(floor(l_extendedprice / 1000) AS BIGINT)     AS price_kfloor,
        round(ln(l_extendedprice), 4)                     AS price_ln,
        round(sqrt(l_quantity), 4)                        AS qty_sqrt,
        round(pow(l_discount, 2), 6)                      AS disc_sq,
        ((l_orderkey % 5) + 5) % 5                        AS key_pmod,
        greatest(l_quantity, 25.0)                        AS qty_hi,
        least(l_tax, 0.04)                                AS tax_lo,
        CAST(sign(l_discount - 0.05) AS DOUBLE)           AS disc_sign
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_kfloor"),
        F.round(F.log(F.col("l_extendedprice")), 4).alias("price_ln"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.pmod(F.col("l_orderkey"), F.lit(5)).cast("bigint").alias("key_pmod"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_tax"), F.lit(0.04)).alias("tax_lo"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "q_fn_array",
    oracle="""
    SELECT
        vec_id,
        len(embedding)                                               AS dim,
        round(CAST(embedding[1] AS DOUBLE), 6)                       AS first_elem,
        round(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE))), 4)                  AS vec_sum,
        round(list_max(list_transform(embedding,
                       x -> CAST(x AS DOUBLE))), 6)                  AS vec_max,
        round(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm,
        len(list_filter(embedding, x -> x > 0))                      AS n_pos
    FROM embeddings
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the 64-dim embedding column —
    size, indexing, transform/filter/aggregate. The double-cast before
    arithmetic keeps the fold bit-identical to the oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at(F.col("embedding"), 1).cast("double"), 6).alias("first_elem"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.round(F.array_max(as_double), 6).alias("vec_max"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("sq_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("bigint").alias("n_pos"),
    )


@query(
    "q_fn_json",
    oracle="""
    SELECT
        event_id,
        props ->> 'k'                        AS k_str,
        CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
        CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) % 2 = 0
             THEN 'even' ELSE 'odd' END      AS k_parity
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props ('{"k": <int>}')."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_int"),
        F.when(k.cast("bigint") % 2 == 0, "even").otherwise("odd").alias("k_parity"),
    )


@query(
    "q_fn_map",
    oracle="""
    SELECT
        n_nationkey,
        'name'                       AS key0,
        n_name                       AS val_name,
        CAST(n_regionkey AS VARCHAR) AS val_region,
        2                            AS map_size
    FROM nation
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + key/value extraction, proven by round-trip:
    build a map, read scalars back out (the oracle recomputes the
    scalars directly — DuckDB MAP hashing isn't comparable)."""
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return n.select(
        "n_nationkey",
        F.sort_array(F.map_keys(m))[0].alias("key0"),
        F.element_at(m, "name").alias("val_name"),
        F.element_at(m, "region").alias("val_region"),
        F.size(m).alias("map_size"),
    )


@query(
    "q_fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name)    AS name_md5,
           sha256(c_name) AS name_sha256
    FROM customer
    WHERE c_custkey <= 500
    """,
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digest functions — content-addressing primitives
    (the cache key in operators/cache.py uses the same family; Spark's
    xxhash64 is engine-internal so the cross-checkable md5/sha256 are
    the oracle surface)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


@query(
    "q_fn_conditional",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
           round(greatest(c_acctbal, 0.0), 4)                   AS bal_floor0,
           round(least(c_acctbal, 5000.0), 4)                   AS bal_cap5k,
           CASE WHEN c_acctbal IS NULL THEN -1.0
                ELSE round(c_acctbal, 4) END                    AS bal_or_neg1
    FROM customer
    """,
)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar family: nullif/coalesce/greatest/least/CASE —
    all whole-stage-codegen expressions, zero shuffle."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("seg_or_other"),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 4).alias("bal_floor0"),
        F.round(F.least(F.col("c_acctbal"), F.lit(5000.0)), 4).alias("bal_cap5k"),
        F.when(F.col("c_acctbal").isNull(), F.lit(-1.0))
        .otherwise(F.round(F.col("c_acctbal"), 4))
        .alias("bal_or_neg1"),
    )


@query(
    "q_fn_bitwise",
    oracle="""
    SELECT p_partkey,
           p_size & 15                          AS low_nibble,
           p_size | 16                          AS with_flag,
           xor(p_size, 255)                     AS flipped,
           (p_size << 2) + (p_size >> 1)        AS shifted
    FROM part WHERE p_partkey <= 500
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression family — flag masks and shifts, all
    whole-stage codegen."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    size = F.col("p_size")
    return p.select(
        "p_partkey",
        size.bitwiseAND(F.lit(15)).alias("low_nibble"),
        size.bitwiseOR(F.lit(16)).alias("with_flag"),
        size.bitwiseXOR(F.lit(255)).alias("flipped"),
        (F.shiftleft(size, 2) + F.shiftright(size, 1)).alias("shifted"),
    )


@query(
    "q_fn_interval",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY                    AS due_date,
           o_orderdate - INTERVAL 1 WEEK                    AS week_before,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-01-01')
                AS INTEGER)                                 AS days_to_98
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def q_fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic on timestamps — due dates, lookbacks,
    day distances; constant-folded expressions in the scan stage."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        (F.col("o_orderdate") - F.expr("INTERVAL 7 DAYS")).alias("week_before"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_98"
        ),
    )


@query(
    "q_fn_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m')          AS ym,
           strftime(o_orderdate, '%Y/%m/%d %H:%M') AS full_fmt
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def q_fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp→string formatting (report keys, partition labels).
    Spark's JDK patterns vs DuckDB's strftime spell the same outputs
    with different pattern syntax — the VALUES are pinned equal."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.date_format("o_orderdate", "yyyy/MM/dd HH:mm").alias("full_fmt"),
    )


@query(
    "q_fn_struct",
    oracle="""
    SELECT o_orderkey,
           struct_extract(s, 'prio') AS prio,
           struct_extract(s, 'price') AS price,
           struct_extract(struct_extract(n, 'inner'), 'price') AS nested_price
    FROM (
        SELECT o_orderkey,
               struct_pack(prio := o_orderpriority,
                           price := round(o_totalprice, 4)) AS s,
               struct_pack(okey := o_orderkey,
                           inner := struct_pack(
                               prio := o_orderpriority,
                               price := round(o_totalprice, 4))) AS n
        FROM orders
        WHERE o_orderkey < 300
    )
    ORDER BY o_orderkey
    """,
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field extraction (incl. one nesting
    level), proven by round-trip back to scalars — the typed-record
    primitive behind multimodal metadata and packed log payloads.
    All codegen'd Catalyst expressions; structs that are only built
    and re-projected never materialize in the shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    s = F.struct(
        F.col("o_orderpriority").alias("prio"),
        F.round("o_totalprice", 4).alias("price"),
    )
    n = F.struct(
        F.col("o_orderkey").alias("okey"),
        s.alias("inner"),
    )
    return (
        o.select("o_orderkey", s.alias("s"), n.alias("n"))
        .select(
            "o_orderkey",
            F.col("s").getField("prio").alias("prio"),
            F.col("s").getField("price").alias("price"),
            F.col("n").getField("inner").getField("price").alias("nested_price"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_fn_nullsafe",
    oracle="""
    WITH k AS (
        SELECT CASE WHEN o_orderpriority = '5-LOW' THEN NULL
                    ELSE o_orderpriority END AS key
        FROM orders
    ),
    a AS (SELECT key, count(*) AS n_a FROM k GROUP BY key),
    b AS (SELECT key, count(*) AS n_b FROM k GROUP BY key)
    SELECT coalesce(a.key, '<null>') AS key, n_a, n_b
    FROM a JOIN b ON a.key IS NOT DISTINCT FROM b.key
    ORDER BY key
    """,
)
def q_fn_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM): the 3-valued-
    logic edge a plain equi-join silently drops — NULL join keys match
    each other under <=> but vanish under =. Proven by a self-join of
    per-key counts where one priority class is nulled out: the NULL
    group must survive the join with equal counts on both sides."""
    o = load_table(spark, sf_dir, "orders")
    key = F.when(F.col("o_orderpriority") == "5-LOW", None).otherwise(
        F.col("o_orderpriority")
    )
    k = o.select(key.alias("key"))
    a = k.groupBy("key").agg(F.count("*").alias("n_a"))
    b = k.groupBy("key").agg(F.count("*").alias("n_b"))
    return (
        a.join(b, a["key"].eqNullSafe(b["key"]))
        .select(
            F.coalesce(a["key"], F.lit("<null>")).alias("key"), "n_a", "n_b"
        )
        .orderBy("key")
    )
