"""Scalar function batteries (SURVEY §2.2 Q14-Q16).

The reference's transform layer is scalar functions (trim/cast/default,
reference ``etls/reddit_etl.py:63-85``); its Athena role implies the full
warehouse scalar surface. Three registered batteries: strings (Q14),
date/time (Q15), math/conditional (Q16).

All built-ins — JVM-side, whole-stage-codegen, zero Python on the data
path. Each battery is one narrow projection: no shuffle at any scale.

Oracle-parity notes:
- Spark ``substring`` is 1-indexed like DuckDB's ``substr``.
- ``datediff`` → DuckDB ``date_diff('day', ...)`` (argument order flips).
- Spark ``date_format`` pattern letters → DuckDB ``strftime`` codes.
- double math rounded via ``dround`` on both sides before hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import table
from .numeric import dround


@register(
    "q14_string_funcs",
    oracle="""
    SELECT
        p_partkey,
        lower(p_name) AS name_lower,
        upper(p_brand) AS brand_upper,
        length(p_name) AS name_len,
        concat(p_brand, ':', p_type) AS brand_type,
        substr(p_name, 1, 5) AS name_prefix,
        replace(p_name, ' ', '_') AS name_snake,
        regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        (p_type LIKE '%ECONOMY%') AS is_economy,
        lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
        trim('  ' || p_brand || '  ') AS brand_roundtrip,
        split_part(p_name, ' ', 1) AS first_word
    FROM part
    """,
    tags=("functions", "Q14"),
)
def q14_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 string battery: case, length, concat, substring, regex, pad, split."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.col("p_type").like("%ECONOMY%").alias("is_economy"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
            "brand_roundtrip"
        ),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
    )


@register(
    "q14_string_funcs2",
    oracle="""
    SELECT
        c_custkey,
        -- initcap differs subtly across engines on non-alpha boundaries;
        -- the corpus names are plain words so both agree.
        upper(substr(c_name, 1, 1)) || lower(substr(c_name, 2)) AS name_title,
        reverse(c_mktsegment) AS seg_reversed,
        repeat(substr(c_mktsegment, 1, 2), 2) AS seg_rep,
        left(c_name, 4) AS name_left,
        right(c_name, 3) AS name_right,
        CAST(strpos(c_name, 'a') AS INT) AS first_a,
        translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lowvowel,
        (c_name ILIKE '%CUSTOMER%') AS has_customer_ci,
        md5(c_name) AS name_md5
    FROM customer
    """,
    tags=("functions", "Q14"),
)
def q14_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 string battery 2: title-case, reverse, repeat, left/right,
    position, translate, case-insensitive match, MD5."""
    c = table(spark, sf_dir, "customer")
    name = F.col("c_name")
    seg = F.col("c_mktsegment")
    return c.select(
        "c_custkey",
        F.concat(
            F.upper(F.substring(name, 1, 1)),
            F.lower(F.expr("substring(c_name, 2)")),
        ).alias("name_title"),
        F.reverse(seg).alias("seg_reversed"),
        F.repeat(F.substring(seg, 1, 2), 2).alias("seg_rep"),
        F.substring(name, 1, 4).alias("name_left"),
        F.expr("right(c_name, 3)").alias("name_right"),
        F.instr(name, "a").cast("int").alias("first_a"),
        F.translate(seg, "AEIOU", "aeiou").alias("seg_lowvowel"),
        F.upper(name).contains("CUSTOMER").alias("has_customer_ci"),
        F.md5(name).alias("name_md5"),
    )


@register(
    "q15_datetime_funcs",
    oracle="""
    SELECT
        o_orderkey,
        CAST(year(o_orderdate) AS INT) AS order_year,
        CAST(month(o_orderdate) AS INT) AS order_month,
        CAST(day(o_orderdate) AS INT) AS order_day,
        CAST(quarter(o_orderdate) AS INT) AS order_quarter,
        CAST(dayofyear(o_orderdate) AS INT) AS order_doy,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
        CAST(date_diff('day', o_orderdate,
                       TIMESTAMP '2002-01-01 00:00:00') AS INT) AS days_to_2002,
        strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
        CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_secs
    FROM orders
    WHERE year(o_orderdate) = 1997
    """,
    tags=("functions", "Q15"),
)
def q15_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 date/time battery: parts, trunc, arithmetic, diff, format, epoch.

    The R4 epoch↔timestamp conversion (reference ``etls/reddit_etl.py:
    65-70``) round-trips here as ``unix_timestamp``; everything stays in
    the session's pinned UTC.
    """
    o = table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.dayofyear("o_orderdate").cast("int").alias("order_doy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")
        ).cast("int").alias("days_to_2002"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.last_day("o_orderdate").alias("month_end"),
        F.unix_timestamp("o_orderdate").alias("epoch_secs"),
    )


@register(
    "q16_math_conditional",
    oracle="""
    SELECT
        l_orderkey,
        l_linenumber,
        abs(l_discount - 0.05) AS disc_dev,
        CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        CAST(round(sqrt(l_extendedprice) * 10000.0) AS BIGINT) AS price_sqrt_e4,
        CAST(round(ln(l_extendedprice + 1.0) * 10000.0) AS BIGINT) AS price_ln_e4,
        CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
        CASE
            WHEN l_quantity >= 40 THEN 'bulk'
            WHEN l_quantity >= 10 THEN 'standard'
            ELSE 'small'
        END AS qty_class,
        greatest(l_tax, l_discount) AS max_rate,
        least(l_tax, l_discount) AS min_rate,
        coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
        CAST(sign(l_extendedprice - 30000.0) AS BIGINT) AS price_side
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
    tags=("functions", "Q16"),
)
def q16_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 math/conditional battery: arithmetic, roots/logs, CASE, bounds.

    The reference's when/otherwise defaults (R5-R9) generalized to the
    full conditional surface.

    Cross-engine float discipline: every column that the two engines
    compute through DIFFERENT numeric paths is emitted as BIGINT on both
    sides. DuckDB's ceil/floor return DOUBLE (Python float 23.0) while
    Spark's return LONG (int 23) — same value, different rendered type —
    and its sign() returns an integer while Spark's signum() returns a
    double, so without explicit casts the value hash can diverge on every
    row even when the math agrees. The irrational metrics (sqrt/ln) are
    kept as scaled integers with the SAME multiply-then-round shape on
    both engines (never round-then-divide-back, which re-exposes the
    decimal tie after the rounding step).
    """
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.round(F.sqrt("l_extendedprice") * 10000.0, 0)
        .cast("bigint")
        .alias("price_sqrt_e4"),
        F.round(F.log(F.col("l_extendedprice") + 1.0) * 10000.0, 0)
        .cast("bigint")
        .alias("price_ln_e4"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "standard")
        .otherwise("small")
        .alias("qty_class"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.signum(F.col("l_extendedprice") - 30000.0).cast("bigint").alias("price_side"),
    )


@register(
    "q15_datetime_funcs2",
    oracle="""
    SELECT
        o_orderkey,
        CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
        CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
        CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sun1,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
            AS plus_3_months,
        CAST(CAST(o_orderdate AS DATE)
             - DATE '1995-01-01' AS BIGINT) AS days_since_95,
        CAST(make_date(CAST(year(o_orderdate) AS INT),
                       CAST(month(o_orderdate) AS INT), 1) AS DATE)
            AS month_floor,
        strftime(o_orderdate, '%Y-%m') AS year_month,
        CAST(greatest(CAST(o_orderdate AS DATE), DATE '1996-06-15')
             AS DATE) AS clamped_date
    FROM orders
    WHERE year(o_orderdate) = 1996 AND month(o_orderdate) <= 2
    """,
    tags=("functions", "Q15"),
)
def q15_datetime_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15b date/time battery: week grain, DOW, month arithmetic, make_date.

    Second half of the warehouse date surface the Athena role implies
    (SURVEY §2.2 Q15) — the functions q15_datetime_funcs leaves out:
    ISO-week truncation/numbering, day-of-week, clamping month addition
    (Jan 31 + 1 month = Feb 28 in BOTH engines), date reconstruction,
    and date clamping via greatest.

    Cross-engine parity notes:
    - Spark ``dayofweek`` is 1=Sunday..7; DuckDB ``dayofweek`` is
      0=Sunday..6 — the oracle adds 1 rather than shipping a remap CASE.
    - Spark ``add_months`` and DuckDB ``+ INTERVAL 3 MONTH`` both clamp
      to month end (Postgres semantics), so the pair is hash-safe.
    - ``date_trunc('week', ...)`` is Monday-anchored in both engines.
    - DuckDB DATE - DATE yields BIGINT days directly; Spark mirrors it
      with ``datediff`` cast to bigint.

    One codegen'd projection over the scan, predicate pushed down — no
    shuffle at any scale.
    """
    o = table(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") == 1996) & (F.month("o_orderdate") <= 2)
    )
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_trunc("week", "o_orderdate").alias("week_start"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        F.dayofweek("o_orderdate").cast("int").alias("dow_sun1"),
        F.add_months(d, 3).alias("plus_3_months"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_95"),
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)).alias(
            "month_floor"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.greatest(d, F.lit("1996-06-15").cast("date")).alias("clamped_date"),
    )


@register(
    "q16_bitwise_funcs",
    oracle="""
    SELECT
        o_orderkey,
        CAST(o_orderkey & 255 AS BIGINT) AS key_and_mask,
        CAST(o_orderkey | 4096 AS BIGINT) AS key_or_flag,
        CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS key_xor_cust,
        CAST(o_orderkey << 3 AS BIGINT) AS key_shl3,
        CAST(o_orderkey >> 2 AS BIGINT) AS key_shr2,
        CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_popcount,
        CAST(~o_orderkey AS BIGINT) AS key_not
    FROM orders
    WHERE o_orderkey % 11 = 0
    """,
    tags=("functions", "Q16", "bitwise"),
)
def q16_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16b bitwise battery: AND/OR/XOR/NOT, shifts, popcount.

    Bit manipulation is load-bearing in this engine, not a curiosity:
    SimHash packs counter lanes into longs (operators/dedup.py), Z-order
    interleaves dimension bits (operators/layout.py), and bloom/bucket
    ops mask hashes. This battery pins the cross-engine semantics those
    ops rely on: two's-complement longs, arithmetic right shift,
    ``bit_count`` over the full 64-bit pattern.

    All integer-exact — no float discipline needed; every output is
    BIGINT on both engines. One codegen'd projection, no shuffle.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("key_and_mask"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("key_or_flag"),
        k.bitwiseXOR(F.col("o_custkey")).cast("bigint").alias("key_xor_cust"),
        F.shiftleft(k, 3).cast("bigint").alias("key_shl3"),
        F.shiftright(k, 2).cast("bigint").alias("key_shr2"),
        F.bit_count(k).cast("bigint").alias("key_popcount"),
        F.expr("~o_orderkey").cast("bigint").alias("key_not"),
    )


@register(
    "q14_string_funcs3",
    oracle="""
    SELECT
        p_partkey,
        CAST(levenshtein(split_part(p_name, ' ', 1), 'almond') AS BIGINT)
            AS lev_almond,
        printf('P%09d', p_partkey) AS padded_sku,
        left(p_name, 10) AS name_head,
        right(p_type, 6) AS type_tail,
        split_part(p_type, ' ', 2) AS type_mid,
        CAST(position('BRASS' IN upper(p_type)) AS BIGINT) AS brass_at,
        CAST(length(p_name) - length(replace(p_name, ' ', ''))
             AS BIGINT) AS n_spaces,
        repeat('*', CAST(p_size % 5 AS INT)) AS size_stars
    FROM part
    WHERE p_partkey % 7 = 0
    """,
    tags=("functions", "Q14"),
)
def q14_string_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14c string battery: edit distance, printf, left/right, split_part.

    Third string installment — the functions the first two batteries
    and the curation ops lean on indirectly, pinned directly:
    ``levenshtein`` (the fuzzy-near-dup verifier's kernel, X2h),
    zero-padded ``printf``/``format_string`` (shard/SKU naming in
    sinks), ``left``/``right`` head-tail slicing, ``split_part`` field
    extraction, ``position`` (1-based, 0 = absent — same convention
    both engines), occurrence counting via the length-difference idiom,
    and data-driven ``repeat``.

    One codegen'd projection over the part dimension; predicate pushed
    to the scan; no shuffle.
    """
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0)
    return p.select(
        "p_partkey",
        F.levenshtein(F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)), F.lit("almond"))
        .cast("bigint")
        .alias("lev_almond"),
        F.format_string("P%09d", F.col("p_partkey")).alias("padded_sku"),
        F.expr("left(p_name, 10)").alias("name_head"),
        F.expr("right(p_type, 6)").alias("type_tail"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias("type_mid"),
        F.instr(F.upper(F.col("p_type")), "BRASS").cast("bigint").alias("brass_at"),
        (F.length("p_name") - F.length(F.replace(F.col("p_name"), F.lit(" "), F.lit(""))))
        .cast("bigint")
        .alias("n_spaces"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("size_stars"),
    )


@register(
    "q16_null_semantics",
    oracle="""
    SELECT
        event_id,
        (value IS NULL) AS v_is_null,
        (value > 100.0) AS gt_maybe_null,
        coalesce(value > 100.0, FALSE) AS gt_defaulted,
        ((value > 100.0) AND (event_type = 'purchase')) AS and_3vl,
        ((value > 100.0) OR (event_type = 'purchase')) AS or_3vl,
        (value IS NOT DISTINCT FROM NULL) AS null_safe_eq_null,
        nullif(event_type, 'error') AS type_or_null,
        CAST(coalesce(CAST(round(value * 100.0) AS BIGINT), -1)
             AS BIGINT) AS cents_or_sentinel,
        (CASE WHEN value IS NULL THEN 'missing'
              WHEN value > 100.0 THEN 'high'
              ELSE 'normal' END) AS tri_state
    FROM events
    WHERE event_id % 5 = 0
    """,
    tags=("functions", "Q16", "null-semantics"),
)
def q16_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16c: three-valued-logic battery — NULL semantics, hash-pinned.

    The silent-wrongness capital of SQL: ``NULL > 100`` is UNKNOWN (not
    FALSE), ``UNKNOWN AND FALSE`` is FALSE but ``UNKNOWN AND TRUE`` is
    UNKNOWN, a WHERE drops UNKNOWN rows while a CASE falls through —
    and every filter, quality gate, and CDC comparison in this engine
    leans on those rules. This battery emits the raw three-valued
    results (nullable booleans survive to the output, so the hash
    checks UNKNOWN-vs-FALSE distinctions directly), the defaulted
    form (``coalesce(pred, FALSE)``, the explicit-choice idiom the
    curation gates use), null-safe equality against NULL itself, and
    the sentinel/CASE patterns for NULL-tolerant projections.

    One codegen projection over the scan; the point is semantics, not
    plan shape — both engines must agree cell-for-cell on every
    UNKNOWN.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    v = F.col("value")
    gt = v > 100.0
    is_p = F.col("event_type") == "purchase"
    return ev.select(
        "event_id",
        v.isNull().alias("v_is_null"),
        gt.alias("gt_maybe_null"),
        F.coalesce(gt, F.lit(False)).alias("gt_defaulted"),
        (gt & is_p).alias("and_3vl"),
        (gt | is_p).alias("or_3vl"),
        v.eqNullSafe(F.lit(None).cast("double")).alias("null_safe_eq_null"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
        F.coalesce(F.round(v * 100.0).cast("bigint"), F.lit(-1))
        .cast("bigint")
        .alias("cents_or_sentinel"),
        F.when(v.isNull(), "missing")
        .when(gt, "high")
        .otherwise("normal")
        .alias("tri_state"),
    )
