"""Array / map / JSON functions (SURVEY §2.2 Q17).

The corpus carries two semi-structured columns: ``events.props`` (JSON
wire strings — the reference's dict-of-Any rows, ``etls/reddit_etl.py:
53-55``) and ``documents.text`` (token streams for the X4 text-analysis
operators in ``operators/text_analysis.py``).

All built-ins; explode is the only row-multiplying op and it is bounded
by tokens-per-document, so memory per task stays flat at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ..registry import register
from ..tables import table


@register(
    "q17_json_funcs",
    oracle="""
    WITH typed AS (
        SELECT event_id,
               CASE WHEN json_valid(props) THEN
                   CASE WHEN json_type(json_extract(props, '$.k'))
                             IN ('BIGINT', 'UBIGINT')
                             AND TRY_CAST(json_extract_string(props, '$.k')
                                          AS BIGINT)
                                 BETWEEN -2147483648 AND 2147483647
                        THEN CAST(json_extract_string(props, '$.k')
                                  AS BIGINT)
                   END
               END AS k,
               CASE WHEN json_valid(props)
                    THEN json_extract_string(props, '$.missing')
               END AS missing
        FROM events
    )
    SELECT
        event_id,
        coalesce(k, -1) AS prop_k,
        (k IS NOT NULL) AS has_k,
        coalesce(missing, 'absent') AS missing_default
    FROM typed
    """,
    tags=("functions", "Q17", "json"),
)
def q17_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction: typed path get, existence probe, absent-key default.

    Both path extraction (``get_json_object``) and full parse
    (``from_json`` with an explicit schema) are exercised; the schema'd
    parse is what a production pipeline should use — one parse, typed
    columns, vectorized downstream.

    Typed-lens parity (probed, round-8 audit): ``from_json`` with an
    ``IntegerType`` field accepts ONLY strict in-range JSON integers —
    7.5, 7.0, and "7" all null out — so the oracle gates on DuckDB's
    ``json_type`` (BIGINT/UBIGINT) plus the int32 range instead of a
    bare TRY_CAST, which would round '7.5' to 8 and accept strings.
    ``has_k`` follows the same typed lens on both sides.
    """
    props_schema = StructType(
        [
            StructField("k", IntegerType(), True),
            StructField("missing", StringType(), True),
        ]
    )
    # ONE from_json per row; every output derives from the parsed struct.
    # Three separate get_json_object calls would re-parse the wire string
    # three times — at 100 TB that is 3× the CPU of the whole scan.
    ev = table(spark, sf_dir, "events").withColumn(
        "parsed", F.from_json(F.col("props"), props_schema)
    )
    return ev.select(
        "event_id",
        F.coalesce(F.col("parsed.k").cast("long"), F.lit(-1)).alias("prop_k"),
        F.col("parsed.k").isNotNull().alias("has_k"),
        F.coalesce(F.col("parsed.missing"), F.lit("absent")).alias(
            "missing_default"
        ),
    )


@register(
    "q17_array_funcs",
    oracle="""
    SELECT
        doc_id,
        len(string_split(text, ' ')) AS n_tokens,
        list_contains(string_split(text, ' '), 'spark') AS mentions_spark,
        string_split(text, ' ')[1] AS first_token,
        array_to_string(
            list_sort(string_split(substr(text, 1, 40), ' ')), '|'
        ) AS head_sorted
    FROM documents
    WHERE lang = 'en'
    """,
    tags=("functions", "Q17", "array"),
)
def q17_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery: split, size, contains, index, sort, re-join.

    Arrays stay inside the JVM row format end-to-end; the sorted head is
    re-joined to a string so the oracle hash compares scalars.
    """
    docs = table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("mentions_spark"),
        toks.getItem(0).alias("first_token"),
        F.array_join(
            F.sort_array(F.split(F.substring(F.col("text"), 1, 40), " ")), "|"
        ).alias("head_sorted"),
    )


@register(
    "q17_explode_tokens",
    oracle="""
    SELECT token, count(*) AS n
    FROM (
        SELECT unnest(string_split(text, ' ')) AS token
        FROM documents
        WHERE lang = 'en'
    )
    WHERE token <> ''
    GROUP BY 1
    """,
    tags=("functions", "Q17", "explode"),
)
def q17_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode → flat token rows → frequency (the X4 tokenize core).

    The explode multiplies rows by tokens-per-doc but the partial
    aggregate collapses counts before the shuffle, so the exchange
    carries |vocabulary| rows, not |tokens|.
    """
    docs = table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q17_map_funcs",
    oracle="""
    SELECT
        event_id,
        event_type,
        coalesce(CASE WHEN json_valid(props) THEN
                     TRY_CAST(trunc(TRY_CAST(
                         json_extract_string(props, '$.k') AS DOUBLE))
                     AS BIGINT) END, 0)
            AS k_from_map,
        2 AS n_map_keys
    FROM events
    """,
    tags=("functions", "Q17", "map"),
)
def q17_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + lookup: build a map column, read scalars back.

    The map round-trip (create_map → element_at / map_keys) is verified by
    extracting scalar values the oracle can hash; the map itself never
    crosses the comparison boundary.

    Typed-lens parity (probed, round-8 audit): Spark's string→long CAST
    parses any numeric string and TRUNCATES toward zero ('7.5' → 7),
    so the oracle goes TRY_CAST-to-DOUBLE + trunc — a bare
    TRY_CAST-to-BIGINT would ROUND '7.5' to 8.
    """
    ev = table(spark, sf_dir, "events")
    k_val = F.coalesce(
        F.get_json_object("props", "$.k").cast("long"), F.lit(0)
    )
    m = F.create_map(
        F.lit("k"), k_val, F.lit("uid"), F.col("user_id")
    )
    return ev.select(
        "event_id",
        "event_type",
        F.element_at(m, "k").alias("k_from_map"),
        F.size(F.map_keys(m)).alias("n_map_keys"),
    )


@register(
    "q17_json_corrupt_records",
    oracle="""
    WITH wire AS (
        SELECT * FROM (VALUES
            (1, '{"k": 7, "tag": "ok"}'),
            (2, '{"k": "not_a_number", "tag": "typed-wrong"}'),
            (3, '{broken json'),
            (4, NULL),
            (5, '[]'),
            (6, '{"tag": "missing-k"}')
        ) AS t(rec_id, payload)
    )
    SELECT
        rec_id,
        CASE
            WHEN payload IS NULL THEN FALSE
            WHEN NOT json_valid(payload) THEN TRUE
            WHEN json_type(payload) <> 'OBJECT' THEN TRUE
            WHEN json_extract_string(payload, '$.k') IS NOT NULL
                 AND TRY_CAST(json_extract_string(payload, '$.k') AS BIGINT)
                     IS NULL THEN TRUE
            ELSE FALSE
        END AS is_corrupt,
        CASE WHEN json_valid(payload) AND json_type(payload) = 'OBJECT'
             THEN TRY_CAST(json_extract_string(payload, '$.k') AS BIGINT)
        END AS k,
        CASE WHEN json_valid(payload) AND json_type(payload) = 'OBJECT'
             THEN json_extract_string(payload, '$.tag')
        END AS tag
    FROM wire
    """,
    tags=("json", "Q17", "corrupt-records"),
)
def q17_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: malformed-JSON tolerance — the ingest wire is never clean.

    ``from_json`` in PERMISSIVE mode (the default) never fails the job:
    with ``columnNameOfCorruptRecord`` declared, broken syntax, non-object
    payloads, and type-mismatched fields land in the corrupt column while
    every salvageable field is still extracted (note the type-mismatch
    row keeps its good ``tag``). Exactly the total-function semantics a
    100 TB ingest needs — one bad shard must not kill the run, and the
    bad records stay queryable for quarantine. The fixture covers the
    failure ladder: valid, wrong-typed field, broken syntax, NULL input,
    non-object, missing field; the oracle reproduces each verdict with
    DuckDB's json_valid/json_type/TRY_CAST (lazy CASE guards — DuckDB
    json functions raise on malformed input if evaluated eagerly).
    One projection per record, no shuffle.
    """
    from pyspark.sql.types import LongType

    rows = [
        (1, '{"k": 7, "tag": "ok"}'),
        (2, '{"k": "not_a_number", "tag": "typed-wrong"}'),
        (3, "{broken json"),
        (4, None),
        (5, "[]"),
        (6, '{"tag": "missing-k"}'),
    ]
    wire = spark.createDataFrame(rows, ["rec_id", "payload"])
    schema = StructType(
        [
            StructField("k", LongType(), True),
            StructField("tag", StringType(), True),
            StructField("_corrupt", StringType(), True),
        ]
    )
    parsed = wire.select(
        "rec_id",
        F.from_json(
            F.col("payload"), schema, {"columnNameOfCorruptRecord": "_corrupt"}
        ).alias("j"),
    )
    return parsed.select(
        "rec_id",
        F.col("j._corrupt").isNotNull().alias("is_corrupt"),
        F.col("j.k").alias("k"),
        F.col("j.tag").alias("tag"),
    )


@register(
    "q17_higher_order_funcs",
    oracle="""
    WITH baskets AS (
        SELECT l_orderkey,
               list_sort(list(CAST(l_quantity AS BIGINT))) AS qtys
        FROM lineitem
        GROUP BY l_orderkey
    )
    SELECT
        l_orderkey,
        CAST(len(qtys) AS INT) AS n_lines,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), qtys),
                         (acc, q) -> acc + q) AS BIGINT) AS total_qty,
        CAST(len(list_filter(qtys, q -> q >= 30)) AS INT) AS n_bulk,
        CAST(list_reduce(
            list_prepend(CAST(0 AS BIGINT),
                         list_transform(qtys, q -> q * q)),
            (acc, q) -> acc + q) AS BIGINT) AS sum_sq,
        CAST(list_reduce(
            list_prepend(CAST(0 AS BIGINT),
                         list_transform(
                             generate_series(1, len(qtys)),
                             i -> qtys[CAST(i AS INT)]
                                  * qtys[CAST(len(qtys) + 1 - i AS INT)])),
            (acc, q) -> acc + q) AS BIGINT) AS palindrome_dot
    FROM baskets
    WHERE l_orderkey % 13 = 0
    """,
    tags=("functions", "Q17", "higher-order"),
)
def q17_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17g: higher-order array functions — the engine's workhorse, pinned.

    ``transform`` / ``filter`` / ``aggregate`` / ``zip_with`` power
    half this engine's hot paths (MinHash signatures, SimHash lanes,
    cosine dots, basket pair-gen, BPE windows) but only appeared inside
    larger operators; this battery registers them directly over
    per-order quantity baskets: element count, fold-sum, predicate
    filter count, map-then-fold (sum of squares), and a zip_with dot
    against the reversed list. All integer math on a ``sort_array``'d
    basket, so every lambda's cross-engine semantics are hash-pinned.

    Scale shape: one groupBy(orderkey) exchange builds baskets (bounded
    by order width); every lambda then runs inside whole-stage codegen
    over the array — no explode, no second shuffle, no Python.
    """
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 13 == 0)
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.col("l_quantity").cast("bigint"))
        ).alias("qtys")
    )
    qtys = F.col("qtys")
    fold_sum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, q: acc + q
    )
    return baskets.select(
        "l_orderkey",
        F.size(qtys).alias("n_lines"),
        fold_sum(qtys).cast("bigint").alias("total_qty"),
        F.size(F.filter(qtys, lambda q: q >= 30)).alias("n_bulk"),
        fold_sum(F.transform(qtys, lambda q: q * q))
        .cast("bigint")
        .alias("sum_sq"),
        fold_sum(F.zip_with(qtys, F.reverse(qtys), lambda a, b: a * b))
        .cast("bigint")
        .alias("palindrome_dot"),
    )


@register(
    "q17_variant_shred",
    oracle="""
    WITH shred AS (
        SELECT event_type,
               CASE WHEN json_valid(props) THEN
                   CASE json_type(json_extract(props, '$.k'))
                       WHEN 'BIGINT' THEN
                           TRY_CAST(json_extract_string(props, '$.k')
                                    AS BIGINT)
                       WHEN 'UBIGINT' THEN
                           TRY_CAST(json_extract_string(props, '$.k')
                                    AS BIGINT)
                       WHEN 'DOUBLE' THEN
                           CASE WHEN abs(TRY_CAST(
                                    json_extract_string(props, '$.k')
                                    AS DOUBLE)) < 9.2233720368547e18
                                THEN CAST(trunc(TRY_CAST(
                                    json_extract_string(props, '$.k')
                                    AS DOUBLE)) AS BIGINT) END
                       WHEN 'BOOLEAN' THEN
                           CASE json_extract_string(props, '$.k')
                               WHEN 'true' THEN 1 ELSE 0 END
                       WHEN 'VARCHAR' THEN
                           CASE WHEN regexp_matches(
                                    trim(json_extract_string(props, '$.k')),
                                    '^[+-]?[0-9]+$')
                                THEN TRY_CAST(
                                    trim(json_extract_string(props, '$.k'))
                                    AS BIGINT) END
                   END
               END AS k
        FROM events
    )
    SELECT
        event_type,
        CAST(count(*) AS BIGINT) AS n_events,
        CAST(count(k) AS BIGINT) AS n_with_k,
        CAST(sum(k) AS BIGINT) AS sum_k,
        CAST(min(k) AS BIGINT) AS min_k,
        CAST(max(k) AS BIGINT) AS max_k
    FROM shred
    GROUP BY event_type
    """,
    tags=("functions", "Q17", "variant", "semi-structured"),
)
def q17_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: the VARIANT path for semi-structured data — parse ONCE to
    the open-schema binary VARIANT type, typed-get downstream.

    The Spark 4 answer to schema drift: ``from_json`` (q17_json_funcs)
    needs the schema declared up front and silently nulls anything
    that moved; ``parse_json`` shreds the wire string once into
    VARIANT's binary encoding, and ``try_variant_get`` extracts typed
    paths lazily — unknown keys cost nothing, type mismatches go NULL
    per-path instead of per-row, and new producer fields flow through
    untouched. This is the ingestion shape for event property bags
    whose schema the producer owns.

    Scale shape: one parse per row riding the scan (the binary
    encoding is columnar-friendly downstream — substantially cheaper
    than re-parsing JSON text per extraction); the rollup is a
    standard partial-agg on event_type. The oracle shreds the same
    paths with DuckDB's JSON functions — VARIANT is an encoding
    choice, not a semantics change, so the typed results must agree
    exactly. The typed lens is mirrored PER JSON TYPE (probed on
    crafted inputs, re-probed by the adversarial-corpus sweep —
    the earlier single-formula trunc oracle was wrong on three
    classes the fixtures never exhibit):
    ``try_variant_get(..., 'long')`` truncates JSON NUMBERS toward
    zero (7.9 → 7, -0.5 → 0; out-of-int64-range → NULL), casts
    BOOLEANS (true → 1, false → 0), accepts only STRICT-INTEGER
    strings ("7" → 7 but "7.5"/"1e2" → NULL — TRY-cast semantics,
    unlike the plain string CAST in q17_map_funcs which truncates
    '7.5' → 7), and nulls arrays/objects. ``parse_json`` is the
    THROWING variant (FAILFAST on any malformed wire string — one
    bad shard kills the job); ``try_parse_json`` is the total
    function an ingest path must use, and the oracle mirrors its
    NULL-on-malformed with a lazy ``json_valid`` CASE guard.
    Pinned on crafted floats/strings/booleans in
    ``tests/test_round8_ops.py``.
    """
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.try_parse_json(F.col("props")).alias("v")
    ).select(
        "event_type",
        F.try_variant_get(F.col("v"), "$.k", "long").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.count("k").cast("bigint").alias("n_with_k"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").cast("bigint").alias("min_k"),
        F.max("k").cast("bigint").alias("max_k"),
    )
