"""Pandas-UDF surface (SURVEY §2.2 Q20).

The escape hatch matching ``transform_post``'s arbitrary-Python role
(reference ``etls/reddit_etl.py:63-85``) — kept OFF the hot path: every
operator elsewhere in the engine is built-ins; this module exists so the
engine has a *vetted* pattern for logic that genuinely needs Python
(model scoring, custom tokenizers), in the two shapes that scale:

- scalar ``@pandas_udf``: Arrow-batched, vectorized numpy inside — the
  10-100× faster alternative to row-at-a-time ``F.udf``.
- grouped ``applyInPandas``: per-key pandas frames for whole-group logic
  (normalization, per-entity models), one shuffle by key.

Both entries are oracle-checked against closed-form SQL, so the UDF
boundary itself (Arrow transfer, schema declaration, null handling) is
under the correctness gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.numeric import dround
from ..registry import register
from ..tables import table


@pandas_udf(DoubleType())
def _sigmoid_score(v: pd.Series) -> pd.Series:
    """Vectorized sigmoid(v/100) — a stand-in model-scoring kernel."""
    return 1.0 / (1.0 + np.exp(-v / 100.0))


@register(
    "q20_pandas_scalar_udf",
    oracle="""
    SELECT
        event_id,
        round(coalesce(value, 0.0) * 100.0) / 100.0 + 0.0 AS value,
        round(
            (1.0 / (1.0 + exp(-coalesce(value, 0.0) / 100.0))) * 1000000.0
        ) / 1000000.0 AS score
    FROM events
    """,
    tags=("udf", "Q20"),
)
def q20_pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20a: scalar pandas UDF (Arrow-batched sigmoid scoring).

    The UDF sees whole Arrow batches and computes in numpy; the oracle
    recomputes the same closed form in SQL — verifying values survive
    the Python boundary bit-for-bit (to 6 decimals).
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id", F.coalesce(F.col("value"), F.lit(0.0)).alias("v")
    )
    return ev.select(
        "event_id",
        dround(F.col("v")).alias("value"),
        dround(_sigmoid_score(F.col("v")), 6).alias("score"),
    )


_ZSCORE_SCHEMA = StructType(
    [
        # nullable: the NULL-user group is a legitimate grouping key
        # (anonymous events) — declaring user_id non-nullable here made
        # the downstream codegen read an Arrow null as a long and crash
        # (found by the round-10 NULL-user hostile-corpus class)
        StructField("user_id", LongType(), True),
        StructField("event_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("zscore", DoubleType(), True),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user z-score normalization (population stddev)."""
    v = pdf["value"].to_numpy(dtype="float64")
    std = float(v.std())  # ddof=0: population, matches stddev_pop
    mean = float(v.mean())
    z = (v - mean) / std if std > 0.0 else np.zeros_like(v)
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "zscore": z,
        }
    )


@register(
    "q20_apply_in_pandas_zscore",
    oracle="""
    SELECT
        user_id,
        event_id,
        event_type,
        CASE WHEN stddev_pop(coalesce(value, 0.0)) OVER u = 0.0
             THEN 0.0
             ELSE round(
                 (coalesce(value, 0.0) - avg(coalesce(value, 0.0)) OVER u)
                 / stddev_pop(coalesce(value, 0.0)) OVER u * 10000.0
             ) / 10000.0 + 0.0
        END AS zscore
    FROM events
    WINDOW u AS (PARTITION BY user_id)
    """,
    tags=("udf", "Q20"),
)
def q20_apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20b: grouped applyInPandas — per-user z-score normalization.

    One shuffle by user_id, then each user's history arrives as a single
    pandas frame (the per-entity-model shape). The oracle states the
    same math as window aggregates. Rounded to 4 decimals: numpy's
    pairwise summation and SQL's streaming aggregate differ in the last
    float ulps by design.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
    )
    result = ev.groupBy("user_id").applyInPandas(
        _zscore_group, schema=_ZSCORE_SCHEMA
    )
    return result.select(
        "user_id",
        "event_id",
        "event_type",
        dround(F.col("zscore"), 4).alias("zscore"),
    )


@register(
    "q20_udtf_chunks",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents WHERE lang = 'en'
    )
    SELECT
        d.doc_id,
        CAST(gs.i AS INT) AS chunk_idx,
        array_to_string(w[gs.i * 8 + 1 : gs.i * 8 + 8], ' ') AS chunk,
        CAST(least(8, len(w) - gs.i * 8) AS INT) AS n_tokens
    FROM d CROSS JOIN LATERAL (
        SELECT unnest(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT))) AS i
    ) gs
    """,
    tags=("udf", "udtf", "Q20", "chunking"),
)
def q20_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20c: Python UDTF — fixed-size token-window chunking, one row → N.

    The canonical training-data prep fan-out: split each document into
    8-token context windows (chunk_idx, chunk text, token count) for
    downstream tokenize/embed stages. A UDTF is the table-function escape
    hatch for row-to-rows transforms that aren't a fixed-arity explode
    (parsers, segmenters, samplers with carry-over state). UDTFs run
    row-at-a-time Python — the slowest UDF tier, kept OFF hot paths (a
    production chunker of this exact shape belongs in codegen via
    split+sequence+transform, or batched in mapInPandas); this entry pins
    the API surface and the exact fan-out semantics against a relational
    oracle.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, chunk_idx: int, chunk: string, n_tokens: int")
    class ChunkTokens:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            if text is None:
                return
            w = [t for t in text.split(" ") if t]
            for i in range(0, (len(w) + 7) // 8):
                part = w[i * 8 : i * 8 + 8]
                yield doc_id, i, " ".join(part), len(part)

    spark.udtf.register("chunk_tokens", ChunkTokens)
    docs = table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    docs.select("doc_id", "text").createOrReplaceTempView("udtf_docs_en")
    return spark.sql(
        "SELECT s.doc_id, s.chunk_idx, s.chunk, s.n_tokens "
        "FROM udtf_docs_en t, LATERAL chunk_tokens(t.doc_id, t.text) s"
    )


@register(
    "q20_arrow_udf_ttr",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents WHERE lang = 'de'
    )
    SELECT doc_id,
           round(CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 10000.0)
               / 10000.0 AS ttr
    FROM d
    """,
    tags=("udf", "arrow", "Q20"),
)
def q20_arrow_udf_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20d: Arrow-optimized scalar Python UDF — type-token ratio per doc.

    The middle tier of the UDF ladder: scalar signature like a classic
    Python UDF, but ``useArrow=True`` ships columns as Arrow batches
    (``ArrowEvalPython`` in the plan — the row-pickling
    ``BatchEvalPython`` path is banned by ``tools/audit_plans.py``).
    Type-token ratio (distinct/total tokens) is a standard lexical-
    diversity quality signal; sets are genuinely convenient in Python,
    which is what the escape hatch is for. Hot-path equivalent stays
    codegen (`array_distinct`/`size` — see the oracle's relational twin).
    """
    from pyspark.sql.types import DoubleType

    @F.udf(returnType=DoubleType(), useArrow=True)
    def ttr(text: str | None) -> float | None:
        # NULL propagates (the oracle's list ops all yield NULL) — a
        # scalar UDF receives None for SQL NULL, it is not auto-skipped
        # (round-13 nullity sweep: .split on None crashed the task)
        if text is None:
            return None
        w = [t for t in text.split(" ") if t]
        if not w:
            return None
        return len(set(w)) / len(w)

    docs = table(spark, sf_dir, "documents").filter(F.col("lang") == "de")
    return docs.select("doc_id", dround(ttr(F.col("text")), 4).alias("ttr"))


@register(
    "q20_map_in_arrow",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           upper(substr(lang, 1, 2)) AS lang_code
    FROM documents
    WHERE source = 'src3'
    """,
    tags=("udf", "arrow", "Q20", "mapInArrow"),
)
def q20_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20e: ``mapInArrow`` — the lowest-overhead Python seam, pinned.

    The bottom rung of the UDF ladder (below pandas UDFs): the Python
    function receives raw ``pyarrow.RecordBatch`` objects — no pandas
    conversion, no per-column Series materialization — which is the
    right seam for libraries that speak Arrow natively (tokenizers,
    image decoders, Arrow-native feature stores). The work here is
    deliberately trivial (UTF-8 byte length + a language-code
    normalization) so the ORACLE can pin the batch path's semantics
    exactly; a real deployment swaps the compute kernel, not the seam.

    Scale shape: embarrassingly parallel over Arrow batches — no
    shuffle, schema declared so downstream stays columnar, and the
    source filter pushes to the parquet scan BEFORE the Python
    boundary (column/predicate pruning crosses mapInArrow only if you
    select early — done here).
    """
    import pyarrow as pa

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("source") == "src3")
        .select("doc_id", "text", "lang")
    )

    def batches(it):
        for batch in it:
            texts = batch.column("text")
            langs = batch.column("lang")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.compute.binary_length(
                        pa.compute.cast(texts, pa.binary())
                    ).cast(pa.int64()),
                    pa.compute.utf8_upper(
                        pa.compute.utf8_slice_codeunits(langs, 0, 2)
                    ),
                ],
                names=["doc_id", "n_bytes", "lang_code"],
            )

    return docs.mapInArrow(
        batches, "doc_id long, n_bytes long, lang_code string"
    )


@pandas_udf(LongType())
def _trimmed_sum_cents(cents: pd.Series) -> int:
    """GROUPED_AGG kernel: exact trimmed sum — sort, drop the lowest and
    highest ``len // 10`` values, integer-sum the rest.

    All arithmetic is int64 (the caller pre-quantizes to cents), so the
    result is ORDER-INDEPENDENT — the one discipline a float UDAF could
    not honor (numpy float sums vary with partition merge order; exact
    ints cannot). Ties at the trim boundary are value-equal by
    definition, so which duplicate gets trimmed cannot change the sum.
    """
    v = np.sort(cents.to_numpy(dtype=np.int64))
    k = len(v) // 10
    kept = v[k : len(v) - k] if len(v) > 2 * k else v[0:0]
    return int(kept.sum(dtype=np.int64))


@pandas_udf(LongType())
def _group_size(cents: pd.Series) -> int:
    """GROUPED_AGG companion: exact group cardinality (Spark forbids
    mixing a GROUPED_AGG pandas UDF with built-in aggregates in one
    ``agg`` — INVALID_PANDAS_UDF_PLACEMENT — so the count rides the
    same AggregateInPandas node as the trimmed sum)."""
    return len(cents)


@register(
    "q20_grouped_agg_pandas",
    oracle="""
    WITH c AS (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        FROM orders
    ),
    r AS (
        SELECT o_orderpriority, cents,
               row_number() OVER (
                   PARTITION BY o_orderpriority ORDER BY cents
               ) AS rn,
               count(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM c
    )
    SELECT
        o_orderpriority,
        CAST(max(n) AS BIGINT) AS n_orders,
        CAST(max(n) - 2 * (max(n) // 10) AS BIGINT) AS n_kept,
        CAST(sum(cents) FILTER (
            WHERE rn > n // 10 AND rn <= n - n // 10
        ) AS BIGINT) AS trimmed_sum_cents,
        CAST(round(sum(cents) FILTER (
                 WHERE rn > n // 10 AND rn <= n - n // 10
             ) * 1.0 / (max(n) - 2 * (max(n) // 10))) AS BIGINT)
            AS trimmed_mean_cents
    FROM r
    GROUP BY o_orderpriority
    """,
    tags=("udf", "Q20", "udaf"),
)
def q20_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: GROUPED_AGG pandas UDF — the vectorized UDAF rung of the
    ladder (scalar -> grouped-map -> UDTF -> arrow-scalar -> mapInArrow
    -> this): a whole group's column arrives as ONE pandas Series and
    returns ONE value, the shape for custom statistics Spark's
    built-ins lack (here a 10%-trimmed sum).

    Exactness: the kernel sees pre-quantized integer cents and sums in
    int64 after an in-group sort — order-independent by construction,
    so the DuckDB window-rank formulation lands on the identical
    BIGINT (a float UDAF could never promise this: numpy's partial
    sums vary with merge order). Boundary ties are value-equal, so
    trim choice cannot move the sum. The derived mean divides two
    exact integers and rounds once on both engines.

    Scale shape: GROUPED_AGG evaluates per-group after ONE hash
    exchange on the group key (`AggregateInPandas` — no
    whole-partition collect); the trim needs the full group in memory,
    which is exactly the UDAF contract (groups are priority classes
    here — five of them; a high-cardinality trim would use the
    q07_winsorized window formulation instead, documented there).
    """
    od = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100.0).cast("long").alias("cents"),
    )
    agg = od.groupBy("o_orderpriority").agg(
        _group_size(F.col("cents")).cast("bigint").alias("n_orders"),
        _trimmed_sum_cents(F.col("cents")).alias("trimmed_sum_cents"),
    )
    n_kept = (F.col("n_orders") - 2 * F.floor(F.col("n_orders") / 10)).cast(
        "bigint"
    )
    return agg.select(
        "o_orderpriority",
        "n_orders",
        n_kept.alias("n_kept"),
        F.col("trimmed_sum_cents").cast("bigint").alias("trimmed_sum_cents"),
        F.round(F.col("trimmed_sum_cents") * 1.0 / n_kept)
        .cast("bigint")
        .alias("trimmed_mean_cents"),
    )
