"""End-to-end pipeline driver (reference R14: ``reddit_pipeline_logic``).

The reference's user entrypoint composes R1→R13 in one call: pull top-k
posts for a window, transform each, write a header CSV, log the row count
(reference ``etls/reddit_etl.py:87-132``, wrapped by
``pipelines/reddit_pipeline.py:3-6``). This is the engine-native
equivalent with the same parameter shape — the function a reference user
calls after switching:

- source: wire-format dict rows (R1) or any DataFrame with the raw post
  schema;
- optional top-k by score (R2's ``subreddit.top`` contract);
- the exact R4–R9 coercions (``transforms/posts.clean_posts``);
- header CSV sink (R10) via Spark's atomic task-commit (R13 — no
  temp-file dance needed);
- row count via ``observe`` (R11): counted DURING the write, no second
  scan of the data.

Scale notes: the whole pipeline is one linear DataFrame chain — scan →
project/coerce (codegen) → optional TakeOrderedAndProject → write. No
shuffle except the top-k's per-partition heaps; the count rides on the
write job as an executor-side accumulator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .metrics import with_run_metrics
from .operators.sinks import write_csv_header
from .session import ensure_session_confs
from .transforms.posts import clean_posts, iso_utc, posts_from_rows


def run_pipeline(
    spark: SparkSession,
    source: list[dict] | DataFrame,
    output_path: str,
    limit: int | None = None,
) -> int:
    """R1→R13 in one call; returns the written row count (R11).

    ``source`` is either wire-format dict rows (the reference's R1 shape;
    missing keys null-fill under the explicit schema) or a DataFrame
    already carrying the raw schema. ``limit`` caps the output at the
    top-``limit`` posts by score (descending, id tiebreak) — the
    reference's ``limit=100`` production batch (``dags/reddit_dag.py:39``).
    """
    ensure_session_confs(spark)
    raw = (
        posts_from_rows(spark, source)
        if isinstance(source, list)
        else source
    )
    cleaned = clean_posts(raw)
    if limit is not None:
        cleaned = cleaned.orderBy(
            F.col("score").desc(), F.col("id").asc()
        ).limit(limit)
    # The reference renders created_utc as ISO-8601 UTC text in its CSV
    # (transform_post, etls/reddit_etl.py:65-70); match on the wire.
    out = cleaned.withColumn("created_utc", iso_utc(F.col("created_utc")))
    observed, obs = with_run_metrics(out)
    write_csv_header(observed, output_path)
    return int(obs.get["n_rows"])
