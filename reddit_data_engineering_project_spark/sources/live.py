"""Live external-API source analog (reference R1's production path).

The reference's prod source is an authenticated PRAW client whose
``extract_posts(subreddit, time_filter, limit)`` lazily paginates the
Reddit API (``etls/reddit_etl.py:24-58``), with failure handled by the
Airflow task policy of 1 retry / 300 s delay (``dags/reddit_dag.py:
16-17``). The sandbox has no network, so the engine models the seam the
way the reference's own tests do (``tests/test_reddit_etl.py:44-90``):
an injectable fetcher, with the retry/backoff/rate-limit loop as real,
tested engine code.

Design notes for the 100 TB mindset: an external API source is a
DRIVER-side trickle (the reference's prod batch is 100 rows/day) — the
correct Spark shape is fetch-on-driver → ``createDataFrame`` →
distributed pipeline, NOT a distributed fetch (which would hammer the
API from every executor and lose the rate limit). Volume ingest belongs
to the file/stream sources in ``tables.py``/``streaming/``; this module
is deliberately the small-and-polite path.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import run_pipeline
from ..transforms.posts import posts_from_rows

#: One page of wire rows plus the opaque continuation token the API
#: returned (None = no more pages). Matches PRAW's listing pagination
#: (`after` fullname cursor) without depending on it.
Page = tuple[list[dict], object | None]

#: ``fetch_page(subreddit, time_filter, limit, after) -> Page``.
PageFetcher = Callable[[str, str, int, object | None], Page]


class SourceExhaustedRetries(RuntimeError):
    """A page fetch kept failing after the configured retries."""


@dataclass
class FetchPolicy:
    """Retry/rate parameters; defaults mirror the reference DAG.

    ``retries``/``retry_delay_s`` are the reference's task policy
    (1 retry, 300 s — ``dags/reddit_dag.py:16-17``). ``min_interval_s``
    is the politeness gap between page requests (PRAW's own limiter is
    ~1 req/s for authenticated clients). ``page_size`` mirrors the
    reference's 100-row production batch (``dags/reddit_dag.py:39``).
    """

    retries: int = 1
    retry_delay_s: float = 300.0
    min_interval_s: float = 1.0
    page_size: int = 100
    # injectable clocks so tests never actually sleep
    sleep: Callable[[float], None] = field(default=time.sleep, repr=False)
    monotonic: Callable[[], float] = field(
        default=time.monotonic, repr=False
    )


def fetch_posts(
    fetch_page: PageFetcher,
    subreddit: str,
    time_filter: str = "day",
    limit: int = 100,
    policy: FetchPolicy | None = None,
) -> Iterator[dict]:
    """Rate-limited, retrying fetch loop — the R1 prod source contract.

    Yields wire-format dict rows up to ``limit``, pulling pages of
    ``policy.page_size`` and forwarding ``(subreddit, time_filter,
    per-page limit)`` to the fetcher — the call contract the reference
    asserts on ``subreddit.top`` (``tests/test_reddit_etl.py:89-90``).
    Each page is retried ``policy.retries`` times with
    ``policy.retry_delay_s`` backoff; a page that still fails raises
    :class:`SourceExhaustedRetries` (the reference behavior: the Airflow
    task fails after its retry and the run is re-attempted wholesale).
    """
    policy = policy or FetchPolicy()
    fetched = 0
    after: object | None = None
    last_call = float("-inf")
    while fetched < limit:
        want = min(policy.page_size, limit - fetched)
        # politeness gap between page requests
        wait = policy.min_interval_s - (policy.monotonic() - last_call)
        if wait > 0:
            policy.sleep(wait)
        attempt = 0
        while True:
            try:
                last_call = policy.monotonic()
                rows, after = fetch_page(subreddit, time_filter, want, after)
                break
            except Exception as exc:  # noqa: BLE001 — API errors are opaque
                attempt += 1
                if attempt > policy.retries:
                    raise SourceExhaustedRetries(
                        f"page fetch failed after {policy.retries} "
                        f"retr{'y' if policy.retries == 1 else 'ies'}: {exc}"
                    ) from exc
                policy.sleep(policy.retry_delay_s)
        if not rows:
            return  # source exhausted before limit
        for row in rows[:want]:
            yield row
        fetched += min(len(rows), want)
        if after is None:
            return


def ingest_live(
    spark: SparkSession,
    fetch_page: PageFetcher,
    subreddit: str,
    time_filter: str = "day",
    limit: int = 100,
    policy: FetchPolicy | None = None,
) -> DataFrame:
    """Live source → typed dirty-wire DataFrame (R1 prod → R3 schema).

    Driver-side fetch (see module docstring for why), then the same
    ``posts_from_rows`` wire schema every other source uses — from here
    on the pipeline is indistinguishable from the batch path.
    """
    rows = list(
        fetch_posts(fetch_page, subreddit, time_filter, limit, policy)
    )
    return posts_from_rows(spark, rows)


def run_live_pipeline(
    spark: SparkSession,
    fetch_page: PageFetcher,
    output_path: str,
    subreddit: str,
    time_filter: str = "day",
    limit: int = 100,
    policy: FetchPolicy | None = None,
) -> int:
    """The reference's full prod entrypoint: fetch → clean → CSV (R1→R13).

    Mirrors ``reddit_pipeline_logic(file_name, subreddit, time_filter,
    limit)`` (``etls/reddit_etl.py:87-132``): live fetch loop with
    retry/backoff, the R4-R9 coercions, header-CSV sink, row-count
    return (R11).
    """
    raw = ingest_live(
        spark, fetch_page, subreddit, time_filter, limit, policy
    )
    return run_pipeline(spark, raw, output_path, limit=limit)
