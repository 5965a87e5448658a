"""Live external-source analog tests (reference R1 prod path).

Mirrors the reference's mocked-source strategy
(``tests/test_reddit_etl.py:44-90``): a fake fetcher stands in for the
PRAW client, and the tests assert BOTH the produced rows and the
source-call contract (params forwarded to the API — the reference's
``top(time_filter='day', limit=1)`` assertion at ``:89-90``), plus the
retry/backoff policy the reference delegates to Airflow
(``dags/reddit_dag.py:16-17``: 1 retry, 300 s delay).

All clocks are injected — no test sleeps.
"""

from __future__ import annotations

import csv
import pathlib

import pytest

from reddit_data_engineering_project_spark.sources.live import (
    FetchPolicy,
    SourceExhaustedRetries,
    fetch_posts,
    run_live_pipeline,
)
from reddit_data_engineering_project_spark.transforms.posts import POST_FIELDS


class FakeClock:
    """Deterministic monotonic clock + sleep recorder."""

    def __init__(self):
        self.now = 0.0
        self.sleeps: list[float] = []

    def monotonic(self) -> float:
        return self.now

    def sleep(self, seconds: float) -> None:
        self.sleeps.append(round(seconds, 6))
        self.now += seconds


def make_policy(clock: FakeClock, **kw) -> FetchPolicy:
    return FetchPolicy(
        sleep=clock.sleep, monotonic=clock.monotonic, **kw
    )


def wire_row(i: int, score: int) -> dict:
    return {"id": f"p{i}", "title": f"post {i}", "score": str(score)}


def paged_fetcher(total: int, calls: list | None = None, fail_times: int = 0):
    """Fake API: ``total`` rows, honors per-page limit + cursor, can fail
    its first ``fail_times`` calls (transient-error simulation)."""
    failures = {"left": fail_times}

    def fetch_page(subreddit, time_filter, limit, after):
        if calls is not None:
            calls.append(
                {
                    "subreddit": subreddit,
                    "time_filter": time_filter,
                    "limit": limit,
                    "after": after,
                }
            )
        if failures["left"] > 0:
            failures["left"] -= 1
            raise ConnectionError("simulated API failure")
        start = 0 if after is None else int(after)
        rows = [
            wire_row(i, score=1000 - i)
            for i in range(start, min(start + limit, total))
        ]
        nxt = start + len(rows)
        return rows, (nxt if nxt < total else None)

    return fetch_page


def test_source_call_contract_forwards_params():
    """The reference's :89-90 assertion: top-k params reach the API."""
    calls: list[dict] = []
    clock = FakeClock()
    rows = list(
        fetch_posts(
            paged_fetcher(total=1, calls=calls),
            subreddit="dataengineering",
            time_filter="day",
            limit=1,
            policy=make_policy(clock),
        )
    )
    assert [r["id"] for r in rows] == ["p0"]
    assert calls == [
        {
            "subreddit": "dataengineering",
            "time_filter": "day",
            "limit": 1,
            "after": None,
        }
    ]


def test_pagination_respects_page_size_and_cursor():
    calls: list[dict] = []
    clock = FakeClock()
    rows = list(
        fetch_posts(
            paged_fetcher(total=250, calls=calls),
            subreddit="s",
            limit=250,
            policy=make_policy(clock, page_size=100, min_interval_s=1.0),
        )
    )
    assert len(rows) == 250
    assert [c["limit"] for c in calls] == [100, 100, 50]
    assert [c["after"] for c in calls] == [None, 100, 200]
    # politeness: a >=1s gap enforced before pages after the first
    assert len([s for s in clock.sleeps if s > 0]) == 2


def test_retry_then_success_uses_reference_backoff():
    """1 transient failure < retries=1 → recovered, 300 s backoff slept."""
    clock = FakeClock()
    rows = list(
        fetch_posts(
            paged_fetcher(total=3, fail_times=1),
            subreddit="s",
            limit=3,
            policy=make_policy(clock, retries=1, retry_delay_s=300.0),
        )
    )
    assert len(rows) == 3
    assert 300.0 in clock.sleeps


def test_exhausted_retries_raise():
    clock = FakeClock()
    with pytest.raises(SourceExhaustedRetries):
        list(
            fetch_posts(
                paged_fetcher(total=3, fail_times=2),
                subreddit="s",
                limit=3,
                policy=make_policy(clock, retries=1, retry_delay_s=300.0),
            )
        )
    # the one allowed retry did back off before giving up
    assert clock.sleeps.count(300.0) == 1


def test_source_exhausted_before_limit_stops_cleanly():
    clock = FakeClock()
    rows = list(
        fetch_posts(
            paged_fetcher(total=7),
            subreddit="s",
            limit=100,
            policy=make_policy(clock),
        )
    )
    assert len(rows) == 7


def test_run_live_pipeline_end_to_end(spark, tmp_path: pathlib.Path):
    """Live fetch → R4-R9 coercions → header CSV, reference wire shape."""
    clock = FakeClock()
    out = str(tmp_path / "live_csv")
    n = run_live_pipeline(
        spark,
        paged_fetcher(total=30),
        output_path=out,
        subreddit="dataengineering",
        time_filter="day",
        limit=10,
        policy=make_policy(clock, page_size=100),
    )
    assert n == 10
    files = list(pathlib.Path(out).glob("*.csv"))
    assert files
    with open(files[0], newline="") as fh:
        recs = list(csv.DictReader(fh))
    assert len(recs) == 10
    # header order is the reference's POST_FIELDS contract (R10)
    assert list(recs[0].keys()) == POST_FIELDS
    # top-k by score desc: p0 (score 1000) first
    assert recs[0]["id"] == "p0"
    assert recs[0]["score"] == "1000"
    assert recs[0]["author"] == "Unknown"
