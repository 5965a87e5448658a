"""Lake-connector analog tests (reference R12, ``etls/aws_etl.py``).

Mirrors the reference's mocked-external-service strategy: a recording
fake stands in for ``s3fs.S3FileSystem`` and the tests assert both the
produced state and the call contract (credential kwargs, bucket
bootstrap, the ``{bucket}/raw/{file}`` destination layout at
``aws_etl.py:46``).
"""

from __future__ import annotations

import pytest

from reddit_data_engineering_project_spark.sources.lake import (
    LakeConfig,
    connect,
    ensure_bucket,
    raw_zone_path,
    upload_raw,
)


class FakeFS:
    def __init__(self):
        self.dirs: set[str] = set()
        self.puts: list[tuple[str, str]] = []

    def exists(self, path: str) -> bool:
        return path in self.dirs

    def mkdir(self, path: str) -> None:
        self.dirs.add(path)

    def put(self, src: str, dest: str) -> None:
        self.puts.append((src, dest))


CFG = LakeConfig(access_key="AK", secret_key="SK", bucket="reddit-lake")


def test_connect_forwards_credential_contract():
    calls = []

    def factory(**kw):
        calls.append(kw)
        return FakeFS()

    connect(CFG, factory)
    # The reference's exact S3FileSystem argument contract
    # (aws_etl.py:18-22).
    assert calls == [{"anon": False, "key": "AK", "secret": "SK"}]


def test_ensure_bucket_creates_once():
    fs = FakeFS()
    assert ensure_bucket(fs, CFG.bucket) is True
    assert CFG.bucket in fs.dirs
    assert ensure_bucket(fs, CFG.bucket) is False  # idempotent


def test_upload_lands_in_raw_zone(tmp_path):
    local = tmp_path / "reddit_20240309.csv"
    local.write_text("id,title\n1,post\n")
    fs = FakeFS()
    dest = upload_raw(fs, str(local), CFG.bucket, "reddit_20240309.csv")
    assert dest == "reddit-lake/raw/reddit_20240309.csv"
    assert fs.puts == [(str(local), dest)]
    assert raw_zone_path(CFG.bucket, "x.csv") == "reddit-lake/raw/x.csv"


def test_missing_local_file_raises_reference_message(tmp_path):
    fs = FakeFS()
    missing = str(tmp_path / "nope.csv")
    with pytest.raises(FileNotFoundError, match="was not found"):
        upload_raw(fs, missing, CFG.bucket, "nope.csv")
    assert fs.puts == []
