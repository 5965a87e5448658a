"""Object-store (lake) connector analog — reference R12's production path.

The reference's S3 layer (``/root/reference/etls/aws_etl.py:13-57``) is
three operations over an ``s3fs.S3FileSystem``: connect with
credentials, ensure the bucket exists (``exists``/``mkdir``), and put a
local file under the ``raw/`` zone prefix. The sandbox has no network,
so — exactly like the live API source (``sources/live.py``) — the seam
is modeled the way the reference's own tests model PRAW: the filesystem
object is INJECTED, the engine logic (bucket bootstrap, raw-zone path
contract, credential plumbing from the reference-compatible config) is
real and tested with a recording fake.

The Spark data path never goes through this module: DataFrames write to
the lake via Hadoop's ``s3a://`` committers (``tables.py`` docstring —
the path is the only thing that changes at deployment). This connector
exists for the reference's SIDE artifacts — the per-run CSV the R10 sink
produces — preserving its observable layout (``{bucket}/raw/{file}``,
``etls/aws_etl.py:46``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

#: Zone prefix the reference hardcodes (``etls/aws_etl.py:46``).
RAW_PREFIX = "raw"


@dataclass
class LakeConfig:
    """Credential/bucket bundle, loaded from the reference-style config.

    Mirrors the ``[aws]`` section contract ``config.py`` already parses
    (both reference key spellings).
    """

    access_key: str
    secret_key: str
    bucket: str


def connect(
    config: LakeConfig,
    fs_factory: Callable[..., object],
) -> object:
    """Build the filesystem handle — ``connect_to_s3`` parity.

    ``fs_factory`` is ``s3fs.S3FileSystem`` in production; tests inject
    a fake. Credentials pass through with the reference's exact argument
    contract (``anon=False, key=…, secret=…`` — ``aws_etl.py:18-22``).
    """
    return fs_factory(
        anon=False, key=config.access_key, secret=config.secret_key
    )


def ensure_bucket(fs: object, bucket: str) -> bool:
    """Create the bucket iff absent — ``create_bucket_if_not_exists``
    parity. Returns True when it had to create."""
    if not fs.exists(bucket):
        fs.mkdir(bucket)
        return True
    return False


def raw_zone_path(bucket: str, file_name: str) -> str:
    """The reference's raw-zone destination: ``{bucket}/raw/{file}``."""
    return f"{bucket}/{RAW_PREFIX}/{file_name}"


def upload_raw(fs: object, file_path: str, bucket: str, file_name: str) -> str:
    """Put a local artifact into the raw zone — ``upload_to_s3`` parity.

    Missing local files raise ``FileNotFoundError`` with the same
    message contract as the reference (``aws_etl.py:54-55``); other
    filesystem errors propagate unchanged (the reference re-raises too —
    its Airflow task retry policy owns recovery).
    """
    import os

    if not os.path.exists(file_path):
        raise FileNotFoundError(f"The file {file_path} was not found.")
    dest = raw_zone_path(bucket, file_name)
    fs.put(file_path, dest)
    return dest
