"""Engine config surface (reference ``utils/constants.py`` analog, R15).

The reference loads a ``.conf`` via ``configparser`` into module-level
constants (``utils/constants.py:4-26``) covering API credentials, file
paths, AWS settings, and ETL tuning (``config/config.conf.example``).
The engine analog is typed, validated, and side-effect-free: a dataclass
loaded on demand, with the same section/key names so a reference user's
existing config file works unchanged.

Notes vs the reference:
- The reference crashes at IMPORT time if any key is missing (bare
  ``parser.get``); here every key has an explicit default and loading is
  lazy — a missing optional section (e.g. ``[aws]`` in the sandbox)
  degrades to None rather than killing the pipeline.
- The reference's example file and its loader disagree on several AWS
  key names (``aws_access_key_id`` in the example vs ``aws_access_key``
  in code — a real bug a user hits on first run); the engine accepts
  BOTH spellings, preferring the documented example's.
- Database settings exist only for Airflow's metadata DB in the
  reference (``airflow.env:3-4``) and have no engine role; they parse
  but are unused.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    """Validated engine settings with reference-compatible defaults."""

    # [etl_settings] — reference batch_size=100 = the R2 prod limit
    batch_size: int = 100
    error_handling: str = "abort"
    log_level: str = "info"
    # [file_paths]
    input_path: str | None = None
    output_path: str | None = None
    # [api_keys] (feed sources.live fetchers; never logged)
    reddit_client_id: str | None = None
    reddit_secret_key: str | None = None
    # [aws] — the s3a:// sink seam (R12); unused in the sandbox
    aws_access_key_id: str | None = None
    aws_secret_access_key: str | None = None
    aws_region: str | None = None
    aws_bucket_name: str | None = None
    # passthrough of any unrecognized keys, so forward-compatible
    extras: dict[str, str] = field(default_factory=dict, hash=False)


_KNOWN = {
    ("etl_settings", "batch_size"),
    ("etl_settings", "error_handling"),
    ("etl_settings", "log_level"),
    ("file_paths", "input_path"),
    ("file_paths", "output_path"),
    ("api_keys", "reddit_client_id"),
    ("api_keys", "reddit_secret_key"),
    ("aws", "aws_access_key_id"),
    ("aws", "aws_access_key"),
    ("aws", "aws_secret_access_key"),
    ("aws", "aws_secret_key"),
    ("aws", "aws_region"),
    ("aws", "aws_bucket_name"),
    ("aws", "s3_bucket_name"),
}


def load_config(path: str) -> EngineConfig:
    """Parse a reference-format ``.conf`` into :class:`EngineConfig`.

    Unknown keys are preserved in ``extras`` (namespaced
    ``section.key``); a nonexistent file yields pure defaults, matching
    ``configparser.read``'s silent-skip contract the reference relies
    on.
    """
    parser = configparser.ConfigParser()
    parser.read(path)

    def get(section: str, *keys: str) -> str | None:
        for key in keys:
            if parser.has_option(section, key):
                return parser.get(section, key)
        return None

    batch_raw = get("etl_settings", "batch_size")
    try:
        batch = int(batch_raw) if batch_raw is not None else 100
    except ValueError as exc:
        raise ValueError(
            f"etl_settings.batch_size must be an integer, got {batch_raw!r}"
        ) from exc
    if batch <= 0:
        raise ValueError("etl_settings.batch_size must be positive")

    extras = {
        f"{section}.{key}": value
        for section in parser.sections()
        for key, value in parser.items(section)
        if (section, key) not in _KNOWN
        and not section == "database"  # parsed-but-unused (see module doc)
    }
    return EngineConfig(
        batch_size=batch,
        error_handling=get("etl_settings", "error_handling") or "abort",
        log_level=get("etl_settings", "log_level") or "info",
        input_path=get("file_paths", "input_path"),
        output_path=get("file_paths", "output_path"),
        reddit_client_id=get("api_keys", "reddit_client_id"),
        reddit_secret_key=get("api_keys", "reddit_secret_key"),
        # both spellings: example file vs reference loader (module doc)
        aws_access_key_id=get("aws", "aws_access_key_id", "aws_access_key"),
        aws_secret_access_key=get(
            "aws", "aws_secret_access_key", "aws_secret_key"
        ),
        aws_region=get("aws", "aws_region"),
        aws_bucket_name=get("aws", "aws_bucket_name", "s3_bucket_name"),
        extras=extras,
    )
