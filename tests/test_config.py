"""Config-surface tests (reference utils/constants.py analog)."""

from __future__ import annotations

import pytest

from reddit_data_engineering_project_spark.config import load_config

EXAMPLE = """\
[file_paths]
input_path = /data/input
output_path = /data/output

[api_keys]
reddit_secret_key = sek
reddit_client_id = cid

[aws]
aws_access_key_id = AKIA123
aws_secret_access_key = shh
aws_region = us-east-1
aws_bucket_name = lake

[etl_settings]
batch_size = 100
error_handling = abort
log_level = info

[database]
database_host = localhost
"""


def test_reference_example_schema_parses(tmp_path):
    p = tmp_path / "config.conf"
    p.write_text(EXAMPLE)
    cfg = load_config(str(p))
    assert cfg.batch_size == 100  # the R2 prod limit
    assert cfg.output_path == "/data/output"
    assert cfg.reddit_client_id == "cid"
    assert cfg.aws_access_key_id == "AKIA123"
    assert cfg.aws_bucket_name == "lake"
    assert cfg.extras == {}  # database is parsed-but-unused, not an extra


def test_loader_spelling_variant_accepted(tmp_path):
    """The reference's code reads aws_access_key/s3_bucket_name while its
    example documents aws_access_key_id/aws_bucket_name; accept both."""
    p = tmp_path / "config.conf"
    p.write_text("[aws]\naws_access_key = K\ns3_bucket_name = B\n")
    cfg = load_config(str(p))
    assert cfg.aws_access_key_id == "K"
    assert cfg.aws_bucket_name == "B"


def test_missing_file_yields_defaults(tmp_path):
    cfg = load_config(str(tmp_path / "nope.conf"))
    assert cfg.batch_size == 100
    assert cfg.aws_access_key_id is None


def test_bad_batch_size_fails_loudly(tmp_path):
    p = tmp_path / "config.conf"
    p.write_text("[etl_settings]\nbatch_size = lots\n")
    with pytest.raises(ValueError, match="batch_size"):
        load_config(str(p))
    p.write_text("[etl_settings]\nbatch_size = -5\n")
    with pytest.raises(ValueError, match="positive"):
        load_config(str(p))


def test_unknown_keys_preserved_as_extras(tmp_path):
    p = tmp_path / "config.conf"
    p.write_text("[etl_settings]\nbatch_size = 7\nnew_knob = on\n")
    cfg = load_config(str(p))
    assert cfg.batch_size == 7
    assert cfg.extras == {"etl_settings.new_knob": "on"}
