"""Round-15 pins: the corrupt-payload quarantine posture + the
gate's MUTATED_TABLES audit.

The driver-graded surface is ``x05_decode_errors`` (oracle-checked at
sf0.001/sf0.01 and swept by the standing degenerate gate); these tests
pin the pieces a hash can't localize — the total classifier's per-mode
err_kind mapping, and the two failure directions of the gate-time
mutation audit (r14 ADVICE, medium).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from reddit_data_engineering_project_spark.operators.multimodal import (
    _planted_pixels,
    classify_media,
    encode_bmp,
    encode_ppm,
)


@pytest.mark.parametrize(
    "encode,media_type",
    [(encode_bmp, "image/bmp"), (encode_ppm, "image/x-portable-pixmap")],
    ids=["bmp", "ppm"],
)
class TestClassifyMedia:
    def test_intact_decodes_ok(self, encode, media_type):
        px = _planted_pixels(7)
        img, status, err = classify_media(encode(px), media_type)
        assert (status, err) == ("ok", None)
        assert (img == px).all()

    def test_short_header_quarantines(self, encode, media_type):
        payload = encode(_planted_pixels(7))[:12]
        img, status, err = classify_media(payload, media_type)
        assert (img, status, err) == (None, "quarantined", "value_error")

    def test_bad_magic_quarantines(self, encode, media_type):
        payload = encode(_planted_pixels(7))
        payload = bytes((payload[0] ^ 0xFF, payload[1] ^ 0xFF)) + payload[2:]
        img, status, err = classify_media(payload, media_type)
        assert (img, status, err) == (None, "quarantined", "value_error")

    def test_torn_raster_quarantines(self, encode, media_type):
        payload = encode(_planted_pixels(7))[:-7]
        img, status, err = classify_media(payload, media_type)
        assert (img, status, err) == (None, "quarantined", "value_error")

    def test_undeclared_codec_quarantines(self, encode, media_type):
        payload = encode(_planted_pixels(7))
        img, status, err = classify_media(payload, "image/png")
        assert (img, status, err) == (None, "quarantined", "unsupported")

    def test_garbage_bytes_never_raise(self, encode, media_type):
        for junk in (b"", b"\x00", b"PNG\r\n" * 40, bytes(range(256))):
            img, status, err = classify_media(junk, media_type)
            assert status == "quarantined" and img is None
            assert err == "value_error"


def test_mutation_audit_catches_both_directions(tmp_path, monkeypatch):
    """verify_mutations: under-declaration (skip-soundness hole) and
    over-declaration (stale map) both raise; a faithful corpus passes."""
    import pyarrow.parquet as pq

    import degenerate_corpus as deg
    import degenerate_gate as gate

    src = "/root/testdata/sf0.001"
    good = str(tmp_path / "null_value")
    deg.write_null_column(src, good, "value")
    monkeypatch.setattr(
        gate, "MUTATED_TABLES", {"null_value": frozenset({"events"})}
    )
    dirs = {"null_value": good}
    gate.verify_mutations(src, dirs)  # faithful: no raise

    # under-declaration: mutate a table the map does not declare
    nation = os.path.join(good, "nation.parquet")
    pq.write_table(pq.read_table(nation).slice(0, 3), nation)
    with pytest.raises(RuntimeError, match="UNDECLARED mutation.*nation"):
        gate.verify_mutations(src, dirs)
    pq.write_table(
        pq.read_table(os.path.join(src, "nation.parquet")), nation
    )

    # over-declaration: declared table is byte-faithful to the baseline
    events = os.path.join(good, "events.parquet")
    pq.write_table(
        pq.read_table(os.path.join(src, "events.parquet")), events
    )
    with pytest.raises(RuntimeError, match="content-identical"):
        gate.verify_mutations(src, dirs)


def test_mutation_audit_rejects_label_drift(monkeypatch):
    import degenerate_gate as gate

    with pytest.raises(RuntimeError, match="drift"):
        gate.verify_mutations("/root/testdata/sf0.001", {"bogus": "/tmp/x"})
