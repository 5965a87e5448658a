"""Standing degenerate-cardinality gate (r12 verdict item 3).

Round 12 ran the empty / one-row / mixed sweeps BY HAND and pinned the
three crash fixes plus the empty-ROLLUP divergence shape in pytest —
but only for the entries the sweep had already caught. A regression in
any OTHER entry's empty-input path would stay invisible until the next
manual sweep. This tool makes the full sweep a one-command gate:

1. regenerates every degenerate corpus in ``EXPECTED_FAILS`` (the
   authoritative list — forty as of round 17) from the committed
   sf0.001 fixtures via :mod:`degenerate_corpus` (empty, one-row, the
   three mixed corpora with exactly one of events / documents /
   embeddings zeroed, and — round 13 — the two zero-VARIANCE corpora
   (monoculture, flat-time) plus the four NULLITY corpora (all-NULL
   events.value / events.ts / events.user_id / documents.text; the
   value one caught the quality-report NULL-skipping-sum bug and the
   text one caught the payload-pass crashes + the legacy size(NULL)
   sentinel on their first sweeps) and — round 14 — the three
   NULL-JOIN-KEY corpora (all-NULL documents.lang / documents.source /
   orders.o_custkey; the source one caught the curation pipeline's
   concat_ws-on-NULL md5('') divergence on its first sweep) and the
   two NULL-EMBEDDING corpora (all-NULL and half-NULL
   embeddings.embedding; the all-NULL one caught ten oracle crashes +
   one divergence on its first sweep — see operators/similarity.py:
   embedded for the exclusion semantics that fixed the class) plus
   the two swept-clean-on-first-contact NULL-GROUPING-KEY corpora
   (all-NULL embeddings.label / events.event_type) and the all-NULL
   documents.n_chars corpus (caught x04_corpus_profile's n_too_short
   predicate-cast sum — NULL vs the oracle's 0 — on first contact));
2. runs the full-registry ``tools/check_oracle.py`` sweep against each;
3. asserts the FAIL SET of each sweep is EXACTLY the documented one —
   empty = {q09_cube, q09_rollup} (Spark emits zero rows for ROLLUP /
   CUBE over empty input where ANSI/DuckDB emits the grand-total row;
   accepted engine semantics, judge-concurred), one-row = {q09_rollup}
   (the single customer's nationkey misses the single nation, emptying
   the aggregate input), mixed = {} each.

Fail sets, not ok-counts, are compared so registering a new entry
grows the expected ok side automatically without touching this file —
the gate's contract is "nothing NEW breaks on a degenerate corpus and
nothing documented silently heals", not a frozen total.

Wired into the round-end protocol as ``python tools/preflight.py
--degenerate``; also runnable directly:

    python tools/degenerate_gate.py [--src /root/testdata/sf0.001]

Exit 0 only when every sweep matches its documented fail set.

Cost (r13 verdict item 4), two stacked levers, both measured round 14:

1. SHARED SESSION — the original one-subprocess-per-corpus design
   paid JVM startup + codegen warm-up eleven times (~29 min; 91–145 s
   floor each). The default mode runs every sweep IN-PROCESS through
   one SparkSession via ``check_oracle.run_checks`` (same-schema
   corpora, per-query ``clearCache`` isolation, fresh DuckDB
   connection per corpus): measured 22 m 43 s — an honest finding,
   warm-up was only ~25% of the old floor; the remainder is genuine
   208-entry execution per corpus.
2. INPUT-IDENTICAL SKIP — nine of the eleven corpora mutate ONE to
   THREE tables and leave the rest byte-identical to the committed
   sf0.001 baseline, so an entry whose oracle references none of the
   mutated tables provably computes the same result it is already
   green on in the standing full sweeps. Those entries skip
   (``mutated_tables`` in ``run_checks``); ``empty`` / ``one_row``
   mutate everything and always sweep in full. Soundness is enforced
   by ``tools/audit_plans.py``'s UNDECLARED_TABLE_DEP flag (an
   entry's Spark plan may not scan a table its oracle doesn't name;
   verified 0 flagged across all 208 plans before the skip shipped).
   Measured: 8 m 38 s for the eleven pre-r14 corpora — 3.4x under the
   subprocess design — and 11 m 45 s for all NINETEEN round-14 corpora
   (single-table sweeps run 7–47 s: 70 entries touch events, 63
   documents, 22 orders, 16 embeddings), so the gate now sweeps EIGHT
   more hostile classes than the r13 design in well under half its
   wall time. Fail-set contract unchanged. ``--no-skip`` restores
   exhaustive sweeps.

``--isolate`` restores the per-corpus subprocess mode for debugging a
sweep that corrupts session state; that path cross-checks the child's
exit code against its parsed fail count so a sweep that printed a
summary and then died is never trusted.
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REPO)  # package + __spark_entry__ for in-process mode

# corpus label -> expected fail set (built in main; labels map to
# degenerate_corpus writers). Round 13 added monoculture (zero
# dispersion on text / value / embedding), flat_time (all non-NULL ts
# one instant — every ts-ordered window ties at once), and the two
# nullity corpora (all-NULL events.value / ts / user_id and
# documents.text — the value one caught the quality-report
# NULL-skipping-sum bug and the text one a 6-entry crash/divergence
# batch before joining); all swept clean post-fix, kept so by the gate.
EXPECTED_FAILS: dict[str, frozenset[str]] = {
    "empty": frozenset({"q09_cube", "q09_rollup"}),
    "one_row": frozenset({"q09_rollup"}),
    "mixed_events_empty": frozenset(),
    "mixed_documents_empty": frozenset(),
    "mixed_embeddings_empty": frozenset(),
    "monoculture": frozenset(),
    "flat_time": frozenset(),
    "null_value": frozenset(),
    "null_ts": frozenset(),
    "null_user_id": frozenset(),
    "null_text": frozenset(),
    # round 14: NULL JOIN/GROUPING KEYS on the dimension side (r13
    # verdict item 5) — documents.lang and documents.source (the x04
    # grouping/stratification keys) and orders.o_custkey (the star
    # join's fact-side key). The source corpus caught
    # pipeline_curation_full's concat_ws-on-NULL-array md5('') vs the
    # oracle's NULL on its first sweep (fixed: first_chunk_md5 now
    # NULL-propagates); all three sweep clean post-fix.
    "null_lang": frozenset(),
    "null_source": frozenset(),
    "null_custkey": frozenset(),
    # round 14 (second wave): NULL embeddings — contract-legal ("a
    # document not yet embedded", FINITE_ARRAYS in tables.py) yet the
    # vector surfaces had never defined behavior. The all-NULL corpus
    # crashed TEN oracles (DuckDB 1.0.0 list_inner_product /
    # list_cosine_similarity raise "argument can not contain NULL
    # values" when a COLUMN batch holds NULL rows; a constant NULL
    # folds to NULL — mechanism re-verified r15, see
    # operators/similarity.py:embedded) and diverged an eleventh
    # (Spark 0 centroid groups vs the
    # oracle's NULL centroids); fixed by the exclusion semantics —
    # un-embedded rows prune before any vector op (operators/
    # similarity.py:embedded), oracles mirror WHERE embedding IS NOT
    # NULL. The half-NULL corpus exercises the exclusion on
    # non-degenerate outputs (present rows must behave exactly as if
    # the NULL rows never existed).
    "null_embedding": frozenset(),
    "null_embedding_half": frozenset(),
    # round 14 (third wave, swept clean on first contact — recorded as
    # such): all-NULL embeddings.label (kNN vote / centroid grouping
    # over a NULL class key) and all-NULL events.event_type (the
    # funnel/transition/typed-filter grouping key). NULL grouping keys
    # form one group on both engines and typed filters drop them
    # identically — the disciplines the earlier nullity waves forced
    # are already load-bearing here.
    "null_label": frozenset(),
    "null_event_type": frozenset(),
    # round 14 (fourth wave): all-NULL documents.n_chars — the metadata
    # stat column. Caught x04_corpus_profile's n_too_short predicate-
    # cast sum on first contact (NULL counter vs the oracle's 0 — the
    # same NULL-skipping-sum class the r13 value corpus caught in
    # x04_data_quality_report, proving the class needed an engine-wide
    # scan: a targeted grep found exactly this one other instance,
    # fixed to when/otherwise(0)). Sweeps clean post-fix.
    "null_nchars": frozenset(),
    # round 15 (fifth wave, swept clean on first contact — recorded as
    # such): all-NULL orders.o_orderdate (the date spine the
    # survival/LTV/RFM/OLS family anchors on — NULL-date phantom
    # points are exactly the class the r13 calendar-edge wave caught
    # in q21_spend_trend_ols) and all-NULL lineitem.l_partkey (the
    # co-purchase/graph family's edge key — NULL edge endpoints must
    # drop identically from inner joins and self-joins on both
    # engines). 22 affected entries each; the NULL-grouping-key and
    # NULL-join-key disciplines the r13/r14 waves forced are already
    # load-bearing on the date spine and edge keys.
    "null_orderdate": frozenset(),
    "null_partkey": frozenset(),
    # round 15 (sixth wave, also clean on first contact): all-NULL
    # lineitem.l_orderkey — the OTHER graph edge key the r14 verdict
    # named (co-purchase pairs join lineitem to itself on l_orderkey;
    # NULL join keys must never self-match, and the q07/q10 fact-side
    # aggregates must group them as one key on both engines).
    "null_orderkey": frozenset(),
    # round 15 (seventh wave — NEGATED KEYS, the floored-vs-truncated
    # modulo/division axis): every key is contract-legal when negated
    # (PKs declare only non-null + unique), yet no committed corpus has
    # a negative id. The neg_event_id corpus caught a REAL x00
    # divergence on first sweep — two stacked planted-geometry bugs:
    # Spark's _case_over_bucket falls through to the LAST arm for
    # out-of-range buckets while the SQL CASE (no ELSE) yields NULL,
    # and Spark DIV + DuckDB // BOTH truncate toward zero but the
    # session comb's math assumed floor. Fixed by making every
    # key-derived bucket FLOORED on both sides (F.pmod / the
    # ((x % m) + m) % m and (x - floored_mod) // m spellings) — the
    # planted classes are now total over the whole int64 key domain.
    # neg_doc_id swept clean on first contact (the x04/x05 planting
    # arithmetic already used floored-mod spellings throughout).
    "neg_doc_id": frozenset(),
    "neg_event_id": frozenset(),
    # neg_custkey swept clean on first contact (36 s; the star join's
    # dimension-side key — negated keys just stop matching orders'
    # positive o_custkey, identically on both engines). neg_vec_id
    # also swept 16/16 CLEAN but is deliberately NOT in the standing
    # gate: negating vec_id turns the similarity family's absolute
    # "vec_id < 32" query-selection convention into an all-queries
    # workload (500 query vectors instead of 5; ~18 min for the x03
    # family alone — a measured fixture-convention cost cliff, not an
    # engine defect). Recorded in SURVEY round-15; re-sweep by hand if
    # the query-selection convention ever changes.
    "neg_custkey": frozenset(),
    # round 15 (eighth wave — KEY MAGNITUDE at the envelope edge):
    # doc_id shifted to ~2^57, just under the documented |doc_id| <
    # 2^58 bound of the x05 pixel-planting math and far above the
    # 2^53 double-precision cliff where any cast-to-double key
    # arithmetic silently diverges. Swept 64/64 clean on first
    # contact — the floored-mod + exact-integer disciplines hold at
    # the edge (sampling/hashing/planting all stay integer-typed).
    "huge_doc_id": frozenset(),
    # round 15 (ninth wave — ALL-EMPTY-STRING text, the present-but-
    # zero-token sibling of null_text): swept 64/64 clean on first
    # contact. Distinct from monoculture (same NON-empty text): empty
    # token/shingle sets drive the near-dup families to the full
    # all-pairs output (C(500,2) = 124,750 pairs at sf0.001 — both
    # engines agree on the empty-matches-empty convention) and every
    # token-derived op to its zero edge (TF-IDF/BM25/BPE empty,
    # entropy/length stats 0).
    "empty_text": frozenset(),
    # round 16 (tenth wave — UNICODE-HOSTILE text): eight shapes cover
    # astral codepoints, ZWJ clusters, NFD combining marks, bidi runs,
    # locale case traps, zero-width/NBSP separators, space-free CJK and
    # math alphanumerics. Caught TWO real divergences on first sweep:
    # x01_dedup_canonicalized (lower() before the ASCII strip — Java
    # expands U+0130 to "i"+U+0307 where DuckDB's utf8proc maps 1:1;
    # fixed by stripping to ASCII BEFORE case-folding, plus the same
    # class fix in x04_readability's vowel runs) and
    # x05_binary_features (the oracle's header was the first four
    # CHARS via substr(text,1,4) while Spark hexes the first four
    # BYTES — fixed to slice hex(encode(text))). Sweeps clean
    # post-fix.
    "unicode_text": frozenset(),
    # round 16 (eleventh wave, swept clean on first contact): ALL-
    # WHITESPACE text — present, n_chars > 0, zero tokens: the third
    # corner of the degenerate-text triangle after all-NULL (r13) and
    # all-empty-string (r15), forcing apart "has characters" and "has
    # content" in every quality gate and per-token normalizer.
    "whitespace_text": frozenset(),
    # round 16 (twelfth wave, swept clean on first contact): every
    # lineitem row DUPLICATED (x2) — contract-legal (lineitem declares
    # no primary key; full-row duplicates are data there). Bag
    # semantics become load-bearing: self-join pair counts, weighted
    # aggregates, and any DISTINCT the graph/star plans rely on must
    # agree across engines at multiplicity 2 everywhere.
    "dup_lineitem": frozenset(),
    # round 16 (thirteenth wave, swept clean on first contact): every
    # events.user_id the SAME value — TOTAL key skew: one group holds
    # the corpus, every per-user window spans everything, every
    # sessionizer folds one stream. The shape the salting/AQE levers
    # exist for; correctness must hold regardless.
    "one_user": frozenset(),
    # round 16 (fourteenth wave, swept clean on first contact): every
    # events.value EXACTLY on the declared ±1e3 ingest boundary
    # (alternating sign by floored event_id % 2) — every quantized
    # operator computes AT its documented exactness edge.
    "value_edge": frozenset(),
    # round 16 (fifteenth wave — CALENDAR ENVELOPE EDGE): all ts
    # shifted so the corpus max lands at 2999-12-24, the far edge of
    # the declared TIME_DOMAIN. Caught the PANDAS NS CLIFF on first
    # sweep: Spark's Arrow->pandas conversion hard-casts timestamp[us]
    # to timestamp[ns] (overflow past 2262-04-11), crashing all three
    # stateful replay entries (s08, s09 x2) on contract-legal data.
    # Fixed by the r16 µs-boundary rework: event time crosses every
    # pandas boundary as exact epoch-µs longs (streaming/stateful.py:
    # ts_us_expr; NULL as the NAT_US sentinel), timestamps re-cast
    # relationally after; the live event-time-timeout streams keep a
    # ns-safe CLAMPED watermark column (identity inside the ns range,
    # saturating past it — see _WM_CEILING_US). Sweeps clean post-fix.
    "ts_edge": frozenset(),
    # round 16 (sixteenth wave — HOSTILE JSON in events.props): ten
    # shapes covering numbers beyond int64/double,
    # deep nesting, top-level non-objects, escapes, explicit nulls,
    # the valid/invalid boundary. Caught TWO oracle crashes on first
    # sweep (pipeline_clean_coerce + q17_map_funcs: plain
    # CAST(huge double AS BIGINT) raises in DuckDB where Spark's
    # non-ANSI string->long cast yields NULL — fixed to TRY_CAST,
    # baseline hashes unchanged). Sweeps clean post-fix.
    "hostile_props": frozenset(),
    # round 16 (seventeenth wave — DUPLICATE JSON KEYS, its own corpus
    # because the divergence is DOCUMENTED, not a defect): RFC 8259
    # leaves duplicate member names undefined and the engines part
    # ways for real — Jackson (Spark from_json struct /
    # get_json_object) keeps the LAST occurrence, yyjson (DuckDB
    # json_extract) the FIRST, and Spark's VARIANT parse rejects the
    # object (NULL through try_variant_get). Equal-value duplicates
    # agree everywhere (pinned by the corpus's second shape); the
    # observable divergence is exactly these two entries, accepted
    # and gate-pinned like the q09 empty-ROLLUP class. Notably
    # from_json to MAP agrees with DuckDB (first wins) — pinned by
    # q17_map_funcs NOT being in this fail set.
    "dup_key_props": frozenset({"q17_json_funcs", "q17_variant_shred"}),
    # round 16 (eighteenth wave — EMBEDDING-COMPONENT MAGNITUDE): the
    # wave that forced tables.ARRAY_DOMAINS. FINITE_ARRAYS alone
    # admitted 1e30-scale components, where the e6-quantized vector
    # oracles overflow INT64 LOUDLY (DuckDB raises) and Spark's
    # non-ANSI double->long cast wraps SILENTLY — the exact
    # silent-divergence class the events.value domain fences off for
    # scalars. Components are now contract-fenced to ±100 (the k-means
    # distance-sum int64 bound, derivation at the declaration); this
    # corpus sweeps the legal edge region (×100 of baseline, |x| <=
    # ~49) clean, and check_ingest_contracts rejects anything beyond
    # as an ingest bug (pytest pins both sides).
    "emb_edge": frozenset(),
    # round 16 (nineteenth wave, swept clean on first contact):
    # events.user_id shifted to ~2^57 — the key-magnitude axis (r15's
    # huge_doc_id) applied to the session/window/sampling key: md5
    # string-cast sampling, xxhash64 bucketing, and the stateful
    # folds' pandas Int64 round-trips must all stay integer-exact
    # above the 2^53 double cliff.
    "huge_user_id": frozenset(),
    # round 16 (twentieth wave, swept clean on first contact): every
    # documents.lang an UNKNOWN code (off-set codes, BCP-47 subtags,
    # empty string, case-flipped 'EN', 'und') — every lang IN (...)
    # filter and en-only payload slice empties identically on both
    # engines, stratifiers treat unknown codes as opaque keys,
    # case-sensitive membership misses 'EN'.
    "unknown_lang": frozenset(),
    # round 17 (COMPOSED AXES, r16 verdict item 3 — both swept 209/209
    # clean on first contact): every prior corpus mutates ONE axis, yet
    # the r14 concat_ws and r16 strip-then-lower bugs both lived where
    # digest/canonicalization meets a NULL grouping key.
    # unicode_null_source = unicode-hostile documents.text × all-NULL
    # documents.source (canonicalization × NULL-key junction);
    # hostile_props_null_user = hostile-JSON events.props × all-NULL
    # events.user_id (extraction lenses × NULL-key grouping). Built by
    # SEQUENCING the single-axis writers (degenerate_corpus.COMPOSED),
    # so any failure here is an interaction bug by construction.
    "unicode_null_source": frozenset(),
    "hostile_props_null_user": frozenset(),
}

# corpus label -> the tables its writer mutates relative to the
# committed baseline; None = "everything differs" (no skip possible).
# Drives the input-identical skip in check_oracle.run_checks — keep in
# lockstep with the write_* calls in main() (a label here that under-
# states its writer's mutations would skip entries the corpus CAN
# affect, which is exactly the bug class the audit_plans
# UNDECLARED_TABLE_DEP flag exists to prevent on the oracle side).
MUTATED_TABLES: dict[str, frozenset[str] | None] = {
    "empty": None,
    "one_row": None,
    "mixed_events_empty": frozenset({"events"}),
    "mixed_documents_empty": frozenset({"documents"}),
    "mixed_embeddings_empty": frozenset({"embeddings"}),
    "monoculture": frozenset({"documents", "events", "embeddings"}),
    "flat_time": frozenset({"events"}),
    "null_value": frozenset({"events"}),
    "null_ts": frozenset({"events"}),
    "null_user_id": frozenset({"events"}),
    "null_text": frozenset({"documents"}),
    "null_lang": frozenset({"documents"}),
    "null_source": frozenset({"documents"}),
    "null_custkey": frozenset({"orders"}),
    "null_embedding": frozenset({"embeddings"}),
    "null_embedding_half": frozenset({"embeddings"}),
    "null_label": frozenset({"embeddings"}),
    "null_event_type": frozenset({"events"}),
    "null_nchars": frozenset({"documents"}),
    "null_orderdate": frozenset({"orders"}),
    "null_partkey": frozenset({"lineitem"}),
    "null_orderkey": frozenset({"lineitem"}),
    "neg_doc_id": frozenset({"documents"}),
    "neg_event_id": frozenset({"events"}),
    "neg_custkey": frozenset({"customer"}),
    "huge_doc_id": frozenset({"documents"}),
    "empty_text": frozenset({"documents"}),
    "unicode_text": frozenset({"documents"}),
    "whitespace_text": frozenset({"documents"}),
    "dup_lineitem": frozenset({"lineitem"}),
    "one_user": frozenset({"events"}),
    "value_edge": frozenset({"events"}),
    "ts_edge": frozenset({"events"}),
    "hostile_props": frozenset({"events"}),
    "dup_key_props": frozenset({"events"}),
    "emb_edge": frozenset({"embeddings"}),
    "huge_user_id": frozenset({"events"}),
    "unknown_lang": frozenset({"documents"}),
    "unicode_null_source": frozenset({"documents"}),
    "hostile_props_null_user": frozenset({"events"}),
}

_SUMMARY = re.compile(
    r"^(\d+) ok, (\d+) fail, (\d+) rows-only(?:; failing: (.*))?$"
)


def verify_mutations(src: str, dirs: dict[str, str]) -> None:
    """Gate-time audit of the MUTATED_TABLES lockstep (r14 ADVICE,
    medium): the input-identical skip is sound only if each generated
    corpus differs from the baseline in EXACTLY its declared tables.
    The declaration lives here while the writers live in
    degenerate_corpus.main() — two files, nineteen+ entries, no
    compiler between them — so the gate re-derives the truth from the
    bytes: for every corpus, every UNDECLARED table must be
    content-equal to the baseline (under-declaration would silently
    skip entries the corpus can affect — the dangerous direction), and
    every DECLARED table must actually differ (over-declaration means
    the map drifted from the writers and deserves a loud failure too).
    Content equality, not file bytes: writers re-encode parquet, so
    byte-compare would false-alarm on metadata."""
    import pyarrow.parquet as pq

    from degenerate_corpus import TABLES

    if set(dirs) != set(MUTATED_TABLES):
        raise RuntimeError(
            "MUTATED_TABLES / corpus-label drift: "
            f"{sorted(set(dirs) ^ set(MUTATED_TABLES))}"
        )
    baseline = {
        name: pq.read_table(os.path.join(src, f"{name}.parquet"))
        for name in TABLES
    }
    problems: list[str] = []
    for label, out_dir in dirs.items():
        declared = MUTATED_TABLES[label]
        if declared is None:  # "everything differs" — no skip, no audit
            continue
        for name in TABLES:
            t = pq.read_table(os.path.join(out_dir, f"{name}.parquet"))
            same = t.equals(baseline[name])
            if name in declared and same:
                problems.append(
                    f"{label}: declared-mutated table {name!r} is "
                    f"content-identical to the baseline (stale map?)"
                )
            elif name not in declared and not same:
                problems.append(
                    f"{label}: UNDECLARED mutation of table {name!r} — "
                    f"the input-identical skip would wrongly skip "
                    f"entries this corpus can affect"
                )
    if problems:
        raise RuntimeError(
            "MUTATED_TABLES audit failed:\n  " + "\n  ".join(problems)
        )


def run_sweep(sf_dir: str) -> tuple[int, int, int, frozenset[str], str]:
    """One full-registry check_oracle sweep; returns (ok, fail,
    rows_only, fail_set, raw_tail)."""
    out = subprocess.run(
        [sys.executable, "tools/check_oracle.py", "--sf", sf_dir],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(out.stdout.strip().splitlines()[-3:])
    for line in reversed(out.stdout.strip().splitlines()):
        m = _SUMMARY.match(line.strip())
        if m:
            fails = frozenset(
                f.strip() for f in (m.group(4) or "").split(",") if f.strip()
            )
            n_fail = int(m.group(2))
            # the summary line is necessary but not sufficient: a sweep
            # that printed it and then died (spark.stop() failure, a
            # fail-count/exit disagreement) must not be trusted —
            # check_oracle's contract is exit 1 iff fail > 0 (r13
            # ADVICE finding)
            expected_rc = 1 if n_fail else 0
            if out.returncode != expected_rc:
                raise RuntimeError(
                    f"check_oracle summary/exit disagreement for "
                    f"{sf_dir}: summary says {n_fail} fail but exit "
                    f"code is {out.returncode} (expected {expected_rc});"
                    f" tail:\n{tail}\nstderr tail:\n"
                    f"{chr(10).join(out.stderr.splitlines()[-5:])}"
                )
            return int(m.group(1)), n_fail, int(m.group(3)), fails, tail
    raise RuntimeError(
        f"check_oracle printed no summary for {sf_dir}; tail:\n{tail}\n"
        f"stderr tail:\n{chr(10).join(out.stderr.splitlines()[-5:])}"
    )


def run_sweep_inproc(
    spark, sf_dir: str, mutated: frozenset[str] | None = None
) -> tuple[int, int, int, frozenset[str], str]:
    """One full-registry sweep through the SHARED SparkSession — the
    consolidated default (the JVM/codegen warm-up is paid once for the
    whole gate instead of per corpus). Per-entry output is buffered;
    the FAIL lines are kept in the returned tail so an unexpected
    fail-set still comes with its diagnostics."""
    import contextlib
    import io

    import check_oracle as co

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ok, fail, rows_only, failing = co.run_checks(
            spark, sf_dir, mutated_tables=set(mutated) if mutated else None
        )
    lines = buf.getvalue().strip().splitlines()
    kept = [l for l in lines if l.startswith("FAIL")][-10:] + lines[-2:]
    return ok, fail, rows_only, frozenset(failing), "\n".join(kept)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--keep",
        action="store_true",
        help="keep the generated corpora dir (printed) for debugging",
    )
    ap.add_argument(
        "--no-skip",
        action="store_true",
        help=(
            "sweep every entry on every corpus (disable the "
            "input-identical skip) — the pre-r14 exhaustive mode"
        ),
    )
    ap.add_argument(
        "--isolate",
        action="store_true",
        help=(
            "run each sweep in its own subprocess (the pre-r14 mode) — "
            "slower, but isolates a sweep that corrupts session state"
        ),
    )
    args = ap.parse_args()

    import degenerate_corpus as deg

    base = tempfile.mkdtemp(prefix="deggate_")
    dirs = {label: os.path.join(base, label) for label in EXPECTED_FAILS}
    deg.write_slices(args.src, dirs["empty"], dirs["one_row"])
    for table in ("events", "documents", "embeddings"):
        deg.write_mixed(args.src, dirs[f"mixed_{table}_empty"], table)
    deg.write_monoculture(args.src, dirs["monoculture"])
    deg.write_flat_time(args.src, dirs["flat_time"])
    deg.write_null_column(args.src, dirs["null_value"], "value")
    deg.write_null_column(args.src, dirs["null_ts"], "ts")
    deg.write_null_column(args.src, dirs["null_user_id"], "user_id")
    deg.write_null_column(args.src, dirs["null_text"], "text", "documents")
    deg.write_null_column(args.src, dirs["null_lang"], "lang", "documents")
    deg.write_null_column(
        args.src, dirs["null_source"], "source", "documents"
    )
    deg.write_null_column(
        args.src, dirs["null_custkey"], "o_custkey", "orders"
    )
    deg.write_null_column(
        args.src, dirs["null_embedding"], "embedding", "embeddings"
    )
    deg.write_partial_null(
        args.src,
        dirs["null_embedding_half"],
        "embedding",
        "embeddings",
        "vec_id",
        2,
    )
    deg.write_null_column(args.src, dirs["null_label"], "label", "embeddings")
    deg.write_null_column(
        args.src, dirs["null_event_type"], "event_type", "events"
    )
    deg.write_null_column(
        args.src, dirs["null_nchars"], "n_chars", "documents"
    )
    deg.write_null_column(
        args.src, dirs["null_orderdate"], "o_orderdate", "orders"
    )
    deg.write_null_column(
        args.src, dirs["null_partkey"], "l_partkey", "lineitem"
    )
    deg.write_null_column(
        args.src, dirs["null_orderkey"], "l_orderkey", "lineitem"
    )
    deg.write_negate_column(
        args.src, dirs["neg_doc_id"], "doc_id", "documents"
    )
    deg.write_negate_column(
        args.src, dirs["neg_event_id"], "event_id", "events"
    )
    deg.write_negate_column(
        args.src, dirs["neg_custkey"], "c_custkey", "customer"
    )
    deg.write_offset_column(
        args.src, dirs["huge_doc_id"], "doc_id", "documents",
        (1 << 57) - (1 << 20),
    )
    deg.write_empty_text(args.src, dirs["empty_text"])
    deg.write_unicode_text(args.src, dirs["unicode_text"])
    deg.write_whitespace_text(args.src, dirs["whitespace_text"])
    deg.write_duplicate_rows(
        args.src, dirs["dup_lineitem"], "lineitem", 2
    )
    deg.write_const_column(args.src, dirs["one_user"], "user_id", "events", 0)
    deg.write_value_edge(args.src, dirs["value_edge"])
    deg.write_ts_edge(args.src, dirs["ts_edge"])
    deg.write_hostile_props(args.src, dirs["hostile_props"])
    deg.write_dup_key_props(args.src, dirs["dup_key_props"])
    deg.write_scaled_embeddings(args.src, dirs["emb_edge"])
    deg.write_offset_column(
        args.src, dirs["huge_user_id"], "user_id", "events",
        (1 << 57) - (1 << 20),
    )
    deg.write_unknown_lang(args.src, dirs["unknown_lang"])
    for label in deg.COMPOSED:
        deg.write_composed(args.src, dirs[label], label)

    t0 = time.time()
    verify_mutations(args.src, dirs)
    print(f"MUTATED_TABLES audit: OK [{time.time()-t0:.0f}s]")

    shared_spark = None
    if not args.isolate:
        from reddit_data_engineering_project_spark.session import get_spark

        shared_spark = get_spark(app_name="degenerate_gate")

    failures: list[str] = []
    try:
        for label, sf_dir in dirs.items():
            t0 = time.time()
            if shared_spark is not None:
                mutated = (
                    None if args.no_skip else MUTATED_TABLES[label]
                )
                ok, fail, rows_only, fail_set, tail = run_sweep_inproc(
                    shared_spark, sf_dir, mutated
                )
            else:
                ok, fail, rows_only, fail_set, tail = run_sweep(sf_dir)
            expected = EXPECTED_FAILS[label]
            verdict = "PASS" if fail_set == expected and rows_only == 0 else "FAIL"
            print(
                f"{verdict}  {label}: {ok} ok / {fail} fail / "
                f"{rows_only} rows-only [{time.time()-t0:.0f}s]"
            )
            if fail_set != expected:
                unexpected = sorted(fail_set - expected)
                healed = sorted(expected - fail_set)
                if unexpected:
                    print(f"      unexpected failures: {unexpected}")
                    print("      " + tail.replace("\n", "\n      "))
                if healed:
                    print(
                        f"      documented divergence silently healed "
                        f"(re-document before blessing): {healed}"
                    )
                failures.append(label)
            elif rows_only:
                print("      rows-only entries appeared in a degenerate sweep")
                failures.append(label)
    finally:
        if shared_spark is not None:
            shared_spark.stop()
        if args.keep:
            print(f"corpora kept at {base}")
        else:
            shutil.rmtree(base, ignore_errors=True)

    if failures:
        print(f"\nDEGENERATE GATE FAIL: {failures}")
        return 1
    print("\nDEGENERATE GATE PASS: all sweeps match the documented state")
    return 0


if __name__ == "__main__":
    sys.exit(main())
