"""Standing degenerate-cardinality gate (r12 verdict item 3).

Round 12 ran the empty / one-row / mixed sweeps BY HAND and pinned the
three crash fixes plus the empty-ROLLUP divergence shape in pytest —
but only for the entries the sweep had already caught. A regression in
any OTHER entry's empty-input path would stay invisible until the next
manual sweep. This tool makes the full sweep a one-command gate:

1. regenerates the ELEVEN degenerate corpora from the committed
   sf0.001 fixtures via :mod:`degenerate_corpus` (empty, one-row, the
   three mixed corpora with exactly one of events / documents /
   embeddings zeroed, and — round 13 — the two zero-VARIANCE corpora
   (monoculture, flat-time) plus the four NULLITY corpora (all-NULL
   events.value / events.ts / events.user_id / documents.text; the
   value one caught the quality-report NULL-skipping-sum bug and the
   text one caught the payload-pass crashes + the legacy size(NULL)
   sentinel on their first sweeps));
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
--degenerate`` (first full five-corpus run measured ~11 min: empty
91 s, one-row 124 s, mixed ~145 s each; the zero-variance and nullity
corpora add ~3 min each — every one swept standalone before joining);
also runnable directly:

    python tools/degenerate_gate.py [--src /root/testdata/sf0.001]

Exit 0 only when every sweep matches its documented fail set.
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
}

_SUMMARY = re.compile(
    r"^(\d+) ok, (\d+) fail, (\d+) rows-only(?:; failing: (.*))?$"
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
            return int(m.group(1)), int(m.group(2)), int(m.group(3)), fails, tail
    raise RuntimeError(
        f"check_oracle printed no summary for {sf_dir}; tail:\n{tail}\n"
        f"stderr tail:\n{chr(10).join(out.stderr.splitlines()[-5:])}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--keep",
        action="store_true",
        help="keep the generated corpora dir (printed) for debugging",
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

    failures: list[str] = []
    try:
        for label, sf_dir in dirs.items():
            t0 = time.time()
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
