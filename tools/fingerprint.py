"""Testdata fingerprinting — makes stale correctness greens DETECTABLE.

Round-3 lesson: the driver regenerated /root/testdata between rounds
(events.ts changed physical type AND values), silently invalidating ~14
green correctness rows from round 1; the breakage was discovered by
failure, not by diff.  This tool records, per scale factor and table:

    rows         from the parquet footer (no data scan)
    schema       the arrow schema string (physical types — catches the
                 TIMESTAMP(NANOS) → timestamp[us] class of move)
    sha256       content hash of the file bytes (catches value regens
                 that keep schema and row count)

`python tools/fingerprint.py` checks the committed TESTDATA_FPRINT.json
(exit 1 + DRIFT lines on mismatch — it never rewrites the baseline on
its own); `--rebaseline` rewrites it, to be run only AFTER re-verifying
the affected queries. tests/test_fingerprint.py runs the same diff so
the first suite run after a regen says exactly which green rows are
invalidated.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "TESTDATA_FPRINT.json"
TESTDATA = Path("/root/testdata")
import sys

sys.path.insert(0, str(REPO))
# ONE table list — the package registry's (review r6: drift channel)
from data_mastery_pipeline_spark.tables import TABLE_NAMES as TABLES

SFS = ("sf0.001", "sf0.01", "sf0.1")


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fingerprint() -> dict:
    out: dict = {}
    for sf in SFS:
        d = TESTDATA / sf
        if not d.is_dir():
            continue
        out[sf] = {}
        for t in TABLES:
            p = d / f"{t}.parquet"
            if not p.exists():
                continue
            meta = pq.read_metadata(p)
            out[sf][t] = {
                "rows": meta.num_rows,
                "schema": pq.read_schema(p).to_string().replace("\n", "; "),
                "sha256": _sha256(p),
            }
    return out


def diff(old: dict, new: dict) -> list[str]:
    """Human-readable drift lines, empty when identical."""
    lines = []
    for sf in sorted(set(old) | set(new)):
        o, n = old.get(sf, {}), new.get(sf, {})
        for t in sorted(set(o) | set(n)):
            if t not in o:
                lines.append(f"{sf}/{t}: NEW table")
            elif t not in n:
                lines.append(f"{sf}/{t}: REMOVED")
            elif o[t] != n[t]:
                what = [k for k in ("rows", "schema", "sha256") if o[t][k] != n[t][k]]
                lines.append(f"{sf}/{t}: changed {'+'.join(what)}")
    return lines


if __name__ == "__main__":
    import sys

    rebaseline = "--rebaseline" in sys.argv[1:]
    new = fingerprint()
    if OUT.exists() and not rebaseline:
        # Read-only check: NEVER rewrite the baseline on drift — doing
        # so would disarm the tripwire before the affected queries were
        # re-verified. Exit nonzero so this doubles as a CI guard.
        drift = diff(json.loads(OUT.read_text()), new)
        for line in drift:
            print("DRIFT", line)
        if drift:
            print(
                "testdata drifted — re-verify affected queries, then "
                "re-baseline with: python tools/fingerprint.py --rebaseline"
            )
            sys.exit(1)
        print("no drift")
        sys.exit(0)
    OUT.write_text(json.dumps(new, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT}")
