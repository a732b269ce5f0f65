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

`python tools/fingerprint.py` rewrites TESTDATA_FPRINT.json at the repo
root; tests/test_fingerprint.py diffs a fresh computation against the
committed file and fails naming the drifted tables, so the first suite
run after a regen says exactly which green rows are invalidated.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "TESTDATA_FPRINT.json"
TESTDATA = Path("/root/testdata")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
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
    new = fingerprint()
    if OUT.exists():
        drift = diff(json.loads(OUT.read_text()), new)
        for line in drift:
            print("DRIFT", line)
        if not drift:
            print("no drift")
    OUT.write_text(json.dumps(new, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT}")
