"""Testdata drift tripwire (VERDICT r04 task 4).

If the driver regenerates /root/testdata between rounds, every green
correctness row for queries reading the changed tables is stale. This
test makes that loud: it recomputes the per-table fingerprint (rows +
physical schema + content hash) and diffs it against the committed
TESTDATA_FPRINT.json. On drift it FAILS naming exactly which tables
moved — run `python tools/fingerprint.py --rebaseline` only after
re-verifying the affected queries.
"""

from __future__ import annotations

import json
from pathlib import Path

from tools.fingerprint import OUT, diff, fingerprint


def test_testdata_matches_committed_fingerprint():
    assert OUT.exists(), (
        "TESTDATA_FPRINT.json missing — run `python tools/fingerprint.py`"
    )
    committed = json.loads(Path(OUT).read_text())
    drift = diff(committed, fingerprint())
    assert not drift, (
        "testdata drifted since the committed fingerprint — correctness "
        "greens for queries reading these tables are STALE:\n  "
        + "\n  ".join(drift)
        + "\nre-verify affected queries, then re-baseline with "
        "`python tools/fingerprint.py --rebaseline`"
    )
