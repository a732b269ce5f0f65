"""The standing SERVING-LATENCY gate (r10 verdict task 4 — gate serve
paths the way test_scale_growth gates growth): given the committed
quiet bench capture, every serving entry's warm per-request latency
must sit inside a band of the committed number, and must stay cheaper
than the work a serving regression would silently re-pay:

- ``bm25_search`` / ``result_cache_daily``: warm ≤ cold_headline ×
  slack — their headline runs pay a real cold build (postings /
  cache-miss), so a serve path that regressed to rebuilding shows up
  as warm ≈ cold.
- ``ann_ivfpq_serve``: its headline run is ALSO serve-only (the index
  is built once per process), so cold is no comparator (warm has
  measured ABOVE cold in committed captures — pure noise; ADVICE r11:
  keep this observation qualitative, the concrete pair drifts with
  every re-capture). The regression signal is the BUILD entry: warm
  must stay under the full ``ann_ivfpq_topk`` build+search lifecycle.

When a round re-captures, point CAPTURE at the new artifact and
refresh the bands from it; the test is pure JSON so it runs in every
pytest sweep. Skips (does not fail) while the artifact is absent so a
fresh clone can run tests before its first capture.
"""

from __future__ import annotations

import json
import os

import pytest

_TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)
CAPTURE = os.path.join(_TOOLS, "bench_r11_final.json")

# warm-latency bands (seconds) from the committed capture: generous
# enough for box noise (2.5x the committed warm + headroom), tight
# enough that "serve regressed to a rebuild" (several-x) fails
WARM_BAND = {
    "bm25_search": 2.0,
    "ann_ivfpq_serve": 4.5,
    "result_cache_daily": 4.5,
}
COLD_SLACK = 1.5  # warm vs a true cold build


def _capture():
    if not os.path.exists(CAPTURE):
        pytest.skip(f"capture artifact missing: {CAPTURE}")
    with open(CAPTURE) as fh:
        return json.load(fh)


def test_serving_block_present_and_complete():
    serving = _capture().get("detail", {}).get("serving", {})
    assert set(WARM_BAND) <= set(serving), (
        f"serving block incomplete: {sorted(serving)} — a dropped "
        "serve measurement is how a latency regression hides"
    )


def test_warm_latency_within_committed_band():
    serving = _capture()["detail"]["serving"]
    bad = []
    for name, band in WARM_BAND.items():
        warm = serving[name]["warm_request_sec"]
        if warm > band:
            bad.append((name, warm, band))
    assert not bad, (
        f"warm serve latency outside the committed band: {bad} — "
        "if the capture box was loaded, re-capture quiet; otherwise "
        "the serve path is re-paying build work per request"
    )


def test_warm_never_repays_a_true_cold_build():
    cap = _capture()
    serving = cap["detail"]["serving"]
    for name in ("bm25_search", "result_cache_daily"):
        warm = serving[name]["warm_request_sec"]
        cold = serving[name]["cold_headline_sec"]
        assert warm <= cold * COLD_SLACK, (
            f"{name}: warm {warm:.2f}s vs cold build {cold:.2f}s — "
            "the warm path is rebuilding instead of serving"
        )


def test_ivfpq_serve_cheaper_than_rebuild():
    cap = _capture()
    warm = cap["detail"]["serving"]["ann_ivfpq_serve"]["warm_request_sec"]
    build = cap["queries"].get("ann_ivfpq_topk")
    if build is None:
        pytest.skip("ann_ivfpq_topk not in the capture")
    assert warm <= build, (
        f"ann_ivfpq_serve warm {warm:.2f}s exceeds the full "
        f"build+search lifecycle {build:.2f}s — the prebuilt index "
        "is not being reused"
    )
