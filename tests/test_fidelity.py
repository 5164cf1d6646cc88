"""Regression gate over the committed FIDELITY.json (tools/fidelity.py).

The fidelity tool renders bundled reference scenes on TPU and records
blurred-MSE numbers against the reference's own golden PNGs; this test
pins the committed numbers under their thresholds so fidelity cannot
silently regress between rounds. (It does not re-render — the renders
need the TPU and tens of minutes; run `python tools/fidelity.py` to
refresh the numbers.)"""
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_committed_fidelity_numbers():
    path = os.path.join(ROOT, "FIDELITY.json")
    if not os.path.exists(path):
        pytest.skip("no FIDELITY.json committed yet")
    data = json.load(open(path))
    scenes = data["scenes"]
    checked = 0
    for name, rec in scenes.items():
        if "skipped" in rec or "stale" in rec or "blurred_mse" not in rec:
            # "stale" marks a measurement superseded by a landed fix whose
            # re-measurement is pending hardware; the tool clears the flag
            # on the next successful run
            continue
        mse = rec["blurred_mse"]
        thr = rec["threshold"]
        assert mse == mse, f"{name}: NaN fidelity result"
        assert mse < thr, f"{name}: blurred_mse {mse} over threshold {thr}"
        assert rec.get("passed") is True, f"{name}: committed entry not passing"
        # entries must be produced by the CURRENT tool protocol: the glass
        # gate is absolute brightness, so its entry must carry the
        # scale_ok/scale_applied fields (a round-2 entry predating the
        # protocol sailed through while the live gate failed)
        if name.startswith("caustic-glass"):
            # includes the bdpt/mlt cross-integrator entries: all three
            # gate ABSOLUTE brightness against the same golden
            assert "scale_ok" in rec and "scale_applied" in rec, \
                f"{name}: entry predates the absolute-brightness protocol"
            assert rec["scale_ok"] is True, f"{name}: |scale-1| gate failed"
        if name == "sss":
            assert rec.get("blurred_mse", 1.0) > 0.0, \
                "sss: two estimators bit-identical — the walk estimator is a no-op"
        checked += 1
    assert checked >= 1, "no fidelity scenes recorded"
