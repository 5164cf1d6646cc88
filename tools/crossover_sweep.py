"""Wide-megakernel crossover sweep (VERDICT r2 task 6): mesh size vs
engine tier. Each cell runs in a subprocess (a Mosaic fault or watchdog
kill marks the cell, not the sweep) through bench.py's production
_measure with PBRT_TPU_BENCH_NSIDE selecting the terrain tessellation.

Usage: python tools/crossover_sweep.py [--out CROSSOVER_r03.json]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# n_side -> ~2*n^2 terrain tris (plus ~1.2k wall/panel tris)
SIZES = [45, 64, 90, 128, 181]
ENGINES = [
    # force eligibility: the gate under test is PBRT_TPU_WIDEMEGA_MAX_TRIS
    ("wide-megakernel", {"PBRT_TPU_WIDEMEGA_MAX_TRIS": "200000",
                         # megakernel full-film x 16 dispatches are safe only
                         # while the kernel is fast; big meshes in this kernel
                         # are slow (packet-union), so keep cells bounded
                         "PBRT_TPU_BENCH_LANES": str(1 << 18),
                         "PBRT_TPU_BENCH_SPPCHUNK": "2"}),
    ("pallas-wide", {"PBRT_TPU_WIDEMEGA": "0"}),
]


def main():
    out_path = "CROSSOVER_r03.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    cells = {}
    for n_side in SIZES:
        for label, env_extra in ENGINES:
            env = dict(os.environ)
            env["PBRT_TPU_BENCH_NSIDE"] = str(n_side)
            env.update(env_extra)
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py"),
                     "--config", "mesh"],
                    capture_output=True, text=True, timeout=1800, env=env)
            except subprocess.TimeoutExpired:
                cells[f"{n_side}:{label}"] = {"error": "timeout"}
                print(f"n={n_side:>3} {label:16s}: TIMEOUT", flush=True)
                continue
            rec = None
            for line in reversed(r.stdout.splitlines()):
                try:
                    rec = json.loads(line)
                    break
                except ValueError:
                    continue
            if rec and "vps" in rec:
                cells[f"{n_side}:{label}"] = {"tris": rec["tris"], "vps": round(rec["vps"], 1),
                                              "tier": rec.get("tier")}
                print(f"n={n_side:>3} ({rec['tris']:>6} tris) {label:16s}: "
                      f"{rec['vps'] / 1e6:8.3f} Mverts/s [{rec.get('tier')}] "
                      f"({time.time() - t0:.0f}s)", flush=True)
            else:
                cells[f"{n_side}:{label}"] = {"error": (r.stdout + r.stderr)[-300:]}
                print(f"n={n_side:>3} {label:16s}: FAILED", flush=True)
    with open(out_path, "w") as fh:
        json.dump({"what": "mesh-size x engine crossover (verts/s, bench mesh scene)",
                   "cells": cells}, fh, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
