"""Dispatch-shape sweep under the device watchdog (VERDICT r2 task 1b).

Measures mesh-bench verts/s as a function of (lanes-per-dispatch x
spp-per-dispatch), all through bench._measure's production chunking, to
set render.PERSISTENT_MAX_RAYS / PERSISTENT_SPP_CHUNK_BIG from data
instead of guesses. Each cell runs in a subprocess so a watchdog fault
marks the CELL, not the sweep.

Usage: python tools/dispatch_sweep.py [--config mesh] [--out SWEEP.json]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

LANES = [1 << 17, 1 << 18, 1 << 19]          # 131k, 262k, 524k (full film 500k)
SPP = [1, 2, 4, 8, 16]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="mesh")
    ap.add_argument("--out", default=None)
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    results = {}
    for lanes in LANES:
        for spp in SPP:
            if lanes * spp > (1 << 19) * 16:
                continue
            env = dict(os.environ)
            env["PBRT_TPU_BENCH_LANES"] = str(lanes)
            env["PBRT_TPU_BENCH_SPPCHUNK"] = str(spp)
            t0 = time.time()
            try:
                out = subprocess.run(
                    [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py"),
                     "--config", args.config],
                    capture_output=True, text=True, timeout=args.timeout, env=env)
            except subprocess.TimeoutExpired:
                results[f"{lanes}x{spp}"] = {"error": "timeout"}
                print(f"{lanes:>7} lanes x {spp:>2} spp: TIMEOUT", flush=True)
                continue
            rec = None
            for line in reversed(out.stdout.splitlines()):
                try:
                    rec = json.loads(line)
                    break
                except ValueError:
                    continue
            if rec and "vps" in rec:
                results[f"{lanes}x{spp}"] = {"vps": round(rec["vps"], 1),
                                             "compile_s": rec.get("compile_s"),
                                             "wall_s": round(time.time() - t0, 1)}
                print(f"{lanes:>7} lanes x {spp:>2} spp: {rec['vps'] / 1e6:8.3f} Mverts/s "
                      f"(cell wall {time.time() - t0:.0f}s)", flush=True)
            else:
                tail = (out.stdout + out.stderr)[-400:]
                results[f"{lanes}x{spp}"] = {"error": tail}
                print(f"{lanes:>7} lanes x {spp:>2} spp: FAILED {tail[-120:]!r}", flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"config": args.config, "cells": results}, fh, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
