"""Benchmark harness: prints ONE JSON line with the headline metric.

Metric: path-vertex samples per second on one chip (BASELINE.json
north_star: >= 50M path-vertex samples/sec/chip on TPU v5e). The workload is
the reference's bundled spheres scene geometry rendered with the path
integrator — mixed specular/diffuse materials, NEE + MIS, BVH-free small
scene (the reference's own runnable baseline, BASELINE.md).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_VPS = 50e6  # driver-defined target (BASELINE.json north_star)


def main():
    sys.path.insert(0, "/root/repo")
    import jax

    from pbrt_tpu.parser.api import pbrt_parse
    from pbrt_tpu.scene.builder import compile_scene
    from pbrt_tpu.render import _cached_wave_fn

    import jax.numpy as jnp

    desc = pbrt_parse("/root/reference/src/scenes/spheres-differentials-texfilt.pbrt")
    # bench configuration: path tracing at depth 5, big wave
    desc.integrator.kind = "path"
    desc.integrator.max_depth = 5
    desc.sampler.kind = "zerotwosequence"
    W, H = 1000, 500
    desc.film.x_resolution = W
    desc.film.y_resolution = H

    cs = compile_scene(desc)
    wave = _cached_wave_fn(cs)
    sa = cs.arrays

    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel().astype(np.int32))
    py = jnp.asarray(ys.ravel().astype(np.int32))
    pids = jnp.asarray((ys * W + xs).ravel().astype(np.uint32))

    # warmup / compile
    Lw, w, nv = wave(sa, px, py, pids, jnp.uint32(0), jnp.uint32(0))
    Lw.block_until_ready()

    n_iters = 8
    t0 = time.time()
    total_v = 0.0
    for s in range(1, n_iters + 1):
        Lw, w, nv = wave(sa, px, py, pids, jnp.uint32(s), jnp.uint32(0))
        total_v += float(jnp.sum(nv))
    jax.block_until_ready(Lw)
    dt = time.time() - t0

    vps = total_v / dt
    print(json.dumps({
        "metric": "path_vertex_samples_per_sec",
        "value": round(vps, 1),
        "unit": "vertices/s",
        "vs_baseline": round(vps / BASELINE_VPS, 4),
    }))


if __name__ == "__main__":
    main()
