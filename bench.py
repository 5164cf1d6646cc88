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
    sa = cs.arrays
    static = cs.static
    from pbrt_tpu.device.camera import make_camera
    from pbrt_tpu.render import _one_sample_wave

    cam = make_camera(desc.camera, desc.film)
    icfg = {"kind": "path", "max_depth": 5, "rr_threshold": 1.0, "strategy": "all", "n_samples": 4, "cos_sample": True}
    scfg = {"kind": "zerotwosequence", "spp": 16}
    fcfg = {"filter": "box", "filter_params": {}, "max_sample_luminance": np.inf}

    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel().astype(np.int32))
    py = jnp.asarray(ys.ravel().astype(np.int32))
    pids = jnp.asarray((ys * W + xs).ravel().astype(np.uint32))

    N_SPP = 4

    # device-resident multi-sample pass: film accumulates on-chip; only two
    # scalars cross the host boundary per call
    @jax.jit
    def run(sa, n0):
        def body(s, acc):
            film, verts = acc
            Lw, w, nv = _one_sample_wave(
                sa, static, icfg, scfg, fcfg, cam, px, py, pids, n0 + s.astype(jnp.uint32), jnp.uint32(0)
            )
            return film + jnp.sum(Lw), verts + jnp.sum(nv)

        return jax.lax.fori_loop(0, N_SPP, body, (jnp.float32(0), jnp.float32(0)))
    film, verts = run(sa, jnp.uint32(0))
    jax.block_until_ready(film)

    t0 = time.time()
    film, verts = run(sa, jnp.uint32(100))
    jax.block_until_ready(film)
    dt = time.time() - t0

    vps = float(verts) / dt
    print(json.dumps({
        "metric": "path_vertex_samples_per_sec",
        "value": round(vps, 1),
        "unit": "vertices/s",
        "vs_baseline": round(vps / BASELINE_VPS, 4),
    }))


if __name__ == "__main__":
    main()
