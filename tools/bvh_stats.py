"""Wide-BVH traversal diagnostics: node-visit (pop) counts + kernel timing.

Usage:  python tools/bvh_stats.py [--scene mesh|spheres|<file.pbrt>] [--sort 0|1]

Reports, for primary (coherent) and bounce (incoherent) waves:
- per-packet pop counts (mean / p95 / max) from the kernel's own counter
  (pallas_bvh out row 5) — the bvh.rs node-visit stats equivalent,
- wall time, Mrays/s, and ns/pop for BOTH the joint interleaved kernel and
  the sequential SMEM kernel (PBRT_TPU_JOINT A/B), feeding the stats
  registry so `report_stats` prints them like the reference's
  `--stats` BVH counters.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="mesh")
    ap.add_argument("--sort", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--res", type=int, default=0, help="override film width (keeps 2:1)")
    ap.add_argument("--cpu", action="store_true", help="CPU interpret mode (slow; smoke only)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pbrt_tpu.device.camera import generate_rays, make_camera
    from pbrt_tpu.device import pallas_bvh
    from pbrt_tpu.scene.builder import compile_scene
    from pbrt_tpu.utils import stats

    if args.scene == "mesh":
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "benchmod", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"))
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        desc = bench._mesh_scene()
    elif args.scene == "spheres":
        from pbrt_tpu.parser.api import pbrt_parse

        desc = pbrt_parse("/root/reference/src/scenes/spheres-differentials-texfilt.pbrt")
    else:
        from pbrt_tpu.parser.api import pbrt_parse

        desc = pbrt_parse(args.scene)

    if args.res:
        desc.film.x_resolution = args.res
        desc.film.y_resolution = max(args.res // 2, 1)
    cs = compile_scene(desc)
    sa, static = cs.arrays, cs.static
    if not static.has_wide:
        print("scene has no wide BVH (too few triangles) — nothing to measure")
        return
    cam = make_camera(desc.camera, desc.film)
    W, H = desc.film.x_resolution, desc.film.y_resolution
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel() + 0.5, jnp.float32)
    py = jnp.asarray(ys.ravel() + 0.5, jnp.float32)
    z = jnp.zeros_like(px)
    o, d = generate_rays(cam, px, py, z, z)
    R = o.shape[0]
    tmax = jnp.full((R,), 1e30)
    sort = bool(args.sort)
    interp = jax.default_backend() == "cpu"

    # bounce wave: random hemisphere directions from the primary hit points
    t0v = jax.jit(lambda: pallas_bvh.wide_intersect(sa, static, o, d, tmax, sort=sort, interpret=interp)[0])()
    t_ = jnp.where(jnp.isfinite(t0v), t0v, 1.0)
    op = o + d * t_[:, None] * 0.999
    key = jax.random.PRNGKey(1)
    dirs = jax.random.normal(key, (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.where(dirs[:, 1:2] < 0, dirs * jnp.asarray([1.0, -1.0, 1.0]), dirs)

    waves = [("primary", o, d), ("bounce", op, dirs)]
    for joint in (True, False):
        os.environ["PBRT_TPU_JOINT"] = "1" if joint else "0"
        label = "joint " if joint else "legacy"
        for name, o_, d_ in waves:
            f = jax.jit(lambda o2, d2: pallas_bvh.wide_intersect(
                sa, static, o2, d2, tmax, sort=sort, interpret=interp)[0].sum())
            jax.block_until_ready(f(o_, d_))
            best = 1e30
            for _ in range(args.reps):
                t0 = time.time()
                jax.block_until_ready(f(o_, d_))
                best = min(best, time.time() - t0)
            pops = np.asarray(jax.jit(lambda o2, d2: pallas_bvh.wide_pop_counts(
                sa, static, o2, d2, tmax, sort=sort, interpret=interp))(o_, d_))
            total = float(pops.sum())
            denom = total / pallas_bvh.GRID_G if joint else total
            stats.STATS.counter(f"BVH/{label.strip()} {name} node visits", int(total))
            print(f"{label} {name:8s}: {best*1e3:7.2f} ms  {R/best/1e6:7.2f} Mrays/s  "
                  f"pops/packet mean {pops.mean():6.1f} p95 {np.percentile(pops, 95):6.1f} "
                  f"max {pops.max():6.0f}  {best*1e9/max(denom,1):6.0f} ns/{'round' if joint else 'pop'}")
    stats.print_stats()


if __name__ == "__main__":
    main()
