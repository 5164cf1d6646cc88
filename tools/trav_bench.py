"""Traversal-kernel microbenchmark on the bench mesh scene.

Measures Mrays/s of the wide-BVH Pallas kernel (joint and sequential
variants) on camera-coherent and bounce-incoherent waves, plus the full
persistent-wave verts/s — the numbers that decide the mesh bench tier.

Usage: python tools/trav_bench.py [--rays 524288] [--skip-wave]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 19)
    ap.add_argument("--skip-wave", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _mesh_scene
    from pbrt_tpu.device import pallas_bvh as pb
    from pbrt_tpu.device.camera import generate_rays, make_camera
    from pbrt_tpu.scene.builder import compile_scene

    desc = _mesh_scene()
    cs = compile_scene(desc)
    sa, static = cs.arrays, cs.static
    print(f"tris={static.n_tris} joint_probe={pb._JOINT_PROBE['ok']}", file=sys.stderr)

    R = args.rays
    W, H = 1000, 500
    cam = make_camera(desc.camera, desc.film)
    key = jax.random.PRNGKey(0)
    px = jax.random.uniform(key, (R,)) * W
    py = jax.random.uniform(jax.random.fold_in(key, 1), (R,)) * H
    o_cam, d_cam = generate_rays(cam, px, py, jnp.zeros(R), jnp.zeros(R))

    # incoherent wave: random origins inside the room, random directions
    k2 = jax.random.fold_in(key, 2)
    o_inc = jax.random.uniform(k2, (R, 3), minval=-3.5, maxval=3.5) * jnp.asarray([1.0, 0.4, 1.0]) + jnp.asarray([0.0, 1.2, 0.0])
    d_inc = jax.random.normal(jax.random.fold_in(key, 3), (R, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=1, keepdims=True)

    def bench(name, fn):
        out = fn()
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:42s} {R / best / 1e6:8.2f} Mrays/s  ({best * 1e3:.1f} ms)")
        return out

    tmax = jnp.full((R,), 1e30, jnp.float32)

    # --- binned per-ray tier ---
    if getattr(static, "has_cluster", False) and getattr(sa, "su_lo", None) is not None:
        from pbrt_tpu.device.binned import binned_intersect

        bi = jax.jit(lambda o, d: binned_intersect(sa, static, o, d, 1e30))
        bo_cam = bench("binned/closest/camera", lambda: bi(o_cam, d_cam))
        bo_inc = bench("binned/closest/incoherent", lambda: bi(o_inc, d_inc))
        ba = jax.jit(lambda o, d: binned_intersect(sa, static, o, d, 1e30, any_hit=True))
        bench("binned/anyhit/incoherent", lambda: ba(o_inc, d_inc))
        for nm, out in (("camera", bo_cam), ("incoherent", bo_inc)):
            from pbrt_tpu.device.binned import _binned_core
            t, prim, hitm, b1, b2, ovf = _binned_core(
                int(static.n_clusters), False, sa.su_lo, sa.su_hi, sa.su_bounds,
                sa.cl_rows,
                (o_cam if nm == "camera" else o_inc),
                (d_cam if nm == "camera" else d_inc), R, False,
                jnp.full((R,), 1e30, jnp.float32))
            print(f"  binned/{nm}: hit={float(jnp.mean(hitm)):.3f} "
                  f"overflow={float(jnp.mean(ovf)):.4f}")

    # (cluster-list tier removed in round 3 — 21827e3 deleted the module
    # after it lost its A/B; this bench section went with it)

    for joint in (True, False):
        tag = "joint" if joint else "seq"
        run = jax.jit(lambda o, d, j=joint: pb._run(
            sa.wnode_tab, sa.wprim_tab, pb.pack_rays(o, d, tmax)[0],
            static.wide_root, False, False, meta=sa.wmeta_tab, joint=j))
        # coherent camera rays (pack order is already coherent; add the sort
        # path separately below through wide_intersect)
        bench(f"closest/{tag}/camera(raw order)", lambda: run(o_cam, d_cam))
        bench(f"closest/{tag}/incoherent(raw)", lambda: run(o_inc, d_inc))

    # production entry (sort + unsort included)
    import os
    for joint_env in ("1", "0"):
        os.environ["PBRT_TPU_JOINT"] = joint_env
        tag = "joint" if joint_env == "1" else "seq"
        wi = jax.jit(lambda o, d: pb.wide_intersect(sa, static, o, d, 1e30))
        bench(f"closest/{tag}/camera(sorted,e2e)", lambda: wi(o_cam, d_cam))
        bench(f"closest/{tag}/incoherent(sorted,e2e)", lambda: wi(o_inc, d_inc))
        wa = jax.jit(lambda o, d: pb.wide_intersect(sa, static, o, d, 1e30, any_hit=True))
        bench(f"anyhit/{tag}/incoherent(sorted,e2e)", lambda: wa(o_inc, d_inc))
        # pop counts for ns/pop calibration
        pops = pb.wide_pop_counts(sa, static, o_cam, d_cam, 1e30)
        jax.block_until_ready(pops)
        t0 = time.perf_counter()
        pops = pb.wide_pop_counts(sa, static, o_cam, d_cam, 1e30)
        total_pops = float(jnp.sum(pops))
        jax.block_until_ready(pops)
        dt = time.perf_counter() - t0
        print(f"  {tag}: camera pops/packet={total_pops / pops.shape[0]:.0f} "
              f"ns/pop={dt * 1e9 / total_pops:.1f}")
    os.environ.pop("PBRT_TPU_JOINT", None)

    if not args.skip_wave:
        from pbrt_tpu.render import make_persistent_fn

        ys, xs = np.mgrid[0:H, 0:W]
        pxw = jnp.asarray(xs.ravel().astype(np.int32))
        pyw = jnp.asarray(ys.ravel().astype(np.int32))
        pids = jnp.asarray((ys * W + xs).ravel().astype(np.uint32))
        wave_p = make_persistent_fn(cs)
        n_spp = 16
        Lw, w, nv = wave_p(sa, pxw, pyw, pids, jnp.uint32(0), n_spp, jnp.uint32(0))
        jax.block_until_ready(Lw)
        best = 0.0
        for rep in range(3):
            t0 = time.perf_counter()
            Lw, w, nv = wave_p(sa, pxw, pyw, pids, jnp.uint32(100 + rep), n_spp, jnp.uint32(0))
            verts = float(jnp.sum(nv))
            jax.block_until_ready(Lw)
            best = max(best, verts / (time.perf_counter() - t0))
        print(f"persistent wave: {best / 1e6:.2f} Mverts/s (target 50)")


if __name__ == "__main__":
    main()
