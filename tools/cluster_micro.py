"""Phase-isolated microbenchmark of the cluster-list tier on the bench
scene: sort, interval cull, segment extraction, kernel walk, fallback —
each timed separately on dense camera and bounce waves.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _mesh_scene
from pbrt_tpu.device.camera import generate_rays, make_camera
from pbrt_tpu.scene.builder import compile_scene


def main():
    desc = _mesh_scene()
    cs = compile_scene(desc)
    sa, static = cs.arrays, cs.static

    W, H = 1000, 500
    R = W * H
    cam = make_camera(desc.camera, desc.film)
    key = jax.random.PRNGKey(0)
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel(), jnp.float32) + jax.random.uniform(key, (R,))
    py = jnp.asarray(ys.ravel(), jnp.float32) + jax.random.uniform(jax.random.fold_in(key, 1), (R,))
    o_cam, d_cam = generate_rays(cam, px, py, jnp.zeros(R), jnp.zeros(R))

    from pbrt_tpu.device.bsdf import cosine_sample_hemisphere
    from pbrt_tpu.device.integrator import surface_interaction
    from pbrt_tpu.device.intersect import _intersect_once

    hit = jax.jit(lambda o, d: _intersect_once(sa, static, o, d, jnp.full(R, 1e30, jnp.float32)))(o_cam, d_cam)
    si = surface_interaction(sa, hit, o_cam, d_cam)
    u1 = jax.random.uniform(jax.random.fold_in(key, 2), (R,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 3), (R,))
    wl = cosine_sample_hemisphere(u1, u2)
    d_b = wl[:, 0:1] * si["ss"] + wl[:, 1:2] * si["ts"] + wl[:, 2:3] * si["ns"]
    d_b = d_b / jnp.linalg.norm(d_b, axis=1, keepdims=True)
    o_b = si["p"] + 1e-4 * jnp.sign(jnp.sum(d_b * si["ng"], axis=1, keepdims=True)) * si["ng"]

    from pbrt_tpu.device import cluster_list as cl

    def bench(name, fn, reps=4):
        print(f"compiling {name}...", file=sys.stderr, flush=True)
        out = fn()
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:46s} {R / best / 1e6:8.2f} Mrays/s  ({best * 1e3:.1f} ms)", flush=True)
        return out

    for nm, o, d in (("camera", o_cam, d_cam), ("bounce", o_b, d_b)):
        t_arr0 = jnp.full(R, 1e30, jnp.float32)

        # 1) sort + pack
        @jax.jit
        def sort_pack(o, d, t_arr):
            wl_ = sa.world_center - sa.world_radius
            inv_ext = 1.0 / jnp.maximum(2.0 * sa.world_radius, 1e-20)
            keys = cl.coherence_keys(o, d, wl_, inv_ext)
            keys = jnp.where(t_arr > 0, keys, jnp.uint32(0xFFFFFFFF))
            perm = jax.lax.optimization_barrier(jnp.argsort(keys))
            packed = jnp.concatenate([o, d, t_arr[:, None], jnp.zeros_like(t_arr)[:, None]], axis=1)[perm]
            return packed[:, 0:3], packed[:, 3:6], packed[:, 6], perm

        o_s, d_s, t_s, perm = bench(f"{nm}/sort+permute", lambda: sort_pack(o, d, t_arr0))
        blocks, Rr, B = cl.pack_rays(o_s, d_s, t_s, jnp.where(t_s > 0, 1.0, 0.0))
        pad = B * cl.PACKET - Rr
        o_p = jnp.concatenate([o_s, jnp.zeros((pad, 3), jnp.float32)])
        d_p = jnp.concatenate([d_s, jnp.ones((pad, 3), jnp.float32)])
        t_p = jnp.concatenate([t_s, jnp.full(pad, -1.0, jnp.float32)])

        # 2) cull phases
        pl_full = jax.jit(lambda o, d, t: cl.packet_lists(sa.cl_lo, sa.cl_hi, o, d, t))
        lists, segcnt, ovf = bench(f"{nm}/cull(interval+extract)", lambda: pl_full(o_p, d_p, t_p))
        aabb = jnp.concatenate([sa.cl_lo, sa.cl_hi, jnp.zeros((sa.cl_lo.shape[0], 2), jnp.float32)], axis=1)
        cnts = np.asarray(jnp.sum(segcnt, axis=1))
        print(f"  {nm}: list total mean={cnts.mean():.1f} p99={np.percentile(cnts, 99):.0f} "
              f"max={cnts.max()} overflow={float(jnp.mean(ovf)):.4f}", flush=True)

        # 3) kernel walk only
        krn = jax.jit(lambda b, l, s: cl._run_lists(sa.cl_tab, aabb, b, l, s, False, False))
        out = bench(f"{nm}/kernel(closest)", lambda: krn(blocks, lists, segcnt))
        rounds = np.asarray(out[:, 5, 0])
        print(f"  {nm}: TRUE rounds/packet mean={rounds.mean():.1f} "
              f"p99={np.percentile(rounds, 99):.0f} max={rounds.max():.0f}", flush=True)
        krn_a = jax.jit(lambda b, l, s: cl._run_lists(sa.cl_tab, aabb, b, l, s, True, False))
        bench(f"{nm}/kernel(anyhit)", lambda: krn_a(blocks, lists, segcnt))

        # 4) e2e
        ci = jax.jit(lambda o, d: cl.cluster_intersect(sa, static, o, d, 1e30))
        bench(f"{nm}/e2e closest", lambda: ci(o, d))


if __name__ == "__main__":
    main()
