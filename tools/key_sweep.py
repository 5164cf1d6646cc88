"""Coherence-sort KEY LAYOUT sweep: does re-weighting origin vs direction
bits shrink packet unions on real bounce waves?

pallas_bvh.coherence_keys currently packs octant(3) | origin-Morton(16) |
direction-Morton(12). With spp batching (k rays per surface point in
flight) the bins are denser, so the optimal origin/direction balance may
shift. This sweeps layouts and reports total pops + traversal time on the
same first-bounce wave as tools/cohere_probe.py.

Usage: python tools/key_sweep.py [--pixels 131072] [--k 4]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pixels", type=int, default=1 << 17)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _mesh_scene
    from pbrt_tpu.device import pallas_bvh as pb
    from pbrt_tpu.device.camera import generate_rays, make_camera
    from pbrt_tpu.device.integrator import _offset_ray
    from pbrt_tpu.device.intersect import intersect
    from pbrt_tpu.device.shading import surface_interaction
    from pbrt_tpu.scene.builder import compile_scene

    desc = _mesh_scene()
    cs = compile_scene(desc)
    sa, static = cs.arrays, cs.static
    R = args.pixels
    W, H = 1000, 500
    cam = make_camera(desc.camera, desc.film)
    key = jax.random.PRNGKey(0)
    px = jax.random.uniform(key, (R,)) * W
    py = jax.random.uniform(jax.random.fold_in(key, 1), (R,)) * H

    @jax.jit
    def first_hit():
        o, d = generate_rays(cam, px, py, jnp.zeros(R), jnp.zeros(R))
        hit = intersect(sa, static, o, d, jnp.full(R, jnp.inf, jnp.float32))
        si = surface_interaction(sa, hit, o, d)
        return si["p"], si["ns"], si["ng"], si["ss"], si["ts"], si["valid"]

    p, ns, ng, ss, ts, valid = first_hit()
    k = args.k
    kk = jax.random.fold_in(key, 100 + k)
    u1 = jax.random.uniform(kk, (k * R,))
    u2 = jax.random.uniform(jax.random.fold_in(kk, 1), (k * R,))
    r = jnp.sqrt(u1)
    phi = 2 * jnp.pi * u2
    wl = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                    jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))], axis=-1)
    w = (wl[:, 0:1] * jnp.tile(ss, (k, 1)) + wl[:, 1:2] * jnp.tile(ts, (k, 1))
         + wl[:, 2:3] * jnp.tile(ns, (k, 1)))
    o_b = _offset_ray(jnp.tile(p, (k, 1)), jnp.tile(ng, (k, 1)), w)
    t_q = jnp.where(jnp.tile(valid, (k,)), jnp.inf, -1.0)
    n_live = int(jnp.sum(t_q > 0))
    print(f"tris={static.n_tris} rays={k * R} live={n_live}", flush=True)

    m10 = pb._morton10

    def make_keys(layout):
        def keys(o, d, lo, inv_ext):
            oc = ((d[:, 0] > 0).astype(jnp.uint32) * 4 +
                  (d[:, 1] > 0).astype(jnp.uint32) * 2 +
                  (d[:, 2] > 0).astype(jnp.uint32))
            q = jnp.clip(((o - lo) * inv_ext * 1024.0), 0.0, 1023.0).astype(jnp.uint32)
            qd = jnp.clip((jnp.abs(d) * 15.999), 0.0, 15.0).astype(jnp.uint32)
            om = m10(q) >> 14  # 16 bits
            dm = m10(qd) & 0xFFF  # 12 bits
            if layout == "base-o16d12":
                return (oc << 28) | (om << 12) | dm
            if layout == "dir-major":
                return (oc << 28) | (dm << 16) | om
            if layout == "interleave-o8d12o8":
                return (oc << 28) | ((om >> 8) << 20) | (dm << 8) | (om & 0xFF)
            if layout == "origin-only":
                return (oc << 28) | (om << 12)
            if layout == "dir6-o14d8":
                qd6 = jnp.clip((jnp.abs(d) * 3.999), 0.0, 3.0).astype(jnp.uint32)
                d6 = (qd6[:, 0] << 4) | (qd6[:, 1] << 2) | qd6[:, 2]
                om14 = m10(q) >> 16
                return (oc << 28) | (d6 << 22) | (om14 << 8) | (dm >> 4)
            raise ValueError(layout)
        return keys

    lo = sa.world_center - sa.world_radius
    inv_ext = 1.0 / jnp.maximum(2.0 * sa.world_radius, 1e-20)

    for layout in ("base-o16d12", "dir-major", "interleave-o8d12o8",
                   "origin-only", "dir6-o14d8"):
        keyfn = make_keys(layout)

        def traverse(o, d, t):
            ks = jnp.where(t > 0, keyfn(o, d, lo, inv_ext), jnp.uint32(0xFFFFFFFF))
            perm = jax.lax.optimization_barrier(jnp.argsort(ks))
            packed = jnp.concatenate([o, d, t[:, None], jnp.zeros_like(t)[:, None]], axis=1)[perm]
            blocks, _R, _B = pb.pack_rays(packed[:, 0:3], packed[:, 3:6], packed[:, 6])
            meta = sa.wmeta_tab
            out = pb._run(sa.wnode_tab, sa.wprim_tab, blocks, static.wide_root,
                          False, False, meta=meta, joint=False)
            return out[:, 5, 0], out[:, 0, :]

        tj = jax.jit(traverse)
        pops, tvals = tj(o_b, w, t_q)
        np.asarray(tvals)[:1]
        total_pops = float(jnp.sum(pops))
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            pops, tvals = tj(o_b, w, t_q)
            np.asarray(tvals)[:1]
            best = min(best, time.perf_counter() - t0)
        print(f"{layout:22s} pops/ray={total_pops / n_live:6.2f} "
              f"{best * 1e3:8.2f} ms = {n_live / best / 1e6:5.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
