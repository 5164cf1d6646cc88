"""Does spp batching shrink packet-traversal unions on REAL bounce waves?

ROOFLINE.md §3 projects "~4x at best" from amortizing packet unions over
rays that share an (origin-cell, direction-octant) bin; the spp_k e2e
sweep (bench.py PBRT_TPU_SPP_K) measures the whole wave. This probe
isolates the traversal: build a real first-bounce wave from the 123k-tri
bench scene (camera hits -> k cosine-sampled bounce rays per surface
point), then measure the packet kernel's pops/ray and Mrays/s at
k = 1, 2, 4, 8 with the production coherence sort.

If pops/ray is flat in k, the union is direction-fan-limited and the
lever is refuted at the traversal level too (goes in ROOFLINE.md §2 as a
measured row); if pops/ray drops but e2e doesn't, the gain is being
eaten outside the kernel (sort/regen/shading).

Usage: python tools/cohere_probe.py [--pixels 131072]
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

    # camera hits for R film positions (stratified over the film)
    key = jax.random.PRNGKey(0)
    px = jax.random.uniform(key, (R,)) * W
    py = jax.random.uniform(jax.random.fold_in(key, 1), (R,)) * H

    @jax.jit
    def first_hit():
        o, d = generate_rays(cam, px, py, jnp.zeros(R), jnp.zeros(R))
        hit = intersect(sa, static, o, d, jnp.full(R, jnp.inf, jnp.float32))
        si = surface_interaction(sa, hit, o, d)
        return si["p"], si["ns"], si["ng"], si["ss"], si["ts"], si["valid"], d

    p, ns, ng, ss, ts, valid, d_cam = first_hit()
    jax.block_until_ready(p)
    nvalid = int(jnp.sum(valid))
    print(f"tris={static.n_tris} pixels={R} camera-hits={nvalid}", flush=True)

    def bounce_rays(k):
        """k cosine-sampled continuation rays per surface point."""
        kk = jax.random.fold_in(key, 100 + k)
        u1 = jax.random.uniform(kk, (k * R,))
        u2 = jax.random.uniform(jax.random.fold_in(kk, 1), (k * R,))
        r = jnp.sqrt(u1)
        phi = 2 * jnp.pi * u2
        wl = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                        jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))], axis=-1)
        sst = jnp.tile(ss, (k, 1))
        tst = jnp.tile(ts, (k, 1))
        nst = jnp.tile(ns, (k, 1))
        w = wl[:, 0:1] * sst + wl[:, 1:2] * tst + wl[:, 2:3] * nst
        o_b = _offset_ray(jnp.tile(p, (k, 1)), jnp.tile(ng, (k, 1)), w)
        t_q = jnp.where(jnp.tile(valid, (k,)), jnp.inf, -1.0)
        return o_b, w, t_q

    interp = jax.default_backend() == "cpu"

    for k in (1, 2, 4, 8):
        o_b, d_b, t_q = jax.jit(bounce_rays, static_argnums=0)(k)
        jax.block_until_ready(o_b)
        n_live = k * nvalid

        pops_fn = jax.jit(lambda o, d, t: pb.wide_pop_counts(
            sa, static, o, d, t, any_hit=False, interpret=interp, sort=True))
        pops = pops_fn(o_b, d_b, t_q)
        total_pops = float(jnp.sum(pops))
        npackets = int(pops.shape[0])

        trav = jax.jit(lambda o, d, t: pb.wide_intersect(
            sa, static, o, d, t, any_hit=False, interpret=interp, sort=True)[0])
        out = trav(o_b, d_b, t_q)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(trav(o_b, d_b, t_q))[:1]
            best = min(best, time.perf_counter() - t0)
        print(f"k={k}: rays={n_live} pops/packet={total_pops / npackets:8.1f} "
              f"pops/live-ray={total_pops / max(n_live, 1):6.2f} "
              f"traverse {best * 1e3:8.2f} ms = {n_live / best / 1e6:6.2f} Mrays/s",
              flush=True)


if __name__ == "__main__":
    main()
