"""Probe: per-ray candidate-cluster statistics on the bench mesh scene.

For nearest-first consumption the #rounds a ray needs is the number of
candidate clusters whose entry-t is < its closest-hit t (+1 for the hit
cluster itself). Prints the distribution for camera and incoherent waves.
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _mesh_scene
from pbrt_tpu.device.camera import generate_rays, make_camera
from pbrt_tpu.scene.builder import compile_scene
from pbrt_tpu.scene.clusters import build_clusters


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    desc = _mesh_scene()
    cs = compile_scene(desc)
    sa, static = cs.arrays, cs.static
    tp = np.asarray(sa.tri_p)  # (T, 3, 3)
    prim_rows = np.asarray(sa.tri_prim_ids)
    ct = build_clusters(tp[:, 0], tp[:, 1], tp[:, 2], prim_rows, K=K)
    C = ct.bounds_lo.shape[0]
    print(f"T={tp.shape[0]} K={K} C={C}")

    R = 1 << 16
    W, H = 1000, 500
    cam = make_camera(desc.camera, desc.film)
    key = jax.random.PRNGKey(0)
    px = jax.random.uniform(key, (R,)) * W
    py = jax.random.uniform(jax.random.fold_in(key, 1), (R,)) * H
    o_cam, d_cam = generate_rays(cam, px, py, jnp.zeros(R), jnp.zeros(R))
    k2 = jax.random.fold_in(key, 2)
    o_inc = jax.random.uniform(k2, (R, 3), minval=-3.5, maxval=3.5) * jnp.asarray([1.0, 0.4, 1.0]) + jnp.asarray([0.0, 1.2, 0.0])
    d_inc = jax.random.normal(jax.random.fold_in(key, 3), (R, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=1, keepdims=True)

    lo = jnp.asarray(ct.bounds_lo)
    hi = jnp.asarray(ct.bounds_hi)

    from pbrt_tpu.device.intersect import _intersect_once

    @jax.jit
    def stats(o, d):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
        t0 = (lo[None] - o[:, None, :]) * inv[:, None, :]
        t1 = (hi[None] - o[:, None, :]) * inv[:, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), axis=2)
        tf = jnp.min(jnp.maximum(t0, t1), axis=2)
        te = jnp.where((tn <= tf) & (tf > 0), jnp.maximum(tn, 0.0), jnp.inf)  # (R, C)
        hit = _intersect_once(sa, static, o, d, jnp.full(R, 1e30, jnp.float32))
        t_hit = hit["t"]
        n_before = jnp.sum(te < jnp.minimum(t_hit, 1e29)[:, None], axis=1)
        n_total = jnp.sum(jnp.isfinite(te), axis=1)
        return n_before, n_total, t_hit

    for name, o, d in (("camera", o_cam, d_cam), ("incoherent", o_inc, d_inc)):
        nb, nt, th = stats(o, d)
        nb = np.asarray(nb)
        nt = np.asarray(nt)
        miss = ~np.isfinite(np.asarray(th))
        print(f"{name}: miss={miss.mean():.3f}")
        print(f"  rounds-needed (cands with te<t_hit, +1): "
              f"mean={nb.mean()+1:.2f} p50={np.percentile(nb,50)+1:.0f} "
              f"p90={np.percentile(nb,90)+1:.0f} p99={np.percentile(nb,99)+1:.0f} "
              f"max={nb.max()+1}")
        print(f"  total candidates along ray: mean={nt.mean():.2f} "
              f"p99={np.percentile(nt,99):.0f} max={nt.max()}")


if __name__ == "__main__":
    main()
