"""Probe: candidate-cluster statistics for the cluster-list traversal tier.

Per-ray exact candidate counts (clusters whose AABB the ray enters before
its closest hit) and per-PACKET union counts (what the list-driven kernel
actually walks) on the bench mesh scene, for SAH-cut vs median-split
clusters and packet sizes 32/64.

Usage: python tools/cluster_probe.py [K] [--median]
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
from pbrt_tpu.scene.clusters import build_clusters, build_sah_clusters


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    use_median = "--median" in sys.argv
    desc = _mesh_scene()
    cs = compile_scene(desc)
    sa, static = cs.arrays, cs.static
    tp = np.asarray(sa.tri_p)  # (T, 3, 3)
    prim_rows = np.asarray(sa.tri_prim_ids)
    build = build_clusters if use_median else build_sah_clusters
    ct = build(tp[:, 0], tp[:, 1], tp[:, 2], prim_rows, K=K)
    C = ct.n_clusters
    print(f"T={tp.shape[0]} K={K} C={C} ({'median' if use_median else 'sah'})"
          f" table={ct.tri_rows.nbytes / 1e6:.1f}MB")

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

    lo = jnp.asarray(ct.cl_lo)
    hi = jnp.asarray(ct.cl_hi)

    from pbrt_tpu.device.intersect import _intersect_once, _ray_sort_key

    @jax.jit
    def stats(o, d):
        """On-device reductions (the (R, C) matrix never leaves the chip)."""
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
        t0 = (lo[None] - o[:, None, :]) * inv[:, None, :]
        t1 = (hi[None] - o[:, None, :]) * inv[:, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), axis=2)
        tf = jnp.min(jnp.maximum(t0, t1), axis=2)
        te = jnp.where((tn <= tf) & (tf > 0), jnp.maximum(tn, 0.0), jnp.inf)
        hit = _intersect_once(sa, static, o, d, jnp.full(R, 1e30, jnp.float32))
        need = te < jnp.minimum(hit["t"], 1e29)[:, None]
        n_ray = jnp.sum(need, axis=1)
        out = {"n_ray": n_ray}
        for P in (32, 64, 128):
            out[f"u{P}"] = jnp.sum(jnp.any(need.reshape(R // P, P, C), axis=1), axis=1)
            out[f"f{P}"] = jnp.sum(
                jnp.any(jnp.isfinite(te).reshape(R // P, P, C), axis=1), axis=1)
        return out

    def pct(x, q):
        return float(np.percentile(x, q))

    for name, o, d in (("camera", o_cam, d_cam), ("incoherent", o_inc, d_inc)):
        # sort rays the way production does, so packets match the kernel's
        key_s = _ray_sort_key(sa, o, d)
        perm = jnp.argsort(key_s)
        st = jax.device_get(stats(o[perm], d[perm]))
        n_ray = st["n_ray"]
        print(f"{name}: per-ray exact cands: mean={n_ray.mean():.1f} "
              f"p90={pct(n_ray, 90):.0f} p99={pct(n_ray, 99):.0f} max={n_ray.max()}")
        for P in (32, 64, 128):
            u, full = st[f"u{P}"], st[f"f{P}"]
            print(f"  P={P:3d}: union(need) mean={u.mean():6.1f} p99={pct(u, 99):5.0f} "
                  f"max={u.max():4d} | union(all-te) mean={full.mean():6.1f} "
                  f"p99={pct(full, 99):5.0f} max={full.max()}")


if __name__ == "__main__":
    main()
