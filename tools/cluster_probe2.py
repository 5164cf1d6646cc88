"""Probe: per-packet candidate-list lengths under PRODUCTION wave shapes.

cluster_probe.py sampled 65k random film points — 8x sparser than a real
camera wave, which makes packets look far less coherent than production.
This probe builds the bench scene's real waves:

  - camera wave: every pixel of the 1000x500 film, jittered (R = 500k)
  - bounce wave: cosine-sampled diffuse bounce directions from the actual
    camera hits (the worst-case incoherent wave the integrator produces)

sorts them with the production coherence keys, and reports per-packet
union candidate counts (= list-driven kernel rounds) chunked over the
cluster table so the (R, C) matrix never materializes.
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
from pbrt_tpu.scene.clusters import build_sah_clusters


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    desc = _mesh_scene()
    cs = compile_scene(desc)
    sa, static = cs.arrays, cs.static
    tp = np.asarray(sa.tri_p)
    ct = build_sah_clusters(tp[:, 0], tp[:, 1], tp[:, 2],
                            np.asarray(sa.tri_prim_ids), K=K)
    C = ct.n_clusters
    print(f"T={tp.shape[0]} K={K} C={C} table={ct.tri_rows.nbytes / 1e6:.1f}MB")

    W, H = 1000, 500
    R = W * H
    cam = make_camera(desc.camera, desc.film)
    key = jax.random.PRNGKey(0)
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel(), jnp.float32) + jax.random.uniform(key, (R,))
    py = jnp.asarray(ys.ravel(), jnp.float32) + jax.random.uniform(jax.random.fold_in(key, 1), (R,))
    o_cam, d_cam = generate_rays(cam, px, py, jnp.zeros(R), jnp.zeros(R))

    from pbrt_tpu.device.integrator import surface_interaction
    from pbrt_tpu.device.intersect import _intersect_once
    from pbrt_tpu.device.bsdf import cosine_sample_hemisphere

    hit = jax.jit(lambda o, d: _intersect_once(sa, static, o, d, jnp.full(R, 1e30, jnp.float32)))(o_cam, d_cam)
    si = surface_interaction(sa, hit, o_cam, d_cam)
    u1 = jax.random.uniform(jax.random.fold_in(key, 2), (R,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 3), (R,))
    wl = cosine_sample_hemisphere(u1, u2)
    ns, ss, ts = si["ns"], si["ss"], si["ts"]
    d_b = wl[:, 0:1] * ss + wl[:, 1:2] * ts + wl[:, 2:3] * ns
    d_b = d_b / jnp.linalg.norm(d_b, axis=1, keepdims=True)
    o_b = si["p"] + 1e-4 * jnp.sign(jnp.sum(d_b * si["ng"], axis=1, keepdims=True)) * si["ng"]

    lo = jnp.asarray(ct.cl_lo)
    hi = jnp.asarray(ct.cl_hi)

    from pbrt_tpu.device.pallas_bvh import coherence_keys

    CHUNK = 512
    Cp = (C + CHUNK - 1) // CHUNK
    lo_p = jnp.concatenate([lo, jnp.full((Cp * CHUNK - C, 3), 1e30, jnp.float32)])
    hi_p = jnp.concatenate([hi, jnp.full((Cp * CHUNK - C, 3), -1e30, jnp.float32)])

    def probe(o, d, t_hit, tag):
        wl_ = sa.world_center - sa.world_radius
        inv_ext = 1.0 / jnp.maximum(2.0 * sa.world_radius, 1e-20)
        perm = jnp.argsort(coherence_keys(o, d, wl_, inv_ext))
        o, d, t_hit = o[perm], d[perm], t_hit[perm]
        t_cap = jnp.minimum(t_hit, 1e29)
        Rp = ((o.shape[0] + 127) // 128) * 128
        pad = Rp - o.shape[0]
        if pad:  # dead pad rays: t_cap 0 -> need always false
            o = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
            d = jnp.concatenate([d, jnp.ones((pad, 3), jnp.float32)])
            t_cap = jnp.concatenate([t_cap, jnp.zeros(pad, jnp.float32)])

        @jax.jit
        def chunk_counts(c0, o, d, t_cap):
            clo = jax.lax.dynamic_slice(lo_p, (c0, 0), (CHUNK, 3))
            chi = jax.lax.dynamic_slice(hi_p, (c0, 0), (CHUNK, 3))
            inv = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
            t0 = (clo[None] - o[:, None, :]) * inv[:, None, :]
            t1 = (chi[None] - o[:, None, :]) * inv[:, None, :]
            tn = jnp.max(jnp.minimum(t0, t1), axis=2)
            tf = jnp.min(jnp.maximum(t0, t1), axis=2)
            need = (tn <= tf) & (tf > 0) & (tn < t_cap[:, None])  # (R, CHUNK)
            per_ray = jnp.sum(need, axis=1).astype(jnp.int32)
            unions = {}
            for P in (32, 64, 128):
                unions[P] = jnp.sum(
                    jnp.any(need.reshape(-1, P, CHUNK), axis=1), axis=1).astype(jnp.int32)
            return per_ray, unions

        Rp = ((R + 127) // 128) * 128
        n_ray = np.zeros(Rp, np.int64)
        u = {P: np.zeros(Rp // P, np.int64) for P in (32, 64, 128)}
        for c0 in range(0, Cp * CHUNK, CHUNK):
            pr, un = jax.device_get(chunk_counts(c0, o, d, t_cap))
            n_ray += pr
            for P in (32, 64, 128):
                u[P] += un[P]
        n_ray = n_ray[:R]
        print(f"{tag}: per-ray need: mean={n_ray.mean():.2f} p99={np.percentile(n_ray, 99):.0f} max={n_ray.max()}")
        for P in (32, 64, 128):
            x = u[P]
            print(f"  P={P:3d}: union mean={x.mean():6.1f} p90={np.percentile(x, 90):5.0f} "
                  f"p99={np.percentile(x, 99):5.0f} max={x.max()}")

    probe(o_cam, d_cam, hit["t"], "camera(full film)")
    hit_b = jax.jit(lambda o, d: _intersect_once(sa, static, o, d, jnp.full(R, 1e30, jnp.float32)))(o_b, d_b)
    probe(o_b, d_b, hit_b["t"], "bounce(diffuse)")


if __name__ == "__main__":
    main()
