"""Wide-BVH Pallas traversal vs the XLA packet traversal (interpret mode).

The Pallas kernel (device/pallas_bvh.py) must produce the same hit set as
the reference-semantics XLA traversal (intersect.py) — same closest prim
and t up to the FP tolerance between Moeller-Trumbore and the watertight
test. Runs on CPU in Pallas interpret mode (PBRT_TPU_WIDE=1 opt-in)."""
import os

import numpy as np
import pytest

import jax.numpy as jnp


def _tri_scene(n_side=10):
    """A bumpy triangulated grid: enough prims to build a real wide tree."""
    rs = np.random.RandomState(7)
    xs = np.linspace(-1, 1, n_side + 1)
    zs = np.linspace(-1, 1, n_side + 1)
    gx, gz = np.meshgrid(xs, zs)
    gy = 0.3 * np.sin(3 * gx) * np.cos(2 * gz) + 0.03 * rs.rand(*gx.shape)
    verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    idx = []
    for i in range(n_side):
        for j in range(n_side):
            a = i * (n_side + 1) + j
            b = a + 1
            c = a + n_side + 1
            d = c + 1
            idx.append([a, c, b])
            idx.append([b, c, d])
    return verts[np.asarray(idx)]  # (T, 3, 3)


def test_wide_matches_xla_traversal(monkeypatch):
    from pbrt_tpu.scene.widebvh import build_wide_bvh
    from pbrt_tpu.device import pallas_bvh

    tri = _tri_scene(10).astype(np.float32)  # 200 tris
    w = build_wide_bvh(tri.min(axis=1), tri.max(axis=1), tri[:, 0], tri[:, 1], tri[:, 2])
    assert w.n_octets * 8 >= tri.shape[0]
    assert (np.sort(w.slot_prim[w.slot_prim >= 0]) == np.arange(tri.shape[0])).all()

    class SA:
        pass

    class ST:
        pass

    sa = SA()
    sa.wnode_tab = jnp.asarray(w.node_tab)
    sa.wprim_tab = jnp.asarray(w.prim_tab)
    st = ST()
    st.wide_root = w.root

    R = 192
    rs = np.random.RandomState(3)
    o = np.stack([
        rs.uniform(-1, 1, R), np.full(R, 2.0), rs.uniform(-1, 1, R)
    ], axis=-1).astype(np.float32)
    d = np.stack([
        rs.uniform(-0.3, 0.3, R), -np.ones(R), rs.uniform(-0.3, 0.3, R)
    ], axis=-1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # half the rays graze the grid's bounding box but miss every triangle
    # (origins beyond the +x edge, pointing down): with t_max = inf these
    # guard against the miss-sentinel phantom-hit regression (a leaf visit
    # with zero lane hits must not register as a hit)
    o[R // 2:, 0] = rs.uniform(1.05, 1.4, R - R // 2)
    d[R // 2:] = np.array([0.0, -1.0, 0.0], np.float32)
    tmax = np.full(R, np.inf, np.float32)

    # SMEM-meta and vstack stack layouts must agree exactly
    sa.wmeta_tab = jnp.asarray(w.meta_tab)
    t, prim, hit, b1, b2 = pallas_bvh.wide_intersect(
        sa, st, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax), interpret=True
    )
    sa2 = SA()
    sa2.wnode_tab = sa.wnode_tab
    sa2.wprim_tab = sa.wprim_tab
    t_v, prim_v, hit_v, b1_v, b2_v = pallas_bvh.wide_intersect(
        sa2, st, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax), interpret=True
    )
    assert (np.asarray(hit) == np.asarray(hit_v)).all()
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(prim_v))
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_v), rtol=1e-6)
    t = np.asarray(t)
    hit = np.asarray(hit)
    prim = np.where(hit, np.asarray(prim), -1)
    b1 = np.asarray(b1)
    b2 = np.asarray(b2)

    # brute-force reference over all tris with the SAME watertight test the
    # kernel and the XLA path use (intersect.ray_triangle)
    from pbrt_tpu.device.intersect import ray_triangle

    hb, tb, _b0, _b1, _b2 = ray_triangle(
        jnp.asarray(o)[:, None, :], jnp.asarray(d)[:, None, :],
        jnp.asarray(tri[None, :, 0]), jnp.asarray(tri[None, :, 1]), jnp.asarray(tri[None, :, 2]),
        jnp.full((R, 1), 1e30, jnp.float32),
    )
    tt = np.where(np.asarray(hb), np.asarray(tb), np.inf)
    t_ref = tt.min(axis=1)
    hit_ref = np.isfinite(t_ref)

    assert hit_ref.sum() > 50
    assert (hit == hit_ref).all()
    np.testing.assert_allclose(t[hit_ref], t_ref[hit_ref], rtol=1e-4)
    assert (prim[hit_ref] == tt.argmin(axis=1)[hit_ref]).mean() > 0.99

    # barycentrics returned from the kernel must match a direct watertight
    # evaluation of the winning triangle
    from pbrt_tpu.device.intersect import ray_triangle as rt1

    pr = np.maximum(prim, 0)
    _hh, _tt2, _b0r, b1r, b2r = rt1(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(tri[pr, 0]), jnp.asarray(tri[pr, 1]), jnp.asarray(tri[pr, 2]),
        jnp.full(R, np.inf, jnp.float32),
    )
    m = hit_ref & (prim == tt.argmin(axis=1))
    np.testing.assert_allclose(b1[m], np.asarray(b1r)[m], atol=1e-4)
    np.testing.assert_allclose(b2[m], np.asarray(b2r)[m], atol=1e-4)

    # any-hit (shadow) parity: the joint SMEM-meta kernel's early-exit path
    # must agree with the vstack kernel and with the brute-force occlusion
    # set; bounded t_max leaves the far half of the rays unoccluded
    tmax_sh = np.where(np.isfinite(t), t * 0.95, 2.0).astype(np.float32)
    t_s, slot_s, hit_s = pallas_bvh.wide_intersect(
        sa, st, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax_sh),
        any_hit=True, interpret=True,
    )
    t_v2, slot_v2, hit_v2 = pallas_bvh.wide_intersect(
        sa2, st, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax_sh),
        any_hit=True, interpret=True,
    )
    assert (np.asarray(hit_s) == np.asarray(hit_v2)).all()
    occ_ref = (tt < tmax_sh[:, None] - 1e-6).any(axis=1)
    agree = np.asarray(hit_s) == occ_ref
    # t*0.95 sits close to the surface; allow boundary-FP stragglers only
    assert agree.mean() > 0.97
