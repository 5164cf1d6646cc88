"""Cluster-list traversal tier: host build invariants + device parity.

Parity gate: cluster_intersect must agree with the XLA packet traversal
(_traverse) on closest-hit t/prim/barycentrics and on any-hit occlusion,
for camera-coherent and incoherent waves over a real mesh — the same
pattern as tests/test_widebvh.py. Kernel runs in interpret mode on CPU.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pbrt_tpu.scene.clusters import TRI_F, build_sah_clusters, pack_cluster_table


def _mesh(n=28, seed=0):
    """Bumpy terrain grid (2*n^2 tris) like the bench scene, small."""
    rng = np.random.default_rng(seed)
    us = np.linspace(-2, 2, n + 1)
    gu, gv = np.meshgrid(us, us)
    gy = 0.6 * np.sin(1.7 * gu) * np.cos(1.3 * gv)
    verts = np.stack([gu, gy, gv], axis=-1).reshape(-1, 3)
    idx = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            b, c, d = a + 1, a + n + 1, a + n + 2
            idx.append([a, c, b])
            idx.append([b, c, d])
    idx = np.asarray(idx, np.int64)
    tv = verts[idx]  # (T, 3, 3)
    return tv.astype(np.float32)


def test_sah_clusters_cover_all_tris():
    tv = _mesh()
    T = tv.shape[0]
    ct = build_sah_clusters(tv[:, 0], tv[:, 1], tv[:, 2], np.arange(T), K=32)
    rows = ct.tri_rows.reshape(ct.n_clusters, 32, TRI_F)
    valid = rows[:, :, 10] > 0
    prims = rows[:, :, 9][valid].astype(np.int64)
    assert sorted(prims.tolist()) == list(range(T))  # every tri exactly once
    # every valid tri's verts inside its cluster AABB
    for c in range(ct.n_clusters):
        v = rows[c][valid[c]][:, 0:9].reshape(-1, 3)
        if len(v):
            assert (v >= ct.cl_lo[c] - 1e-4).all()
            assert (v <= ct.cl_hi[c] + 1e-4).all()


def test_pack_cluster_table_roundtrip():
    tv = _mesh(12)
    T = tv.shape[0]
    ct = build_sah_clusters(tv[:, 0], tv[:, 1], tv[:, 2], np.arange(T), K=32)
    tab = pack_cluster_table(ct)
    rows = ct.tri_rows.reshape(ct.n_clusters, 32, TRI_F)
    # unpack cluster c, tri i: block c//2, sublane i%8, lanes
    # (c%2)*64 + (i//8)*16 ..
    for c in (0, 1, ct.n_clusters - 1):
        for i in (0, 7, 8, 31):
            blk = tab[(c // 2) * 8 + i % 8]
            lane0 = (c % 2) * 64 + (i // 8) * 16
            got = blk[lane0:lane0 + 16]
            np.testing.assert_array_equal(got[0:9], rows[c, i, 0:9])
            assert got[9] == rows[c, i, 10]  # valid
            assert got[10] == rows[c, i, 9]  # prim row


@pytest.fixture(scope="module")
def scene():
    """Compile a mesh scene with cluster tables (forced on CPU)."""
    import os

    os.environ["PBRT_TPU_CLUSTER"] = "1"
    from pbrt_tpu.core.transform import Transform
    from pbrt_tpu.scene.builder import compile_scene
    from pbrt_tpu.scene.host import (
        CameraConfig, FilmConfig, HostMaterial, HostPrimitive,
        SceneDescription, ShapeRecord, TriangleMesh,
    )

    tv = _mesh()
    verts = tv.reshape(-1, 3).astype(np.float64)
    idx = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
    prim = HostPrimitive(
        shape=ShapeRecord(mesh=TriangleMesh(p=verts, indices=idx)),
        material=HostMaterial(kind="matte", params={"Kd": ("const", np.asarray([0.5, 0.5, 0.5]))}),
    )
    desc = SceneDescription(
        primitives=[prim], lights=[],
        camera=CameraConfig(kind="perspective",
                            camera_to_world=Transform.look_at([0, 2.5, 3.5], [0, 0, 0], [0, 1, 0]),
                            fov=60.0),
        film=FilmConfig(x_resolution=64, y_resolution=64),
    )
    cs = compile_scene(desc)
    assert cs.static.has_cluster and cs.static.n_clusters > 1
    yield cs
    os.environ.pop("PBRT_TPU_CLUSTER", None)


def _rays(R, seed=3):
    key = jax.random.PRNGKey(seed)
    o = jax.random.uniform(key, (R, 3), minval=-2.0, maxval=2.0) * jnp.asarray([1.0, 0.5, 1.0]) + jnp.asarray([0.0, 1.0, 0.0])
    d = jax.random.normal(jax.random.fold_in(key, 1), (R, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return o, d


@pytest.mark.parametrize("sort", [False, True])
def test_cluster_closest_parity(scene, sort):
    from pbrt_tpu.device.cluster_list import cluster_intersect
    from pbrt_tpu.device.intersect import _traverse

    sa, static = scene.arrays, scene.static
    R = 700
    o, d = _rays(R)
    t_max = jnp.full(R, jnp.inf, jnp.float32)
    ref, _ = _traverse(sa, static, o, d, t_max, any_hit=False)
    t, prim, hit, b1, b2 = cluster_intersect(sa, static, o, d, t_max,
                                             interpret=True, sort=sort)
    ref_hit = np.asarray(ref["prim"]) >= 0
    np.testing.assert_array_equal(np.asarray(hit), ref_hit)
    np.testing.assert_allclose(np.asarray(t)[ref_hit], np.asarray(ref["t"])[ref_hit],
                               rtol=1e-5, atol=1e-5)
    # prim may differ only on exact-t ties; require t parity everywhere and
    # prim parity almost everywhere
    same_prim = np.asarray(prim)[ref_hit] == np.asarray(ref["prim"])[ref_hit]
    assert same_prim.mean() > 0.995
    np.testing.assert_allclose(np.asarray(b1)[ref_hit][same_prim],
                               np.asarray(ref["b1"])[ref_hit][same_prim], atol=2e-4)
    np.testing.assert_allclose(np.asarray(b2)[ref_hit][same_prim],
                               np.asarray(ref["b2"])[ref_hit][same_prim], atol=2e-4)


def test_cluster_anyhit_parity(scene):
    from pbrt_tpu.device.cluster_list import cluster_intersect
    from pbrt_tpu.device.intersect import _traverse

    sa, static = scene.arrays, scene.static
    R = 600
    o, d = _rays(R, seed=5)
    # finite t_max, some dead lanes
    key = jax.random.PRNGKey(9)
    t_max = jnp.where(jax.random.uniform(key, (R,)) < 0.1, -1.0, 2.5)
    _, ref_any = _traverse(sa, static, o, d, t_max, any_hit=True)
    _t, _p, hit = cluster_intersect(sa, static, o, d, t_max, any_hit=True,
                                    interpret=True, sort=True)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref_any))


def test_cluster_overflow_fallback(scene, monkeypatch):
    """Force a tiny segment cap so packets overflow and the wide-BVH
    fallback runs."""
    from pbrt_tpu.device import cluster_list as cl

    monkeypatch.setattr(cl, "SEGCAP", 2)
    from pbrt_tpu.device.intersect import _traverse

    sa, static = scene.arrays, scene.static
    R = 600
    o, d = _rays(R, seed=7)
    t_max = jnp.full(R, jnp.inf, jnp.float32)
    ref, _ = _traverse(sa, static, o, d, t_max, any_hit=False)
    t, prim, hit, b1, b2 = cl.cluster_intersect(sa, static, o, d, t_max,
                                                interpret=True, sort=True)
    ref_hit = np.asarray(ref["prim"]) >= 0
    np.testing.assert_array_equal(np.asarray(hit), ref_hit)
    np.testing.assert_allclose(np.asarray(t)[ref_hit], np.asarray(ref["t"])[ref_hit],
                               rtol=1e-5, atol=1e-5)
