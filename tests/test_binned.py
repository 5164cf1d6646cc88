"""Binned per-ray traversal tier (device/binned.py): host supernode
invariants + device parity against the XLA packet traversal.

Same parity gate as tests/test_cluster_list.py: closest-hit t/prim/
barycentrics and any-hit occlusion must match _traverse on coherent and
incoherent waves. The binned tier is pure XLA (no kernels), so it runs
natively on CPU.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_cluster_list import _mesh


def test_supernodes_cover_all_clusters():
    from pbrt_tpu.scene.clusters import SUPER_M, build_sah_clusters

    tv = _mesh()
    T = tv.shape[0]
    ct = build_sah_clusters(tv[:, 0], tv[:, 1], tv[:, 2], np.arange(T), K=32)
    assert ct.su_members is not None
    mem = ct.su_members
    assert mem.shape[1] == SUPER_M
    ids = mem[mem >= 0]
    # every REAL (non-pad) cluster in exactly one supernode: real ids are
    # the ones whose AABB is non-degenerate (segment padding never hits)
    real = np.where(ct.cl_lo[:, 0] < 1e38)[0]
    assert sorted(ids.tolist()) == sorted(real.tolist())
    # member cluster AABBs inside their supernode AABB
    for s in range(mem.shape[0]):
        m = mem[s][mem[s] >= 0]
        assert (ct.cl_lo[m] >= ct.su_lo[s] - 1e-5).all()
        assert (ct.cl_hi[m] <= ct.su_hi[s] + 1e-5).all()


@pytest.fixture(scope="module")
def scene():
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
    assert cs.static.has_cluster and cs.arrays.su_lo is not None
    yield cs
    os.environ.pop("PBRT_TPU_CLUSTER", None)


def _rays(R, seed=3):
    key = jax.random.PRNGKey(seed)
    o = jax.random.uniform(key, (R, 3), minval=-2.0, maxval=2.0) * jnp.asarray([1.0, 0.5, 1.0]) + jnp.asarray([0.0, 1.0, 0.0])
    d = jax.random.normal(jax.random.fold_in(key, 1), (R, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_binned_closest_parity(scene):
    from pbrt_tpu.device.binned import binned_intersect
    from pbrt_tpu.device.intersect import _traverse

    sa, static = scene.arrays, scene.static
    R = 700
    o, d = _rays(R)
    t_max = jnp.full(R, jnp.inf, jnp.float32)
    ref, _ = _traverse(sa, static, o, d, t_max, any_hit=False)
    t, prim, hit, b1, b2 = binned_intersect(sa, static, o, d, t_max)
    ref_hit = np.asarray(ref["prim"]) >= 0
    np.testing.assert_array_equal(np.asarray(hit), ref_hit)
    np.testing.assert_allclose(np.asarray(t)[ref_hit], np.asarray(ref["t"])[ref_hit],
                               rtol=1e-5, atol=1e-5)
    same_prim = np.asarray(prim)[ref_hit] == np.asarray(ref["prim"])[ref_hit]
    assert same_prim.mean() > 0.995  # exact-t ties only
    np.testing.assert_allclose(np.asarray(b1)[ref_hit][same_prim],
                               np.asarray(ref["b1"])[ref_hit][same_prim], atol=2e-4)
    np.testing.assert_allclose(np.asarray(b2)[ref_hit][same_prim],
                               np.asarray(ref["b2"])[ref_hit][same_prim], atol=2e-4)


def test_binned_onehot_phase2_parity(scene):
    """The one-hot MXU supernode fetch (PBRT_TPU_BINNED_ONEHOT=1) must
    reproduce the row-gather tier's results: cluster ids reconstruct
    exactly and the bf16-split bounds are conservative, so hits match the
    XLA packet reference the same way the gather path does."""
    import os

    from pbrt_tpu.device.binned import binned_intersect
    from pbrt_tpu.device.intersect import _traverse

    sa, static = scene.arrays, scene.static
    R = 700
    o, d = _rays(R, seed=7)
    t_max = jnp.full(R, jnp.inf, jnp.float32)
    ref, _ = _traverse(sa, static, o, d, t_max, any_hit=False)
    os.environ["PBRT_TPU_BINNED_ONEHOT"] = "1"
    try:
        t, prim, hit, b1, b2 = binned_intersect(sa, static, o, d, t_max)
    finally:
        os.environ.pop("PBRT_TPU_BINNED_ONEHOT", None)
    ref_hit = np.asarray(ref["prim"]) >= 0
    np.testing.assert_array_equal(np.asarray(hit), ref_hit)
    np.testing.assert_allclose(np.asarray(t)[ref_hit], np.asarray(ref["t"])[ref_hit],
                               rtol=1e-5, atol=1e-5)
    same_prim = np.asarray(prim)[ref_hit] == np.asarray(ref["prim"])[ref_hit]
    assert same_prim.mean() > 0.995  # exact-t ties only


def test_binned_anyhit_parity(scene):
    from pbrt_tpu.device.binned import binned_intersect
    from pbrt_tpu.device.intersect import _traverse

    sa, static = scene.arrays, scene.static
    R = 700
    o, d = _rays(R, seed=11)
    # finite shadow distances: half short, half long
    t_max = jnp.where(jnp.arange(R) % 2 == 0, 0.8, 50.0).astype(jnp.float32)
    _, ref_any = _traverse(sa, static, o, d, t_max, any_hit=True)
    _t, _p, hit_any, _b1, _b2 = binned_intersect(sa, static, o, d, t_max, any_hit=True)
    np.testing.assert_array_equal(np.asarray(hit_any), np.asarray(ref_any))


def test_binned_dead_lanes(scene):
    """t_max < 0 lanes stay dead (the persistent wave's dead-lane marker)."""
    from pbrt_tpu.device.binned import binned_intersect

    sa, static = scene.arrays, scene.static
    R = 128
    o, d = _rays(R, seed=5)
    t_max = jnp.full(R, -1.0, jnp.float32)
    t, prim, hit, b1, b2 = binned_intersect(sa, static, o, d, t_max)
    assert not bool(np.asarray(hit).any())


def test_binned_extract_bits():
    from pbrt_tpu.device.binned import _extract_bits

    rng = np.random.default_rng(0)
    R, W, K = 64, 4, 16
    words = rng.integers(0, 2 ** 32, (R, W), dtype=np.uint32)
    # force some rows sparse / empty
    words[:8] = 0
    words[8:16, 1:] = 0
    idx, ovf = _extract_bits(jnp.asarray(words), K)
    idx = np.asarray(idx)
    ovf = np.asarray(ovf)
    for r in range(R):
        bits = [w_ * 32 + b for w_ in range(W) for b in range(32)
                if (int(words[r, w_]) >> b) & 1]
        want = bits[:K]
        got = [i for i in idx[r] if i >= 0]
        assert got == want
        assert bool(ovf[r]) == (len(bits) > K)
