"""Kd-tree accelerator (kdtreeaccel.rs:137-524): `Accelerator "kdtree"`
must traverse the kd-tree and produce the same hits as the BVH."""
import numpy as np

import jax.numpy as jnp

from pbrt_tpu.scene.builder import compile_scene
from pbrt_tpu.scene.kdtree import build_kdtree
from pbrt_tpu.device.intersect import intersect, intersect_p


def _scene(accel):
    import tests.test_device as td

    cs = td._random_tri_scene(400)
    desc = cs.description
    desc.accelerator = accel
    return compile_scene(desc)


def test_kdtree_build_structure():
    rs = np.random.RandomState(2)
    lo = rs.rand(500, 3)
    hi = lo + 0.05 * rs.rand(500, 3)
    kd = build_kdtree(lo, hi)
    assert (kd.flags >= 0).all() and (kd.flags <= 3).all()
    leaves = kd.flags == 3
    assert leaves.sum() > 10
    # every prim appears in at least one leaf list
    assert len(np.unique(kd.prim_ids)) == 500
    # interior above-children point inside the array
    interior = ~leaves
    assert (kd.above[interior] > 0).all() and (kd.above[interior] < len(kd.flags)).all()


def test_kdtree_matches_bvh():
    cs_b = _scene("bvh")
    cs_k = _scene("kdtree")
    assert cs_k.static.accel_kind == "kdtree"
    assert cs_b.static.accel_kind == "bvh"

    R = 512
    rs = np.random.RandomState(9)
    # aim at the triangle cloud in [-1.1, 1.1]^3
    o = jnp.asarray((rs.rand(R, 3) * 1.0 - 0.5 + np.array([0, 0, 3.0])).astype(np.float32))
    tgt = rs.rand(R, 3) * 2 - 1
    d = tgt - np.asarray(o)
    d = jnp.asarray((d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32))
    tmax = jnp.full(R, np.inf, jnp.float32)

    hb = intersect(cs_b.arrays, cs_b.static, o, d, tmax)
    hk = intersect(cs_k.arrays, cs_k.static, o, d, tmax)
    tb = np.asarray(hb["t"])
    tk = np.asarray(hk["t"])
    assert (np.isfinite(tb) == np.isfinite(tk)).all()
    both = np.isfinite(tb)
    assert both.sum() > 50
    np.testing.assert_allclose(tk[both], tb[both], rtol=1e-4)
    assert (np.asarray(hb["prim"])[both] == np.asarray(hk["prim"])[both]).mean() > 0.99

    pb = np.asarray(intersect_p(cs_b.arrays, cs_b.static, o, d, jnp.full(R, 5.0, jnp.float32)))
    pk = np.asarray(intersect_p(cs_k.arrays, cs_k.static, o, d, jnp.full(R, 5.0, jnp.float32)))
    assert (pb == pk).mean() > 0.995
