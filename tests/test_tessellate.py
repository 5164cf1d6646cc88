"""Host tessellation tests (numpy only; no device compile).

Covers the curve/loopsubdiv/nurbs/heightfield conversions (reference:
src/shapes/{curve,loopsubdiv,nurbs,heightfield}.rs) at the mesh level.
"""
import numpy as np

from pbrt_tpu.core.transform import Transform
from pbrt_tpu.scene.tessellate import (
    loop_subdivide,
    tessellate_curve,
    tessellate_heightfield,
    tessellate_nurbs,
)

I = Transform.identity()


def test_heightfield_grid():
    nu, nv = 4, 3
    pz = np.arange(nu * nv, dtype=np.float64) * 0.1
    m = tessellate_heightfield(I, nu, nv, pz, False)
    assert m.p.shape == (nu * nv, 3)
    assert m.indices.shape == ((nu - 1) * (nv - 1) * 2, 3)
    # z values preserved
    np.testing.assert_allclose(m.p[:, 2], pz)
    # all indices valid
    assert m.indices.min() >= 0 and m.indices.max() < nu * nv


def test_curve_flat_strip():
    cp = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]], np.float64)
    m = tessellate_curve(I, cp, 0.2, 0.2, "flat", n_segments=8)
    assert len(m.indices) == 16  # 8 segments x 2 tris
    # strip width ~ 0.2 everywhere
    p = m.p.reshape(9, 2, 3)
    widths = np.linalg.norm(p[:, 0] - p[:, 1], axis=-1)
    np.testing.assert_allclose(widths, 0.2, rtol=1e-6)
    # x spans [0, 3]
    assert abs(p[0, 0, 0] - 0.0) < 1e-9 and abs(p[-1, 0, 0] - 3.0) < 1e-9


def test_curve_cylinder_tube():
    cp = np.array([[0, 0, 0], [0, 1, 0], [0, 2, 0], [0, 3, 0]], np.float64)
    m = tessellate_curve(I, cp, 0.5, 0.1, "cylinder", n_segments=4, n_radial=6)
    # radius tapers from 0.25 to 0.05 around the y axis
    p = m.p.reshape(5, 7, 3)
    r0 = np.linalg.norm(p[0][:, [0, 2]], axis=-1)
    r1 = np.linalg.norm(p[-1][:, [0, 2]] - p[-1][:, [0, 2]].mean(0), axis=-1)
    np.testing.assert_allclose(r0, 0.25, rtol=1e-5)
    assert r1.mean() < 0.08


def test_loop_subdiv_tetrahedron_converges_to_smooth():
    # tetrahedron
    v = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], np.float64)
    f = np.array([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]], np.int32)
    m = loop_subdivide(I, 2, f, v, False)
    assert len(m.indices) == 4 * 16  # each level x4
    assert len(m.p) > len(v)
    # subdivision shrinks the shape toward the centroid, stays bounded
    assert np.abs(m.p).max() <= 1.0 + 1e-9
    assert np.abs(m.p).max() > 0.3
    # surface stays closed: every edge shared by exactly 2 triangles
    from collections import Counter

    edges = Counter()
    for tri in m.indices:
        a, b, c = sorted(map(int, tri[:1])) + [0, 0]
        t = list(map(int, tri))
        for e in range(3):
            x, y = t[e], t[(e + 1) % 3]
            edges[(min(x, y), max(x, y))] += 1
    assert set(edges.values()) == {2}


def test_nurbs_flat_patch():
    # degree-1 NURBS in both directions = bilinear patch
    nu = nv = 2
    uorder = vorder = 2
    uknots = vknots = [0, 0, 1, 1]
    p = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]], np.float64)
    m = tessellate_nurbs(I, nu, uorder, uknots, 0, 1, nv, vorder, vknots, 0, 1, p, None, False, diceu=5, dicev=5)
    assert m.p.shape == (25, 3)
    # corners interpolated
    corners = {tuple(np.round(c, 6)) for c in [m.p[0], m.p[4], m.p[20], m.p[24]]}
    expect = {(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (1.0, 1.0, 1.0)}
    assert corners == expect
