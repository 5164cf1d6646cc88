"""Robustness tests the round-1 review flagged as missing:

- fixed-seed determinism (the purity analog of the reference's race-freedom;
  SURVEY.md §5 mandates bit-exact reruns),
- watertight triangle property on randomized tessellated spheres
  (tests/shapes.rs:35-60 pattern): rays through the interior can never
  escape through a shared edge/vertex crack,
- foreign-encoded image decode: the reference repo's own envmap.exr
  (half/zip, written by the Rust exr crate) and envmap.hdr (RGBE) must
  decode to the same image.
"""
import numpy as np

import jax.numpy as jnp


def test_fixed_seed_determinism():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _tiny_scene
    from pbrt_tpu.render import render

    img1 = render(_tiny_scene(res=(32, 16), spp=2), seed=7, spp=2)
    img2 = render(_tiny_scene(res=(32, 16), spp=2), seed=7, spp=2)
    assert np.array_equal(img1, img2), "fixed-seed rerun must be bit-exact"


def _tessellated_sphere(n_theta=24, n_phi=48, seed=3):
    rs = np.random.RandomState(seed)
    th = np.linspace(0, np.pi, n_theta + 1)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    verts = [(0.0, 0.0, 1.0)]
    rows = []
    for t in th[1:-1]:
        row = []
        for p in ph:
            row.append(len(verts))
            verts.append((np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)))
        rows.append(row)
    south = len(verts)
    verts.append((0.0, 0.0, -1.0))
    tris = []
    for i, v in enumerate(rows[0]):
        tris.append([0, v, rows[0][(i + 1) % n_phi]])
    for r in range(len(rows) - 1):
        a, b = rows[r], rows[r + 1]
        for i in range(n_phi):
            j = (i + 1) % n_phi
            tris.append([a[i], b[i], b[j]])
            tris.append([a[i], b[j], a[j]])
    for i, v in enumerate(rows[-1]):
        tris.append([v, south, rows[-1][(i + 1) % n_phi]])
    return np.asarray(verts, np.float32), np.asarray(tris, np.int64)


def test_watertight_randomized_sphere():
    from pbrt_tpu.device.intersect import ray_triangle

    verts, tris = _tessellated_sphere()
    tv = verts[tris]  # (T, 3, 3)
    R = 4096
    rs = np.random.RandomState(12111)  # the reference test's seed
    # rays from outside, aimed exactly at vertices/edges half the time — the
    # crack-prone targets
    o = rs.normal(size=(R, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 3.0
    # aim at mesh vertices pulled slightly INSIDE the sphere (a chord must
    # cross the surface; silhouette-grazing rays would legitimately miss
    # the inscribed polyhedron, whose faces dip to ~0.994R), plus interior points
    targets = verts[rs.randint(0, len(verts), R)] * 0.98
    rnd = rs.normal(size=(R, 3)).astype(np.float32)
    rnd = rnd / np.linalg.norm(rnd, axis=1, keepdims=True) * (rs.rand(R, 1).astype(np.float32) * 0.8)
    tgt = np.where(rs.rand(R, 1) < 0.5, targets, rnd)
    d = tgt - o
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)

    h, t, _b0, _b1, _b2 = ray_triangle(
        jnp.asarray(o)[:, None, :], jnp.asarray(d)[:, None, :],
        jnp.asarray(tv[None, :, 0]), jnp.asarray(tv[None, :, 1]), jnp.asarray(tv[None, :, 2]),
        jnp.full((R, 1), np.inf, jnp.float32),
    )
    hit_any = np.asarray(h).any(axis=1)
    assert hit_any.all(), f"{(~hit_any).sum()} rays slipped through shared-edge cracks"


def test_exr_decodes_match_hdr():
    from pbrt_tpu.core.imageio import read_image

    exr = read_image("/root/reference/src/scenes/textures/envmap.exr")
    hdr = read_image("/root/reference/src/scenes/textures/envmap.hdr")
    assert exr.shape == hdr.shape == (256, 512, 3)
    assert abs(float(exr.mean()) - 0.3305) < 0.01
    # RGBE quantizes to ~1% — the two foreign encodings must agree closely
    denom = np.maximum(np.abs(exr), 0.02)
    rel = np.abs(exr - hdr) / denom
    assert np.median(rel) < 0.01
    assert rel.mean() < 0.05


def test_error_bounded_ray_offsets():
    """offset_ray_origin parity (transform.rs:455-475): the offset origin
    must clear the hit point's error box on the outgoing side, with each
    component rounded one ulp away."""
    from pbrt_tpu.device.integrator import _next_float_away, _offset_ray

    rs = np.random.RandomState(11)
    R = 256
    p = jnp.asarray(rs.randn(R, 3).astype(np.float32) * 10)
    ng = rs.randn(R, 3).astype(np.float32)
    ng /= np.linalg.norm(ng, axis=1, keepdims=True)
    ng = jnp.asarray(ng)
    w = jnp.asarray(rs.randn(R, 3).astype(np.float32))
    perr = jnp.asarray(np.abs(rs.randn(R, 3)).astype(np.float32) * 1e-5)

    po = np.asarray(_offset_ray(p, ng, w, perr))
    d = np.sum(np.abs(np.asarray(ng)) * np.asarray(perr), axis=1)
    side = np.sign(np.sum(np.asarray(w) * np.asarray(ng), axis=1))
    adv = np.sum((po - np.asarray(p)) * np.asarray(ng), axis=1) * side
    # the offset clears the error bound on the w side of the surface
    assert (adv >= d * (1.0 - 1e-5)).all()

    # next-float bumps move strictly away per component
    x = jnp.asarray(np.array([1.5, -2.25, 0.0, 3e-20, -3e-20], np.float32))
    dirs = jnp.asarray(np.array([1.0, 1.0, 1.0, -1.0, -1.0], np.float32))
    y = np.asarray(_next_float_away(x, dirs))
    assert y[0] > 1.5 and y[1] > -2.25 and y[2] > 0.0
    assert y[3] < 3e-20 and y[4] < -3e-20
