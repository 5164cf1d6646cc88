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
