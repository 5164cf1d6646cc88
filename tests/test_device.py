"""Device kernel tests: intersection, BVH vs brute force, BSDF consistency.

Mirrors the reference's kernel-level property tests (SURVEY.md §4:
tests/shapes.rs randomized geometry, tests/sampling.rs) on the CPU backend.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from pbrt_tpu.device import rng
from pbrt_tpu.device.bsdf import (
    LOBE_LAMBERT_R,
    LOBE_MICRO_R,
    N_SLOTS,
    bsdf_f,
    bsdf_pdf,
    bsdf_sample,
    fresnel_dielectric,
    same_hemisphere,
)
from pbrt_tpu.device.intersect import intersect, intersect_p, ray_sphere, ray_triangle
from pbrt_tpu.scene.arrays import SceneStatic
from pbrt_tpu.scene.bvh import build_bvh


def test_ray_triangle_basic():
    o = jnp.array([[0.0, 0.0, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    p0 = jnp.array([[-1.0, -1.0, 0.0]])
    p1 = jnp.array([[1.0, -1.0, 0.0]])
    p2 = jnp.array([[0.0, 1.0, 0.0]])
    hit, t, b0, b1, b2 = ray_triangle(o, d, p0, p1, p2, jnp.array([1e9]))
    assert bool(hit[0])
    assert abs(float(t[0]) - 1.0) < 1e-5
    assert abs(float(b0[0] + b1[0] + b2[0]) - 1.0) < 1e-5


def test_ray_triangle_miss():
    o = jnp.array([[5.0, 5.0, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    p0 = jnp.array([[-1.0, -1.0, 0.0]])
    p1 = jnp.array([[1.0, -1.0, 0.0]])
    p2 = jnp.array([[0.0, 1.0, 0.0]])
    hit, *_ = ray_triangle(o, d, p0, p1, p2, jnp.array([1e9]))
    assert not bool(hit[0])


def test_ray_sphere_unit():
    w2o = jnp.broadcast_to(jnp.eye(3, 4), (1, 3, 4))
    params = jnp.array([[1.0, -1.0, 1.0, 2 * np.pi, np.pi, 0.0]])
    o = jnp.array([[0.0, 0.0, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit, t, p_obj = ray_sphere(o, d, w2o, params, jnp.array([1e9]))
    assert bool(hit[0])
    assert abs(float(t[0]) - 2.0) < 1e-4
    np.testing.assert_allclose(np.asarray(p_obj[0]), [0, 0, -1], atol=1e-5)


def _random_tri_scene(n_tris=200, seed=7):
    """Build a SceneArrays-like minimal structure over random triangles."""
    from pbrt_tpu.scene.host import HostMaterial, HostPrimitive, SceneDescription, ShapeRecord, TriangleMesh
    from pbrt_tpu.scene.builder import compile_scene

    r = np.random.RandomState(seed)
    c = r.uniform(-1, 1, (n_tris, 3))
    v = c[:, None, :] + r.uniform(-0.1, 0.1, (n_tris, 3, 3))
    verts = v.reshape(-1, 3)
    idx = np.arange(3 * n_tris).reshape(-1, 3)
    mesh = TriangleMesh(p=verts, indices=idx)
    desc = SceneDescription(primitives=[HostPrimitive(shape=ShapeRecord(mesh=mesh), material=HostMaterial(kind="matte", params={}))])
    return compile_scene(desc)


def test_bvh_matches_brute_force():
    cs = _random_tri_scene()
    sa, static = cs.arrays, cs.static
    assert not static.use_brute_force
    r = np.random.RandomState(3)
    R = 256
    o = jnp.asarray(r.uniform(-2, 2, (R, 3)).astype(np.float32))
    d = jnp.asarray(r.normal(size=(R, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full(R, np.inf, jnp.float32)

    hit_bvh = intersect(sa, static, o, d, tmax)

    import dataclasses

    static_bf = dataclasses.replace(static, use_brute_force=True)
    hit_bf = intersect(sa, static_bf, o, d, tmax)

    t_b = np.asarray(hit_bvh["t"])
    t_f = np.asarray(hit_bf["t"])
    both_inf = ~np.isfinite(t_b) & ~np.isfinite(t_f)
    close = np.isclose(t_b, t_f, rtol=1e-4, atol=1e-5)
    assert (both_inf | close).mean() > 0.995, f"mismatch: {np.where(~(both_inf | close))}"

    p_bvh = np.asarray(intersect_p(sa, static, o, d, tmax))
    p_bf = np.asarray(intersect_p(sa, static_bf, o, d, tmax))
    assert (p_bvh == p_bf).mean() > 0.995


def test_bvh_shadow_tmax():
    cs = _random_tri_scene(50)
    sa, static = cs.arrays, cs.static
    o = jnp.array([[5.0, 5.0, 5.0]], jnp.float32)
    d = jnp.array([[-1.0, -1.0, -1.0]], jnp.float32) / np.sqrt(3)
    # very short ray cannot reach the cluster at the origin
    assert not bool(intersect_p(sa, static, o, d, jnp.array([0.1], jnp.float32))[0])


def _lambert_lobes(R, albedo=0.8):
    kind = np.zeros((R, N_SLOTS), np.int32)
    data = np.zeros((R, N_SLOTS, 14), np.float32)
    kind[:, 0] = LOBE_LAMBERT_R
    data[:, 0, 0:3] = albedo
    return {"kind": jnp.asarray(kind), "data": jnp.asarray(data), "possible": tuple([frozenset({LOBE_LAMBERT_R})] + [frozenset()] * (N_SLOTS - 1))}


def test_lambert_f_and_pdf():
    R = 4
    lobes = _lambert_lobes(R)
    wo = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3))
    wi = jnp.broadcast_to(jnp.asarray(np.array([0.3, 0.4, np.sqrt(1 - 0.25)], np.float32)), (R, 3))
    f = np.asarray(bsdf_f(lobes, wo, wi, jnp.ones(R, bool)))
    np.testing.assert_allclose(f, 0.8 / np.pi, rtol=1e-5)
    pdf = np.asarray(bsdf_pdf(lobes, wo, wi))
    np.testing.assert_allclose(pdf, float(wi[0, 2]) / np.pi, rtol=1e-5)


def test_lambert_sample_white_furnace():
    """MC estimate of the hemispherical reflectance must equal the albedo."""
    R = 20000
    lobes = _lambert_lobes(R, albedo=0.5)
    wo = jnp.broadcast_to(jnp.array([0.3, 0.0, np.sqrt(1 - 0.09)], jnp.float32), (R, 3))
    r = np.random.RandomState(0)
    bs = bsdf_sample(lobes, wo, jnp.asarray(r.rand(R).astype(np.float32)), jnp.asarray(r.rand(R).astype(np.float32)), jnp.asarray(r.rand(R).astype(np.float32)))
    w = np.asarray(bs["f"]) * np.asarray(bs["abs_cos"])[:, None] / np.maximum(np.asarray(bs["pdf"])[:, None], 1e-12)
    w = np.where(np.asarray(bs["valid"])[:, None], w, 0.0)
    est = w.mean(axis=0)
    np.testing.assert_allclose(est, 0.5, rtol=0.02)


def test_ggx_sample_pdf_consistency():
    """Sampled directions must have pdf ~ matching bsdf_pdf and f>=0."""
    R = 8192
    kind = np.zeros((R, N_SLOTS), np.int32)
    data = np.zeros((R, N_SLOTS, 14), np.float32)
    kind[:, 2] = LOBE_MICRO_R
    data[:, 2, 0:3] = 1.0
    data[:, 2, 3] = 1.5
    data[:, 2, 9] = 0.3
    data[:, 2, 10] = 0.3
    data[:, 2, 11] = 1.0  # dielectric fresnel
    poss = [frozenset()] * N_SLOTS
    poss[2] = frozenset({LOBE_MICRO_R})
    lobes = {"kind": jnp.asarray(kind), "data": jnp.asarray(data), "possible": tuple(poss)}
    wo = jnp.broadcast_to(jnp.array([0.4, 0.1, np.sqrt(1 - 0.17)], jnp.float32), (R, 3))
    r = np.random.RandomState(1)
    bs = bsdf_sample(lobes, wo, jnp.asarray(r.rand(R).astype(np.float32)), jnp.asarray(r.rand(R).astype(np.float32)), jnp.asarray(r.rand(R).astype(np.float32)))
    valid = np.asarray(bs["valid"])
    assert valid.mean() > 0.9
    pdf_direct = np.asarray(bsdf_pdf(lobes, wo, bs["wi"]))
    pdf_sample = np.asarray(bs["pdf"])
    ok = np.isclose(pdf_direct, pdf_sample, rtol=1e-3, atol=1e-6) | ~valid
    assert ok.mean() > 0.99
    # energy: GGX with fresnel must not gain energy
    w = np.asarray(bs["f"]) * np.asarray(bs["abs_cos"])[:, None] / np.maximum(pdf_sample[:, None], 1e-12)
    w = np.where(valid[:, None], w, 0.0)
    assert w.mean() <= 1.05


def test_fresnel_dielectric_bounds():
    ci = jnp.asarray(np.linspace(-1, 1, 101, dtype=np.float32))
    f = np.asarray(fresnel_dielectric(ci, 1.0, 1.5))
    assert (f >= 0).all() and (f <= 1.0 + 1e-6).all()
    # normal incidence: ((1.5-1)/(1.5+1))^2 = 0.04
    assert abs(float(fresnel_dielectric(jnp.float32(1.0), 1.0, 1.5)) - 0.04) < 1e-3


def test_radical_inverse_base2_is_bit_reversal():
    idx = jnp.asarray(np.arange(1, 64, dtype=np.int64))
    ri = np.asarray(rng.radical_inverse(0, idx))

    def brute(i):
        v, f = 0.0, 0.5
        while i:
            v += (i & 1) * f
            f *= 0.5
            i >>= 1
        return v

    expect = np.array([brute(int(i)) for i in np.arange(1, 64)])
    np.testing.assert_allclose(ri, expect, atol=1e-7)


def test_radical_inverse_base3():
    ri = np.asarray(rng.radical_inverse(1, jnp.asarray(np.arange(1, 28, dtype=np.int64))))

    def brute(i):
        v, f = 0.0, 1.0 / 3
        while i:
            v += (i % 3) * f
            f /= 3
            i //= 3
        return v

    expect = np.array([brute(int(i)) for i in range(1, 28)])
    np.testing.assert_allclose(ri, expect, atol=1e-6)


def test_sample_02_stratification():
    """(0,2) sequence: first 2^k samples stratify into 2^k boxes."""
    n = 64
    u1, u2 = rng.sample_02(jnp.asarray(np.arange(n, dtype=np.uint32)), jnp.uint32(0), jnp.uint32(0))
    u1 = np.asarray(u1)
    u2 = np.asarray(u2)
    # elementary interval property: 8x8 grid has exactly one sample per cell
    cells = set()
    for a, b in zip(u1, u2):
        cells.add((int(a * 8), int(b * 8)))
    assert len(cells) == 64


def test_scrambled_radical_inverse_identity_perm():
    perm = jnp.asarray(np.arange(5, dtype=np.int32))  # base 11 -> index 4
    base_idx = 2  # prime 5
    perm = jnp.asarray(np.arange(5, dtype=np.int32))
    idx = jnp.asarray(np.arange(1, 20, dtype=np.int64))
    a = np.asarray(rng.scrambled_radical_inverse(base_idx, idx, perm))
    b = np.asarray(rng.radical_inverse(base_idx, idx))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_halton_pixel_enumeration():
    """CRT enumeration: every Halton index for a pixel lands IN that pixel."""
    from pbrt_tpu.device.sampler import halton_film_jitter, halton_index, halton_tables

    W, H = 40, 30
    aux = halton_tables(W, H)
    r = np.random.RandomState(0)
    pix = jnp.asarray(r.randint(0, W * H, 64).astype(np.uint32))
    for s in (0, 1, 5):
        idx = halton_index(aux, pix, jnp.uint32(s))
        # raw halton dims scaled by base scales must land on the pixel coords
        from pbrt_tpu.device import rng as _rng

        x = np.asarray(_rng.radical_inverse(0, idx)) * aux["sx"]
        y = np.asarray(_rng.radical_inverse(1, idx)) * aux["sy"]
        px = np.asarray(pix) % W
        py = np.asarray(pix) // W
        np.testing.assert_array_equal(np.floor(x).astype(int) % aux["sx"], px % aux["sx"])
        np.testing.assert_array_equal(np.floor(y).astype(int) % aux["sy"], py % aux["sy"])
        jx, jy = halton_film_jitter(aux, pix, jnp.uint32(s))
        assert float(jnp.min(jx)) >= 0 and float(jnp.max(jx)) < 1
