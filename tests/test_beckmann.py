"""Beckmann microfacet distribution (src/core/microfacet.rs:150-316).

Mirrors the GGX pdf-consistency/energy tests in test_device.py; also checks
D normalization (integral of D(wh) cos(wh) over the hemisphere = 1) and the
end-to-end "distribution" "beckmann" parameter plumbing."""
import numpy as np

import jax.numpy as jnp

from pbrt_tpu.device.bsdf import (
    LOBE_MICRO_R,
    N_SLOTS,
    beckmann_d,
    beckmann_sample_wh,
    bsdf_pdf,
    bsdf_sample,
)


def test_beckmann_d_normalization():
    """Integral over hemisphere of D(wh) cos(wh) dwh == 1."""
    n = 120
    th = (np.arange(n) + 0.5) / n * np.pi / 2
    ph = (np.arange(2 * n) + 0.5) / (2 * n) * 2 * np.pi
    t, p = np.meshgrid(th, ph, indexing="ij")
    wh = np.stack([np.sin(t) * np.cos(p), np.sin(t) * np.sin(p), np.cos(t)], -1).reshape(-1, 3)
    for ax, ay in ((0.3, 0.3), (0.15, 0.6)):
        d = np.asarray(beckmann_d(jnp.asarray(wh.astype(np.float32)), ax, ay))
        integ = (d * wh[:, 2] * np.sin(t.ravel())).sum() * (np.pi / 2 / n) * (2 * np.pi / (2 * n))
        np.testing.assert_allclose(integ, 1.0, rtol=0.02)


def test_beckmann_sample_matches_d():
    """Sampled wh histogram in cos-theta must follow D(wh)cos(wh)."""
    R = 200000
    rs = np.random.RandomState(5)
    wo = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (R, 3))
    wh = np.asarray(beckmann_sample_wh(wo, jnp.asarray(rs.rand(R).astype(np.float32)),
                                       jnp.asarray(rs.rand(R).astype(np.float32)), 0.4, 0.4))
    # mean cos^2 theta under p(wh)=D cos: analytic via sampling identity
    # tan^2 = -a^2 ln(1-u): E[tan2] = a^2 -> just check the transform inverts
    tan2 = (wh[:, 0] ** 2 + wh[:, 1] ** 2) / np.maximum(wh[:, 2] ** 2, 1e-12)
    np.testing.assert_allclose(tan2.mean(), 0.4 * 0.4, rtol=0.05)


def _beck_lobes(R, alpha=0.3):
    kind = np.zeros((R, N_SLOTS), np.int32)
    data = np.zeros((R, N_SLOTS, 14), np.float32)
    kind[:, 2] = LOBE_MICRO_R
    data[:, 2, 0:3] = 1.0
    data[:, 2, 3] = 1.5
    data[:, 2, 9] = alpha
    data[:, 2, 10] = alpha
    data[:, 2, 11] = 1.0  # dielectric fresnel
    data[:, 2, 12] = 1.0  # Beckmann flag
    poss = [frozenset()] * N_SLOTS
    poss[2] = frozenset({LOBE_MICRO_R})
    return {"kind": jnp.asarray(kind), "data": jnp.asarray(data),
            "possible": tuple(poss), "has_beckmann": True}


def test_beckmann_sample_pdf_consistency():
    R = 8192
    lobes = _beck_lobes(R)
    wo = jnp.broadcast_to(jnp.array([0.4, 0.1, np.sqrt(1 - 0.17)], jnp.float32), (R, 3))
    r = np.random.RandomState(1)
    bs = bsdf_sample(lobes, wo, jnp.asarray(r.rand(R).astype(np.float32)),
                     jnp.asarray(r.rand(R).astype(np.float32)), jnp.asarray(r.rand(R).astype(np.float32)))
    valid = np.asarray(bs["valid"])
    assert valid.mean() > 0.85
    pdf_direct = np.asarray(bsdf_pdf(lobes, wo, bs["wi"]))
    pdf_sample = np.asarray(bs["pdf"])
    ok = np.isclose(pdf_direct, pdf_sample, rtol=1e-3, atol=1e-6) | ~valid
    assert ok.mean() > 0.99
    w = np.asarray(bs["f"]) * np.asarray(bs["abs_cos"])[:, None] / np.maximum(pdf_sample[:, None], 1e-12)
    w = np.where(valid[:, None], w, 0.0)
    assert w.mean() <= 1.1  # no energy gain


def test_beckmann_plumbing():
    """"distribution" "beckmann" flows parser -> builder -> make_bsdf."""
    from pbrt_tpu.scene.host import HostMaterial
    from pbrt_tpu.scene.builder import _compile_material, _TextureRegistry

    mat = HostMaterial(kind="metal", params={
        "roughness": ("const", np.array([0.1])),
        "distribution": ("const", "beckmann"),
        "remaproughness": ("const", True),
    })
    kind, const, tex, remap, _bump = _compile_material(mat, _TextureRegistry(), lambda m: 0)
    assert remap & 2, "beckmann bit must be set in mat_remap"
    assert remap & 1, "remap bit must survive"

    mat2 = HostMaterial(kind="metal", params={"roughness": ("const", np.array([0.1]))})
    _k, _c, _t, remap2, _b2 = _compile_material(mat2, _TextureRegistry(), lambda m: 0)
    assert not (remap2 & 2)
