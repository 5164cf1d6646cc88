"""Device BSSRDF profile sampling: sample/pdf consistency (bssrdf.rs
sample_sr/pdf_sr identities, evaluated against the host tables)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core.bssrdf import compute_beam_diffusion_table, catmull_rom_weights
from pbrt_tpu.device.bssrdf import (
    eval_profile_row,
    pdf_radial,
    sample_radial_cdf,
    sr_eval,
    sw_factor,
)


def _fold_rho(tab, rho):
    """Collapse the albedo axis at a fixed rho (what the scene compiler does
    per material channel)."""
    off, w = catmull_rom_weights(tab["rho_samples"].astype(np.float64), rho)
    prof = np.zeros(tab["profile"].shape[1])
    cdf = np.zeros_like(prof)
    rho_eff = 0.0
    for k in range(4):
        idx = int(np.clip(off + k, 0, len(tab["rho_samples"]) - 1))
        prof += w[k] * tab["profile"][idx]
        cdf += w[k] * tab["profile_cdf"][idx]
        rho_eff += w[k] * tab["rho_eff"][idx]
    return prof.astype(np.float32), cdf.astype(np.float32), np.float32(rho_eff)


def test_eval_profile_matches_nodes():
    tab = compute_beam_diffusion_table(0.0, 1.33, n_rho=40, n_radius=64)
    prof, cdf, rho_eff = _fold_rho(tab, 0.6)
    radius = jnp.asarray(tab["radius_samples"])
    rows = jnp.broadcast_to(jnp.asarray(prof), (64, 64))
    vals = eval_profile_row(radius, rows, radius)
    # spline interpolation reproduces node values exactly
    assert np.allclose(np.asarray(vals), prof, rtol=1e-4, atol=1e-7)


def test_sample_pdf_consistency_mc():
    """E[1/pdf] over samples of the radial distribution = measure of the
    support; equivalently a histogram of samples matches pdf_radial."""
    tab = compute_beam_diffusion_table(0.0, 1.33, n_rho=40, n_radius=64)
    prof, cdf, rho_eff = _fold_rho(tab, 0.7)
    radius = jnp.asarray(tab["radius_samples"])
    R = 8192
    rs = np.random.RandomState(11)
    u = jnp.asarray(rs.rand(R), jnp.float32)
    rows_p = jnp.broadcast_to(jnp.asarray(prof), (R, 64))
    rows_c = jnp.broadcast_to(jnp.asarray(cdf), (R, 64))
    re = jnp.full((R,), rho_eff)
    r_opt = np.asarray(sample_radial_cdf(radius, rows_p, rows_c, re, u))
    assert np.all(r_opt >= 0) and np.all(r_opt <= tab["radius_samples"][-1] + 1e-4)
    # CDF(r_opt) should equal u * rho_eff: verify via monotone re-mapping
    order = np.argsort(np.asarray(u))
    assert np.all(np.diff(r_opt[order]) >= -1e-5)
    # histogram vs pdf (sigma_t = 1 so world radius == optical radius)
    sigma_t = jnp.ones((R,))
    pdf = np.asarray(pdf_radial(radius, rows_p, re, sigma_t, jnp.asarray(r_opt)))
    # density check by inverse-pdf integral: sum over samples of 1/(pdf*2*pi*r)
    # estimates the support area; instead use the binned ratio test
    # samples are distributed with radial density q(r) = pdf_area(r)*2*pi*r
    # (normalized), so E[1{r in bin} / q(r)] = bin length
    q = pdf * 2 * np.pi * np.maximum(r_opt, 1e-9)
    bins = np.percentile(r_opt, np.linspace(5, 95, 7))
    for lo, hi in zip(bins[:-1], bins[1:]):
        m = (r_opt >= lo) & (r_opt < hi)
        if m.sum() < 200:
            continue
        est = np.mean(np.where(m, 1.0 / np.maximum(q, 1e-12), 0.0))
        assert abs(est - (hi - lo)) / max(hi - lo, 1e-6) < 0.25


def test_sr_eval_finite_positive():
    tab = compute_beam_diffusion_table(0.0, 1.33, n_rho=40, n_radius=64)
    prof, cdf, rho_eff = _fold_rho(tab, 0.5)
    radius = jnp.asarray(tab["radius_samples"])
    R = 16
    rows3 = jnp.broadcast_to(jnp.asarray(prof), (R, 3, 64))
    sig = jnp.full((R, 3), 2.0)
    r = jnp.linspace(0.0, 5.0, R)
    out = np.asarray(sr_eval(radius, rows3, sig, r))
    assert np.all(np.isfinite(out)) and np.all(out >= 0)
    # decays with radius
    assert out[1].mean() > out[-1].mean()


def test_sw_normalization():
    """Integral of Sw over the hemisphere (with cos) should be ~(1-2C1)/
    normalization -> finite and below 1."""
    rs = np.random.RandomState(3)
    n = 200000
    u1, u2 = rs.rand(n), rs.rand(n)
    cos_t = np.sqrt(1 - u1)  # cosine-weighted
    sw = np.asarray(sw_factor(1.33, jnp.asarray(cos_t, jnp.float32)))
    est = np.pi * sw.mean()  # integral of Sw cos dw via cosine sampling
    assert 0.5 < est < 1.5
