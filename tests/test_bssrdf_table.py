"""Beam-diffusion BSSRDF table precompute (bssrdf.rs:137-201,
interpolation.rs spline machinery)."""
import numpy as np

from pbrt_tpu.core.bssrdf import (
    beam_diffusion_ms,
    beam_diffusion_ss,
    catmull_rom_weights,
    compute_beam_diffusion_table,
    fresnel_moment1,
    fresnel_moment2,
    integrate_catmull_rom,
    invert_catmull_rom,
    subsurface_from_diffuse,
)


def test_fresnel_moments_known_values():
    # the two published fits agree (continuously) at eta = 1
    assert abs(fresnel_moment1(1.0 - 1e-6) - fresnel_moment1(1.0 + 1e-6)) < 5e-3
    assert abs(fresnel_moment1(1.0)) < 5e-3  # no reflection at eta=1
    # moments are smooth and bounded for common IORs
    for eta in (1.1, 1.33, 1.5, 2.0):
        m1 = fresnel_moment1(eta)
        m2 = fresnel_moment2(eta)
        assert 0.0 < m1 < 1.0
        assert 0.0 < m2 < 1.0


def test_catmull_rom_weights_partition_of_unity():
    nodes = np.array([0.0, 1.0, 2.5, 4.0, 7.0])
    xs = np.linspace(0.0, 7.0, 37)
    off, w = catmull_rom_weights(nodes, xs)
    # interpolating a constant gives exactly that constant -> weights sum to 1
    assert np.allclose(w.sum(-1), 1.0, atol=1e-12)
    # reproduces linear functions exactly at the nodes and (for uniform
    # spacing) everywhere inside
    f = 2.0 * nodes + 1.0
    vals = np.zeros_like(xs)
    for k in range(4):
        idx = np.clip(off + k, 0, len(nodes) - 1)
        vals += w[..., k] * f[idx]
    assert np.allclose(vals, 2.0 * xs + 1.0, atol=1e-9)


def test_integrate_catmull_rom_on_polynomial():
    nodes = np.linspace(0.0, 2.0, 33)
    f = 3.0 * nodes**2  # integral = x^3
    total, cdf = integrate_catmull_rom(nodes, f)
    assert abs(total - 8.0) < 1e-2
    assert np.all(np.diff(cdf) >= 0)


def test_invert_catmull_rom_roundtrip():
    nodes = np.linspace(0.0, 1.0, 50)
    f = nodes**2  # monotone
    ys = np.array([0.0, 0.1, 0.5, 0.9, 1.0])
    xs = invert_catmull_rom(nodes, f, ys)
    assert np.allclose(xs**2, ys, atol=1e-4)


def test_beam_diffusion_profile_properties():
    tab = compute_beam_diffusion_table(g=0.0, eta=1.33, n_rho=32, n_radius=32)
    prof = tab["profile"]
    assert prof.shape == (32, 32)
    assert np.all(prof >= 0)
    # effective albedo is monotone in single-scatter albedo and < 1
    rho_eff = tab["rho_eff"]
    assert np.all(np.diff(rho_eff) >= -1e-6)
    assert rho_eff[0] < 1e-6  # rho = 0 -> black
    assert rho_eff[-1] <= 1.0 + 1e-3
    # cdf rows end at rho_eff
    assert np.allclose(tab["profile_cdf"][:, -1], rho_eff, atol=1e-5)


def test_white_furnace_energy():
    """At rho -> 1 (no absorption) most energy must come back out:
    rho_eff approaches 1 for eta=1 (no internal reflection loss model at
    the boundary changes the limit slightly for eta != 1)."""
    tab = compute_beam_diffusion_table(g=0.0, eta=1.0, n_rho=64, n_radius=48)
    assert tab["rho_eff"][-1] > 0.93


def test_subsurface_from_diffuse_roundtrip():
    tab = compute_beam_diffusion_table(g=0.0, eta=1.33, n_rho=64, n_radius=48)
    target = np.array([0.2, 0.5, 0.8])
    mfp = np.array([1.0, 1.0, 1.0])
    sigma_a, sigma_s = subsurface_from_diffuse(tab, target, mfp)
    assert np.all(sigma_a >= 0) and np.all(sigma_s >= 0)
    # forward-map the recovered albedo through rho_eff: should land on target
    rho = sigma_s / np.maximum(sigma_a + sigma_s, 1e-9)
    # interpolate rho_eff at rho
    got = np.interp(rho, tab["rho_samples"], tab["rho_eff"])
    assert np.allclose(got, target, atol=0.02)
    # higher mfp -> lower sigmas
    sigma_a2, sigma_s2 = subsurface_from_diffuse(tab, target, 2.0 * mfp)
    assert np.all(sigma_s2 < sigma_s + 1e-9)
