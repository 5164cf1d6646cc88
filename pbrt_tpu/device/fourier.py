"""FourierBSDF device evaluation: measured-BSDF Fourier tables on TPU.

Reference: src/core/reflection.rs:1237-1485 (FourierBSDF f/sample_f/pdf) and
src/core/interpolation.rs (catmull_rom_weights, sample_catmull_rom_2d,
fourier, sample_fourier). TPU-native reshaping:

- the ragged per-(mu_i, mu_o) coefficient runs are densified host-side
  (core/fourierbsdf.py) to a fixed (nmu^2, 3, m_cap) tensor, so device
  lookups are uniform-width row gathers;
- the azimuthal cosine series sum_k a_k cos(k phi) is evaluated as a dense
  (R, m_cap) basis contraction (MXU-friendly) instead of the reference's
  scalar double-angle recurrence;
- both Newton-bisection inversions (the mu_i spline CDF and the phi Fourier
  CDF) run as fixed-trip-count `lax.fori_loop`s over the whole wave, with
  converged lanes frozen by masks — no data-dependent control flow.

Cost note: each shading point touches 16 coefficient rows (4x4 spline
stencil); this is inherent to the representation (the reference does the
same per intersection) and is the one material where HBM traffic, not the
MXU, is the bound.

All entry points take `ft`, the stacked-table dict built by the scene
builder: mu (NT,NMU), aflat (NT,NMU*NMU,3*MCAP), a0 (NT,NMU,NMU),
cdf (NT,NMU,NMU), eta (NT,); MCAP is static via the aflat shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

F32 = jnp.float32
INV_2PI = 0.5 / jnp.pi
_N_NEWTON = 16


def _sel(row_mat, i):
    """One-hot select row_mat[r, i[r]] without a scalar-core gather."""
    n = row_mat.shape[-1]
    oh = jnp.arange(n)[None, :] == i[:, None]
    return jnp.sum(jnp.where(oh, row_mat, 0.0), axis=-1)


def catmull_rom_weights_v(mu, x):
    """Vectorized catmull_rom_weights (interpolation.rs:3-50).

    mu: (NMU,) or (R, NMU) node positions; x: (R,). Returns
    (offset (R,) i32, weights (R, 4), valid (R,) bool).
    """
    mu_b = mu[None, :] if mu.ndim == 1 else mu
    mu_b = jnp.broadcast_to(mu_b, (x.shape[0], mu_b.shape[-1]))
    nmu = mu_b.shape[-1]
    valid = (x >= mu_b[:, 0]) & (x < mu_b[:, -1])
    idx = jnp.clip(jnp.sum(mu_b <= x[:, None], axis=-1) - 1, 0, nmu - 2)
    x0 = _sel(mu_b, idx)
    x1 = _sel(mu_b, idx + 1)
    xm1 = _sel(mu_b, jnp.maximum(idx - 1, 0))
    xp2 = _sel(mu_b, jnp.minimum(idx + 2, nmu - 1))
    t = (x - x0) / jnp.maximum(x1 - x0, 1e-12)
    t2 = t * t
    t3 = t2 * t
    w1 = 2.0 * t3 - 3.0 * t2 + 1.0
    w2 = -2.0 * t3 + 3.0 * t2
    w0raw = t3 - 2.0 * t2 + t
    has_prev = idx > 0
    w0v = jnp.where(has_prev, w0raw * (x1 - x0) / jnp.maximum(x1 - xm1, 1e-12), w0raw)
    w0 = jnp.where(has_prev, -w0v, 0.0)
    w1 = w1 - jnp.where(has_prev, 0.0, w0v)
    w2 = w2 + w0v
    w3raw = t3 - t2
    has_next = idx + 2 < nmu
    w3v = jnp.where(has_next, w3raw * (x1 - x0) / jnp.maximum(xp2 - x0, 1e-12), w3raw)
    w1 = w1 - w3v
    w3 = jnp.where(has_next, w3v, 0.0)
    w2 = w2 + jnp.where(has_next, 0.0, w3v)
    weights = jnp.stack([w0, w1, w2, w3], axis=-1)
    return idx - 1, jnp.where(valid[:, None], weights, 0.0), valid


def _table_rows(ft, name, tid):
    """Per-ray table row block ft[name][tid] — (R, ...) without gather when
    the scene has a single table (the overwhelmingly common case)."""
    arr = ft[name]
    if arr.shape[0] == 1:
        return arr[0]
    return jnp.take(arr, tid, axis=0)


def _accumulate_ak(ft, tid, offi, wi4, offo, wo4):
    """16-tap spline-stencil accumulation of the coefficient block:
    ak (R, 3, MCAP) = sum_{a,b} wi4[a] wo4[b] A[(offo+b)*NMU + offi+a]."""
    nmu = ft["mu"].shape[-1]
    aflat = ft["aflat"]
    n_rows = aflat.shape[1]
    mcap = aflat.shape[-1] // 3
    single = aflat.shape[0] == 1
    ak = jnp.zeros((offi.shape[0], 3 * mcap), F32)
    for b in range(4):
        for a in range(4):
            w = wi4[:, a] * wo4[:, b]
            flat = jnp.clip((offo + b) * nmu + (offi + a), 0, n_rows - 1)
            rows = jnp.take(aflat[0], flat, axis=0) if single else aflat[tid, flat]
            ak = ak + jnp.where((w != 0.0)[:, None], w[:, None] * rows, 0.0)
    return ak.reshape(-1, 3, mcap)


def _series_all(ak, cos_phi):
    """Y, R, B of the Fourier expansion at azimuth-difference cos_phi.

    Direct cos(k*arccos(x)) basis: one (R, MCAP) transcendental block plus
    three contractions, replacing the reference's f64 recurrence
    (interpolation.rs fourier())."""
    mcap = ak.shape[-1]
    phi = jnp.arccos(jnp.clip(cos_phi, -1.0, 1.0))
    basis = jnp.cos(phi[:, None] * jnp.arange(mcap, dtype=F32)[None, :])
    y = jnp.einsum("rk,rk->r", ak[:, 0], basis)
    r = jnp.einsum("rk,rk->r", ak[:, 1], basis)
    b = jnp.einsum("rk,rk->r", ak[:, 2], basis)
    return y, r, b


def _cos_d_phi(wa, wb):
    """cos of azimuth difference between wa and wb (geometry.rs cos_d_phi)."""
    waxy = wa[:, 0] * wa[:, 0] + wa[:, 1] * wa[:, 1]
    wbxy = wb[:, 0] * wb[:, 0] + wb[:, 1] * wb[:, 1]
    num = wa[:, 0] * wb[:, 0] + wa[:, 1] * wb[:, 1]
    den = jnp.sqrt(jnp.maximum(waxy * wbxy, 1e-20))
    return jnp.where((waxy > 1e-12) & (wbxy > 1e-12), jnp.clip(num / den, -1.0, 1.0), 1.0)


def _weights_io(ft, tid, wo, wi):
    mui = -wi[:, 2]  # cos_theta(-wi), Jakob table convention
    muo = wo[:, 2]
    mu = _table_rows(ft, "mu", tid)
    offi, wi4, vi = catmull_rom_weights_v(mu, mui)
    offo, wo4, vo = catmull_rom_weights_v(mu, muo)
    return mui, muo, offi, wi4, offo, wo4, vi & vo


def _rgb_from_series(y, r, b, scale):
    g = 1.39829 * y - 0.100913 * b - 0.297375 * r
    rgb = jnp.stack([r, g, b], axis=-1) * scale[:, None]
    return jnp.clip(rgb, 0.0, jnp.inf)


def _radiance_scale(ft, tid, mui, muo, mode: str = "radiance"):
    """1/|mui|, plus — in radiance transport only — the eta^2
    transmission factor (reflection.rs:1301-1316 mode branch); importance
    (adjoint) transport keeps the bare 1/|mui|."""
    scale = jnp.where(jnp.abs(mui) > 1e-9, 1.0 / jnp.maximum(jnp.abs(mui), 1e-9), 0.0)
    if mode != "radiance":
        return scale
    eta = _table_rows(ft, "eta", tid)
    eta = jnp.broadcast_to(eta, mui.shape)
    ef = jnp.where(mui > 0, 1.0 / jnp.maximum(eta, 1e-6), eta)
    return jnp.where(mui * muo > 0, scale * ef * ef, scale)


def fourier_f(ft, tid, wo, wi, mode: str = "radiance"):
    """BSDF value (R, 3) of the tabulated model (reflection.rs f())."""
    mui, muo, offi, wi4, offo, wo4, valid = _weights_io(ft, tid, wo, wi)
    ak = _accumulate_ak(ft, tid, offi, wi4, offo, wo4)
    y, r, b = _series_all(ak, _cos_d_phi(-wi, wo))
    y = jnp.maximum(y, 0.0)
    scale = _radiance_scale(ft, tid, mui, muo, mode)
    rgb = _rgb_from_series(y, r, b, scale)
    return jnp.where(valid[:, None], rgb, 0.0)


def fourier_pdf(ft, tid, wo, wi):
    """Solid-angle pdf of sample_f (reflection.rs pdf()): the luminance
    series over the spline-interpolated hemispherical normalization rho."""
    mui, muo, offi, wi4, offo, wo4, valid = _weights_io(ft, tid, wo, wi)
    ak = _accumulate_ak(ft, tid, offi, wi4, offo, wo4)
    y, _, _ = _series_all(ak, _cos_d_phi(-wi, wo))
    cdf = _table_rows(ft, "cdf", tid)  # (NMU, NMU) or (R, NMU, NMU), rows [o, i]
    nmu = ft["mu"].shape[-1]
    last_col = cdf[..., nmu - 1]  # hemispherical albedo integral per mu_o row
    last_b = jnp.broadcast_to(last_col[None, :] if last_col.ndim == 1 else last_col, (wo.shape[0], nmu))
    rho = jnp.zeros(wo.shape[0], F32)
    for b_i in range(4):
        row = jnp.clip(offo + b_i, 0, nmu - 1)
        rho = rho + wo4[:, b_i] * _sel(last_b, row) * (2.0 * jnp.pi)
    ok = valid & (rho > 0) & (y > 0)
    return jnp.where(ok, y / jnp.maximum(rho, 1e-12), 0.0)


def _spline_invert(f0, f1, d0, d1, u):
    """Fixed-trip Newton-bisection inverting the integral of a cubic
    spline segment (interpolation.rs sample_catmull_rom_2d inner loop).
    Returns (t, fhat)."""

    def body(_, st):
        a, b, t = st
        t = jnp.where((t > a) & (t < b), t, 0.5 * (a + b))
        fh_int = t * (f0 + t * (0.5 * d0 + t * ((1.0 / 3.0) * (-2.0 * d0 - d1) + f1 - f0 + t * (0.25 * (d0 + d1) + 0.5 * (f0 - f1)))))
        fh = f0 + t * (d0 + t * (-2.0 * d0 - d1 + 3.0 * (f1 - f0) + t * (d0 + d1 + 2.0 * (f0 - f1))))
        err = fh_int - u
        a = jnp.where(err < 0, t, a)
        b = jnp.where(err < 0, b, t)
        t = t - err / jnp.where(jnp.abs(fh) > 1e-12, fh, 1.0)
        return a, b, t

    a0_ = jnp.zeros_like(u)
    b0_ = jnp.ones_like(u)
    # linear-interpolant initial guess (reference does the same)
    disc = jnp.maximum(f0 * f0 + 2.0 * u * (f1 - f0), 0.0)
    t0 = jnp.where(jnp.abs(f0 - f1) > 1e-9, (f0 - jnp.sqrt(disc)) / jnp.where(jnp.abs(f0 - f1) > 1e-9, f0 - f1, 1.0), u / jnp.maximum(f0, 1e-9))
    a, b, t = jax.lax.fori_loop(0, _N_NEWTON, body, (a0_, b0_, jnp.clip(t0, 0.0, 1.0)))
    t = jnp.clip(t, a, b)
    fh = f0 + t * (d0 + t * (-2.0 * d0 - d1 + 3.0 * (f1 - f0) + t * (d0 + d1 + 2.0 * (f0 - f1))))
    return t, fh


def _sample_mui(ft, tid, offo, wo4, u):
    """sample_catmull_rom_2d over the mu_i marginal (interpolation.rs:134)."""
    nmu = ft["mu"].shape[-1]
    mu = _table_rows(ft, "mu", tid)
    mu_b = jnp.broadcast_to(mu[None, :] if mu.ndim == 1 else mu, (u.shape[0], nmu))
    cdf_t = ft["cdf"]
    a0_t = ft["a0"]
    single = cdf_t.shape[0] == 1
    C = jnp.zeros((u.shape[0], nmu), F32)
    V = jnp.zeros((u.shape[0], nmu), F32)
    for b_i in range(4):
        row = jnp.clip(offo + b_i, 0, nmu - 1)
        crow = jnp.take(cdf_t[0], row, axis=0) if single else cdf_t[tid, row]
        vrow = jnp.take(a0_t[0], row, axis=0) if single else a0_t[tid, row]
        C = C + wo4[:, b_i : b_i + 1] * crow
        V = V + wo4[:, b_i : b_i + 1] * vrow
    maximum = C[:, -1]
    uu = u * maximum
    idx = jnp.clip(jnp.sum(C <= uu[:, None], axis=-1) - 1, 0, nmu - 2)
    f0 = _sel(V, idx)
    f1 = _sel(V, idx + 1)
    x0 = _sel(mu_b, idx)
    x1 = _sel(mu_b, idx + 1)
    xm1 = _sel(mu_b, jnp.maximum(idx - 1, 0))
    xp2 = _sel(mu_b, jnp.minimum(idx + 2, nmu - 1))
    fm1 = _sel(V, jnp.maximum(idx - 1, 0))
    fp2 = _sel(V, jnp.minimum(idx + 2, nmu - 1))
    width = x1 - x0
    d0 = jnp.where(idx > 0, width * (f1 - fm1) / jnp.maximum(x1 - xm1, 1e-12), f1 - f0)
    d1 = jnp.where(idx + 2 < nmu, width * (fp2 - f0) / jnp.maximum(xp2 - x0, 1e-12), f1 - f0)
    u_seg = (uu - _sel(C, idx)) / jnp.maximum(width, 1e-12)
    t, fh = _spline_invert(f0, f1, d0, d1, u_seg)
    mui = x0 + width * t
    pdf_mu = jnp.where(maximum > 0, jnp.maximum(fh, 0.0) / jnp.maximum(maximum, 1e-12), 0.0)
    return mui, pdf_mu


def _sample_phi(ak_y, u):
    """sample_fourier (interpolation.rs:354): invert the azimuthal CDF
    F(phi) = a0 phi + sum_k a_k sin(k phi)/k by Newton-bisection.
    Returns (phi, pdf_phi, f_lum)."""
    mcap = ak_y.shape[-1]
    k = jnp.arange(mcap, dtype=F32)
    recip = jnp.where(k > 0, 1.0 / jnp.maximum(k, 1.0), 0.0)
    flip = u >= 0.5
    u2 = jnp.where(flip, 1.0 - 2.0 * (u - 0.5), 2.0 * u)
    a0c = ak_y[:, 0]

    def body(_, st):
        a, b, phi = st
        ang = phi[:, None] * k[None, :]
        f = jnp.einsum("rk,rk->r", ak_y, jnp.cos(ang))
        F = a0c * phi + jnp.einsum("rk,rk->r", ak_y * recip[None, :], jnp.sin(ang)) - u2 * a0c * jnp.pi
        b = jnp.where(F > 0, phi, b)
        a = jnp.where(F > 0, a, phi)
        phi = phi - F / jnp.where(jnp.abs(f) > 1e-9, f, 1.0)
        phi = jnp.where((phi > a) & (phi < b), phi, 0.5 * (a + b))
        return a, b, phi

    a0_ = jnp.zeros_like(u2)
    b0_ = jnp.full_like(u2, jnp.pi)
    phi0 = jnp.full_like(u2, 0.5 * jnp.pi)
    a, b, phi = jax.lax.fori_loop(0, _N_NEWTON + 4, body, (a0_, b0_, phi0))
    phi = jnp.clip(phi, a, b)
    ang = phi[:, None] * k[None, :]
    f = jnp.einsum("rk,rk->r", ak_y, jnp.cos(ang))
    pdf = jnp.where(a0c > 0, INV_2PI * f / jnp.maximum(a0c, 1e-12), 0.0)
    phi = jnp.where(flip, 2.0 * jnp.pi - phi, phi)
    return phi, jnp.maximum(pdf, 0.0), f


def fourier_sample(ft, tid, wo, u1, u2, mode: str = "radiance"):
    """Importance-sample the tabulated BSDF (reflection.rs sample_f()).

    Returns dict {wi, f (R,3), pdf, valid}."""
    muo = wo[:, 2]
    mu = _table_rows(ft, "mu", tid)
    offo, wo4, vo = catmull_rom_weights_v(mu, muo)
    mui, pdf_mu = _sample_mui(ft, tid, offo, wo4, u2)
    offi, wi4, vi = catmull_rom_weights_v(mu, mui)
    ak = _accumulate_ak(ft, tid, offi, wi4, offo, wo4)
    phi, pdf_phi, _ = _sample_phi(ak[:, 0, :], u1)
    sin_phi = jnp.sin(phi)
    cos_phi = jnp.cos(phi)
    sin2_ti = jnp.maximum(1.0 - mui * mui, 0.0)
    sin2_to = jnp.maximum(1.0 - muo * muo, 0.0)
    norm = jnp.where(sin2_to > 1e-12, jnp.sqrt(sin2_ti / jnp.maximum(sin2_to, 1e-12)), 0.0)
    wi = -jnp.stack(
        [
            norm * (cos_phi * wo[:, 0] - sin_phi * wo[:, 1]),
            norm * (sin_phi * wo[:, 0] + cos_phi * wo[:, 1]),
            mui,
        ],
        axis=-1,
    )
    wi = wi / jnp.maximum(jnp.linalg.norm(wi, axis=-1, keepdims=True), 1e-12)
    y, r, b = _series_all(ak, cos_phi)
    scale = _radiance_scale(ft, tid, mui, muo, mode)
    f = _rgb_from_series(jnp.maximum(y, 0.0), r, b, scale)
    pdf = jnp.maximum(pdf_phi * pdf_mu, 0.0)
    valid = vo & vi & (pdf > 0)
    return {"wi": wi, "f": jnp.where(valid[:, None], f, 0.0), "pdf": pdf, "valid": valid}
