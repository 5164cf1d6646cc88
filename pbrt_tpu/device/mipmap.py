"""MIPMap: host pyramid construction + device trilinear / EWA lookup.

Equivalent of src/core/mipmap.rs: images are resampled to powers of two
with a Lanczos-windowed sinc (resample_weights :269), the pyramid is a box
downsample chain, lookups are trilinear over levels selected from the
texture-space footprint width (:202) or EWA elliptically weighted averages
over the anisotropy axes (:225). Pyramid levels live as separate entries in
SceneArrays.tex_images ("img{i}_l{k}") so every level keeps a static shape.
"""
from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp

F32 = jnp.float32


# ---------------------------------------------------------------------------
# Host-side pyramid build
# ---------------------------------------------------------------------------


def _lanczos_resample_weights(old_n: int, new_n: int, filter_width: float = 2.0):
    """Per-output-texel contribution weights (mipmap.rs resample_weights)."""
    first = np.zeros(new_n, np.int64)
    weights = np.zeros((new_n, 4), np.float64)
    for i in range(new_n):
        center = (i + 0.5) * old_n / new_n - 0.5
        first[i] = int(np.floor(center - filter_width + 0.5))
        for j in range(4):
            pos = first[i] + j + 0.5 - 0.5
            x = abs((pos - center) / filter_width)
            if x < 1e-9:
                w = 1.0
            elif x > 1.0:
                w = 0.0
            else:
                x *= np.pi
                w = (np.sin(x * 2.0) / (x * 2.0)) * (np.sin(x) / x)
            weights[i, j] = w
        s = weights[i].sum()
        if s != 0:
            weights[i] /= s
    return first, weights


def _resample_axis(img: np.ndarray, new_n: int, axis: int) -> np.ndarray:
    old_n = img.shape[axis]
    if old_n == new_n:
        return img
    first, w = _lanczos_resample_weights(old_n, new_n)
    moved = np.moveaxis(img, axis, 0)
    out = np.zeros((new_n,) + moved.shape[1:], moved.dtype)
    for j in range(4):
        idx = np.clip(first + j, 0, old_n - 1)
        out += w[:, j].reshape((-1,) + (1,) * (moved.ndim - 1)) * moved[idx]
    return np.moveaxis(out, 0, axis)


def build_pyramid(img: np.ndarray) -> list[np.ndarray]:
    """Image -> power-of-two pyramid down to 1x1 (mipmap.rs:76-160)."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    ph = 1 << max(int(math.ceil(math.log2(max(h, 1)))), 0)
    pw = 1 << max(int(math.ceil(math.log2(max(w, 1)))), 0)
    base = img
    if (ph, pw) != (h, w):
        base = _resample_axis(_resample_axis(img.astype(np.float64), pw, 1), ph, 0)
        base = np.maximum(base, 0.0).astype(np.float32)
    levels = [base]
    cur = base
    while cur.shape[0] > 1 or cur.shape[1] > 1:
        nh = max(cur.shape[0] // 2, 1)
        nw = max(cur.shape[1] // 2, 1)
        # 2x2 box downsample (mipmap.rs next level average)
        c = cur[: nh * 2 if cur.shape[0] > 1 else 1, : nw * 2 if cur.shape[1] > 1 else 1]
        if cur.shape[0] > 1 and cur.shape[1] > 1:
            nxt = 0.25 * (c[0::2, 0::2] + c[1::2, 0::2] + c[0::2, 1::2] + c[1::2, 1::2])
        elif cur.shape[0] > 1:
            nxt = 0.5 * (c[0::2] + c[1::2])
        else:
            nxt = 0.5 * (c[:, 0::2] + c[:, 1::2])
        levels.append(nxt.astype(np.float32))
        cur = nxt
    return levels


# ---------------------------------------------------------------------------
# Device-side lookups
# ---------------------------------------------------------------------------


def _bilinear_level(img, u, v, wrap):
    from .texture import image_bilinear

    return image_bilinear(img, u, v, wrap)



# ---------------------------------------------------------------------------
# Flat mip atlas: all pyramid levels stacked along rows so a PER-LANE level
# becomes ordinary index arithmetic — the previous per-level masked loops
# evaluated EVERY level (8 levels x 64 EWA taps = 512 gathers per texel
# eval, the dominant cost of imagemap-heavy renders)
# ---------------------------------------------------------------------------

def _mip_atlas(levels):
    """Stack levels into one (sum Hk, W0, 3) array + static offset/dim
    tables. No memoization: under jit the inputs are per-trace tracers
    (an id()-keyed cache would leak or collide), and XLA CSEs the repeated
    concat within a trace anyway."""
    w0 = levels[0].shape[1]
    offs, hs, ws = [], [], []
    rows = []
    off = 0
    for l in levels:
        h, w = l.shape[0], l.shape[1]
        offs.append(off)
        hs.append(h)
        ws.append(w)
        pad = w0 - w
        rows.append(jnp.pad(l, ((0, 0), (0, pad), (0, 0))) if pad else l)
        off += h
    atlas = jnp.concatenate(rows, axis=0)
    return (atlas, jnp.asarray(offs, jnp.int32), jnp.asarray(hs, jnp.int32),
            jnp.asarray(ws, jnp.int32))


def _atlas_bilinear(atlas, off_l, h_l, w_l, u, v, wrap):
    """Bilinear tap at a PER-LANE pyramid level inside the atlas."""
    x = u * w_l.astype(F32) - 0.5
    y = (1.0 - v) * h_l.astype(F32) - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(F32))[:, None]
    fy = (y - y0.astype(F32))[:, None]

    def wrapx(i):
        return jnp.mod(i, w_l) if wrap == "repeat" else jnp.clip(i, 0, w_l - 1)

    def wrapy(j):
        return (jnp.mod(j, h_l) if wrap == "repeat" else jnp.clip(j, 0, h_l - 1)) + off_l

    c00 = atlas[wrapy(y0), wrapx(x0)]
    c10 = atlas[wrapy(y0), wrapx(x0 + 1)]
    c01 = atlas[wrapy(y0 + 1), wrapx(x0)]
    c11 = atlas[wrapy(y0 + 1), wrapx(x0 + 1)]
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)


def _level_meta(levels, lvl_i):
    atlas, offs, hs, ws = _mip_atlas(levels)
    return atlas, offs[lvl_i], hs[lvl_i], ws[lvl_i]


def lookup_trilinear(levels, u, v, width, wrap="repeat"):
    """Trilinear MIPMap lookup (mipmap.rs lookup :202).

    levels: python list of (Hk, Wk, 3) arrays (static); width: (R,) footprint
    in [0,1] texture space. Taps come from the flat mip atlas at the two
    PER-LANE adjacent levels (2x4 gathers, not n_levels x 4).
    """
    n = len(levels)
    if n == 1:
        return _bilinear_level(levels[0], u, v, wrap)
    lvl = (n - 1) + jnp.log2(jnp.maximum(width, 1e-8))
    lvl = jnp.clip(lvl, 0.0, n - 1 - 1e-4)
    i0 = jnp.floor(lvl).astype(jnp.int32)
    ft = (lvl - i0.astype(F32))[:, None]
    atlas, o0, h0, w0 = _level_meta(levels, i0)
    _, o1, h1, w1 = _level_meta(levels, jnp.minimum(i0 + 1, n - 1))
    v_lo = _atlas_bilinear(atlas, o0, h0, w0, u, v, wrap)
    v_hi = _atlas_bilinear(atlas, o1, h1, w1, u, v, wrap)
    return v_lo * (1.0 - ft) + v_hi * ft


def lookup_ewa(levels, u, v, duv0, duv1, wrap="repeat", max_anisotropy=8.0):
    """EWA anisotropic lookup (mipmap.rs lookup2 :225).

    duv0/duv1: (R, 2) texture-space footprint axes.
    """
    n = len(levels)
    l0 = jnp.sum(duv0 * duv0, axis=-1)
    l1 = jnp.sum(duv1 * duv1, axis=-1)
    swap = l1 > l0
    major = jnp.where(swap[:, None], duv1, duv0)
    minor = jnp.where(swap[:, None], duv0, duv1)
    maj_len = jnp.sqrt(jnp.maximum(jnp.where(swap, l1, l0), 1e-20))
    min_len = jnp.sqrt(jnp.maximum(jnp.where(swap, l0, l1), 1e-20))
    # clamp eccentricity
    scale = jnp.where(min_len * max_anisotropy < maj_len, maj_len / jnp.maximum(min_len * max_anisotropy, 1e-20), 1.0)
    min_len = min_len * scale
    minor = minor * scale[:, None]
    if n == 1:
        return _bilinear_level(levels[0], u, v, wrap)
    # pick the level from the MINOR axis (mipmap.rs lookup2), but never let
    # the major axis exceed the bounded +-EWA_R-texel scan window — raising
    # the level trades a little extra blur along the minor axis for full
    # ellipse coverage (a half-covered ellipse systematically under-filters
    # exactly the grazing-angle footprints EWA exists for: the round-1
    # renders kept distant ground texture crisp where the reference fades)
    eff = jnp.maximum(min_len, maj_len / EWA_R)
    lvl = jnp.clip((n - 1) + jnp.log2(jnp.maximum(eff, 1e-8)), 0.0, n - 1 - 1e-4)
    i0 = jnp.floor(lvl).astype(jnp.int32)
    ft = (lvl - i0.astype(F32))[:, None]
    atlas, o0, h0, w0 = _level_meta(levels, i0)
    _, o1, h1, w1 = _level_meta(levels, jnp.minimum(i0 + 1, n - 1))
    v_lo = _ewa_level_atlas(atlas, o0, h0, w0, u, v, major, minor, wrap)
    v_hi = _ewa_level_atlas(atlas, o1, h1, w1, u, v, major, minor, wrap)
    return v_lo * (1.0 - ft) + v_hi * ft


_EWA_LUT = np.exp(-2.0 * np.linspace(0.0, 1.0, 128)) - np.exp(-2.0)


EWA_R = 4  # half-width of the bounded EWA scan window, in texels


def _ewa_level_atlas(atlas, off_l, h_li, w_li, u, v, major, minor, wrap):
    """Elliptically weighted average at a PER-LANE level (mipmap.rs ewa)."""
    w = w_li.astype(F32)
    h = h_li.astype(F32)
    st = jnp.stack([u * w - 0.5, (1.0 - v) * h - 0.5], axis=-1)
    wh = jnp.stack([w, h], axis=-1)
    d0 = major * wh
    d0 = d0.at[:, 1].multiply(-1.0)
    d1 = minor * wh
    d1 = d1.at[:, 1].multiply(-1.0)

    a = d0[:, 1] ** 2 + d1[:, 1] ** 2 + 1.0
    b = -2.0 * (d0[:, 0] * d0[:, 1] + d1[:, 0] * d1[:, 1])
    c = d0[:, 0] ** 2 + d1[:, 0] ** 2 + 1.0
    inv_f = 1.0 / jnp.maximum(a * c - b * b * 0.25, 1e-12)
    a, b, c = a * inv_f, b * inv_f, c * inv_f

    det = -b * b + 4.0 * a * c
    inv_det = 1.0 / jnp.maximum(det, 1e-12)
    u_r = jnp.sqrt(jnp.maximum(c * det, 0.0)) * inv_det * 2.0
    v_r = jnp.sqrt(jnp.maximum(a * det, 0.0)) * inv_det * 2.0
    s0 = jnp.ceil(st[:, 0] - jnp.minimum(u_r, EWA_R)).astype(jnp.int32)
    t0 = jnp.ceil(st[:, 1] - jnp.minimum(v_r, EWA_R)).astype(jnp.int32)

    lut = jnp.asarray(_EWA_LUT, F32)
    acc = jnp.zeros(u.shape + (3,), F32)
    wsum = jnp.zeros(u.shape, F32)
    for dj in range(2 * EWA_R):
        for di in range(2 * EWA_R):
            si = s0 + di
            tj = t0 + dj
            ss = si.astype(F32) - st[:, 0]
            tt = tj.astype(F32) - st[:, 1]
            r2 = a * ss * ss + b * ss * tt + c * tt * tt
            inside = r2 < 1.0
            li = jnp.clip((r2 * 128).astype(jnp.int32), 0, 127)
            wt = jnp.where(inside, lut[li], 0.0)
            if wrap == "repeat":
                xi = jnp.mod(si, w_li)
                yj = jnp.mod(tj, h_li)
            else:
                xi = jnp.clip(si, 0, w_li - 1)
                yj = jnp.clip(tj, 0, h_li - 1)
            acc = acc + wt[:, None] * atlas[yj + off_l, xi]
            wsum = wsum + wt
    fallback = _atlas_bilinear(atlas, off_l, h_li, w_li, u, v, wrap)
    ok = wsum > 1e-6
    return jnp.where(ok[:, None], acc / jnp.maximum(wsum, 1e-6)[:, None], fallback)


def _ewa_level(img, u, v, major, minor, wrap):
    """Elliptically weighted average on one level (mipmap.rs ewa)."""
    h, w, _ = img.shape
    st = jnp.stack([u * w - 0.5, (1.0 - v) * h - 0.5], axis=-1)
    d0 = major * jnp.asarray([w, h], F32)
    d0 = d0.at[:, 1].multiply(-1.0)
    d1 = minor * jnp.asarray([w, h], F32)
    d1 = d1.at[:, 1].multiply(-1.0)

    a = d0[:, 1] ** 2 + d1[:, 1] ** 2 + 1.0
    b = -2.0 * (d0[:, 0] * d0[:, 1] + d1[:, 0] * d1[:, 1])
    c = d0[:, 0] ** 2 + d1[:, 0] ** 2 + 1.0
    inv_f = 1.0 / jnp.maximum(a * c - b * b * 0.25, 1e-12)
    a, b, c = a * inv_f, b * inv_f, c * inv_f

    det = -b * b + 4.0 * a * c
    inv_det = 1.0 / jnp.maximum(det, 1e-12)
    u_r = jnp.sqrt(jnp.maximum(c * det, 0.0)) * inv_det * 2.0
    v_r = jnp.sqrt(jnp.maximum(a * det, 0.0)) * inv_det * 2.0
    # fixed scan window (bounded): cap the ellipse extent at +-EWA_R texels
    EWA_R = 4
    s0 = jnp.ceil(st[:, 0] - u_r).astype(jnp.int32)
    t0 = jnp.ceil(st[:, 1] - v_r).astype(jnp.int32)

    lut = jnp.asarray(_EWA_LUT, F32)
    acc = jnp.zeros(u.shape + (3,), F32)
    wsum = jnp.zeros(u.shape, F32)
    for dj in range(2 * EWA_R):
        for di in range(2 * EWA_R):
            si = s0 + di
            tj = t0 + dj
            ss = si.astype(F32) - st[:, 0]
            tt = tj.astype(F32) - st[:, 1]
            r2 = a * ss * ss + b * ss * tt + c * tt * tt
            inside = r2 < 1.0
            li = jnp.clip((r2 * 128).astype(jnp.int32), 0, 127)
            wt = jnp.where(inside, lut[li], 0.0)
            if wrap == "repeat":
                xi = jnp.mod(si, w)
                yj = jnp.mod(tj, h)
            else:
                xi = jnp.clip(si, 0, w - 1)
                yj = jnp.clip(tj, 0, h - 1)
            acc = acc + wt[:, None] * img[yj, xi]
            wsum = wsum + wt
    fallback = _bilinear_level(img, u, v, wrap)
    ok = wsum > 1e-6
    return jnp.where(ok[:, None], acc / jnp.maximum(wsum, 1e-6)[:, None], fallback)
