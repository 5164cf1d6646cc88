"""Persistent path-tracing megakernel (Pallas TPU) for brute-force scenes.

The XLA persistent wavefront (integrator.trace_persistent) lowers to ~1.8k
HLO ops per bounce iteration; profiling on the spheres bench scene shows the
loop is fully memory-bound (62% HBM / 38% VMEM r+w) because every fusion
round-trips (R,)-sized intermediates through memory — ~26 ns per
lane-iteration against a ~1.5 ns compute floor. This kernel is the SURVEY
§2.12 megakernel endpoint of the wavefront design: the ENTIRE persistent
loop — camera regen, brute-force intersection, NEE + shadow rays, BSDF
sampling, Russian roulette, sample flush — runs inside ONE pallas_call.
Path state lives in registers/VMEM for the whole render and scene data
(primitives, materials, lights, camera matrices) is baked into the
instruction stream as compile-time constants.

Eligibility (megakernel_eligible): the brute-force small-scene class —
<= MAX_PRIMS triangle/full-sphere prims, baked-lobe materials
{matte(lambert or Oren-Nayar sigma), mirror, glass(smooth), GGX metal
(dielectric/conductor Fresnel), lambert+GGX plastic} with constant
textures OR (round 5) uv-mapped GRAYSCALE imagemap Kd <= 128x128
(VMEM-resident mip atlas, ray-cone trilinear lookup — eval_kd_tex;
colored maps and textured spheres keep the XLA path), delta lights
{point, spot, distant}, pinhole perspective camera, box filter,
(0,2)-family or uniform samplers, no media/motion/area/infinite lights.
Estimator kinds: path AND (round 5) directlighting — NEE at every
vertex with specular-only continuation, no RR (integrator.rs:409-520).
The reference spheres-differentials-texfilt fidelity scene runs this
tier end to end: 188.5s (XLA wave) -> 2.7s warm, blurred_mse 0.0230.
Everything else falls back to the XLA persistent / per-sample waves
(render.make_persistent_fn chooses).

Estimator parity: identical (pixel, sample, dimension) sample streams and
per-sample math as trace_persistent — the hash/Sobol' bit arithmetic is
reproduced exactly (uint32), float math to ulp-level differences
(tests/test_megakernel.py asserts image parity on CPU interpret mode).

Semantic references: device/integrator.py trace_persistent,
src/integrators/path.rs:79-222, src/core/integrator.rs:109-237
(estimate_direct), src/shapes/{triangle.rs:136-399, sphere.rs},
src/core/reflection.rs (lambertian/specular/fresnel-specular).
"""
from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.arrays import (
    GEOM_SPHERE, GEOM_TRI, LIGHT_DISTANT, LIGHT_POINT, LIGHT_SPOT,
    QUADRIC_SPHERE,
)

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

MAX_PRIMS = 16
MAX_LIGHTS = 4
SUB = 16  # sublane rows per block; block = SUB*128 lanes
LANES = 128
SHADOW_EPS = 1e-4  # intersect.SHADOW_EPS
RAY_EPS = 1e-3  # integrator.RAY_EPS
DPB = 8  # dims per bounce (trace_persistent)
INV_PI = float(1.0 / np.pi)
_EPS32 = float(np.finfo(np.float32).eps) * 0.5

# lobe kinds (bsdf.py)
LOBE_NONE = 0
LOBE_LAMBERT_R = 1
LOBE_SPEC_R = 6
LOBE_FRESNEL_SPEC = 8

FLAG_FLIP_GEOM_N = 1
FLAG_HAS_SHADING_N = 2


def _gamma(n: int) -> float:
    return n * _EPS32 / (1.0 - n * _EPS32)


def _falsev(like):
    """All-false i1 vector (a materialized bool array would be i8, which
    Mosaic cannot truncate back to i1 — build it as a comparison)."""
    z = jnp.zeros(like.shape, I32)
    return z > 0


# ---------------------------------------------------------------------------
# In-kernel math helpers (component form; all shapes (SUB, 128))
# ---------------------------------------------------------------------------


def _pcg(x):
    state = x * U32(747796405) + U32(2891336453)
    word = ((state >> ((state >> U32(28)) + U32(4))) ^ state) * U32(277803737)
    return (word >> U32(22)) ^ word


def _u32f(u):
    """uint32 -> [0, 2^32) float32 via signed cast + wraparound (Mosaic has
    no u32->f32 cast; result matches XLA's u32 convert to <=1 ulp)."""
    i = pltpu.bitcast(u, I32)
    f = i.astype(F32)
    return jnp.where(f < 0, f + jnp.float32(4294967296.0), f)


_ONE_MINUS_EPS = float(np.float32(1.0 - 2.0 ** -24))
_INV_2_32 = float(np.float32(2.3283064365386963e-10))


def _u2f01(u):
    return jnp.minimum(_u32f(u) * jnp.float32(_INV_2_32), jnp.float32(_ONE_MINUS_EPS))


def _reverse_bits(x):
    x = (x << U32(16)) | (x >> U32(16))
    x = ((x & U32(0x00FF00FF)) << U32(8)) | ((x & U32(0xFF00FF00)) >> U32(8))
    x = ((x & U32(0x0F0F0F0F)) << U32(4)) | ((x & U32(0xF0F0F0F0)) >> U32(4))
    x = ((x & U32(0x33333333)) << U32(2)) | ((x & U32(0xCCCCCCCC)) >> U32(2))
    x = ((x & U32(0x55555555)) << U32(1)) | ((x & U32(0xAAAAAAAA)) >> U32(1))
    return x


def _sobol2_matrix():
    v = np.zeros(32, dtype=np.uint64)
    a = 1 << 31
    for i in range(32):
        v[i] = a
        a ^= a >> 1
    return v.astype(np.uint32)


_SOBOL2 = _sobol2_matrix()


def _vdc(index, scramble):
    return _u2f01(_reverse_bits(index) ^ scramble)


def _sobol2(index, scramble):
    res = scramble
    for i in range(32):
        bit = (index >> U32(i)) & U32(1)
        res = res ^ (bit * U32(int(_SOBOL2[i])))
    return _u2f01(res)


def _sample02(index, s1, s2):
    return _vdc(index, s1), _sobol2(index, s2)


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _norm3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, jnp.float32(1e-30)))
    # match jnp.linalg.norm-based _normalize (x / max(|v|, eps)) to fp noise
    n = jnp.sqrt(jnp.maximum(x * x + y * y + z * z, jnp.float32(0.0)))
    inv = 1.0 / jnp.maximum(n, jnp.float32(1e-30))
    return x * inv, y * inv, z * inv


def _next_float_away(x, direction):
    """integrator._next_float_away, componentwise."""
    bits = pltpu.bitcast(x, U32)
    up = direction > 0
    nonneg = x >= 0
    bump = jnp.where(up == nonneg, U32(1), U32(0xFFFFFFFF))
    moved = pltpu.bitcast(bits + bump, F32)
    tiny = jnp.float32(1.17549435e-38)
    moved = jnp.where(x == 0.0, jnp.where(up, tiny, -tiny), moved)
    return jnp.where(direction == 0.0, x, moved)


def _offset_ray(px, py, pz, ngx, ngy, ngz, wx, wy, wz, ex, ey, ez):
    """integrator._offset_ray with p_err (error-bounded offset + ulp bump)."""
    d = jnp.abs(ngx) * ex + jnp.abs(ngy) * ey + jnp.abs(ngz) * ez
    ox, oy, oz = d * ngx, d * ngy, d * ngz
    flip = _dot3(wx, wy, wz, ngx, ngy, ngz) < 0
    ox = jnp.where(flip, -ox, ox)
    oy = jnp.where(flip, -oy, oy)
    oz = jnp.where(flip, -oz, oz)
    return (
        _next_float_away(px + ox, ox),
        _next_float_away(py + oy, oy),
        _next_float_away(pz + oz, oz),
    )


def _concentric_disk(u1, u2):
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    deg = (ox == 0) & (oy == 0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    safe_x = jnp.where(ox == 0, 1.0, ox)
    safe_y = jnp.where(oy == 0, 1.0, oy)
    r = jnp.where(use_x, ox, oy)
    pio4 = jnp.float32(np.pi / 4.0)
    pio2 = jnp.float32(np.pi / 2.0)
    theta = jnp.where(use_x, pio4 * (oy / safe_x), pio2 - pio4 * (ox / safe_y))
    r = jnp.where(deg, 0.0, r)
    theta = jnp.where(deg, 0.0, theta)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _fresnel_dielectric(cos_i, eta_i: float, eta_t: float):
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0
    ei = jnp.where(entering, jnp.float32(eta_i), jnp.float32(eta_t))
    et = jnp.where(entering, jnp.float32(eta_t), jnp.float32(eta_i))
    ci = jnp.abs(cos_i)
    sin_t = ei / et * jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    tir = sin_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_parl = (et * ci - ei * ct) / jnp.maximum(et * ci + ei * ct, 1e-30)
    r_perp = (ei * ci - et * ct) / jnp.maximum(ei * ci + et * ct, 1e-30)
    f = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


def _fresnel_dielectric_var(cos_i, eta):
    """fresnel_dielectric with per-lane eta_t (eta_i = 1)."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0
    ei = jnp.where(entering, 1.0, eta)
    et = jnp.where(entering, eta, 1.0)
    ci = jnp.abs(cos_i)
    sin_t = ei / et * jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    tir = sin_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_parl = (et * ci - ei * ct) / jnp.maximum(et * ci + ei * ct, 1e-30)
    r_perp = (ei * ci - et * ct) / jnp.maximum(ei * ci + et * ct, 1e-30)
    f = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


# ---------------------------------------------------------------------------
# Shared baked-material accessors + lobe math (brute AND wide megakernels).
# All functions operate on (SUB, LANES)-shaped f32 channel arrays; material
# constants are python floats from the baked `mats` table, selected by
# per-lane `where` chains over the (few) used material rows.
# ---------------------------------------------------------------------------

# bsdf.py lobe ids — keep in lockstep
LOBE_OREN_NAYAR = 3
LOBE_MICRO_R = 4
# synthetic in-kernel id for the 2-lobe lambert+GGX class (plastic, glossy
# uber rows): bsdf.py represents it as two slots; the baked kernels fold it
# into one mat row with a per-sample lobe pick
LOBE_PLASTIC = 100


def make_mat_helpers(mats, mat_rows):
    """Closure bundle over one baked material table (see module note)."""
    import types

    def mat_select(mat, field, default=0.0):
        out = jnp.broadcast_to(jnp.float32(default), mat.shape)
        for m in mat_rows:
            v = mats[m].get(field)
            if v is None:
                continue
            out = jnp.where(mat == m, jnp.float32(v), out)
        return out

    def mat_color(mat, field, ch):
        out = jnp.zeros(mat.shape, F32)
        for m in mat_rows:
            v = mats[m].get(field)
            if v is None:
                continue
            out = jnp.where(mat == m, jnp.float32(v[ch]), out)
        return out

    def mat_mask(mat, lobe_kind):
        out = _falsev(mat)
        for m in mat_rows:
            if mats[m]["lobe"] == lobe_kind:
                out = out | (mat == m)
        return out

    def mat_mask_in(mat, lobe_kinds):
        out = _falsev(mat)
        for m in mat_rows:
            if mats[m]["lobe"] in lobe_kinds:
                out = out | (mat == m)
        return out

    def mat_mask_fr(mat, fr_kind):
        out = _falsev(mat)
        for m in mat_rows:
            if (mats[m]["lobe"] in (LOBE_MICRO_R, LOBE_PLASTIC)
                    and mats[m]["fr_m"] == fr_kind):
                out = out | (mat == m)
        return out

    any_fr_die = any(mats[m]["lobe"] in (LOBE_MICRO_R, LOBE_PLASTIC)
                     and mats[m]["fr_m"] == 1 for m in mat_rows)
    any_fr_con = any(mats[m]["lobe"] in (LOBE_MICRO_R, LOBE_PLASTIC)
                     and mats[m]["fr_m"] == 2 for m in mat_rows)

    # -- GGX microfacet reflection, channel form (bsdf.py ggx_* lockstep) --

    def _ggx_d_ch(hx, hy, hz, ax, ay):
        c2 = hz * hz
        e = jnp.where(
            c2 > 1e-12,
            (hx * hx / jnp.maximum(ax * ax, 1e-12)
             + hy * hy / jnp.maximum(ay * ay, 1e-12)) / jnp.maximum(c2, 1e-12),
            0.0)
        denom = jnp.float32(math.pi) * ax * ay * c2 * c2 * (1.0 + e) ** 2
        return jnp.where(c2 > 1e-12, 1.0 / jnp.maximum(denom, 1e-20), 0.0)

    def _ggx_lambda_ch(x, y, z, ax, ay):
        c2 = z * z
        a2 = x * x * ax * ax + y * y * ay * ay
        alpha2_tan2 = jnp.where(c2 > 1e-12, a2 / jnp.maximum(c2, 1e-12), 1e12)
        lam = 0.5 * (-1.0 + jnp.sqrt(1.0 + alpha2_tan2))
        return jnp.where(jnp.abs(z) > 1e-6, lam, 1e6)

    def ggx_sample_wh(wo_x, wo_y, wo_z, u1, u2, ax, ay):
        """Visible-normal sampling (bsdf.ggx_sample_wh, channel form)."""
        flip = wo_z < 0
        wfx = jnp.where(flip, -wo_x, wo_x)
        wfy = jnp.where(flip, -wo_y, wo_y)
        wfz = jnp.where(flip, -wo_z, wo_z)
        sx, sy, sz = _norm3(ax * wfx, ay * wfy, wfz)
        # t1 = norm(cross(z, wi_s)) = norm(-sy, sx, 0); (1,0,0) when near-z
        tl = jnp.sqrt(jnp.maximum(sx * sx + sy * sy, 0.0))
        near_z = sz >= 0.9999
        inv_tl = 1.0 / jnp.maximum(tl, 1e-30)
        t1x = jnp.where(near_z, 1.0, -sy * inv_tl)
        t1y = jnp.where(near_z, 0.0, sx * inv_tl)
        # t2 = cross(wi_s, t1)
        t2x = sy * 0.0 - sz * t1y
        t2y = sz * t1x - sx * 0.0
        t2z = sx * t1y - sy * t1x
        a = 1.0 / (1.0 + sz)
        r = jnp.sqrt(jnp.maximum(u1, 0.0))
        phi = jnp.where(u2 < a, u2 / jnp.maximum(a, 1e-12) * jnp.float32(math.pi),
                        jnp.float32(math.pi) + (u2 - a) / jnp.maximum(1.0 - a, 1e-12) * jnp.float32(math.pi))
        p1 = r * jnp.cos(phi)
        p2 = r * jnp.sin(phi) * jnp.where(u2 < a, 1.0, sz)
        p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
        nhx = p1 * t1x + p2 * t2x + p3 * sx
        nhy = p1 * t1y + p2 * t2y + p3 * sy
        nhz = p2 * t2z + p3 * sz
        hx, hy, hz = _norm3(ax * nhx, ay * nhy, jnp.maximum(nhz, 1e-6))
        return (jnp.where(flip, -hx, hx), jnp.where(flip, -hy, hy),
                jnp.where(flip, -hz, hz))

    def micro_fresnel(mat, cos_f):
        """lobe_fresnel for the micro lobe: per-mat none/dielectric/conductor."""
        ones = jnp.ones(cos_f.shape, F32)
        fr_r = fr_g = fr_b = ones
        if any_fr_die:
            die_m = mat_mask_fr(mat, 1)
            fd = _fresnel_dielectric_var(cos_f, mat_select(mat, "eta_m", 1.5))
            fr_r = jnp.where(die_m, fd, fr_r)
            fr_g = jnp.where(die_m, fd, fr_g)
            fr_b = jnp.where(die_m, fd, fr_b)
        if any_fr_con:
            con_m = mat_mask_fr(mat, 2)
            ci = jnp.clip(jnp.abs(cos_f), 0.0, 1.0)
            cos2 = ci * ci
            sin2 = 1.0 - cos2
            outs = []
            for ch in range(3):
                eta_c = mat_color(mat, "eta_rgb", ch)
                k_c = mat_color(mat, "k_rgb", ch)
                eta2 = eta_c * eta_c
                k2 = k_c * k_c
                t0 = eta2 - k2 - sin2
                a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * k2, 0.0))
                t1 = a2b2 + cos2
                a_ = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
                t2 = 2.0 * a_ * ci
                rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-30)
                t3 = cos2 * a2b2 + sin2 * sin2
                t4 = t2 * sin2
                rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-30)
                outs.append(0.5 * (rp + rs))
            fr_r = jnp.where(con_m, outs[0], fr_r)
            fr_g = jnp.where(con_m, outs[1], fr_g)
            fr_b = jnp.where(con_m, outs[2], fr_b)
        return fr_r, fr_g, fr_b

    def micro_f_pdf(mat, mic_m, wo_x, wo_y, wo_z, wi_x, wi_y, wi_z):
        """GGX MICRO_R f (rgb, no cos factor) + visible-normal solid-angle
        pdf toward wi, local shading frame (bsdf._lobe_f/_lobe_pdf)."""
        axv = mat_select(mat, "ax", 1e-3)
        ayv = mat_select(mat, "ay", 1e-3)
        whx = wi_x + wo_x
        why = wi_y + wo_y
        whz = wi_z + wo_z
        wh_len = jnp.sqrt(whx * whx + why * why + whz * whz)
        inv_l = 1.0 / jnp.maximum(wh_len, 1e-30)
        hx, hy, hz = whx * inv_l, why * inv_l, whz * inv_l
        d_val = _ggx_d_ch(hx, hy, hz, axv, ayv)
        g_val = 1.0 / (1.0 + _ggx_lambda_ch(wo_x, wo_y, wo_z, axv, ayv)
                       + _ggx_lambda_ch(wi_x, wi_y, wi_z, axv, ayv))
        # fresnel at dot(wi, wh) with wh flipped to the +z hemisphere
        hsign = jnp.where(hz < 0, -1.0, 1.0)
        cos_f = (wi_x * hx + wi_y * hy + wi_z * hz) * hsign
        fr_r, fr_g, fr_b = micro_fresnel(mat, cos_f)
        abs_ci = jnp.abs(wi_z)
        abs_co = jnp.abs(wo_z)
        base = d_val * g_val / jnp.maximum(4.0 * abs_co * abs_ci, 1e-12)
        refl_hemi = wo_z * wi_z > 0
        ok = mic_m & refl_hemi & (wh_len > 1e-12) & (abs_ci > 0) & (abs_co > 0)
        ksr = mat_color(mat, "ks", 0)
        ksg = mat_color(mat, "ks", 1)
        ksb = mat_color(mat, "ks", 2)
        f_r = jnp.where(ok, ksr * fr_r * base, 0.0)
        f_g = jnp.where(ok, ksg * fr_g * base, 0.0)
        f_b = jnp.where(ok, ksb * fr_b * base, 0.0)
        # pdf: D(wh) G1(wo) |wo.wh| / |cos wo| / (4 |wo.wh|)
        g1 = 1.0 / (1.0 + _ggx_lambda_ch(wo_x, wo_y, wo_z, axv, ayv))
        dot_oh = jnp.abs(wo_x * hx + wo_y * hy + wo_z * hz)
        p = (d_val * g1 * dot_oh / jnp.maximum(abs_co, 1e-9)
             / jnp.maximum(4.0 * dot_oh, 1e-12))
        p = jnp.where(mic_m & refl_hemi, p, 0.0)
        return f_r, f_g, f_b, p

    def on_factor(mat, wo_x, wo_y, wo_z, wi_x, wi_y, wi_z):
        """Oren-Nayar f / kd: INV_PI * (A + B max_cos sin_alpha tan_beta)
        (bsdf._lobe_f LOBE_OREN_NAYAR branch, channel form)."""
        si = jnp.sqrt(jnp.maximum(1.0 - wi_z * wi_z, 0.0))
        so = jnp.sqrt(jnp.maximum(1.0 - wo_z * wo_z, 0.0))
        cpi = jnp.where(si > 1e-4, wi_x / jnp.maximum(si, 1e-12), 1.0)
        spi = jnp.where(si > 1e-4, wi_y / jnp.maximum(si, 1e-12), 0.0)
        cpo = jnp.where(so > 1e-4, wo_x / jnp.maximum(so, 1e-12), 1.0)
        spo = jnp.where(so > 1e-4, wo_y / jnp.maximum(so, 1e-12), 0.0)
        max_cos = jnp.maximum(0.0, cpi * cpo + spi * spo)
        abs_ci = jnp.abs(wi_z)
        abs_co = jnp.abs(wo_z)
        sin_alpha = jnp.where(abs_ci > abs_co, so, si)
        tan_beta = jnp.where(abs_ci > abs_co,
                             si / jnp.maximum(abs_ci, 1e-9),
                             so / jnp.maximum(abs_co, 1e-9))
        a_v = mat_select(mat, "on_a", 1.0)
        b_v = mat_select(mat, "on_b", 0.0)
        return jnp.float32(INV_PI) * (a_v + b_v * max_cos * sin_alpha * tan_beta)

    return types.SimpleNamespace(
        mat_select=mat_select, mat_color=mat_color, mat_mask=mat_mask,
        mat_mask_in=mat_mask_in, mat_mask_fr=mat_mask_fr,
        ggx_sample_wh=ggx_sample_wh, micro_fresnel=micro_fresnel,
        micro_f_pdf=micro_f_pdf, on_factor=on_factor,
    )


def bake_lobe_entry(kinds, slots, ld_m, kd_tex=None):
    """Bake one material's active lobe slots into a kernel `mats` entry, or
    return None when the combination isn't kernel-eligible. Shared by the
    brute and wide extractors (kd_tex — the wide kernel's checkerboard
    override — must ride a lambert lobe)."""
    if kinds == [LOBE_OREN_NAYAR]:
        # matte with sigma > 0 (reflection.rs OrenNayar :901); cosine
        # sampled like lambert with the A/B retro factor in f
        d = ld_m[slots[0]]
        return {"lobe": LOBE_OREN_NAYAR,
                "color": d[0:3].astype(float).tolist(),
                "on_a": float(d[12]), "on_b": float(d[13]),
                "kd_tex": kd_tex}
    if kinds in ([LOBE_MICRO_R], [LOBE_LAMBERT_R, LOBE_MICRO_R]):
        # GGX microfacet reflection (metal / plastic / glossy uber rows):
        # slot order is [lambert?, micro], matching bsdf_sample's
        # active-slot pick order. Beckmann (data[12]>0) and Schlick
        # fresnel keep the XLA path.
        md = ld_m[slots[-1]]
        if float(md[12]) > 0:
            return None
        fr_kind = int(md[11])
        if fr_kind not in (0, 1, 2):
            return None
        two = len(kinds) == 2
        if kd_tex is not None and not two:
            return None  # checker Kd needs the lambert lobe
        return {
            "lobe": LOBE_PLASTIC if two else LOBE_MICRO_R,
            "color": (ld_m[slots[0]][0:3].astype(float).tolist()
                      if two else [0.0, 0.0, 0.0]),
            "ks": md[0:3].astype(float).tolist(),
            "ax": float(md[9]), "ay": float(md[10]),
            "fr_m": fr_kind,
            "eta_m": float(max(float(md[3]), 1.0 + 1e-6)),
            "eta_rgb": md[3:6].astype(float).tolist(),
            "k_rgb": md[6:9].astype(float).tolist(),
            "kd_tex": kd_tex,
        }
    if len(slots) != 1:
        return None
    s = int(slots[0])
    kind = kinds[0]
    if kind not in (LOBE_LAMBERT_R, LOBE_SPEC_R, LOBE_FRESNEL_SPEC):
        return None
    if kd_tex is not None and kind != LOBE_LAMBERT_R:
        return None  # checker Kd is only baked for the lambert lobe
    d = ld_m[s]
    if kind == LOBE_SPEC_R and int(d[11]) not in (0, 1):
        return None
    return {"lobe": kind, "color": d[0:3].astype(float).tolist(),
            "eta": float(d[3]), "kt": d[6:9].astype(float).tolist(),
            "fresnel": int(d[11]), "kd_tex": kd_tex}


# ---------------------------------------------------------------------------
# Host-side constant extraction + eligibility
# ---------------------------------------------------------------------------


def _h(x):
    return np.asarray(jax.device_get(x))


def _bake_imagemap_atlas(sa, xi: int, prog):
    """Bake one imagemap texture program into a kernel mip atlas, or None
    if it is outside the in-kernel class.

    Class: uv mapping, repeat wrap, grayscale (the in-kernel fetch is
    single-channel; colored maps keep the XLA path), base level <=128x128
    (the per-lane column gather reaches 128 lanes). Returns {"atlas"
    (rows, 128) f32, "offs" [(row_off, h, w)] per level, "uscale",
    "vscale", "udelta", "vdelta", "scale"}.
    """
    if prog.mapping != "uv" or prog.wrap != "repeat":
        return None
    par = _h(sa.tex_param[xi]).astype(np.float64)
    levels = []
    for k in range(prog.n_levels):
        img = _h(sa.tex_images[f"{prog.image_key}_l{k}"]).astype(np.float32)
        if img.ndim != 3 or img.shape[2] != 3:
            return None
        if np.abs(img - img[:, :, :1]).max() > 1e-5:
            return None  # not grayscale
        levels.append(img[:, :, 0])
    if not levels or levels[0].shape[0] > 128 or levels[0].shape[1] > 128:
        return None
    rows = []
    offs = []
    off = 0
    for g in levels:
        h, w = g.shape
        padded = np.zeros((h, LANES), np.float32)
        padded[:, :w] = g
        rows.append(padded)
        offs.append((off, h, w))
        off += h
    atlas = np.concatenate(rows, axis=0)
    # pad rows to a sublane multiple
    if atlas.shape[0] % 8:
        atlas = np.concatenate(
            [atlas, np.zeros((8 - atlas.shape[0] % 8, LANES), np.float32)])
    return {
        "kind": "imagemap", "atlas": atlas, "offs": offs,
        "uscale": float(par[0]), "vscale": float(par[1]),
        "udelta": float(par[2]), "vdelta": float(par[3]),
        "scale": float(par[10]) if par[10] != 0 else 1.0,
    }


def extract_consts(cs, cam, icfg, scfg, fcfg):
    """Bake the scene into Python constants, or return None if the scene is
    outside the megakernel's class."""
    sa, static, desc = cs.arrays, cs.static, cs.description
    if not static.use_brute_force or static.n_prims == 0 or static.n_prims > MAX_PRIMS:
        return None
    if static.has_infinite or static.has_area_lights or static.n_media:
        return None
    if getattr(static, "has_motion", False):
        return None
    if cam["kind"] != 0 or cam.get("anim") is not None or cam.get("realistic") is not None:
        return None
    if float(_h(cam["lens_radius"])) != 0.0:
        return None
    if scfg["kind"] not in ("zerotwosequence", "lowdiscrepancy", "random", "stratified"):
        return None
    if fcfg["filter"] not in ("box",):
        return None
    # textures: constants bake directly; uv-mapped GRAYSCALE imagemaps
    # (<=128x128 base, repeat wrap) ride a VMEM mip atlas with an
    # in-kernel trilinear ray-cone lookup (mipmap.rs:202-224 semantics).
    # Anything else keeps the XLA path.
    imagemaps = {}
    for xi, p in enumerate(static.tex_programs):
        if p.kind == "constant":
            continue
        atlas = _bake_imagemap_atlas(sa, xi, p) if p.kind == "imagemap" else None
        if atlas is None:
            return None
        imagemaps[xi] = atlas
    if static.n_lights > MAX_LIGHTS:
        return None

    light_kind = _h(sa.light_kind) if static.n_lights else np.zeros(0, np.int32)
    if not all(int(k) in (LIGHT_POINT, LIGHT_DISTANT, LIGHT_SPOT) for k in light_kind):
        return None
    light_param = _h(sa.light_param) if static.n_lights else np.zeros((0, 12), np.float32)

    # light selection pmf/cdf (mirror _light_selectors)
    n_l = static.n_lights
    strategy = str(icfg.get("light_strategy", "uniform"))
    uniform_select = not (n_l > 1 and strategy in ("power", "spatial"))
    if not uniform_select:
        if strategy == "spatial":
            return None  # voxel-grid lookup not baked; XLA path handles it
        from .lights import compute_power

        pw = _h(compute_power(sa, static))
        pmf = np.maximum(pw / max(pw.sum(), 1e-20), 1e-6)
        pmf = pmf / pmf.sum()
    else:
        pmf = np.full(max(n_l, 1), 1.0 / max(n_l, 1), np.float32)
    cdf = np.cumsum(pmf)

    # prims in _brute_all order: all triangles (table order), then quadrics
    prim_mat = _h(sa.prim_mat)
    prim_flags = _h(sa.prim_flags)
    prim_light = _h(sa.prim_light)
    if (prim_light >= 0).any():
        return None
    prims = []
    if sa.tri_p.shape[0] > 0:
        tri_p = _h(sa.tri_p)
        tri_n = _h(sa.tri_n)
        tri_uv = _h(sa.tri_uv)
        tri_pid = _h(sa.tri_prim_ids)
        for i in range(tri_p.shape[0]):
            prims.append({
                "kind": "tri", "v": tri_p[i], "n": tri_n[i], "uv": tri_uv[i],
                "pid": int(tri_pid[i]), "mat": int(prim_mat[tri_pid[i]]),
                "flags": int(prim_flags[tri_pid[i]]),
            })
    if sa.sph_param.shape[0] > 0:
        sph_w2o = _h(sa.sph_w2o)
        sph_o2w = _h(sa.sph_o2w)
        sph_par = _h(sa.sph_param)
        sph_kind = _h(sa.sph_kind)
        sph_pid = _h(sa.sph_prim_ids)
        for i in range(sph_par.shape[0]):
            if int(sph_kind[i]) != QUADRIC_SPHERE:
                return None
            r = float(sph_par[i, 0])
            zmin, zmax, phimax = float(sph_par[i, 1]), float(sph_par[i, 2]), float(sph_par[i, 3])
            if not (zmin <= -r + 1e-7 * r and zmax >= r - 1e-7 * r and phimax >= 2 * np.pi - 1e-6):
                return None  # partial spheres keep the XLA clip path
            prims.append({
                "kind": "sph", "w2o": sph_w2o[i], "o2w": sph_o2w[i], "r": r,
                "phimax": phimax, "pid": int(sph_pid[i]),
                "mat": int(prim_mat[sph_pid[i]]), "flags": int(prim_flags[sph_pid[i]]),
            })
    if len(prims) != static.n_prims:
        return None  # instancing or exotic rows present

    # bake material lobes by evaluating the materials compiler once
    from ..scene.arrays import MAT_MIX
    from .materials import make_bsdf

    if MAT_MIX in set(static.mat_kinds_present):
        # mix resolves its stochastic sub-material per hit; baking at a
        # fixed point would freeze the choice (materials.py:168-187)
        return None
    used_mats = sorted({p["mat"] for p in prims})
    n_mats = int(_h(sa.mat_kind).shape[0])
    lob = make_bsdf(sa, static, jnp.arange(n_mats, dtype=jnp.int32),
                    jnp.zeros((n_mats, 2), F32), jnp.zeros((n_mats, 3), F32))
    lk = _h(lob["kind"])  # (n_mats, 8)
    ld = _h(lob["data"])  # (n_mats, 8, 14)
    mat_tex = _h(sa.mat_tex)  # (n_mats, N_MAT_PARAMS)
    from ..scene.arrays import P_KD

    mats = {}
    for m in used_mats:
        slots = np.nonzero(lk[m])[0]
        if len(slots) == 0:
            mats[m] = {"lobe": LOBE_NONE}
            continue
        # imagemap references: only the Kd slot may carry one (baked as the
        # in-kernel atlas lookup); any other textured-by-imagemap slot
        # keeps the XLA path
        kd_tex = None
        for slot in range(mat_tex.shape[1]):
            tid = int(mat_tex[m, slot])
            if tid < 0 or tid not in imagemaps:
                continue
            if slot != P_KD:
                return None
            kd_tex = imagemaps[tid]  # shared: atlas base assigned below
        kinds = [int(lk[m, s]) for s in slots]
        entry = bake_lobe_entry(kinds, [int(s) for s in slots], ld[m], kd_tex=kd_tex)
        if entry is None:
            return None
        mats[m] = entry
    if any(mats[p["mat"]].get("kd_tex") is not None for p in prims if p["kind"] != "tri"):
        return None  # textured sphere prims keep the XLA path (no uv baked)

    # triangle shading constants (verts fixed -> frame fixed)
    for p in prims:
        if p["kind"] != "tri":
            continue
        v0, v1, v2 = p["v"][0].astype(np.float64), p["v"][1].astype(np.float64), p["v"][2].astype(np.float64)
        e1, e2 = v1 - v0, v2 - v0
        ng = np.cross(e1, e2)
        nl = np.linalg.norm(ng)
        ng = ng / max(nl, 1e-30)
        if p["flags"] & FLAG_FLIP_GEOM_N:
            ng = -ng
        has_sn = bool(p["flags"] & FLAG_HAS_SHADING_N)
        if has_sn:
            return None  # per-vertex-normal meshes keep the XLA path
        ns = ng
        uv = p["uv"].astype(np.float64)
        duv1, duv2 = uv[1] - uv[0], uv[2] - uv[0]
        det = duv1[0] * duv2[1] - duv1[1] * duv2[0]
        if abs(det) > 1e-12:
            dpdu = (duv2[1] * e1 - duv1[1] * e2) / det
        else:
            dpdu = e1
        ssp = dpdu - ns * float(np.dot(ns, dpdu))
        sl = np.linalg.norm(ssp)
        if sl > 1e-9:
            ss = ssp / sl
        else:  # coordinate_system fallback
            sign = 1.0 if ns[2] >= 0 else -1.0
            a = -1.0 / (sign + ns[2])
            b = ns[0] * ns[1] * a
            ss = np.array([1.0 + sign * ns[0] * ns[0] * a, sign * b, -sign * ns[0]])
        ts = np.cross(ns, ss)
        p["ng_c"] = ng.astype(np.float32)
        p["ns_c"] = ns.astype(np.float32)
        p["ss_c"] = ss.astype(np.float32)
        p["ts_c"] = ts.astype(np.float32)
        # uv footprint density: uv-length per world-length on this chart
        # (sqrt of the uv-area / world-area ratio) — converts a ray-cone
        # world footprint into a texture-space width for mip selection
        uv_cross = abs(duv1[0] * duv2[1] - duv1[1] * duv2[0])
        p["uvd_c"] = float(np.sqrt(uv_cross / max(nl, 1e-30)))

    # merge every referenced imagemap atlas into one VMEM array; each
    # kd_tex gets its base row. Also hoist the camera's pixel footprint
    # angle for the ray-cone mip level (see _build_kernel eval_kd_tex).
    used_tex = [t for t in imagemaps.values()
                if any(mats[m].get("kd_tex") is t for m in mats)]
    kd_atlas = None
    if used_tex:
        off = 0
        blocks = []
        for t in used_tex:
            t["base"] = off
            blocks.append(t["atlas"])
            off += t["atlas"].shape[0]
        kd_atlas = np.concatenate(blocks, axis=0)

    r2c = _h(cam["raster_to_camera"]).astype(np.float64)
    c2w = _h(cam["camera_to_world"]).astype(np.float64)
    # angular size of one pixel (ray-cone spread): camera-space length of a
    # one-pixel raster step at the image plane, normalized by the ray depth
    p0 = r2c @ np.array([0.0, 0.0, 0.0, 1.0])
    p1 = r2c @ np.array([1.0, 0.0, 0.0, 1.0])
    p2 = r2c @ np.array([0.0, 1.0, 0.0, 1.0])
    z0 = max(abs(float(p0[2])), 1e-6)
    pixel_angle = float(max(np.linalg.norm((p1 - p0)[:3]), np.linalg.norm((p2 - p0)[:3])) / z0)
    consts = {
        "prims": prims,
        "mats": mats,
        "lights": [{"kind": int(light_kind[i]), "par": light_param[i].astype(float)}
                   for i in range(n_l)],
        "light_cdf": cdf.astype(float).tolist(),
        "light_pmf": pmf.astype(float).tolist(),
        "uniform_select": uniform_select,
        "world_radius": float(_h(sa.world_radius)),
        "r2c": r2c,
        "c2w": c2w,
        "filter_xw": float(fcfg["filter_params"].get("xwidth", 0.5)),
        "filter_yw": float(fcfg["filter_params"].get("ywidth", fcfg["filter_params"].get("xwidth", 0.5))),
        "max_depth": int(icfg["max_depth"]),
        "rr_threshold": float(icfg.get("rr_threshold", 1.0)),
        "sampler": scfg["kind"],
        "spp": int(scfg["spp"]),
        "max_lum": float(fcfg.get("max_sample_luminance", float("inf"))),
        # directlighting: NEE at every vertex, specular-only continuation,
        # no RR (integrator.rs specular_reflect/transmit recursion)
        "ikind": str(icfg.get("kind", "path")),
        "kd_atlas": kd_atlas,
        "pixel_angle": pixel_angle,
    }
    if consts["ikind"] not in ("path", "directlighting"):
        return None
    if (consts["ikind"] == "directlighting"
            and str(icfg.get("strategy", "all")) == "all" and n_l > 1):
        return None  # UniformSampleAll arrays not baked; XLA path handles it
    return consts


def megakernel_eligible(cs, cam, icfg, scfg, fcfg) -> bool:
    try:
        return extract_consts(cs, cam, icfg, scfg, fcfg) is not None
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Kernel body codegen
# ---------------------------------------------------------------------------


def _build_kernel(consts, n_samples: int):
    prims = consts["prims"]
    mats = consts["mats"]
    lights = consts["lights"]
    n_lights = len(lights)
    max_depth = consts["max_depth"]
    rr_threshold = consts["rr_threshold"]
    is_random = consts["sampler"] in ("random", "stratified")
    is_stratified = consts["sampler"] == "stratified"
    spp_cfg = max(int(consts.get("spp", 1)), 1)
    strat_xs = max(int(math.floor(math.sqrt(spp_cfg))), 1)
    strat_ys = max(spp_cfg // strat_xs, 1)
    r2c = consts["r2c"]
    c2w = consts["c2w"]
    wr2 = 2.0 * consts["world_radius"]
    fxw, fyw = consts["filter_xw"], consts["filter_yw"]
    max_lum = consts["max_lum"]
    cap = n_samples * (max_depth + 2) + 8

    mat_rows = sorted(mats)
    ikind = consts.get("ikind", "path")
    kd_atlas_np = consts.get("kd_atlas")
    any_kd_tex = kd_atlas_np is not None and any(
        mats[m].get("kd_tex") is not None for m in mat_rows)
    pixel_angle = float(consts.get("pixel_angle", 1e-3))
    kd_textures = []
    kd_atlas_rows = 0
    # ray-cone width multiplier (filter sharpness vs the EWA golden;
    # swept in tools — 1.0 is the shipped default)
    import os as _os

    cone_k = float(_os.environ.get("PBRT_TPU_CONE_K", "1.0"))
    if any_kd_tex:
        for m in mat_rows:
            kt = mats[m].get("kd_tex")
            if kt is not None and all(kt is not s for s in kd_textures):
                kd_textures.append(kt)
        kd_atlas_rows = int(kd_atlas_np.shape[0])
    any_on = any(mats[m]["lobe"] == LOBE_OREN_NAYAR for m in mat_rows)
    any_diffuse = any_on or any(
        mats[m]["lobe"] in (LOBE_LAMBERT_R, LOBE_PLASTIC) for m in mat_rows)
    any_mirror = any(mats[m]["lobe"] == LOBE_SPEC_R for m in mat_rows)
    any_glass = any(mats[m]["lobe"] == LOBE_FRESNEL_SPEC for m in mat_rows)
    any_micro = any(mats[m]["lobe"] in (LOBE_MICRO_R, LOBE_PLASTIC) for m in mat_rows)
    any_plastic = any(mats[m]["lobe"] == LOBE_PLASTIC for m in mat_rows)

    H = make_mat_helpers(mats, mat_rows)
    mat_select = H.mat_select
    mat_color = H.mat_color
    mat_mask = H.mat_mask
    mat_mask_in = H.mat_mask_in
    _ggx_sample_wh_ch = H.ggx_sample_wh
    micro_f_pdf = H.micro_f_pdf
    on_factor = H.on_factor

    def sample_1d_traced(hbase, s_cur, dim_i32):
        """sampler.sample_1d with a traced dim (zerotwo family bottom branch,
        which is also where halton/sobol traced dims land)."""
        if is_random:
            # uniform_1d(seed, pixel, sample, 1024 + dim)
            h = _pcg(hbase ^ s_cur)
            return _u2f01(_pcg(h ^ (U32(1024) + dim_i32.astype(U32))))
        s = _pcg(hbase ^ (U32(4096) + dim_i32.astype(U32)))
        return _vdc(s_cur, s)

    def sample_2d_traced(hbase, s_cur, dim_i32):
        if is_random:
            h = _pcg(hbase ^ s_cur)
            u1 = _u2f01(_pcg(h ^ (U32(2) * dim_i32.astype(U32))))
            u2 = _u2f01(_pcg(h ^ (U32(2) * dim_i32.astype(U32) + U32(1))))
            return u1, u2
        d2 = U32(2) * dim_i32.astype(U32)
        s1 = _pcg(hbase ^ d2)
        s2 = _pcg(hbase ^ (d2 + U32(1)))
        return _sample02(s_cur, s1, s2)

    def intersect_all(ox, oy, oz, dx, dy, dz, t_query, want_attrs):
        """Unrolled brute-force closest-hit (want_attrs) or any-hit."""
        # watertight permute/shear constants (per ray, shared by all tris)
        adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
        k0 = (adx >= ady) & (adx >= adz)
        k1 = (~k0) & (ady >= adz)

        def permute(vx, vy, vz):
            px = jnp.where(k0, vy, jnp.where(k1, vz, vx))
            py = jnp.where(k0, vz, jnp.where(k1, vx, vy))
            pz = jnp.where(k0, vx, jnp.where(k1, vy, vz))
            return px, py, pz

        dpx, dpy, dpz = permute(dx, dy, dz)
        inv_dz = 1.0 / dpz
        sx = -dpx * inv_dz
        sy = -dpy * inv_dz
        sz = inv_dz

        BIG = jnp.float32(1e30)
        t_best = jnp.broadcast_to(BIG, ox.shape)
        if want_attrs:
            z = jnp.zeros(ox.shape, F32)
            attrs = {k: z for k in ("px", "py", "pz", "ngx", "ngy", "ngz",
                                    "nsx", "nsy", "nsz", "ssx", "ssy", "ssz",
                                    "tsx", "tsy", "tsz", "ex", "ey", "ez",
                                    "b1", "b2")}
            if any_kd_tex:
                attrs["u"] = z
                attrs["v"] = z
                attrs["uvd"] = z  # |duv|/|dp| footprint density (ray cones)
            attrs["mat"] = jnp.zeros(ox.shape, I32)
        hit_any = _falsev(ox)

        for pr in prims:
            if pr["kind"] == "tri":
                v = pr["v"].astype(np.float64)
                h_p, t_p, b1_p, b2_p = _tri_test(
                    v, ox, oy, oz, k0, k1, permute, sx, sy, sz, t_query)
            else:
                h_p, t_p, p_loc = _sph_test(pr, ox, oy, oz, dx, dy, dz, t_query)
            hit_any = hit_any | h_p
            if not want_attrs:
                continue
            t_p = jnp.where(h_p, t_p, BIG)
            better = t_p < t_best
            t_best = jnp.where(better, t_p, t_best)
            if pr["kind"] == "tri":
                b0_p = 1.0 - b1_p - b2_p
                # p by barycentric interpolation; gamma(7) error bound
                g7 = jnp.float32(_gamma(7))
                for c, key in enumerate(("px", "py", "pz")):
                    pc = b0_p * jnp.float32(v[0][c]) + b1_p * jnp.float32(v[1][c]) + b2_p * jnp.float32(v[2][c])
                    attrs[key] = jnp.where(better, pc, attrs[key])
                for c, key in enumerate(("ex", "ey", "ez")):
                    ec = g7 * (jnp.abs(b0_p) * abs(float(v[0][c])) +
                               jnp.abs(b1_p) * abs(float(v[1][c])) +
                               jnp.abs(b2_p) * abs(float(v[2][c])))
                    attrs[key] = jnp.where(better, ec, attrs[key])
                for vec, keys in ((pr["ng_c"], ("ngx", "ngy", "ngz")),
                                  (pr["ns_c"], ("nsx", "nsy", "nsz")),
                                  (pr["ss_c"], ("ssx", "ssy", "ssz")),
                                  (pr["ts_c"], ("tsx", "tsy", "tsz"))):
                    for c, key in enumerate(keys):
                        attrs[key] = jnp.where(better, jnp.float32(vec[c]), attrs[key])
                attrs["b1"] = jnp.where(better, b1_p, attrs["b1"])
                attrs["b2"] = jnp.where(better, b2_p, attrs["b2"])
                if any_kd_tex:
                    st = pr["uv"].astype(np.float64)
                    su = (b0_p * jnp.float32(st[0][0]) + b1_p * jnp.float32(st[1][0])
                          + b2_p * jnp.float32(st[2][0]))
                    sv = (b0_p * jnp.float32(st[0][1]) + b1_p * jnp.float32(st[1][1])
                          + b2_p * jnp.float32(st[2][1]))
                    attrs["u"] = jnp.where(better, su, attrs["u"])
                    attrs["v"] = jnp.where(better, sv, attrs["v"])
                    attrs["uvd"] = jnp.where(better, jnp.float32(pr["uvd_c"]), attrs["uvd"])
            else:
                at = _sph_attrs(pr, p_loc)
                for key, val in at.items():
                    attrs[key] = jnp.where(better, val, attrs[key])
            attrs["mat"] = jnp.where(better, pr["mat"], attrs["mat"])

        if want_attrs:
            valid = t_best < BIG
            return valid, t_best, attrs
        return hit_any

    def _tri_test(v, ox, oy, oz, k0, k1, permute, sx, sy, sz, t_query):
        """Watertight test against constant verts (intersect.ray_triangle)."""
        def shear(c):
            vx = jnp.float32(v[c][0]) - ox
            vy = jnp.float32(v[c][1]) - oy
            vz = jnp.float32(v[c][2]) - oz
            px, py, pz = permute(vx, vy, vz)
            return px + sx * pz, py + sy * pz, sz * pz

        x0, y0, z0 = shear(0)
        x1, y1, z1 = shear(1)
        x2, y2, z2 = shear(2)
        e0 = x1 * y2 - y1 * x2
        e1 = x2 * y0 - y2 * x0
        e2 = x0 * y1 - y0 * x1
        same = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
        det = e0 + e1 + e2
        dok = det != 0
        inv_det = jnp.where(dok, 1.0 / jnp.where(dok, det, 1.0), 0.0)
        t = (e0 * z0 + e1 * z1 + e2 * z2) * inv_det
        hit = same & dok & (t > SHADOW_EPS) & (t < t_query)
        return hit, t, e1 * inv_det, e2 * inv_det

    def _sph_test(pr, ox, oy, oz, dx, dy, dz, t_query):
        """Full-sphere quadric (intersect.ray_quadric sphere branch)."""
        m = pr["w2o"].astype(np.float64)
        r = pr["r"]

        def xf_p(m_, x, y, z):
            return (
                jnp.float32(m_[0][0]) * x + jnp.float32(m_[0][1]) * y + jnp.float32(m_[0][2]) * z + jnp.float32(m_[0][3]),
                jnp.float32(m_[1][0]) * x + jnp.float32(m_[1][1]) * y + jnp.float32(m_[1][2]) * z + jnp.float32(m_[1][3]),
                jnp.float32(m_[2][0]) * x + jnp.float32(m_[2][1]) * y + jnp.float32(m_[2][2]) * z + jnp.float32(m_[2][3]),
            )

        def xf_v(m_, x, y, z):
            return (
                jnp.float32(m_[0][0]) * x + jnp.float32(m_[0][1]) * y + jnp.float32(m_[0][2]) * z,
                jnp.float32(m_[1][0]) * x + jnp.float32(m_[1][1]) * y + jnp.float32(m_[1][2]) * z,
                jnp.float32(m_[2][0]) * x + jnp.float32(m_[2][1]) * y + jnp.float32(m_[2][2]) * z,
            )

        oox, ooy, ooz = xf_p(m, ox, oy, oz)
        odx, ody, odz = xf_v(m, dx, dy, dz)
        a = _dot3(odx, ody, odz, odx, ody, odz)
        b = 2.0 * _dot3(oox, ooy, ooz, odx, ody, odz)
        c = _dot3(oox, ooy, ooz, oox, ooy, ooz) - jnp.float32(r * r)
        disc = b * b - 4.0 * a * c
        has_root = disc > 0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        q = jnp.where(b < 0, -0.5 * (b - sq), -0.5 * (b + sq))
        safe = jnp.where(jnp.abs(q) > 1e-30, q, 1.0)
        t0 = q / jnp.where(jnp.abs(a) > 1e-30, a, 1e-30)
        t1 = c / safe
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        near_valid = has_root & (tn > SHADOW_EPS) & (tn < t_query)
        far_valid = has_root & (tf > SHADOW_EPS) & (tf < t_query)
        t = jnp.where(near_valid, tn, tf)
        hit = near_valid | far_valid
        # object-space hit (pre-reprojection); attrs reproject
        px = oox + odx * t
        py = ooy + ody * t
        pz = ooz + odz * t
        return hit, t, (px, py, pz)

    def _sph_attrs(pr, p_loc):
        """surface_interaction sphere branch with constant transforms."""
        r = pr["r"]
        o2w = pr["o2w"].astype(np.float64)
        w2o = pr["w2o"].astype(np.float64)
        px_o, py_o, pz_o = p_loc
        # reproject to the surface
        norm = jnp.sqrt(jnp.maximum(px_o * px_o + py_o * py_o + pz_o * pz_o, 1e-30))
        scale = jnp.float32(r) / jnp.maximum(norm, 1e-30)
        px_o, py_o, pz_o = px_o * scale, py_o * scale, pz_o * scale
        # n_obj = p_obj / r; world normal via (w2o)^T
        nx_o, ny_o, nz_o = px_o / jnp.float32(r), py_o / jnp.float32(r), pz_o / jnp.float32(r)
        ngx = jnp.float32(w2o[0][0]) * nx_o + jnp.float32(w2o[1][0]) * ny_o + jnp.float32(w2o[2][0]) * nz_o
        ngy = jnp.float32(w2o[0][1]) * nx_o + jnp.float32(w2o[1][1]) * ny_o + jnp.float32(w2o[2][1]) * nz_o
        ngz = jnp.float32(w2o[0][2]) * nx_o + jnp.float32(w2o[1][2]) * ny_o + jnp.float32(w2o[2][2]) * nz_o
        ngx, ngy, ngz = _norm3(ngx, ngy, ngz)
        if pr["flags"] & FLAG_FLIP_GEOM_N:
            ngx, ngy, ngz = -ngx, -ngy, -ngz
        # dpdu in object space: (-phimax*y, phimax*x, 0) -> world
        pm = jnp.float32(pr["phimax"])
        dux_o, duy_o = -pm * py_o, pm * px_o
        dux = jnp.float32(o2w[0][0]) * dux_o + jnp.float32(o2w[0][1]) * duy_o
        duy = jnp.float32(o2w[1][0]) * dux_o + jnp.float32(o2w[1][1]) * duy_o
        duz = jnp.float32(o2w[2][0]) * dux_o + jnp.float32(o2w[2][1]) * duy_o
        # ss = normalize(dpdu orthogonalized against ns); fallback frame at poles
        dot_nd = _dot3(ngx, ngy, ngz, dux, duy, duz)
        sx_p = dux - ngx * dot_nd
        sy_p = duy - ngy * dot_nd
        sz_p = duz - ngz * dot_nd
        sl = jnp.sqrt(jnp.maximum(sx_p * sx_p + sy_p * sy_p + sz_p * sz_p, 0.0))
        ok = sl > 1e-9
        inv_sl = 1.0 / jnp.maximum(sl, 1e-20)
        # coordinate_system fallback
        sign = jnp.where(ngz >= 0.0, 1.0, -1.0)
        a_f = -1.0 / (sign + ngz)
        b_f = ngx * ngy * a_f
        fx = 1.0 + sign * ngx * ngx * a_f
        fy = sign * b_f
        fz = -sign * ngx
        ssx = jnp.where(ok, sx_p * inv_sl, fx)
        ssy = jnp.where(ok, sy_p * inv_sl, fy)
        ssz = jnp.where(ok, sz_p * inv_sl, fz)
        # ts = cross(ns, ss) (fallback matches coordinate_system's bitangent
        # because cross(n, t) == bt there)
        tsx = ngy * ssz - ngz * ssy
        tsy = ngz * ssx - ngx * ssz
        tsz = ngx * ssy - ngy * ssx
        # world hit point from reprojected object point
        pxw = jnp.float32(o2w[0][0]) * px_o + jnp.float32(o2w[0][1]) * py_o + jnp.float32(o2w[0][2]) * pz_o + jnp.float32(o2w[0][3])
        pyw = jnp.float32(o2w[1][0]) * px_o + jnp.float32(o2w[1][1]) * py_o + jnp.float32(o2w[1][2]) * pz_o + jnp.float32(o2w[1][3])
        pzw = jnp.float32(o2w[2][0]) * px_o + jnp.float32(o2w[2][1]) * py_o + jnp.float32(o2w[2][2]) * pz_o + jnp.float32(o2w[2][3])
        # p_err = (g5+g3) |A| |p_obj| + g3 |A_t|  (per world component)
        g53 = _gamma(5) + _gamma(3)
        g3 = _gamma(3)
        apx, apy, apz = jnp.abs(px_o), jnp.abs(py_o), jnp.abs(pz_o)
        errs = []
        for row in range(3):
            e = g53 * (abs(o2w[row][0]) * apx + abs(o2w[row][1]) * apy + abs(o2w[row][2]) * apz) \
                + g3 * abs(o2w[row][3])
            errs.append(e)
        return {
            "px": pxw, "py": pyw, "pz": pzw,
            "ngx": ngx, "ngy": ngy, "ngz": ngz,
            "nsx": ngx, "nsy": ngy, "nsz": ngz,
            "ssx": ssx, "ssy": ssy, "ssz": ssz,
            "tsx": tsx, "tsy": tsy, "tsz": tsz,
            "ex": errs[0], "ey": errs[1], "ez": errs[2],
            "b1": jnp.zeros_like(pxw), "b2": jnp.zeros_like(pxw),
        }

    def camera_ray(pxf, pyf):
        """generate_rays pinhole-perspective with constant matrices."""
        # p_cam = apply44_point(r2c, (px, py, 0)) with homogeneous divide
        cx = jnp.float32(r2c[0][0]) * pxf + jnp.float32(r2c[0][1]) * pyf + jnp.float32(r2c[0][3])
        cy = jnp.float32(r2c[1][0]) * pxf + jnp.float32(r2c[1][1]) * pyf + jnp.float32(r2c[1][3])
        cz = jnp.float32(r2c[2][0]) * pxf + jnp.float32(r2c[2][1]) * pyf + jnp.float32(r2c[2][3])
        w = jnp.float32(r2c[3][0]) * pxf + jnp.float32(r2c[3][1]) * pyf + jnp.float32(r2c[3][3])
        inv_w = 1.0 / w
        cx, cy, cz = cx * inv_w, cy * inv_w, cz * inv_w
        dx, dy, dz = _norm3(cx, cy, cz)
        # world: o = c2w translation (constant); d = normalize(R * d_cam)
        wx = jnp.float32(c2w[0][0]) * dx + jnp.float32(c2w[0][1]) * dy + jnp.float32(c2w[0][2]) * dz
        wy = jnp.float32(c2w[1][0]) * dx + jnp.float32(c2w[1][1]) * dy + jnp.float32(c2w[1][2]) * dz
        wz = jnp.float32(c2w[2][0]) * dx + jnp.float32(c2w[2][1]) * dy + jnp.float32(c2w[2][2]) * dz
        wx, wy, wz = _norm3(wx, wy, wz)
        ox = jnp.broadcast_to(jnp.float32(c2w[0][3]), pxf.shape)
        oy = jnp.broadcast_to(jnp.float32(c2w[1][3]), pxf.shape)
        oz = jnp.broadcast_to(jnp.float32(c2w[2][3]), pxf.shape)
        return ox, oy, oz, wx, wy, wz

    def regen(hbase, px_f, py_f, s_sel):
        """make_regen: film-dim sample + box filter + pinhole camera ray."""
        if is_random:
            h = _pcg(hbase ^ s_sel)
            u1 = _u2f01(_pcg(h ^ U32(0)))
            u2 = _u2f01(_pcg(h ^ U32(1)))
            if is_stratified:
                # jittered strata on the film dim (sampler.sample_2d
                # stratified, dim 0: idx = sample, no rotation)
                idx = s_sel.astype(I32) % jnp.int32(strat_xs * strat_ys)
                sxs = (idx % strat_xs).astype(F32)
                sys_ = ((idx // strat_xs) % strat_ys).astype(F32)
                u1 = (sxs + u1) / jnp.float32(strat_xs)
                u2 = (sys_ + u2) / jnp.float32(strat_ys)
        else:
            s1 = _pcg(hbase ^ U32(0))
            s2 = _pcg(hbase ^ U32(1))
            u1, u2 = _sample02(s_sel, s1, s2)
        dx = (2.0 * u1 - 1.0) * jnp.float32(fxw)
        dy = (2.0 * u2 - 1.0) * jnp.float32(fyw)
        return camera_ray(px_f + 0.5 + dx, py_f + 0.5 + dy)

    def nee(hbase, s_cur, dim_base, alive_sh, at, wox, woy, woz,
            mat, kdr, kdg, kdb):
        """uniform_sample_onelight + estimate_direct for delta lights."""
        lam_m = mat_mask_in(mat, (LOBE_LAMBERT_R, LOBE_PLASTIC))
        on_m = mat_mask(mat, LOBE_OREN_NAYAR) if any_on else None
        mic_m = mat_mask_in(mat, (LOBE_MICRO_R, LOBE_PLASTIC)) if any_micro else None
        # light selection (dim_base + 0)
        if n_lights > 1:
            u_sel = sample_1d_traced(hbase, s_cur, dim_base)
            if consts["uniform_select"]:
                # uniform strategy picks floor(u*n) (integrator._select_light),
                # NOT a cdf walk — cdf rounding can differ by one light at
                # f32 boundaries, breaking exact stream parity
                lid = jnp.minimum((u_sel * n_lights).astype(I32), n_lights - 1)
            else:
                lid = jnp.zeros(u_sel.shape, I32)
                cdf = consts["light_cdf"]
                for i in range(n_lights - 1):
                    lid = lid + (u_sel > jnp.float32(cdf[i])).astype(I32)
                lid = jnp.clip(lid, 0, n_lights - 1)
        else:
            lid = None
        _u1, _u2 = sample_2d_traced(hbase, s_cur, dim_base + 1)  # parity: dims burned

        # per-light sample_li, combined by lid mask
        shape = wox.shape
        wix = jnp.zeros(shape, F32)
        wiy = jnp.zeros(shape, F32)
        wiz = jnp.zeros(shape, F32)
        lir = jnp.zeros(shape, F32)
        lig = jnp.zeros(shape, F32)
        lib = jnp.zeros(shape, F32)
        dist = jnp.zeros(shape, F32)
        spdf = jnp.zeros(shape, F32)
        for i, lt in enumerate(lights):
            m = (lid == i) if lid is not None else None
            if m is None:
                m = jnp.zeros(shape, I32) == 0
            par = lt["par"]
            if lt["kind"] == LIGHT_DISTANT:
                wx, wy, wz = float(par[0]), float(par[1]), float(par[2])
                wix = jnp.where(m, jnp.float32(wx), wix)
                wiy = jnp.where(m, jnp.float32(wy), wiy)
                wiz = jnp.where(m, jnp.float32(wz), wiz)
                lir = jnp.where(m, jnp.float32(par[3]), lir)
                lig = jnp.where(m, jnp.float32(par[4]), lig)
                lib = jnp.where(m, jnp.float32(par[5]), lib)
                dist = jnp.where(m, jnp.float32(wr2), dist)
            else:  # point / spot (position at par[0:3], I at par[3:6])
                tx = jnp.float32(par[0]) - at["px"]
                ty = jnp.float32(par[1]) - at["py"]
                tz = jnp.float32(par[2]) - at["pz"]
                d2 = jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-12)
                dl = jnp.sqrt(d2)
                inv = 1.0 / dl
                wxa, wya, wza = tx * inv, ty * inv, tz * inv
                fall = 1.0
                if lt["kind"] == LIGHT_SPOT:
                    # smoothstep^4 cone falloff (spot.rs; lights.py:358-364):
                    # axis par[6:9], cosTotalWidth par[9], cosFalloffStart par[10]
                    cos_t = -(wxa * jnp.float32(par[6]) + wya * jnp.float32(par[7])
                              + wza * jnp.float32(par[8]))
                    ctw, cfs = float(par[9]), float(par[10])
                    dfall = jnp.clip((cos_t - ctw) / max(cfs - ctw, 1e-9), 0.0, 1.0)
                    fall = jnp.where(cos_t < ctw, 0.0,
                                     jnp.where(cos_t > cfs, 1.0, dfall ** 4))
                wix = jnp.where(m, wxa, wix)
                wiy = jnp.where(m, wya, wiy)
                wiz = jnp.where(m, wza, wiz)
                lir = jnp.where(m, jnp.float32(par[3]) * fall / d2, lir)
                lig = jnp.where(m, jnp.float32(par[4]) * fall / d2, lig)
                lib = jnp.where(m, jnp.float32(par[5]) * fall / d2, lib)
                dist = jnp.where(m, dl, dist)
            spdf = jnp.where(m, jnp.float32(consts["light_pmf"][i]), spdf)

        # f * |wi . ns| for the diffuse lobe only (specular lobes: f = 0)
        refl = (_dot3(wix, wiy, wiz, at["ngx"], at["ngy"], at["ngz"]) *
                _dot3(wox, woy, woz, at["ngx"], at["ngy"], at["ngz"])) > 0
        cos_ns = jnp.abs(_dot3(wix, wiy, wiz, at["nsx"], at["nsy"], at["nsz"]))
        fm = lam_m & refl
        fr_ = jnp.where(fm, kdr * jnp.float32(INV_PI) * cos_ns, 0.0)
        fg_ = jnp.where(fm, kdg * jnp.float32(INV_PI) * cos_ns, 0.0)
        fb_ = jnp.where(fm, kdb * jnp.float32(INV_PI) * cos_ns, 0.0)
        if any_micro or any_on:
            # full local coords for the GGX/Oren-Nayar f terms (delta
            # lights: MIS weight 1, no bsdf pdf needed)
            wo_z = _dot3(wox, woy, woz, at["nsx"], at["nsy"], at["nsz"])
            wo_x = _dot3(wox, woy, woz, at["ssx"], at["ssy"], at["ssz"])
            wo_y = _dot3(wox, woy, woz, at["tsx"], at["tsy"], at["tsz"])
            wi_z = _dot3(wix, wiy, wiz, at["nsx"], at["nsy"], at["nsz"])
            wi_x = _dot3(wix, wiy, wiz, at["ssx"], at["ssy"], at["ssz"])
            wi_y = _dot3(wix, wiy, wiz, at["tsx"], at["tsy"], at["tsz"])
        if any_on:
            onf = on_factor(mat, wo_x, wo_y, wo_z, wi_x, wi_y, wi_z)
            onm = on_m & refl
            fr_ = jnp.where(onm, kdr * onf * cos_ns, fr_)
            fg_ = jnp.where(onm, kdg * onf * cos_ns, fg_)
            fb_ = jnp.where(onm, kdb * onf * cos_ns, fb_)
        if any_micro:
            fm_r, fm_g, fm_b, _p_m = micro_f_pdf(
                mat, mic_m, wo_x, wo_y, wo_z, wi_x, wi_y, wi_z)
            fr_ = fr_ + jnp.where(refl, fm_r * cos_ns, 0.0)
            fg_ = fg_ + jnp.where(refl, fm_g * cos_ns, 0.0)
            fb_ = fb_ + jnp.where(refl, fm_b * cos_ns, 0.0)

        p_l = spdf  # delta light pdf (1.0) * selection pmf
        contributes = alive_sh & (p_l > 0) & ((fr_ * lir > 0) | (fg_ * lig > 0) | (fb_ * lib > 0))
        osx, osy, osz = _offset_ray(at["px"], at["py"], at["pz"],
                                    at["ngx"], at["ngy"], at["ngz"],
                                    wix, wiy, wiz, at["ex"], at["ey"], at["ez"])
        t_sh = jnp.where(contributes, dist * jnp.float32(1.0 - 2.0 * RAY_EPS), jnp.float32(-1.0))
        occ = intersect_all(osx, osy, osz, wix, wiy, wiz, t_sh, want_attrs=False)
        vis = jnp.where(occ, 0.0, 1.0)
        inv_pl = 1.0 / jnp.maximum(p_l, 1e-30)
        # delta light: MIS weight 1
        cr = jnp.where(contributes, fr_ * lir * vis * inv_pl, 0.0)
        cg = jnp.where(contributes, fg_ * lig * vis * inv_pl, 0.0)
        cb = jnp.where(contributes, fb_ * lib * vis * inv_pl, 0.0)
        return cr, cg, cb

    def bsdf_sample(hbase, s_cur, dim_base, at, wox, woy, woz, mat, kd_over=None):
        """bsdf.bsdf_sample for the baked lobe classes (matte incl.
        Oren-Nayar, mirror, glass, GGX micro, lambert+GGX plastic).

        kd_over: optional (mask, value) — per-lane grayscale Kd override
        from the in-kernel imagemap atlas (textured matte/plastic Kd)."""
        # local frame
        wo_x = _dot3(wox, woy, woz, at["ssx"], at["ssy"], at["ssz"])
        wo_y = _dot3(wox, woy, woz, at["tsx"], at["tsy"], at["tsz"])
        wo_z = _dot3(wox, woy, woz, at["nsx"], at["nsy"], at["nsz"])
        # dims: +2 lobe select (drawn only when a 2-lobe mat exists), +3 u1/u2
        u1, u2 = sample_2d_traced(hbase, s_cur, dim_base + 3)

        shape = wox.shape
        lam_m = mat_mask_in(mat, (LOBE_LAMBERT_R, LOBE_PLASTIC))
        on_m = mat_mask(mat, LOBE_OREN_NAYAR) if any_on else _falsev(wox)
        diff_like = lam_m | on_m
        mic_m = mat_mask_in(mat, (LOBE_MICRO_R, LOBE_PLASTIC)) if any_micro else _falsev(wox)
        plast_m = mat_mask(mat, LOBE_PLASTIC) if any_plastic else _falsev(wox)
        mirror_m = mat_mask(mat, LOBE_SPEC_R) if any_mirror else _falsev(wox)
        glass_m = mat_mask(mat, LOBE_FRESNEL_SPEC) if any_glass else _falsev(wox)
        none_m = mat_mask(mat, LOBE_NONE)
        entering = wo_z > 0

        wix = jnp.zeros(shape, F32)
        wiy = jnp.zeros(shape, F32)
        wiz = jnp.zeros(shape, F32)
        valid = ~none_m
        eta = mat_select(mat, "eta", 1.5)
        eta = jnp.maximum(eta, jnp.float32(1.0 + 1e-6))

        # uniform lobe pick over the active slots (bsdf.bsdf_sample):
        # plastic has [lambert, micro]; every other eligible mat is
        # single-lobe (pick 0)
        if any_plastic:
            u_lobe = sample_1d_traced(hbase, s_cur, dim_base + 2)
            n_act = jnp.where(plast_m, 2, 1)
            pick = jnp.minimum((u_lobe * n_act.astype(F32)).astype(I32),
                               n_act - 1)
        else:
            pick = jnp.zeros(shape, I32)
        samp_diff = diff_like & (pick == 0)
        samp_mic = mic_m & (~lam_m | (pick == 1))

        if any_diffuse:
            ddx, ddy = _concentric_disk(u1, u2)
            dz = jnp.sqrt(jnp.maximum(0.0, 1.0 - ddx * ddx - ddy * ddy))
            dz = jnp.where(entering, dz, -dz)
            wix = jnp.where(samp_diff, ddx, wix)
            wiy = jnp.where(samp_diff, ddy, wiy)
            wiz = jnp.where(samp_diff, dz, wiz)
        if any_micro:
            axv = mat_select(mat, "ax", 1e-3)
            ayv = mat_select(mat, "ay", 1e-3)
            hx, hy, hz = _ggx_sample_wh_ch(wo_x, wo_y, wo_z, u1, u2, axv, ayv)
            dwh = wo_x * hx + wo_y * hy + wo_z * hz
            wi_mx = -wo_x + 2.0 * dwh * hx
            wi_my = -wo_y + 2.0 * dwh * hy
            wi_mz = -wo_z + 2.0 * dwh * hz
            wix = jnp.where(samp_mic, wi_mx, wix)
            wiy = jnp.where(samp_mic, wi_my, wiy)
            wiz = jnp.where(samp_mic, wi_mz, wiz)
            valid = valid & (~samp_mic | (wo_z * wi_mz > 0))

        wi_sr_x, wi_sr_y, wi_sr_z = -wo_x, -wo_y, wo_z
        if any_mirror:
            wix = jnp.where(mirror_m, wi_sr_x, wix)
            wiy = jnp.where(mirror_m, wi_sr_y, wiy)
            wiz = jnp.where(mirror_m, wi_sr_z, wiz)

        if any_glass:
            fr_s = _fresnel_dielectric_var(wo_z, eta)
            choose_r = u1 < fr_s
            # refract about n = (0,0,+-1) with eta_ratio = entering? 1/eta: eta
            eta_ratio = jnp.where(entering, 1.0 / eta, eta)
            nz = jnp.where(entering, 1.0, -1.0)
            cos_i = nz * wo_z
            sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
            sin2_t = eta_ratio * eta_ratio * sin2_i
            ok_st = sin2_t < 1.0
            cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
            wi_st_x = eta_ratio * -wo_x
            wi_st_y = eta_ratio * -wo_y
            wi_st_z = eta_ratio * -wo_z + (eta_ratio * cos_i - cos_t) * nz
            wix = jnp.where(glass_m, jnp.where(choose_r, wi_sr_x, wi_st_x), wix)
            wiy = jnp.where(glass_m, jnp.where(choose_r, wi_sr_y, wi_st_y), wiy)
            wiz = jnp.where(glass_m, jnp.where(choose_r, wi_sr_z, wi_st_z), wiz)
            valid = valid & (ok_st | ~(glass_m & ~choose_r))
        else:
            fr_s = jnp.zeros(shape, F32)
            choose_r = _falsev(wox)
            eta_ratio = jnp.ones(shape, F32)

        wix, wiy, wiz = _norm3(wix, wiy, wiz)
        abs_ci = jnp.abs(wiz)

        kdr = mat_color(mat, "color", 0)
        kdg = mat_color(mat, "color", 1)
        kdb = mat_color(mat, "color", 2)
        if kd_over is not None:
            kd_m, kd_v = kd_over
            kdr = jnp.where(kd_m, kd_v, kdr)
            kdg = jnp.where(kd_m, kd_v, kdg)
            kdb = jnp.where(kd_m, kd_v, kdb)

        # specular f & pdf
        fr_spec = jnp.zeros(shape, F32)
        fg_spec = jnp.zeros(shape, F32)
        fb_spec = jnp.zeros(shape, F32)
        pdf_spec = jnp.zeros(shape, F32)
        inv_ci = 1.0 / jnp.maximum(abs_ci, 1e-9)
        if any_mirror:
            # fresnel: FR_NONE -> 1; FR_DIELECTRIC for Kt-less glass
            frm = jnp.ones(shape, F32)
            if any(mats[m]["lobe"] == LOBE_SPEC_R and mats[m]["fresnel"] == 1 for m in mat_rows):
                fr_d = _fresnel_dielectric_var(wo_z, eta)
                fres_die = _falsev(wox)
                for m in mat_rows:
                    if mats[m]["lobe"] == LOBE_SPEC_R and mats[m]["fresnel"] == 1:
                        fres_die = fres_die | (mat == m)
                frm = jnp.where(fres_die, fr_d, frm)
            fr_spec = jnp.where(mirror_m, kdr * frm * inv_ci, fr_spec)
            fg_spec = jnp.where(mirror_m, kdg * frm * inv_ci, fg_spec)
            fb_spec = jnp.where(mirror_m, kdb * frm * inv_ci, fb_spec)
            pdf_spec = jnp.where(mirror_m, 1.0, pdf_spec)
        if any_glass:
            st_scale = eta_ratio * eta_ratio
            ktr = mat_color(mat, "kt", 0)
            ktg = mat_color(mat, "kt", 1)
            ktb = mat_color(mat, "kt", 2)
            t_term = (1.0 - fr_s) * st_scale * inv_ci
            r_term = fr_s * inv_ci
            fr_spec = jnp.where(glass_m, jnp.where(choose_r, kdr * r_term, ktr * t_term), fr_spec)
            fg_spec = jnp.where(glass_m, jnp.where(choose_r, kdg * r_term, ktg * t_term), fg_spec)
            fb_spec = jnp.where(glass_m, jnp.where(choose_r, kdb * r_term, ktb * t_term), fb_spec)
            pdf_spec = jnp.where(glass_m, jnp.where(choose_r, fr_s, 1.0 - fr_s), pdf_spec)

        # non-specular recompute over all lobes (bsdf_f/bsdf_pdf):
        # lambert/Oren-Nayar + GGX terms summed; pdf averaged over lobes
        refl_hemi = wo_z * wiz > 0
        f_diff = jnp.where(lam_m & refl_hemi, jnp.float32(INV_PI), 0.0)
        if any_on:
            f_diff = jnp.where(on_m & refl_hemi,
                               on_factor(mat, wo_x, wo_y, wo_z, wix, wiy, wiz),
                               f_diff)
        pdf_diff = jnp.where(diff_like & refl_hemi, abs_ci * jnp.float32(INV_PI), 0.0)
        f_ns_r = kdr * f_diff
        f_ns_g = kdg * f_diff
        f_ns_b = kdb * f_diff
        pdf_ns = pdf_diff
        if any_micro:
            fm_r, fm_g, fm_b, p_m = micro_f_pdf(
                mat, mic_m, wo_x, wo_y, wo_z, wix, wiy, wiz)
            f_ns_r = f_ns_r + fm_r
            f_ns_g = f_ns_g + fm_g
            f_ns_b = f_ns_b + fm_b
            pdf_ns = pdf_ns + p_m
            if any_plastic:
                pdf_ns = pdf_ns / jnp.where(plast_m, 2.0, 1.0)

        specular = mirror_m | glass_m
        fr_o = jnp.where(specular, fr_spec, f_ns_r)
        fg_o = jnp.where(specular, fg_spec, f_ns_g)
        fb_o = jnp.where(specular, fb_spec, f_ns_b)
        pdf = jnp.where(specular, pdf_spec, pdf_ns)

        transmissive = glass_m & ~choose_r
        eta_sc = jnp.where(transmissive,
                           jnp.where(entering, eta * eta, 1.0 / (eta * eta)), 1.0)
        valid = valid & (pdf > 0)

        # to world
        wwx = wix * at["ssx"] + wiy * at["tsx"] + wiz * at["nsx"]
        wwy = wix * at["ssy"] + wiy * at["tsy"] + wiz * at["nsy"]
        wwz = wix * at["ssz"] + wiy * at["tsz"] + wiz * at["nsz"]
        return {
            "wwx": wwx, "wwy": wwy, "wwz": wwz,
            "fr": fr_o, "fg": fg_o, "fb": fb_o,
            "pdf": pdf, "specular": specular, "valid": valid,
            "eta_scale": eta_sc,
            "kdr": kdr, "kdg": kdg, "kdb": kdb,
        }

    # -- the kernel -----------------------------------------------------

    def kernel(*refs):
        if any_kd_tex:
            (scal_ref, px_ref, py_ref, pid_ref, atlas_ref,
             out_lr, out_lg, out_lb, out_w, out_nv) = refs
        else:
            (scal_ref, px_ref, py_ref, pid_ref,
             out_lr, out_lg, out_lb, out_w, out_nv) = refs

        def eval_kd_tex(at, t_tot, cosg):
            """Per-lane grayscale Kd from the VMEM mip atlas: ray-cone mip
            level + trilinear fetch (mipmap.rs:202-224 lookup semantics,
            cone width standing in for the reference's ray differentials).

            The per-lane 2D texel gather has no native primitive on TPU:
            rows are resolved by a fori_loop over atlas rows (each
            iteration broadcasts one row and lane-gathers the needed
            columns — take_along_axis on the lane axis IS supported), so
            cost is O(atlas_rows) vector ops, ~255 for a 128^2 pyramid."""
            shape = at["b1"].shape
            mask_any = _falsev(at["b1"])
            # per-tap absolute rows/cols/weights, merged across textures
            zi = jnp.zeros(shape, I32)
            zf = jnp.zeros(shape, F32)
            r00 = zi; r01 = zi; r10 = zi; r11 = zi
            c0a = zi; c0b = zi; c1a = zi; c1b = zi
            w00a = zf; w00b = zf; w01a = zf; w01b = zf
            w10a = zf; w10b = zf; w11a = zf; w11b = zf
            scale_v = jnp.ones(shape, F32)
            # world-space cone footprint at the hit
            world_fp = (jnp.float32(cone_k) * jnp.float32(pixel_angle) * t_tot
                        / jnp.maximum(cosg, 0.25))
            for tex in kd_textures:
                m_mask = _falsev(at["b1"])
                for m in mat_rows:
                    if mats[m].get("kd_tex") is tex:
                        m_mask = m_mask | (at["mat"] == m)
                offs = tex["offs"]
                nlev = len(offs)
                base = int(tex["base"])
                su = at["u"] * jnp.float32(tex["uscale"]) + jnp.float32(tex["udelta"])
                sv = at["v"] * jnp.float32(tex["vscale"]) + jnp.float32(tex["vdelta"])
                width = world_fp * at["uvd"] * jnp.float32(
                    max(abs(tex["uscale"]), abs(tex["vscale"]), 1e-9))
                lvl = jnp.float32(nlev - 1) + jnp.log2(jnp.maximum(width, 1e-8))
                lvl = jnp.clip(lvl, 0.0, jnp.float32(nlev - 1) - 1e-4)
                l0 = lvl.astype(I32)
                ft = lvl - l0.astype(F32)

                def lev_addr(lsel):
                    off_l = jnp.zeros(shape, I32)
                    h_l = jnp.ones(shape, I32)
                    w_l = jnp.ones(shape, I32)
                    for li, (o_, h_, w_) in enumerate(offs):
                        s_ = lsel == li
                        off_l = jnp.where(s_, o_, off_l)
                        h_l = jnp.where(s_, h_, h_l)
                        w_l = jnp.where(s_, w_, w_l)
                    return off_l, h_l, w_l

                def bil(lsel):
                    off_l, h_l, w_l = lev_addr(lsel)
                    # v flipped: pbrt images are top-down (imagemap.rs
                    # st.y -> 1-t; matches texture.image_bilinear)
                    x = (su - jnp.floor(su)) * w_l.astype(F32) - 0.5
                    svf = 1.0 - (sv - jnp.floor(sv))
                    y = svf * h_l.astype(F32) - 0.5
                    ix = jnp.floor(x).astype(I32)
                    iy = jnp.floor(y).astype(I32)
                    fx = x - ix.astype(F32)
                    fy = y - iy.astype(F32)
                    ixm = ((ix % w_l) + w_l) % w_l
                    ixp = (ixm + 1) % w_l
                    iym = ((iy % h_l) + h_l) % h_l
                    iyp = (iym + 1) % h_l
                    ra = base + off_l + iym
                    rb = base + off_l + iyp
                    return ra, rb, ixm, ixp, fx, fy

                ra0, rb0, ix0, ixp0, fx0, fy0 = bil(l0)
                l1 = jnp.minimum(l0 + 1, nlev - 1)
                ra1, rb1, ix1, ixp1, fx1, fy1 = bil(l1)
                r00 = jnp.where(m_mask, ra0, r00)
                r01 = jnp.where(m_mask, rb0, r01)
                r10 = jnp.where(m_mask, ra1, r10)
                r11 = jnp.where(m_mask, rb1, r11)
                c0a = jnp.where(m_mask, ix0, c0a)
                c0b = jnp.where(m_mask, ixp0, c0b)
                c1a = jnp.where(m_mask, ix1, c1a)
                c1b = jnp.where(m_mask, ixp1, c1b)
                w00a = jnp.where(m_mask, (1 - ft) * (1 - fy0) * (1 - fx0), w00a)
                w00b = jnp.where(m_mask, (1 - ft) * (1 - fy0) * fx0, w00b)
                w01a = jnp.where(m_mask, (1 - ft) * fy0 * (1 - fx0), w01a)
                w01b = jnp.where(m_mask, (1 - ft) * fy0 * fx0, w01b)
                w10a = jnp.where(m_mask, ft * (1 - fy1) * (1 - fx1), w10a)
                w10b = jnp.where(m_mask, ft * (1 - fy1) * fx1, w10b)
                w11a = jnp.where(m_mask, ft * fy1 * (1 - fx1), w11a)
                w11b = jnp.where(m_mask, ft * fy1 * fx1, w11b)
                scale_v = jnp.where(m_mask, jnp.float32(tex["scale"]), scale_v)
                mask_any = mask_any | m_mask

            n_rows = kd_atlas_rows

            def row_step(r, acc):
                row = atlas_ref[pl.ds(r, 1), :]  # (1, 128)
                b = jnp.broadcast_to(row, shape)
                g0a = jnp.take_along_axis(b, c0a, axis=1)
                g0b = jnp.take_along_axis(b, c0b, axis=1)
                g1a = jnp.take_along_axis(b, c1a, axis=1)
                g1b = jnp.take_along_axis(b, c1b, axis=1)
                acc = acc + jnp.where(r00 == r, w00a * g0a + w00b * g0b, 0.0)
                acc = acc + jnp.where(r01 == r, w01a * g0a + w01b * g0b, 0.0)
                acc = acc + jnp.where(r10 == r, w10a * g1a + w10b * g1b, 0.0)
                acc = acc + jnp.where(r11 == r, w11a * g1a + w11b * g1b, 0.0)
                return acc

            val = jax.lax.fori_loop(0, n_rows, row_step, jnp.zeros(shape, F32))
            return mask_any, val * scale_v

        seed = scal_ref[0, 0]
        s0 = scal_ref[0, 1]
        px_i = px_ref[...]
        py_i = py_ref[...]
        pid = pid_ref[...]
        lane_valid = px_i >= 0
        px_f = px_i.astype(F32)
        py_f = py_i.astype(F32)
        pidu = pltpu.bitcast(pid, U32)
        # hash_combine(seed, pixel, .) prefix: h = pcg(pcg(GOLDEN ^ seed) ^ pixel)
        hbase = _pcg(_pcg(U32(0x9E3779B9) ^ seed) ^ pidu)

        shape = px_f.shape
        zero = jnp.zeros(shape, F32)
        s_init = jnp.broadcast_to(s0, shape)
        ox0, oy0, oz0, dx0, dy0, dz0 = regen(hbase, px_f, py_f, s_init)

        alive0 = jnp.where(lane_valid & (n_samples > 0), 1, 0).astype(I32)
        done0 = jnp.where(lane_valid & (n_samples > 0), 0, 1).astype(I32)

        def cond(st):
            done = st[0]
            it = st[1]
            return jnp.logical_not(jnp.all(done > 0)) & (it < cap)

        def body(st):
            (done, it, ox, oy, oz, dx, dy, dz, Lr, Lg, Lb, br, bg, bb,
             alive, eta_sc_acc, bounces, s_cur, aLr, aLg, aLb, aW, nv,
             t_spread) = st
            alive_b = alive > 0

            # --- extend: closest hit over all prims ---
            t_query = jnp.where(alive_b, jnp.float32(np.inf), jnp.float32(-1.0))
            valid, t_best, at = intersect_all(ox, oy, oz, dx, dy, dz, t_query, want_attrs=True)
            nv = nv + jnp.where(alive_b & valid, 1.0, 0.0)
            alive_b = alive_b & valid
            # (no infinite / area lights in the eligible class)

            wox, woy, woz = -dx, -dy, -dz
            dim_base = (2 + bounces * DPB).astype(I32)
            can_scatter = alive_b & (bounces < max_depth - 1)
            mat = at["mat"]
            none_m = mat_mask(mat, LOBE_NONE)
            alive_sh = can_scatter & ~none_m

            if any_kd_tex:
                cosg = jnp.abs(_dot3(dx, dy, dz, at["ngx"], at["ngy"], at["ngz"]))
                t_tot = t_spread + jnp.where(alive_b, t_best, 0.0)
                kd_over = eval_kd_tex(at, t_tot, cosg)
            else:
                t_tot = t_spread
                kd_over = None

            bs = bsdf_sample(hbase, s_cur, dim_base, at, wox, woy, woz, mat,
                             kd_over=kd_over)

            if n_lights > 0:
                cr, cg, cb = nee(hbase, s_cur, dim_base, alive_sh, at,
                                 wox, woy, woz, mat,
                                 bs["kdr"], bs["kdg"], bs["kdb"])
                Lr = Lr + br * cr
                Lg = Lg + bg * cg
                Lb = Lb + bb * cb

            cos_term = jnp.abs(_dot3(bs["wwx"], bs["wwy"], bs["wwz"],
                                     at["nsx"], at["nsy"], at["nsz"]))
            inv_pdf = cos_term / jnp.maximum(bs["pdf"], 1e-30)
            thr = bs["fr"] * inv_pdf
            thg = bs["fg"] * inv_pdf
            thb = bs["fb"] * inv_pdf
            surf_cont = alive_sh & bs["valid"] & ((thr > 0) | (thg > 0) | (thb > 0))
            if ikind == "directlighting":
                # specular-only continuation (integrator.rs:409-520
                # specular_reflect/transmit); diffuse vertices retire
                surf_cont = surf_cont & bs["specular"]

            new_br = jnp.where(surf_cont, br * thr, br)
            new_bg = jnp.where(surf_cont, bg * thg, bg)
            new_bb = jnp.where(surf_cont, bb * thb, bb)
            nox, noy, noz = _offset_ray(at["px"], at["py"], at["pz"],
                                        at["ngx"], at["ngy"], at["ngz"],
                                        bs["wwx"], bs["wwy"], bs["wwz"],
                                        at["ex"], at["ey"], at["ez"])
            new_ox = jnp.where(surf_cont, nox, ox)
            new_oy = jnp.where(surf_cont, noy, oy)
            new_oz = jnp.where(surf_cont, noz, oz)
            new_dx = jnp.where(surf_cont, bs["wwx"], dx)
            new_dy = jnp.where(surf_cont, bs["wwy"], dy)
            new_dz = jnp.where(surf_cont, bs["wwz"], dz)
            eta_acc = jnp.where(surf_cont, eta_sc_acc * bs["eta_scale"], eta_sc_acc)
            new_bounces = bounces + surf_cont.astype(I32)
            new_alive_b = surf_cont

            # russian roulette (path.rs:206-214) — path only; the
            # directlighting recursion is depth-capped, never roulette-killed
            if ikind == "path":
                rr_r = new_br * eta_acc
                rr_g = new_bg * eta_acc
                rr_b = new_bb * eta_acc
                max_c = jnp.maximum(rr_r, jnp.maximum(rr_g, rr_b))
                q = jnp.maximum(0.05, 1.0 - max_c)
                do_rr = (new_bounces > 3) & (max_c < jnp.float32(rr_threshold))
                u_rr = sample_1d_traced(hbase, s_cur, dim_base + 4)
                killed = do_rr & (u_rr < q)
                new_alive_b = new_alive_b & ~killed
                boost = 1.0 / jnp.maximum(1.0 - q, 1e-6)
                keepm = do_rr & ~killed
                new_br = jnp.where(keepm, new_br * boost, new_br)
                new_bg = jnp.where(keepm, new_bg * boost, new_bg)
                new_bb = jnp.where(keepm, new_bb * boost, new_bb)

            # --- flush finished samples, regenerate or retire ---
            die = (done == 0) & ~new_alive_b
            fin = jnp.isfinite(Lr) & jnp.isfinite(Lg) & jnp.isfinite(Lb)
            Lfr = jnp.maximum(jnp.where(fin, Lr, 0.0), 0.0)
            Lfg = jnp.maximum(jnp.where(fin, Lg, 0.0), 0.0)
            Lfb = jnp.maximum(jnp.where(fin, Lb, 0.0), 0.0)
            if max_lum < float("inf"):
                y = Lfr * 0.212671 + Lfg * 0.715160 + Lfb * 0.072169
                scl = jnp.where(y > max_lum, jnp.float32(max_lum) / jnp.maximum(y, 1e-12), 1.0)
                Lfr, Lfg, Lfb = Lfr * scl, Lfg * scl, Lfb * scl
            # box filter weight = 1
            aLr = aLr + jnp.where(die, Lfr, 0.0)
            aLg = aLg + jnp.where(die, Lfg, 0.0)
            aLb = aLb + jnp.where(die, Lfb, 0.0)
            aW = aW + jnp.where(die, 1.0, 0.0)

            s_next = s_cur + U32(1)
            more = die & (s_next < s0 + U32(n_samples))
            done = jnp.where(die & ~more, 1, done)
            s_sel = jnp.where(more, s_next, s_cur)
            rox, roy, roz, rdx, rdy, rdz = regen(hbase, px_f, py_f, s_sel)
            new_ox = jnp.where(more, rox, new_ox)
            new_oy = jnp.where(more, roy, new_oy)
            new_oz = jnp.where(more, roz, new_oz)
            new_dx = jnp.where(more, rdx, new_dx)
            new_dy = jnp.where(more, rdy, new_dy)
            new_dz = jnp.where(more, rdz, new_dz)
            Lr = jnp.where(more, 0.0, Lr)
            Lg = jnp.where(more, 0.0, Lg)
            Lb = jnp.where(more, 0.0, Lb)
            new_br = jnp.where(more, 1.0, new_br)
            new_bg = jnp.where(more, 1.0, new_bg)
            new_bb = jnp.where(more, 1.0, new_bb)
            new_alive_b = new_alive_b | more
            eta_acc = jnp.where(more, 1.0, eta_acc)
            new_bounces = jnp.where(more, 0, new_bounces)
            s_cur = jnp.where(more, s_next, s_cur)
            # ray-cone spread distance: accumulate along continuations,
            # reset on regenerated camera samples
            new_t_spread = jnp.where(surf_cont, t_tot, t_spread)
            new_t_spread = jnp.where(more, 0.0, new_t_spread)

            return (done, it + 1, new_ox, new_oy, new_oz, new_dx, new_dy, new_dz,
                    Lr, Lg, Lb, new_br, new_bg, new_bb,
                    new_alive_b.astype(I32), eta_acc, new_bounces, s_cur,
                    aLr, aLg, aLb, aW, nv, new_t_spread)

        st0 = (done0, jnp.int32(0), ox0, oy0, oz0, dx0, dy0, dz0,
               zero, zero, zero, zero + 1.0, zero + 1.0, zero + 1.0,
               alive0, zero + 1.0, jnp.zeros(shape, I32), s_init,
               zero, zero, zero, zero, zero, zero)
        st = jax.lax.while_loop(cond, body, st0)
        out_lr[...] = st[18]
        out_lg[...] = st[19]
        out_lb[...] = st[20]
        out_w[...] = st[21]
        out_nv[...] = st[22]

    return kernel


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def make_megakernel_fn(cs, cam, icfg, scfg, fcfg, consts=None, interpret=None):
    """Build the wave_p-compatible persistent function backed by the Pallas
    megakernel: fn(sa, px, py, pids, s0, n_samples, seed) ->
    (accLw (R,3), accW (R,), n_vertices (R,))."""
    if consts is None:
        consts = extract_consts(cs, cam, icfg, scfg, fcfg)
    if consts is None:
        return None
    if interpret is None:
        # interpret mode exists for parity tests only (orders of magnitude
        # slower than the XLA persistent wave) — off the TPU, let the caller
        # opt in explicitly and default everyone else to the XLA path
        if jax.devices()[0].platform != "tpu":
            import os

            if not os.environ.get("PBRT_TPU_MEGAKERNEL_INTERPRET"):
                return None
            interpret = True
        else:
            interpret = False

    @functools.partial(jax.jit, static_argnums=(5,))
    def wave_p(sa, px, py, pixel_ids, s0, n_samples, seed):
        del sa  # scene is baked into the kernel constants
        kernel = _build_kernel(consts, int(n_samples))
        R = px.shape[0]
        blk = SUB * LANES
        n_blocks = max((R + blk - 1) // blk, 1)
        Rp = n_blocks * blk
        pad = Rp - R

        def padded(x, fill):
            x = jnp.asarray(x)
            if pad:
                x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
            return x.reshape(n_blocks * SUB, LANES)

        px2 = padded(px.astype(I32), -1)  # -1 marks dead padding lanes
        py2 = padded(py.astype(I32), 0)
        pid2 = padded(pixel_ids.astype(U32), 0).astype(I32)
        scal = jnp.stack([jnp.asarray(seed, U32), jnp.asarray(s0, U32)]).reshape(1, 2)

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((SUB, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ]
        inputs = [scal, px2, py2, pid2]
        kd_atlas = consts.get("kd_atlas")
        if kd_atlas is not None:
            # whole mip atlas VMEM-resident in every grid step
            a_rows = kd_atlas.shape[0]
            in_specs.append(pl.BlockSpec((a_rows, LANES), lambda b: (0, 0),
                                         memory_space=pltpu.VMEM))
            inputs.append(jnp.asarray(kd_atlas))

        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(jax.ShapeDtypeStruct((n_blocks * SUB, LANES), F32) for _ in range(5)),
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=tuple(
                pl.BlockSpec((SUB, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM)
                for _ in range(5)),
            interpret=interpret,
        )(*inputs)

        lr, lg, lb, w, nv = [o.reshape(Rp)[:R] for o in outs]
        return jnp.stack([lr, lg, lb], axis=-1), w, nv

    return wave_p
