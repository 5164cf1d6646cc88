"""Participating media: HG phase, distance sampling, transmittance.

Device equivalents of the reference's Medium layer:
- Henyey-Greenstein phase function + sampling (src/core/medium.rs:138-199)
- HomogeneousMedium: closed-form Beer-Lambert tr + channel-stratified
  distance sampling (src/media/homogeneous.rs:10-69)
- GridDensityMedium: delta tracking for sample and ratio tracking for tr
  (src/media/grid.rs:24-182) as bounded while_loops with a per-ray
  counter-hash RNG stream
- VisibilityTester::tr semantics (src/core/light.rs:121-151): shadow rays
  walk through material-less boundaries accumulating transmittance.

Medium ids index the SceneArrays medium table; -1 = vacuum.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene.arrays import SceneArrays, SceneStatic
from . import rng
from .intersect import _xform_point, intersect

F32 = jnp.float32
INV_4PI = 1.0 / (4.0 * jnp.pi)
MAX_TRACKING_STEPS = 256
MAX_NULL_CROSSINGS = 8


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


# ---------------------------------------------------------------------------
# Henyey-Greenstein (medium.rs:138-199)
# ---------------------------------------------------------------------------


def hg_p(cos_theta, g):
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return INV_4PI * (1.0 - g * g) / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)


def hg_sample(wo, g, u1, u2):
    """Sample wi with cos(theta) measured from wo (medium.rs sample_p):
    for g>0 the density peaks at cos=-1, i.e. wi continues forward along
    -wo. Returns (wi, pdf) with pdf = hg_p(dot(wo, wi), g)."""
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3 * jnp.sign(g + 1e-9), g)
    sqr = (1.0 - g_safe * g_safe) / (1.0 + g_safe - 2.0 * g_safe * u1)
    cos_theta = jnp.where(
        jnp.abs(g) < 1e-3,
        1.0 - 2.0 * u1,
        -(1.0 + g_safe * g_safe - sqr * sqr) / (2.0 * g_safe),
    )
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * jnp.pi * u2
    # frame around wo (phase is defined w.r.t. the forward direction -wo;
    # pbrt measures theta from wo for hg_sample with swapped sign convention)
    from .shading import coordinate_system

    v1, v2 = coordinate_system(wo)
    wi = (
        sin_theta[..., None] * jnp.cos(phi)[..., None] * v1
        + sin_theta[..., None] * jnp.sin(phi)[..., None] * v2
        + cos_theta[..., None] * wo
    )
    return wi, hg_p(cos_theta, g)


# ---------------------------------------------------------------------------
# Grid density lookup (grid.rs density :74 trilerp)
# ---------------------------------------------------------------------------


def _grid_density(grid, pg):
    """Trilinear density lookup. grid: (nz, ny, nx); pg in [0,1]^3 grid space."""
    nz, ny, nx = grid.shape
    # continuous -> voxel coords (pbrt: p * n - 0.5)
    gx = pg[..., 0] * nx - 0.5
    gy = pg[..., 1] * ny - 0.5
    gz = pg[..., 2] * nz - 0.5
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    z0 = jnp.floor(gz).astype(jnp.int32)
    fx = gx - x0
    fy = gy - y0
    fz = gz - z0

    def d(xi, yi, zi):
        inside = (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny) & (zi >= 0) & (zi < nz)
        v = grid[jnp.clip(zi, 0, nz - 1), jnp.clip(yi, 0, ny - 1), jnp.clip(xi, 0, nx - 1)]
        return jnp.where(inside, v, 0.0)

    d00 = d(x0, y0, z0) * (1 - fx) + d(x0 + 1, y0, z0) * fx
    d10 = d(x0, y0 + 1, z0) * (1 - fx) + d(x0 + 1, y0 + 1, z0) * fx
    d01 = d(x0, y0, z0 + 1) * (1 - fx) + d(x0 + 1, y0, z0 + 1) * fx
    d11 = d(x0, y0 + 1, z0 + 1) * (1 - fx) + d(x0 + 1, y0 + 1, z0 + 1) * fx
    d0 = d00 * (1 - fy) + d10 * fy
    d1 = d01 * (1 - fy) + d11 * fy
    return d0 * (1 - fz) + d1 * fz


def _density_at(sa: SceneArrays, static: SceneStatic, med, p):
    """Density multiplier at world p for (possibly heterogeneous) medium ids.

    Homogeneous media have density 1. Vectorized over the per-ray medium id
    by looping the static medium list (media counts are tiny).
    """
    dens = jnp.ones(p.shape[0], F32)
    for i, kind in enumerate(static.media_kinds):
        if kind != "heterogeneous":
            continue
        w2m = sa.med_w2m[i]
        pg = _xform_point(w2m, p)
        di = _grid_density(sa.med_grids[f"med{i}"], pg)
        dens = jnp.where(med == i, di, dens)
    return dens


# ---------------------------------------------------------------------------
# Distance sampling (homogeneous.rs sample; grid.rs delta tracking)
# ---------------------------------------------------------------------------


def medium_sample(sa: SceneArrays, static: SceneStatic, med, o, d, t_surf, key):
    """Sample a medium interaction along [0, t_surf).

    med: (R,) medium ids (-1 = vacuum -> no interaction).
    Returns dict {hit_medium (R,), t (R,), weight (R,3)} where weight is the
    throughput multiplier (includes sigma_s and the pdf division for medium
    interactions, or Tr/pdf for surface pass-through).
    """
    R = o.shape[0]
    # per-ray decorrelated key stream. Callers SHOULD pass a per-lane (R,)
    # key derived from global pixel ids — a scalar key falls back to the
    # lane index, which is NOT shard-invariant (each shard_map shard
    # restarts the lane iota at 0: the round-4 volpath mesh-parity bug)
    key = jnp.asarray(key, jnp.uint32)
    if key.ndim == 0:
        key = key + jnp.arange(R, dtype=jnp.uint32) * jnp.uint32(0x9E3779B1)
    key = rng.pcg_hash(key)
    par = sa.med_param[jnp.maximum(med, 0)] if static.n_media else jnp.zeros((R, 8), F32)
    sig_a = par[:, 0:3]
    sig_s = par[:, 3:6]
    sig_t = sig_a + sig_s
    in_medium = med >= 0

    hit_medium = jnp.zeros(R, bool)
    t_med = jnp.zeros(R, F32)
    weight = jnp.ones((R, 3), F32)

    any_homo = any(k == "homogeneous" for k in static.media_kinds)
    any_hetero = any(k == "heterogeneous" for k in static.media_kinds)
    is_hetero = jnp.zeros(R, bool)
    for i, kind in enumerate(static.media_kinds):
        if kind == "heterogeneous":
            is_hetero = is_hetero | (med == i)

    if any_homo:
        # channel-stratified exponential sampling (homogeneous.rs:24-61)
        key = rng.pcg_hash(key)
        u_ch = rng.u32_to_float(key)
        key = rng.pcg_hash(key)
        u_t = rng.u32_to_float(key)
        ch = jnp.minimum((u_ch * 3).astype(jnp.int32), 2)
        r = jnp.arange(R)
        sig_ch = jnp.maximum(sig_t[r, ch], 1e-12)
        t_s = -jnp.log(jnp.maximum(1.0 - u_t, 1e-12)) / sig_ch
        hm = in_medium & ~is_hetero & (t_s < t_surf)
        t_use = jnp.minimum(t_s, t_surf)
        tr = jnp.exp(-sig_t * jnp.minimum(t_use, 1e7)[:, None])
        # pdf: mean over channels of sigma_t*Tr (medium) or Tr (surface)
        pdf_med = jnp.mean(sig_t * tr, axis=-1)
        pdf_surf = jnp.mean(tr, axis=-1)
        w_med = tr * sig_s / jnp.maximum(pdf_med, 1e-24)[:, None]
        w_surf = tr / jnp.maximum(pdf_surf, 1e-24)[:, None]
        m_any = in_medium & ~is_hetero
        hit_medium = jnp.where(m_any, hm, hit_medium)
        t_med = jnp.where(m_any, t_s, t_med)
        weight = jnp.where(m_any[:, None], jnp.where(hm[:, None], w_med, w_surf), weight)

    if any_hetero:
        # delta tracking (grid.rs:107-139); monochromatic sigma_t channel 0
        sig_t0 = jnp.maximum(sig_t[:, 0], 1e-12)
        maj = jnp.maximum(par[:, 7] * sig_t0, 1e-12)  # majorant
        inv_maj = 1.0 / maj
        active0 = in_medium & is_hetero

        def body(state):
            t, done, found, key, steps = state
            key = rng.pcg_hash(key)
            u1 = rng.u32_to_float(key)
            key = rng.pcg_hash(key)
            u2 = rng.u32_to_float(key)
            t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-12)) * inv_maj
            past = t_new >= t_surf
            p = o + d * t_new[:, None]
            dens = _density_at(sa, static, med, p)
            real = u2 < dens / jnp.maximum(par[:, 7], 1e-12)
            newly_done = ~done & past
            newly_found = ~done & ~past & real
            done2 = done | past | newly_found
            found2 = found | newly_found
            t2 = jnp.where(done, t, t_new)
            return t2, done2, found2, key, steps + 1

        def cond(state):
            _, done, _, _, steps = state
            return jnp.any(~done) & (steps < MAX_TRACKING_STEPS)

        t0 = jnp.zeros(R, F32)
        done0 = ~active0
        keys = rng.pcg_hash(key ^ jnp.uint32(0x6A09E667))
        t_fin, _done, found, _keys, _ = jax.lax.while_loop(
            cond, body, (t0, done0, jnp.zeros(R, bool), keys, jnp.int32(0))
        )
        # weights: real collision -> sigma_s/sigma_t (grid.rs returns
        # sigma_s/sigma_t on collision, 1 on escape)
        w_het = jnp.where(found[:, None], sig_s / jnp.maximum(sig_t, 1e-12), jnp.ones((R, 3), F32))
        hit_medium = jnp.where(active0, found, hit_medium)
        t_med = jnp.where(active0, t_fin, t_med)
        weight = jnp.where(active0[:, None], w_het, weight)

    return {"hit_medium": hit_medium & in_medium, "t": t_med, "weight": weight}


def medium_tr(sa: SceneArrays, static: SceneStatic, med, o, d, t_max, key):
    """Transmittance through medium `med` along [0, t_max]. Returns (R, 3)."""
    R = o.shape[0]
    if static.n_media == 0:
        return jnp.ones((R, 3), F32)
    par = sa.med_param[jnp.maximum(med, 0)]
    sig_t = par[:, 0:3] + par[:, 3:6]
    in_medium = med >= 0
    tr = jnp.ones((R, 3), F32)

    is_hetero = jnp.zeros(R, bool)
    for i, kind in enumerate(static.media_kinds):
        if kind == "heterogeneous":
            is_hetero = is_hetero | (med == i)

    # homogeneous: Beer-Lambert
    t_c = jnp.minimum(t_max, 1e7)
    tr_homo = jnp.exp(-sig_t * t_c[:, None])
    tr = jnp.where((in_medium & ~is_hetero)[:, None], tr_homo, tr)

    if any(k == "heterogeneous" for k in static.media_kinds):
        # ratio tracking (grid.rs tr :141-182)
        sig_t0 = jnp.maximum(sig_t[:, 0], 1e-12)
        maj = jnp.maximum(par[:, 7] * sig_t0, 1e-12)
        inv_maj = 1.0 / maj
        active0 = in_medium & is_hetero

        def body(state):
            t, trv, done, key, steps = state
            key = rng.pcg_hash(key)
            u = rng.u32_to_float(key)
            t_new = t - jnp.log(jnp.maximum(1.0 - u, 1e-12)) * inv_maj
            past = t_new >= t_max
            p = o + d * t_new[:, None]
            dens = _density_at(sa, static, med, p)
            factor = 1.0 - dens / jnp.maximum(par[:, 7], 1e-12)
            trv2 = jnp.where((~done & ~past), trv * jnp.maximum(factor, 0.0), trv)
            done2 = done | past | (trv2 < 1e-4)
            t2 = jnp.where(done, t, t_new)
            return t2, trv2, done2, key, steps + 1

        def cond(state):
            _, _, done, _, steps = state
            return jnp.any(~done) & (steps < MAX_TRACKING_STEPS)

        keyv = jnp.asarray(key, jnp.uint32)
        if keyv.ndim == 0:
            # scalar fallback (see medium_sample): lane-indexed, not
            # shard-invariant — render paths pass per-lane keys
            keyv = keyv + jnp.arange(R, dtype=jnp.uint32) * jnp.uint32(0x85EBCA6B)
        keys = rng.pcg_hash(keyv)
        _t, trv, _d, _k, _s = jax.lax.while_loop(
            cond, body, (jnp.zeros(R, F32), jnp.ones(R, F32), ~active0, keys, jnp.int32(0))
        )
        tr = jnp.where(active0[:, None], trv[:, None] * jnp.ones((R, 3), F32), tr)

    return tr


# ---------------------------------------------------------------------------
# Shadow transmittance with null-boundary crossing (light.rs tr :121-151)
# ---------------------------------------------------------------------------


def transmittance_shadow(sa: SceneArrays, static: SceneStatic, o, d, t_max, medium, key, time=None):
    """Visibility with transmittance: walk the shadow segment, passing
    through material-less (null) boundaries and accumulating medium Tr.

    Returns (tr (R,3)); fully occluded rays get 0.
    """
    from .integrator import RAY_EPS, _offset_ray  # local import to avoid cycle

    R = o.shape[0]
    tr = jnp.ones((R, 3), F32)
    cur_o = o
    cur_t = t_max
    cur_med = medium
    done = jnp.zeros(R, bool)

    n_iters = MAX_NULL_CROSSINGS if (static.has_null_material or static.n_media) else 1
    for it in range(n_iters):
        hit = intersect(sa, static, cur_o, d, cur_t, time=time)
        prim = jnp.maximum(hit["prim"], 0)
        hit_valid = hit["prim"] >= 0
        mat_kind = sa.mat_kind[sa.prim_mat[prim]]
        is_null = hit_valid & (mat_kind == 0)
        blocked = hit_valid & (mat_kind != 0)

        seg_t = jnp.where(hit_valid, hit["t"], cur_t)
        key = rng.pcg_hash(key + jnp.uint32(it * 7919))
        tr_seg = medium_tr(sa, static, cur_med, cur_o, d, seg_t, key)
        tr = jnp.where(done[:, None], tr, tr * tr_seg)
        tr = jnp.where((~done & blocked)[:, None], 0.0, tr)

        done = done | blocked | ~hit_valid
        if it == n_iters - 1:
            break
        # cross the null boundary: swap medium by crossing side
        p_hit = cur_o + d * hit["t"][:, None]
        # geometric normal via prim tables (triangle normal or sphere normal)
        from .shading import surface_interaction

        si = surface_interaction(sa, hit, cur_o, d)
        entering = _dot(d, si["ng"]) < 0
        pm = sa.prim_medium[prim]
        new_med = jnp.where(entering, pm[:, 0], pm[:, 1])
        transition = (pm[:, 0] != pm[:, 1])
        cur_med = jnp.where(~done & is_null & transition, new_med, cur_med)
        cur_o = jnp.where((~done)[:, None], _offset_ray(p_hit, si["ng"], d, si.get("p_err")), cur_o)
        cur_t = jnp.where(~done, cur_t - hit["t"] - RAY_EPS, cur_t)
        cur_t = jnp.maximum(cur_t, 0.0)

    return tr
