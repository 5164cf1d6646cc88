"""Wavefront integrators: path, directlighting, whitted, ao.

TPU-native redesign of the reference's recursive per-pixel integrators
(src/integrators/path.rs li :79-222, directlighting.rs, whitted.rs, ao.rs;
shared NEE/MIS kernel src/core/integrator.rs estimate_direct :109-237):
the per-ray recursion becomes a bounded bounce loop over a whole ray wave
with SoA path state, and the two MIS halves are fused into the single
extend-ray of the next bounce (the emission pickup carries the BSDF-side
MIS weight) — two traversals per bounce (extend + shadow) instead of three.

The bounce loop is a rolled `lax.fori_loop` so the body is traced once;
sampler dimensions derive from the traced bounce index.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene.arrays import SceneArrays, SceneStatic
from .bsdf import bsdf_f, bsdf_pdf, bsdf_sample, num_lobes, _is_specular, cosine_sample_hemisphere
from .intersect import intersect, intersect_p
from .lights import area_light_emission, env_le, env_pdf_li, pdf_li_area_hit, sample_li
from .materials import make_bsdf
from .sampler import sample_1d, sample_2d
from .shading import surface_interaction

F32 = jnp.float32
RAY_EPS = 1e-3


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """Power heuristic beta=2 (src/core/sampling.rs:327-330)."""
    f = nf * f_pdf
    g = ng * g_pdf
    return jnp.where(f > 0, f * f / jnp.maximum(f * f + g * g, 1e-30), 0.0)


def _offset_ray(p, ng, w):
    s = jnp.sign(_dot(ng, w))[:, None]
    return p + ng * s * RAY_EPS


def _to_local(si, w):
    return jnp.stack([_dot(w, si["ss"]), _dot(w, si["ts"]), _dot(w, si["ns"])], axis=-1)


def _to_world(si, w):
    return w[..., 0:1] * si["ss"] + w[..., 1:2] * si["ts"] + w[..., 2:3] * si["ns"]


def _light_select_pdf(static: SceneStatic):
    return 1.0 / max(static.n_lights, 1)


def _nee(sa, static, icfg, scfg, seed, pixel, sample_idx, dim_base, si, lobes, alive, light_index=None, dim_salt=0):
    """Next-event estimation at the current vertices.

    Returns the radiance contribution (R, 3) (already MIS-weighted, divided
    by light pdf and selection pdf). light_index: static int to force one
    light ("all" strategy loops); None = uniform random selection.
    """
    R = si["p"].shape[0]
    if static.n_lights == 0:
        return jnp.zeros((R, 3), F32)
    kind = scfg["kind"]
    spp = scfg["spp"]
    u_sel = sample_1d(kind, seed, pixel, sample_idx, dim_base + 131 * dim_salt, spp)
    u1, u2 = sample_2d(kind, seed, pixel, sample_idx, dim_base + 1 + 131 * dim_salt, spp)

    if light_index is None:
        lid = jnp.minimum((u_sel * static.n_lights).astype(jnp.int32), static.n_lights - 1)
        sel_pdf = _light_select_pdf(static)
    else:
        lid = jnp.full(R, light_index, jnp.int32)
        sel_pdf = 1.0

    ls = sample_li(sa, static, lid, si["p"], u1, u2)
    wi = ls["wi"]
    wo_l = _to_local(si, si["wo"])
    wi_l = _to_local(si, wi)
    refl = _dot(wi, si["ng"]) * _dot(si["wo"], si["ng"]) > 0
    f_val = bsdf_f(lobes, wo_l, wi_l, refl) * jnp.abs(_dot(wi, si["ns"]))[:, None]
    p_b = bsdf_pdf(lobes, wo_l, wi_l)

    p_l = ls["pdf"] * sel_pdf
    contributes = alive & (p_l > 0) & jnp.any(f_val * ls["li"] > 0, axis=-1)

    o_sh = _offset_ray(si["p"], si["ng"], wi)
    t_sh = ls["dist"] * (1.0 - 2.0 * RAY_EPS)
    occluded = intersect_p(sa, static, o_sh, wi, t_sh)
    contributes = contributes & ~occluded

    w_l = jnp.where(ls["delta"], 1.0, power_heuristic(1.0, p_l, 1.0, p_b))
    contrib = f_val * ls["li"] * (w_l / jnp.maximum(p_l, 1e-30))[:, None]
    return jnp.where(contributes[:, None], contrib, 0.0)


def trace_wave(sa: SceneArrays, static: SceneStatic, icfg: dict, scfg: dict, seed, o, d, pixel, sample_idx):
    """Trace one wave of camera rays to completion. Returns (L, n_vertices).

    icfg: {"kind": path|directlighting|whitted|ao, "max_depth": int,
           "rr_threshold": float, "strategy": all|one, "n_samples": int,
           "cos_sample": bool}
    scfg: {"kind": sampler name, "spp": int}

    The bounce loop is a rolled `lax.fori_loop` (bounce body traced ONCE —
    the XLA-friendly replacement of the reference's per-bounce recursion,
    path.rs li :79-222): sampler dimensions derive from the traced bounce
    index, and the final iteration's emission pickup runs as a trailing
    intersect-only pass.
    """
    R = o.shape[0]
    ikind = icfg["kind"]
    max_depth = int(icfg["max_depth"])

    if ikind == "ao":
        return _trace_ao(sa, static, icfg, scfg, seed, o, d, pixel, sample_idx), jnp.ones(R, F32)

    sel_pdf = _light_select_pdf(static)
    nee_on = ikind in ("path", "directlighting")
    kind_s = scfg["kind"]
    spp = scfg["spp"]
    DPB = 5  # sample dims per bounce (dims 0-1 = film/lens, consumed by caller)

    def pickup(state, b):
        """Escaped-ray env radiance + area-light emission with deferred MIS."""
        o, d, L, beta, alive, prev_specular, prev_pdf, prev_p, eta_scale, n_vertices = state
        hit = intersect(sa, static, o, d, jnp.full(R, jnp.inf, F32))
        si = surface_interaction(sa, hit, o, d)
        valid = si["valid"]
        n_vertices = n_vertices + (alive & valid)

        if static.has_infinite:
            esc = alive & ~valid
            le = env_le(sa, static, d)
            if nee_on:
                p_l = env_pdf_li(sa, static, d) * sel_pdf
                w = jnp.where(prev_specular, 1.0, power_heuristic(1.0, prev_pdf, 1.0, p_l))
            else:
                w = jnp.ones(R, F32)
            L = L + jnp.where(esc[:, None], beta * le * w[:, None], 0.0)
        alive = alive & valid

        if static.has_area_lights:
            lid = si["light"]
            emitting = alive & (lid >= 0)
            le = area_light_emission(sa, lid, si["ng"], si["wo"])
            if nee_on:
                area = sa.prim_area[jnp.maximum(si["prim"], 0)]
                p_l = pdf_li_area_hit(sa, prev_p, si["p"], si["ng"], lid, area) * sel_pdf
                w = jnp.where(prev_specular, 1.0, power_heuristic(1.0, prev_pdf, 1.0, p_l))
            else:
                w = jnp.ones(R, F32)
            L = L + jnp.where(emitting[:, None], beta * le * w[:, None], 0.0)

        return (o, d, L, beta, alive, prev_specular, prev_pdf, prev_p, eta_scale, n_vertices), si

    def bounce_body(b, state):
        state, si = pickup(state, b)
        o, d, L, beta, alive, prev_specular, prev_pdf, prev_p, eta_scale, n_vertices = state
        dim_base = 2 + b * DPB

        lobes = make_bsdf(sa, static, si["mat"], si["uv"], si["p"])
        has_lobes = num_lobes(lobes) > 0
        alive_sh = alive & has_lobes

        # --- NEE ---
        if nee_on and static.n_lights > 0:
            if ikind == "directlighting" and icfg.get("strategy", "all") == "all":
                for li_idx in range(static.n_lights):
                    L = L + beta * _nee(sa, static, icfg, scfg, seed, pixel, sample_idx, dim_base, si, lobes, alive_sh, light_index=li_idx, dim_salt=li_idx)
            else:
                L = L + beta * _nee(sa, static, icfg, scfg, seed, pixel, sample_idx, dim_base, si, lobes, alive_sh)
        elif ikind == "whitted" and static.n_lights > 0:
            L = L + beta * _nee(sa, static, icfg, scfg, seed, pixel, sample_idx, dim_base, si, lobes, alive_sh)

        # --- BSDF sampling / continuation ---
        u_lobe = sample_1d(kind_s, seed, pixel, sample_idx, dim_base + 2, spp)
        u1, u2 = sample_2d(kind_s, seed, pixel, sample_idx, dim_base + 3, spp)
        wo_l = _to_local(si, si["wo"])

        if ikind in ("directlighting", "whitted"):
            # continuation only through specular lobes (specular_reflect/
            # transmit, src/core/integrator.rs:409-520)
            from .bsdf import SPECULAR_KINDS

            spec_only = {
                "kind": jnp.where(_is_specular(lobes["kind"]), lobes["kind"], 0),
                "data": lobes["data"],
                "possible": tuple(p & SPECULAR_KINDS for p in lobes["possible"]),
            }
            bs = bsdf_sample(spec_only, wo_l, u_lobe, u1, u2)
        else:
            bs = bsdf_sample(lobes, wo_l, u_lobe, u1, u2)

        wi_w = _to_world(si, bs["wi"])
        cos_term = jnp.abs(_dot(wi_w, si["ns"]))
        thru = bs["f"] * (cos_term / jnp.maximum(bs["pdf"], 1e-30))[:, None]
        alive = alive_sh & bs["valid"] & jnp.any(thru > 0, axis=-1)
        beta = jnp.where(alive[:, None], beta * thru, beta)
        eta_scale = jnp.where(alive, eta_scale * bs["eta_scale"], eta_scale)
        prev_specular = bs["specular"]
        prev_pdf = jnp.maximum(bs["pdf"], 1e-30)
        prev_p = si["p"]

        o_new = _offset_ray(si["p"], si["ng"], wi_w)
        d_new = wi_w

        # --- russian roulette (path.rs:206-214) ---
        if ikind == "path":
            rr_beta = beta * eta_scale[:, None]
            max_c = jnp.max(rr_beta, axis=-1)
            q = jnp.maximum(0.05, 1.0 - max_c)
            do_rr = (b > 3) & (max_c < icfg.get("rr_threshold", 1.0))
            u_rr = sample_1d(kind_s, seed, pixel, sample_idx, dim_base + 4, spp)
            killed = do_rr & (u_rr < q)
            alive = alive & ~killed
            beta = jnp.where((do_rr & ~killed)[:, None], beta / jnp.maximum(1.0 - q, 1e-6)[:, None], beta)

        return (o_new, d_new, L, beta, alive, prev_specular, prev_pdf, prev_p, eta_scale, n_vertices)

    state = (
        o,
        d,
        jnp.zeros((R, 3), F32),
        jnp.ones((R, 3), F32),
        jnp.ones(R, bool),
        jnp.ones(R, bool),  # bounce-0 emission counts fully
        jnp.ones(R, F32),
        o,
        jnp.ones(R, F32),
        jnp.zeros(R, F32),  # n_vertices (stats.rs path-length counters)
    )
    if max_depth > 1:
        state = jax.lax.fori_loop(0, max_depth - 1, bounce_body, state)
    state, _si = pickup(state, max_depth - 1)
    L = state[2]
    n_vertices = state[9]
    return L, n_vertices


def _trace_ao(sa, static, icfg, scfg, seed, o, d, pixel, sample_idx):
    """Ambient occlusion (src/integrators/ao.rs)."""
    R = o.shape[0]
    hit = intersect(sa, static, o, d, jnp.full(R, jnp.inf, F32))
    si = surface_interaction(sa, hit, o, d)
    valid = si["valid"]
    n_samples = int(icfg.get("n_samples", 64))
    cos_sample = bool(icfg.get("cos_sample", True))
    kind = scfg["kind"]
    spp = scfg["spp"]

    # flip normal to the ray side (ao.rs: face-forward to wo)
    ns = jnp.where((_dot(si["ns"], si["wo"]) < 0)[:, None], -si["ns"], si["ns"])
    ng = jnp.where((_dot(si["ng"], si["wo"]) < 0)[:, None], -si["ng"], si["ng"])
    si_f = dict(si, ns=ns, ng=ng)

    def one_sample(s, acc):
        u1, u2 = sample_2d(kind, seed, pixel, sample_idx, 2 + s, spp)
        if cos_sample:
            w_l = cosine_sample_hemisphere(u1, u2)
            pdf = jnp.maximum(w_l[..., 2], 1e-9) / jnp.pi
        else:
            z = u1
            r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
            phi = 2 * jnp.pi * u2
            w_l = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
            pdf = jnp.full(R, 1.0 / (2 * jnp.pi), F32)
        w = w_l[..., 0:1] * si_f["ss"] + w_l[..., 1:2] * si_f["ts"] + w_l[..., 2:3] * ns
        o_sh = _offset_ray(si["p"], ng, w)
        occ = intersect_p(sa, static, o_sh, w, jnp.full(R, jnp.inf, F32))
        cos_w = _dot(w, ns)
        return acc + jnp.where(valid & ~occ & (cos_w > 0), cos_w / (jnp.pi * pdf), 0.0)

    acc = jax.lax.fori_loop(0, n_samples, one_sample, jnp.zeros(R, F32))
    val = acc / n_samples
    return jnp.broadcast_to(val[:, None], (R, 3))
