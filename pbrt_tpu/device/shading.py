"""Surface interaction reconstruction from hit records.

Replaces the reference's SurfaceInteraction construction inside the shape
intersect methods (src/shapes/triangle.rs:300-399, sphere.rs) — but computed
once per ray wave from the SoA hit record, as pure batched array math.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..scene.arrays import GEOM_TRI, SceneArrays
from .intersect import _xform_point

F32 = jnp.float32

FLAG_FLIP_GEOM_N = 1
FLAG_HAS_SHADING_N = 2
FLAG_REVERSE_ORIENTATION = 4
FLAG_HAS_UV = 8


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)


def coordinate_system(n):
    """Build an orthonormal basis around n (src/core/geometry/geometry.rs)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack([1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]], axis=-1)
    bt = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def surface_interaction(sa: SceneArrays, hit, o, d):
    """Build the shading record for each ray.

    hit: dict from intersect(); o, d: (R, 3) ray.
    Returns dict with p, ng (geometric normal), ns (shading normal), uv,
    tangent/bitangent frame (ss, ts), mat (material id), light (area light id),
    valid (R,) mask.
    """
    prim = jnp.maximum(hit["prim"], 0)
    valid = hit["prim"] >= 0
    t = jnp.where(valid, hit["t"], 1.0)
    kind = sa.prim_kind[prim]
    geom = sa.prim_geom[prim]
    flags = sa.prim_flags[prim]
    is_tri = kind == GEOM_TRI

    p = o + d * t[..., None]

    R = prim.shape[0]
    ng = jnp.zeros((R, 3), F32)
    ns = jnp.zeros((R, 3), F32)
    uv = jnp.zeros((R, 2), F32)

    if sa.tri_p.shape[0] > 0:
        ti = jnp.where(is_tri, geom, 0)
        tv = sa.tri_p[ti]  # (R, 3, 3)
        tn = sa.tri_n[ti]
        tuv = sa.tri_uv[ti]
        b1 = hit["b1"]
        b2 = hit["b2"]
        b0 = 1.0 - b1 - b2
        e1 = tv[:, 1] - tv[:, 0]
        e2 = tv[:, 2] - tv[:, 0]
        ng_t = _normalize(jnp.cross(e1, e2))
        flip = (flags & FLAG_FLIP_GEOM_N) != 0
        ng_t = jnp.where(flip[:, None], -ng_t, ng_t)
        ns_t = _normalize(b0[:, None] * tn[:, 0] + b1[:, None] * tn[:, 1] + b2[:, None] * tn[:, 2])
        # geometric normal flipped toward shading normal (triangle.rs:355-360)
        has_sn = (flags & FLAG_HAS_SHADING_N) != 0
        align = jnp.sum(ng_t * ns_t, axis=-1) < 0
        ng_t = jnp.where((has_sn & align)[:, None], -ng_t, ng_t)
        ns_t = jnp.where(has_sn[:, None], ns_t, ng_t)
        uv_t = b0[:, None] * tuv[:, 0] + b1[:, None] * tuv[:, 1] + b2[:, None] * tuv[:, 2]
        ng = jnp.where(is_tri[:, None], ng_t, ng)
        ns = jnp.where(is_tri[:, None], ns_t, ns)
        uv = jnp.where(is_tri[:, None], uv_t, uv)

    if sa.sph_param.shape[0] > 0:
        si = jnp.where(~is_tri, geom, 0)
        o2w = sa.sph_o2w[si]
        w2o = sa.sph_w2o[si]
        par = sa.sph_param[si]
        radius = par[:, 0]
        p_obj = _xform_point(w2o, p)
        p_obj = p_obj * (radius / jnp.maximum(jnp.linalg.norm(p_obj, axis=-1), 1e-30))[:, None]
        # normal transform: (w2o)^T on object normal
        n_obj = p_obj / radius[:, None]
        ng_s = _normalize(jnp.einsum("rji,rj->ri", w2o[:, :, :3], n_obj))
        flip = (flags & FLAG_FLIP_GEOM_N) != 0
        ng_s = jnp.where(flip[:, None], -ng_s, ng_s)
        # spherical uv (sphere.rs)
        phi = jnp.arctan2(p_obj[:, 1], p_obj[:, 0])
        phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
        zc = jnp.clip(p_obj[:, 2] / radius, -1.0, 1.0)
        theta = jnp.arccos(zc)
        phimax = par[:, 3]
        tmin = par[:, 4]
        tmax = par[:, 5]
        u_s = phi / jnp.maximum(phimax, 1e-9)
        v_s = (theta - tmin) / jnp.maximum(tmax - tmin, 1e-9)
        uv_s = jnp.stack([u_s, v_s], axis=-1)
        ng = jnp.where(is_tri[:, None], ng, ng_s)
        ns = jnp.where(is_tri[:, None], ns, ng_s)
        uv = jnp.where(is_tri[:, None], uv, uv_s)

    ss, ts = coordinate_system(ns)
    return {
        "valid": valid,
        "p": p,
        "ng": ng,
        "ns": ns,
        "uv": uv,
        "ss": ss,
        "ts": ts,
        "mat": jnp.where(valid, sa.prim_mat[prim], 0),
        "light": jnp.where(valid, sa.prim_light[prim], -1),
        "prim": hit["prim"],
        "wo": -d,
    }
