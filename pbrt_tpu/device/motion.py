"""Exact per-ray animated-transform evaluation (motion blur).

The reference applies motion per ray: AnimatedTransform decomposes both
keyframe matrices into T/R(quaternion)/S (transform.rs:1442 decompose),
component-interpolates at the ray's shutter time (:1493 interpolate —
translation lerp, rotation slerp, scale matrix lerp) and
TransformedPrimitive intersects with the interpolated transform. Rounds
1-3 approximated this with per-vertex quadratic motion through the slerp
midpoint (error ~(theta/2)^4/24); this module evaluates the reference's
exact interpolation on device, per (ray, candidate-primitive):

    M(dt) = T(dt) . R(slerp(q0, q1, dt)) . S(dt)          (3x4)

Host-side (scene/builder.py) decomposes each distinct animated CTM pair
into a small group table (q0/q1 sign-aligned, theta precomputed) plus a
per-primitive constant:

    triangles:  p(t) = M(dt) . C . p_world0   with C = M0^-1
    quadrics:   w2o(t) = C . M(dt)^-1         with C = w2o0 . M0

so the device math is one slerp + quaternion->matrix + two 3x4 affine
composes per (ray, candidate). Group 0 is the identity (static prims pass
through unchanged), so mixed static/animated scenes need no masking.
"""
from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32


def _slerp(q0, q1, theta, dt):
    """slerp(q0, q1, dt); q0/q1 (..., 4) sign-aligned host-side, theta (...)
    the angle between them (quaternion.rs slerp). Falls back to nlerp for
    nearly-parallel quaternions like the reference."""
    dt = jnp.asarray(dt, F32)
    near = theta < 0.0317  # cos > ~0.9995, matching AnimatedTransform
    st = jnp.sin(jnp.where(near, 1.0, theta))
    w0 = jnp.where(near, 1.0 - dt, jnp.sin((1.0 - dt) * theta) / st)
    w1 = jnp.where(near, dt, jnp.sin(dt * theta) / st)
    q = w0[..., None] * q0 + w1[..., None] * q1
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def _quat_to_matrix(q):
    """(..., 4) wxyz -> (..., 3, 3) rotation (quaternion.rs to_transform)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
    ], axis=-2)


def eval_anim(an, gid, dt):
    """Interpolated transform per element.

    an: dict of group tables — q0/q1 (G, 4), t0/t1 (G, 3), s0/s1 (G, 3, 3),
    theta (G,). gid: (...,) i32 group ids; dt: shutter fraction in [0, 1],
    broadcast-compatible with gid (tables are gathered at gid's shape, so a
    (B, 1, K) gid against a (B, P, 1) dt costs only B*K gathers).
    Returns M (broadcast(...), 3, 4) = T(dt) . R . S  (transform.rs:1493)."""
    q0 = an["q0"][gid]
    q1 = an["q1"][gid]
    th = an["theta"][gid]
    dt = jnp.asarray(dt, F32)
    q = _slerp(q0, q1, th, dt)
    rot = _quat_to_matrix(q)
    w = dt[..., None, None]
    s = (1.0 - w) * an["s0"][gid] + w * an["s1"][gid]
    rs = rot @ jnp.broadcast_to(s, rot.shape)
    t = (1.0 - dt[..., None]) * an["t0"][gid] + dt[..., None] * an["t1"][gid]
    return jnp.concatenate([rs, jnp.broadcast_to(t, rs.shape[:-1])[..., :, None]], axis=-1)


def _affine_inverse(m):
    """(..., 3, 4) affine -> its inverse (..., 3, 4) via adjugate."""
    a = m[..., :3, :3]
    t = m[..., :3, 3]
    c0 = jnp.cross(a[..., :, 1], a[..., :, 2])
    c1 = jnp.cross(a[..., :, 2], a[..., :, 0])
    c2 = jnp.cross(a[..., :, 0], a[..., :, 1])
    det = jnp.sum(a[..., :, 0] * c0, axis=-1, keepdims=True)[..., None]
    inv = jnp.stack([c0, c1, c2], axis=-2) / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    ti = -jnp.einsum("...ij,...j->...i", inv, t)
    return jnp.concatenate([inv, ti[..., :, None]], axis=-1)


def _compose(a, b):
    """(..., 3, 4) @ (..., 3, 4) as affine transforms (a then applied after b)."""
    r = a[..., :3, :3] @ b[..., :3, :3]
    t = jnp.einsum("...ij,...j->...i", a[..., :3, :3], b[..., :3, 3]) + a[..., :3, 3]
    return jnp.concatenate([r, t[..., :, None]], axis=-1)


def xform_point(m, p):
    """(..., 3, 4) x (..., 3) -> (..., 3)."""
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) + m[..., :3, 3]


def motion_matrices(sa, prim_rows, dt, quadric=False):
    """Exact per-element motion transform for candidate primitives.

    prim_rows: (...,) primitive-row indices; dt: shutter fraction,
    broadcast-compatible with prim_rows.

    quadric=False: G = M(dt) . C with C = M0^-1 — maps shutter-open WORLD
    triangle verts to time dt (p(t) = G . p_world0).
    quadric=True:  G = C . M(dt)^-1 with C = w2o0 . M0 — the quadric's
    world-to-object at time dt."""
    gid = sa.anim_gid[prim_rows]
    M = eval_anim(sa.anim, gid, dt)
    C = sa.anim_c[prim_rows]
    if quadric:
        return _compose(jnp.broadcast_to(C, M.shape), _affine_inverse(M))
    return _compose(M, jnp.broadcast_to(C, M.shape))
