"""Camera ray generation (perspective / orthographic / environment).

Host side precomputes the raster->camera and camera->world matrices exactly as
the reference constructs them (src/cameras/perspective.rs:22-..,
src/core/camera.rs screen-window logic); the device side is a pure batched
ray generator over raster sample positions, including thin-lens depth of
field (perspective.rs generate_ray) and analytic ray differentials.
"""
from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp

from ..scene.host import CameraConfig, FilmConfig

CAM_PERSPECTIVE = 0
CAM_ORTHOGRAPHIC = 1
CAM_ENVIRONMENT = 2
CAM_REALISTIC = 3

_KINDS = {
    "perspective": CAM_PERSPECTIVE,
    "orthographic": CAM_ORTHOGRAPHIC,
    "environment": CAM_ENVIRONMENT,
    "realistic": CAM_REALISTIC,
}


def _perspective_matrix(fov_deg, n=1e-2, f=1000.0):
    inv_tan = 1.0 / math.tan(math.radians(fov_deg) / 2.0)
    m = np.array(
        [
            [1, 0, 0, 0],
            [0, 1, 0, 0],
            [0, 0, f / (f - n), -f * n / (f - n)],
            [0, 0, 1, 0],
        ],
        dtype=np.float64,
    )
    s = np.diag([inv_tan, inv_tan, 1.0, 1.0])
    return s @ m


def make_camera(cfg: CameraConfig, film: FilmConfig):
    """Build the static camera parameter dict (all jnp leaves)."""
    xres, yres = film.x_resolution, film.y_resolution
    aspect = xres / yres
    if cfg.screen_window is not None:
        x0, x1, y0, y1 = cfg.screen_window
    elif aspect > 1:
        x0, x1, y0, y1 = -aspect, aspect, -1.0, 1.0
    else:
        x0, x1, y0, y1 = -1.0, 1.0, -1.0 / aspect, 1.0 / aspect

    kind = _KINDS.get(cfg.kind, CAM_PERSPECTIVE)

    # raster -> screen -> camera (camera.rs ProjectiveCamera ctor math)
    screen_to_raster = (
        np.diag([xres, yres, 1.0, 1.0])
        @ np.array([[1 / (x1 - x0), 0, 0, -x0 / (x1 - x0)], [0, 1 / (y0 - y1), 0, -y1 / (y0 - y1)], [0, 0, 1, 0], [0, 0, 0, 1.0]])
    )
    raster_to_screen = np.linalg.inv(screen_to_raster)
    if kind == CAM_PERSPECTIVE:
        proj = _perspective_matrix(cfg.fov)
    elif kind == CAM_ORTHOGRAPHIC:
        proj = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]])
    else:
        proj = np.eye(4)
    raster_to_camera = np.linalg.inv(proj) @ raster_to_screen

    c2w = cfg.camera_to_world.m  # (4, 4)
    # animated camera (transform.rs AnimatedTransform): decomposed T/R/S
    # keyframes; generate_rays slerps per ray by shutter time
    anim = None
    if getattr(cfg, "camera_to_world_end", None) is not None:
        from ..core.transform import AnimatedTransform

        at = AnimatedTransform(cfg.camera_to_world, cfg.camera_to_world_end)
        if at.actually_animated:
            (t0, q0, s0), (t1, q1, s1) = at._parts()
            anim = {
                "t": jnp.asarray(np.stack([t0, t1]).astype(np.float32)),
                "q": jnp.asarray(np.stack([q0, q1]).astype(np.float32)),
                "s": jnp.asarray(np.stack([s0, s1]).astype(np.float32)),
            }
    realistic = None
    if kind == CAM_REALISTIC:
        from .realistic import make_realistic

        realistic = make_realistic(cfg, film)
    # physical area of the screen window at z=1 (for light-transport We)
    if kind == CAM_PERSPECTIVE:
        import math as _m

        tan_half = _m.tan(_m.radians(cfg.fov) / 2.0)
        screen_area = (x1 - x0) * (y1 - y0) * tan_half * tan_half
    else:
        screen_area = (x1 - x0) * (y1 - y0)
    return {
        "kind": kind,
        "raster_to_camera": jnp.asarray(raster_to_camera.astype(np.float32)),
        "camera_to_world": jnp.asarray(np.asarray(c2w, dtype=np.float32)),
        "lens_radius": jnp.float32(cfg.lens_radius),
        "focal_distance": jnp.float32(cfg.focal_distance),
        "resolution": (xres, yres),
        "shutter": (cfg.shutter_open, cfg.shutter_close),
        "screen_area": float(screen_area),
        "realistic": realistic,
        "anim": anim,
    }


from .affine import apply44_point as _apply44_point, xf_vector as _apply44_vector, xf_vector_t as _xf_vec_t, xf_vector as _xf_vec


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)


def concentric_sample_disk(u1, u2):
    """Concentric disk mapping (src/core/sampling.rs:147-168)."""
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    deg = (ox == 0) & (oy == 0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    safe_x = jnp.where(ox == 0, 1.0, ox)
    safe_y = jnp.where(oy == 0, 1.0, oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(use_x, (jnp.pi / 4.0) * (oy / safe_x), jnp.pi / 2.0 - (jnp.pi / 4.0) * (ox / safe_y))
    r = jnp.where(deg, 0.0, r)
    theta = jnp.where(deg, 0.0, theta)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _quat_rot_batch(q):
    """(R, 4) wxyz quaternions -> (R, 3, 3) rotation matrices."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def _anim_c2w(anim, tf):
    """Per-ray interpolated camera-to-world: (R, 3, 3) rotation*scale and
    (R, 3) translation (AnimatedTransform::interpolate, vectorized)."""
    t0, t1 = anim["t"][0], anim["t"][1]
    q0, q1 = anim["q"][0], anim["q"][1]
    s0, s1 = anim["s"][0], anim["s"][1]
    dt = jnp.clip(tf, 0.0, 1.0)
    trans = (1.0 - dt)[:, None] * t0 + dt[:, None] * t1
    cos_th = jnp.clip(jnp.sum(q0 * q1), -1.0, 1.0)
    theta = jnp.arccos(cos_th)
    sin_th = jnp.maximum(jnp.sin(theta), 1e-9)
    lin = cos_th > 0.9995
    w0 = jnp.where(lin, 1.0 - dt, jnp.sin((1.0 - dt) * theta) / sin_th)
    w1 = jnp.where(lin, dt, jnp.sin(dt * theta) / sin_th)
    q = w0[:, None] * q0[None, :] + w1[:, None] * q1[None, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    rot = _quat_rot_batch(q)
    s_t = (1.0 - dt)[:, None, None] * s0[None] + dt[:, None, None] * s1[None]
    return jnp.einsum("rij,rjk->rik", rot, s_t), trans


def generate_rays(cam, p_film_x, p_film_y, u_lens1, u_lens2, time_frac=None):
    """Raster-space sample positions -> world-space rays.

    Returns (o, d) each (R, 3). time_frac: optional (R,) normalized shutter
    times for the animated-camera path. Differentials are generated lazily
    by the texture filtering path via the camera dx/dy helper below.
    """
    kind = cam["kind"]
    if kind == CAM_REALISTIC:
        from .realistic import realistic_generate_rays

        o, d, _w = realistic_generate_rays(cam, cam["realistic"], p_film_x, p_film_y, u_lens1, u_lens2)
        return o, d
    r2c = cam["raster_to_camera"]
    c2w = cam["camera_to_world"]
    p_raster = jnp.stack([p_film_x, p_film_y, jnp.zeros_like(p_film_x)], axis=-1)
    p_cam = _apply44_point(r2c, p_raster)

    if kind == CAM_PERSPECTIVE:
        o_cam = jnp.zeros_like(p_cam)
        d_cam = _normalize(p_cam)
    elif kind == CAM_ORTHOGRAPHIC:
        o_cam = p_cam
        d_cam = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), p_cam.shape)
    else:  # environment: equirect over the full sphere (cameras/environment.rs)
        xres, yres = cam["resolution"]
        theta = jnp.pi * p_film_y / yres
        phi = 2.0 * jnp.pi * p_film_x / xres
        d_cam = jnp.stack([jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta), jnp.sin(theta) * jnp.sin(phi)], axis=-1)
        o_cam = jnp.zeros_like(d_cam)

    lens_r = cam["lens_radius"]
    if kind == CAM_PERSPECTIVE:
        # thin-lens DoF (perspective.rs generate_ray)
        lx, ly = concentric_sample_disk(u_lens1, u_lens2)
        lx = lens_r * lx
        ly = lens_r * ly
        ft = cam["focal_distance"] / jnp.maximum(d_cam[..., 2], 1e-9)
        p_focus = o_cam + d_cam * ft[..., None]
        o_lens = jnp.stack([lx, ly, jnp.zeros_like(lx)], axis=-1)
        use_lens = lens_r > 0
        o_cam = jnp.where(use_lens, o_lens, o_cam)
        d_cam = jnp.where(use_lens, _normalize(p_focus - o_cam), d_cam)

    if cam.get("anim") is not None and time_frac is not None:
        m3, trans = _anim_c2w(cam["anim"], time_frac)
        o_w = _xf_vec(m3, o_cam) + trans
        d_w = _normalize(_xf_vec(m3, d_cam))
        return o_w, d_w
    o_w = _xf_vec(c2w[:3, :3], o_cam) + c2w[:3, 3]
    d_w = _normalize(_apply44_vector(c2w, d_cam))
    return o_w, d_w


def ray_differential_dirs(cam, p_film_x, p_film_y):
    """World-space directions of the +1-pixel x/y offset rays (pinhole;
    camera.rs generate_ray_differential finite-difference default :43-97)."""
    zeros = jnp.zeros_like(p_film_x)
    _, dx = generate_rays(cam, p_film_x + 1.0, p_film_y, zeros, zeros)
    _, dy = generate_rays(cam, p_film_x, p_film_y + 1.0, zeros, zeros)
    return dx, dy


# ---------------------------------------------------------------------------
# Light-transport endpoint interface (camera.rs we/pdf_we/sample_wi
# :98-121; perspective.rs implementations) — used by BDPT t=1 strategies
# and MLT. Pinhole perspective only (lens_radius ~ 0 treated as delta).
# ---------------------------------------------------------------------------


def camera_we(cam, p_from, w):
    """Importance We carried by a ray leaving the camera at direction w,
    plus the raster position it corresponds to. Returns (we (R,), px, py,
    valid). (perspective.rs we())"""
    c2w = cam["camera_to_world"]
    # world -> camera rotation transpose
    rot = c2w[:3, :3]
    d_cam = _xf_vec_t(rot, w)
    cos_theta = d_cam[..., 2]
    valid = cos_theta > 1e-4
    # project the point along the ray to the z=1 plane, then to raster
    p_z1 = d_cam / jnp.maximum(cos_theta, 1e-6)[..., None]
    r2c_inv = jnp.asarray(np.linalg.inv(np.asarray(cam["raster_to_camera"])), jnp.float32)
    pr = _apply44_point(r2c_inv, p_z1)
    W, H = cam["resolution"]
    inside = valid & (pr[..., 0] >= 0) & (pr[..., 0] < W) & (pr[..., 1] >= 0) & (pr[..., 1] < H)
    a = cam["screen_area"]
    cos2 = cos_theta * cos_theta
    we = jnp.where(inside, 1.0 / jnp.maximum(a * cos2 * cos2, 1e-12), 0.0)
    return we, pr[..., 0], pr[..., 1], inside


def camera_pdf_we(cam, w):
    """(pdf_pos, pdf_dir) for a camera ray with direction w
    (perspective.rs pdf_we): pinhole -> pdf_pos delta (1), pdf_dir =
    1/(A cos^3 theta)."""
    c2w = cam["camera_to_world"]
    rot = c2w[:3, :3]
    d_cam = _xf_vec_t(rot, w)
    cos_theta = jnp.maximum(d_cam[..., 2], 1e-6)
    a = cam["screen_area"]
    pdf_dir = 1.0 / (a * cos_theta ** 3)
    return jnp.ones_like(pdf_dir), pdf_dir


def camera_sample_wi(cam, p_ref):
    """Sample direction from p_ref toward the (pinhole) camera
    (perspective.rs sample_wi): returns (wi, dist, we, px, py, valid);
    pdf is a delta (=1 after the dist^2/cos conversion is folded in)."""
    cam_p = cam["camera_to_world"][:3, 3]
    to_cam = cam_p - p_ref
    d2 = jnp.sum(to_cam * to_cam, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
    wi = to_cam / dist[..., None]
    we, px, py, valid = camera_we(cam, cam_p, -wi)
    # pdf of the delta position over the solid angle: dist^2 / cos (lens
    # area -> delta); fold into the returned importance weight
    c2w = cam["camera_to_world"]
    rot = c2w[:3, :3]
    d_cam = _xf_vec_t(rot, -wi)
    cos_theta = jnp.maximum(d_cam[..., 2], 1e-6)
    pdf = d2 / cos_theta
    return {"wi": wi, "dist": dist, "we": we, "px": px, "py": py, "valid": valid, "pdf": pdf}
