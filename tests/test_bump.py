"""Bump mapping (material.rs:46-87 bump()).

The parser stores `"texture bumpmap"` into HostMaterial.bump_map
(parser/api.py); the builder registers it per material (mat_bump) and the
device displaces the shading frame by finite differences of the float
texture (device/shading.py apply_bump). Before round 5 the field was parsed
and silently dropped — these tests pin the consumption end to end.
"""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core.transform import Transform
from pbrt_tpu.render import render
from pbrt_tpu.scene.host import (
    CameraConfig,
    FilmConfig,
    HostLight,
    HostMaterial,
    HostPrimitive,
    HostTexture,
    IntegratorConfig,
    SamplerConfig,
    SceneDescription,
    ShapeRecord,
    TriangleMesh,
)


def _ramp_image(H=64, W=64):
    """Sinusoidal height field along u: strong, smooth du gradients."""
    u = np.linspace(0, 8 * np.pi, W, dtype=np.float32)
    # amplitude 0.05 over a 4-unit-wide plane: ~17 deg peak normal tilt
    img = 0.05 * (1.0 + np.sin(u))[None, :, None] * np.ones((H, 1, 3), np.float32)
    return img


def _scene(bump: bool):
    mesh = TriangleMesh(
        p=np.array([[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], np.float64),
        indices=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
        uv=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64),
    )
    mat = HostMaterial(kind="matte", params={"Kd": ("const", np.array([0.7, 0.7, 0.7]))})
    if bump:
        bump_tex = HostTexture(kind="imagemap", is_float=True, image=_ramp_image())
        mat.bump_map = ("texture", bump_tex)
    plane = HostPrimitive(shape=ShapeRecord(mesh=mesh), material=mat)
    # glancing light so normal perturbations swing the cosine strongly
    light = HostLight(kind="point", intensity=np.array([30.0, 30.0, 30.0]),
                      from_point=np.array([3.0, 0.6, 0.0]))
    return SceneDescription(
        primitives=[plane],
        lights=[light],
        camera=CameraConfig(
            kind="perspective",
            camera_to_world=Transform.look_at([0, 3.0, 3.0], [0, 0, 0], [0, 1, 0]),
            fov=60.0,
        ),
        film=FilmConfig(x_resolution=32, y_resolution=32),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=16),
        integrator=IntegratorConfig(kind="path", max_depth=2),
    )


def test_bump_changes_shading():
    flat = render(_scene(bump=False), spp=16)
    bumped = render(_scene(bump=True), spp=16)
    assert np.isfinite(bumped).all()
    diff = np.abs(bumped - flat).mean(axis=-1)
    lit = flat.mean(axis=-1) > 1e-3
    assert lit.sum() > 100
    # the sinusoidal height field must visibly modulate the lit plane
    rel = diff[lit] / np.maximum(flat.mean(axis=-1)[lit], 1e-3)
    assert rel.max() > 0.10, f"max relative bump delta {rel.max()}"
    # and the mean brightness must stay in the same ballpark (bump shifts
    # normals, it does not add or remove energy wholesale)
    r = bumped[lit].mean() / flat[lit].mean()
    assert 0.7 < r < 1.3, r


def test_bump_builder_registers_texture():
    from pbrt_tpu.scene.builder import compile_scene

    cs = compile_scene(_scene(bump=True))
    assert bool(cs.static.has_bump)
    assert int(np.asarray(cs.arrays.mat_bump).max()) >= 0
    cs2 = compile_scene(_scene(bump=False))
    assert not bool(cs2.static.has_bump)


def test_bump_deterministic_and_frame_orthonormal():
    """apply_bump must keep an orthonormal shading frame."""
    from pbrt_tpu.scene.builder import compile_scene
    from pbrt_tpu.device.intersect import intersect
    from pbrt_tpu.device.shading import apply_bump, surface_interaction

    cs = compile_scene(_scene(bump=True))
    sa, static = cs.arrays, cs.static
    o = jnp.asarray(np.array([[0.3, 2.0, 0.2], [-0.7, 2.0, -0.4]], np.float32))
    d = jnp.asarray(np.array([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]], np.float32))
    hit = intersect(sa, static, o, d, jnp.full(2, np.inf, jnp.float32))
    si = surface_interaction(sa, hit, o, d)
    ns_before = np.asarray(si["ns"]).copy()
    si = apply_bump(sa, static, si)
    ns, ss, ts = (np.asarray(si[k]) for k in ("ns", "ss", "ts"))
    assert np.all(np.abs(np.linalg.norm(ns, axis=-1) - 1) < 1e-4)
    assert np.all(np.abs((ns * ss).sum(-1)) < 1e-4)
    assert np.all(np.abs((ns * ts).sum(-1)) < 1e-4)
    assert np.all(np.abs((ss * ts).sum(-1)) < 1e-4)
    # normals actually moved somewhere on the sinusoid
    assert np.abs(ns - ns_before).max() > 1e-3
