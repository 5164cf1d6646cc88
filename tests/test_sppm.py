"""SPPM end-to-end: must agree with path tracing on a diffuse scene.

The reference has no SPPM unit tests; consistency-with-path is the standard
validation (both are unbiased/consistent estimators of the same transport).
"""
import numpy as np
import pytest

from pbrt_tpu.core.transform import Transform
from pbrt_tpu.render import render
from pbrt_tpu.scene.host import (
    CameraConfig,
    FilmConfig,
    HostLight,
    HostMaterial,
    HostPrimitive,
    IntegratorConfig,
    SamplerConfig,
    SceneDescription,
    ShapeRecord,
    TriangleMesh,
)


def _quad(p0, p1, p2, p3, kd):
    mesh = TriangleMesh(
        p=np.array([p0, p1, p2, p3], np.float64),
        indices=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
    )
    return HostPrimitive(
        shape=ShapeRecord(mesh=mesh),
        material=HostMaterial(kind="matte", params={"Kd": ("const", np.array([kd] * 3))}),
    )


def _box_scene(integrator):
    # open box: floor + back wall, point light inside, camera looking in
    prims = [
        _quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2], 0.7),     # floor
        _quad([-2, 0, -2], [-2, 3, -2], [2, 3, -2], [2, 0, -2], 0.6),   # back wall
    ]
    return SceneDescription(
        primitives=prims,
        lights=[HostLight(kind="point", from_point=np.array([0.0, 2.0, 1.0]), to_point=np.zeros(3), intensity=np.array([4.0, 4.0, 4.0]))],
        camera=CameraConfig(kind="perspective", camera_to_world=Transform.look_at([0, 1.5, 5], [0, 1.0, 0], [0, 1, 0]), fov=45.0),
        film=FilmConfig(x_resolution=16, y_resolution=12),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=64),
        integrator=integrator,
    )


def test_sppm_matches_path():
    import pbrt_tpu.device.sppm as sppm_mod

    sppm_mod.KMAX = 8  # keep the CPU compile small

    desc_p = _box_scene(IntegratorConfig(kind="path", max_depth=3))
    img_path = render(desc_p, spp=64)

    desc_s = _box_scene(
        IntegratorConfig(kind="sppm", max_depth=3, num_iterations=24, photons_per_iteration=4096, initial_radius=0.25)
    )
    img_sppm = render(desc_s)

    # compare mean brightness and per-pixel agreement on lit pixels
    lit = img_path.mean(axis=-1) > 0.05
    assert lit.sum() > 30
    ratio = img_sppm.mean(axis=-1)[lit] / img_path.mean(axis=-1)[lit]
    assert abs(np.median(ratio) - 1.0) < 0.15, f"median ratio {np.median(ratio)}"
    assert abs(img_sppm[lit].mean() / img_path[lit].mean() - 1.0) < 0.15


def test_sppm_matches_path_env_light():
    """Non-delta lights exercise the camera pass's BSDF-sampled MIS half:
    without the recorded vertex's MIS tail, a constant env light measured
    1.62x low (the round-1 caustic-glass brightness deficit)."""
    import pbrt_tpu.device.sppm as sppm_mod

    sppm_mod.KMAX = 8

    light = HostLight(kind="infinite", intensity=np.array([0.6, 0.6, 0.6]))
    desc_p = _box_scene(IntegratorConfig(kind="path", max_depth=3))
    desc_p.lights = [light]
    img_path = render(desc_p, spp=64)

    desc_s = _box_scene(
        IntegratorConfig(kind="sppm", max_depth=3, num_iterations=16,
                         photons_per_iteration=4096, initial_radius=0.25)
    )
    desc_s.lights = [light]
    img_sppm = render(desc_s)

    lit = img_path.mean(axis=-1) > 0.05
    assert lit.sum() > 30
    ratio = img_sppm.mean(axis=-1)[lit] / img_path.mean(axis=-1)[lit]
    assert abs(np.median(ratio) - 1.0) < 0.12, f"median ratio {np.median(ratio)}"
