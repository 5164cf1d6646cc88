"""Disney / mix / subsurface-interface material construction + furnace checks."""
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
    IntegratorConfig,
    SamplerConfig,
    SceneDescription,
    ShapeRecord,
    TriangleMesh,
)


def _floor_scene(mat, depth=3, spp=16):
    mesh = TriangleMesh(
        p=np.array([[-50, 0, -50], [50, 0, -50], [50, 0, 50], [-50, 0, 50]], np.float64),
        indices=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
    )
    return SceneDescription(
        primitives=[HostPrimitive(shape=ShapeRecord(mesh=mesh), material=mat)],
        lights=[HostLight(kind="infinite", intensity=np.array([1.0, 1.0, 1.0]))],
        camera=CameraConfig(kind="perspective", camera_to_world=Transform.look_at([0, 5, 0], [0, 0, 0], [0, 0, 1]), fov=40.0),
        film=FilmConfig(x_resolution=10, y_resolution=8),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=spp),
        integrator=IntegratorConfig(kind="path", max_depth=depth),
    )


def test_disney_furnace_bounded():
    """Disney material under a white furnace: energy-bounded, nonzero."""
    mat = HostMaterial(
        kind="disney",
        params={
            "color": ("const", np.array([0.6, 0.4, 0.3])),
            "metallic": ("const", 0.3),
            "roughness": ("const", 0.4),
            "clearcoat": ("const", 1.0),
            "clearcoatgloss": ("const", 0.8),
            "sheen": ("const", 0.5),
        },
    )
    img = render(_floor_scene(mat, spp=32), spp=32)
    assert np.isfinite(img).all()
    c = img[4, 5]
    assert c.min() > 0.05 and c.max() < 1.5, c


def test_mix_material_blends():
    """Mix of black and white matte at amount=0.25 -> reflectance 0.25."""
    white = HostMaterial(kind="matte", params={"Kd": ("const", np.array([1.0, 1.0, 1.0]))})
    black = HostMaterial(kind="matte", params={"Kd": ("const", np.array([0.0, 0.0, 0.0]))})
    mix = HostMaterial(
        kind="mix",
        params={
            "amount": ("const", np.array([0.25, 0.25, 0.25])),
            "material1": ("material", white),
            "material2": ("material", black),
        },
    )
    img = render(_floor_scene(mix, depth=2, spp=128), spp=128)
    # single bounce under unit env: mixed albedo = 0.25. Average over the
    # whole floor (every pixel sees it) for tight statistics.
    c = img.mean()
    np.testing.assert_allclose(c, 0.25, rtol=0.06)


def test_subsurface_interface_renders():
    mat = HostMaterial(kind="subsurface", params={"eta": ("const", 1.33)})
    img = render(_floor_scene(mat, depth=3, spp=8), spp=8)
    assert np.isfinite(img).all()
    assert img.max() > 0.1  # transmits/reflects the env
