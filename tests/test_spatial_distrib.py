"""Spatial (voxel-grid) light distribution (lightdistrib.rs:153-339).

Two point lights at opposite ends of a long box: voxels near each light
must strongly prefer it, and the render pipeline must accept
light_strategy="spatial" end-to-end (it no longer aliases "power")."""
import numpy as np

import jax.numpy as jnp

from pbrt_tpu.core.transform import Transform
from pbrt_tpu.render import render
from pbrt_tpu.scene.builder import compile_scene
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


def _scene(strategy="spatial"):
    fp = np.array([[-10, 0, -2], [10, 0, -2], [10, 0, 2], [-10, 0, 2]], np.float64)
    fidx = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    floor = HostPrimitive(
        shape=ShapeRecord(mesh=TriangleMesh(p=fp, indices=fidx)),
        material=HostMaterial(kind="matte", params={"Kd": ("const", np.array([0.7, 0.7, 0.7]))}),
    )
    l1 = HostLight(kind="point", from_point=np.array([-9.0, 1.0, 0.0]), intensity=np.array([5.0, 5.0, 5.0]))
    l2 = HostLight(kind="point", from_point=np.array([9.0, 1.0, 0.0]), intensity=np.array([5.0, 5.0, 5.0]))
    return SceneDescription(
        primitives=[floor],
        lights=[l1, l2],
        camera=CameraConfig(kind="perspective",
                            camera_to_world=Transform.look_at([0, 8, 6], [0, 0, 0], [0, 1, 0]),
                            fov=70.0),
        film=FilmConfig(x_resolution=32, y_resolution=16),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=8),
        integrator=IntegratorConfig(kind="path", max_depth=2, light_strategy=strategy),
    )


def test_spatial_distribution_prefers_near_light():
    from pbrt_tpu.device.lightdistrib import build_spatial_distribution, spatial_select

    cs = compile_scene(_scene())
    dist = build_spatial_distribution(cs.arrays, cs.static)
    # probe points near each light
    p = jnp.asarray(np.array([[-9.0, 0.5, 0.0], [9.0, 0.5, 0.0]], np.float32))
    u = jnp.asarray(np.array([0.5, 0.5], np.float32))
    lid, pmf = spatial_select(dist, p, u)
    pmf_np = np.asarray(dist["pmf"])
    assert np.all(np.isfinite(pmf_np)) and abs(pmf_np.sum(axis=1) - 1.0).max() < 1e-4
    from pbrt_tpu.device.lightdistrib import spatial_pmf_of

    near_l1 = float(spatial_pmf_of(dist, p[:1], jnp.asarray([0]))[0])
    near_l2 = float(spatial_pmf_of(dist, p[1:], jnp.asarray([1]))[0])
    assert near_l1 > 0.8, near_l1
    assert near_l2 > 0.8, near_l2


def test_spatial_render_matches_uniform():
    img_u = render(_scene("uniform"), spp=32)
    img_s = render(_scene("spatial"), spp=32)
    lit = img_u.mean(axis=-1) > 0.01
    assert lit.sum() > 40
    r = img_s.mean(axis=-1)[lit] / img_u.mean(axis=-1)[lit]
    assert abs(np.median(r) - 1.0) < 0.15, np.median(r)
