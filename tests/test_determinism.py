"""Fixed-seed determinism: renders are bit-exact across reruns.

The reference relies on Rust's type system for data-race freedom (SURVEY
§5); the functional-purity equivalent here is an explicit regression test
that two renders of the same scene with the same seed produce identical
bits (catches nondeterministic reductions or seed plumbing regressions)."""
import numpy as np

from pbrt_tpu.core.transform import Transform
from pbrt_tpu.render import render
from pbrt_tpu.scene.host import (
    CameraConfig, FilmConfig, HostLight, HostMaterial, HostPrimitive,
    IntegratorConfig, SamplerConfig, SceneDescription, ShapeRecord, Sphere,
    TriangleMesh,
)


def _scene():
    floor = HostPrimitive(
        shape=ShapeRecord(mesh=TriangleMesh(
            p=np.array([[-5, -1, -5], [5, -1, -5], [5, -1, 5], [-5, -1, 5]], float),
            indices=np.array([[0, 2, 1], [0, 3, 2]], np.int32))),
        material=HostMaterial(kind="matte", params={"Kd": ("const", np.array([0.6, 0.5, 0.4]))}),
    )
    ball = HostPrimitive(
        shape=ShapeRecord(sphere=Sphere(object_to_world=Transform.identity(), radius=0.7)),
        material=HostMaterial(kind="plastic", params={}),
    )
    return SceneDescription(
        primitives=[floor, ball],
        lights=[HostLight(kind="point", from_point=np.array([2.0, 4.0, 2.0]),
                          to_point=np.zeros(3), intensity=np.array([30.0, 28.0, 25.0]))],
        camera=CameraConfig(kind="perspective",
                            camera_to_world=Transform.look_at([0, 1.5, 4], [0, 0, 0], [0, 1, 0]),
                            fov=40.0),
        film=FilmConfig(x_resolution=24, y_resolution=16),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=8),
        integrator=IntegratorConfig(kind="path", max_depth=4),
    )


def test_render_bit_exact_rerun():
    a = np.asarray(render(_scene(), spp=8))
    b = np.asarray(render(_scene(), spp=8))
    assert a.shape == b.shape
    assert np.array_equal(a, b), "fixed-seed renders are not bit-exact"
    assert np.isfinite(a).all() and a.max() > 0
