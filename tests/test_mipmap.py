"""MIPMap pyramid + filtered lookup tests (mirrors mipmap.rs behavior)."""
import numpy as np

import jax.numpy as jnp

from pbrt_tpu.device.mipmap import build_pyramid, lookup_ewa, lookup_trilinear


def test_pyramid_shapes_and_mean():
    img = np.random.RandomState(0).rand(64, 128, 3).astype(np.float32)
    pyr = build_pyramid(img)
    assert pyr[0].shape == (64, 128, 3)
    assert pyr[-1].shape == (1, 1, 3)
    assert len(pyr) == 8  # 128 -> 1 is 7 halvings
    # box-filter chain preserves the mean
    np.testing.assert_allclose(pyr[-1][0, 0], img.mean(axis=(0, 1)), rtol=1e-4)


def test_pyramid_resamples_npot():
    img = np.ones((48, 100, 3), np.float32) * 0.25
    pyr = build_pyramid(img)
    assert pyr[0].shape == (64, 128, 3)
    np.testing.assert_allclose(pyr[0], 0.25, atol=1e-5)


def test_trilinear_wide_width_gives_average():
    img = np.zeros((32, 32, 3), np.float32)
    img[:, :16] = 1.0  # half white, half black -> mean 0.5
    pyr = [jnp.asarray(l) for l in build_pyramid(img)]
    u = jnp.asarray([0.5, 0.25], jnp.float32)
    v = jnp.asarray([0.5, 0.5], jnp.float32)
    wide = jnp.asarray([1.0, 1.0], jnp.float32)
    out = np.asarray(lookup_trilinear(pyr, u, v, wide))
    np.testing.assert_allclose(out, 0.5, atol=1e-3)
    narrow = jnp.asarray([1e-6, 1e-6], jnp.float32)
    out2 = np.asarray(lookup_trilinear(pyr, u, v, narrow))
    # narrow width reads the finest level: u=0.25 is in the white half
    assert out2[1].mean() > 0.9


def test_ewa_matches_trilinear_isotropic():
    img = np.random.RandomState(1).rand(32, 32, 3).astype(np.float32)
    pyr = [jnp.asarray(l) for l in build_pyramid(img)]
    u = jnp.asarray(np.linspace(0.1, 0.9, 8), jnp.float32)
    v = jnp.asarray(np.linspace(0.2, 0.8, 8), jnp.float32)
    w = jnp.full(8, 0.1, jnp.float32)
    duv0 = jnp.stack([w * 0.5, jnp.zeros(8)], axis=-1)
    duv1 = jnp.stack([jnp.zeros(8), w * 0.5], axis=-1)
    a = np.asarray(lookup_trilinear(pyr, u, v, w))
    b = np.asarray(lookup_ewa(pyr, u, v, duv0, duv1))
    # both should land in the same level neighborhood: loose agreement
    assert np.abs(a - b).mean() < 0.15


def test_textured_floor_renders_with_differentials():
    """e2e: imagemap + MIPMap path through the integrator (no NaN, horizon
    converges toward the texture mean under a constant env light)."""
    from pbrt_tpu.core.transform import Transform
    from pbrt_tpu.render import render
    from pbrt_tpu.scene.host import (
        CameraConfig, FilmConfig, HostLight, HostMaterial, HostPrimitive,
        HostTexture, IntegratorConfig, SamplerConfig, SceneDescription,
        ShapeRecord, TriangleMesh,
    )

    checker = np.zeros((16, 16, 3), np.float32)
    checker[::2, ::2] = 1.0
    checker[1::2, 1::2] = 1.0
    tex = HostTexture(kind="imagemap", image=checker, uscale=200.0, vscale=200.0)
    mesh = TriangleMesh(
        p=np.array([[-500, 0, -500], [500, 0, -500], [500, 0, 500], [-500, 0, 500]], np.float64),
        indices=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
        uv=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64),
    )
    mat = HostMaterial(kind="matte", params={"Kd": ("texture", tex)})
    desc = SceneDescription(
        primitives=[HostPrimitive(shape=ShapeRecord(mesh=mesh), material=mat)],
        lights=[HostLight(kind="infinite", intensity=np.array([1.0, 1.0, 1.0]))],
        camera=CameraConfig(kind="perspective", camera_to_world=Transform.look_at([0, 2, 0], [0, 1.5, -10], [0, 1, 0]), fov=50.0),
        film=FilmConfig(x_resolution=16, y_resolution=12),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=8),
        integrator=IntegratorConfig(kind="path", max_depth=2),
    )
    img = render(desc, spp=8)
    assert np.isfinite(img).all()
    # far-floor rows (middle of image) should sit near the filtered mean
    far_rows = img[5:7, :, 0]
    floor_mask = far_rows > 0.01
    if floor_mask.sum() > 4:
        vals = far_rows[floor_mask]
        assert 0.2 < vals.mean() < 0.8
