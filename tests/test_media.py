"""Participating-media tests: HG phase, homogeneous sampling, volpath e2e.

Kernel-level mirrors of tests/hg.rs (normalization + sampling consistency)
plus end-to-end analytic checks of the volpath integrator.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from pbrt_tpu.device.media import hg_p, hg_sample, medium_sample, medium_tr
from pbrt_tpu.scene.arrays import SceneStatic


def test_hg_normalization():
    """Integral of p over the sphere = 1 (tests/hg.rs). Integrate over
    mu = cos(theta) with a dense midpoint rule (the g=0.9 peak is sharp)."""
    n = 200000
    mu = -1.0 + (np.arange(n) + 0.5) * (2.0 / n)
    for g in (-0.7, 0.0, 0.4, 0.9):
        p = np.asarray(hg_p(jnp.asarray(mu, jnp.float32), g))
        integral = 2.0 * np.pi * p.sum() * (2.0 / n)
        np.testing.assert_allclose(integral, 1.0, rtol=5e-3)


def test_hg_sample_matches_pdf():
    """Sampled directions' pdf equals hg_p(dot(wo, wi)); mean cos matches g."""
    R = 20000
    r = np.random.RandomState(5)
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (R, 3))
    for g in (-0.5, 0.3, 0.8):
        wi, pdf = hg_sample(wo, jnp.full(R, g, jnp.float32), jnp.asarray(r.rand(R), jnp.float32), jnp.asarray(r.rand(R), jnp.float32))
        cosw = np.asarray(jnp.sum(wo * wi, axis=-1))
        p_direct = np.asarray(hg_p(jnp.asarray(cosw), g))
        np.testing.assert_allclose(np.asarray(pdf), p_direct, rtol=1e-3, atol=1e-6)
        # mean cosine of the HG phase (measured from wo) is -g
        np.testing.assert_allclose(cosw.mean(), -g, atol=0.02)


def _homo_scene_arrays(sigma_a, sigma_s, g=0.0):
    from pbrt_tpu.scene.builder import compile_scene
    from pbrt_tpu.scene.host import HostMedium, SceneDescription

    desc = SceneDescription()
    desc.media = {"fog": HostMedium(kind="homogeneous", sigma_a=np.asarray(sigma_a, float), sigma_s=np.asarray(sigma_s, float), g=g)}
    desc.camera_medium = "fog"
    return compile_scene(desc)


def test_homogeneous_tr():
    cs = _homo_scene_arrays([0.5, 1.0, 2.0], [0.0, 0.0, 0.0])
    R = 4
    med = jnp.zeros(R, jnp.int32)
    o = jnp.zeros((R, 3), jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (R, 3))
    tr = np.asarray(medium_tr(cs.arrays, cs.static, med, o, d, jnp.full(R, 2.0, jnp.float32), jnp.uint32(1)))
    np.testing.assert_allclose(tr[0], np.exp(-np.array([0.5, 1.0, 2.0]) * 2.0), rtol=1e-5)


def test_homogeneous_sample_unbiased_transmittance():
    """E[pass-through weight] over samples = Tr (homogeneous.rs estimator)."""
    cs = _homo_scene_arrays([0.3, 0.3, 0.3], [0.4, 0.4, 0.4])
    R = 50000
    med = jnp.zeros(R, jnp.int32)
    o = jnp.zeros((R, 3), jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (R, 3))
    t_surf = jnp.full(R, 1.5, jnp.float32)
    ms = medium_sample(cs.arrays, cs.static, med, o, d, t_surf, jnp.uint32(123))
    w = np.asarray(ms["weight"])
    hitm = np.asarray(ms["hit_medium"])
    # pass-through estimator: mean over all samples of weight*1{pass}
    est_pass = (w * ~hitm[:, None]).mean(axis=0)
    np.testing.assert_allclose(est_pass, np.exp(-0.7 * 1.5), rtol=0.02)
    # in-scatter fraction estimator integrates sigma_s * Tr dt
    est_scat = (w * hitm[:, None]).mean(axis=0)
    expect = 0.4 / 0.7 * (1.0 - np.exp(-0.7 * 1.5))
    np.testing.assert_allclose(est_scat, expect, rtol=0.02)


def test_volpath_absorbing_fog_analytic():
    """Camera in absorbing fog viewing an emissive floor: L = Le*exp(-sa*d)."""
    from pbrt_tpu.core.transform import Transform
    from pbrt_tpu.render import render
    from pbrt_tpu.scene.host import (
        CameraConfig,
        FilmConfig,
        HostLight,
        HostMaterial,
        HostMedium,
        HostPrimitive,
        IntegratorConfig,
        SamplerConfig,
        SceneDescription,
        ShapeRecord,
        TriangleMesh,
    )

    mesh = TriangleMesh(
        p=np.array([[-50, 0, -50], [50, 0, -50], [50, 0, 50], [-50, 0, 50]], np.float64),
        indices=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
    )
    emit = HostLight(kind="area", intensity=np.array([1.0, 1.0, 1.0]), two_sided=False)
    floor = HostPrimitive(
        shape=ShapeRecord(mesh=mesh),
        material=HostMaterial(kind="matte", params={"Kd": ("const", np.zeros(3))}),
        area_light=emit,
    )
    sa = 0.2
    desc = SceneDescription(
        primitives=[floor],
        lights=[],
        camera=CameraConfig(kind="perspective", camera_to_world=Transform.look_at([0, 5, 0], [0, 0, 0], [0, 0, 1]), fov=40.0),
        film=FilmConfig(x_resolution=8, y_resolution=6),
        sampler=SamplerConfig(kind="random", pixel_samples=512),
        integrator=IntegratorConfig(kind="volpath", max_depth=3),
        media={"fog": HostMedium(kind="homogeneous", sigma_a=np.full(3, sa), sigma_s=np.zeros(3))},
        camera_medium="fog",
    )
    img = render(desc, spp=512)
    # average the 4 center pixels: the estimator is binomial with
    # p = exp(-sa*t); 2048 samples -> std ~1.5%
    center = img[2:4, 3:5].mean(axis=(0, 1))
    np.testing.assert_allclose(center, np.exp(-sa * 5.0), rtol=0.05)


def test_subsurface_tabulated_bssrdf():
    """Subsurface material: the tabulated beam-diffusion BSSRDF (bssrdf.rs
    TabulatedBSSRDF) makes a front-lit translucent sphere glow diffusely —
    camera rays transmit through the interface, teleport to a sampled exit
    point, and pick up NEE there."""
    from pbrt_tpu.core.transform import Transform
    from pbrt_tpu.render import render
    from pbrt_tpu.scene.host import (
        CameraConfig, FilmConfig, HostLight, HostMaterial, HostPrimitive,
        IntegratorConfig, SamplerConfig, SceneDescription, ShapeRecord, Sphere,
    )

    mat = HostMaterial(kind="subsurface", params={
        "sigma_a": ("const", np.array([0.02, 0.02, 0.02])),
        "sigma_s": ("const", np.array([4.0, 4.0, 4.0])),
        "eta": ("const", 1.33),
    })
    ball = HostPrimitive(shape=ShapeRecord(sphere=Sphere(object_to_world=Transform.identity(), radius=1.0)), material=mat)
    desc = SceneDescription(
        primitives=[ball],
        lights=[HostLight(kind="point", from_point=np.array([2.0, 2.0, 4.0]), to_point=np.zeros(3), intensity=np.array([60.0, 60.0, 60.0]))],
        camera=CameraConfig(kind="perspective", camera_to_world=Transform.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]), fov=35.0),
        film=FilmConfig(x_resolution=12, y_resolution=12),
        sampler=SamplerConfig(kind="random", pixel_samples=48),
        integrator=IntegratorConfig(kind="path", max_depth=6),
    )
    img = render(desc, spp=48)
    assert np.isfinite(img).all()
    center = img[5:7, 5:7].mean()
    assert center > 0.01, f"no subsurface response on the lit sphere: {center}"
    # energy sanity: diffusion cannot amplify (loose bound incl. specular)
    assert img.max() < 60.0
