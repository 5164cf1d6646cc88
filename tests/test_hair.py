"""Hair BSDF tests: white furnace, pdf normalization, sampling consistency.

Kernel-level mirrors of the classic pbrt hair tests against
src/materials/hair.rs (HairBSDF): with sigma_a = 0 the fiber conserves
energy, the pdf integrates to 1 over the sphere, and the importance
sampler agrees with f/pdf.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from pbrt_tpu.device.hair import hair_f, hair_pdf, hair_sample

F32 = jnp.float32


def _hair_data(n, sigma_a=(0.0, 0.0, 0.0), eta=1.55, beta_m=0.3, beta_n=0.3, alpha=0.0, h=0.3):
    d = np.zeros((n, 14), np.float32)
    d[:, 0:3] = sigma_a
    d[:, 3] = eta
    d[:, 9] = beta_m
    d[:, 10] = beta_n
    d[:, 12] = alpha
    d[:, 13] = h
    return jnp.asarray(d)


def _sphere_dirs(n, seed):
    r = np.random.RandomState(seed)
    z = r.uniform(-1, 1, n)
    phi = r.uniform(0, 2 * np.pi, n)
    s = np.sqrt(np.maximum(1 - z * z, 0))
    return jnp.asarray(np.stack([r.uniform(-1, 1, n), s * np.cos(phi), z], -1), F32)


def _wo(n, seed=3):
    r = np.random.RandomState(seed)
    st = r.uniform(-0.7, 0.7, n)
    ct = np.sqrt(1 - st * st)
    ph = r.uniform(0, 2 * np.pi, n)
    return jnp.asarray(np.stack([st, ct * np.cos(ph), ct * np.sin(ph)], -1), F32)


def _uniform_sphere(n, seed):
    r = np.random.RandomState(seed)
    z = 1 - 2 * r.rand(n)
    phi = 2 * np.pi * r.rand(n)
    s = np.sqrt(np.maximum(1 - z * z, 0))
    # hair frame: x is the fiber axis; any parameterization works for MC
    return jnp.asarray(np.stack([z, s * np.cos(phi), s * np.sin(phi)], -1), F32)


@pytest.mark.parametrize("beta_m,beta_n", [(0.3, 0.4), (0.6, 0.3)])
def test_hair_white_furnace(beta_m, beta_n):
    """sigma_a=0 fiber conserves energy: int f |cos| dw = 1 (pbrt
    WhiteFurnace test over hair.rs f())."""
    n = 200000
    wo = jnp.broadcast_to(jnp.asarray([0.2, 0.9798, 0.0], F32), (n, 3))
    wi = _uniform_sphere(n, 5)
    data = _hair_data(n, beta_m=beta_m, beta_n=beta_n, h=0.3)
    f = np.asarray(hair_f(data, wo, wi))
    est = (f.mean(axis=-1) * np.abs(np.asarray(wi[:, 2]))).mean() * 4.0 * np.pi
    np.testing.assert_allclose(est, 1.0, rtol=0.05)


def test_hair_pdf_normalized():
    """int pdf dw = 1 over the sphere."""
    n = 200000
    wo = jnp.broadcast_to(jnp.asarray([-0.4, 0.6, 0.6928], F32), (n, 3))
    wi = _uniform_sphere(n, 9)
    data = _hair_data(n, sigma_a=(0.5, 0.8, 1.4), beta_m=0.4, beta_n=0.4, h=-0.5)
    pdf = np.asarray(hair_pdf(data, wo, wi))
    np.testing.assert_allclose(pdf.mean() * 4.0 * np.pi, 1.0, rtol=0.05)


def test_hair_sample_matches_pdf_and_energy():
    """Sampled wi: E[f |cos| / pdf] = 1 for sigma_a=0 (pbrt
    SamplingConsistency), and hair_pdf(wi_sampled) is finite/positive."""
    n = 100000
    r = np.random.RandomState(17)
    wo = jnp.broadcast_to(jnp.asarray([0.35, 0.936749, 0.0], F32), (n, 3))
    data = _hair_data(n, beta_m=0.4, beta_n=0.5, h=0.2, alpha=2.0)
    hs = hair_sample(data, wo, jnp.asarray(r.rand(n), F32), jnp.asarray(r.rand(n), F32))
    wi = hs["wi"]
    # directions are unit
    np.testing.assert_allclose(np.linalg.norm(np.asarray(wi), axis=-1), 1.0, atol=1e-4)
    f = np.asarray(hair_f(data, wo, wi))
    pdf = np.asarray(hair_pdf(data, wo, wi))
    ok = pdf > 1e-6
    assert ok.mean() > 0.99
    est = np.where(ok[:, None], f * np.abs(np.asarray(wi[:, 2]))[:, None] / np.maximum(pdf, 1e-6)[:, None], 0.0)
    np.testing.assert_allclose(est.mean(axis=0), 1.0, rtol=0.06)


def test_hair_absorption_darkens():
    """Higher sigma_a -> lower TT/TRT energy (monotonic in absorption)."""
    n = 100000
    wo = jnp.broadcast_to(jnp.asarray([0.1, 0.99499, 0.0], F32), (n, 3))
    wi = _uniform_sphere(n, 21)
    e = []
    for sa in (0.1, 1.0, 4.0):
        data = _hair_data(n, sigma_a=(sa, sa, sa), beta_m=0.4, beta_n=0.4, h=0.0)
        f = np.asarray(hair_f(data, wo, wi))
        e.append((f.mean(axis=-1) * np.abs(np.asarray(wi[:, 2]))).mean() * 4 * np.pi)
    assert e[0] > e[1] > e[2]
    assert e[0] < 1.0  # some energy absorbed already


def test_hair_material_end_to_end():
    """hair material on a curve renders finite, non-black, and darker with
    stronger melanin concentration (host param pipeline + device lobe)."""
    from pbrt_tpu.core.transform import Transform
    from pbrt_tpu.render import render
    from pbrt_tpu.scene.host import (
        CameraConfig, FilmConfig, HostLight, HostMaterial, HostPrimitive,
        IntegratorConfig, SamplerConfig, SceneDescription, ShapeRecord,
    )
    from pbrt_tpu.scene.tessellate import tessellate_curve

    def scene(mat):
        # the static ribbon frame puts the strip width along z here, so the
        # face normal is in the xy-plane: view + light from +y
        cp = [[-1, 0, 0], [-0.3, 0.6, 0], [0.3, -0.6, 0], [1, 0, 0]]
        mesh = tessellate_curve(Transform.identity(), cp, 0.4, 0.4, "flat")
        prim = HostPrimitive(shape=ShapeRecord(mesh=mesh), material=mat)
        return SceneDescription(
            primitives=[prim],
            lights=[HostLight(kind="distant", from_point=np.array([0.0, 5.0, 1.0]), to_point=np.zeros(3), intensity=np.array([4.0, 4.0, 4.0]))],
            camera=CameraConfig(kind="perspective", camera_to_world=Transform.look_at([0, 3, 0], [0, 0, 0], [0, 0, 1]), fov=45.0),
            film=FilmConfig(x_resolution=16, y_resolution=12),
            sampler=SamplerConfig(kind="random", pixel_samples=16),
            integrator=IntegratorConfig(kind="path", max_depth=3),
        )

    img_light = render(scene(HostMaterial(kind="hair", params={"eumelanin": ("const", 0.3)})), spp=16)
    img_dark = render(scene(HostMaterial(kind="hair", params={"eumelanin": ("const", 8.0)})), spp=16)
    assert np.isfinite(img_light).all() and np.isfinite(img_dark).all()
    assert img_light.mean() > 0.005
    assert img_light.mean() > img_dark.mean()
