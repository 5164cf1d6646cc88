"""Visible-solid-angle cone sampling for full-sphere area lights
(sphere.rs sample_interaction with a reference point).

Checks, against the analytic irradiance of a uniformly emissive sphere
(E = L * pi * sin^2(theta_max) for a receiver facing the center):
- the cone estimator is unbiased and its pdf matches pdf_li_area_hit,
- it has (much) lower variance than uniform-area sampling,
- a full path render with the MIS pickup stays consistent (the two
  densities partition unity together).
"""
import numpy as np

import jax.numpy as jnp

from pbrt_tpu.core.transform import Transform
from pbrt_tpu.scene.builder import compile_scene
from pbrt_tpu.scene.host import (
    CameraConfig, FilmConfig, HostLight, HostMaterial, HostPrimitive,
    IntegratorConfig, SamplerConfig, SceneDescription, ShapeRecord, Sphere,
    TriangleMesh,
)


def _sphere_light_scene(spp=16):
    emit = HostLight(kind="area", intensity=np.array([5.0, 5.0, 5.0]))
    ball = HostPrimitive(
        shape=ShapeRecord(sphere=Sphere(object_to_world=Transform.translate([0.0, 2.0, 0.0]), radius=0.4)),
        material=HostMaterial(kind="matte", params={"Kd": ("const", np.zeros(3))}),
        area_light=emit,
    )
    floor = HostPrimitive(
        shape=ShapeRecord(mesh=TriangleMesh(
            p=np.array([[-8, 0, -8], [8, 0, -8], [8, 0, 8], [-8, 0, 8]], np.float64),
            indices=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
        )),
        material=HostMaterial(kind="matte", params={"Kd": ("const", np.array([0.7, 0.7, 0.7]))}),
    )
    return SceneDescription(
        primitives=[floor, ball],
        lights=[],
        camera=CameraConfig(kind="perspective", camera_to_world=Transform.look_at([0, 2.5, 6], [0, 0.5, 0], [0, 1, 0]), fov=50.0),
        film=FilmConfig(x_resolution=40, y_resolution=30),
        sampler=SamplerConfig(kind="random", pixel_samples=spp),
        integrator=IntegratorConfig(kind="path", max_depth=2),
    )


def test_cone_sampling_unbiased_and_low_variance():
    from pbrt_tpu.device.lights import pdf_li_area_hit, sample_li

    cs = compile_scene(_sphere_light_scene())
    sa, static = cs.arrays, cs.static
    N = 8192
    rs = np.random.RandomState(3)
    p_ref = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0], jnp.float32), (N, 3))
    n_recv = np.array([0.0, 1.0, 0.0])
    lid = jnp.zeros(N, jnp.int32)
    u1 = jnp.asarray(rs.rand(N), jnp.float32)
    u2 = jnp.asarray(rs.rand(N), jnp.float32)

    # analytic: center at (0,2,0), r=0.4, receiver at origin facing +y
    d = 2.0
    r = 0.4
    sin2 = (r / d) ** 2
    E_exact = 5.0 * np.pi * sin2  # receiver normal points at the center

    def estimate(cone):
        ls = sample_li(sa, static, lid, p_ref, u1, u2, cone_spheres=cone)
        cosr = np.maximum(np.asarray(ls["wi"]) @ n_recv, 0.0)
        w = np.asarray(ls["li"])[:, 0] * cosr / np.maximum(np.asarray(ls["pdf"]), 1e-12)
        return w

    w_cone = estimate(True)
    w_unif = estimate(False)
    assert abs(w_cone.mean() - E_exact) < 0.02 * E_exact
    assert abs(w_unif.mean() - E_exact) < 0.05 * E_exact
    # the sphere subtends a small cone: uniform-area sampling wastes half
    # its samples on the back face and spreads the rest over cos/d^2
    assert w_cone.std() < 0.5 * w_unif.std()

    # pdf_li_area_hit must return the SAME density for a bsdf-sampled ray
    ls = sample_li(sa, static, lid, p_ref, u1, u2, cone_spheres=True)
    hit_p = p_ref + ls["wi"] * ls["dist"][:, None]
    area = jnp.full(N, 4.0 * np.pi * r * r, jnp.float32)
    pdf2 = pdf_li_area_hit(sa, p_ref, hit_p, ls["n"], lid, area, cone_spheres=True)
    np.testing.assert_allclose(np.asarray(pdf2), np.asarray(ls["pdf"]), rtol=1e-4)


def test_cone_render_matches_uniform_render():
    """Full MIS path render with cone sampling must agree in the mean with
    a monkeypatched uniform-area render (both unbiased estimators)."""
    import pbrt_tpu.render as R
    from pbrt_tpu.device import lights as dlights

    desc = _sphere_light_scene(spp=48)
    cs = compile_scene(desc)
    img_cone = R.render(desc, spp=48)

    orig_sample, orig_pdf = dlights.sample_li, dlights.pdf_li_area_hit

    def sample_unif(*a, **k):
        k["cone_spheres"] = False
        return orig_sample(*a, **k)

    def pdf_unif(*a, **k):
        k["cone_spheres"] = False
        return orig_pdf(*a, **k)

    import pbrt_tpu.device.integrator as dint

    dint.sample_li = sample_unif
    dint.pdf_li_area_hit = pdf_unif
    R._WAVE_CACHE.clear()
    try:
        img_unif = R.render(desc, spp=48)
    finally:
        dint.sample_li = orig_sample
        dint.pdf_li_area_hit = orig_pdf
        R._WAVE_CACHE.clear()

    lit = img_unif.mean(axis=-1) > 1e-4
    assert lit.mean() > 0.3
    rel = abs(float(img_cone[lit].mean()) - float(img_unif[lit].mean())) / max(float(img_unif[lit].mean()), 1e-9)
    assert rel < 0.05
