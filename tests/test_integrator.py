"""End-to-end integrator correctness against analytic ground truths.

These are the golden-value tests the reference lacks (SURVEY.md §4
implication): tiny scenes where the transport solution is known in closed
form validate the full camera->intersect->shade->NEE->film chain.
"""
import numpy as np
import pytest

from pbrt_tpu.core.transform import Transform
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
    Sphere,
    TriangleMesh,
)
from pbrt_tpu.render import render


def _film(w=24, h=16):
    return FilmConfig(x_resolution=w, y_resolution=h)


def _cam_looking_down():
    # camera at (0, 5, 0) looking at origin (down -y)
    return CameraConfig(kind="perspective", camera_to_world=Transform.look_at([0, 5, 0], [0, 0, 0], [0, 0, 1]), fov=40.0)


def _floor(kd=0.6):
    mesh = TriangleMesh(
        p=np.array([[-50, 0, -50], [50, 0, -50], [50, 0, 50], [-50, 0, 50]], np.float64),
        indices=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
    )
    mat = HostMaterial(kind="matte", params={"Kd": ("const", np.array([kd, kd, kd]))})
    return HostPrimitive(shape=ShapeRecord(mesh=mesh), material=mat)


def test_empty_scene_env_light():
    """No geometry + constant infinite light: every pixel = L exactly."""
    desc = SceneDescription(
        primitives=[],
        lights=[HostLight(kind="infinite", intensity=np.array([0.7, 0.8, 0.9]))],
        camera=_cam_looking_down(),
        film=_film(),
        sampler=SamplerConfig(kind="random", pixel_samples=2),
        integrator=IntegratorConfig(kind="path", max_depth=2),
    )
    img = render(desc, spp=2)
    np.testing.assert_allclose(img[0, 0], [0.7, 0.8, 0.9], rtol=1e-4)
    np.testing.assert_allclose(img[-1, -1], [0.7, 0.8, 0.9], rtol=1e-4)


def test_matte_floor_distant_light_analytic():
    """Lambertian floor, normal-incidence distant light: L = Kd * E / pi."""
    kd = 0.6
    e = 2.0
    desc = SceneDescription(
        primitives=[_floor(kd)],
        lights=[
            HostLight(kind="distant", from_point=np.array([0.0, 1.0, 0.0]), to_point=np.zeros(3), intensity=np.array([e, e, e]))
        ],
        camera=_cam_looking_down(),
        film=_film(),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=4),
        integrator=IntegratorConfig(kind="path", max_depth=2),
    )
    img = render(desc, spp=4)
    expect = kd * e / np.pi
    center = img[8, 12]
    np.testing.assert_allclose(center, expect, rtol=5e-3)


def test_direct_lighting_matches_path_first_bounce():
    """directlighting and path agree on a diffuse-only single-bounce scene."""
    desc = SceneDescription(
        primitives=[_floor()],
        lights=[HostLight(kind="point", from_point=np.array([0.0, 3.0, 0.0]), to_point=np.zeros(3), intensity=np.array([5.0, 5.0, 5.0]))],
        camera=_cam_looking_down(),
        film=_film(16, 12),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=4),
        integrator=IntegratorConfig(kind="path", max_depth=2),
    )
    img_path = render(desc, spp=4)
    desc2 = SceneDescription(**{**desc.__dict__})
    desc2.integrator = IntegratorConfig(kind="directlighting", max_depth=2, strategy="all")
    img_dl = render(desc2, spp=4)
    np.testing.assert_allclose(img_path, img_dl, rtol=2e-2, atol=1e-3)


def test_point_light_inverse_square():
    """Point light: irradiance falls off with 1/r^2 (lights/point.rs)."""
    kd = 0.5
    i = 4.0
    h = 2.0
    desc = SceneDescription(
        primitives=[_floor(kd)],
        lights=[HostLight(kind="point", from_point=np.array([0.0, h, 0.0]), to_point=np.zeros(3), intensity=np.array([i, i, i]))],
        camera=_cam_looking_down(),
        film=_film(17, 13),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=4),
        integrator=IntegratorConfig(kind="path", max_depth=2),
    )
    img = render(desc, spp=4)
    # directly under the light: L = Kd/pi * I * cos(0) / h^2
    expect = kd / np.pi * i / (h * h)
    center = img[6, 8]
    np.testing.assert_allclose(center, expect, rtol=2e-2)


def test_area_light_sphere_converges_to_point():
    """A tiny emitting sphere behaves like a point light of I = L * A / 4pi...
    Validates area sampling + MIS pipeline end-to-end (diffuse.rs)."""
    r_sph = 0.05
    L_e = 400.0
    # sphere off the camera axis so the center pixel sees the floor, not the
    # emitter itself
    c_sph = np.array([1.0, 2.0, 1.0])
    emit = HostLight(kind="area", intensity=np.array([L_e, L_e, L_e]), two_sided=False)
    sph = HostPrimitive(
        shape=ShapeRecord(sphere=Sphere(object_to_world=Transform.translate(c_sph), radius=r_sph)),
        material=HostMaterial(kind="matte", params={"Kd": ("const", np.array([0.0, 0.0, 0.0]))}),
        area_light=emit,
    )
    kd = 0.5
    desc = SceneDescription(
        primitives=[_floor(kd), sph],
        lights=[],
        camera=_cam_looking_down(),
        film=_film(17, 13),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=32),
        integrator=IntegratorConfig(kind="path", max_depth=2),
    )
    img = render(desc, spp=32)
    # small-sphere limit at the floor origin: E = L * pi r^2 * cos / d^2
    d2 = float(c_sph @ c_sph)
    cos_s = c_sph[1] / np.sqrt(d2)
    expect = kd / np.pi * (L_e * np.pi * r_sph * r_sph) * cos_s / d2
    center = img[6, 8]
    np.testing.assert_allclose(center, expect, rtol=0.1)


def test_mirror_reflects_env():
    """Mirror floor under constant env: pixel = 0.9 * L (one specular bounce)."""
    mesh = TriangleMesh(
        p=np.array([[-50, 0, -50], [50, 0, -50], [50, 0, 50], [-50, 0, 50]], np.float64),
        indices=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
    )
    mat = HostMaterial(kind="mirror", params={"Kr": ("const", np.array([0.9, 0.9, 0.9]))})
    desc = SceneDescription(
        primitives=[HostPrimitive(shape=ShapeRecord(mesh=mesh), material=mat)],
        lights=[HostLight(kind="infinite", intensity=np.array([1.0, 1.0, 1.0]))],
        camera=_cam_looking_down(),
        film=_film(12, 8),
        sampler=SamplerConfig(kind="random", pixel_samples=2),
        integrator=IntegratorConfig(kind="path", max_depth=3),
    )
    img = render(desc, spp=2)
    np.testing.assert_allclose(img[4, 6], 0.9, rtol=1e-3)


def test_checkpoint_resume(tmp_path):
    """Interrupted render resumes from its snapshot bit-identically."""
    desc = SceneDescription(
        primitives=[_floor(0.5)],
        lights=[HostLight(kind="distant", from_point=np.array([0.0, 1.0, 0.0]), to_point=np.zeros(3), intensity=np.array([2.0, 2.0, 2.0]))],
        camera=_cam_looking_down(),
        film=_film(8, 6),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=8),
        integrator=IntegratorConfig(kind="path", max_depth=2),
    )
    ck = str(tmp_path / "film.ckpt.npz")
    img_full = render(desc, spp=8)
    # simulate preemption: checkpoint every 4, then resume with same file
    from pbrt_tpu.scene.builder import compile_scene
    from pbrt_tpu.render import render_compiled
    import numpy as _np

    cs = compile_scene(desc)
    render_compiled(cs, spp=8, checkpoint_path=ck, checkpoint_every=4)
    # rewind: reload checkpoint at sample 4 by truncating (re-save state at 4)
    data = dict(_np.load(ck))
    assert int(data["next_sample"]) == 8
    # write a mid-way checkpoint and resume
    half = render_compiled(cs, spp=4)  # first half only, for reference
    _np.savez(ck.replace(".npz", ""), acc=data["acc"] * 0, wacc=data["wacc"] * 0, next_sample=0, spp_total=8, seed=0)
    img_resumed = render_compiled(cs, spp=8, checkpoint_path=ck, checkpoint_every=100)
    np.testing.assert_allclose(img_resumed, img_full, atol=1e-6)


def test_realistic_camera_renders():
    """Realistic lens camera: rays reach the scene and form an image."""
    desc = SceneDescription(
        primitives=[_floor(0.6)],
        lights=[HostLight(kind="infinite", intensity=np.array([1.0, 1.0, 1.0]))],
        camera=CameraConfig(
            kind="realistic",
            camera_to_world=Transform.look_at([0, 5, 0], [0, 0, 0], [0, 0, 1]),
            focus_distance=5.0,
            aperture_diameter=6.0,
        ),
        film=_film(16, 12),
        sampler=SamplerConfig(kind="random", pixel_samples=8),
        integrator=IntegratorConfig(kind="path", max_depth=2),
    )
    img = render(desc, spp=8)
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # something came through the lens


def test_realistic_exit_pupil_table():
    """64 radial exit-pupil buckets (realistic.rs:91) + the simple_weighting
    area factor: the on-axis bucket weighs cos^4 exactly (area ratio 1)."""
    from pbrt_tpu.device.camera import make_camera
    from pbrt_tpu.device.realistic import make_realistic, realistic_generate_rays

    cfg = CameraConfig(
        kind="realistic",
        camera_to_world=Transform.look_at([0, 5, 0], [0, 0, 0], [0, 0, 1]),
        focus_distance=5.0,
        aperture_diameter=6.0,
    )
    film = _film(16, 12)
    cam = make_camera(cfg, film)
    rcam = make_realistic(cfg, film)
    pupil = np.asarray(rcam["pupil_bounds"])
    assert pupil.shape == (64, 4)
    areas = (pupil[:, 1] - pupil[:, 0]) * (pupil[:, 3] - pupil[:, 2])
    assert (areas > 0).all()
    # pupil shrinks (or at worst holds) toward the film rim for this lens
    assert areas[-1] <= areas[0] * 1.05
    # center-of-film rays: bucket 0, so weight == cos^4 (area ratio 1)
    import jax.numpy as jnp

    n = 64
    px = jnp.full((n,), film.x_resolution / 2.0, jnp.float32)
    py = jnp.full((n,), film.y_resolution / 2.0, jnp.float32)
    u = jnp.linspace(0.05, 0.95, n)
    o, d, w = realistic_generate_rays(cam, rcam, px, py, u, u[::-1])
    w = np.asarray(w)
    assert (w[np.asarray(w) > 0] <= 1.0 + 1e-5).all()
    assert (w > 0).sum() > n // 4  # on-axis pupil mostly unvignetted
