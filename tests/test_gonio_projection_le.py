"""Photon emission (sample_le) from goniometric + projection lights.

Round-3 verdict hole: device/lights.sample_le covered point/spot/distant/
infinite/area only, so gonio/projection lights emitted ZERO photons in
SPPM/BDPT/MLT. Gates here:

- a goniometric light with a uniform intensity map is EXACTLY an
  isotropic point light (goniometric.rs:105 sample_le degenerates to
  point.rs's when scale() == 1), so its SPPM render must match the
  point-light SPPM render to sampling noise;
- a projection light's SPPM render must agree with the path render of
  the same scene (path uses sample_li, already golden-gated; agreement
  pins sample_le's cone pdf + screen test against it);
- compute_power must give both kinds nonzero selection weight.
"""
import numpy as np

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


def _scene(light, integrator, spp=64):
    prims = [
        _quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2], 0.7),     # floor
        _quad([-2, 0, -2], [-2, 3, -2], [2, 3, -2], [2, 0, -2], 0.6),   # back wall
    ]
    return SceneDescription(
        primitives=prims,
        lights=[light],
        camera=CameraConfig(kind="perspective", camera_to_world=Transform.look_at([0, 1.5, 5], [0, 1.0, 0], [0, 1, 0]), fov=45.0),
        film=FilmConfig(x_resolution=16, y_resolution=12),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=spp),
        integrator=integrator,
    )


_SPPM = dict(kind="sppm", max_depth=3, num_iterations=16,
             photons_per_iteration=4096, initial_radius=0.25)


def test_gonio_uniform_map_equals_point_sppm():
    import pbrt_tpu.device.sppm as sppm_mod

    sppm_mod.KMAX = 8
    pos = np.array([0.0, 2.0, 1.0])
    inten = np.array([4.0, 4.0, 4.0])
    img_pt = render(_scene(
        HostLight(kind="point", from_point=pos, to_point=np.zeros(3), intensity=inten),
        IntegratorConfig(**_SPPM)))
    gonio = HostLight(kind="goniometric",
                      light_to_world=Transform.translate(pos),
                      intensity=inten,
                      image=np.ones((8, 16, 3), np.float32))
    img_go = render(_scene(gonio, IntegratorConfig(**_SPPM)))
    assert img_go.mean() > 0.01, "gonio light emitted no photon flux"
    lit = img_pt.mean(axis=-1) > 0.05
    assert lit.sum() > 30
    ratio = img_go.mean(axis=-1)[lit] / img_pt.mean(axis=-1)[lit]
    # identical estimator modulo the image lookup -> tight band
    assert abs(np.median(ratio) - 1.0) < 0.05, f"median ratio {np.median(ratio)}"


def test_projection_sppm_matches_path():
    import pbrt_tpu.device.sppm as sppm_mod

    sppm_mod.KMAX = 8
    # projector above the floor aiming down; nonuniform slide so the screen
    # mapping (not just the cone) is exercised
    slide = np.ones((8, 8, 3), np.float32)
    slide[:, :4] *= 0.2  # dim left half
    proj = HostLight(kind="projection",
                     light_to_world=Transform.look_at([0, 2.5, 0.5], [0, 0, 0.5], [0, 0, 1]),
                     intensity=np.array([6.0, 6.0, 6.0]),
                     cone_angle=55.0,
                     image=slide)
    img_path = render(_scene(proj, IntegratorConfig(kind="path", max_depth=3), spp=64), spp=64)
    img_sppm = render(_scene(proj, IntegratorConfig(**_SPPM)))
    assert img_sppm.mean() > 0.005, "projection light emitted no photon flux"
    lit = img_path.mean(axis=-1) > 0.03
    assert lit.sum() > 20
    ratio = img_sppm.mean(axis=-1)[lit] / img_path.mean(axis=-1)[lit]
    assert abs(np.median(ratio) - 1.0) < 0.2, f"median ratio {np.median(ratio)}"
    assert abs(img_sppm[lit].mean() / img_path[lit].mean() - 1.0) < 0.2


def test_gonio_projection_power_nonzero():
    from pbrt_tpu.device.lights import compute_power
    from pbrt_tpu.scene.builder import compile_scene

    gonio = HostLight(kind="goniometric",
                      light_to_world=Transform.translate(np.array([0.0, 2.0, 1.0])),
                      intensity=np.array([4.0, 4.0, 4.0]),
                      image=np.ones((8, 16, 3), np.float32))
    proj = HostLight(kind="projection",
                     light_to_world=Transform.look_at([0, 2.5, 0.5], [0, 0, 0.5], [0, 0, 1]),
                     intensity=np.array([6.0, 6.0, 6.0]),
                     cone_angle=55.0,
                     image=np.ones((8, 8, 3), np.float32))
    desc = _scene(gonio, IntegratorConfig(kind="path", max_depth=2))
    desc.lights = [gonio, proj]
    cs = compile_scene(desc)
    p = np.asarray(compute_power(cs.arrays, cs.static))
    assert p[0] > 0, "gonio power is zero -> never selected for photons"
    assert p[1] > 0, "projection power is zero -> never selected for photons"
    # gonio with a uniform unit map is a point light: power = 4*pi*sum(I)
    assert abs(p[0] / (4 * np.pi * 12.0) - 1.0) < 1e-3
