"""Light-selection distribution tests (lightdistrib.rs strategies).

"power" selection must leave the estimator unbiased (same image as
"uniform", lower variance when light powers are skewed)."""
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


def _scene(strategy: str, spp: int):
    mesh = TriangleMesh(
        p=np.array([[-10, 0, -10], [10, 0, -10], [10, 0, 10], [-10, 0, 10]], np.float64),
        indices=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
    )
    floor = HostPrimitive(shape=ShapeRecord(mesh=mesh), material=HostMaterial(kind="matte", params={"Kd": ("const", np.full(3, 0.6))}))
    # strongly skewed powers: one bright, three dim
    lights = [HostLight(kind="point", from_point=np.array([0.0, 4.0, 0.0]), to_point=np.zeros(3), intensity=np.array([40.0, 40.0, 40.0]))]
    for i in range(3):
        lights.append(HostLight(kind="point", from_point=np.array([3.0 - 3 * i, 2.0, 2.0]), to_point=np.zeros(3), intensity=np.full(3, 0.05)))
    return SceneDescription(
        primitives=[floor],
        lights=lights,
        camera=CameraConfig(kind="perspective", camera_to_world=Transform.look_at([0, 6, 8], [0, 0, 0], [0, 1, 0]), fov=40.0),
        film=FilmConfig(x_resolution=12, y_resolution=10),
        sampler=SamplerConfig(kind="random", pixel_samples=spp),
        integrator=IntegratorConfig(kind="path", max_depth=2, light_strategy=strategy),
    )


def test_power_strategy_unbiased_and_lower_variance():
    ref = render(_scene("uniform", 512), spp=512)
    img_p = render(_scene("power", 64), spp=64)
    img_u = render(_scene("uniform", 64), spp=64)
    lit = ref[:, :, 0] > 0.01
    assert lit.sum() > 20
    # unbiased: both estimators agree with the high-spp reference
    np.testing.assert_allclose(img_p[lit].mean(), ref[lit].mean(), rtol=0.05)
    # variance: power selection concentrates samples on the bright light
    err_p = np.abs(img_p[lit] - ref[lit]).mean()
    err_u = np.abs(img_u[lit] - ref[lit]).mean()
    assert err_p <= err_u * 1.05, f"power err {err_p} vs uniform err {err_u}"
