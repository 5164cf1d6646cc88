"""Pallas persistent-megakernel parity vs the XLA persistent wavefront.

The megakernel (device/megakernel.py) reimplements trace_persistent's whole
bounce loop inside one pallas_call with baked scene constants. Same
(pixel, sample, dimension) streams, same per-sample math — images must
match the XLA path to float tolerance. Runs in Pallas interpret mode on
the CPU backend (conftest pins JAX_PLATFORMS=cpu).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pbrt_tpu.core.transform import Transform
from pbrt_tpu.scene.builder import compile_scene
from pbrt_tpu.scene.host import (
    CameraConfig, FilmConfig, HostLight, HostMaterial, HostPrimitive,
    IntegratorConfig, SamplerConfig, SceneDescription, ShapeRecord,
)


def _mini_spheres(sampler="zerotwosequence", light="distant", micro=False):
    """Tiny matte/mirror/glass + ground-quad scene (the spheres class).
    micro=True swaps in a plastic ground (lambert+GGX, Oren-Nayar off),
    a copper metal sphere, and a sigma>0 Oren-Nayar matte sphere."""
    from pbrt_tpu.scene.host import TriangleMesh

    gparams = {"Kd": ("const", np.array([0.6, 0.5, 0.4]))}
    gkind = "matte"
    if micro:
        gkind = "plastic"
        gparams = {"Kd": ("const", np.array([0.6, 0.5, 0.4])),
                   "Ks": ("const", np.array([0.4, 0.4, 0.4])),
                   "roughness": ("const", 0.2)}
    ground = HostPrimitive(
        shape=ShapeRecord(mesh=TriangleMesh(
            p=np.array([[-20, -1, -20], [20, -1, -20], [20, -1, 20], [-20, -1, 20]], np.float64),
            indices=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
            uv=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64),
        )),
        material=HostMaterial(kind=gkind, params=gparams),
    )

    from pbrt_tpu.scene.host import Sphere

    def sphere(tx, mat):
        return HostPrimitive(
            shape=ShapeRecord(sphere=Sphere(
                object_to_world=Transform.translate([tx, 0.0, 0.0]), radius=1.0)),
            material=mat,
        )

    if micro:
        mirror = sphere(-1.3, HostMaterial(kind="metal", params={"roughness": ("const", 0.08)}))
        glass = sphere(1.3, HostMaterial(kind="matte", params={
            "Kd": ("const", np.array([0.5, 0.55, 0.6])), "sigma": ("const", 20.0)}))
    else:
        mirror = sphere(-1.3, HostMaterial(kind="mirror", params={"Kr": ("const", np.array([0.9, 0.9, 0.9]))}))
        glass = sphere(1.3, HostMaterial(kind="glass", params={}))
    if light == "distant":
        lights = [HostLight(kind="distant", from_point=np.array([0.0, 10.0, 0.0]),
                            to_point=np.zeros(3), intensity=np.array([3.0, 3.0, 3.0]))]
    elif light == "spot":
        # cone aimed at the scene: the falloff band crosses the ground quad
        lights = [HostLight(kind="spot", from_point=np.array([0.0, 5.0, 3.0]),
                            to_point=np.array([0.0, -1.0, 0.0]),
                            intensity=np.array([55.0, 50.0, 45.0]),
                            cone_angle=25.0, cone_delta=15.0)]
    else:
        lights = [HostLight(kind="point", from_point=np.array([0.0, 4.0, 2.0]),
                            intensity=np.array([30.0, 28.0, 26.0]))]
    return SceneDescription(
        primitives=[ground, mirror, glass],
        lights=lights,
        camera=CameraConfig(kind="perspective",
                            camera_to_world=Transform.look_at([2, 2, 5], [0, -0.4, 0], [0, 1, 0]),
                            fov=30.0),
        film=FilmConfig(x_resolution=64, y_resolution=32),
        sampler=SamplerConfig(kind=sampler, pixel_samples=2),
        integrator=IntegratorConfig(kind="path", max_depth=5),
    )


@pytest.mark.parametrize("sampler,light", [("zerotwosequence", "distant"), ("random", "point"),
                                           ("stratified", "distant"),
                                           ("zerotwosequence", "spot"),
                                           # GGX metal/plastic + Oren-Nayar
                                           ("zerotwosequence", "micro"),
                                           ("random", "micro")])
def test_megakernel_matches_xla_persistent(sampler, light):
    desc = _mini_spheres(sampler, "point" if light == "micro" else light,
                         micro=light == "micro")
    cs = compile_scene(desc)
    W, H, spp = 64, 32, 2
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel().astype(np.int32))
    py = jnp.asarray(ys.ravel().astype(np.int32))
    pid = jnp.asarray((ys * W + xs).ravel().astype(np.uint32))

    from pbrt_tpu.render import make_persistent_fn

    os.environ["PBRT_TPU_NO_MEGAKERNEL"] = "1"
    try:
        ref_fn = make_persistent_fn(cs)
    finally:
        del os.environ["PBRT_TPU_NO_MEGAKERNEL"]
    Lr, wr, nvr = ref_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"] = "1"
    try:
        mk_fn = make_persistent_fn(cs)
    finally:
        del os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"]
    Lm, wm, nvm = mk_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    Lr, Lm = np.asarray(Lr), np.asarray(Lm)
    assert np.allclose(np.asarray(wr), np.asarray(wm))
    # vertex counts may differ by ulp-level hit decisions on a handful of rays
    assert abs(float(jnp.sum(nvr)) - float(jnp.sum(nvm))) <= 4
    diff = np.abs(Lr - Lm)
    rel = diff / (np.abs(Lr) + 1e-2)
    assert float(rel.max()) < 2e-2, (float(rel.max()), float(diff.max()))
    assert float(diff.mean()) < 1e-4


def test_megakernel_eligibility_gates():
    """Scenes outside the class must fall back (returns None)."""
    from pbrt_tpu.device.megakernel import extract_consts
    from pbrt_tpu.render import make_camera

    desc = _mini_spheres()
    desc.sampler.kind = "halton"  # global-enumeration samplers keep XLA path
    cs = compile_scene(desc)
    cam = make_camera(desc.camera, desc.film)
    icfg = {"max_depth": 5, "rr_threshold": 1.0, "light_strategy": "uniform"}
    scfg = {"kind": "halton", "spp": 2}
    fcfg = {"filter": "box", "filter_params": {}, "max_sample_luminance": float("inf")}
    assert extract_consts(cs, cam, icfg, scfg, fcfg) is None

    scfg2 = {"kind": "zerotwosequence", "spp": 2}
    assert extract_consts(cs, cam, icfg, scfg2, fcfg) is not None


def _run_pair(desc, W, H, spp):
    """(XLA image, megakernel-interpret image) for one scene."""
    cs = compile_scene(desc)
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel().astype(np.int32))
    py = jnp.asarray(ys.ravel().astype(np.int32))
    pid = jnp.asarray((ys * W + xs).ravel().astype(np.uint32))
    from pbrt_tpu.render import make_persistent_fn
    import pbrt_tpu.render as R

    os.environ["PBRT_TPU_NO_MEGAKERNEL"] = "1"
    try:
        ref_fn = make_persistent_fn(cs)
    finally:
        del os.environ["PBRT_TPU_NO_MEGAKERNEL"]
    Lr, wr, _ = ref_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"] = "1"
    try:
        mk_fn = make_persistent_fn(cs)
        tier = R.LAST_PERSISTENT_TIER
    finally:
        del os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"]
    assert tier == "brute-megakernel", tier
    Lm, wm, _ = mk_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))
    assert np.allclose(np.asarray(wr), np.asarray(wm))
    return np.asarray(Lr), np.asarray(Lm)


def test_megakernel_directlighting_matches_xla():
    """Round-5 directlighting mode: NEE at every vertex, specular-only
    continuation, no RR (integrator.rs:409-520) — exact stream parity
    with trace_persistent's directlighting branch."""
    desc = _mini_spheres("zerotwosequence", "distant")
    desc.integrator = IntegratorConfig(kind="directlighting", max_depth=5)
    Lr, Lm = _run_pair(desc, 64, 32, 2)
    diff = np.abs(Lr - Lm)
    rel = diff / (np.abs(Lr) + 1e-2)
    assert float(rel.max()) < 2e-2, (float(rel.max()), float(diff.max()))
    assert float(diff.mean()) < 1e-4


def test_megakernel_imagemap_kd():
    """Round-5 in-kernel grayscale imagemap Kd (VMEM mip atlas + ray-cone
    trilinear): the estimator paths are identical except the texture
    FILTER (XLA: EWA with camera differentials; kernel: ray-cone
    trilinear), so images agree in mean brightness, not per pixel."""
    desc = _mini_spheres("zerotwosequence", "distant")
    g = np.linspace(0.2, 0.9, 16, dtype=np.float32)
    img = np.repeat(((g[None, :] + g[:, None]) * 0.5)[:, :, None], 3, axis=2)
    from pbrt_tpu.scene.host import HostTexture

    tex = HostTexture(kind="imagemap", image=img, uscale=8.0, vscale=8.0)
    desc.primitives[0].material = HostMaterial(kind="matte", params={"Kd": ("texture", tex)})
    desc.integrator = IntegratorConfig(kind="directlighting", max_depth=4)
    Lr, Lm = _run_pair(desc, 32, 16, 2)
    assert np.isfinite(Lm).all()
    r = Lm.mean() / max(Lr.mean(), 1e-9)
    assert 0.93 < r < 1.07, r


def test_megakernel_imagemap_eligibility():
    """Colored or >128-wide imagemaps keep the XLA path."""
    from pbrt_tpu.device.megakernel import extract_consts
    from pbrt_tpu.render import make_camera
    from pbrt_tpu.scene.host import HostTexture

    icfg = {"kind": "path", "max_depth": 4, "rr_threshold": 1.0, "light_strategy": "uniform"}
    scfg = {"kind": "zerotwosequence", "spp": 2}
    fcfg = {"filter": "box", "filter_params": {}, "max_sample_luminance": float("inf")}

    colored = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    big = np.repeat(np.random.RandomState(1).rand(256, 256, 1).astype(np.float32), 3, axis=2)
    for img, ok in ((colored, False), (big, False)):
        desc = _mini_spheres("zerotwosequence", "distant")
        tex = HostTexture(kind="imagemap", image=img)
        desc.primitives[0].material = HostMaterial(kind="matte", params={"Kd": ("texture", tex)})
        cs = compile_scene(desc)
        consts = extract_consts(cs, make_camera(desc.camera, desc.film), icfg, scfg, fcfg)
        assert (consts is not None) == ok, (img.shape, consts is not None)
