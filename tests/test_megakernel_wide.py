"""Wide (traversal) megakernel parity vs the XLA persistent wavefront.

device/megakernel_wide.py runs the whole bounce loop INCLUDING the
wide-BVH traversal (closest + shadow) inside one pallas_call. Same
(pixel, sample, dimension) streams, same estimator math as
trace_persistent — images must match the XLA path to float tolerance.
Interpret mode on the CPU backend.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from pbrt_tpu.core.transform import Transform
from pbrt_tpu.scene.builder import compile_scene
from pbrt_tpu.scene.host import (
    CameraConfig, FilmConfig, HostLight, HostMaterial, HostPrimitive,
    IntegratorConfig, SamplerConfig, SceneDescription, ShapeRecord, TriangleMesh,
)


def _grid(f, u0, u1, v0, v1, n):
    us = np.linspace(u0, u1, n + 1)
    vs = np.linspace(v0, v1, n + 1)
    gu, gv = np.meshgrid(us, vs)
    verts = np.stack(f(gu, gv), axis=-1).reshape(-1, 3)
    idx = []
    for i in range(n):
        row = i * (n + 1)
        for j in range(n):
            a = row + j
            idx.append([a, a + n + 1, a + 1])
            idx.append([a + 1, a + n + 1, a + n + 2])
    return verts.astype(np.float64), np.asarray(idx, np.int32)


def _room_scene(sampler="zerotwosequence", with_mirror=True, light="area",
                strategy="power", micro=False, sigma=0.0):
    """Enclosed displaced-terrain mini-room (the bench mesh class): ~260
    triangles, default UVs, matte walls + emissive ceiling panel."""
    def prim(verts, idx, kind="matte", kd=(0.6, 0.6, 0.6), emit=None):
        lightp = None
        if emit is not None:
            # two-sided so the panel lights the whole room (the grid's
            # winding makes its normal face the ceiling)
            lightp = HostLight(kind="area", intensity=np.asarray(emit, np.float64),
                               two_sided=True)
        params = {}
        if kind in ("matte", "plastic"):
            params["Kd"] = ("const", np.asarray(kd))
        if kind == "matte" and sigma:
            params["sigma"] = ("const", sigma)  # Oren-Nayar
        if kind == "plastic":
            params["Ks"] = ("const", np.array([0.4, 0.4, 0.4]))
            params["roughness"] = ("const", 0.15)
        if kind == "metal":
            params["roughness"] = ("const", 0.08)  # default copper eta/k
        mat = HostMaterial(kind=kind, params=params)
        return HostPrimitive(shape=ShapeRecord(mesh=TriangleMesh(p=verts, indices=idx)),
                             material=mat, area_light=lightp)

    terrain = prim(*_grid(lambda x, z: (x, 0.5 * np.sin(1.9 * x) * np.cos(1.3 * z), z),
                          -4, 4, -4, 4, 8), kd=(0.55, 0.45, 0.35),
                   kind="plastic" if micro else "matte")
    y0, y1 = -1.3, 4.0
    walls = [
        prim(*_grid(lambda u, v: (u, v, np.full_like(u, -4.0)), -4, 4, y0, y1, 2)),
        prim(*_grid(lambda u, v: (u, v, np.full_like(u, 4.0)), -4, 4, y0, y1, 2)),
        prim(*_grid(lambda u, v: (np.full_like(u, -4.0), v, u), -4, 4, y0, y1, 2),
             kd=(0.55, 0.3, 0.3)),
        prim(*_grid(lambda u, v: (np.full_like(u, 4.0), v, u), -4, 4, y0, y1, 2),
             kind="metal" if micro else ("mirror" if with_mirror else "matte"),
             kd=(0.3, 0.55, 0.3)),
        prim(*_grid(lambda u, v: (u, np.full_like(u, y1), v), -4, 4, -4, 4, 2),
             kd=(0.7, 0.7, 0.7)),
    ]
    panel = prim(*_grid(lambda u, v: (u, np.full_like(u, y1 - 0.01), v), -1.4, 1.4, -1.4, 1.4, 1),
                 kd=(0.0, 0.0, 0.0), emit=[12.0, 11.0, 10.0])
    lights = []
    if light in ("distant", "both"):
        lights = [HostLight(kind="distant", from_point=np.array([1.0, 10.0, 2.0]),
                            to_point=np.zeros(3), intensity=np.array([2.0, 2.0, 2.0]))]
    if light == "spot":
        # falloff band lands on the terrain so the smoothstep^4 cone is hit
        lights = [HostLight(kind="spot", from_point=np.array([0.0, 3.2, 2.8]),
                            to_point=np.array([0.0, -0.5, -1.0]),
                            intensity=np.array([40.0, 36.0, 33.0]),
                            cone_angle=30.0, cone_delta=18.0)]
    return SceneDescription(
        primitives=[terrain] + walls + [panel],
        lights=lights,
        camera=CameraConfig(kind="perspective",
                            camera_to_world=Transform.look_at([0, 2.3, 3.3], [0, 0.2, -1.0], [0, 1, 0]),
                            fov=70.0),
        film=FilmConfig(x_resolution=48, y_resolution=24),
        sampler=SamplerConfig(kind=sampler, pixel_samples=2),
        integrator=IntegratorConfig(kind="path", max_depth=4, light_strategy=strategy),
    )


@pytest.mark.parametrize("sampler,light,depth,strategy", [
    ("zerotwosequence", "area", 4, "power"),
    ("random", "distant", 4, "power"),
    # depth 7 exercises Russian roulette (kicks in after bounce 3)
    ("zerotwosequence", "area", 7, "power"),
    # 3 lights under UNIFORM selection (floor(u*n), not the cdf walk)
    ("zerotwosequence", "both", 4, "uniform"),
    # thin-lens depth of field (lens dims = static dim 1)
    ("zerotwosequence", "dof", 4, "power"),
    # gaussian pixel filter (erfinv importance sampling, unit weights)
    ("zerotwosequence", "gauss", 4, "power"),
    # stratified sampler (film-dim strata; traced dims = uniform hash)
    ("stratified", "area", 4, "power"),
    # halton (pbrt's default): CRT film enumeration in-kernel
    ("halton", "area", 4, "power"),
    # spot light: baked smoothstep^4 cone falloff in the NEE branch
    ("zerotwosequence", "spot", 4, "power"),
    # GGX lobes: plastic (lambert+micro, dielectric F) terrain + copper
    # metal (conductor F) wall — lobe pick, visible-normal sampling,
    # micro NEE f/pdf terms
    ("zerotwosequence", "micro", 4, "power"),
    ("random", "micro", 5, "power"),
    # Oren-Nayar matte (sigma=25): A/B retro-reflection factor in f for
    # both the bounce recompute and the NEE term
    ("zerotwosequence", "sigma", 4, "power"),
    # sobol: global film-index enumeration (GF(2) inversion) in-kernel
    ("sobol", "area", 4, "power"),
    # maxmindist: searched film matrix + per-pixel CP rotation in-kernel
    ("maxmindist", "area", 4, "power"),
])
def test_wide_megakernel_matches_xla_persistent(sampler, light, depth, strategy):
    from pbrt_tpu.device.megakernel_wide import extract_wide_consts, make_wide_megakernel_fn
    from pbrt_tpu.device.camera import make_camera
    from pbrt_tpu.render import make_persistent_fn

    desc = _room_scene(sampler=sampler,
                       light="area" if light in ("dof", "gauss", "micro", "sigma") else light,
                       strategy=strategy, micro=light == "micro",
                       sigma=25.0 if light == "sigma" else 0.0)
    desc.integrator.max_depth = depth
    if light == "dof":
        desc.camera.lens_radius = 0.15
        desc.camera.focal_distance = 4.0
    if light == "gauss":
        desc.film.filter_name = "gaussian"
        desc.film.filter_params = {"xwidth": 1.5, "alpha": 2.0}
    cs = compile_scene(desc)
    assert cs.static.has_wide, "scene must build the wide tables"

    W, H, spp = 48, 24, 2
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel().astype(np.int32))
    py = jnp.asarray(ys.ravel().astype(np.int32))
    pid = jnp.asarray((ys * W + xs).ravel().astype(np.uint32))

    os.environ["PBRT_TPU_NO_MEGAKERNEL"] = "1"
    try:
        ref_fn = make_persistent_fn(cs)
    finally:
        del os.environ["PBRT_TPU_NO_MEGAKERNEL"]
    Lr, wr, nvr = ref_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"] = "1"
    try:
        cam = make_camera(desc.camera, desc.film)
        icfg = {"kind": "path", "max_depth": depth, "rr_threshold": desc.integrator.rr_threshold,
                "light_strategy": strategy}
        scfg = {"kind": sampler, "spp": spp}
        if sampler == "halton":
            from pbrt_tpu.device.sampler import halton_tables

            scfg["halton"] = halton_tables(W, H)
        if sampler == "sobol":
            from pbrt_tpu.device.sampler import sobol_tables

            scfg["sobol"] = sobol_tables(W, H, spp)
            assert scfg["sobol"] is not None
        fcfg = {"filter": desc.film.filter_name,
                "filter_params": dict(desc.film.filter_params),
                "max_sample_luminance": float("inf")}
        assert extract_wide_consts(cs, cam, icfg, scfg, fcfg) is not None
        mk_fn = make_wide_megakernel_fn(cs, cam, icfg, scfg, fcfg)
    finally:
        del os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"]
    assert mk_fn is not None
    Lm, wm, nvm = mk_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    Lr, Lm = np.asarray(Lr), np.asarray(Lm)
    # the scene must produce real signal for the comparison to mean anything
    assert (Lr.sum(-1) > 1e-4).mean() > 0.5
    assert np.allclose(np.asarray(wr), np.asarray(wm))
    assert abs(float(np.sum(np.asarray(nvr))) - float(np.sum(np.asarray(nvm)))) <= 6
    diff = np.abs(Lr - Lm)
    rel = diff / (np.abs(Lr) + 1e-2)
    assert float(rel.max()) < 2e-2, (float(rel.max()), float(diff.max()))
    assert float(diff.mean()) < 1e-4


def test_wide_megakernel_eligibility_gates():
    from pbrt_tpu.device.camera import make_camera
    from pbrt_tpu.device.megakernel_wide import extract_wide_consts

    desc = _room_scene()
    cs = compile_scene(desc)
    cam = make_camera(desc.camera, desc.film)
    icfg = {"kind": "path", "max_depth": 4, "light_strategy": "power"}
    fcfg = {"filter": "box", "filter_params": {}, "max_sample_luminance": float("inf")}
    assert extract_wide_consts(cs, cam, icfg, {"kind": "zerotwosequence", "spp": 2}, fcfg) is not None
    # halton sampler: not baked
    assert extract_wide_consts(cs, cam, icfg, {"kind": "halton", "spp": 2}, fcfg) is None
    # negative-lobe filters need per-sample f/p weights: not baked
    fcfg2 = dict(fcfg, filter="mitchell")
    assert extract_wide_consts(cs, cam, icfg, {"kind": "zerotwosequence", "spp": 2}, fcfg2) is None


def test_bench_mesh_scene_feature_set_is_eligible():
    """The mesh bench config's FEATURE set (matte + two-sided area panel +
    (0,2) sampler + box filter) must stay wide-megakernel eligible at small
    triangle counts; the full 123k-tri bench itself must be REJECTED by the
    packet-coherence gate (pixel-pinned persistent lanes make bounce-2+
    packet unions approach the whole tree — measured 0.15 Mverts/s on a
    v5e — so big meshes ride the per-bounce-sorting XLA wavefront)."""
    import importlib.util

    bench_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("benchmod", bench_path)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from pbrt_tpu.device.camera import make_camera
    from pbrt_tpu.device.megakernel_wide import extract_wide_consts

    def consts_for(n_side):
        desc = bench._mesh_scene(n_side=n_side)
        cs = compile_scene(desc)
        assert cs.static.has_wide
        cam = make_camera(desc.camera, desc.film)
        icfg = {"kind": "path", "max_depth": 5, "rr_threshold": desc.integrator.rr_threshold,
                "light_strategy": desc.integrator.light_strategy}
        scfg = {"kind": desc.sampler.kind, "spp": 16}
        fcfg = {"filter": desc.film.filter_name, "filter_params": dict(desc.film.filter_params),
                "max_sample_luminance": desc.film.max_sample_luminance}
        return extract_wide_consts(cs, cam, icfg, scfg, fcfg)

    assert consts_for(40) is not None  # 2*40^2 + walls < 4096: eligible
    assert consts_for(64) is None  # 8k+ tris: coherence gate rejects


def test_wide_megakernel_mixed_spheres():
    """Mixed triangle+sphere scenes: the wide tables cover the triangle
    subset and the (<=8) full spheres are baked constants tested against
    the traversal winner. Reference = the XLA wave with its own all-prim
    BVH (has_wide stays False for mixed scenes)."""
    from pbrt_tpu.device.camera import make_camera
    from pbrt_tpu.device.megakernel_wide import make_wide_megakernel_fn
    from pbrt_tpu.render import make_persistent_fn
    from pbrt_tpu.scene.host import Sphere

    desc = _room_scene(light="area")
    desc.primitives.append(HostPrimitive(
        shape=ShapeRecord(sphere=Sphere(object_to_world=Transform.translate([-1.2, 1.0, 0.0]),
                                        radius=0.8)),
        material=HostMaterial(kind="mirror", params={"Kr": ("const", np.array([0.9, 0.9, 0.9]))})))
    desc.primitives.append(HostPrimitive(
        shape=ShapeRecord(sphere=Sphere(object_to_world=Transform.translate([1.4, 0.9, 0.5]),
                                        radius=0.6)),
        material=HostMaterial(kind="glass", params={})))
    cs = compile_scene(desc)
    assert not cs.static.has_wide  # mixed: XLA wide path must stay off
    assert cs.static.has_wide_tri
    assert cs.static.n_spheres == 2

    W, H, spp = 48, 24, 2
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel().astype(np.int32))
    py = jnp.asarray(ys.ravel().astype(np.int32))
    pid = jnp.asarray((ys * W + xs).ravel().astype(np.uint32))

    os.environ["PBRT_TPU_NO_MEGAKERNEL"] = "1"
    os.environ["PBRT_TPU_WIDEMEGA"] = "0"
    try:
        ref_fn = make_persistent_fn(cs)
    finally:
        del os.environ["PBRT_TPU_NO_MEGAKERNEL"]
        del os.environ["PBRT_TPU_WIDEMEGA"]
    Lr, wr, nvr = ref_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    cam = make_camera(desc.camera, desc.film)
    icfg = {"kind": "path", "max_depth": 4, "rr_threshold": desc.integrator.rr_threshold,
            "light_strategy": "power"}
    scfg = {"kind": "zerotwosequence", "spp": spp}
    fcfg = {"filter": "box", "filter_params": {}, "max_sample_luminance": float("inf")}
    os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"] = "1"
    try:
        mk_fn = make_wide_megakernel_fn(cs, cam, icfg, scfg, fcfg)
    finally:
        del os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"]
    assert mk_fn is not None
    Lm, wm, nvm = mk_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    Lr, Lm = np.asarray(Lr), np.asarray(Lm)
    assert (Lr.sum(-1) > 1e-4).mean() > 0.5
    assert np.allclose(np.asarray(wr), np.asarray(wm))
    assert abs(float(np.sum(np.asarray(nvr))) - float(np.sum(np.asarray(nvm)))) <= 6
    diff = np.abs(Lr - Lm)
    rel = diff / (np.abs(Lr) + 1e-2)
    assert float(rel.max()) < 2e-2, (float(rel.max()), float(diff.max()))
    assert float(diff.mean()) < 1e-4

def test_wide_megakernel_sphere_light():
    """Emissive full-sphere lamp in a mixed scene: visible-cone NEE from
    outside, uniform-area NEE from inside, and the cone-density MIS pickup
    on direct hits must match the XLA persistent wave
    (sphere.rs sample_interaction / pdf_interaction)."""
    from pbrt_tpu.device.camera import make_camera
    from pbrt_tpu.device.megakernel_wide import make_wide_megakernel_fn
    from pbrt_tpu.render import make_persistent_fn
    from pbrt_tpu.scene.host import Sphere

    desc = _room_scene(light="area", with_mirror=False)
    desc.primitives.append(HostPrimitive(
        shape=ShapeRecord(sphere=Sphere(object_to_world=Transform.translate([0.8, 1.6, -0.5]),
                                        radius=0.5)),
        material=HostMaterial(kind="matte", params={"Kd": ("const", np.zeros(3))}),
        area_light=HostLight(kind="area", intensity=np.array([18.0, 15.0, 12.0]))))
    cs = compile_scene(desc)
    assert cs.static.has_cone_sphere_lights
    assert cs.static.n_spheres == 1

    W, H, spp = 48, 24, 2
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel().astype(np.int32))
    py = jnp.asarray(ys.ravel().astype(np.int32))
    pid = jnp.asarray((ys * W + xs).ravel().astype(np.uint32))

    os.environ["PBRT_TPU_NO_MEGAKERNEL"] = "1"
    os.environ["PBRT_TPU_WIDEMEGA"] = "0"
    try:
        ref_fn = make_persistent_fn(cs)
    finally:
        del os.environ["PBRT_TPU_NO_MEGAKERNEL"]
        del os.environ["PBRT_TPU_WIDEMEGA"]
    Lr, wr, nvr = ref_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    cam = make_camera(desc.camera, desc.film)
    icfg = {"kind": "path", "max_depth": 4, "rr_threshold": desc.integrator.rr_threshold,
            "light_strategy": "power"}
    scfg = {"kind": "zerotwosequence", "spp": spp}
    fcfg = {"filter": "box", "filter_params": {}, "max_sample_luminance": float("inf")}
    os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"] = "1"
    try:
        mk_fn = make_wide_megakernel_fn(cs, cam, icfg, scfg, fcfg)
    finally:
        del os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"]
    assert mk_fn is not None
    Lm, wm, nvm = mk_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    Lr, Lm = np.asarray(Lr), np.asarray(Lm)
    assert (Lr.sum(-1) > 1e-4).mean() > 0.5
    assert np.allclose(np.asarray(wr), np.asarray(wm))
    assert abs(float(np.sum(np.asarray(nvr))) - float(np.sum(np.asarray(nvm)))) <= 6
    diff = np.abs(Lr - Lm)
    rel = diff / (np.abs(Lr) + 1e-2)
    assert float(rel.max()) < 2e-2, (float(rel.max()), float(diff.max()))
    assert float(diff.mean()) < 1e-4


def _uv_sphere(center, radius, n_theta=12, n_phi=18):
    """UV-sphere triangle mesh with analytic per-vertex normals."""
    th = np.linspace(0.0, np.pi, n_theta + 1)
    ph = np.linspace(0.0, 2 * np.pi, n_phi, endpoint=False)
    gt, gp = np.meshgrid(th, ph, indexing="ij")
    nx = np.sin(gt) * np.cos(gp)
    ny = np.cos(gt)
    nz = np.sin(gt) * np.sin(gp)
    norms = np.stack([nx, ny, nz], axis=-1).reshape(-1, 3)
    verts = center + radius * norms
    idx = []
    for i in range(n_theta):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            if i > 0:
                idx.append([a, c, b])
            if i < n_theta - 1:
                idx.append([b, c, d])
    return verts.astype(np.float64), np.asarray(idx, np.int32), norms.astype(np.float64)


def test_wide_megakernel_shading_normals():
    """Per-vertex (smooth) shading normals ride the parallel attr table:
    winner-reduced in the leaf phase, interpolated + ng-alignment-flipped
    exactly like shading.py's has_sn branch (triangle.rs:355-360)."""
    from pbrt_tpu.device.camera import make_camera
    from pbrt_tpu.device.megakernel_wide import extract_wide_consts, make_wide_megakernel_fn
    from pbrt_tpu.render import make_persistent_fn

    desc = _room_scene(light="area", with_mirror=True)
    sv, si, sn = _uv_sphere(np.array([0.0, 0.9, -0.5]), 1.0)
    desc.primitives.append(HostPrimitive(
        shape=ShapeRecord(mesh=TriangleMesh(p=sv, indices=si, n=sn)),
        material=HostMaterial(kind="matte", params={"Kd": ("const", np.array([0.5, 0.55, 0.7]))})))
    cs = compile_scene(desc)
    assert cs.static.has_wide
    assert cs.arrays.wattr_tab is not None

    W, H, spp = 48, 24, 2
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel().astype(np.int32))
    py = jnp.asarray(ys.ravel().astype(np.int32))
    pid = jnp.asarray((ys * W + xs).ravel().astype(np.uint32))

    os.environ["PBRT_TPU_NO_MEGAKERNEL"] = "1"
    os.environ["PBRT_TPU_WIDEMEGA"] = "0"
    try:
        ref_fn = make_persistent_fn(cs)
    finally:
        del os.environ["PBRT_TPU_NO_MEGAKERNEL"]
        del os.environ["PBRT_TPU_WIDEMEGA"]
    Lr, wr, nvr = ref_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    cam = make_camera(desc.camera, desc.film)
    icfg = {"kind": "path", "max_depth": 4, "rr_threshold": desc.integrator.rr_threshold,
            "light_strategy": "power"}
    scfg = {"kind": "zerotwosequence", "spp": spp}
    fcfg = {"filter": "box", "filter_params": {}, "max_sample_luminance": float("inf")}
    consts = extract_wide_consts(cs, cam, icfg, scfg, fcfg)
    assert consts is not None and consts["has_ns"]
    os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"] = "1"
    try:
        mk_fn = make_wide_megakernel_fn(cs, cam, icfg, scfg, fcfg)
    finally:
        del os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"]
    assert mk_fn is not None
    Lm, wm, nvm = mk_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    Lr, Lm = np.asarray(Lr), np.asarray(Lm)
    assert (Lr.sum(-1) > 1e-4).mean() > 0.5
    assert np.allclose(np.asarray(wr), np.asarray(wm))
    assert abs(float(np.sum(np.asarray(nvr))) - float(np.sum(np.asarray(nvm)))) <= 6
    diff = np.abs(Lr - Lm)
    rel = diff / (np.abs(Lr) + 1e-2)
    assert float(rel.max()) < 2e-2, (float(rel.max()), float(diff.max()))
    assert float(diff.mean()) < 1e-4

def test_wide_megakernel_checker_uv():
    """Non-default UVs ride the attr table; a matte-Kd 2D checkerboard over
    constant cells is baked as an in-kernel select (texture.py:213-220)."""
    from pbrt_tpu.device.camera import make_camera
    from pbrt_tpu.device.megakernel_wide import extract_wide_consts, make_wide_megakernel_fn
    from pbrt_tpu.render import make_persistent_fn
    from pbrt_tpu.scene.host import HostTexture

    desc = _room_scene(light="area", with_mirror=True)
    checker = HostTexture(kind="checkerboard", is_float=False,
                          tex1=("const", np.array([0.725, 0.71, 0.68])),
                          tex2=("const", np.array([0.14, 0.12, 0.35])),
                          uscale=6.0, vscale=6.0, udelta=0.25)
    # tessellated floor grid with a real uv chart (keeps the scene above
    # the wide-BVH prim threshold)
    n = 8
    us = np.linspace(-4.0, 4.0, n + 1)
    gu, gvv = np.meshgrid(us, us)
    p = np.stack([gu, np.zeros_like(gu), gvv], axis=-1).reshape(-1, 3)
    uv = np.stack([(gu + 4.0) / 8.0, (gvv + 4.0) / 8.0], axis=-1).reshape(-1, 2)
    idx = []
    for i in range(n):
        row = i * (n + 1)
        for j in range(n):
            a = row + j
            idx.append([a, a + n + 1, a + 1])
            idx.append([a + 1, a + n + 1, a + n + 2])
    idx = np.asarray(idx, np.int32)
    desc.primitives[0] = HostPrimitive(
        shape=ShapeRecord(mesh=TriangleMesh(p=p, indices=idx, uv=uv)),
        material=HostMaterial(kind="matte", params={"Kd": ("texture", checker)}))
    cs = compile_scene(desc)
    assert cs.static.has_wide
    assert cs.arrays.wattr_tab is not None  # non-default uvs -> attr table

    W, H, spp = 48, 24, 2
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel().astype(np.int32))
    py = jnp.asarray(ys.ravel().astype(np.int32))
    pid = jnp.asarray((ys * W + xs).ravel().astype(np.uint32))

    os.environ["PBRT_TPU_NO_MEGAKERNEL"] = "1"
    os.environ["PBRT_TPU_WIDEMEGA"] = "0"
    try:
        ref_fn = make_persistent_fn(cs)
    finally:
        del os.environ["PBRT_TPU_NO_MEGAKERNEL"]
        del os.environ["PBRT_TPU_WIDEMEGA"]
    Lr, wr, nvr = ref_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    cam = make_camera(desc.camera, desc.film)
    icfg = {"kind": "path", "max_depth": 4, "rr_threshold": desc.integrator.rr_threshold,
            "light_strategy": "power"}
    scfg = {"kind": "zerotwosequence", "spp": spp}
    fcfg = {"filter": "box", "filter_params": {}, "max_sample_luminance": float("inf")}
    consts = extract_wide_consts(cs, cam, icfg, scfg, fcfg)
    assert consts is not None and consts["has_attr"]
    assert any(m.get("kd_tex") for m in consts["mats"].values())
    os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"] = "1"
    try:
        mk_fn = make_wide_megakernel_fn(cs, cam, icfg, scfg, fcfg)
    finally:
        del os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"]
    assert mk_fn is not None
    Lm, wm, nvm = mk_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    Lr, Lm = np.asarray(Lr), np.asarray(Lm)
    assert (Lr.sum(-1) > 1e-4).mean() > 0.5
    assert np.allclose(np.asarray(wr), np.asarray(wm))
    assert abs(float(np.sum(np.asarray(nvr))) - float(np.sum(np.asarray(nvm)))) <= 6
    diff = np.abs(Lr - Lm)
    rel = diff / (np.abs(Lr) + 1e-2)
    assert float(rel.max()) < 2e-2, (float(rel.max()), float(diff.max()))
    assert float(diff.mean()) < 1e-4


def test_megakernels_reject_mix_material():
    """mix picks its sub-material stochastically per hit — the megakernels
    bake lobes at a fixed point, so mix scenes must keep the XLA path."""
    from pbrt_tpu.device.camera import make_camera
    from pbrt_tpu.device.megakernel_wide import extract_wide_consts

    desc = _room_scene()
    m1 = HostMaterial(kind="matte", params={"Kd": ("const", np.array([0.8, 0.1, 0.1]))})
    m2 = HostMaterial(kind="matte", params={"Kd": ("const", np.array([0.1, 0.1, 0.8]))})
    desc.primitives[0] = HostPrimitive(
        shape=desc.primitives[0].shape,
        material=HostMaterial(kind="mix", params={
            "amount": ("const", np.array([0.5, 0.5, 0.5])),
            "material1": ("material", m1),
            "material2": ("material", m2),
        }))
    cs = compile_scene(desc)
    cam = make_camera(desc.camera, desc.film)
    icfg = {"kind": "path", "max_depth": 4, "light_strategy": "power"}
    fcfg = {"filter": "box", "filter_params": {}, "max_sample_luminance": float("inf")}
    assert extract_wide_consts(cs, cam, icfg, {"kind": "zerotwosequence", "spp": 2}, fcfg) is None

def test_wide_megakernel_constant_infinite():
    """Constant (imageless) infinite light: uniform-sphere NEE (pdf 1/4pi)
    + escaped-ray env pickup with deferred MIS, baked closed-form."""
    from pbrt_tpu.device.camera import make_camera
    from pbrt_tpu.device.megakernel_wide import extract_wide_consts, make_wide_megakernel_fn
    from pbrt_tpu.render import make_persistent_fn

    # OPEN scene: displaced terrain under a constant sky, no enclosure --
    # half the rays escape, exercising the env pickup path
    terrain = HostPrimitive(
        shape=ShapeRecord(mesh=TriangleMesh(*_grid(
            lambda x, z: (x, 0.6 * np.sin(1.3 * x) * np.cos(1.1 * z), z),
            -6, 6, -6, 6, 10))),
        material=HostMaterial(kind="matte", params={"Kd": ("const", np.array([0.55, 0.45, 0.35]))}))
    desc = SceneDescription(
        primitives=[terrain],
        lights=[HostLight(kind="infinite", intensity=np.array([0.7, 0.8, 1.0])),
                HostLight(kind="distant", from_point=np.array([2.0, 8.0, 1.0]),
                          to_point=np.zeros(3), intensity=np.array([1.5, 1.4, 1.2]))],
        camera=CameraConfig(kind="perspective",
                            camera_to_world=Transform.look_at([0, 2.5, 6.5], [0, 0.5, 0], [0, 1, 0]),
                            fov=60.0),
        film=FilmConfig(x_resolution=48, y_resolution=24),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=2),
        integrator=IntegratorConfig(kind="path", max_depth=4, light_strategy="power"),
    )
    cs = compile_scene(desc)
    assert cs.static.has_wide and cs.static.has_infinite and not cs.static.has_env_map

    W, H, spp = 48, 24, 2
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel().astype(np.int32))
    py = jnp.asarray(ys.ravel().astype(np.int32))
    pid = jnp.asarray((ys * W + xs).ravel().astype(np.uint32))

    os.environ["PBRT_TPU_NO_MEGAKERNEL"] = "1"
    os.environ["PBRT_TPU_WIDEMEGA"] = "0"
    try:
        ref_fn = make_persistent_fn(cs)
    finally:
        del os.environ["PBRT_TPU_NO_MEGAKERNEL"]
        del os.environ["PBRT_TPU_WIDEMEGA"]
    Lr, wr, nvr = ref_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    cam = make_camera(desc.camera, desc.film)
    icfg = {"kind": "path", "max_depth": 4, "rr_threshold": desc.integrator.rr_threshold,
            "light_strategy": "power"}
    scfg = {"kind": "zerotwosequence", "spp": spp}
    fcfg = {"filter": "box", "filter_params": {}, "max_sample_luminance": float("inf")}
    consts = extract_wide_consts(cs, cam, icfg, scfg, fcfg)
    assert consts is not None
    os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"] = "1"
    try:
        mk_fn = make_wide_megakernel_fn(cs, cam, icfg, scfg, fcfg)
    finally:
        del os.environ["PBRT_TPU_MEGAKERNEL_INTERPRET"]
    assert mk_fn is not None
    Lm, wm, nvm = mk_fn(cs.arrays, px, py, pid, jnp.uint32(0), spp, jnp.uint32(0))

    Lr, Lm = np.asarray(Lr), np.asarray(Lm)
    assert (Lr.sum(-1) > 1e-4).mean() > 0.9  # sky fills every escaped pixel
    assert np.allclose(np.asarray(wr), np.asarray(wm))
    assert abs(float(np.sum(np.asarray(nvr))) - float(np.sum(np.asarray(nvm)))) <= 6
    diff = np.abs(Lr - Lm)
    rel = diff / (np.abs(Lr) + 1e-2)
    assert float(rel.max()) < 2e-2, (float(rel.max()), float(diff.max()))
    assert float(diff.mean()) < 1e-4
