"""Transport-mode asymmetry (TransportMode) tests.

The reference threads a TransportMode through every BSDF: radiance
transport (camera paths) carries the (etaI/etaT)^2 compression on specular
transmission (reflection.rs:703,777), the 1/eta^2 factors on microfacet
transmission (:1087) and Fourier (:1308,1411); importance (adjoint)
transport — BDPT light subpaths (bdpt.rs:950-1048), SPPM photons
(sppm.rs:431), MLT light streams — omits them and instead multiplies beta
by correct_shading_normal (bdpt.rs:45-57).

These tests were built to FAIL on the pre-round-5 code, where the mode
parameter was dead plumbing: the eta^2 unit checks below detect an
unconditionally-applied factor, and the skewed-normal scene detects a
missing shading-normal correction (its csn factor is ~3x at the chosen
geometry, far outside the agreement band).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.device.bsdf import (
    LOBE_FRESNEL_SPEC,
    LOBE_MICRO_T,
    LOBE_SPEC_T,
    N_SLOTS,
    bsdf_f,
    bsdf_sample,
    correct_shading_normal,
)

F32 = jnp.float32


def _lobes(kind, data_row):
    kinds = np.zeros((1, N_SLOTS), np.int32)
    data = np.zeros((1, N_SLOTS, 14), np.float32)
    kinds[0, 0] = kind
    data[0, 0] = data_row
    possible = tuple([frozenset({kind})] + [frozenset()] * (N_SLOTS - 1))
    return {"kind": jnp.asarray(kinds), "data": jnp.asarray(data), "possible": possible}


def _glass_row(eta):
    row = np.zeros(14, np.float32)
    row[0:3] = 1.0  # R / T color
    row[3] = eta
    row[6:9] = 1.0  # T color for FRESNEL_SPEC
    return row


def test_importance_specular_transmission_no_eta2():
    """Importance-mode specular transmission must NOT carry (etaI/etaT)^2
    (reflection.rs:703: factor exists only when mode == Radiance)."""
    eta = 1.5
    for kind in (LOBE_SPEC_T, LOBE_FRESNEL_SPEC):
        lob = _lobes(kind, _glass_row(eta))
        wo = jnp.asarray([[0.0, 0.0, 1.0]], F32)  # entering (etaI=1 -> etaT=eta)
        u_lobe = jnp.asarray([0.0], F32)
        # u1 > F(normal incidence, eta=1.5) ~ 0.04 -> FRESNEL_SPEC picks T
        u1 = jnp.asarray([0.9], F32)
        u2 = jnp.asarray([0.5], F32)
        bs_rad = bsdf_sample(lob, wo, u_lobe, u1, u2, "radiance")
        bs_imp = bsdf_sample(lob, wo, u_lobe, u1, u2, "importance")
        assert bool(bs_rad["valid"][0]) and bool(bs_imp["valid"][0])
        # same direction, same pdf; f differs by exactly (etaI/etaT)^2
        np.testing.assert_allclose(np.asarray(bs_rad["wi"]), np.asarray(bs_imp["wi"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(bs_rad["pdf"]), np.asarray(bs_imp["pdf"]), rtol=1e-6)
        ratio = float(bs_rad["f"][0, 0] / bs_imp["f"][0, 0])
        assert ratio == pytest.approx((1.0 / eta) ** 2, rel=1e-4), f"kind={kind}: {ratio}"

        # exiting the medium: etaI=eta, etaT=1 -> radiance factor eta^2
        wo_exit = jnp.asarray([[0.0, 0.0, -1.0]], F32)
        bs_rad = bsdf_sample(lob, wo_exit, u_lobe, u1, u2, "radiance")
        bs_imp = bsdf_sample(lob, wo_exit, u_lobe, u1, u2, "importance")
        ratio = float(bs_rad["f"][0, 0] / bs_imp["f"][0, 0])
        assert ratio == pytest.approx(eta ** 2, rel=1e-4), f"kind={kind} exit: {ratio}"


def test_importance_microfacet_transmission_factor():
    """MicrofacetTransmission f: radiance carries factor^2 = (1/eta)^2
    against the eta^2 Jacobian term (reflection.rs:1086-1089); importance
    keeps the bare eta^2 — ratio radiance/importance = 1/eta^2."""
    eta = 1.5
    row = _glass_row(eta)
    row[9] = row[10] = 0.3  # alpha
    lob = _lobes(LOBE_MICRO_T, row)
    wo = jnp.asarray([[0.3, 0.0, 0.954]], F32)
    wo = wo / jnp.linalg.norm(wo)
    # a refracted direction (entering, so transmitted side z < 0)
    from pbrt_tpu.device.bsdf import refract_dir

    ok, wi = refract_dir(wo, jnp.asarray([[0.0, 0.0, 1.0]], F32), jnp.asarray([1.0 / eta], F32))
    assert bool(ok[0])
    f_rad = bsdf_f(lob, wo, wi, jnp.asarray([False]), "radiance")
    f_imp = bsdf_f(lob, wo, wi, jnp.asarray([False]), "importance")
    assert float(f_imp[0, 0]) > 0
    ratio = float(f_rad[0, 0] / f_imp[0, 0])
    assert ratio == pytest.approx(1.0 / eta ** 2, rel=1e-4), ratio


def test_correct_shading_normal_values():
    """bdpt.rs:45-57: |wo.ns||wi.ng| / (|wo.ng||wi.ns|), 0 on degenerate."""
    ng = jnp.asarray([[0.0, 0.0, 1.0]], F32)
    ns = jnp.asarray([[np.sin(0.3), 0.0, np.cos(0.3)]], F32)
    wo = jnp.asarray([[np.sin(0.8), 0.0, np.cos(0.8)]], F32)
    wi = jnp.asarray([[-np.sin(0.6), 0.0, np.cos(0.6)]], F32)
    got = float(correct_shading_normal(ns, ng, wo, wi)[0])
    num = abs(float(jnp.sum(wo * ns))) * abs(float(jnp.sum(wi * ng)))
    den = abs(float(jnp.sum(wo * ng))) * abs(float(jnp.sum(wi * ns)))
    assert got == pytest.approx(num / den, rel=1e-5)
    # identical normals -> exactly 1
    one = float(correct_shading_normal(ng, ng, wo, wi)[0])
    assert one == pytest.approx(1.0, abs=1e-6)
    # wi perpendicular to ns -> 0, not inf/nan
    wi_perp = jnp.asarray([[np.cos(0.3), 0.0, -np.sin(0.3)]], F32)
    z = float(correct_shading_normal(ns, ng, wo, wi_perp)[0])
    assert z == 0.0


# ---------------------------------------------------------------------------
# e2e: ng != ns scene — BDPT's light-walk strategies agree with path tracing
# only when the adjoint correction is applied
# ---------------------------------------------------------------------------


def _skewed_scene(integrator):
    """Spot light fires up at a down-facing reflector whose SHADING normals
    are tilted 40 deg off geometric; the camera watches the floor, lit only
    via the reflector bounce. BDPT reaches the floor through light-subpath
    connections at the reflector (importance mode, csn ~ up to 3x at this
    geometry); path tracing reaches it through a radiance-mode camera walk.
    The two agree iff correct_shading_normal is applied."""
    from pbrt_tpu.core.transform import Transform
    from pbrt_tpu.scene.host import (
        CameraConfig,
        FilmConfig,
        HostLight,
        HostMaterial,
        HostPrimitive,
        SamplerConfig,
        SceneDescription,
        ShapeRecord,
        TriangleMesh,
    )

    white = HostMaterial(kind="matte", params={"Kd": ("const", np.array([0.8, 0.8, 0.8]))})
    floor = HostPrimitive(
        shape=ShapeRecord(mesh=TriangleMesh(
            p=np.array([[-4, 0, -4], [4, 0, -4], [4, 0, 4], [-4, 0, 4]], np.float64),
            indices=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
        )),
        material=white,
    )
    # reflector at y=2.5, geometric normal (0,-1,0); shading normals tilted
    # 40 deg toward +x
    tilt = np.deg2rad(40.0)
    ns = np.array([np.sin(tilt), -np.cos(tilt), 0.0])
    reflector = HostPrimitive(
        shape=ShapeRecord(mesh=TriangleMesh(
            p=np.array([[-2, 2.5, -2], [2, 2.5, -2], [2, 2.5, 2], [-2, 2.5, 2]], np.float64),
            indices=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
            n=np.tile(ns, (4, 1)),
        )),
        material=white,
    )
    spot = HostLight(
        kind="spot",
        intensity=np.array([60.0, 60.0, 60.0]),
        from_point=np.array([2.0, 0.5, 0.0]),
        to_point=np.array([0.0, 2.5, 0.0]),
        cone_angle=25.0,
        cone_delta=5.0,
    )
    return SceneDescription(
        primitives=[floor, reflector],
        lights=[spot],
        camera=CameraConfig(
            kind="perspective",
            camera_to_world=Transform.look_at([0, 2.0, 6.0], [-0.5, 0.0, 0.0], [0, 1, 0]),
            fov=50.0,
        ),
        film=FilmConfig(x_resolution=16, y_resolution=12),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=128),
        integrator=integrator,
    )


def _floor_means(img_path, img_bdpt):
    lit = img_path.mean(axis=-1) > 1e-3
    assert lit.sum() > 20, f"only {lit.sum()} lit pixels"
    return img_path.mean(axis=-1)[lit].mean(), img_bdpt.mean(axis=-1)[lit].mean()


def test_bdpt_skewed_normals_agrees_with_path(monkeypatch):
    from pbrt_tpu.render import render
    from pbrt_tpu.scene.host import IntegratorConfig

    img_path = render(_skewed_scene(IntegratorConfig(kind="path", max_depth=3)), spp=128)
    img_bdpt = render(_skewed_scene(IntegratorConfig(kind="bdpt", max_depth=3)), spp=128)
    m_path, m_bdpt = _floor_means(img_path, img_bdpt)
    r = m_bdpt / m_path
    assert 0.85 < r < 1.15, f"bdpt/path brightness {r}: path {m_path} bdpt {m_bdpt}"

    # discrimination: neutralize the correction and the SAME comparison must
    # leave the band — i.e. this test would have caught the dead-mode bug
    import pbrt_tpu.device.bdpt as bdpt_mod

    monkeypatch.setattr(
        bdpt_mod, "correct_shading_normal", lambda ns, ng, wo, wi: jnp.ones(wo.shape[0], F32)
    )
    img_broken = render(_skewed_scene(IntegratorConfig(kind="bdpt", max_depth=3)), spp=128)
    _, m_broken = _floor_means(img_path, img_broken)
    r_broken = m_broken / m_path
    assert not (0.85 < r_broken < 1.15), (
        f"csn-neutralized bdpt still inside band ({r_broken}) — test lost its teeth"
    )
