"""Sharded integrator steps must be mesh-shape invariant.

SURVEY.md §2.12: the ray/pixel (or photon/chain) axis is the only
data-parallel axis, samplers are deterministic functions of global ids,
and film reductions are psums — so the SAME image must come out of a
1-device and an 8-device mesh. This is the multi-device analog of the
reference's "tile decomposition doesn't change the estimator" property,
and the gate for the CLI auto-shard paths (render.render_compiled).
"""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from __graft_entry__ import _tiny_scene
from pbrt_tpu.scene.builder import compile_scene


def _mesh(n):
    devs = jax.devices()[:n]
    assert len(devs) == n
    return Mesh(np.array(devs), ("rays",))


@pytest.fixture(scope="module")
def scenes():
    out = {}
    for kind, depth in (("path", 3), ("sppm", 2), ("bdpt", 2), ("mlt", 2)):
        desc = _tiny_scene(res=(32, 16), spp=2, integrator=kind, max_depth=depth)
        if kind == "sppm":
            desc.integrator.initial_radius = 0.25
        out[kind] = (desc, compile_scene(desc))
    return out


def test_wavefront_shard_mesh_invariance(scenes):
    from pbrt_tpu.parallel.shard import render_sharded_step

    desc, cs = scenes["path"]
    img1 = np.asarray(render_sharded_step(cs, desc, _mesh(1), spp=2))
    img8 = np.asarray(render_sharded_step(cs, desc, _mesh(8), spp=2))
    np.testing.assert_allclose(img8, img1, rtol=2e-4, atol=2e-5)


def test_sppm_shard_mesh_invariance(scenes):
    from pbrt_tpu.parallel.shard import render_sppm_sharded_step

    desc, cs = scenes["sppm"]
    # photon seeds ride the device index, so exact bit-parity across mesh
    # shapes is not expected — but the ESTIMATOR must agree statistically.
    # Band tightened round 4 (was 0.25 @ 2x2048 photons — loose enough to
    # hide a per-device normalization slip): more photons shrink the MC
    # noise so a lost or doubled 1/n_dev factor cannot sneak under it.
    img1 = np.asarray(render_sppm_sharded_step(cs, desc, _mesh(1), n_iters=3, n_photons=8192))
    img8 = np.asarray(render_sppm_sharded_step(cs, desc, _mesh(8), n_iters=3, n_photons=8192))
    lit = img1.mean(-1) > 1e-3
    assert lit.sum() > 50
    ratio = img8[lit].mean() / img1[lit].mean()
    assert abs(ratio - 1.0) < 0.1, f"mesh-shape brightness drift {ratio}"


def test_volpath_shard_mesh_invariance():
    """volpath's medium sampling under shard_map: per-segment distance
    sampling + transmittance-weighted NEE are deterministic functions of
    (pixel_id, sample_idx), so mesh shape must not change the image
    (volpath.rs:82-232 semantics; round-3 verdict gap — only path had an
    allclose parity gate)."""
    from pbrt_tpu.parallel.shard import render_sharded_step
    from pbrt_tpu.scene.host import HostMedium

    desc = _tiny_scene(res=(32, 16), spp=2, integrator="volpath", max_depth=3)
    desc.media = {"fog": HostMedium(kind="homogeneous",
                                    sigma_a=np.full(3, 0.02),
                                    sigma_s=np.full(3, 0.08), g=0.2)}
    desc.camera_medium = "fog"
    cs = compile_scene(desc)
    img1 = np.asarray(render_sharded_step(cs, desc, _mesh(1), spp=2))
    img8 = np.asarray(render_sharded_step(cs, desc, _mesh(8), spp=2))
    assert img1.mean() > 1e-4
    np.testing.assert_allclose(img8, img1, rtol=2e-4, atol=2e-5)


def test_bdpt_shard_mesh_invariance(scenes):
    from pbrt_tpu.parallel.shard import render_bdpt_sharded_step

    desc, cs = scenes["bdpt"]
    img1 = np.asarray(render_bdpt_sharded_step(cs, desc, _mesh(1), spp=1))
    img8 = np.asarray(render_bdpt_sharded_step(cs, desc, _mesh(8), spp=1))
    np.testing.assert_allclose(img8, img1, rtol=2e-4, atol=2e-5)


def test_mlt_shard_mesh_invariance(scenes):
    from pbrt_tpu.parallel.shard import render_mlt_sharded_step

    desc, cs = scenes["mlt"]
    img1 = np.asarray(render_mlt_sharded_step(cs, desc, _mesh(1), depth=1, n_chains=8, n_mut=2, n_boot=64))
    img8 = np.asarray(render_mlt_sharded_step(cs, desc, _mesh(8), depth=1, n_chains=8, n_mut=2, n_boot=64))
    np.testing.assert_allclose(img8, img1, rtol=2e-4, atol=3e-5)
