"""Observability parity (round-5 stretch): BDPT per-strategy debug films
(bdpt.rs:686-709 visualizestrategies/visualizeweights) and SPPM progressive
image writes (sppm.rs:505-528 imagewritefrequency)."""
import glob
import os

import numpy as np

from pbrt_tpu.core.imageio import read_exr
from pbrt_tpu.render import render
from pbrt_tpu.scene.host import IntegratorConfig


def _scene(integrator):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.test_bdpt import _scene as bdpt_scene

    return bdpt_scene(integrator)


def test_bdpt_strategy_films(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    integ = IntegratorConfig(kind="bdpt", max_depth=2,
                             visualize_strategies=True, visualize_weights=True)
    img = render(_scene(integ), spp=8)
    s_files = sorted(glob.glob("bdpt_d*_s*_t*.exr"))
    w_files = sorted(glob.glob("bdpt_w_d*_s*_t*.exr"))
    assert len(w_files) >= 4, w_files
    assert len(s_files) == len(w_files)
    # the WEIGHTED strategy films partition the final image: their sum
    # must reproduce it (each strategy contributes L * misweight)
    total = np.zeros_like(img)
    for f in w_files:
        total += read_exr(f)
    assert np.allclose(total, img, atol=2e-3), float(np.abs(total - img).max())
    # unweighted films exist and dominate their weighted counterparts
    for sf, wf in zip(s_files, w_files):
        u = read_exr(sf)
        w = read_exr(wf)
        assert np.isfinite(u).all()
        assert (u + 1e-6 >= w - 1e-4).all()  # misweight <= 1


def test_sppm_progressive_writes(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    integ = IntegratorConfig(kind="sppm", max_depth=2, num_iterations=4,
                             photons_per_iteration=2048, initial_radius=0.5,
                             write_frequency=2)
    desc = _scene(integ)
    desc.film.filename = "prog.exr"
    img = render(desc)
    assert os.path.exists("prog.exr")
    prog = read_exr("prog.exr")
    assert prog.shape == img.shape
    assert np.isfinite(prog).all()
