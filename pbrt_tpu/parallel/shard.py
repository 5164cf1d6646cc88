"""Multi-chip rendering: shard the pixel/ray axis over a device mesh.

TPU-native equivalent of the reference's rayon tile parallelism
(src/core/integrator.rs:276-396): pixels are sharded across devices with
`shard_map`, the read-only SceneArrays are replicated, and each device
renders its own disjoint film slice — film assembly is a pure all-gather
(the analog of the main thread's merge_film_tile loop), the only cross-chip
communication in the whole pipeline.
"""
from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..device.camera import make_camera
from ..render import _one_sample_wave

F32 = jnp.float32


def _round_up(x, m):
    return (x + m - 1) // m * m


def render_sharded_step(cs, desc, mesh: Mesh, spp: int | None = None, seed: int = 0):
    """One full sharded render pass (all pixels x spp samples).

    Returns the film image (H*W, 3) as a replicated array.
    """
    from ..scene.builder import CompiledScene  # noqa: F401 (typing only)

    n_dev = math.prod(mesh.devices.shape)
    W = desc.film.x_resolution
    H = desc.film.y_resolution
    spp = int(spp if spp is not None else desc.sampler.pixel_samples)

    cam = make_camera(desc.camera, desc.film)
    static = cs.static
    icfg = {
        "kind": desc.integrator.kind,
        "max_depth": max(int(desc.integrator.max_depth), 1),
        "rr_threshold": desc.integrator.rr_threshold,
        "strategy": desc.integrator.strategy,
        "light_strategy": desc.integrator.light_strategy,
        "n_samples": desc.integrator.n_samples,
        "cos_sample": desc.integrator.cos_sample,
    }
    if str(desc.integrator.light_strategy) == "spatial" and static.n_lights > 1:
        from ..device.lightdistrib import build_spatial_distribution

        icfg["spatial_distribution"] = build_spatial_distribution(cs.arrays, static)
    scfg = {"kind": desc.sampler.kind, "spp": spp}
    fcfg = {"filter": desc.film.filter_name, "filter_params": dict(desc.film.filter_params), "max_sample_luminance": desc.film.max_sample_luminance}

    R = W * H
    Rp = _round_up(R, n_dev)
    ys, xs = np.mgrid[0:H, 0:W]
    px = np.zeros(Rp, np.int32)
    py = np.zeros(Rp, np.int32)
    pids = np.zeros(Rp, np.uint32)
    px[:R] = xs.ravel()
    py[:R] = ys.ravel()
    pids[:R] = (ys * W + xs).ravel()

    ray_sharding = NamedSharding(mesh, P("rays"))
    repl = NamedSharding(mesh, P())
    px = jax.device_put(jnp.asarray(px), ray_sharding)
    py = jax.device_put(jnp.asarray(py), ray_sharding)
    pids = jax.device_put(jnp.asarray(pids), ray_sharding)
    sa = jax.device_put(cs.arrays, repl)

    @jax.jit
    def step(sa, px, py, pids, seed):
        def one(s, acc):
            Lw, w, _nv = _one_sample_wave(sa, static, icfg, scfg, fcfg, cam, px, py, pids, s.astype(jnp.uint32), seed)
            return acc[0] + Lw, acc[1] + w

        acc0 = (jnp.zeros((Rp, 3), F32), jnp.zeros((Rp,), F32))
        Lsum, wsum = jax.lax.fori_loop(0, spp, one, acc0) if spp > 1 else one(jnp.uint32(0), acc0)
        return Lsum / jnp.maximum(wsum, 1e-9)[:, None]

    # NOTE: fori over samples requires traced sample_idx; the samplers accept
    # traced indices for the hash/(0,2) families. (Unrolled-dim samplers like
    # halton radical-inverse also accept traced indices — bases are static.)
    out_sharding = NamedSharding(mesh, P("rays"))
    img = jax.jit(step, out_shardings=out_sharding)(sa, px, py, pids, jnp.uint32(seed))
    return img[:R]
