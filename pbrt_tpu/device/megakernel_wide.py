"""Persistent Pallas path-tracing megakernel with IN-KERNEL wide-BVH
traversal — the mesh-scene sibling of device/megakernel.py.

The brute-force megakernel bakes <=16 primitives into the instruction
stream; triangle scenes instead keep the wide-BVH node/prim tables
(scene/widebvh.py) resident in VMEM and run the joint interleaved
traversal of pallas_bvh._traverse_kernel_joint as a subroutine of the
persistent bounce loop: one 128-lane packet per sublane row of the
(SUB, 128) lane block, all SUB packet stacks advancing one pop per
iteration of a single branchless while_loop (the latency-hiding layout
measured on the standalone kernel). Closest-hit AND shadow queries both
run in-kernel, so a whole bounce — traversal, area/delta-light NEE with
MIS, shadow traversal, BSDF sampling, Russian roulette, sample flush,
in-place ray regeneration — is one kernel with zero HBM round-trips for
path state.

Shading attributes come out of the traversal itself: the leaf phase
extracts the winning triangle's vertices and its material/light/flip
payload (wide prim-table cols 11:14) with masked winner reductions, so
no post-hit gather is needed. Scenes with per-vertex shading normals
carry them in a parallel attr table (widebvh attr_cols) winner-reduced
the same way; the interpolated ns + ng-alignment-flip replicate
shading.py's has_sn branch (triangle.rs:355-360). The shading frame is
the XLA path's exact frame for default-UV triangles (dpdu = v1 - v0,
orthogonalized against ns; coordinate_system fallback when degenerate),
which the eligibility check enforces.

Estimator parity: identical (pixel, sample, dimension) streams and
per-sample math as integrator.trace_persistent (asserted by
tests/test_megakernel_wide.py in interpret mode). Eligible class:
triangle-only wide-BVH scenes (flat or smooth-shaded, default or real
UV charts), matte/mirror/glass/metal/plastic-class materials — single
lambert/specular/fresnel-specular lobes, single GGX microfacet lobes
(dielectric or conductor fresnel), and the 2-lobe lambert+GGX combo
(plastic, glossy uber rows) with per-sample lobe picks — constant
textures or a matte-Kd 2D-uv checkerboard over constant cells (the
BRUTE megakernel additionally runs grayscale imagemap Kd via an
in-kernel VMEM mip atlas — megakernel.py eval_kd_tex; porting that
fetch here is possible but the wide kernel's VMEM budget is already
node-table-bound), point +
spot + distant + diffuse-area lights on triangles AND full spheres
(visible-cone NEE outside / uniform area inside, cone-density MIS
pickup — sphere.rs sample_interaction), Oren-Nayar matte (sigma > 0),
uniform or power light selection, pinhole or thin-lens perspective,
box/triangle/gaussian filter, and the full
(0,2)/random/stratified/halton/sobol/maxmindist sampler family
(halton's CRT and sobol's GF(2) global film enumerations run
in-kernel). mix materials, Beckmann lobes, and textured sphere prims
keep the XLA path.

Reference semantics: integrator.rs:263-403 + path.rs:79-222 (the loop),
bvh.rs:705-814 (traversal), triangle.rs:136-399 (watertight test),
diffuse.rs (area emission), integrator.rs:109-237 (estimate_direct MIS).
"""
from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.arrays import (
    LIGHT_AREA, LIGHT_DISTANT, LIGHT_INFINITE, LIGHT_POINT, LIGHT_SPOT,
)
from .megakernel import (
    DPB, FLAG_FLIP_GEOM_N, FLAG_HAS_SHADING_N, INV_PI, LANES, LOBE_FRESNEL_SPEC,
    LOBE_LAMBERT_R, LOBE_MICRO_R, LOBE_NONE, LOBE_OREN_NAYAR, LOBE_PLASTIC,
    LOBE_SPEC_R, RAY_EPS, _concentric_disk, _dot3, _fresnel_dielectric_var,
    _ONE_MINUS_EPS, _gamma, _h, _norm3, _offset_ray, _pcg, _sample02, _u2f01,
    _vdc,
    bake_lobe_entry, make_mat_helpers,
)
from .pallas_bvh import SMEM_META_MAX_BYTES, _high_bit_index, _low_bit_index

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

SUB = 8  # packets (= sublane rows) per block; block = SUB*128 lanes
STACK = 72
EPS = 1e-4  # leaf-phase min-t, matches pallas_bvh / intersect.SHADOW_EPS
MAX_MATS = 16
MAX_LIGHTS = 8
# resident-table budget (node + prim + attr); v5e VMEM is ~16MB/core and the
# kernel needs headroom for scratch + path state
WIDE_VMEM_TABLE_BUDGET = 14 * 2 ** 20


def _sph_test(pr, ox, oy, oz, dx, dy, dz, t_query):
    """Full-sphere quadric test with baked constant transforms
    (megakernel._sph_test — kept in lockstep)."""
    m = pr["w2o"].astype(np.float64)
    r = pr["r"]

    def xf_p(m_, x, y, z):
        return (
            jnp.float32(m_[0][0]) * x + jnp.float32(m_[0][1]) * y + jnp.float32(m_[0][2]) * z + jnp.float32(m_[0][3]),
            jnp.float32(m_[1][0]) * x + jnp.float32(m_[1][1]) * y + jnp.float32(m_[1][2]) * z + jnp.float32(m_[1][3]),
            jnp.float32(m_[2][0]) * x + jnp.float32(m_[2][1]) * y + jnp.float32(m_[2][2]) * z + jnp.float32(m_[2][3]),
        )

    def xf_v(m_, x, y, z):
        return (
            jnp.float32(m_[0][0]) * x + jnp.float32(m_[0][1]) * y + jnp.float32(m_[0][2]) * z,
            jnp.float32(m_[1][0]) * x + jnp.float32(m_[1][1]) * y + jnp.float32(m_[1][2]) * z,
            jnp.float32(m_[2][0]) * x + jnp.float32(m_[2][1]) * y + jnp.float32(m_[2][2]) * z,
        )

    oox, ooy, ooz = xf_p(m, ox, oy, oz)
    odx, ody, odz = xf_v(m, dx, dy, dz)
    a = _dot3(odx, ody, odz, odx, ody, odz)
    b = 2.0 * _dot3(oox, ooy, ooz, odx, ody, odz)
    c = _dot3(oox, ooy, ooz, oox, ooy, ooz) - jnp.float32(r * r)
    disc = b * b - 4.0 * a * c
    has_root = disc > 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b < 0, -0.5 * (b - sq), -0.5 * (b + sq))
    safe = jnp.where(jnp.abs(q) > 1e-30, q, 1.0)
    t0 = q / jnp.where(jnp.abs(a) > 1e-30, a, 1e-30)
    t1 = c / safe
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    near_valid = has_root & (tn > EPS) & (tn < t_query)
    far_valid = has_root & (tf > EPS) & (tf < t_query)
    t = jnp.where(near_valid, tn, tf)
    hit = near_valid | far_valid
    px_ = oox + odx * t
    py_ = ooy + ody * t
    pz_ = ooz + odz * t
    return hit, t, (px_, py_, pz_)


def _sph_attrs(pr, p_loc):
    """surface_interaction sphere branch with constant transforms
    (megakernel._sph_attrs — kept in lockstep)."""
    r = pr["r"]
    o2w = pr["o2w"].astype(np.float64)
    w2o = pr["w2o"].astype(np.float64)
    px_o, py_o, pz_o = p_loc
    norm = jnp.sqrt(jnp.maximum(px_o * px_o + py_o * py_o + pz_o * pz_o, 1e-30))
    scale = jnp.float32(r) / jnp.maximum(norm, 1e-30)
    px_o, py_o, pz_o = px_o * scale, py_o * scale, pz_o * scale
    nx_o, ny_o, nz_o = px_o / jnp.float32(r), py_o / jnp.float32(r), pz_o / jnp.float32(r)
    ngx = jnp.float32(w2o[0][0]) * nx_o + jnp.float32(w2o[1][0]) * ny_o + jnp.float32(w2o[2][0]) * nz_o
    ngy = jnp.float32(w2o[0][1]) * nx_o + jnp.float32(w2o[1][1]) * ny_o + jnp.float32(w2o[2][1]) * nz_o
    ngz = jnp.float32(w2o[0][2]) * nx_o + jnp.float32(w2o[1][2]) * ny_o + jnp.float32(w2o[2][2]) * nz_o
    ngx, ngy, ngz = _norm3(ngx, ngy, ngz)
    if pr["flags"] & FLAG_FLIP_GEOM_N:
        ngx, ngy, ngz = -ngx, -ngy, -ngz
    pm = jnp.float32(pr["phimax"])
    dux_o, duy_o = -pm * py_o, pm * px_o
    dux = jnp.float32(o2w[0][0]) * dux_o + jnp.float32(o2w[0][1]) * duy_o
    duy = jnp.float32(o2w[1][0]) * dux_o + jnp.float32(o2w[1][1]) * duy_o
    duz = jnp.float32(o2w[2][0]) * dux_o + jnp.float32(o2w[2][1]) * duy_o
    dot_nd = _dot3(ngx, ngy, ngz, dux, duy, duz)
    sx_p = dux - ngx * dot_nd
    sy_p = duy - ngy * dot_nd
    sz_p = duz - ngz * dot_nd
    sl = jnp.sqrt(jnp.maximum(sx_p * sx_p + sy_p * sy_p + sz_p * sz_p, 0.0))
    ok = sl > 1e-9
    inv_sl = 1.0 / jnp.maximum(sl, 1e-20)
    sign = jnp.where(ngz >= 0.0, 1.0, -1.0)
    a_f = -1.0 / (sign + ngz)
    b_f = ngx * ngy * a_f
    fx = 1.0 + sign * ngx * ngx * a_f
    fy = sign * b_f
    fz = -sign * ngx
    ssx = jnp.where(ok, sx_p * inv_sl, fx)
    ssy = jnp.where(ok, sy_p * inv_sl, fy)
    ssz = jnp.where(ok, sz_p * inv_sl, fz)
    tsx = ngy * ssz - ngz * ssy
    tsy = ngz * ssx - ngx * ssz
    tsz = ngx * ssy - ngy * ssx
    pxw = jnp.float32(o2w[0][0]) * px_o + jnp.float32(o2w[0][1]) * py_o + jnp.float32(o2w[0][2]) * pz_o + jnp.float32(o2w[0][3])
    pyw = jnp.float32(o2w[1][0]) * px_o + jnp.float32(o2w[1][1]) * py_o + jnp.float32(o2w[1][2]) * pz_o + jnp.float32(o2w[1][3])
    pzw = jnp.float32(o2w[2][0]) * px_o + jnp.float32(o2w[2][1]) * py_o + jnp.float32(o2w[2][2]) * pz_o + jnp.float32(o2w[2][3])
    g53 = _gamma(5) + _gamma(3)
    g3 = _gamma(3)
    apx, apy, apz = jnp.abs(px_o), jnp.abs(py_o), jnp.abs(pz_o)
    errs = []
    for row in range(3):
        e = g53 * (abs(o2w[row][0]) * apx + abs(o2w[row][1]) * apy + abs(o2w[row][2]) * apz) \
            + g3 * abs(o2w[row][3])
        errs.append(e)
    return {"px": pxw, "py": pyw, "pz": pzw,
            "ngx": ngx, "ngy": ngy, "ngz": ngz,
            "nsx": ngx, "nsy": ngy, "nsz": ngz,
            "ssx": ssx, "ssy": ssy, "ssz": ssz,
            "tsx": tsx, "tsy": tsy, "tsz": tsz,
            # baked spheres carry no uv; eligibility rejects textured
            # sphere materials so these are never consumed
            "u": pxw * 0.0, "v": pxw * 0.0,
            "ex": errs[0], "ey": errs[1], "ez": errs[2]}


# ---------------------------------------------------------------------------
# Eligibility + constant extraction
# ---------------------------------------------------------------------------


def extract_wide_consts(cs, cam, icfg, scfg, fcfg):
    """Bake everything except geometry into constants, or None if the scene
    is outside this kernel's class (geometry rides the wide tables)."""
    sa, static, desc = cs.arrays, cs.static, cs.description
    if not getattr(static, "has_wide_tri", getattr(static, "has_wide", False)):
        return None
    wmeta = getattr(sa, "wmeta_tab", None)
    if wmeta is None or wmeta.shape[0] * 4 > SMEM_META_MAX_BYTES:
        return None
    # packet-coherence gate: persistent lanes are pixel-pinned, so from
    # bounce 2 each 128-lane packet's shared-stack traversal union
    # approaches the WHOLE tree on big meshes. Measured on a v5e chip:
    # 123k tris ran at 0.15 Mverts/s (vs multi-M on the XLA wavefront that
    # re-sorts rays every bounce and feeds the standalone pallas_bvh
    # kernel), and a full-film launch outlives the device watchdog, which
    # kills the kernel. Small scenes keep this tier: their whole tree fits
    # a handful of octets, so the union is cheap regardless of coherence.
    import os as _os

    if int(getattr(static, "n_tris", 0)) > int(
            _os.environ.get("PBRT_TPU_WIDEMEGA_MAX_TRIS", "4096")):
        return None
    if static.n_media or static.has_env_map:
        return None  # media and IMAGE env maps keep the XLA path; a
        # constant (imageless) infinite light is baked closed-form below
    if static.n_spheres > 8:
        return None
    if getattr(static, "has_motion", False) or getattr(static, "has_alpha", False):
        return None
    if getattr(static, "has_null_material", False) or getattr(static, "has_sss_media", False):
        return None
    if cam["kind"] != 0 or cam.get("anim") is not None or cam.get("realistic") is not None:
        return None
    if scfg["kind"] not in ("zerotwosequence", "lowdiscrepancy", "random",
                            "stratified", "halton", "sobol", "maxmindist"):
        return None
    if scfg["kind"] == "stratified" and float(_h(cam["lens_radius"])) != 0.0:
        return None  # lens dim 1 strata (rot + grid) not baked
    if scfg["kind"] == "halton":
        if scfg.get("halton") is None or float(_h(cam["lens_radius"])) != 0.0:
            return None  # lens dims need Faure-scrambled bases 5/7: not baked
    if scfg["kind"] == "sobol" and scfg.get("sobol") is None:
        return None  # global-index tables overflowed (huge film x spp)
    # unit-weight filters only (mitchell/sinc need per-sample f/p weights)
    if fcfg["filter"] not in ("box", "triangle", "gaussian"):
        return None
    # texture programs are checked per used material slot below (constant
    # folds into the baked lobe; matte-Kd checkerboard is baked as an
    # in-kernel select; anything else rejects)
    if static.n_lights > MAX_LIGHTS or static.n_lights == 0:
        return None

    prim_flags = _h(sa.prim_flags)
    has_ns = bool((prim_flags & FLAG_HAS_SHADING_N).any())
    has_attr = getattr(sa, "wattr_tab", None) is not None
    if has_ns and not has_attr:
        return None  # shading normals but no attr table (stale build)
    # host-side VMEM budget: the tables live resident in VMEM (~16MB/core);
    # reject early instead of paying a doomed Mosaic compile in the probe
    tab_bytes = int(sa.wnode_tab.size + sa.wprim_tab.size) * 4
    if has_attr:
        tab_bytes += int(sa.wattr_tab.size) * 4
    if tab_bytes > WIDE_VMEM_TABLE_BUDGET:
        return None
    # non-default UVs ride the attr table (uv lanes 9:15); without it the
    # in-kernel frame assumes the default parameterization (dpdu = v1 - v0)
    tri_uv = _h(sa.tri_uv)
    default_uv = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]], np.float32)
    if tri_uv.shape[0] and not np.array_equal(
            tri_uv, np.broadcast_to(default_uv, tri_uv.shape)) and not has_attr:
        return None

    strategy = str(icfg.get("light_strategy", "uniform"))
    n_l = static.n_lights
    if strategy == "spatial" and icfg.get("spatial_distribution") is not None and n_l > 1:
        return None  # voxel-grid lookup not baked
    uniform_select = not (n_l > 1 and strategy in ("power", "spatial"))
    if not uniform_select:
        from .lights import compute_power

        pw = _h(compute_power(sa, static))
        pmf = np.maximum(pw / max(pw.sum(), 1e-20), 1e-6)
        pmf = pmf / pmf.sum()
    else:
        pmf = np.full(max(n_l, 1), 1.0 / max(n_l, 1), np.float32)
    cdf = np.cumsum(pmf)

    light_kind = _h(sa.light_kind)
    light_param = _h(sa.light_param)
    light_prim = _h(sa.light_prim)
    prim_mat = _h(sa.prim_mat)
    prim_area = _h(sa.prim_area)
    prim_geom = _h(sa.prim_geom)
    tri_p = _h(sa.tri_p)
    lights = []
    for i in range(n_l):
        k = int(light_kind[i])
        if k in (LIGHT_POINT, LIGHT_DISTANT, LIGHT_SPOT, LIGHT_INFINITE):
            lights.append({"kind": k, "par": light_param[i].astype(float)})
        elif k == LIGHT_AREA:
            from ..scene.arrays import GEOM_SPHERE, QUADRIC_SPHERE

            pid = int(light_prim[i])
            if int(_h(sa.prim_kind)[pid]) == GEOM_SPHERE:
                # sphere area light: cone sampling outside, uniform area
                # inside (sphere.rs sample_interaction; lights.sample_li
                # cone_spheres branch). Needs the same full-sphere /
                # outward-orientation conditions as _sphere_cone_info.
                si_ = int(prim_geom[pid])
                if int(_h(sa.sph_kind)[si_]) != QUADRIC_SPHERE:
                    return None
                sp = _h(sa.sph_param)[si_]
                r_o = float(sp[0])
                if not (float(sp[1]) <= -r_o + 1e-6 * r_o
                        and float(sp[2]) >= r_o - 1e-6 * r_o
                        and float(sp[3]) >= 2 * np.pi - 1e-6):
                    return None
                if prim_flags[pid] & 4:  # reverse-oriented: emits inward
                    return None
                o2w_l = _h(sa.sph_o2w)[si_].astype(np.float64)
                w2o_l = _h(sa.sph_w2o)[si_].astype(np.float64)
                lights.append({
                    "kind": k, "par": light_param[i].astype(float),
                    "sphere": True, "pid": pid,
                    "c": o2w_l[:3, 3].tolist(),
                    "r": float(r_o * np.linalg.norm(o2w_l[:3, 0])),
                    "r_obj": r_o,
                    "o2w": o2w_l[:3, :4].tolist(),
                    "w2oT": w2o_l[:3, :3].T.tolist(),
                    "flip": bool(prim_flags[pid] & FLAG_FLIP_GEOM_N),
                    "area": float(prim_area[pid]),
                    "two_sided": bool(light_param[i][3] > 0),
                })
                continue
            v = tri_p[prim_geom[pid]].astype(np.float64)
            e1, e2 = v[1] - v[0], v[2] - v[0]
            ng = np.cross(e1, e2)
            ng = ng / max(np.linalg.norm(ng), 1e-30)
            if prim_flags[pid] & FLAG_FLIP_GEOM_N:
                ng = -ng
            lights.append({
                "kind": k, "par": light_param[i].astype(float), "v": v,
                "ng": ng, "area": float(prim_area[pid]),
                "two_sided": bool(light_param[i][3] > 0),
            })
        else:
            return None

    # baked full spheres (mixed scenes; megakernel.extract_consts pattern)
    from ..scene.arrays import QUADRIC_SPHERE

    spheres = []
    if static.n_spheres:
        sph_w2o = _h(sa.sph_w2o)
        sph_o2w = _h(sa.sph_o2w)
        sph_par = _h(sa.sph_param)
        sph_kind = _h(sa.sph_kind)
        sph_pid = _h(sa.sph_prim_ids)
        for i in range(sph_par.shape[0]):
            if int(sph_kind[i]) != QUADRIC_SPHERE:
                return None
            r = float(sph_par[i, 0])
            zmin, zmax, phimax = float(sph_par[i, 1]), float(sph_par[i, 2]), float(sph_par[i, 3])
            if not (zmin <= -r + 1e-7 * r and zmax >= r - 1e-7 * r and phimax >= 2 * np.pi - 1e-6):
                return None  # partial spheres keep the XLA clip path
            pid = int(sph_pid[i])
            li_ = int(_h(sa.prim_light)[pid])
            if li_ >= 0 and not (0 <= li_ < len(lights)
                                 and lights[li_].get("sphere")):
                return None  # light row wasn't baked as a sphere light
            spheres.append({
                "w2o": sph_w2o[i], "o2w": sph_o2w[i], "r": r, "phimax": phimax,
                "mat": int(prim_mat[pid]), "flags": int(prim_flags[pid]),
                "light": li_,
            })

    # material lobes baked exactly like megakernel.extract_consts
    from ..scene.arrays import MAT_MIX
    from .materials import make_bsdf

    if MAT_MIX in set(static.mat_kinds_present):
        # mix resolves its stochastic sub-material per hit; baking at a
        # fixed point would freeze the choice (materials.py:168-187)
        return None
    used_mats = sorted(set(int(m) for m in prim_mat))
    if len(used_mats) > MAX_MATS:
        return None
    n_mats = int(_h(sa.mat_kind).shape[0])
    lob = make_bsdf(sa, static, jnp.arange(n_mats, dtype=jnp.int32),
                    jnp.zeros((n_mats, 2), F32), jnp.zeros((n_mats, 3), F32))
    lk = _h(lob["kind"])
    ld = _h(lob["data"])
    # per-used-material texture programs: constants fold into the baked
    # lobe (make_bsdf above evaluated them); a matte-Kd 2D-uv checkerboard
    # over nonblack constant children becomes an in-kernel select; anything
    # else keeps the XLA path
    from ..scene.arrays import P_KD

    mat_tex_h = _h(sa.mat_tex)
    tex_param_h = _h(sa.tex_param) if mat_tex_h.size else None
    mats = {}
    for m in used_mats:
        kd_tex = None
        for slot in range(mat_tex_h.shape[1]):
            tid = int(mat_tex_h[m, slot])
            if tid < 0:
                continue
            prog = static.tex_programs[tid]
            if prog.kind == "constant":
                continue
            if (slot == P_KD and prog.kind == "checkerboard"
                    and prog.dimension == 2 and prog.mapping == "uv"
                    and prog.tex1 < 0 and prog.tex2 < 0):
                par = tex_param_h[tid]
                c1 = np.clip(par[10:13], 0.0, 1.0)
                c2 = np.clip(par[13:16], 0.0, 1.0)
                # both cells must be nonblack: the lobe table was baked at
                # uv=(0,0), so spatially-varying lobe PRESENCE can't be
                # represented (only the color varies in-kernel)
                if not (c1.max() > 0 and c2.max() > 0):
                    return None
                kd_tex = {"us": float(par[0]), "vs": float(par[1]),
                          "du": float(par[2]), "dv": float(par[3]),
                          "c1": c1.astype(float).tolist(),
                          "c2": c2.astype(float).tolist()}
                continue
            return None
        slots = np.nonzero(lk[m])[0]
        if len(slots) == 0:
            mats[m] = {"lobe": LOBE_NONE}
            continue
        kinds = [int(lk[m, s]) for s in slots]
        entry = bake_lobe_entry(kinds, [int(s) for s in slots], ld[m], kd_tex)
        if entry is None:
            return None
        mats[m] = entry
    # baked-sphere hits carry no uv; their materials must be untextured
    if any(mats[s_["mat"]].get("kd_tex") for s_ in spheres):
        return None

    r2c = _h(cam["raster_to_camera"]).astype(np.float64)
    c2w = _h(cam["camera_to_world"]).astype(np.float64)
    return {
        "has_ns": has_ns,
        "has_attr": has_attr,
        "mats": mats,
        "lights": lights,
        "spheres": spheres,
        "light_cdf": cdf.astype(float).tolist(),
        "light_pmf": pmf.astype(float).tolist(),
        "uniform_select": uniform_select,
        "world_radius": float(_h(sa.world_radius)),
        "wide_root": int(static.wide_root),
        "r2c": r2c,
        "c2w": c2w,
        "lens_radius": float(_h(cam["lens_radius"])),
        "focal_distance": float(_h(cam["focal_distance"])),
        "filter": fcfg["filter"],
        "filter_params": dict(fcfg["filter_params"]),
        "filter_xw": float(fcfg["filter_params"].get("xwidth", 0.5)),
        "filter_yw": float(fcfg["filter_params"].get("ywidth", fcfg["filter_params"].get("xwidth", 0.5))),
        "max_depth": int(icfg["max_depth"]),
        "rr_threshold": float(icfg.get("rr_threshold", 1.0)),
        "sampler": scfg["kind"],
        "spp": int(scfg["spp"]),
        # halton film enumeration constants (the per-pixel CRT offset table
        # rides as a per-lane kernel input, gathered once per wave call)
        "halton": ({"stride": int(scfg["halton"]["stride"]),
                    "sx": int(scfg["halton"]["sx"]),
                    "sy": int(scfg["halton"]["sy"])}
                   if scfg["kind"] == "halton" else None),
        # global-Sobol film enumeration: the GF(2) index inversion and the
        # dim 0..3 generator columns bake to unrolled u32 XOR selects
        # (sampler.sobol_global_index / sobol_dim; sobol.rs:61-75)
        "sobol": (_bake_sobol(scfg["sobol"]) if scfg["kind"] == "sobol" else None),
        # MaxMinDist film-dim matrix (sampler.maxmin_2d_dim0; lens + traced
        # dims already share the generic (0,2) keying)
        "maxmin": (_bake_maxmin(int(scfg["spp"]))
                   if scfg["kind"] == "maxmindist" else None),
        "max_lum": float(fcfg.get("max_sample_luminance", float("inf"))),
    }


def _bake_maxmin(spp: int):
    from .sampler import maxmin_matrix

    k = max(int(math.ceil(math.log2(max(spp, 1)))), 0)
    cols = maxmin_matrix(k)
    return {"n": 1 << k, "cols": tuple(int(c) for c in cols)}


def _bake_sobol(aux):
    """Kernel constants for the global-Sobol film enumeration: the
    sampler.sobol_tables dict plus generator columns for dims 0..3
    (film jitter x/y + lens u/v)."""
    from ..core.sobolmat import matrix

    return {
        "m": int(aux["m"]),
        "res": int(aux["res"]),
        "inv_cols": tuple(int(c) for c in aux["inv_cols"]),
        "delta_cols": tuple(int(c) for c in aux["delta_cols"]),
        "n_frame_bits": int(aux["n_frame_bits"]),
        "cols": tuple(tuple(int(c) for c in matrix(d)) for d in range(4)),
    }


def wide_megakernel_eligible(cs, cam, icfg, scfg, fcfg) -> bool:
    try:
        return extract_wide_consts(cs, cam, icfg, scfg, fcfg) is not None
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Kernel body
# ---------------------------------------------------------------------------


def _build_kernel(consts, n_samples: int):
    mats = consts["mats"]
    spheres = consts.get("spheres", [])
    lights = consts["lights"]
    n_lights = len(lights)
    max_depth = consts["max_depth"]
    rr_threshold = consts["rr_threshold"]
    is_random = consts["sampler"] in ("random", "stratified")
    has_attr = bool(consts.get("has_attr", False))
    # best_ref rows per packet: 16, +15 winner attr channels (9 per-vertex
    # normals + 6 uvs) when the scene carries an attr table (rounded to 32
    # to keep packet starts sublane-aligned)
    ROWS = 32 if has_attr else 16
    halton_cfg = consts.get("halton")
    sobol_cfg = consts.get("sobol")
    maxmin_cfg = consts.get("maxmin")
    is_stratified = consts["sampler"] == "stratified"
    spp_cfg = max(int(consts.get("spp", 1)), 1)
    strat_xs = max(int(math.floor(math.sqrt(spp_cfg))), 1)
    strat_ys = max(spp_cfg // strat_xs, 1)
    r2c = consts["r2c"]
    c2w = consts["c2w"]
    wr2 = 2.0 * consts["world_radius"]
    fxw, fyw = consts["filter_xw"], consts["filter_yw"]
    max_lum = consts["max_lum"]
    cap = n_samples * (max_depth + 2) + 8

    mat_rows = sorted(mats)
    any_on = any(mats[m]["lobe"] == LOBE_OREN_NAYAR for m in mat_rows)
    any_diffuse = any_on or any(
        mats[m]["lobe"] in (LOBE_LAMBERT_R, LOBE_PLASTIC) for m in mat_rows)
    any_mirror = any(mats[m]["lobe"] == LOBE_SPEC_R for m in mat_rows)
    any_glass = any(mats[m]["lobe"] == LOBE_FRESNEL_SPEC for m in mat_rows)
    any_micro = any(mats[m]["lobe"] in (LOBE_MICRO_R, LOBE_PLASTIC) for m in mat_rows)
    any_plastic = any(mats[m]["lobe"] == LOBE_PLASTIC for m in mat_rows)
    any_fr_die = any(mats[m]["lobe"] in (LOBE_MICRO_R, LOBE_PLASTIC)
                     and mats[m]["fr_m"] == 1 for m in mat_rows)
    any_fr_con = any(mats[m]["lobe"] in (LOBE_MICRO_R, LOBE_PLASTIC)
                     and mats[m]["fr_m"] == 2 for m in mat_rows)
    any_area = any(lt["kind"] == LIGHT_AREA for lt in lights)
    # at most one infinite light (scene/builder keeps a single env row)
    inf_idx = next((i for i, lt in enumerate(lights)
                    if lt["kind"] == LIGHT_INFINITE), -1)
    INV_4PI = 1.0 / (4.0 * math.pi)

    def _falsev(like):
        return jnp.zeros(like.shape, I32) == 1

    def _sel16(blk, j):
        return jax.lax.switch(j, tuple(
            (lambda ss: (lambda: blk[:, ss * 16:(ss + 1) * 16]))(sl) for sl in range(8)
        ))

    H = make_mat_helpers(mats, mat_rows)
    mat_select = H.mat_select
    mat_color = H.mat_color
    mat_mask = H.mat_mask
    mat_mask_in = H.mat_mask_in
    _ggx_sample_wh_ch = H.ggx_sample_wh
    micro_f_pdf = H.micro_f_pdf
    on_factor = H.on_factor


    # -- traced-dimension samples (per-lane bounce dims). These mirror
    # sampler.sample_1d/sample_2d's traced-dim branches value-for-value:
    # halton/sobol continue the REAL low-discrepancy sequences into the
    # bounce dims (sampler.radical_inverse_dyn / sobol_dim_dyn), the (0,2)
    # family keeps the generic hash keying (halton.rs:120-156 /
    # sobol.rs:61-75 semantics).
    kind_s = consts["sampler"]
    if kind_s == "halton":
        from . import rng as _rngmod

        _PRIMES_I = [int(p) for p in _rngmod.PRIMES]
        _NPRIMES = len(_PRIMES_I)

        def _prime_at(idx_i32):
            """PRIMES[clip(idx, 0, 99)] per lane via ascending select chain
            (Mosaic has no per-lane vector gather)."""
            bf = jnp.full(idx_i32.shape, float(_PRIMES_I[0]), F32)
            for k in range(1, _NPRIMES):
                bf = jnp.where(idx_i32 >= k, jnp.float32(float(_PRIMES_I[k])), bf)
            return bf

        def _ri_dyn(base_idx_i32, s_cur):
            """rng.radical_inverse_dyn with the prime gathered per lane.

            The digit loop runs in f32 with an exact corrected division
            (all intermediates are integers < 2^24, so the f32 digits are
            bit-identical to the XLA path's uint32 division)."""
            bf = _prime_at(base_idx_i32)
            inv_base = jnp.float32(1.0) / bf
            idxf = pltpu.bitcast(s_cur, I32).astype(F32)
            rd = jnp.zeros(idxf.shape, F32)
            ibn = jnp.ones(idxf.shape, F32)
            for _ in range(32):
                q = jnp.floor(idxf * inv_base)
                r = idxf - q * bf
                q = jnp.where(r < 0, q - 1, q)
                r = jnp.where(r < 0, r + bf, r)
                qq = jnp.where(r >= bf, q + 1, q)
                r = jnp.where(r >= bf, r - bf, r)
                has = idxf > 0
                rd = jnp.where(has, rd * bf + r, rd)
                ibn = jnp.where(has, ibn * inv_base, ibn)
                idxf = qq
            return jnp.minimum(rd * ibn, jnp.float32(_ONE_MINUS_EPS))

        def sample_1d_traced(hbase, s_cur, dim_i32):
            b0 = jnp.minimum(2 * dim_i32, _NPRIMES - 2)
            u = _ri_dyn(b0, s_cur) + \
                _u2f01(_pcg(hbase ^ (U32(2) * dim_i32.astype(U32))))
            return jnp.where(u >= 1.0, u - 1.0, u)

        def sample_2d_traced(hbase, s_cur, dim_i32):
            b0 = jnp.minimum(2 * dim_i32, _NPRIMES - 2)
            u1 = _ri_dyn(b0, s_cur)
            u2 = _ri_dyn(b0 + 1, s_cur)
            u1 = u1 + _u2f01(_pcg(hbase ^ (U32(2) * dim_i32.astype(U32))))
            u2 = u2 + _u2f01(_pcg(hbase ^ (U32(2) * dim_i32.astype(U32) + U32(1))))
            return (jnp.where(u1 >= 1.0, u1 - 1.0, u1),
                    jnp.where(u2 >= 1.0, u2 - 1.0, u2))
    elif kind_s == "sobol":
        from ..core.sobolmat import matrix as _sobmat

        _SOB_MAX_DIM = 64
        _SOB_COLS = [[int(c) for c in _sobmat(k)] for k in range(_SOB_MAX_DIM)]

        def _sobol_dyn(d_i32, s_cur, scr):
            """sampler.sobol_dim_dyn: generator columns selected per lane
            over the 64-dim table (select chain instead of a gather); the
            32 index-bit tests are hoisted across candidates."""
            d = jnp.clip(d_i32, 0, _SOB_MAX_DIM - 1)
            bits = [((s_cur >> U32(j)) & U32(1)) > 0 for j in range(32)]
            res = scr
            for dd in range(_SOB_MAX_DIM):
                val = jnp.zeros(s_cur.shape, U32)
                for j in range(32):
                    c = _SOB_COLS[dd][j]
                    if c == 0:
                        continue
                    val = val ^ jnp.where(bits[j], U32(c), U32(0))
                res = res ^ jnp.where(d == dd, val, U32(0))
            return _u2f01(res)

        def sample_1d_traced(hbase, s_cur, dim_i32):
            d2u = U32(2) * dim_i32.astype(U32)
            return _sobol_dyn(2 * dim_i32, s_cur, _pcg(hbase ^ d2u))

        def sample_2d_traced(hbase, s_cur, dim_i32):
            d2u = U32(2) * dim_i32.astype(U32)
            return (_sobol_dyn(2 * dim_i32, s_cur, _pcg(hbase ^ d2u)),
                    _sobol_dyn(2 * dim_i32 + 1, s_cur, _pcg(hbase ^ (d2u + U32(1)))))
    else:
        def sample_1d_traced(hbase, s_cur, dim_i32):
            if is_random:
                h = _pcg(hbase ^ s_cur)
                return _u2f01(_pcg(h ^ (U32(1024) + dim_i32.astype(U32))))
            s = _pcg(hbase ^ (U32(4096) + dim_i32.astype(U32)))
            return _vdc(s_cur, s)

        def sample_2d_traced(hbase, s_cur, dim_i32):
            if is_random:
                h = _pcg(hbase ^ s_cur)
                u1 = _u2f01(_pcg(h ^ (U32(2) * dim_i32.astype(U32))))
                u2 = _u2f01(_pcg(h ^ (U32(2) * dim_i32.astype(U32) + U32(1))))
                return u1, u2
            d2 = U32(2) * dim_i32.astype(U32)
            s1 = _pcg(hbase ^ d2)
            s2 = _pcg(hbase ^ (d2 + U32(1)))
            return _sample02(s_cur, s1, s2)

    lens_r = consts["lens_radius"]
    focal = consts["focal_distance"]
    filter_name = consts.get("filter", "box")
    fparams = consts.get("filter_params", {})

    def _erfinv(x):
        # Winitzki approximation (render._erfinv — kept in lockstep)
        a = 0.147
        ln1 = jnp.log(jnp.maximum(1.0 - x * x, 1e-30))
        t1 = 2.0 / (jnp.pi * a) + ln1 / 2.0
        return jnp.sign(x) * jnp.sqrt(jnp.maximum(jnp.sqrt(t1 * t1 - ln1 / a) - t1, 0.0))

    def filter_xy(u1, u2):
        """render.filter_offset for the unit-weight filters."""
        if filter_name == "triangle":
            import math as _math

            r = fparams.get("xwidth", 2.0)
            ry = fparams.get("ywidth", r)

            def tent(u):
                return jnp.where(u < 0.5,
                                 jnp.sqrt(jnp.maximum(2.0 * u, 0.0)) - 1.0,
                                 1.0 - jnp.sqrt(jnp.maximum(2.0 - 2.0 * u, 0.0)))

            return tent(u1) * jnp.float32(r), tent(u2) * jnp.float32(ry)
        if filter_name == "gaussian":
            import math as _math

            r = fparams.get("xwidth", 2.0)
            ry = fparams.get("ywidth", r)
            alpha = fparams.get("alpha", 2.0)
            sigma = 1.0 / _math.sqrt(2.0 * alpha)
            k = jnp.float32(sigma * _math.sqrt(2.0))
            dx = jnp.clip(k * _erfinv(2.0 * u1 - 1.0), -r, r)
            dy = jnp.clip(k * _erfinv(2.0 * u2 - 1.0), -ry, ry)
            return dx, dy
        return (2.0 * u1 - 1.0) * jnp.float32(fxw), (2.0 * u2 - 1.0) * jnp.float32(fyw)

    def camera_ray(pxf, pyf, ul1=None, ul2=None):
        cx = jnp.float32(r2c[0][0]) * pxf + jnp.float32(r2c[0][1]) * pyf + jnp.float32(r2c[0][3])
        cy = jnp.float32(r2c[1][0]) * pxf + jnp.float32(r2c[1][1]) * pyf + jnp.float32(r2c[1][3])
        cz = jnp.float32(r2c[2][0]) * pxf + jnp.float32(r2c[2][1]) * pyf + jnp.float32(r2c[2][3])
        w = jnp.float32(r2c[3][0]) * pxf + jnp.float32(r2c[3][1]) * pyf + jnp.float32(r2c[3][3])
        inv_w = 1.0 / w
        cx, cy, cz = cx * inv_w, cy * inv_w, cz * inv_w
        dx, dy, dz = _norm3(cx, cy, cz)
        if lens_r > 0:
            # thin-lens DoF (camera.generate_rays / perspective.rs)
            llx, lly = _concentric_disk(ul1, ul2)
            llx = jnp.float32(lens_r) * llx
            lly = jnp.float32(lens_r) * lly
            ft = jnp.float32(focal) / jnp.maximum(dz, 1e-9)
            fx_, fy_, fz_ = dx * ft, dy * ft, dz * ft
            dx, dy, dz = _norm3(fx_ - llx, fy_ - lly, fz_)
            ocx, ocy, ocz = llx, lly, jnp.zeros_like(llx)
        else:
            ocx = ocy = ocz = jnp.zeros_like(pxf)
        wx = jnp.float32(c2w[0][0]) * dx + jnp.float32(c2w[0][1]) * dy + jnp.float32(c2w[0][2]) * dz
        wy = jnp.float32(c2w[1][0]) * dx + jnp.float32(c2w[1][1]) * dy + jnp.float32(c2w[1][2]) * dz
        wz = jnp.float32(c2w[2][0]) * dx + jnp.float32(c2w[2][1]) * dy + jnp.float32(c2w[2][2]) * dz
        wx, wy, wz = _norm3(wx, wy, wz)
        ox = jnp.float32(c2w[0][0]) * ocx + jnp.float32(c2w[0][1]) * ocy + jnp.float32(c2w[0][2]) * ocz + jnp.float32(c2w[0][3])
        oy = jnp.float32(c2w[1][0]) * ocx + jnp.float32(c2w[1][1]) * ocy + jnp.float32(c2w[1][2]) * ocz + jnp.float32(c2w[1][3])
        oz = jnp.float32(c2w[2][0]) * ocx + jnp.float32(c2w[2][1]) * ocy + jnp.float32(c2w[2][2]) * ocz + jnp.float32(c2w[2][3])
        return ox, oy, oz, wx, wy, wz

    def _reverse_bits(x):
        # rng.reverse_bits_32 (kept in lockstep)
        x = (x << U32(16)) | (x >> U32(16))
        x = ((x & U32(0x00FF00FF)) << U32(8)) | ((x & U32(0xFF00FF00)) >> U32(8))
        x = ((x & U32(0x0F0F0F0F)) << U32(4)) | ((x & U32(0xF0F0F0F0)) >> U32(4))
        x = ((x & U32(0x33333333)) << U32(2)) | ((x & U32(0xCCCCCCCC)) >> U32(2))
        x = ((x & U32(0x55555555)) << U32(1)) | ((x & U32(0xAAAAAAAA)) >> U32(1))
        return x

    def _ri_base3(idx):
        # rng.radical_inverse base 3 (21 digits cover 2^32; f32 accumulation
        # per the same argument as the XLA version)
        rd = jnp.zeros(idx.shape, F32)
        ibn = jnp.ones(idx.shape, F32)
        for _ in range(21):
            nxt = idx // U32(3)
            digit = idx - nxt * U32(3)
            has = idx > U32(0)
            rd = jnp.where(has, rd * 3.0 + digit.astype(I32).astype(F32), rd)
            ibn = jnp.where(has, ibn * jnp.float32(1.0 / 3.0), ibn)
            idx = nxt
        return jnp.minimum(rd * ibn, jnp.float32(1.0 - 2.0 ** -24))

    def _sobol_bits(idx, cols):
        """Sobol' value at `idx` for one baked generator-column tuple
        (sampler.sobol_dim with scramble 0, unrolled)."""
        res_u = jnp.zeros(idx.shape, U32)
        for j in range(32):
            c = int(cols[j])
            if c == 0:
                continue
            res_u = res_u ^ jnp.where(((idx >> U32(j)) & U32(1)) > 0, U32(c), U32(0))
        return _u2f01(res_u)

    def _sobol_index(px_f, py_f, s_sel):
        """Global Sobol index landing in pixel (px, py) at frame s_sel
        (sampler.sobol_global_index, baked constants)."""
        m = sobol_cfg["m"]
        frame = s_sel
        delta = jnp.zeros(frame.shape, U32)
        for c in range(sobol_cfg["n_frame_bits"]):
            delta = delta ^ jnp.where(((frame >> U32(c)) & U32(1)) > 0,
                                      U32(sobol_cfg["delta_cols"][c]), U32(0))
        b = (px_f.astype(I32).astype(U32)
             | (py_f.astype(I32).astype(U32) << U32(m))) ^ delta
        low = jnp.zeros(b.shape, U32)
        for j in range(2 * m):
            low = low ^ jnp.where(((b >> U32(j)) & U32(1)) > 0,
                                  U32(sobol_cfg["inv_cols"][j]), U32(0))
        return (frame << U32(2 * m)) | low

    def regen(hbase, px_f, py_f, s_sel, hoff=None):
        sob_idx = None
        if sobol_cfg is not None:
            # sampler.sobol_film_jitter: in-pixel offsets of the global point
            sob_idx = _sobol_index(px_f, py_f, s_sel)
            res_f = float(sobol_cfg["res"])
            x = _sobol_bits(sob_idx, sobol_cfg["cols"][0]) * jnp.float32(res_f) - px_f
            y = _sobol_bits(sob_idx, sobol_cfg["cols"][1]) * jnp.float32(res_f) - py_f
            u1 = jnp.clip(x, 0.0, 1.0 - 1e-6)
            u2 = jnp.clip(y, 0.0, 1.0 - 1e-6)
        elif maxmin_cfg is not None:
            # sampler.maxmin_2d_dim0: x = (i+.5)/n CP-rotated per pixel,
            # y = searched generator matrix, XOR-scrambled per pixel
            n_mm = maxmin_cfg["n"]
            i_mm = s_sel % U32(n_mm)
            y_mm = jnp.zeros(i_mm.shape, U32)
            for j, c in enumerate(maxmin_cfg["cols"]):
                if c:
                    y_mm = y_mm ^ jnp.where(((i_mm >> U32(j)) & U32(1)) > 0,
                                            U32(c), U32(0))
            y_mm = y_mm ^ _pcg(hbase ^ U32(0x51D))
            u1 = ((i_mm.astype(F32) + 0.5) / jnp.float32(n_mm)
                  + _u2f01(_pcg(hbase ^ U32(0xC9))))
            u1 = jnp.where(u1 >= 1.0, u1 - 1.0, u1)
            u2 = _u2f01(y_mm)
        elif halton_cfg is not None:
            # halton_film_jitter: global index = offset[pixel] + s * stride,
            # film jitter = fract(ri2 * 2^j), fract(ri3 * 3^k)
            idx = hoff + s_sel * U32(halton_cfg["stride"])
            x = _u2f01(_reverse_bits(idx)) * jnp.float32(halton_cfg["sx"])
            y = _ri_base3(idx) * jnp.float32(halton_cfg["sy"])
            u1 = x - jnp.floor(x)
            u2 = y - jnp.floor(y)
        elif is_random:
            h = _pcg(hbase ^ s_sel)
            u1 = _u2f01(_pcg(h ^ U32(0)))
            u2 = _u2f01(_pcg(h ^ U32(1)))
            if is_stratified:
                # jittered strata on the film dim (sampler.sample_2d
                # stratified, dim 0: idx = sample, no rotation)
                idx = s_sel.astype(I32) % jnp.int32(strat_xs * strat_ys)
                sxs = (idx % strat_xs).astype(F32)
                sys_ = ((idx // strat_xs) % strat_ys).astype(F32)
                u1 = (sxs + u1) / jnp.float32(strat_xs)
                u2 = (sys_ + u2) / jnp.float32(strat_ys)
        else:
            s1 = _pcg(hbase ^ U32(0))
            s2 = _pcg(hbase ^ U32(1))
            u1, u2 = _sample02(s_sel, s1, s2)
        dx, dy = filter_xy(u1, u2)
        if lens_r > 0:
            # lens dims = static dim 1 (make_regen samples dim 1 always;
            # unused streams are keyed, not sequential, so pinhole needn't
            # burn them)
            if sobol_cfg is not None:
                # sampler.sobol_dim_2d(aux, px, py, s, 1) = dims 2/3
                ul1 = _sobol_bits(sob_idx, sobol_cfg["cols"][2])
                ul2 = _sobol_bits(sob_idx, sobol_cfg["cols"][3])
            elif is_random:
                h = _pcg(hbase ^ s_sel)
                ul1 = _u2f01(_pcg(h ^ U32(2)))
                ul2 = _u2f01(_pcg(h ^ U32(3)))
            else:
                l1 = _pcg(hbase ^ U32(2))
                l2 = _pcg(hbase ^ U32(3))
                ul1, ul2 = _sample02(s_sel, l1, l2)
            return camera_ray(px_f + 0.5 + dx, py_f + 0.5 + dy, ul1, ul2)
        return camera_ray(px_f + 0.5 + dx, py_f + 0.5 + dy)

    def power_heuristic(f_pdf, g_pdf):
        f2 = f_pdf * f_pdf
        g2 = g_pdf * g_pdf
        return jnp.where(f_pdf > 0, f2 / jnp.maximum(f2 + g2, 1e-30), 0.0)

    # -- the kernel ------------------------------------------------------

    def kernel(scal_ref, px_ref, py_ref, pid_ref, aux0_ref, meta_ref, nodes_ref, prims_ref,
               attrs_ref, out_lr, out_lg, out_lb, out_w, out_nv,
               stack_ref, sp_ref, dirb_ref, best_ref):
        n_node_rows = nodes_ref.shape[0]
        n_prim_rows = prims_ref.shape[0]
        iota16 = jax.lax.broadcasted_iota(I32, (16, LANES), 0)
        iota8c = jax.lax.broadcasted_iota(I32, (8, 1), 0)
        pw2 = (1 << iota8c).astype(F32)
        # best_ref layout per packet g (ROWS rows at g*ROWS): 0 t, 1 prim,
        # 2 b1, 3 b2, 4..12 v0/v1/v2 xyz, 13 mat, 14 light, 15 flags;
        # has_ns adds 16..24 = winner per-vertex normals n0/n1/n2 xyz

        def traverse(ox, oy, oz, dx, dy, dz, t_query, any_hit):
            """Joint interleaved traversal over the SUB sublane-row packets.

            Inputs are (SUB, LANES) values; returns a dict of (SUB, LANES)
            values (see best_ref layout) or, for any_hit, (t, prim)."""
            inv_dx = 1.0 / jnp.where(jnp.abs(dx) < 1e-30, jnp.where(dx < 0, -1e-30, 1e-30), dx)
            inv_dy = 1.0 / jnp.where(jnp.abs(dy) < 1e-30, jnp.where(dy < 0, -1e-30, 1e-30), dy)
            inv_dz = 1.0 / jnp.where(jnp.abs(dz) < 1e-30, jnp.where(dz < 0, -1e-30, 1e-30), dz)
            # watertight permute/shear constants (triangle.rs:136-399)
            adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
            k0 = (adx >= ady) & (adx >= adz)
            k1 = (~k0) & (ady >= adz)
            dkx = jnp.where(k0, dy, jnp.where(k1, dz, dx))
            dky = jnp.where(k0, dz, jnp.where(k1, dx, dy))
            dkz = jnp.where(k0, dx, jnp.where(k1, dy, dz))
            inv_dkz = 1.0 / jnp.where(jnp.abs(dkz) < 1e-30,
                                      jnp.where(dkz < 0, -1e-30, 1e-30), dkz)
            sx = -dkx * inv_dkz
            sy = -dky * inv_dkz
            sz = inv_dkz
            live = t_query > 0

            # per-packet init
            for g in range(SUB):
                stack_ref[g * STACK] = (0 << 9) | (1 << 1) | 0
                sp_ref[g] = jnp.where(jnp.max(jnp.where(live[g:g + 1, :], 1.0, 0.0)) > 0, 1, 0)
                b = g * ROWS
                best_ref[b:b + 1, :] = jnp.where(live[g:g + 1, :], t_query[g:g + 1, :], -1.0)
                best_ref[b + 1:b + 2, :] = jnp.full((1, LANES), -1.0, F32)
                if not any_hit:
                    best_ref[b + 2:b + ROWS, :] = jnp.zeros((ROWS - 2, LANES), F32)
                neg0 = jnp.sum(jnp.where(dx[g:g + 1, :] < 0, -1.0, 1.0)) < 0
                neg1 = jnp.sum(jnp.where(dy[g:g + 1, :] < 0, -1.0, 1.0)) < 0
                neg2 = jnp.sum(jnp.where(dz[g:g + 1, :] < 0, -1.0, 1.0)) < 0
                dirb_ref[g] = (neg0.astype(I32) | (neg1.astype(I32) << 1)
                               | (neg2.astype(I32) << 2))

            def cond(state):
                it, alive = state
                return (alive > 0) & (it < 1_000_000)

            def body(state):
                it, _ = state
                for g in range(SUB):
                    b = g * ROWS
                    base = g * STACK
                    sp = sp_ref[g]
                    alive = sp > 0
                    spc = jnp.maximum(sp, 1)
                    top = stack_ref[base + spc - 1]
                    dirb = top & 1
                    m = (top >> 1) & 255
                    pn = top >> 9
                    k = jnp.where(dirb > 0, _high_bit_index(m), _low_bit_index(m))
                    m2 = m & (~(1 << k))
                    wtop = jnp.where(alive, base + spc - 1, base + STACK - 1)
                    stack_ref[wtop] = (pn << 9) | (m2 << 1) | dirb
                    sp_pop = jnp.where(m2 == 0, spc - 1, spc)
                    e = meta_ref[pn * 8 + k]
                    is_int = alive & (e > 0)
                    is_leaf = alive & (e < 0)

                    oxg, oyg, ozg = ox[g:g + 1, :], oy[g:g + 1, :], oz[g:g + 1, :]
                    ixg, iyg, izg = inv_dx[g:g + 1, :], inv_dy[g:g + 1, :], inv_dz[g:g + 1, :]
                    t_best = best_ref[b:b + 1, :]

                    # interior phase (masked)
                    nid = e & 0x1FFFFF
                    axis_i = e >> 21
                    nrow = jnp.minimum((nid // 8) * 8, n_node_rows - 8)
                    nblk = nodes_ref[pl.ds(nrow, 8), :]
                    nsub = _sel16(nblk, nid % 8)
                    t0x = (nsub[:, 0:1] - oxg) * ixg
                    t1x = (nsub[:, 3:4] - oxg) * ixg
                    t0y = (nsub[:, 1:2] - oyg) * iyg
                    t1y = (nsub[:, 4:5] - oyg) * iyg
                    t0z = (nsub[:, 2:3] - ozg) * izg
                    t1z = (nsub[:, 5:6] - ozg) * izg
                    tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                                     jnp.minimum(t0z, t1z))
                    tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                                     jnp.maximum(t0z, t1z)) * 1.0000004
                    bhit = (tn <= tf) & (tf > 0) & (tn < t_best)
                    meta_col = nsub[:, 6:7]
                    anyc = jnp.max(jnp.where(bhit, 1.0, 0.0), axis=1, keepdims=True) * \
                        jnp.where(meta_col != 0, 1.0, 0.0)
                    mask_new = jnp.sum(anyc * pw2).astype(I32)
                    dir_new = (dirb_ref[g] >> axis_i) & 1
                    do_push = is_int & (mask_new != 0)
                    wslot = jnp.where(do_push, base + sp_pop, base + STACK - 1)
                    stack_ref[wslot] = (nid << 9) | (mask_new << 1) | dir_new

                    # leaf phase (masked)
                    o_ = jnp.maximum(-e - 1, 0)
                    prow = jnp.minimum((o_ // 8) * 8, n_prim_rows - 8)
                    pblk = prims_ref[pl.ds(prow, 8), :]
                    psub = jnp.concatenate(
                        [_sel16(pblk, o_ % 8), _sel16(pblk, o_ % 8 + 1)], axis=0)
                    valid = psub[:, 9:10] > 0

                    def _shear(j):
                        vx = psub[:, 3 * j:3 * j + 1] - oxg
                        vy = psub[:, 3 * j + 1:3 * j + 2] - oyg
                        vz = psub[:, 3 * j + 2:3 * j + 3] - ozg
                        px_ = jnp.where(k0[g:g + 1, :], vy, jnp.where(k1[g:g + 1, :], vz, vx))
                        py_ = jnp.where(k0[g:g + 1, :], vz, jnp.where(k1[g:g + 1, :], vx, vy))
                        pz_ = jnp.where(k0[g:g + 1, :], vx, jnp.where(k1[g:g + 1, :], vy, vz))
                        return (px_ + sx[g:g + 1, :] * pz_,
                                py_ + sy[g:g + 1, :] * pz_,
                                sz[g:g + 1, :] * pz_)

                    x0, y0, z0 = _shear(0)
                    x1, y1, z1 = _shear(1)
                    x2, y2, z2 = _shear(2)
                    e0 = x1 * y2 - y1 * x2
                    e1_ = x2 * y0 - y2 * x0
                    e2_ = x0 * y1 - y0 * x1
                    same = ((e0 >= 0) & (e1_ >= 0) & (e2_ >= 0)) | \
                        ((e0 <= 0) & (e1_ <= 0) & (e2_ <= 0))
                    det = e0 + e1_ + e2_
                    dok = det != 0
                    inv = 1.0 / jnp.where(dok, det, 1.0)
                    t = (e0 * z0 + e1_ * z1 + e2_ * z2) * inv
                    phit = valid & same & dok & (t > EPS) & (t < t_best)
                    tc = jnp.where(phit, t, jnp.float32(1e30))
                    tmin = jnp.min(tc, axis=0, keepdims=True)
                    improved = is_leaf & (tmin < jnp.minimum(t_best, jnp.float32(1e29)))
                    slotf = (o_ * 8 + iota16).astype(F32)
                    snew = jnp.max(jnp.where(tc == tmin, slotf, -1.0), axis=0, keepdims=True)
                    best_ref[b:b + 1, :] = jnp.where(improved, tmin, t_best)
                    if any_hit:
                        prim_new = jnp.max(jnp.where(tc == tmin, psub[:, 10:11] + 0 * tc, -1.0),
                                           axis=0, keepdims=True)
                        best_ref[b + 1:b + 2, :] = jnp.where(improved, prim_new,
                                                             best_ref[b + 1:b + 2, :])
                    else:
                        win = (tc == tmin) & (slotf == snew)

                        def _wred(col):
                            return jnp.sum(jnp.where(win, psub[:, col:col + 1] + 0 * tc, 0.0),
                                           axis=0, keepdims=True)

                        best_ref[b + 1:b + 2, :] = jnp.where(
                            improved, _wred(10), best_ref[b + 1:b + 2, :])
                        b1w = jnp.sum(jnp.where(win, e1_ * inv, 0.0), axis=0, keepdims=True)
                        b2w = jnp.sum(jnp.where(win, e2_ * inv, 0.0), axis=0, keepdims=True)
                        best_ref[b + 2:b + 3, :] = jnp.where(improved, b1w, best_ref[b + 2:b + 3, :])
                        best_ref[b + 3:b + 4, :] = jnp.where(improved, b2w, best_ref[b + 3:b + 4, :])
                        for c in range(9):
                            best_ref[b + 4 + c:b + 5 + c, :] = jnp.where(
                                improved, _wred(c), best_ref[b + 4 + c:b + 5 + c, :])
                        best_ref[b + 13:b + 14, :] = jnp.where(improved, _wred(11), best_ref[b + 13:b + 14, :])
                        best_ref[b + 14:b + 15, :] = jnp.where(improved, _wred(12), best_ref[b + 14:b + 15, :])
                        best_ref[b + 15:b + 16, :] = jnp.where(improved, _wred(13), best_ref[b + 15:b + 16, :])
                        if has_attr:
                            # winner per-vertex shading normals + uvs from
                            # the parallel attr table (same octet indexing)
                            ablk = attrs_ref[pl.ds(prow, 8), :]
                            asub = jnp.concatenate(
                                [_sel16(ablk, o_ % 8), _sel16(ablk, o_ % 8 + 1)], axis=0)

                            def _ared(col):
                                return jnp.sum(jnp.where(win, asub[:, col:col + 1] + 0 * tc, 0.0),
                                               axis=0, keepdims=True)

                            for c in range(15):
                                best_ref[b + 16 + c:b + 17 + c, :] = jnp.where(
                                    improved, _ared(c), best_ref[b + 16 + c:b + 17 + c, :])

                    sp_new = jnp.where(alive, sp_pop + jnp.where(do_push, 1, 0), 0)
                    if any_hit:
                        missing = jnp.max(jnp.where(live[g:g + 1, :] & (best_ref[b + 1:b + 2, :] < 0),
                                                    1.0, 0.0))
                        sp_new = jnp.where(is_leaf & (missing == 0), 0, sp_new)
                    sp_ref[g] = sp_new

                alive_t = sp_ref[0]
                for g in range(1, SUB):
                    alive_t = alive_t + sp_ref[g]
                return it + 1, alive_t

            jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))

            def rows(r):
                return jnp.concatenate([best_ref[g * ROWS + r:g * ROWS + r + 1, :]
                                        for g in range(SUB)], axis=0)

            if any_hit:
                return rows(1) >= 0  # occluded
            out = {"t": rows(0), "prim": rows(1), "b1": rows(2), "b2": rows(3)}
            for c, key in enumerate(("v0x", "v0y", "v0z", "v1x", "v1y", "v1z",
                                     "v2x", "v2y", "v2z")):
                out[key] = rows(4 + c)
            out["mat"] = rows(13).astype(I32)
            out["light"] = rows(14).astype(I32)
            out["flags"] = rows(15).astype(I32)
            if has_attr:
                for c, key in enumerate(("n0x", "n0y", "n0z", "n1x", "n1y", "n1z",
                                         "n2x", "n2y", "n2z",
                                         "u0", "v0", "u1", "v1", "u2", "v2")):
                    out[key] = rows(16 + c)
            out["hit"] = rows(1) >= 0
            return out

        def surface_attrs(tr, ox, oy, oz, dx, dy, dz):
            """surface_interaction's triangle branch from the winner data
            (default-UV frame: dpdu = e1; shading.py:100-140)."""
            b1, b2 = tr["b1"], tr["b2"]
            b0 = 1.0 - b1 - b2
            e1x, e1y, e1z = tr["v1x"] - tr["v0x"], tr["v1y"] - tr["v0y"], tr["v1z"] - tr["v0z"]
            e2x, e2y, e2z = tr["v2x"] - tr["v0x"], tr["v2y"] - tr["v0y"], tr["v2z"] - tr["v0z"]
            ngx = e1y * e2z - e1z * e2y
            ngy = e1z * e2x - e1x * e2z
            ngz = e1x * e2y - e1y * e2x
            ngx, ngy, ngz = _norm3(ngx, ngy, ngz)
            flip = (tr["flags"] & FLAG_FLIP_GEOM_N) != 0
            sgn = jnp.where(flip, -1.0, 1.0)
            ngx, ngy, ngz = ngx * sgn, ngy * sgn, ngz * sgn
            if has_attr:
                # interpolated per-vertex shading normal; ng is then flipped
                # toward ns (triangle.rs:355-360 = shading.py has_sn branch).
                # Flat prims store the face normal at all 3 verts, so the
                # interpolation collapses to ng and the flip never triggers.
                nsx = b0 * tr["n0x"] + b1 * tr["n1x"] + b2 * tr["n2x"]
                nsy = b0 * tr["n0y"] + b1 * tr["n1y"] + b2 * tr["n2y"]
                nsz = b0 * tr["n0z"] + b1 * tr["n1z"] + b2 * tr["n2z"]
                nsx, nsy, nsz = _norm3(nsx, nsy, nsz)
                align = (ngx * nsx + ngy * nsy + ngz * nsz) < 0
                asgn = jnp.where(align, -1.0, 1.0)
                ngx, ngy, ngz = ngx * asgn, ngy * asgn, ngz * asgn
                # uv + uv-parameterized dpdu (shading.py:113-124)
                u_ = b0 * tr["u0"] + b1 * tr["u1"] + b2 * tr["u2"]
                v_ = b0 * tr["v0"] + b1 * tr["v1"] + b2 * tr["v2"]
                duv1x = tr["u1"] - tr["u0"]
                duv1y = tr["v1"] - tr["v0"]
                duv2x = tr["u2"] - tr["u0"]
                duv2y = tr["v2"] - tr["v0"]
                det = duv1x * duv2y - duv1y * duv2x
                degen = jnp.abs(det) <= 1e-12
                inv_det = jnp.where(degen, 0.0, 1.0 / jnp.where(degen, 1.0, det))
                dpdux = jnp.where(degen, e1x, (duv2y * e1x - duv1y * e2x) * inv_det)
                dpduy = jnp.where(degen, e1y, (duv2y * e1y - duv1y * e2y) * inv_det)
                dpduz = jnp.where(degen, e1z, (duv2y * e1z - duv1y * e2z) * inv_det)
            else:
                # flat shading: ns = ng; default UVs: uv0=(0,0) uv1=(1,0)
                # uv2=(1,1) => u = b1 + b2, v = b2, dpdu = e1
                nsx, nsy, nsz = ngx, ngy, ngz
                u_ = b1 + b2
                v_ = b2
                dpdux, dpduy, dpduz = e1x, e1y, e1z
            # frame from dpdu orthogonalized against ns
            d_dot = nsx * dpdux + nsy * dpduy + nsz * dpduz
            ssx = dpdux - nsx * d_dot
            ssy = dpduy - nsy * d_dot
            ssz = dpduz - nsz * d_dot
            sl = jnp.sqrt(ssx * ssx + ssy * ssy + ssz * ssz)
            ok_t = sl > 1e-9
            inv_sl = 1.0 / jnp.maximum(sl, 1e-20)
            # coordinate_system(ns) fallback (shading.py:40)
            csg = jnp.where(nsz >= 0, 1.0, -1.0)
            a = -1.0 / (csg + nsz)
            bb = nsx * nsy * a
            fx = 1.0 + csg * nsx * nsx * a
            fy = csg * bb
            fz = -csg * nsx
            ssx = jnp.where(ok_t, ssx * inv_sl, fx)
            ssy = jnp.where(ok_t, ssy * inv_sl, fy)
            ssz = jnp.where(ok_t, ssz * inv_sl, fz)
            tsx = nsy * ssz - nsz * ssy
            tsy = nsz * ssx - nsx * ssz
            tsz = nsx * ssy - nsy * ssx
            px_ = b0 * tr["v0x"] + b1 * tr["v1x"] + b2 * tr["v2x"]
            py_ = b0 * tr["v0y"] + b1 * tr["v1y"] + b2 * tr["v2y"]
            pz_ = b0 * tr["v0z"] + b1 * tr["v1z"] + b2 * tr["v2z"]
            g7 = jnp.float32(_gamma(7))
            ex = g7 * (jnp.abs(b0 * tr["v0x"]) + jnp.abs(b1 * tr["v1x"]) + jnp.abs(b2 * tr["v2x"]))
            ey = g7 * (jnp.abs(b0 * tr["v0y"]) + jnp.abs(b1 * tr["v1y"]) + jnp.abs(b2 * tr["v2y"]))
            ez = g7 * (jnp.abs(b0 * tr["v0z"]) + jnp.abs(b1 * tr["v1z"]) + jnp.abs(b2 * tr["v2z"]))
            return {"px": px_, "py": py_, "pz": pz_,
                    "ngx": ngx, "ngy": ngy, "ngz": ngz,
                    "nsx": nsx, "nsy": nsy, "nsz": nsz,
                    "ssx": ssx, "ssy": ssy, "ssz": ssz,
                    "tsx": tsx, "tsy": tsy, "tsz": tsz,
                    "u": u_, "v": v_,
                    "ex": ex, "ey": ey, "ez": ez, "mat": tr["mat"]}

        def bsdf_sample(hbase, s_cur, dim_base, at, wox, woy, woz, mat):
            # (megakernel.bsdf_sample semantics, plus GGX micro/plastic lobes)
            wo_x = _dot3(wox, woy, woz, at["ssx"], at["ssy"], at["ssz"])
            wo_y = _dot3(wox, woy, woz, at["tsx"], at["tsy"], at["tsz"])
            wo_z = _dot3(wox, woy, woz, at["nsx"], at["nsy"], at["nsz"])
            u1, u2 = sample_2d_traced(hbase, s_cur, dim_base + 3)
            shape = wox.shape
            lam_m = mat_mask_in(mat, (LOBE_LAMBERT_R, LOBE_PLASTIC))
            on_m = mat_mask(mat, LOBE_OREN_NAYAR) if any_on else _falsev(wox)
            diff_like = lam_m | on_m
            mic_m = mat_mask_in(mat, (LOBE_MICRO_R, LOBE_PLASTIC)) if any_micro else _falsev(wox)
            plast_m = mat_mask(mat, LOBE_PLASTIC) if any_plastic else _falsev(wox)
            mirror_m = mat_mask(mat, LOBE_SPEC_R) if any_mirror else _falsev(wox)
            glass_m = mat_mask(mat, LOBE_FRESNEL_SPEC) if any_glass else _falsev(wox)
            none_m = mat_mask(mat, LOBE_NONE)
            entering = wo_z > 0
            wix = jnp.zeros(shape, F32)
            wiy = jnp.zeros(shape, F32)
            wiz = jnp.zeros(shape, F32)
            valid = ~none_m
            eta = mat_select(mat, "eta", 1.5)
            eta = jnp.maximum(eta, jnp.float32(1.0 + 1e-6))
            # uniform lobe pick over the active slots (bsdf.bsdf_sample):
            # plastic has [lambert, micro]; every other eligible mat is
            # single-lobe (pick 0)
            if any_plastic:
                u_lobe = sample_1d_traced(hbase, s_cur, dim_base + 2)
                n_act = jnp.where(plast_m, 2, 1)
                pick = jnp.minimum((u_lobe * n_act.astype(F32)).astype(I32),
                                   n_act - 1)
            else:
                pick = jnp.zeros(shape, I32)
            samp_diff = diff_like & (pick == 0)
            samp_mic = mic_m & (~lam_m | (pick == 1))
            if any_diffuse:
                ddx, ddy = _concentric_disk(u1, u2)
                dzv = jnp.sqrt(jnp.maximum(0.0, 1.0 - ddx * ddx - ddy * ddy))
                dzv = jnp.where(entering, dzv, -dzv)
                wix = jnp.where(samp_diff, ddx, wix)
                wiy = jnp.where(samp_diff, ddy, wiy)
                wiz = jnp.where(samp_diff, dzv, wiz)
            if any_micro:
                axv = mat_select(mat, "ax", 1e-3)
                ayv = mat_select(mat, "ay", 1e-3)
                hx, hy, hz = _ggx_sample_wh_ch(wo_x, wo_y, wo_z, u1, u2, axv, ayv)
                dwh = wo_x * hx + wo_y * hy + wo_z * hz
                wi_mx = -wo_x + 2.0 * dwh * hx
                wi_my = -wo_y + 2.0 * dwh * hy
                wi_mz = -wo_z + 2.0 * dwh * hz
                wix = jnp.where(samp_mic, wi_mx, wix)
                wiy = jnp.where(samp_mic, wi_my, wiy)
                wiz = jnp.where(samp_mic, wi_mz, wiz)
                valid = valid & (~samp_mic | (wo_z * wi_mz > 0))
            wi_sr_x, wi_sr_y, wi_sr_z = -wo_x, -wo_y, wo_z
            if any_mirror:
                wix = jnp.where(mirror_m, wi_sr_x, wix)
                wiy = jnp.where(mirror_m, wi_sr_y, wiy)
                wiz = jnp.where(mirror_m, wi_sr_z, wiz)
            if any_glass:
                fr_s = _fresnel_dielectric_var(wo_z, eta)
                choose_r = u1 < fr_s
                eta_ratio = jnp.where(entering, 1.0 / eta, eta)
                nz = jnp.where(entering, 1.0, -1.0)
                cos_i = nz * wo_z
                sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
                sin2_t = eta_ratio * eta_ratio * sin2_i
                ok_st = sin2_t < 1.0
                cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
                wi_st_x = eta_ratio * -wo_x
                wi_st_y = eta_ratio * -wo_y
                wi_st_z = eta_ratio * -wo_z + (eta_ratio * cos_i - cos_t) * nz
                wix = jnp.where(glass_m, jnp.where(choose_r, wi_sr_x, wi_st_x), wix)
                wiy = jnp.where(glass_m, jnp.where(choose_r, wi_sr_y, wi_st_y), wiy)
                wiz = jnp.where(glass_m, jnp.where(choose_r, wi_sr_z, wi_st_z), wiz)
                valid = valid & (ok_st | ~(glass_m & ~choose_r))
            else:
                fr_s = jnp.zeros(shape, F32)
                choose_r = _falsev(wox)
                eta_ratio = jnp.ones(shape, F32)
            wix, wiy, wiz = _norm3(wix, wiy, wiz)
            abs_ci = jnp.abs(wiz)
            kdr = mat_color(mat, "color", 0)
            kdg = mat_color(mat, "color", 1)
            kdb = mat_color(mat, "color", 2)
            # matte-Kd checkerboard (texture.py:213-220 over the uv mapping
            # s = us*u + du, t = vs*v + dv; both cells constant + nonblack)
            for m in mat_rows:
                kt_cfg = mats[m].get("kd_tex")
                if not kt_cfg:
                    continue
                s_t = jnp.float32(kt_cfg["us"]) * at["u"] + jnp.float32(kt_cfg["du"])
                t_t = jnp.float32(kt_cfg["vs"]) * at["v"] + jnp.float32(kt_cfg["dv"])
                even = (jnp.floor(s_t) + jnp.floor(t_t)) % 2.0 == 0
                mm = mat == m
                c1, c2 = kt_cfg["c1"], kt_cfg["c2"]
                kdr = jnp.where(mm, jnp.where(even, jnp.float32(c1[0]), jnp.float32(c2[0])), kdr)
                kdg = jnp.where(mm, jnp.where(even, jnp.float32(c1[1]), jnp.float32(c2[1])), kdg)
                kdb = jnp.where(mm, jnp.where(even, jnp.float32(c1[2]), jnp.float32(c2[2])), kdb)
            fr_spec = jnp.zeros(shape, F32)
            fg_spec = jnp.zeros(shape, F32)
            fb_spec = jnp.zeros(shape, F32)
            pdf_spec = jnp.zeros(shape, F32)
            inv_ci = 1.0 / jnp.maximum(abs_ci, 1e-9)
            if any_mirror:
                frm = jnp.ones(shape, F32)
                if any(mats[m]["lobe"] == LOBE_SPEC_R and mats[m]["fresnel"] == 1 for m in mat_rows):
                    fr_d = _fresnel_dielectric_var(wo_z, eta)
                    fres_die = _falsev(wox)
                    for m in mat_rows:
                        if mats[m]["lobe"] == LOBE_SPEC_R and mats[m]["fresnel"] == 1:
                            fres_die = fres_die | (mat == m)
                    frm = jnp.where(fres_die, fr_d, frm)
                fr_spec = jnp.where(mirror_m, kdr * frm * inv_ci, fr_spec)
                fg_spec = jnp.where(mirror_m, kdg * frm * inv_ci, fg_spec)
                fb_spec = jnp.where(mirror_m, kdb * frm * inv_ci, fb_spec)
                pdf_spec = jnp.where(mirror_m, 1.0, pdf_spec)
            if any_glass:
                st_scale = eta_ratio * eta_ratio
                ktr = mat_color(mat, "kt", 0)
                ktg = mat_color(mat, "kt", 1)
                ktb = mat_color(mat, "kt", 2)
                t_term = (1.0 - fr_s) * st_scale * inv_ci
                r_term = fr_s * inv_ci
                fr_spec = jnp.where(glass_m, jnp.where(choose_r, kdr * r_term, ktr * t_term), fr_spec)
                fg_spec = jnp.where(glass_m, jnp.where(choose_r, kdg * r_term, ktg * t_term), fg_spec)
                fb_spec = jnp.where(glass_m, jnp.where(choose_r, kdb * r_term, ktb * t_term), fb_spec)
                pdf_spec = jnp.where(glass_m, jnp.where(choose_r, fr_s, 1.0 - fr_s), pdf_spec)
            # non-specular recompute over all lobes (bsdf_f/bsdf_pdf):
            # lambert + GGX terms summed; pdf averaged over active lobes
            refl_hemi = wo_z * wiz > 0
            f_diff = jnp.where(lam_m & refl_hemi, jnp.float32(INV_PI), 0.0)
            if any_on:
                f_diff = jnp.where(on_m & refl_hemi,
                                   on_factor(mat, wo_x, wo_y, wo_z, wix, wiy, wiz),
                                   f_diff)
            pdf_diff = jnp.where(diff_like & refl_hemi, abs_ci * jnp.float32(INV_PI), 0.0)
            f_ns_r = kdr * f_diff
            f_ns_g = kdg * f_diff
            f_ns_b = kdb * f_diff
            pdf_ns = pdf_diff
            if any_micro:
                fm_r, fm_g, fm_b, p_m = micro_f_pdf(
                    mat, mic_m, wo_x, wo_y, wo_z, wix, wiy, wiz)
                f_ns_r = f_ns_r + fm_r
                f_ns_g = f_ns_g + fm_g
                f_ns_b = f_ns_b + fm_b
                pdf_ns = pdf_ns + p_m
                if any_plastic:
                    pdf_ns = pdf_ns / jnp.where(plast_m, 2.0, 1.0)
            specular = mirror_m | glass_m
            fr_o = jnp.where(specular, fr_spec, f_ns_r)
            fg_o = jnp.where(specular, fg_spec, f_ns_g)
            fb_o = jnp.where(specular, fb_spec, f_ns_b)
            pdf = jnp.where(specular, pdf_spec, pdf_ns)
            transmissive = glass_m & ~choose_r
            eta_sc = jnp.where(transmissive,
                               jnp.where(entering, eta * eta, 1.0 / (eta * eta)), 1.0)
            valid = valid & (pdf > 0)
            wwx = wix * at["ssx"] + wiy * at["tsx"] + wiz * at["nsx"]
            wwy = wix * at["ssy"] + wiy * at["tsy"] + wiz * at["nsy"]
            wwz = wix * at["ssz"] + wiy * at["tsz"] + wiz * at["nsz"]
            return {"wwx": wwx, "wwy": wwy, "wwz": wwz,
                    "fr": fr_o, "fg": fg_o, "fb": fb_o,
                    "pdf": pdf, "specular": specular, "valid": valid,
                    "eta_scale": eta_sc,
                    "kdr": kdr, "kdg": kdg, "kdb": kdb}

        def nee(hbase, s_cur, dim_base, alive_sh, at, wox, woy, woz,
                mat, kdr, kdg, kdb):
            """estimate_direct with delta AND diffuse-area lights (MIS)."""
            lam_m = mat_mask_in(mat, (LOBE_LAMBERT_R, LOBE_PLASTIC))
            on_m = mat_mask(mat, LOBE_OREN_NAYAR) if any_on else None
            mic_m = mat_mask_in(mat, (LOBE_MICRO_R, LOBE_PLASTIC)) if any_micro else None
            plast_m = mat_mask(mat, LOBE_PLASTIC) if any_plastic else None
            if n_lights > 1:
                u_sel = sample_1d_traced(hbase, s_cur, dim_base)
                if consts["uniform_select"]:
                    # uniform strategy picks floor(u*n)
                    # (integrator._select_light), NOT a cdf walk — cdf
                    # rounding can differ by one light at f32 boundaries
                    lid = jnp.minimum((u_sel * n_lights).astype(I32), n_lights - 1)
                else:
                    lid = jnp.zeros(u_sel.shape, I32)
                    cdfl = consts["light_cdf"]
                    for i in range(n_lights - 1):
                        lid = lid + (u_sel > jnp.float32(cdfl[i])).astype(I32)
                    lid = jnp.clip(lid, 0, n_lights - 1)
            else:
                lid = None
            u1, u2 = sample_2d_traced(hbase, s_cur, dim_base + 1)

            shape = wox.shape
            wix = jnp.zeros(shape, F32)
            wiy = jnp.zeros(shape, F32)
            wiz = jnp.zeros(shape, F32)
            lir = jnp.zeros(shape, F32)
            lig = jnp.zeros(shape, F32)
            lib = jnp.zeros(shape, F32)
            dist = jnp.zeros(shape, F32)
            spdf = jnp.zeros(shape, F32)
            p_l = jnp.zeros(shape, F32)
            is_delta = jnp.zeros(shape, I32) == 0
            for i, lt in enumerate(lights):
                m = (lid == i) if lid is not None else (jnp.zeros(shape, I32) == 0)
                par = lt["par"]
                if lt["kind"] == LIGHT_DISTANT:
                    wix = jnp.where(m, jnp.float32(float(par[0])), wix)
                    wiy = jnp.where(m, jnp.float32(float(par[1])), wiy)
                    wiz = jnp.where(m, jnp.float32(float(par[2])), wiz)
                    lir = jnp.where(m, jnp.float32(par[3]), lir)
                    lig = jnp.where(m, jnp.float32(par[4]), lig)
                    lib = jnp.where(m, jnp.float32(par[5]), lib)
                    dist = jnp.where(m, jnp.float32(wr2), dist)
                    p_l = jnp.where(m, 1.0, p_l)
                elif lt["kind"] in (LIGHT_POINT, LIGHT_SPOT):
                    tx = jnp.float32(par[0]) - at["px"]
                    ty = jnp.float32(par[1]) - at["py"]
                    tz = jnp.float32(par[2]) - at["pz"]
                    d2 = jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-12)
                    dl = jnp.sqrt(d2)
                    invl = 1.0 / dl
                    wxa, wya, wza = tx * invl, ty * invl, tz * invl
                    fall = 1.0
                    if lt["kind"] == LIGHT_SPOT:
                        # smoothstep^4 cone falloff (spot.rs; lights.py:358-364)
                        cos_t = -(wxa * jnp.float32(par[6]) + wya * jnp.float32(par[7])
                                  + wza * jnp.float32(par[8]))
                        ctw, cfs = float(par[9]), float(par[10])
                        dfall = jnp.clip((cos_t - ctw) / max(cfs - ctw, 1e-9), 0.0, 1.0)
                        fall = jnp.where(cos_t < ctw, 0.0,
                                         jnp.where(cos_t > cfs, 1.0, dfall ** 4))
                    wix = jnp.where(m, wxa, wix)
                    wiy = jnp.where(m, wya, wiy)
                    wiz = jnp.where(m, wza, wiz)
                    lir = jnp.where(m, jnp.float32(par[3]) * fall / d2, lir)
                    lig = jnp.where(m, jnp.float32(par[4]) * fall / d2, lig)
                    lib = jnp.where(m, jnp.float32(par[5]) * fall / d2, lib)
                    dist = jnp.where(m, dl, dist)
                    p_l = jnp.where(m, 1.0, p_l)
                elif lt["kind"] == LIGHT_INFINITE:
                    # constant (imageless) infinite light: uniform-sphere
                    # direction, pdf 1/4pi (lights.py:386-389)
                    zz = 1.0 - 2.0 * u1
                    rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - zz * zz))
                    ph = jnp.float32(2.0 * math.pi) * u2
                    wix = jnp.where(m, rr * jnp.cos(ph), wix)
                    wiy = jnp.where(m, rr * jnp.sin(ph), wiy)
                    wiz = jnp.where(m, zz, wiz)
                    lir = jnp.where(m, jnp.float32(par[3]), lir)
                    lig = jnp.where(m, jnp.float32(par[4]), lig)
                    lib = jnp.where(m, jnp.float32(par[5]), lib)
                    dist = jnp.where(m, jnp.float32(wr2), dist)
                    p_l = jnp.where(m, jnp.float32(INV_4PI), p_l)
                    is_delta = is_delta & ~m
                elif lt.get("sphere"):
                    # sphere area light (lights.sample_li cone_spheres):
                    # visible-cone sampling outside, uniform area inside
                    c = lt["c"]
                    r_w = float(lt["r"])
                    tox = jnp.float32(c[0]) - at["px"]
                    toy = jnp.float32(c[1]) - at["py"]
                    toz = jnp.float32(c[2]) - at["pz"]
                    dc2 = jnp.maximum(tox * tox + toy * toy + toz * toz, 1e-12)
                    dc = jnp.sqrt(dc2)
                    outside = dc2 > r_w * r_w * 1.0001
                    invc = 1.0 / dc
                    wcx, wcy, wcz = tox * invc, toy * invc, toz * invc
                    # coordinate_system(wc) (shading.py:40)
                    sgn = jnp.where(wcz >= 0.0, 1.0, -1.0)
                    a_cs = -1.0 / (sgn + wcz)
                    b_cs = wcx * wcy * a_cs
                    vxx = 1.0 + sgn * wcx * wcx * a_cs
                    vxy = sgn * b_cs
                    vxz = -sgn * wcx
                    vyx = b_cs
                    vyy = sgn + wcy * wcy * a_cs
                    vyz = -wcy
                    sin2_tm = jnp.clip(r_w * r_w / dc2, 0.0, 1.0)
                    cos_tm = jnp.sqrt(jnp.maximum(1.0 - sin2_tm, 0.0))
                    cos_t = (1.0 - u1) + u1 * cos_tm
                    sin2_t = jnp.maximum(1.0 - cos_t * cos_t, 0.0)
                    ds_ = dc * cos_t - jnp.sqrt(jnp.maximum(r_w * r_w - dc2 * sin2_t, 0.0))
                    cos_a = jnp.clip((dc2 + r_w * r_w - ds_ * ds_)
                                     / jnp.maximum(2.0 * dc * r_w, 1e-12), -1.0, 1.0)
                    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
                    phi_c = jnp.float32(2.0 * math.pi) * u2
                    sa_c = sin_a * jnp.cos(phi_c)
                    sa_s = sin_a * jnp.sin(phi_c)
                    nwx = sa_c * -vxx + sa_s * -vyx + cos_a * -wcx
                    nwy = sa_c * -vxy + sa_s * -vyy + cos_a * -wcy
                    nwz = sa_c * -vxz + sa_s * -vyz + cos_a * -wcz
                    psx_c = jnp.float32(c[0]) + r_w * nwx
                    psy_c = jnp.float32(c[1]) + r_w * nwy
                    psz_c = jnp.float32(c[2]) + r_w * nwz
                    pdf_cone = 1.0 / jnp.maximum(
                        jnp.float32(2.0 * math.pi) * (1.0 - cos_tm), 1e-12)
                    # inside: uniform object-space area sample
                    # (lights._sample_prim_point sphere branch)
                    zz_s = 1.0 - 2.0 * u1
                    rr_s = jnp.sqrt(jnp.maximum(0.0, 1.0 - zz_s * zz_s))
                    ph_s = jnp.float32(2.0 * math.pi) * u2
                    dox = rr_s * jnp.cos(ph_s)
                    doy = rr_s * jnp.sin(ph_s)
                    doz = zz_s
                    r_o = float(lt["r_obj"])
                    M = lt["o2w"]
                    psx_a = (jnp.float32(M[0][0]) * (r_o * dox) + jnp.float32(M[0][1]) * (r_o * doy)
                             + jnp.float32(M[0][2]) * (r_o * doz) + jnp.float32(M[0][3]))
                    psy_a = (jnp.float32(M[1][0]) * (r_o * dox) + jnp.float32(M[1][1]) * (r_o * doy)
                             + jnp.float32(M[1][2]) * (r_o * doz) + jnp.float32(M[1][3]))
                    psz_a = (jnp.float32(M[2][0]) * (r_o * dox) + jnp.float32(M[2][1]) * (r_o * doy)
                             + jnp.float32(M[2][2]) * (r_o * doz) + jnp.float32(M[2][3]))
                    T = lt["w2oT"]
                    nax = (jnp.float32(T[0][0]) * dox + jnp.float32(T[0][1]) * doy
                           + jnp.float32(T[0][2]) * doz)
                    nay = (jnp.float32(T[1][0]) * dox + jnp.float32(T[1][1]) * doy
                           + jnp.float32(T[1][2]) * doz)
                    naz = (jnp.float32(T[2][0]) * dox + jnp.float32(T[2][1]) * doy
                           + jnp.float32(T[2][2]) * doz)
                    nax, nay, naz = _norm3(nax, nay, naz)
                    if lt["flip"]:
                        nax, nay, naz = -nax, -nay, -naz
                    psx = jnp.where(outside, psx_c, psx_a)
                    psy = jnp.where(outside, psy_c, psy_a)
                    psz = jnp.where(outside, psz_c, psz_a)
                    ngx_l = jnp.where(outside, nwx, nax)
                    ngy_l = jnp.where(outside, nwy, nay)
                    ngz_l = jnp.where(outside, nwz, naz)
                    tx = psx - at["px"]
                    ty = psy - at["py"]
                    tz = psz - at["pz"]
                    d2 = jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-12)
                    dl = jnp.sqrt(d2)
                    invl = 1.0 / dl
                    wxa, wya, wza = tx * invl, ty * invl, tz * invl
                    cos_l = -(wxa * ngx_l + wya * ngy_l + wza * ngz_l)
                    emits = outside | (cos_l > 0) | bool(lt["two_sided"])
                    pdf_a = d2 / jnp.maximum(jnp.abs(cos_l) * jnp.float32(lt["area"]), 1e-12)
                    pdf_a = jnp.where(jnp.abs(cos_l) > 1e-7, pdf_a, 0.0)
                    p_sph_l = jnp.where(outside, pdf_cone, pdf_a)
                    par_l = lt["par"]
                    wix = jnp.where(m, wxa, wix)
                    wiy = jnp.where(m, wya, wiy)
                    wiz = jnp.where(m, wza, wiz)
                    lir = jnp.where(m & emits, jnp.float32(par_l[0]), jnp.where(m, 0.0, lir))
                    lig = jnp.where(m & emits, jnp.float32(par_l[1]), jnp.where(m, 0.0, lig))
                    lib = jnp.where(m & emits, jnp.float32(par_l[2]), jnp.where(m, 0.0, lib))
                    dist = jnp.where(m, dl, dist)
                    p_l = jnp.where(m, p_sph_l, p_l)
                    is_delta = is_delta & ~m
                else:  # diffuse area on one baked triangle
                    v = lt["v"]
                    su0 = jnp.sqrt(jnp.maximum(u1, 0.0))
                    b0s = 1.0 - su0
                    b1s = u2 * su0
                    b2s = 1.0 - b0s - b1s
                    psx = b0s * jnp.float32(v[0][0]) + b1s * jnp.float32(v[1][0]) + b2s * jnp.float32(v[2][0])
                    psy = b0s * jnp.float32(v[0][1]) + b1s * jnp.float32(v[1][1]) + b2s * jnp.float32(v[2][1])
                    psz = b0s * jnp.float32(v[0][2]) + b1s * jnp.float32(v[1][2]) + b2s * jnp.float32(v[2][2])
                    tx = psx - at["px"]
                    ty = psy - at["py"]
                    tz = psz - at["pz"]
                    d2 = jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-12)
                    dl = jnp.sqrt(d2)
                    invl = 1.0 / dl
                    wxa, wya, wza = tx * invl, ty * invl, tz * invl
                    ng = lt["ng"]
                    cos_l = -(wxa * jnp.float32(ng[0]) + wya * jnp.float32(ng[1]) + wza * jnp.float32(ng[2]))
                    emits = (cos_l > 0) | bool(lt["two_sided"])
                    pdf_a = d2 / jnp.maximum(jnp.abs(cos_l) * jnp.float32(lt["area"]), 1e-12)
                    pdf_a = jnp.where(jnp.abs(cos_l) > 1e-7, pdf_a, 0.0)
                    wix = jnp.where(m, wxa, wix)
                    wiy = jnp.where(m, wya, wiy)
                    wiz = jnp.where(m, wza, wiz)
                    lir = jnp.where(m & emits, jnp.float32(par[0]), jnp.where(m, 0.0, lir))
                    lig = jnp.where(m & emits, jnp.float32(par[1]), jnp.where(m, 0.0, lig))
                    lib = jnp.where(m & emits, jnp.float32(par[2]), jnp.where(m, 0.0, lib))
                    dist = jnp.where(m, dl, dist)
                    p_l = jnp.where(m, pdf_a, p_l)
                    is_delta = is_delta & ~m
                spdf = jnp.where(m, jnp.float32(consts["light_pmf"][i]), spdf)

            refl = (_dot3(wix, wiy, wiz, at["ngx"], at["ngy"], at["ngz"]) *
                    _dot3(wox, woy, woz, at["ngx"], at["ngy"], at["ngz"])) > 0
            cos_ns = jnp.abs(_dot3(wix, wiy, wiz, at["nsx"], at["nsy"], at["nsz"]))
            fm = lam_m & refl
            fr_ = jnp.where(fm, kdr * jnp.float32(INV_PI) * cos_ns, 0.0)
            fg_ = jnp.where(fm, kdg * jnp.float32(INV_PI) * cos_ns, 0.0)
            fb_ = jnp.where(fm, kdb * jnp.float32(INV_PI) * cos_ns, 0.0)
            # bsdf pdf toward wi (specular lobes contribute pdf 0)
            wi_z = _dot3(wix, wiy, wiz, at["nsx"], at["nsy"], at["nsz"])
            wo_z = _dot3(wox, woy, woz, at["nsx"], at["nsy"], at["nsz"])
            diff_like = lam_m | on_m if any_on else lam_m
            p_b = jnp.where(diff_like & (wi_z * wo_z > 0),
                            jnp.abs(wi_z) * jnp.float32(INV_PI), 0.0)
            if any_micro or any_on:
                # full local coords for the GGX/Oren-Nayar terms
                # (estimate_direct's bsdf_f gate is the GEOMETRIC refl
                # bit; f's own internal gate is the shading hemisphere)
                wo_x = _dot3(wox, woy, woz, at["ssx"], at["ssy"], at["ssz"])
                wo_y = _dot3(wox, woy, woz, at["tsx"], at["tsy"], at["tsz"])
                wi_x = _dot3(wix, wiy, wiz, at["ssx"], at["ssy"], at["ssz"])
                wi_y = _dot3(wix, wiy, wiz, at["tsx"], at["tsy"], at["tsz"])
            if any_on:
                onf = on_factor(mat, wo_x, wo_y, wo_z, wi_x, wi_y, wi_z)
                onm = on_m & refl
                fr_ = jnp.where(onm, kdr * onf * cos_ns, fr_)
                fg_ = jnp.where(onm, kdg * onf * cos_ns, fg_)
                fb_ = jnp.where(onm, kdb * onf * cos_ns, fb_)
            if any_micro:
                fm_r, fm_g, fm_b, p_m = micro_f_pdf(
                    mat, mic_m, wo_x, wo_y, wo_z, wi_x, wi_y, wi_z)
                fr_ = fr_ + jnp.where(refl, fm_r * cos_ns, 0.0)
                fg_ = fg_ + jnp.where(refl, fm_g * cos_ns, 0.0)
                fb_ = fb_ + jnp.where(refl, fm_b * cos_ns, 0.0)
                p_b = p_b + p_m
                if any_plastic:
                    p_b = p_b / jnp.where(plast_m, 2.0, 1.0)

            p_sel = p_l * spdf
            contributes = alive_sh & (p_sel > 0) & \
                ((fr_ * lir > 0) | (fg_ * lig > 0) | (fb_ * lib > 0))
            osx, osy, osz = _offset_ray(at["px"], at["py"], at["pz"],
                                        at["ngx"], at["ngy"], at["ngz"],
                                        wix, wiy, wiz, at["ex"], at["ey"], at["ez"])
            t_sh = jnp.where(contributes, dist * jnp.float32(1.0 - 2.0 * RAY_EPS), jnp.float32(-1.0))
            occ = traverse(osx, osy, osz, wix, wiy, wiz, t_sh, any_hit=True)
            for pr in spheres:
                h_s, _t_s, _pl = _sph_test(pr, osx, osy, osz, wix, wiy, wiz, t_sh)
                occ = occ | h_s
            vis = jnp.where(occ, 0.0, 1.0)
            w_l = jnp.where(is_delta, 1.0, power_heuristic(p_sel, p_b))
            scale = vis * w_l / jnp.maximum(p_sel, 1e-30)
            cr = jnp.where(contributes, fr_ * lir * scale, 0.0)
            cg = jnp.where(contributes, fg_ * lig * scale, 0.0)
            cb = jnp.where(contributes, fb_ * lib * scale, 0.0)
            return cr, cg, cb

        # ---- persistent loop ----
        seed = scal_ref[0, 0]
        s0 = scal_ref[0, 1]
        px_i = px_ref[...]
        py_i = py_ref[...]
        pid = pid_ref[...]
        lane_valid = px_i >= 0
        px_f = px_i.astype(F32)
        py_f = py_i.astype(F32)
        pidu = pltpu.bitcast(pid, U32)
        hbase = _pcg(_pcg(U32(0x9E3779B9) ^ seed) ^ pidu)
        hoffu = pltpu.bitcast(aux0_ref[...], U32)  # halton per-pixel offsets

        shape = px_f.shape
        zero = jnp.zeros(shape, F32)
        s_init = jnp.broadcast_to(s0, shape)
        ox0, oy0, oz0, dx0, dy0, dz0 = regen(hbase, px_f, py_f, s_init, hoffu)
        alive0 = jnp.where(lane_valid & (n_samples > 0), 1, 0).astype(I32)
        done0 = jnp.where(lane_valid & (n_samples > 0), 0, 1).astype(I32)

        def cond(st):
            done = st[0]
            it = st[1]
            return jnp.logical_not(jnp.all(done > 0)) & (it < cap)

        def body(st):
            (done, it, ox, oy, oz, dx, dy, dz, Lr, Lg, Lb, br, bg, bb,
             alive, eta_sc_acc, bounces, s_cur, aLr, aLg, aLb, aW, nv,
             prev_spec, prev_pdf, ppx, ppy, ppz) = st
            alive_b = alive > 0

            t_query = jnp.where(alive_b, jnp.float32(np.inf), jnp.float32(-1.0))
            tr = traverse(ox, oy, oz, dx, dy, dz, t_query, any_hit=False)
            valid = tr["hit"]
            at = surface_attrs(tr, ox, oy, oz, dx, dy, dz)
            lid_h = tr["light"]
            if spheres:
                # baked full spheres merged against the traversal winner
                BIG = jnp.float32(1e30)
                t_all = jnp.where(valid, tr["t"], BIG)
                for pr in spheres:
                    h_s, t_s, p_loc = _sph_test(pr, ox, oy, oz, dx, dy, dz, t_query)
                    t_s = jnp.where(h_s, t_s, BIG)
                    better = t_s < t_all
                    t_all = jnp.where(better, t_s, t_all)
                    at_s = _sph_attrs(pr, p_loc)
                    for k_, v_ in at_s.items():
                        at[k_] = jnp.where(better, v_, at[k_])
                    at["mat"] = jnp.where(better, pr["mat"], at["mat"])
                    valid = valid | better
                    lid_h = jnp.where(better, pr.get("light", -1), lid_h)
            nv = nv + jnp.where(alive_b & valid, 1.0, 0.0)

            wox, woy, woz = -dx, -dy, -dz
            # area-light emission pickup with deferred MIS
            # (trace_persistent:718-736; diffuse.rs l())
            if any_area:
                emitting = alive_b & valid & (lid_h >= 0)
                ler = jnp.zeros(shape, F32)
                leg = jnp.zeros(shape, F32)
                leb = jnp.zeros(shape, F32)
                area_h = jnp.ones(shape, F32)
                selp = jnp.zeros(shape, F32)
                for i, lt in enumerate(lights):
                    if lt["kind"] != LIGHT_AREA:
                        continue
                    m = lid_h == i
                    par = lt["par"]
                    cos_e = _dot3(at["ngx"], at["ngy"], at["ngz"], wox, woy, woz)
                    em = (cos_e > 0) | bool(lt["two_sided"])
                    ler = jnp.where(m & em, jnp.float32(par[0]), ler)
                    leg = jnp.where(m & em, jnp.float32(par[1]), leg)
                    leb = jnp.where(m & em, jnp.float32(par[2]), leb)
                    area_h = jnp.where(m, jnp.float32(lt["area"]), area_h)
                    selp = jnp.where(m, jnp.float32(consts["light_pmf"][i]), selp)
                tx = at["px"] - ppx
                ty = at["py"] - ppy
                tz = at["pz"] - ppz
                d2 = jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-12)
                wl = 1.0 / jnp.sqrt(d2)
                cos_l = jnp.abs(_dot3(at["ngx"], at["ngy"], at["ngz"],
                                      -tx * wl, -ty * wl, -tz * wl))
                p_lh = jnp.where(cos_l > 1e-7, d2 / jnp.maximum(cos_l * area_h, 1e-12), 0.0) * selp
                for i, lt in enumerate(lights):
                    if lt["kind"] != LIGHT_AREA or not lt.get("sphere"):
                        continue
                    # sphere lights hit from outside use the cone density
                    # (lights.pdf_li_area_hit cone_spheres branch)
                    c = lt["c"]
                    r_w = float(lt["r"])
                    tcx = jnp.float32(c[0]) - ppx
                    tcy = jnp.float32(c[1]) - ppy
                    tcz = jnp.float32(c[2]) - ppz
                    dc2 = jnp.maximum(tcx * tcx + tcy * tcy + tcz * tcz, 1e-12)
                    outside = dc2 > r_w * r_w * 1.0001
                    sin2_tm = jnp.clip(r_w * r_w / dc2, 0.0, 1.0)
                    cos_tm = jnp.sqrt(jnp.maximum(1.0 - sin2_tm, 0.0))
                    pdf_cone = 1.0 / jnp.maximum(
                        jnp.float32(2.0 * math.pi) * (1.0 - cos_tm), 1e-12)
                    p_lh = jnp.where((lid_h == i) & outside,
                                     pdf_cone * jnp.float32(consts["light_pmf"][i]),
                                     p_lh)
                w_mis = jnp.where(prev_spec > 0, 1.0, power_heuristic(prev_pdf, p_lh))
                Lr = Lr + jnp.where(emitting, br * ler * w_mis, 0.0)
                Lg = Lg + jnp.where(emitting, bg * leg * w_mis, 0.0)
                Lb = Lb + jnp.where(emitting, bb * leb * w_mis, 0.0)

            if inf_idx >= 0:
                # escaped rays pick up the constant env radiance with the
                # same deferred-MIS weight (integrator.py:713-720)
                esc = alive_b & ~valid
                par_e = lights[inf_idx]["par"]
                p_env = jnp.float32(INV_4PI * float(consts["light_pmf"][inf_idx]))
                w_env = jnp.where(prev_spec > 0, 1.0,
                                  power_heuristic(prev_pdf, p_env))
                Lr = Lr + jnp.where(esc, br * jnp.float32(par_e[3]) * w_env, 0.0)
                Lg = Lg + jnp.where(esc, bg * jnp.float32(par_e[4]) * w_env, 0.0)
                Lb = Lb + jnp.where(esc, bb * jnp.float32(par_e[5]) * w_env, 0.0)

            alive_b = alive_b & valid
            dim_base = (2 + bounces * DPB).astype(I32)
            can_scatter = alive_b & (bounces < max_depth - 1)
            mat = at["mat"]
            none_m = mat_mask(mat, LOBE_NONE)
            alive_sh = can_scatter & ~none_m

            bs = bsdf_sample(hbase, s_cur, dim_base, at, wox, woy, woz, mat)
            if n_lights > 0:
                cr, cg, cb = nee(hbase, s_cur, dim_base, alive_sh, at,
                                 wox, woy, woz, mat,
                                 bs["kdr"], bs["kdg"], bs["kdb"])
                Lr = Lr + br * cr
                Lg = Lg + bg * cg
                Lb = Lb + bb * cb

            cos_term = jnp.abs(_dot3(bs["wwx"], bs["wwy"], bs["wwz"],
                                     at["nsx"], at["nsy"], at["nsz"]))
            inv_pdf = cos_term / jnp.maximum(bs["pdf"], 1e-30)
            thr = bs["fr"] * inv_pdf
            thg = bs["fg"] * inv_pdf
            thb = bs["fb"] * inv_pdf
            surf_cont = alive_sh & bs["valid"] & ((thr > 0) | (thg > 0) | (thb > 0))

            new_br = jnp.where(surf_cont, br * thr, br)
            new_bg = jnp.where(surf_cont, bg * thg, bg)
            new_bb = jnp.where(surf_cont, bb * thb, bb)
            nox, noy, noz = _offset_ray(at["px"], at["py"], at["pz"],
                                        at["ngx"], at["ngy"], at["ngz"],
                                        bs["wwx"], bs["wwy"], bs["wwz"],
                                        at["ex"], at["ey"], at["ez"])
            new_ox = jnp.where(surf_cont, nox, ox)
            new_oy = jnp.where(surf_cont, noy, oy)
            new_oz = jnp.where(surf_cont, noz, oz)
            new_dx = jnp.where(surf_cont, bs["wwx"], dx)
            new_dy = jnp.where(surf_cont, bs["wwy"], dy)
            new_dz = jnp.where(surf_cont, bs["wwz"], dz)
            eta_acc = jnp.where(surf_cont, eta_sc_acc * bs["eta_scale"], eta_sc_acc)
            new_bounces = bounces + surf_cont.astype(I32)
            new_alive_b = surf_cont
            new_spec = jnp.where(surf_cont, bs["specular"].astype(I32), prev_spec)
            new_pdf = jnp.where(surf_cont, jnp.maximum(bs["pdf"], 1e-30), prev_pdf)
            new_ppx = jnp.where(surf_cont, at["px"], ppx)
            new_ppy = jnp.where(surf_cont, at["py"], ppy)
            new_ppz = jnp.where(surf_cont, at["pz"], ppz)

            rr_r = new_br * eta_acc
            rr_g = new_bg * eta_acc
            rr_b = new_bb * eta_acc
            max_c = jnp.maximum(rr_r, jnp.maximum(rr_g, rr_b))
            q = jnp.maximum(0.05, 1.0 - max_c)
            do_rr = (new_bounces > 3) & (max_c < jnp.float32(rr_threshold))
            u_rr = sample_1d_traced(hbase, s_cur, dim_base + 4)
            killed = do_rr & (u_rr < q)
            new_alive_b = new_alive_b & ~killed
            boost = 1.0 / jnp.maximum(1.0 - q, 1e-6)
            keepm = do_rr & ~killed
            new_br = jnp.where(keepm, new_br * boost, new_br)
            new_bg = jnp.where(keepm, new_bg * boost, new_bg)
            new_bb = jnp.where(keepm, new_bb * boost, new_bb)

            die = (done == 0) & ~new_alive_b
            fin = jnp.isfinite(Lr) & jnp.isfinite(Lg) & jnp.isfinite(Lb)
            Lfr = jnp.maximum(jnp.where(fin, Lr, 0.0), 0.0)
            Lfg = jnp.maximum(jnp.where(fin, Lg, 0.0), 0.0)
            Lfb = jnp.maximum(jnp.where(fin, Lb, 0.0), 0.0)
            if max_lum < float("inf"):
                y = Lfr * 0.212671 + Lfg * 0.715160 + Lfb * 0.072169
                scl = jnp.where(y > max_lum, jnp.float32(max_lum) / jnp.maximum(y, 1e-12), 1.0)
                Lfr, Lfg, Lfb = Lfr * scl, Lfg * scl, Lfb * scl
            aLr = aLr + jnp.where(die, Lfr, 0.0)
            aLg = aLg + jnp.where(die, Lfg, 0.0)
            aLb = aLb + jnp.where(die, Lfb, 0.0)
            aW = aW + jnp.where(die, 1.0, 0.0)

            s_next = s_cur + U32(1)
            more = die & (s_next < s0 + U32(n_samples))
            done = jnp.where(die & ~more, 1, done)
            s_sel = jnp.where(more, s_next, s_cur)
            rox, roy, roz, rdx, rdy, rdz = regen(hbase, px_f, py_f, s_sel, hoffu)
            new_ox = jnp.where(more, rox, new_ox)
            new_oy = jnp.where(more, roy, new_oy)
            new_oz = jnp.where(more, roz, new_oz)
            new_dx = jnp.where(more, rdx, new_dx)
            new_dy = jnp.where(more, rdy, new_dy)
            new_dz = jnp.where(more, rdz, new_dz)
            Lr = jnp.where(more, 0.0, Lr)
            Lg = jnp.where(more, 0.0, Lg)
            Lb = jnp.where(more, 0.0, Lb)
            new_br = jnp.where(more, 1.0, new_br)
            new_bg = jnp.where(more, 1.0, new_bg)
            new_bb = jnp.where(more, 1.0, new_bb)
            new_alive_b = new_alive_b | more
            eta_acc = jnp.where(more, 1.0, eta_acc)
            new_bounces = jnp.where(more, 0, new_bounces)
            s_cur = jnp.where(more, s_next, s_cur)
            new_spec = jnp.where(more, 1, new_spec)
            new_pdf = jnp.where(more, 1.0, new_pdf)
            new_ppx = jnp.where(more, rox, new_ppx)
            new_ppy = jnp.where(more, roy, new_ppy)
            new_ppz = jnp.where(more, roz, new_ppz)

            return (done, it + 1, new_ox, new_oy, new_oz, new_dx, new_dy, new_dz,
                    Lr, Lg, Lb, new_br, new_bg, new_bb,
                    new_alive_b.astype(I32), eta_acc, new_bounces, s_cur,
                    aLr, aLg, aLb, aW, nv,
                    new_spec, new_pdf, new_ppx, new_ppy, new_ppz)

        st0 = (done0, jnp.int32(0), ox0, oy0, oz0, dx0, dy0, dz0,
               zero, zero, zero, zero + 1.0, zero + 1.0, zero + 1.0,
               alive0, zero + 1.0, jnp.zeros(shape, I32), s_init,
               zero, zero, zero, zero, zero,
               jnp.ones(shape, I32), zero + 1.0, ox0, oy0, oz0)
        st = jax.lax.while_loop(cond, body, st0)
        out_lr[...] = st[18]
        out_lg[...] = st[19]
        out_lb[...] = st[20]
        out_w[...] = st[21]
        out_nv[...] = st[22]

    return kernel


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def make_wide_megakernel_fn(cs, cam, icfg, scfg, fcfg, consts=None, interpret=None):
    """wave_p-compatible persistent function backed by the traversal
    megakernel: fn(sa, px, py, pids, s0, n_samples, seed) ->
    (accLw (R,3), accW (R,), n_vertices (R,))."""
    if consts is None:
        consts = extract_wide_consts(cs, cam, icfg, scfg, fcfg)
    if consts is None:
        return None
    if interpret is None:
        if jax.devices()[0].platform != "tpu":
            import os

            if not os.environ.get("PBRT_TPU_MEGAKERNEL_INTERPRET"):
                return None
            interpret = True
        else:
            interpret = False

    halton_aux = scfg.get("halton") if scfg["kind"] == "halton" else None

    @functools.partial(jax.jit, static_argnums=(5,))
    def wave_p(sa, px, py, pixel_ids, s0, n_samples, seed):
        # geometry tables come through `sa` as REAL jit arguments — closure
        # capture would hoist them as module constants, which this jax
        # version mis-supplies at dispatch (see device/efloat.py history)
        wnode = sa.wnode_tab
        wprim = sa.wprim_tab
        wmeta = sa.wmeta_tab
        # dummy attr table when the scene has no shading normals (the
        # kernel never touches it; keeps one signature)
        wattr = sa.wattr_tab if consts.get("has_attr") else jnp.zeros((8, 128), F32)
        kernel = _build_kernel(consts, int(n_samples))
        R = px.shape[0]
        # packet coherence: each 128-lane sublane row shares ONE traversal
        # stack, so order lanes into 16x8 pixel tiles instead of raster
        # strips (1x128 strips measured 3-5x worse traversal unions on the
        # standalone kernel). Per-pixel sample streams key off pid, so lane
        # placement cannot change the estimate — outputs are un-permuted.
        key = (py.astype(jnp.int32) // 8) * jnp.int32(1 << 14) + px.astype(jnp.int32)
        perm = jnp.argsort(key)
        inv_perm = jnp.argsort(perm)
        px = px[perm]
        py = py[perm]
        pixel_ids = pixel_ids[perm]
        blk = SUB * LANES
        n_blocks = max((R + blk - 1) // blk, 1)
        Rp = n_blocks * blk
        pad = Rp - R

        def padded(x, fill):
            x = jnp.asarray(x)
            if pad:
                x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
            return x.reshape(n_blocks * SUB, LANES)

        px2 = padded(px.astype(I32), -1)
        py2 = padded(py.astype(I32), 0)
        pid2 = padded(pixel_ids.astype(U32), 0).astype(I32)
        if halton_aux is not None:
            hoff = halton_aux["offset"][pixel_ids]  # (R,) u32, one XLA gather
        else:
            hoff = jnp.zeros(R, jnp.uint32)
        aux0 = padded(hoff, 0).astype(I32)
        scal = jnp.stack([jnp.asarray(seed, U32), jnp.asarray(s0, U32)]).reshape(1, 2)

        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(jax.ShapeDtypeStruct((n_blocks * SUB, LANES), F32) for _ in range(5)),
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((SUB, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SUB, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec((SUB, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM)
                for _ in range(5)),
            scratch_shapes=[
                pltpu.SMEM((SUB * STACK,), jnp.int32),
                pltpu.SMEM((SUB,), jnp.int32),
                pltpu.SMEM((SUB,), jnp.int32),
                pltpu.VMEM((SUB * (32 if consts.get("has_attr") else 16), LANES), F32),
            ],
            interpret=interpret,
        )(scal, px2, py2, pid2, aux0, wmeta, wnode, wprim, wattr)

        lr, lg, lb, w, nv = [o.reshape(Rp)[:R][inv_perm] for o in outs]
        return jnp.stack([lr, lg, lb], axis=-1), w, nv

    # one tiny probe wave: the traversal megakernel is by far the biggest
    # Mosaic program in the tree — reject-at-compile must fall back to the
    # XLA persistent wave instead of killing the render (cf. pallas_bvh
    # _joint_probe)
    if not interpret:
        try:
            import numpy as _np

            pxp = jnp.asarray(_np.arange(SUB * LANES) % 16, I32)
            pyp = jnp.asarray(_np.arange(SUB * LANES) // 16 % 8, I32)
            pidp = jnp.asarray(_np.arange(SUB * LANES), jnp.uint32)
            out = wave_p(cs.arrays, pxp, pyp, pidp, jnp.uint32(0), 1, jnp.uint32(0))
            jax.block_until_ready(out)
        except Exception as e:  # pragma: no cover - backend-specific
            import logging

            logging.getLogger(__name__).warning(
                "wide megakernel probe failed (%s); using XLA persistent wave", e)
            return None

    return wave_p
