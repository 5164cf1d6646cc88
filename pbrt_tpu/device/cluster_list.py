"""List-driven cluster traversal: the mesh-scene closest/any-hit tier.

The wide-BVH packet kernel (pallas_bvh.py) walks a shared per-packet
stack; every pop pays a serial scalar chain (~450-800ns) and the packet's
cost is the UNION of its lanes' traversal paths — measured 1.35 Mrays/s on
incoherent bounce waves of the 123k-tri bench scene. This tier removes
the stack entirely:

  1. rays are coherence-sorted and packetized (shared with pallas_bvh);
  2. an XLA pre-pass culls each packet against ALL cluster AABBs with
     conservative interval arithmetic (dense slab tests, ~98G/s on v5e)
     and emits a per-packet candidate list SORTED by conservative entry t
     (jax.lax.top_k);
  3. a Pallas kernel walks each packet's list from SMEM: per candidate
     one VMEM block load + a dense (32 tris x PACKET rays) watertight
     test — no pointer chasing, one short scalar op chain per round, and
     an entry-t early exit once every live lane's closest hit precedes
     the remaining candidates.

Clusters are SAH-BVH subtree cuts (scene/clusters.py), K=32 triangles:
measured per-ray exact candidates on the bench scene are mean 2.1 / p99 8
(camera) — the SAH cut is what keeps lists short. Packet-union list
lengths at production wave density: camera ~6, diffuse bounce ~50.

Semantic parity: the watertight shear test is bit-identical to
pallas_bvh's leaf phase / intersect.ray_triangle (triangle.rs:136-399);
closest-hit returns (t, prim row, b1, b2) like wide_intersect. Packets
whose candidate count exceeds the list cap fall back to the wide-BVH
kernel (correctness is never capped).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_bvh import GRID_G, PACKET, coherence_keys, pack_rays

F32 = jnp.float32
I32 = jnp.int32
EPS = 1e-4  # matches intersect.SHADOW_EPS
SEG = 128  # clusters per extraction segment (one VPU lane row)
SEGCAP = 24  # per-segment candidate cap (overflow -> wide-BVH fallback);
# measured per-segment candidate counts on the bench scene: camera packets
# mean <1, bounce mean ~4 — 24 leaves overflow to the rare worst packets
# re-sync the stale live-lane t upper bound every RESYNC rounds (each sync
# is one ~90ns vector->scalar transfer; staleness only delays the exit)
RESYNC = 8


def _cluster_kernel(segcnt_ref, lists_ref, tes_ref, ctab_ref, rays_ref,
                    out_ref, best_ref, *, any_hit: bool, n_seg: int):
    """GRID_G packets x their segmented candidate lists.

    segcnt_ref: (GRID_G, n_seg) SMEM i32 per-segment candidate counts;
    lists_ref / tes_ref: (GRID_G, n_seg * SEGCAP) SMEM cluster ids /
    conservative entry ts (ascending WITHIN each segment); ctab_ref:
    packed cluster blocks (VMEM, see scene/clusters.pack_cluster_table);
    rays_ref: (GRID_G, 16, PACKET) pack_rays blocks; out_ref:
    (GRID_G, 8, PACKET); best_ref: (8, PACKET) VMEM scratch (row 0
    t_best, 1 prim, 2 b1, 3 b2).

    Rounds whose conservative entry t exceeds the (staleness-tolerant)
    live-lane t upper bound skip the triangle work via pl.when — cheap
    (~20ns scalar chain) instead of free, which is what keeps unsorted
    segment order correct AND fast.
    """

    def run_packet(g, _):
        rr = rays_ref[g]
        ox, oy, oz = rr[0:1, :], rr[1:2, :], rr[2:3, :]
        t_max = rr[9:10, :]
        live = rr[13:14, :] > 0
        sx, sy, sz = rr[6:7, :], rr[7:8, :], rr[8:9, :]
        k0 = rr[14:15, :] > 0
        k1 = rr[15:16, :] > 0

        best_ref[0:1, :] = t_max
        best_ref[1:2, :] = jnp.full((1, PACKET), -1.0, F32)
        best_ref[2:4, :] = jnp.zeros((2, PACKET), F32)

        iota8 = jax.lax.broadcasted_iota(I32, (8, PACKET), 0).astype(F32)

        def round_body(state):
            s, j, rounds, t_ub = state
            i = s * SEGCAP + j
            te_i = tes_ref[g, i]

            @pl.when(te_i <= t_ub)
            def _work():
                c = lists_ref[g, i]
                blk = ctab_ref[pl.ds((c // 2) * 8, 8), :]
                half = jax.lax.cond(c % 2 == 0,
                                    lambda: blk[:, 0:64], lambda: blk[:, 64:128])
                # 4 groups of 8 triangles, tested as (8, PACKET) subrounds
                # (Mosaic rejects lane-offset concats into one (32, 16))
                for g4 in range(4):
                    psub = half[:, g4 * 16:(g4 + 1) * 16]  # (8, 16)
                    t_best = best_ref[0:1, :]
                    valid = psub[:, 9:10] > 0
                    pid_col = psub[:, 10:11]

                    def _shear(j3, psub=psub):
                        vx = psub[:, 3 * j3:3 * j3 + 1] - ox
                        vy = psub[:, 3 * j3 + 1:3 * j3 + 2] - oy
                        vz = psub[:, 3 * j3 + 2:3 * j3 + 3] - oz
                        px = jnp.where(k0, vy, jnp.where(k1, vz, vx))
                        py = jnp.where(k0, vz, jnp.where(k1, vx, vy))
                        pz = jnp.where(k0, vx, jnp.where(k1, vy, vz))
                        return px + sx * pz, py + sy * pz, sz * pz

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
                    tmin = jnp.min(tc, axis=0, keepdims=True)  # (1, PACKET)
                    # 1e30 miss sentinel must never count as an improvement
                    improved = tmin < jnp.minimum(t_best, jnp.float32(1e29))
                    win_slot = jnp.max(jnp.where(tc == tmin, iota8, -1.0),
                                       axis=0, keepdims=True)
                    win = (tc == tmin) & (iota8 == win_slot)
                    prim_new = jnp.sum(jnp.where(win, pid_col, 0.0), axis=0, keepdims=True)
                    best_ref[0:1, :] = jnp.where(improved, tmin, t_best)
                    best_ref[1:2, :] = jnp.where(improved, prim_new, best_ref[1:2, :])
                    if not any_hit:
                        b1_new = jnp.sum(jnp.where(win, e1_ * inv, 0.0), axis=0, keepdims=True)
                        b2_new = jnp.sum(jnp.where(win, e2_ * inv, 0.0), axis=0, keepdims=True)
                        best_ref[2:3, :] = jnp.where(improved, b1_new, best_ref[2:3, :])
                        best_ref[3:4, :] = jnp.where(improved, b2_new, best_ref[3:4, :])

            if any_hit:
                # stop once every live lane has an occluder (one
                # vector->scalar per round; shadow rays occlude early)
                missing = jnp.max(jnp.where(live & (best_ref[1:2, :] < 0), 1.0, 0.0))
                t_ub = jnp.where(missing > 0, t_ub, jnp.float32(-jnp.inf))
            else:
                # refresh the stale live-lane t bound every RESYNC rounds
                # (lax.cond so the ~90ns vector->scalar transfer is skipped
                # on other rounds; t_best only shrinks, so staleness is
                # conservative — pruning just starts a little later)
                t_ub = jax.lax.cond(
                    rounds % RESYNC == RESYNC - 1,
                    lambda: jnp.max(jnp.where(live, best_ref[0:1, :], -jnp.inf)),
                    lambda: t_ub,
                )
            return s, j + 1, rounds + 1, t_ub

        if any_hit:
            # t_ub drops to -inf once every live lane is occluded: break
            def seg_cond(st, ns):
                return (st[1] < ns) & (st[3] > jnp.float32(-jnp.inf))
        else:
            def seg_cond(st, ns):
                return st[1] < ns

        def seg_body(s, carry):
            rounds, t_ub = carry
            ns = segcnt_ref[g, s]
            _, _, rounds, t_ub = jax.lax.while_loop(
                lambda st: seg_cond(st, ns),
                round_body, (s, jnp.int32(0), rounds, t_ub))
            return rounds, t_ub

        t_ub0 = jnp.max(jnp.where(live, t_max, -jnp.inf))
        rounds, _ = jax.lax.fori_loop(0, n_seg, seg_body, (jnp.int32(0), t_ub0))
        out_ref[g, 0:1, :] = best_ref[0:1, :]
        out_ref[g, 1:2, :] = best_ref[1:2, :]
        if not any_hit:
            out_ref[g, 2:4, :] = best_ref[2:4, :]
        # row 5: rounds walked (diagnostics: stats + ns/round calibration)
        out_ref[g, 5:6, :] = jnp.full((1, PACKET), 1.0, F32) * rounds.astype(F32)
        return 0

    jax.lax.fori_loop(0, GRID_G, run_packet, 0)


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _run_lists(ctab, rays, lists, tes, segcnt, any_hit, interpret):
    B = rays.shape[0]
    assert B % GRID_G == 0
    n_seg = segcnt.shape[1]
    kernel = functools.partial(_cluster_kernel, any_hit=any_hit, n_seg=n_seg)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 8, PACKET), F32),
        grid=(B // GRID_G,),
        in_specs=[
            pl.BlockSpec((GRID_G, n_seg), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((GRID_G, n_seg * SEGCAP), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((GRID_G, n_seg * SEGCAP), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((GRID_G, 16, PACKET), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GRID_G, 8, PACKET), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, PACKET), F32)],
        interpret=interpret,
    )(segcnt, lists, tes, ctab, rays)


def _interval_mul(a_lo, a_hi, b_lo, b_hi):
    """Interval product [a_lo,a_hi] x [b_lo,b_hi]."""
    p1 = a_lo * b_lo
    p2 = a_lo * b_hi
    p3 = a_hi * b_lo
    p4 = a_hi * b_hi
    return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
            jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))


def packet_lists(cl_lo, cl_hi, o, d, t_arr):
    """Conservative per-packet segmented candidate lists.

    o/d: (B*PACKET, 3) SORTED rays; t_arr: (B*PACKET,) t_max (<=0 dead).
    Returns (lists (B, n_seg*SEGCAP) i32, tes (B, n_seg*SEGCAP) f32,
    segcnt (B, n_seg) i32, overflow (B,) bool). A cluster enters a
    packet's list iff SOME ray of the packet COULD enter its AABB before
    t_max (interval arithmetic over the packet's origin / inv-direction
    ranges — never misses a real hit). Extraction is per 128-cluster
    SEGMENT with SEGCAP iterative argmin passes — no top_k (measured 36ms
    on (2048, 5515), the whole cull budget); entries are te-ascending
    within a segment, and a segment with more than SEGCAP candidates
    overflows the packet to the wide-BVH fallback.
    """
    C = cl_lo.shape[0]
    B = o.shape[0] // PACKET
    o_p = o.reshape(B, PACKET, 3)
    d_p = d.reshape(B, PACKET, 3)
    live = (t_arr > 0).reshape(B, PACKET)
    inv = 1.0 / jnp.where(jnp.abs(d_p) < 1e-30,
                          jnp.where(d_p < 0, -1e-30, 1e-30), d_p)
    big = jnp.float32(3e37)

    def rng(x, m):
        lo_ = jnp.min(jnp.where(m[..., None], x, big), axis=1)
        hi_ = jnp.max(jnp.where(m[..., None], x, -big), axis=1)
        return lo_, hi_

    olo, ohi = rng(o_p, live)  # (B, 3)
    ilo, ihi = rng(inv, live)
    tlive = jnp.max(jnp.where(live, t_arr.reshape(B, PACKET), 0.0), axis=1)  # (B,)
    any_live = jnp.any(live, axis=1)

    # interval slab: t0 = (cl_lo - o) * inv, t1 = (cl_hi - o) * inv.
    # Axis loop keeps the peak intermediate at (B, C) instead of (B, C, 3)
    tn_lb = jnp.full((B, C), -jnp.inf, F32)
    tf_ub = jnp.full((B, C), jnp.inf, F32)
    for ax in range(3):
        a_lo = cl_lo[None, :, ax] - ohi[:, None, ax]  # (B, C)
        a_hi = cl_lo[None, :, ax] - olo[:, None, ax]
        b_lo = cl_hi[None, :, ax] - ohi[:, None, ax]
        b_hi = cl_hi[None, :, ax] - olo[:, None, ax]
        il = ilo[:, None, ax]
        ih = ihi[:, None, ax]
        t0_lo, t0_hi = _interval_mul(a_lo, a_hi, il, ih)
        t1_lo, t1_hi = _interval_mul(b_lo, b_hi, il, ih)
        tn_lb = jnp.maximum(tn_lb, jnp.minimum(t0_lo, t1_lo))
        tf_ub = jnp.minimum(tf_ub, jnp.maximum(t0_hi, t1_hi))
    # segment-padding clusters (cl_lo ~ 3e38, scene/clusters.py) must never
    # become candidates — their inverted boxes pass the interval test
    real = (cl_lo[:, 0] <= 1e37)[None, :]
    maybe = (tn_lb <= tf_ub) & (tf_ub > 0) & \
        (tn_lb < tlive[:, None]) & any_live[:, None] & real
    te = jnp.where(maybe, jnp.maximum(tn_lb, 0.0), jnp.inf)

    n_seg = (C + SEG - 1) // SEG
    if n_seg * SEG > C:
        te = jnp.pad(te, ((0, 0), (0, n_seg * SEG - C)), constant_values=jnp.inf)
    te3 = te.reshape(B, n_seg, SEG)
    counts_true = jnp.sum(jnp.isfinite(te3), axis=2)  # (B, n_seg)
    lane = jax.lax.broadcasted_iota(I32, (B, n_seg, SEG), 2)
    idx_parts = []
    te_parts = []
    cur = te3
    for _ in range(SEGCAP):
        v = jnp.min(cur, axis=2)  # (B, n_seg)
        a = jnp.argmin(cur, axis=2).astype(jnp.int32)
        idx_parts.append(a)
        te_parts.append(v)
        cur = jnp.where(lane == a[:, :, None], jnp.inf, cur)
    seg_base = (jnp.arange(n_seg, dtype=jnp.int32) * SEG)[None, :, None]
    idx = jnp.stack(idx_parts, axis=2) + seg_base  # (B, n_seg, SEGCAP)
    tes = jnp.stack(te_parts, axis=2)
    segcnt = jnp.minimum(counts_true, SEGCAP).astype(jnp.int32)
    overflow = jnp.any(counts_true > SEGCAP, axis=1)
    return (idx.reshape(B, n_seg * SEGCAP), tes.reshape(B, n_seg * SEGCAP),
            segcnt, overflow)


def cluster_intersect(sa, static, o, d, t_max, any_hit=False, interpret=False,
                      sort=True):
    """Closest-hit / any-hit via the cluster-list tier.

    Same contract as pallas_bvh.wide_intersect: closest returns
    (t, prim, hit, b1, b2); any-hit returns (t, prim, hit). Packets whose
    candidate count exceeds NC are re-traced through wide_intersect and
    merged (conservative-correct composition).
    """
    from .pallas_bvh import wide_intersect

    R0 = o.shape[0]
    t_arr = jnp.broadcast_to(jnp.asarray(t_max, F32), (R0,))
    perm = None
    if sort and R0 >= 2 * PACKET:
        wl = sa.world_center - sa.world_radius
        inv_ext = 1.0 / jnp.maximum(2.0 * sa.world_radius, 1e-20)
        keys = coherence_keys(o, d, wl, inv_ext)
        keys = jnp.where(t_arr > 0, keys, jnp.uint32(0xFFFFFFFF))
        perm = jax.lax.optimization_barrier(jnp.argsort(keys))
        packed = jnp.concatenate(
            [o, d, t_arr[:, None], jnp.zeros_like(t_arr)[:, None]], axis=1)[perm]
        o, d, t_arr = packed[:, 0:3], packed[:, 3:6], packed[:, 6]
    live = jnp.where(t_arr > 0, 1.0, 0.0)
    blocks, R, B = pack_rays(o, d, t_arr, live)
    # pad the ray streams to the packed length for the cull
    pad = B * PACKET - R
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), F32)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), F32)])
        t_arr = jnp.concatenate([t_arr, jnp.full(pad, -1.0, F32)])
    lists, tes, segcnt, overflow = packet_lists(sa.cl_lo, sa.cl_hi, o, d, t_arr)
    out = _run_lists(sa.cl_tab, blocks, lists, tes, segcnt, any_hit, interpret)

    t = out[:, 0, :].reshape(-1)[:R]
    prim = out[:, 1, :].reshape(-1)[:R]
    b1 = out[:, 2, :].reshape(-1)[:R]
    b2 = out[:, 3, :].reshape(-1)[:R]

    # overflow packets: re-trace those rays through the wide-BVH kernel
    # (already sorted; sort=False keeps their order)
    any_over = jnp.any(overflow)
    over_ray = jnp.repeat(overflow, PACKET)[:R]

    def with_fallback():
        t_q = jnp.where(over_ray, t_arr[:R], -1.0)
        if any_hit:
            t_f, prim_f, hit_f = wide_intersect(
                sa, static, o[:R], d[:R], t_q, any_hit=True,
                interpret=interpret, sort=False)
            return (jnp.where(over_ray, jnp.where(hit_f, t_f, t_arr[:R]), t),
                    jnp.where(over_ray, jnp.where(hit_f, 1.0, -1.0), prim),
                    b1, b2)
        t_f, prim_f, hit_f, b1_f, b2_f = wide_intersect(
            sa, static, o[:R], d[:R], t_q, any_hit=False,
            interpret=interpret, sort=False)
        return (jnp.where(over_ray, jnp.where(hit_f, t_f, t_arr[:R]), t),
                jnp.where(over_ray, jnp.where(hit_f, prim_f.astype(F32), -1.0), prim),
                jnp.where(over_ray, b1_f, b1),
                jnp.where(over_ray, b2_f, b2))

    t, prim, b1, b2 = jax.lax.cond(
        any_over, with_fallback, lambda: (t, prim, b1, b2))

    res = [t, prim, b1, b2]
    if perm is not None:
        inv_p = jax.lax.optimization_barrier(jnp.argsort(perm))
        unsorted = jnp.stack(res, axis=1)[inv_p]
        res = [unsorted[:, j] for j in range(4)]
    t, prim, b1, b2 = res
    prim_i = prim.astype(jnp.int32)
    hit = prim_i >= 0
    t = jnp.where(hit, t, jnp.float32(jnp.inf))
    if any_hit:
        return t, prim_i, hit
    return t, prim_i, hit, b1, b2
