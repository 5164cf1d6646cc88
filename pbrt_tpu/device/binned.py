"""Binned per-ray traversal: dense AABB culling + fixed-slot candidate
extraction — the coherence-FREE mesh traversal tier.

Both packet tiers (pallas_bvh shared-stack walk, cluster_list packet
culling) pay for ray divergence: a 256-lane packet's traversal cost is
the UNION of its lanes' paths, which approaches the whole tree on
bounce waves (measured 1.35 / 0.49 Mrays/s incoherent on the 123k-tri
bench scene vs ~9 / 4.5 coherent). This tier never groups rays at all —
every phase is a dense per-ray computation, so incoherent waves run at
the same rate as coherent ones:

  1. SUPERNODE CULL: every ray x every supernode AABB (S ~ C/8) slab
     test, fused directly into 32-wide bitmask words (no (R, S) bool
     materialization);
  2. EXTRACT: per ray, pop up to K1 set bits from the word vector
     (lowest-bit loop — pure vector ops, rays ride the lanes);
  3. CLUSTER CULL: one 512B row DMA per (ray, supernode) fetches all
     <=16 member-cluster AABBs + ids (scene/clusters.py su_bounds);
     slab tests run on static slices of the row, then the K2 nearest
     candidates come out via pure min-reductions (no argmin gathers);
  4. TRIANGLE TEST: for each of the K2 candidate slots (near-to-far),
     row-gather the cluster's packed 32-triangle block and run the exact
     watertight test (intersect.ray_triangle — bit-identical to the
     packet tiers); t_best shrinks slot-by-slot, so far candidates are
     pruned for free, and winners resolve by packed min-reductions.

Rays whose candidate sets overflow the fixed K1/K2 slots fall back to
the wide-BVH packet kernel with all in-budget lanes masked dead
(correctness is never capped). Dead lanes (t_max < 0) produce zero
candidates and cost only the dense cull flops.

Semantic reference: src/accelerators/bvh.rs:705-814 (the traversal this
replaces); triangle.rs:136-399 (watertight test, shared with every other
tier via intersect.ray_triangle).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32
INF = jnp.inf

# one-hot supernode fetch A/B flag, read ONCE at import: binned_intersect is
# traced into jitted integrators, so a runtime env read would be captured at
# first trace anyway (and the jit cache is not keyed on it). Importing the
# module after setting the env var is the supported toggle (tools/
# binned_phases re-invokes python per variant).
import os as _os

_ONEHOT = _os.environ.get("PBRT_TPU_BINNED_ONEHOT", "") == "1"

K1 = 16  # supernode candidate slots per ray (supers hold <= 16 clusters)
K2 = 12  # cluster candidate slots per ray


def _safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)


def _slab_cw(lo3, hi3, oinv, inv, t_max):
    """Entry distance of ray vs AABB, component-wise; +inf when missed.

    lo3/hi3: 3-tuples of (...,) per-axis bounds; oinv/inv: 3-tuples of
    per-axis ray constants (broadcastable); t_max (...).

    LAYOUT-CRITICAL: everything stays rank<=2 with a lane-friendly minor
    axis. The (..., 3)-vectorized form made XLA lay huge gather results
    out as f32[N,3]{T(8,128)} — 3 lanes padded to 128, a 42x blowup that
    OOM'd the chip at 32.7G.
    """
    tn = None
    tf = None
    for c in range(3):
        t0 = lo3[c] * inv[c] - oinv[c]
        t1 = hi3[c] * inv[c] - oinv[c]
        lo_c = jnp.minimum(t0, t1)
        hi_c = jnp.maximum(t0, t1)
        tn = lo_c if tn is None else jnp.maximum(tn, lo_c)
        tf = hi_c if tf is None else jnp.minimum(tf, hi_c)
    # reference gamma(3) robustness pad (intersect.ray_aabb / bvh.rs)
    tf = tf * 1.0000004
    ok = (tn <= tf) & (tf > 0) & (tn < t_max)
    return jnp.where(ok, jnp.maximum(tn, 0.0), INF)


def _low_bit_index32(w):
    """Index of the lowest set bit of u32 w (w != 0); exact float-exponent
    trick (the low bit is a power of two, so the f32 convert is exact)."""
    low = (w & (~w + U32(1))).astype(U32)
    f = low.astype(F32)
    return (jax.lax.bitcast_convert_type(f, I32) >> 23) - 127


def _extract_bits(words, K: int):
    """Pop the K lowest set bits of each row of `words` (R, W) u32.

    Returns (idx (R, K) i32 with -1 pads, overflow (R,) bool). Pure
    vector ops: per iteration, find the first nonzero word (min over W of
    masked iota), select it (W-way select chain), pop its lowest bit.
    """
    R, W = words.shape
    iota = jnp.arange(W, dtype=I32)

    def body(k, st):
        words, out = st
        nz = words != 0
        fw = jnp.min(jnp.where(nz, iota[None, :], W), axis=1)  # (R,)
        has = fw < W
        fwc = jnp.where(has, fw, 0)
        # masked reduction instead of a per-row element gather (gathers
        # run on the scalar core; this is extraction's hot loop)
        sel = iota[None, :] == fwc[:, None]
        w = jnp.max(jnp.where(sel, words, U32(0)), axis=1)
        bit = w & (~w + U32(1))
        idx = fwc * 32 + _low_bit_index32(jnp.where(has, w, U32(1)))
        out = out.at[k].set(jnp.where(has, idx, -1))
        words = jnp.where(sel & has[:, None], words ^ bit[:, None], words)
        return words, out

    def cond(st):
        k, (w, _o) = st
        return (k < K) & jnp.any(w != 0)

    def step(st):
        k, inner = st
        return k + 1, body(k, inner)

    _, (words, out) = jax.lax.while_loop(
        cond, step, (jnp.int32(0), (words, jnp.full((K, R), -1, I32))))
    overflow = jnp.any(words != 0, axis=1)
    return out.T, overflow


def _cull_supers_words(su_lo, su_hi, o, inv, t_arr, block: int = 4096):
    """Dense ray x supernode cull, emitted as per-ray 32-bit mask words.

    Processed in ray blocks via lax.map so the (block, S) intermediates
    stay small enough to fuse; output is only (R, ceil(S/32)) u32.
    """
    S = su_lo.shape[0]
    W = (S + 31) // 32
    Sp = W * 32
    pad = Sp - S
    lo = jnp.concatenate([su_lo, jnp.full((pad, 3), 3e38, F32)]) if pad else su_lo
    hi = jnp.concatenate([su_hi, jnp.full((pad, 3), -3e38, F32)]) if pad else su_hi
    R = o.shape[0]
    nb = (R + block - 1) // block
    Rp = nb * block
    if Rp != R:
        o = jnp.concatenate([o, jnp.zeros((Rp - R, 3), F32)])
        inv = jnp.concatenate([inv, jnp.ones((Rp - R, 3), F32)])
        t_arr = jnp.concatenate([t_arr, jnp.full((Rp - R,), -1.0, F32)])

    shift = (1 << (jnp.arange(32, dtype=U32))).astype(U32)  # (32,)

    def blk(args):
        o_b, inv_b, t_b = args
        oinv_b = o_b * inv_b
        tn = _slab_cw(
            tuple(lo[None, :, c] for c in range(3)),
            tuple(hi[None, :, c] for c in range(3)),
            tuple(oinv_b[:, c:c + 1] for c in range(3)),
            tuple(inv_b[:, c:c + 1] for c in range(3)),
            t_b[:, None])  # (B, Sp)
        hitb = jnp.isfinite(tn).reshape(block, W, 32)
        return jnp.sum(jnp.where(hitb, shift[None, None, :], U32(0)),
                       axis=2, dtype=U32)  # (B, W)

    words = jax.lax.map(blk, (o.reshape(nb, block, 3), inv.reshape(nb, block, 3),
                              t_arr.reshape(nb, block)))
    return words.reshape(Rp, W)[:R], S


def _onehot_rows(idx, table, n_rows: int):
    """Fetch su_bounds rows by index with one-hot MXU matmuls instead of a
    row gather (ROOFLINE.md §3 "MXU one-hot gathers ... viable for the
    supernode level"). Two bf16 matmuls per fetch reconstruct the f32 row
    as hi + lo, which carries ~17 effective mantissa bits:

    - member AABB columns (col%8 in 0..5) are pre-INFLATED by 2^-16
      relative before the split, so the <= 2^-17 split error keeps the
      reconstructed bounds conservative (spurious candidates are harmless;
      missed ones are not);
    - the cluster-id column (col%8 == 6) reconstructs EXACTLY: cid is an
      integer < 2^16 (binned gate caps n_clusters at 8192), bf16(cid) is
      an integer with error <= 2^7, so the residual is an integer of
      magnitude <= 2^7 — exact in bf16; the MXU accumulates in f32 and
      one-hot entries are exact, so hi[sid] + lo[sid] == cid.

    Cost ~0.5 ms per 262k-ray slot at 512 supers vs the 62 M rows/s row-
    gather floor. Gated by PBRT_TPU_BINNED_ONEHOT (A/B: tools/binned_phases)."""
    col = jnp.arange(table.shape[1], dtype=I32) % 8
    is_lo = col < 3
    is_hi = (col >= 3) & (col < 6)
    pad = jnp.abs(table) * F32(2 ** -16)
    t_adj = jnp.where(is_lo[None, :], table - pad,
                      jnp.where(is_hi[None, :], table + pad, table))
    hi = t_adj.astype(jnp.bfloat16)
    lo = (t_adj - hi.astype(F32)).astype(jnp.bfloat16)
    oh = (idx[:, None] == jnp.arange(n_rows, dtype=I32)[None, :]).astype(jnp.bfloat16)
    return (jax.lax.dot(oh, hi, preferred_element_type=F32)
            + jax.lax.dot(oh, lo, preferred_element_type=F32))


@functools.partial(jax.jit, static_argnums=(0, 1, 8, 9))
def _binned_core(n_clusters, any_hit, su_lo, su_hi, su_bounds,
                 cl_rows, o, d, R, onehot, t_arr):
    from .intersect import ray_triangle

    inv = _safe_inv(d)
    oinv = o * inv

    # ---- phase 1: supernode cull -> bitmask words -> K1 slot extract ----
    words, S = _cull_supers_words(su_lo, su_hi, o, inv, t_arr)
    sup_idx, ovf1 = _extract_bits(words, K1)

    # ---- phase 2: member-cluster cull from packed 512B bounds rows ----
    # per super slot: ONE row gather (fast DMA) + static-slice slab tests
    # per member. No per-element gathers anywhere (they run on the scalar
    # core: the gather-based formulation measured 2.2s per 262k wave).
    # onehot=True replaces the gather with the exact one-hot MXU fetch.
    M = su_bounds.shape[1] // 8
    n_su = su_bounds.shape[0]
    oinv_t = tuple(oinv[:, c:c + 1] for c in range(3))
    inv_t = tuple(inv[:, c:c + 1] for c in range(3))
    tn_cols = []
    id_cols = []
    for k in range(K1):
        sid = sup_idx[:, k]
        sid_b = jax.lax.optimization_barrier(jnp.maximum(sid, 0))
        if onehot:
            row = _onehot_rows(sid_b, su_bounds, n_su)  # (R, M*8)
        else:
            row = jax.lax.optimization_barrier(su_bounds[sid_b])  # (R, M*8)
        ok_slot = sid >= 0
        for m in range(M):
            base = m * 8
            tn_m = _slab_cw(tuple(row[:, base + c:base + c + 1] for c in range(3)),
                            tuple(row[:, base + 3 + c:base + 4 + c] for c in range(3)),
                            oinv_t, inv_t, t_arr[:, None])[:, 0]
            cid_m = row[:, base + 6]  # f32-encoded cluster id (exact < 2^24)
            tn_cols.append(jnp.where(ok_slot & (cid_m >= 0), tn_m, INF))
            id_cols.append(cid_m)
    tn2 = jnp.stack(tn_cols, axis=1)   # (R, K1*M)
    idf = jnp.stack(id_cols, axis=1)   # (R, K1*M) f32 ids
    live2 = jnp.isfinite(tn2)

    # ---- phase 3: K2 nearest candidates by pure min-reductions ----
    # fori_loop keeps one round's (R, K1*M) intermediates live at a time
    BIGID = jnp.float32(3e38)

    def ext_body(k, st):
        t2, cand, cand_t = st
        tmin = jnp.min(t2, axis=1)
        has = jnp.isfinite(tmin)
        at_min = t2 <= tmin[:, None]
        cidf = jnp.min(jnp.where(at_min, idf, BIGID), axis=1)
        cand = cand.at[k].set(jnp.where(has, cidf.astype(I32), -1))
        cand_t = cand_t.at[k].set(tmin)
        t2 = jnp.where(at_min & (idf == cidf[:, None]), INF, t2)
        return t2, cand, cand_t

    def ext_cond(st):
        k, (t2, _c, _ct) = st
        # exit once fewer than ~0.4% of lanes still hold candidates (mean
        # live candidates per ray is ~3; the long tail is cheaper through
        # the packet fallback than through more full-width rounds — the
        # abandoned rays flag overflow via t2_min below)
        live = jnp.sum(jnp.isfinite(jnp.min(t2, axis=1)))
        return (k < K2) & (live > R // 256)

    def ext_step(st):
        k, inner = st
        return k + 1, ext_body(k, inner)

    _, (t2, cand, cand_t) = jax.lax.while_loop(
        ext_cond, ext_step,
        (jnp.int32(0),
         (tn2, jnp.full((K2, R), -1, I32), jnp.full((K2, R), INF, F32))))
    ovf2 = jnp.any(jnp.isfinite(t2) & live2, axis=1)
    # nearest unextracted candidate: if it lies beyond the final t_best the
    # truncation was harmless and no fallback is needed
    t2_min = jnp.min(t2, axis=1)

    # ---- phase 4: triangle tests, 4 candidate slots per round so every
    # component slice is exactly (R, 128) — (R, 32) intermediates occupy
    # full 128-lane tiles anyway, so the 1-slot form paid 4x the memory
    # traffic of its useful data ----
    G4 = 4  # slots per round

    def tri_body(g, st):
        t_best, prim_best, b1_best, b2_best, hit_any = st
        rows4 = []
        act4 = []
        for j in range(G4):
            cid = cand[g * G4 + j]
            a = (cid >= 0) & (cand_t[g * G4 + j] < t_best)
            if any_hit:
                a = a & ~hit_any
            cid_b = jax.lax.optimization_barrier(jnp.maximum(cid, 0))
            rows4.append(jax.lax.optimization_barrier(cl_rows[cid_b]))
            act4.append(a)

        def comp(c):  # component c of the 4 slots' 32 tris each: (R, 128)
            return jnp.concatenate(
                [jax.lax.slice_in_dim(r, c * 32, (c + 1) * 32, axis=1)
                 for r in rows4], axis=1)

        v0 = jnp.stack([comp(0), comp(1), comp(2)], axis=-1)
        v1 = jnp.stack([comp(3), comp(4), comp(5)], axis=-1)
        v2 = jnp.stack([comp(6), comp(7), comp(8)], axis=-1)
        act_l = jnp.concatenate(
            [jnp.broadcast_to(a[:, None], (R, 32)) for a in act4], axis=1)
        valid = (comp(10) > 0) & act_l
        any_act = act4[0]
        for a in act4[1:]:
            any_act = any_act | a
        tq = jnp.where(any_act, t_best, -1.0)
        h, t, b0, b1, b2 = ray_triangle(o[:, None, :], d[:, None, :],
                                        v0, v1, v2, tq[:, None])
        h = h & valid
        th = jnp.where(h, t, INF)
        # winner by packed min-reductions (no argmin + element gathers):
        # min t, then min prim row among exact-t ties, then the (unique)
        # winning lane's barycentrics via a masked sum
        tj = jnp.min(th, axis=1)
        win = jnp.isfinite(tj)
        at_min = th <= tj[:, None]
        primf = jnp.min(jnp.where(at_min, comp(9), BIGID), axis=1)
        wmask = at_min & (comp(9) == primf[:, None])
        # a prim row appears once per cluster; exact-t ties across slots
        # resolve to the min prim, and a cluster repeated in two slots
        # cannot happen (slots extract distinct clusters)
        nw = jnp.maximum(jnp.sum(wmask, axis=1), 1)
        b1j = jnp.sum(jnp.where(wmask, b1, 0.0), axis=1) / nw
        b2j = jnp.sum(jnp.where(wmask, b2, 0.0), axis=1) / nw
        prim_j = jnp.where(win, primf, -1.0).astype(I32)
        upd = win & (tj < t_best)
        t_best = jnp.where(upd, tj, t_best)
        prim_best = jnp.where(upd, prim_j, prim_best)
        b1_best = jnp.where(upd, b1j, b1_best)
        b2_best = jnp.where(upd, b2j, b2_best)
        return t_best, prim_best, b1_best, b2_best, hit_any | win

    NG = (K2 + G4 - 1) // G4

    def tri_cond(st):
        g, inner = st
        t_best, _p, _b1, _b2, hit_any = inner
        gc = jnp.minimum(g, NG - 1)
        act = jnp.zeros((R,), bool)
        for j in range(G4):
            k = jnp.minimum(gc * G4 + j, K2 - 1)
            act = act | ((cand[k] >= 0) & (cand_t[k] < t_best))
        if any_hit:
            act = act & ~hit_any
        # same fractional exit as extraction: a sub-0.4% tail rides the
        # packet fallback (flagged below via tri_resid)
        return (g < NG) & (jnp.sum(act) > R // 256)

    def tri_step(st):
        g, inner = st
        return g + 1, tri_body(g, inner)

    g_end, (t_best, prim_best, b1_best, b2_best, hit_any) = jax.lax.while_loop(
        tri_cond, tri_step,
        (jnp.int32(0),
         (jnp.where(t_arr > 0, t_arr, -1.0), jnp.full((R,), -1, I32),
          jnp.zeros((R,), F32), jnp.zeros((R,), F32), jnp.zeros((R,), bool))))
    # rays abandoned by the fractional exit with a still-viable candidate
    tri_resid = jnp.zeros((R,), bool)
    for k in range(K2):
        tri_resid = tri_resid | ((k >= g_end * G4) & (cand[k] >= 0)
                                 & (cand_t[k] < t_best))

    hitm = prim_best >= 0
    # residue check: rays whose supernode words overflowed K1 only need
    # the fallback if some UNVISITED supernode could still beat t_best —
    # re-cull against t_best and mask out the visited slots
    def resid(_):
        words2, _S = _cull_supers_words(su_lo, su_hi, o, inv,
                                        jnp.where(t_arr > 0, t_best, -1.0))
        Wn = words2.shape[1]
        iota_w = jnp.arange(Wn, dtype=I32)
        visited = jnp.zeros((R, Wn), U32)
        for k in range(K1):
            sid = sup_idx[:, k]
            bit = (U32(1) << (jnp.maximum(sid, 0) % 32).astype(U32))
            visited = visited | jnp.where(
                (iota_w[None, :] == (jnp.maximum(sid, 0) // 32)[:, None])
                & (sid >= 0)[:, None], bit[:, None], U32(0))
        return jnp.any(words2 & ~visited != 0, axis=1)

    ovf1_real = jax.lax.cond(jnp.any(ovf1), resid,
                             lambda _: jnp.zeros((R,), bool), 0) & ovf1
    overflow = ovf1_real | (ovf2 & (t2_min < t_best)) | tri_resid
    if any_hit:
        overflow = overflow & ~hit_any  # a found occluder settles the query
    return t_best, prim_best, hitm, b1_best, b2_best, overflow


def binned_intersect(sa, static, o, d, t_max, any_hit: bool = False,
                     interpret: bool = False, sort: bool = False):
    """Closest-hit (or any-hit) over the cluster tables, binned tier.

    Same contract as pallas_bvh.wide_intersect:
    returns (t, prim_row, hitmask, b1, b2). `sort` and
    `interpret` are accepted for signature compatibility; this tier has
    no kernels to interpret and never needs ray sorting.
    """
    R = o.shape[0]
    t_arr = jnp.broadcast_to(jnp.asarray(t_max, F32), (R,))
    onehot = _ONEHOT
    t, prim, hitm, b1, b2, ovf = _binned_core(
        int(static.n_clusters), bool(any_hit), sa.su_lo, sa.su_hi,
        sa.su_bounds, sa.cl_rows, o, d, R, onehot, t_arr)

    # overflow fallback: re-run only the overflowed rays through the
    # wide-BVH packet kernel (dead lanes are near-free there); the whole
    # pass is skipped when no ray overflowed
    from .pallas_bvh import wide_intersect

    interp = jax.default_backend() == "cpu"
    if any_hit:
        def run_fb(_):
            t_fb = jnp.where(ovf, t_arr, -1.0)
            _ft, _fp, fh = wide_intersect(sa, static, o, d, t_fb, any_hit=True,
                                          interpret=interp)
            return fh

        fhit = jax.lax.cond(jnp.any(ovf), run_fb,
                            lambda _: jnp.zeros((R,), bool), 0)
        return t, prim, hitm | (ovf & fhit), b1, b2

    def run_fb(_):
        t_fb = jnp.where(ovf, t_arr, -1.0)
        return wide_intersect(sa, static, o, d, t_fb, any_hit=False,
                              interpret=interp)

    def skip_fb(_):
        return (jnp.zeros((R,), F32), jnp.full((R,), -1, I32),
                jnp.zeros((R,), bool), jnp.zeros((R,), F32), jnp.zeros((R,), F32))

    ft, fprim, fhit, fb1, fb2 = jax.lax.cond(jnp.any(ovf), run_fb, skip_fb, 0)
    use_fb = ovf
    t = jnp.where(use_fb, ft, t)
    prim = jnp.where(use_fb, fprim, prim)
    hitm = jnp.where(use_fb, fhit, hitm)
    b1 = jnp.where(use_fb, fb1, b1)
    b2 = jnp.where(use_fb, fb2, b2)
    return t, prim, hitm, b1, b2
