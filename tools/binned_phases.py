"""Per-phase timing of the binned traversal tier + lever prototypes.

Round-3 verdict: ROOFLINE.md's mitigation levers (quantized rows, one-hot
MXU gathers) were projections. This tool measures, on the real chip:

  A. the binned tier's phases in isolation (supernode cull, bit extract,
     member-row gather + slab, triangle rounds) so the e2e budget is
     attributed, not guessed;
  B. raw row-gather rates for the su_bounds (512 B) and cl_rows (1536 B)
     tables at f32 vs bf16 — if rows/s is flat across row bytes the
     "halve the bytes" lever is refuted; if GB/s is flat it's confirmed;
  C. a one-hot MXU fetch prototype for the K1 supernode rows vs the
     row-gather it would replace (incl. building the one-hot masks).

Timing per the measured axon pitfalls: chained in-jit loops, forced by
np.asarray value transfer (block_until_ready can no-op; single dispatches
carry ~25-30 ms tunnel overhead).

Usage: python tools/binned_phases.py [--rays 262144]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chain", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _mesh_scene
    from pbrt_tpu.device.binned import (
        K1, K2, _binned_core, _cull_supers_words, _extract_bits, _safe_inv,
        _slab_cw,
    )
    from pbrt_tpu.device.camera import generate_rays, make_camera
    from pbrt_tpu.scene.builder import compile_scene

    desc = _mesh_scene()
    cs = compile_scene(desc)
    sa, static = cs.arrays, cs.static
    R = args.rays
    S = int(sa.su_lo.shape[0])
    C = int(static.n_clusters)
    print(f"tris={static.n_tris} clusters={C} supers={S} R={R}", flush=True)

    W, H = 1000, 500
    cam = make_camera(desc.camera, desc.film)
    key = jax.random.PRNGKey(0)
    k2 = jax.random.fold_in(key, 2)
    o_inc = jax.random.uniform(k2, (R, 3), minval=-3.5, maxval=3.5) * jnp.asarray([1.0, 0.4, 1.0]) + jnp.asarray([0.0, 1.2, 0.0])
    d_inc = jax.random.normal(jax.random.fold_in(key, 3), (R, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=1, keepdims=True)
    t_arr = jnp.full((R,), 1e30, jnp.float32)

    def timed(name, fn, *a, per_iter=1):
        out = fn(*a)
        np.asarray(jnp.ravel(out if not isinstance(out, tuple) else out[0])[:1])
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            np.asarray(jnp.ravel(out if not isinstance(out, tuple) else out[0])[:1])
            best = min(best, time.perf_counter() - t0)
        per = best / per_iter
        print(f"{name:46s} {per * 1e3:9.2f} ms  ({R / per / 1e6:7.2f} Mrays/s)", flush=True)
        return per

    # ---------- A. phases ----------
    @jax.jit
    def ph_full(o, d, t):
        t_, prim, hitm, b1, b2, ovf = _binned_core(C, False, sa.su_lo, sa.su_hi, sa.su_bounds, sa.cl_rows, o, d, R, False, t)
        return t_

    @jax.jit
    def ph_full_onehot(o, d, t):
        t_, prim, hitm, b1, b2, ovf = _binned_core(C, False, sa.su_lo, sa.su_hi, sa.su_bounds, sa.cl_rows, o, d, R, True, t)
        return t_

    @jax.jit
    def ph1(o, d, t):
        inv = _safe_inv(d)
        words, _ = _cull_supers_words(sa.su_lo, sa.su_hi, o, inv, t)
        return words

    @jax.jit
    def ph12(o, d, t):
        inv = _safe_inv(d)
        words, _ = _cull_supers_words(sa.su_lo, sa.su_hi, o, inv, t)
        sup_idx, ovf = _extract_bits(words, K1)
        return sup_idx

    @jax.jit
    def ph123(o, d, t):
        inv = _safe_inv(d)
        oinv = o * inv
        words, _ = _cull_supers_words(sa.su_lo, sa.su_hi, o, inv, t)
        sup_idx, ovf = _extract_bits(words, K1)
        M = sa.su_bounds.shape[1] // 8
        oinv_t = tuple(oinv[:, c:c + 1] for c in range(3))
        inv_t = tuple(inv[:, c:c + 1] for c in range(3))
        acc = jnp.zeros((R,), jnp.float32)
        for k in range(K1):
            sid = sup_idx[:, k]
            sid_b = jax.lax.optimization_barrier(jnp.maximum(sid, 0))
            row = jax.lax.optimization_barrier(sa.su_bounds[sid_b])
            for m in range(M):
                base = m * 8
                tn_m = _slab_cw(tuple(row[:, base + c:base + c + 1] for c in range(3)),
                                tuple(row[:, base + 3 + c:base + 4 + c] for c in range(3)),
                                oinv_t, inv_t, t[:, None])[:, 0]
                acc = acc + jnp.where(jnp.isfinite(tn_m), tn_m, 0.0)
        return acc

    t_full = timed("e2e binned_core/incoherent", ph_full, o_inc, d_inc, t_arr)
    timed("e2e binned_core/incoherent ONEHOT ph2", ph_full_onehot, o_inc, d_inc, t_arr)
    t_p1 = timed("phase1 supernode cull", ph1, o_inc, d_inc, t_arr)
    t_p12 = timed("phase1+2 (+bit extract)", ph12, o_inc, d_inc, t_arr)
    t_p123 = timed("phase1+2+3 (+row gather+slab)", ph123, o_inc, d_inc, t_arr)
    print(f"  => extract {1e3 * (t_p12 - t_p1):.2f} ms, member-cull {1e3 * (t_p123 - t_p12):.2f} ms, "
          f"tri rounds+rest {1e3 * (t_full - t_p123):.2f} ms", flush=True)

    # ---------- B. raw gather rates vs row bytes/dtype ----------
    for name, rows_f, dt in (("su_bounds-like f32 (512B)", 128, jnp.float32),
                             ("su_bounds-like bf16 (256B)", 128, jnp.bfloat16),
                             ("cl_rows-like f32 (1536B)", 384, jnp.float32),
                             ("cl_rows-like bf16 (768B)", 384, jnp.bfloat16)):
        n_rows = max(C, 256)
        tab = jnp.asarray(np.random.RandomState(0).rand(n_rows, rows_f), dt)
        idx = jnp.asarray(np.random.RandomState(1).randint(0, n_rows, R), jnp.int32)

        def g(tab, idx, n_rows=n_rows):
            def body(c, _):
                rows = jax.lax.optimization_barrier(tab[(idx + c) % n_rows])
                return c + 1, jnp.sum(rows.astype(jnp.float32), axis=1)

            _, outs = jax.lax.scan(body, jnp.int32(0), None, length=args.chain)
            return outs[-1]

        gj = jax.jit(g)
        per = timed(f"gather {name}", gj, tab, idx, per_iter=args.chain)
        print(f"    = {R / per / 1e6:7.1f} M rows/s, {R * rows_f * tab.dtype.itemsize / per / 1e9:6.1f} GB/s", flush=True)

    # ---------- C. one-hot MXU fetch of K1 supernode rows ----------
    # replace: for k in K1: su_bounds[sup_idx[:,k]]  (K1 row gathers)
    # with:    onehot(R, S) @ su_bounds(S, 128) per slot, bf16_3x exact
    su_b = sa.su_bounds

    @jax.jit
    def onehot_fetch(o, d, t):
        inv = _safe_inv(d)
        words, _ = _cull_supers_words(sa.su_lo, sa.su_hi, o, inv, t)
        sup_idx, _ovf = _extract_bits(words, K1)
        iota = jnp.arange(S, dtype=jnp.int32)
        acc = jnp.zeros((R,), jnp.float32)
        for k in range(K1):
            oh = (sup_idx[:, k:k + 1] == iota[None, :]).astype(jnp.bfloat16)
            row = jax.lax.dot(oh, su_b.astype(jnp.bfloat16),
                              precision=jax.lax.Precision.HIGHEST).astype(jnp.float32)
            acc = acc + jnp.sum(row, axis=1)
        return acc

    timed("one-hot MXU fetch K1 rows (incl cull+extract)", onehot_fetch, o_inc, d_inc, t_arr)
    print("  (compare against phase1+2 time + K1-gather delta above)", flush=True)


if __name__ == "__main__":
    main()
