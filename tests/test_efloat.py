"""EFloat interval-arithmetic invariants (reference: tests/fp.rs).

The reference checks that after random chains of EFloat ops, the exact
(f64) value always lies inside [lower_bound, upper_bound]. Our batched
triples (device/efloat.py) widen by +/-2eps|x| instead of next-ulp bumps,
so the invariant must hold a fortiori.
"""
import numpy as np

import jax.numpy as jnp

from pbrt_tpu.device import efloat as efl


def _triple(v, err=0.0):
    return efl.ef(jnp.asarray(v, jnp.float32), jnp.asarray(err, jnp.float32) if np.any(err) else None)


def test_interval_contains_exact_under_random_chains():
    rs = np.random.RandomState(12111)  # seed style of tests/shapes.rs:35
    N = 4096
    # exponential-range magnitudes like the reference's pexp
    def pexp(lo=-6, hi=6):
        return (rs.rand(N) * 2 - 1) * 10.0 ** rs.uniform(lo, hi, N)

    v = pexp().astype(np.float32)
    t = efl.ef(jnp.asarray(v))
    exact = v.astype(np.float64)
    ops = [efl.add, efl.sub, efl.mul]
    for step in range(12):
        w = pexp().astype(np.float32)
        u = efl.ef(jnp.asarray(w))
        op = ops[step % 3]
        t = op(t, u)
        exact = {0: exact + w, 1: exact - w, 2: exact * w}[step % 3]
        lo = np.asarray(t[1], np.float64)
        hi = np.asarray(t[2], np.float64)
        ok = np.isfinite(exact)
        assert (lo[ok] <= exact[ok] + 1e-30).all(), step
        assert (hi[ok] >= exact[ok] - 1e-30).all(), step

    # sqr keeps the square inside its interval and never goes negative
    s = efl.sqr(t)
    lo = np.asarray(s[1], np.float64)
    hi = np.asarray(s[2], np.float64)
    ok = np.isfinite(exact * exact) & np.isfinite(lo) & np.isfinite(hi)
    assert (lo[np.isfinite(lo)] >= -1e-35).all()
    assert (lo[ok] <= (exact * exact)[ok] * (1 + 1e-5) + 1e-30).all()
    assert (hi[ok] >= (exact * exact)[ok] * (1 - 1e-5) - 1e-30).all()


def test_div_straddle_is_infinite():
    a = efl.ef(jnp.asarray([1.0, 1.0], jnp.float32))
    b = (jnp.asarray([0.0, 2.0], jnp.float32),
         jnp.asarray([-1e-6, 2.0], jnp.float32),
         jnp.asarray([1e-6, 2.0], jnp.float32))
    q = efl.div(a, b)
    lo = np.asarray(q[1])
    hi = np.asarray(q[2])
    assert lo[0] == -np.inf and hi[0] == np.inf
    assert np.isfinite(lo[1]) and np.isfinite(hi[1])
    assert lo[1] <= 0.5 <= hi[1]


def test_quadratic_bounds_contain_f64_roots():
    """Random downward rays vs unit spheres at random offsets: the interval
    roots must bracket the f64-exact quadratic roots (efloat.rs:211)."""
    rs = np.random.RandomState(7)
    N = 2048
    o = np.stack([rs.uniform(-0.8, 0.8, N), rs.uniform(2.0, 50.0, N),
                  rs.uniform(-0.8, 0.8, N)], -1).astype(np.float32)
    d = np.stack([rs.uniform(-0.2, 0.2, N), -np.ones(N),
                  rs.uniform(-0.2, 0.2, N)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    a64 = (d.astype(np.float64) ** 2).sum(1)
    b64 = 2.0 * (o.astype(np.float64) * d.astype(np.float64)).sum(1)
    c64 = (o.astype(np.float64) ** 2).sum(1) - 1.0
    disc = b64 * b64 - 4 * a64 * c64
    has64 = disc > 0

    A = efl.add(efl.add(efl.sqr(efl.ef(jnp.asarray(d[:, 0]))), efl.sqr(efl.ef(jnp.asarray(d[:, 1])))),
                efl.sqr(efl.ef(jnp.asarray(d[:, 2]))))
    B = efl.scale(
        efl.add(efl.add(efl.mul(efl.ef(jnp.asarray(d[:, 0])), efl.ef(jnp.asarray(o[:, 0]))),
                        efl.mul(efl.ef(jnp.asarray(d[:, 1])), efl.ef(jnp.asarray(o[:, 1])))),
                efl.mul(efl.ef(jnp.asarray(d[:, 2])), efl.ef(jnp.asarray(o[:, 2])))), 2.0)
    C = efl.sub(
        efl.add(efl.add(efl.sqr(efl.ef(jnp.asarray(o[:, 0]))), efl.sqr(efl.ef(jnp.asarray(o[:, 1])))),
                efl.sqr(efl.ef(jnp.asarray(o[:, 2])))), efl.ef(jnp.float32(1.0)))
    has, T0, T1 = efl.quadratic(A, B, C)
    has = np.asarray(has)
    # f32 discriminant may conservatively miss near-tangent cases but must
    # agree whenever the f64 discriminant is decisively signed
    decisive = np.abs(disc) > 1e-3
    assert (has[decisive] == has64[decisive]).all()

    r64 = np.sqrt(np.maximum(disc, 0.0))
    q64 = np.where(b64 < 0, -0.5 * (b64 - r64), -0.5 * (b64 + r64))
    t0_64 = q64 / a64
    t1_64 = c64 / q64
    tn64 = np.minimum(t0_64, t1_64)
    tf64 = np.maximum(t0_64, t1_64)
    both = has & has64
    tn_lo = np.asarray(T0[1], np.float64)[both]
    tn_hi = np.asarray(T0[2], np.float64)[both]
    tf_lo = np.asarray(T1[1], np.float64)[both]
    tf_hi = np.asarray(T1[2], np.float64)[both]
    assert (tn_lo <= tn64[both] + 1e-9).all()
    assert (tn_hi >= tn64[both] - 1e-9).all()
    assert (tf_lo <= tf64[both] + 1e-9).all()
    assert (tf_hi >= tf64[both] - 1e-9).all()
    # bounds are tight: within a relative 1e-4 of the value for these
    # well-conditioned hits
    rel = (tn_hi - tn_lo) / np.maximum(np.abs(tn64[both]), 1e-3)
    assert np.median(rel) < 1e-4
