"""Global Sobol film enumeration + MaxMinDist matrices.

Mirrors the reference's sampler tests (tests/sampling.rs): the
interval-to-index inversion must put dims (0,1) of the global index inside
the requested pixel, indices must be unique per frame, and the searched
MaxMinDist matrices must produce stratified points with large minimum
toroidal distance."""
import numpy as np

import jax.numpy as jnp

from pbrt_tpu.device import rng
from pbrt_tpu.device.sampler import (
    maxmin_matrix,
    sobol_dim,
    sobol_global_index,
    sobol_tables,
)


def test_sobol_interval_to_index_lands_in_pixel():
    W, H, spp = 100, 60, 16
    aux = sobol_tables(W, H, spp)
    assert aux is not None
    res = aux["res"]
    rs = np.random.RandomState(0)
    px = jnp.asarray(rs.randint(0, W, 256).astype(np.int32))
    py = jnp.asarray(rs.randint(0, H, 256).astype(np.int32))
    for frame in (0, 1, 7, 15):
        idx = sobol_global_index(aux, px, py, jnp.uint32(frame))
        x = np.asarray(sobol_dim(idx, 0, 0)) * res
        y = np.asarray(sobol_dim(idx, 1, 0)) * res
        assert (x.astype(np.int64) == np.asarray(px)).all()
        assert (y.astype(np.int64) == np.asarray(py)).all()


def test_sobol_indices_unique_per_frame():
    aux = sobol_tables(64, 64, 4)
    ys, xs = np.mgrid[0:64, 0:64]
    px = jnp.asarray(xs.ravel().astype(np.int32))
    py = jnp.asarray(ys.ravel().astype(np.int32))
    idx0 = np.asarray(sobol_global_index(aux, px, py, jnp.uint32(0)))
    idx1 = np.asarray(sobol_global_index(aux, px, py, jnp.uint32(1)))
    assert len(np.unique(idx0)) == 64 * 64
    assert len(np.intersect1d(idx0, idx1)) == 0


def test_maxmindist_matrix_quality():
    for k in (2, 4, 6):
        n = 1 << k
        cols = maxmin_matrix(k)
        i = np.arange(n)
        y = np.zeros(n, np.uint64)
        for j in range(k):
            y = y ^ np.where((i >> j) & 1 > 0, np.uint64(int(cols[j])), np.uint64(0))
        yf = (y.astype(np.float64) / 2**32) % 1.0
        # stratification: y values are a permutation of {m/n}
        assert len(np.unique((yf * n).astype(np.int64))) == n
        # min toroidal distance beats random (~0.5/n) by a wide margin
        x = (i + 0.5) / n
        dx = np.abs(x[:, None] - x[None, :]); dx = np.minimum(dx, 1 - dx)
        dy = np.abs(yf[:, None] - yf[None, :]); dy = np.minimum(dy, 1 - dy)
        d2 = dx * dx + dy * dy
        np.fill_diagonal(d2, np.inf)
        dmin = np.sqrt(d2.min())
        assert dmin > 0.5 / np.sqrt(n), (k, dmin)


def test_maxmindist_sampler_dim0():
    from pbrt_tpu.device.sampler import sample_2d

    spp = 16
    pix = jnp.zeros(spp, jnp.uint32)
    s = jnp.arange(spp, dtype=jnp.uint32)
    u1, u2 = sample_2d("maxmindist", jnp.uint32(3), pix, s, 0, spp)
    u1 = np.asarray(u1); u2 = np.asarray(u2)
    # stratified in x after removing the per-pixel rotation
    assert len(np.unique((((u1 - u1.min()) * spp) % spp).astype(np.int64))) == spp
    assert len(np.unique((u2 * spp).astype(np.int64))) == spp


def test_stratified_covers_all_dims():
    """Stratified jitters every static dimension: over spp samples each
    (pixel, dim) stream covers each stratum exactly once (stratified.rs
    jitters all requested dims, not just the film pair)."""
    import jax.numpy as jnp
    import numpy as np

    from pbrt_tpu.device.sampler import sample_1d, sample_2d

    spp = 16
    pix = jnp.zeros(spp, jnp.uint32)
    idx = jnp.arange(spp, dtype=jnp.uint32)
    for dim in (0, 3, 7):
        u = np.asarray(sample_1d("stratified", jnp.uint32(5), pix, idx, dim, spp))
        strata = np.sort(np.floor(u * spp).astype(int))
        assert (strata == np.arange(spp)).all(), (dim, strata)
    for dim in (0, 2):
        u1, u2 = sample_2d("stratified", jnp.uint32(5), pix, idx, dim, spp)
        u1 = np.asarray(u1)
        u2 = np.asarray(u2)
        xs = 4
        cells = np.sort(np.floor(u1 * xs).astype(int) + xs * np.floor(u2 * xs).astype(int))
        assert (cells == np.arange(spp)).all(), (dim, cells)


def test_traced_dim_matches_static_dim():
    """Per-lane (traced) bounce dimensions must produce the SAME Halton /
    Sobol values as the static-dim path — the rolled persistent loop no
    longer falls back to the (0,2) family (halton.rs:120-156 /
    sobol.rs:61-75 continue one sequence into all dims)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbrt_tpu.device.sampler import sample_1d, sample_2d

    seed = jnp.uint32(7)
    pixel = jnp.arange(64, dtype=jnp.uint32)
    sidx = jnp.arange(64, dtype=jnp.uint32) % 16
    for kind in ("halton", "sobol"):
        for dim in (2, 5, 11):
            u1s, u2s = sample_2d(kind, seed, pixel, sidx, dim, 16)
            dim_t = jnp.full(pixel.shape, dim, jnp.int32)
            u1t, u2t = jax.jit(
                lambda d: sample_2d(kind, seed, pixel, sidx, d, 16))(dim_t)
            np.testing.assert_allclose(np.asarray(u1t), np.asarray(u1s), atol=2e-7, err_msg=f"{kind} d{dim} u1")
            np.testing.assert_allclose(np.asarray(u2t), np.asarray(u2s), atol=2e-7, err_msg=f"{kind} d{dim} u2")
            if kind == "sobol":
                # elementary-interval sanity: 16 Sobol' samples of one
                # pixel fill a 4x4 grid exactly ((0,2)-net property); a
                # hash fallback would collide cells
                pix0 = jnp.zeros(16, jnp.uint32)
                v1, v2 = jax.jit(lambda d: sample_2d(kind, seed, pix0, jnp.arange(16, dtype=jnp.uint32), d, 16))(
                    jnp.full(16, dim, jnp.int32))
                cells = set(zip((np.asarray(v1) * 4).astype(int).tolist(),
                                (np.asarray(v2) * 4).astype(int).tolist()))
                assert len(cells) >= 12, f"{kind} dim {dim}: poor stratification {len(cells)}"
