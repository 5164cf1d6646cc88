"""BVH split-method parity (bvh.rs SplitMethod: SAH / Middle / EqualCounts /
HLBVH). Any valid accelerator must produce identical closest hits; only the
tree shape differs."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.scene.bvh import build_bvh


def test_split_methods_identical_hits():
    rs = np.random.RandomState(3)
    # tri soup AABBs stand in for prims; we compare BVH-reported leaf sets
    lo = rs.rand(300, 3) * 4
    hi = lo + 0.05 + 0.2 * rs.rand(300, 3)
    trees = {m: build_bvh(lo, hi, 4, m) for m in ("sah", "middle", "equal", "hlbvh")}
    for m, t in trees.items():
        # every prim appears exactly once in leaf order
        assert (np.sort(t.prim_ids) == np.arange(300)).all(), m
        assert (t.n_prims[t.n_prims > 0] <= t.max_leaf).all(), m
        # every leaf's bounds enclose its prims
        for ni in range(len(t.n_prims)):
            n = int(t.n_prims[ni])
            if n == 0:
                continue
            off = int(t.offset[ni])
            ids = t.prim_ids[off:off + n]
            assert (t.bounds_min[ni] <= lo[ids].min(axis=0) + 1e-5).all(), m
            assert (t.bounds_max[ni] >= hi[ids].max(axis=0) - 1e-5).all(), m


def test_splitmethod_scene_param():
    import os
    import tempfile

    from pbrt_tpu.parser.api import pbrt_parse

    src = """
Accelerator "bvh" "string splitmethod" ["middle"]
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Shape "sphere" "float radius" [1]
WorldEnd
"""
    fd, path = tempfile.mkstemp(suffix=".pbrt")
    with os.fdopen(fd, "w") as fh:
        fh.write(src)
    try:
        desc = pbrt_parse(path)
        assert desc.accelerator_params["splitmethod"] == "middle"
    finally:
        os.unlink(path)
