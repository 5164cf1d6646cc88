"""Motion blur tests: AnimatedTransform math + end-to-end shutter blur.

Mirrors src/core/transform.rs:687-… (AnimatedTransform decompose/slerp/
motion_bounds) and the api.rs ActiveTransform/TransformTimes machinery.
Device motion: rotating shutter transforms evaluate the reference's EXACT
per-ray decompose+slerp interpolation (device/motion.py, round 4);
translation-only motion uses baked linear vertex keyframes (exact for
translation).
"""
import numpy as np
import pytest

from pbrt_tpu.core.transform import AnimatedTransform, Transform


def test_animated_transform_interpolate():
    a = AnimatedTransform(Transform.identity(), Transform.translate([4.0, 0.0, 0.0]))
    for t, x in ((0.0, 0.0), (0.25, 1.0), (1.0, 4.0)):
        p = a.interpolate(t).xpoint(np.zeros((1, 3)))[0]
        np.testing.assert_allclose(p, [x, 0, 0], atol=1e-9)
    # rotation slerps along the arc, not through the chord
    b = AnimatedTransform(Transform.identity(), Transform.rotate(90.0, [0, 0, 1]))
    p = b.interpolate(0.5).xpoint(np.array([[1.0, 0.0, 0.0]]))[0]
    np.testing.assert_allclose(p, [np.sqrt(0.5), np.sqrt(0.5), 0.0], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(p), 1.0, atol=1e-6)


def test_motion_bounds_cover_sweep():
    a = AnimatedTransform(Transform.identity(), Transform.translate([3.0, 0.0, 0.0]))
    lo, hi = a.motion_bounds([-1, -1, -1], [1, 1, 1])
    np.testing.assert_allclose(lo, [-1, -1, -1], atol=1e-9)
    np.testing.assert_allclose(hi, [4, 1, 1], atol=1e-9)


def _quad_scene(moving: bool):
    return f"""
Film "image" "integer xresolution" [48] "integer yresolution" [8]
Sampler "random" "integer pixelsamples" [8]
Integrator "path" "integer maxdepth" [1]
LookAt 1 0 6  1 0 0  0 1 0
Camera "perspective" "float fov" [45] "float shutteropen" [0] "float shutterclose" [1]
WorldBegin
AttributeBegin
{'ActiveTransform EndTime' if moving else ''}
{'Translate 2 0 0' if moving else ''}
{'ActiveTransform All' if moving else ''}
AreaLightSource "diffuse" "rgb L" [8 8 8]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point3 P" [-0.4 -2 0  0.4 -2 0  0.4 2 0  -0.4 2 0]
AttributeEnd
WorldEnd
"""


def test_motion_blur_end_to_end(tmp_path):
    """A moving emissive quad smears across the frame: energy appears at
    both shutter endpoints and total exposure is conserved (~equal to the
    static render's total)."""
    import jax

    from pbrt_tpu.parser.api import pbrt_parse
    from pbrt_tpu.render import render
    from pbrt_tpu.scene.builder import compile_scene

    p_static = tmp_path / "static.pbrt"
    p_moving = tmp_path / "moving.pbrt"
    p_static.write_text(_quad_scene(False))
    p_moving.write_text(_quad_scene(True))
    desc_s = pbrt_parse(str(p_static))
    desc_m = pbrt_parse(str(p_moving))

    cs = compile_scene(desc_m)
    assert cs.static.has_motion
    assert cs.arrays.tri_p_end is not None

    img_s = render(desc_s, spp=32)
    img_m = render(desc_m, spp=32)
    col_s = np.asarray(img_s).mean(axis=(0, 2))
    col_m = np.asarray(img_m).mean(axis=(0, 2))
    peak = col_s.max()
    assert peak > 0.5
    start_x = int(col_s.argmax())
    # static: bright only at the start position; moving: smeared band
    assert col_m[start_x] > 0.05 * peak  # still some exposure at start
    # exposure appears well beyond the static quad's footprint
    lit_s = (col_s > 0.1 * peak).sum()
    lit_m = (col_m > 0.1 * peak).sum()
    assert lit_m >= lit_s * 2, f"no smear: static {lit_s} cols, moving {lit_m}"
    # energy conservation of the sweep (each shutter instant emits equally)
    np.testing.assert_allclose(col_m.sum(), col_s.sum(), rtol=0.2)


def _cam_scene(moving: bool) -> str:
    move = "ActiveTransform EndTime\nTranslate -4 0 0\nActiveTransform All\n" if moving else ""
    return f"""
Film "image" "integer xresolution" [48] "integer yresolution" [8]
Sampler "random" "integer pixelsamples" [8]
Integrator "path" "integer maxdepth" [1]
{move}LookAt 2 0 6  2 0 0  0 1 0
Camera "perspective" "float fov" [45]
WorldBegin
AreaLightSource "diffuse" "rgb L" [8 8 8]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point3 P" [-0.4 -2 0  0.4 -2 0  0.4 2 0  -0.4 2 0]
WorldEnd
"""


def test_animated_camera_end_to_end(tmp_path):
    """Camera translation during the shutter smears a static quad: lit
    column span widens vs the same scene with a fixed camera.

    Note the 6:1 film aspect maps the pbrt screen window to x in [-6, 6],
    so the 4-unit camera sweep covers only ~7 columns — compare against
    the static render rather than an absolute width."""
    from pbrt_tpu.parser.api import pbrt_parse
    from pbrt_tpu.render import render

    p_s = tmp_path / "cs.pbrt"
    p_m = tmp_path / "cm.pbrt"
    p_s.write_text(_cam_scene(False))
    p_m.write_text(_cam_scene(True))
    desc_s = pbrt_parse(str(p_s))
    desc_m = pbrt_parse(str(p_m))
    assert desc_s.camera.camera_to_world_end is None
    assert desc_m.camera.camera_to_world_end is not None
    img_s = render(desc_s, spp=48)
    img_m = render(desc_m, spp=48)
    col_s = np.asarray(img_s).mean(axis=(0, 2))
    col_m = np.asarray(img_m).mean(axis=(0, 2))
    thresh = 0.05 * col_s.max()
    lit_s = (col_s > thresh).sum()
    lit_m = (col_m > thresh).sum()
    assert lit_m >= lit_s + 3, f"camera blur missing: static {lit_s}, moving {lit_m}"
    np.testing.assert_allclose(col_m.sum(), col_s.sum(), rtol=0.25)


def test_rotating_prim_follows_slerp_arc(tmp_path):
    """A prim rotating 90 degrees through the shutter must intersect along
    the slerp ARC at mid-shutter (transform.rs AnimatedTransform applied
    per ray), not along the round-1 linear vertex chord: at t=0.5 the arc
    point sits at radius 1 on the diagonal while the chord midpoint sits
    at radius ~0.707."""
    import jax.numpy as jnp

    from pbrt_tpu.parser.api import pbrt_parse
    from pbrt_tpu.device.intersect import intersect
    from pbrt_tpu.scene.builder import compile_scene

    scene = """
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Integrator "path" "integer maxdepth" [1]
Camera "perspective" "float fov" [45] "float shutteropen" [0] "float shutterclose" [1]
WorldBegin
AttributeBegin
ActiveTransform EndTime
Rotate 90 0 1 0
ActiveTransform All
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point3 P" [0.9 -1 -0.05  1.1 -1 0.05  1.1 1 0.05  0.9 1 -0.05]
AttributeEnd
WorldEnd
"""
    p = tmp_path / "rot.pbrt"
    p.write_text(scene)
    desc = pbrt_parse(str(p))
    cs = compile_scene(desc)
    sa, static = cs.arrays, cs.static
    assert static.has_motion
    assert sa.tri_p_mid is not None  # rotation detected -> arc keyframe

    # probe points from the transform itself: the quad center (1,0,0)
    # mid-shutter sits on the slerp arc (radius 1); the chord midpoint is
    # the average of the endpoint centers (radius ~0.707). The quad is
    # vertical, so probe with HORIZONTAL rays along -x at the two z depths:
    # the arc depth must hit, the chord depth must miss.
    rot = Transform.rotate(90.0, [0.0, 1.0, 0.0])
    anim = AnimatedTransform(Transform.identity(), rot)
    c0 = np.array([1.0, 0.0, 0.0])
    arc = anim.interpolate(0.5).xpoint(c0[None])[0]
    chord = 0.5 * (c0 + rot.xpoint(c0[None])[0])
    assert abs(abs(arc[2]) - np.sqrt(0.5)) < 1e-5 and abs(abs(chord[2]) - 0.5) < 1e-5
    o = jnp.asarray([[3.0, 0.0, arc[2]], [3.0, 0.0, chord[2]]], jnp.float32)
    d = jnp.asarray([[-1.0, 0.0, 0.0]] * 2, jnp.float32)
    t_max = jnp.full(2, jnp.inf, jnp.float32)
    hit = intersect(sa, static, o, d, t_max, time=jnp.asarray([0.5, 0.5], jnp.float32))
    hits = np.asarray(hit["prim"]) >= 0
    assert hits[0], "mid-shutter arc position must be hit"
    assert not hits[1], "linear chord midpoint must NOT be hit (quadratic arc)"


def test_exact_slerp_motion_matches_host_interpolate(tmp_path):
    """Round-4 exact path (device/motion.py): for a rotating shutter CTM
    the device must evaluate the reference's decompose+slerp interpolation
    EXACTLY (transform.rs:1442/1493), not the quadratic-arc approximation.
    A 120-degree rotation has quad-arc error ~(theta/2)^4/24 ~ 5e-2 of the
    radius; the exact path must place the surface within ~1e-3."""
    import jax.numpy as jnp

    from pbrt_tpu.parser.api import pbrt_parse
    from pbrt_tpu.device.intersect import intersect
    from pbrt_tpu.scene.builder import compile_scene

    scene = """
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Integrator "path" "integer maxdepth" [1]
Camera "perspective" "float fov" [45] "float shutteropen" [0] "float shutterclose" [1]
WorldBegin
AttributeBegin
ActiveTransform EndTime
Rotate 120 0 1 0
ActiveTransform All
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point3 P" [0.98 -1 -0.1  1.02 -1 0.1  1.02 1 0.1  0.98 1 -0.1]
AttributeEnd
AttributeBegin
ActiveTransform EndTime
Rotate 120 0 0 1
ActiveTransform All
Translate 0 3 0
Shape "sphere" "float radius" [0.25]
AttributeEnd
WorldEnd
"""
    p = tmp_path / "rot_exact.pbrt"
    p.write_text(scene)
    desc = pbrt_parse(str(p))
    cs = compile_scene(desc)
    sa, static = cs.arrays, cs.static
    assert static.has_rot_motion and sa.anim is not None
    assert int(sa.anim_gid.max()) >= 1

    # --- mesh: probe the quad center along its EXACT arc at many times ---
    rot = Transform.rotate(120.0, [0.0, 1.0, 0.0])
    anim = AnimatedTransform(Transform.identity(), rot)
    times = [0.2, 0.5, 0.8]
    c0 = np.array([1.0, 0.0, 0.0])
    for tm in times:
        c_t = anim.interpolate(tm).xpoint(c0[None])[0]
        n_t = c_t / np.linalg.norm(c_t)  # quad normal ~ radial
        o = jnp.asarray((c_t + 3.0 * n_t)[None], jnp.float32)
        d = jnp.asarray((-n_t)[None], jnp.float32)
        hit = intersect(sa, static, o, d, jnp.full(1, jnp.inf, jnp.float32),
                        time=jnp.asarray([tm], jnp.float32))
        assert int(hit["prim"][0]) >= 0, f"exact arc position missed at t={tm}"
        t_hit = float(hit["t"][0])
        assert abs(t_hit - 3.0) < 2e-3, (tm, t_hit)

    # --- sphere: the scene's CTM pair is (T, R.T); the reference
    # decomposes BOTH matrices and interpolates components
    # (transform.rs:1493), so the center follows the LERPED translation of
    # the pair, not a circular arc — the exact device path must agree ---
    T0 = Transform.translate([0.0, 3.0, 0.0])
    T1 = Transform.rotate(120.0, [0.0, 0.0, 1.0]) @ T0
    anim2 = AnimatedTransform(T0, T1)
    s0 = np.array([0.0, 0.0, 0.0])
    for tm in times:
        c_t = anim2.interpolate(tm).xpoint(s0[None])[0]
        o = jnp.asarray((c_t + np.array([0.0, 0.0, 4.0]))[None], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        hit = intersect(sa, static, o, d, jnp.full(1, jnp.inf, jnp.float32),
                        time=jnp.asarray([tm], jnp.float32))
        assert int(hit["prim"][0]) >= 0, f"sphere exact center missed at t={tm}"
        assert abs(float(hit["t"][0]) - 3.75) < 2e-3, (tm, float(hit["t"][0]))

    # --- surface_interaction agrees with the intersect-path geometry ---
    from pbrt_tpu.device.shading import surface_interaction

    tm = 0.5
    c_t = anim.interpolate(tm).xpoint(c0[None])[0]
    n_t = c_t / np.linalg.norm(c_t)
    o = jnp.asarray((c_t + 3.0 * n_t)[None], jnp.float32)
    d = jnp.asarray((-n_t)[None], jnp.float32)
    hit = intersect(sa, static, o, d, jnp.full(1, jnp.inf, jnp.float32),
                    time=jnp.asarray([tm], jnp.float32))
    si = surface_interaction(sa, hit, o, d, time=jnp.asarray([tm], jnp.float32))
    p_dev = np.asarray(si["p"][0])
    np.testing.assert_allclose(p_dev, c_t, atol=3e-3)
    # geometric normal: the REST quad is tilted (not radial); expected =
    # rest normal rotated by the interpolated transform's linear part
    v = np.array([[0.98, -1, -0.1], [1.02, -1, 0.1], [1.02, 1, 0.1]])
    n_rest = np.cross(v[1] - v[0], v[2] - v[0])
    n_rest /= np.linalg.norm(n_rest)
    n_exp = anim.interpolate(tm).m[:3, :3] @ n_rest
    ng = np.asarray(si["ng"][0])
    assert abs(abs(float(np.dot(ng, n_exp))) - 1.0) < 1e-3, (ng, n_exp)


def test_exact_slerp_motion_packet_traversal_path(tmp_path):
    """Same exactness through the PACKET traversal leaf (>16 prims routes
    off the brute path), covering the _traverse rows16 exact branch."""
    import jax.numpy as jnp

    from pbrt_tpu.parser.api import pbrt_parse
    from pbrt_tpu.device.intersect import intersect
    from pbrt_tpu.scene.builder import compile_scene

    # a 6x12 grid quad = 144 triangles at radius 1 (> BRUTE_FORCE_MAX_PRIMS
    # so the packet traversal routes), rotating 120 deg about y
    xs = np.linspace(0.98, 1.02, 7)
    ys = np.linspace(-1.0, 1.0, 13)
    pts = []
    for yv in ys:
        for xv in xs:
            # slight z tilt, same plane family as the brute-path test
            pts += [xv, yv, (xv - 1.0) * 5.0]
    idx = []
    for j in range(12):
        for i in range(6):
            a = j * 7 + i
            idx += [a, a + 1, a + 8, a, a + 8, a + 7]
    scene = f"""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Integrator "path" "integer maxdepth" [1]
Camera "perspective" "float fov" [45] "float shutteropen" [0] "float shutterclose" [1]
WorldBegin
AttributeBegin
ActiveTransform EndTime
Rotate 120 0 1 0
ActiveTransform All
Shape "trianglemesh" "integer indices" [{' '.join(map(str, idx))}]
  "point3 P" [{' '.join(f'{v:.5f}' for v in pts)}]
AttributeEnd
WorldEnd
"""
    p = tmp_path / "rot_packet.pbrt"
    p.write_text(scene)
    cs = compile_scene(pbrt_parse(str(p)))
    sa, static = cs.arrays, cs.static
    assert not static.use_brute_force and static.has_rot_motion
    rot = Transform.rotate(120.0, [0.0, 1.0, 0.0])
    anim = AnimatedTransform(Transform.identity(), rot)
    c0 = np.array([1.0, 0.0, 0.0])
    for tm in (0.25, 0.6):
        c_t = anim.interpolate(tm).xpoint(c0[None])[0]
        n_t = c_t / np.linalg.norm(c_t)
        o = jnp.asarray((c_t + 3.0 * n_t)[None], jnp.float32)
        d = jnp.asarray((-n_t)[None], jnp.float32)
        hit = intersect(sa, static, o, d, jnp.full(1, jnp.inf, jnp.float32),
                        time=jnp.asarray([tm], jnp.float32))
        assert int(hit["prim"][0]) >= 0, f"packet-path exact arc missed at t={tm}"
        assert abs(float(hit["t"][0]) - 3.0) < 2e-3, (tm, float(hit["t"][0]))


def test_exact_motion_animated_instanced_prototype(tmp_path):
    """An instanced prototype defined under a rotating shutter CTM must
    (a) move exactly per the decompose+slerp path in instance space and
    (b) keep BVH bounds that cover the whole shutter sweep (the round-4
    review found bounds were built from t=0 verts only)."""
    import jax.numpy as jnp

    from pbrt_tpu.parser.api import pbrt_parse
    from pbrt_tpu.device.intersect import intersect
    from pbrt_tpu.scene.builder import compile_scene

    scene = """
Film "image" "integer xresolution" [8] "integer yresolution" [8]
Integrator "path" "integer maxdepth" [1]
Camera "perspective" "float fov" [45] "float shutteropen" [0] "float shutterclose" [1]
WorldBegin
ObjectBegin "rotor"
ActiveTransform EndTime
Rotate 120 0 1 0
ActiveTransform All
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point3 P" [0.98 -1 -0.1  1.02 -1 0.1  1.02 1 0.1  0.98 1 -0.1]
ObjectEnd
AttributeBegin
Translate 0 0 -2
ObjectInstance "rotor"
AttributeEnd
WorldEnd
"""
    p = tmp_path / "rot_inst.pbrt"
    p.write_text(scene)
    cs = compile_scene(pbrt_parse(str(p)))
    sa, static = cs.arrays, cs.static
    assert static.has_rot_motion and static.has_instances
    rot = Transform.rotate(120.0, [0.0, 1.0, 0.0])
    anim = AnimatedTransform(Transform.identity(), rot)
    off = np.array([0.0, 0.0, -2.0])
    c0 = np.array([1.0, 0.0, 0.0])
    for tm in (0.3, 0.7):
        c_t = anim.interpolate(tm).xpoint(c0[None])[0] + off
        n_t = (c_t - off) / np.linalg.norm(c_t - off)
        o = jnp.asarray((c_t + 3.0 * n_t)[None], jnp.float32)
        d = jnp.asarray((-n_t)[None], jnp.float32)
        hit = intersect(sa, static, o, d, jnp.full(1, jnp.inf, jnp.float32),
                        time=jnp.asarray([tm], jnp.float32))
        assert int(hit["prim"][0]) >= 0, f"instanced exact arc missed at t={tm}"
        assert abs(float(hit["t"][0]) - 3.0) < 2e-3, (tm, float(hit["t"][0]))
