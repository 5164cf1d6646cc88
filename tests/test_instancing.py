"""Object-instance reuse (primitive.rs:41-103 TransformedPrimitive).

Round-1 review item #9: instances were expanded by copying geometry; mesh
prototypes are now shared — N instances add N prim-row sets and one
transform row each, not N vertex-table copies. Rays are transformed into
instance space at the leaf test; shading geometry comes back through the
instance transform."""
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.parser.api import pbrt_parse
from pbrt_tpu.scene.builder import compile_scene
from pbrt_tpu.device.intersect import intersect
from pbrt_tpu.device.shading import surface_interaction


SCENE = """
LookAt 0 0 8  0 0 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
ObjectBegin "card"
  Shape "trianglemesh" "integer indices" [0 1 2  0 2 3]
    "point P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]
ObjectEnd
AttributeBegin
  Translate -3 0 0
  ObjectInstance "card"
AttributeEnd
AttributeBegin
  Translate 3 0 0
  Rotate 90 0 1 0
  ObjectInstance "card"
AttributeEnd
WorldEnd
"""


def _compile(src):
    fd, path = tempfile.mkstemp(suffix=".pbrt")
    with os.fdopen(fd, "w") as fh:
        fh.write(src)
    try:
        return compile_scene(pbrt_parse(path))
    finally:
        os.unlink(path)


def test_instances_share_geometry():
    cs = _compile(SCENE)
    sa, st = cs.arrays, cs.static
    assert st.has_instances
    # 2 triangles stored ONCE, 4 prim rows (2 per instance)
    assert st.n_tris == 2
    assert st.n_prims == 4
    assert int(sa.inst_i2w.shape[0]) == 3  # identity + 2 instances
    assert sorted(np.unique(np.asarray(sa.prim_inst)).tolist()) == [1, 2]


def test_instance_intersections_and_normals():
    cs = _compile(SCENE)
    sa, st = cs.arrays, cs.static
    # instance 1: card at x=-3 in the xy plane (normal +-z)
    # instance 2: card at x=+3 rotated 90deg about y (normal +-x)
    o = jnp.array([
        [-3.0, 0.0, 5.0],   # hits instance 1 face-on
        [8.0, 0.0, 0.0],    # hits instance 2 edge-on from +x
        [0.0, 0.0, 5.0],    # passes between the instances
    ])
    d = jnp.array([
        [0.0, 0.0, -1.0],
        [-1.0, 0.0, 0.0],
        [0.0, 0.0, -1.0],
    ])
    hit = intersect(sa, st, o, d, jnp.full(3, 1e9))
    prim = np.asarray(hit["prim"])
    t = np.asarray(hit["t"])
    assert prim[0] >= 0 and abs(t[0] - 5.0) < 1e-3
    assert prim[1] >= 0 and abs(t[1] - 5.0) < 1e-3
    assert prim[2] == -1
    si = surface_interaction(sa, hit, o, d)
    ng = np.asarray(si["ng"])
    assert abs(abs(ng[0, 2]) - 1.0) < 1e-4  # +-z normal on instance 1
    assert abs(abs(ng[1, 0]) - 1.0) < 1e-4  # +-x normal on instance 2


def test_instanced_render_smoke():
    src = SCENE.replace('WorldBegin', '''WorldBegin
LightSource "distant" "point from" [0 0 10] "point to" [0 0 0]
    "color L" [3 3 3]''')
    from pbrt_tpu.render import render

    cs = _compile(src)
    img = np.asarray(render(cs.description, spp=4))
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # the cards are lit
