"""pbrt_tpu — a TPU-native physically based renderer.

A from-scratch reimplementation of the capabilities of the pbrt-v3 feature set
(reference implementation: alexmeli100/pbrt-rust), designed TPU-first:

- Host layer (pure Python/NumPy): .pbrt scene language parser, scene-build API
  state machine, transform/spectrum math, host-side BVH construction, and a
  compiler from the scene graph into flat SoA device arrays (``SceneArrays``).
- Device layer (JAX/XLA/Pallas): a wavefront path tracer operating on batched
  ray SoA state — ray generation, BVH traversal + primitive intersection,
  BSDF evaluation/sampling, next-event estimation with MIS, and segment-sum
  film splatting — all under ``jax.jit`` with static shapes.
- Scale-out: ``jax.sharding.Mesh`` + ``shard_map`` over the ray/pixel axis,
  with a ``psum`` film merge (the reference's rayon tile loop re-imagined as
  SPMD over ICI; see /root/reference/src/core/integrator.rs:263-403).
"""

__version__ = "0.1.0"
