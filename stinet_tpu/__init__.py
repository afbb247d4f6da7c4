"""stinet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for surface texture
inpainting on 3D mesh graphs, built from scratch with the capabilities of
johnpeterflynn/surface-texture-inpainting-net.

Design principles (TPU-first, not a port):
  * All shapes static: graphs are padded/bucketed (`stinet_tpu.graph`), every
    reduction is a masked segment op with a static `num_segments`.
  * All FLOPs on the MXU: EdgeConv-style message passing is algebraically
    refactored so matmuls are dense per-vertex [V, C] x [C, H] contractions;
    the per-edge work is gather + add + activation + segment-reduce only
    (`stinet_tpu.ops.message_passing`).
  * Scaling via `jax.sharding.Mesh` + collectives (`stinet_tpu.parallel`),
    not host-side process fan-out.
"""

__version__ = "0.1.0"
