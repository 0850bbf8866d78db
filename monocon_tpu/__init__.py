"""monocon_tpu — a TPU-native (JAX/XLA/Pallas) monocular 3D object detection
framework with the capabilities of the MonoCon reference implementation
(2gunsu/monocon-pytorch).

Design stance (see SURVEY.md §7):
  * Pure-functional Flax model, NHWC layout, fixed shapes end-to-end.
  * Dense target generation and heatmap decode run *inside* jit as batched
    array programs (masked, never ragged) instead of host-side Python loops.
  * Data parallelism via ``jax.sharding.Mesh`` + NamedSharding; gradient
    all-reduce rides ICI through XLA collectives.
  * Host-side work (KITTI parsing, augmentations, AP evaluation,
    visualization) stays in numpy / native code, off the device critical path.
"""

__version__ = "0.1.0"
