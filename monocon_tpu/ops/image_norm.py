"""On-device image normalization for raw uint8 batches.

The engine ships images over the host->device link as raw uint8 when
``cfg.TPU.IMAGE_TRANSPORT == 'uint8'`` (4x fewer bytes than the host-
normalized float32 the reference pipeline produces,
default_transforms.py:376-407) and folds ``(x - mean) / std`` into the
jitted program instead, where XLA fuses it into the stem convolution's
prologue. Dtype-driven at trace time: float inputs are assumed already
normalized and pass through unchanged, so all existing float callers
(parity tests, __graft_entry__, scripts) are unaffected.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..data.transforms import Normalize

# numpy constants (not jnp): importing this module must not initialize a
# jax backend — callers like dryrun_multichip force the platform first.
# Same f32 values as the host Normalize transform computes.
_MEAN = np.asarray(Normalize.IMAGENET_MEAN, np.float32)
_INV_STD = (1.0 / np.asarray(Normalize.IMAGENET_STD, np.float32))


def normalize_if_raw(
    image: jnp.ndarray, hw: jnp.ndarray | None = None
) -> jnp.ndarray:
    """(B,H,W,3) uint8 -> ImageNet-normalized float32; floats pass through.

    Matches the host ``Normalize`` transform bit-for-bit on integral
    pixels: the same f32 ``(x - mean) * (1/std)`` with the same constants.

    ``hw`` (B, 2) int32 gives each sample's true (h, w) extent before
    Pad/collate zero-filled the canvas. The float32 transport normalizes
    *before* padding, so its padded border is exactly 0.0 (the mean pixel);
    raw-uint8 zeros would instead normalize to ~(-2.12, -2.04, -1.80).
    Zeroing everything outside ``[:h, :w]`` after normalizing makes the two
    transports bit-identical including the border (KITTI 375x1242 pads to
    384x1248, so every real eval image has one). XLA fuses the mask into
    the same elementwise epilogue; floats pass through untouched because
    their border is already exact.
    """
    if image.dtype == jnp.uint8:
        out = (image.astype(jnp.float32) - _MEAN) * _INV_STD
        if hw is not None:
            h_in = jnp.arange(image.shape[1]) < hw[:, 0, None]    # (B, H)
            w_in = jnp.arange(image.shape[2]) < hw[:, 1, None]    # (B, W)
            mask = h_in[:, :, None] & w_in[:, None, :]            # (B, H, W)
            out = out * mask[..., None]
        return out
    return image
