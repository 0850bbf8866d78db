"""Measure stem-chain variants on the current platform.

The DLA stem (7x7 s1 3->16 @384x1280, then 3x3 s1 16->16, then 3x3 s2
16->32) is ~56% of the forward: tiny channel counts waste MXU lanes and
XLA inserts full-res layout copies between the convs. Space-to-depth
re-expresses each conv exactly (pure kernel reindexing) at lower spatial
resolution with MXU-friendly channels.

Variants (all numerically equal to the direct chain, checked in f32):
  direct   : current Flax path (3 convs + bn + relu at full res)
  s2d4     : whole chain in block-4 domain (48->256, 256->256, 256->128)
  s2d4/2   : conv1 in block-4, switch to block-2 for conv2/conv3
  s2d2     : whole chain in block-2 domain

Usage: python scripts/stem_experiments.py [--batch 16]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from monocon_tpu.utils.platform import apply_platform_env

apply_platform_env()

import argparse

import numpy as np


def s2d_kernel(k, b, stride, pad, bo):
    """Re-express a full-res conv kernel (kh,kw,ci,co) as a block-domain
    kernel (kh',kw', b*b*ci, bo*bo*co) with block-domain stride 1, where
    bo = b // stride is the output block size. Returns (kernel, pad_lo,
    pad_hi) for the block-domain conv. Exact reindexing (zeros elsewhere)."""
    kh, kw, ci, co = k.shape
    lo = min((s * q - pad) // b for q in range(bo) for s in (stride,))
    lo = min(lo, (stride * 0 + 0 - pad) // b)
    hi = max((stride * q + kh - 1 - pad) // b for q in range(bo))
    kbh = hi - lo + 1
    low = (0 - pad) // b
    hiw = max((stride * q + kw - 1 - pad) // b for q in range(bo))
    kbw = hiw - low + 1
    out = np.zeros((kbh, kbw, b * b * ci, bo * bo * co), k.dtype)
    for qi in range(bo):
        for qj in range(bo):
            for u in range(kh):
                bi, pi = divmod(stride * qi + u - pad, b)
                for v in range(kw):
                    bj, pj = divmod(stride * qj + v - pad, b)
                    out[bi - lo, bj - low,
                        (pi * b + pj) * ci:(pi * b + pj + 1) * ci,
                        (qi * bo + qj) * co:(qi * bo + qj + 1) * co] = k[u, v]
    return out, (-lo, hi), (-low, hiw)


def ws2d_kernel(k, b, stride, pad):
    """Re-express a full-res conv kernel (kh,kw,ci,co) as a W-only
    block-domain kernel: H stays plain (stride/pad unchanged), W is blocked
    by ``b`` with block-domain stride 1 and output block bo = b // stride.
    Returns (kernel (kh, kbw, b*ci, bo*co), (pad_w_lo, pad_w_hi)).

    W-only blocking matters because in NHWC the (W, C) axes are memory-
    adjacent: space_to_depth along W alone is a pure reshape (bitcast), so
    the stem needs NO layout-transpose copies at all."""
    kh, kw, ci, co = k.shape
    bo = b // stride
    lo = (0 - pad) // b
    hi = max((stride * q + kw - 1 - pad) // b for q in range(bo))
    kbw = hi - lo + 1
    out = np.zeros((kh, kbw, b * ci, bo * co), k.dtype)
    for qj in range(bo):
        for v in range(kw):
            bj, pj = divmod(stride * qj + v - pad, b)
            out[:, bj - lo, pj * ci:(pj + 1) * ci,
                qj * co:(qj + 1) * co] = k[:, v]
    return out, (-lo, hi)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from monocon_tpu.utils.profiling import sync_timer

    B, H, W = args.batch, 384, 1280
    rng = np.random.default_rng(0)
    x_host = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    k1 = (rng.normal(size=(7, 7, 3, 16)) * 0.1).astype(np.float32)
    k2 = (rng.normal(size=(3, 3, 16, 16)) * 0.1).astype(np.float32)
    k3 = (rng.normal(size=(3, 3, 16, 32)) * 0.1).astype(np.float32)
    scales = [rng.uniform(0.5, 1.5, c).astype(np.float32) for c in (16, 16, 32)]
    biases = [rng.normal(size=c).astype(np.float32) * 0.1 for c in (16, 16, 32)]

    PRECISION = [None]  # HIGHEST during the correctness check

    def conv(x, k, stride, pad):
        return lax.conv_general_dilated(
            x, k.astype(x.dtype), (stride, stride), [pad, pad],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=PRECISION[0],
        )

    def s2d(x, b):
        B_, H_, W_, C = x.shape
        x = x.reshape(B_, H_ // b, b, W_ // b, b, C)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(
            B_, H_ // b, W_ // b, b * b * C)

    def d2s(x, b):
        B_, Hb, Wb, C = x.shape
        c = C // (b * b)
        x = x.reshape(B_, Hb, Wb, b, b, c).transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B_, Hb * b, Wb * b, c)

    def bnrelu(x, i, reps=1):
        s = jnp.tile(jnp.asarray(scales[i]), reps).astype(x.dtype)
        b = jnp.tile(jnp.asarray(biases[i]), reps).astype(x.dtype)
        return jnp.maximum(x * s + b, 0)

    def block_conv(x, k_full, b, stride, pad, bo):
        kb, ph, pw = s2d_kernel(k_full, b, stride, pad, bo)
        return lax.conv_general_dilated(
            x, jnp.asarray(kb).astype(x.dtype), (1, 1), [ph, pw],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=PRECISION[0],
        )

    # ---- variants: input full-res f32/bf16 -> level1 output (full res) --

    def direct(x):
        x = bnrelu(conv(x, k1, 1, (3, 3)), 0)
        x = bnrelu(conv(x, k2, 1, (1, 1)), 1)
        x = bnrelu(conv(x, k3, 2, (1, 1)), 2)
        return x

    def v_s2d4(x):
        xb = s2d(x, 4)                                   # (B,96,320,48)
        xb = bnrelu(block_conv(xb, k1, 4, 1, 3, 4), 0, 16)   # 48->256
        xb = bnrelu(block_conv(xb, k2, 4, 1, 1, 4), 1, 16)   # 256->256
        xb = bnrelu(block_conv(xb, k3, 4, 2, 1, 2), 2, 4)    # 256->128
        return d2s(xb, 2)                                # (B,192,640,32)

    def v_s2d4_2(x):
        xb = s2d(x, 4)
        xb = bnrelu(block_conv(xb, k1, 4, 1, 3, 4), 0, 16)
        xb = s2d(d2s(xb, 4), 2)                          # block4 -> block2
        xb = bnrelu(block_conv(xb, k2, 2, 1, 1, 2), 1, 4)    # 64->64
        xb = bnrelu(block_conv(xb, k3, 2, 2, 1, 1), 2, 1)    # 64->32
        return xb                                        # (B,192,640,32)

    def v_s2d2(x):
        xb = s2d(x, 2)                                   # (B,192,640,12)
        xb = bnrelu(block_conv(xb, k1, 2, 1, 3, 2), 0, 4)    # 12->64
        xb = bnrelu(block_conv(xb, k2, 2, 1, 1, 2), 1, 4)
        xb = bnrelu(block_conv(xb, k3, 2, 2, 1, 1), 2, 1)
        return xb

    def ws2d(x, b):
        B_, H_, W_, C = x.shape
        return x.reshape(B_, H_, W_ // b, b * C)         # pure reshape

    def wd2s(x, b):
        B_, H_, Wb, C = x.shape
        return x.reshape(B_, H_, Wb * b, C // b)

    def wblock_conv(x, k_full, b, stride_h, stride_w, pad):
        kb, pw = ws2d_kernel(k_full, b, stride_w, pad)
        return lax.conv_general_dilated(
            x, jnp.asarray(kb).astype(x.dtype), (stride_h, 1),
            [(pad, pad), pw],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=PRECISION[0],
        )

    def v_ws2d4(x):
        xw = ws2d(x, 4)                                  # (B,384,320,12)
        xw = bnrelu(wblock_conv(xw, k1, 4, 1, 1, 3), 0, 4)   # 12->64
        xw = bnrelu(wblock_conv(xw, k2, 4, 1, 1, 1), 1, 4)   # 64->64
        xw = bnrelu(wblock_conv(xw, k3, 4, 2, 2, 1), 2, 2)   # 64->64
        return wd2s(xw, 2)                               # (B,192,640,32)

    variants = {
        "direct": direct, "s2d4": v_s2d4, "s2d4/2": v_s2d4_2, "s2d2": v_s2d2,
        "ws2d4": v_ws2d4,
    }

    # correctness in f32 (small batch; HIGHEST precision so the check is
    # about indexing, not the TPU's default bf16-pass conv arithmetic)
    PRECISION[0] = lax.Precision.HIGHEST
    x_small = jnp.asarray(x_host[:2])
    ref = np.asarray(jax.jit(direct)(x_small))
    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(x_small))
        err = np.max(np.abs(got - ref)) / (np.abs(ref).max() + 1e-9)
        print(f"{name:8s} f32 rel-err vs direct: {err:.2e}")
        assert err < 1e-5, name

    # timing in bf16 (serving dtype)
    PRECISION[0] = None
    x_bf = jnp.asarray(x_host).astype(jnp.bfloat16)
    print(f"\nbatch {B}, bf16, {args.iters} iters, best of 3 windows:")
    for name, fn in variants.items():
        jfn = jax.jit(lambda x, fn=fn: fn(x).sum())
        best = min(
            sync_timer(jfn, x_bf, iters=args.iters, warmup=3)
            for _ in range(3)
        )
        print(f"{name:8s} {best * 1e3:8.3f} ms/step "
              f"({B / best:7.1f} img/s)")


if __name__ == "__main__":
    main()
