"""Exact float arithmetic helpers for TPU.

TPU add/sub/mul are IEEE-correct, but f32 division is approximate and —
worse — its rounding depends on the fusion context, so the same program
fragment can produce different results inside different jit graphs (observed:
single vs vmapped SGM pipelines).  The SGM subpixel quotient
``(c1 - c2) / (2 * denom)`` lands on exact .5 boundaries whenever a
neighbouring disparity ties the cost minimum — extremely common — and the
LR-check column truncation sits right on that boundary
(SemiGlobalMatching.c:454), so approximate division flips entire columns.

``div_s32_correctly_rounded`` computes the IEEE round-to-nearest-even f32
quotient of two int32 values using only exact integer ops + ldexp, making
the pipeline bit-stable across fusion contexts and bit-equal to C/numpy.

Domain: |n| < 2**17, 1 <= m < 2**16 (SGM subpixel needs |n| <= 65535,
m = 2*denom <= 65534).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _floor_log2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact floor(log2(x)) for int32 x >= 1 (binary ladder, no floats)."""
    r = jnp.zeros_like(x)
    for s in (16, 8, 4, 2, 1):
        m = x >= (1 << s)
        r = r + jnp.where(m, s, 0)
        x = jnp.where(m, x >> s, x)
    return r


def div_s32_correctly_rounded(n: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """IEEE-f32 round-to-nearest-even of n/m for int32 n, m.

    Requires |n| < 2**17 and 1 <= m < 2**16.  Returns exactly
    float32(n) / float32(m) as computed by a correctly-rounded divider
    (C, numpy, CPU XLA)."""
    n = n.astype(jnp.int32)
    m = m.astype(jnp.int32)
    a = jnp.abs(n)
    az = jnp.maximum(a, 1)  # avoid log2(0); a==0 handled at the end

    ca = 30 - _floor_log2(az)          # a' = a << ca in [2^30, 2^31)
    cb = 15 - _floor_log2(m)           # b' = m << cb in [2^15, 2^16)
    ap = az << ca
    bp = m << cb

    q0 = ap // bp                      # in [2^14, 2^16)
    r0 = ap - q0 * bp
    q1 = (r0 << 9) // bp               # r0 < 2^16 -> r0<<9 < 2^25
    r1 = (r0 << 9) - q1 * bp
    q2 = (r1 << 2) // bp
    r2 = (r1 << 2) - q2 * bp

    q_full = (((q0 << 9) + q1) << 2) + q2   # floor(a' * 2^11 / b'), 26-27 bits
    sticky = (r2 != 0).astype(jnp.int32)

    # round to 24-bit mantissa, nearest-even
    t = jnp.where(q_full < (1 << 26), 2, 3)
    mant = q_full >> t
    dropped = q_full & ((1 << t) - 1)
    round_bit = (dropped >> (t - 1)) & 1
    rest = (dropped & ((1 << (t - 1)) - 1)) | sticky
    inc = round_bit & (rest | (mant & 1))
    mant = mant + inc                   # may reach 2^24: still exact in f32

    exp = t - 11 + cb - ca
    mag = jnp.ldexp(mant.astype(jnp.float32), exp)
    signed = jnp.where(n < 0, -mag, mag)
    return jnp.where(a == 0, jnp.float32(0.0), signed)
