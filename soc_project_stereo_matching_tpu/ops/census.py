"""Census transform (5x5) — JAX ops.

Reference: ``SemiGlobalMatching.c:134-159`` (census_transform_5x5).  Strict
``gray < gray_center`` comparison, centre included (always-0 bit), 2-px
border left at 0.  The 25 window bits are packed MSB-first in window order
(-2,-2) .. (2,2) into a uint32.

The jnp implementation is a straight-line sequence of 25 shifted compares —
XLA fuses it into a handful of VPU loops; a Pallas kernel buys nothing here
because the op is purely elementwise over shifted views (memory-bound, and
the fusion is already optimal).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def census_5x5(img: jnp.ndarray) -> jnp.ndarray:
    """img: uint8 (..., H, W) -> uint32 census codes (..., H, W)."""
    img = img.astype(jnp.int32)
    h, w = img.shape[-2], img.shape[-1]
    center = img[..., 2:h - 2, 2:w - 2]
    val = jnp.zeros_like(center, dtype=jnp.uint32)
    for r in range(-2, 3):
        for c in range(-2, 3):
            val = val << jnp.uint32(1)
            neigh = img[..., 2 + r:h - 2 + r, 2 + c:w - 2 + c]
            val = val | (neigh < center).astype(jnp.uint32)
    out = jnp.zeros(img.shape, dtype=jnp.uint32)
    return out.at[..., 2:h - 2, 2:w - 2].set(val)
