"""Sequential (C-order) float32 cumulative sum.

The reference accumulates mass with a serial ``mass += m`` in float32
(kd2.c:807, 521, 543); XLA's cumsum uses a tree association whose rounding
differs. On *equal-mass* snapshots (plain DM boxes) every cumulative-mass
crossing lands exactly on a particle boundary, so a sub-ulp association
difference flips half-mass-radius indices on ~half the halos. This scan
reproduces the left-associated float32 sum bit-for-bit: a lax.scan over the
slot axis with the halo batch vectorized across lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def seq_cumsum(x, axis: int = 1):
    """Left-associated float32 cumsum along ``axis`` (C accumulator order)."""
    x = jnp.moveaxis(x, axis, 0)

    def step(acc, v):
        acc = acc + v
        return acc, acc

    _, out = jax.lax.scan(step, jnp.zeros(x.shape[1:], x.dtype), x,
                          unroll=8)   # amortize per-step loop overhead
    return jnp.moveaxis(out, 0, axis)
