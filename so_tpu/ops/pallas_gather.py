"""Pallas TPU kernel: fused cell-slab gather + min-image distance.

The XLA path materializes per-slot row indices and gathers particle rows
one at a time (ops/gather.py) — generic TPU gathers lower to slow
element-wise loops (~300 ms for a 4096x4096 stage on v5e). But a ball's
candidates are *contiguous slabs* of the Morton-sorted particle array (one
per intersecting cell), so this kernel instead streams each cell's slab
from HBM with async DMA and computes min-image distances on the VPU:

  per halo (grid program):
    init the halo's output block to d2=+inf
    for each candidate cell (counts/starts/offsets precomputed in XLA):
      for each CHUNK-wide piece of the slab:
        DMA soa[:, off:off+CHUNK] -> VMEM
        d2 = min-image distance to the center
        out[:, q+i*CHUNK : ...] = [d2, mass, m*v, meta, idx_lo, idx_hi]
        (rows beyond the cell count keep previous contents; out-of-ball
         rows get d2=+inf and zero payload)

Output layout (slot = cell-candidate rank) matches the XLA path, so the
downstream sort + density scan are unchanged.

Particle payload is a transposed (8, N_pad) float32 SoA (lane-friendly):
  rows: [x, y, z, mass, m*vx, m*vy, m*vz, meta]
meta packs species|mark<<4 as a small exact float. Output channels:
  [d2, mass, m*vx, m*vy, m*vz, meta, idx_lo, idx_hi]
where idx = idx_lo + 4096*idx_hi is the exact source row (f32-exact split).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256          # slab DMA chunk (rows); also the tail pad of the SoA

CH_D2, CH_MASS, CH_MVX, CH_MVY, CH_MVZ, CH_META, CH_ILO, CH_IHI = range(8)


def pack_soa8t(pos, mass, vel, ptype, mark):
    """Build the padded, transposed (8, N + CHUNK) payload array."""
    meta = (ptype.astype(jnp.int32)
            | (mark.astype(jnp.int32) << 4)).astype(jnp.float32)
    mv = vel * mass[:, None]
    soa = jnp.stack([pos[:, 0], pos[:, 1], pos[:, 2],
                     mass.astype(jnp.float32),
                     mv[:, 0], mv[:, 1], mv[:, 2], meta], axis=0)
    pad = jnp.zeros((8, CHUNK), jnp.float32).at[0:3, :].set(1e30)
    return jnp.concatenate([soa.astype(jnp.float32), pad], axis=1)


def _gather_kernel(start_ref, cnt_ref, q_ref, center_ref, soa_hbm,
                   out_ref, scratch, sem):
    """One program = one halo; streams its candidate cell slabs."""
    C = start_ref.shape[2]
    Kp = out_ref.shape[2]
    cx, cy, cz = center_ref[0, 0, 0], center_ref[0, 0, 1], center_ref[0, 0, 2]
    r2 = center_ref[0, 0, 3]
    px, py, pz = (center_ref[0, 0, 4], center_ref[0, 0, 5],
                  center_ref[0, 0, 6])

    out_ref[0, :, :] = jnp.concatenate(
        [jnp.full((1, Kp), jnp.inf, jnp.float32),
         jnp.zeros((7, Kp), jnp.float32)], axis=0)

    def do_cell(c, _):
        cnt = cnt_ref[0, 0, c]

        @pl.when(cnt > 0)
        def _():
            start = start_ref[0, 0, c]
            q = q_ref[0, 0, c]
            astart = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
            nch = pl.cdiv(start - astart + cnt, CHUNK)
            # capacity clamp: overflowing halos are discarded and re-run at
            # a bigger K by the host driver; never write out of bounds
            nch = jnp.minimum(nch, jnp.maximum(Kp - q, 0) // CHUNK)

            def do_chunk(i, _):
                off = pl.multiple_of(astart + i * CHUNK, CHUNK)
                dma = pltpu.make_async_copy(
                    soa_hbm.at[:, pl.ds(off, CHUNK)], scratch, sem)
                dma.start()
                dma.wait()
                dx = cx - scratch[0:1, :]
                dy = cy - scratch[1:2, :]
                dz = cz - scratch[2:3, :]
                dx = dx - px * jnp.round(dx / px)
                dy = dy - py * jnp.round(dy / py)
                dz = dz - pz * jnp.round(dz / pz)
                d2 = dx * dx + dy * dy + dz * dz          # (1, CHUNK)
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                row = off + lane                          # global source row
                in_cell = (row >= start) & (row < start + cnt)
                in_ball = in_cell & (d2 <= r2)
                idx = row.astype(jnp.int32)
                ilo = jnp.where(in_ball, (idx & 0xFFF).astype(jnp.float32), 0.0)
                ihi = jnp.where(in_ball, (idx >> 12).astype(jnp.float32), 0.0)
                payload = jnp.where(in_ball, scratch[3:8, :], 0.0)  # (5, CHUNK)
                rows = jnp.concatenate([
                    jnp.where(in_ball, d2, jnp.inf),
                    payload, ilo, ihi], axis=0)           # (8, CHUNK)
                # q offsets are CHUNK-aligned by construction
                # (cell_ranges align=CHUNK)
                off_out = pl.multiple_of(q + i * CHUNK, CHUNK)
                sl = (0, slice(None), pl.ds(off_out, CHUNK))
                out_ref[sl] = jnp.where(
                    in_cell, rows,
                    jnp.concatenate([jnp.full((1, CHUNK), jnp.inf,
                                              jnp.float32),
                                     jnp.zeros((7, CHUNK), jnp.float32)],
                                    axis=0))
                return 0

            jax.lax.fori_loop(0, nch, do_chunk, 0, unroll=False)

        return 0

    jax.lax.fori_loop(0, C, do_cell, 0, unroll=False)


@partial(jax.jit, static_argnames=("K",))
def pallas_slab_gather(soa8t, starts, cnts, qs, centers, period, r2, K: int):
    """(B,C) cell ranges -> (B, 8, K) slotted channels (see module doc)."""
    B, C = starts.shape
    Kp = K + CHUNK   # chunk-write overrun guard, sliced off on return
    cp = jnp.concatenate([
        centers.astype(jnp.float32), r2[:, None].astype(jnp.float32),
        jnp.broadcast_to(period[None, :].astype(jnp.float32), (B, 3)),
        jnp.zeros((B, 1), jnp.float32)], axis=1)          # (B, 8)
    # 3D shapes so per-halo blocks match the trailing array dims exactly
    # (Mosaic block-shape rule)
    starts3 = starts[:, None, :]
    cnts3 = cnts[:, None, :]
    qs3 = qs[:, None, :]
    cp3 = cp[:, None, :]
    out = pl.pallas_call(
        _gather_kernel,
        interpret=jax.default_backend() == "cpu",   # CI runs on CPU
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),          # SoA stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 8, Kp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, Kp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(starts3, cnts3, qs3, cp3, soa8t)
    return out[:, :, :K]


def decode_idx(ilo, ihi):
    return (ilo.astype(jnp.int32) + (ihi.astype(jnp.int32) << 12))
