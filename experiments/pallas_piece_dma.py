"""EXPERIMENT (not wired in): run-level piece-DMA variant of the slab kernel.

Drop-in replacement for so_tpu/ops/pallas_gather.py that issues one DMA
per PIECE_W chunks of a merged run instead of one per CHUNK, while the
dense output layout stays chunk-granular (capacity K unchanged).

Measured on the v5e bench (2M particles / 16,384 halos, merged runs of
2-3 chunks typical): PIECE_W=4 -> 84.7k solves/s, PIECE_W=2 -> 95.1k,
vs 97.6-100.3k for the production per-chunk kernel — wide DMAs waste
reads beyond short run ends and the guarded per-w stores add overhead.
Kept for workloads with long runs (very large halos / coarse levels),
where per-transfer overhead would dominate instead. All parity tests
pass with this variant (interpret mode + golden suite verified).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256          # output slot granularity (rows)
PIECE_W = 2          # chunks per DMA piece
HPP = 4              # halos per grid program
NBUF = 8             # DMA ring depth


def pack_soa8t(pos, mass, vel, ptype, mark):
    """(8, N + PIECE_W*CHUNK) payload; pad absorbs last-piece overhang."""
    meta = (ptype.astype(jnp.int32)
            | (mark.astype(jnp.int32) << 4)).astype(jnp.float32)
    mv = vel * mass[:, None]
    soa = jnp.stack([pos[:, 0], pos[:, 1], pos[:, 2],
                     mass.astype(jnp.float32),
                     mv[:, 0], mv[:, 1], mv[:, 2], meta], axis=0)
    pad = jnp.zeros((8, PIECE_W * CHUNK), jnp.float32).at[0:3, :].set(1e30)
    return jnp.concatenate([soa.astype(jnp.float32), pad], axis=1)


def piece_descriptors(st, cnt, q, K: int):
    """Cut merged slab runs into dense DMA-piece descriptors: per piece u,
    src (aligned source row), t0 (first dense output chunk slot), v (valid
    chunks <= PIECE_W), lo/hi (run's valid row range), n_pieces."""
    B, C = st.shape
    NC = (K + CHUNK) // CHUNK
    NP = NC
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]

    astart = (st // CHUNK) * CHUNK
    foot = jnp.where(cnt > 0,
                     ((st % CHUNK) + cnt + (CHUNK - 1)) // CHUNK * CHUNK, 0)
    nch = foot // CHUNK
    qc = q // CHUNK
    npc = -(-nch // PIECE_W)
    qp = jnp.cumsum(npc, axis=1) - npc
    n_pieces = jnp.minimum(npc.sum(axis=1), NP).astype(jnp.int32)

    def seg_const(vals):
        diffs = jnp.concatenate([vals[:, :1], vals[:, 1:] - vals[:, :-1]],
                                axis=1)
        arr = jnp.zeros((B, NP), vals.dtype).at[rows, qp].add(diffs,
                                                              mode="drop")
        return jnp.cumsum(arr, axis=1)

    e_astart = seg_const(astart)
    e_lo = seg_const(st)
    e_hi = seg_const(st + cnt)
    e_qc = seg_const(qc)
    e_qp = seg_const(qp)
    e_nch = seg_const(nch)
    j = jnp.arange(NP, dtype=jnp.int32)[None, :] - e_qp
    src = e_astart + j * (PIECE_W * CHUNK)
    t0 = e_qc + j * PIECE_W
    v = jnp.clip(e_nch - j * PIECE_W, 0, PIECE_W)
    return src, t0, v, e_lo, e_hi, n_pieces


def _make_kernel(chans: tuple):
    soa_row = {"mass": 3, "mvx": 4, "mvy": 5, "mvz": 6, "meta": 7}
    nch = 1 + len(chans)
    nbuf = 2 if jax.default_backend() == "cpu" else NBUF
    PW = PIECE_W * CHUNK

    def _gather_kernel(src_ref, t0_ref, v_ref, lo_ref, hi_ref, center_ref,
                       soa_hbm, out_ref, scratch, sem):
        Kp = out_ref.shape[2]
        NC = Kp // CHUNK

        for h in range(HPP):
            cx, cy, cz = (center_ref[0, h, 0], center_ref[0, h, 1],
                          center_ref[0, h, 2])
            r2 = center_ref[0, h, 3]
            px, py, pz = (center_ref[0, h, 4], center_ref[0, h, 5],
                          center_ref[0, h, 6])
            n = center_ref[0, h, 7].astype(jnp.int32)

            out_ref[h, :, :] = jnp.concatenate(
                [jnp.full((1, Kp), jnp.inf, jnp.float32),
                 jnp.zeros((nch - 1, Kp), jnp.float32)], axis=0)

            def dma(slot, u, h=h):
                src = pl.multiple_of(src_ref[0, h, u], CHUNK)
                return pltpu.make_async_copy(
                    soa_hbm.at[:, pl.ds(src, PW)], scratch.at[slot],
                    sem.at[slot])

            @pl.when(n > 0)
            def _(h=h, n=n, cx=cx, cy=cy, cz=cz, r2=r2, px=px, py=py, pz=pz,
                  dma=dma):
                def prologue(u, _):
                    @pl.when(u < n)
                    def _():
                        dma(u % nbuf, u).start()
                    return 0

                jax.lax.fori_loop(0, nbuf - 1, prologue, 0, unroll=True)

                def body(u, _):
                    slot = u % nbuf

                    @pl.when(u + nbuf - 1 < n)
                    def _():
                        dma((u + nbuf - 1) % nbuf, u + nbuf - 1).start()

                    dma(slot, u).wait()
                    buf = scratch[slot]
                    src = src_ref[0, h, u]
                    t0 = t0_ref[0, h, u]
                    v = v_ref[0, h, u]
                    lo = lo_ref[0, h, u]
                    hi = hi_ref[0, h, u]
                    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                    for w in range(PIECE_W):        # static unroll
                        @pl.when((w < v) & (t0 + w < NC))
                        def _(w=w):
                            col = slice(w * CHUNK, (w + 1) * CHUNK)
                            dx = cx - buf[0:1, col]
                            dy = cy - buf[1:2, col]
                            dz = cz - buf[2:3, col]
                            dx = dx - px * jnp.round(dx / px)
                            dy = dy - py * jnp.round(dy / py)
                            dz = dz - pz * jnp.round(dz / pz)
                            d2 = dx * dx + dy * dy + dz * dz
                            row = src + w * CHUNK + lane
                            in_cell = (row >= lo) & (row < hi)
                            in_ball = in_cell & (d2 <= r2)
                            parts = [jnp.where(in_ball, d2, jnp.inf)]
                            for ch in chans:
                                if ch == "ilo":
                                    val = (row & 0xFFF).astype(jnp.float32)
                                elif ch == "ihi":
                                    val = (row >> 12).astype(jnp.float32)
                                else:
                                    r0 = soa_row[ch]
                                    val = buf[r0:r0 + 1, col]
                                parts.append(jnp.where(in_ball, val, 0.0))
                            vals = jnp.concatenate(parts, axis=0)
                            pad_rows = jnp.concatenate(
                                [jnp.full((1, CHUNK), jnp.inf, jnp.float32),
                                 jnp.zeros((nch - 1, CHUNK), jnp.float32)],
                                axis=0)
                            dst = pl.multiple_of((t0 + w) * CHUNK, CHUNK)
                            out_ref[h, :, pl.ds(dst, CHUNK)] = jnp.where(
                                in_cell, vals, pad_rows)
                    return 0

                jax.lax.fori_loop(0, n, body, 0, unroll=False)

    return _gather_kernel


@partial(jax.jit, static_argnames=("K", "chans"))
def pallas_slab_gather(soa8t, starts, cnts, qs, centers, period, r2, K: int,
                       chans: tuple = ("mass", "mvx", "mvy", "mvz", "meta",
                                       "ilo", "ihi")):
    B, C = starts.shape
    NC = (K + CHUNK) // CHUNK
    NP = NC
    Kp = NC * CHUNK
    nch = 1 + len(chans)
    src, t0, v, lo, hi, n_pieces = piece_descriptors(starts, cnts, qs, K)
    cp = jnp.concatenate([
        centers.astype(jnp.float32), r2[:, None].astype(jnp.float32),
        jnp.broadcast_to(period[None, :].astype(jnp.float32), (B, 3)),
        n_pieces[:, None].astype(jnp.float32)], axis=1)
    Bp = -(-B // HPP) * HPP
    if Bp != B:
        padn = Bp - B
        zpad = jnp.zeros((padn, NP), jnp.int32)
        src = jnp.concatenate([src, zpad])
        t0 = jnp.concatenate([t0, zpad])
        v = jnp.concatenate([v, zpad])
        lo = jnp.concatenate([lo, zpad])
        hi = jnp.concatenate([hi, zpad])
        cp = jnp.concatenate([cp, jnp.ones((padn, 8), cp.dtype)
                              .at[:, 7].set(0.0)])
    smem = lambda: pl.BlockSpec((1, HPP, NP), lambda b: (b, 0, 0),
                                memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _make_kernel(chans),
        interpret=jax.default_backend() == "cpu",
        grid=(Bp // HPP,),
        in_specs=[
            smem(), smem(), smem(), smem(), smem(),
            pl.BlockSpec((1, HPP, 8), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((HPP, nch, Kp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, nch, Kp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 if jax.default_backend() == "cpu" else NBUF,
                        8, PIECE_W * CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2 if jax.default_backend() == "cpu"
                                     else NBUF,)),
        ],
    )(src.reshape(Bp // HPP, HPP, NP), t0.reshape(Bp // HPP, HPP, NP),
      v.reshape(Bp // HPP, HPP, NP), lo.reshape(Bp // HPP, HPP, NP),
      hi.reshape(Bp // HPP, HPP, NP), cp.reshape(Bp // HPP, HPP, 8), soa8t)
    return out[:B, :, :K]


def decode_idx(ilo, ihi):
    return (ilo.astype(jnp.int32) + (ihi.astype(jnp.int32) << 12))
