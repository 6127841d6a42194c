"""Pallas TPU kernel: fused cell-slab gather + min-image distance.

The XLA path materializes per-slot row indices and gathers particle rows
one at a time (ops/gather.py) — generic TPU gathers lower to slow
element-wise loops (~300 ms for a 4096x4096 stage on v5e). But a ball's
candidates are *contiguous slabs* of the Morton-sorted particle array (one
per intersecting cell, pre-merged into maximal runs by cell_ranges), so
this kernel streams them with double-buffered async DMA instead:

  XLA precompute (chunk_descriptors): each halo's merged slab runs are cut
  into CHUNK-aligned pieces and laid out densely — chunk t of a halo reads
  soa[:, src_t : src_t+CHUNK] (src_t = a0_t + t*CHUNK, 128-aligned) and
  writes output slots [t*CHUNK, (t+1)*CHUNK); rows outside the run's
  [lo_t, hi_t) range are masked.

  kernel: HPP halos per program; a fori_loop over each halo's chunks with
  an NBUF-deep VMEM ring — up to NBUF-1 DMAs stay in flight while chunk t
  computes min-image d2 on the VPU, hiding the per-transfer latency (which
  far exceeds the ~100 ns of compute per chunk).

Output layout (B, 8, K) channels: [d2, mass, m*vx, m*vy, m*vz, meta,
idx_lo, idx_hi]; out-of-ball and pad slots carry d2=+inf / zero payload.
idx = idx_lo + 4096*idx_hi is the exact source row (f32-exact split).
Particle payload is a transposed (8, N_pad) float32 SoA:
  rows: [x, y, z, mass, vx, vy, vz, meta], meta = species | mark<<4.
The m*v output channels are computed in-kernel (mass * v, one f32 IEEE
multiply — bit-identical to a host-side product), so the payload stores
RAW velocities: every grid array (pos, mass, vel, ptype, mark) is then
bit-exactly recoverable from the payload rows, which lets CellGrid drop
its duplicate per-particle arrays on the Pallas path (the HBM memory
budget, docs/RESULTS.md round 3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Default slab DMA chunk (rows); also the tail pad of the SoA. Must be a
# multiple of the 128-lane width (stores are lane-aligned at CHUNK
# granularity). The chunk also sets the occupancy floor of the level
# selection (solver._pick_level min_occ = 3/4 * chunk): smaller chunks
# admit finer grid levels, which wins on dense boxes (solve +50% at
# CHUNK=128 on the 8.4M/65k box) and loses ~10% DMA efficiency on sparse
# ones — build_grid picks per grid from the occupancy ladder.
# SO_TPU_CHUNK forces a global value for experiments.
CHUNK = int(_os.environ.get("SO_TPU_CHUNK", "256"))
assert CHUNK % 128 == 0 and CHUNK > 0, CHUNK
CHUNK_FORCED = "SO_TPU_CHUNK" in _os.environ
HPP = 8              # halos per grid program: 4 -> 8 gained 9% on v5e
#                      (fewer program switches); 16 regressed (VMEM window
#                      pressure) — measured on the 2M-particle bench

# Largest per-program output window (hpp x nch x Kp x 4 B) proven to
# compile and run on THIS device. The Mosaic scoped-VMEM stack holds ~3
# copies of the window (+ ~1 MB fixed) against the device's scoped-VMEM
# limit (16 MB on v5e), so a 5-row K=2^15 window at HPP=8 (5.02 MiB)
# overflows by 96 KiB (observed on the zoom parity run, 2026-08-19).
# pallas_slab_gather halves the per-program halo count until the window
# fits — wide-channel giant tiers then stay on the slab path instead of
# falling back to the ~100x slower XLA gather.
#
# The bound is a DEVICE property (VERDICT r3 missing #4): w_max()
# resolves it lazily per device kind — from the hardware-validated table
# below, or, on unknown silicon, a one-shot compile+run probe of the
# shipped kernel cached under the compile-cache dir. SO_TPU_WMAX
# overrides (experiments only).

# per device kind: window bytes proven by experiments/giant_kslab.py +
# experiments/wide_window_probe.py (compile, run, bit-match vs XLA)
_WMAX_PROVEN = {
    "TPU v5 lite": 8 * 2 * ((1 << 16) + 256) * 4,     # v5e, 2026-08-18/19
}
# conservative default: the smallest proven value; also used under the
# CPU interpreter (no VMEM ceiling there — keeping the same value keeps
# tier classification identical to the TPU default, which the bit-parity
# CI relies on)
W_MAX_DEFAULT = min(_WMAX_PROVEN.values())
W_MAX = None  # resolved lazily by w_max(); import-time jax queries would
#               break the CPU-forcing flows (tests/conftest.py)


def w_max() -> int:
    """The per-device proven window bound, resolved once per process."""
    global W_MAX
    if W_MAX is not None:
        return W_MAX
    if "SO_TPU_WMAX" in _os.environ:
        W_MAX = int(_os.environ["SO_TPU_WMAX"])
        return W_MAX
    import jax
    if jax.default_backend() == "cpu":
        W_MAX = W_MAX_DEFAULT
        return W_MAX
    kind = jax.devices()[0].device_kind
    W_MAX = _WMAX_PROVEN.get(kind) or _probe_wmax(kind)
    return W_MAX


def _probe_wmax(kind: str) -> int:
    """One-shot window-size probe for an unknown device kind: compile AND
    run the shipped kernel at descending hpp=1 nch=8 window sizes until
    one succeeds (a too-big window fails loudly at compile time with a
    scoped-VMEM error, never wedging the device). The result is cached on
    disk keyed by device kind, so the ladder runs once per machine."""
    import json

    cache_dir = _os.environ.get("SO_TPU_CACHE_DIR", "/tmp/so_tpu_cache")
    slug = "".join(c if c.isalnum() else "_" for c in kind)
    path = _os.path.join(cache_dir, f"wmax_{slug}.json")
    try:
        with open(path) as fp:
            return int(json.load(fp)["w_max"])
    except (OSError, ValueError, KeyError):
        pass
    import sys

    import jax

    nch8 = ("mass", "mvx", "mvy", "mvz", "meta", "ilo", "ihi")
    soa = jnp.zeros((8, 2 * CHUNK), jnp.float32)
    z1 = jnp.zeros((1, 1), jnp.int32)
    found = None
    for k_try in (1 << 19, 1 << 18, 1 << 17, 1 << 16, 1 << 15):
        try:
            out = pallas_slab_gather(
                soa, z1, z1, z1, jnp.zeros((1, 3), jnp.float32),
                jnp.ones(3, jnp.float32), jnp.ones(1, jnp.float32),
                k_try, chans=nch8, _force_hpp=1)
            jax.block_until_ready(out)
            found = 8 * (((k_try + CHUNK) // CHUNK) * CHUNK) * 4
            break
        except Exception as e:  # compile-time VMEM overflow
            print(f"so_tpu[wmax probe] {kind}: K={k_try} window failed "
                  f"({type(e).__name__})", file=sys.stderr, flush=True)
    if found is None:
        found = W_MAX_DEFAULT  # never proven this small anywhere; the
        #                        in-kernel guard will route giant tiers out
    try:
        _os.makedirs(cache_dir, exist_ok=True)
        with open(path, "w") as fp:
            json.dump({"w_max": found, "kind": kind}, fp)
    except OSError:
        pass
    print(f"so_tpu[wmax probe] {kind}: W_MAX={found} B", file=sys.stderr,
          flush=True)
    return found
NBUF = 8             # DMA ring depth: per-chunk compute (~100 ns) is far
#                      below DMA latency (~1 us), so the pipeline must keep
#                      several transfers in flight to stay bandwidth-bound

CH_D2, CH_MASS, CH_MVX, CH_MVY, CH_MVZ, CH_META, CH_ILO, CH_IHI = range(8)


def pack_soa8t(pos, mass, vel, ptype, mark, chunk: int = CHUNK):
    """Build the padded, transposed (8, N + chunk) payload array.

    Rows 4-6 hold RAW velocities (the kernel multiplies by the mass row
    when emitting m*v channels), so the payload is a lossless, bit-exact
    encoding of (pos, mass, vel, ptype, mark) — see CellGrid's accessors.
    """
    meta = (ptype.astype(jnp.int32)
            | (mark.astype(jnp.int32) << 4)).astype(jnp.float32)
    soa = jnp.stack([pos[:, 0], pos[:, 1], pos[:, 2],
                     mass.astype(jnp.float32),
                     vel[:, 0], vel[:, 1], vel[:, 2], meta], axis=0)
    pad = jnp.zeros((8, chunk), jnp.float32).at[0:3, :].set(1e30)
    return jnp.concatenate([soa.astype(jnp.float32), pad], axis=1)


def chunk_descriptors(st, cnt, q, K: int, CHUNK: int = CHUNK):
    """Cut merged slab runs into dense CHUNK descriptors.

    Returns per (halo, chunk t < NC): a0 (src_t = a0 + t*CHUNK, aligned),
    lo/hi (valid source-row range), and n_chunks per halo. Output slots of
    chunk t are exactly [t*CHUNK, (t+1)*CHUNK), so no destination offsets
    are needed and every store is lane-aligned.
    """
    B, C = st.shape
    NC = (K + CHUNK) // CHUNK
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]

    astart = (st // CHUNK) * CHUNK
    foot = jnp.where(cnt > 0,
                     ((st % CHUNK) + cnt + (CHUNK - 1)) // CHUNK * CHUNK, 0)
    nch = foot // CHUNK
    qc = q // CHUNK                       # first chunk slot of each run
    n_total = jnp.minimum(nch.sum(axis=1), NC).astype(jnp.int32)

    def seg_const(vals):
        """Piecewise-constant per-run value expanded to chunk slots."""
        diffs = jnp.concatenate([vals[:, :1], vals[:, 1:] - vals[:, :-1]],
                                axis=1)
        arr = jnp.zeros((B, NC), vals.dtype).at[rows, qc].add(diffs,
                                                              mode="drop")
        return jnp.cumsum(arr, axis=1)

    a0 = seg_const(astart - qc * CHUNK)   # src_t = a0 + t*CHUNK
    lo = seg_const(st)
    hi = seg_const(st + cnt)
    # chunks beyond n_total keep garbage descriptors; the kernel's loop
    # bound n_total never reaches them
    return a0, lo, hi, n_total


def _make_kernel(chans: tuple, CHUNK: int = CHUNK, hpp: int = HPP):
    """Kernel emitting only the requested channels (d2 is always row 0).

    Channel names: mass, mvx, mvy, mvz, meta and ilo/ihi (split source-row
    index). The mv* channels multiply the mass row by the raw-velocity rows
    in-kernel. Fewer channels = proportionally less VMEM->HBM output
    traffic per stage."""
    soa_row = {"mass": 3, "meta": 7}
    vel_row = {"mvx": 4, "mvy": 5, "mvz": 6}
    nch = 1 + len(chans)
    # deep DMA ring only on hardware; the interpreter executes each DMA
    # eagerly and a 2-slot ring keeps CI time sane
    nbuf = 2 if jax.default_backend() == "cpu" else NBUF

    def _gather_kernel(a0_ref, lo_ref, hi_ref, center_ref, soa_hbm,
                       out_ref, scratch, sem):
        Kp = out_ref.shape[2]

        for h in range(hpp):
            cx, cy, cz = (center_ref[0, h, 0], center_ref[0, h, 1],
                          center_ref[0, h, 2])
            r2 = center_ref[0, h, 3]
            px, py, pz = (center_ref[0, h, 4], center_ref[0, h, 5],
                          center_ref[0, h, 6])
            n = center_ref[0, h, 7].astype(jnp.int32)

            # nch == 1 (d2-only gathers, e.g. uniform-mass solves) must not
            # emit zero-row concatenate operands — Mosaic lowering of
            # zero-sized arrays is unvalidated
            if nch > 1:
                out_ref[h, :, :] = jnp.concatenate(
                    [jnp.full((1, Kp), jnp.inf, jnp.float32),
                     jnp.zeros((nch - 1, Kp), jnp.float32)], axis=0)
            else:
                out_ref[h, :, :] = jnp.full((1, Kp), jnp.inf, jnp.float32)

            def dma(slot, t, h=h):
                src = pl.multiple_of(a0_ref[0, h, t] + t * CHUNK, CHUNK)
                return pltpu.make_async_copy(
                    soa_hbm.at[:, pl.ds(src, CHUNK)], scratch.at[slot],
                    sem.at[slot])

            @pl.when(n > 0)
            def _(h=h, n=n, cx=cx, cy=cy, cz=cz, r2=r2, px=px, py=py, pz=pz,
                  dma=dma):
                def prologue(t, _):
                    @pl.when(t < n)
                    def _():
                        dma(t % nbuf, t).start()
                    return 0

                jax.lax.fori_loop(0, nbuf - 1, prologue, 0, unroll=True)

                def body(t, _):
                    slot = t % nbuf

                    @pl.when(t + nbuf - 1 < n)
                    def _():
                        dma((t + nbuf - 1) % nbuf, t + nbuf - 1).start()

                    dma(slot, t).wait()
                    buf = scratch[slot]
                    src = a0_ref[0, h, t] + t * CHUNK
                    # reference association: shifted center first, then
                    # subtract the particle (kd2.h INTERSECT + smooth2.c:89)
                    x = buf[0:1, :]
                    y = buf[1:2, :]
                    z = buf[2:3, :]
                    dx = (cx - px * jnp.round((cx - x) / px)) - x
                    dy = (cy - py * jnp.round((cy - y) / py)) - y
                    dz = (cz - pz * jnp.round((cz - z) / pz)) - z
                    d2 = dx * dx + dy * dy + dz * dz          # (1, CHUNK)
                    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
                    row = src + lane                          # source rows
                    in_cell = (row >= lo_ref[0, h, t]) & (row < hi_ref[0, h, t])
                    in_ball = in_cell & (d2 <= r2)
                    parts = [jnp.where(in_ball, d2, jnp.inf)]
                    for ch in chans:
                        if ch == "ilo":
                            v = (row & 0xFFF).astype(jnp.float32)
                        elif ch == "ihi":
                            v = (row >> 12).astype(jnp.float32)
                        elif ch in vel_row:
                            # m*v from mass x raw-v rows (same f32 bits as
                            # the host product the payload used to store)
                            v = buf[3:4, :] * buf[vel_row[ch]:vel_row[ch] + 1, :]
                        else:
                            r0 = soa_row[ch]
                            v = buf[r0:r0 + 1, :]
                        parts.append(jnp.where(in_ball, v, 0.0))
                    # single-element concatenates are identity; nch == 1
                    # avoids zero-row pad operands (see init above)
                    vals = parts[0] if nch == 1 \
                        else jnp.concatenate(parts, axis=0)   # (nch, CHUNK)
                    if nch > 1:
                        pad_rows = jnp.concatenate(
                            [jnp.full((1, CHUNK), jnp.inf, jnp.float32),
                             jnp.zeros((nch - 1, CHUNK), jnp.float32)],
                            axis=0)
                    else:
                        pad_rows = jnp.full((1, CHUNK), jnp.inf, jnp.float32)
                    dst = pl.multiple_of(t * CHUNK, CHUNK)
                    out_ref[h, :, pl.ds(dst, CHUNK)] = jnp.where(
                        in_cell, vals, pad_rows)
                    return 0

                jax.lax.fori_loop(0, n, body, 0, unroll=False)

    return _gather_kernel


@partial(jax.jit, static_argnames=("K", "chans", "CHUNK", "_force_hpp"))
def pallas_slab_gather(soa8t, starts, cnts, qs, centers, period, r2, K: int,
                       chans: tuple = ("mass", "mvx", "mvy", "mvz", "meta",
                                       "ilo", "ihi"), CHUNK: int = CHUNK,
                       _force_hpp: int | None = None):
    """(B,C) merged slab runs -> (B, 1+len(chans), K) slotted channels:
    row 0 is d2 (+inf on empty/out-of-ball slots), rows 1.. follow chans.
    ``CHUNK`` must match the payload's pack_soa8t chunk. ``_force_hpp``
    bypasses the window-budget halving (the w_max probe only)."""
    B, C = starts.shape
    NC = (K + CHUNK) // CHUNK
    Kp = NC * CHUNK
    nch = 1 + len(chans)
    if _force_hpp is not None:
        hpp = _force_hpp
    else:
        wmax = w_max()
        # halve the per-program halo count until the VMEM output window
        # fits the device's proven bound — wide channels and giant K then
        # trade program-switch overhead for staying on the slab path
        hpp = HPP
        while hpp > 1 and hpp * nch * Kp * 4 > wmax:
            hpp //= 2
        if nch * Kp * 4 > wmax:
            # even one halo per program overflows the proven VMEM window —
            # reachable only via SO_TPU_KSLAB/SO_TPU_CHUNK overrides or a
            # caller bypassing solver.k_slab_max. Fail loudly here instead
            # of compile-OOMing the device (which wedges the remote
            # tunnel).
            raise ValueError(
                f"slab output window {nch}x{Kp}x4B = {nch * Kp * 4} B "
                f"exceeds the proven VMEM bound w_max()={wmax} B even at "
                f"one halo per program; route this tier to the XLA "
                f"fallback (solver.k_slab_max) or lower K")
    a0, lo, hi, n_total = chunk_descriptors(starts, cnts, qs, K, CHUNK)
    cp = jnp.concatenate([
        centers.astype(jnp.float32), r2[:, None].astype(jnp.float32),
        jnp.broadcast_to(period[None, :].astype(jnp.float32), (B, 3)),
        n_total[:, None].astype(jnp.float32)], axis=1)    # (B, 8)
    # pad the batch to a multiple of hpp (pad halos have n_chunks = 0)
    Bp = -(-B // hpp) * hpp
    if Bp != B:
        padn = Bp - B
        a0 = jnp.concatenate([a0, jnp.zeros((padn, NC), a0.dtype)])
        lo = jnp.concatenate([lo, jnp.zeros((padn, NC), lo.dtype)])
        hi = jnp.concatenate([hi, jnp.zeros((padn, NC), hi.dtype)])
        cp = jnp.concatenate([cp, jnp.ones((padn, 8), cp.dtype)
                              .at[:, 7].set(0.0)])
    out = pl.pallas_call(
        _make_kernel(chans, CHUNK, hpp),
        interpret=jax.default_backend() == "cpu",   # CI runs on CPU
        grid=(Bp // hpp,),
        in_specs=[
            pl.BlockSpec((1, hpp, NC), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hpp, NC), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hpp, NC), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hpp, 8), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),          # SoA stays in HBM
        ],
        out_specs=pl.BlockSpec((hpp, nch, Kp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, nch, Kp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 if jax.default_backend() == "cpu" else NBUF,
                        8, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2 if jax.default_backend() == "cpu"
                                     else NBUF,)),
        ],
    )(a0.reshape(Bp // hpp, hpp, NC), lo.reshape(Bp // hpp, hpp, NC),
      hi.reshape(Bp // hpp, hpp, NC), cp.reshape(Bp // hpp, hpp, 8), soa8t)
    return out[:B, :, :K]


def decode_idx(ilo, ihi):
    return (ilo.astype(jnp.int32) + (ihi.astype(jnp.int32) << 12))
