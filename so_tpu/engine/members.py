"""Interior-member extraction for the conflict pass.

The reference tags the j strictly-interior particles of each solved group in
ascending-distance order (kdTagParticles call site, kd2.c:823). The batched
solver returns only (j, d2cut); this pass re-gathers each solved halo's
interior as *sorted original particle indices*, which the host-side conflict
protocol then walks. Reuses the same gather kernel, so distances are
bit-identical to the solve.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gather import ragged_ball_gather
from ..ops.grid import CellGrid


@partial(jax.jit, static_argnames=("level", "K", "S"))
def _members_stage(grid: CellGrid, level: int, K: int, S: int,
                   centers, cover_r, d2cut):
    g = ragged_ball_gather(grid, level, centers, cover_r, d2cut, K, S, sort=True)
    orig = jnp.where(jnp.isfinite(g.d2), grid.orig_idx[g.idx], -1)
    return orig, g.n_in, g.overflow


def extract_members(grid: CellGrid, centers: np.ndarray, d2cut: np.ndarray,
                    j: np.ndarray, s_max: int = 11,
                    slot_budget: int = 1 << 23) -> list[np.ndarray]:
    """Sorted interior original-index lists, one per halo (length j[h]).

    Capacity is sized from the known interior count j; ties at the d2cut
    boundary may gather a few extra hits, which are truncated to j exactly
    as the reference's walk stops at j (kd2.c:663-670).
    """
    from .solver import _pick_level, _pad_to_bucket

    G = centers.shape[0]
    centers = np.asarray(centers, np.float32)
    d2cut = np.asarray(d2cut, np.float32)
    j = np.asarray(j, np.int64)
    out: list[np.ndarray | None] = [None] * G
    if G == 0:
        return []

    cover = np.sqrt(d2cut.astype(np.float64)).astype(np.float32)
    cover = np.nextafter(cover, np.float32(np.inf)) * np.float32(1.0 + 1e-6)

    npart = grid.n
    need_cap = np.maximum(2 ** np.ceil(np.log2(np.maximum(j + 16, 256))).astype(np.int64), 256)
    todo = np.arange(G)
    guard = 0
    while todo.size:
        guard += 1
        if guard > 64:
            raise RuntimeError("member extraction runaway")
        caps = np.unique(need_cap[todo])
        next_todo = []
        for capacity in caps:
            sel = todo[need_cap[todo] == capacity]
            K = int(min(capacity, max(256, 1 << int(np.ceil(np.log2(max(npart, 2)))))))
            level = _pick_level(grid, float(cover[sel].max()), s_max)
            chunk = max(1, int(slot_budget // K))
            for lo in range(0, sel.size, chunk):
                part = sel[lo:lo + chunk]
                B = _pad_to_bucket(part.size)
                c_pad = np.zeros((B, 3), np.float32)
                r_pad = np.zeros(B, np.float32)
                d_pad = np.zeros(B, np.float32)
                c_pad[:part.size] = centers[part]
                r_pad[:part.size] = cover[part]
                d_pad[:part.size] = d2cut[part]
                orig, n_in, ovf = _members_stage(grid, level, K, s_max,
                                                 jnp.asarray(c_pad),
                                                 jnp.asarray(r_pad),
                                                 jnp.asarray(d_pad))
                orig = np.asarray(orig)[:part.size]
                ovf = np.asarray(ovf)[:part.size]
                for i, h in enumerate(part):
                    if ovf[i]:
                        need_cap[h] = min(need_cap[h] * 4, 2 * npart)
                        next_todo.append(h)
                    else:
                        out[h] = orig[i, : j[h]].astype(np.int64)
        todo = np.asarray(next_todo, np.int64)
    return out
