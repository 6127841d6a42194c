"""Mass-ordered subsume/slurp/retain conflict protocol.

Reference: kdSO processes groups in ascending input-GTP-mass order
(kd2.c:864-895, sort kd2.c:843-861) and, after each successful R_Delta
solve, walks that group's interior particles in ascending distance
(kdTagParticles, kd2.c:663-720):

  - unowned particle                        -> tag to A (kd2.c:716-718)
  - owned by B, |posA-posB| <= RvirA        -> SUBSUME B: every particle
      currently tagged B gets nSubsumed++ and iGrp=0 (kdZeroGroup,
      kd2.c:617-643); B is marked Rvir=-10*A.index, Mvir=-Mvir; the walk's
      B-particles end up tagged to A; iGroupsRemoved++ (kd2.c:683-693)
  - else |posA-posB| <= RvirB               -> SLURP A: every particle
      tagged to A so far gets nSubsumed++ and iGrp=0; A is marked
      Rvir=-10*B.index, Mvir=-Mvir; the walk breaks at the start of the
      next iteration; iGroupsSlurped++ (kd2.c:694-705, break kd2.c:670-671)
  - else                                    -> RETAIN: B keeps the particle,
      nIgnored++ (kd2.c:706-715)

The usage text claims slurped particles are re-tagged to B (so.c:167-175);
the code only zeroes them — we implement the code's behavior.

Distances here are *raw* float32 differences with no periodic wrap, exactly
as kdTagParticles computes them (kd2.c:677-680).

The walk is order-dependent only through (a) which owners get subsumed
before a slurp cuts the walk short and (b) which particles are A-tagged at
the slurp moment, so each halo's pass reduces to a handful of vectorized
numpy ops over its interior list — the per-particle loop is gone but the
sequential mass-order semantics are preserved bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class ConflictState:
    """Post-protocol per-particle and per-group ownership state."""
    igrp: np.ndarray          # (N,) i32 final group id per particle (0 = none)
    n_subsumed: np.ndarray    # (N,) i32 — .sosub counters (kd2.c:639)
    n_ignored: np.ndarray     # (N,) i32 — .soign counters (kd2.c:714)
    mvir: np.ndarray          # (G,) f32 catalog Mvir after sub/slurp negation
    rvir: np.ndarray          # (G,) f32 catalog Rvir after -10*winner marking
    slurped_own: np.ndarray   # (G,) bool — slurped during own tagging
    groups_removed: int = 0   # iGroupsRemoved (kd2.c:692)
    groups_slurped: int = 0   # iGroupsSlurped (kd2.c:702)


def resolve_conflicts(index: np.ndarray, pos: np.ndarray,
                      mvir: np.ndarray, rvir: np.ndarray, code: np.ndarray,
                      order: np.ndarray, members: list,
                      n_particles: int, use_native: bool | None = None) -> ConflictState:
    """Run the protocol over all groups in the given processing order.

    ``order`` is the ascending-GTP-mass permutation (numerics.indexx);
    ``members[h]`` is halo h's sorted interior original-index list (only
    consulted when code[h] == 0 — error groups never tag, kd2.c:772-796,
    836-839).

    ``use_native``: run the C implementation (so_tpu/native/so_native.c) —
    default tries native and falls back to this vectorized-numpy path.
    Both implement identical semantics (tests/test_native.py).
    """
    if use_native is not False:
        from ..native import conflict_pass_native
        out = conflict_pass_native(np.asarray(index, np.int32),
                                   np.asarray(pos, np.float32),
                                   np.asarray(mvir, np.float32),
                                   np.asarray(rvir, np.float32),
                                   np.asarray(code, np.int32),
                                   np.asarray(order, np.int64),
                                   members, n_particles)
        if out is not None:
            return ConflictState(**out)
        if use_native:
            raise RuntimeError("native conflict pass requested but unavailable")
    G = index.shape[0]
    igrp = np.zeros(n_particles, np.int32)
    n_sub = np.zeros(n_particles, np.int32)
    n_ign = np.zeros(n_particles, np.int32)
    mvir = np.asarray(mvir, np.float32).copy()
    rvir = np.asarray(rvir, np.float32).copy()
    pos = np.asarray(pos, np.float32)
    slurped_own = np.zeros(G, bool)
    removed = 0
    slurped = 0

    id2row = {int(i): r for r, i in enumerate(index)}

    for a in order:
        if code[a] != 0:
            continue
        ms = members[a]
        if ms is None or ms.size == 0:
            continue
        own = igrp[ms]
        a_id = np.int32(index[a])
        rvir_a = np.float32(rvir[a])

        nz = own != 0
        if not nz.any():
            igrp[ms] = a_id
            continue

        occ_pos = np.nonzero(nz)[0]
        occ_rows = np.fromiter((id2row[int(o)] for o in own[occ_pos]),
                               dtype=np.int64, count=occ_pos.size)
        d = (pos[a][None, :] - pos[occ_rows]).astype(np.float32)
        d2 = (d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1] + d[:, 2] * d[:, 2]).astype(np.float32)
        rva2 = np.float32(rvir_a * rvir_a)
        rvb = rvir[occ_rows].astype(np.float32)
        is_sub = d2 <= rva2
        is_slurp = (~is_sub) & (d2 <= (rvb * rvb).astype(np.float32))

        if is_slurp.any():
            k_s = occ_pos[np.argmax(is_slurp)]   # first slurp occurrence
            in_prefix = occ_pos < k_s
            slurper_row = occ_rows[np.argmax(is_slurp)]
        else:
            k_s = None
            in_prefix = np.ones(occ_pos.size, bool)
        prefix_end = k_s if k_s is not None else ms.size

        sub_rows = np.unique(occ_rows[is_sub & in_prefix])
        for b in sub_rows:
            assert mvir[b] >= 0.0, "kdZeroGroup: zeroed group mass already negative"
            b_id = np.int32(index[b])
            bp = np.nonzero(igrp == b_id)[0]
            n_sub[bp] += 1
            igrp[bp] = 0
            rvir[b] = np.float32(-10.0 * float(a_id))
            mvir[b] = -mvir[b]
            removed += 1

        # retained-in-adversity counters for ignore-class prefix occurrences
        ign_occ = (~is_sub) & (~is_slurp) & in_prefix
        n_ign[ms[occ_pos[ign_occ]]] += 1

        # tag to A: prefix particles that are unowned *now* (covers both the
        # originally-unowned and the just-zeroed subsumed-owner particles)
        pref = ms[:prefix_end]
        take = igrp[pref] == 0
        tagged = pref[take]
        igrp[tagged] = a_id

        if k_s is not None:
            assert mvir[a] >= 0.0
            n_sub[tagged] += 1
            igrp[tagged] = 0
            rvir[a] = np.float32(-10.0 * float(index[slurper_row]))
            mvir[a] = -mvir[a]
            slurped_own[a] = True
            slurped += 1

    return ConflictState(igrp=igrp, n_subsumed=n_sub, n_ignored=n_ign,
                         mvir=mvir, rvir=rvir, slurped_own=slurped_own,
                         groups_removed=removed, groups_slurped=slurped)
