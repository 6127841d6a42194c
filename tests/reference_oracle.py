"""Brute-force numpy oracle implementing the reference kdRvir semantics.

Independent of the engine's cell grid / batching: O(N) distances per halo,
sequential float32 cumulative mass (np.cumsum is a running sum, like the C
loop), the exact ball ladder, and the two-consecutive-particle rule.
Used by property tests to cross-check the batched solver on random inputs.
"""

from __future__ import annotations

import numpy as np

C3 = np.float32(4.0 / 3.0 * np.pi)


def oracle_rvir(pos, mass, center, rgtp, period, thr, n_members):
    pos = np.asarray(pos, np.float32)
    mass = np.asarray(mass, np.float32)
    center = np.asarray(center, np.float32)
    period = np.asarray(period, np.float32)
    thr = np.float32(thr)

    root = np.float32(np.sqrt(np.float64(
        period[0] * period[0] + period[1] * period[1] + period[2] * period[2])))
    cap = 0.25 * np.float64(root)

    fball = np.float32(rgtp)
    if np.float64(fball) >= cap:
        return dict(code=-3, mvir=-3.0, rvir=-3.0, j=0)

    # ladder of gather radii
    radii = []
    while np.float64(fball) < cap:
        fball = np.float32(fball * np.float32(1.2))
        radii.append(fball)

    d = center[None, :] - pos
    d = (d - period[None, :] * np.round(d / period[None, :])).astype(np.float32)
    d2 = (d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1] + d[:, 2] * d[:, 2]).astype(np.float32)

    r_last = radii[-1]
    in_last = d2 <= np.float32(r_last) * np.float32(r_last)
    order = np.argsort(d2[in_last], kind="stable")
    d2s = d2[in_last][order]
    ms = mass[in_last][order]
    n = d2s.size

    n1 = int((d2 <= np.float32(radii[0]) * np.float32(radii[0])).sum())
    if n1 < n_members:
        return dict(code=-1, mvir=-1.0, rvir=-1.0, j=0)

    cum = np.cumsum(ms, dtype=np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        rho = cum / (C3 * (d2s * np.sqrt(d2s)).astype(np.float32))
    cond = (rho[:-1] < thr) & (rho[1:] < thr)
    idx = np.nonzero(cond[n_members - 2:])[0]
    if idx.size == 0:
        return dict(code=-3, mvir=-3.0, rvir=-3.0, j=0)
    j = int(idx[0] + n_members - 2)
    if j == n_members - 2:
        return dict(code=-2, mvir=-2.0, rvir=-2.0, j=0)
    mvir = np.float32(cum[j - 1])
    rvir = np.float32(np.cbrt(mvir / (C3 * thr)))
    return dict(code=0, mvir=float(mvir), rvir=float(rvir), j=j)
