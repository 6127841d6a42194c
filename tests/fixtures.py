"""Synthetic tipsy snapshot / GTP fixture generation for golden tests.

Builds boxes of uniform background plus rho ~ r^-2 clumps (isothermal
spheres have analytically known SO radii: M(<r) = A r, so
rho_enc = 3A/(4 pi r^2) crosses a threshold at R = sqrt(3A/(4 pi thr)) —
the survey's verification used exactly this construction).
"""

from __future__ import annotations

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from so_tpu.io.tipsy import (DARK_DTYPE, GAS_DTYPE, STAR_DTYPE, TipsyHeader,
                             write_tipsy)


def make_clumpy_box(rng, n_background=8000, clumps=(), box=1.0, time=1.0,
                    species="dark", mass=None, vel_scale=0.05):
    """Positions/velocities/masses for a unit box with r^-2 clumps.

    clumps: list of dicts {center (3,), n, rmax, mass_total}.
    Returns dict of float32 arrays (pos, vel, mass, phi).
    """
    pos = [rng.uniform(-box / 2, box / 2, (n_background, 3))]
    npart = n_background
    for c in clumps:
        r = c["rmax"] * rng.uniform(0.0005, 1.0, c["n"])  # rho ~ r^-2
        u = rng.normal(size=(c["n"], 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        p = np.asarray(c["center"])[None, :] + r[:, None] * u
        p = (p + box / 2) % box - box / 2
        pos.append(p)
        npart += c["n"]
    pos = np.concatenate(pos).astype(np.float32)
    vel = (rng.normal(size=(npart, 3)) * vel_scale).astype(np.float32)
    if mass is None:
        mtot_clumps = sum(c.get("mass_total", 0.0) for c in clumps)
        m_bg = max(1e-8, (1.0 - mtot_clumps)) / n_background
        masses = [np.full(n_background, m_bg, np.float32)]
        for c in clumps:
            masses.append(np.full(c["n"], c["mass_total"] / c["n"], np.float32))
        mass = np.concatenate(masses).astype(np.float32)
    phi = rng.uniform(-2.0, -0.1, npart).astype(np.float32)
    return dict(pos=pos, vel=vel, mass=mass, phi=phi)


def write_snapshot(path, data, time=1.0, standard=False, split=None):
    """Write particles as a tipsy snapshot. split=(ngas, ndark, nstar) or
    all-dark by default."""
    n = data["pos"].shape[0]
    ngas, ndark, nstar = split if split is not None else (0, n, 0)
    assert ngas + ndark + nstar == n

    def fill(dt, sl, extra):
        rec = np.zeros(sl.stop - sl.start, dtype=dt)
        rec["mass"] = data["mass"][sl]
        rec["pos"] = data["pos"][sl]
        rec["vel"] = data["vel"][sl]
        rec["phi"] = data["phi"][sl]
        for k, v in extra.items():
            rec[k] = v
        return rec

    gas = fill(GAS_DTYPE[False], slice(0, ngas),
               {"temp": 1e4, "rho": 1.0, "hsmooth": 0.01, "metals": 0.01}) if ngas else None
    dark = fill(DARK_DTYPE[False], slice(ngas, ngas + ndark), {"eps": 0.01}) if ndark else None
    star = fill(STAR_DTYPE[False], slice(ngas + ndark, n),
                {"metals": 0.02, "tform": 0.5, "eps": 0.01}) if nstar else None
    hdr = TipsyHeader(time=time, nbodies=n, ndim=3, nsph=ngas, ndark=ndark,
                      nstar=nstar)
    write_tipsy(path, hdr, gas, dark, star, standard)
    return hdr


def write_gtp(path, centers, rgtp, masses, time=1.0, standard=False):
    """Write a star-only GTP catalog of candidate centers."""
    centers = np.asarray(centers, np.float32)
    n = centers.shape[0]
    rec = np.zeros(n, dtype=STAR_DTYPE[False])
    rec["mass"] = np.asarray(masses, np.float32)
    rec["pos"] = centers
    rec["eps"] = np.asarray(rgtp, np.float32)
    rec["tform"] = np.arange(1, n + 1, dtype=np.float32)
    hdr = TipsyHeader(time=time, nbodies=n, ndim=3, nsph=0, ndark=0, nstar=n)
    write_tipsy(path, hdr, None, None, rec, standard)
