"""On-device validation of the slab capacity ceiling (SO_TPU_KSLAB).

K_SLAB_MAX=2^15 was sized for the 5-row fused stage's VMEM output window
(HPP x nch x (K+CHUNK) x 4 B x 2 buffering levels ~ 10.6 MB); narrower
gathers could in principle raise it (1-row uniform-mass solve: 2^17,
2-row general solve: 2^16) and move giant halos (>= 1e5 candidates,
~200-350 ms each on the XLA fallback today) onto the slab path. The
boundary is a device compile-time property, so this probe validates it
on hardware before any default changes (docs/ROADMAP.md queued item).

Builds a box with a handful of GIANT halos (>= 1e5 ball candidates each)
on a uniform background, solves them, and reports wall/dispatch counts.
Run twice to A/B (separate processes: the ceiling is read at import):

  python experiments/giant_kslab.py            # default 2^15 (XLA tail)
  SO_TPU_KSLAB=131072 python experiments/giant_kslab.py /tmp/giant_ref.npz

When a reference .npz from a previous run is given, asserts codes/Mvir/
Rvir/j are bit-identical across the two ceilings.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if jax.default_backend() != "cpu" and not jax.config.jax_compilation_cache_dir:
    jax.config.update("jax_compilation_cache_dir", "/tmp/so_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from so_tpu.engine import solver
from so_tpu.engine.solver import solve_rvir
from so_tpu.ops import build_grid


def make_giant_box(rng, n_bg=2 ** 21, n_giants=8, giant_n=200_000):
    """Uniform background + a few enormous r^-2 clumps whose solve balls
    hold >= 1e5 candidates (the giant-tier regime)."""
    chunks = [rng.uniform(-0.5, 0.5, (n_bg, 3)).astype(np.float32)]
    centers = (rng.uniform(-0.35, 0.35, (n_giants, 3))).astype(np.float32)
    rmax = 0.06
    for c in centers:
        r = rmax * rng.uniform(0.0005, 1.0, giant_n)
        u = rng.normal(size=(giant_n, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        p = c[None, :] + (r[:, None] * u).astype(np.float32)
        chunks.append(((p + 0.5) % 1.0 - 0.5).astype(np.float32))
    pos = np.concatenate(chunks)
    n = pos.shape[0]
    mass = np.full(n, 1.0 / n, np.float32)
    vel = np.zeros((n, 3), np.float32)
    rgtp = np.full(n_giants, rmax * 0.55, np.float32)
    return pos, mass, vel, centers, rgtp


def main():
    ref_npz = sys.argv[1] if len(sys.argv) > 1 else None
    rng = np.random.default_rng(777)
    pos, mass, vel, centers, rgtp = make_giant_box(rng)
    print(f"# giant_kslab: n={pos.shape[0]} giants={centers.shape[0]} "
          f"K_SLAB_MAX={solver.K_SLAB_MAX} device="
          f"{jax.devices()[0].device_kind}", flush=True)

    t0 = time.perf_counter()
    grid = build_grid(pos, mass, vel=vel)
    arr = grid.soa8t if grid.soa8t is not None else grid.mass
    np.asarray(jax.device_get(jnp.ravel(arr)[:1]))
    print(f"grid build: {time.perf_counter() - t0:.1f}s "
          f"uniform_mass={getattr(grid, 'uniform_mass', None)}", flush=True)

    t0 = time.perf_counter()
    res = solve_rvir(grid, centers, rgtp, 178.0)
    print(f"solve warmup (compiles): {time.perf_counter() - t0:.1f}s",
          flush=True)

    reps, disp = [], []
    for _ in range(3):
        d0 = solver.DISPATCHES
        t0 = time.perf_counter()
        res = solve_rvir(grid, centers, rgtp, 178.0)
        reps.append(time.perf_counter() - t0)
        disp.append(solver.DISPATCHES - d0)
    best = int(np.argmin(reps))
    print(f"solve: best {reps[best] * 1e3:.0f}ms of "
          f"{[f'{r * 1e3:.0f}' for r in reps]} dispatches={disp[best]} "
          f"codes={np.bincount(-res.code[res.code <= 0], minlength=4).tolist()} "
          f"j={res.j.tolist()}", flush=True)

    out = dict(code=res.code, mvir=res.mvir, rvir=res.rvir, j=res.j,
               d2cut=res.d2cut)
    if ref_npz and os.path.exists(ref_npz):
        ref = np.load(ref_npz)
        for k, v in out.items():
            same = np.array_equal(ref[k], v)
            print(f"A/B {k}: {'IDENTICAL' if same else 'MISMATCH'}",
                  flush=True)
            assert same, (k, ref[k], v)
        print("A/B: all outputs bit-identical across ceilings", flush=True)
    else:
        path = ref_npz or "/tmp/giant_ref.npz"
        np.savez(path, **out)
        print(f"saved reference outputs to {path}", flush=True)


if __name__ == "__main__":
    main()
