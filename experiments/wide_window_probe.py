"""On-device validation of the hpp-halved WIDE-channel slab windows.

The channel-independent k_slab_max (solver.py) routes wide/giant gather
tiers (nch 4-8, K up to 2^17) onto the Pallas slab kernel by halving the
per-program halo count until the VMEM output window fits W_MAX. Before
this probe, the only hardware-proven windows were the HPP=8 solve shapes
(8,1,131328) and (8,2,65792); the widest tiers the zoom/-all fused
stages now instantiate — (1,8,131328), (1,5,131328), (2,4,131328) —
were byte-equal under the interpreter but differently (8,128)-tiled on
Mosaic, and a 16.09 MB scoped-VMEM compile-OOM at (8,5,32896) is what
broke the 2026-08-19 zoom parity gate (RESULTS_TPU.md). This probe
compiles and RUNS each extreme window on the device and bit-checks the
sorted d2 row and every channel against the XLA ragged-gather fallback.

Reference counterpart: the wide re-gathers of kdMassProfile/kdVcirc
(kd2.c:437-496, 498-586) that the fused members+derived stage batches.

  python experiments/wide_window_probe.py                # full probe, TPU
  python experiments/wide_window_probe.py 200000 60000   # CPU smoke shape
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
from so_tpu.ops import build_grid
from so_tpu.ops.gather import ragged_ball_gather, slab_gather
from so_tpu.ops import pallas_gather


def make_box(rng, n_bg, giant_n):
    """One giant r^-2 clump (>= 1e5 ball candidates) on a uniform
    background, with mixed species and marks so the meta channel is
    non-trivial; NON-uniform masses so the mass channel is live."""
    bg = rng.uniform(-0.5, 0.5, (n_bg, 3)).astype(np.float32)
    c = np.array([0.1, -0.05, 0.2], np.float32)
    r = 0.08 * rng.uniform(0.0005, 1.0, giant_n)
    u = rng.normal(size=(giant_n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    clump = ((c[None, :] + (r[:, None] * u).astype(np.float32) + 0.5)
             % 1.0 - 0.5).astype(np.float32)
    pos = np.concatenate([bg, clump])
    n = pos.shape[0]
    mass = rng.uniform(0.5, 1.5, n).astype(np.float32) / n
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    ptype = rng.choice([1, 2, 4], n).astype(np.int32)
    mark = rng.uniform(size=n) < 0.3
    return pos, mass, vel, ptype, mark, c


# (tag, slab_gather channels, kernel rows nch, halos per program at the
#  K=2^17 window under the W_MAX halving rule)
CONFIGS = [
    ("nch8_hpp1", ("mass", "mv", "meta", "idx"), 8, 1),   # widest window
    ("nch5_hpp1", ("mass", "mv"), 5, 1),                  # zoom -all shape
    ("nch4_hpp2", ("mass", "idx"), 4, 2),
    ("nch2_hpp4", ("mass",), 2, 4),   # general-solve shape at giant K
]

# the channel-aware k_slab_max ceilings (solver.k_slab_max): per-nch
# MAXIMAL windows at hpp=1 — same byte budget as the K=2^17 configs but
# different Mosaic tilings; each must compile+run+bit-match on silicon
# before the raised ceilings can be trusted (VERDICT r4 weak #3)
MAX_CONFIGS = [
    ("nch1_K2^20", (), 1, 1 << 20),        # uniform-mass solve/classify
    ("nch2_K2^19", ("mass",), 2, 1 << 19),  # general solve/classify
    ("nch3_K2^18", ("mass", "meta"), 3, 1 << 18),
    ("nch4_K2^18", ("mass", "idx"), 4, 1 << 18),   # members shape
]


def main():
    n_bg = int(sys.argv[1]) if len(sys.argv) > 1 else 2 ** 21
    giant_n = int(sys.argv[2]) if len(sys.argv) > 2 else 170_000
    K = 1 << 17
    rng = np.random.default_rng(424242)
    pos, mass, vel, ptype, mark, c = make_box(rng, n_bg, giant_n)
    grid = build_grid(pos, mass, vel=vel, ptype=ptype, mark=mark,
                      pallas=True)
    g_xla = build_grid(pos, mass, vel=vel, ptype=ptype, mark=mark,
                       pallas=False)
    print(f"# wide_window_probe: n={pos.shape[0]} K={K} CHUNK={grid.chunk} "
          f"W_MAX={pallas_gather.w_max()} "
          f"device={jax.devices()[0].device_kind}", flush=True)

    # two giant-ball halos (so the hpp=2 config gets a full program) at
    # a radius whose CHUNK-aligned footprint approaches but fits K
    centers = jnp.asarray(np.stack([c, c + np.float32(0.003)]))
    radii = jnp.asarray(np.array([0.042, 0.0375], np.float32))
    r2 = radii * radii
    # pick the level whose CHUNK-aligned footprint is smallest (the probe
    # drives the kernel directly, so unlike the pipeline's occupancy
    # heuristic we can afford an exact footprint scan over all levels)
    from so_tpu.ops.gather import cell_ranges
    rmax = float(np.asarray(radii).max())
    level = S = None
    best_tot = None
    for g in range(grid.m + 1):
        Sg = solver._span_at(grid, g, rmax, grid.ncell(g))
        if Sg > 24:
            continue                       # cell-enum cost blow-up guard
        tot = int(np.asarray(cell_ranges(grid, g, centers, radii, r2, Sg,
                                         align=grid.chunk)[3]).max())
        print(f"  level {g}: S={Sg} footprint={tot}", flush=True)
        if best_tot is None or tot < best_tot:
            level, S, best_tot = g, Sg, tot
    assert best_tot is not None and best_tot <= K, (best_tot, K)
    print(f"level={level} S={S} footprint={best_tot}", flush=True)

    ref = ragged_ball_gather(g_xla, level, centers, radii, r2, K, S,
                             sort=True)
    n_ref = np.asarray(ref.n_in)
    print(f"xla ref: n_in={n_ref.tolist()} overflow="
          f"{np.asarray(ref.overflow).tolist()}", flush=True)
    assert not np.asarray(ref.overflow).any(), "grow the box or shrink r"
    # the window proof needs breadth (hundreds of live chunks across the
    # Kp range), not full occupancy — the clump is uniform-in-r so a ball
    # at r holds ~ giant_n * r / rmax candidates
    assert n_ref.min() >= 0.40 * giant_n, f"ball too empty: {n_ref}"

    mass_np = np.asarray(grid.mass_a())
    mv_np = np.asarray(grid.vel_a()) * mass_np[:, None]
    meta_np = (np.asarray(grid.ptype_a())
               | (np.asarray(grid.mark_a()).astype(np.int32) << 4))

    def run_config(tag, channels, nch, K_cfg, hpp_want):
        NC = (K_cfg + grid.chunk) // grid.chunk
        Kp = NC * grid.chunk
        hpp = pallas_gather.HPP
        while hpp > 1 and hpp * nch * Kp * 4 > pallas_gather.w_max():
            hpp //= 2
        assert hpp == hpp_want, (tag, hpp, hpp_want)
        t0 = time.perf_counter()
        got = slab_gather(grid, level, centers, radii, r2, K_cfg, S,
                          channels=channels)
        jax.block_until_ready(got.d2)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = slab_gather(grid, level, centers, radii, r2, K_cfg, S,
                          channels=channels)
        jax.block_until_ready(got.d2)
        t_run = time.perf_counter() - t0
        assert not np.asarray(got.overflow).any()
        np.testing.assert_array_equal(np.asarray(got.n_in), n_ref)
        idx_pos = ([i for i, ch in enumerate(channels) if ch == "idx"]
                   or [None])[0]
        for b in range(centers.shape[0]):
            n = int(n_ref[b])
            np.testing.assert_allclose(np.asarray(got.d2[b, :n]),
                                       np.asarray(ref.d2[b, :n]), rtol=1e-6)
            if idx_pos is not None:
                gi = np.asarray(got.channels[idx_pos][b, :n])
                ri = np.asarray(ref.idx[b, :n])
                np.testing.assert_array_equal(np.sort(gi), np.sort(ri))
                k = 0
                for ch in channels:
                    if ch == "mass":
                        np.testing.assert_array_equal(
                            np.asarray(got.channels[k][b, :n]), mass_np[gi])
                        k += 1
                    elif ch == "mv":
                        np.testing.assert_allclose(
                            np.asarray(got.channels[k][b, :n]), mv_np[gi],
                            rtol=1e-6)
                        k += 1
                    elif ch == "meta":
                        np.testing.assert_array_equal(
                            np.asarray(got.channels[k][b, :n]).astype(
                                np.int32), meta_np[gi])
                        k += 1
                    else:
                        k += 1
        win_mb = hpp * nch * Kp * 4 / 2 ** 20
        print(f"{tag}: K={K_cfg} window ({hpp},{nch},{Kp}) = "
              f"{win_mb:.2f} MiB  compile+run {t_compile:.1f}s  "
              f"warm {t_run * 1e3:.0f}ms  BIT-MATCH vs XLA", flush=True)

    for tag, channels, nch, hpp_want in CONFIGS:
        run_config(tag, channels, nch, K, hpp_want)
    for tag, channels, nch, K_cfg in MAX_CONFIGS:
        # every maximal window runs at hpp=1 under the v5e byte bound
        run_config(tag, channels, nch, K_cfg, 1)
    print("wide_window_probe: ALL PASS (incl. per-nch maximal windows)",
          flush=True)


if __name__ == "__main__":
    main()
