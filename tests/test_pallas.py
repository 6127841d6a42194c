"""Pallas slab-gather kernel: interpret-mode equivalence on CPU.

On TPU the kernel streams Morton cell slabs with async DMA; in CI it runs
under the Pallas interpreter on tiny shapes and must agree with the XLA
row-gather path bit-for-bit (same candidate sets, distances, channels)."""

import numpy as np
import pytest

from so_tpu.ops import build_grid
from so_tpu.ops.gather import ragged_ball_gather, slab_gather


@pytest.fixture(scope="module")
def small_grid():
    rng = np.random.default_rng(3)
    N = 600
    pos = rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, N).astype(np.float32)
    vel = rng.normal(size=(N, 3)).astype(np.float32)
    ptype = rng.choice([1, 2, 4], N).astype(np.int32)
    mark = rng.uniform(size=N) < 0.3
    grid = build_grid(pos, mass, vel=vel, ptype=ptype, mark=mark, m=2,
                      pallas=True)
    return grid, rng


def test_slab_matches_xla(small_grid):
    import jax.numpy as jnp

    grid, rng = small_grid
    # K must hold the CHUNK-aligned per-cell footprints (cell_ranges align)
    B, K, S = 4, 8192, 5
    centers = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32))
    radii = jnp.asarray(rng.uniform(0.05, 0.3, B).astype(np.float32))
    r2 = radii * radii
    ref = ragged_ball_gather(grid, 1, centers, radii, r2, 2048, S, sort=True)
    got = slab_gather(grid, 1, centers, radii, r2, K, S,
                      channels=("mass", "mv", "meta", "idx"))
    assert not np.asarray(got.overflow).any()
    np.testing.assert_array_equal(np.asarray(got.n_in), np.asarray(ref.n_in))
    # the pallas build deduplicates: the raw arrays live only in the
    # payload, served bit-exactly by the accessors
    assert grid.mass is None and grid.vel is None
    mass_np = np.asarray(grid.mass_a())
    mv_np = np.asarray(grid.vel_a()) * mass_np[:, None]
    meta_np = (np.asarray(grid.ptype_a())
               | (np.asarray(grid.mark_a()).astype(np.int32) << 4))
    for b in range(B):
        n = int(ref.n_in[b])
        # 1-ulp FMA/fusion differences between the two lowerings are allowed
        np.testing.assert_allclose(np.asarray(got.d2[b, :n]),
                                   np.asarray(ref.d2[b, :n]), rtol=1e-6)
        gi = np.asarray(got.channels[3][b, :n])
        ri = np.asarray(ref.idx[b, :n])
        np.testing.assert_array_equal(np.sort(gi), np.sort(ri))
        np.testing.assert_array_equal(np.asarray(got.channels[0][b, :n]),
                                      mass_np[gi])
        np.testing.assert_allclose(np.asarray(got.channels[1][b, :n]),
                                   mv_np[gi], rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(got.channels[2][b, :n]).astype(np.int32), meta_np[gi])


def test_slab_overflow_flag(small_grid):
    import jax.numpy as jnp

    grid, _ = small_grid
    centers = jnp.zeros((1, 3), jnp.float32)
    big = jnp.asarray([0.45], jnp.float32)
    got = slab_gather(grid, 1, centers, big, big * big, 256, 5,
                      channels=("mass",))
    assert bool(got.overflow[0])


def test_slab_recenter_matches_xla():
    """-pot recentring via the slab kernel (phi in the mass row, unsorted
    argmin) == the XLA ragged-gather recenter stage."""
    import jax.numpy as jnp

    from so_tpu.engine.recenter import recenter_most_bound

    rng = np.random.default_rng(11)
    N = 900
    pos = rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32)
    pos[:300] = pos[:300] * 0.08 + np.array([0.1, 0.1, 0.1], np.float32)
    mass = rng.uniform(0.5, 1.5, N).astype(np.float32)
    phi = rng.uniform(-3.0, -0.1, N).astype(np.float32)  # distinct: no ties
    g_slab = build_grid(pos, mass, phi=phi, m=2, pallas=True)
    g_xla = build_grid(pos, mass, phi=phi, m=2, pallas=False)
    centers = np.array([[0.1, 0.1, 0.1], [0.12, 0.09, 0.1],
                        [-0.4, -0.4, -0.4],    # likely-empty ball
                        [0.3, -0.2, 0.0]], np.float32)
    rgtp = np.array([0.05, 0.04, 0.01, 0.2], np.float32)
    a = recenter_most_bound(g_xla, centers, rgtp)
    b = recenter_most_bound(g_slab, centers, rgtp)
    np.testing.assert_array_equal(a, b)


def test_dedup_payload_roundtrip_bit_exact():
    """The payload is a lossless encoding: every accessor on a
    deduplicated grid returns bit-identical arrays to a duplicate-layout
    build of the same inputs, and the giant-K fallback grid
    (solver._stage_grid) materializes the same bits."""
    from so_tpu.engine.solver import K_SLAB_MAX, _FB_ALL, _stage_grid

    rng = np.random.default_rng(21)
    N = 500
    pos = rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, N).astype(np.float32)
    vel = rng.normal(size=(N, 3)).astype(np.float32)
    ptype = rng.choice([1, 2, 4], N).astype(np.int32)
    mark = rng.uniform(size=N) < 0.3
    kw = dict(vel=vel, ptype=ptype, mark=mark, m=2)
    g_d = build_grid(pos, mass, pallas=True, **kw)
    g_x = build_grid(pos, mass, pallas=False, **kw)
    assert g_d.pos is None and g_d.soa8t is not None
    assert g_d.phi is None           # no potentials provided -> dropped
    assert g_d.n == g_x.n == N
    np.testing.assert_array_equal(np.asarray(g_d.pos_a()), np.asarray(g_x.pos))
    np.testing.assert_array_equal(np.asarray(g_d.mass_a()), np.asarray(g_x.mass))
    np.testing.assert_array_equal(np.asarray(g_d.vel_a()), np.asarray(g_x.vel))
    np.testing.assert_array_equal(np.asarray(g_d.ptype_a()), np.asarray(g_x.ptype))
    np.testing.assert_array_equal(np.asarray(g_d.mark_a()), np.asarray(g_x.mark))
    np.testing.assert_array_equal(np.asarray(g_d.phi_a()), np.asarray(g_x.phi))

    fb = _stage_grid(g_d, K_SLAB_MAX + 1)
    assert fb.soa8t is None
    np.testing.assert_array_equal(np.asarray(fb.pos), np.asarray(g_x.pos))
    np.testing.assert_array_equal(np.asarray(fb.mass), np.asarray(g_x.mass))
    np.testing.assert_array_equal(np.asarray(fb.ptype),
                                  np.asarray(g_x.ptype))
    np.testing.assert_array_equal(np.asarray(fb.mark), np.asarray(g_x.mark))
    # vcm is host-side: NO fallback stage reads vel, so the fallback grid
    # deliberately never materializes it (512^3 OOM lesson, 2026-08-20)
    assert fb.vel is None
    # each field materializes ONCE into the per-field cache; later
    # giant-K dispatches of any stage reuse the same device arrays
    cache = g_d._fb_fields
    assert set(cache) == set(_FB_ALL)
    fb2 = _stage_grid(g_d, K_SLAB_MAX + 1)
    assert fb2.pos is cache["pos"] and fb.pos is cache["pos"]
    assert fb2.mass is cache["mass"]
    # a narrower field request (the uniform-mass solve reads pos alone)
    # still reuses the shared cache entries
    fb3 = _stage_grid(g_d, K_SLAB_MAX + 1, fields=("pos",))
    assert fb3.pos is cache["pos"]

    # phi provided -> carried through dedup for the -pot paths
    g_phi = build_grid(pos, mass, phi=mass * 2, pallas=True, **kw)
    assert g_phi.phi is not None


def test_dedup_env_escape_hatch(monkeypatch):
    monkeypatch.setenv("SO_TPU_DEDUP", "0")
    rng = np.random.default_rng(22)
    pos = rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, 200).astype(np.float32)
    g = build_grid(pos, mass, m=2, pallas=True)
    assert g.soa8t is not None and g.pos is not None and g.mass is not None


def test_uniform_mass_slab_paths_match_general(tmp_path):
    """The chans=() slab-kernel configs (uniform-mass solve/classify/fused)
    must produce bit-identical results to the general (d2, mass) slab
    path — run through the Pallas interpreter, the only coverage of the
    nch=1 kernel instantiation off-hardware."""
    import dataclasses

    from so_tpu.engine.fused import members_and_derived
    from so_tpu.engine.solver import solve_rvir
    from so_tpu.io.tipsy import DARK, GAS

    rng = np.random.default_rng(31)
    n_c, n_b = 1800, 2600
    pos = np.concatenate([
        (rng.normal(size=(n_c, 3)) * 0.03).astype(np.float32),
        rng.uniform(-0.5, 0.5, (n_b, 3)).astype(np.float32)])
    n = pos.shape[0]
    mass = np.full(n, np.float32(1.0 / n))
    vel = (rng.normal(size=(n, 3)) * 0.01).astype(np.float32)
    ptype = np.where(np.arange(n) % 3 == 0, GAS, DARK).astype(np.int32)
    g_u = build_grid(pos, mass, vel=vel, ptype=ptype, m=2, pallas=True)
    assert g_u.uniform_mass is not None and g_u.soa8t is not None
    g_g = dataclasses.replace(g_u, uniform_mass=None)

    centers = np.array([[0.0, 0.0, 0.0], [0.01, 0.0, 0.01],
                        [0.3, 0.3, 0.3]], np.float32)
    rgtp = np.array([0.05, 0.04, 0.02], np.float32)
    for survey in (False, True):
        want = solve_rvir(g_g, centers, rgtp, 178.0, survey=survey)
        got = solve_rvir(g_u, centers, rgtp, 178.0, survey=survey)
        np.testing.assert_array_equal(got.code, want.code)
        np.testing.assert_array_equal(got.mvir, want.mvir)
        np.testing.assert_array_equal(got.rvir, want.rvir)
        np.testing.assert_array_equal(got.j, want.j)

    sr = solve_rvir(g_g, centers, rgtp, 178.0)
    ok = sr.code == 0
    res = {}
    for name, g in (("u", g_u), ("g", g_g)):
        res[name] = members_and_derived(
            g, centers[ok], sr.rvir[ok], sr.d2cut[ok], sr.j[ok],
            sr.mvir[ok], host_mv=(vel, mass), species=(GAS, DARK))
    for a, b in zip(res["u"][0], res["g"][0]):
        np.testing.assert_array_equal(np.sort(a), np.sort(b))
    np.testing.assert_array_equal(res["u"][1], res["g"][1])
    for sp in (GAS, DARK):
        np.testing.assert_array_equal(res["u"][2].profiles[sp],
                                      res["g"][2].profiles[sp])
    np.testing.assert_array_equal(res["u"][2].rmass, res["g"][2].rmass)


def test_hpp_window_scaling_bit_identical(small_grid, monkeypatch):
    """Wide/giant output windows halve the per-program halo count (hpp)
    instead of falling off the slab path; shrinking the proven window
    bound to force hpp=1 must not change a single output bit (only the
    program grid layout moves)."""
    import jax

    from so_tpu.ops import pallas_gather as pg

    grid, rng = small_grid
    B, K, S = 6, 4096, 5
    centers = rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32)
    radii = rng.uniform(0.05, 0.3, B).astype(np.float32)
    r2 = radii * radii

    chans = ("mass", "mv", "meta", "idx")
    base = slab_gather(grid, 1, centers, radii, r2, K, S, channels=chans)
    nch = 8  # d2 + mass + 3 mv + meta + 2 idx
    kp = -(-K // grid.chunk) * grid.chunk + grid.chunk
    # bound small enough that only hpp=1 fits this window
    monkeypatch.setattr(pg, "W_MAX", nch * kp * 4)
    jax.clear_caches()   # drop the cached trace (W_MAX is read at trace)
    try:
        forced = slab_gather(grid, 1, centers, radii, r2, K, S,
                             channels=chans)
    finally:
        monkeypatch.undo()
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(base.d2), np.asarray(forced.d2))
    np.testing.assert_array_equal(np.asarray(base.n_in),
                                  np.asarray(forced.n_in))
    for a, b in zip(base.channels, forced.channels):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
