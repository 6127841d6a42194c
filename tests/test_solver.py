"""Batched solver property tests vs the brute-force oracle + analytics."""

import os
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from fixtures import make_clumpy_box  # noqa: E402
from reference_oracle import oracle_rvir  # noqa: E402

from so_tpu.engine.solver import ladder_radius, rvir_ladder, solve_rvir  # noqa: E402
from so_tpu.ops import build_grid  # noqa: E402


def test_ladder_float32_semantics():
    kmax, cap = rvir_ladder(np.array([0.05, 0.5], np.float32), (1.0, 1.0, 1.0))
    # cap = 0.25*sqrt(3) ~ 0.433; 0.05*1.2^k >= cap at k=12; 0.5 -> 0 growths
    assert kmax[1] == 0
    r = np.float32(0.05)
    k = 0
    while np.float64(r) < 0.25 * np.float64(np.float32(np.sqrt(3.0))):
        r = np.float32(r * np.float32(1.2))
        k += 1
    assert kmax[0] == k
    np.testing.assert_allclose(ladder_radius(np.array([0.05], np.float32),
                                             np.array([3])),
                               [np.float32(np.float32(np.float32(0.05 * np.float32(1.2)) * np.float32(1.2)) * np.float32(1.2))])


def test_solver_matches_oracle_random():
    rng = np.random.default_rng(11)
    clumps = [
        dict(center=(0.1, 0.0, -0.1), n=1500, rmax=0.06, mass_total=0.2),
        dict(center=(-0.25, 0.3, 0.2), n=800, rmax=0.04, mass_total=0.08),
    ]
    data = make_clumpy_box(rng, n_background=5000, clumps=clumps)
    grid = build_grid(data["pos"], data["mass"], vel=data["vel"], m=3)

    centers = np.concatenate([
        np.array([[0.1, 0.0, -0.1], [-0.25, 0.3, 0.2]], np.float32),
        rng.uniform(-0.5, 0.5, (6, 3)).astype(np.float32),
    ])
    rgtp = rng.uniform(0.01, 0.06, centers.shape[0]).astype(np.float32)
    thr = 178.0

    res = solve_rvir(grid, centers, rgtp, thr, n_members=8)
    for h in range(centers.shape[0]):
        want = oracle_rvir(data["pos"], data["mass"], centers[h], rgtp[h],
                           (1.0, 1.0, 1.0), thr, 8)
        assert res.code[h] == want["code"], (h, res.code[h], want)
        if want["code"] == 0:
            assert res.mvir[h] == pytest.approx(want["mvir"], rel=2e-5)
            assert res.rvir[h] == pytest.approx(want["rvir"], rel=2e-5)
            assert abs(int(res.j[h]) - want["j"]) <= 1  # knife-edge ties


def test_isothermal_analytic_radius():
    """rho ~ r^-2 clump: M(<r) = A r, R_Delta = sqrt(3A/(4 pi thr))."""
    rng = np.random.default_rng(5)
    mtot, rmax = 0.2, 0.08
    clump = dict(center=(0.0, 0.0, 0.0), n=60000, rmax=rmax, mass_total=mtot)
    data = make_clumpy_box(rng, n_background=2000, clumps=[clump])
    grid = build_grid(data["pos"], data["mass"], m=4)
    thr = 178.0
    res = solve_rvir(grid, np.zeros((1, 3), np.float32),
                     np.asarray([0.02], np.float32), thr)
    A = mtot / rmax
    want = np.sqrt(3 * A / (4 * np.pi * thr))
    assert res.code[0] == 0
    assert res.rvir[0] == pytest.approx(want, rel=0.05)
    assert res.mvir[0] == pytest.approx(A * want, rel=0.05)


def test_error_codes():
    rng = np.random.default_rng(6)
    data = make_clumpy_box(rng, n_background=3000, clumps=[])
    grid = build_grid(data["pos"], data["mass"], m=3)
    thr = 178.0
    centers = np.zeros((3, 3), np.float32)
    # rgtp tiny -> few particles -> -1; rgtp huge (>= cap) -> -3 immediately;
    # rgtp big enough to hold >= 8 uniform-box particles whose density
    # (~1) is already below threshold (178) -> -2
    rgtp = np.asarray([1e-4, 0.9, 0.15], np.float32)
    res = solve_rvir(grid, centers, rgtp, thr)
    assert list(res.code) == [-1, -3, -2]


def test_multi_threshold_matches_independent_runs():
    """solve_rvir_multi must equal per-threshold solve_rvir exactly."""
    from so_tpu.engine.multi import solve_rvir_multi

    rng = np.random.default_rng(31)
    clumps = [
        dict(center=(0.05, 0.0, 0.0), n=2000, rmax=0.05, mass_total=0.22),
        dict(center=(-0.3, 0.2, 0.1), n=900, rmax=0.04, mass_total=0.08),
    ]
    data = make_clumpy_box(rng, n_background=4000, clumps=clumps)
    grid = build_grid(data["pos"], data["mass"], m=3)
    centers = np.array([[0.05, 0.0, 0.0], [-0.3, 0.2, 0.1],
                        [0.4, 0.4, 0.4]], np.float32)
    rgtp = np.array([0.03, 0.03, 0.02], np.float32)
    thresholds = [100.0, 178.0, 500.0]

    multi = solve_rvir_multi(grid, centers, rgtp, thresholds)
    for t, thr in enumerate(thresholds):
        single = solve_rvir(grid, centers, rgtp, thr)
        np.testing.assert_array_equal(multi.code[t], single.code, err_msg=f"thr={thr}")
        np.testing.assert_array_equal(multi.mvir[t], single.mvir)
        np.testing.assert_array_equal(multi.rvir[t], single.rvir)
        np.testing.assert_array_equal(multi.j[t], single.j)


def test_fused_round_matches_classic():
    """The fused tier1+tier2 single-dispatch round must reproduce the
    classic two-round escalation bit-for-bit: same codes, Mvir, Rvir, j,
    d2cut — including capacity-overflow halos (dense clump at a tiny
    k0_cap) and ladder-growth halos (tiny Rgtp deep inside a clump)."""
    rng = np.random.default_rng(23)
    clumps = [
        dict(center=(0.1, 0.0, 0.0), n=700, rmax=0.05, mass_total=0.3),
        dict(center=(-0.3, 0.2, 0.1), n=300, rmax=0.04, mass_total=0.05),
    ]
    data = make_clumpy_box(rng, n_background=1200, clumps=clumps)
    grid = build_grid(data["pos"], data["mass"], vel=data["vel"], m=2,
                      pallas=True)
    centers = np.array([
        [0.1, 0.0, 0.0],        # big clump: overflows a tiny k0_cap
        [-0.3, 0.2, 0.1],
        [0.1, 0.004, 0.0],      # tiny Rgtp in the clump: ladder growth
        [0.12, 0.01, 0.0],
    ], np.float32)
    rgtp = np.array([0.05, 0.04, 0.004, 0.03], np.float32)
    thr = 178.0

    classic = solve_rvir(grid, centers, rgtp, thr, k0_cap=256, fused=False)
    fused = solve_rvir(grid, centers, rgtp, thr, k0_cap=256, fused=True)
    np.testing.assert_array_equal(fused.code, classic.code)
    np.testing.assert_array_equal(fused.j, classic.j)
    np.testing.assert_array_equal(fused.mvir, classic.mvir)
    np.testing.assert_array_equal(fused.rvir, classic.rvir)
    np.testing.assert_array_equal(fused.d2cut, classic.d2cut)
    assert (classic.code == 0).sum() >= 3


def test_fused_spill_falls_back_to_classic():
    """More halos need tier 2 than the fused pass has rows (fused_b2=1):
    the spilled halos must be picked up by the classic escalation rounds
    with identical results."""
    rng = np.random.default_rng(29)
    clumps = [
        dict(center=(0.1, 0.0, 0.0), n=600, rmax=0.05, mass_total=0.25),
        dict(center=(-0.3, 0.2, 0.1), n=500, rmax=0.05, mass_total=0.2),
        dict(center=(0.3, -0.3, -0.2), n=400, rmax=0.05, mass_total=0.15),
    ]
    data = make_clumpy_box(rng, n_background=1000, clumps=clumps)
    grid = build_grid(data["pos"], data["mass"], vel=data["vel"], m=2,
                      pallas=True)
    centers = np.array([c["center"] for c in clumps], np.float32)
    rgtp = np.full(3, 0.05, np.float32)
    thr = 178.0

    classic = solve_rvir(grid, centers, rgtp, thr, k0_cap=256, fused=False)
    spilled = solve_rvir(grid, centers, rgtp, thr, k0_cap=256, fused=True,
                         fused_b2=1)
    np.testing.assert_array_equal(spilled.code, classic.code)
    np.testing.assert_array_equal(spilled.j, classic.j)
    np.testing.assert_array_equal(spilled.mvir, classic.mvir)
    np.testing.assert_array_equal(spilled.rvir, classic.rvir)
    assert (classic.code == 0).all()


def test_survey_classifier_matches_full_solve():
    """solve_rvir(survey=True) must equal the plain solve on a catalog
    mixing -1, -2, and successful halos (the classifier's -1/-2 verdicts
    come from the top-k window instead of the full sort)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_clumpy_box

    from so_tpu.engine.solver import solve_rvir
    from so_tpu.ops import build_grid

    rng = np.random.default_rng(55)
    d = make_clumpy_box(rng, n_background=6000, clumps=[
        dict(center=(0.2, 0.2, 0.2), n=2000, rmax=0.06, mass_total=0.25)])
    grid = build_grid(d["pos"], d["mass"], m=3)
    centers = np.array([
        (0.2, 0.2, 0.2),        # success
        (-0.4, -0.4, -0.4),     # tiny ball in the void -> -1
        (-0.35, 0.4, -0.4),     # big sparse ball -> -2
        (0.21, 0.19, 0.2),      # success
        (0.4, -0.4, 0.4),       # another void -2 candidate
    ], np.float32)
    rgtp = np.array([0.05, 0.004, 0.2, 0.04, 0.15], np.float32)
    for thr in (178.0, 1e-4):
        want = solve_rvir(grid, centers, rgtp, thr)
        got = solve_rvir(grid, centers, rgtp, thr, survey=True)
        np.testing.assert_array_equal(got.code, want.code)
        np.testing.assert_array_equal(got.mvir, want.mvir)
        np.testing.assert_array_equal(got.rvir, want.rvir)
        np.testing.assert_array_equal(got.j, want.j)
        np.testing.assert_array_equal(got.d2cut, want.d2cut)
    # the mix actually covers all three outcomes at the default threshold
    w = solve_rvir(grid, centers, rgtp, 178.0)
    assert set(np.unique(w.code)) >= {0, -1, -2}


def _survey_problem(seed=55):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_clumpy_box

    from so_tpu.ops import build_grid

    rng = np.random.default_rng(seed)
    d = make_clumpy_box(rng, n_background=6000, clumps=[
        dict(center=(0.2, 0.2, 0.2), n=2000, rmax=0.06, mass_total=0.25)])
    grid = build_grid(d["pos"], d["mass"], m=3)
    centers = np.array([
        (0.2, 0.2, 0.2), (-0.4, -0.4, -0.4), (-0.35, 0.4, -0.4),
        (0.21, 0.19, 0.2), (0.4, -0.4, 0.4),
    ], np.float32)
    rgtp = np.array([0.05, 0.004, 0.2, 0.04, 0.15], np.float32)
    return grid, centers, rgtp


def test_level_bucketing_matches_single_level(monkeypatch):
    """Per-halo level bucketing (solver._bucket_levels / _level_groups) is
    a pure perf optimization: results must equal the legacy single-level
    dispatch bit-for-bit (the hit set is level-independent). BUCKET_MIN is
    patched so the tiny catalog actually splits into level groups."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_clumpy_box

    from so_tpu.engine import solver
    from so_tpu.ops import build_grid

    rng = np.random.default_rng(77)
    d = make_clumpy_box(rng, n_background=6000, clumps=[
        dict(center=(0.2, 0.2, 0.2), n=2000, rmax=0.06, mass_total=0.25)])
    # the cost model's run-slack term needs the slab payload (chunk > 0);
    # on CPU the kernel runs in interpret mode
    grid = build_grid(d["pos"], d["mass"], m=3, pallas=True)
    centers = np.array([
        (0.2, 0.2, 0.2), (-0.4, -0.4, -0.4), (-0.35, 0.4, -0.4),
        (0.21, 0.19, 0.2), (0.4, -0.4, 0.4),
    ], np.float32)
    # spread of radii + a forced density correction so the trap model
    # genuinely assigns different levels (small halos escape the legacy
    # level's inflated footprint; big ones have no fitting finer level)
    rgtp = np.array([0.05, 0.004, 0.12, 0.03, 0.08], np.float32)
    want = solver.solve_rvir(grid, centers, rgtp, 178.0, survey=False)
    monkeypatch.setattr(solver, "BUCKET_MIN", 1)
    monkeypatch.setattr(solver, "_calibrate_lambda",
                        lambda *a, **k: 64.0)
    lv = solver._bucket_levels(grid, rgtp * np.float32(1.2), 7, 4096,
                               lam=64.0)
    assert np.unique(lv).size >= 2, lv   # the catalog genuinely buckets
    got = solver.solve_rvir(grid, centers, rgtp, 178.0, survey=False)
    np.testing.assert_array_equal(got.code, want.code)
    np.testing.assert_array_equal(got.mvir, want.mvir)
    np.testing.assert_array_equal(got.rvir, want.rvir)
    np.testing.assert_array_equal(got.j, want.j)
    np.testing.assert_array_equal(got.d2cut, want.d2cut)


def test_span_subgroups_partition_and_coverage():
    """_span_subgroups must (a) exactly partition the level group, (b)
    give every halo a span >= its own covering need (exactness: a span
    only prunes cells the ball cannot intersect), (c) never exceed the
    group span, and (d) collapse to one group when splitting saves no
    estimated device time."""
    from so_tpu.engine import solver

    class Proxy:
        m = 6
        period = np.ones(3, np.float32)

        def ncell(self, g):
            return 1 << (6 - g)

    grid = Proxy()
    rng = np.random.default_rng(3)
    # mixed radii at level 2 (16 cells/axis, cs = 1/16): needs 2..7
    radii = np.concatenate([
        rng.uniform(0.001, 0.01, 6000),     # need 2
        rng.uniform(0.04, 0.08, 3000),      # need 3-4
        rng.uniform(0.15, 0.17, 500),       # need 7 (group max)
    ]).astype(np.float64)
    b = np.arange(radii.size)
    S_g = solver._span_at(grid, 2, float(radii.max()), 7)
    assert S_g == 7
    groups = solver._span_subgroups(grid, 2, S_g, radii, b, 7)
    allpos = np.concatenate([p for _, _, p in groups])
    assert np.array_equal(np.sort(allpos), b)          # exact partition
    cs = 1.0 / 16
    for g, S, pos in groups:
        assert g == 2 and S <= S_g
        need = np.minimum((2.0 * radii[pos] / cs).astype(np.int64) + 2, 7)
        assert (need <= S).all(), (S, need.max())
    assert len(groups) >= 2                            # genuinely split
    # uniform-radius group: no split regardless of size
    one = solver._span_subgroups(grid, 2, 3,
                                 np.full(10000, 0.01), b[:10000], 7)
    assert len(one) == 1 and one[0][1] == 3
    # tiny group: the estimated saving cannot pay for a dispatch
    tiny = solver._span_subgroups(grid, 2, S_g, radii[:64], b[:64], 7)
    assert len(tiny) == 1 and tiny[0][1] == S_g


def test_span_split_solve_bit_identical(monkeypatch):
    """Span sub-bucketing is a pure perf optimization: forcing every
    sub-bucket to split (zero min-save) must keep solve_rvir outputs
    bit-identical to the unsplit dispatch (SO_TPU_SPAN_SPLIT=0)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_clumpy_box

    from so_tpu.engine import solver
    from so_tpu.ops import build_grid

    rng = np.random.default_rng(99)
    d = make_clumpy_box(rng, n_background=8000, clumps=[
        dict(center=(0.2, 0.2, 0.2), n=2000, rmax=0.06, mass_total=0.25),
        dict(center=(-0.3, -0.3, 0.1), n=1500, rmax=0.03, mass_total=0.1)])
    grid = build_grid(d["pos"], d["mass"], m=4, pallas=True)
    rng2 = np.random.default_rng(5)
    centers = rng2.uniform(-0.5, 0.5, (96, 3)).astype(np.float32)
    rgtp = rng2.choice([0.003, 0.05, 0.15, 0.3], 96).astype(np.float32)
    monkeypatch.setenv("SO_TPU_SPAN_SPLIT", "0")
    want = solver.solve_rvir(grid, centers, rgtp, 200.0, survey=False)
    monkeypatch.delenv("SO_TPU_SPAN_SPLIT")
    monkeypatch.setattr(solver, "BUCKET_MIN", 1)
    monkeypatch.setattr(solver, "_SPAN_MIN_SAVE_S", 0.0)
    # the tiny catalog must genuinely split somewhere: check directly
    groups = solver._level_groups(grid, rgtp * np.float32(1.2), 7, 4096,
                                  lam=1.0)
    assert len({(g, S) for g, S, _ in groups}) >= 2, groups
    got = solver.solve_rvir(grid, centers, rgtp, 200.0, survey=False)
    np.testing.assert_array_equal(got.code, want.code)
    np.testing.assert_array_equal(got.mvir, want.mvir)
    np.testing.assert_array_equal(got.rvir, want.rvir)
    np.testing.assert_array_equal(got.j, want.j)
    np.testing.assert_array_equal(got.d2cut, want.d2cut)
    np.testing.assert_array_equal(got.vcm, want.vcm)


def test_bucket_levels_dense_box_model():
    """The level cost model on a synthetic dense-box proxy (34M particles,
    m=6, chunk=128 — the 1e6-halo box of docs/RESULTS.md): with the
    measured-density correction, small halos must escape the legacy
    level's trapped footprint to a finer level while staying put when the
    model says the legacy level fits (lam=1)."""
    from so_tpu.engine.solver import _bucket_levels

    class Proxy:
        m = 7                     # choose_m(34e6)
        n = 34_000_000
        n_occ = n
        chunk = 128
        soa8t = object()          # only `is not None` is consulted
        period = np.ones(3, np.float32)

        def ncell(self, g):
            return 1 << (7 - g)

    radii = np.full(4096, 0.006, np.float64)
    # uncorrected mean-occupancy model underestimates near clumps: no trap
    lv1 = _bucket_levels(Proxy(), radii, 7, 4096, lam=1.0)
    # with the measured ~6x local-density correction the legacy level's
    # footprint overflows K and the batch moves to a finer level
    lv6 = _bucket_levels(Proxy(), radii, 7, 4096, lam=6.0)
    assert (lv6 < lv1).all(), (np.unique(lv1), np.unique(lv6))


def test_survey_auto_gate_matches_forced(monkeypatch):
    """survey=None (auto) samples a first chunk and must produce the same
    results whether the gate opens (survey-heavy catalog) or stays closed
    (well-posed catalog). Constants are patched so the tiny catalog
    exercises the gate."""
    from so_tpu.engine import solver

    grid, centers, rgtp = _survey_problem()
    monkeypatch.setattr(solver, "SURVEY_MIN_G", 4)
    monkeypatch.setattr(solver, "SURVEY_SAMPLE", 2)
    want = solver.solve_rvir(grid, centers, rgtp, 178.0, survey=False)
    # sample = first 2 halos: one success + one -1 -> 50% >= FRAC: opens
    got_open = solver.solve_rvir(grid, centers, rgtp, 178.0, survey=None)
    # FRAC > 1 forces the gate closed after the sample
    monkeypatch.setattr(solver, "SURVEY_FRAC", 2.0)
    got_closed = solver.solve_rvir(grid, centers, rgtp, 178.0, survey=None)
    for got in (got_open, got_closed):
        np.testing.assert_array_equal(got.code, want.code)
        np.testing.assert_array_equal(got.mvir, want.mvir)
        np.testing.assert_array_equal(got.rvir, want.rvir)
        np.testing.assert_array_equal(got.j, want.j)


def test_survey_multi_threshold_matches_full(monkeypatch):
    """solve_rvir_multi with the survey classifier (forced and auto) must
    equal the plain multi solve per threshold."""
    from so_tpu.engine import solver
    from so_tpu.engine.multi import solve_rvir_multi

    grid, centers, rgtp = _survey_problem()
    thresholds = [178.0, 1e-4, 500.0]
    want = solve_rvir_multi(grid, centers, rgtp, thresholds, survey=False)
    got = solve_rvir_multi(grid, centers, rgtp, thresholds, survey=True)
    monkeypatch.setattr(solver, "SURVEY_MIN_G", 4)
    monkeypatch.setattr(solver, "SURVEY_SAMPLE", 2)
    got_auto = solve_rvir_multi(grid, centers, rgtp, thresholds, survey=None)
    for g in (got, got_auto):
        np.testing.assert_array_equal(g.code, want.code)
        np.testing.assert_array_equal(g.mvir, want.mvir)
        np.testing.assert_array_equal(g.rvir, want.rvir)
        np.testing.assert_array_equal(g.j, want.j)
        np.testing.assert_array_equal(g.d2cut, want.d2cut)


def test_mass_ladder_matches_serial_and_seqsum():
    """np.cumsum (ufunc.accumulate, serial by definition) must equal both
    an explicit f32 accumulator loop and ops.seqsum.seq_cumsum bit-for-bit
    — the uniform-mass solve path substitutes the ladder for the per-slot
    serial sum and the exactness contract rides on this."""
    import jax.numpy as jnp

    from so_tpu.engine.solver import _mass_ladder
    from so_tpu.ops.seqsum import seq_cumsum

    for m, K in ((3.3386752e-06, 1024), (1.0 / 2097152.0, 4096),
                 (0.0173, 257)):
        lad = _mass_ladder(float(np.float32(m)), K)
        acc = np.float32(0.0)
        explicit = np.empty(K, np.float32)
        for i in range(K):
            acc = np.float32(acc + np.float32(m))
            explicit[i] = acc
        np.testing.assert_array_equal(lad, explicit)
        scanned = np.asarray(seq_cumsum(
            jnp.full((1, K), jnp.float32(m)), axis=1))[0]
        np.testing.assert_array_equal(lad, scanned)


def test_uniform_mass_solve_matches_general_path():
    """A bit-identical-mass box must solve identically through the
    uniform-mass shortcut (1-op sort + cum ladder) and the general
    (d2, mass) path — classic, fused, survey, and multi-threshold."""
    import dataclasses

    from so_tpu.engine import solver
    from so_tpu.engine.multi import solve_rvir_multi

    rng = np.random.default_rng(77)
    clumps = [
        dict(center=(0.1, 0.1, 0.1), n=2500, rmax=0.07, mass_total=0.2),
        dict(center=(-0.3, 0.2, -0.2), n=1200, rmax=0.05, mass_total=0.1),
        dict(center=(0.35, -0.35, 0.3), n=700, rmax=0.04, mass_total=0.05),
    ]
    d = make_clumpy_box(rng, n_background=6000, clumps=clumps)
    n = d["pos"].shape[0]
    mass = np.full(n, np.float32(1.0 / n))          # bit-identical masses
    grid_u = build_grid(d["pos"], mass)
    assert grid_u.uniform_mass == float(np.float32(1.0 / n))
    grid_g = dataclasses.replace(grid_u, uniform_mass=None)

    centers = np.array([c["center"] for c in clumps]
                       + [(-0.45, -0.45, -0.45)], np.float32)
    rgtp = np.array([0.05, 0.04, 0.03, 0.01], np.float32)

    for survey in (False, True):
        want = solve_rvir(grid_g, centers, rgtp, 178.0, survey=survey)
        got = solve_rvir(grid_u, centers, rgtp, 178.0, survey=survey)
        np.testing.assert_array_equal(got.code, want.code)
        np.testing.assert_array_equal(got.mvir, want.mvir)
        np.testing.assert_array_equal(got.rvir, want.rvir)
        np.testing.assert_array_equal(got.j, want.j)
        np.testing.assert_array_equal(got.d2cut, want.d2cut)

    want_m = solve_rvir_multi(grid_g, centers, rgtp, [178.0, 500.0])
    got_m = solve_rvir_multi(grid_u, centers, rgtp, [178.0, 500.0])
    np.testing.assert_array_equal(got_m.code, want_m.code)
    np.testing.assert_array_equal(got_m.mvir, want_m.mvir)
    np.testing.assert_array_equal(got_m.rvir, want_m.rvir)


def test_uniform_mass_fused_derived_matches_general_path():
    """Fused members+derived on a uniform-mass grid (ladder cumulative
    masses, int-count species profiles, mass channel dropped from the
    sort) must bit-match the general (d2, mass) path."""
    import dataclasses

    from so_tpu.engine.fused import members_and_derived
    from so_tpu.io.tipsy import DARK, GAS, STAR

    rng = np.random.default_rng(78)
    clumps = [
        dict(center=(0.1, 0.1, 0.1), n=2500, rmax=0.07, mass_total=0.2),
        dict(center=(-0.3, 0.2, -0.2), n=1200, rmax=0.05, mass_total=0.1),
    ]
    d = make_clumpy_box(rng, n_background=6000, clumps=clumps)
    n = d["pos"].shape[0]
    mass = np.full(n, np.float32(1.0 / n))
    vel = rng.normal(size=(n, 3)).astype(np.float32) * 0.01
    ptype = np.zeros(n, np.int32)
    ptype[: n // 5] = GAS
    ptype[-n // 7:] = STAR
    ptype[n // 5: -n // 7] = DARK
    grid_u = build_grid(d["pos"], mass, vel=vel, ptype=ptype)
    assert grid_u.uniform_mass is not None
    grid_g = dataclasses.replace(grid_u, uniform_mass=None)

    centers = np.array([c["center"] for c in clumps], np.float32)
    rgtp = np.array([0.05, 0.04], np.float32)
    sr = solve_rvir(grid_g, centers, rgtp, 178.0)
    ok = sr.code == 0
    assert ok.all()

    species = (GAS, DARK, STAR)
    res = {}
    for name, g in (("uniform", grid_u), ("general", grid_g)):
        members, vcm, der = members_and_derived(
            g, centers, sr.rvir, sr.d2cut, sr.j, sr.mvir,
            host_mv=(vel, mass), species=species)
        res[name] = (members, vcm, der)
    mu, vu, du = res["uniform"]
    mg, vg, dg = res["general"]
    for a, b in zip(mu, mg):
        np.testing.assert_array_equal(np.sort(a), np.sort(b))
    np.testing.assert_array_equal(vu, vg)
    np.testing.assert_array_equal(du.vcirc, dg.vcirc)
    np.testing.assert_array_equal(du.rmass, dg.rmass)
    np.testing.assert_array_equal(du.rmax, dg.rmax)
    np.testing.assert_array_equal(du.vmax, dg.vmax)
    for sp in species:
        np.testing.assert_array_equal(du.profiles[sp], dg.profiles[sp])


def test_uniform_cum_giant_fallback_matches_ladder(monkeypatch):
    """The K > _LADDER_KMAX fallback (in-program constant mass row,
    seq-scanned) must produce the same bits as the ladder broadcast."""
    import jax.numpy as jnp

    from so_tpu.engine import solver

    m, K, B = 3.3386752e-06, 512, 5
    n_in = jnp.asarray(np.array([0, 1, 37, 256, 512], np.int32))
    live = jnp.arange(K, dtype=jnp.int32)[None, :] < n_in[:, None]
    want, lad = solver._uniform_cum(m, K, n_in, live)
    assert lad is not None
    monkeypatch.setattr(solver, "_LADDER_KMAX", 64)
    got, lad2 = solver._uniform_cum(m, K, n_in, live)
    assert lad2 is None
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_channel_aware_slab_ceiling():
    """k_slab_max is CHANNEL-AWARE: pallas_slab_gather scales halos per
    program down to hpp=1, so the ceiling is the largest power-of-two K
    whose ONE-halo window nch*(K+CHUNK)*4 B fits the device's proven
    bound w_max(). On v5e that is nch=1 -> 2^20, nch=2 -> 2^19,
    nch=3/4 -> 2^18, nch 5-8 -> 2^17; it never scales above 2^20. On a
    smaller probed budget every ceiling scales down with it. _stage_grid
    keeps the payload up to the caller's ceiling and strips it above;
    the batch heuristics classify slab/fallback tiers by the same
    ceiling."""
    import pytest

    from so_tpu.engine import solver
    from so_tpu.ops import build_grid, pallas_gather

    # CPU backend (conftest): w_max() resolves to the conservative
    # default = the v5e-proven window
    assert pallas_gather.w_max() == pallas_gather.W_MAX_DEFAULT
    CHUNK = pallas_gather.CHUNK
    expect = {1: 1 << 20, 2: 1 << 19, 3: 1 << 18, 4: 1 << 18,
              5: 1 << 17, 6: 1 << 17, 7: 1 << 17, 8: 1 << 17}
    for nch, want in expect.items():
        assert solver.k_slab_max(nch) == want, nch
        # the one-halo window fits the proven byte bound...
        assert nch * (want + CHUNK) * 4 <= pallas_gather.w_max()
        # ...and doubling K would not (unless already at the 2^20 cap)
        if want < 1 << 20:
            assert nch * (2 * want + CHUNK) * 4 > pallas_gather.w_max()
    with pytest.raises(AssertionError):
        solver.k_slab_max(9)
    assert solver.K_SLAB_MAX == 1 << 15      # legacy default untouched

    # the halving math: at every (nch, K = k_slab_max(nch)) the kernel
    # finds an hpp >= 1 whose output window fits the proven bound
    for nch, K in expect.items():
        Kp = ((K + CHUNK) // CHUNK) * CHUNK
        hpp = pallas_gather.HPP
        while hpp > 1 and hpp * nch * Kp * 4 > pallas_gather.w_max():
            hpp //= 2
        assert hpp * nch * Kp * 4 <= pallas_gather.w_max(), (nch, K, hpp)

    # a smaller device budget scales every ceiling down; a huge budget
    # never raises any ceiling above 2^20 (no untested extrapolation)
    saved = pallas_gather.W_MAX
    try:
        pallas_gather.W_MAX = 8 * ((1 << 15) + CHUNK) * 4
        assert solver.k_slab_max(8) == 1 << 15
        assert solver.k_slab_max(1) == 1 << 18
        pallas_gather.W_MAX = 1 << 40                        # huge
        assert solver.k_slab_max(1) == 1 << 20
        assert solver.k_slab_max(8) == 1 << 20
    finally:
        pallas_gather.W_MAX = saved

    rng = np.random.default_rng(7)
    N = 400
    pos = rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32)
    g_u = build_grid(pos, np.full(N, 2e-6, np.float32), pallas=True)
    g_g = build_grid(pos, rng.uniform(1, 2, N).astype(np.float32),
                     pallas=True)
    assert g_u.uniform_mass is not None and g_g.uniform_mass is None
    # solve/classify gather d2 only on uniform-mass grids (1 row),
    # d2+mass otherwise (2 rows)
    assert solver._solve_kslab(g_u) == 1 << 20
    assert solver._solve_kslab(g_g) == 1 << 19

    # payload survives between the legacy and stage ceilings...
    K_mid = (1 << 15) + 1
    ks_u = solver._solve_kslab(g_u)
    assert solver._stage_grid(g_u, K_mid, ks_u).soa8t is not None
    assert solver._stage_grid(g_u, ks_u, ks_u).soa8t is not None
    # ...and is stripped above the stage ceiling
    assert solver._stage_grid(g_u, ks_u + 1, ks_u).soa8t is None
    # default (no ceiling arg) keeps the conservative behavior
    assert solver._stage_grid(g_u, K_mid).soa8t is None

    # batch heuristics follow the same classification
    assert solver._chunk_for(K_mid, 1 << 26) == \
        solver._chunk_for(K_mid, 1 << 26, None)
    assert solver._chunk_for(K_mid, 1 << 26, 1 << 17) > \
        solver._chunk_for(K_mid, 1 << 26, None)
    assert solver._pad_b(3, K_mid, 1 << 17) == solver._pad_b(3, 1024)
    # giant-K tiers pad to the next power of two with NO minimum (an
    # 8-halo floor multiplied a B=1/K=2^23 dispatch's temporaries x8 —
    # part of the 512^3 scale-run OOM, 2026-08-20)
    assert solver._pad_b(3, K_mid) == 4
    assert solver._pad_b(1, K_mid) == 1

    # _dispatch_chunks (the unified solve_rvir chunking) must apply the
    # same giant-K budget cut as _chunk_for: XLA-fallback tiers hold many
    # live (B, K) temporaries, and dispatching slot_budget//K halos there
    # OOM'd a 16 GB chip at 512^3 (/tmp/scale512.log 2026-08-20)
    sel = np.arange(4096)
    K_giant = 1 << 18
    giant_chunks = [p.size for _, p in
                    solver._dispatch_chunks(sel, K_giant, 1 << 26, 1 << 17)]
    assert max(giant_chunks) == solver._chunk_for(K_giant, 1 << 26, 1 << 17)
    assert max(giant_chunks) <= max(1, (1 << 23) // K_giant)
    slab_chunks = [p.size for _, p in
                   solver._dispatch_chunks(sel, 4096, 1 << 26, 1 << 17)]
    assert max(slab_chunks) == min(sel.size,
                                   solver._chunk_for(4096, 1 << 26, 1 << 17))
    assert sum(slab_chunks) == sel.size == sum(giant_chunks)
    # both honor an explicit slot budget below the class default
    assert solver._chunk_for(4096, 1 << 20, 1 << 17) == (1 << 20) // 4096
    assert solver._chunk_for(K_giant, 1 << 20, 1 << 17) == \
        max(1, (1 << 20) // K_giant)


def test_pipelined_dispatch_matches_depth1(monkeypatch):
    """The depth-2 dispatch pipeline (dispatch chunk i+1 before applying
    chunk i's host unpack) must be a pure scheduling change: with a
    slot budget small enough to force several dispatch chunks, the
    pipelined solve (default) and SO_TPU_PIPELINE=0 (depth-1, the
    configuration bench.py uses for its device-time estimate) must be
    bit-identical — plain, survey, and uniform-mass-off variants."""
    from so_tpu.engine import solver

    rng = np.random.default_rng(17)
    clumps = [dict(center=rng.uniform(-0.45, 0.45, 3), n=300,
                   rmax=0.03, mass_total=0.002) for _ in range(48)]
    d = make_clumpy_box(rng, n_background=20000, clumps=clumps)
    grid = build_grid(d["pos"], d["mass"], m=3)
    centers = np.stack([c["center"] for c in clumps]).astype(np.float32)
    rgtp = np.full(len(clumps), 0.01, np.float32)

    for survey in (False, True):
        d0 = solver.DISPATCHES
        monkeypatch.setenv("SO_TPU_PIPELINE", "0")
        want = solve_rvir(grid, centers, rgtp, 178.0, survey=survey,
                          slot_budget=1 << 15)
        n_depth1 = solver.DISPATCHES - d0
        assert n_depth1 > 2, "slot budget did not force multiple chunks"
        monkeypatch.setenv("SO_TPU_PIPELINE", "1")
        got = solve_rvir(grid, centers, rgtp, 178.0, survey=survey,
                         slot_budget=1 << 15)
        for f in ("code", "mvir", "rvir", "j", "d2cut", "kcap"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(want, f)),
                err_msg=f"survey={survey} field={f}")


def test_rvir_reference_bits_matches_compiled_c(tmp_path):
    """Rvir must carry the EXACT bits of kd2.c:816-819 — a double-RHS
    quotient rounded once to f32, then libm pow(r3, 0.3333333333) rounded
    to f32 — because every downstream boundary (Vc bins d2 < (f*Rvir)^2,
    the 2*Rvir profile gather, conflict distance tests) is a strict f32
    compare against Rvir-derived values: a heavy zoom particle within an
    ulp of a bin edge flips visible profile mass (the at-scale zoom gate
    caught the device cbrt doing exactly that — RESULTS_TPU.md
    2026-08-19 12:06). Compile the reference's statements and compare
    bit-for-bit."""
    import ctypes
    import subprocess

    from so_tpu.engine.solver import rvir_reference_bits

    src = tmp_path / "rvir_ref.c"
    src.write_text(
        "#include <math.h>\n"
        "void rvir_batch(const float* mass, float thr, float* out,"
        " long n) {\n"
        "    for (long i = 0; i < n; ++i) {\n"
        "        float r3 = mass[i] / ((4./3.)*M_PI*thr);\n"
        "        out[i] = pow(r3, 0.3333333333);\n"
        "    }\n"
        "}\n")
    so = tmp_path / "rvir_ref.so"
    subprocess.run(["gcc", "-O2", "-shared", "-fPIC", "-o", str(so),
                    str(src), "-lm"], check=True)
    lib = ctypes.CDLL(str(so))

    rng = np.random.default_rng(3)
    for thr in (178.0, 200.0, 500.0, float(np.float32(77.7))):
        mass = (10.0 ** rng.uniform(-9, 3, 200_000)).astype(np.float32)
        out = np.empty_like(mass)
        lib.rvir_batch(
            mass.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_float(thr),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_long(mass.size))
        got = rvir_reference_bits(mass, thr)
        np.testing.assert_array_equal(got.view(np.int32),
                                      out.view(np.int32))


def test_whole_box_terminal_tier_bit_equal(monkeypatch):
    """Uniform-mass giant capacity tiers route to the whole-box terminal
    stage (d2 against EVERY particle, overflow impossible, jump to the
    final ladder rung for halos whose -1 verdict is closed) — and the
    results are BIT-identical to the pure gather escalation across the
    K > k_slab boundary, by the ladder-prefix equivalence (solver module
    docstring). Covers solve_rvir and solve_rvir_multi. This is the
    terminal tier that replaces the giant-K XLA fallback whose B=8/K=2^21
    escalation OOM'd the 512^3 full-catalog run (RESULTS_TPU.md
    2026-08-20)."""
    from so_tpu.engine import multi as multi_mod
    from so_tpu.engine import solver

    rng = np.random.default_rng(93)
    d = make_clumpy_box(
        rng, n_background=4000,
        clumps=[dict(center=(0.05, -0.1, 0.2), n=4000, rmax=0.08,
                     mass_total=0.5)])
    n = d["pos"].shape[0]
    mass = np.full(n, np.float32(1.0 / n), np.float32)  # uniform ladder
    grid = build_grid(d["pos"], mass, m=3)
    assert grid.uniform_mass is not None

    G = 48
    centers = np.concatenate([
        np.asarray([0.05, -0.1, 0.2], np.float32)[None, :]
        + rng.normal(scale=0.01, size=(G - 8, 3)).astype(np.float32),
        rng.uniform(-0.5, 0.5, (8, 3)).astype(np.float32)]).astype(
            np.float32)
    rgtp = rng.uniform(0.004, 0.02, G).astype(np.float32)
    thr = 178.0

    base = solve_rvir(grid, centers, rgtp, thr, k0_cap=64, fused=False,
                      survey=False)
    assert (base.code == 0).any() and (base.code < 0).any()

    # force the slab ceiling tiny so the clump halos' capacity
    # escalation crosses the giant boundary immediately
    monkeypatch.setattr(solver, "k_slab_max", lambda nch: 256)
    hits = []
    orig = solver._whole_box_stage
    monkeypatch.setattr(
        solver, "_whole_box_stage",
        lambda *a, **k: (hits.append(1), orig(*a, **k))[1])
    got = solve_rvir(grid, centers, rgtp, thr, k0_cap=64, fused=False,
                     survey=False)
    assert hits, "no whole-box dispatch fired: boundary not crossed"
    np.testing.assert_array_equal(got.code, base.code)
    np.testing.assert_array_equal(got.mvir.view(np.int32),
                                  base.mvir.view(np.int32))
    np.testing.assert_array_equal(got.rvir.view(np.int32),
                                  base.rvir.view(np.int32))
    np.testing.assert_array_equal(got.j, base.j)
    np.testing.assert_array_equal(got.d2cut.view(np.int32),
                                  base.d2cut.view(np.int32))
    # kcap stays a sufficient re-gather capacity (each halo resolved at
    # its recorded capacity without overflow); it need not match the
    # base run's, whose full-round unification inflates the tail tiers

    # multi-threshold: the same terminal tier, same bits per threshold
    thresholds = [100.0, 178.0]
    wm = []
    orig_m = solver._whole_box_multi_stage
    monkeypatch.setattr(
        solver, "_whole_box_multi_stage",
        lambda *a, **k: (wm.append(1), orig_m(*a, **k))[1])
    mgot = multi_mod.solve_rvir_multi(grid, centers, rgtp, thresholds,
                                      k0_cap=64, survey=False)
    assert wm, "no whole-box multi dispatch fired"
    for t, thr_t in enumerate(thresholds):
        single = solve_rvir(grid, centers, rgtp, float(thr_t), k0_cap=64,
                            fused=False, survey=False)
        np.testing.assert_array_equal(mgot.code[t], single.code,
                                      err_msg=f"thr={thr_t}")
        np.testing.assert_array_equal(mgot.mvir[t].view(np.int32),
                                      single.mvir.view(np.int32),
                                      err_msg=f"thr={thr_t}")
        np.testing.assert_array_equal(mgot.rvir[t].view(np.int32),
                                      single.rvir.view(np.int32),
                                      err_msg=f"thr={thr_t}")
        np.testing.assert_array_equal(mgot.d2cut[t].view(np.int32),
                                      single.d2cut.view(np.int32),
                                      err_msg=f"thr={thr_t}")


def test_classify_counts_uniform_exact():
    """_classify_counts (the top_k-free uniform-mass -2 verdict) must be
    SOUND — it may flag -2 only where the full sorted f32 scan does —
    and on off-knife-edge data must capture (nearly) the full -2 set;
    ambiguous band cases defer (bit unset), never misclassify."""
    import jax.numpy as jnp

    from so_tpu.engine import solver

    rng = np.random.default_rng(41)
    B, K, nm = 256, 512, 8
    m = np.float32(2.5e-6)
    thr = np.float32(178.0)

    d2 = rng.uniform(1e-6, 1e-2, (B, K)).astype(np.float32)
    n_in = rng.integers(0, K, B).astype(np.int32)
    for b in range(B):
        d2[b, n_in[b]:] = np.inf
        if b % 3 == 0 and n_in[b] > 20:
            d2[b, 5:9] = d2[b, 5]          # ties at the decision slots
    # a deliberate knife edge: a candidate EXACTLY at Q_{b1} must defer
    lad = np.cumsum(np.full(nm, m, np.float32))
    q1 = np.float32((lad[nm - 2] / (np.float32(4 / 3 * np.pi) * thr))
                    ** (2.0 / 3.0))
    d2[0, :K] = np.inf
    d2[0, :20] = np.linspace(2 * q1, 3 * q1, 20, dtype=np.float32)
    d2[0, 3] = q1                           # sits exactly on the edge
    n_in[0] = 20

    out = np.asarray(solver._classify_counts(
        jnp.asarray(d2), jnp.asarray(n_in),
        jnp.zeros(B, bool), jnp.asarray([thr]), 1, nm, float(m)))
    got_m2 = (out[:, 1] & 1) > 0
    np.testing.assert_array_equal(out[:, 0] & 0x7FFFFFFF, n_in)

    # oracle: the full sorted scan's -2 verdict in numpy float32 (the
    # exact ops of scan_sorted's uniform path)
    d2s = np.sort(d2, axis=1)
    slot = np.arange(K)[None, :]
    ladK = np.cumsum(np.full(K, m, np.float32))
    cum = ladK[None, :].repeat(B, 0)
    r3 = (d2s * np.sqrt(d2s)).astype(np.float32)
    rho = (cum / (np.float32(4 / 3 * np.pi) * r3)).astype(np.float32)
    rho_next = np.concatenate(
        [rho[:, 1:], np.full((B, 1), np.inf, np.float32)], axis=1)
    pair_ok = ((rho < thr) & (rho_next < thr)
               & (slot + 1 < n_in[:, None]) & (slot >= nm - 2))
    found = pair_ok.any(axis=1)
    jstar = pair_ok.argmax(axis=1)
    want_m2 = found & (jstar == nm - 2)

    # soundness: no halo flagged -2 that the full scan would not flag
    assert not (got_m2 & ~want_m2).any()
    # the knife-edge row defers
    assert not got_m2[0]
    # effectiveness: deferral is rare on generic data
    missed = int((want_m2 & ~got_m2).sum())
    assert missed <= max(2, int(0.02 * want_m2.sum())), \
        (missed, int(want_m2.sum()))
