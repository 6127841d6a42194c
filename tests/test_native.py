"""Native (C) vs pure-numpy conflict pass equivalence + native writers."""

import os
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from so_tpu.engine.conflicts import resolve_conflicts  # noqa: E402
from so_tpu.native import get_lib, write_int_array_native  # noqa: E402


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no C compiler available")


def _random_case(rng, n_groups=40, n_particles=4000):
    """Random overlapping groups exercising subsume/slurp/retain paths."""
    index = np.arange(1, n_groups + 1, dtype=np.int32)
    pos = rng.uniform(-0.5, 0.5, (n_groups, 3)).astype(np.float32)
    # cluster some centers to force conflicts
    pos[n_groups // 2:] = pos[: n_groups - n_groups // 2] \
        + rng.normal(size=(n_groups - n_groups // 2, 3)).astype(np.float32) * 0.02
    code = np.where(rng.uniform(size=n_groups) < 0.15, -1, 0).astype(np.int32)
    mvir = rng.uniform(0.01, 0.5, n_groups).astype(np.float32)
    rvir = rng.uniform(0.01, 0.12, n_groups).astype(np.float32)
    mvir[code != 0] = -1.0
    rvir[code != 0] = -1.0
    order = rng.permutation(n_groups).astype(np.int64)
    members = []
    for g in range(n_groups):
        if code[g] != 0:
            members.append(None)
            continue
        k = int(rng.integers(1, 120))
        members.append(rng.choice(n_particles, size=k, replace=False)
                       .astype(np.int64))
    return index, pos, mvir, rvir, code, order, members, n_particles


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_native_matches_python(seed):
    rng = np.random.default_rng(seed)
    args = _random_case(rng)
    a = resolve_conflicts(*args, use_native=True)
    b = resolve_conflicts(*args, use_native=False)
    np.testing.assert_array_equal(a.igrp, b.igrp)
    np.testing.assert_array_equal(a.n_subsumed, b.n_subsumed)
    np.testing.assert_array_equal(a.n_ignored, b.n_ignored)
    np.testing.assert_array_equal(a.mvir, b.mvir)
    np.testing.assert_array_equal(a.rvir, b.rvir)
    np.testing.assert_array_equal(a.slurped_own, b.slurped_own)
    assert a.groups_removed == b.groups_removed
    assert a.groups_slurped == b.groups_slurped


def test_native_int_array_writer(tmp_path):
    vals = np.array([0, 3, -1, 2 ** 31 - 1, -2 ** 31], np.int32)
    p = str(tmp_path / "arr.txt")
    assert write_int_array_native(p, vals)
    assert open(p).read() == "5\n0\n3\n-1\n2147483647\n-2147483648\n"
