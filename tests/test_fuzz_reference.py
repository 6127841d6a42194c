"""Live-reference fuzz: random boxes -> reference binary vs so_tpu.

Complements the fixed-seed golden suite by hunting knife-edge mismatches on
fresh random configurations each seed. Skipped when the reference sources
are unavailable. Shapes are held constant across seeds so jit caches are
reused within the test session.
"""

import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from fixtures import make_clumpy_box, write_gtp, write_snapshot  # noqa: E402
from make_goldens import REFERENCE_SRC, build_reference  # noqa: E402
from util_compare import compare_exact_file, compare_file  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_SRC), reason="reference sources unavailable")


@pytest.fixture(scope="module")
def so_bin(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("refbuild"))
    return build_reference(d)


@pytest.mark.parametrize("seed", [
    101, pytest.param(202, marks=pytest.mark.slow),
    pytest.param(303, marks=pytest.mark.slow)])
def test_fuzz_random_boxes(so_bin, seed, tmp_path):
    rng = np.random.default_rng(seed)
    n_clumps = 4
    clumps = []
    for _ in range(n_clumps):
        clumps.append(dict(center=tuple(rng.uniform(-0.45, 0.45, 3)),
                           n=int(rng.integers(400, 1500)),
                           rmax=float(rng.uniform(0.02, 0.07)),
                           mass_total=float(rng.uniform(0.03, 0.15))))
    data = make_clumpy_box(rng, n_background=6000, clumps=clumps)
    work = str(tmp_path)
    write_snapshot(f"{work}/snap.bin", data, time=1.0)
    centers = [c["center"] for c in clumps] \
        + [tuple(rng.uniform(-0.45, 0.45, 3))]
    rgtp = rng.uniform(0.01, 0.05, n_clumps + 1)
    masses = rng.uniform(0.01, 0.2, n_clumps + 1)
    write_gtp(f"{work}/cat.gtp", centers, rgtp, masses, time=1.0)

    args = ["-grp", "-gtp", "-subsumed", "-ignored", "-all"]
    with open(f"{work}/snap.bin", "rb") as snap:
        r = subprocess.run([so_bin, "-i", f"{work}/cat.gtp", "-o",
                            f"{work}/ref"] + args,
                           stdin=snap, capture_output=True, text=True,
                           cwd=work)
    assert r.returncode == 0, r.stderr[-1500:]

    from so_tpu.cli import main
    assert main(["-i", f"{work}/cat.gtp", "-o", f"{work}/got",
                 "--tipsy", f"{work}/snap.bin"] + args) == 0

    errs = []
    for ext in ("sovcirc", "sodark", "sogas", "sostar"):
        if os.path.exists(f"{work}/ref.{ext}"):
            errs += compare_file(f"{work}/ref.{ext}", f"{work}/got.{ext}")
    for ext in ("sogrp", "sosub", "soign"):
        errs += compare_exact_file(f"{work}/ref.{ext}", f"{work}/got.{ext}")
    assert not errs, "\n".join(errs[:8])
