"""Run golden scenarios end-to-end on the REAL device (Pallas path).

The pytest golden suite pins the CPU backend (tests/conftest.py); this
script runs the same scenario → CLI → compare loop on whatever device JAX
has (the TPU under the remote tunnel), exercising the production slab
kernel + fused escalation. Usage:

    python scripts/run_goldens_tpu.py [scenario ...]     (default: a fast
    subset covering the slab path, conflicts, and the -3 brute-force tier)
"""

from __future__ import annotations

import os
import sys
import tempfile

import jax

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

if jax.default_backend() != "cpu" and not jax.config.jax_compilation_cache_dir:
    jax.config.update("jax_compilation_cache_dir", "/tmp/so_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DEFAULT = ["basic", "slurp", "errors_m3"]
EXACT_FILES = {"sogrp", "sosub", "soign"}


def main(argv):
    from scenarios import OUTPUT_FILES, SCENARIOS, generate_inputs
    from util_compare import (compare_exact_file, compare_file,
                              compare_sogtp)

    from so_tpu.cli import main as cli_main

    names = argv or DEFAULT
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    failures = 0
    for name in names:
        work = tempfile.mkdtemp(prefix=f"tpu_golden_{name}_")
        args = generate_inputs(name, work)
        standard = SCENARIOS[name][2]
        rc = cli_main(["-i", f"{work}/cat.gtp", "-o", f"{work}/got",
                       "--tipsy", f"{work}/snap.bin"] + args)
        golden = os.path.join(ROOT, "tests", "goldens", name)
        if rc != 0:
            print(f"{name}: CLI rc={rc} FAIL", flush=True)
            failures += 1
            continue
        errs = []
        for ext in OUTPUT_FILES:
            gpath = os.path.join(golden, ext)
            opath = f"{work}/got.{ext}"
            if not os.path.exists(gpath):
                continue
            if not os.path.exists(opath):
                errs.append(f"missing output {opath}")
            elif ext == "sogtp":
                errs += compare_sogtp(gpath, opath, standard)
            elif ext in EXACT_FILES:
                errs += compare_exact_file(gpath, opath)
            else:
                errs += compare_file(gpath, opath)
        if errs:
            failures += 1
        print(f"{name}: " + ("PASS" if not errs else f"FAIL  ({errs[0]})"),
              flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1:])
