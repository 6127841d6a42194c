"""Automated on-device parity gate (VERDICT r2 missing #4).

Runs, each in a FRESH subprocess (platform/jit state is sticky):

  1. scripts/run_goldens_tpu.py  — golden scenarios end-to-end on the real
     device (Pallas slab path + fused escalation + conflict protocol);
  2. scripts/compare_reference_scale.py — at-scale (2M/4096 default)
     output parity + wall-time comparison against the freshly compiled
     reference binary;
  3. scripts/compare_reference_zoom.py — at-scale zoom-in multi-species
     parity (hi-res gas/dark/star clumps in a heavy lo-res background,
     the BASELINE.md ladder config the dark-only boxes don't cover);
  4. scripts/compare_reference_giant.py — giant-tier parity (a
     ~1.6e6-candidate mega-clump through the K>=2^18 slab tiers, the
     K>k_slab XLA fallback and the uniform-mass whole-box terminal
     stage, with dispatch-spy asserts that those paths fired).

and appends a dated pass/fail + timing block to RESULTS_TPU.md, so every
round leaves a committed on-device parity artifact instead of run-by-hand
evidence. Exit code 0 only if every stage passed.

Usage: python scripts/parity_gate.py [--quick]
  --quick  skips the at-scale comparison (goldens only)
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def run(cmd, timeout):
    t0 = time.perf_counter()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, cwd=ROOT)
        out = (p.stdout + p.stderr)
        ok = p.returncode == 0
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or b"").decode(errors="replace")
               + (e.stderr or b"").decode(errors="replace")
               + f"\nTIMEOUT after {timeout}s")
        ok = False
    return ok, time.perf_counter() - t0, out


def main(argv):
    quick = "--quick" in argv
    stages = [("goldens_tpu",
               [sys.executable, os.path.join(HERE, "run_goldens_tpu.py")],
               3600)]
    if not quick:
        stages.append(
            ("reference_scale",
             [sys.executable, os.path.join(HERE,
                                           "compare_reference_scale.py")],
             3600))
        stages.append(
            ("reference_zoom",
             [sys.executable, os.path.join(HERE,
                                           "compare_reference_zoom.py")],
             3600))
        stages.append(
            # giant-tier certification (VERDICT r4 item 7): ~1.6e6-candidate
            # halos through the K>=2^18 slab tiers, the K>k_slab XLA
            # fallback (general masses) and the whole-box terminal stage
            # (uniform masses), with dispatch-spy asserts that those paths
            # actually fired
            ("reference_giant",
             [sys.executable, os.path.join(HERE,
                                           "compare_reference_giant.py")],
             3600))

    import jax   # device identity only; stages run in fresh processes
    device = jax.devices()[0].device_kind

    results = []
    for name, cmd, timeout in stages:
        ok, dt, out = run(cmd, timeout)
        tail = "\n".join(out.strip().splitlines()[-12:])
        results.append((name, ok, dt, tail))
        print(f"[{name}] {'PASS' if ok else 'FAIL'} in {dt:.0f}s",
              flush=True)

    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    all_ok = all(ok for _, ok, _, _ in results)
    git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True, cwd=ROOT)
    rev = git.stdout.strip() or "?"
    block = [f"\n## {stamp} — {'PASS' if all_ok else 'FAIL'} "
             f"(device: {device}, rev {rev})\n"]
    for name, ok, dt, tail in results:
        block.append(f"### {name}: {'PASS' if ok else 'FAIL'} ({dt:.0f}s)\n")
        block.append("```\n" + tail + "\n```\n")
    path = os.path.join(ROOT, "RESULTS_TPU.md")
    new = not os.path.exists(path)
    with open(path, "a") as fp:
        if new:
            fp.write("# On-device parity gate log\n\n"
                     "Appended by scripts/parity_gate.py — one dated "
                     "pass/fail + timing block per run (golden scenarios "
                     "on the real device, then at-scale output parity vs "
                     "the compiled reference).\n")
        fp.write("".join(block))
    print(f"wrote {path}: {'PASS' if all_ok else 'FAIL'}", flush=True)
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
