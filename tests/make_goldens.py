"""Generate golden outputs by running the compiled reference binary.

Usage:  python tests/make_goldens.py [scenario ...]

Builds the reference from /root/reference sources into a temp dir (never
into the repo), regenerates each scenario's inputs from its fixed seed,
runs the reference, and stores its outputs under tests/goldens/<name>/.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from scenarios import SCENARIOS, OUTPUT_FILES, generate_inputs  # noqa: E402

REFERENCE_SRC = os.environ.get("SO_REFERENCE", "/root/reference")


def build_reference(workdir: str) -> str:
    for f in os.listdir(REFERENCE_SRC):
        if f.endswith((".c", ".h")) or f == "Makefile":
            shutil.copy(os.path.join(REFERENCE_SRC, f), workdir)
    subprocess.run(["make"], cwd=workdir, check=True, capture_output=True)
    return os.path.join(workdir, "so")


def main(argv):
    names = argv or list(SCENARIOS)
    with tempfile.TemporaryDirectory() as build:
        so_bin = build_reference(build)
        for name in names:
            workdir = tempfile.mkdtemp(prefix=f"golden_{name}_")
            args = generate_inputs(name, workdir)
            cmd = [so_bin, "-i", f"{workdir}/cat.gtp", "-o", f"{workdir}/ref"] + args
            with open(f"{workdir}/snap.bin", "rb") as snap:
                # cwd=workdir: the reference's -mark strcpy overflow writes
                # a stray file literally named "d" into the cwd
                r = subprocess.run(cmd, stdin=snap, capture_output=True,
                                   text=True, cwd=workdir)
            if r.returncode != 0:
                print(f"FAILED {name}: {r.stderr[-2000:]}")
                continue
            dest = os.path.join(HERE, "goldens", name)
            os.makedirs(dest, exist_ok=True)
            for ext in OUTPUT_FILES:
                src = f"{workdir}/ref.{ext}"
                if os.path.exists(src):
                    shutil.copy(src, os.path.join(dest, ext))
            with open(os.path.join(dest, "stderr.txt"), "w") as f:
                f.write(r.stderr)
            print(f"golden {name}: "
                  + " ".join(e for e in OUTPUT_FILES
                             if os.path.exists(os.path.join(dest, e))))


if __name__ == "__main__":
    main(sys.argv[1:])
