"""Multi-host wiring: jax.distributed init + per-host snapshot segments.

The reference is a single process (SURVEY.md section 2.2); scaling out a
1024^3 snapshot means each host must read only its own slice of the file
and own only its shard of the particle population. The pieces:

  1. init_distributed() — jax.distributed.initialize from env/args; after
     this, jax.devices() spans all hosts and a Mesh built from it makes
     shard_map collectives ride ICI/DCN automatically.
  2. host_segment(n, ...) — the [start, count) slice of the global
     particle file this host should read (io.tipsy.read_tipsy_segment
     seeks straight to it — no host ever touches the rest of the file).
  3. The (halo x part) stages in parallel.mesh are already SPMD over a
     Mesh; with a multi-host mesh they run unchanged.

This module is exercised in single-process form by the test suite; the
multi-process path follows jax.distributed's documented contract and is
validated on the 8-virtual-device host-platform mesh (tests/conftest.py).
"""

from __future__ import annotations

import os


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-host run.

    Arguments default to the standard JAX environment variables
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or the
    cluster auto-detectors jax.distributed supports natively. Returns True
    if distributed mode was initialized, False for single-process runs
    (no coordinator configured) — callers can treat both uniformly.
    """
    import jax

    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if coordinator_address is None and num_processes is None \
            and "JAX_NUM_PROCESSES" not in os.environ:
        return False          # single-process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True


def host_segment(n: int, num_hosts: int | None = None,
                 host_id: int | None = None) -> tuple[int, int]:
    """The [start, count) slice of an n-particle snapshot owned by this
    host: contiguous, balanced (sizes differ by at most 1), covering.
    Defaults to jax.process_index()/process_count()."""
    import jax

    if num_hosts is None:
        num_hosts = jax.process_count()
    if host_id is None:
        host_id = jax.process_index()
    if not 0 <= host_id < num_hosts:
        raise ValueError(f"host_id {host_id} outside [0, {num_hosts})")
    base, rem = divmod(n, num_hosts)
    start = host_id * base + min(host_id, rem)
    count = base + (1 if host_id < rem else 0)
    return start, count
