"""Microbench: lax.sort cost vs operand count and K on the solve shapes.

Decides the histogram-bisection question (docs/ROADMAP.md item 2) with
numbers: if the sort is key-bandwidth-bound (1-op ~= 2-op) then operand
reduction is dead; if it scales ~linearly in K then a conservative
bracket that halves the sorted width saves ~half the sort time.

Run: python experiments/sort_microbench.py   (on the TPU)
"""

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)   # real i64 keys for the
    #                                             packed-key variant
    import jax.numpy as jnp

    if (jax.default_backend() != "cpu"
            and not jax.config.jax_compilation_cache_dir):
        jax.config.update("jax_compilation_cache_dir", "/tmp/so_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    B = 16384

    def timed(fn, *args, reps=5):
        # block_until_ready is unreliable over the axon tunnel — force
        # completion with a scalar fetch (docs/ROADMAP.md environment notes)
        fetch = lambda out: np.asarray(
            (out[0] if isinstance(out, (tuple, list)) else out)[0, 0])
        fetch(fn(*args))                        # compile
        base = []
        for _ in range(reps):                   # fetch-only floor
            t0 = time.perf_counter()
            fetch(args[0])
            base.append(time.perf_counter() - t0)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts) - min(base)

    for K in (2048, 4096, 8192):
        ops = [jnp.asarray(rng.random((B, K), np.float32)) for _ in range(4)]

        for n_ops in (1, 2, 4):
            f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=1,
                                                is_stable=False))
            dt = timed(f, *ops[:n_ops])
            print(f"K={K} ops={n_ops}: {dt * 1e3:7.2f} ms")
        # the i64 packed-key variant: one operand, key<<32 | payload bits
        pk = (ops[0].view(jnp.int32).astype(jnp.int64) << 32) | \
            ops[1].view(jnp.int32).astype(jnp.int64).astype(jnp.uint32).astype(jnp.int64)
        f64 = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1,
                                             is_stable=False))
        dt = timed(f64, pk)
        print(f"K={K} i64-packed: {dt * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
