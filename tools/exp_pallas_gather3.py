"""Round 3: validate correctness of the chunked-vreg 4096-entry lookup on
real hardware (vs numpy), and confirm the timing scales linearly in K (i.e.
we are measuring device work, not dispatch artifacts)."""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SUB, LANE = 8, 128
N = 4096
C = N // (8 * LANE)


def make_fn(K):
    def kernel(tbl_ref, idx0_ref, out_ref):
        def lookup(idx):
            lo = idx & 127
            mid = (idx >> 7) & 7
            hi = idx >> 10
            acc = jnp.zeros((SUB, LANE), jnp.int32)
            for c in range(C):
                chunk = tbl_ref[c * 8:(c + 1) * 8, :]
                g = jnp.take_along_axis(chunk, lo, axis=1)
                g2 = jnp.take_along_axis(g, mid, axis=0)
                acc = jnp.where(hi == c, g2, acc)
            return acc

        def body(i, idx):
            return lookup(idx)

        out_ref[:] = jax.lax.fori_loop(0, K, body, idx0_ref[:],
                                       unroll=False)

    return jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))


def main():
    rng = np.random.default_rng(7)
    # random permutation-ish table on [0, N) so chains are chaotic
    tblv = rng.permutation(N).astype(np.int32)
    tbl = jnp.asarray(tblv.reshape(C * 8, LANE))
    idx0v = rng.integers(0, N, size=(SUB, LANE), dtype=np.int32)
    idx0 = jnp.asarray(idx0v)

    # correctness at K=17
    out = np.asarray(make_fn(17)(tbl, idx0))
    exp = idx0v.copy()
    for _ in range(17):
        exp = tblv[exp]
    print(json.dumps({"correct_K17": bool(np.array_equal(out, exp))}),
          flush=True)

    times = {}
    for K in (1024, 8192, 65536):
        fn = make_fn(K)
        jax.block_until_ready(fn(tbl, idx0))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(tbl, idx0))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
        print(json.dumps({"K": K, "total_ms": round(best * 1e3, 3),
                          "ns_per_iter": round(best / K * 1e9, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
