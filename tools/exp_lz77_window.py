"""LZ77-on-device cost experiment (VERDICT r5 #7).

LZ77 decode (reference j40.h:2804-2876) needs, per copied symbol, a read
from the lane's own output history at a per-lane dynamic distance (1 MiB
ring in the reference; practical modular streams use the special
distances table whose spans are within a few image rows, j40.h:2848).

On TPU the history can live in a VMEM ring written at the (uniform) step
row — the WRITE is free — but the READ is a per-lane dynamic row fetch,
which costs a whole-(8,128)-block select chain of R/8 ops for an R-row
ring (the same machinery as ops/pallas_entropy._col_lookup).  This
experiment measures that marginal cost per step at several ring depths
against the plain symbol-loop step, giving the break-even data for the
FUTURE.md decision:

  run:  python tools/exp_lz77_window.py
  out:  one JSON line {ring_rows: ns_per_step, ...}

A dist<=1 RLE run (fjxl's dominant emission) needs NO ring — the carried
last value suffices — so the interesting regime is general distances.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from j40_tpu.ops.pallas_entropy import LANE, _col_lookup

def make_kernel(ring_rows: int, do_read: bool, steps: int):
    n_blocks = ring_rows // 8

    def kernel(dist_ref, out_ref, ring_ref):
        def body(t, acc):
            # uniform-row ring WRITE (free): the current output value
            row = t % ring_rows
            val = acc + dist_ref[0:1, :]
            if do_read:
                # per-lane dynamic ring READ at lag dist (the LZ77 copy)
                lag = (t - dist_ref[0:1, :]) % ring_rows
                got = _col_lookup(ring_ref, n_blocks, lag)
                val = val + got
            ring_ref[pl.ds(row, 1), :] = val
            return val

        acc = jax.lax.fori_loop(0, steps, body,
                                jnp.zeros((1, LANE), jnp.int32))
        out_ref[0:1, :] = acc

    return kernel


def _timed(ring_rows: int, do_read: bool, steps: int) -> float:
    dist = jnp.asarray(
        np.random.default_rng(0).integers(1, ring_rows, (1, LANE)),
        jnp.int32)
    fn = pl.pallas_call(
        make_kernel(ring_rows, do_read, steps),
        out_shape=jax.ShapeDtypeStruct((1, LANE), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ring_rows, LANE), jnp.int32)],
    )
    jfn = jax.jit(fn)
    int(np.asarray(jfn(dist))[0, 0])  # compile
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        r = jfn(dist)
        int(np.asarray(r)[0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


def run(ring_rows: int, do_read: bool) -> float:
    """Marginal ns/step via two step counts (cancels the tunnel RTT and
    dispatch floor — the same method as bench.py's pallas_entropy
    probe)."""
    s1, s2 = 24576, 122880
    t1 = _timed(ring_rows, do_read, s1)
    t2 = _timed(ring_rows, do_read, s2)
    return max(0.01, (t2 - t1) / (s2 - s1) * 1e9)


def main() -> None:
    base = run(256, do_read=False)
    out = {"baseline_write_only_ns": round(base, 1)}
    for rows in (256, 1024, 4096):
        ns = run(rows, do_read=True)
        out[f"ring{rows}_ns_per_step"] = round(ns, 1)
        out[f"ring{rows}_read_marginal_ns"] = round(ns - base, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
