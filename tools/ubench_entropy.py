"""Micro-benchmark the native entropy symbol decoder (j40t_decode_symbols).

Builds one large ANS (or prefix) token stream with the project encoder,
then times native decode throughput against one or more candidate
libj40t.so builds, bypassing the Python decode pipeline entirely.

Usage: python tools/ubench_entropy.py [lib.so ...]
With no args, times the in-tree j40_tpu/native/libj40t.so.
"""

from __future__ import annotations

import ctypes
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from j40_tpu.encode.entropy import EntropyEncoder, HybridIntConfig  # noqa: E402
from j40_tpu.io.bits import BitReader  # noqa: E402
from j40_tpu.encode.bitwriter import BitWriter  # noqa: E402
from j40_tpu.entropy.code import read_code_spec  # noqa: E402
from j40_tpu.native.bindings import serialize_spec  # noqa: E402

N = 2_000_000
NUM_DIST = 32


def build_stream(use_prefix: bool):
    rng = np.random.default_rng(42)
    ctxs = rng.integers(0, NUM_DIST, size=N).astype(np.int64)
    # geometric-ish coefficient magnitudes, like HF residuals
    vals = np.abs(rng.geometric(0.35, size=N) - 1).astype(np.int64)
    enc = EntropyEncoder(NUM_DIST, use_prefix=use_prefix,
                         cluster_map=[i % 8 for i in range(NUM_DIST)],
                         config=HybridIntConfig(4, 1, 0))
    enc.add_arrays(ctxs, vals)
    w = BitWriter()
    enc.write(w)
    data = bytes(w.finish())
    r = BitReader(data)
    spec = read_code_spec(r, NUM_DIST)
    bitpos = r.bits_consumed
    return data, bitpos, spec, ctxs.astype(np.int32), vals.astype(np.int32)


def time_lib(path: str, data, bitpos, spec, ctxs, expect):
    lib = ctypes.CDLL(path)
    lib.j40t_stream_new.restype = ctypes.c_void_p
    lib.j40t_stream_new.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.j40t_stream_free.argtypes = [ctypes.c_void_p]
    lib.j40t_decode_symbols.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
    ]
    blob = serialize_spec(spec)
    out = np.empty(N, dtype=np.int32)
    best = 1e9
    for _ in range(7):
        h = lib.j40t_stream_new(
            data, len(data), bitpos,
            blob.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(blob))
        t0 = time.perf_counter()
        lib.j40t_decode_symbols(
            h, ctxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), N, 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        dt = time.perf_counter() - t0
        lib.j40t_stream_free(h)
        best = min(best, dt)
    assert np.array_equal(out, expect), f"{path}: decode mismatch"
    return N / best / 1e6


def main():
    libs = sys.argv[1:] or ["j40_tpu/native/libj40t.so"]
    for use_prefix in (False, True):
        data, bitpos, spec, ctxs, vals = build_stream(use_prefix)
        kind = "prefix" if use_prefix else "ans"
        for path in libs:
            ms = time_lib(path, data, bitpos, spec, ctxs, vals)
            print(f"{kind:6s} {path}: {ms:8.1f} Msym/s")


if __name__ == "__main__":
    main()
