"""Interleaved A/B benchmark of two libj40t.so variants.

The dev host's wall-clock noise swings 10-20% minute to minute, which
drowns single-digit kernel improvements when variants run in separate
processes.  This loads both libraries into one process and alternates
decodes A/B/A/B..., so both ride the same ambient load; medians of the
per-pair ratio are stable to ~1%.

Usage: python tools/ab_native.py LIB_A LIB_B [stream.jxl] [pairs]
"""
import ctypes
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def clone_lib(path: str, ref):
    """Load `path` and copy argtypes/restype from every function already
    registered on `ref` (ctypes caches accessed functions as attributes)."""
    lib = ctypes.CDLL(path)
    for name, fn in ref.__dict__.items():
        if not hasattr(fn, "argtypes"):
            continue
        try:
            g = getattr(lib, name)
        except AttributeError:
            continue
        g.argtypes = fn.argtypes
        g.restype = fn.restype
    return lib


def main():
    lib_a, lib_b = sys.argv[1], sys.argv[2]
    stream = sys.argv[3] if len(sys.argv) > 3 else "/tmp/j40_tpu_bench/modular_e3.jxl"
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 12

    data = Path(stream).read_bytes()
    from j40_tpu.decode import Decoder
    from j40_tpu.native import bindings

    base = bindings.get_lib()
    assert base is not None
    # touch every bound symbol once so __dict__ is fully populated
    A = clone_lib(lib_a, base)
    B = clone_lib(lib_b, base)

    def once():
        t0 = time.perf_counter()
        d = Decoder(data, backend="numpy", workers=1)
        d.decode_frame()
        return time.perf_counter() - t0

    bindings._lib = A
    once()
    bindings._lib = B
    once()

    ta, tb = [], []
    for _ in range(pairs):
        bindings._lib = A
        ta.append(once())
        bindings._lib = B
        tb.append(once())
    ra = sorted(ta)
    rb = sorted(tb)
    ratios = sorted(b / a for a, b in zip(ta, tb))
    print(f"A ({lib_a}): min {ra[0]*1e3:.1f} med {ra[len(ra)//2]*1e3:.1f} ms")
    print(f"B ({lib_b}): min {rb[0]*1e3:.1f} med {rb[len(rb)//2]*1e3:.1f} ms")
    print(f"B/A per-pair ratio: med {ratios[len(ratios)//2]:.3f} "
          f"(min {ratios[0]:.3f}, max {ratios[-1]:.3f})")


if __name__ == "__main__":
    main()
