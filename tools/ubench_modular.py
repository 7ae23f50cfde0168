"""Single-thread micro-benchmark for the modular_e3 flagship shape.

Times Decoder(workers=1) on the cached bench stream (MA tree with a
WP-error-gated split to WP/gradient leaves — the cjxl -e3 analog, see
bench.py mod_e3).  Usage: python tools/ubench_modular.py [reps]
"""
import sys, time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    cache = Path("/tmp/j40_tpu_bench")
    p = cache / "modular_e3.jxl"
    if not p.exists():
        from j40_tpu.encode.advanced import AdvancedOptions, encode_modular_advanced
        from j40_tpu.encode.modular_enc import branch, leaf
        rng = np.random.default_rng(12345)
        base = rng.integers(0, 256, (1024, 1024, 3), dtype=np.uint8)
        img = np.asarray(base, dtype=np.uint8)
        # smooth it like bench._test_image does
        sys.path.insert(0, str(REPO))
        import bench
        img = bench._test_image(1024, 1024)
        tree = [branch(15, 0, 1, 2), leaf(6), leaf(5)]
        cache.mkdir(exist_ok=True)
        p.write_bytes(encode_modular_advanced(img, options=AdvancedOptions(tree=tree)))
    data = p.read_bytes()
    from j40_tpu.decode import Decoder

    def once():
        d = Decoder(data, backend="numpy", workers=1)
        d.decode_frame()
        return d.render_rgba8()

    out = once()  # warm
    px = out.shape[0] * out.shape[1]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        once()
        best = min(best, time.perf_counter() - t0)
    print(f"modular_e3 1-thread: {best*1000:.1f} ms  {px/best/1e6:.2f} Mpix/s")

if __name__ == "__main__":
    main()
