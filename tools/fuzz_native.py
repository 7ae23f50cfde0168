"""Corruption fuzzer aimed at the native core (analog of extra/j40-fuzz.c
run under ASan/UBSan).  Build the sanitizer library first:

    make -C j40_tpu/native asan
    LD_PRELOAD=$(g++ -print-file-name=libasan.so) \
      J40T_LIB=j40_tpu/native/libj40t_asan.so python tools/fuzz_native.py [secs]

Without J40T_LIB it fuzzes the release library (crash/hang detection only).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# allow pointing the bindings at the sanitizer build
if os.environ.get("J40T_LIB"):
    import j40_tpu.native.bindings as b

    b._LIB_PATH = type(b._LIB_PATH)(os.environ["J40T_LIB"])

import numpy as np

from j40_tpu.decode import decode_file
from j40_tpu.errors import J40Error


def main(budget_s: float = 60.0) -> int:
    from j40_tpu.encode.encoder import EncodeOptions, encode_animation, encode_modular
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct

    rng = np.random.default_rng(int(os.environ.get("FUZZ_SEED", "7")))
    img = (np.cumsum(np.cumsum(rng.integers(-2, 3, (64, 72, 3)), 0), 1) % 200
           + 20).astype(np.uint8)
    seeds = [
        encode_modular(img),
        encode_modular(img, options=EncodeOptions(use_prefix=False, lz77=True)),
        encode_vardct(img),
        encode_vardct(img, VarDCTOptions(num_passes=2)),
        encode_animation([(img, 1), (img[:16, :16], 1, (4, 4))]),
    ]
    t_end = time.time() + budget_s
    it = bad = 0
    while time.time() < t_end:
        s = seeds[it % len(seeds)]
        b2 = bytearray(s)
        mode = it % 4
        if mode == 0:
            p = int(rng.integers(0, len(b2))); b2[p] ^= 1 << int(rng.integers(0, 8))
        elif mode == 1:
            p = int(rng.integers(0, len(b2)))
            n = min(len(b2) - p, int(rng.integers(1, 64)))
            b2[p : p + n] = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        elif mode == 2:
            b2 = b2[: int(rng.integers(2, len(b2)))]
        else:
            s2 = seeds[int(rng.integers(0, len(seeds)))]
            cut = int(rng.integers(0, min(len(b2), len(s2))))
            b2 = bytearray(s[:cut]) + bytearray(s2[cut:])
        try:
            decode_file(bytes(b2))
        except J40Error:
            pass
        except Exception as e:  # noqa: BLE001 - escaped exception = finding
            import traceback

            print(f"ESCAPED at iter {it}: {type(e).__name__}: {e}")
            traceback.print_exc()
            with open(f"/tmp/fuzz_escape_{it}.bin", "wb") as fh:
                fh.write(bytes(b2))
            bad += 1
        it += 1
    print(f"{it} iterations, {bad} escapes")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(float(sys.argv[1]) if len(sys.argv) > 1 else 60.0))
