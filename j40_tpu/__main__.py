"""Command-line decoder, the `dj40` analog (reference dj40.c).

Usage:
  python -m j40_tpu input.jxl [output.png] [--backend jax|numpy] [--workers N]
         [--filters]

Decodes to PNG (or prints image info when no output is given).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="j40_tpu", description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output", nargs="?")
    ap.add_argument("--backend", default="numpy", choices=["numpy", "jax"])
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--filters", action="store_true",
                    help="apply gaborish/EPF restoration filters")
    ap.add_argument("--time", action="store_true", help="print decode time")
    ap.add_argument("--stats", action="store_true", help="print stage timings")
    args = ap.parse_args(argv)

    from .decode import Decoder
    from .errors import J40Error

    try:
        data = open(args.input, "rb").read()
    except OSError as e:
        print(f"Error: cannot open `{args.input}`: {e}", file=sys.stderr)
        return 1

    t0 = time.perf_counter()
    try:
        dec = Decoder(data, backend=args.backend, workers=args.workers,
                      apply_filters=args.filters)
        dec.decode_frame()
        rgba = dec.render_rgba8()
    except J40Error as e:
        print(f"Error: failed to decode `{args.input}`: {e}", file=sys.stderr)
        return 1
    dt = time.perf_counter() - t0

    h, w = rgba.shape[:2]
    print(f"{w}x{h} frame read.", file=sys.stderr)
    if args.time:
        print(f"decoded in {dt*1000:.1f} ms ({w*h/dt/1e6:.2f} Mpix/s)",
              file=sys.stderr)
    if args.stats:
        for k, v in dec.stats.items():
            print(f"  {k}: {v:.4f}" if isinstance(v, float) else f"  {k}: {v}",
                  file=sys.stderr)

    if args.output:
        from PIL import Image as PILImage

        PILImage.fromarray(rgba, "RGBA").save(args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
