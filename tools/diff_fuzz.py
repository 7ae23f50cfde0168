"""Randomized differential stress: random images x random encoder options,
decoded by both our decoder and dj40, compared bit-exactly (modular) / ±1
(VarDCT).  Catches option-interaction bugs the fixed suites miss.

Usage: python tools/diff_fuzz.py [seconds] (needs /tmp/j40ref/dj40)
"""

import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

_INV_ORIENT = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}

DJ40 = Path("/tmp/j40ref/dj40")


def dj40_decode(data: bytes, tmp: Path):
    from PIL import Image as PILImage

    jxl = tmp / "t.jxl"
    jxl.write_bytes(data)
    png = tmp / "t.png"
    r = subprocess.run([str(DJ40), str(jxl), str(png)], capture_output=True, text=True)
    if r.returncode != 0:
        return None, r.stderr.strip()
    return np.asarray(PILImage.open(png).convert("RGB")), None


def random_image(rng):
    h = int(rng.integers(8, 200))
    w = int(rng.integers(8, 200))
    kind = rng.integers(0, 4)
    if kind == 0:
        img = rng.integers(0, 256, (h, w, 3))
    elif kind == 1:
        img = np.cumsum(np.cumsum(rng.integers(-2, 3, (h, w, 3)), 0), 1) % 256
    elif kind == 2:  # few colors (palette-friendly)
        pal = rng.integers(0, 256, (int(rng.integers(2, 40)), 3))
        img = pal[rng.integers(0, len(pal), (h, w))]
    else:  # flat with patches
        img = np.full((h, w, 3), int(rng.integers(0, 256)))
        for _ in range(5):
            y, x = int(rng.integers(0, h)), int(rng.integers(0, w))
            img[y:y + 20, x:x + 20] = rng.integers(0, 256, 3)
    return img.astype(np.uint8)


def main(budget_s: float) -> int:
    from j40_tpu.decode import decode_file
    from j40_tpu.encode.encoder import EncodeOptions, encode_modular
    from j40_tpu.encode.advanced import AdvancedOptions, encode_modular_advanced
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct

    from j40_tpu.io.container import wrap_container

    rng = np.random.default_rng(int(os.environ.get("SEED", time.time_ns() % 2**31)))
    t_end = time.time() + budget_s
    it = bad = 0
    tmp = Path(tempfile.mkdtemp())
    while time.time() < t_end:
        img = random_image(rng)
        mode = int(rng.integers(0, 3))
        orient = 1
        cfg_desc = ""
        try:
            if mode == 0:
                opt = EncodeOptions(
                    predictor=int(rng.choice([0, 5, int(rng.choice(
                        [0, 1, 2, 3, 4, 5, 7, 8, 9, 10, 11, 12, 13]))])),
                    use_prefix=bool(rng.integers(0, 2)),
                    group_size_shift=int(rng.integers(7, 9)),
                    permute_toc=bool(rng.integers(0, 2)),
                    lz77=bool(rng.integers(0, 2)),
                    frame_extension_bits=int(rng.choice([0, 0, 0, 77])),
                )
                nc = int(rng.choice([3, 3, 3, 4]))  # dj40 rejects grayscale
                if nc == 4:
                    img = np.dstack([img, rng.integers(0, 256, img.shape[:2],
                                                       dtype=np.uint8)])
                elif nc == 1:
                    img = img[:, :, :1]
                bpp = (int(rng.choice([8, 8, 8, 10, 12, 15]))
                       if nc == 3 else 8)  # dj40 TODO: alpha needs bpp 8
                if bpp > 8:
                    img = (img.astype(np.int32) << (bpp - 8)).astype(np.int32)
                icc = (bytes(rng.integers(0, 256, int(rng.integers(1, 400)),
                                          dtype=np.uint8))
                       if rng.integers(0, 4) == 0 else None)
                orient = int(rng.integers(1, 9))
                cfg_desc = f"nc={nc} bpp={bpp} icc={icc is not None} o={orient} {opt}"
                data = encode_modular(img, bpp=bpp, options=opt,
                                      orientation=orient, icc=icc)
                if rng.integers(0, 4) == 0:
                    # dj40's container seek breaks on permuted TOCs split
                    # into jxlp parts (boundary-position dependent) — only
                    # wrap unpermuted streams for the differential
                    maxp = 1 if opt.permute_toc else 4
                    data = wrap_container(
                        data, jxlp_parts=int(rng.integers(0, maxp)),
                        level=5 if rng.integers(0, 2) else None)
                exact = True
            elif mode == 1:
                opt = AdvancedOptions(
                    use_prefix=bool(rng.integers(0, 2)),
                    rct_type=(int(rng.integers(0, 42))
                              if rng.integers(0, 2) else None),
                    squeeze=bool(rng.integers(0, 2)) and False,  # dj40 rejects
                    palette=False,
                    complex_cluster_map=bool(rng.integers(0, 3) == 0),
                    flat_ans_dists=bool(rng.integers(0, 4) == 0),
                    ans_shift=int(rng.choice([13, 13, 11, 8, 5])),
                )
                if rng.integers(0, 3) == 0:
                    opt.palette = True  # possibly chained after RCT
                    opt.max_colours = 1 << 14
                data = encode_modular_advanced(img, options=opt)
                exact = True
            else:
                opt = VarDCTOptions(
                    use_prefix=bool(rng.integers(0, 2)),
                    hf_mul=int(rng.choice([2, 8, 32])),
                    num_passes=int(rng.integers(1, 4)),
                    custom_order=bool(rng.integers(0, 2)),
                    custom_dq=bool(rng.integers(0, 2)),
                    num_hf_presets=int(rng.integers(1, 4)),
                    sharpness=int(rng.integers(0, 8)),
                    custom_restoration=bool(rng.integers(0, 4) == 0),
                    m_lf_scaled=((1 / 2048.0, 1 / 512.0, 1 / 128.0)
                                 if rng.integers(0, 4) == 0 else None),
                )
                data = encode_vardct(img, opt)
                exact = False
        except AssertionError:
            continue  # unsupported combination for this size
        ref, err = dj40_decode(data, tmp)
        if ref is None:
            print(f"iter {it}: dj40 REJECTED mode={mode}: {err} cfg={cfg_desc}")
            Path(f"/tmp/difffuzz_fail_{it}.jxl").write_bytes(data)
            bad += 1
            it += 1
            continue
        from j40_tpu.decode import apply_orientation

        _, rgba = decode_file(data)
        ours = rgba[:, :, :3]
        if mode == 0 and orient != 1:
            # dj40 ignores orientation: undo ours before comparing
            ours = apply_orientation(ours, _INV_ORIENT[orient])
        if exact:
            diff_ok = (ours.shape == ref.shape and np.array_equal(ours, ref))
            if not diff_ok:
                print(f"iter {it}: MISMATCH mode={mode} shape={img.shape}")
                bad += 1
            # second differential: native C++ core vs pure-Python oracle
            if it % 7 == 0:
                os.environ["J40T_NATIVE"] = "0"
                try:
                    _, rgba_py = decode_file(data)
                finally:
                    os.environ.pop("J40T_NATIVE", None)
                if not np.array_equal(rgba_py, rgba):
                    print(f"iter {it}: NATIVE!=PYTHON mode={mode}")
                    bad += 1
        else:
            if ours.shape != ref.shape or np.abs(
                ours.astype(int) - ref.astype(int)
            ).max() > 1:
                print(f"iter {it}: VARDCT MISMATCH shape={img.shape}")
                bad += 1
        it += 1
    print(f"{it} differential iterations, {bad} failures")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(float(sys.argv[1]) if len(sys.argv) > 1 else 120.0))
