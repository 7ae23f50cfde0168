"""Regenerate the golden vectors + manifest.  Run ONLY when a semantic
change to the decoder/encoder output is intended and verified; see
tests/test_golden.py."""
# (generation script mirrored from the original creation; keep in sync with
# test_golden.py's hashing.)
import hashlib, json, os, pathlib, sys

os.environ["J40T_NATIVE"] = "0"  # pins are oracle-path (see test_golden.py)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import numpy as np
from j40_tpu.decode import decode_animation, decode_file
from j40_tpu.encode.encoder import EncodeOptions, encode_animation, encode_modular
from j40_tpu.encode.advanced import AdvancedOptions, encode_modular_advanced, synthesize_palette
from j40_tpu.encode.vardct_enc import encode_vardct

out = pathlib.Path(__file__).parent
rng = np.random.default_rng(2026)
img = (np.cumsum(np.cumsum(rng.integers(-2, 3, (40, 48, 3)), 0), 1) % 200 + 20).astype(np.uint8)
gray16 = rng.integers(0, 1 << 12, (32, 32, 1)).astype(np.uint16)

cases = {}
def add(name, data, mode="file"):
    (out / f"{name}.jxl").write_bytes(data)
    if mode == "anim":
        _, frames = decode_animation(bytes(data))
        h = hashlib.sha256()
        for d, f in frames:
            h.update(str(d).encode()); h.update(f.tobytes())
        digest = h.hexdigest()
    else:
        _, rgba = decode_file(bytes(data))
        digest = hashlib.sha256(rgba.tobytes()).hexdigest()
    cases[name] = {"sha256": digest, "mode": mode}

add("modular_squeeze", encode_modular_advanced(img, options=AdvancedOptions(squeeze=True)))
add("modular_rct_ycgco", encode_modular_advanced(img, options=AdvancedOptions(rct_type=6)))
add("palette_delta", synthesize_palette(
    rng.integers(-20, 21, (3, 24)).astype(np.int32),
    rng.integers(-40, 24 + 60, (24, 32)).astype(np.int32), nb_deltas=12, d_pred=6))
add("animation_blend", encode_animation([
    (np.dstack([img[:16, :16], np.full((16, 16), 200, np.uint8)]), 1),
    (rng.integers(0, 256, (16, 16, 4), dtype=np.uint8), 2, (0, 0), "blend"),
]), mode="anim")
add("ycbcr_420", encode_modular(
    np.repeat(np.repeat(img[:12, :12], 2, 0), 2, 1),
    options=EncodeOptions(ycbcr=True, ycbcr_subsample=(1, 0, 1))))
add("oriented_rot90", encode_modular(img[:16, :24], orientation=6))
add("vardct_default", encode_vardct(img))
add("gray12", encode_modular(gray16.astype(np.int32), bpp=12))

(out / "manifest.json").write_text(json.dumps(cases, indent=1))
print(f"{len(cases)} golden vectors regenerated")
