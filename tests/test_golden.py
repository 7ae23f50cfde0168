"""Golden-vector regression tests: pinned decodes of in-repo streams.

These anchor the beyond-reference features (squeeze, animation blending,
YCbCr subsampling, orientation, delta palettes, high bit depth) against
encoder+decoder co-drift — a pure round-trip suite would not notice if both
sides changed together.  The VarDCT vector is additionally covered by the
dj40 differential; the float path is pinned on the numpy backend only.

Regenerate (ONLY after verifying a semantic change is intended) with
`python tests/golden/regen.py`.
"""

import hashlib
import json
from pathlib import Path

import pytest

from j40_tpu.decode import decode_animation, decode_file

GOLDEN = Path(__file__).parent / "golden"
MANIFEST = json.loads((GOLDEN / "manifest.json").read_text())


@pytest.mark.parametrize("name", sorted(MANIFEST))
def test_golden(name, monkeypatch):
    # pins are generated from the pure-Python oracle; the native/jax float
    # paths may differ by +-1 at rounding boundaries and have their own
    # differential coverage (test_native_combine, test_vardct)
    monkeypatch.setenv("J40T_NATIVE", "0")
    info = MANIFEST[name]
    data = (GOLDEN / f"{name}.jxl").read_bytes()
    if info["mode"] == "anim":
        _, frames = decode_animation(data)
        h = hashlib.sha256()
        for d, f in frames:
            h.update(str(d).encode())
            h.update(f.tobytes())
        digest = h.hexdigest()
    else:
        _, rgba = decode_file(data)
        digest = hashlib.sha256(rgba.tobytes()).hexdigest()
    assert digest == info["sha256"], f"golden decode drifted for {name}"
