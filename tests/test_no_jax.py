"""The host execution plan must work on numpy-only installs.

pyproject.toml ships jax behind the optional [tpu] extra, so the default
decode path (backend='auto' resolving to the native host plan) must never
import jax.  Run in a subprocess with a meta-path blocker so the
module-cache state of the test process doesn't mask a regression.
"""

import subprocess
import sys
from pathlib import Path

import pytest

from j40_tpu.vardct.native_combine import native_combine_available

_SCRIPT = r"""
import sys, importlib.abc

class Block(importlib.abc.MetaPathFinder):
    def find_spec(self, name, path=None, target=None):
        if name == "jax" or name.startswith("jax."):
            raise ImportError("jax blocked (numpy-only install simulation)")

sys.meta_path.insert(0, Block())
# some environments (e.g. the axon sitecustomize) pre-import jax at
# interpreter start; purge it so cached modules can't mask a lazy import
for m in [m for m in sys.modules
          if m in ("jax", "jaxlib") or m.startswith(("jax.", "jaxlib."))]:
    del sys.modules[m]
import numpy as np
from j40_tpu.api import Image, RGBA, U8X4
from j40_tpu.encode.vardct_enc import encode_vardct_mixed
from j40_tpu.encode.encoder import encode_modular

rng = np.random.default_rng(9)
img = (np.cumsum(np.cumsum(rng.integers(-2, 3, size=(150, 260, 3)), 0), 1)
       % 200 + 20).astype(np.uint8)
for enc in (encode_modular, encode_vardct_mixed):
    im = Image.from_memory(enc(img))
    assert im.output_format(RGBA, U8X4)
    assert im.next_frame(), im.error_string()
    px = im.current_frame().pixels_u8x4()
    assert px.shape == (150, 260, 4)
assert "jax" not in sys.modules
print("OK")
"""


@pytest.mark.skipif(not native_combine_available(), reason="no native lib")
def test_decode_without_jax():
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        cwd=str(Path(__file__).resolve().parents[1]),
        timeout=300,
    )
    assert r.returncode == 0 and "OK" in r.stdout, r.stdout + r.stderr
