"""Robustness fuzzing (analog of extra/j40-fuzz.c): arbitrary and corrupted
inputs must raise J40Error/Unsupported — never crash, hang, or return junk
silently.  Deterministic seeds keep CI stable."""

import numpy as np
import pytest

from j40_tpu.decode import Decoder, decode_file
from j40_tpu.errors import J40Error
from j40_tpu.encode.encoder import encode_modular
from j40_tpu.encode.vardct_enc import encode_vardct


def _try_decode(data: bytes):
    try:
        return decode_file(data)[1]
    except J40Error:
        return None
    except (AssertionError, IndexError, ValueError, ZeroDivisionError,
            OverflowError, MemoryError) as e:  # pragma: no cover
        raise AssertionError(f"non-J40Error escaped: {type(e).__name__}: {e}")


def test_random_bytes():
    rng = np.random.default_rng(123)
    for n in (0, 1, 2, 10, 100, 1000):
        for _ in range(8):
            _try_decode(bytes(rng.integers(0, 256, n, dtype=np.uint8)))


def test_random_with_signature():
    rng = np.random.default_rng(321)
    for _ in range(24):
        n = int(rng.integers(2, 400))
        blob = b"\xff\x0a" + bytes(rng.integers(0, 256, n, dtype=np.uint8))
        _try_decode(blob)


@pytest.fixture(scope="module")
def valid_files():
    rng = np.random.default_rng(5)
    img = (np.cumsum(rng.integers(-3, 4, size=(32, 40, 3)), axis=1) % 256).astype(
        np.uint8
    )
    return [encode_modular(img), encode_vardct(img[:32, :40])]


def test_truncations(valid_files):
    for cs in valid_files:
        for frac in (0.1, 0.3, 0.5, 0.8, 0.95, 0.999):
            _try_decode(cs[: int(len(cs) * frac)])


def test_bitflips(valid_files):
    rng = np.random.default_rng(77)
    for cs in valid_files:
        for _ in range(30):
            b = bytearray(cs)
            pos = int(rng.integers(0, len(b)))
            b[pos] ^= 1 << int(rng.integers(0, 8))
            _try_decode(bytes(b))


def test_byte_deletions(valid_files):
    rng = np.random.default_rng(99)
    for cs in valid_files:
        for _ in range(15):
            b = bytearray(cs)
            pos = int(rng.integers(0, len(b)))
            del b[pos]
            _try_decode(bytes(b))
