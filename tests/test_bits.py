"""Round-trip and golden tests for the bit layer (reference: j40.h:1816-2017)."""

import math
import random

import pytest

from j40_tpu.errors import J40Error, ShortInput
from j40_tpu.encode.bitwriter import BitWriter
from j40_tpu.io.bits import BitReader, ceil_lg, floor_lg


def test_lsb_first_order():
    # 0b1101_0010 read as 1,0,0,1,0,1,1 from LSB
    r = BitReader(bytes([0xD2]))
    assert [r.u(1) for _ in range(8)] == [0, 1, 0, 0, 1, 0, 1, 1]


def test_multibit_across_bytes():
    r = BitReader(bytes([0xAB, 0xCD, 0xEF]))
    assert r.u(12) == 0xDAB
    assert r.u(12) == 0xEFC


def test_u64_golden():
    # selector offsets: 0 -> 0; 1 -> 1+u(4); 2 -> 17+u(8); 3 -> u(12) + continuation
    w = BitWriter()
    for v in [0, 1, 16, 17, 272, 273, 4095, 4096, (1 << 40) + 12345, (1 << 64) - 1]:
        w.u64(v)
    r = BitReader(w.finish())
    for v in [0, 1, 16, 17, 272, 273, 4095, 4096, (1 << 40) + 12345, (1 << 64) - 1]:
        assert r.u64() == v


def test_u32_roundtrip():
    spec = ((0, 0), (1, 0), (2, 4), (18, 6))
    w = BitWriter()
    vals = [0, 1, 2, 10, 17, 18, 60, 81]
    for v in vals:
        w.u32(spec, v)
    r = BitReader(w.finish())
    for v in vals:
        assert r.u32(0, 0, 1, 0, 2, 4, 18, 6) == v


def test_enum_roundtrip_and_limit():
    w = BitWriter()
    for v in [0, 1, 2, 17, 18, 30]:
        w.enum(v)
    r = BitReader(w.finish())
    for v in [0, 1, 2, 17, 18, 30]:
        assert r.enum() == v
    w2 = BitWriter()
    w2.u32(((0, 0), (1, 0), (2, 4), (18, 6)), 31)
    with pytest.raises(J40Error, match="enum"):
        BitReader(w2.finish()).enum()


def test_f16():
    w = BitWriter()
    for v in [0.0, 1.0, -2.5, 0.333251953125, 65504.0, 6.103515625e-05]:
        w.f16(v)
    r = BitReader(w.finish())
    for v in [0.0, 1.0, -2.5, 0.333251953125, 65504.0, 6.103515625e-05]:
        assert r.f16() == v
    # inf rejected
    w2 = BitWriter()
    w2.u(16, 0x7C00)
    with pytest.raises(J40Error, match="!fin"):
        BitReader(w2.finish()).f16()


def test_f16_subnormal():
    # j40 deviation: subnormals scale by 2^-25, not IEEE's 2^-24 (j40.h:1991 —
    # the mantissa keeps the normal-path exponent bias).  We match j40.
    r = BitReader(bytes([0x01, 0x00]))  # smallest subnormal
    assert r.f16() == math.ldexp(1, -25)


def test_u8_varint():
    # u8: flag bit; if set, n=u(3) then u(n)+(1<<n)
    w = BitWriter()
    for v in [0, 1, 2, 3, 4, 127, 255]:
        if v == 0:
            w.u(1, 0)
        else:
            n = floor_lg(v)
            w.u(1, 1)
            w.u(3, n)
            w.u(n, v - (1 << n))
    r = BitReader(w.finish())
    for v in [0, 1, 2, 3, 4, 127, 255]:
        assert r.u8() == v


def test_at_most():
    w = BitWriter()
    w.at_most(5, 3)
    w.at_most(0, 0)
    w.at_most(255, 200)
    r = BitReader(w.finish())
    assert r.at_most(5) == 3
    assert r.at_most(0) == 0
    assert r.at_most(255) == 200
    # out-of-range value raises "rnge"
    w2 = BitWriter()
    w2.u(3, 7)
    with pytest.raises(J40Error, match="rnge"):
        BitReader(w2.finish()).at_most(5)


def test_short_input():
    r = BitReader(b"\x01")
    r.u(4)
    with pytest.raises(ShortInput):
        r.u(8)


def test_zero_pad_and_no_more_bytes():
    w = BitWriter()
    w.u(3, 5)
    data = w.finish()
    r = BitReader(data)
    assert r.u(3) == 5
    r.no_more_bytes()
    # nonzero pad raises
    r2 = BitReader(bytes([0xFF]))
    r2.u(3)
    with pytest.raises(J40Error, match="pad0"):
        r2.zero_pad_to_byte()


def test_skip():
    data = bytes(range(32))
    r = BitReader(data)
    r.u(5)
    r.skip(8 * 16 + 5)
    assert r.bits_consumed == 8 * 16 + 10
    assert r.u(6) == ((data[17] >> 2) | (data[18] << 6)) & 0x3F


def test_random_roundtrip():
    rng = random.Random(1234)
    ops = []
    w = BitWriter()
    for _ in range(2000):
        kind = rng.randrange(3)
        if kind == 0:
            n = rng.randrange(0, 32)
            v = rng.randrange(1 << n) if n else 0
            w.u(n, v)
            ops.append(("u", n, v))
        elif kind == 1:
            v = rng.randrange(1 << 64)
            w.u64(v)
            ops.append(("u64", v))
        else:
            v = rng.randrange(31)
            w.enum(v)
            ops.append(("enum", v))
    r = BitReader(w.finish())
    for op in ops:
        if op[0] == "u":
            assert r.u(op[1]) == op[2]
        elif op[0] == "u64":
            assert r.u64() == op[1]
        else:
            assert r.enum() == op[1]


def test_lg_helpers():
    assert ceil_lg(1) == 0 and ceil_lg(2) == 1 and ceil_lg(3) == 2 and ceil_lg(256) == 8
    assert floor_lg(1) == 0 and floor_lg(255) == 7 and floor_lg(256) == 8
