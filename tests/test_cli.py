"""CLI surface tests (`python -m j40_tpu`, the dj40 analog)."""

import subprocess
import sys

import numpy as np
import pytest


def _run(args, **kw):
    return subprocess.run(
        [sys.executable, "-m", "j40_tpu", *args],
        capture_output=True, text=True, **kw,
    )


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    from j40_tpu.encode.encoder import encode_modular

    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(50)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    p = d / "img.jxl"
    p.write_bytes(encode_modular(img))
    return p, img


def test_decode_to_png(sample, tmp_path):
    from PIL import Image as PILImage

    jxl, img = sample
    out = tmp_path / "o.png"
    r = _run([str(jxl), str(out), "--stats", "--time"])
    assert r.returncode == 0, r.stderr
    assert "32x24" in r.stderr and "headers_s" in r.stderr
    got = np.asarray(PILImage.open(out).convert("RGB"))
    np.testing.assert_array_equal(got, img)


def test_info_only(sample):
    jxl, _ = sample
    r = _run([str(jxl)])
    assert r.returncode == 0 and "32x24" in r.stderr


def test_missing_file_error():
    r = _run(["/nonexistent/x.jxl"])
    assert r.returncode == 1 and "cannot open" in r.stderr


def test_corrupt_input_error(tmp_path):
    p = tmp_path / "bad.jxl"
    p.write_bytes(b"\xff\x0a" + b"\x00" * 16)
    r = _run([str(p), str(tmp_path / "o.png")])
    assert r.returncode == 1 and "failed to decode" in r.stderr


def test_all_frames_apng(tmp_path):
    from PIL import Image as PILImage

    from j40_tpu.encode.encoder import encode_animation

    rng = np.random.default_rng(51)
    frames = [(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), 2)
              for _ in range(3)]
    p = tmp_path / "anim.jxl"
    p.write_bytes(encode_animation(frames))
    out = tmp_path / "anim.apng"
    r = _run([str(p), str(out), "--all-frames"])
    assert r.returncode == 0 and "(3 frames)" in r.stderr
    assert getattr(PILImage.open(out), "n_frames", 1) == 3


def test_cli_info(tmp_path, capsys):
    import numpy as np

    from j40_tpu.__main__ import main
    from j40_tpu.encode.encoder import encode_modular

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 32, 4)).astype(np.uint8)
    p = tmp_path / "t.jxl"
    p.write_bytes(encode_modular(img))
    assert main([str(p), "--info"]) == 0
    out = capsys.readouterr().out
    assert "32x24" in out and "alpha" in out and "bare codestream" in out
