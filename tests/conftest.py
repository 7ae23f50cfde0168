import os

# must precede any numpy import: THP fault-in is pathologically slow on
# this VM kernel (see j40_tpu/__init__.py)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

# Device-mesh tests run on a virtual 8-device CPU topology.  The axon
# sitecustomize overrides JAX_PLATFORMS, so force the platform through
# jax.config (must happen before the backend initializes).  Set
# J40_TESTS_TPU=1 to run the device-path tests on the real chip instead
# (single-device: the mesh tests will then be skipped or fail).
if os.environ.get("J40_TESTS_TPU") != "1":
    # drop the axon plugin trigger: its sitecustomize registration can
    # block on a stalled TPU tunnel, and the CPU-mesh suite must stay
    # green regardless of tunnel weather (already registered by the time
    # conftest runs, but child processes spawned by tests inherit this)
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except ImportError:
        pass
else:
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    except ImportError:
        pass

import subprocess
from pathlib import Path

import pytest

REF_DIR = Path("/tmp/j40ref")


@pytest.fixture(scope="session")
def dj40():
    """Build (once) and return the path of the reference dj40 oracle binary."""
    exe = REF_DIR / "dj40"
    if not exe.exists():
        REF_DIR.mkdir(exist_ok=True)
        (REF_DIR / "extra").mkdir(exist_ok=True)
        for src, dst in [
            ("j40.h", "j40.h"),
            ("dj40.c", "dj40.c"),
            ("extra/stb_image_write.h", "extra/stb_image_write.h"),
        ]:
            (REF_DIR / dst).write_bytes(Path("/root/reference", src).read_bytes())
        subprocess.run(
            ["cc", "-O2", "-o", str(exe), str(REF_DIR / "dj40.c"), "-lm"],
            check=True,
            cwd=REF_DIR,
        )
    return exe
