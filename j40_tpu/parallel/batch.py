"""Batched multi-image decode (BASELINE config 5 shape).

Host-side entropy stages for many images run on a thread pool (the native
core releases the GIL); device reconstruction is placed round-robin across
the available devices — the format's group/image axes are embarrassingly
parallel, so plain data-parallel placement needs no collectives.  The
collective-using sharded step (psum checksum over an (img, grp) mesh) lives
in j40_tpu.parallel.sharded / __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np


def decode_batch(
    blobs: list[bytes],
    workers: int = 8,
    backend: str = "jax",
    per_image_workers: int = 1,
) -> list[np.ndarray]:
    """Decode many .jxl byte blobs; returns a list of (h, w, 4) uint8 RGBA."""
    import jax

    from ..decode import Decoder

    devices = jax.devices() if backend == "jax" else [None]

    def one(i_blob):
        i, blob = i_blob
        dev = devices[i % len(devices)]

        def run():
            d = Decoder(blob, backend=backend, workers=per_image_workers)
            d.decode_frame()
            return d.render_rgba8()

        if dev is not None:
            with jax.default_device(dev):
                return run()
        return run()

    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(one, enumerate(blobs)))
