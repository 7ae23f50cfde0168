"""Whole-pipeline scaling artifact (SCALING_r05.json).

Round 4's model covered only the reconstruction shard program (dequant +
IDCT + filter bytes and halo rows).  This version models the FULL decode
pipeline per chip so the >=80%-scaling claim has a pipeline-level
artifact with the binding stage identified per mesh size:

  stage 1  DCN scatter      compressed section bytes to owner hosts
           (sections are self-contained byte spans, j40.h:5527-5537)
  stage 2  entropy decode   host C++ threads OR the on-chip Pallas
           symbol-loop kernel (ops/pallas_entropy.py)
  stage 3  host->chip feed  PCIe upload: raw section bytes (on-chip
           entropy) or packed coefficient planes (host entropy)
  stage 4  reconstruction   streaming dequant+CfL+IDCT+XYB + filters
           (HBM-bandwidth ruled; bench hbm_roofline_fraction ~0.9)
  stage 5  halo exchange    gaborish 1 row + 3x EPF 3 rows, ICI ring
  stage 6  output           device-resident (serving: 0 bytes) or RGBA
           fetch over PCIe

Stages software-pipeline across LF groups (the per-LF-group pipeline in
SCALING.md), so per-chip throughput is ruled by the SLOWEST stage; the
model reports every stage time per chip, the binding stage, and the
efficiency vs an ideal N-fold speedup of the 1-chip pipeline.

Anchored constants are measured on this repo's hardware where possible
(bench.py artifacts quoted inline); the rest are stated v5e-class
figures a reviewer can substitute.

Also still records the r4-style virtual-mesh parity run of the actual
shard program (correctness-side context).

Writes SCALING_r05.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"  # the axon sitecustomize overrides it
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np

try:  # the axon sitecustomize can force its platform; pin CPU explicitly
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# ---- stated/measured projection parameters (the JSON records them) ----
HBM_GBPS = 600.0      # measured copy ceiling (bench device_compute ~610-720)
ICI_GBPS = 90.0       # per-direction neighbor link, v5e-class 1-D ring
PCIE_GBPS = 10.0      # production host<->chip link (NOT this dev tunnel)
DCN_GBPS = 6.25       # 50 Gb/s per host NIC share
HOST_CORES_PER_CHIP = 8
MSYM_HOST_THREAD = 100e6   # one C++ thread (native/core.cpp), measured r3
MSYM_ONCHIP = 950e6        # Pallas symbol loop, BENCH r4/r5 pallas_entropy
# content profiles: (name, compressed bits/px, symbols/px, coeff upload
# bytes/px for the host-entropy plan).  photo figures from the bench
# serving corpus (2.1 bits/px, ~0.8 sym/px, 2.0 B/px packed i4+aux);
# lossless from the modular legs (3 sym/px = one per channel sample).
PROFILES = [
    ("vardct_photo_d1", 2.1, 0.81, 2.0),
    ("vardct_dense", 15.0, 2.6, 4.0),
    ("lossless_modular", 9.0, 3.0, 6.0),
]
RECON_BYTES_PX = (1 + 1 + 2 * 4) * 3 * 4  # coeff in + samples out + 4
                                          # filter passes re-read/write


def pipeline(n_chips: int, H: int, W: int, profile, onchip: bool,
             serving: bool):
    """Per-chip stage times (s) for one image sharded over n_chips."""
    name, bits_px, sym_px, coeff_b_px = profile
    px_chip = H * W / n_chips
    comp_bytes_chip = bits_px * px_chip / 8
    t = {}
    t["dcn_scatter"] = comp_bytes_chip / (DCN_GBPS * 1e9)
    if onchip:
        t["entropy"] = sym_px * px_chip / MSYM_ONCHIP
        t["pcie_feed"] = comp_bytes_chip / (PCIE_GBPS * 1e9)
    else:
        t["entropy"] = sym_px * px_chip / (
            MSYM_HOST_THREAD * HOST_CORES_PER_CHIP)
        t["pcie_feed"] = coeff_b_px * px_chip / (PCIE_GBPS * 1e9)
    t["reconstruct"] = RECON_BYTES_PX * px_chip / (HBM_GBPS * 1e9)
    halo_bytes = 2 * (1 + 3 * 3) * 3 * W * 4  # per shard boundary pair
    t["halo"] = halo_bytes / (ICI_GBPS * 1e9) if n_chips > 1 else 0.0
    t["output"] = 0.0 if serving else 4 * px_chip / (PCIE_GBPS * 1e9)
    return t


def main() -> None:
    # ---- pipeline model over mesh sizes --------------------------------
    rows = []
    for name, bits_px, sym_px, coeff_b in PROFILES:
        prof = (name, bits_px, sym_px, coeff_b)
        for onchip in (False, True):
            t1 = pipeline(1, 16384, 16384, prof, onchip, serving=True)
            bound1 = max(t1.values())
            for n in (8, 64, 256):
                tn = pipeline(n, 16384, 16384, prof, onchip, serving=True)
                work = {k: v for k, v in tn.items() if k != "halo"}
                binding = max(work, key=work.get)
                # conservative: the halo exchange is charged SERIALLY on
                # top of the binding stage (in practice it overlaps the
                # next stripe's compute; this upper-bounds the loss)
                boundn = work[binding] + tn["halo"]
                eff = (bound1 / n) / boundn
                rows.append({
                    "profile": name,
                    "entropy_plan": "onchip" if onchip else "host",
                    "chips": n,
                    "stage_us_per_chip": {
                        k: round(v * 1e6, 1) for k, v in tn.items()},
                    "binding_stage": binding,
                    "efficiency_vs_1chip": round(min(eff, 1.0), 4),
                })

    # ---- r4-style measured virtual-mesh parity + per-shard bytes ------
    import jax
    from jax.sharding import Mesh

    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct
    from j40_tpu.parallel import sharded_decode as sd

    size_w, size_h = 1024, 2048
    rng = np.random.default_rng(3)
    img = (
        np.cumsum(np.cumsum(rng.integers(-2, 3, size=(size_h, size_w, 3)),
                            0), 1) % 200 + 25
    ).astype(np.uint8)
    data = encode_vardct(img, VarDCTOptions(use_prefix=False))
    devs = jax.devices()
    measured = []
    for n in (2, 8):
        if n > len(devs):
            continue
        mesh = Mesh(np.array(devs[:n]), ("rows",))
        t0 = time.perf_counter()
        arr = sd.decode_sharded(data, mesh=mesh, apply_filters=True)
        wall = time.perf_counter() - t0
        shard_h = -(-size_h // (8 * n)) * 8
        measured.append({
            "mesh": n, "shard_rows": shard_h,
            "per_shard_HBM_MB": round(
                RECON_BYTES_PX * shard_h * size_w / 1e6, 2),
            "halo_KB": round(2 * 10 * 3 * size_w * 4 / 1e3, 1),
            "virtual_mesh_wall_s": round(wall, 3),
            "parity_shape": list(arr.shape),
        })
        print(f"# mesh={n}: {measured[-1]}", file=sys.stderr)

    out = {
        "model": "per-LF-group software pipeline; per-chip throughput = "
                 "slowest stage; efficiency = (1-chip bound / N) / "
                 "(N-chip bound)",
        "assumptions": {
            "HBM_GBps": HBM_GBPS, "ICI_GBps_per_direction": ICI_GBPS,
            "PCIe_GBps": PCIE_GBPS, "DCN_GBps_per_host": DCN_GBPS,
            "host_cores_per_chip": HOST_CORES_PER_CHIP,
            "Msym_s_host_thread": MSYM_HOST_THREAD,
            "Msym_s_onchip_kernel": MSYM_ONCHIP,
            "profiles (bits/px, sym/px, coeff B/px)": {
                p[0]: p[1:] for p in PROFILES},
        },
        "pipeline_16k_square_serving": rows,
        "measured_virtual_mesh": measured,
        "reading": {
            "binding_stage": "the ENTROPY stage binds every profile at "
                             "every mesh size (0.8-3 sym/px against "
                             "~1 Gsym/s on-chip or 0.8 Gsym/s of host "
                             "cores, vs an HBM-ruled reconstruction of "
                             "only ~0.2 ms/Mpix) — but entropy shards "
                             "perfectly with the groups, so it scales; "
                             "the only non-scaling term is the halo, "
                             "charged serially here",
            "efficiency": "worst case 0.95 at 256 chips (photo, "
                          "on-chip); every config >= 0.95, comfortably "
                          "above the >=80% north-star bar even with the "
                          "halo un-overlapped",
        },
    }
    (REPO / "SCALING_r05.json").write_text(json.dumps(out, indent=1))
    worst = min(r["efficiency_vs_1chip"] for r in rows
                if r["entropy_plan"] == "onchip")
    print(json.dumps({"wrote": "SCALING_r05.json",
                      "worst_onchip_efficiency": worst}))


if __name__ == "__main__":
    main()
