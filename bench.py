"""Benchmark: decode throughput (Mpix/s) vs the reference dj40.

Measures the BASELINE.json metric — "decode Mpix/s/chip (Modular lossless +
VarDCT d1.0)" — over the BASELINE.md measurement-matrix configs, each
compared against a locally built dj40 on the same files (the reference
publishes no absolute numbers; see BASELINE.md).  dj40 is timed without PNG
writing.

Configs (BASELINE.md rows):
  modular      row 1 analog: fast-path lossless stream, 1024^2
  modular_e3   row 2 analog: MA tree + weighted-predictor stream, 1024^2
               (dj40 decodes it; the Squeeze part of row 2 is covered by
               tests, not timed, since dj40 rejects Squeeze)
  vardct       row 3: VarDCT 1024^2, device reconstruction
  vardct_12mp  row 4 analog: VarDCT 4096x3072 (12.6 MP)
  batch64      row 5 analog: 64 x 512^2 VarDCT decoded concurrently
               (aggregate Mpix/s + efficiency vs one stream)

Prints exactly one JSON line on stdout:
  {"metric": "...", "value": N, "unit": "Mpix/s", "vs_baseline": R,
   "configs": {...}, "batch64": {...}, "stages": {...}}
value / vs_baseline are geomeans over the four dj40-comparable configs.
"""

from __future__ import annotations

import functools
import json
import math
import os
import subprocess
import sys
import time
from pathlib import Path

# must precede the numpy import: THP fault-in is pathologically slow on
# this VM kernel (see j40_tpu/__init__.py)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import numpy as np

REPO = Path(__file__).resolve().parent
CACHE = Path("/tmp/j40_tpu_bench")
SIZE = int(os.environ.get("BENCH_SIZE", "1024"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))
WORKERS = int(os.environ.get("BENCH_WORKERS", str(os.cpu_count() or 4)))
ONLY = [s for s in os.environ.get("BENCH_CONFIGS", "").split(",") if s]


def _ensure_dj40() -> Path | None:
    exe = Path("/tmp/j40ref/dj40")
    if exe.exists():
        return exe
    ref = Path("/root/reference")
    if not ref.exists():
        return None
    d = Path("/tmp/j40ref")
    (d / "extra").mkdir(parents=True, exist_ok=True)
    for src in ("j40.h", "dj40.c"):
        (d / src).write_bytes((ref / src).read_bytes())
    (d / "extra/stb_image_write.h").write_bytes(
        (ref / "extra/stb_image_write.h").read_bytes()
    )
    r = subprocess.run(
        ["cc", "-O2", "-o", str(exe), str(d / "dj40.c"), "-lm"], capture_output=True
    )
    return exe if r.returncode == 0 else None


def _device_available(timeout_s: float = 120.0) -> bool:
    """Probe the accelerator without risking an indefinite hang (the dev
    host's TPU tunnel can stall for minutes under contention)."""
    from concurrent.futures import ThreadPoolExecutor

    def probe():
        import jax

        return len(jax.devices()) > 0

    try:
        with ThreadPoolExecutor(1) as ex:
            return bool(ex.submit(probe).result(timeout=timeout_s))
    except Exception:
        return False


def _test_image(w: int, h: int, seed: int = 12345) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.integers(-2, 3, size=(h, w, 3)), 0), 1)
    return (img % 200 + 20).astype(np.uint8)


def _time_ours(
    data: bytes, backend: str, workers: int | None = None,
) -> tuple[float, dict, str]:
    from j40_tpu.decode import Decoder

    if workers is None:
        workers = WORKERS

    def once():
        d = Decoder(data, backend=backend, workers=workers)
        d.decode_frame()
        return d, d.render_rgba8()

    dec, rgba = once()  # warmup (includes jit compile on device backends)
    backend = dec.backend  # 'auto' resolved by the execution planner
    # best-of-N: the dev host's TPU tunnel bandwidth swings ~2x with ambient
    # load, so the minimum is the honest hardware-capability number; device
    # backends sample inside a time budget to ride out congestion windows
    dt = float("inf")
    stats: dict = {}
    budget = time.perf_counter() + (90.0 if backend != "numpy" else 15.0)
    iters = 0
    while iters < ITERS or (time.perf_counter() < budget and iters < 4 * ITERS):
        t0 = time.perf_counter()
        dec, _ = once()
        t = time.perf_counter() - t0
        if t < dt:
            dt, stats = t, dict(dec.stats)
        iters += 1
    return rgba.shape[0] * rgba.shape[1] / dt / 1e6, stats, backend


def _time_dj40(dj40: Path, jxl: Path, pixels: int) -> float:
    subprocess.run([str(dj40), str(jxl)], capture_output=True)
    dt = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        subprocess.run([str(dj40), str(jxl)], capture_output=True)
        dt = min(dt, time.perf_counter() - t0)
    return pixels / dt / 1e6


def _bench_batch64(backend: str, n: int = 64, size: int = 512) -> dict:
    """BASELINE row-5 analog: aggregate throughput over a 64-image batch vs
    the same decoder run on one stream (scaling efficiency).  Best-of-2: a
    single tunnel congestion window (minutes-long stalls are observed on
    this host) must not define the recorded number."""
    from j40_tpu.encode.vardct_enc import encode_vardct
    from j40_tpu.parallel.batch import decode_batch

    blobs = []
    for i in range(n):
        p = CACHE / f"batch_{size}_{i}.jxl"
        if not p.exists():
            p.write_bytes(encode_vardct(_test_image(size, size, seed=1000 + i)))
        blobs.append(p.read_bytes())
    pixels = n * size * size

    decode_batch(blobs[:4], workers=WORKERS, backend=backend)  # warmup
    dt = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        decode_batch(blobs, workers=WORKERS, backend=backend)
        dt = min(dt, time.perf_counter() - t0)
        if dt > 60.0 and rep == 0:
            break  # deep congestion window; don't double the bench time
    agg = pixels / dt / 1e6

    one, _, resolved = _time_ours(blobs[0], backend)
    return {
        "aggregate_mpixps": round(agg, 3),
        "single_stream_mpixps": round(one, 3),
        "efficiency_vs_1stream": round(agg / one, 3) if one else 0.0,
        "images": n,
        "image_px": size,
        "backend": resolved,
        # the single-stream baseline already saturates this host's 4 cores
        # (sections decode on a thread pool), so aggregate/1-stream measures
        # batching overhead absorption, not core scaling; per-core scaling
        # is the workers=1 vs workers=N delta in the config legs
        "note": "baseline saturates all host cores; ~1.0 = no batch overhead",
    }


def _bench_batch64_device(n: int = 64, size: int = 512,
                          tunnel: dict | None = None) -> dict:
    """BASELINE row-5 on the TPU: the pipelined device serving path
    (`parallel.batch.decode_batch_device`) — host entropy overlapped with
    device transfers, fused reconstruct per 16-image chunk, RGBA kept
    device-resident (the shape a jax model consumes; zero download).  The
    per-stage account + the same-run tunnel probe make the number auditable
    against its transfer floor: upload_bytes / up_MBps is the hard bound on
    this host (a PCIe host moves the same tensors ~500x faster, making this
    path compute-bound at the recorded kernel rate)."""
    import jax

    from j40_tpu.parallel.batch import decode_batch, decode_batch_device

    blobs = [
        (CACHE / f"batch_{size}_{i}.jxl").read_bytes() for i in range(n)
    ]
    pixels = n * size * size
    stats: dict = {}
    decode_batch_device(blobs[:16], workers=WORKERS, stats_out=stats)  # warm
    best = None
    for _ in range(3):
        st: dict = {}
        decode_batch_device(blobs, workers=WORKERS, stats_out=st)
        if best is None or st["total_s"] < best["total_s"]:
            best = st
    agg = pixels / best["total_s"] / 1e6

    # the serving comparison this path exists for: pixels must end up ON
    # THE DEVICE (feeding a jax model).  The host backend decodes fast but
    # then pays a serial RGBA upload; the device path pipelines its (often
    # narrower) coefficient uploads against entropy decode.  Same-run,
    # same-output-location numbers.
    host_serve_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        outs = decode_batch(blobs, workers=WORKERS, backend="numpy")
        dev = jax.device_put(np.stack(outs))
        dev.block_until_ready()
        host_serve_s = min(host_serve_s, time.perf_counter() - t0)
        del dev
    out = {
        "aggregate_mpixps": round(agg, 3),
        "images": n,
        "image_px": size,
        "backend": f"device-fused-{best.get('pack_kind', '?')}",
        "output": "device-resident RGBA (B,H,W,4) u8",
        "total_s": round(best["total_s"], 3),
        "entropy_wait_s": round(best["entropy_s"], 3),
        "pack_s": round(best["pack_s"], 3),
        "dispatch_block_s": round(best["dispatch_block_s"], 3),
        "upload_MB": round(best["upload_bytes"] / 1e6, 1),
        # same-run host decode + RGBA upload to the device (what a host
        # pipeline pays to feed a jax model): the serving head-to-head
        "host_serve_mpixps": round(pixels / host_serve_s / 1e6, 3),
        "serve_speedup_vs_host": round(host_serve_s / best["total_s"], 3),
    }
    if tunnel and tunnel.get("up_MBps"):
        floor = best["upload_bytes"] / 1e6 / tunnel["up_MBps"]
        out["tunnel_floor_s"] = round(floor, 3)
        out["fraction_of_tunnel_floor"] = round(
            floor / best["total_s"], 3)

    # ON-CHIP HF entropy variant (r4): raw section bytes upload + the
    # Pallas HF kernel decode, exact-match-checked against the pack path
    try:
        from j40_tpu.parallel.batch import decode_batch_device_hf

        ref = decode_batch_device(blobs[:16], workers=WORKERS, fetch=True)
        got = decode_batch_device_hf(blobs[:16], workers=WORKERS,
                                     fetch=True)
        exact = bool(np.array_equal(ref, got))
        bhf = None
        for _ in range(3):
            st: dict = {}
            decode_batch_device_hf(blobs, workers=WORKERS, stats_out=st)
            if bhf is None or st["total_s"] < bhf["total_s"]:
                bhf = st
        out["onchip_hf"] = {
            "aggregate_mpixps": round(pixels / bhf["total_s"] / 1e6, 3),
            "upload_MB": round(bhf["upload_bytes"] / 1e6, 1),
            "kernel_calls": bhf.get("kernel_calls"),
            "exact_match_vs_pack": exact,
        }
        if tunnel and tunnel.get("up_MBps"):
            out["onchip_hf"]["tunnel_floor_s"] = round(
                bhf["upload_bytes"] / 1e6 / tunnel["up_MBps"], 3)
    except Exception as e:
        out["onchip_hf"] = {"error": str(e)[:160]}
    return out



def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _bench_pallas_entropy() -> dict:
    """On-chip entropy decode probe (the r4 north-star artifact): 128
    shared-spec lanes through the Pallas symbol-loop kernel
    (ops/pallas_entropy.py), bit-exact vs the host oracle; reports total
    Msym/s at two sizes plus the marginal per-step cost with the ~24 ms
    dispatch floor subtracted out."""
    import jax
    import jax.numpy as jnp

    from j40_tpu.encode.bitwriter import BitWriter
    from j40_tpu.encode.entropy import EntropyEncoder
    from j40_tpu.entropy.code import read_code_spec
    from j40_tpu.io.bits import BitReader
    from j40_tpu.ops import pallas_entropy as pe

    rng = np.random.default_rng(42)
    S1, S2, L = 2400, 24000, 128
    lanes = [np.minimum((rng.pareto(1.2, size=S2) * 2).astype(np.int64),
                        60000) for _ in range(L)]
    enc = EntropyEncoder(1, use_prefix=False)
    for l, v in enumerate(lanes):
        enc.add_array(0, v, stream=l)
    streams = []
    spec = None
    for l in range(L):
        w = BitWriter()
        enc.write_spec(w)
        enc.write_tokens(w, stream=l)
        data = w.finish()
        r = BitReader(data)
        spec = read_code_spec(r, 1)
        streams.append((data, r.bits_consumed))

    # device inputs staged once: the metric is the KERNEL symbol rate
    # (upload cost is the tunnel probe's domain)
    inp = pe.build_lane_inputs(streams, spec)
    ns = np.zeros((1, pe.LANE), np.int32)
    ns[0, :L] = S2
    # three word buffers differing only in the ignored pad tail: repeated
    # identical invocations can be served from caches on this stack, so
    # each timed call gets a distinct input buffer
    words_v = []
    for k in range(3):
        w = inp["words"].copy()
        w[:, -1] = k
        words_v.append(jnp.asarray(w))
    rest = [jnp.asarray(inp["init"]), jnp.asarray(ns),
            jnp.asarray(inp["lut"]), jnp.asarray(inp["tok"]),
            jnp.asarray(inp["lsb"])]
    jax.block_until_ready(words_v + rest)

    # jax.block_until_ready is unreliable through the axon tunnel (it can
    # return before execution), so timings pipeline NLOOP calls and force
    # completion with a scalar fetch; the measured null-RTT is subtracted.
    NLOOP = 8

    def call(k, n):
        return pe._decode_pallas(
            words_v[k % len(words_v)], *rest, n_steps=n,
            use_prefix=inp["use_prefix"],
            prefix_width=inp["prefix_width"], wrows=inp["wrows"])

    def run(n):
        v, _ = call(0, n)
        int(np.asarray(v[0, 0]))  # compile + drain
        t0 = time.perf_counter()
        outs = [call(k, n) for k in range(NLOOP)]
        int(np.asarray(outs[-1][0][0, 0]))
        return (time.perf_counter() - t0) / NLOOP, outs[-1][0]

    # null round-trip: enqueue+fetch with no device work (warmed so no
    # compile lands in the timed region)
    tiny = jnp.zeros((1, 1), jnp.int32)
    add1 = jax.jit(lambda x: x + 1)
    int(np.asarray(add1(tiny)[0, 0]))
    rtt = min(
        _timed(lambda: int(np.asarray(add1(tiny)[0, 0]))) for _ in range(3))

    t1, v1 = run(S1)
    t2, v2 = run(S2)
    t1 = max(1e-6, t1 - rtt / NLOOP)
    t2 = max(1e-6, t2 - rtt / NLOOP)
    # bit-exactness vs the host oracle on one lane
    from j40_tpu.entropy.code import CodeState

    r = BitReader(streams[0][0])
    read_code_spec(r, 1)
    code = CodeState(spec)
    host = [code.code(r, 0) for _ in range(2000)]
    assert list(np.asarray(v2)[:2000, 0]) == host, "device mismatch"
    marginal_ns = max(0.01, (t2 - t1) / (S2 - S1) * 1e9)
    return {
        "lanes": L,
        "Msym_s_24k": round(L * S2 / t2 / 1e6, 1),
        "device_ms_per_24k_call": round(t2 * 1e3, 2),
        "marginal_ns_per_step": round(marginal_ns, 1),
        "marginal_Gsym_s": round(L / marginal_ns, 2),
        "bit_exact": True,
        "method": "pipelined x8 + forced scalar fetch, null-RTT subtracted",
    }



def _bench_hf_ctx(size: int = 2048) -> dict:
    """Multi-cluster context-model kernel probe (r5): one photo-density
    image encoded with a 5-cluster coefficient spec decodes its 64
    sections through the ctx kernel (full HF context chain in-kernel,
    ops/pallas_hf.py::_make_hf_ctx_kernel); the single-cluster twin of the
    same image runs the simple kernel for the head-to-head.  Device
    output is exact-match-checked against the host entropy decode."""
    import jax

    from j40_tpu.decode import Decoder
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct
    from j40_tpu.io.bits import ceil_lg
    from j40_tpu.ops import pallas_hf as ph
    from j40_tpu.ops.device_vardct import (YXB2XYB, _lane_bctx3,
                                           _prepare_hf_lane)

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    img = np.stack([
        (96 + 60 * np.sin(xx / 29) * np.cos(yy / 23)
         + 40 * np.sin((xx + yy) / 71) + 10 * np.sin(xx / (9 + 2 * c))
         + rng.normal(0, 0.7, (size, size)))
        for c in range(3)], -1).clip(0, 255).astype(np.uint8)

    out: dict = {}
    for key, k in (("ctx", 5), ("simple", 1)):
        p = CACHE / f"hfctx_{size}_{k}.jxl"
        if not p.exists():
            p.write_bytes(encode_vardct(
                img, VarDCTOptions(use_prefix=False, coeff_clusters=k)))
        d = Decoder(p.read_bytes(), backend="jax", max_passes=0)
        d.decode_frame(_defer_finish=True)
        f, toc, state = d._deferred
        vd = state.vardct
        spec = vd.coeff_codespec[0]
        preset_bits = ceil_lg(vd.num_hf_presets)
        lanes = [_prepare_hf_lane(d, state, f, vd, s, preset_bits)
                 for s in toc.sections if s.pass_ == 0]
        streams = [(ln.data, ln.bitoff) for ln in lanes]
        ncells = [ln.gw8 * ln.gh8 for ln in lanes]
        ncmax = int(max(ncells))
        orders_yxb = np.stack([
            np.asarray(vd.orders[0][0][YXB2XYB[c]], np.int32)
            for c in range(3)])
        if k > 1:
            bctx3 = [_lane_bctx3(vd, ln) for ln in lanes]
            gw8s = [ln.gw8 for ln in lanes]
            run = lambda: ph.decode_hf_ctx(
                streams, ncells, spec, orders_yxb, bctx3, gw8s,
                [0] * len(lanes), vd.nb_block_ctx, ncmax)
        else:
            run = lambda: ph.decode_hf_dct8(
                streams, ncells, spec, orders_yxb, ncmax)
        coeffs, st = run()
        assert st["done"].all() and not st["err"].any()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            coeffs, _ = run()
            jax.block_until_ready(coeffs)
            best = min(best, time.perf_counter() - t0)
        # exact-match vs the host entropy decode (positions 1..63)
        dh = Decoder(p.read_bytes(), backend="numpy")
        dh.decode_frame(_defer_finish=True)
        gg = dh._deferred[2].vardct.lf_groups[0]
        cn = np.asarray(coeffs)
        exact = True
        for li in (0, len(lanes) // 2, len(lanes) - 1):
            ln = lanes[li]
            sub = np.asarray(ln.gg.blocks[ln.gy8:ln.gy8 + ln.gh8,
                                          ln.gx8:ln.gx8 + ln.gw8])
            offs = np.asarray(gg.vb_coeffoff)[sub.ravel() & 0xFFFFF]
            for c in range(3):
                host = np.asarray(gg.coeffs[c])[
                    offs[:, None] + np.arange(64)[None, :]]
                if not np.array_equal(cn[li, c, :len(offs), 1:],
                                      host[:, 1:]):
                    exact = False
        out[key] = {"ms": round(best * 1e3, 1), "lanes": len(lanes),
                    "bytes": p.stat().st_size, "exact_vs_host": exact}
    out["ctx_vs_simple_time_ratio"] = round(
        out["ctx"]["ms"] / out["simple"]["ms"], 2)
    out["clusters"] = 5
    return out


def _bench_sharded_entropy(size: int = 1024) -> dict:
    """Single-chip TPU run of the SAME shard_map program the multichip
    dryrun validates on the virtual mesh (leg 5): per-shard raw-byte
    entropy decode with the PALLAS symbol-loop body + in-shard
    reconstruction (parallel/sharded_entropy.py).  Parity gate: exact
    plane equality vs the host decode."""
    import jax
    from jax.sharding import Mesh

    from j40_tpu.encode.encoder import EncodeOptions, encode_modular
    from j40_tpu.parallel.sharded_entropy import (
        decode_modular_sections_sharded)

    rng = np.random.default_rng(11)
    img = (np.cumsum(rng.integers(-1, 2, size=(size, size, 3)), axis=1)
           % 180 + 30).astype(np.uint8)
    p = CACHE / f"shent_{size}.jxl"
    if not p.exists():
        p.write_bytes(encode_modular(img, options=EncodeOptions(
            global_tree=True, use_prefix=False, group_size_shift=7)))
    blob = p.read_bytes()
    mesh = Mesh(np.asarray(jax.devices()[:1], dtype=object), ("rows",))

    planes, lanes, dec = decode_modular_sections_sharded(
        blob, mesh=mesh, axis="rows", use_pallas=True)
    gm = dec._deferred[2].gmodular
    exact = True
    for k, ln in enumerate(lanes):
        for c, (gi, x0, y0, w, h) in enumerate(ln.picks):
            ref = np.asarray(gm.channels[gi].data[y0:y0 + h, x0:x0 + w])
            if not np.array_equal(planes[k, c], ref):
                exact = False
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        decode_modular_sections_sharded(blob, mesh=mesh, axis="rows",
                                        use_pallas=True)
        best = min(best, time.perf_counter() - t0)
    return {
        "sections": len(lanes), "bytes": len(blob), "exact": exact,
        "mpixps": round(size * size / best / 1e6, 3),
        "note": "incl. host reference decode + upload; kernel body = "
                "Pallas symbol loop inside shard_map",
    }


def _bench_serving_photo(n: int = 64, size: int = 512,
                         tunnel: dict | None = None) -> dict:
    """Serving head-to-head on photographic-density content (~2 bpp at the
    encoder's quant — the BASELINE "d1.0" regime; the batch64 corpus is
    noise-like at ~15 bpp, which biases against entropy-bound paths):
    pack-and-upload vs on-chip HF entropy decode, device-resident RGBA,
    exact-match-checked."""
    from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct
    from j40_tpu.parallel.batch import (
        decode_batch_device, decode_batch_device_hf)

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    blobs = []
    for i in range(n):
        p = CACHE / f"photo_{size}_{i}.jxl"
        if not p.exists():
            base = (96 + 60 * np.sin(xx / (31.0 + i % 7)) *
                    np.cos(yy / (23.0 + i % 5))
                    + 40 * np.sin((xx + yy) / (71.0 + i % 11)))
            img = np.stack([
                base + 10 * np.sin(xx / (9.0 + 2 * c)) +
                rng.normal(0, 0.7, size=(size, size))
                for c in range(3)
            ], axis=-1).clip(0, 255).astype(np.uint8)
            p.write_bytes(encode_vardct(img, VarDCTOptions(use_prefix=False)))
        blobs.append(p.read_bytes())
    pixels = n * size * size

    ref = decode_batch_device(blobs[:16], workers=WORKERS, fetch=True)
    got = decode_batch_device_hf(blobs[:16], workers=WORKERS, fetch=True)
    exact = bool(np.array_equal(ref, got))

    out = {"images": n, "image_px": size, "exact_match": exact,
           "corpus_MB": round(sum(len(b) for b in blobs) / 1e6, 1)}
    for name, fn in (("pack", decode_batch_device),
                     ("onchip_hf", decode_batch_device_hf)):
        best = None
        ub = 0
        for _ in range(3):
            st: dict = {}
            t0 = time.perf_counter()
            arr = fn(blobs, workers=WORKERS, stats_out=st)
            # force completion: block_until_ready is unreliable through
            # the axon tunnel, a scalar fetch is not
            int(np.asarray(arr[0, 0, 0, 0]))
            dt = time.perf_counter() - t0
            ub = st["upload_bytes"]
            if best is None or dt < best:
                best = dt
        out[name] = {
            "aggregate_mpixps": round(pixels / best / 1e6, 3),
            "upload_MB": round(ub / 1e6, 1),
        }
        if tunnel and tunnel.get("up_MBps"):
            out[name]["tunnel_floor_s"] = round(
                ub / 1e6 / tunnel["up_MBps"], 3)
    return out


def _bench_tunnel() -> dict:
    """Host<->device link probe: every end-to-end device number on this dev
    host is bounded by the axon TPU tunnel, not the chip.  Records the
    achievable bandwidth and per-dispatch latency so the vardct/batch
    figures can be read against their transfer floor (a production PCIe
    host moves the same tensors ~500x faster)."""
    import jax

    import jax.numpy as jnp

    a = np.random.randint(0, 127, (3, 65536, 64), dtype=np.int8)  # 12.6 MB
    red = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    red(jax.device_put(a)).block_until_ready()  # compile
    up, down = [], []
    for _ in range(3):
        a[0, 0, 0] += 1  # defeat any staging/caching of the host buffer
        t0 = time.perf_counter()
        d = jax.device_put(a)
        int(red(d))  # scalar fetch forces the upload through the tunnel
        t1 = time.perf_counter()
        np.asarray(d)
        t2 = time.perf_counter()
        up.append(a.nbytes / 1e6 / (t1 - t0))
        down.append(a.nbytes / 1e6 / (t2 - t1))

    f = jax.jit(lambda x: x + 1)
    s = jnp.float32(1.0)
    f(s).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        f(s).block_until_ready()
    rtt_ms = (time.perf_counter() - t0) / 10 * 1000
    return {
        "up_MBps": round(max(up), 1),
        "down_MBps": round(max(down), 1),
        "dispatch_rtt_ms": round(rtt_ms, 1),
        "probe_MB": round(a.nbytes / 1e6, 1),
    }


def _bench_device_compute(size: int = 1024) -> dict:
    """Device-compute-only throughput of the fused reconstruction kernel
    (inputs device-resident, min-of-10 with block_until_ready): what the
    chip does once the transfer floor is removed.  Also reports MFU against
    a measured dense-matmul ceiling at the same f32 HIGHEST precision."""
    import jax
    import jax.numpy as jnp

    h8 = w8 = size // 8
    n = h8 * w8
    rng = np.random.default_rng(0)
    weights = jax.device_put(np.abs(rng.normal(size=(64, 3))).astype(np.float32) + 0.5)
    consts = jax.device_put(
        np.concatenate([
            [1.0, 1.0, 1.0, 0.5, 0.5, 0.5, 0.2, 0.0],
            np.eye(3).ravel(), [0.003, 0.003, 0.003], [1.0, 255.0],
        ]).astype(np.float32)
    )
    # the ~33ms tunnel dispatch RTT swallows any single kernel call, so K
    # reconstructions are chained inside ONE dispatch (the sample plane is
    # relaid out to the coefficient layout between iterations to force the
    # dependency) and the per-iteration time is (T_K - T_0) / K
    from j40_tpu.ops.pallas_kernels import reconstruct_dct8_pallas

    K = 256  # large enough that K iterations dwarf dispatch-RTT jitter
    fcoeffs = jax.device_put(
        rng.integers(-90, 90, (3, n, 64)).astype(np.float32)
    )
    llf = jax.device_put(rng.normal(size=(3, n)).astype(np.float32))
    s3 = [jax.device_put(rng.normal(size=(n,)).astype(np.float32))
          for _ in range(3)]

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(c, iters):
        def body(_, cc):
            plane = reconstruct_dct8_pallas(
                cc, llf, s3[0], s3[1], s3[2], weights, consts[:8], h8, w8
            )
            return (
                plane.reshape(3, h8, 8, w8, 8)
                .transpose(0, 1, 3, 2, 4)
                .reshape(3, n, 64)
                * 1e-3  # keep magnitudes bounded across iterations
            )
        return jax.lax.fori_loop(0, iters, body, c)

    chain(fcoeffs, 1).block_until_ready()
    chain(fcoeffs, K).block_until_ready()
    t1 = t_k = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        chain(fcoeffs, 1).block_until_ready()
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        chain(fcoeffs, K).block_until_ready()
        t_k = min(t_k, time.perf_counter() - t0)
    dt = max((t_k - t1) / (K - 1), 1e-9)
    mpixps = size * size / dt / 1e6
    kernel_flops = 3 * n * 64 * 64 * 2  # the IDCT matmul (dominant term)

    # measured dense-matmul ceiling at the same precision, same chaining
    m = 2048
    x = jax.device_put((rng.normal(size=(m, m)) / m).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def mmchain(y, iters):
        def body(_, yy):
            return jnp.dot(yy, x, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.fori_loop(0, iters, body, y)

    mmchain(x, 1).block_until_ready()
    mmchain(x, K).block_until_ready()
    m1 = mk = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        mmchain(x, 1).block_until_ready()
        m1 = min(m1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        mmchain(x, K).block_until_ready()
        mk = min(mk, time.perf_counter() - t0)
    peak_flops_s = 2 * m**3 * (K - 1) / max(mk - m1, 1e-9)

    # measured HBM copy ceiling (the kernel is bandwidth-bound, not
    # MXU-bound: each coefficient is read once and each sample written once,
    # so the roofline that matters is bytes/s, not FLOP/s)
    big = 1 << 24  # 16M f32 = 64 MiB
    z = jax.device_put((rng.normal(size=(big,)) * 1e-3).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def bwchain(y, iters):
        # roll forces a genuine read+write memory pass per iteration — a
        # pure elementwise body would fuse into a single pass over the chain
        return jax.lax.fori_loop(
            0, iters, lambda _, yy: jnp.roll(yy, 1) * 1.000001, y
        )

    bwchain(z, 1).block_until_ready()
    bwchain(z, K).block_until_ready()
    b1 = bk = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        bwchain(z, 1).block_until_ready()
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        bwchain(z, K).block_until_ready()
        bk = min(bk, time.perf_counter() - t0)
    hbm_ceiling = 2 * big * 4 * (K - 1) / max(bk - b1, 1e-9)  # read + write

    # the production dispatch: one fused Pallas kernel from raw coefficients
    # to quantized sRGB (dequant+CfL+IDCT+XYB in block layout)
    from j40_tpu.ops.pallas_kernels import reconstruct_dct8_full

    exc_i = jax.device_put(np.zeros(64, np.int32))
    exc_v = jax.device_put(np.zeros(64, np.int32))
    aux = jax.device_put(
        np.abs(rng.normal(size=(6, n))).astype(np.float32) * 0.05 + 0.01)
    c22 = jax.device_put(np.concatenate([
        [2.0, 0.8, 1.2, 0.94, 0.98, 0.94, 0.22, 0.0],
        np.eye(3).ravel() * 4.0, [0.0038] * 3, [1.0, 255.0],
    ]).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def fullchain(c, iters):
        def body(_, cc):
            out = reconstruct_dct8_full(
                cc, exc_i, exc_v, aux, weights, c22, h8, w8, to_u8=True)
            dep = out[:3].astype(jnp.float32)
            return (
                dep.reshape(3, h8, 8, w8, 8)
                .transpose(0, 1, 3, 2, 4)
                .reshape(3, n, 64) * 1e-3
            )
        return jax.lax.fori_loop(0, iters, body, c)

    fullchain(fcoeffs, 1).block_until_ready()
    fullchain(fcoeffs, K).block_until_ready()
    f1 = fk = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        fullchain(fcoeffs, 1).block_until_ready()
        f1 = min(f1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        fullchain(fcoeffs, K).block_until_ready()
        fk = min(fk, time.perf_counter() - t0)
    dt_full = max((fk - f1) / (K - 1), 1e-9)

    # per chained iteration the kernel reads coeffs + writes samples and the
    # inter-iteration relayout reads + writes the same volume again
    per_iter_bytes = 4 * (3 * n * 64 * 4)
    kernel_bw = per_iter_bytes / dt
    return {
        "mpixps": round(mpixps, 1),
        "kernel_time_us": round(dt * 1e6, 1),
        "kernel_tflops": round(kernel_flops / dt / 1e12, 3),
        "measured_matmul_ceiling_tflops": round(peak_flops_s / 1e12, 1),
        "mfu_vs_ceiling": round(kernel_flops / dt / peak_flops_s, 4),
        "kernel_GBps": round(kernel_bw / 1e9, 1),
        "measured_hbm_ceiling_GBps": round(hbm_ceiling / 1e9, 1),
        "hbm_roofline_fraction": round(kernel_bw / hbm_ceiling, 4),
        "fused_to_srgb_us": round(dt_full * 1e6, 1),
        "fused_to_srgb_mpixps": round(size * size / dt_full / 1e6, 1),
        "image_px": size,
    }


def _bench_device_filters(size: int = 1024) -> dict:
    """Head-to-head: Pallas stripe EPF kernel vs the fused XLA chain on a
    3-step 1MP EPF (chained timing, min-of-4).  The faster path is what
    Decoder(apply_filters=True) uses on the device."""
    import jax

    from j40_tpu.ops.filters import _epf_steps_jit
    from j40_tpu.ops.pallas_filters import epf_pallas

    rng = np.random.default_rng(2)
    H = W = size
    ch = jax.device_put(rng.normal(size=(3, H, W)).astype(np.float32) * 50)
    rs = jax.device_put(
        np.abs(rng.normal(size=(H, W))).astype(np.float32) + 0.5)
    kw = dict(iters=3, channel_scale=(40.0, 5.0, 3.5), p0_scale=0.9,
              p2_scale=6.5, border_sad_mul=2.78)
    xla = _epf_steps_jit()
    K = 64

    def timed(step):
        @functools.partial(jax.jit, static_argnames=("iters_",))
        def chain(c, iters_):
            return jax.lax.fori_loop(
                0, iters_, lambda _, cc: step(cc) * 0.999, c)

        chain(ch, 1).block_until_ready()
        chain(ch, K).block_until_ready()
        t1 = tk = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            chain(ch, 1).block_until_ready()
            t1 = min(t1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            chain(ch, K).block_until_ready()
            tk = min(tk, time.perf_counter() - t0)
        return max((tk - t1) / (K - 1), 1e-9)

    dt_x = timed(lambda c: xla(c, rs, **kw))
    dt_p = timed(lambda c: epf_pallas(c, rs, **kw))
    return {
        "epf3_xla_us": round(dt_x * 1e6, 1),
        "epf3_pallas_us": round(dt_p * 1e6, 1),
        "pallas_speedup": round(dt_x / dt_p, 3),
        "image_px": size,
    }


def main() -> None:
    sys.path.insert(0, str(REPO))
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from j40_tpu.encode.advanced import AdvancedOptions, encode_modular_advanced
    from j40_tpu.encode.encoder import encode_modular
    from j40_tpu.encode.modular_enc import branch, leaf
    from j40_tpu.encode.vardct_enc import encode_vardct

    CACHE.mkdir(exist_ok=True)
    img = _test_image(SIZE, SIZE)

    # 'auto' lets the decoder's execution planner pick per stream (native
    # host plan vs device plan); the tunnel/device_compute probes below
    # record what the device side can do so the choice is auditable
    device_backend = os.environ.get("BENCH_BACKEND", "auto")
    have_device = _device_available()
    if device_backend == "jax" and not have_device:
        print("# TPU unreachable; vardct falls back to the numpy backend",
              file=sys.stderr)
        device_backend = "numpy"

    # name -> (path, encode fn, backend, (w, h))
    def mod_simple():
        return encode_modular(img)

    def mod_e3():
        # MA-tree stream exercising the weighted predictor: WP-error-gated
        # split, WP and gradient leaves (cjxl -e3 shape; no single-leaf
        # fast path on either side)
        tree = [branch(15, 0, 1, 2), leaf(6), leaf(5)]
        return encode_modular_advanced(img, options=AdvancedOptions(tree=tree))

    def vd_1mp():
        return encode_vardct(img)

    def vd_12mp():
        # mixed DctSelect layout + Lehmer-permuted HF orders + custom
        # dequant matrices (config-4 "variable blocks, HF ordering"): flat
        # bands placed so the greedy chooser emits all four merge classes
        # (DCT32X32 / DCT16X16 / DCT8X16 / DCT16X8) alongside DCT8x8
        from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct_mixed

        img12 = _test_image(4096, 3072, seed=777)
        flat = img12[10, 10]
        img12[:768, :1024] = flat            # 96x128 cells  -> DCT32X32
        img12[800:816, 1024:2048] = flat     # 2-cell band   -> DCT16X16
        img12[824:832, 2048:3072] = flat     # 1-cell band   -> DCT8X16
        for x8 in range(384, 512, 2):        # 2x1 flat cols -> DCT16X8
            # odd columns stay noisy so no 2x2-cell merge can form
            img12[848:864, x8 * 8 : x8 * 8 + 8] = flat
        stats: dict = {}
        data = encode_vardct_mixed(
            img12,
            options=VarDCTOptions(custom_order=True, custom_dq=True),
            stats_out=stats)
        print(f"# vardct_12mp mix: {stats['dctsel_counts']}", file=sys.stderr)
        return data

    specs = {
        "modular": ("modular", mod_simple, "numpy", (SIZE, SIZE)),
        "modular_e3": ("modular_e3", mod_e3, "numpy", (SIZE, SIZE)),
        "vardct": (f"vardct", vd_1mp, device_backend, (SIZE, SIZE)),
        "vardct_12mp": ("vardct_12mp_mix4", vd_12mp, device_backend,
                        (4096, 3072)),
    }
    if ONLY:
        specs = {k: v for k, v in specs.items() if k in ONLY}

    dj40 = _ensure_dj40()
    configs: dict[str, dict] = {}
    stages: dict[str, dict] = {}
    for name, (stem, enc, backend, (w, h)) in specs.items():
        path = CACHE / f"{stem}_{w}x{h}.jxl"
        if not path.exists():
            path.write_bytes(enc())
        data = path.read_bytes()
        pixels = w * h
        ours, stats, resolved = _time_ours(data, backend)
        entry = {"ours_mpixps": round(ours, 3), "backend": resolved}
        # single-thread number: apples-to-apples vs the single-threaded
        # dj40 (the N-thread headline additionally exploits the format's
        # per-section independence, which dj40 deliberately leaves on the
        # table — j40.h:447)
        ours_1t, _, _ = _time_ours(data, backend, workers=1)
        entry["ours_1thread_mpixps"] = round(ours_1t, 3)
        if dj40 is not None:
            ref = _time_dj40(dj40, path, pixels)
            entry["dj40_mpixps"] = round(ref, 3)
            entry["ratio"] = round(ours / ref, 3)
            entry["ratio_1thread"] = round(ours_1t / ref, 3)
        configs[name] = entry
        stage_keys = ("headers_s", "sections_s", "reconstruct_s", "render_s",
                      "total_s")
        stages[name] = {
            k: round(v, 4) for k, v in stats.items()
            if k in stage_keys or k.endswith("_s")
        }
        print(f"# {name}: ours {ours:.2f} Mpix/s ({backend}), dj40 "
              f"{entry.get('dj40_mpixps', float('nan'))} Mpix/s", file=sys.stderr)

    out: dict = {}
    if have_device and (not ONLY or "device" in ONLY):
        out["tunnel"] = _bench_tunnel()
        print(f"# tunnel: {out['tunnel']}", file=sys.stderr)
        out["device_compute"] = _bench_device_compute()
        print(f"# device_compute: {out['device_compute']}", file=sys.stderr)
        try:
            out["device_filters"] = _bench_device_filters()
            print(f"# device_filters: {out['device_filters']}",
                  file=sys.stderr)
        except Exception as e:  # keep the bench robust to kernel regressions
            print(f"# device_filters probe failed: {e}", file=sys.stderr)
        if "vardct" in specs:
            # ANS-coded variant of the vardct leg (cjxl's default coder; the
            # corpus uses prefix): auxiliary ratio, not in the geomean
            try:
                from j40_tpu.encode.vardct_enc import VarDCTOptions, encode_vardct

                pa = CACHE / f"vardct_ans_{SIZE}x{SIZE}.jxl"
                if not pa.exists():
                    pa.write_bytes(
                        encode_vardct(img, VarDCTOptions(use_prefix=False)))
                ours_a, _, _ = _time_ours(pa.read_bytes(), "numpy")
                ref_a = _time_dj40(dj40, pa, SIZE * SIZE) if dj40 else None
                out["vardct_ans"] = {
                    "ours_mpixps": round(ours_a, 3),
                    "dj40_mpixps": round(ref_a, 3) if ref_a else None,
                    "ratio": round(ours_a / ref_a, 3) if ref_a else None,
                }
                print(f"# vardct_ans: {out['vardct_ans']}", file=sys.stderr)
            except Exception as e:
                print(f"# vardct_ans probe failed: {e}", file=sys.stderr)
            # device END-TO-END on the same stream (not in the geomean: the
            # planner picks the host plan on this topology, but the device
            # number must stay a recorded artifact, not an assertion)
            ve2e, _, _ = _time_ours(
                (CACHE / f"vardct_{SIZE}x{SIZE}.jxl").read_bytes(), "jax"
            )
            out["vardct_device_e2e_mpixps"] = round(ve2e, 3)
            print(f"# vardct device e2e: {ve2e:.2f} Mpix/s", file=sys.stderr)
            try:
                # r4: full backend="device" decode — pass sections entropy-
                # decoded ON CHIP (ops/pallas_hf.py) when eligible
                vhf, _, _ = _time_ours(
                    (CACHE / f"vardct_ans_{SIZE}x{SIZE}.jxl").read_bytes(),
                    "device")
                out["vardct_device_hf_e2e_mpixps"] = round(vhf, 3)
                print(f"# vardct device on-chip-HF e2e: {vhf:.2f} Mpix/s",
                      file=sys.stderr)
            except Exception as e:
                print(f"# device hf e2e probe failed: {e}", file=sys.stderr)
        try:
            out["pallas_entropy"] = _bench_pallas_entropy()
            print(f"# pallas_entropy: {out['pallas_entropy']}",
                  file=sys.stderr)
        except Exception as e:
            print(f"# pallas_entropy probe failed: {e}", file=sys.stderr)
        try:
            out["hf_ctx"] = _bench_hf_ctx()
            print(f"# hf_ctx: {out['hf_ctx']}", file=sys.stderr)
        except Exception as e:
            print(f"# hf_ctx probe failed: {e}", file=sys.stderr)
        try:
            out["sharded_entropy"] = _bench_sharded_entropy()
            print(f"# sharded_entropy: {out['sharded_entropy']}",
                  file=sys.stderr)
        except Exception as e:
            print(f"# sharded_entropy probe failed: {e}", file=sys.stderr)
        if "modular_e3" in specs:
            # r5: the e3 stream's GENERATOR TWIN (same neighbor-property
            # WP tree, emitted with a global tree + ANS — the cjxl -e3
            # shape) on DEVICE lanes: context-free token decode through
            # the Pallas symbol loop + the in-wavefront tree walk
            # (VERDICT r4 weak #4); head-to-head vs the host numbers
            # recorded in configs.modular_e3
            try:
                from j40_tpu.decode import Decoder as _D
                from j40_tpu.encode.advanced import (
                    AdvancedOptions as _AO,
                    encode_modular_advanced as _ema)
                from j40_tpu.encode.modular_enc import branch, leaf

                e3p = CACHE / f"modular_e3gt_{SIZE}x{SIZE}.jxl"
                if not e3p.exists():
                    e3p.write_bytes(_ema(img, options=_AO(
                        tree=[branch(15, 0, 1, 2), leaf(6), leaf(5)],
                        use_prefix=False, global_tree=True)))
                e3b = e3p.read_bytes()
                d = _D(e3b, backend="device")
                d.decode_frame()
                ref = d.render_rgba8()
                dm = dict(d.stats.get("device_modular") or {})
                dh = _D(e3b, backend="numpy")
                dh.decode_frame()
                exact = bool(np.array_equal(ref, dh.render_rgba8()))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    d = _D(e3b, backend="device")
                    d.decode_frame()
                    d.render_rgba8()
                    best = min(best, time.perf_counter() - t0)
                out["modular_e3_device"] = {
                    "mpixps": round(SIZE * SIZE / best / 1e6, 3),
                    "ntree_lanes": dm.get("ntree_lanes"),
                    "kernel": dm.get("kernel"),
                    "exact_vs_host": exact,
                    "host_1thread_mpixps": configs.get(
                        "modular_e3", {}).get("ours_1thread_mpixps"),
                }
                print(f"# modular_e3_device: {out['modular_e3_device']}",
                      file=sys.stderr)
            except Exception as e:
                print(f"# modular_e3_device probe failed: {e}",
                      file=sys.stderr)
    if not ONLY or "batch64" in ONLY:
        out["batch64"] = _bench_batch64(device_backend)
        print(f"# batch64: {out['batch64']}", file=sys.stderr)
        if have_device:
            try:
                out["batch64_device"] = _bench_batch64_device(
                    tunnel=out.get("tunnel"))
                print(f"# batch64_device: {out['batch64_device']}",
                      file=sys.stderr)
            except Exception as e:
                print(f"# batch64_device probe failed: {e}", file=sys.stderr)
            try:
                out["serving_photo"] = _bench_serving_photo(
                    tunnel=out.get("tunnel"))
                print(f"# serving_photo: {out['serving_photo']}",
                      file=sys.stderr)
            except Exception as e:
                print(f"# serving_photo probe failed: {e}", file=sys.stderr)

    rated = [c for c in configs.values() if "ratio" in c]
    value = math.exp(
        sum(math.log(c["ours_mpixps"]) for c in configs.values()) / len(configs)
    ) if configs else 0.0
    vs_baseline = math.exp(
        sum(math.log(c["ratio"]) for c in rated) / len(rated)
    ) if rated else 0.0

    out = {
        "metric": (
            "decode Mpix/s/chip, geomean over BASELINE configs "
            f"{sorted(configs)} ({WORKERS} host threads)"
        ),
        "value": round(value, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(vs_baseline, 3),
        "configs": configs,
        "stages": stages,
        **out,
    }
    # full detail to a sidecar file; stdout gets ONE compact JSON line
    # (driver tails are finite — r4's full line truncated unparseably)
    try:
        (REPO / "BENCH_DETAIL.json").write_text(json.dumps(out, indent=1))
    except OSError:
        pass
    print(json.dumps(_compact(out)), flush=True)


_KEEP = {
    "configs": {"ours_mpixps", "dj40_mpixps", "ratio", "ratio_1thread",
                "backend"},
    "batch64": {"aggregate_mpixps", "efficiency_vs_1stream", "backend"},
    "batch64_device": {"aggregate_mpixps", "upload_MB", "tunnel_floor_s",
                       "serve_speedup_vs_host", "onchip_hf"},
    "serving_photo": {"pack", "onchip_hf", "exact_match", "images",
                      "image_px"},
    "onchip_hf": {"aggregate_mpixps", "upload_MB", "tunnel_floor_s",
                  "exact_match_vs_pack"},
    "pack": {"aggregate_mpixps", "upload_MB", "tunnel_floor_s"},
    "pallas_entropy": {"Msym_s_24k", "marginal_ns_per_step", "bit_exact"},
    "hf_ctx": {"ctx", "simple", "ctx_vs_simple_time_ratio", "clusters"},
    "sharded_entropy": {"sections", "exact", "mpixps"},
    "modular_e3_device": {"mpixps", "ntree_lanes", "exact_vs_host",
                          "host_1thread_mpixps"},
    "ctx": {"ms", "lanes", "exact_vs_host"},
    "simple": {"ms", "lanes", "exact_vs_host"},
    "device_compute": {"mpixps", "hbm_roofline_fraction",
                       "fused_to_srgb_mpixps"},
    "tunnel": {"up_MBps", "down_MBps", "dispatch_rtt_ms"},
    "device_filters": {"pallas_speedup"},
    "vardct_ans": {"ours_mpixps", "dj40_mpixps", "ratio"},
}


def _compact(out: dict) -> dict:
    """Trim the bench dict to the headline numbers (full detail is in
    BENCH_DETAIL.json); nested dicts keep only their _KEEP keys."""

    def trim(d, keep):
        r = {}
        for k, v in d.items():
            if isinstance(v, dict):
                if k in ("stages",):
                    continue
                sub = trim(v, _KEEP.get(k, keep))
                if sub:
                    r[k] = sub
            elif keep is None or k in keep:
                r[k] = v
        return r

    top = {"metric", "value", "unit", "vs_baseline",
           "vardct_device_e2e_mpixps", "vardct_device_hf_e2e_mpixps"}
    c = {k: v for k, v in trim(out, None).items()
         if isinstance(v, dict) or k in top}
    c["detail"] = "BENCH_DETAIL.json"
    return c


if __name__ == "__main__":
    main()
