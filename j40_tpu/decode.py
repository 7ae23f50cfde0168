"""Top-level decode driver (reference call stack: j40.h:8146-8220).

Host-side orchestration: container → headers → TOC → per-section decode.
Each bitstream section is decoded from an independent byte slice
(`j40.h:7752-7776` isolation semantics), which is what the sharded TPU
pipeline exploits; the VarDCT sample reconstruction runs on device
(j40_tpu.vardct / j40_tpu.ops).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .errors import Unsupported, check
from .headers.frame import FRAME_REGULAR, FrameHeader, read_frame_header, read_toc
from .headers.image import CSpace, read_image_metadata, read_signature
from .headers.icc import read_icc
from .io.bits import BitReader
from .io.container import parse_container
from .limits import MAIN_LV5, Limits
from .modular.decode import ModularImage


@dataclass
class Frame:
    header: FrameHeader
    gmodular: ModularImage
    # rendered outputs
    rgba: np.ndarray | None = None  # (h, w, 4) uint8


class Decoder:
    """Decodes a JPEG XL codestream (Modular and VarDCT frames)."""

    def __init__(self, data: bytes, limits: Limits = MAIN_LV5, backend: str = "numpy",
                 apply_filters: bool = False, workers: int = 1):
        self.backend = backend
        self.apply_filters = apply_filters
        self.workers = workers
        #: per-stage wall times and stream facts, filled by decode_frame
        self.stats: dict = {}
        self.container = parse_container(data)
        self.codestream = self.container.codestream
        self.limits = limits
        r = BitReader(self.codestream)
        read_signature(r)
        self.image = read_image_metadata(r, limits)
        if self.image.want_icc:
            self.image.icc = read_icc(r)
        self.r = r
        self.frame: Frame | None = None

    # -- frame decoding ----------------------------------------------------

    def decode_frame(self) -> Frame:
        import time

        t0 = time.perf_counter()
        im = self.image
        r = self.r
        f = read_frame_header(r, im, self.limits)
        if f.type != FRAME_REGULAR or not f.is_last:
            raise Unsupported(message="only single regular frames supported")
        toc = read_toc(r, f)
        self.stats.update(
            headers_s=time.perf_counter() - t0,
            codestream_bytes=len(self.codestream),
            frame=f"{f.width}x{f.height}",
            mode="modular" if f.is_modular else "vardct",
            num_groups=f.num_groups,
            num_lf_groups=f.num_lf_groups,
            num_passes=f.num_passes,
            sections=len(toc.sections),
        )
        t_sections = time.perf_counter()

        from .frame_state import FrameState

        state = FrameState(im, f, self.limits)
        state.backend = self.backend
        state.apply_filters = self.apply_filters

        if toc.single_size:
            # everything decoded inline from the main reader (j40.h:8194-8200)
            state.lf_global(r)
            if not f.is_modular:
                state.hf_global(r)
            state.lf_group(r, 0)
            for pass_ in range(f.num_passes):
                state.pass_group(r, pass_, 0)
            r.zero_pad_to_byte()
            codeoff = r.bits_consumed // 8
            check(codeoff == toc.end_codeoff, "shrt" if codeoff < toc.end_codeoff else "excs")
        else:
            state.lf_global(self._section_reader(toc.lf_global_codeoff, toc.lf_global_size))
            if f.is_modular:
                check(toc.hf_global_size == 0, "excs")
            else:
                state.hf_global(
                    self._section_reader(toc.hf_global_codeoff, toc.hf_global_size)
                )
            lf_sections = [s for s in toc.sections if s.pass_ < 0]
            pg_sections = [s for s in toc.sections if s.pass_ >= 0]
            for s in lf_sections:
                sr = self._section_reader(s.codeoff, s.size)
                state.lf_group(sr, s.idx)
                sr.no_more_bytes()

            def _one_pass_group(s):
                sr = self._section_reader(s.codeoff, s.size)
                state.pass_group(sr, s.pass_, s.idx)
                sr.no_more_bytes()

            if self.workers > 1 and len(pg_sections) > 1:
                # per-section isolation (independent entropy streams, disjoint
                # output regions; j40.h:7752-7776) makes group decode
                # embarrassingly parallel; the native core releases the GIL
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.workers) as ex:
                    list(ex.map(_one_pass_group, pg_sections))
            else:
                for s in pg_sections:
                    _one_pass_group(s)

        self.stats["sections_s"] = time.perf_counter() - t_sections
        t_finish = time.perf_counter()
        state.finish()
        self.stats["reconstruct_s"] = time.perf_counter() - t_finish
        self.stats["total_s"] = time.perf_counter() - t0
        self.frame = Frame(header=f, gmodular=state.gmodular)
        return self.frame

    def _section_reader(self, codeoff: int, size: int) -> BitReader:
        check(codeoff + size <= len(self.codestream), "shrt")
        return BitReader(self.codestream[codeoff : codeoff + size])

    # -- rendering ---------------------------------------------------------

    def render_rgba8(self) -> np.ndarray:
        """Render the decoded frame to (h, w, 4) uint8 RGBA, matching the
        reference's clamp+scale semantics (j40.h:7910-7962)."""
        im = self.image
        f = self.frame
        assert f is not None
        gm = f.gmodular
        check(im.bpp >= 8, "TODO", "<8bpp render")
        check(im.exp_bits == 0, "TODO", "float samples")
        h, w = f.header.height, f.header.width
        maxpixel = (1 << im.bpp) - 1
        half = 1 << (im.bpp - 1)

        # grayscale modular frames have a single color channel (the reference
        # rejects these; we replicate it across RGB)
        ncolor = 1 if (im.cspace is CSpace.GREY and not im.xyb_encoded) else 3
        planes = [gm.channels[min(i, ncolor - 1)].data for i in range(3)]
        alpha = None
        for i in range(ncolor, gm.num_channels):
            ec = im.ec_info[i - ncolor]
            if ec.type == 0:  # alpha
                alpha = gm.channels[i].data
                break

        out = np.empty((h, w, 4), dtype=np.uint8)
        for i in range(4):
            src = planes[i] if i < 3 else alpha
            if src is None:
                out[:, :, i] = 255
            elif im.bpp == 8:
                # (p*255 + 128) // 255 == p for p in [0, 255]
                out[:, :, i] = np.clip(src, 0, 255).astype(np.uint8)
            else:
                p = np.clip(src, 0, maxpixel).astype(np.int64)
                out[:, :, i] = ((p * 255 + half) // maxpixel).astype(np.uint8)
        return out


def decode_file(path_or_bytes, backend: str = "numpy") -> tuple[Decoder, np.ndarray]:
    data = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else open(path_or_bytes, "rb").read()
    )
    dec = Decoder(bytes(data), backend=backend)
    dec.decode_frame()
    rgba = dec.render_rgba8()
    dec.frame.rgba = rgba
    return dec, rgba
