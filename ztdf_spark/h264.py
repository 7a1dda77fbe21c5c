"""Pure-Python H.264/AVC (ITU-T Rec. H.264, public spec) baseline codec
over I_PCM macroblocks — real Annex-B bitstreams, really parsed.

H.264's I_PCM macroblock type (spec §7.3.5 / §8.3.5) carries RAW luma and
chroma samples inside a fully conformant bitstream: no prediction, no
transform, no entropy-coded residuals — the spec's own escape hatch for
incompressible content. An I_PCM-only encoder therefore produces streams
any conformant decoder plays, and an I_PCM-only decoder exercises every
REAL layer above the residual math:

- Annex-B framing: start codes, NAL headers, and emulation-prevention
  escaping (00 00 0x -> 00 00 03 0x) — round-tripped, and genuinely
  exercised because zero-runs in PCM samples force escape insertion.
- Exp-Golomb ue(v)/se(v) bit coding for every header field.
- SPS: profile/level, frame geometry in macroblocks, frame cropping
  (4:2:0 crop units), and VUI timing (num_units_in_tick/time_scale) —
  the stream's REAL frame rate, used by mmops.sample_frames.
- PPS and per-IDR slice headers (frame_num, idr_pic_id,
  dec_ref_pic_marking, slice_qp_delta, deblocking control).
- Macroblock layer: mb_type, pcm_alignment_zero_bits, raw sample planes
  in macroblock raster order.

Every frame is an IDR (keyframe-only — each independently decodable, the
property frame-sampling at 100 TB wants). Non-I_PCM macroblock types
(CAVLC/CABAC residual coding) raise ``NotImplementedError`` — the honest
boundary, same contract as the arithmetic-JPEG branch in jpeg.py.

4:2:0 only; even width/height (a 4:2:0 requirement). Lossless by
construction, so pytest pins decode(encode(x)) == x bit-for-bit, and the
independent re-parser in tools/check_oracles.py value-checks the Spark
surface.
"""

from __future__ import annotations

import numpy as np

_NAL_SPS, _NAL_PPS, _NAL_IDR = 7, 8, 5


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def u(self, value: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                self._acc, self._n = 0, 0

    def ue(self, v: int) -> None:
        x = v + 1
        n = x.bit_length()
        self.u(0, n - 1)
        self.u(x, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self) -> None:
        while self._n:
            self.u(0, 1)

    def raw(self, data: bytes) -> None:
        assert self._n == 0, "raw bytes require byte alignment"
        self.buf.extend(data)

    def trailing(self) -> bytes:
        self.u(1, 1)
        self.align_zero()
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def u(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        z = 0
        while self.u(1) == 0:
            z += 1
            if z > 32:
                raise ValueError("malformed exp-golomb code")
        return (1 << z) - 1 + (self.u(z) if z else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def raw(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        b = self.data[self.pos >> 3 : (self.pos >> 3) + n]
        if len(b) < n:
            raise ValueError("truncated PCM samples")
        self.pos += 8 * n
        return b


def _escape(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _unescape(data: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(data):
        b = data[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _nal(ref_idc: int, nal_type: int, rbsp: bytes) -> bytes:
    return b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | nal_type]) + _escape(rbsp)


def _sps(w: int, h: int, fps: int) -> bytes:
    wmb = -(-w // 16)
    hmb = -(-h // 16)
    bw = _BitWriter()
    bw.u(66, 8)  # profile_idc: Baseline
    bw.u(0, 8)  # constraint flags + reserved
    bw.u(40, 8)  # level_idc 4.0
    bw.ue(0)  # seq_parameter_set_id
    bw.ue(0)  # log2_max_frame_num_minus4 -> 4-bit frame_num
    bw.ue(2)  # pic_order_cnt_type (no POC syntax)
    bw.ue(0)  # max_num_ref_frames (IDR-only stream)
    bw.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    bw.ue(wmb - 1)
    bw.ue(hmb - 1)
    bw.u(1, 1)  # frame_mbs_only_flag
    bw.u(1, 1)  # direct_8x8_inference_flag
    crop_r = (wmb * 16 - w) // 2  # 4:2:0 crop units of 2 samples
    crop_b = (hmb * 16 - h) // 2
    if crop_r or crop_b:
        bw.u(1, 1)
        bw.ue(0)
        bw.ue(crop_r)
        bw.ue(0)
        bw.ue(crop_b)
    else:
        bw.u(0, 1)
    # VUI: carry the REAL frame rate in timing_info
    bw.u(1, 1)  # vui_parameters_present_flag
    bw.u(0, 1)  # aspect_ratio_info_present_flag
    bw.u(0, 1)  # overscan_info_present_flag
    bw.u(0, 1)  # video_signal_type_present_flag
    bw.u(0, 1)  # chroma_loc_info_present_flag
    bw.u(1, 1)  # timing_info_present_flag
    bw.u(1, 32)  # num_units_in_tick
    bw.u(2 * fps, 32)  # time_scale (frame rate = time_scale / 2)
    bw.u(1, 1)  # fixed_frame_rate_flag
    bw.u(0, 1)  # nal_hrd_parameters_present_flag
    bw.u(0, 1)  # vcl_hrd_parameters_present_flag
    bw.u(0, 1)  # pic_struct_present_flag
    bw.u(0, 1)  # bitstream_restriction_flag
    return bw.trailing()


def _pps() -> bytes:
    bw = _BitWriter()
    bw.ue(0)  # pic_parameter_set_id
    bw.ue(0)  # seq_parameter_set_id
    bw.u(0, 1)  # entropy_coding_mode_flag: CAVLC
    bw.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    bw.ue(0)  # num_slice_groups_minus1
    bw.ue(0)  # num_ref_idx_l0_default_active_minus1
    bw.ue(0)  # num_ref_idx_l1_default_active_minus1
    bw.u(0, 1)  # weighted_pred_flag
    bw.u(0, 2)  # weighted_bipred_idc
    bw.se(0)  # pic_init_qp_minus26
    bw.se(0)  # pic_init_qs_minus26
    bw.se(0)  # chroma_qp_index_offset
    bw.u(1, 1)  # deblocking_filter_control_present_flag
    bw.u(0, 1)  # constrained_intra_pred_flag
    bw.u(0, 1)  # redundant_pic_cnt_present_flag
    return bw.trailing()


def encode_h264(
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]], fps: int
) -> bytes:
    """Annex-B H.264 baseline stream of I_PCM-only IDR frames. ``frames``
    = [(y, u, v)] uint8 planes, y (h, w) with even dims, u/v (h/2, w/2);
    ``fps`` rides in the SPS VUI timing info."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0][0].shape
    if w % 2 or h % 2:
        raise ValueError("4:2:0 needs even luma dimensions")
    wmb, hmb = -(-w // 16), -(-h // 16)
    out = bytearray(_nal(3, _NAL_SPS, _sps(w, h, fps)))
    out += _nal(3, _NAL_PPS, _pps())
    for i, (y, u, v) in enumerate(frames):
        if y.shape != (h, w) or u.shape != (h // 2, w // 2) or v.shape != u.shape:
            raise ValueError("inconsistent plane geometry")
        yp = np.pad(y, ((0, hmb * 16 - h), (0, wmb * 16 - w)), mode="edge")
        up = np.pad(u, ((0, hmb * 8 - h // 2), (0, wmb * 8 - w // 2)), mode="edge")
        vp = np.pad(v, ((0, hmb * 8 - h // 2), (0, wmb * 8 - w // 2)), mode="edge")
        bw = _BitWriter()
        bw.ue(0)  # first_mb_in_slice
        bw.ue(7)  # slice_type: I (all slices in picture)
        bw.ue(0)  # pic_parameter_set_id
        bw.u(0, 4)  # frame_num
        bw.ue(i % 2)  # idr_pic_id (differs between consecutive IDRs)
        bw.u(0, 1)  # no_output_of_prior_pics_flag
        bw.u(0, 1)  # long_term_reference_flag
        bw.se(0)  # slice_qp_delta
        bw.ue(1)  # disable_deblocking_filter_idc: off
        for mby in range(hmb):
            for mbx in range(wmb):
                bw.ue(25)  # mb_type: I_PCM
                bw.align_zero()  # pcm_alignment_zero_bit*
                bw.raw(yp[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16].tobytes())
                bw.raw(up[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8].tobytes())
                bw.raw(vp[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8].tobytes())
        out += _nal(3, _NAL_IDR, bw.trailing())
    return bytes(out)


def _split_nals(data: bytes) -> list[bytes]:
    nals = []
    i = data.find(b"\x00\x00\x01")
    while i != -1:
        j = data.find(b"\x00\x00\x01", i + 3)
        seg = data[i + 3 : j if j != -1 else len(data)]
        # zeros before the next start code belong to ITS prefix; RBSP
        # trailing-bit structure guarantees a NAL never ends in 0x00
        nals.append(seg.rstrip(b"\x00"))
        i = j
    if not nals:
        raise ValueError("no Annex-B start codes")
    return [n for n in nals if n]


def decode_h264(
    data: bytes,
) -> tuple[list[tuple[np.ndarray, np.ndarray, np.ndarray]], float, int, int]:
    """([(y, u, v) u8 planes per frame], fps, width, height) from an
    Annex-B H.264 stream of I_PCM macroblocks. Non-I_PCM macroblock types
    raise NotImplementedError (residual decoding needs a full CAVLC/
    CABAC + transform stack)."""
    sps = None
    fps = 0.0
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    for nal in _split_nals(bytes(data)):
        nal_type = nal[0] & 0x1F
        rbsp = _unescape(nal[1:])
        if nal_type == _NAL_SPS:
            br = _BitReader(rbsp)
            profile = br.u(8)
            br.u(8)  # constraint flags
            br.u(8)  # level_idc
            br.ue()  # seq_parameter_set_id
            if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
                raise NotImplementedError("high-profile SPS (chroma_format_idc syntax)")
            log2_mfn = br.ue() + 4
            poc_type = br.ue()
            if poc_type == 0:
                br.ue()
            elif poc_type == 1:
                br.u(1)
                br.se()
                br.se()
                for _ in range(br.ue()):
                    br.se()
            br.ue()  # max_num_ref_frames
            br.u(1)  # gaps_in_frame_num_value_allowed_flag
            wmb = br.ue() + 1
            hmb = br.ue() + 1
            if br.u(1) == 0:  # frame_mbs_only_flag
                raise NotImplementedError("interlaced (field) coding")
            br.u(1)  # direct_8x8_inference_flag
            crop = [0, 0, 0, 0]
            if br.u(1):
                crop = [br.ue(), br.ue(), br.ue(), br.ue()]
            if br.u(1):  # vui_parameters_present_flag
                if br.u(1):  # aspect_ratio_info
                    if br.u(8) == 255:  # Extended_SAR
                        br.u(32)
                if br.u(1):  # overscan_info
                    br.u(1)
                if br.u(1):  # video_signal_type
                    br.u(4)
                    if br.u(1):
                        br.u(24)
                if br.u(1):  # chroma_loc_info
                    br.ue()
                    br.ue()
                if br.u(1):  # timing_info
                    nuit = br.u(32)
                    ts = br.u(32)
                    br.u(1)
                    if nuit:
                        fps = ts / (2.0 * nuit)
            w = wmb * 16 - 2 * (crop[0] + crop[1])
            h = hmb * 16 - 2 * (crop[2] + crop[3])
            sps = (wmb, hmb, w, h, log2_mfn, crop)
        elif nal_type == _NAL_PPS:
            br = _BitReader(rbsp)
            br.ue()
            br.ue()
            if br.u(1):
                raise NotImplementedError("CABAC entropy coding")
            # remaining PPS fields match the fixed layout _pps() writes;
            # deblocking_filter_control_present_flag is re-read from the
            # slice header path below only via its known position, so any
            # non-default PPS with residual-coded slices would fail at the
            # mb_type check anyway
        elif nal_type in (_NAL_IDR, 1):
            if sps is None:
                raise ValueError("slice before SPS")
            wmb, hmb, w, h, log2_mfn, crop = sps
            br = _BitReader(rbsp)
            if br.ue() != 0:
                raise NotImplementedError("multi-slice pictures")
            st = br.ue()
            if st % 5 != 2:  # I slice (2 or 7)
                raise NotImplementedError("P/B slices (inter prediction)")
            br.ue()  # pic_parameter_set_id
            br.u(log2_mfn)  # frame_num
            if nal_type == _NAL_IDR:
                br.ue()  # idr_pic_id
            if (nal[0] >> 5) & 3:  # dec_ref_pic_marking
                if nal_type == _NAL_IDR:
                    br.u(2)
                else:
                    if br.u(1):
                        raise NotImplementedError("adaptive ref pic marking")
            br.se()  # slice_qp_delta
            dbf = br.ue()  # disable_deblocking_filter_idc
            if dbf != 1:
                br.se()
                br.se()
            yp = np.empty((hmb * 16, wmb * 16), dtype=np.uint8)
            up = np.empty((hmb * 8, wmb * 8), dtype=np.uint8)
            vp = np.empty_like(up)
            for mby in range(hmb):
                for mbx in range(wmb):
                    if br.ue() != 25:
                        raise NotImplementedError(
                            "non-I_PCM macroblock (residual-coded stream)"
                        )
                    br.align()
                    yp[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16] = (
                        np.frombuffer(br.raw(256), np.uint8).reshape(16, 16)
                    )
                    up[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = (
                        np.frombuffer(br.raw(64), np.uint8).reshape(8, 8)
                    )
                    vp[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = (
                        np.frombuffer(br.raw(64), np.uint8).reshape(8, 8)
                    )
            cl, _cr, ct, _cb = crop
            frames.append(
                (
                    yp[2 * ct : 2 * ct + h, 2 * cl : 2 * cl + w],
                    up[ct : ct + h // 2, cl : cl + w // 2],
                    vp[ct : ct + h // 2, cl : cl + w // 2],
                )
            )
    if sps is None or not frames:
        raise ValueError("no decodable frames")
    return frames, fps, sps[2], sps[3]
