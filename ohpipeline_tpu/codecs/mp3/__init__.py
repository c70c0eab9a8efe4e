"""MP3 (MPEG-1/2/2.5 Layer III) codec.

Parity target: OpenHome/Media/Codec/Mp3.cpp (adapter over libmad) —
validated against the compiled libmad oracle within conformance bounds
(Layer III decode is float here vs libmad's fixed point; ISO 11172-4
full-accuracy compliance allows RMS 2^-15 of full scale, we hold a few
LSB of 16-bit output).

Split: host entropy decode (bitstream.py: headers, side info, bit
reservoir, scalefactors, Huffman) and host vectorized requantize/stereo/
alias (synthesis.py prep); the hybrid filterbank (windowed IMDCT matmuls,
32-band polyphase with the Table B.3 window) runs as one batched jitted
device program carrying overlap + V-FIFO state across granules.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ...core.jiffies import Jiffies
from ...core.streaminfo import PcmStreamInfo
from ..base import (CodecBase, CodecStreamCorrupt, DecodedBatch, EndOfStream,
                    StreamReader)
from . import bitstream as BS
from . import synthesis as SYN

GROUP_FRAMES = 16    # 2 granules each -> 32 device granule steps


class _StreamState:
    def __init__(self, channels: int):
        self.overlap = np.zeros((channels, 576), np.float32)
        self.vfifo = np.zeros((channels, 16, 64), np.float32)


def decode_frames(frames: list[BS.Mp3Frame], state: _StreamState,
                  channels: int, bit_depth: int = 16) -> np.ndarray:
    """Decode parsed frames -> (channels, n) int32 native range."""
    return decode_frames_lazy(frames, state, channels, bit_depth)()


def prepare_granules(frames: list[BS.Mp3Frame],
                     channels: int) -> tuple[np.ndarray, np.ndarray]:
    """Host entropy prep for a group: requantize + stereo + alias per
    granule -> (xr_t (Tg, C, 576) f32, bt_t (Tg, C, 32) i32), the
    hybrid filterbank's input (shared by the codec and the multichip
    dryrun)."""
    granules = []
    btypes = []
    for fr in frames:
        hdr = fr.header
        ngr = hdr.granule_count
        if fr.side is None:     # reservoir-starved frame: silence
            granules.extend([np.zeros((channels, 576), np.float32)] * ngr)
            btypes.extend([np.zeros((channels, 32), np.int32)] * ngr)
            continue
        for gr in range(ngr):
            chans = fr.side.granules[gr]
            xs = [SYN.requantize(g, hdr) for g in chans]
            if hdr.channels == 2:
                SYN.stereo_process(hdr, chans[0], chans[1], xs[0], xs[1])
            bt_row = np.zeros((channels, 32), np.int32)
            for ci, g in enumerate(chans):
                xs[ci] = SYN.alias_reduce(xs[ci], g.block_type
                                          if g.window_switching else
                                          BS.BLOCK_NORMAL, g.mixed_block)
                bt = g.block_type if g.window_switching else BS.BLOCK_NORMAL
                bt_row[ci, :] = bt
                if g.window_switching and g.block_type == BS.BLOCK_SHORT \
                        and g.mixed_block:
                    bt_row[ci, :2] = BS.BLOCK_NORMAL
            if hdr.channels == 1 and channels == 1:
                spec = np.stack(xs)
            else:
                spec = np.stack(xs[:channels])
            granules.append(spec.astype(np.float32))
            btypes.append(bt_row)
    if not granules:
        return (np.zeros((0, channels, 576), np.float32),
                np.zeros((0, channels, 32), np.int32))
    return np.stack(granules), np.stack(btypes)


def decode_frames_lazy(frames: list[BS.Mp3Frame], state: _StreamState,
                       channels: int, bit_depth: int = 16):
    """decode_frames with async device dispatch: host prep + the jitted
    filterbank call happen now (states advance immediately, device
    arrays are futures), and the returned zero-arg function blocks on
    the PCM download — so a caller can parse/dispatch the next group
    while the chip runs this one."""
    xr_t, bt_t = prepare_granules(frames, channels)
    if not xr_t.shape[0]:
        return lambda: np.zeros((channels, 0), np.int32)
    ops = SYN._imdct_operators().astype(np.float32)
    poly = jnp.asarray(SYN._polyphase_matrix(), dtype=jnp.float32)
    wnd = jnp.asarray(SYN._window_matrix(), dtype=jnp.float32)
    if os.environ.get("OHP_MP3_SCAN"):
        # streaming-reference scan formulation (bit-identical; kept as
        # the oracle for hybrid_synthesis_parallel)
        pcm, ov, vf = SYN.hybrid_synthesis(
            jnp.asarray(xr_t), jnp.asarray(bt_t),
            jnp.asarray(state.overlap), jnp.asarray(state.vfifo),
            jnp.asarray(ops), poly, wnd)
        state.overlap = np.asarray(ov)
        state.vfifo = np.asarray(vf)
        out = np.asarray(pcm).transpose(1, 0, 2).reshape(channels, -1)
        lo, hi = -(1 << (bit_depth - 1)), (1 << (bit_depth - 1)) - 1
        pcm_eager = np.clip(np.rint(out * (1 << (bit_depth - 1))), lo,
                            hi).astype(np.int32)
        return lambda: pcm_eager
    # parallel path: pad the granule count up to a shape bucket so jit
    # compiles a handful of programs; n_real keeps padding out of the
    # carried stream state.  States stay device-resident between groups
    # (one int32 download per group, no float plane, no state fetch).
    n_real = xr_t.shape[0]
    tg = 32
    while tg < n_real:
        tg *= 2
    if tg != n_real:
        xr_t = np.concatenate(
            [xr_t, np.zeros((tg - n_real, channels, 576), np.float32)])
        bt_t = np.concatenate(
            [bt_t, np.zeros((tg - n_real, channels, 32), np.int32)])
    pcm_i, ov, vf = SYN.hybrid_synthesis_parallel(
        xr_t, bt_t, state.overlap, state.vfifo,
        jnp.asarray(ops), poly, wnd, n_real, bit_depth)
    state.overlap = ov
    state.vfifo = vf
    return lambda: np.asarray(pcm_i[:n_real]).transpose(1, 0, 2) \
        .reshape(channels, -1)


def parse_vbr_header(buf: bytes, hdr) -> Optional[dict]:
    """Xing/Info/VBRI VBR header in the first frame (reference Mp3.cpp
    duration/seek handling): returns {frames, bytes, toc} or None.
    `toc` maps 100 stream-time percentiles to byte positions."""
    # Xing/Info: after the side info block
    if hdr.version == 1:
        side = 32 if hdr.channels == 2 else 17
    else:
        side = 17 if hdr.channels == 2 else 9
    off = 4 + side
    if buf[off:off + 4] in (b"Xing", b"Info"):
        p = off + 4
        flags = int.from_bytes(buf[p:p + 4], "big")
        p += 4
        frames = nbytes = 0
        toc = None
        if flags & 1:
            frames = int.from_bytes(buf[p:p + 4], "big")
            p += 4
        if flags & 2:
            nbytes = int.from_bytes(buf[p:p + 4], "big")
            p += 4
        if flags & 4:
            toc = [b / 256.0 for b in buf[p:p + 100]]
            p += 100
        if frames:
            return {"frames": frames, "bytes": nbytes, "toc": toc}
        return None
    # VBRI (Fraunhofer): fixed offset 36 from the frame header
    if buf[36:40] == b"VBRI":
        p = 40 + 2 + 2 + 2                     # version, delay, quality
        nbytes = int.from_bytes(buf[p:p + 4], "big")
        frames = int.from_bytes(buf[p + 4:p + 8], "big")
        p += 8
        n_ent = int.from_bytes(buf[p:p + 2], "big")
        scale = int.from_bytes(buf[p + 2:p + 4], "big")
        ent_bytes = int.from_bytes(buf[p + 4:p + 6], "big")
        p += 8                                  # + frames-per-entry
        toc = None
        if n_ent and nbytes:
            acc = 0
            positions = []
            for i in range(n_ent):
                v = int.from_bytes(buf[p + i * ent_bytes:
                                       p + (i + 1) * ent_bytes], "big")
                acc += v * scale
                positions.append(acc / nbytes)
            # resample entry positions onto 100 percentiles
            toc = []
            for pct in range(100):
                idx = pct / 100 * n_ent
                i0 = min(int(idx), n_ent - 1)
                prev = positions[i0 - 1] if i0 > 0 else 0.0
                frac = idx - i0
                toc.append(prev + (positions[i0] - prev) * frac)
        if frames:
            return {"frames": frames, "bytes": nbytes, "toc": toc}
    return None


class CodecMp3(CodecBase):
    name = "MP3"
    recognition_cost = 40
    mime_types = ("audio/mpeg", "audio/mp3", "audio/x-mp3")

    def __init__(self, group_frames: int = GROUP_FRAMES):
        self._info: Optional[PcmStreamInfo] = None
        self._stream: Optional[BS.Mp3Stream] = None
        self._state: Optional[_StreamState] = None
        self._buf = b""
        self._sample_pos = 0
        self._pending: Optional[tuple] = None
        #: frames decoded per device call — the pipeline default (16,
        #: ~0.4 s) keeps streaming latency low; whole-buffer decode uses
        #: larger groups to amortise per-call transfer latency
        self._group_frames = group_frames

    def recognise(self, header: bytes) -> bool:
        hdr = BS.parse_frame_header(header)
        if hdr is None:
            return False
        nxt = BS.parse_frame_header(header, hdr.frame_bytes)
        return nxt is not None and nxt.sample_rate == hdr.sample_rate

    def stream_initialise(self, reader: StreamReader) -> PcmStreamInfo:
        self._buf = reader.read(64 * 1024)
        self._reader = reader
        hdr = BS.parse_frame_header(self._buf)
        if hdr is None:
            raise CodecStreamCorrupt("no MP3 sync")
        self._hdr = hdr
        self._stream = BS.Mp3Stream(self._buf)
        self._state = _StreamState(hdr.channels)
        self._sample_pos = 0
        total = reader.stream_bytes or 0
        self._vbr = parse_vbr_header(self._buf, hdr)
        if self._vbr:
            frames = self._vbr["frames"]
            if not total:
                total = self._vbr["bytes"]
            # the Xing/VBRI frame itself carries no audio: skip it
            self._stream.pos = hdr.frame_bytes
        else:
            frames = total // hdr.frame_bytes if total else 0
        self._stream_bytes = total
        self._info = PcmStreamInfo(
            sample_rate=hdr.sample_rate, bit_depth=16,
            num_channels=hdr.channels, codec_name="MP3", lossless=False,
            seekable=bool(total), bitrate=hdr.bitrate,
            track_length_jiffies=frames * hdr.samples_per_frame
            * Jiffies.per_sample(hdr.sample_rate))
        return self._info

    def _fill(self) -> None:
        want = self._hdr.frame_bytes * (self._group_frames + 2)
        while len(self._buf) - self._stream.pos < want:
            chunk = self._reader.read(128 * 1024)
            if not chunk:
                return
            self._buf += chunk
            self._stream.data = self._buf

    def try_seek(self, sample: int) -> Optional[int]:
        """Seek byte estimate + header resync on restart.  With a
        Xing/VBRI TOC (parse_vbr_header) the estimate interpolates the
        100-percentile byte map, so VBR files land on the right frame;
        otherwise CBR average byte rate (reference Mp3.cpp:331).  The
        decode pump owns the stream state, so the reset is deferred to
        the next process() call (the seek flush discards in-flight
        audio)."""
        if self._info is None or not self._info.seekable:
            return None
        frame = sample // self._hdr.samples_per_frame
        self._seek_to = frame * self._hdr.samples_per_frame
        if self._vbr and self._vbr.get("toc") and self._vbr["frames"]:
            total_samples = self._vbr["frames"] * self._hdr.samples_per_frame
            pct = min(99.999, max(0.0, 100.0 * sample / total_samples))
            toc = self._vbr["toc"]
            i = int(pct)
            lo = toc[i]
            hi = toc[i + 1] if i + 1 < 100 else 1.0
            frac = pct - i
            nbytes = self._vbr["bytes"] or self._stream_bytes
            return int((lo + (hi - lo) * frac) * nbytes)
        return frame * self._hdr.frame_bytes

    _seek_to: Optional[int] = None

    def _reinit_after_seek(self, reader: StreamReader) -> None:
        self._buf = reader.read(64 * 1024)
        self._reader = reader
        self._stream = BS.Mp3Stream(self._buf)
        self._state = _StreamState(self._hdr.channels)
        self._sample_pos = self._seek_to
        self._seek_to = None
        self._pending = None            # seek flush discards in-flight

    def _parse_dispatch_group(self) -> Optional[tuple]:
        """Parse one group and dispatch its decode (device filterbank
        async).  Returns (resolve, track_offset) or None at EOS."""
        self._fill()
        frames = []
        while len(frames) < self._group_frames:
            fr = self._stream.next_frame()
            if fr is None:
                break
            frames.append(fr)
        if not frames:
            return None
        first = self._sample_pos
        self._sample_pos += len(frames) * self._hdr.samples_per_frame
        resolve = decode_frames_lazy(frames, self._state,
                                     self._hdr.channels)
        return resolve, first

    def process(self, reader: StreamReader) -> DecodedBatch:
        """One-group software pipeline (see CodecAacAdts._process_sbr):
        group k's filterbank runs on device while this call parses and
        dispatches group k+1; returns the oldest in-flight group."""
        if self._seek_to is not None:     # post-seek restart
            self._reinit_after_seek(reader)
        if self._pending is None:
            self._pending = self._parse_dispatch_group()
            if self._pending is None:
                raise EndOfStream
        nxt = self._parse_dispatch_group()
        resolve, first = self._pending
        self._pending = nxt
        return DecodedBatch(self._info, samples=resolve(),
                            track_offset_samples=first)


def decode_mp3(data: bytes) -> tuple[PcmStreamInfo, np.ndarray]:
    """Whole-buffer decode (tests/tools)."""
    from ..base import BufferReader
    codec = CodecMp3(group_frames=256)
    r = BufferReader(data)
    info = codec.stream_initialise(r)
    parts = []
    while True:
        try:
            parts.append(codec.process(r).resolve())
        except EndOfStream:
            break
    return info, (np.concatenate(parts, axis=1) if parts
                  else np.zeros((info.num_channels, 0), np.int32))
