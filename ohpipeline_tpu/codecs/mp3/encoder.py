"""Minimal MPEG-1 Layer III frame builder — the conformance-vector source.

Builds spec-valid MP3 streams from chosen quantized spectra (long blocks,
no bit reservoir, scalefactors zero, one Huffman table).  This gives the
test suite real MPEG-1 bitstreams whose exact spectral content is known,
decodable both by our decoder and the libmad oracle for cross-validation
(no MP3 encoder exists on this system, and the reference's test tones are
not vendored).
"""

from __future__ import annotations

import numpy as np

from ..flac.bitreader import BitWriter
from . import tables as T
from .bitstream import RATES_V1, BITRATES_V1_L3

_ENC_CACHE: dict = {}


def _encode_table(tid: int) -> dict:
    """(x, y) -> (code, length) reverse map for a pair codebook."""
    if tid in _ENC_CACHE:
        return _ENC_CACHE[tid]
    import pathlib
    npz = np.load(pathlib.Path(__file__).resolve().parent / "tables.npz")
    codes = npz[f"pair{tid}_codes"]
    lens = npz[f"pair{tid}_lens"]
    vals = npz[f"pair{tid}_vals"]
    m = {(int(v[0]), int(v[1])): (int(c), int(l))
         for c, l, v in zip(codes, lens, vals)}
    _ENC_CACHE[tid] = m
    return m


def build_frame(spectrum: list[np.ndarray], sample_rate: int = 44100,
                bitrate: int = 320, global_gain: int = 210,
                table: int = 15, block_type: int = 0) -> bytes:
    """One MPEG-1 Layer III frame from per-channel quantized spectra.

    spectrum: list (1 or 2 channels) of (576,) ints with |v| <= 15; the
    same spectrum is used for both granules.  Values beyond big_values
    must be zero (count1 region unused: big_values covers all non-zeros).
    """
    nch = len(spectrum)
    rate_idx = RATES_V1.index(sample_rate)
    bitrate_idx = BITRATES_V1_L3.index(bitrate)
    enc = _encode_table(table)

    # huffman-encode one granule-channel
    def encode_spectrum(spec) -> tuple[bytes, int, int]:
        nz = np.nonzero(spec)[0]
        last = int(nz[-1]) + 1 if len(nz) else 0
        big_values = (last + 1) // 2
        bw = BitWriter()
        for i in range(big_values * 2)[::2]:
            x = int(spec[i])
            y = int(spec[i + 1]) if i + 1 < 576 else 0
            code, length = enc[(abs(x), abs(y))]
            bw.write(code, length)
            if x:
                bw.write(1 if x < 0 else 0, 1)
            if y:
                bw.write(1 if y < 0 else 0, 1)
        nbits = bw.bit_length
        bw.align_byte()
        return bw.getvalue(), nbits, big_values

    payloads = []
    for ch in range(nch):
        payloads.append(encode_spectrum(spectrum[ch]))

    # side info
    side = BitWriter()
    side.write(0, 9)                      # main_data_begin
    side.write(0, 5 if nch == 1 else 3)   # private
    for _ in range(nch):
        for _ in range(4):
            side.write(0, 1)              # scfsi
    for _gr in range(2):
        for ch in range(nch):
            _, nbits, big_values = payloads[ch]
            side.write(nbits, 12)         # part2_3_length (scalefacs = 0)
            side.write(big_values, 9)
            side.write(global_gain, 8)
            side.write(0, 4)              # scalefac_compress (slen 0,0)
            if block_type:
                side.write(1, 1)          # window_switching on
                side.write(block_type, 2)
                side.write(0, 1)          # not mixed
                for _ in range(2):
                    side.write(table, 5)
                for _ in range(3):
                    side.write(0, 3)      # subblock_gain
            else:
                side.write(0, 1)          # window_switching off
                for _ in range(3):
                    side.write(table, 5)
                side.write(7, 4)          # region0_count
                side.write(7, 3)          # region1_count
            side.write(0, 1)              # preflag
            side.write(0, 1)              # scalefac_scale
            side.write(0, 1)              # count1table_select
    side_bytes = side.getvalue()
    assert len(side_bytes) == (17 if nch == 1 else 32)

    # main data: granule-major, channel-minor, byte-aligned per our writer
    main = BitWriter()
    for _gr in range(2):
        for ch in range(nch):
            data, nbits, _ = payloads[ch]
            # re-write the exact bit payload (unaligned concatenation)
            br_bits = nbits
            val = int.from_bytes(data, "big") >> (len(data) * 8 - nbits) \
                if nbits else 0
            main.write(val, br_bits)
    main.align_byte()
    main_bytes = main.getvalue()

    frame_bytes = 144 * bitrate * 1000 // sample_rate
    hdr = bytes([0xFF,
                 0xE0 | (3 << 3) | (1 << 1) | 1,   # MPEG1, Layer III, no CRC
                 (bitrate_idx << 4) | (rate_idx << 2),
                 (0 if nch == 2 else 3 << 6) | 0])
    need = frame_bytes - 4 - len(side_bytes)
    if len(main_bytes) > need:
        raise ValueError("payload too large for bitrate")
    return hdr + side_bytes + main_bytes + b"\x00" * (need - len(main_bytes))


def build_stream(spectrum: list[np.ndarray], nframes: int = 20,
                 **kw) -> bytes:
    frame = build_frame(spectrum, **kw)
    return frame * nframes


def tone_spectrum(bin_index: int, value: int = 13) -> np.ndarray:
    spec = np.zeros(576, np.int32)
    spec[bin_index] = value
    spec[bin_index + 1] = -(value // 2)
    return spec
