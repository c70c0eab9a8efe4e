"""Native (C++) host helpers, built on demand with g++ and loaded via ctypes.

The TPU framework keeps bit-serial hot loops (entropy decode) in C++ on the
host — the equivalent of the reference's C decoder libraries — while all
dense math runs on device.  Build artifacts land in _build/ (gitignored);
every helper has a pure-Python fallback so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_BUILD = _DIR / "_build"
_LOCK = threading.Lock()
_LIBS: dict[str, ctypes.CDLL | None] = {}


def _load(name: str, sources: list[str]) -> ctypes.CDLL | None:
    """Compile (if stale) and dlopen a helper library; None on failure."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so = _BUILD / f"lib{name}.so"
        try:
            srcs = [_DIR / s for s in sources]
            newest = max(s.stat().st_mtime for s in srcs)
            if not so.exists() or so.stat().st_mtime < newest:
                _BUILD.mkdir(exist_ok=True)
                cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                       "-std=c++17", *map(str, srcs), "-o", str(so)]
                subprocess.run(cmd, check=True, capture_output=True)
            _LIBS[name] = ctypes.CDLL(str(so))
        except (OSError, subprocess.CalledProcessError):
            _LIBS[name] = None
        return _LIBS[name]


_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _flac_lib() -> ctypes.CDLL | None:
    lib = _load("flacunpack", ["flac_unpack.cc"])
    if lib is not None and not getattr(lib, "_sigs_set", False):
        lib.flac_parse_group.restype = ctypes.c_int
        lib.flac_parse_group.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int64, ctypes.c_int,
            _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i64p,
            ctypes.POINTER(ctypes.c_int)]
        lib._sigs_set = True
    return lib


def have_flac_unpack() -> bool:
    return _flac_lib() is not None


def flac_parse_group(buf: bytes, bit_pos: int, *, sample_rate: int,
                     bits_per_sample: int, max_blocksize: int, channels: int,
                     max_frames: int, check_crc16: bool = True):
    """Parse up to `max_frames` FLAC frames from `buf` starting at bit_pos.

    Returns (nframes, new_bit_pos, status, batch) where batch is a dict of
    the dense arrays consumed by codecs.flac.synthesise-style device calls:
    data (B, stride) int32, coeffs (B, 32), shift/order/wasted (B,),
    assign/blocksize (F,), sample_number (F,) int64.  B = F * channels.
    """
    lib = _flac_lib()
    if lib is None:
        raise RuntimeError("native flac unpacker unavailable")
    stride = max_blocksize
    B = max_frames * channels
    data = np.zeros((B, stride), np.int32)
    coeffs = np.zeros((B, 32), np.int32)
    shift = np.zeros(B, np.int32)
    order = np.zeros(B, np.int32)
    wasted = np.zeros(B, np.int32)
    assign = np.zeros(max_frames, np.int32)
    blocksize = np.zeros(max_frames, np.int32)
    sample_number = np.zeros(max_frames, np.int64)
    pos = ctypes.c_int64(bit_pos)
    status = ctypes.c_int(0)
    n = lib.flac_parse_group(
        buf, len(buf), ctypes.byref(pos), sample_rate, bits_per_sample,
        max_blocksize, channels, max_frames, stride, int(check_crc16),
        data, coeffs, shift, order, wasted, assign, blocksize, sample_number,
        ctypes.byref(status))
    batch = dict(data=data, coeffs=coeffs, shift=shift, order=order,
                 wasted=wasted, assign=assign, blocksize=blocksize,
                 sample_number=sample_number)
    return n, pos.value, status.value, batch
