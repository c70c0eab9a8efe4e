"""Batched PCM DSP — the device half of the render path.

The reference applies ramps/volume/attenuation sample-by-sample on the CPU
(`RampApplicator` Msg.cpp:832-880, `Attenuator` Pipeline/Attenuator.cpp,
`Muter` Pipeline/Muter.cpp).  Here every per-sample transform on decoded
audio is one fused, batched XLA program over fixed-shape tiles:

    tile: (B, C, N) int32 — B streams, C channels, N samples, samples in the
    native range of their bit depth (e.g. 16-bit content in [-2^15, 2^15)).

All gains are metadata carried per tile row and expanded on device into a
per-sample float32 gain line; a single multiply applies ramp x volume x
attenuation x mute.  Exactness contract: when the combined gain is exactly
1.0 the output equals the input bit-for-bit (guarded passthrough); content
<= 24-bit is exact in float32 arithmetic; 32-bit content incurs <= 2^-24
relative rounding (the reference truncates to *16 bits* whenever a ramp is
active, Msg.cpp:861 — so this path is strictly more precise).

Parity targets: RampApplicator (Msg.h:288, Msg.cpp:832), Attenuator
(kUnityAttenuation = 1<<14), Muter ramps, VolumeRamper, PreDriver byte
packing (PreDriver.cpp), MsgSilence fill.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ramp import RAMP_MAX

UNITY_ATTENUATION = 1 << 14   # Msg.h:940 MsgAudioPcm::kUnityAttenuation


def native_limits(bit_depth: int) -> tuple[int, int]:
    """[min, max] sample values at a native bit depth."""
    hi = 1 << (bit_depth - 1)
    return -hi, hi - 1


# ---------------------------------------------------------------------------
# Fused gain chain
# ---------------------------------------------------------------------------

@jax.jit
def apply_gain(tile, ramp_start, ramp_end, gain):
    """Fused ramp x scalar-gain over a PCM tile.

    tile       (B, C, N) int32
    ramp_start (B,) float32 — multiplier at sample 0 (1.0 = unity)
    ramp_end   (B,) float32 — multiplier at sample N (exclusive end point)
    gain       (B,) float32 — product of volume x attenuation x mute for the
                              row (1.0 = unity)

    The ramp line matches the reference's `RampApplicator`: sample n of N
    gets multiplier start + (end - start) * n / N.  Rows whose total gain is
    exactly unity pass through bit-exactly.
    """
    B, C, N = tile.shape
    t = jnp.arange(N, dtype=jnp.float32) / N                     # (N,)
    line = (ramp_start[:, None]
            + (ramp_end - ramp_start)[:, None] * t[None, :])     # (B, N)
    g = line * gain[:, None]                                     # (B, N)
    scaled = jnp.round(tile.astype(jnp.float32) * g[:, None, :])
    out = scaled.astype(jnp.int32)
    unity = jnp.logical_and(ramp_start == 1.0,
                            jnp.logical_and(ramp_end == 1.0, gain == 1.0))
    return jnp.where(unity[:, None, None], tile, out)


@jax.jit
def attenuate(tile, attenuation):
    """Integer attenuation (Songcast slave): (s * a) >> 14 with a in
    [0, 1<<14].  Exact match of the reference Attenuator element's math.

    Uses float32 (exact for |s| < 2^24 since a <= 2^14 keeps the true
    product within float32's 24-bit window after the shift: we compute
    floor(s * a / 2^14) via two-step exact integer emulation).
    """
    a = attenuation.astype(jnp.int32)[:, None, None]
    # Split s into high/low 16-bit halves: s = hi*2^16 + lo (lo unsigned).
    lo = jnp.bitwise_and(tile, 0xFFFF)
    hi = jnp.right_shift(tile, 16)
    # s*a >> 14 == (hi*a << 2) + (lo*a >> 14)  with exact carries in int32.
    prod_lo = lo * a                      # < 2^16 * 2^14 = 2^30, exact
    return jnp.left_shift(hi * a, 2) + jnp.right_shift(prod_lo, 14)


@jax.jit
def to_float(tile, bit_depth):
    """Native-range int32 -> float32 in [-1, 1). bit_depth per row (B,)."""
    scale = jnp.exp2(1.0 - bit_depth.astype(jnp.float32))[:, None, None]
    return tile.astype(jnp.float32) * scale * 0.5


@jax.jit
def bit_depth_convert(tile, from_bits, to_bits):
    """Shift native-range samples between bit depths (per-row int32 shifts).

    Widening is exact (left shift); narrowing truncates toward -inf (right
    shift), matching the reference's subsample narrowing in MsgPlayablePcm.
    """
    d = (to_bits - from_bits).astype(jnp.int32)[:, None, None]
    widened = jnp.left_shift(tile, jnp.maximum(d, 0))
    return jnp.right_shift(widened, jnp.maximum(-d, 0))


@jax.jit
def silence_tile(b, c, n):
    return jnp.zeros((b, c, n), jnp.int32)


# ---------------------------------------------------------------------------
# Channel decorrelation (FLAC / ALAC inter-channel prediction)
# ---------------------------------------------------------------------------

# Channel-assignment codes shared by the FLAC frame header and our batch
# metadata: 0 = independent, 1 = left/side, 2 = right/side, 3 = mid/side.
CH_INDEPENDENT, CH_LEFT_SIDE, CH_RIGHT_SIDE, CH_MID_SIDE = 0, 1, 2, 3


@jax.jit
def stereo_decorrelate(ch0, ch1, mode):
    """Undo FLAC stereo decorrelation, batched.

    ch0, ch1: (B, N) int32 decoded subframe outputs; mode: (B,) int32 in
    {independent, left/side, right/side, mid/side}.  Returns (left, right).
    Bit-exact vs flac-1.2.1 stream_decoder.c's channel reconstruction.
    """
    m = mode[:, None]
    # left/side: right = left - side
    ls_l, ls_r = ch0, ch0 - ch1
    # right/side: left = right + side
    rs_l, rs_r = ch0 + ch1, ch1
    # mid/side: mid is stored floor((l+r)/2) with side's lsb folded in:
    #   mid2 = (mid << 1) | (side & 1); left = (mid2 + side) >> 1
    side = ch1
    mid2 = jnp.left_shift(ch0, 1) | jnp.bitwise_and(side, 1)
    ms_l = jnp.right_shift(mid2 + side, 1)
    ms_r = jnp.right_shift(mid2 - side, 1)
    left = jnp.where(m == CH_LEFT_SIDE, ls_l,
                     jnp.where(m == CH_RIGHT_SIDE, rs_l,
                               jnp.where(m == CH_MID_SIDE, ms_l, ch0)))
    right = jnp.where(m == CH_LEFT_SIDE, ls_r,
                      jnp.where(m == CH_RIGHT_SIDE, rs_r,
                                jnp.where(m == CH_MID_SIDE, ms_r, ch1)))
    return left, right


# ---------------------------------------------------------------------------
# Host-side byte conversion (framework edges: parsers in, animator out).
# Bit twiddling over ragged byte strings is host work; the arrays produced
# here are what get batched into device tiles.
# ---------------------------------------------------------------------------

def unpack_pcm_bytes(data: bytes, bit_depth: int, num_channels: int,
                     big_endian: bool = False, signed: bool = True,
                     float_format: bool = False) -> np.ndarray:
    """Interleaved PCM bytes -> (channels, samples) int32 in native range.

    Handles 8/16/24/32-bit integer (either endianness, signed/unsigned 8-bit)
    and 32/64-bit float (scaled to 24-bit native range), i.e. the format
    space of the reference's CodecPcm/CodecWav/CodecAiff.
    """
    bps = bit_depth // 8
    if float_format:
        dt = (">" if big_endian else "<") + ("f4" if bit_depth == 32 else "f8")
        f = np.frombuffer(data, dtype=dt).astype(np.float64)
        x = np.clip(np.rint(f * (1 << 23)), -(1 << 23), (1 << 23) - 1)
        x = x.astype(np.int32)
    elif bit_depth == 8:
        x = np.frombuffer(data, dtype=np.int8 if signed else np.uint8)
        x = x.astype(np.int32) - (0 if signed else 128)
    elif bit_depth == 24:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        if big_endian:
            x = ((raw[:, 0].astype(np.int32) << 16)
                 | (raw[:, 1].astype(np.int32) << 8)
                 | raw[:, 2].astype(np.int32))
        else:
            x = ((raw[:, 2].astype(np.int32) << 16)
                 | (raw[:, 1].astype(np.int32) << 8)
                 | raw[:, 0].astype(np.int32))
        x = (x << 8) >> 8   # sign-extend from 24 bits
    else:
        dt = (">" if big_endian else "<") + f"i{bps}"
        x = np.frombuffer(data, dtype=dt).astype(np.int32)
    n = (len(x) // num_channels) * num_channels
    return np.ascontiguousarray(x[:n].reshape(-1, num_channels).T)


def pack_pcm_bytes(samples: np.ndarray, bit_depth: int,
                   big_endian: bool = False) -> bytes:
    """(channels, samples) int32 native range -> interleaved bytes.

    The animator-edge inverse of `unpack_pcm_bytes` (reference:
    MsgPlayablePcm::Read -> IPcmProcessor, Msg.cpp).
    """
    inter = np.ascontiguousarray(samples.T)        # (n, ch)
    lo, hi = native_limits(bit_depth)
    inter = np.clip(inter, lo, hi)
    if bit_depth == 8:
        return inter.astype(np.int8).tobytes()
    if bit_depth == 24:
        flat = inter.reshape(-1)
        out = np.empty((flat.size, 3), np.uint8)
        b0, b1, b2 = flat & 0xFF, (flat >> 8) & 0xFF, (flat >> 16) & 0xFF
        if big_endian:
            out[:, 0], out[:, 1], out[:, 2] = b2, b1, b0
        else:
            out[:, 0], out[:, 1], out[:, 2] = b0, b1, b2
        return out.tobytes()
    dt = (">" if big_endian else "<") + f"i{bit_depth // 8}"
    return inter.astype(dt).tobytes()
