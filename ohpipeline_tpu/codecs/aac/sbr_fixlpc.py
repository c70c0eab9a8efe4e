"""Fixed-point SBR transposer LPC — normative fdk transcription.

The HE-AAC per-sample conformance bound is set by the HF transposer:
its 2nd-order LPC runs on noise-like, ill-conditioned covariances, so
the oracle's (fdk's) fixed-point arithmetic — 32-bit autocorrelation
accumulators with a >>5 pre-shift, a 15-bit schur division, and Q13
alpha quantization — produces measurably different whitening filters
than a float64 solve.  This module is an integer-exact transcription of
that arithmetic chain, validated bit-exactly against an instrumented
oracle build (tools/build_instr_lpc.py + tools/lpc_compare.py), in the
same spirit as native/silk_core.cc's normative SILK transcription.

Transcribed behaviour (reference, structure NOT copied — this is a
vectorized numpy reformulation over all low bands at once):
  - autoCorr2nd_cplx: fdk-aac/libFDK/src/autocorr2nd.cpp:185-280
  - alpha derivation + reset rules: fdk-aac/libSBRdec/src/lpp_tran.cpp:371-560
  - fDivNorm/schur_div: fdk-aac/libFDK/src/fixpoint_math.cpp:480-568
  - fixnorm/fixnormz: fdk-aac/libFDK/include/clz.h:143-195

License/provenance: fdk-aac (Fraunhofer FDK AAC Codec Library for
Android, see NOTICE) — numeric behaviour transcribed for conformance;
no code copied.

All inputs are the scaled int32 QMF low-band buffers (40 slots = 2-slot
LPC prehistory + 6-slot overlap + 32 new slots), one row per low band.
Outputs are the raw FIXP_SGL alpha words (Q15 of alpha/4) exactly as
fdk computes them.
"""
from __future__ import annotations

import numpy as np

_I64 = np.int64
MAXVAL = np.int64(0x7FFFFFFF)


def _bitlen(v: np.ndarray) -> np.ndarray:
    """bit length of non-negative int64 values (vectorized)."""
    v = v.copy()
    n = np.zeros_like(v)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >> s
        gt = m > 0
        n += np.where(gt, s, 0)
        v = np.where(gt, m, v)
    return n + (v > 0)


def _norm32(v: np.ndarray) -> np.ndarray:
    """fixnorm_D: redundant sign bits of an int32 value (0 for 0)."""
    a = np.where(v < 0, ~v, v)
    bl = _bitlen(a)
    return np.where(v == 0, 0, 31 - bl)


def _fmd(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """fMultDiv2 for two Q31 words: (a*b) >> 32."""
    return (a * b) >> 32


def _fmd_sd(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """fMultDiv2 for FIXP_SGL x FIXP_DBL: (a*b) >> 16."""
    return (a * b) >> 16


def _schur_div(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """schur_div(num, den, 16): 15-bit restoring division, result<<16.

    Preconditions (established by _fdiv_norm): 0 <= num <= den,
    den normalized.  Vectorized over the band axis.
    """
    ln = num >> 1
    ld = den >> 1
    div = np.zeros_like(num)
    active = ln != 0
    for _ in range(15):
        div = div << 1
        ln = ln << 1
        ge = active & (ln >= ld)
        ln = np.where(ge, ln - ld, ln)
        div = np.where(ge, div + 1, div)
    return div << 16


def _fdiv_norm(num: np.ndarray, den: np.ndarray):
    """fDivNorm(num, den, &e) for num >= 0, den > 0 (vectorized).

    Returns (q, e) with num/den = q/2^31 * 2^e."""
    den = np.where(den > 0, den, 1)        # guarded by callers
    nn = _norm32(num)
    ln = (num << nn) >> 1
    nd = _norm32(den)
    ld = den << nd
    q = _schur_div(ln, ld)
    e = -nn + 1 + nd
    zero = num == 0
    return np.where(zero, 0, q), np.where(zero, 0, e)


def _scale_value(v: np.ndarray, s: np.ndarray) -> np.ndarray:
    # shift counts clamped for int64 safety; out-of-range lanes are
    # always masked off by the callers' reset logic
    return np.where(s > 0, v << np.minimum(np.maximum(s, 0), 31),
                    v >> np.minimum(np.maximum(-s, 0), 63))


def _sgl(v: np.ndarray) -> np.ndarray:
    """FX_DBL2FX_SGL: truncating arithmetic shift to the high 16 bits."""
    return v >> 16


def fix_alphas_bands(zr: np.ndarray, zi: np.ndarray,
                     com_dyn: np.ndarray | int = 0):
    """Fixed-point transposer LPC for all low bands at once.

    zr, zi: (B, 40) int64 holding int32 scaled QMF values
            (slots x[-2..37] of the autocorrelation window).
    com_dyn: comLowBandScale + dynamicScale per band (B,) or scalar —
            only feeds the determinant-dynamics reset check.

    Returns (a0r, a0i, a1r, a1i, reset): raw FIXP_SGL words (B,) int64
    + bool reset flags (alphas already zeroed where reset)."""
    zr = np.asarray(zr, _I64)
    zi = np.asarray(zi, _I64)
    if zr.ndim == 1:
        out = fix_alphas_bands(zr[None], zi[None], np.asarray([com_dyn]))
        return tuple(o[0] for o in out)
    B = zr.shape[0]
    com_dyn = np.broadcast_to(np.asarray(com_dyn, _I64), (B,))

    # ---- autoCorr2nd_cplx (len=38, len_scale=5) ----------------------
    # buffer index i holds x[i-2]; realBuf points at index 2
    ls = 5
    r, im = zr, zi

    def grp(a, b):
        return (a + b) >> ls

    # r00/r11/r22 share the squared-magnitude loop terms
    t = np.arange(37)
    p2 = grp(_fmd(r[:, 1 + t], r[:, 1 + t]), _fmd(im[:, 1 + t],
                                                  im[:, 1 + t]))
    accu1 = p2.sum(axis=1)
    accu3 = grp(_fmd(r[:, 1 + t], r[:, 2 + t]),
                _fmd(im[:, 1 + t], im[:, 2 + t])).sum(axis=1)
    accu5 = (( _fmd(im[:, 2 + t], r[:, 1 + t])
              - _fmd(r[:, 2 + t], im[:, 1 + t])) >> ls).sum(axis=1)
    accu7 = grp(_fmd(r[:, 3 + t], r[:, 1 + t]),
                _fmd(im[:, 3 + t], im[:, 1 + t])).sum(axis=1) \
        + grp(_fmd(r[:, 2], r[:, 0]), _fmd(im[:, 2], im[:, 0]))
    accu8 = ((_fmd(im[:, 3 + t], r[:, 1 + t])
              - _fmd(r[:, 3 + t], im[:, 1 + t])) >> ls).sum(axis=1) \
        + ((_fmd(im[:, 2], r[:, 0]) - _fmd(r[:, 2], im[:, 0])) >> ls)
    accu2 = grp(_fmd(r[:, 0], r[:, 0]), _fmd(im[:, 0], im[:, 0])) + accu1
    accu1 = accu1 + grp(_fmd(r[:, 38], r[:, 38]),
                        _fmd(im[:, 38], im[:, 38]))
    accu0 = accu1 + grp(_fmd(r[:, 39], r[:, 39]),
                        _fmd(im[:, 39], im[:, 39])) \
        - grp(_fmd(r[:, 1], r[:, 1]), _fmd(im[:, 1], im[:, 1]))
    accu4 = grp(_fmd(r[:, 1], r[:, 0]), _fmd(im[:, 1], im[:, 0])) + accu3
    accu3 = accu3 + grp(_fmd(r[:, 39], r[:, 38]),
                        _fmd(im[:, 39], im[:, 38]))
    accu6 = ((_fmd(im[:, 1], r[:, 0]) - _fmd(r[:, 1], im[:, 0])) >> ls) \
        + accu5
    accu5 = accu5 + ((_fmd(im[:, 39], r[:, 38])
                      - _fmd(r[:, 39], im[:, 38])) >> ls)

    orall = (accu0 | accu1 | accu2 | np.abs(accu3) | np.abs(accu4)
             | np.abs(accu5) | np.abs(accu6) | np.abs(accu7)
             | np.abs(accu8))
    m = 31 - _bitlen(orall)                 # CntLeadingZeros - 1
    auto_scaling = m - 1 - ls
    r00 = accu0 << m
    r11 = accu1 << m
    r22 = accu2 << m
    r01r = accu3 << m
    r12r = accu4 << m
    r01i = accu5 << m
    r12i = accu6 << m
    r02r = accu7 << m
    r02i = accu8 << m
    del r00  # r00r unused by the cplx alpha chain

    det = (_fmd(r11, r22) >> 1) - ((_fmd(r12r, r12r)
                                    + _fmd(r12i, r12i)) >> 1)
    md = _norm32(np.abs(det))
    det = det << md
    det_scale = md - 2

    reset = np.zeros(B, bool)
    # determinant-dynamics reset (lpp_tran.cpp:392-398)
    ac_det_scale = (auto_scaling + 2 * com_dyn) * 2 + det_scale
    reset |= ac_det_scale > 126

    # ---- alpha[1] ----------------------------------------------------
    a1r = np.zeros(B, _I64)
    a1i = np.zeros(B, _I64)
    nz = det != 0
    abs_det = np.abs(det)
    tmp = (_fmd(r01r, r12r) >> 1) - ((_fmd(r01i, r12i)
                                      + _fmd(r02r, r11)) >> 1)
    q, e = _fdiv_norm(np.abs(tmp), abs_det)
    e = e + det_scale
    big = (e > 0) & (q >= (MAXVAL >> np.minimum(np.maximum(e, 0), 63)))
    reset |= nz & big
    val = _sgl(_scale_value(q, e))
    val = np.where((tmp < 0) ^ (det < 0), -val, val)
    a1r = np.where(nz & ~big, val, 0)

    tmp_i = (_fmd(r01i, r12r) >> 1) + ((_fmd(r01r, r12i)
                                        - _fmd(r02i, r11)) >> 1)
    q, e = _fdiv_norm(np.abs(tmp_i), abs_det)
    e = e + det_scale
    big = (e > 0) & (q >= (MAXVAL >> np.minimum(np.maximum(e, 0), 63)))
    reset |= nz & big
    val = _sgl(_scale_value(q, e))
    val = np.where((tmp_i < 0) ^ (det < 0), -val, val)
    a1i = np.where(nz & ~big, val, 0)

    # ---- alpha[0] ----------------------------------------------------
    a0r = np.zeros(B, _I64)
    a0i = np.zeros(B, _I64)
    nz0 = r11 != 0
    tmp = (r01r >> 3) + _fmd_sd(a1r, r12r) + _fmd_sd(a1i, r12i)
    big = np.abs(tmp) >= (r11 >> 1)
    reset |= nz0 & big
    q, e = _fdiv_norm(np.abs(tmp), np.abs(r11))
    val = _sgl(_scale_value(q, e + 1))
    val = np.where((tmp > 0) ^ (r11 < 0), -val, val)
    a0r = np.where(nz0 & ~big, val, 0)

    tmp_i = (r01i >> 3) + _fmd_sd(a1i, r12r) - _fmd_sd(a1r, r12i)
    big = np.abs(tmp_i) >= (r11 >> 1)
    reset |= nz0 & big
    q, e = _fdiv_norm(np.abs(tmp_i), np.abs(r11))
    val = _sgl(_scale_value(q, e + 1))
    val = np.where((tmp_i > 0) ^ (r11 < 0), -val, val)
    a0i = np.where(nz0 & ~big, val, 0)

    # ---- quadratic reset criteria ------------------------------------
    half = np.int64(0x40000000)
    reset |= (a0r * a0r + a0i * a0i) >= half
    reset |= (a1r * a1r + a1i * a1i) >= half

    z = np.where(reset, 0, 1)
    return a0r * z, a0i * z, a1r * z, a1i * z, reset


def fix_alphas(zr, zi, com_dyn: int = 0):
    """Single-band convenience wrapper (validation harness)."""
    return fix_alphas_bands(np.asarray(zr), np.asarray(zi), com_dyn)
