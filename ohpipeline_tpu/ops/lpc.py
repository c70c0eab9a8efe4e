"""Batched, bit-exact LPC residual synthesis — the decode core of FLAC and
ALAC, and of the fixed predictors both share.

The recurrence (FLAC spec; reference behaviour: flac-1.2.1
`FLAC__lpc_restore_signal{,_wide}` called from
OpenHome/Media/Codec/Flac.cpp's libFLAC callbacks):

    s[n] = r[n] + floor( sum_{i=1..order} c[i] * s[n-i]  /  2**shift )

with integer coefficients `c` (quantized precision <= 15 bits) and warm-up
samples s[0..order) stored verbatim.  The accumulator needs up to ~46 bits
(24-bit audio, order 32), beyond native int32 — and TPUs have no int64 — so
the dot product is computed in three 12-bit limbs with carry normalisation,
which is exact for |samples| < 2**25 and |coeffs| <= 2**14 at any order <= 32.

Why this shape: every FLAC/ALAC subframe carries its own warm-up samples, so
*all subframes of all streams decode independently* — the batch axis B is
"subframes in flight" and is huge (a 3-minute stereo track alone is ~4k
subframes).  Within a subframe the floor() makes the recurrence inherently
sequential, so the kernel runs N sequential steps, each a (32, B) multiply-
accumulate on the VPU.  Parallelism comes from B, not N.

Layouts:
    data   (B, N) int32 — warm-up samples in positions [0, order_b), residuals
                          from position order_b on.  Constant/verbatim
                          subframes use order=0 with data = the samples.
    coeffs (B, 32) int32 — c[1..order] zero-padded; coeffs[b, i] multiplies
                          s[n-1-i].
    shift  (B,) int32   — in [0, 31].
    order  (B,) int32   — in [0, 32].
Returns (B, N) int32 reconstructed samples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_ORDER = 32
_LIMB = 12
_MASK = (1 << _LIMB) - 1

# |sample| bound for which the 3x12-bit limb accumulation is exact.
MAX_SAMPLE_BITS = 25
MAX_COEFF_BITS = 15  # signed quantized-LPC precision


def _split_limbs(x):
    """Split int32 x into (lo, mid, hi): x == hi*2^24 + mid*2^12 + lo,
    lo/mid in [0, 2^12), hi signed."""
    lo = x & _MASK
    mid = (x >> _LIMB) & _MASK
    hi = x >> (2 * _LIMB)
    return lo, mid, hi


def _exact_shifted_dot(p0_sum, p1_sum, p2_sum, shift):
    """floor((p2_sum*2^24 + p1_sum*2^12 + p0_sum) / 2^shift), exact in int32.

    The three partial sums are int32 (each |.| < 2^31 by the limb bounds);
    the true value may exceed 32 bits but the final shifted result must fit
    int32 (guaranteed for valid streams).  Wrapping int32 adds/shifts then
    yield the exact result modulo 2^32 == the exact result.
    """
    c1 = p0_sum >> _LIMB
    a0 = p0_sum & _MASK
    p1 = p1_sum + c1
    c2 = p1 >> _LIMB
    a1 = p1 & _MASK
    a2 = p2_sum + c2
    # acc == a2*2^24 + a1*2^12 + a0, with a0, a1 in [0, 2^12).
    s = shift
    lo_branch = ((a2 << jnp.clip(24 - s, 0, 31))
                 + (a1 << jnp.clip(12 - s, 0, 31))
                 + (a0 >> jnp.clip(s, 0, 31)))
    mid_branch = ((a2 << jnp.clip(24 - s, 0, 31))
                  + (a1 >> jnp.clip(s - 12, 0, 31)))
    hi_branch = a2 >> jnp.clip(s - 24, 0, 31)
    return jnp.where(s <= 12, lo_branch,
                     jnp.where(s <= 24, mid_branch, hi_branch))


# ---------------------------------------------------------------------------
# XLA reference implementation (lax.scan) — runs on any backend.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("unused",))
def lpc_synthesize_scan(data, coeffs, shift, order, unused=None):
    """Reference implementation via lax.scan over samples.

    Bit-exact; used on CPU meshes and as the oracle for the Pallas kernel.
    """
    B, N = data.shape
    data = data.astype(jnp.int32)
    coeffs = coeffs.astype(jnp.int32)
    shift2 = shift.astype(jnp.int32)[:, None]          # (B, 1)
    order2 = order.astype(jnp.int32)[:, None]          # (B, 1)

    # history limbs, most recent first: h*[b, i] are limbs of s[n-1-i]
    h0 = jnp.zeros((B, MAX_ORDER), jnp.int32)
    h1 = jnp.zeros((B, MAX_ORDER), jnp.int32)
    h2 = jnp.zeros((B, MAX_ORDER), jnp.int32)

    def step(carry, dn):
        h0, h1, h2, n = carry
        p0 = jnp.sum(coeffs * h0, axis=1, keepdims=True)
        p1 = jnp.sum(coeffs * h1, axis=1, keepdims=True)
        p2 = jnp.sum(coeffs * h2, axis=1, keepdims=True)
        pred = _exact_shifted_dot(p0, p1, p2, shift2)
        y = dn[:, None] + pred
        out = jnp.where(n < order2, dn[:, None], y)     # warm-up passthrough
        o0, o1, o2 = _split_limbs(out)
        h0 = jnp.concatenate([o0, h0[:, :-1]], axis=1)
        h1 = jnp.concatenate([o1, h1[:, :-1]], axis=1)
        h2 = jnp.concatenate([o2, h2[:, :-1]], axis=1)
        return (h0, h1, h2, n + 1), out[:, 0]

    (_, _, _, _), out = jax.lax.scan(step, (h0, h1, h2, jnp.int32(0)), data.T)
    return out.T


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _lpc_kernel(data_ref, coeffs_ref, shift_ref, order_ref, out_ref,
                h0, h1, h2):
    """Grid step (i, j): samples [j*NB, (j+1)*NB) of batch tile i.

    Layout is time-major: lanes hold the batch, each sequential step touches
    one row.  History is kept as three pre-split limb planes (persisted in
    scratch across the sequential N-block grid dimension) so only the new
    sample is limb-split per step.
    """
    n_block = data_ref.shape[0]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        h0[:] = jnp.zeros_like(h0)
        h1[:] = jnp.zeros_like(h1)
        h2[:] = jnp.zeros_like(h2)

    coeffs = coeffs_ref[:]                    # (32, BT)
    shift = shift_ref[:]                      # (1, BT)
    order = order_ref[:]                      # (1, BT)
    base = j * n_block

    def step(n, _):
        p0 = jnp.sum(coeffs * h0[:], axis=0, keepdims=True)
        p1 = jnp.sum(coeffs * h1[:], axis=0, keepdims=True)
        p2 = jnp.sum(coeffs * h2[:], axis=0, keepdims=True)
        pred = _exact_shifted_dot(p0, p1, p2, shift)
        dn = data_ref[pl.ds(n, 1), :]         # (1, BT)
        out = jnp.where(base + n < order, dn, dn + pred)
        out_ref[pl.ds(n, 1), :] = out
        o0, o1, o2 = _split_limbs(out)
        h0[:] = jnp.concatenate([o0, h0[: MAX_ORDER - 1, :]], axis=0)
        h1[:] = jnp.concatenate([o1, h1[: MAX_ORDER - 1, :]], axis=0)
        h2[:] = jnp.concatenate([o2, h2[: MAX_ORDER - 1, :]], axis=0)
        return 0

    jax.lax.fori_loop(0, n_block, step, 0)


@functools.partial(jax.jit, static_argnames=("batch_tile", "n_block"))
def lpc_synthesize_pallas(data, coeffs, shift, order, batch_tile=256,
                          n_block=512):
    """Pallas TPU path. Same contract as `lpc_synthesize_scan`.

    B must be a multiple of `batch_tile` and N of `n_block` (the dispatcher
    pads).  The grid is (batch tiles, N blocks); the N dimension is declared
    sequential ("arbitrary") so the per-tile history scratch carries across
    sample blocks, keeping VMEM blocks small regardless of frame length.
    """
    B, N = data.shape
    assert B % batch_tile == 0, (B, batch_tile)
    assert N % n_block == 0, (N, n_block)
    grid = (B // batch_tile, N // n_block)
    data_t = data.T.astype(jnp.int32)                      # (N, B)
    coeffs_t = coeffs.T.astype(jnp.int32)                  # (32, B)
    shift_r = shift.astype(jnp.int32).reshape(1, B)
    order_r = order.astype(jnp.int32).reshape(1, B)

    out = pl.pallas_call(
        _lpc_kernel,
        out_shape=jax.ShapeDtypeStruct((N, B), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_block, batch_tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MAX_ORDER, batch_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_block, batch_tile), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((MAX_ORDER, batch_tile), jnp.int32),
            pltpu.VMEM((MAX_ORDER, batch_tile), jnp.int32),
            pltpu.VMEM((MAX_ORDER, batch_tile), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=6 * MAX_ORDER * B * N, transcendentals=0,
            bytes_accessed=2 * 4 * B * N),
    )(data_t, coeffs_t, shift_r, order_r)
    return out.T


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def lpc_synthesize(data, coeffs, shift, order, *, batch_tile=256,
                   n_block=512):
    """Dispatch to the Pallas kernel on TPU, lax.scan elsewhere.

    Pads the batch to a multiple of `batch_tile` with inert subframes and N
    to a multiple of `n_block` with zero residuals (sliced off the result).
    """
    B, N = data.shape
    if not _on_tpu():
        return lpc_synthesize_scan(data, coeffs, shift, order)
    pad_b = (-B) % batch_tile
    pad_n = (-N) % n_block
    if pad_b or pad_n:
        data = jnp.pad(data, ((0, pad_b), (0, pad_n)))
        coeffs = jnp.pad(coeffs, ((0, pad_b), (0, 0)))
        shift = jnp.pad(shift, (0, pad_b))
        order = jnp.pad(order, (0, pad_b))
    out = lpc_synthesize_pallas(data, coeffs, shift, order,
                                batch_tile=batch_tile, n_block=n_block)
    return out[:B, :N] if (pad_b or pad_n) else out


# ---------------------------------------------------------------------------
# Python/bigint oracle for tests (arbitrary precision; the ground truth).
# ---------------------------------------------------------------------------

def lpc_synthesize_py(data: np.ndarray, coeffs: np.ndarray, shift: np.ndarray,
                      order: np.ndarray) -> np.ndarray:
    out = np.zeros_like(data, dtype=object)
    B, N = data.shape
    for b in range(B):
        o, sh = int(order[b]), int(shift[b])
        c = [int(v) for v in coeffs[b, :o]]
        for n in range(N):
            if n < o:
                out[b, n] = int(data[b, n])
            else:
                acc = sum(c[i] * int(out[b, n - 1 - i]) for i in range(o))
                out[b, n] = int(data[b, n]) + (acc >> sh)
    return out.astype(np.int64)


#: Fixed-predictor coefficients shared by FLAC and the flywheel ramp
#: (FLAC spec §fixed subframe; orders 0-4, shift 0).
FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}
