"""Bit-exactness tests for batched LPC residual synthesis.

The ground truth is a Python bigint implementation of the FLAC recurrence;
the lax.scan and Pallas(interpret) paths must match it exactly, including
worst-case magnitudes (25-bit samples, 15-bit coeffs, order 32, any shift).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ohpipeline_tpu.ops import lpc


def _random_case(rng, B, N, max_order=32, sample_bits=17, coeff_bits=15,
                 max_shift=15, fixed_shift=None):
    """Random *stable* filters (sum|c| < 2^shift), like real encoded streams.

    Unconstrained random coefficients make an unstable IIR whose output
    overflows any fixed width; encoders only emit stable predictors.
    """
    data = rng.integers(-(1 << (sample_bits - 1)), 1 << (sample_bits - 1),
                        (B, N), dtype=np.int64).astype(np.int32)
    order = rng.integers(0, max_order + 1, (B,)).astype(np.int32)
    coeffs = np.zeros((B, lpc.MAX_ORDER), np.int32)
    shift = np.zeros((B,), np.int32)
    for b in range(B):
        o = order[b]
        shift[b] = (fixed_shift if fixed_shift is not None
                    else rng.integers(max(coeff_bits - 2, 1), max_shift + 1))
        if o == 0:
            continue
        c = rng.integers(-(1 << (coeff_bits - 1)),
                         1 << (coeff_bits - 1), (o,)).astype(np.float64)
        gain = np.abs(c).sum() / (1 << shift[b])
        if gain > 0.9:
            c = np.trunc(c * (0.9 / gain))
        coeffs[b, :o] = c.astype(np.int32)
    return data, coeffs, shift, order


def _check(data, coeffs, shift, order):
    truth = lpc.lpc_synthesize_py(data, coeffs, shift, order)
    assert np.abs(truth).max() < (1 << 31), "test case overflows int32 result"
    got = np.asarray(lpc.lpc_synthesize_scan(
        jnp.asarray(data), jnp.asarray(coeffs), jnp.asarray(shift),
        jnp.asarray(order)))
    np.testing.assert_array_equal(got.astype(np.int64), truth)
    return got


class TestScanBitExact:
    def test_random_batch(self, rng):
        _check(*_random_case(rng, B=16, N=64))

    def test_high_magnitude_24bit(self, rng):
        # 24-bit side-channel audio: samples to +-2^24, order 32, shift 0..15
        data, coeffs, shift, order = _random_case(
            rng, B=8, N=48, sample_bits=25, coeff_bits=15)
        _check(data, coeffs, shift, order)

    def test_worst_case_accumulator(self, rng):
        # Stress the 46-bit accumulator directly: order-32 filter with
        # max-magnitude coeffs against max-magnitude 25-bit warm-up samples,
        # only two synthesized samples so the output can't run away.
        B = 8
        order = np.full((B,), 32, np.int32)
        N = 34
        data = np.zeros((B, N), np.int32)
        signs = rng.integers(0, 2, (B, 32)) * 2 - 1
        data[:, :32] = signs * ((1 << 24) - 1)
        coeffs = (rng.integers(0, 2, (B, 32)) * 2 - 1) * ((1 << 14) - 1)
        coeffs = coeffs.astype(np.int32)
        # shift large enough that the shifted prediction fits int32
        shift = np.full((B,), 15, np.int32)
        truth = lpc.lpc_synthesize_py(data, coeffs, shift, order)
        assert np.abs(truth).max() < (1 << 31)
        _check(data, coeffs, shift, order)

    def test_shift_extremes(self, rng):
        for sh in (0, 1, 12, 13, 24, 25, 31):
            data, coeffs, shift, order = _random_case(
                rng, B=4, N=32, sample_bits=12, coeff_bits=6, fixed_shift=sh)
            _check(data, coeffs, shift, order)

    def test_fixed_predictors(self, rng):
        # FLAC fixed subframes: orders 0-4, shift 0.
        B, N = 5, 40
        data = rng.integers(-1000, 1000, (B, N)).astype(np.int32)
        coeffs = np.zeros((B, lpc.MAX_ORDER), np.int32)
        order = np.arange(5, dtype=np.int32)
        for b in range(B):
            c = lpc.FIXED_COEFFS[b]
            coeffs[b, :len(c)] = c
        shift = np.zeros((B,), np.int32)
        _check(data, coeffs, shift, order)

    def test_order_zero_is_identity(self, rng):
        B, N = 3, 16
        data = rng.integers(-100, 100, (B, N)).astype(np.int32)
        z = np.zeros((B,), np.int32)
        got = _check(data, np.zeros((B, lpc.MAX_ORDER), np.int32), z, z)
        np.testing.assert_array_equal(got, data)

    def test_known_first_order(self):
        # s[n] = r[n] + s[n-1] (order 1, c=[1], shift 0) => cumulative sum
        data = np.array([[5, 1, 2, 3, 4]], np.int32)
        coeffs = np.zeros((1, lpc.MAX_ORDER), np.int32)
        coeffs[0, 0] = 1
        out = _check(data, coeffs, np.zeros(1, np.int32),
                     np.ones(1, np.int32))
        np.testing.assert_array_equal(out[0], [5, 6, 8, 11, 15])

    def test_negative_accumulator_floor(self):
        # floor division on negative accumulators must round toward -inf
        # (arithmetic shift), e.g. c*s = -3, shift 1 -> -2 not -1.
        data = np.array([[3, 0, 0, 0]], np.int32)
        coeffs = np.zeros((1, lpc.MAX_ORDER), np.int32)
        coeffs[0, 0] = -1
        shift = np.ones(1, np.int32)
        order = np.ones(1, np.int32)
        _check(data, coeffs, shift, order)


class TestPallasInterpret:
    """Pallas kernel correctness via interpret mode on CPU."""

    def test_matches_scan(self, rng):
        import jax
        from jax.experimental import pallas as pl  # noqa: F401
        data, coeffs, shift, order = _random_case(rng, B=8, N=32,
                                                  sample_bits=20)
        want = lpc.lpc_synthesize_py(data, coeffs, shift, order)
        from ohpipeline_tpu.ops.lpc import _lpc_kernel, MAX_ORDER
        import jax.numpy as jnp
        from jax.experimental.pallas import tpu as pltpu

        B, N = data.shape
        out = pl.pallas_call(
            _lpc_kernel,
            out_shape=jax.ShapeDtypeStruct((N, B), jnp.int32),
            grid=(1, 1),
            in_specs=[
                pl.BlockSpec((N, B), lambda i, j: (j, i)),
                pl.BlockSpec((MAX_ORDER, B), lambda i, j: (0, i)),
                pl.BlockSpec((1, B), lambda i, j: (0, i)),
                pl.BlockSpec((1, B), lambda i, j: (0, i)),
            ],
            out_specs=pl.BlockSpec((N, B), lambda i, j: (j, i)),
            scratch_shapes=[
                pltpu.VMEM((MAX_ORDER, B), jnp.int32),
                pltpu.VMEM((MAX_ORDER, B), jnp.int32),
                pltpu.VMEM((MAX_ORDER, B), jnp.int32),
            ],
            interpret=True,
        )(jnp.asarray(data.T), jnp.asarray(coeffs.T),
          jnp.asarray(shift.reshape(1, B)), jnp.asarray(order.reshape(1, B)))
        np.testing.assert_array_equal(np.asarray(out).T.astype(np.int64),
                                      want)

    def test_dispatcher_on_cpu_uses_scan(self, rng):
        data, coeffs, shift, order = _random_case(rng, B=4, N=16)
        got = lpc.lpc_synthesize(jnp.asarray(data), jnp.asarray(coeffs),
                                 jnp.asarray(shift), jnp.asarray(order))
        want = lpc.lpc_synthesize_py(data, coeffs, shift, order)
        np.testing.assert_array_equal(np.asarray(got).astype(np.int64), want)
