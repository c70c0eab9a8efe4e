#!/usr/bin/env python
"""Aggregate FLAC + AAC-LC decode-to-PCM throughput on one TPU chip.

The BASELINE.json north-star: >= 500x realtime aggregate FLAC+AAC-LC
decode on one chip, FLAC bit-exact vs flac-1.2.1 and AAC within
conformance bounds of fdk-aac.  The reference's implicit contract is 1x
realtime on embedded CPUs (BASELINE.md).

Scope note: this measures the codec decode path (entropy unpack -> device
synthesis -> PCM), the BASELINE decode-to-PCM metric, not the full
renderer pipeline (which tests/test_pipeline_e2e.py exercises).

Design for the axon tunnel (the binding constraint; ~25-60 MB/s for
incompressible bytes, ~110-125 MB/s ceiling for compressible ones, with
large run-to-run weather):
  * the link compresses (LZ-style), so wire formats are built for
    compressibility + gather-free decode: FLAC residuals as zigzag byte
    planes (low bytes noise-like, high nibbles mostly zero), AAC quant
    as zigzag nibbles at spectral positions with per-coefficient
    scalefactor bytes (long runs -> near-free)
    (tests/test_wire_formats.py proves both reconstruct exactly).
  * ONE contiguous buffer per chunk carrying BOTH codecs' planes and
    ONE merged device program per chunk: each separate device_put or
    exec costs ~20 ms of fixed overhead on the tunnel, so the chunk
    pipeline is one upload + one exec round trip.
  * a tiny dispatch first puts the link in its synchronous regime (async
    staging defers the real upload into the first exec at a much worse
    rate), then chunks upload interleaved with device compute while the
    parse thread runs ahead (the C parsers release the GIL).
  * device programs are scan-free whole-chunk batches: elementwise wire
    decode, three MXU matmuls (IMDCT + one-hot windows), overlap-add as
    a shifted slice (codecs/aac/synthesis.decode_chunk_zz,
    codecs/flac._synthesise_group_zz).
  * the timed phase runs --passes times (default 32); best wall is
    reported (documented tunnel variance: identical code measures up to
    ~1.5x apart run to run — more passes sample the weather better; the
    BENCH_DEADLINE_S graceful break keeps total runtime bounded).

Every stream decodes a DISTINCT track (per-seed tones, noise, transients,
envelopes) so LPC orders, partition orders, stereo modes, window
sequences and TNS activity differ across streams; encodes are cached in
.bench_cache/ (untimed setup).

Prints ONE JSON line:
  {"metric": "flac_aac_decode_realtime_x", "value": N,
   "unit": "x_realtime", "vs_baseline": N/500, ...components...}
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import tempfile
import threading
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = os.path.join(HERE, ".bench_cache")
CONTENT_VERSION = 3          # bump to invalidate .bench_cache


def make_track(seconds: float, rate: int = 44100, seed: int = 7):
    """One varied test track: tones + noise + transients, per-seed
    frequencies/envelopes (no two tracks parse identically)."""
    rng = np.random.default_rng(seed)
    n = int(rate * seconds)
    t = np.arange(n) / rate
    f1 = 200 + 1800 * rng.random()
    f2 = 100 + 500 * rng.random()
    base = (0.6 * np.sin(2 * np.pi * f1 * t)
            + 0.25 * np.sin(2 * np.pi * f2 * t + rng.random() * 6)
            + 0.02 * rng.standard_normal(n))
    env = 0.55 + 0.45 * np.sin(2 * np.pi * (0.1 + 0.3 * rng.random()) * t)
    base *= env
    for s in rng.integers(0, max(n - 2000, 1), size=int(seconds * 2)):
        base[s:s + 800] += 0.5 * np.sign(
            np.sin(2 * np.pi * 37 * t[:800])) * np.exp(-t[:800] * 400)
    x = np.stack([base, np.roll(base, int(rng.integers(5, 50)))])
    return np.clip(np.rint(x * 20000), -32768, 32767).astype(np.int32)


def encode_aac(track: np.ndarray, rate: int) -> bytes | None:
    oracle = os.path.join(HERE, ".oracle_build", "aac_oracle")
    if not os.path.exists(oracle):
        return None
    with tempfile.TemporaryDirectory() as td:
        fin = os.path.join(td, "in.raw")
        fout = os.path.join(td, "out.aac")
        np.ascontiguousarray(track.T).astype(np.int16).tofile(fin)
        subprocess.run([oracle, "encode", fin, fout, str(rate), "2",
                        "128000"], check=True, capture_output=True)
        with open(fout, "rb") as f:
            return f.read()


def cached_encodes(seed: int, seconds: float, rate: int):
    """(flac_bytes, aac_bytes) for make_track(seed), cached on disk —
    encoding is untimed setup but slow enough to be worth caching."""
    key = hashlib.sha1(
        f"v{CONTENT_VERSION}:{seed}:{seconds}:{rate}".encode()).hexdigest()
    path = os.path.join(CACHE_DIR, key + ".npz")
    oracle_now = os.path.exists(
        os.path.join(HERE, ".oracle_build", "aac_oracle"))
    if os.path.exists(path):
        z = np.load(path)
        fb, ab = z["flac"].tobytes(), z["aac"].tobytes()
        if len(ab) or not oracle_now:
            return fb, ab
        # cached empty AAC blob but the oracle exists now: a prior run
        # without the oracle poisoned this entry — treat as a miss and
        # re-encode (round-3 verdict: the poisoned cache silently zeroed
        # the whole AAC half of the recorded bench)
    from ohpipeline_tpu.codecs import flac
    track = make_track(seconds, rate, seed)
    fb = flac.encode_flac(track, rate, 16)
    ab = encode_aac(track, rate) or b""
    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = path + ".tmp"
    np.savez(tmp, flac=np.frombuffer(fb, np.uint8),
             aac=np.frombuffer(ab, np.uint8))
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
    return fb, ab


class Slab:
    """Named sections inside one contiguous uint8 buffer (so each chunk is
    a single device_put) with matching in-jit unpack."""

    def __init__(self):
        self.fields: list[tuple[str, tuple, np.dtype]] = []

    def add(self, name: str, shape: tuple, dtype) -> None:
        self.fields.append((name, tuple(shape), np.dtype(dtype)))

    def layout(self):
        off = 0
        out = {}
        for name, shape, dt in self.fields:
            n = int(np.prod(shape)) * dt.itemsize
            out[name] = (off, shape, dt)
            off += (n + 63) & ~63
        return out, off

    def alloc(self):
        lay, total = self.layout()
        buf = np.zeros(total, np.uint8)
        views = {}
        for name, (off, shape, dt) in lay.items():
            n = int(np.prod(shape)) * dt.itemsize
            views[name] = buf[off:off + n].view(dt).reshape(shape)
        return buf, views

    def unpack(self, jbuf):
        """Inside jit: slice + bitcast each section out of the buffer."""
        import jax
        import jax.numpy as jnp
        lay, _ = self.layout()
        out = {}
        for name, (off, shape, dt) in lay.items():
            n = int(np.prod(shape)) * dt.itemsize
            raw = jax.lax.slice(jbuf, (off,), (off + n,))
            if dt.itemsize == 1:
                arr = jax.lax.bitcast_convert_type(raw, jnp.dtype(dt))
            else:
                arr = jax.lax.bitcast_convert_type(
                    raw.reshape(-1, dt.itemsize), jnp.dtype(dt))
            out[name] = arr.reshape(shape)
        return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flac-streams", type=int, default=16)
    ap.add_argument("--aac-streams", type=int, default=48)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--passes", type=int, default=32)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--secondary", action="store_true",
                    help="run the per-codec secondary sweep "
                         "(bench_secondary.py) instead of the headline")
    ap.add_argument("--all-codecs", action="store_true",
                    help="run every serving entry point concurrently "
                         "on one chip (FLAC+AAC+HE-AAC+MP3+Vorbis+CELT)"
                         " and report the aggregate realtime-x")
    args = ap.parse_args()
    # self-contained verification: build the conformance oracles if this
    # is a fresh checkout (untimed setup; no-op when already built)
    sys.path.insert(0, os.path.join(HERE, "tools"))
    from oracles import ensure_oracles
    have_oracles = ensure_oracles()
    if args.secondary:
        import bench_secondary
        return bench_secondary.main()
    if args.all_codecs:
        import bench_secondary
        r = bench_secondary.all_codecs_bench()
        r = {"metric": "all_codecs_realtime_x",
             "value": r.pop("all_codecs_realtime_x", 0.0),
             "unit": "x_realtime", **r}
        with open(os.path.join(HERE, "BENCH_ALLCODECS.json"), "w") as f:
            json.dump(r, f, indent=1)
        print(json.dumps(r))
        return 0
    if args.smoke:
        args.flac_streams, args.aac_streams = 2, 2
        args.seconds, args.chunks, args.passes = 4.0, 2, 1
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    # Deadline insurance covers the WHOLE run, including setup: the
    # tunnel can stall inside ANY blocking RPC (observed: a compile /
    # probe hanging with zero CPU during the untimed setup phase, which
    # the old pass-loop-only watchdog never covered).  Until the pass
    # loop installs a best-completed-pass line, a stall past the grace
    # window reports an explicit error instead of hanging forever.
    deadline = time.monotonic() + float(
        os.environ.get("BENCH_DEADLINE_S", "1500"))
    best_line = {"s": None}

    def _watchdog():
        while True:
            time.sleep(10)
            if time.monotonic() > deadline + 120:
                if best_line["s"]:
                    print(best_line["s"], flush=True)
                else:
                    print(json.dumps(
                        {"metric": "flac_aac_decode_realtime_x",
                         "value": 0.0, "unit": "x_realtime",
                         "vs_baseline": 0.0,
                         "error": "deadline: tunnel stalled"}), flush=True)
                os._exit(0 if best_line["s"] else 1)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:   # persistent compile cache: repeat runs skip compilation
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/ohpipeline_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from ohpipeline_tpu import native
    from ohpipeline_tpu.codecs import flac
    from ohpipeline_tpu.codecs.aac import synthesis as ASYN
    from ohpipeline_tpu.codecs.flac import (frames as FF,
                                            _synthesise_group_rice)

    if not native.have_flac_unpack() or not native.have_aac_unpack():
        print(json.dumps({"metric": "flac_aac_decode_realtime_x",
                          "value": 0.0, "unit": "x_realtime",
                          "vs_baseline": 0.0,
                          "error": "native unpackers unavailable"}))
        return 1

    rate = 44100
    S_f, S_a = args.flac_streams, args.aac_streams
    NCH = args.chunks
    nch = 2
    ntracks = max(S_f, S_a)
    enc = [cached_encodes(7 + i, args.seconds, rate)
           for i in range(ntracks)]
    flac_streams = [enc[i][0] for i in range(S_f)]
    aac_streams = [enc[i][1] for i in range(S_a)]
    aac_error = None
    if any(len(a) == 0 for a in aac_streams):
        # the AAC half is part of the headline metric: losing it must be
        # loud, not a silently-smaller number (round-3 verdict item 1c)
        aac_error = ("aac oracle unavailable: aac half NOT measured"
                     if not have_oracles else
                     "aac encodes empty despite oracle present")
        print(f"# BENCH ERROR: {aac_error}", file=sys.stderr)
        aac_streams, S_a = [], 0
    metas = [FF.parse_metadata(b) for b in flac_streams]
    stride = max(m.streaminfo.max_blocksize for m in metas)

    # --- untimed survey: frame counts + per-chunk capacity requirements ---
    fframes = [(m.streaminfo.total_samples + stride - 1) // stride
               for m in metas]
    Gc = -(-max(fframes) // NCH)            # FLAC frames/stream/chunk
    Bf = S_f * Gc * nch                     # FLAC rows per chunk
    SLOTS = stride // 64                    # rice units per row
    survey_esc = native.EscapeList(4 << 20)
    survey_ov = native.RiceOverflow(4 << 20)
    survey_cf = native.RiceConstFill(1 << 20)
    scr = np.zeros((Gc * nch, stride), np.int32)
    gc_t = np.zeros((Gc * nch, SLOTS), np.int32)
    gk_t = np.zeros((Gc * nch, SLOTS), np.int8)
    wm_t = np.zeros((Gc * nch, 32), np.int32)
    f_esc = np.zeros((S_f, NCH), np.int64)   # escapes per (stream, chunk)
    f_ov = np.zeros((S_f, NCH), np.int64)
    f_cf = np.zeros((S_f, NCH), np.int64)
    f_by = np.zeros((S_f, NCH), np.int64)    # slab bytes per (stream, chunk)
    for s, data in enumerate(flac_streams):
        m = metas[s]
        pos = m.header_bytes * 8
        for c in range(NCH):
            survey_esc.count.value = 0
            survey_ov.count.value = 0
            survey_cf.count.value = 0
            n, pos, st, _b, (b0, b1) = native.flac_parse_group_rice(
                data, pos, gc_t, gk_t, wm_t, scr, survey_ov, survey_cf,
                survey_esc, 0,
                sample_rate=m.streaminfo.sample_rate,
                bits_per_sample=m.streaminfo.bits_per_sample,
                max_blocksize=stride, channels=nch, max_frames=Gc)
            f_esc[s, c] = survey_esc.count.value
            f_ov[s, c] = survey_ov.count.value
            f_cf[s, c] = survey_cf.count.value
            f_by[s, c] = b1 - b0
            if n == 0:
                break
    FCAP = int(max(256, f_esc.sum(axis=0).max()))
    OCAP = int(max(256, -(-(f_ov.sum(axis=0).max() + 32) // 256) * 256))
    CCAP = int(max(64, -(-(f_cf.sum(axis=0).max() + 8) // 64) * 64))
    # raw stream bytes per chunk slab, padded for the device's word loads
    BITCAP = int(-(-(f_by.sum(axis=0).max() + 64) // 4096) * 4096)

    if S_a:
        aframes = []
        for data in aac_streams:
            p, tot = 0, 0
            while True:
                n, p, _b = native.aac_parse_group(data, p, channels=nch,
                                                 max_frames=256)
                if n == 0:
                    break
                tot += n
            aframes.append(tot)
        Fc = -(-max(aframes) // NCH)        # AAC frames/stream/chunk
        SC = S_a * nch
        # second pass: exact per-chunk escape / side-channel requirements
        esc_tot = np.zeros(NCH, np.int64)
        side_tot = np.zeros(NCH, np.int64)
        short_tot = np.zeros(NCH, np.int64)
        tns_tot = np.zeros(NCH, np.int64)
        for data in aac_streams:
            p = 0
            for c in range(NCH):
                n, p, b = native.aac_parse_group(data, p, channels=nch,
                                                 max_frames=Fc)
                if n == 0:
                    break
                q = b["quant"][:n * nch]
                esc_tot[c] += int((np.abs(q) > 7).sum())
                exotic = (b["cb"][:n * nch] >= 13).any(axis=1)
                has_tns = b["tnsn"][:n * nch].any(axis=1)
                # exotic rows go to the f32 side plane; TNS-only rows
                # ride the wire + pooled filter conditioning planes
                side_tot[c] += int(exotic.sum())
                tns_tot[c] += int((has_tns & ~exotic).sum())
                short_tot[c] += int((b["ics"][:n * nch, 0] == 2).sum())
        # bucket caps coarsely: exact-cap shape changes would retrigger
        # the (expensive) XLA compile; padding compresses on the wire
        ACAP = max(256, 1 << int(np.ceil(np.log2(esc_tot.max() + 64))))
        MAXS = int(max(32, -(-(side_tot.max() + 8) // 32) * 32))
        SSCAP = int(max(64, -(-(short_tot.max() + 8) // 64) * 64))
        TNSCAP = int(max(64, -(-(tns_tot.max() + 8) // 64) * 64))
    else:
        Fc, SC, ACAP, MAXS, SSCAP, TNSCAP = 1, 2, 128, 8, 64, 64

    # --- chunk slab layout: ONE contiguous buffer per chunk carrying BOTH
    # codecs' planes, decoded by ONE merged device program per chunk (one
    # upload + one exec RPC instead of two of each — each round trip costs
    # ~20 ms of fixed overhead on the tunnel) ------------------------------
    mslab = Slab()
    # FLAC rides the rice wire: the entropy-coded stream bytes themselves
    # (~0.7 B/sample) plus the decode plan (grid cursors, overflow/const
    # fills), decoded on device by codecs/flac/rice_jax.decode_units —
    # not expanded residual planes (1.5 B/sample)
    mslab.add("bits", (BITCAP,), np.uint8)
    mslab.add("gcur", (Bf, SLOTS), np.int32)
    mslab.add("gk", (Bf, SLOTS), np.int8)
    mslab.add("ocur", (OCAP,), np.int32)
    mslab.add("okk", (OCAP,), np.int8)
    mslab.add("omode", (OCAP,), np.int8)
    mslab.add("ocnt", (OCAP,), np.int8)
    mslab.add("orow", (OCAP,), np.int32)
    mslab.add("opos", (OCAP,), np.int32)
    mslab.add("cfrow", (CCAP,), np.int32)
    mslab.add("cfval", (CCAP,), np.int32)
    mslab.add("cfn", (CCAP,), np.int32)
    mslab.add("warm", (Bf, 32), np.int32)
    mslab.add("coeffs", (Bf, 32), np.int16)
    mslab.add("shift", (Bf,), np.int8)
    mslab.add("order", (Bf,), np.int8)
    mslab.add("wasted", (Bf,), np.int8)
    mslab.add("assign", (S_f * Gc,), np.int8)
    mslab.add("erow", (FCAP,), np.int32)
    mslab.add("epos", (FCAP,), np.int32)
    mslab.add("eval", (FCAP,), np.int32)
    if S_a:
        mslab.add("q4", (Fc, SC, 512), np.uint8)
        mslab.add("sfb", (Fc, SC, 64), np.uint8)
        mslab.add("msb", (Fc, SC // 2, 128), np.uint8)
        mslab.add("opx", (Fc, SC), np.uint8)
        mslab.add("ssf", (SSCAP, 1024), np.uint8)
        mslab.add("ssr", (SSCAP,), np.int32)
        mslab.add("epak", (ACAP,), np.int32)    # row*1024+pos, -1 pad
        mslab.add("eva2", (ACAP,), np.int16)    # |q|<=8191 fits int16
        mslab.add("side", (MAXS, 1024), np.float32)
        mslab.add("srow", (MAXS,), np.int32)
        mslab.add("tfi", (TNSCAP, 1024), np.uint8)
        mslab.add("tco", (TNSCAP, 24, 12), np.float32)
        mslab.add("tdir", (TNSCAP, 24), np.uint8)
        mslab.add("trow", (TNSCAP,), np.int32)
    m_bufs, m_views = zip(*[mslab.alloc() for _ in range(NCH)])
    f_views = a_views = m_views

    counts = {"flac_samples": 0, "aac": 0}
    state = {"fail": None}

    class _View:
        """EscapeList backed by one chunk's slab sections."""

        def __init__(self, v):
            import ctypes
            v["erow"][:] = -1
            self.row, self.pos, self.val = v["erow"], v["epos"], v["eval"]
            self.cap = len(self.row)
            self.count = ctypes.c_int32(0)

    class _OvView:
        """RiceOverflow backed by one chunk's slab sections."""

        def __init__(self, v):
            import ctypes
            v["orow"][:] = -1
            v["ocnt"][:] = 0
            self.cur, self.k = v["ocur"], v["okk"]
            self.mode, self.cnt = v["omode"], v["ocnt"]
            self.row, self.pos = v["orow"], v["opos"]
            self.cap = len(self.row)
            self.count = ctypes.c_int32(0)

    class _CfView:
        """RiceConstFill backed by one chunk's slab sections."""

        def __init__(self, v):
            import ctypes
            v["cfrow"][:] = -1
            self.row, self.val, self.n = v["cfrow"], v["cfval"], v["cfn"]
            self.cap = len(self.row)
            self.count = ctypes.c_int32(0)

    class _SsfView:
        """ShortSfPool backed by one chunk's slab sections."""

        def __init__(self, v):
            import ctypes
            v["ssr"][:] = -1
            self.sf, self.row = v["ssf"], v["ssr"]
            self.cap = len(self.row)
            self.count = ctypes.c_int32(0)

    class _Scratch:
        """Host-side EscapeList on scratch arrays (packed into the slab
        after the chunk's parse)."""

        def __init__(self, cap):
            import ctypes
            self.row = np.zeros(cap, np.int32)
            self.pos = np.zeros(cap, np.int32)
            self.val = np.zeros(cap, np.int32)
            self.cap = cap
            self.count = ctypes.c_int32(0)

    class _TnsView:
        """TnsPool backed by one chunk's slab sections."""

        def __init__(self, v):
            import ctypes
            v["trow"][:] = -1
            self.tfi, self.tco = v["tfi"], v["tco"]
            self.tdir, self.row = v["tdir"], v["trow"]
            self.cap = len(self.row)
            self.count = ctypes.c_int32(0)

    def parse_all(f_done, a_done):
        try:
            _parse_all(f_done, a_done)
        finally:
            for e in list(f_done) + list(a_done):
                e.set()

    def _parse_all(f_done, a_done):
        counts["flac_samples"] = counts["aac"] = 0
        fpos = [metas[s].header_bytes * 8 for s in range(S_f)]
        apos = [0] * S_a
        pshape = [np.zeros(nch, np.int32) for _ in range(S_a)]
        abatch = None                      # reused aac parse buffers
        for c in range(NCH):
            v = f_views[c]
            esc = _View(v)
            over = _OvView(v)
            cfl = _CfView(v)
            bbase = 0
            for s in range(S_f):
                m = metas[s]
                r0 = s * Gc * nch
                oc0 = over.count.value
                n, fpos[s], st, b, (b0, b1) = native.flac_parse_group_rice(
                    flac_streams[s], fpos[s],
                    v["gcur"][r0:r0 + Gc * nch], v["gk"][r0:r0 + Gc * nch],
                    v["warm"][r0:r0 + Gc * nch], scr, over, cfl, esc, r0,
                    sample_rate=m.streaminfo.sample_rate,
                    bits_per_sample=m.streaminfo.bits_per_sample,
                    max_blocksize=stride, channels=nch, max_frames=Gc)
                if st < 0:
                    state["fail"] = f"flac rice wire status {st}"
                    return
                nb = b1 - b0
                if bbase + nb > BITCAP:
                    state["fail"] = "flac bits slab overflow"
                    return
                v["bits"][bbase:bbase + nb] = np.frombuffer(
                    flac_streams[s], np.uint8, nb, b0)
                if bbase:
                    gsl = v["gcur"][r0:r0 + Gc * nch]
                    gsl[v["gk"][r0:r0 + Gc * nch] >= 0] += bbase * 8
                    over.cur[oc0:over.count.value] += bbase * 8
                bbase += nb
                rows = n * nch
                counts["flac_samples"] += int(b["blocksize"][:n].sum()) * nch
                v["coeffs"][r0:r0 + rows] = b["coeffs"][:rows]
                v["shift"][r0:r0 + rows] = b["shift"][:rows]
                v["order"][r0:r0 + rows] = b["order"][:rows]
                v["wasted"][r0:r0 + rows] = b["wasted"][:rows]
                v["coeffs"][r0 + rows:r0 + Gc * nch] = 0
                v["shift"][r0 + rows:r0 + Gc * nch] = 0
                v["order"][r0 + rows:r0 + Gc * nch] = 0
                v["wasted"][r0 + rows:r0 + Gc * nch] = 0
                v["assign"][s * Gc:s * Gc + n] = b["assign"][:n]
                v["assign"][s * Gc + n:(s + 1) * Gc] = 0
            v["bits"][bbase:] = 0
            f_done[c].set()
            if not S_a:
                continue
            va = a_views[c]
            esc = _Scratch(ACAP)
            ssfv = _SsfView(va)
            tnsv = _TnsView(va)
            va["srow"][:] = -1
            n_side = 0
            for s in range(S_a):
                if os.environ.get("OHP_AAC_FUSED", "1") != "0":
                    # fused parse + zz emission: one C call, each frame's
                    # wire rows emitted while its dense planes are hot
                    n, apos[s], b, special = native.aac_parse_group_zz(
                        aac_streams[s], apos[s], channels=nch,
                        max_frames=Fc, prev_shape=pshape[s], esc=esc,
                        ssf=ssfv, q4=va["q4"], sfb=va["sfb"],
                        msb=va["msb"], opx=va["opx"], col0=s * nch,
                        max_special=Fc * nch, tns=tnsv, out=abatch)
                    abatch = b
                    counts["aac"] += n
                else:
                    n, apos[s], b = native.aac_parse_group(
                        aac_streams[s], apos[s], channels=nch,
                        max_frames=Fc, out=abatch)
                    abatch = b
                    counts["aac"] += n
                    special = native.aac_prepare_rows_zz(
                        b, n, Fc, nch, pshape[s], esc, ssfv,
                        q4=va["q4"], sfb=va["sfb"], msb=va["msb"],
                        opx=va["opx"], col0=s * nch, max_special=Fc * nch,
                        tns=tnsv)
                if special is None:
                    state["fail"] = "aac zz capacity"
                    return
                if len(special):
                    # specials are (frame, channel) rows; prep the frames
                    # they touch in one vectorized host call, then ship
                    # only the flagged channels
                    frames = np.unique(np.asarray(special) // nch)
                    k = len(frames)
                    idx = np.asarray([f * nch + cc for f in frames
                                      for cc in range(nch)])
                    sub = {key: (val[idx] if key not in
                                 ("msmask", "rate_index")
                                 else (val[frames]
                                       if key == "msmask" else val))
                           for key, val in b.items()}
                    sp, _ = ASYN.prepare_group(sub, k, nch,
                                               np.zeros(nch, np.int32))
                    fmap = {int(f): j for j, f in enumerate(frames)}
                    for r in special:
                        f, cc = divmod(int(r), nch)
                        if n_side >= MAXS:
                            state["fail"] = "side overflow"
                            return
                        va["side"][n_side] = sp[fmap[f], cc]
                        va["srow"][n_side] = f * SC + s * nch + cc
                        n_side += 1
            # pack escapes: (row,pos,val int32 x3) -> (row*1024+pos int32,
            # val int16) — halves this plane's wire bytes
            ne = esc.count.value
            va["epak"][:ne] = esc.row[:ne] * 1024 + esc.pos[:ne]
            va["epak"][ne:] = -1
            va["eva2"][:ne] = esc.val[:ne]
            va["eva2"][ne:] = 0
            a_done[c].set()

    if os.environ.get("BENCH_PARSE_ONLY"):
        # host-side diagnostic: time the full parse/slab-fill path
        # (the producer leg of every timed pass) without touching the
        # device — separates parse CPU from tunnel weather
        for trial in range(3):
            fq = [threading.Event() for _ in range(NCH)]
            aq = [threading.Event() for _ in range(NCH)]
            t0 = time.perf_counter()
            parse_all(fq, aq)
            print(json.dumps({"parse_all_s":
                              round(time.perf_counter() - t0, 3),
                              "fail": state["fail"]}))
        return 0

    # --- device program: ONE merged scan-free program per chunk ------------
    def flac_part(v):
        pcm = _synthesise_group_rice(
            v["bits"], v["gcur"], v["gk"],
            v["ocur"], v["okk"], v["omode"], v["ocnt"], v["orow"],
            v["opos"], v["cfrow"], v["cfval"], v["cfn"],
            v["warm"], v["erow"], v["epos"], v["eval"],
            v["coeffs"].astype(jnp.int32), v["shift"].astype(jnp.int32),
            v["order"].astype(jnp.int32), v["wasted"].astype(jnp.int32),
            v["assign"].astype(jnp.int32), nch)
        return jnp.max(jnp.abs(pcm))

    if S_a:
        W, SW = ASYN.window_bank()
        aac_consts = [jnp.asarray(ASYN._imdct_matrix(2048)),
                      jnp.asarray(ASYN._imdct_matrix(256)),
                      jnp.asarray(W), jnp.asarray(SW)]

        aac_consts.append(jnp.asarray(ASYN.sf_expand_matrix(
            # all bench content is 44.1 kHz (rate_index 4)
            4)))

        def merged_chunk_fn(buf, ov, ml, ms_, w_, sw_, esf):
            v = mslab.unpack(buf)
            pk_f = flac_part(v)
            pcm, ov2 = ASYN.decode_chunk_zz(
                v["q4"], v["sfb"], v["ssf"], v["ssr"], v["msb"], v["opx"],
                v["epak"], None, v["eva2"],
                v["side"], v["srow"], ov, ml, ms_, w_, sw_, esf,
                v["tfi"], v["tco"], v["tdir"], v["trow"])
            return jnp.maximum(pk_f, jnp.max(jnp.abs(pcm))), ov2

        merged_exec = jax.jit(merged_chunk_fn).lower(
            jax.ShapeDtypeStruct(m_bufs[0].shape, np.uint8),
            jax.ShapeDtypeStruct((SC, 1024), np.float32),
            *[jax.ShapeDtypeStruct(c.shape, c.dtype)
              for c in aac_consts]).compile()
    else:
        merged_exec = jax.jit(
            lambda buf: flac_part(mslab.unpack(buf))).lower(
            jax.ShapeDtypeStruct(m_bufs[0].shape, np.uint8)).compile()

    # one exec RPC for the WHOLE pass: each per-chunk exec blocks its
    # caller for a full tunnel round trip (~20 ms fixed + result wait;
    # the AAC overlap carry serialises them), so folding the chunk loop
    # into one lax.scan saves NCH-1 blocking round trips per pass.  The
    # per-chunk program stays the compile unit (the scan body), so
    # compile time and the persistent cache behave like the old path.
    # measured head-to-head (one 29-36 MB/s window each): per-chunk
    # 552x @ 37 MB/s (wall = wire + 1.08 s), one-exec 373x @ 29 MB/s
    # (wall = wire + 2.09 s) — one-exec saves 7 exec round trips but
    # must wait for ALL slabs before computing, losing the upload/exec
    # overlap, which costs more than the RPCs below ~37 MB/s.  Default
    # stays the overlapped per-chunk loop.
    one_exec = None
    group_exec = None
    GEX = 0
    if S_a and not args.smoke:
        def pass_fn(bufs, ov0, ml, ms_, w_, sw_, esf):
            xs = jnp.stack(bufs)

            def step(ov, buf):
                pk, ov2 = merged_chunk_fn(buf, ov, ml, ms_, w_, sw_,
                                          esf)
                return ov2, pk

            ov_end, pks = jax.lax.scan(step, ov0, xs)
            return jnp.max(pks), ov_end

        def compile_group(g):
            return jax.jit(pass_fn).lower(
                tuple(jax.ShapeDtypeStruct(m_bufs[0].shape, np.uint8)
                      for _ in range(g)),
                jax.ShapeDtypeStruct((SC, 1024), np.float32),
                *[jax.ShapeDtypeStruct(c.shape, c.dtype)
                  for c in aac_consts]).compile()

        if os.environ.get("OHP_BENCH_ONE_EXEC", "0") != "0":
            one_exec = compile_group(NCH)
        # split-exec middle ground: G-chunk scans keep most of the
        # upload/exec overlap while paying NCH/G exec round trips
        # instead of NCH (OHP_BENCH_EXEC_SPLIT=G, G must divide NCH)
        GEX = int(os.environ.get("OHP_BENCH_EXEC_SPLIT", "0") or 0)
        if GEX > 1 and NCH % GEX == 0:
            group_exec = compile_group(GEX)

    warm_exec = jax.jit(lambda x: jnp.sum(x)).lower(
        jax.ShapeDtypeStruct((128, 128), jnp.float32)).compile()

    # untimed program warm: the first execution of each compiled program
    # pays program load + constant materialisation through the tunnel
    # (minutes for these program sizes) — run each once on the zeroed
    # slabs before any timed pass
    float(warm_exec(jnp.asarray(np.ones((128, 128), np.float32))))
    if one_exec is not None or group_exec is not None:
        fn = one_exec if one_exec is not None else group_exec
        g = NCH if one_exec is not None else GEX
        pk0, _ov = fn(tuple(jnp.asarray(b) for b in m_bufs[:g]),
                      jnp.asarray(np.zeros((SC, 1024), np.float32)),
                      *aac_consts)
        float(pk0)
    elif S_a:
        pk0, ov0_ = merged_exec(jnp.asarray(m_bufs[0]),
                                jnp.asarray(np.zeros((SC, 1024),
                                                     np.float32)),
                                *aac_consts)
        float(pk0)
    else:
        float(merged_exec(jnp.asarray(m_bufs[0])))

    # --- timed passes -------------------------------------------------------
    def timed_pass():
        t0 = time.perf_counter()
        # parse starts immediately (the C parsers release the GIL) and
        # overlaps the regime-setting warm dispatch below
        fq = [threading.Event() for _ in range(NCH)]
        aq = [threading.Event() for _ in range(NCH)]
        th = threading.Thread(target=parse_all, args=(fq, aq), daemon=True)
        th.start()
        # sync-transfer regime before the first slab: deferred async
        # staging materialises inside the first exec at a far worse rate
        float(warm_exec(jnp.asarray(np.ones((128, 128), np.float32))))
        # uploads ride their own thread so chunk c+1's transfer overlaps
        # chunk c's exec: the exec RPC blocks its caller through the
        # tunnel, but the link carries the next slab while the device
        # computes (the ~0.6 s reclaim identified in NEXT.md)
        devs: list = [None] * NCH
        upev = [threading.Event() for _ in range(NCH)]
        # per-pass wire attribution: bytes and seconds spent inside the
        # blocking upload calls of THIS pass — the pass's own effective
        # link rate, reported next to the (separate-moment) probe's
        up_stats = {"bytes": 0, "secs": 0.0}

        def uploader():
            try:
                for c in range(NCH):
                    fq[c].wait()
                    if S_a:
                        aq[c].wait()
                    if state["fail"]:
                        return
                    tu = time.perf_counter()
                    d = jnp.asarray(m_bufs[c])
                    jax.block_until_ready(d)
                    up_stats["secs"] += time.perf_counter() - tu
                    up_stats["bytes"] += m_bufs[c].nbytes
                    devs[c] = d
                    upev[c].set()
            except Exception as e:          # noqa: BLE001 — tunnel drop
                state["fail"] = state["fail"] or f"upload: {e}"
            finally:
                for e_ in upev:             # never leave the main loop
                    e_.set()                # blocked on a dead uploader

        up = threading.Thread(target=uploader, daemon=True)
        up.start()
        trace = []
        if one_exec is not None or group_exec is not None:
            # grouped exec: wait for each G-chunk group's slabs, then
            # one exec RPC per group (G=NCH: single RPC, no upload/exec
            # overlap; G<NCH: groups overlap the next group's uploads)
            fn = one_exec if one_exec is not None else group_exec
            g = NCH if one_exec is not None else GEX
            ov = jnp.asarray(np.zeros((SC, 1024), np.float32))
            peaks = []
            for g0 in range(0, NCH, g):
                t1 = time.perf_counter()
                for c in range(g0, g0 + g):
                    upev[c].wait()
                if state["fail"]:
                    th.join()
                    up.join()
                    return None, None, None
                t2 = time.perf_counter()
                pk, ov = fn(tuple(devs[g0:g0 + g]), ov, *aac_consts)
                peaks.append(pk)
                for c in range(g0, g0 + g):
                    devs[c] = None
                trace.append(("g", g0, round(t2 - t1, 2),
                              round(time.perf_counter() - t2, 2)))
            peak = max(float(p) for p in peaks)
            th.join()
            up.join()
            if os.environ.get("BENCH_TRACE"):
                print(json.dumps({"trace": trace}))
            mbps = up_stats["bytes"] / 1e6 / max(up_stats["secs"], 1e-9)
            return time.perf_counter() - t0, peak, mbps
        peaks = []
        ov = jnp.asarray(np.zeros((SC, 1024), np.float32)) if S_a else None
        for c in range(NCH):
            t1 = time.perf_counter()
            upev[c].wait()
            if state["fail"]:
                th.join()
                up.join()
                return None, None, None
            t2 = time.perf_counter()
            dev = devs[c]
            devs[c] = None
            if S_a:
                pk, ov = merged_exec(dev, ov, *aac_consts)
            else:
                pk = merged_exec(dev)
            t3 = time.perf_counter()
            peaks.append(pk)
            trace.append(("m", c, round(t2 - t1, 2), round(t3 - t2, 2)))
        th.join()
        up.join()
        peak = max(float(p) for p in peaks)
        if os.environ.get("BENCH_TRACE"):
            print(json.dumps({"trace": trace}))
        mbps = up_stats["bytes"] / 1e6 / max(up_stats["secs"], 1e-9)
        return time.perf_counter() - t0, peak, mbps

    if os.environ.get("BENCH_PHASES"):
        float(warm_exec(jnp.asarray(np.ones((128, 128), np.float32))))
        fq = [threading.Event() for _ in range(NCH)]
        aq = [threading.Event() for _ in range(NCH)]
        t0 = time.perf_counter()
        parse_all(fq, aq)
        t_parse = time.perf_counter() - t0
        t_tx = t_ex = 0.0
        ov = jnp.asarray(np.zeros((SC, 1024), np.float32)) if S_a else None
        for c in range(NCH):
            t0 = time.perf_counter()
            dev = jnp.asarray(m_bufs[c])
            jax.block_until_ready(dev)
            t_tx += time.perf_counter() - t0
            t0 = time.perf_counter()
            if S_a:
                pk, ov = merged_exec(dev, ov, *aac_consts)
            else:
                pk = merged_exec(dev)
            float(pk)
            t_ex += time.perf_counter() - t0
        print(json.dumps({
            "parse_s": round(t_parse, 2),
            "tx_s": round(t_tx, 2), "exec_s": round(t_ex, 2),
            "slab_mb": round(m_bufs[0].nbytes * NCH / 1e6, 1),
            "FCAP": FCAP, "ACAP": ACAP, "MAXS": MAXS, "SSCAP": SSCAP,
            "TNSCAP": TNSCAP,
            "Gc": Gc, "Fc": Fc}))
        return 0

    # untimed tunnel-weather probe: one 16 MB incompressible upload.
    # The link's effective bandwidth varies by ~5x run to run / VM to VM
    # (documented in NEXT.md); reporting it alongside the metric lets a
    # reader separate code speed from link weather.
    probe = np.random.default_rng(0).integers(0, 256, 16 << 20, np.uint8) \
        if not args.smoke else np.zeros(1 << 20, np.uint8)
    t0p = time.perf_counter()
    jax.block_until_ready(jnp.asarray(probe))
    tunnel_mbps = probe.nbytes / 1e6 / max(time.perf_counter() - t0p, 1e-9)

    walls = []
    peak = 0.0
    # (the deadline watchdog guarding this loop — and the whole setup
    # before it — was installed right after arg parsing; the graceful
    # break below stops starting new passes near the deadline, the
    # watchdog rescues a pass hung INSIDE a blocking RPC by printing
    # the best completed result and exiting)
    best_mbps = {"v": 0.0}
    for _ in range(max(1, args.passes)):
        w, p, mbps = timed_pass()
        if w is None:
            print(json.dumps({"metric": "flac_aac_decode_realtime_x",
                              "value": 0.0, "unit": "x_realtime",
                              "vs_baseline": 0.0, "error": state["fail"]}))
            return 1
        walls.append(w)
        if w <= min(walls):
            best_mbps["v"] = mbps       # the best pass's own wire rate
        peak = max(peak, p)
        fa = counts["flac_samples"] / nch / rate
        aa = counts["aac"] * 1024 / rate
        v = (fa + aa) / min(walls)
        best = {"metric": "flac_aac_decode_realtime_x",
                "value": round(v, 1),
                "unit": "x_realtime", "vs_baseline": round(v / 500.0, 3),
                "flac_audio_s": round(fa, 1), "aac_audio_s": round(aa, 1),
                "wall_s": round(min(walls), 2),
                "tunnel_mbps": round(tunnel_mbps, 1),
                "pass_mbps": round(best_mbps["v"], 1),
                "passes_completed": len(walls)}
        if aac_error:
            best["error"] = aac_error
        best_line["s"] = json.dumps(best)
        if time.monotonic() > deadline - 60:
            break                       # enough passes; report what we have
    wall = min(walls)
    if os.environ.get("BENCH_DEBUG"):
        print(json.dumps({"walls": [round(w, 2) for w in walls],
                          "Gc": Gc, "Fc": Fc, "FCAP": FCAP,
                          "ACAP": ACAP, "MAXS": MAXS}))

    flac_audio = counts["flac_samples"] / nch / rate
    aac_audio = counts["aac"] * 1024 / rate
    total_audio = flac_audio + aac_audio
    value = total_audio / wall
    ok = True
    if args.smoke:
        info, out = flac.decode_flac(flac_streams[0])
        track0 = make_track(args.seconds, rate, seed=7)
        ok = bool(np.array_equal(out, track0))
        # the DEVICE rice path must match the host decode sample-exactly:
        # re-run chunk 0's planes through _synthesise_group_rice alone
        # and compare stream 0's rows against decode_flac
        v0 = f_views[0]
        pcm_r = np.asarray(jax.jit(
            lambda *a: _synthesise_group_rice(*a, nch))(
            v0["bits"], v0["gcur"], v0["gk"], v0["ocur"], v0["okk"],
            v0["omode"], v0["ocnt"], v0["orow"], v0["opos"], v0["cfrow"],
            v0["cfval"], v0["cfn"], v0["warm"], v0["erow"], v0["epos"],
            v0["eval"], v0["coeffs"].astype(np.int32),
            v0["shift"].astype(np.int32), v0["order"].astype(np.int32),
            v0["wasted"].astype(np.int32), v0["assign"].astype(np.int32)))
        nf0 = min(Gc, out.shape[1] // stride + 1)
        got = pcm_r[:nf0].transpose(1, 0, 2).reshape(nch, -1)
        ok = ok and bool(np.array_equal(
            got[:, :min(got.shape[1], out.shape[1])],
            out[:, :min(got.shape[1], out.shape[1])]))
        if S_a:
            # decode chunk 0 on the zz device path and gate it against the
            # float64 reference decode of the same wire: the device must
            # stay within a fraction of one 16-bit LSB
            ov0 = jnp.asarray(np.zeros((SC, 1024), np.float32))
            va = a_views[0]
            pcm_z, _ = jax.jit(ASYN.decode_chunk_zz)(
                jnp.asarray(va["q4"]), jnp.asarray(va["sfb"]),
                jnp.asarray(va["ssf"]), jnp.asarray(va["ssr"]),
                jnp.asarray(va["msb"]), jnp.asarray(va["opx"]),
                jnp.asarray(va["epak"]), None,
                jnp.asarray(va["eva2"]), jnp.asarray(va["side"]),
                jnp.asarray(va["srow"]), ov0, *aac_consts,
                jnp.asarray(va["tfi"]), jnp.asarray(va["tco"]),
                jnp.asarray(va["tdir"]), jnp.asarray(va["trow"]))
            ref_pcm, _ = ASYN.decode_chunk_zz_reference(
                va["q4"], va["sfb"], va["ssf"], va["ssr"], va["msb"],
                va["opx"], va["epak"], None, va["eva2"], va["side"],
                va["srow"], np.zeros((SC, 1024), np.float32),
                np.asarray(aac_consts[-1]),
                va["tfi"], va["tco"], va["tdir"], va["trow"])
            derr = np.asarray(pcm_z) - ref_pcm
            rms = float(np.sqrt((derr ** 2).mean()))
            aac_ok = rms <= 0.25 and float(np.abs(derr).max()) <= 1.0
            line_extra = {"aac_rms_vs_f64": round(rms, 4)}
            ok = ok and bool(aac_ok)
    line = {"metric": "flac_aac_decode_realtime_x",
            "value": round(value, 1), "unit": "x_realtime",
            "vs_baseline": round(value / 500.0, 3),
            "flac_audio_s": round(flac_audio, 1),
            "aac_audio_s": round(aac_audio, 1),
            "wall_s": round(wall, 2),
            "tunnel_mbps": round(tunnel_mbps, 1),
            "pass_mbps": round(best_mbps["v"], 1)}
    # compact serving-floor probe (the four 16-stream device serving
    # paths) folded into the headline artifact so the recorded bench
    # certifies the secondary floor too; skipped near the deadline or
    # with OHP_BENCH_NO_FLOOR=1 (a cold compile of those programs
    # through the tunnel can take minutes — they are cached after the
    # first run, and the nightly --secondary covers the full sweep)
    if not args.smoke and not os.environ.get("OHP_BENCH_NO_FLOOR") \
            and time.monotonic() < deadline - 120:
        try:
            import bench_secondary
            fp = bench_secondary.floor_probe(passes=2)
            line["secondary_floor"] = fp.get("floor", 0.0)
            line["secondary_codecs"] = {
                k: round(v, 1) for k, v in fp.get("codecs", {}).items()}
        except Exception as e:                       # noqa: BLE001
            line["secondary_floor_error"] = str(e)[:200]
    if aac_error:
        line["error"] = aac_error
    if args.smoke:
        line["bit_exact_flac"] = ok
        line["peak"] = peak
        if S_a:
            line.update(line_extra)
    print(json.dumps(line))
    return 0 if ok and not aac_error else 1


if __name__ == "__main__":
    sys.exit(main())
