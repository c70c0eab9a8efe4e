"""Native SBR payload parser (native/sbr_parse.cc) vs the Python
parse_sbr_data oracle: field-exact agreement on real oracle-encoded
HE-AAC streams (v1 stereo incl. coupling, v2 mono+PS) including the
cross-frame delta-coding state, plus hostile-input fuzz (native either
matches the Python parse exactly or declines and the codec falls back).

Reference stance: ISO 14496-3 4.6.18.3 sbr_data() /
fdk-aac libSBRdec env_extr.cpp (see sbr.py)."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from ohpipeline_tpu import native
from ohpipeline_tpu.codecs.aac import bitstream as BS
from ohpipeline_tpu.codecs.aac.sbr import SbrDecoder, SbrError

HERE = os.path.dirname(os.path.abspath(__file__))
ORACLE = os.path.join(HERE, "..", ".oracle_build", "aac_oracle")

pytestmark = pytest.mark.skipif(not native.have_sbr_parse(),
                                reason="native sbr_parse unavailable")


def _encode_he(seed: int, channels: int, aot: str,
               seconds: float = 3.0) -> bytes:
    rate = 44100
    rng = np.random.default_rng(seed)
    t = np.arange(int(rate * seconds)) / rate
    x = (np.sin(2 * np.pi * (300 + 200 * rng.random()) * t) * 11000
         + np.sin(2 * np.pi * 3000 * t) * 4000
         + rng.standard_normal(len(t)) * 700)
    x = np.clip(x, -32000, 32000)
    pcm = (np.stack([x, np.roll(x, 17)]) if channels == 2
           else x[None, :]).astype(np.int16)
    with tempfile.TemporaryDirectory() as td:
        fin = os.path.join(td, "i.raw")
        fout = os.path.join(td, "o.aac")
        np.ascontiguousarray(pcm.T).tofile(fin)
        subprocess.run([ORACLE, "encode", fin, fout, "44100",
                        str(channels), "48000", "2", aot],  # tt 2 = ADTS
                       check=True, capture_output=True)
        return open(fout, "rb").read()


def _payloads(data: bytes, channels: int):
    """(payload, nbits, crc) per ADTS frame via the native unpacker."""
    n, _pos, batch = native.aac_parse_group_sbr(
        data, 0, channels=channels, max_frames=256)
    return [batch["sbr"][f] for f in range(n) if batch["sbr"][f]]


def _run_both(data: bytes, channels: int, stereo: bool):
    """Parse every payload through both parsers (independent decoder
    instances so the delta state chains independently)."""
    pls = _payloads(data, channels)
    assert len(pls) > 20
    os.environ["OHP_SBR_PY"] = "1"
    try:
        d_py = SbrDecoder(22050)
        ref = [d_py.parse_payload(p, nb, stereo=stereo, crc=c)
               for (p, nb, c) in pls]
    finally:
        del os.environ["OHP_SBR_PY"]
    d_nat = SbrDecoder(22050)
    used_native = 0
    got = []
    for (p, nb, c) in pls:
        chans, coupling = d_nat.parse_payload(p, nb, stereo=stereo, crc=c)
        got.append((chans, coupling))
        # payload frames after the header frame must ride the native path
        if getattr(d_nat, "_native_res_maps", None) is not None:
            used_native += 1
    assert used_native == len(pls)
    return ref, got


def _assert_equal(ref, got, n_q):
    for f, ((rc, rcpl), (gc, gcpl)) in enumerate(zip(ref, got)):
        assert rcpl == gcpl, f
        assert len(rc) == len(gc)
        for c, (r, g) in enumerate(zip(rc, gc)):
            rg, gg = r.grid, g.grid
            for fld in ("frame_class", "n_env", "pointer", "tran_env",
                        "n_noise"):
                assert getattr(rg, fld) == getattr(gg, fld), (f, c, fld)
            assert list(rg.t_env) == list(gg.t_env), (f, c)
            assert list(rg.t_noise) == list(gg.t_noise), (f, c)
            assert list(rg.freq_res) == list(gg.freq_res), (f, c)
            assert list(r.df_env) == list(g.df_env), (f, c)
            assert list(r.df_noise) == list(g.df_noise), (f, c)
            assert list(r.invf) == list(g.invf), (f, c)
            assert len(r.env) == len(g.env)
            for e, (re_, ge_) in enumerate(zip(r.env, g.env)):
                np.testing.assert_array_equal(re_, ge_), (f, c, e)
            for e, (rn, gn) in enumerate(zip(r.noise, g.noise)):
                np.testing.assert_array_equal(rn, gn), (f, c, e)
            np.testing.assert_array_equal(r.add_harmonic, g.add_harmonic)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle missing")
def test_he_v1_stereo_field_exact():
    data = _encode_he(11, 2, "5")
    ref, got = _run_both(data, 2, stereo=True)
    _assert_equal(ref, got, None)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle missing")
def test_he_v1_mono_field_exact():
    data = _encode_he(12, 1, "5")
    ref, got = _run_both(data, 1, stereo=False)
    _assert_equal(ref, got, None)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle missing")
def test_he_v2_ps_field_exact():
    """v2: mono SBR + PS extension — the native parser must hand the PS
    bit range back so PsData decodes identically (incl. its own
    delta-state chain)."""
    data = _encode_he(13, 2, "29")
    pls = _payloads(data, 1)
    assert len(pls) > 20
    os.environ["OHP_SBR_PY"] = "1"
    try:
        d_py = SbrDecoder(22050)
        ref = [d_py.parse_payload(p, nb, stereo=False, crc=c)
               for (p, nb, c) in pls]
    finally:
        del os.environ["OHP_SBR_PY"]
    d_nat = SbrDecoder(22050)
    got = [d_nat.parse_payload(p, nb, stereo=False, crc=c)
           for (p, nb, c) in pls]
    _assert_equal(ref, got, None)
    saw_ps = 0
    for (rc, _), (gc, _) in zip(ref, got):
        rp, gp = rc[0].ps, gc[0].ps
        assert (rp is None) == (gp is None)
        if rp is None:
            continue
        saw_ps += 1
        for fld in ("enable_iid", "enable_icc", "nr_iid_par",
                    "nr_icc_par", "n_env"):
            assert getattr(rp, fld, None) == getattr(gp, fld, None)
        for fld in ("iid", "icc"):
            a, b = getattr(rp, fld, None), getattr(gp, fld, None)
            if a is not None:
                np.testing.assert_array_equal(np.asarray(a),
                                              np.asarray(b))
    assert saw_ps > 10


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle missing")
def test_fuzz_native_matches_python_or_declines():
    """Hostile payloads: wherever the native parser accepts, its fields
    must equal the Python parse; where Python raises, native must have
    declined (returned None -> fallback), never diverge silently."""
    data = _encode_he(14, 2, "5")
    pls = _payloads(data, 2)
    rng = np.random.default_rng(99)
    checked = agreed = 0
    for (p, nb, c) in pls[:60]:
        buf = bytearray(p)
        if len(buf) > 4:        # one bit flip: keep some parseable
            buf[rng.integers(0, len(buf))] ^= 1 << rng.integers(0, 8)
        mut = bytes(buf)
        os.environ["OHP_SBR_PY"] = "1"
        try:
            d_py = SbrDecoder(22050)
            try:
                ref = d_py.parse_payload(mut, nb, stereo=True, crc=c)
            except SbrError:
                ref = None
        finally:
            del os.environ["OHP_SBR_PY"]
        d_nat = SbrDecoder(22050)
        try:
            got = d_nat.parse_payload(mut, nb, stereo=True, crc=c)
        except SbrError:
            got = None
        checked += 1
        if ref is None or got is None:
            # both paths reject (native falls back to Python, which
            # raises the same way) — a one-sided success is a bug
            assert (ref is None) == (got is None)
            continue
        agreed += 1
        _assert_equal([ref], [got], None)
    # most single-bit flips desync the range of huffman walks
    # and BOTH parsers reject; a few survive and must agree
    assert checked == 60 and agreed >= 2


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle missing")
def test_random_payload_low_level_agreement():
    """Pure-random payloads against the LOW-level parsers: wherever both
    accept, fields are equal; native-accept/python-reject happens ONLY
    when the native parser deferred a PS extension (python parses PS
    inline and rejects its garbage); python never accepts what native
    rejects.  Also regression-guards the bs_pointer validation (an
    out-of-spec pointer used to IndexError in Python and read stale
    t_env entries natively; both now reject like fdk extractFrameInfo)."""
    from ohpipeline_tpu.codecs.aac import sbr as SBR
    data = _encode_he(15, 2, "5")
    dec = SbrDecoder(22050)
    pls = _payloads(data, 2)
    dec.parse_payload(*pls[0][:2], stereo=True, crc=pls[0][2])
    ft = dec.ft
    h2l = (np.searchsorted(ft.f_low, ft.f_high[:ft.n_high],
                           side="right") - 1).astype(np.int32)
    l2h = (np.searchsorted(ft.f_high, ft.f_low[:ft.n_low],
                           side="right") - 1).astype(np.int32)
    rng = np.random.default_rng(21)
    both = ps_deferred = 0
    for _ in range(1500):
        ln = int(rng.integers(2, 60))
        payload = rng.integers(0, 256, ln, np.uint8).tobytes()
        nbits = ln * 8
        stereo = bool(rng.random() < 0.5)
        r = native.sbr_parse_payload(
            payload, 0, nbits, stereo=stereo, amp_res=dec.header.amp_res,
            n_q=ft.n_q, n_low=ft.n_low, n_high=ft.n_high,
            idx_h2l=h2l, idx_l2h=l2h, prev_state=[None, None])
        b = SBR.Bits(payload, 0, nbits)
        try:
            chans, coupling = SBR.parse_sbr_data(
                b, dec.header, ft, stereo, [None, None], ps_prev=None)
            py = (chans, coupling)
        except SbrError:
            py = None
        if r is None:
            assert py is None     # python must never accept more
            continue
        if py is None:
            # only allowed when native stopped at a PS extension that
            # python went on to parse (and rejected)
            assert int(r["ps_bits"][0]) >= 0
            ps_deferred += 1
            continue
        both += 1
        chans, coupling = py
        assert bool(r["coupling"]) == bool(coupling)
        for c, ch in enumerate(chans):
            go = r["grid"][c]
            g = ch.grid
            assert [int(go[0]), int(go[1]), int(go[2]), int(go[3]),
                    int(go[4])] == [g.frame_class, g.n_env, g.pointer,
                                    g.tran_env, g.n_noise]
            nt = int(go[5])
            assert [int(x) for x in go[6:6 + nt]] == list(g.t_env)
            for e in range(g.n_env):
                nb_ = ft.n_high if g.freq_res[e] else ft.n_low
                np.testing.assert_array_equal(r["env"][c, e, :nb_],
                                              ch.env[e])
    assert both > 300
