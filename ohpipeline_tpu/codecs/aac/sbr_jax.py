"""Device-side (jax) SBR reconstruction for groups of frames.

TPU-first reformulation of the numpy SBR chain in ``sbr.py`` (itself
written from ISO 14496-3; behavioural parity target
thirdparty/fdk-aac/libSBRdec): the per-frame band loops become dense
masked tensor ops over a whole GROUP of frames at once.

Split of responsibilities:
  * host (this module's cond builder): bitstream-derived conditioning —
    per-envelope energy/noise targets mapped per bin, sine flags, slot
    -> envelope one-hot assignments, smoothing ratios, chirp factors,
    noise-table values and sine phase units (the tiny sequential
    counters stay in host state, mirroring sbr.py exactly);
  * device (jit): QMF analysis (two real matmuls over shifted block
    slices — no gather), HF generator (covariance einsums + static
    patch gather + chirped 2nd-order shifted adds), envelope adjustment
    (energy estimation, gain/limiter/boost, smoothing as a lax.scan
    over frames with a (2, M) carry), sine/noise injection, synthesis
    QMF (one matmul + 12 shifted adds for the overlap).

Sequential state that crosses group boundaries lives in
``SbrDeviceState`` (analysis history, 6-slot QMF history, synthesis
overlap tail, gain-smoothing carry); everything else is recomputed.

Reference stance: fdk libSBRdec qmf.cpp / lpp_tran.cpp / env_calc.cpp,
via the conformance-tested numpy implementation in sbr.py (the oracle
for tests/test_sbr_device.py).
"""

from __future__ import annotations

import numpy as np

from . import sbr as SBR

MAXE = 8          # padded envelope slots per frame
NSL = 38          # buffered QMF slots per frame (6 history + 32)
NB_MAX = 64       # padded frequency-band count for band-averaging


def _jnp():
    import jax.numpy as jnp
    return jnp


class SbrDeviceState:
    """Device-side carried state for one channel."""

    def __init__(self, M: int):
        self.ana_hist = np.zeros(320, np.float32)
        self.x_hist = np.zeros((6, 32), np.complex64)   # low bands only
        self.syn_state = np.zeros(768 - 64, np.float32)
        self.filt_gain = np.zeros(M, np.float32)
        self.filt_noise = np.zeros(M, np.float32)


class SbrStatic:
    """Per-header static conditioning (patch maps, limiter one-hots)."""

    def __init__(self, dec: "SBR.SbrDecoder"):
        ft, hdr = dec.ft, dec.header
        self.kx, self.M = ft.kx, ft.M
        kx, M = ft.kx, ft.M
        # patch source map: for k in [0,64): src[k] = low band p, or -1
        src = np.full(64, -1, np.int32)
        for (t0, s0, width) in ft.patches:
            for j in range(width):
                k, p = t0 + j, s0 + j
                if kx <= k < kx + M and 0 <= p < kx:
                    src[k] = p
        self.patch_src = src
        # noise band of each patched k (chirp selection)
        qi = np.zeros(64, np.int32)
        for k in range(64):
            qi[k] = min(max(int(np.searchsorted(ft.f_noise, k,
                                                side="right") - 1), 0),
                        ft.n_q - 1)
        self.patch_qi = qi
        # limiter-band one-hot (n_lim, M)
        nlim = len(ft.f_lim) - 1
        L = np.zeros((nlim, M), np.float32)
        for li in range(nlim):
            lo, hi = int(ft.f_lim[li]), int(ft.f_lim[li + 1])
            L[li, max(lo, 0):min(hi, M)] = 1.0
        self.limiter = L
        self.limgain = {0: 10 ** 0.15, 1: 10 ** 0.3,
                        2: 10 ** 0.45, 3: 1e10}[hdr.limiter_gains]
        self.interpol_freq = bool(hdr.interpol_freq)
        T = SBR.tables()
        self.K_ana = T["ana32"].astype(np.complex64)          # (32, 320)
        S = T["syn64"].astype(np.float32)                     # (64,2,768)
        self.syn_re, self.syn_im = S[:, 0], S[:, 1]
        self.n_q = ft.n_q


class SbrFrameCond:
    """Stacked per-frame conditioning arrays for a group (numpy)."""

    def __init__(self, F: int, M: int):
        z = np.zeros
        self.Emap = z((F, MAXE, M), np.float32)
        self.Qmap = z((F, MAXE, M), np.float32)
        self.sine = z((F, MAXE, M), np.float32)        # sine bins
        self.sine_band = z((F, MAXE, M), np.float32)   # sine-in-band
        self.no_noise = z((F, MAXE), np.float32)       # 1.0 = suppress
        self.bid = z((F, MAXE, M, NB_MAX), np.float32)  # band one-hot
        self.A = z((F, NSL, MAXE), np.float32)         # slot -> env
        self.Aprev = z((F, NSL, MAXE + 1), np.float32)  # smoothing src
        self.r = z((F, NSL), np.float32)               # smoothing ratio
        self.active = z((F, NSL), np.float32)          # slot processed
        self.last_env = z((F, MAXE), np.float32)       # carry pick
        self.noise_re = z((F, NSL, M), np.float32)
        self.noise_im = z((F, NSL, M), np.float32)
        self.sine_re = z((F, NSL, M), np.float32)      # phase units
        self.sine_im = z((F, NSL, M), np.float32)
        self.bwk = z((F, 64), np.float32)              # chirp per band


def build_frame_cond(dec: "SBR.SbrDecoder", st: "SBR.SbrChannelState",
                     static: SbrStatic, datas: list, Es: list,
                     Qs: list, first: bool) -> SbrFrameCond:
    """Mirror of sbr.py _reconstruct/_adjust conditioning for a group.
    Advances the host-side counters in ``st`` (bw, noise_index,
    sine_index, prev_harm_bins, prev_tran_env) exactly as the numpy
    path does."""
    ft, hdr = dec.ft, dec.header
    kx, M = ft.kx, ft.M
    F = len(datas)
    cond = SbrFrameCond(F, M)
    lag = dec.ENV_LAG
    bins = np.arange(M)
    noise_tab = dec.noise_tab
    for f, (data, E, Q) in enumerate(zip(datas, Es, Qs)):
        g = data.grid
        # chirp factors (host recurrence, same as _reconstruct)
        bw = np.empty(ft.n_q)
        for i in range(ft.n_q):
            nb = SBR.BW_TABLE[data.invf[i]]
            prev = st.bw[i]
            v = 0.75 * nb + 0.25 * prev if nb < prev \
                else 0.90625 * nb + 0.09375 * prev
            if v < 0.015625:
                v = 0.0
            bw[i] = min(v, 0.99609375)
            st.bw[i] = bw[i]
        cond.bwk[f] = bw[static.patch_qi]
        # sine bookkeeping (host state, as in _adjust)
        sine_start = {}
        cur_bins = set()
        for b_ in range(ft.n_high):
            if data.add_harmonic[b_]:
                mid = (int(ft.f_high[b_])
                       + int(ft.f_high[b_ + 1])) // 2 - kx
                if 0 <= mid < M:
                    cur_bins.add(mid)
                    sine_start[mid] = 0 if mid in st.prev_harm_bins \
                        else max(g.tran_env, 0)
        prev_tran = st.prev_tran_env
        st.prev_harm_bins = cur_bins
        st.prev_tran_env = 0 if g.tran_env == g.n_env else -1
        last_processed = -1
        for e in range(min(g.n_env, MAXE)):
            t0 = g.t_env[e] * 2
            t1 = g.t_env[e + 1] * 2
            sl0 = lag + t0 - 2 * g.t_env[0]
            sl1 = sl0 + (t1 - t0)
            sl0 = max(0, min(sl0, NSL))
            sl1 = max(sl0, min(sl1, NSL))
            if sl1 <= sl0:
                continue
            fr = g.freq_res[e]
            bands = ft.f_high if fr else ft.f_low
            nb = len(bands) - 1
            Erow = np.asarray(E[e], np.float64)
            ne = 0
            for q in range(g.n_noise):
                if g.t_noise[q] <= g.t_env[e] < g.t_noise[q + 1]:
                    ne = q
            Qrow = np.asarray(Q[ne], np.float64)
            for b_ in range(nb):
                lo = max(int(bands[b_]) - kx, 0)
                hi = min(int(bands[b_ + 1]) - kx, M)
                cond.Emap[f, e, lo:hi] = Erow[min(b_, len(Erow) - 1)]
                if b_ < NB_MAX:
                    cond.bid[f, e, lo:hi, b_] = 1.0
            for q in range(ft.n_q):
                lo = max(int(ft.f_noise[q]) - kx, 0)
                hi = min(int(ft.f_noise[q + 1]) - kx, M)
                cond.Qmap[f, e, lo:hi] = Qrow[min(q, len(Qrow) - 1)]
            sine = np.zeros(M, bool)
            for mid, start in sine_start.items():
                if e >= start:
                    sine[mid] = True
            cond.sine[f, e] = sine
            for b_ in range(nb):
                lo = max(int(bands[b_]) - kx, 0)
                hi = min(int(bands[b_ + 1]) - kx, M)
                if sine[lo:hi].any():
                    cond.sine_band[f, e, lo:hi] = 1.0
            no_noise = (e == g.tran_env or e == prev_tran)
            cond.no_noise[f, e] = float(no_noise)
            smooth_len = 0 if no_noise or hdr.smoothing_mode else 4
            for sl in range(sl0, sl1):
                cond.A[f, sl, e] = 1.0
                cond.active[f, sl] = 1.0
                k = sl - sl0
                if k < smooth_len:
                    cond.r[f, sl] = SBR._SMOOTH_FILTER[k]
                # smoothing source: previous processed env in this
                # frame, else the cross-frame carry (index MAXE); the
                # very first env ever smooths against itself
                if last_processed >= 0:
                    cond.Aprev[f, sl, last_processed] = 1.0
                elif first and f == 0:
                    cond.Aprev[f, sl, e] = 1.0
                else:
                    cond.Aprev[f, sl, MAXE] = 1.0
                # noise values (host-advanced counter, numpy-exact)
                idx = (st.noise_index + 1 + bins) & 511
                st.noise_index = int(idx[-1])
                nv = noise_tab[idx]
                if not no_noise:
                    cond.noise_re[f, sl] = nv.real
                    cond.noise_im[f, sl] = nv.imag
                ph = st.sine_index & 3
                parity = np.where(((bins + kx) & 1) > 0, -1.0, 1.0)
                if sine.any():
                    if ph == 0:
                        sre, sim = np.ones(M), np.zeros(M)
                    elif ph == 1:
                        sre, sim = np.zeros(M), parity
                    elif ph == 2:
                        sre, sim = -np.ones(M), np.zeros(M)
                    else:
                        sre, sim = np.zeros(M), -parity
                    cond.sine_re[f, sl] = sre * sine
                    cond.sine_im[f, sl] = sim * sine
                st.sine_index = (st.sine_index + 1) & 3
            last_processed = e
        if last_processed >= 0:
            cond.last_env[f, last_processed] = 1.0
    return cond


def device_decode_group(static: SbrStatic, pcm, cond: dict, state: dict):
    """jit-able SBR group decode for one channel.

    pcm (F, 1024) f32 core samples; cond: stacked SbrFrameCond arrays;
    state: {ana_hist (320,), x_hist_re/im (6, 32), syn_state (704,),
    filt (2, M)}.  Returns (out (F*2048,), new_state)."""
    import jax
    jnp = _jnp()
    F = pcm.shape[0]
    kx, M = static.kx, static.M
    NS = F * 32

    # ---- analysis QMF: shifted block slices + two real matmuls -------
    x = jnp.concatenate([state["ana_hist"], pcm.reshape(-1)])
    blocks = x.reshape(NS + 10, 32)
    win = jnp.concatenate([blocks[1 + j:1 + j + NS] for j in range(10)],
                          axis=1)                       # (NS, 320)
    Kre = jnp.asarray(static.K_ana.real.T)              # (320, 32)
    Kim = jnp.asarray(static.K_ana.imag.T)
    Xre = jnp.dot(win, Kre, precision=jax.lax.Precision.HIGHEST)
    Xim = jnp.dot(win, Kim, precision=jax.lax.Precision.HIGHEST)
    new_ana_hist = x[-320:]

    # ---- per-frame 38-slot buffers (6-slot history prepended) --------
    Xre_ext = jnp.concatenate([state["x_hist_re"], Xre])
    Xim_ext = jnp.concatenate([state["x_hist_im"], Xim])
    idx = (jnp.arange(F)[:, None] * 32
           + jnp.arange(NSL)[None, :])                  # (F, 38)
    Bre = Xre_ext[idx]                                  # (F, 38, 32)
    Bim = Xim_ext[idx]
    new_x_hist = (Xre_ext[-6:], Xim_ext[-6:])

    # ---- HF generator ------------------------------------------------
    # covariance over the buffered slots per low band (einsums)
    def phi(a_re, a_im, b_re, b_im):
        # sum over slots of a * conj(b): (F, 32) complex as two planes
        re = jnp.einsum("fsk,fsk->fk", a_re, b_re) \
            + jnp.einsum("fsk,fsk->fk", a_im, b_im)
        im = jnp.einsum("fsk,fsk->fk", a_im, b_re) \
            - jnp.einsum("fsk,fsk->fk", a_re, b_im)
        return re, im

    x0r, x0i = Bre[:, 2:], Bim[:, 2:]
    x1r, x1i = Bre[:, 1:-1], Bim[:, 1:-1]
    x2r, x2i = Bre[:, :-2], Bim[:, :-2]
    # np.vdot(a, b) = sum(conj(a) * b) = phi(b, a) in this convention
    p01r, p01i = phi(x0r, x0i, x1r, x1i)     # vdot(x1, x0)
    p02r, p02i = phi(x0r, x0i, x2r, x2i)     # vdot(x2, x0)
    p11r, _ = phi(x1r, x1i, x1r, x1i)
    p12r, p12i = phi(x1r, x1i, x2r, x2i)     # vdot(x2, x1)
    p22r, _ = phi(x2r, x2i, x2r, x2i)
    d = p22r * p11r - (p12r ** 2 + p12i ** 2) / 1.000001
    safe_d = jnp.where(jnp.abs(d) > 1e-9, d, 1.0)
    a1r = (p01r * p12r - p01i * p12i - p02r * p11r) / safe_d
    a1i = (p01i * p12r + p01r * p12i - p02i * p11r) / safe_d
    a1r = jnp.where(jnp.abs(d) > 1e-9, a1r, 0.0)
    a1i = jnp.where(jnp.abs(d) > 1e-9, a1i, 0.0)
    safe_p11 = jnp.where(p11r > 1e-9, p11r, 1.0)
    # a0 = -(phi01 + a1 * conj(phi12)) / phi11
    a0r = -(p01r + a1r * p12r + a1i * p12i) / safe_p11
    a0i = -(p01i + a1i * p12r - a1r * p12i) / safe_p11
    a0r = jnp.where(p11r > 1e-9, a0r, 0.0)
    a0i = jnp.where(p11r > 1e-9, a0i, 0.0)
    big = (jnp.sqrt(a0r ** 2 + a0i ** 2) >= 4.0) \
        | (jnp.sqrt(a1r ** 2 + a1i ** 2) >= 4.0)
    a0r = jnp.where(big, 0.0, a0r)
    a0i = jnp.where(big, 0.0, a0i)
    a1r = jnp.where(big, 0.0, a1r)
    a1i = jnp.where(big, 0.0, a1i)

    # patch: for each k with src[k] >= 0, chirped 2nd-order filter of
    # the source column; low bands pass through, unpatched high = 0
    src = jnp.asarray(np.where(static.patch_src >= 0,
                               static.patch_src, 0))
    is_patch = jnp.asarray((static.patch_src >= 0)
                           .astype(np.float32))         # (64,)
    bwk = cond["bwk"]                                   # (F, 64)
    sa0r = jnp.take(a0r, src, axis=1) * bwk             # (F, 64)
    sa0i = jnp.take(a0i, src, axis=1) * bwk
    sa1r = jnp.take(a1r, src, axis=1) * bwk * bwk
    sa1i = jnp.take(a1i, src, axis=1) * bwk * bwk
    xsr = jnp.take(Bre, src, axis=2)                    # (F, 38, 64)
    xsi = jnp.take(Bim, src, axis=2)
    z = jnp.zeros_like(xsr[:, :2])
    x1sr = jnp.concatenate([z, xsr[:, 1:-1]], axis=1)   # slot-1 at >=2
    x1si = jnp.concatenate([z, xsi[:, 1:-1]], axis=1)
    x2sr = jnp.concatenate([z, xsr[:, :-2]], axis=1)
    x2si = jnp.concatenate([z, xsi[:, :-2]], axis=1)
    hfr = xsr + (sa0r[:, None, :] * x1sr - sa0i[:, None, :] * x1si) \
        + (sa1r[:, None, :] * x2sr - sa1i[:, None, :] * x2si)
    hfi = xsi + (sa0r[:, None, :] * x1si + sa0i[:, None, :] * x1sr) \
        + (sa1r[:, None, :] * x2si + sa1i[:, None, :] * x2sr)
    slot_ge2 = (jnp.arange(NSL) >= 2).astype(jnp.float32)[None, :, None]
    hfr = hfr * slot_ge2
    hfi = hfi * slot_ge2
    # assemble 64-band buffer: low bands raw, patched bands hf
    low_pad = jnp.concatenate(
        [Bre, jnp.zeros((F, NSL, 32), Bre.dtype)], axis=2)
    low_pad_i = jnp.concatenate(
        [Bim, jnp.zeros((F, NSL, 32), Bim.dtype)], axis=2)
    Yre = jnp.where(is_patch[None, None, :] > 0, hfr, low_pad)
    Yim = jnp.where(is_patch[None, None, :] > 0, hfi, low_pad_i)

    # ---- envelope adjustment ----------------------------------------
    Er = Yre[:, :, kx:kx + M]
    Ei = Yim[:, :, kx:kx + M]
    Eslot = Er * Er + Ei * Ei                           # (F, 38, M)
    A = cond["A"]                                       # (F, 38, MAXE)
    counts = jnp.maximum(A.sum(axis=1), 1.0)            # (F, MAXE)
    Ecurr = jnp.einsum("fse,fsm->fem", A, Eslot) / counts[:, :, None]
    if not static.interpol_freq:
        bsel = cond["bid"]                              # (F,E,M,NB)
        bsum = jnp.einsum("femb,fem->feb", bsel, Ecurr)
        bcnt = jnp.maximum(jnp.einsum("femb->feb", bsel), 1.0)
        Eavg = jnp.einsum("femb,feb->fem", bsel, bsum / bcnt)
        Ecurr = jnp.where(bsel.sum(axis=3) > 0, Eavg, Ecurr)
    Emap, Qmap = cond["Emap"], cond["Qmap"]
    sine_band = cond["sine_band"]
    sine_bins = cond["sine"]
    qfac = Qmap / (1.0 + Qmap)
    Ecs = jnp.maximum(Ecurr, 1e-12)
    gain = jnp.where(sine_band > 0,
                     jnp.sqrt(Emap * qfac / Ecs),
                     jnp.sqrt(Emap / ((1.0 + Qmap) * Ecs)))
    noise_lvl = jnp.sqrt(Emap * qfac)
    sine_lvl = jnp.where(sine_bins > 0,
                         jnp.sqrt(Emap / (1.0 + Qmap)), 0.0)
    # limiter per limiter band (static one-hot matmuls)
    L = jnp.asarray(static.limiter)                     # (nlim, M)
    Esum = jnp.einsum("lm,fem->fel", L, Emap)
    Csum = jnp.einsum("lm,fem->fel", L, Ecurr)
    gmax_l = jnp.minimum(
        static.limgain * jnp.sqrt((Esum + 1e-12) / (Csum + 1e-12)),
        1e10)                                           # (F, E, nlim)
    gmax = jnp.einsum("fel,lm->fem", gmax_l, L)
    gmax = jnp.where(L.sum(axis=0)[None, None, :] > 0, gmax, 1e10)
    ratio = jnp.minimum(1.0, gmax / jnp.maximum(gain, 1e-12))
    noise_lvl = noise_lvl * ratio
    gain = jnp.minimum(gain, gmax)
    achieved_m = (Ecurr * gain ** 2
                  + noise_lvl ** 2 * (1.0 - sine_band)
                  + sine_lvl ** 2)
    ach_l = jnp.einsum("lm,fem->fel", L, achieved_m)
    boost_l = jnp.minimum(
        jnp.sqrt(Esum / jnp.maximum(ach_l, 1e-12)), 1.584893192)
    boost = jnp.einsum("fel,lm->fem", boost_l, L)
    boost = jnp.where(L.sum(axis=0)[None, None, :] > 0, boost, 1.0)
    gain = gain * boost
    noise_lvl = noise_lvl * boost
    sine_lvl = sine_lvl * boost

    # ---- per-slot smoothing + injection (scan over frames) ----------
    def frame_step(carry, inp):
        filt = carry                                    # (2, M)
        (Gf, Nf, Sf, Sbins, Af, Apf, rf, actf, lastf,
         nre, nim, sre, sim, er, ei) = inp
        Gext = jnp.concatenate([Gf, filt[0][None]])     # (MAXE+1, M)
        Next = jnp.concatenate([Nf, filt[1][None]])
        Gcur = Af @ Gf                                  # (38, M)
        Ncur = Af @ Nf
        Gprev = Apf @ Gext
        Nprev = Apf @ Next
        g_sl = rf[:, None] * Gprev + (1 - rf[:, None]) * Gcur
        n_sl = rf[:, None] * Nprev + (1 - rf[:, None]) * Ncur
        s_sl = Af @ Sf                                  # sine, no smooth
        sine_mask = Af @ Sbins                          # sine bins/slot
        out_r = er * g_sl + nre * n_sl * (1 - sine_mask) \
            + sre * s_sl
        out_i = ei * g_sl + nim * n_sl * (1 - sine_mask) \
            + sim * s_sl
        act = actf[:, None]
        out_r = jnp.where(act > 0, out_r, er)
        out_i = jnp.where(act > 0, out_i, ei)
        new_gain = lastf @ Gf
        new_noise = lastf @ Nf
        has_env = lastf.sum() > 0
        filt = jnp.where(has_env,
                         jnp.stack([new_gain, new_noise]), filt)
        return filt, (out_r, out_i)

    # noise is only injected outside no-noise envelopes: the cond
    # noise values are already zeroed for those slots (host side)
    inputs = (gain, noise_lvl, sine_lvl, sine_bins, A, cond["Aprev"],
              cond["r"], cond["active"], cond["last_env"],
              cond["noise_re"], cond["noise_im"],
              cond["sine_re"], cond["sine_im"], Er, Ei)
    import jax as _jax
    filt, (Or, Oi) = _jax.lax.scan(frame_step, state["filt"], inputs)

    # ---- synthesis QMF over the 32 fresh slots of every frame -------
    Zr = jnp.concatenate(
        [Yre[:, 6:, :kx], Or[:, 6:], Yre[:, 6:, kx + M:]], axis=2)
    Zi = jnp.concatenate(
        [Yim[:, 6:, :kx], Oi[:, 6:], Yim[:, 6:, kx + M:]], axis=2)
    Zr = Zr.reshape(NS, 64)
    Zi = Zi.reshape(NS, 64)
    contrib = jnp.dot(Zr, jnp.asarray(static.syn_re),
                      precision=_jax.lax.Precision.HIGHEST) \
        + jnp.dot(Zi, jnp.asarray(static.syn_im),
                  precision=_jax.lax.Precision.HIGHEST)  # (NS, 768)
    z12 = contrib.reshape(NS, 12, 64)
    acc = jnp.zeros((NS + 12, 64), contrib.dtype)
    for j in range(12):
        acc = acc.at[j:j + NS].add(z12[:, j])
    out = acc.reshape(-1)[:NS * 64 + 704]
    out = out.at[:704].add(state["syn_state"])
    new_state = {"ana_hist": new_ana_hist,
                 "x_hist_re": new_x_hist[0],
                 "x_hist_im": new_x_hist[1],
                 "syn_state": out[NS * 64:NS * 64 + 704],
                 "filt": filt}
    return out[:NS * 64], new_state


class SbrDeviceRunner:
    """Wraps an SbrDecoder to decode groups of frames on device for one
    or two channels.  Parsing, dequantisation and conditioning stay on
    the host (sbr.py); the dense math runs under jit."""

    def __init__(self, dec: "SBR.SbrDecoder"):
        import jax
        self.dec = dec
        self.static = SbrStatic(dec)
        M = self.static.M
        self.state_host = [SBR.SbrChannelState(), SBR.SbrChannelState()]
        self.state_dev = [self._init_state(), self._init_state()]
        self.first = [True, True]
        self._fn = jax.jit(
            lambda pcm, cond, st: device_decode_group(
                self.static, pcm, cond, st))

    def _init_state(self):
        M = self.static.M
        return {"ana_hist": np.zeros(320, np.float32),
                "x_hist_re": np.zeros((6, 32), np.float32),
                "x_hist_im": np.zeros((6, 32), np.float32),
                "syn_state": np.zeros(704, np.float32),
                "filt": np.zeros((2, M), np.float32)}

    def decode_group(self, ch: int, pcm_frames: np.ndarray,
                     datas: list, Es: list, Qs: list) -> np.ndarray:
        """pcm_frames (F, 1024) core PCM; datas/Es/Qs per frame.
        Returns (F*2048,) float32 at the doubled rate."""
        import jax.numpy as jnp
        cond = build_frame_cond(self.dec, self.state_host[ch],
                                self.static, datas, Es, Qs,
                                self.first[ch])
        self.first[ch] = False
        cd = {k: jnp.asarray(v) for k, v in vars(cond).items()}
        out, st = self._fn(jnp.asarray(pcm_frames, jnp.float32),
                           cd, self.state_dev[ch])
        self.state_dev[ch] = st
        return np.asarray(out)
