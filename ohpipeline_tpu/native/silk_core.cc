// Fixed-point SILK synthesis core (host-side, called via ctypes).
//
// Bit-exact reimplementation of the normative SILK decoder arithmetic
// (RFC 6716 declares the reference implementation normative, so the
// Q-format operations and their ordering must match exactly):
//   * decode_core:      thirdparty/opus-1.5.2/silk/decode_core.c
//   * NLSF -> LPC:      silk/NLSF2A.c, silk/LPC_fit.c,
//                       silk/LPC_inv_pred_gain.c, silk/bwexpander_32.c
//   * rewhitening FIR:  silk/LPC_analysis_filter.c (generic C branch)
//   * output resampler: silk/resampler_private_up2_HQ.c,
//                       silk/resampler_private_IIR_FIR.c
//   * stereo unmix:     silk/stereo_MS_to_LR.c
//   * helpers:          silk/Inlines.h (INVERSE32_varQ / DIV32_varQ),
//                       silk/macros.h, silk/SigProc_FIX.h
// Data layouts and the batched call surface are this framework's own;
// the per-sample arithmetic follows the normative decoder.  The entropy
// layer and parameter dequantisation live in Python
// (ohpipeline_tpu/codecs/opus/silk.py); this file is the integer
// synthesis path that replaces the round-2 float reformulation.

#include <cstdint>
#include <cstring>

namespace {

inline int32_t SAT16(int32_t a) {
    return a > 32767 ? 32767 : (a < -32768 ? -32768 : a);
}
inline int32_t SMULWB(int32_t a, int32_t b) {
    return (int32_t)(((int64_t)a * (int16_t)b) >> 16);
}
inline int32_t SMLAWB(int32_t a, int32_t b, int32_t c) {
    return (int32_t)((uint32_t)a + (uint32_t)SMULWB(b, c));
}
inline int32_t SMULWW(int32_t a, int32_t b) {
    return (int32_t)(((int64_t)a * b) >> 16);
}
inline int32_t SMLAWW(int32_t a, int32_t b, int32_t c) {
    return (int32_t)((uint32_t)a + (uint32_t)SMULWW(b, c));
}
inline int32_t SMMUL(int32_t a, int32_t b) {
    return (int32_t)(((int64_t)a * b) >> 32);
}
inline int32_t SMULBB(int32_t a, int32_t b) {
    return (int32_t)(int16_t)a * (int32_t)(int16_t)b;
}
inline int32_t RSHIFT_ROUND(int32_t a, int s) {
    return s == 1 ? (a >> 1) + (a & 1) : ((a >> (s - 1)) + 1) >> 1;
}
inline int64_t RSHIFT_ROUND64(int64_t a, int s) {
    return s == 1 ? (a >> 1) + (a & 1) : ((a >> (s - 1)) + 1) >> 1;
}
inline int32_t ADD_SAT32(int32_t a, int32_t b) {
    int64_t r = (int64_t)a + b;
    return r > INT32_MAX ? INT32_MAX
                         : (r < INT32_MIN ? (int32_t)INT32_MIN : (int32_t)r);
}
inline int32_t SUB_SAT32(int32_t a, int32_t b) {
    int64_t r = (int64_t)a - b;
    return r > INT32_MAX ? INT32_MAX
                         : (r < INT32_MIN ? (int32_t)INT32_MIN : (int32_t)r);
}
inline int32_t LSHIFT_SAT32(int32_t a, int s) {
    int64_t r = (int64_t)a << s;
    return r > INT32_MAX ? INT32_MAX
                         : (r < INT32_MIN ? (int32_t)INT32_MIN : (int32_t)r);
}
inline int CLZ32(int32_t x) {
    return x == 0 ? 32 : __builtin_clz((uint32_t)x);
}
inline int32_t ABS32(int32_t a) { return a < 0 ? -a : a; }

// silk/Inlines.h:silk_INVERSE32_varQ — approximate (1 << Qres) / b32
int32_t INVERSE32_varQ(int32_t b32, int Qres) {
    int b_headrm = CLZ32(ABS32(b32)) - 1;
    int32_t b32_nrm = (int32_t)((uint32_t)b32 << b_headrm);
    int32_t b32_inv = (int32_t)((INT32_MAX >> 2) / (b32_nrm >> 16));
    int32_t result = (int32_t)((uint32_t)b32_inv << 16);
    int32_t err_Q32 =
        (int32_t)((uint32_t)(((int32_t)1 << 29) - SMULWB(b32_nrm, b32_inv))
                  << 3);
    result = SMLAWW(result, err_Q32, b32_inv);
    int lshift = 61 - b_headrm - Qres;
    if (lshift <= 0) return LSHIFT_SAT32(result, -lshift);
    return lshift < 32 ? (result >> lshift) : 0;
}

// silk/Inlines.h:silk_DIV32_varQ — approximate (a32 << Qres) / b32
int32_t DIV32_varQ(int32_t a32, int32_t b32, int Qres) {
    int a_headrm = CLZ32(ABS32(a32)) - 1;
    int32_t a32_nrm = (int32_t)((uint32_t)a32 << a_headrm);
    int b_headrm = CLZ32(ABS32(b32)) - 1;
    int32_t b32_nrm = (int32_t)((uint32_t)b32 << b_headrm);
    int32_t b32_inv = (int32_t)((INT32_MAX >> 2) / (b32_nrm >> 16));
    int32_t result = SMULWB(a32_nrm, b32_inv);
    a32_nrm = (int32_t)((uint32_t)a32_nrm -
                        ((uint32_t)SMMUL(b32_nrm, result) << 3));
    result = SMLAWB(result, a32_nrm, b32_inv);
    int lshift = 29 + a_headrm - b_headrm - Qres;
    if (lshift < 0) return LSHIFT_SAT32(result, -lshift);
    return lshift < 32 ? (result >> lshift) : 0;
}

// silk/bwexpander_32.c — chirp the AR coefficients toward the origin
void bwexpander_32(int32_t* ar, int d, int32_t chirp_Q16) {
    int32_t chirp_minus_one_Q16 = chirp_Q16 - 65536;
    for (int i = 0; i < d - 1; i++) {
        ar[i] = SMULWW(chirp_Q16, ar[i]);
        chirp_Q16 += RSHIFT_ROUND(
            (int32_t)((int64_t)chirp_Q16 * chirp_minus_one_Q16), 16);
    }
    ar[d - 1] = SMULWW(chirp_Q16, ar[d - 1]);
}

// silk/LPC_fit.c — saturate Q(QIN) coefficients into int16 Q(QOUT)
void LPC_fit(int16_t* a_QOUT, int32_t* a_QIN, int QOUT, int QIN, int d) {
    int i, k, idx = 0;
    for (i = 0; i < 10; i++) {
        int32_t maxabs = 0;
        for (k = 0; k < d; k++) {
            int32_t absval = ABS32(a_QIN[k]);
            if (absval > maxabs) {
                maxabs = absval;
                idx = k;
            }
        }
        maxabs = RSHIFT_ROUND(maxabs, QIN - QOUT);
        if (maxabs > 32767) {
            maxabs = maxabs < 163838 ? maxabs : 163838;
            int32_t chirp_Q16 =
                ((int32_t)(0.999 * 65536.0 + 0.5)) -
                (int32_t)(((int64_t)(maxabs - 32767) << 14) /
                          (((int64_t)maxabs * (idx + 1)) >> 2));
            bwexpander_32(a_QIN, d, chirp_Q16);
        } else {
            break;
        }
    }
    if (i == 10) {
        for (k = 0; k < d; k++) {
            a_QOUT[k] = (int16_t)SAT16(RSHIFT_ROUND(a_QIN[k], QIN - QOUT));
            a_QIN[k] = (int32_t)((uint32_t)a_QOUT[k] << (QIN - QOUT));
        }
    } else {
        for (k = 0; k < d; k++)
            a_QOUT[k] = (int16_t)RSHIFT_ROUND(a_QIN[k], QIN - QOUT);
    }
}

// silk/LPC_inv_pred_gain.c — Q30 inverse prediction gain; 0 == unstable
constexpr int kQA24 = 24;
constexpr int32_t kALimit = (int32_t)(0.99975 * (1 << kQA24) + 0.5);
constexpr int32_t kInvMaxPredGain =
    (int32_t)((1.0 / 1e4) * (1 << 30) + 0.5);  // 1/MAX_PREDICTION_POWER_GAIN

inline int32_t MUL32_FRAC_Q(int32_t a32, int32_t b32, int Q) {
    return (int32_t)RSHIFT_ROUND64((int64_t)a32 * b32, Q);
}

int32_t LPC_inverse_pred_gain_QA(int32_t* A_QA, int order) {
    int32_t invGain_Q30 = (int32_t)1 << 30;
    for (int k = order - 1; k > 0; k--) {
        if (A_QA[k] > kALimit || A_QA[k] < -kALimit) return 0;
        int32_t rc_Q31 = -(int32_t)((uint32_t)A_QA[k] << (31 - kQA24));
        int32_t rc_mult1_Q30 = ((int32_t)1 << 30) - SMMUL(rc_Q31, rc_Q31);
        invGain_Q30 =
            (int32_t)((uint32_t)SMMUL(invGain_Q30, rc_mult1_Q30) << 2);
        if (invGain_Q30 < kInvMaxPredGain) return 0;
        int mult2Q = 32 - CLZ32(ABS32(rc_mult1_Q30));
        int32_t rc_mult2 = INVERSE32_varQ(rc_mult1_Q30, mult2Q + 30);
        for (int n = 0; n < (k + 1) >> 1; n++) {
            int32_t tmp1 = A_QA[n];
            int32_t tmp2 = A_QA[k - n - 1];
            int64_t tmp64 = RSHIFT_ROUND64(
                (int64_t)SUB_SAT32(tmp1, MUL32_FRAC_Q(tmp2, rc_Q31, 31)) *
                    rc_mult2,
                mult2Q);
            if (tmp64 > INT32_MAX || tmp64 < INT32_MIN) return 0;
            A_QA[n] = (int32_t)tmp64;
            tmp64 = RSHIFT_ROUND64(
                (int64_t)SUB_SAT32(tmp2, MUL32_FRAC_Q(tmp1, rc_Q31, 31)) *
                    rc_mult2,
                mult2Q);
            if (tmp64 > INT32_MAX || tmp64 < INT32_MIN) return 0;
            A_QA[k - n - 1] = (int32_t)tmp64;
        }
    }
    if (A_QA[0] > kALimit || A_QA[0] < -kALimit) return 0;
    int32_t rc_Q31 = -(int32_t)((uint32_t)A_QA[0] << (31 - kQA24));
    int32_t rc_mult1_Q30 = ((int32_t)1 << 30) - SMMUL(rc_Q31, rc_Q31);
    invGain_Q30 = (int32_t)((uint32_t)SMMUL(invGain_Q30, rc_mult1_Q30) << 2);
    if (invGain_Q30 < kInvMaxPredGain) return 0;
    return invGain_Q30;
}

int32_t LPC_inverse_pred_gain(const int16_t* A_Q12, int order) {
    int32_t Atmp_QA[16];
    int32_t DC_resp = 0;
    for (int k = 0; k < order; k++) {
        DC_resp += (int32_t)A_Q12[k];
        Atmp_QA[k] = (int32_t)((uint32_t)A_Q12[k] << (kQA24 - 12));
    }
    if (DC_resp >= 4096) return 0;
    return LPC_inverse_pred_gain_QA(Atmp_QA, order);
}

// silk/LPC_analysis_filter.c (generic branch): FIR rewhitening
void LPC_analysis_filter(int16_t* out, const int16_t* in, const int16_t* B,
                         int len, int d) {
    for (int ix = d; ix < len; ix++) {
        const int16_t* in_ptr = &in[ix - 1];
        uint32_t out32_Q12 = (uint32_t)SMULBB(in_ptr[0], B[0]);
        for (int j = 1; j < d; j++)
            out32_Q12 += (uint32_t)SMULBB(in_ptr[-j], B[j]);
        out32_Q12 = (uint32_t)((int32_t)((uint32_t)in_ptr[1] << 12)) -
                    out32_Q12;
        int32_t out32 = RSHIFT_ROUND((int32_t)out32_Q12, 12);
        out[ix] = (int16_t)SAT16(out32);
    }
    memset(out, 0, d * sizeof(int16_t));
}

}  // namespace

extern "C" {

// silk/NLSF2A.c — Q15 NLSFs to stabilised Q12 int16 LPC coefficients
void silk_nlsf2a(const int16_t* nlsf_q15, int d,
                 const int16_t* cos_tab_q12, int16_t* a_q12) {
    static const unsigned char ordering16[16] = {0, 15, 8,  7, 4, 11, 12, 3,
                                                 2, 13, 10, 5, 6, 9,  14, 1};
    static const unsigned char ordering10[10] = {0, 9, 6, 3, 4,
                                                 5, 8, 1, 2, 7};
    const unsigned char* ordering = d == 16 ? ordering16 : ordering10;
    const int QA = 16;
    int32_t cos_LSF_QA[16];
    for (int k = 0; k < d; k++) {
        int32_t f_int = nlsf_q15[k] >> (15 - 7);
        int32_t f_frac = nlsf_q15[k] - (f_int << (15 - 7));
        int32_t cos_val = cos_tab_q12[f_int];
        int32_t delta = cos_tab_q12[f_int + 1] - cos_val;
        cos_LSF_QA[ordering[k]] =
            RSHIFT_ROUND((int32_t)((uint32_t)cos_val << 8) + delta * f_frac,
                         20 - QA);
    }
    int dd = d >> 1;
    int32_t P[9], Q[9];
    for (int half = 0; half < 2; half++) {
        int32_t* out = half ? Q : P;
        const int32_t* cLSF = &cos_LSF_QA[half];
        out[0] = (int32_t)1 << QA;
        out[1] = -cLSF[0];
        for (int k = 1; k < dd; k++) {
            int32_t ftmp = cLSF[2 * k];
            out[k + 1] =
                (int32_t)((uint32_t)out[k - 1] << 1) -
                (int32_t)RSHIFT_ROUND64((int64_t)ftmp * out[k], QA);
            for (int n = k; n > 1; n--)
                out[n] += out[n - 2] -
                          (int32_t)RSHIFT_ROUND64((int64_t)ftmp * out[n - 1],
                                                  QA);
            out[1] -= ftmp;
        }
    }
    int32_t a32_QA1[16];
    for (int k = 0; k < dd; k++) {
        int32_t Ptmp = P[k + 1] + P[k];
        int32_t Qtmp = Q[k + 1] - Q[k];
        a32_QA1[k] = -Qtmp - Ptmp;
        a32_QA1[d - k - 1] = Qtmp - Ptmp;
    }
    LPC_fit(a_q12, a32_QA1, 12, QA + 1, d);
    for (int i = 0; LPC_inverse_pred_gain(a_q12, d) == 0 && i < 16; i++) {
        bwexpander_32(a32_QA1, d, 65536 - (2 << i));
        LPC_fit(a_q12, a32_QA1, 12, QA + 1, d);
    }
}

// silk/decode_core.c — one frame of inverse NSQ (LTP + LPC synthesis).
// outBuf: int16[ltp_mem + frame_length] persistent history, shifted here
// exactly as silk_decode_frame does (decode_frame.c:150-153).
// sLPC_Q14: int32[16] persistent; prev_gain_Q16: int32[1] persistent.
// exc_out_Q14: int32[frame_length] excitation (for PLC).
// Returns 0.
int silk_decode_core_fix(
    const int16_t* pulses, int frame_length, int subfr_length, int nb_subfr,
    int lpc_order, int ltp_mem_length, const int16_t* A_Q12_both,
    const int16_t* B_Q14_all, const int32_t* Gains_Q16, const int32_t* pitchL,
    int LTP_scale_Q14, int signalTypeInd, int quantOffsetType, int32_t seed,
    int nlsf_interp_flag, int16_t* outBuf, int32_t* sLPC_Q14_buf,
    int32_t* prev_gain_Q16, int32_t* exc_out_Q14, int16_t* xq) {
    // silk/tables_other.c:82 silk_Quantization_Offsets_Q10
    // ({UVL,UVH},{VL,VH} from define.h:130-133)
    static const int32_t quant_offs[2][2] = {{100, 240}, {32, 100}};
    int32_t offset_Q10 = quant_offs[signalTypeInd >> 1][quantOffsetType];

    int32_t rand_seed = seed;
    for (int i = 0; i < frame_length; i++) {
        rand_seed = (int32_t)(907633515u + (uint32_t)rand_seed * 196314165u);
        int32_t e = (int32_t)((uint32_t)pulses[i] << 14);
        if (e > 0)
            e -= 80 << 4;  // QUANT_LEVEL_ADJUST_Q10 << 4
        else if (e < 0)
            e += 80 << 4;
        e += offset_Q10 << 4;
        if (rand_seed < 0) e = -e;
        exc_out_Q14[i] = e;
        rand_seed = (int32_t)((uint32_t)rand_seed + (uint32_t)pulses[i]);
    }

    const int MAX_LPC_ORDER = 16, LTP_ORDER = 5;
    int32_t sLPC_Q14[16 + 480];  // MAX_LPC_ORDER + max subfr_length
    int32_t res_Q14_buf[480];
    int16_t sLTP[640];                 // ltp_mem max 20 ms @ 16 kHz = 320
    int32_t sLTP_Q15[640 + 320 + 16];  // ltp_mem + frame_length
    memcpy(sLPC_Q14, sLPC_Q14_buf, MAX_LPC_ORDER * sizeof(int32_t));

    const int32_t* pexc_Q14 = exc_out_Q14;
    int16_t* pxq = xq;
    int sLTP_buf_idx = ltp_mem_length;
    int lag = 0;
    for (int k = 0; k < nb_subfr; k++) {
        const int32_t* pres_Q14 = res_Q14_buf;
        const int16_t* A_Q12 = &A_Q12_both[(k >> 1) * 16];
        const int16_t* B_Q14 = &B_Q14_all[k * LTP_ORDER];
        int signalType = signalTypeInd;

        int32_t Gain_Q10 = Gains_Q16[k] >> 6;
        int32_t inv_gain_Q31 = INVERSE32_varQ(Gains_Q16[k], 47);

        int32_t gain_adj_Q16;
        if (Gains_Q16[k] != *prev_gain_Q16) {
            gain_adj_Q16 = DIV32_varQ(*prev_gain_Q16, Gains_Q16[k], 16);
            for (int i = 0; i < MAX_LPC_ORDER; i++)
                sLPC_Q14[i] = SMULWW(gain_adj_Q16, sLPC_Q14[i]);
        } else {
            gain_adj_Q16 = (int32_t)1 << 16;
        }
        *prev_gain_Q16 = Gains_Q16[k];

        if (signalType == 2) {  // TYPE_VOICED
            lag = pitchL[k];
            if (k == 0 || (k == 2 && nlsf_interp_flag)) {
                int start_idx =
                    ltp_mem_length - lag - lpc_order - LTP_ORDER / 2;
                if (start_idx <= 0) return -1;
                if (k == 2)
                    memcpy(&outBuf[ltp_mem_length], xq,
                           2 * subfr_length * sizeof(int16_t));
                LPC_analysis_filter(&sLTP[start_idx],
                                    &outBuf[start_idx + k * subfr_length],
                                    A_Q12, ltp_mem_length - start_idx,
                                    lpc_order);
                if (k == 0)
                    inv_gain_Q31 = (int32_t)(
                        (uint32_t)SMULWB(inv_gain_Q31, LTP_scale_Q14) << 2);
                for (int i = 0; i < lag + LTP_ORDER / 2; i++)
                    sLTP_Q15[sLTP_buf_idx - i - 1] =
                        SMULWB(inv_gain_Q31, sLTP[ltp_mem_length - i - 1]);
            } else if (gain_adj_Q16 != (int32_t)1 << 16) {
                for (int i = 0; i < lag + LTP_ORDER / 2; i++)
                    sLTP_Q15[sLTP_buf_idx - i - 1] =
                        SMULWW(gain_adj_Q16, sLTP_Q15[sLTP_buf_idx - i - 1]);
            }
        }

        if (signalType == 2) {
            const int32_t* pred_lag_ptr =
                &sLTP_Q15[sLTP_buf_idx - lag + LTP_ORDER / 2];
            for (int i = 0; i < subfr_length; i++) {
                int32_t LTP_pred_Q13 = 2;
                LTP_pred_Q13 = SMLAWB(LTP_pred_Q13, pred_lag_ptr[0], B_Q14[0]);
                LTP_pred_Q13 =
                    SMLAWB(LTP_pred_Q13, pred_lag_ptr[-1], B_Q14[1]);
                LTP_pred_Q13 =
                    SMLAWB(LTP_pred_Q13, pred_lag_ptr[-2], B_Q14[2]);
                LTP_pred_Q13 =
                    SMLAWB(LTP_pred_Q13, pred_lag_ptr[-3], B_Q14[3]);
                LTP_pred_Q13 =
                    SMLAWB(LTP_pred_Q13, pred_lag_ptr[-4], B_Q14[4]);
                pred_lag_ptr++;
                res_Q14_buf[i] = (int32_t)((uint32_t)pexc_Q14[i] +
                                           ((uint32_t)LTP_pred_Q13 << 1));
                sLTP_Q15[sLTP_buf_idx] =
                    (int32_t)((uint32_t)res_Q14_buf[i] << 1);
                sLTP_buf_idx++;
            }
        } else {
            pres_Q14 = pexc_Q14;
        }

        for (int i = 0; i < subfr_length; i++) {
            int32_t LPC_pred_Q10 = lpc_order >> 1;
            for (int j = 0; j < lpc_order; j++)
                LPC_pred_Q10 = SMLAWB(LPC_pred_Q10,
                                      sLPC_Q14[MAX_LPC_ORDER + i - 1 - j],
                                      A_Q12[j]);
            sLPC_Q14[MAX_LPC_ORDER + i] =
                ADD_SAT32(pres_Q14[i], LSHIFT_SAT32(LPC_pred_Q10, 4));
            pxq[i] = (int16_t)SAT16(RSHIFT_ROUND(
                SMULWW(sLPC_Q14[MAX_LPC_ORDER + i], Gain_Q10), 8));
        }
        memcpy(sLPC_Q14, &sLPC_Q14[subfr_length],
               MAX_LPC_ORDER * sizeof(int32_t));
        pexc_Q14 += subfr_length;
        pxq += subfr_length;
    }
    memcpy(sLPC_Q14_buf, sLPC_Q14, MAX_LPC_ORDER * sizeof(int32_t));

    // decode_frame.c:150-153 — shift outBuf history and append xq
    int mv_len = ltp_mem_length - frame_length;
    memmove(outBuf, &outBuf[frame_length], mv_len * sizeof(int16_t));
    memcpy(&outBuf[mv_len], xq, frame_length * sizeof(int16_t));
    return 0;
}

// silk/resampler_private_IIR_FIR.c + up2_HQ: fs_in -> 48 kHz upsampler.
// sIIR: int32[6]; sFIR: int16[8]; coefs are the Q15/Q16 ROM constants
// resampler_rom.h:silk_resampler_up2_hq_0/1 passed from Python tables.
// Returns the number of output samples written.
int silk_resampler_iir_fir(const int16_t* in, int in_len, int batch_size,
                           int32_t index_increment_Q16, int32_t* sIIR,
                           int16_t* sFIR, const int16_t* up2_hq_coefs,
                           const int16_t* frac_fir_12, int16_t* out) {
    const int FIR_ORDER = 8;
    int16_t buf[2 * 480 + 8];
    const int16_t* c0 = up2_hq_coefs;      // [3] even phase
    const int16_t* c1 = up2_hq_coefs + 3;  // [3] odd phase
    int n_out = 0;
    memcpy(buf, sFIR, FIR_ORDER * sizeof(int16_t));
    while (1) {
        int n = in_len < batch_size ? in_len : batch_size;
        // up2_HQ into buf[FIR_ORDER..]
        int16_t* o = &buf[FIR_ORDER];
        for (int k = 0; k < n; k++) {
            int32_t in32 = (int32_t)((uint32_t)in[k] << 10);
            int32_t Y = in32 - sIIR[0];
            int32_t X = SMULWB(Y, c0[0]);
            int32_t out32_1 = sIIR[0] + X;
            sIIR[0] = in32 + X;
            Y = out32_1 - sIIR[1];
            X = SMULWB(Y, c0[1]);
            int32_t out32_2 = sIIR[1] + X;
            sIIR[1] = out32_1 + X;
            Y = out32_2 - sIIR[2];
            X = SMLAWB(Y, Y, c0[2]);
            out32_1 = sIIR[2] + X;
            sIIR[2] = out32_2 + X;
            o[2 * k] = (int16_t)SAT16(RSHIFT_ROUND(out32_1, 10));
            Y = in32 - sIIR[3];
            X = SMULWB(Y, c1[0]);
            out32_1 = sIIR[3] + X;
            sIIR[3] = in32 + X;
            Y = out32_1 - sIIR[4];
            X = SMULWB(Y, c1[1]);
            out32_2 = sIIR[4] + X;
            sIIR[4] = out32_1 + X;
            Y = out32_2 - sIIR[5];
            X = SMLAWB(Y, Y, c1[2]);
            out32_1 = sIIR[5] + X;
            sIIR[5] = out32_2 + X;
            o[2 * k + 1] = (int16_t)SAT16(RSHIFT_ROUND(out32_1, 10));
        }
        int32_t max_index_Q16 = (int32_t)((uint32_t)n << 17);
        for (int32_t index_Q16 = 0; index_Q16 < max_index_Q16;
             index_Q16 += index_increment_Q16) {
            int32_t ti = SMULWB(index_Q16 & 0xFFFF, 12);
            const int16_t* bp = &buf[index_Q16 >> 16];
            const int16_t* t0 = &frac_fir_12[ti * 4];
            const int16_t* t1 = &frac_fir_12[(11 - ti) * 4];
            int32_t res_Q15 = SMULBB(bp[0], t0[0]);
            res_Q15 += SMULBB(bp[1], t0[1]);
            res_Q15 += SMULBB(bp[2], t0[2]);
            res_Q15 += SMULBB(bp[3], t0[3]);
            res_Q15 += SMULBB(bp[4], t1[3]);
            res_Q15 += SMULBB(bp[5], t1[2]);
            res_Q15 += SMULBB(bp[6], t1[1]);
            res_Q15 += SMULBB(bp[7], t1[0]);
            out[n_out++] = (int16_t)SAT16(RSHIFT_ROUND(res_Q15, 15));
        }
        in += n;
        in_len -= n;
        if (in_len > 0) {
            memcpy(buf, &buf[n << 1], FIR_ORDER * sizeof(int16_t));
        } else {
            memcpy(sFIR, &buf[n << 1], FIR_ORDER * sizeof(int16_t));
            break;
        }
    }
    return n_out;
}

// silk/stereo_MS_to_LR.c — predict side from mid, convert to L/R.
// x1/x2: int16[frame_length + 2] with the 2-sample history prepended by
// this function from sMid/sSide (persistent int16[2] each).
int silk_stereo_ms_to_lr(int16_t* x1, int16_t* x2, int16_t* sMid,
                         int16_t* sSide, int32_t* pred_prev_Q13,
                         const int32_t* pred_Q13, int fs_khz,
                         int frame_length) {
    memcpy(x1, sMid, 2 * sizeof(int16_t));
    memcpy(x2, sSide, 2 * sizeof(int16_t));
    memcpy(sMid, &x1[frame_length], 2 * sizeof(int16_t));
    memcpy(sSide, &x2[frame_length], 2 * sizeof(int16_t));

    const int STEREO_INTERP_LEN_MS = 8;
    int interp_len = STEREO_INTERP_LEN_MS * fs_khz;
    int32_t pred0_Q13 = pred_prev_Q13[0];
    int32_t pred1_Q13 = pred_prev_Q13[1];
    int32_t denom_Q16 = (int32_t)(((int32_t)1 << 16) / interp_len);
    int32_t delta0_Q13 = RSHIFT_ROUND(
        SMULBB(pred_Q13[0] - pred_prev_Q13[0], denom_Q16), 16);
    int32_t delta1_Q13 = RSHIFT_ROUND(
        SMULBB(pred_Q13[1] - pred_prev_Q13[1], denom_Q16), 16);
    int n = 0;
    for (; n < interp_len && n < frame_length; n++) {
        pred0_Q13 += delta0_Q13;
        pred1_Q13 += delta1_Q13;
        int32_t sum = (int32_t)(
            (uint32_t)((x1[n] + (int32_t)x1[n + 2]) + ((int32_t)x1[n + 1] << 1))
            << 9);
        sum = SMLAWB((int32_t)((uint32_t)x2[n + 1] << 8), sum, pred0_Q13);
        sum = SMLAWB(sum, (int32_t)((uint32_t)x1[n + 1] << 11), pred1_Q13);
        x2[n + 1] = (int16_t)SAT16(RSHIFT_ROUND(sum, 8));
    }
    pred0_Q13 = pred_Q13[0];
    pred1_Q13 = pred_Q13[1];
    for (; n < frame_length; n++) {
        int32_t sum = (int32_t)(
            (uint32_t)((x1[n] + (int32_t)x1[n + 2]) + ((int32_t)x1[n + 1] << 1))
            << 9);
        sum = SMLAWB((int32_t)((uint32_t)x2[n + 1] << 8), sum, pred0_Q13);
        sum = SMLAWB(sum, (int32_t)((uint32_t)x1[n + 1] << 11), pred1_Q13);
        x2[n + 1] = (int16_t)SAT16(RSHIFT_ROUND(sum, 8));
    }
    pred_prev_Q13[0] = pred_Q13[0];
    pred_prev_Q13[1] = pred_Q13[1];

    for (n = 0; n < frame_length; n++) {
        int32_t sum = x1[n + 1] + (int32_t)x2[n + 1];
        int32_t diff = x1[n + 1] - (int32_t)x2[n + 1];
        x1[n + 1] = (int16_t)SAT16(sum);
        x2[n + 1] = (int16_t)SAT16(diff);
    }
    return 0;
}

}  // extern "C"
