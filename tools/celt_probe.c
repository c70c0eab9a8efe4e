/* CELT oracle probe over the reference's vendored opus-1.5.2 internals.
 *
 * Exposes PRIMITIVES of the normative decoder for conformance testing of
 * the from-spec Python implementation (RFC 6716 s4.1/s4.3):
 *
 *   celt_probe mode <frame_size>
 *       dump the CELTMode tables (band layout, allocation matrix, logN,
 *       window, PVQ bit cache, preemphasis) as JSON on stdout
 *   celt_probe ecenc <seed> <nsyms>
 *       encode a pseudorandom symbol schedule with the reference range
 *       encoder; print schedule + byte stream so the Python range
 *       decoder can be validated symbol-for-symbol
 *   celt_probe alloc <frame_size> <C> <LM> <total> <trim> <seed>
 *       run clt_compute_allocation on pseudorandom boosts and print the
 *       resulting pulses/ebits/priorities/coded bands
 *   celt_probe cwrs <N> <K> <seed>
 *       encode a random PVQ vector with encode_pulses, then print the
 *       vector and the byte stream for decode validation
 *   celt_probe laplace <fs> <decay> <seed> <n>
 *       encode n random values with ec_laplace_encode; print values+bytes
 *
 * Build (see tools/build_oracles.sh): links .oracle_build libopus.a and
 * includes the vendored celt headers (read-only).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "opus.h"
#include "opus_custom.h"
#include "modes.h"
#include "entenc.h"
#include "entdec.h"
#include "rate.h"
#include "cwrs.h"
#include "laplace.h"
#include "bands.h"
#include "celt.h"
#include "quant_bands.h"

static unsigned int rngs = 22222;
static unsigned int prng(void) {
    rngs = rngs * 1664525u + 1013904223u;
    return rngs >> 8;
}

static void dump_i16(const char *name, const opus_int16 *v, int n) {
    printf("\"%s\":[", name);
    for (int i = 0; i < n; i++) printf("%s%d", i ? "," : "", v[i]);
    printf("],");
}

static void dump_u8(const char *name, const unsigned char *v, int n) {
    printf("\"%s\":[", name);
    for (int i = 0; i < n; i++) printf("%s%d", i ? "," : "", v[i]);
    printf("],");
}

static int do_mode(int frame_size) {
    int err = 0;
    OpusCustomMode *m = opus_custom_mode_create(48000, frame_size, &err);
    if (!m || err) { fprintf(stderr, "mode err %d\n", err); return 1; }
    printf("{");
    printf("\"Fs\":%d,\"overlap\":%d,\"nbEBands\":%d,\"effEBands\":%d,",
           m->Fs, m->overlap, m->nbEBands, m->effEBands);
    printf("\"preemph\":[%.17g,%.17g,%.17g,%.17g],",
           (double)m->preemph[0], (double)m->preemph[1],
           (double)m->preemph[2], (double)m->preemph[3]);
    printf("\"maxLM\":%d,\"nbShortMdcts\":%d,\"shortMdctSize\":%d,",
           m->maxLM, m->nbShortMdcts, m->shortMdctSize);
    printf("\"nbAllocVectors\":%d,", m->nbAllocVectors);
    dump_i16("eBands", m->eBands, m->nbEBands + 2);
    dump_u8("allocVectors", m->allocVectors,
            m->nbAllocVectors * m->nbEBands);
    dump_i16("logN", m->logN, m->nbEBands);
    printf("\"window\":[");
    for (int i = 0; i < m->overlap; i++)
        printf("%s%.17g", i ? "," : "", (double)m->window[i]);
    printf("],");
    printf("\"cache_size\":%d,", m->cache.size);
    dump_i16("cache_index", m->cache.index,
             (m->maxLM + 2) * m->nbEBands);
    dump_u8("cache_bits", m->cache.bits, m->cache.size);
    dump_u8("cache_caps", m->cache.caps, (m->maxLM + 1) * 2 * m->nbEBands);
    printf("\"ok\":1}\n");
    return 0;
}

/* symbol kinds exercised: 0 bit_logp, 1 bits, 2 uint, 3 icdf.
 * Two passes: first with a huge buffer to learn the exact bit budget,
 * then re-encoded into a buffer of exactly that many bytes so the range
 * front and the raw-bit tail share bytes the way a real packet does. */
static const unsigned char icdf_t[4][8] = {
    {2, 1, 0, 0, 0, 0, 0, 0},
    {6, 3, 1, 0, 0, 0, 0, 0},
    {10, 8, 6, 4, 2, 1, 0, 0},
    {96, 64, 32, 16, 8, 4, 2, 0},
};
static const int icdf_ftb[4] = {2, 3, 4, 7};

static void ecenc_schedule(unsigned seed, int nsyms, ec_enc *enc,
                           int print) {
    rngs = seed;
    for (int i = 0; i < nsyms; i++) {
        int kind = prng() % 4;
        if (kind == 0) {
            int logp = 1 + prng() % 14;
            int bit = prng() % 2;
            ec_enc_bit_logp(enc, bit, logp);
            if (print) printf("%s[0,%d,%d]", i ? "," : "", logp, bit);
        } else if (kind == 1) {
            int nbits = 1 + prng() % 16;
            unsigned v = prng() & ((1u << nbits) - 1);
            ec_enc_bits(enc, v, nbits);
            if (print) printf("%s[1,%d,%u]", i ? "," : "", nbits, v);
        } else if (kind == 2) {
            unsigned ft = 2 + prng() % 1000;
            unsigned v = prng() % ft;
            ec_enc_uint(enc, v, ft);
            if (print) printf("%s[2,%u,%u]", i ? "," : "", ft, v);
        } else {
            int t = prng() % 4;
            int n = 0;
            while (icdf_t[t][n]) n++;
            int v = prng() % (n + 1);
            ec_enc_icdf(enc, v, icdf_t[t], icdf_ftb[t]);
            if (print) printf("%s[3,%d,%d]", i ? "," : "", t, v);
        }
    }
}

static int do_ecenc(unsigned seed, int nsyms) {
    static unsigned char buf[65536];
    ec_enc enc;
    ec_enc_init(&enc, buf, sizeof buf);
    printf("{\"schedule\":[");
    ecenc_schedule(seed, nsyms, &enc, 1);
    int total = (ec_tell(&enc) + 7) / 8;
    ec_enc_init(&enc, buf, (opus_uint32)total);
    ecenc_schedule(seed, nsyms, &enc, 0);
    ec_enc_done(&enc);
    printf("],\"bytes\":\"");
    for (int i = 0; i < total; i++) printf("%02x", buf[i]);
    printf("\",\"nbytes\":%d}\n", total);
    return 0;
}

static int do_alloc(int frame_size, int C, int LM, int total, int trim,
                    unsigned seed) {
    rngs = seed;
    int err = 0;
    OpusCustomMode *m = opus_custom_mode_create(48000, frame_size, &err);
    if (!m) return 1;
    int nb = m->nbEBands;
    int offsets[32] = {0}, cap[32];
    int pulses[32], ebits[32], prio[32];
    /* caps as the decoder computes them (celt.c init_caps) */
    for (int i = 0; i < nb; i++) {
        int N = (m->eBands[i + 1] - m->eBands[i]) << LM;
        cap[i] = (m->cache.caps[(LM * 2 + C - 1) * nb + i] + 64)
            * C * N >> 2;
    }
    for (int i = 0; i < nb; i++)
        if (prng() % 4 == 0) offsets[i] = (int)(prng() % 64);
    int intensity = 0, dual = 0;
    opus_int32 balance = 0;
    /* decoder side: ec initialised over a scratch buffer (the skip/
       intensity/dual decisions read symbols) */
    static unsigned char scratch[1024];
    for (int i = 0; i < 1024; i++) scratch[i] = (unsigned char)prng();
    ec_dec dec;
    ec_dec_init(&dec, scratch, sizeof scratch);
    int coded = clt_compute_allocation(m, 0, m->effEBands, offsets, cap,
                                       trim, &intensity, &dual, total,
                                       &balance, pulses, ebits, prio, C,
                                       LM, &dec, 0, 0, nb);
    printf("{\"offsets\":[");
    for (int i = 0; i < nb; i++) printf("%s%d", i ? "," : "", offsets[i]);
    printf("],\"cap\":[");
    for (int i = 0; i < nb; i++) printf("%s%d", i ? "," : "", cap[i]);
    printf("],\"pulses\":[");
    for (int i = 0; i < nb; i++) printf("%s%d", i ? "," : "", pulses[i]);
    printf("],\"ebits\":[");
    for (int i = 0; i < nb; i++) printf("%s%d", i ? "," : "", ebits[i]);
    printf("],\"prio\":[");
    for (int i = 0; i < nb; i++) printf("%s%d", i ? "," : "", prio[i]);
    printf("],\"coded\":%d,\"balance\":%d,\"intensity\":%d,\"dual\":%d,"
           "\"tell_frac\":%u,\"scratch\":\"",
           coded, (int)balance, intensity, dual,
           (unsigned)ec_tell_frac(&dec));
    for (int i = 0; i < 64; i++) printf("%02x", scratch[i]);
    printf("\"}\n");
    return 0;
}

static int do_cwrs(int N, int K, unsigned seed) {
    rngs = seed;
    static unsigned char buf[4096];
    ec_enc enc;
    ec_enc_init(&enc, buf, sizeof buf);
    int y[256];
    int left = K;
    memset(y, 0, sizeof y);
    for (int i = 0; i < N - 1 && left > 0; i++) {
        int k = (int)(prng() % (unsigned)(left + 1));
        y[i] = (prng() % 2) ? -k : k;
        left -= k;
    }
    y[N - 1] = (prng() % 2) ? -left : left;
    encode_pulses(y, N, K, &enc);
    int total = (ec_tell(&enc) + 7) / 8;
    ec_enc_init(&enc, buf, (opus_uint32)total);
    encode_pulses(y, N, K, &enc);
    ec_enc_done(&enc);
    printf("{\"y\":[");
    for (int i = 0; i < N; i++) printf("%s%d", i ? "," : "", y[i]);
    printf("],\"bytes\":\"");
    for (int i = 0; i < total; i++) printf("%02x", buf[i]);
    printf("\"}\n");
    return 0;
}

static int do_laplace(int fs, int decay, unsigned seed, int n) {
    static unsigned char buf[4096];
    int vals[256];
    ec_enc enc;
    int total = 0;
    for (int pass = 0; pass < 2; pass++) {
        rngs = seed;
        ec_enc_init(&enc, buf, pass ? (opus_uint32)total
                                    : (opus_uint32)sizeof buf);
        for (int i = 0; i < n && i < 256; i++) {
            int v = (int)(prng() % 21) - 10;
            vals[i] = v;
            ec_laplace_encode(&enc, &vals[i], fs, decay);
            /* may clamp; vals[i] holds the actually-coded value */
        }
        if (!pass) total = (ec_tell(&enc) + 7) / 8;
    }
    ec_enc_done(&enc);
    printf("{\"vals\":[");
    for (int i = 0; i < n; i++) printf("%s%d", i ? "," : "", vals[i]);
    printf("],\"bytes\":\"");
    for (int i = 0; i < total; i++) printf("%02x", buf[i]);
    printf("\"}\n");
    return 0;
}


/* decode a sequence of raw CELT frames ([u16le len][bytes]...) with the
   reference celt decoder; dump float PCM (interleaved) as f32le to stdout */
static int do_celtdec(const char *path, int C, int frame_size) {
    int err = 0;
    OpusCustomMode *m = opus_custom_mode_create(48000, 960, &err);
    if (!m) return 1;
    int sz = celt_decoder_get_size(C);
    CELTDecoder *st = (CELTDecoder *)calloc(1, (size_t)sz);
    celt_decoder_init(st, 48000, C);
    FILE *f = fopen(path, "rb");
    if (!f) { perror("open"); return 1; }
    unsigned char pkt[1500];
    float pcm[960 * 2 * 8];
    unsigned char hdr[2];
    while (fread(hdr, 1, 2, f) == 2) {
        int len = hdr[0] | (hdr[1] << 8);
        if (len > (int)sizeof pkt) return 1;
        if ((int)fread(pkt, 1, (size_t)len, f) != len) break;
        int n = celt_decode_with_ec(st, pkt, len, pcm, frame_size, NULL, 0);
        if (n < 0) { fprintf(stderr, "celt err %d\n", n); return 1; }
        fwrite(pcm, sizeof(float), (size_t)(n * C), stdout);
    }
    fclose(f);
    return 0;
}

/* dump the clt_mdct_backward response to a unit impulse at `bin`
   (B blocks interleaved layout, block 0), into a zeroed buffer of
   nb + overlap samples, as f32le on stdout */
static int do_imdct(int shift, int B, int bin) {
    int err = 0;
    OpusCustomMode *m = opus_custom_mode_create(48000, 960, &err);
    if (!m) return 1;
    int N = 960 * 2;                 /* mdct size at shift 0 */
    int nb = (N >> shift) >> 1;      /* coefficients per block */
    float *in = (float *)calloc((size_t)(nb * B), sizeof(float));
    float *out = (float *)calloc((size_t)(nb + m->overlap + 8),
                                 sizeof(float));
    in[bin * B] = 1.0f;
    clt_mdct_backward_c(&m->mdct, in, out, m->window, m->overlap, shift, B,
                        0);
    fwrite(out, sizeof(float), (size_t)(nb + m->overlap), stdout);
    return 0;
}


/* encode s16le raw audio into CELT-only frames via the reference encoder
   (RESTRICTED_LOWDELAY forces CELT mode); writes [u16le len][frame bytes]
   (TOC stripped from code-0 packets) */
static int do_celtenc(const char *inp, const char *outp, int C,
                      int frame_size, int bitrate) {
    FILE *in = fopen(inp, "rb");
    FILE *out = fopen(outp, "wb");
    if (!in || !out) { perror("open"); return 1; }
    int err = 0;
    OpusEncoder *enc = opus_encoder_create(
        48000, C, OPUS_APPLICATION_RESTRICTED_LOWDELAY, &err);
    if (err) return 1;
    opus_encoder_ctl(enc, OPUS_SET_BITRATE(bitrate));
    {
        const char *cx = getenv("CELT_COMPLEXITY");
        if (cx) opus_encoder_ctl(enc, OPUS_SET_COMPLEXITY(atoi(cx)));
    }
    short pcm[960 * 2];
    unsigned char pkt[1500];
    for (;;) {
        size_t got = fread(pcm, sizeof(short) * (size_t)C,
                           (size_t)frame_size, in);
        if (got < (size_t)frame_size) break;
        int len = opus_encode(enc, pcm, frame_size, pkt, sizeof pkt);
        if (len < 1) return 1;
        if ((pkt[0] & 0x3) != 0) { fprintf(stderr, "not code 0\n");
                                   return 1; }
        unsigned char hdr[2] = {(unsigned char)((len - 1) & 0xFF),
                                (unsigned char)((len - 1) >> 8)};
        fwrite(hdr, 1, 2, out);
        fwrite(pkt + 1, 1, (size_t)(len - 1), out);
    }
    fclose(in);
    fclose(out);
    return 0;
}


/* run unquant_coarse_energy on pseudorandom scratch bytes + pseudorandom
   previous energies; dump resulting energies (exact float) */
static int do_coarse(int C, int LM, int intra, unsigned seed, int nbytes) {
    rngs = seed;
    int err = 0;
    OpusCustomMode *m = opus_custom_mode_create(48000, 960, &err);
    if (!m) return 1;
    static unsigned char scratch[4096];
    for (int i = 0; i < nbytes && i < 4096; i++)
        scratch[i] = (unsigned char)prng();
    float oldE[2 * 21];
    for (int i = 0; i < 2 * 21; i++)
        oldE[i] = ((int)(prng() % 4000) - 2000) / 100.0f;
    printf("{\"oldE\":[");
    for (int i = 0; i < 42; i++) printf("%s%.9g", i ? "," : "", oldE[i]);
    ec_dec dec;
    ec_dec_init(&dec, scratch, (opus_uint32)nbytes);
    unquant_coarse_energy(m, 0, 21, oldE, intra, &dec, C, LM);
    printf("],\"out\":[");
    for (int i = 0; i < 42; i++) printf("%s%.9g", i ? "," : "", oldE[i]);
    printf("],\"tell\":%d,\"scratch\":\"", ec_tell(&dec));
    for (int i = 0; i < nbytes; i++) printf("%02x", scratch[i]);
    printf("\"}\n");
    return 0;
}


/* drive the reference quant_all_bands (decode side) on pseudorandom
   scratch + a real allocation; dump everything for conformance */
static int do_qab(int C, int LM, int transient, int total8, int trim,
                  unsigned seed, int intensity_req) {
    rngs = seed;
    int err = 0;
    OpusCustomMode *m = opus_custom_mode_create(48000, 960, &err);
    if (!m) return 1;
    int nb = m->nbEBands;
    int M = 1 << LM;
    int N = M * m->shortMdctSize;
    static unsigned char scratch[4096];
    for (int i = 0; i < 4096; i++) scratch[i] = (unsigned char)prng();
    int offsets[32] = {0}, cap[32];
    for (int i = 0; i < nb; i++) {
        int nn = (m->eBands[i + 1] - m->eBands[i]) << LM;
        cap[i] = (m->cache.caps[(LM * 2 + C - 1) * nb + i] + 64)
            * C * nn >> 2;
    }
    int tf_res[32];
    const signed char *row = tf_select_table[LM];
    for (int i = 0; i < nb; i++)
        tf_res[i] = row[4 * transient + 2 * (int)(prng() % 2)
                        + (int)(prng() % 2)];
    int spread = (int)(prng() % 4);
    ec_dec dec;
    ec_dec_init(&dec, scratch, sizeof scratch);
    int intensity = 0, dual = 0;
    opus_int32 balance = 0;
    int pulses[32], ebits[32], prio[32];
    int coded = clt_compute_allocation(m, 0, nb, offsets, cap, trim,
                                       &intensity, &dual, total8, &balance,
                                       pulses, ebits, prio, C, LM, &dec, 0,
                                       0, nb);
    float *X = (float *)calloc((size_t)(C * N), sizeof(float));
    unsigned char masks[64] = {0};
    opus_uint32 rng_ = 0;
    quant_all_bands(0, m, 0, nb, X, C == 2 ? X + N : NULL, masks, NULL,
                    pulses, transient ? M : 0, spread, dual, intensity,
                    tf_res, (opus_int32)sizeof(scratch) * 8 * 8, balance,
                    &dec, LM, coded, &rng_, 0, 0, 0);
    printf("{\"spread\":%d,\"coded\":%d,\"intensity\":%d,"
           "\"dual\":%d,\"balance\":%d,\"tf\":[", spread, coded,
           intensity, dual, (int)balance);
    for (int i = 0; i < nb; i++) printf("%s%d", i ? "," : "", tf_res[i]);
    printf("],\"pulses\":[");
    for (int i = 0; i < nb; i++) printf("%s%d", i ? "," : "", pulses[i]);
    printf("],\"masks\":[");
    for (int i = 0; i < C * nb; i++) printf("%s%d", i ? "," : "", masks[i]);
    printf("],\"rng\":%u,\"tell\":%u,\"total\":%d,", rng_,
           (unsigned)ec_tell_frac(&dec), total8);
    printf("\"X\":[");
    for (int i = 0; i < C * N; i++) printf("%s%.9g", i ? "," : "", X[i]);
    printf("],\"scratch\":\"");
    for (int i = 0; i < 4096; i++) printf("%02x", scratch[i]);
    printf("\"}\n");
    return 0;
}


/* run the reference comb_filter on pseudorandom signal/params; dump IO */
static int do_comb(int T0, int T1, int N, int g0q, int g1q, int t0, int t1,
                   unsigned seed) {
    rngs = seed;
    int err = 0;
    OpusCustomMode *m = opus_custom_mode_create(48000, 960, &err);
    if (!m) return 1;
    int total = 2048 + N;
    float *x = (float *)calloc((size_t)total, sizeof(float));
    for (int i = 0; i < total; i++)
        x[i] = ((int)(prng() % 20000) - 10000) / 10.0f;
    printf("{\"x\":[");
    for (int i = 0; i < total; i++) printf("%s%.9g", i ? "," : "", x[i]);
    comb_filter(x + 2048, x + 2048, T0, T1, N, g0q / 32.0f, g1q / 32.0f,
                t0, t1, m->window, m->overlap, 0);
    printf("],\"y\":[");
    for (int i = 0; i < N; i++)
        printf("%s%.9g", i ? "," : "", x[2048 + i]);
    printf("]}\n");
    return 0;
}


/* mirror of the reference decoder struct head (behavior study: offsets
   only, to locate oldEBands for state dumping in oracle tooling) */
struct ProbeDecHead {
    const OpusCustomMode *mode;
    int overlap, channels, stream_channels, downsample, start, end;
    int signalling, disable_inv, complexity, arch;
    opus_uint32 rng;
    int error, last_pitch_index, loss_duration, skip_plc;
    int postfilter_period, postfilter_period_old;
    float postfilter_gain, postfilter_gain_old;
    int postfilter_tapset, postfilter_tapset_old, prefilter_and_fold;
    float preemph_memD[2];
    float _decode_mem[1];
};
#define PROBE_DECODE_BUFFER_SIZE 2048
#define PROBE_LPC_ORDER 24

static int do_celtdec_energy(const char *path, int C, int frame_size) {
    int err = 0;
    OpusCustomMode *m = opus_custom_mode_create(48000, 960, &err);
    if (!m) return 1;
    int sz = celt_decoder_get_size(C);
    CELTDecoder *st = (CELTDecoder *)calloc(1, (size_t)sz);
    celt_decoder_init(st, 48000, C);
    struct ProbeDecHead *h = (struct ProbeDecHead *)st;
    float *lpc = h->_decode_mem
        + C * (PROBE_DECODE_BUFFER_SIZE + m->overlap);
    float *oldE = lpc + C * PROBE_LPC_ORDER;
    FILE *f = fopen(path, "rb");
    unsigned char pkt[1500];
    float pcm[960 * 2 * 8];
    unsigned char hdr[2];
    int fno = 0;
    while (fread(hdr, 1, 2, f) == 2) {
        int len = hdr[0] | (hdr[1] << 8);
        if ((int)fread(pkt, 1, (size_t)len, f) != len) break;
        celt_decode_with_ec(st, pkt, len, pcm, frame_size, NULL, 0);
        printf("{\"frame\":%d,\"oldE\":[", fno++);
        for (int i = 0; i < 42; i++)
            printf("%s%.9g", i ? "," : "", oldE[i]);
        printf("],\"rng\":%u,\"pf_period\":%d,\"pf_gain\":%.9g}\n",
               h->rng, h->postfilter_period, (double)h->postfilter_gain);
    }
    fclose(f);
    return 0;
}

int main(int argc, char **argv) {
    if (argc < 2) return 2;
    if (!strcmp(argv[1], "mode") && argc == 3)
        return do_mode(atoi(argv[2]));
    if (!strcmp(argv[1], "ecenc") && argc == 4)
        return do_ecenc((unsigned)atoi(argv[2]), atoi(argv[3]));
    if (!strcmp(argv[1], "alloc") && argc == 8)
        return do_alloc(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                        atoi(argv[5]), atoi(argv[6]),
                        (unsigned)atoi(argv[7]));
    if (!strcmp(argv[1], "cwrs") && argc == 5)
        return do_cwrs(atoi(argv[2]), atoi(argv[3]),
                       (unsigned)atoi(argv[4]));
    if (!strcmp(argv[1], "comb") && argc == 10)
        return do_comb(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                       atoi(argv[5]), atoi(argv[6]), atoi(argv[7]),
                       atoi(argv[8]), (unsigned)atoi(argv[9]));
    if (!strcmp(argv[1], "qab") && argc == 9)
        return do_qab(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                      atoi(argv[5]), atoi(argv[6]),
                      (unsigned)atoi(argv[7]), atoi(argv[8]));
    if (!strcmp(argv[1], "coarse") && argc == 7)
        return do_coarse(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                         (unsigned)atoi(argv[5]), atoi(argv[6]));
    if (!strcmp(argv[1], "celtenc") && argc == 7)
        return do_celtenc(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]),
                          atoi(argv[6]));
    if (!strcmp(argv[1], "celtdec_energy") && argc == 5)
        return do_celtdec_energy(argv[2], atoi(argv[3]), atoi(argv[4]));
    if (!strcmp(argv[1], "celtdec") && argc == 5)
        return do_celtdec(argv[2], atoi(argv[3]), atoi(argv[4]));
    if (!strcmp(argv[1], "imdct") && argc == 5)
        return do_imdct(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]));
    if (!strcmp(argv[1], "laplace") && argc == 6)
        return do_laplace(atoi(argv[2]), atoi(argv[3]),
                          (unsigned)atoi(argv[4]), atoi(argv[5]));
    return 2;
}
