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

#include "opus_custom.h"
#include "modes.h"
#include "entenc.h"
#include "entdec.h"
#include "rate.h"
#include "cwrs.h"
#include "laplace.h"

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
    if (!strcmp(argv[1], "laplace") && argc == 6)
        return do_laplace(atoi(argv[2]), atoi(argv[3]),
                          (unsigned)atoi(argv[4]), atoi(argv[5]));
    return 2;
}
