/* silk_probe: drive the reference's SILK decoder directly to produce
 * ground-truth PCM for conformance tests, at either the internal rate
 * (bypassing the resampler) or 48 kHz (full chain), mono or stereo.
 *
 * Links against the oracle libopus.a (built by tools/build_oracles.sh);
 * the probe itself is this repo's test tooling, not shipped code.
 *
 * stdin:  repeated [uint32le n][n bytes of SILK payload (no TOC)]
 * stdout: int16le PCM, channels interleaved, one silk_Decode result per
 *         20 ms frame in each payload
 * argv:   fs_khz(8|12|16) channels(1|2) api_khz payload_ms [loss_spec]
 *         loss_spec: comma-separated packet indices to treat as lost
 *         (PLC); "f<i>" entries decode packet i as LBRR FEC instead.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "silk/API.h"
#include "silk/main.h"
#include "celt/entdec.h"

/* dec_API.c's private handle layout (for index dumping only) */
typedef struct {
    silk_decoder_state channel_state[2];
    stereo_dec_state sStereo;
    opus_int nChannelsAPI;
    opus_int nChannelsInternal;
    opus_int prev_decode_only_middle;
} silk_decoder_dbg;

int main(int argc, char** argv) {
    if (argc >= 2 && !strcmp(argv[1], "gains")) {
        /* silk_probe gains prev_ind cond i0 i1 i2 i3 */
        opus_int8 prev = (opus_int8)atoi(argv[2]);
        int cond = atoi(argv[3]);
        opus_int8 ind[4];
        for (int k = 0; k < 4; k++) ind[k] = (opus_int8)atoi(argv[4 + k]);
        opus_int32 g[4];
        silk_gains_dequant(g, ind, &prev, cond, 4);
        printf("%d %d %d %d prev %d\n", g[0], g[1], g[2], g[3], prev);
        return 0;
    }
    if (argc < 5) {
        fprintf(stderr, "usage: silk_probe fs_khz ch api_khz ms [loss]\n");
        return 2;
    }
    int fs_khz = atoi(argv[1]);
    int channels = atoi(argv[2]);
    int api_khz = atoi(argv[3]);
    int payload_ms = atoi(argv[4]);
    int lost[4096];
    memset(lost, 0, sizeof(lost));
    if (argc > 5) {
        char* tok = strtok(argv[5], ",");
        while (tok) {
            if (tok[0] == 'f')
                lost[atoi(tok + 1)] = 2; /* decode as FEC */
            else
                lost[atoi(tok)] = 1;     /* PLC */
            tok = strtok(NULL, ",");
        }
    }

    int dec_size = 0;
    silk_Get_Decoder_Size(&dec_size);
    void* dec = malloc(dec_size);
    silk_InitDecoder(dec);
    silk_DecControlStruct ctl;
    memset(&ctl, 0, sizeof(ctl));
    ctl.nChannelsAPI = channels;
    ctl.nChannelsInternal = channels;
    ctl.API_sampleRate = api_khz * 1000;
    ctl.internalSampleRate = fs_khz * 1000;
    ctl.payloadSize_ms = payload_ms;

    unsigned char buf[4096];
    opus_int16 pcm[2 * 48 * 120];
    int pkt = 0;
    for (;;) {
        unsigned char hdr[4];
        if (fread(hdr, 1, 4, stdin) != 4) break;
        unsigned n = hdr[0] | (hdr[1] << 8) | ((unsigned)hdr[2] << 16) |
                     ((unsigned)hdr[3] << 24);
        if (n > sizeof(buf)) return 3;
        if (fread(buf, 1, n, stdin) != n) return 3;
        int frame_size = (api_khz * 1000 / 1000) * payload_ms;
        int decoded = 0, first = 1;
        ec_dec rd;
        ec_dec_init(&rd, buf, n);
        int lostFlag = pkt < 4096 ? lost[pkt] : 0;
        do {
            opus_int32 nout = 0;
            int ret = silk_Decode(dec, &ctl, lostFlag, first, &rd,
                                  pcm + decoded * channels, &nout,
#ifdef ENABLE_DEEP_PLC
                                  NULL,
#endif
                                  0);
            if (ret) {
                fprintf(stderr, "silk_Decode ret %d at pkt %d\n", ret, pkt);
                return 4;
            }
            first = 0;
            decoded += nout;
            if (getenv("SILK_PROBE_DUMP")) {
                silk_decoder_dbg* d = (silk_decoder_dbg*)dec;
                SideInfoIndices* ix = &d->channel_state[0].indices;
                fprintf(stderr,
                        "pkt %d sig %d qoff %d gains %d %d %d %d "
                        "nlsf0 %d interp %d lag %d contour %d per %d "
                        "ltp %d %d %d %d scale %d seed %d\n",
                        pkt, ix->signalType, ix->quantOffsetType,
                        ix->GainsIndices[0], ix->GainsIndices[1],
                        ix->GainsIndices[2], ix->GainsIndices[3],
                        ix->NLSFIndices[0], ix->NLSFInterpCoef_Q2,
                        ix->lagIndex, ix->contourIndex, ix->PERIndex,
                        ix->LTPIndex[0], ix->LTPIndex[1], ix->LTPIndex[2],
                        ix->LTPIndex[3], ix->LTP_scaleIndex, ix->Seed);
                fprintf(stderr, "  exc[76..86]:");
                for (int q = 76; q < 86; q++)
                    fprintf(stderr, " %d",
                            d->channel_state[0].exc_Q14[q]);
                fprintf(stderr, "\n  sLPC_buf:");
                for (int q = 0; q < 16; q++)
                    fprintf(stderr, " %d",
                            d->channel_state[0].sLPC_Q14_buf[q]);
                fprintf(stderr, "\n");
            }
        } while (decoded < frame_size);
        fwrite(pcm, sizeof(opus_int16), decoded * channels, stdout);
        pkt++;
    }
    free(dec);
    return 0;
}
