/* Golden-oracle CLI over the reference's vendored opus-1.5.2 + libogg:
 *   opus_oracle decode in.opus out.raw   (s16le interleaved, 48 kHz)
 *   opus_oracle encode in.raw out.opus ch [bitrate]
 * Prints "rate 48000 ch <n> preskip <k>" on stderr.  Applies pre-skip
 * and the final-page granule trim per RFC 7845. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <ogg/ogg.h>
#include <opus.h>
#include "opus_private.h"

static void flush_pages(ogg_stream_state *os, FILE *out, int force) {
    ogg_page og;
    while ((force ? ogg_stream_flush(os, &og)
                  : ogg_stream_pageout(os, &og)) != 0) {
        fwrite(og.header, 1, (size_t)og.header_len, out);
        fwrite(og.body, 1, (size_t)og.body_len, out);
    }
}

static int do_encode(const char *inp, const char *outp, int channels,
                     int bitrate, int force_mode, int frame_ms) {
    FILE *in = fopen(inp, "rb");
    FILE *out = fopen(outp, "wb");
    if (!in || !out) { perror("open"); return 1; }
    int err = 0;
    OpusEncoder *enc = opus_encoder_create(48000, channels,
                                           OPUS_APPLICATION_AUDIO, &err);
    if (err) { fprintf(stderr, "enc err %d\n", err); return 1; }
    opus_encoder_ctl(enc, OPUS_SET_BITRATE(bitrate));
    if (force_mode == 1) {
        /* deterministic SILK-only packets for the LP-layer tests */
        opus_encoder_ctl(enc, OPUS_SET_FORCE_MODE(MODE_SILK_ONLY));
        opus_encoder_ctl(enc, OPUS_SET_MAX_BANDWIDTH(OPUS_BANDWIDTH_WIDEBAND));
    } else if (force_mode == 2) {
        /* deterministic hybrid (SILK WB core + CELT 17+) packets */
        opus_encoder_ctl(enc, OPUS_SET_FORCE_MODE(MODE_HYBRID));
        opus_encoder_ctl(enc, OPUS_SET_BANDWIDTH(OPUS_BANDWIDTH_SUPERWIDEBAND));
    } else if (force_mode == 3) {
        /* SILK-only capped at mediumband (12 kHz internal rate) */
        opus_encoder_ctl(enc, OPUS_SET_FORCE_MODE(MODE_SILK_ONLY));
        opus_encoder_ctl(enc, OPUS_SET_MAX_BANDWIDTH(OPUS_BANDWIDTH_MEDIUMBAND));
    } else if (force_mode == 4) {
        /* SILK-only WB with in-band FEC (LBRR) for the FEC tests */
        opus_encoder_ctl(enc, OPUS_SET_FORCE_MODE(MODE_SILK_ONLY));
        opus_encoder_ctl(enc, OPUS_SET_MAX_BANDWIDTH(OPUS_BANDWIDTH_WIDEBAND));
        opus_encoder_ctl(enc, OPUS_SET_INBAND_FEC(1));
        opus_encoder_ctl(enc, OPUS_SET_PACKET_LOSS_PERC(30));
    }
    /* force_mode == 5: switch-heavy stream for the RFC 6716 s4.5
       redundancy-crossfade tests; the mode is re-forced every 8
       packets inside the encode loop below. */
    int preskip = 0;
    opus_encoder_ctl(enc, OPUS_GET_LOOKAHEAD(&preskip));

    ogg_stream_state os;
    ogg_stream_init(&os, 0x4f505553);
    unsigned char head[19];
    memcpy(head, "OpusHead", 8);
    head[8] = 1;                      /* version */
    head[9] = (unsigned char)channels;
    head[10] = (unsigned char)(preskip & 0xff);
    head[11] = (unsigned char)(preskip >> 8);
    head[12] = 0x80; head[13] = 0xbb; head[14] = 0; head[15] = 0; /* 48k */
    head[16] = head[17] = 0;          /* output gain */
    head[18] = 0;                     /* mono/stereo mapping family */
    ogg_packet op;
    memset(&op, 0, sizeof op);
    op.packet = head; op.bytes = 19; op.b_o_s = 1; op.packetno = 0;
    ogg_stream_packetin(&os, &op);
    flush_pages(&os, out, 1);
    unsigned char tags[24];
    memcpy(tags, "OpusTags", 8);
    memset(tags + 8, 0, 16);
    tags[8] = 6;                      /* vendor length */
    memcpy(tags + 12, "oracle", 6);
    op.packet = tags; op.bytes = 8 + 4 + 6 + 4; op.b_o_s = 0;
    op.packetno = 1;
    ogg_stream_packetin(&os, &op);
    flush_pages(&os, out, 1);

    const int frame = frame_ms * 48;  /* per-packet duration */
    opus_int16 *pcm = malloc(sizeof(opus_int16) * (size_t)frame * channels);
    unsigned char packet[4000];
    long long granule = preskip;
    long long pno = 2;
    for (;;) {
        size_t n = fread(pcm, sizeof(opus_int16) * channels, (size_t)frame,
                         in);
        if (n == 0) break;
        if (n < (size_t)frame)
            memset(pcm + n * channels, 0,
                   sizeof(opus_int16) * (frame - n) * channels);
        if (force_mode == 5) {
            switch (((pno - 2) / 8) % 3) {
            case 0:
                opus_encoder_ctl(enc, OPUS_SET_FORCE_MODE(MODE_SILK_ONLY));
                opus_encoder_ctl(enc,
                    OPUS_SET_MAX_BANDWIDTH(OPUS_BANDWIDTH_WIDEBAND));
                break;
            case 1:
                opus_encoder_ctl(enc, OPUS_SET_FORCE_MODE(MODE_CELT_ONLY));
                opus_encoder_ctl(enc,
                    OPUS_SET_MAX_BANDWIDTH(OPUS_BANDWIDTH_FULLBAND));
                break;
            default:
                opus_encoder_ctl(enc, OPUS_SET_FORCE_MODE(MODE_HYBRID));
                opus_encoder_ctl(enc,
                    OPUS_SET_BANDWIDTH(OPUS_BANDWIDTH_SUPERWIDEBAND));
                break;
            }
        }
        int r = opus_encode(enc, pcm, frame, packet, sizeof packet);
        if (r < 0) { fprintf(stderr, "enc %d\n", r); return 1; }
        granule += frame;
        op.packet = packet; op.bytes = r; op.granulepos = granule;
        op.packetno = pno++;
        op.e_o_s = (n < (size_t)frame) ? 1 : 0;
        ogg_stream_packetin(&os, &op);
        flush_pages(&os, out, 0);
        if (op.e_o_s) break;
    }
    op.e_o_s = 1;
    flush_pages(&os, out, 1);
    fprintf(stderr, "rate 48000 ch %d preskip %d\n", channels, preskip);
    fclose(out);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 5 && strcmp(argv[1], "encode") == 0)
        return do_encode(argv[2], argv[3], atoi(argv[4]),
                         argc > 5 ? atoi(argv[5]) : 96000,
                         argc > 6 ? (strcmp(argv[6], "silk") == 0 ? 1 :
                                     strcmp(argv[6], "hybrid") == 0 ? 2 :
                                     strcmp(argv[6], "silkmb") == 0 ? 3 :
                                     strcmp(argv[6], "silkfec") == 0 ? 4 :
                                     strcmp(argv[6], "switchy") == 0 ? 5 : 0)
                                  : 0,
                         argc > 7 ? atoi(argv[7]) : 20);
    if (argc < 4 || strcmp(argv[1], "decode") != 0) {
        fprintf(stderr, "usage: %s decode in.opus out.raw [loss|fFEC] | "
                        "encode in.raw out.opus ch [bitrate]\n", argv[0]);
        return 2;
    }
    /* optional 5th arg: comma-separated audio-packet indices to treat
       as lost (opus_decode(NULL) -> PLC); f-prefixed entries recover
       that index from the NEXT packet's in-band FEC instead. */
    int lost_idx[4096];
    memset(lost_idx, 0, sizeof(lost_idx));
    if (argc > 4) {
        char *tok = strtok(argv[4], ",");
        while (tok) {
            if (tok[0] == 'f')
                lost_idx[atoi(tok + 1)] = 2;
            else
                lost_idx[atoi(tok)] = 1;
            tok = strtok(NULL, ",");
        }
    }
    FILE *in = fopen(argv[2], "rb");
    if (!in) { perror("in"); return 1; }
    FILE *out = fopen(argv[3], "wb");
    if (!out) { perror("out"); return 1; }

    ogg_sync_state oy;
    ogg_stream_state os;
    ogg_page og;
    ogg_packet op;
    ogg_sync_init(&oy);
    int stream_init = 0, headers = 0, channels = 2, preskip = 0;
    OpusDecoder *dec = NULL;
    opus_int16 pcm[5760 * 8];
    long long produced = 0, target = -1;
    long long skip = 0;

    for (;;) {
        char *buf = ogg_sync_buffer(&oy, 65536);
        size_t n = fread(buf, 1, 65536, in);
        ogg_sync_wrote(&oy, (long)n);
        int got_page;
        while ((got_page = ogg_sync_pageout(&oy, &og)) == 1) {
            if (!stream_init) {
                ogg_stream_init(&os, ogg_page_serialno(&og));
                stream_init = 1;
            }
            ogg_stream_pagein(&os, &og);
            if (ogg_page_eos(&og))
                target = ogg_page_granulepos(&og) - preskip;
            while (ogg_stream_packetout(&os, &op) == 1) {
                if (headers == 0) {
                    if (op.bytes < 19 || memcmp(op.packet, "OpusHead", 8)) {
                        fprintf(stderr, "not opus\n");
                        return 1;
                    }
                    channels = op.packet[9];
                    preskip = op.packet[10] | (op.packet[11] << 8);
                    skip = preskip;
                    int err = 0;
                    dec = opus_decoder_create(48000, channels, &err);
                    if (err) { fprintf(stderr, "dec err %d\n", err); return 1; }
                    headers = 1;
                    continue;
                }
                if (headers == 1) { headers = 2; continue; }  /* OpusTags */
                static int pkt_idx = 0;
                int mode = pkt_idx < 4096 ? lost_idx[pkt_idx] : 0;
                pkt_idx++;
                int r;
                if (mode == 1) {
                    int dur = opus_packet_get_nb_samples(
                        op.packet, (opus_int32)op.bytes, 48000);
                    r = opus_decode(dec, NULL, 0, pcm,
                                    dur > 0 ? dur : 960, 0);
                } else if (mode == 2) {
                    int dur = opus_packet_get_nb_samples(
                        op.packet, (opus_int32)op.bytes, 48000);
                    /* recover with this packet's FEC data, then decode
                       it normally; both outputs are written */
                    r = opus_decode(dec, op.packet, (opus_int32)op.bytes,
                                    pcm, dur > 0 ? dur : 960, 1);
                    if (r > 0) {
                        opus_int16 *p = pcm;
                        long long frames = r;
                        if (skip > 0) {
                            long long s = skip < frames ? skip : frames;
                            p += s * channels;
                            frames -= s;
                            skip -= s;
                        }
                        if (frames > 0) {
                            fwrite(p, sizeof(opus_int16),
                                   (size_t)frames * channels, out);
                            produced += frames;
                        }
                    }
                    r = opus_decode(dec, op.packet, (opus_int32)op.bytes,
                                    pcm, 5760, 0);
                } else {
                    r = opus_decode(dec, op.packet, (opus_int32)op.bytes,
                                    pcm, 5760, 0);
                }
                if (r <= 0) continue;
                opus_int16 *p = pcm;
                long long frames = r;
                if (skip > 0) {
                    long long s = skip < frames ? skip : frames;
                    p += s * channels;
                    frames -= s;
                    skip -= s;
                }
                if (target >= 0 && produced + frames > target)
                    frames = target - produced;
                if (frames > 0) {
                    fwrite(p, sizeof(opus_int16),
                           (size_t)frames * channels, out);
                    produced += frames;
                }
            }
        }
        if (n == 0) break;
    }
    fprintf(stderr, "rate 48000 ch %d preskip %d\n", channels, preskip);
    fclose(out);
    return 0;
}
