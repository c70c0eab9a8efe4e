/* Test oracle CLI over the reference's vendored libmad-0.15.1b.
 *
 * Built by tools/build_oracles.sh into .oracle_build/ (gitignored); gives
 * the conformance suite ground truth from the exact MP3 decoder the
 * reference ships (used by OpenHome/Media/Codec/Mp3.cpp).  Compiled from
 * the read-only reference tree, never copied into this repo.
 *
 * Usage: mad_oracle decode <in.mp3> <out.raw16>   (interleaved s16le)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
/* config.h FIRST (the library's .c files do the same; without it fixed.h
 * picks 64-bit mad_fixed_t and the struct ABI mismatches), then the
 * component headers — NOT the shipped mad.h, which is pre-generated for a
 * different configuration */
#include "config.h"
#include "global.h"
#include "fixed.h"
#include "bit.h"
#include "timer.h"
#include "stream.h"
#include "frame.h"
#include "synth.h"
#define MAD_F_ONE MAD_F(0x10000000)
#define MAD_RECOVERABLE(error) ((error) & 0xff00)

static short clip16(mad_fixed_t s)
{
    /* round from Q(MAD_F_FRACBITS) to 16 bits */
    s += 1L << (MAD_F_FRACBITS - 16);
    if (s >= MAD_F_ONE) s = MAD_F_ONE - 1;
    if (s < -MAD_F_ONE) s = -MAD_F_ONE;
    return (short)(s >> (MAD_F_FRACBITS + 1 - 16));
}

int main(int argc, char **argv)
{
    if (argc < 4 || strcmp(argv[1], "decode")) {
        fprintf(stderr, "usage: %s decode <in.mp3> <out.raw16>\n", argv[0]);
        return 1;
    }
    FILE *fi = fopen(argv[2], "rb");
    FILE *fo = fopen(argv[3], "wb");
    if (!fi || !fo) return 2;
    fseek(fi, 0, SEEK_END);
    long n = ftell(fi);
    fseek(fi, 0, SEEK_SET);
    unsigned char *buf = malloc(n + 8);
    fread(buf, 1, n, fi);
    fclose(fi);

    struct mad_stream stream;
    struct mad_frame frame;
    struct mad_synth synth;
    mad_stream_init(&stream);
    mad_frame_init(&frame);
    mad_synth_init(&synth);
    memset(buf + n, 0, 8);
    mad_stream_buffer(&stream, buf, n + 8);
    while (1) {
        if (mad_frame_decode(&frame, &stream)) {
            if (MAD_RECOVERABLE(stream.error)) continue;
            break;
        }
        mad_synth_frame(&synth, &frame);
        unsigned ns = synth.pcm.length, nch = synth.pcm.channels;
        for (unsigned i = 0; i < ns; i++) {
            for (unsigned c = 0; c < nch; c++) {
                short v = clip16(synth.pcm.samples[c][i]);
                fwrite(&v, 2, 1, fo);
            }
        }
    }
    mad_synth_finish(&synth);
    mad_frame_finish(&frame);
    mad_stream_finish(&stream);
    fclose(fo);
    free(buf);
    return 0;
}
