/* Test oracle CLI over the reference's vendored apple_alac codec.
 *
 * Built by tools/build_oracles.sh into .oracle_build/ (gitignored); gives
 * the conformance suite ground truth from the exact ALAC library the
 * reference ships (OpenHome/Media/Codec/AlacAppleBase.cpp).  Compiled
 * from the read-only reference tree, never copied into this repo.
 *
 * Usage:
 *   alac_oracle encode <in.raw16> <out.bin> <rate> <ch>
 *       out.bin = [cookie_len u32][cookie][n_packets u32]
 *                 ([len u32][packet])...
 *   alac_oracle decode <in.bin> <out.raw16> <rate> <ch> <bitdepth>
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "ALACEncoder.h"
#include "ALACDecoder.h"
#include "ALACBitUtilities.h"

static AudioFormatDescription pcm_fmt(int rate, int ch) {
    AudioFormatDescription f;
    memset(&f, 0, sizeof f);
    f.mSampleRate = rate;
    f.mFormatID = kALACFormatLinearPCM;
    f.mFormatFlags = 12;   /* 16-bit source */
    f.mBytesPerPacket = 2 * ch;
    f.mFramesPerPacket = 1;
    f.mBytesPerFrame = 2 * ch;
    f.mChannelsPerFrame = ch;
    f.mBitsPerChannel = 16;
    return f;
}

static AudioFormatDescription alac_fmt(int rate, int ch) {
    AudioFormatDescription f;
    memset(&f, 0, sizeof f);
    f.mSampleRate = rate;
    f.mFormatID = kALACFormatAppleLossless;
    f.mFormatFlags = 1;    /* 16-bit */
    f.mFramesPerPacket = kALACDefaultFramesPerPacket;
    f.mChannelsPerFrame = ch;
    return f;
}

static int do_encode(const char *in, const char *out, int rate, int ch) {
    FILE *fi = fopen(in, "rb"), *fo = fopen(out, "wb");
    if (!fi || !fo) return 2;
    fseek(fi, 0, SEEK_END);
    long nbytes = ftell(fi);
    fseek(fi, 0, SEEK_SET);
    unsigned char *pcm = (unsigned char *)malloc(nbytes);
    fread(pcm, 1, nbytes, fi);
    fclose(fi);

    ALACEncoder enc;
    enc.SetFrameSize(kALACDefaultFramesPerPacket);
    AudioFormatDescription inf = pcm_fmt(rate, ch), outf = alac_fmt(rate, ch);
    enc.InitializeEncoder(outf);

    unsigned char cookie[64];
    unsigned int cookieSize = enc.GetMagicCookieSize(ch);
    enc.GetMagicCookie(cookie, &cookieSize);
    fwrite(&cookieSize, 4, 1, fo);
    fwrite(cookie, 1, cookieSize, fo);

    long frame_bytes = kALACDefaultFramesPerPacket * 2 * ch;
    unsigned int npackets = (unsigned int)((nbytes + frame_bytes - 1)
                                           / frame_bytes);
    fwrite(&npackets, 4, 1, fo);
    unsigned char *buf = (unsigned char *)malloc(frame_bytes + 4096);
    for (unsigned int p = 0; p < npackets; p++) {
        long off = (long)p * frame_bytes;
        int32_t sz = (int32_t)((nbytes - off) < frame_bytes
                               ? (nbytes - off) : frame_bytes);
        enc.Encode(inf, outf, pcm + off, buf, &sz);
        unsigned int usz = (unsigned int)sz;
        fwrite(&usz, 4, 1, fo);
        fwrite(buf, 1, usz, fo);
    }
    fclose(fo);
    free(pcm);
    free(buf);
    return 0;
}

static int do_decode(const char *in, const char *out, int rate, int ch,
                     int depth) {
    FILE *fi = fopen(in, "rb"), *fo = fopen(out, "wb");
    if (!fi || !fo) return 2;
    unsigned int cookieSize = 0, npackets = 0;
    fread(&cookieSize, 4, 1, fi);
    unsigned char cookie[256];
    fread(cookie, 1, cookieSize, fi);
    fread(&npackets, 4, 1, fi);

    ALACDecoder dec;
    dec.Init(cookie, cookieSize);
    unsigned char *pktbuf = (unsigned char *)malloc(1 << 20);
    unsigned char *outbuf = (unsigned char *)malloc(
        kALACDefaultFramesPerPacket * 8 * 4);
    for (unsigned int p = 0; p < npackets; p++) {
        unsigned int sz = 0;
        if (fread(&sz, 4, 1, fi) != 1) break;
        fread(pktbuf, 1, sz, fi);
        BitBuffer bits;
        BitBufferInit(&bits, pktbuf, sz);
        uint32_t numFrames = 0;
        dec.Decode(&bits, outbuf, kALACDefaultFramesPerPacket, ch,
                   &numFrames);
        fwrite(outbuf, (depth / 8) * ch, numFrames, fo);
    }
    fclose(fi);
    fclose(fo);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 6 && !strcmp(argv[1], "encode"))
        return do_encode(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]));
    if (argc >= 7 && !strcmp(argv[1], "decode"))
        return do_decode(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]),
                         atoi(argv[6]));
    fprintf(stderr, "usage: %s encode <in.raw16> <out.bin> <rate> <ch> | "
            "decode <in.bin> <out.raw16> <rate> <ch> <depth>\n", argv[0]);
    return 1;
}
