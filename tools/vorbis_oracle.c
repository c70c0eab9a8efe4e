/* Golden-oracle CLI over the reference's vendored Tremor (fixed-point
 * Vorbis) + libogg: decode an Ogg Vorbis file to s16le interleaved raw.
 *   vorbis_oracle decode in.ogg out.raw
 * Prints "rate <r> ch <n>" on stderr. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "ivorbisfile.h"

int main(int argc, char **argv) {
    if (argc < 4 || strcmp(argv[1], "decode") != 0) {
        fprintf(stderr, "usage: %s decode in.ogg out.raw\n", argv[0]);
        return 2;
    }
    FILE *in = fopen(argv[2], "rb");
    if (!in) { perror("in"); return 1; }
    OggVorbis_File vf;
    if (ov_open(in, &vf, NULL, 0) < 0) {
        fprintf(stderr, "not a vorbis stream\n");
        return 1;
    }
    vorbis_info *vi = ov_info(&vf, -1);
    fprintf(stderr, "rate %ld ch %d\n", vi->rate, vi->channels);
    FILE *out = fopen(argv[3], "wb");
    if (!out) { perror("out"); return 1; }
    char buf[8192];
    int bs = 0;
    long r;
    while ((r = ov_read(&vf, buf, (int)sizeof buf, &bs)) > 0)
        fwrite(buf, 1, (size_t)r, out);
    ov_clear(&vf);
    fclose(out);
    return 0;
}
