// MP3 Layer III Huffman spectrum decode in C++ (host-side, ctypes).
// Behavioural parity: the pure-Python parse_huffman in
// codecs/mp3/bitstream.py (itself validated sample-exact vs libmad,
// thirdparty/libmad-0.15.1b/layer3.c III_huffdecode), which remains the
// fallback.  LUTs are the same flattened prefix tables the Python
// HuffLut builds (registered once per process like the AAC tables).

#include <cstdint>
#include <cstring>

namespace {

struct Lut {
    int maxlen = 0;
    const uint8_t* lengths = nullptr;   // [1 << maxlen]
    const int32_t* rows = nullptr;      // [1 << maxlen]
    const int8_t* vals = nullptr;       // [nrows * dim]
    int dim = 0;
    int linbits = 0;
};

Lut g_pair[32];     // table id 0..31 (0 unused)
Lut g_quad[2];

struct Bits {
    const uint8_t* data;
    int64_t nbits;
    int64_t pos;
};

inline uint32_t peek(const Bits& b, int n) {
    // zero-padded peek (HuffLut peeks near stream end)
    uint64_t v = 0;
    int64_t first = b.pos >> 3;
    for (int i = 0; i < 6; i++) {
        int64_t idx = first + i;
        v = (v << 8) | (idx * 8 < b.nbits ? b.data[idx] : 0);
    }
    int shift = 48 - (int)(b.pos & 7) - n;
    return (uint32_t)((v >> shift) & ((1u << n) - 1));
}

inline int read_bits(Bits& b, int n, uint32_t* out) {
    if (b.pos + n > b.nbits) return -1;
    *out = peek(b, n);
    b.pos += n;
    return 0;
}

}  // namespace

extern "C" {

void mp3_set_pair_table(int tid, int maxlen, const uint8_t* lengths,
                        const int32_t* rows, const int8_t* vals,
                        int linbits) {
    if (tid < 0 || tid >= 32) return;
    g_pair[tid] = {maxlen, lengths, rows, vals, 2, linbits};
}

void mp3_set_quad_table(int which, int maxlen, const uint8_t* lengths,
                        const int32_t* rows, const int8_t* vals) {
    if (which < 0 || which >= 2) return;
    g_quad[which] = {maxlen, lengths, rows, vals, 4, 0};
}

// Decode big_values pairs + count1 quads into out[576].
// Returns 0 ok, -1 bitstream exhausted mid-field (mirrors EOFError).
// *bit_pos is set to end_bit on success (the Python path does the
// same); overread inside the last quad zeroes it, like libmad.
int mp3_parse_huffman(const uint8_t* data, int64_t nbits,
                      int64_t* bit_pos, int64_t end_bit, int big,
                      int region1, int region2, int t0, int t1, int t2,
                      int count1table, int32_t* out) {
    Bits b{data, nbits, *bit_pos};
    memset(out, 0, sizeof(int32_t) * 576);
    int i = 0;
    while (i < big) {
        int tid = i < region1 ? t0 : (i < region2 ? t1 : t2);
        const Lut& lut = g_pair[tid >= 0 && tid < 32 ? tid : 0];
        if (lut.lengths == nullptr) {   // table 0: all zeros
            i += 2;
            continue;
        }
        if (b.pos >= end_bit) break;
        uint32_t w = peek(b, lut.maxlen);
        int length = lut.lengths[w];
        if (length == 0) return -2;     // invalid code (ValueError)
        b.pos += length;                // skip may pass the end, like
                                        // BitReader.skip; reads error
        const int8_t* xy = &lut.vals[lut.rows[w] * 2];
        int32_t x = xy[0], y = xy[1];
        uint32_t bit;
        if (x == 15 && lut.linbits) {
            if (read_bits(b, lut.linbits, &bit)) return -1;
            x += (int32_t)bit;
        }
        if (x) {
            if (read_bits(b, 1, &bit)) return -1;
            if (bit) x = -x;
        }
        if (y == 15 && lut.linbits) {
            if (read_bits(b, lut.linbits, &bit)) return -1;
            y += (int32_t)bit;
        }
        if (y) {
            if (read_bits(b, 1, &bit)) return -1;
            if (bit) y = -y;
        }
        out[i] = x;
        out[i + 1] = y;
        i += 2;
    }
    const Lut& q = g_quad[count1table ? 1 : 0];
    while (b.pos < end_bit && i <= 572) {
        uint32_t w = peek(b, q.maxlen);
        int length = q.lengths[w];
        if (length == 0) return -2;
        b.pos += length;
        const int8_t* v4 = &q.vals[q.rows[w] * 4];
        for (int j = 0; j < 4; j++) {
            int32_t v = v4[j];
            if (v) {
                uint32_t bit;
                if (read_bits(b, 1, &bit)) return -1;
                if (bit) v = -v;
            }
            if (i < 576) out[i] = v;
            i++;
        }
    }
    if (b.pos > end_bit) {
        int lo = i - 4 > 0 ? i - 4 : 0;
        for (int j = lo; j < i && j < 576; j++) out[j] = 0;
    }
    *bit_pos = end_bit;
    return 0;
}

}  // extern "C"
