// Fast host-side AAC-LC unpacker (C ABI, loaded via ctypes).
//
// Mirrors ohpipeline_tpu/codecs/aac/bitstream.py (the correctness
// reference, validated against fdk-aac) for the hot path: ADTS framing +
// raw_data_block entropy decode into dense arrays.  Huffman LUTs are
// injected at init from the canonical ISO table data (tables.npz) — this
// file contains no codec tables.
//
// Output layout per group (R = F * C rows):
//   ics     [R][4]    int32: window_seq, window_shape, max_sfb, grouping
//   cb      [R][120]  int8 : codebook per (group, sfb), groups-major
//   sf      [R][120]  int32: scalefactor per (group, sfb)
//   quant   [R][1024] int32: transmission-order quantized coefficients
//   msmask  [F][120]  uint8: M/S flag per (group, sfb); 0xFF col0 = no CPE
//   tnsn    [R][8]    int32: TNS filter count per window
//   tnsp    [R][8*3*3] int32: per filter (length, order, direction)
//   tnsc    [R][8*3*12] float: per filter lattice coefficients
//
// Build: g++ -O3 -shared -fPIC aac_unpack.cc -o libaacunpack.so

#include <cstdint>
#include <cstring>
#include <cmath>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t nbytes;
    size_t pos = 0;
    bool ok = true;

    inline uint32_t read(int nbits) {
        if (nbits == 0) return 0;
        size_t end = pos + nbits;
        if (end > nbytes * 8) { ok = false; return 0; }
        size_t first = pos >> 3;
        int got = -(int)(pos & 7);
        uint64_t acc = 0;
        size_t i = first;
        while (got < nbits) { acc = (acc << 8) | data[i++]; got += 8; }
        acc >>= (got - nbits);
        pos = end;
        return (uint32_t)(acc & ((1ULL << nbits) - 1));
    }

    inline uint32_t peek(int nbits) {
        size_t save = pos;
        bool saveok = ok;
        size_t avail = nbytes * 8 > pos ? nbytes * 8 - pos : 0;
        uint32_t v;
        if ((int)avail >= nbits) {
            v = read(nbits);
        } else {
            v = read((int)avail) << (nbits - (int)avail);
        }
        pos = save;
        ok = saveok;
        return v;
    }

    inline void skip(int nbits) { pos += nbits; }
    inline void align_byte() { pos = (pos + 7) & ~(size_t)7; }
};

// ---- injected Huffman LUTs -------------------------------------------
struct Lut {
    int maxlen = 0;
    const uint8_t* lengths = nullptr;   // [1<<maxlen]
    const int32_t* rows = nullptr;      // [1<<maxlen] -> row index
    const int8_t* vals = nullptr;       // [n][dim]
    int dim = 0;
    int is_unsigned = 0;
};
Lut g_spec[12];          // 1..11
Lut g_scl;               // dim 1, vals int8? use int16 via rows->vals16
const int16_t* g_scl_vals = nullptr;

// 8 groups x 15-sfb stride + 1 mask sentinel byte = 121; round to 128 so
// the M/S mask row (offset by 1) can never touch the next row.
const int SFB_SLOTS = 128;
int16_t g_sfb_long[13][52];
int16_t g_sfb_short[13][16];
int g_nsfb[13][2];

}  // namespace

extern "C" {

void aac_set_tables(int cb, int maxlen, const uint8_t* lengths,
                    const int32_t* rows, const int8_t* vals, int dim,
                    int is_unsigned) {
    Lut& l = (cb == 0) ? g_scl : g_spec[cb];
    l.maxlen = maxlen;
    l.lengths = lengths;
    l.rows = rows;
    l.vals = vals;
    l.dim = dim;
    l.is_unsigned = is_unsigned;
}

void aac_set_scl_vals(const int16_t* vals) { g_scl_vals = vals; }

void aac_set_sfb(int rate_index, const int16_t* lng, int nl,
                 const int16_t* shrt, int ns) {
    memcpy(g_sfb_long[rate_index], lng, sizeof(int16_t) * (nl + 1));
    memcpy(g_sfb_short[rate_index], shrt, sizeof(int16_t) * (ns + 1));
    g_nsfb[rate_index][0] = nl;
    g_nsfb[rate_index][1] = ns;
}

// TNS synthesis filtering over dequantized spectra (all-pole lattice ->
// direct form), applied per flagged row.  Mirrors synthesis.py
// _apply_tns_arrays.
void aac_tns_group(double* specs, int nrows, const int32_t* ics,
                   const int32_t* tnsn, const int32_t* tnsp,
                   const float* tnsc, int rate_index) {
    for (int r = 0; r < nrows; r++) {
        const int32_t* tn = &tnsn[r * 8];
        bool any = false;
        for (int w = 0; w < 8; w++) any |= tn[w] != 0;
        if (!any) continue;
        bool shortw = ics[r * 4] == 2;
        const int16_t* offsets = shortw ? g_sfb_short[rate_index]
                                        : g_sfb_long[rate_index];
        int nbands = g_nsfb[rate_index][shortw ? 1 : 0];
        int nwin = shortw ? 8 : 1;
        double* spec = &specs[(int64_t)r * 1024];
        for (int w = 0; w < nwin; w++) {
            int base = shortw ? w * 128 : 0;
            int bottom = nbands;
            for (int f = 0; f < tn[w] && f < 3; f++) {
                const int32_t* p = &tnsp[(r * 24 + w * 3 + f) * 3];
                int length = p[0], order = p[1], dir = p[2];
                int top = bottom;
                bottom = top - length;
                if (bottom < 0) bottom = 0;
                if (order == 0) continue;
                int start = offsets[bottom < nbands ? bottom : nbands];
                int end = offsets[top < nbands ? top : nbands];
                int lim = shortw ? 128 : 1024;
                if (end > lim) end = lim;
                if (end <= start) continue;
                // lattice -> direct form
                double a[16] = {0};
                int alen = 0;
                const float* k = &tnsc[(int64_t)(r * 24 + w * 3 + f) * 12];
                for (int i = 0; i < order && i < 12; i++) {
                    double tmp[16];
                    for (int j = 0; j < alen; j++)
                        tmp[j] = a[j] + k[i] * a[alen - 1 - j];
                    for (int j = 0; j < alen; j++) a[j] = tmp[j];
                    a[alen++] = k[i];
                }
                double state[16] = {0};
                int n = end - start;
                for (int ii = 0; ii < n; ii++) {
                    int idx = dir ? (end - 1 - ii) : (start + ii);
                    double y = spec[base + idx];
                    for (int j = 0; j < alen; j++) y -= a[j] * state[j];
                    for (int j = alen - 1; j > 0; j--)
                        state[j] = state[j - 1];
                    state[0] = y;
                    spec[base + idx] = y;
                }
            }
        }
    }
}

}  // extern "C"

namespace {

inline int decode_scl(BitReader& br) {
    uint32_t w = br.peek(g_scl.maxlen);
    uint8_t len = g_scl.lengths[w];
    if (!len) { br.ok = false; return 0; }
    br.skip(len);
    return g_scl_vals[g_scl.rows[w]];
}

struct Ics {
    int seq = 0, shape = 0, max_sfb = 0, grouping = 0;
    int ngroups = 1;
    int group_wins[8];
    bool short_win() const { return seq == 2; }
};

bool parse_ics_info(BitReader& br, Ics& ics) {
    br.read(1);
    ics.seq = br.read(2);
    ics.shape = br.read(1);
    if (ics.short_win()) {
        ics.max_sfb = br.read(4);
        ics.grouping = br.read(7);
        ics.ngroups = 1;
        int counts[8] = {1, 0, 0, 0, 0, 0, 0, 0};
        int gi = 0;
        for (int b = 6; b >= 0; b--) {
            if ((ics.grouping >> b) & 1) counts[gi]++;
            else counts[++gi] = 1;
        }
        ics.ngroups = gi + 1;
        for (int i = 0; i <= gi; i++) ics.group_wins[i] = counts[i];
    } else {
        ics.max_sfb = br.read(6);
        if (br.read(1)) return false;   // MAIN prediction unsupported
        ics.ngroups = 1;
        ics.group_wins[0] = 1;
    }
    return true;
}

struct ChOut {
    int32_t* ics;
    int8_t* cb;
    int32_t* sf;
    int32_t* quant;
    int32_t* tnsn;
    int32_t* tnsp;
    float* tnsc;
};

bool parse_ics_stream(BitReader& br, int rate_index, bool common,
                      const Ics* shared, ChOut& out) {
    int global_gain = br.read(8);
    Ics ics;
    if (common && shared) ics = *shared;
    else if (!parse_ics_info(br, ics)) return false;
    // A crafted/corrupt frame can code max_sfb beyond the SFB table for
    // this rate; offsets[k+1] would then read garbage widths and the
    // spectral write below would index out of [0,1024).  Reject it.
    if (ics.max_sfb > g_nsfb[rate_index][ics.short_win() ? 1 : 0])
        return false;
    out.ics[0] = ics.seq;
    out.ics[1] = ics.shape;
    out.ics[2] = ics.max_sfb;
    out.ics[3] = ics.grouping;

    int bits = ics.short_win() ? 3 : 5;
    int esc = (1 << bits) - 1;
    memset(out.cb, 0, SFB_SLOTS);
    memset(out.sf, 0, SFB_SLOTS * 4);
    // section data
    for (int g = 0; g < ics.ngroups; g++) {
        int k = 0;
        while (k < ics.max_sfb) {
            int sect_cb = br.read(4);
            int len = 0, incr;
            do { incr = br.read(bits); len += incr; } while (incr == esc);
            if (k + len > ics.max_sfb || !br.ok) return false;
            for (int i = 0; i < len; i++)
                out.cb[g * 15 + k + i] = (int8_t)sect_cb;
            k += len;
        }
    }
    // scalefactors
    int sf_val = global_gain, is_pos = 0, noise = global_gain - 90;
    bool noise_seen = false;
    for (int g = 0; g < ics.ngroups; g++) {
        for (int k = 0; k < ics.max_sfb; k++) {
            int c = out.cb[g * 15 + k];
            int32_t* slot = &out.sf[g * 15 + k];
            if (c == 0) *slot = 0;
            else if (c == 14 || c == 15) {
                is_pos += decode_scl(br);
                *slot = is_pos;
            } else if (c == 13) {
                if (!noise_seen) { noise_seen = true; noise += (int)br.read(9) - 256; }
                else noise += decode_scl(br);
                *slot = noise;
            } else {
                sf_val += decode_scl(br);
                if (sf_val < 0 || sf_val > 255) return false;
                *slot = sf_val;
            }
        }
    }
    if (!br.ok) return false;
    // pulse
    if (br.read(1)) return false;      // pulse unsupported (rare)
    // tns
    memset(out.tnsn, 0, 8 * 4);
    if (br.read(1)) {
        int nwin = ics.short_win() ? 8 : 1;
        for (int w = 0; w < nwin; w++) {
            int n_filt = br.read(ics.short_win() ? 1 : 2);
            out.tnsn[w] = n_filt;
            int coef_res = 0;
            if (n_filt) coef_res = br.read(1);
            for (int f = 0; f < n_filt && f < 3; f++) {
                int length = br.read(ics.short_win() ? 4 : 6);
                int order = br.read(ics.short_win() ? 3 : 5);
                int dir = 0;
                int32_t* p = &out.tnsp[(w * 3 + f) * 3];
                float* cf = &out.tnsc[(w * 3 + f) * 12];
                if (order) {
                    dir = br.read(1);
                    int compress = br.read(1);
                    int cbits = (coef_res + 3) - compress;
                    double iqfac = (((1 << (coef_res + 2)) - 0.5))
                        / (M_PI / 2.0);
                    double iqfac_m = (((1 << (coef_res + 2)) + 0.5))
                        / (M_PI / 2.0);
                    for (int i = 0; i < order && i < 12; i++) {
                        int v = br.read(cbits);
                        int half = 1 << (cbits - 1);
                        if (v >= half) v -= (1 << cbits);
                        cf[i] = (float)sin(v / (v >= 0 ? iqfac : iqfac_m));
                    }
                }
                p[0] = length; p[1] = order; p[2] = dir;
            }
        }
    }
    if (br.read(1)) return false;      // gain control (SSR) unsupported
    // spectral data
    memset(out.quant, 0, 1024 * 4);
    const int16_t* offsets = ics.short_win() ? g_sfb_short[rate_index]
                                             : g_sfb_long[rate_index];
    int pos = 0;
    for (int g = 0; g < ics.ngroups; g++) {
        int wins = ics.group_wins[g];
        int group_start = pos;
        for (int k = 0; k < ics.max_sfb; k++) {
            int c = out.cb[g * 15 + k];
            int width = offsets[k + 1] - offsets[k];
            int n = width * wins;
            if (n < 0 || pos + n > 1024) return false;  // defensive bound
            if (c == 0 || c == 12 || c >= 13) { pos += n; continue; }
            const Lut& lut = g_spec[c];
            for (int i = 0; i < n; i += lut.dim) {
                uint32_t w = br.peek(lut.maxlen);
                uint8_t len = lut.lengths[w];
                if (!len) return false;
                br.skip(len);
                const int8_t* v = &lut.vals[g_spec[c].rows[w] * lut.dim];
                int32_t vv[4];
                for (int d = 0; d < lut.dim; d++) {
                    vv[d] = v[d];
                    if (lut.is_unsigned && vv[d] != 0 && br.read(1))
                        vv[d] = -vv[d];
                }
                if (c == 11) {
                    for (int d = 0; d < lut.dim; d++) {
                        if (vv[d] == 16 || vv[d] == -16) {
                            int e = 4;
                            while (br.read(1)) e++;
                            int mag = (1 << e) | br.read(e);
                            vv[d] = vv[d] > 0 ? mag : -mag;
                        }
                    }
                }
                for (int d = 0; d < lut.dim && i + d < n; d++)
                    out.quant[pos + i + d] = vv[d];
                if (!br.ok) return false;
            }
            pos += n;
        }
        pos = group_start + (ics.short_win() ? 128 * wins : 1024);
    }
    return br.ok;
}

}  // namespace

extern "C" {

// Parse up to max_frames ADTS frames.  Returns frames parsed; *bit_pos
// advances.  channels = expected channel count (frames with other counts
// are skipped).  Arrays sized for max_frames (per the layout above).
int aac_parse_group(const uint8_t* buf, int64_t nbytes, int64_t* byte_pos,
                    int max_frames, int channels,
                    int32_t* ics, int8_t* cb, int32_t* sf, int32_t* quant,
                    uint8_t* msmask, int32_t* tnsn, int32_t* tnsp,
                    float* tnsc, int32_t* rate_index_out) {
    int64_t pos = *byte_pos;
    int nframes = 0;
    while (nframes < max_frames && pos + 7 <= nbytes) {
        if (buf[pos] != 0xFF || (buf[pos + 1] & 0xF6) != 0xF0) {
            pos++;                      // resync scan
            continue;
        }
        int protection_absent = buf[pos + 1] & 1;
        int rate_index = (buf[pos + 2] >> 2) & 0xF;
        int frame_bytes = ((buf[pos + 3] & 0x03) << 11)
            | (buf[pos + 4] << 3) | (buf[pos + 5] >> 5);
        int header_bytes = protection_absent ? 7 : 9;
        if (rate_index >= 13 || frame_bytes < header_bytes) { pos++; continue; }
        if (pos + frame_bytes > nbytes) break;
        *rate_index_out = rate_index;
        BitReader br{buf + pos + header_bytes,
                     (size_t)(frame_bytes - header_bytes)};
        int f = nframes;
        uint8_t* ms = &msmask[f * SFB_SLOTS];
        memset(ms, 0, SFB_SLOTS);
        ms[0] = 0xFF;                   // sentinel: no CPE mask
        int ch_done = 0;
        bool bad = false;
        while (!bad) {
            int el = br.read(3);
            if (!br.ok) { bad = true; break; }
            if (el == 7) break;                       // END
            if (el == 0 || el == 3) {                 // SCE / LFE
                br.read(4);
                ChOut out{&ics[(f * channels + ch_done) * 4],
                          &cb[(f * channels + ch_done) * SFB_SLOTS],
                          &sf[(f * channels + ch_done) * SFB_SLOTS],
                          &quant[(int64_t)(f * channels + ch_done) * 1024],
                          &tnsn[(f * channels + ch_done) * 8],
                          &tnsp[(f * channels + ch_done) * 72],
                          &tnsc[(int64_t)(f * channels + ch_done) * 288]};
                if (ch_done >= channels
                    || !parse_ics_stream(br, rate_index, false, nullptr, out))
                    bad = true;
                else ch_done++;
            } else if (el == 1) {                     // CPE
                br.read(4);
                int common = br.read(1);
                Ics shared;
                if (common) {
                    if (!parse_ics_info(br, shared)
                        || shared.max_sfb >
                               g_nsfb[rate_index][shared.short_win() ? 1 : 0]) {
                        bad = true;
                        break;
                    }
                    int ms_present = br.read(2);
                    if (ms_present == 1) {
                        ms[0] = 1;
                        for (int g = 0; g < shared.ngroups; g++)
                            for (int k = 0; k < shared.max_sfb; k++)
                                ms[1 + g * 15 + k] = (uint8_t)br.read(1);
                    } else if (ms_present == 2) {
                        ms[0] = 2;
                    } else {
                        ms[0] = 0;
                    }
                } else {
                    ms[0] = 0;
                }
                for (int c = 0; c < 2; c++) {
                    if (ch_done >= channels) { bad = true; break; }
                    ChOut out{&ics[(f * channels + ch_done) * 4],
                              &cb[(f * channels + ch_done) * SFB_SLOTS],
                              &sf[(f * channels + ch_done) * SFB_SLOTS],
                              &quant[(int64_t)(f * channels + ch_done) * 1024],
                              &tnsn[(f * channels + ch_done) * 8],
                              &tnsp[(f * channels + ch_done) * 72],
                              &tnsc[(int64_t)(f * channels + ch_done) * 288]};
                    if (!parse_ics_stream(br, rate_index, common != 0,
                                          common ? &shared : nullptr, out)) {
                        bad = true;
                        break;
                    }
                    ch_done++;
                }
            } else if (el == 4) {                     // DSE
                br.read(4);
                int align = br.read(1);
                int cnt = br.read(8);
                if (cnt == 255) cnt += br.read(8);
                if (align) br.align_byte();
                for (int i = 0; i < cnt; i++) br.read(8);
            } else if (el == 6) {                     // FIL
                int cnt = br.read(4);
                if (cnt == 15) cnt += br.read(8) - 1;
                for (int i = 0; i < cnt; i++) br.read(8);
            } else {
                bad = true;                           // CCE/PCE unsupported
            }
        }
        pos += frame_bytes;
        if (!bad && ch_done == channels) nframes++;
        // bad frames are skipped (counted as lost), mirroring the Python
    }
    *byte_pos = pos;
    return nframes;
}

}  // extern "C"
