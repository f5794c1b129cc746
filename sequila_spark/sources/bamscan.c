/* Tiny decode kernels behind sources/_ckern.py — compiled at first use
 * with the system C compiler (cc -O2 -shared -fPIC), loaded via ctypes.
 * Pure-Python/NumPy fallbacks in bamvec.py implement identical semantics;
 * tests pin the two paths against each other.
 *
 * Everything here is trivial data movement that NumPy cannot express
 * without per-element index materialization:
 *  - bam_scan_offsets: the BAM record-offset chain (off -> off+4+block_size)
 *    is a data-dependent scan, inherently sequential — ~0.6us/record as a
 *    Python loop, ~2ns/record here.
 *  - gather_ragged: per-record variable-length segment gather (qname/
 *    cigar/seq/qual bytes) as one memcpy pass — replaces the
 *    np.repeat + iota + fancy-index construction (3 full passes plus an
 *    int64 index array 8x the payload).
 *
 * BAM wire format is little-endian (hts-specs SAM v1.6 s4.2); the memcpy
 * int32 read below assumes a little-endian host (x86-64/aarch64), which
 * _ckern.py verifies before enabling the kernel.
 */

#include <stdint.h>
#include <string.h>

/* Scan complete BAM records in data[0:total): offs[i] = byte offset of
 * record i's block_size field.  Returns the record count, or -1 on a
 * corrupt block_size (< 32: below the fixed header, or negative — the
 * non-advancing-offset hang case).  *end_off receives the first byte not
 * consumed (start of the carry-over partial record). */
int64_t bam_scan_offsets(const uint8_t *data, int64_t total,
                         int64_t *offs, int64_t max_n, int64_t *end_off) {
    int64_t off = 0, n = 0;
    while (off + 4 <= total && n < max_n) {
        int32_t bs;
        memcpy(&bs, data + off, 4);
        if (bs < 32) {
            *end_off = off;
            return -1;
        }
        int64_t end = off + 4 + (int64_t)bs;
        if (end > total) break;
        offs[n++] = off;
        off = end;
    }
    *end_off = off;
    return n;
}

/* out[cum[i]:cum[i+1]] = data[starts[i] : starts[i]+lens[i]] for all i.
 * cum must be the exclusive prefix sum of lens (caller computes it — the
 * same array feeds the Arrow offsets buffer). */
void gather_ragged(const uint8_t *data, const int64_t *starts,
                   const int64_t *lens, const int64_t *cum, int64_t n,
                   uint8_t *out) {
    for (int64_t i = 0; i < n; i++) {
        memcpy(out + cum[i], data + starts[i], (size_t)lens[i]);
    }
}

/* ---- rANS 4x8 (CRAM 3.0 external method 4, hts-specs CRAMcodecs) ----
 *
 * The 4-lane interleaved decode loops, fed by Python-parsed frequency
 * tables packed one uint64 per slot: (freq << 24) | (bias << 12) | sym
 * (freq needs 13 bits — up to 4096 — so the packed word is 64-bit here;
 * the Python tables pack the same layout into unbounded ints)
 * — the exact layout cramcodec._rans_read_freqs0 builds for the Python
 * loops, so both paths share table semantics.  Renormalization reads are
 * bounds-checked; -1 means input overran (corrupt stream), and the
 * Python caller raises.  out_size == 0 is a valid no-op. */

#define RANS_LOW (1u << 23)

static inline int rans_step(uint32_t *x, const uint64_t *table,
                            const uint8_t *in, int64_t in_len, int64_t *i,
                            uint8_t *sym_out) {
    uint64_t v = table[*x & 0xFFF];
    if (!(v & ((uint64_t)1 << 48))) return -1; /* unfilled slot / missing
        context: corrupt stream — fail loudly like the Python reference
        instead of decoding the zero word into silent garbage */
    *sym_out = (uint8_t)(v & 0xFF);
    *x = (uint32_t)((v >> 24) & 0x1FFF) * (*x >> 12) +
         (uint32_t)((v >> 12) & 0xFFF);
    while (*x < RANS_LOW) {
        if (*i >= in_len) return -1;
        *x = (*x << 8) | in[(*i)++];
    }
    return 0;
}

/* Order-0: lanes rotate over output positions; remainder bytes continue
 * on lane (pos & 3). */
int64_t rans4x8_decode0(const uint8_t *in, int64_t in_len, int64_t i,
                        const uint64_t *packed, const uint32_t *states,
                        uint8_t *out, int64_t out_size) {
    uint32_t x[4] = {states[0], states[1], states[2], states[3]};
    for (int64_t pos = 0; pos < out_size; pos++) {
        if (rans_step(&x[pos & 3], packed, in, in_len, &i, out + pos))
            return -1;
    }
    return i;
}

/* Order-1: 256 context tables (flat 256*4096 uint32, ctx = previous
 * symbol, initial ctx 0); four lanes each decode one quarter segment,
 * the <=3 remainder bytes continue on lane 3. */
int64_t rans4x8_decode1(const uint8_t *in, int64_t in_len, int64_t i,
                        const uint64_t *tables, const uint32_t *states,
                        uint8_t *out, int64_t out_size) {
    uint32_t x[4] = {states[0], states[1], states[2], states[3]};
    uint32_t ctx[4] = {0, 0, 0, 0};
    int64_t quarter = out_size >> 2;
    for (int64_t pos = 0; pos < quarter; pos++) {
        for (int lane = 0; lane < 4; lane++) {
            uint8_t s;
            if (rans_step(&x[lane], tables + ((int64_t)ctx[lane] << 12), in,
                          in_len, &i, &s))
                return -1;
            out[lane * quarter + pos] = s;
            ctx[lane] = s;
        }
    }
    for (int64_t pos = quarter * 4; pos < out_size; pos++) {
        uint8_t s;
        if (rans_step(&x[3], tables + ((int64_t)ctx[3] << 12), in, in_len,
                      &i, &s))
            return -1;
        out[pos] = s;
        ctx[3] = s;
    }
    return i;
}

/* ---- ITF8 varint batch scan (CRAM spec 2.3) ----
 * Decodes every ITF8 value in b[0:len) into out (caller sizes out to
 * len — one value is at least one byte).  Returns the value count, or
 * -1 when the final value is truncated (caller falls back to the
 * per-value Python reader).  Matches ByteReader.itf8 exactly, including
 * the 5-byte negative wrap. */
int64_t itf8_scan(const uint8_t *b, int64_t len, int64_t *out) {
    int64_t i = 0, n = 0;
    while (i < len) {
        uint8_t b0 = b[i];
        int64_t v;
        if (b0 < 0x80) {
            v = b0;
            i += 1;
        } else if (b0 < 0xC0) {
            if (i + 2 > len) return -1;
            v = ((int64_t)(b0 & 0x7F) << 8) | b[i + 1];
            i += 2;
        } else if (b0 < 0xE0) {
            if (i + 3 > len) return -1;
            v = ((int64_t)(b0 & 0x3F) << 16) | ((int64_t)b[i + 1] << 8) |
                b[i + 2];
            i += 3;
        } else if (b0 < 0xF0) {
            if (i + 4 > len) return -1;
            v = ((int64_t)(b0 & 0x1F) << 24) | ((int64_t)b[i + 1] << 16) |
                ((int64_t)b[i + 2] << 8) | b[i + 3];
            i += 4;
        } else {
            if (i + 5 > len) return -1;
            v = ((int64_t)(b0 & 0x0F) << 28) | ((int64_t)b[i + 1] << 20) |
                ((int64_t)b[i + 2] << 12) | ((int64_t)b[i + 3] << 4) |
                (b[i + 4] & 0x0F);
            if (v >= (1LL << 31)) v -= (1LL << 32);
            i += 5;
        }
        out[n++] = v;
    }
    return n;
}

/* ---- rANS Nx16 (CRAM 3.1 external method 5) ----
 * N interleaved 32-bit states, 16-bit single-step renormalization
 * (lower bound 1<<15), variable precision `shift` (freq sum = 1<<shift).
 * Packed table word: (freq << 24) | (bias << 8) | sym — bias = cum[sym],
 * freq <= 4096 (13 bits), bias <= 4095 (12 bits).  Python parses the
 * frequency tables (incl. the RLE/compressed-table framing) and builds
 * the packed arrays; the pure-Python loops remain the pinned fallback. */

#define NX16_LOW (1u << 15)

static inline int nx16_step(uint32_t *x, const uint64_t *table,
                            uint32_t mask, int shift, const uint8_t *in,
                            int64_t in_len, int64_t *i, uint8_t *sym_out) {
    uint32_t slot = *x & mask;
    uint64_t v = table[slot];
    if (!(v & ((uint64_t)1 << 48))) return -1; /* see rans_step */
    *sym_out = (uint8_t)(v & 0xFF);
    *x = (uint32_t)((v >> 24) & 0x1FFF) * (*x >> shift) + slot -
         (uint32_t)((v >> 8) & 0xFFFF);
    if (*x < NX16_LOW) {
        if (*i + 2 > in_len) return -1;
        *x = (*x << 16) | in[*i] | ((uint32_t)in[*i + 1] << 8);
        *i += 2;
    }
    return 0;
}

/* Order-0: states rotate over output positions (pos % n_way). */
int64_t rans_nx16_decode0(const uint8_t *in, int64_t in_len, int64_t i,
                          const uint64_t *packed, int shift,
                          const uint32_t *states, int n_way, uint8_t *out,
                          int64_t out_size) {
    uint32_t x[32];
    uint32_t mask = (1u << shift) - 1;
    for (int j = 0; j < n_way; j++) x[j] = states[j];
    for (int64_t pos = 0; pos < out_size; pos++) {
        if (nx16_step(&x[pos % n_way], packed, mask, shift, in, in_len, &i,
                      out + pos))
            return -1;
    }
    return i;
}

/* Order-1: N contiguous output slices of out_size/n_way, per-state
 * previous-symbol context; the remainder continues on the LAST state's
 * chain.  tables: flat 256 * (1<<shift) packed words. */
int64_t rans_nx16_decode1(const uint8_t *in, int64_t in_len, int64_t i,
                          const uint64_t *tables, int shift,
                          const uint32_t *states, int n_way, uint8_t *out,
                          int64_t out_size) {
    uint32_t x[32];
    uint32_t ctx[32];
    uint32_t mask = (1u << shift) - 1;
    int64_t tot = (int64_t)1 << shift;
    for (int j = 0; j < n_way; j++) {
        x[j] = states[j];
        ctx[j] = 0;
    }
    int64_t slice = out_size / n_way;
    for (int64_t pos = 0; pos < slice; pos++) {
        for (int j = 0; j < n_way; j++) {
            uint8_t s;
            if (nx16_step(&x[j], tables + (int64_t)ctx[j] * tot, mask,
                          shift, in, in_len, &i, &s))
                return -1;
            out[j * slice + pos] = s;
            ctx[j] = s;
        }
    }
    for (int64_t pos = slice * n_way; pos < out_size; pos++) {
        uint8_t s;
        if (nx16_step(&x[n_way - 1], tables + (int64_t)ctx[n_way - 1] * tot,
                      mask, shift, in, in_len, &i, &s))
            return -1;
        out[pos] = s;
        ctx[n_way - 1] = s;
    }
    return i;
}
