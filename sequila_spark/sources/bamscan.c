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

/* ---- CRAM feature-walk reconstruction (spec section 10.5) ----
 *
 * One call per slice: replays the per-record feature walk for every
 * record against bulk pre-decoded data-series arrays (Python splits the
 * external streams; cramcodec._reconstruct remains the pinned semantic
 * reference).  Writes all sequences into one contiguous buffer
 * (seq_off = exclusive prefix sum of read lengths), renders CIGAR text
 * directly, and tracks QS-stream consumption so the caller can slice
 * quality strings afterwards.
 *
 * Unsupported feature codes or any boundary condition the Python walk
 * handles with bytearray-resize semantics (reference/sequence overrun)
 * abort the whole slice with a negative code: the caller re-runs the
 * slice through the Python walk, so the C path never has to replicate
 * edge-case semantics — it only has to detect them.
 *
 * Return: 0 ok; -1 unsupported feature code (*err_info = code);
 * -2 a series ran dry (*err_info = series tag); -3 reference/sequence
 * bounds overrun; -4 cigar buffer overflow. */

typedef struct {
    const uint8_t *ref; int64_t ref_len;
    const uint8_t *subtab;            /* 256*4: (refbase, code) -> base */
    const int64_t *fn, *fp, *dl, *rs, *pd, *hc;
    int64_t fn_n, fp_n, dl_n, rs_n, pd_n, hc_n;
    const uint8_t *fc, *bs, *ba;
    int64_t fc_n, bs_n, ba_n;
    const uint8_t *sc_b; const int64_t *sc_o; int64_t sc_n;
    const uint8_t *in_b; const int64_t *in_o; int64_t in_n;
    const uint8_t *bb_b; const int64_t *bb_o; int64_t bb_n;
    int64_t qs_total;
} CramSeries;

/* append "<count><op>" to the cigar text buffer */
static inline int cig_emit(uint8_t *out, int64_t cap, int64_t *pos,
                           int64_t count, char op) {
    char tmp[24];
    int k = 0;
    if (count <= 0) return 0; /* caller guards; belt and braces */
    while (count > 0) { tmp[k++] = (char)('0' + count % 10); count /= 10; }
    if (*pos + k + 1 > cap) return -1;
    while (k > 0) out[(*pos)++] = (uint8_t)tmp[--k];
    out[(*pos)++] = (uint8_t)op;
    return 0;
}

#define CW_NEED(idx, n_have, tag) \
    do { if ((idx) >= (n_have)) { *err_info = (tag); return -2; } } while (0)

int64_t cram_walk(const CramSeries *S, int64_t n_rec, const int64_t *rl,
                  const int64_t *ap, const uint8_t *mapped,
                  const int64_t *cf, const int64_t *seq_off,
                  uint8_t *seq_out, uint8_t *cig_out, int64_t cig_cap,
                  int64_t *cig_off, int64_t *reflen_out, int64_t *nm_out,
                  int64_t *qual_off, int64_t *err_info) {
    int64_t ifn = 0, ifp = 0, idl = 0, irs = 0, ipd = 0, ihc = 0;
    int64_t ifc = 0, ibs = 0, iba = 0, isc = 0, iin = 0, ibb = 0;
    int64_t qs_pos = 0, cpos = 0;
    const uint8_t *ref = S->ref;
    const int64_t ref_len = S->ref_len;
    cig_off[0] = 0;
    for (int64_t r = 0; r < n_rec; r++) {
        const int64_t L = rl[r];
        uint8_t *seq = seq_out + seq_off[r];
        int64_t reflen = 0, nm = 0;
        if (!mapped[r]) {
            /* unmapped: sequence comes verbatim from the BA series */
            CW_NEED(iba + L - 1, S->ba_n, 'A');
            memcpy(seq, S->ba + iba, (size_t)L);
            iba += L;
            if (cpos + 1 > cig_cap) return -4;
            cig_out[cpos++] = '*';
        } else {
            int64_t fn;
            CW_NEED(ifn, S->fn_n, 'F');
            fn = S->fn[ifn++];
            if (fn == 0 && !(cf[r] & 8) && ap[r] > 0 && L > 0 &&
                ap[r] - 1 + L <= ref_len) {
                /* featureless full-match read */
                memcpy(seq, ref + ap[r] - 1, (size_t)L);
                if (cig_emit(cig_out, cig_cap, &cpos, L, 'M')) return -4;
                reflen = L;
            } else {
                int64_t fpos = 0, rpos = 0, ref_off = ap[r] - 1;
                char last = 0;
                if (ref_off < 0) return -3; /* Python's negative-slice
                    wraparound semantics live in the fallback */
                int64_t last_n = 0;   /* pending (count, op) not yet written */
                for (int64_t f = 0; f < fn; f++) {
                    uint8_t code;
                    int64_t gap;
                    CW_NEED(ifc, S->fc_n, 'C');
                    code = S->fc[ifc++];
                    CW_NEED(ifp, S->fp_n, 'P');
                    fpos += S->fp[ifp++];
                    gap = (fpos - 1) - rpos;
                    if (gap > 0) {
                        if (ref_off + gap > ref_len || rpos + gap > L)
                            return -3;
                        memcpy(seq + rpos, ref + ref_off, (size_t)gap);
                        if (last == 'M') last_n += gap;
                        else {
                            if (last && cig_emit(cig_out, cig_cap, &cpos,
                                                 last_n, last)) return -4;
                            last = 'M'; last_n = gap;
                        }
                        reflen += gap;
                        rpos += gap;
                        ref_off += gap;
                    }
                    switch (code) {
                    case 'X': {
                        uint8_t val, refb, sub;
                        CW_NEED(ibs, S->bs_n, 'B');
                        val = S->bs[ibs++];
                        refb = ref_off < ref_len ? ref[ref_off] : (uint8_t)'N';
                        sub = val < 4 ? S->subtab[(int64_t)refb * 4 + val]
                                      : (uint8_t)'N';
                        if (rpos >= L) return -3;
                        seq[rpos] = sub;
                        if (last == 'M') last_n += 1;
                        else {
                            if (last && cig_emit(cig_out, cig_cap, &cpos,
                                                 last_n, last)) return -4;
                            last = 'M'; last_n = 1;
                        }
                        nm++; reflen++; rpos++; ref_off++;
                        break;
                    }
                    case 'B': {   /* one explicit base + quality (M-type) */
                        uint8_t val;
                        CW_NEED(iba, S->ba_n, 'A');
                        val = S->ba[iba++];
                        if (qs_pos + 1 > S->qs_total) { *err_info = 'Q'; return -2; }
                        qs_pos++;
                        if (ref_off < ref_len) nm += (val != ref[ref_off]);
                        else nm += 1;
                        if (rpos >= L) return -3;
                        seq[rpos] = val;
                        if (last == 'M') last_n += 1;
                        else {
                            if (last && cig_emit(cig_out, cig_cap, &cpos,
                                                 last_n, last)) return -4;
                            last = 'M'; last_n = 1;
                        }
                        reflen++; rpos++; ref_off++;
                        break;
                    }
                    case 'b': {   /* literal M-type base run */
                        int64_t n, ov, k;
                        const uint8_t *v;
                        CW_NEED(ibb, S->bb_n, 'b');
                        n = S->bb_o[ibb + 1] - S->bb_o[ibb];
                        v = S->bb_b + S->bb_o[ibb];
                        ibb++;
                        if (n > 0) {
                            ov = ref_len - ref_off;
                            if (ov < 0) ov = 0;
                            if (ov > n) ov = n;
                            for (k = 0; k < ov; k++)
                                nm += (v[k] != ref[ref_off + k]);
                            nm += n - ov;
                            if (rpos + n > L) return -3;
                            memcpy(seq + rpos, v, (size_t)n);
                            if (last == 'M') last_n += n;
                            else {
                                if (last && cig_emit(cig_out, cig_cap, &cpos,
                                                     last_n, last)) return -4;
                                last = 'M'; last_n = n;
                            }
                            reflen += n; rpos += n; ref_off += n;
                        }
                        break;
                    }
                    case 'I': {   /* insertion bytes */
                        int64_t n;
                        CW_NEED(iin, S->in_n, 'I');
                        n = S->in_o[iin + 1] - S->in_o[iin];
                        if (n > 0) {
                            if (rpos + n > L) return -3;
                            memcpy(seq + rpos, S->in_b + S->in_o[iin],
                                   (size_t)n);
                            if (last == 'I') last_n += n;
                            else {
                                if (last && cig_emit(cig_out, cig_cap, &cpos,
                                                     last_n, last)) return -4;
                                last = 'I'; last_n = n;
                            }
                            nm += n; rpos += n;
                        }
                        iin++;
                        break;
                    }
                    case 'S': {   /* soft clip */
                        int64_t n;
                        CW_NEED(isc, S->sc_n, 'S');
                        n = S->sc_o[isc + 1] - S->sc_o[isc];
                        if (n > 0) {
                            if (rpos + n > L) return -3;
                            memcpy(seq + rpos, S->sc_b + S->sc_o[isc],
                                   (size_t)n);
                            if (last == 'S') last_n += n;
                            else {
                                if (last && cig_emit(cig_out, cig_cap, &cpos,
                                                     last_n, last)) return -4;
                                last = 'S'; last_n = n;
                            }
                            rpos += n;
                        }
                        isc++;
                        break;
                    }
                    case 'i': {   /* single inserted base */
                        CW_NEED(iba, S->ba_n, 'A');
                        if (rpos >= L) return -3;
                        seq[rpos] = S->ba[iba++];
                        if (last == 'I') last_n += 1;
                        else {
                            if (last && cig_emit(cig_out, cig_cap, &cpos,
                                                 last_n, last)) return -4;
                            last = 'I'; last_n = 1;
                        }
                        nm++; rpos++;
                        break;
                    }
                    case 'D': {
                        int64_t v;
                        CW_NEED(idl, S->dl_n, 'D');
                        v = S->dl[idl++];
                        if (v > 0) {
                            if (last == 'D') last_n += v;
                            else {
                                if (last && cig_emit(cig_out, cig_cap, &cpos,
                                                     last_n, last)) return -4;
                                last = 'D'; last_n = v;
                            }
                            reflen += v;
                        }
                        nm += v; ref_off += v;
                        break;
                    }
                    case 'N': {
                        int64_t v;
                        CW_NEED(irs, S->rs_n, 'N');
                        v = S->rs[irs++];
                        if (v > 0) {
                            if (last == 'N') last_n += v;
                            else {
                                if (last && cig_emit(cig_out, cig_cap, &cpos,
                                                     last_n, last)) return -4;
                                last = 'N'; last_n = v;
                            }
                            reflen += v;
                        }
                        ref_off += v;
                        break;
                    }
                    case 'P': {
                        int64_t v;
                        CW_NEED(ipd, S->pd_n, 'p');
                        v = S->pd[ipd++];
                        if (v > 0) {
                            if (last == 'P') last_n += v;
                            else {
                                if (last && cig_emit(cig_out, cig_cap, &cpos,
                                                     last_n, last)) return -4;
                                last = 'P'; last_n = v;
                            }
                        }
                        break;
                    }
                    case 'H': {
                        int64_t v;
                        CW_NEED(ihc, S->hc_n, 'h');
                        v = S->hc[ihc++];
                        if (v > 0) {
                            if (last == 'H') last_n += v;
                            else {
                                if (last && cig_emit(cig_out, cig_cap, &cpos,
                                                     last_n, last)) return -4;
                                last = 'H'; last_n = v;
                            }
                        }
                        break;
                    }
                    case 'Q':   /* per-base quality: consumes one QS byte */
                        if (qs_pos + 1 > S->qs_total) { *err_info = 'Q'; return -2; }
                        qs_pos++;
                        break;
                    default:
                        *err_info = code;
                        return -1;
                    }
                }
                {
                    int64_t tail = L - rpos;
                    if (tail > 0) {
                        if (ref_off + tail > ref_len) return -3;
                        memcpy(seq + rpos, ref + ref_off, (size_t)tail);
                        if (last == 'M') last_n += tail;
                        else {
                            if (last && cig_emit(cig_out, cig_cap, &cpos,
                                                 last_n, last)) return -4;
                            last = 'M'; last_n = tail;
                        }
                        reflen += tail;
                        ref_off += tail;
                    }
                    if (last) {
                        if (cig_emit(cig_out, cig_cap, &cpos, last_n, last))
                            return -4;
                    } else {
                        if (cpos + 1 > cig_cap) return -4;
                        cig_out[cpos++] = '*';
                    }
                }
                if (cf[r] & 8) memset(seq, 'N', (size_t)L);
            }
        }
        cig_off[r + 1] = cpos;
        reflen_out[r] = reflen;
        nm_out[r] = nm;
        if (cf[r] & 1) {
            if (qs_pos + L > S->qs_total) { *err_info = 'Q'; return -2; }
            qual_off[r] = qs_pos;
            qs_pos += L;
        } else {
            qual_off[r] = -1;
        }
    }
    qual_off[n_rec] = qs_pos;
    return 0;
}

/* ---- PNG scanline unfilter (RFC 2083 section 6) ----
 * In-place: data = h*stride bytes (filter-type bytes already stripped),
 * filters = h filter-type bytes, bpp = bytes per pixel.  Returns 0, or
 * -1 on an unknown filter type (caller raises).  The NumPy/Python
 * fallback in sources/image.py stays the pinned semantic reference. */
int64_t png_unfilter(uint8_t *data, const uint8_t *filters, int64_t h,
                     int64_t stride, int64_t bpp) {
    for (int64_t y = 0; y < h; y++) {
        uint8_t *cur = data + y * stride;
        const uint8_t *up = y ? data + (y - 1) * stride : 0;
        int64_t i;
        switch (filters[y]) {
        case 0:
            break;
        case 1: /* Sub */
            for (i = bpp; i < stride; i++) cur[i] += cur[i - bpp];
            break;
        case 2: /* Up */
            if (up)
                for (i = 0; i < stride; i++) cur[i] += up[i];
            break;
        case 3: /* Average */
            for (i = 0; i < stride; i++) {
                int a = i >= bpp ? cur[i - bpp] : 0;
                int b = up ? up[i] : 0;
                cur[i] = (uint8_t)(cur[i] + ((a + b) >> 1));
            }
            break;
        case 4: /* Paeth */
            for (i = 0; i < stride; i++) {
                int a = i >= bpp ? cur[i - bpp] : 0;
                int b = up ? up[i] : 0;
                int c = (up && i >= bpp) ? up[i - bpp] : 0;
                int p = a + b - c;
                int pa = p - a; if (pa < 0) pa = -pa;
                int pb = p - b; if (pb < 0) pb = -pb;
                int pc = p - c; if (pc < 0) pc = -pc;
                int pr = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                cur[i] = (uint8_t)(cur[i] + pr);
            }
            break;
        default:
            return -1;
        }
    }
    return 0;
}

/* rANS 4x8 decode-table fill: for each context k, entries
 * [ctx_off[k], ctx_off[k+1]) are (symbol, freq) pairs in PARSE order
 * (later duplicates overwrite, matching htscodecs); the packed per-slot
 * word layout matches cramcodec._rans_pack_table_np:
 * (1<<48 filled-marker) | (freq<<24) | (bias<<12) | symbol.
 * Rows for contexts not listed stay zero (the rans4x8 kernel treats a
 * zero word as an unfilled slot and aborts loudly).
 * Returns -1 when a context's frequencies overflow the 4096 slots. */
int64_t rans_tables_fill(uint64_t *tables, const uint8_t *ctx_ids,
                         const int64_t *ctx_off, int64_t n_ctx,
                         const uint8_t *syms, const int64_t *freqs) {
    for (int64_t k = 0; k < n_ctx; k++) {
        uint64_t *row = tables + (int64_t)ctx_ids[k] * 4096;
        int64_t freq[256];
        int64_t e, c = 0;
        int s;
        /* full-row replace: a duplicate context id in a (corrupt) RLE
         * parse must not leave stale slots from the earlier fill */
        for (e = 0; e < 4096; e++) row[e] = 0;
        for (s = 0; s < 256; s++) freq[s] = 0;
        for (e = ctx_off[k]; e < ctx_off[k + 1]; e++)
            freq[syms[e]] = freqs[e];
        for (s = 0; s < 256; s++) {
            int64_t f = freq[s], slot;
            uint64_t base;
            if (!f) continue;
            if (f < 0 || c + f > 4096) return -1;
            base = ((uint64_t)f << 24) | (uint64_t)s | (1ULL << 48);
            for (slot = 0; slot < f; slot++)
                row[c + slot] = base | ((uint64_t)slot << 12);
            c += f;
        }
    }
    return 0;
}
