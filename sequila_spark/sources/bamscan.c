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
