/* Compiled hot loops for the media codecs (JPEG entropy scan, FLAC
 * subframe/CRC, GIF/TIFF LZW, PNG unfilter).
 *
 * Mirrors the pure-Python implementations in stages/multimodal.py,
 * stages/flac.py and stages/media_containers.py BYTE-FOR-BYTE: the Python
 * folds remain the single source of semantics (pinned identical by
 * tests/test_cmedia.py on every codec grid).  Any error here returns a
 * negative code and the caller re-runs the Python path, so exception
 * behavior is exactly the pure path's.
 *
 * Built on first use via ctypes (stages/cmedia.py), same content-addressed
 * cache + gcc-less fallback pattern as jelly/_cfold.c.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* ======================== CRC (FLAC polys) ========================== */

int64_t media_crc8(const uint8_t *d, int64_t n) {
    uint32_t crc = 0;
    for (int64_t i = 0; i < n; i++) {
        crc ^= d[i];
        for (int k = 0; k < 8; k++)
            crc = (crc & 0x80) ? ((crc << 1) ^ 0x07) & 0xFF : (crc << 1) & 0xFF;
    }
    return crc;
}

int64_t media_crc16(const uint8_t *d, int64_t n) {
    uint32_t crc = 0;
    for (int64_t i = 0; i < n; i++) {
        crc ^= (uint32_t)d[i] << 8;
        for (int k = 0; k < 8; k++)
            crc = (crc & 0x8000) ? ((crc << 1) ^ 0x8005) & 0xFFFF
                                 : (crc << 1) & 0xFFFF;
    }
    return crc;
}

/* ========================= LZW (GIF variant) ======================== */
/* LSB-first codes, clear/end, root table of 1<<min_code_size, widen when
 * next_code reaches 1<<code_size (cap 12).  Returns 0 or negative. */

int64_t media_lzw_gif(const uint8_t *data, int64_t dlen, int64_t min_code_size,
                      uint8_t *out, int64_t expect) {
    int clear = 1 << min_code_size;
    int end = clear + 1;
    int32_t prefix[4096];
    uint8_t suffix[4096];
    uint8_t stack[4096];
    for (int i = 0; i < 4096; i++) prefix[i] = -1;
    for (int i = 0; i < clear; i++) suffix[i] = (uint8_t)i;
    int next_code = end + 1;
    int code_size = (int)min_code_size + 1;

    uint32_t buf = 0;
    int nbits = 0;
    int64_t pos = 0, n_out = 0;
    int prev = -1;
    while (n_out < expect) {
        while (nbits < code_size) {
            if (pos >= dlen) return -1; /* truncated */
            buf |= (uint32_t)data[pos] << nbits;
            nbits += 8;
            pos++;
        }
        int code = buf & ((1u << code_size) - 1);
        buf >>= code_size;
        nbits -= code_size;

        if (code == clear) {
            next_code = end + 1;
            code_size = (int)min_code_size + 1;
            prev = -1;
            continue;
        }
        if (code == end) break;
        if (code >= next_code + 1 || (code == next_code && prev < 0))
            return -2; /* code out of range */

        int sp = 0;
        int c = code;
        if (code == next_code) {
            c = prev;
            stack[sp++] = 0; /* placeholder, fixed below */
        }
        while (c >= clear) {
            if (sp >= 4096) return -3;
            stack[sp++] = suffix[c];
            c = prefix[c];
        }
        uint8_t first = (uint8_t)c;
        if (sp >= 4096) return -3;
        stack[sp++] = first;
        if (code == next_code) stack[0] = first;
        int64_t ln = sp;
        if (n_out + ln > expect) ln = expect - n_out;
        for (int64_t i = 0; i < ln; i++) out[n_out + i] = stack[sp - 1 - i];
        n_out += ln;

        if (prev >= 0 && next_code < 4096) {
            prefix[next_code] = prev;
            suffix[next_code] = first;
            next_code++;
            if (next_code == (1 << code_size) && code_size < 12) code_size++;
        }
        prev = code;
    }
    if (n_out != expect) return -4; /* ended early */
    return 0;
}

/* ========================= LZW (TIFF variant) ======================= */
/* MSB-first, 9->12-bit, early change at table sizes 510/1022/2046. */

int64_t media_lzw_tiff(const uint8_t *data, int64_t dlen, uint8_t *out,
                       int64_t expect) {
    enum { CLEAR = 256, EOI = 257 };
    int32_t prefix[4096];
    uint8_t suffix[4096];
    uint8_t stack[4096];
    for (int i = 0; i < 4096; i++) prefix[i] = -1;
    for (int i = 0; i < 256; i++) suffix[i] = (uint8_t)i;
    int next_code = 258, bits = 9;
    uint32_t buf = 0;
    int nbits = 0;
    int64_t pos = 0, n_out = 0;
    int prev = -1;
    while (n_out < expect) {
        while (nbits < bits) {
            if (pos >= dlen) return -1;
            buf = (buf << 8) | data[pos];
            nbits += 8;
            pos++;
        }
        int code = (buf >> (nbits - bits)) & ((1u << bits) - 1);
        nbits -= bits;
        buf &= (1u << nbits) - 1;
        if (code == EOI) break;
        if (code == CLEAR) {
            next_code = 258;
            bits = 9;
            prev = -1;
            continue;
        }
        if (code > next_code || (code == next_code && prev < 0)) return -2;
        int sp = 0;
        int c = code;
        if (code == next_code) {
            c = prev;
            stack[sp++] = 0;
        }
        while (c >= 258) {
            if (sp >= 4096) return -3;
            stack[sp++] = suffix[c];
            c = prefix[c];
        }
        if (c >= 256) return -3; /* chain corrupt */
        uint8_t first = (uint8_t)c;
        if (sp >= 4096) return -3;
        stack[sp++] = first;
        if (code == next_code) stack[0] = first;
        /* Python appends the full stack (out may exceed expect then is cut;
         * the while condition stops once len >= expect).  The caller sized
         * `out` with 4096 bytes of slack to allow the same overshoot. */
        for (int i = 0; i < sp; i++) out[n_out + i] = stack[sp - 1 - i];
        n_out += sp;
        if (prev >= 0 && next_code < 4096) {
            prefix[next_code] = prev;
            suffix[next_code] = first;
            next_code++;
            if (next_code == 510 || next_code == 1022 || next_code == 2046)
                bits++;
        }
        prev = code;
    }
    if (n_out < expect) return -4;
    return 0;
}

/* ========================== PNG unfilter ============================ */
/* rows: n scanlines of (1 + nbytes) raw bytes; out: n * nbytes recon. */

int64_t media_png_unfilter(const uint8_t *rows, int64_t n, int64_t nbytes,
                           int64_t fdist, uint8_t *out) {
    const uint8_t *prev = NULL;
    for (int64_t r = 0; r < n; r++) {
        const uint8_t *src = rows + r * (1 + nbytes);
        uint8_t *rec = out + r * nbytes;
        int f = src[0];
        const uint8_t *row = src + 1;
        switch (f) {
        case 0:
            memcpy(rec, row, nbytes);
            break;
        case 1: /* Sub */
            for (int64_t i = 0; i < nbytes; i++)
                rec[i] = (uint8_t)(row[i] + (i >= fdist ? rec[i - fdist] : 0));
            break;
        case 2: /* Up */
            if (prev)
                for (int64_t i = 0; i < nbytes; i++)
                    rec[i] = (uint8_t)(row[i] + prev[i]);
            else
                memcpy(rec, row, nbytes);
            break;
        case 3: /* Average */
            for (int64_t i = 0; i < nbytes; i++) {
                int a = i >= fdist ? rec[i - fdist] : 0;
                int b = prev ? prev[i] : 0;
                rec[i] = (uint8_t)(row[i] + ((a + b) >> 1));
            }
            break;
        case 4: /* Paeth */
            for (int64_t i = 0; i < nbytes; i++) {
                int a = i >= fdist ? rec[i - fdist] : 0;
                int b = prev ? prev[i] : 0;
                int c = (prev && i >= fdist) ? prev[i - fdist] : 0;
                int p = a + b - c;
                int pa = p > a ? p - a : a - p;
                int pb = p > b ? p - b : b - p;
                int pc = p > c ? p - c : c - p;
                int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                rec[i] = (uint8_t)(row[i] + pred);
            }
            break;
        default:
            return -1; /* bad filter byte */
        }
        prev = rec;
    }
    return 0;
}

/* ======================= FLAC subframe decode ======================= */
/* MSB-first bit reader addressed by absolute bit position. */

typedef struct {
    const uint8_t *d;
    int64_t len;     /* bytes */
    int64_t pos;     /* byte index */
    int bit;         /* bits consumed in current byte, 0..7 */
    int err;
} fbits;

static uint64_t fread_bits(fbits *r, int n) {
    uint64_t out = 0;
    while (n > 0) {
        if (r->pos >= r->len) { r->err = 1; return 0; }
        int avail = 8 - r->bit;
        int take = n < avail ? n : avail;
        uint8_t byte = r->d[r->pos];
        out = (out << take) |
              ((byte >> (avail - take)) & ((1u << take) - 1));
        r->bit += take;
        if (r->bit == 8) { r->bit = 0; r->pos++; }
        n -= take;
    }
    return out;
}

static int64_t fread_signed(fbits *r, int n) {
    uint64_t v = fread_bits(r, n);
    if (r->err) return 0;
    if (v >= (1ull << (n - 1))) return (int64_t)v - (1ll << n);
    return (int64_t)v;
}

static int64_t fread_unary(fbits *r) {
    int64_t n = 0;
    for (;;) {
        if (r->pos >= r->len) { r->err = 1; return 0; }
        if (fread_bits(r, 1)) return n;
        if (r->err) return 0;
        n++;
    }
}

static int flac_residual(fbits *r, int64_t block_size, int order,
                         int64_t *out) {
    int method = (int)fread_bits(r, 2);
    if (r->err) return -1;
    if (method > 1) return -2;
    int param_bits = 4 + method;
    int escape = (1 << param_bits) - 1;
    int po = (int)fread_bits(r, 4);
    if (r->err) return -1;
    int64_t n_part = 1ll << po;
    if (block_size % n_part || (block_size >> po) < order) return -3;
    int64_t idx = 0;
    for (int64_t p = 0; p < n_part; p++) {
        int64_t nn = (block_size >> po) - (p == 0 ? order : 0);
        int param = (int)fread_bits(r, param_bits);
        if (r->err) return -1;
        if (param == escape) {
            int raw_bits = (int)fread_bits(r, 5);
            if (r->err) return -1;
            if (raw_bits == 0) {
                for (int64_t i = 0; i < nn; i++) out[idx + i] = 0;
            } else {
                for (int64_t i = 0; i < nn; i++) {
                    out[idx + i] = fread_signed(r, raw_bits);
                    if (r->err) return -1;
                }
            }
        } else {
            for (int64_t i = 0; i < nn; i++) {
                int64_t q = fread_unary(r);
                if (r->err) return -1;
                uint64_t u = ((uint64_t)q << param) | fread_bits(r, param);
                if (r->err) return -1;
                out[idx + i] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
            }
        }
        idx += nn;
    }
    return 0;
}

/* Decode one subframe starting at absolute `bitpos`; fills out[block_size]
 * (already shifted by wasted bits).  Returns new bitpos, or negative. */
int64_t media_flac_subframe(const uint8_t *data, int64_t dlen, int64_t bitpos,
                            int64_t block_size, int64_t bps, int64_t *out) {
    fbits rr = {data, dlen, bitpos >> 3, (int)(bitpos & 7), 0};
    fbits *r = &rr;
    if (fread_bits(r, 1)) return -10; /* padding bit set */
    if (r->err) return -1;
    int stype = (int)fread_bits(r, 6);
    if (r->err) return -1;
    int64_t wasted = 0;
    if (fread_bits(r, 1)) {
        if (r->err) return -1;
        wasted = fread_unary(r) + 1;
        if (r->err) return -1;
    }
    if (r->err) return -1;
    int64_t eff = bps - wasted;
    if (eff <= 0) return -11;

    if (stype == 0) { /* CONSTANT */
        int64_t v = fread_signed(r, (int)eff);
        if (r->err) return -1;
        for (int64_t i = 0; i < block_size; i++) out[i] = v;
    } else if (stype == 1) { /* VERBATIM */
        for (int64_t i = 0; i < block_size; i++) {
            out[i] = fread_signed(r, (int)eff);
            if (r->err) return -1;
        }
    } else if (stype >= 8 && stype <= 12) { /* FIXED */
        int order = stype - 8;
        if (order > block_size) return -12;
        for (int i = 0; i < order; i++) {
            out[i] = fread_signed(r, (int)eff);
            if (r->err) return -1;
        }
        int rc = flac_residual(r, block_size, order, out + order);
        if (rc) return rc == -1 ? -1 : rc - 20;
        for (int64_t i = order; i < block_size; i++) {
            int64_t pred;
            switch (order) {
            case 0: pred = 0; break;
            case 1: pred = out[i - 1]; break;
            case 2: pred = 2 * out[i - 1] - out[i - 2]; break;
            case 3:
                pred = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3];
                break;
            default:
                pred = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] -
                       out[i - 4];
            }
            out[i] += pred;
        }
    } else if (stype >= 32) { /* LPC */
        int order = stype - 31;
        if (order > block_size) return -13;
        for (int i = 0; i < order; i++) {
            out[i] = fread_signed(r, (int)eff);
            if (r->err) return -1;
        }
        int prec = (int)fread_bits(r, 4);
        if (r->err) return -1;
        if (prec == 15) return -14;
        prec += 1;
        int64_t shift = fread_signed(r, 5);
        if (r->err) return -1;
        if (shift < 0) return -15;
        int64_t coefs[32];
        for (int i = 0; i < order; i++) {
            coefs[i] = fread_signed(r, prec);
            if (r->err) return -1;
        }
        int rc = flac_residual(r, block_size, order, out + order);
        if (rc) return rc == -1 ? -1 : rc - 20;
        for (int64_t i = order; i < block_size; i++) {
            int64_t pred = 0;
            for (int j = 0; j < order; j++)
                pred += coefs[j] * out[i - 1 - j];
            out[i] += pred >> shift;
        }
    } else {
        return -16; /* reserved subframe type */
    }
    if (wasted)
        for (int64_t i = 0; i < block_size; i++) out[i] <<= wasted;
    return rr.pos * 8 + rr.bit;
}

/* ========================= JPEG entropy scan ======================== */
/* Bit reader replicating multimodal._BitReader byte-for-byte:
 * 0xFF00 -> 0xFF (skip stuffing), 0xFF D0-D7 -> restart signal,
 * 0xFF <other marker> -> feed 0xFF pad bits WITHOUT advancing pos. */

typedef struct {
    const uint8_t *d;
    int64_t len, pos;
    uint32_t acc;
    int nbits;
    int err;      /* out-of-bounds / invalid code */
    int restart;  /* hit RSTn during fill */
} jbits;

static void jfill(jbits *r) {
    if (r->pos >= r->len) { r->err = 1; return; }
    uint8_t b = r->d[r->pos];
    if (b == 0xFF) {
        if (r->pos + 1 >= r->len) { r->err = 1; return; }
        uint8_t nxt = r->d[r->pos + 1];
        if (nxt == 0x00) {
            r->pos += 2;
        } else if (nxt >= 0xD0 && nxt <= 0xD7) {
            r->restart = 1;
            return;
        } else {
            r->acc = (r->acc << 8) | 0xFF;
            r->nbits += 8;
            return;
        }
    } else {
        r->pos += 1;
    }
    r->acc = (r->acc << 8) | b;
    r->nbits += 8;
}

static int jbit(jbits *r) {
    if (r->nbits == 0) {
        jfill(r);
        if (r->err || r->restart) return 0;
    }
    r->nbits -= 1;
    return (r->acc >> r->nbits) & 1;
}

static int jbitsn(jbits *r, int n) {
    int v = 0;
    for (int i = 0; i < n; i++) {
        v = (v << 1) | jbit(r);
        if (r->err || r->restart) return 0;
    }
    return v;
}

static void jalign_restart(jbits *r) {
    r->acc = 0;
    r->nbits = 0;
    r->restart = 0;
    int64_t i = r->pos;
    for (;;) {
        if (i + 1 >= r->len) { r->err = 1; return; }
        if (r->d[i] == 0xFF && r->d[i + 1] >= 0xD0 && r->d[i + 1] <= 0xD7)
            break;
        i++;
    }
    r->pos = i + 2;
}

/* Canonical-huffman decode tables: per table, per length 1..16:
 * mincode, count, valptr into vals[]. */
typedef struct {
    int32_t mincode[17];
    int32_t count[17];
    int32_t valptr[17];
    const uint8_t *vals;
    int present;
} jhuff;

static void jhuff_build(jhuff *t, const uint8_t *bits16, const uint8_t *vals) {
    int code = 0, k = 0;
    t->vals = vals;
    for (int l = 1; l <= 16; l++) {
        t->mincode[l] = code;
        t->valptr[l] = k;
        int c = bits16[l - 1];
        t->count[l] = c;
        code += c;
        k += c;
        code <<= 1;
    }
}

static int jsym(jbits *r, const jhuff *t) {
    int code = 0;
    for (int l = 1; l <= 16; l++) {
        code = (code << 1) | jbit(r);
        if (r->err || r->restart) return 0;
        if (t->count[l] && code >= t->mincode[l] &&
            code < t->mincode[l] + t->count[l])
            return t->vals[t->valptr[l] + code - t->mincode[l]];
    }
    r->err = 1; /* invalid huffman code */
    return 0;
}

static int jextend(int v, int s) {
    return v >= (1 << (s - 1)) ? v : v - (1 << s) + 1;
}

/* Decode one 8x8 baseline block (DC diff + AC run-length). */
static int jblock_baseline(jbits *r, const jhuff *dct, const jhuff *act,
                           int32_t *blk, int64_t *prev_dc) {
    int s = jsym(r, dct);
    if (r->err || r->restart) return -1;
    if (s > 25) return -4; /* corrupt DC size symbol: punt to Python */
    int diff = 0;
    if (s) {
        diff = jextend(jbitsn(r, s), s);
        if (r->err || r->restart) return -1;
    }
    *prev_dc += diff;
    if (*prev_dc > 2147483647ll || *prev_dc < -2147483648ll)
        return -5; /* numpy would raise OverflowError: punt to Python */
    blk[0] = (int32_t)*prev_dc;
    int k = 1;
    while (k < 64) {
        int sym = jsym(r, act);
        if (r->err || r->restart) return -1;
        if (sym == 0x00) break;
        int run = sym >> 4, size = sym & 0xF;
        if (size == 0) {
            if (run != 15) return -2; /* bad AC symbol */
            k += 16;
            continue;
        }
        k += run;
        if (k > 63) return -3; /* AC overflow */
        blk[k] = (int32_t)jextend(jbitsn(r, size), size);
        if (r->err || r->restart) return -1;
        k++;
    }
    return 0;
}

/* modes: 0 = baseline full scan (interleaved, all comps)
 *        1 = progressive DC scan, interleaved (multi-comp)
 *        2 = progressive DC scan, single component
 *        3 = progressive AC first, single component
 *        4 = progressive AC refine, single component
 * cmeta: per scan-component 7 int64s: bw, v, h, dc_tid, ac_tid, bw_ni, bh_ni
 * (tids index the 8-slot huff arrays: tc*4+th; -1 = unused).
 * Returns the reader's final byte position, or negative on error. */
int64_t media_jpeg_scan(const uint8_t *d, int64_t dlen, int64_t pos,
                        const uint8_t *hbits, const uint8_t *hvals,
                        const uint8_t *hpresent, int64_t mode, int64_t n_sc,
                        int32_t *coef0, int32_t *coef1, int32_t *coef2,
                        int32_t *coef3, const int64_t *cmeta, int64_t mcus_x,
                        int64_t mcus_y, int64_t restart_interval, int64_t ss,
                        int64_t se, int64_t ah, int64_t al) {
    if (n_sc < 1 || n_sc > 4) return -100;
    jhuff tabs[8];
    for (int t = 0; t < 8; t++) {
        tabs[t].present = hpresent[t];
        if (hpresent[t]) jhuff_build(&tabs[t], hbits + t * 16, hvals + t * 256);
    }
    int32_t *coefs[4] = {coef0, coef1, coef2, coef3};
    jbits rr = {d, dlen, pos, 0, 0, 0, 0};
    jbits *r = &rr;
    int64_t prev_dc[4] = {0, 0, 0, 0};

    if (mode == 0) { /* baseline */
        const jhuff *dct[4], *act[4];
        for (int i = 0; i < n_sc; i++) {
            int64_t dt = cmeta[i * 7 + 3], at = cmeta[i * 7 + 4];
            if (dt < 0 || dt > 7 || !tabs[dt].present) return -101;
            if (at < 0 || at > 7 || !tabs[at].present) return -101;
            dct[i] = &tabs[dt];
            act[i] = &tabs[at];
        }
        int64_t mcu_idx = 0;
        for (int64_t my = 0; my < mcus_y; my++) {
            for (int64_t mx = 0; mx < mcus_x; mx++) {
                if (restart_interval && mcu_idx &&
                    mcu_idx % restart_interval == 0) {
                    jalign_restart(r);
                    if (r->err) return -102;
                    prev_dc[0] = prev_dc[1] = prev_dc[2] = prev_dc[3] = 0;
                }
                for (int ci = 0; ci < n_sc; ci++) {
                    int64_t bw = cmeta[ci * 7 + 0];
                    int64_t v = cmeta[ci * 7 + 1];
                    int64_t hh = cmeta[ci * 7 + 2];
                    for (int64_t by = 0; by < v; by++)
                        for (int64_t bx = 0; bx < hh; bx++) {
                            int32_t *blk =
                                coefs[ci] +
                                ((my * v + by) * bw + mx * hh + bx) * 64;
                            int rc = jblock_baseline(r, dct[ci], act[ci], blk,
                                                     &prev_dc[ci]);
                            if (rc) return -103;
                        }
                }
                mcu_idx++;
            }
        }
        return r->pos;
    }

    if (mode == 1 || mode == 2) { /* progressive DC */
        const jhuff *dct[4] = {NULL, NULL, NULL, NULL};
        if (ah == 0)
            for (int i = 0; i < n_sc; i++) {
                int64_t dt = cmeta[i * 7 + 3];
                if (dt < 0 || dt > 7 || !tabs[dt].present) return -101;
                dct[i] = &tabs[dt];
            }
        int64_t units = (mode == 1)
                            ? mcus_x * mcus_y
                            : cmeta[0 * 7 + 5] * cmeta[0 * 7 + 6];
        for (int64_t u = 0; u < units; u++) {
            if (restart_interval && u && u % restart_interval == 0) {
                jalign_restart(r);
                if (r->err) return -102;
                prev_dc[0] = prev_dc[1] = prev_dc[2] = prev_dc[3] = 0;
            }
            if (mode == 1) {
                int64_t mx = u % mcus_x, my = u / mcus_x;
                for (int ci = 0; ci < n_sc; ci++) {
                    int64_t bw = cmeta[ci * 7 + 0];
                    int64_t v = cmeta[ci * 7 + 1];
                    int64_t hh = cmeta[ci * 7 + 2];
                    for (int64_t by = 0; by < v; by++)
                        for (int64_t bx = 0; bx < hh; bx++) {
                            int32_t *blk =
                                coefs[ci] +
                                ((my * v + by) * bw + mx * hh + bx) * 64;
                            if (ah == 0) {
                                int s = jsym(r, dct[ci]);
                                if (r->err || r->restart) return -103;
                                if (s > 25) return -106;
                                int diff = 0;
                                if (s) {
                                    diff = jextend(jbitsn(r, s), s);
                                    if (r->err || r->restart) return -103;
                                }
                                prev_dc[ci] += diff;
                                {
                                    int64_t dv = prev_dc[ci] << al;
                                    if (dv > 2147483647ll || dv < -2147483648ll)
                                        return -106;
                                    blk[0] = (int32_t)dv;
                                }
                            } else {
                                int b = jbit(r);
                                if (r->err || r->restart) return -103;
                                if (b) blk[0] |= (int32_t)(1 << al);
                            }
                        }
                }
            } else {
                int64_t bw = cmeta[0 * 7 + 0];
                int64_t bw_ni = cmeta[0 * 7 + 5];
                int32_t *blk = coefs[0] + ((u / bw_ni) * bw + (u % bw_ni)) * 64;
                if (ah == 0) {
                    int s = jsym(r, dct[0]);
                    if (r->err || r->restart) return -103;
                    if (s > 25) return -106;
                    int diff = 0;
                    if (s) {
                        diff = jextend(jbitsn(r, s), s);
                        if (r->err || r->restart) return -103;
                    }
                    prev_dc[0] += diff;
                    {
                        int64_t dv = prev_dc[0] << al;
                        if (dv > 2147483647ll || dv < -2147483648ll)
                            return -106;
                        blk[0] = (int32_t)dv;
                    }
                } else {
                    int b = jbit(r);
                    if (r->err || r->restart) return -103;
                    if (b) blk[0] |= (int32_t)(1 << al);
                }
            }
        }
        return r->pos;
    }

    /* progressive AC: single component over its non-interleaved grid */
    if (n_sc != 1) return -100;
    int64_t at = cmeta[0 * 7 + 4];
    if (at < 0 || at > 7 || !tabs[at].present) return -101;
    const jhuff *act = &tabs[at];
    int64_t bw = cmeta[0 * 7 + 0];
    int64_t bw_ni = cmeta[0 * 7 + 5];
    int64_t units = bw_ni * cmeta[0 * 7 + 6];
    int64_t eobrun = 0;
    int p1 = 1 << al, m1 = -(1 << al);

    for (int64_t u = 0; u < units; u++) {
        if (restart_interval && u && u % restart_interval == 0) {
            jalign_restart(r);
            if (r->err) return -102;
            eobrun = 0;
        }
        int32_t *blk = coefs[0] + ((u / bw_ni) * bw + (u % bw_ni)) * 64;
        if (mode == 3) { /* AC first */
            if (eobrun > 0) {
                eobrun--;
                continue;
            }
            int64_t k = ss;
            while (k <= se) {
                int sym = jsym(r, act);
                if (r->err || r->restart) return -103;
                int run = sym >> 4, size = sym & 0xF;
                if (size == 0) {
                    if (run == 15) {
                        k += 16;
                        continue;
                    }
                    eobrun = (1ll << run) - 1;
                    if (run) {
                        eobrun += jbitsn(r, run);
                        if (r->err || r->restart) return -103;
                    }
                    break;
                }
                k += run;
                if (k > se) return -104;
                blk[k] = (int32_t)(jextend(jbitsn(r, size), size) << al);
                if (r->err || r->restart) return -103;
                k++;
            }
        } else { /* mode 4: AC refine */
            int64_t k = ss;
            if (eobrun == 0) {
                while (k <= se) {
                    int sym = jsym(r, act);
                    if (r->err || r->restart) return -103;
                    int run = sym >> 4, size = sym & 0xF;
                    int newval = 0;
                    if (size == 0) {
                        if (run < 15) {
                            eobrun = 1ll << run;
                            if (run) {
                                eobrun += jbitsn(r, run);
                                if (r->err || r->restart) return -103;
                            }
                            break;
                        }
                        /* run == 15: ZRL */
                    } else {
                        if (size != 1) return -105;
                        int b = jbit(r);
                        if (r->err || r->restart) return -103;
                        newval = b ? p1 : m1;
                    }
                    while (k <= se) {
                        int32_t v = blk[k];
                        if (v != 0) {
                            int b = jbit(r);
                            if (r->err || r->restart) return -103;
                            if (b && (v & p1) == 0)
                                blk[k] = v + (v >= 0 ? p1 : m1);
                        } else {
                            if (run == 0) break;
                            run--;
                        }
                        k++;
                    }
                    if (newval && k <= se) blk[k] = (int32_t)newval;
                    k++;
                }
            }
            if (eobrun > 0) {
                while (k <= se) {
                    int32_t v = blk[k];
                    if (v != 0) {
                        int b = jbit(r);
                        if (r->err || r->restart) return -103;
                        if (b && (v & p1) == 0)
                            blk[k] = v + (v >= 0 ? p1 : m1);
                    }
                    k++;
                }
                eobrun--;
            }
        }
    }
    return r->pos;
}

/* ===================== WebP-lossless (VP8L) folds ===================== */
/* Mirrors stages/vp8l.py byte-for-byte: LSB-first bit reader, canonical
 * huffman walked MSB-of-code-first, LZ77 + color cache + meta groups for
 * the pixel loop, and the 14-mode inverse predictor.  Any error returns
 * negative and the caller re-runs the pure-Python path. */

#include <stdlib.h>

typedef struct {
    const uint8_t *d;
    int64_t len, pos;
    int bit;
    int err;
} vbits;

static int vbit(vbits *r) {
    if (r->pos >= r->len) { r->err = 1; return 0; }
    int b = (r->d[r->pos] >> r->bit) & 1;
    if (++r->bit == 8) { r->bit = 0; r->pos++; }
    return b;
}

static uint32_t vbitsn(vbits *r, int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; i++) {
        v |= (uint32_t)vbit(r) << i;
        if (r->err) return 0;
    }
    return v;
}

typedef struct {
    int32_t mincode[16];
    int32_t count[16];
    int32_t valptr[16];
    const int32_t *vals; /* into a shared pool */
    int32_t single;      /* >=0: zero-bit code */
} vhuff;

/* Build one canonical table from per-symbol lengths (max 15), writing the
 * sorted-symbol pool into vals_out; returns n_vals or negative. */
static int64_t vhuff_build(vhuff *t, const int16_t *lengths, int64_t alphabet,
                           int32_t *vals_out) {
    int64_t n_nz = 0;
    int64_t last_sym = -1;
    for (int64_t s = 0; s < alphabet; s++) {
        int16_t ln = lengths[s];
        if (ln < 0 || ln > 15) return -1;
        if (ln > 0) { n_nz++; last_sym = s; }
    }
    if (n_nz == 0) return -1;
    t->single = -1;
    if (n_nz == 1) {
        t->single = (int32_t)last_sym;
        return 0;
    }
    for (int l = 0; l <= 15; l++) t->count[l] = 0;
    for (int64_t s = 0; s < alphabet; s++)
        if (lengths[s]) t->count[lengths[s]]++;
    int code = 0, k = 0;
    int64_t total = 0;
    for (int l = 1; l <= 15; l++) {
        t->mincode[l] = code;
        t->valptr[l] = k;
        code += t->count[l];
        k += t->count[l];
        total += (int64_t)t->count[l] << (15 - l);
        code <<= 1;
    }
    if (total != (1ll << 15)) return -2; /* incomplete/oversubscribed */
    /* canonical symbol order: ascending symbol within each length */
    int32_t fill[16];
    for (int l = 1; l <= 15; l++) fill[l] = t->valptr[l];
    for (int64_t s = 0; s < alphabet; s++) {
        int16_t ln = lengths[s];
        if (ln) vals_out[fill[ln]++] = (int32_t)s;
    }
    t->vals = vals_out;
    return k;
}

static int vsym(vbits *r, const vhuff *t) {
    if (t->single >= 0) return t->single;
    int code = 0;
    for (int l = 1; l <= 15; l++) {
        code = (code << 1) | vbit(r);
        if (r->err) return 0;
        int c = t->count[l];
        if (c && code >= t->mincode[l] && code < t->mincode[l] + c)
            return t->vals[t->valptr[l] + code - t->mincode[l]];
    }
    r->err = 1;
    return 0;
}

static int64_t vprefix(vbits *r, int code) {
    if (code < 4) return code + 1;
    int eb = (code - 2) >> 1;
    int64_t off = (int64_t)(2 + (code & 1)) << eb;
    int64_t extra = (int64_t)vbitsn(r, eb);
    if (r->err) return 0;
    return off + extra + 1;
}

/* Decode one entropy-coded VP8L image's pixel stream (huffman codes for
 * every group already parsed by Python; this starts at the first pixel
 * symbol).  lengths: concatenated int16 code lengths for n_groups*5
 * codes; code_off[i] offsets into it; alpha[i] alphabet sizes.
 * meta: per-block group ids (mw columns) or NULL.  dist_map: the 120
 * plane distances precomputed for this xsize.  Returns the new absolute
 * bit position, or negative on any condition where Python raises. */
int64_t media_vp8l_image(const uint8_t *d, int64_t dlen, int64_t bitpos,
                         int64_t xsize, int64_t n_px, int64_t n_groups,
                         const int16_t *lengths, const int64_t *code_off,
                         const int64_t *alpha, const int32_t *meta,
                         int64_t meta_bits, int64_t mw, int64_t cache_bits,
                         const int32_t *dist_map, uint32_t *out) {
    if (n_groups < 1 || n_groups > (1 << 20)) return -100;
    int64_t n_codes = n_groups * 5;
    vhuff *tabs = (vhuff *)malloc(sizeof(vhuff) * n_codes);
    int64_t pool_sz = 0;
    for (int64_t i = 0; i < n_codes; i++) pool_sz += alpha[i];
    int32_t *pool = (int32_t *)malloc(sizeof(int32_t) * (pool_sz ? pool_sz : 1));
    uint32_t *cache = NULL;
    int64_t cache_size = cache_bits ? (1ll << cache_bits) : 0;
    if (cache_size) cache = (uint32_t *)calloc(cache_size, sizeof(uint32_t));
    if (!tabs || !pool || (cache_size && !cache)) {
        free(tabs); free(pool); free(cache);
        return -101;
    }
    int64_t pk = 0;
    for (int64_t i = 0; i < n_codes; i++) {
        int64_t rc = vhuff_build(&tabs[i], lengths + code_off[i], alpha[i],
                                 pool + pk);
        if (rc < 0) { free(tabs); free(pool); free(cache); return -102; }
        pk += rc;
    }
    vbits rr = {d, dlen, bitpos >> 3, (int)(bitpos & 7), 0};
    vbits *r = &rr;
    int64_t pos = 0;
    int64_t last_blk = -1;
    const vhuff *g = &tabs[0], *cr = &tabs[1], *cb = &tabs[2], *ca = &tabs[3],
                *cd = &tabs[4];
    int rc_out = 0;
    while (pos < n_px) {
        if (meta) {
            int64_t x = pos % xsize, y = pos / xsize;
            int64_t blk = (y >> meta_bits) * mw + (x >> meta_bits);
            if (blk != last_blk) {
                int64_t gi = meta[blk];
                if (gi < 0 || gi >= n_groups) { rc_out = -103; break; }
                g = &tabs[gi * 5 + 0];
                cr = &tabs[gi * 5 + 1];
                cb = &tabs[gi * 5 + 2];
                ca = &tabs[gi * 5 + 3];
                cd = &tabs[gi * 5 + 4];
                last_blk = blk;
            }
        }
        int sym = vsym(r, g);
        if (r->err) { rc_out = -104; break; }
        if (sym < 256) {
            int rv = vsym(r, cr);
            int bv = vsym(r, cb);
            int av = vsym(r, ca);
            if (r->err) { rc_out = -104; break; }
            uint32_t px = ((uint32_t)av << 24) | ((uint32_t)rv << 16) |
                          ((uint32_t)sym << 8) | (uint32_t)bv;
            out[pos] = px;
            if (cache_size)
                cache[(uint32_t)(0x1E35A7BDu * px) >> (32 - cache_bits)] = px;
            pos++;
        } else if (sym < 256 + 24) {
            int64_t length = vprefix(r, sym - 256);
            if (r->err) { rc_out = -104; break; }
            int dsym = vsym(r, cd);
            if (r->err) { rc_out = -104; break; }
            int64_t dist_code = vprefix(r, dsym);
            if (r->err) { rc_out = -104; break; }
            int64_t dist;
            if (dist_code > 120) dist = dist_code - 120;
            else dist = dist_map[dist_code - 1];
            if (dist > pos || pos + length > n_px) { rc_out = -105; break; }
            for (int64_t i = 0; i < length; i++) {
                uint32_t px = out[pos - dist + i];
                out[pos + i] = px;
                if (cache_size)
                    cache[(uint32_t)(0x1E35A7BDu * px) >> (32 - cache_bits)] = px;
            }
            pos += length;
        } else {
            int64_t idx = sym - 256 - 24;
            if (idx >= cache_size) { rc_out = -106; break; }
            out[pos] = cache[idx];
            pos++;
        }
    }
    free(tabs);
    free(pool);
    free(cache);
    if (rc_out) return rc_out;
    return rr.pos * 8 + rr.bit;
}

/* -------------------- inverse predictor transform -------------------- */

static uint32_t vavg2(uint32_t a, uint32_t b) {
    return ((((a >> 24) + (b >> 24)) >> 1) << 24) |
           (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16) |
           (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8) |
           (((a & 0xFF) + (b & 0xFF)) >> 1);
}

static uint32_t vclamp_full(uint32_t a, uint32_t b, uint32_t c) {
    uint32_t o = 0;
    for (int sh = 0; sh <= 24; sh += 8) {
        int v = (int)((a >> sh) & 0xFF) + (int)((b >> sh) & 0xFF) -
                (int)((c >> sh) & 0xFF);
        if (v < 0) v = 0;
        if (v > 255) v = 255;
        o |= (uint32_t)v << sh;
    }
    return o;
}

static uint32_t vclamp_half(uint32_t ave, uint32_t c) {
    uint32_t o = 0;
    for (int sh = 0; sh <= 24; sh += 8) {
        int av = (ave >> sh) & 0xFF;
        int cv = (c >> sh) & 0xFF;
        int dv = av - cv;
        int v = av + dv / 2; /* C division truncates toward zero */
        if (v < 0) v = 0;
        if (v > 255) v = 255;
        o |= (uint32_t)v << sh;
    }
    return o;
}

static uint32_t vselect(uint32_t t, uint32_t l, uint32_t tl) {
    int s = 0;
    for (int sh = 0; sh <= 24; sh += 8) {
        int lv = (l >> sh) & 0xFF;
        int tv = (t >> sh) & 0xFF;
        int cv = (tl >> sh) & 0xFF;
        int pl = lv - cv, pt = tv - cv;
        s += (pl < 0 ? -pl : pl) - (pt < 0 ? -pt : pt);
    }
    return s <= 0 ? t : l;
}

static uint32_t vaddpix(uint32_t a, uint32_t b) {
    return ((((a >> 24) + (b >> 24)) & 0xFF) << 24) |
           (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16) |
           (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8) |
           (((a & 0xFF) + (b & 0xFF)) & 0xFF);
}

/* In-place inverse predictor over uint32 ARGB pixels; modes: per-block
 * uint8 predictor ids, tw columns.  Returns 0 or negative. */
int64_t media_vp8l_predict(uint32_t *px, int64_t w, int64_t h,
                           const uint8_t *modes, int64_t tw,
                           int64_t size_bits) {
    for (int64_t y = 0; y < h; y++) {
        for (int64_t x = 0; x < w; x++) {
            uint32_t pred;
            if (x == 0 && y == 0) {
                pred = 0xFF000000u;
            } else if (y == 0) {
                pred = px[x - 1];
            } else if (x == 0) {
                pred = px[(y - 1) * w];
            } else {
                int mode = modes[(y >> size_bits) * tw + (x >> size_bits)];
                uint32_t L = px[y * w + x - 1];
                uint32_t T = px[(y - 1) * w + x];
                uint32_t TL = px[(y - 1) * w + x - 1];
                uint32_t TR = (x + 1 < w) ? px[(y - 1) * w + x + 1]
                                          : px[y * w];
                switch (mode) {
                case 0: pred = 0xFF000000u; break;
                case 1: pred = L; break;
                case 2: pred = T; break;
                case 3: pred = TR; break;
                case 4: pred = TL; break;
                case 5: pred = vavg2(vavg2(L, TR), T); break;
                case 6: pred = vavg2(L, TL); break;
                case 7: pred = vavg2(L, T); break;
                case 8: pred = vavg2(TL, T); break;
                case 9: pred = vavg2(T, TR); break;
                case 10: pred = vavg2(vavg2(L, TL), vavg2(T, TR)); break;
                case 11: pred = vselect(T, L, TL); break;
                case 12: pred = vclamp_full(L, T, TL); break;
                case 13: pred = vclamp_half(vavg2(L, T), TL); break;
                default: return -1;
                }
            }
            px[y * w + x] = vaddpix(px[y * w + x], pred);
        }
    }
    return 0;
}
