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
