/* Columnar Jelly decoder fold, compiled — the frame/row loop of
 * pyjelly_ray/jelly/decode_fast.py::decode_table translated 1:1 to C.
 *
 * Python keeps frame-span discovery (parse_options) and Arrow assembly;
 * C parses rows, runs the decoder lookup delta rules
 * (jelly/lookup.py::DecoderLookup, mirroring the reference's
 * parse/lookup.py), applies repeated-term suppression, and builds the
 * output string columns directly as (offsets, data, byte-mask) triples
 * that Python wraps zero-copy via pa.StringArray.from_buffers (UTF-8 is
 * re-validated there; any C error code falls back to the Python fold so
 * conformance errors raise with their proper messages).
 *
 * Return codes: 0 ok, -1 oom, -2 conformance error (fallback re-raises),
 * -3 unsupported shape (RDF-star/generalized: caller uses general path).
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define KIND_IRI 1
#define KIND_BNODE 2
#define KIND_LITERAL 3
#define KIND_DEFAULT 4

#define ROW_OPTIONS 1
#define ROW_TRIPLE 2
#define ROW_QUAD 3
#define ROW_GRAPH_START 4
#define ROW_GRAPH_END 5
#define ROW_NAMESPACE 6
#define ROW_NAME 9
#define ROW_PREFIX 10
#define ROW_DATATYPE 11

#define ERR_OOM (-1)
#define ERR_CONF (-2)
#define ERR_UNSUP (-3)

typedef struct {
    uint8_t *p;
    int64_t len, cap;
} Buf;

static int buf_init(Buf *b, int64_t cap) {
    b->p = (uint8_t *)malloc(cap);
    b->len = 0;
    b->cap = cap;
    return b->p ? 0 : ERR_OOM;
}

static int buf_reserve(Buf *b, int64_t extra) {
    if (b->len + extra <= b->cap) return 0;
    int64_t nc = b->cap ? b->cap * 2 : 64;
    while (nc < b->len + extra) nc *= 2;
    uint8_t *np = (uint8_t *)realloc(b->p, nc);
    if (!np) return ERR_OOM;
    b->p = np;
    b->cap = nc;
    return 0;
}

/* ---------------------------- string column ------------------------------- */
/* Arrow-shaped: int32 offsets (n+1), utf8 data, per-row byte mask (1=valid) */

typedef struct {
    Buf data, off, mask;
    int64_t n, nulls;
} Col;

static int col_init(Col *c) {
    if (buf_init(&c->data, 256) || buf_init(&c->off, 256) || buf_init(&c->mask, 64))
        return ERR_OOM;
    c->n = 0;
    c->nulls = 0;
    *(int32_t *)c->off.p = 0;
    c->off.len = 4;
    return 0;
}

static void col_free(Col *c) {
    free(c->data.p);
    free(c->off.p);
    free(c->mask.p);
}

static inline int col_append(Col *c, const uint8_t *src, int64_t len) {
    if (c->data.len + len > INT32_MAX) return ERR_CONF; /* int32 offsets */
    if (buf_reserve(&c->data, len) || buf_reserve(&c->off, 4) ||
        buf_reserve(&c->mask, 1))
        return ERR_OOM;
    memcpy(c->data.p + c->data.len, src, len);
    c->data.len += len;
    *(int32_t *)(c->off.p + c->off.len) = (int32_t)c->data.len;
    c->off.len += 4;
    c->mask.p[c->mask.len++] = 1;
    c->n++;
    return 0;
}

/* one value = two concatenated spans (prefix + name) */
static inline int col_append2(Col *c, const uint8_t *a, int64_t la,
                              const uint8_t *b2, int64_t lb) {
    if (c->data.len + la + lb > INT32_MAX) return ERR_CONF;
    if (buf_reserve(&c->data, la + lb) || buf_reserve(&c->off, 4) ||
        buf_reserve(&c->mask, 1))
        return ERR_OOM;
    memcpy(c->data.p + c->data.len, a, la);
    memcpy(c->data.p + c->data.len + la, b2, lb);
    c->data.len += la + lb;
    *(int32_t *)(c->off.p + c->off.len) = (int32_t)c->data.len;
    c->off.len += 4;
    c->mask.p[c->mask.len++] = 1;
    c->n++;
    return 0;
}

static inline int col_append_null(Col *c) {
    if (buf_reserve(&c->off, 4) || buf_reserve(&c->mask, 1)) return ERR_OOM;
    *(int32_t *)(c->off.p + c->off.len) = (int32_t)c->data.len;
    c->off.len += 4;
    c->mask.p[c->mask.len++] = 0;
    c->n++;
    c->nulls++;
    return 0;
}

/* duplicate the previous row (value bytes or null) — repeated-term rule */
static inline int col_repeat(Col *c) {
    int32_t *off = (int32_t *)c->off.p;
    int64_t n = c->n;
    if (!c->mask.p[n - 1]) return col_append_null(c);
    int64_t s = off[n - 1], e = off[n];
    if (c->data.len + (e - s) > INT32_MAX) return ERR_CONF;
    if (buf_reserve(&c->data, e - s) || buf_reserve(&c->off, 4) ||
        buf_reserve(&c->mask, 1))
        return ERR_OOM;
    memcpy(c->data.p + c->data.len, c->data.p + s, e - s);
    c->data.len += e - s;
    *(int32_t *)(c->off.p + c->off.len) = (int32_t)c->data.len;
    c->off.len += 4;
    c->mask.p[c->mask.len++] = 1;
    c->n++;
    return 0;
}

typedef struct {
    Buf v; /* uint8 per row */
} KCol;

static int kcol_init(KCol *k) { return buf_init(&k->v, 64); }

static inline int kcol_append(KCol *k, uint8_t kind) {
    if (buf_reserve(&k->v, 1)) return ERR_OOM;
    k->v.p[k->v.len++] = kind;
    return 0;
}

/* ------------------------------ decoder lookup ---------------------------- */

typedef struct {
    const uint8_t **ptr; /* 1-based slots into the input buffer */
    int32_t *len;
    int32_t max_size, last_assigned, last_reused;
} DLk;

static int dlk_init(DLk *l, int32_t max_size) {
    int32_t n = max_size ? max_size : 1;
    l->ptr = (const uint8_t **)calloc(n, sizeof(uint8_t *));
    l->len = (int32_t *)calloc(n, sizeof(int32_t));
    l->max_size = max_size;
    l->last_assigned = 0;
    l->last_reused = 0;
    return (l->ptr && l->len) ? 0 : ERR_OOM;
}

static void dlk_free(DLk *l) {
    free(l->ptr);
    free(l->len);
}

static inline int dlk_assign(DLk *l, int64_t index, const uint8_t *p, int32_t n) {
    if (index == 0) index = l->last_assigned + 1;
    if (index <= 0 || index > l->max_size) return ERR_CONF;
    l->ptr[index - 1] = p;
    l->len[index - 1] = n;
    l->last_assigned = (int32_t)index;
    return 0;
}

static inline int dlk_at(DLk *l, int64_t index, const uint8_t **p, int32_t *n) {
    l->last_reused = (int32_t)index;
    if (index <= 0 || index > l->max_size || !l->ptr[index - 1]) return ERR_CONF;
    *p = l->ptr[index - 1];
    *n = l->len[index - 1];
    return 0;
}

/* --------------------------------- wire ----------------------------------- */

static inline int rd_varint(const uint8_t *d, int64_t *pos, int64_t end,
                            uint64_t *out) {
    uint64_t v = 0;
    int shift = 0;
    while (*pos < end) {
        uint8_t b = d[(*pos)++];
        v |= (uint64_t)(b & 0x7F) << shift;
        if (!(b & 0x80)) {
            *out = v;
            return 0;
        }
        shift += 7;
        if (shift > 63) return ERR_CONF;
    }
    return ERR_CONF;
}

/* ------------------------------- fold state -------------------------------- */

typedef struct {
    const uint8_t *d;
    DLk names, prefixes, datatypes;
    Col s_val, p_val, o_val, o_lex, o_lang, o_dt, g_val;
    KCol s_kind, o_kind, g_kind;
} St;

/* decode an RdfIri body; out: prefix/name spans resolved via delta rules */
static int dec_iri(St *st, int64_t s, int64_t e, const uint8_t **pp, int32_t *pl,
                   const uint8_t **np, int32_t *nl) {
    uint64_t prefix_id = 0, name_id = 0;
    int64_t pos = s;
    while (pos < e) {
        uint8_t key = st->d[pos++];
        uint64_t v;
        if (rd_varint(st->d, &pos, e, &v)) return ERR_CONF;
        if (key == 0x08) prefix_id = v;
        else if (key == 0x10) name_id = v;
    }
    /* name_ref */
    int64_t actual = name_id ? (int64_t)name_id : st->names.last_reused + 1;
    if (actual == 0) return ERR_CONF;
    if (dlk_at(&st->names, actual, np, nl)) return ERR_CONF;
    /* prefix_ref */
    int64_t pa = prefix_id ? (int64_t)prefix_id : st->prefixes.last_reused;
    if (pa == 0) {
        *pp = NULL;
        *pl = 0;
    } else if (dlk_at(&st->prefixes, pa, pp, pl)) {
        return ERR_CONF;
    }
    return 0;
}

static int parse_entry(const uint8_t *d, int64_t s, int64_t e, uint64_t *idx,
                       const uint8_t **vp, int32_t *vl) {
    *idx = 0;
    *vp = d + s;
    *vl = 0;
    int64_t pos = s;
    while (pos < e) {
        uint8_t key = d[pos++];
        int field = key >> 3, wt = key & 7;
        uint64_t v;
        if (wt == 0) {
            if (rd_varint(d, &pos, e, &v)) return ERR_CONF;
            if (field == 1) *idx = v;
        } else if (wt == 2) {
            if (rd_varint(d, &pos, e, &v)) return ERR_CONF;
            if (field == 2) {
                if (pos + (int64_t)v > e) return ERR_CONF;
                *vp = d + pos;
                *vl = (int32_t)v;
            }
            pos += (int64_t)v;
        } else {
            return ERR_CONF;
        }
    }
    return 0;
}

typedef struct {
    uint8_t *data;
    int64_t data_len;
    int32_t *off;
    uint8_t *mask;
    int64_t nulls;
} OutCol;

typedef struct {
    int64_t n;
    OutCol s_val, p_val, o_val, o_lex, o_lang, o_dt, g_val;
    uint8_t *s_kind, *o_kind, *g_kind;
} DecOut;

static void out_col(OutCol *o, Col *c) {
    o->data = c->data.p;
    o->data_len = c->data.len;
    o->off = (int32_t *)c->off.p;
    o->mask = c->mask.p;
    o->nulls = c->nulls;
    c->data.p = NULL; /* ownership moves to DecOut */
    c->off.p = NULL;
    c->mask.p = NULL;
}

int64_t jelly_decode_fold(const uint8_t *data, const int64_t *spans,
                          int64_t n_spans, int physical /*0=T,1=Q,2=G*/,
                          int64_t max_names, int64_t max_prefixes,
                          int64_t max_datatypes, DecOut **out_p) {
    St st;
    memset(&st, 0, sizeof(st));
    st.d = data;
    int rc = 0;
    int is_quads = physical == 1, is_graphs = physical == 2;
    int emit_g = is_quads || is_graphs;
    int stmt_row = is_quads ? ROW_QUAD : ROW_TRIPLE;

    if (dlk_init(&st.names, (int32_t)max_names) ||
        dlk_init(&st.prefixes, (int32_t)max_prefixes) ||
        dlk_init(&st.datatypes, (int32_t)max_datatypes)) {
        rc = ERR_OOM;
        goto done;
    }
    if (col_init(&st.s_val) || col_init(&st.p_val) || col_init(&st.o_val) ||
        col_init(&st.o_lex) || col_init(&st.o_lang) || col_init(&st.o_dt) ||
        col_init(&st.g_val) || kcol_init(&st.s_kind) || kcol_init(&st.o_kind) ||
        kcol_init(&st.g_kind)) {
        rc = ERR_OOM;
        goto done;
    }

    int have_s = 0, have_p = 0, have_o = 0, have_g = 0;
    uint8_t prev_s_kind = 0, prev_o_kind = 0, prev_g_kind = 0;
    int cur_g_set = 0; /* GRAPHS enclosing marker */
    uint8_t cur_g_kind = 0;
    const uint8_t *cur_g_p = NULL;
    int32_t cur_g_len = 0;

    for (int64_t si = 0; si < n_spans && !rc; si++) {
        int64_t pos = spans[2 * si], fe = spans[2 * si + 1];
        while (pos < fe && !rc) {
            uint64_t key;
            if (data[pos] < 0x80) key = data[pos++];
            else if (rd_varint(data, &pos, fe, &key)) { rc = ERR_CONF; break; }
            if (key != 0x0A) { /* not a rows field: skip */
                int wt = (int)(key & 7);
                uint64_t v;
                if (wt == 2) {
                    if (rd_varint(data, &pos, fe, &v)) { rc = ERR_CONF; break; }
                    if (pos + (int64_t)v > fe) { rc = ERR_CONF; break; }
                    pos += (int64_t)v;
                } else if (wt == 0) {
                    if (rd_varint(data, &pos, fe, &v)) { rc = ERR_CONF; break; }
                } else {
                    rc = ERR_CONF;
                    break;
                }
                continue;
            }
            uint64_t row_len;
            if (rd_varint(data, &pos, fe, &row_len)) { rc = ERR_CONF; break; }
            int64_t row_end = pos + (int64_t)row_len;
            if (row_end > fe) { rc = ERR_CONF; break; } /* malformed: row overruns frame */
            if (row_len == 0) continue;
            uint64_t rkey;
            int64_t rpos = pos;
            if (data[rpos] < 0x80) rkey = data[rpos++];
            else if (rd_varint(data, &rpos, row_end, &rkey)) { rc = ERR_CONF; break; }
            int rfield = (int)(rkey >> 3);
            uint64_t body_len;
            if (rd_varint(data, &rpos, row_end, &body_len)) { rc = ERR_CONF; break; }
            int64_t s = rpos, e = rpos + (int64_t)body_len;
            if (e > row_end) { rc = ERR_CONF; break; } /* malformed: body overruns row */
            pos = row_end;

            if (rfield == stmt_row) {
                /* track which slots change this row */
                int fresh_s = 0, fresh_p = 0, fresh_o = 0, fresh_g = 0;
                uint8_t ns_kind = 0, no_kind = 0, ng_kind = 0;
                const uint8_t *sp1 = NULL, *sp2 = NULL, *pp1 = NULL, *pp2 = NULL;
                const uint8_t *op1 = NULL, *op2 = NULL, *gp1 = NULL, *gp2 = NULL;
                int32_t sl1 = 0, sl2 = 0, plen1 = 0, plen2 = 0;
                int32_t ol1 = 0, ol2 = 0, gl1 = 0, gl2 = 0;
                const uint8_t *lex_p = NULL, *lang_p = NULL, *dt_p = NULL;
                int32_t lex_l = 0, lang_l = 0, dt_l = 0;
                int lang_set = 0, dt_set = 0;

                int64_t sp = s;
                while (sp < e && !rc) {
                    uint64_t fkey;
                    if (data[sp] < 0x80) fkey = data[sp++];
                    else if (rd_varint(data, &sp, e, &fkey)) { rc = ERR_CONF; break; }
                    uint64_t ln;
                    if (rd_varint(data, &sp, e, &ln)) { rc = ERR_CONF; break; }
                    int field = (int)(fkey >> 3);
                    int64_t vs = sp, ve = sp + (int64_t)ln;
                    if (ve > e) { rc = ERR_CONF; break; } /* malformed: field overruns body */
                    sp = ve;
                    switch (field) {
                    case 1:
                        rc = dec_iri(&st, vs, ve, &sp1, &sl1, &sp2, &sl2);
                        fresh_s = 1;
                        ns_kind = KIND_IRI;
                        break;
                    case 2:
                        sp1 = NULL; sl1 = 0;
                        sp2 = data + vs; sl2 = (int32_t)ln;
                        fresh_s = 1;
                        ns_kind = KIND_BNODE;
                        break;
                    case 5:
                        rc = dec_iri(&st, vs, ve, &pp1, &plen1, &pp2, &plen2);
                        fresh_p = 1;
                        break;
                    case 9:
                        rc = dec_iri(&st, vs, ve, &op1, &ol1, &op2, &ol2);
                        fresh_o = 1;
                        no_kind = KIND_IRI;
                        break;
                    case 10:
                        op1 = NULL; ol1 = 0;
                        op2 = data + vs; ol2 = (int32_t)ln;
                        fresh_o = 1;
                        no_kind = KIND_BNODE;
                        break;
                    case 11: { /* literal */
                        lex_p = data + vs; lex_l = 0;
                        lang_set = 0; dt_set = 0;
                        uint64_t dt_id = 0;
                        int64_t lp2 = vs;
                        while (lp2 < ve && !rc) {
                            uint8_t k2 = data[lp2++];
                            uint64_t v2;
                            if (k2 == 0x0A) {
                                if (rd_varint(data, &lp2, ve, &v2)) { rc = ERR_CONF; break; }
                                if (lp2 + (int64_t)v2 > ve) { rc = ERR_CONF; break; }
                                lex_p = data + lp2; lex_l = (int32_t)v2;
                                lp2 += (int64_t)v2;
                            } else if (k2 == 0x12) {
                                if (rd_varint(data, &lp2, ve, &v2)) { rc = ERR_CONF; break; }
                                if (lp2 + (int64_t)v2 > ve) { rc = ERR_CONF; break; }
                                lang_p = data + lp2; lang_l = (int32_t)v2;
                                lp2 += (int64_t)v2;
                                lang_set = 1; dt_set = 0;
                            } else if (k2 == 0x18) {
                                if (rd_varint(data, &lp2, ve, &v2)) { rc = ERR_CONF; break; }
                                dt_id = v2;
                                dt_set = 1; lang_set = 0;
                            } else if ((k2 & 7) == 2) {
                                if (rd_varint(data, &lp2, ve, &v2)) { rc = ERR_CONF; break; }
                                if (lp2 + (int64_t)v2 > ve) { rc = ERR_CONF; break; }
                                lp2 += (int64_t)v2;
                            } else {
                                if (rd_varint(data, &lp2, ve, &v2)) { rc = ERR_CONF; break; }
                            }
                        }
                        if (!rc && !lang_set && dt_set && st.datatypes.max_size) {
                            if (dt_id == 0) { rc = ERR_CONF; break; }
                            if (dlk_at(&st.datatypes, (int64_t)dt_id, &dt_p, &dt_l)) {
                                rc = ERR_CONF;
                                break;
                            }
                        } else {
                            dt_p = NULL; dt_l = 0;
                        }
                        if (!lang_set) { lang_p = NULL; lang_l = 0; }
                        fresh_o = 1;
                        no_kind = KIND_LITERAL;
                        break;
                    }
                    case 13:
                        if (!is_quads) { rc = ERR_UNSUP; break; }
                        rc = dec_iri(&st, vs, ve, &gp1, &gl1, &gp2, &gl2);
                        fresh_g = 1;
                        ng_kind = KIND_IRI;
                        break;
                    case 14:
                        if (!is_quads) { rc = ERR_UNSUP; break; }
                        gp1 = NULL; gl1 = 0;
                        gp2 = data + vs; gl2 = (int32_t)ln;
                        fresh_g = 1;
                        ng_kind = KIND_BNODE;
                        break;
                    case 15:
                        if (!is_quads) { rc = ERR_UNSUP; break; }
                        gp1 = gp2 = NULL; gl1 = gl2 = 0;
                        fresh_g = 1;
                        ng_kind = KIND_DEFAULT;
                        break;
                    default:
                        rc = ERR_UNSUP; /* p bnode, generalized, RDF-star */
                    }
                }
                if (rc) break;
                /* append the statement row */
                if (fresh_s) {
                    prev_s_kind = ns_kind;
                    have_s = 1;
                    rc = col_append2(&st.s_val, sp1, sl1, sp2, sl2);
                } else if (have_s) {
                    rc = col_repeat(&st.s_val);
                } else {
                    rc = ERR_CONF;
                }
                if (!rc) rc = kcol_append(&st.s_kind, prev_s_kind);
                if (!rc) {
                    if (fresh_p) {
                        have_p = 1;
                        rc = col_append2(&st.p_val, pp1, plen1, pp2, plen2);
                    } else if (have_p) {
                        rc = col_repeat(&st.p_val);
                    } else {
                        rc = ERR_CONF;
                    }
                }
                if (!rc) {
                    if (fresh_o) {
                        prev_o_kind = no_kind;
                        have_o = 1;
                        if (no_kind == KIND_LITERAL) {
                            rc = col_append_null(&st.o_val);
                            if (!rc) rc = col_append(&st.o_lex, lex_p, lex_l);
                            if (!rc)
                                rc = lang_p ? col_append(&st.o_lang, lang_p, lang_l)
                                            : col_append_null(&st.o_lang);
                            if (!rc)
                                rc = dt_p ? col_append(&st.o_dt, dt_p, dt_l)
                                          : col_append_null(&st.o_dt);
                        } else {
                            rc = col_append2(&st.o_val, op1, ol1, op2, ol2);
                            if (!rc) rc = col_append_null(&st.o_lex);
                            if (!rc) rc = col_append_null(&st.o_lang);
                            if (!rc) rc = col_append_null(&st.o_dt);
                        }
                    } else if (have_o) {
                        rc = col_repeat(&st.o_val);
                        if (!rc) rc = col_repeat(&st.o_lex);
                        if (!rc) rc = col_repeat(&st.o_lang);
                        if (!rc) rc = col_repeat(&st.o_dt);
                    } else {
                        rc = ERR_CONF;
                    }
                }
                if (!rc) rc = kcol_append(&st.o_kind, prev_o_kind);
                if (!rc && emit_g) {
                    if (is_quads) {
                        if (fresh_g) {
                            prev_g_kind = ng_kind;
                            have_g = 1;
                            rc = (ng_kind == KIND_DEFAULT)
                                     ? col_append_null(&st.g_val)
                                     : col_append2(&st.g_val, gp1, gl1, gp2, gl2);
                        } else if (have_g) {
                            rc = col_repeat(&st.g_val);
                        } else {
                            rc = ERR_CONF;
                        }
                        if (!rc) rc = kcol_append(&st.g_kind, prev_g_kind);
                    } else { /* GRAPHS: enclosing marker */
                        if (!cur_g_set) { rc = ERR_CONF; }
                        else {
                            rc = (cur_g_kind == KIND_DEFAULT)
                                     ? col_append_null(&st.g_val)
                                     : col_append(&st.g_val, cur_g_p, cur_g_len);
                            if (!rc) rc = kcol_append(&st.g_kind, cur_g_kind);
                        }
                    }
                }
            } else if (rfield == ROW_NAME || rfield == ROW_PREFIX ||
                       rfield == ROW_DATATYPE) {
                uint64_t idx;
                const uint8_t *vp;
                int32_t vl;
                if (parse_entry(data, s, e, &idx, &vp, &vl)) { rc = ERR_CONF; break; }
                DLk *l = rfield == ROW_NAME ? &st.names
                         : rfield == ROW_PREFIX ? &st.prefixes
                                                : &st.datatypes;
                if (dlk_assign(l, (int64_t)idx, vp, vl)) { rc = ERR_CONF; break; }
            } else if (rfield == ROW_GRAPH_START && is_graphs) {
                int64_t sp = s;
                cur_g_set = 1;
                cur_g_kind = KIND_DEFAULT; /* empty body = default graph */
                cur_g_p = NULL;
                cur_g_len = 0;
                while (sp < e) {
                    uint64_t fkey;
                    if (data[sp] < 0x80) fkey = data[sp++];
                    else if (rd_varint(data, &sp, e, &fkey)) { rc = ERR_CONF; break; }
                    uint64_t ln;
                    if (rd_varint(data, &sp, e, &ln)) { rc = ERR_CONF; break; }
                    if (sp + (int64_t)ln > e) { rc = ERR_CONF; break; }
                    int field = (int)(fkey >> 3);
                    if (field == 1) {
                        const uint8_t *p1, *p2;
                        int32_t l1, l2;
                        rc = dec_iri(&st, sp, sp + (int64_t)ln, &p1, &l1, &p2, &l2);
                        if (!rc) {
                            /* concat into a persistent scratch: reuse g_val
                             * data tail?  graph names are tiny — heap copy */
                            static __thread uint8_t gbuf[8192];
                            if (l1 + l2 <= (int32_t)sizeof(gbuf)) {
                                memcpy(gbuf, p1 ? p1 : (const uint8_t *)"", l1);
                                memcpy(gbuf + l1, p2, l2);
                                cur_g_p = gbuf;
                                cur_g_len = l1 + l2;
                                cur_g_kind = KIND_IRI;
                            } else {
                                rc = ERR_UNSUP;
                            }
                        }
                    } else if (field == 2) {
                        cur_g_p = data + sp;
                        cur_g_len = (int32_t)ln;
                        cur_g_kind = KIND_BNODE;
                    } else if (field == 3) {
                        cur_g_kind = KIND_DEFAULT;
                        cur_g_p = NULL;
                        cur_g_len = 0;
                    } else {
                        rc = ERR_UNSUP; /* literal graph name */
                    }
                    break; /* general decoder takes the FIRST field */
                }
            } else if (rfield == ROW_GRAPH_END && is_graphs) {
                cur_g_set = 0;
            } else if (rfield == ROW_OPTIONS) {
                /* skip */
            } else if (rfield == ROW_NAMESPACE) {
                int64_t sp = s;
                while (sp < e && !rc) {
                    uint64_t fkey;
                    if (data[sp] < 0x80) fkey = data[sp++];
                    else if (rd_varint(data, &sp, e, &fkey)) { rc = ERR_CONF; break; }
                    uint64_t ln;
                    if (rd_varint(data, &sp, e, &ln)) { rc = ERR_CONF; break; }
                    if (sp + (int64_t)ln > e) { rc = ERR_CONF; break; }
                    if ((int)(fkey >> 3) == 2) {
                        const uint8_t *p1, *p2;
                        int32_t l1, l2;
                        rc = dec_iri(&st, sp, sp + (int64_t)ln, &p1, &l1, &p2, &l2);
                    }
                    sp += (int64_t)ln;
                }
            } else {
                rc = ERR_UNSUP;
            }
        }
    }

done:
    dlk_free(&st.names);
    dlk_free(&st.prefixes);
    dlk_free(&st.datatypes);
    if (rc) {
        col_free(&st.s_val); col_free(&st.p_val); col_free(&st.o_val);
        col_free(&st.o_lex); col_free(&st.o_lang); col_free(&st.o_dt);
        col_free(&st.g_val);
        free(st.s_kind.v.p); free(st.o_kind.v.p); free(st.g_kind.v.p);
        return rc;
    }
    DecOut *o = (DecOut *)calloc(1, sizeof(DecOut));
    if (!o) return ERR_OOM;
    o->n = st.s_val.n;
    out_col(&o->s_val, &st.s_val);
    out_col(&o->p_val, &st.p_val);
    out_col(&o->o_val, &st.o_val);
    out_col(&o->o_lex, &st.o_lex);
    out_col(&o->o_lang, &st.o_lang);
    out_col(&o->o_dt, &st.o_dt);
    out_col(&o->g_val, &st.g_val);
    o->s_kind = st.s_kind.v.p;
    o->o_kind = st.o_kind.v.p;
    o->g_kind = st.g_kind.v.p;
    col_free(&st.s_val); col_free(&st.p_val); col_free(&st.o_val);
    col_free(&st.o_lex); col_free(&st.o_lang); col_free(&st.o_dt);
    col_free(&st.g_val);
    *out_p = o;
    return 0;
}

void jelly_decode_free(DecOut *o) {
    if (!o) return;
    OutCol *cols[] = {&o->s_val, &o->p_val, &o->o_val, &o->o_lex,
                      &o->o_lang, &o->o_dt, &o->g_val};
    for (int i = 0; i < 7; i++) {
        free(cols[i]->data);
        free(cols[i]->off);
        free(cols[i]->mask);
    }
    free(o->s_kind);
    free(o->o_kind);
    free(o->g_kind);
    free(o);
}
