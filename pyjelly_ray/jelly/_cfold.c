/* Sequential Jelly encoder fold, compiled — the per-row protocol loop of
 * pyjelly_ray/jelly/encode_fast.py::_encode_triples translated 1:1 to C.
 *
 * Byte-identical by construction: every emission path (lookup-entry rows,
 * prefix/name delta ids, repeated-term suppression, literal fields, frame
 * cuts) mirrors the Python fold exactly; the parity grid in
 * tests/test_encode_fast.py pins it against both the Python fast path and
 * the general encoder.  This is the same lever the reference takes with
 * mypyc AOT compilation of its hot modules (/root/reference/pyproject.toml:25-43)
 * — here as a ctypes-loaded shared object built once per host by
 * pyjelly_ray/jelly/cfold.py.
 *
 * All inputs are precomputed in Python (dictionary encoding, split_iri per
 * unique, change masks); the C side only runs the inherently sequential
 * LRU/delta fold and byte assembly, so the Python fallback stays the
 * single source of semantics.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define MISSING (-1)
#define KIND_IRI 1
#define KIND_LITERAL 3
#define KIND_DEFAULT 4
#define ROW_NAME 9
#define ROW_PREFIX 10
#define ROW_DATATYPE 11

/* ------------------------------ growable buffer -------------------------- */

typedef struct {
    uint8_t *p;
    int64_t len, cap;
} Buf;

static int buf_init(Buf *b, int64_t cap) {
    b->p = (uint8_t *)malloc(cap);
    b->len = 0;
    b->cap = cap;
    return b->p ? 0 : -1;
}

static int buf_reserve(Buf *b, int64_t extra) {
    if (b->len + extra <= b->cap) return 0;
    int64_t nc = b->cap * 2;
    while (nc < b->len + extra) nc *= 2;
    uint8_t *np = (uint8_t *)realloc(b->p, nc);
    if (!np) return -1;
    b->p = np;
    b->cap = nc;
    return 0;
}

static inline int buf_byte(Buf *b, uint8_t v) {
    if (buf_reserve(b, 1)) return -1;
    b->p[b->len++] = v;
    return 0;
}

static inline int buf_bytes(Buf *b, const uint8_t *src, int64_t n) {
    if (buf_reserve(b, n)) return -1;
    memcpy(b->p + b->len, src, n);
    b->len += n;
    return 0;
}

static inline int buf_varint(Buf *b, uint64_t v) {
    if (buf_reserve(b, 10)) return -1;
    while (v >= 0x80) {
        b->p[b->len++] = (uint8_t)((v & 0x7F) | 0x80);
        v >>= 7;
    }
    b->p[b->len++] = (uint8_t)v;
    return 0;
}

static inline int vsize(uint64_t v) {
    int n = 1;
    while (v >= 0x80) {
        v >>= 7;
        n++;
    }
    return n;
}

/* tag byte (field<<3 | 2) + len varint + payload — _tag_len */
static inline int buf_tag_len(Buf *b, int field, const uint8_t *payload, int64_t n) {
    if (buf_byte(b, (uint8_t)((field << 3) | 2))) return -1;
    if (buf_varint(b, (uint64_t)n)) return -1;
    return buf_bytes(b, payload, n);
}

/* ------------------------- dense-int LRU lookup --------------------------- */
/* Mirrors encode_fast._IntLookup (itself mirroring the reference's
 * serialize/lookup.py LRU): keys are dense dictionary ids, so the map is a
 * flat array; recency is an intrusive doubly-linked list. */

typedef struct {
    int32_t *index_of; /* key -> 1-based slot index, 0 = absent */
    int32_t *prev_k, *next_k; /* LRU list over keys; -1 ends */
    int32_t head, tail; /* head = least recent */
    int32_t max_size, count, full;
    int32_t last_assigned, last_reused;
} Lk;

static int lk_init(Lk *l, int32_t max_size, int64_t n_keys) {
    l->max_size = max_size;
    l->count = 0;
    l->full = 0;
    l->last_assigned = 0;
    l->last_reused = 0;
    l->head = l->tail = -1;
    if (n_keys == 0) n_keys = 1;
    l->index_of = (int32_t *)calloc(n_keys, sizeof(int32_t));
    l->prev_k = (int32_t *)malloc(n_keys * sizeof(int32_t));
    l->next_k = (int32_t *)malloc(n_keys * sizeof(int32_t));
    return (l->index_of && l->prev_k && l->next_k) ? 0 : -1;
}

static void lk_free(Lk *l) {
    free(l->index_of);
    free(l->prev_k);
    free(l->next_k);
}

static inline void lk_unlink(Lk *l, int32_t k) {
    int32_t p = l->prev_k[k], n = l->next_k[k];
    if (p >= 0) l->next_k[p] = n; else l->head = n;
    if (n >= 0) l->prev_k[n] = p; else l->tail = p;
}

static inline void lk_push_tail(Lk *l, int32_t k) {
    l->prev_k[k] = l->tail;
    l->next_k[k] = -1;
    if (l->tail >= 0) l->next_k[l->tail] = k; else l->head = k;
    l->tail = k;
}

/* entry_id: returns -1 for "already present" (None), else the wire entry id
 * (0 = sequential).  -2 signals the size-0 conformance error. */
static inline int32_t lk_entry_id(Lk *l, int32_t key) {
    if (l->index_of[key]) {
        lk_unlink(l, key);
        lk_push_tail(l, key); /* move_to_end */
        return -1;
    }
    if (!l->max_size) return -2;
    int32_t index;
    if (l->full) {
        int32_t h = l->head; /* popitem(last=False) */
        index = l->index_of[h];
        l->index_of[h] = 0;
        lk_unlink(l, h);
        l->index_of[key] = index;
        lk_push_tail(l, key);
    } else {
        index = ++l->count;
        l->index_of[key] = index;
        if (index == l->max_size) l->full = 1;
        lk_push_tail(l, key);
    }
    int32_t previous = l->last_assigned;
    l->last_assigned = index;
    return index == previous + 1 ? 0 : index;
}

static inline int32_t lk_use(Lk *l, int32_t key) {
    lk_unlink(l, key);
    lk_push_tail(l, key);
    int32_t index = l->index_of[key];
    l->last_reused = index;
    return index;
}

/* ------------------------------ fold state -------------------------------- */

typedef struct {
    Buf out, frame, body, lit;
    int64_t row_count, frame_size;
    Lk prefixes, names, datatypes;
    /* immutable tables */
    const int64_t *pref_of, *name_of;
    const uint8_t *val_buf, *pref_buf, *name_buf, *lex_buf, *lang_buf, *dt_buf;
    const int64_t *val_off, *pref_off, *name_off, *lex_off, *lang_off, *dt_off;
    const uint8_t *dt_skip;
    const int64_t *lex_idx, *lang_idx, *dt_idx;
    int64_t empty_pref_id;
    int use_prefixes;
    int err; /* sticky: -1 oom, -2 conformance */
} St;

/* emit_entry — one lookup-entry row straight into the frame */
static void emit_entry(St *st, int row_type, int32_t entry_id,
                       const uint8_t *payload, int64_t np) {
    if (st->err) return;
    Buf *f = &st->frame;
    int64_t e = entry_id ? (entry_id < 0x80 ? 2 : 3) : 0;
    if (np) e += 1 + vsize((uint64_t)np) + np;
    int64_t r = 1 + vsize((uint64_t)e) + e;
    if (buf_byte(f, 0x0A) || buf_varint(f, (uint64_t)r) ||
        buf_byte(f, (uint8_t)((row_type << 3) | 2)) || buf_varint(f, (uint64_t)e)) {
        st->err = -1;
        return;
    }
    if (entry_id) {
        if (buf_byte(f, 8) || buf_varint(f, (uint64_t)entry_id)) {
            st->err = -1;
            return;
        }
    }
    if (np) {
        if (buf_byte(f, 0x12) || buf_varint(f, (uint64_t)np) ||
            buf_bytes(f, payload, np))
            st->err = -1;
    }
}

/* encode_iri_into — slot IRI with prefix/name delta ids; entry rows → frame */
static void encode_iri(St *st, Buf *body, int field, int64_t gid) {
    if (st->err) return;
    int32_t nid = (int32_t)st->name_of[gid];
    int32_t prefix_id = 0;
    if (st->use_prefixes) {
        int32_t pid = (int32_t)st->pref_of[gid];
        int32_t pe = lk_entry_id(&st->prefixes, pid);
        if (pe == -2) {
            st->err = -2;
            return;
        }
        int32_t prev = st->prefixes.last_reused;
        if (pe >= 0) {
            emit_entry(st, ROW_PREFIX, pe, st->pref_buf + st->pref_off[pid],
                       st->pref_off[pid + 1] - st->pref_off[pid]);
            st->row_count++;
        }
        if (pid == st->empty_pref_id && prev == 0) {
            prefix_id = 0; /* ref rule: no table touch, last_reused stays 0 */
        } else if (pe >= 0) {
            /* fresh insert is already most-recent: use() == last_assigned */
            int32_t index = st->prefixes.last_assigned;
            st->prefixes.last_reused = index;
            prefix_id = prev == 0 ? index : (index == prev ? 0 : index);
        } else {
            int32_t index = lk_use(&st->prefixes, pid);
            prefix_id = prev == 0 ? index : (index == prev ? 0 : index);
        }
    }
    int32_t ne = lk_entry_id(&st->names, nid);
    if (ne == -2) {
        st->err = -2;
        return;
    }
    int32_t prev_n = st->names.last_reused;
    int32_t n_index;
    if (ne >= 0) {
        emit_entry(st, ROW_NAME, ne, st->name_buf + st->name_off[nid],
                   st->name_off[nid + 1] - st->name_off[nid]);
        st->row_count++;
        n_index = st->names.last_assigned;
        st->names.last_reused = n_index;
    } else {
        n_index = lk_use(&st->names, nid);
    }
    int32_t name_id = n_index == prev_n + 1 ? 0 : n_index;
    int blen = (prefix_id ? (prefix_id < 0x80 ? 2 : 3) : 0) +
               (name_id ? (name_id < 0x80 ? 2 : 3) : 0);
    if (buf_byte(body, (uint8_t)((field << 3) | 2)) || buf_byte(body, (uint8_t)blen)) {
        st->err = -1;
        return;
    }
    if (prefix_id) {
        if (buf_byte(body, 8) || buf_varint(body, (uint64_t)prefix_id)) {
            st->err = -1;
            return;
        }
    }
    if (name_id) {
        if (buf_byte(body, 16) || buf_varint(body, (uint64_t)name_id)) st->err = -1;
    }
}

/* encode_literal — builds the RdfLiteral message into st->lit */
static void encode_literal(St *st, int64_t i) {
    if (st->err) return;
    st->lit.len = 0;
    int64_t di = st->dt_idx[i];
    int32_t datatype_id = 0;
    if (di != MISSING && !st->dt_skip[di]) {
        if (st->datatypes.max_size == 0) {
            st->err = -2;
            return;
        }
        int32_t de = lk_entry_id(&st->datatypes, (int32_t)di);
        if (de >= 0) {
            emit_entry(st, ROW_DATATYPE, de, st->dt_buf + st->dt_off[di],
                       st->dt_off[di + 1] - st->dt_off[di]);
            st->row_count++;
        }
        datatype_id = lk_use(&st->datatypes, (int32_t)di);
    }
    int64_t lx = st->lex_idx[i];
    int64_t ln = st->lex_off[lx + 1] - st->lex_off[lx];
    if (ln) {
        if (buf_tag_len(&st->lit, 1, st->lex_buf + st->lex_off[lx], ln)) {
            st->err = -1;
            return;
        }
    }
    int64_t li = st->lang_idx[i];
    if (li != MISSING) {
        int64_t lgn = st->lang_off[li + 1] - st->lang_off[li];
        if (lgn) {
            if (buf_tag_len(&st->lit, 2, st->lang_buf + st->lang_off[li], lgn)) {
                st->err = -1;
                return;
            }
        }
    }
    if (datatype_id) {
        if (buf_byte(&st->lit, 3 << 3) || buf_varint(&st->lit, (uint64_t)datatype_id))
            st->err = -1;
    }
}

/* cut the open frame into the output stream (varint length prefix) */
static void cut_frame(St *st) {
    if (st->err) return;
    if (buf_varint(&st->out, (uint64_t)st->frame.len) ||
        buf_bytes(&st->out, st->frame.p, st->frame.len))
        st->err = -1;
    st->frame.len = 0;
}

/* ------------------------------- entry point ------------------------------ */

int64_t jelly_encode_fold(
    int64_t n, int mode /*0=triples,1=quads,2=graphs*/, int use_prefixes,
    const uint8_t *s_ch, const uint8_t *p_ch, const uint8_t *o_ch,
    const uint8_t *g_ch, const uint8_t *s_is_iri, const int64_t *o_kind,
    const int64_t *g_kind, const int64_t *sg, const int64_t *pg,
    const int64_t *og, const int64_t *gg,
    const int64_t *pref_of, const int64_t *name_of,
    const uint8_t *val_buf, const int64_t *val_off,
    const uint8_t *pref_buf, const int64_t *pref_off, int64_t n_pref,
    const uint8_t *name_buf, const int64_t *name_off, int64_t n_name,
    const int64_t *lex_idx, const int64_t *lang_idx, const int64_t *dt_idx,
    const uint8_t *lex_buf, const int64_t *lex_off,
    const uint8_t *lang_buf, const int64_t *lang_off,
    const uint8_t *dt_buf, const int64_t *dt_off, int64_t n_dt,
    const uint8_t *dt_skip,
    int64_t max_prefixes, int64_t max_names, int64_t max_datatypes,
    int64_t empty_pref_id,
    const uint8_t *options_row, int64_t options_row_len,
    int64_t frame_size,
    uint8_t **out_p, int64_t *out_len)
{
    St st;
    memset(&st, 0, sizeof(st));
    st.frame_size = frame_size;
    st.use_prefixes = use_prefixes;
    st.pref_of = pref_of;
    st.name_of = name_of;
    st.val_buf = val_buf;
    st.val_off = val_off;
    st.pref_buf = pref_buf;
    st.pref_off = pref_off;
    st.name_buf = name_buf;
    st.name_off = name_off;
    st.lex_buf = lex_buf;
    st.lex_off = lex_off;
    st.lang_buf = lang_buf;
    st.lang_off = lang_off;
    st.dt_buf = dt_buf;
    st.dt_off = dt_off;
    st.dt_skip = dt_skip;
    st.lex_idx = lex_idx;
    st.lang_idx = lang_idx;
    st.dt_idx = dt_idx;
    st.empty_pref_id = empty_pref_id;
    if (buf_init(&st.out, 1 << 16) || buf_init(&st.frame, 1 << 14) ||
        buf_init(&st.body, 1 << 10) || buf_init(&st.lit, 1 << 10))
        return -1;
    if (lk_init(&st.prefixes, (int32_t)max_prefixes, n_pref) ||
        lk_init(&st.names, (int32_t)max_names, n_name) ||
        lk_init(&st.datatypes, (int32_t)max_datatypes, n_dt)) {
        st.err = -1;
        goto done;
    }

    /* options row opens the first frame */
    st.row_count = 1;
    if (buf_tag_len(&st.frame, 1, options_row, options_row_len)) {
        st.err = -1;
        goto done;
    }

    int quads = mode == 1;
    int graphs = mode == 2;
    for (int64_t i = 0; i < n && !st.err; i++) {
        Buf *f0 = &st.frame;
        if (graphs && g_ch[i]) {
            if (i) { /* RdfGraphEnd row; MAY cut (general-encoder parity) */
                if (buf_byte(f0, 0x0A) || buf_byte(f0, 2) ||
                    buf_byte(f0, (5 << 3) | 2) || buf_byte(f0, 0)) {
                    st.err = -1;
                    break;
                }
                st.row_count++;
                if (st.row_count >= st.frame_size) {
                    cut_frame(&st);
                    st.row_count = 0;
                }
            }
            /* RdfGraphStart row: term in fields 1(iri)/2(bnode)/3(default);
             * entry rows land in the frame first; NO cut check after */
            st.lit.len = 0;
            int64_t gk = g_kind[i];
            if (gk == KIND_IRI) {
                encode_iri(&st, &st.lit, 1, gg[i]);
            } else if (gk == KIND_DEFAULT) {
                if (buf_byte(&st.lit, 0x1A) || buf_byte(&st.lit, 0)) st.err = -1;
            } else {
                int64_t v = gg[i];
                if (buf_tag_len(&st.lit, 2, val_buf + val_off[v],
                                val_off[v + 1] - val_off[v]))
                    st.err = -1;
            }
            if (st.err) break;
            int64_t gb = st.lit.len;
            if (buf_byte(f0, 0x0A) ||
                buf_varint(f0, (uint64_t)(1 + vsize((uint64_t)gb) + gb)) ||
                buf_byte(f0, (4 << 3) | 2) || buf_varint(f0, (uint64_t)gb) ||
                buf_bytes(f0, st.lit.p, gb)) {
                st.err = -1;
                break;
            }
            st.row_count++;
        }
        Buf *body = &st.body;
        body->len = 0;
        if (s_ch[i]) {
            if (s_is_iri[i]) {
                encode_iri(&st, body, 1, sg[i]);
            } else {
                int64_t v = sg[i];
                if (buf_tag_len(body, 2, st.val_buf + st.val_off[v],
                                st.val_off[v + 1] - st.val_off[v]))
                    st.err = -1;
            }
        }
        if (p_ch[i]) encode_iri(&st, body, 5, pg[i]);
        if (o_ch[i] && !st.err) {
            int64_t ok = o_kind[i];
            if (ok == KIND_IRI) {
                encode_iri(&st, body, 9, og[i]);
            } else if (ok == KIND_LITERAL) {
                encode_literal(&st, i);
                if (!st.err &&
                    buf_tag_len(body, 11, st.lit.p, st.lit.len))
                    st.err = -1;
            } else {
                int64_t v = og[i];
                if (buf_tag_len(body, 10, st.val_buf + st.val_off[v],
                                st.val_off[v + 1] - st.val_off[v]))
                    st.err = -1;
            }
        }
        if (quads && g_ch[i] && !st.err) {
            int64_t gk = g_kind[i];
            if (gk == KIND_IRI) {
                encode_iri(&st, body, 13, gg[i]);
            } else if (gk == KIND_DEFAULT) {
                if (buf_byte(body, 0x7A) || buf_byte(body, 0)) st.err = -1;
            } else {
                int64_t v = gg[i];
                if (buf_tag_len(body, 14, st.val_buf + st.val_off[v],
                                st.val_off[v + 1] - st.val_off[v]))
                    st.err = -1;
            }
        }
        if (st.err) break;
        int64_t nb = body->len;
        Buf *f = &st.frame;
        if (buf_byte(f, 0x0A) ||
            buf_varint(f, (uint64_t)(1 + vsize((uint64_t)nb) + nb)) ||
            buf_byte(f, quads ? (uint8_t)((3 << 3) | 2) : 0x12) ||
            buf_varint(f, (uint64_t)nb) || buf_bytes(f, body->p, nb)) {
            st.err = -1;
            break;
        }
        st.row_count++;
        if (st.row_count >= st.frame_size) {
            cut_frame(&st);
            st.row_count = 0;
        }
    }
    if (!st.err && graphs && n > 0) {
        Buf *f0 = &st.frame; /* close the last graph; may cut (parity) */
        if (buf_byte(f0, 0x0A) || buf_byte(f0, 2) ||
            buf_byte(f0, (5 << 3) | 2) || buf_byte(f0, 0)) {
            st.err = -1;
        } else {
            st.row_count++;
            if (st.row_count >= st.frame_size) {
                cut_frame(&st);
                st.row_count = 0;
            }
        }
    }
    if (!st.err && st.row_count) cut_frame(&st);

done:
    lk_free(&st.prefixes);
    lk_free(&st.names);
    lk_free(&st.datatypes);
    free(st.frame.p);
    free(st.body.p);
    free(st.lit.p);
    if (st.err) {
        free(st.out.p);
        return st.err;
    }
    *out_p = st.out.p;
    *out_len = st.out.len;
    return 0;
}

void jelly_free(uint8_t *p) { free(p); }
