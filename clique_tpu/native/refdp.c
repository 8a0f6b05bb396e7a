/* Measured single-node baseline: the reference engine's 3-plane affine
 * DP hot loop reimplemented faithfully in C.
 *
 * The reference publishes no benchmark numbers (BASELINE.md) and this
 * environment cannot build its Rust crate (no cargo, zero egress), so
 * bench.py's vs_baseline was a cost MODEL.  This file replaces the model
 * with a measurement: the same per-cell work as
 * rust_cmd/src/alignment/alignment_matrix.rs:366-683 —
 *   - three f64 score planes (match / read-gap / ref-gap) plus a u8
 *     direction plane per score plane (create_scoring_record_3d:226-233),
 *   - per cell, each plane takes a three-way max over its predecessors
 *     with the reference's up>left>diag strict-greater tie order
 *     (three_way_max_and_direction:671-683),
 *   - terminal-row/col gap costs scaled by final_gap_multiplier
 *     (update_3d_score:618-665),
 *   - special-character rule: byte < 58 or 'N' scores
 *     special_character_score (scoring_functions.rs:100-102),
 *   - a full traceback walk from the corner (perform_3d_global_traceback
 *     :941-1086) consuming the direction planes,
 * over reads fanned across a thread pool with per-thread reusable
 * matrices, mirroring the rayon worker + thread-local prototype matrix
 * of alignment_functions.rs:90-140.
 *
 * cc -O3 gives the C loop every advantage the Rust build has; if
 * anything this flatters the baseline (no ndarray indexing overhead).
 */

#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    const uint8_t *refs;   /* [n_reads][l1] */
    const uint8_t *reads;  /* [n_reads][l2] */
    int l1, l2, n_reads;
    double match_s, mismatch_s, special_s, gap_open, gap_ext, fgm;
    /* per-thread work state */
    double *m, *ix, *iy;       /* (l1+1)*(l2+1) each */
    uint8_t *tm, *tx, *ty;     /* direction planes */
    volatile long *next;       /* shared read counter */
    double score_sum;          /* consume results (defeat DCE) */
    long ops_sum;
} worker_t;

#define UP 1
#define LEFT 2
#define DIAG 3

static inline double max3(double up, double left, double diag, uint8_t *dir)
{
    /* reference tie order: up wins only on strict >, then left, else diag
     * (alignment_matrix.rs:671-683) */
    if (up > left && up > diag) { *dir = UP; return up; }
    if (left > diag) { *dir = LEFT; return left; }
    *dir = DIAG; return diag;
}

static void align_one(worker_t *w, const uint8_t *a, const uint8_t *b)
{
    const int l1 = w->l1, l2 = w->l2, W = w->l2 + 1;
    const double NEG = -1e5; /* MAX_NEG_SCORE, alignment_matrix.rs:34 */
    double *m = w->m, *ix = w->ix, *iy = w->iy;
    uint8_t *tm = w->tm, *tx = w->tx, *ty = w->ty;

    /* boundary rows/cols with terminal-gap multiplier */
    m[0] = 0.0; ix[0] = NEG; iy[0] = NEG;
    for (int y = 1; y <= l2; y++) {
        m[y] = NEG; ix[y] = NEG;
        iy[y] = w->gap_open * w->fgm + y * w->gap_ext * w->fgm;
        ty[y] = LEFT;
    }
    for (int x = 1; x <= l1; x++) {
        m[x * W] = NEG; iy[x * W] = NEG;
        ix[x * W] = w->gap_open * w->fgm + x * w->gap_ext * w->fgm;
        tx[x * W] = UP;
    }

    for (int x = 1; x <= l1; x++) {
        const uint8_t ca = a[x - 1];
        const int row = x * W, prow = (x - 1) * W;
        const double gm_row = (x == l1) ? w->fgm : 1.0;
        for (int y = 1; y <= l2; y++) {
            const uint8_t cb = b[y - 1];
            const double gm = (gm_row != 1.0 || y == l2) ? w->fgm : 1.0;
            /* special-character rule (scoring_functions.rs:100-102) */
            double ms;
            if (ca < 58 || cb < 58 || ca == 'N' || cb == 'N')
                ms = w->special_s;
            else
                ms = (ca == cb) ? w->match_s : w->mismatch_s;

            uint8_t d;
            /* match plane: best of the three planes at (x-1, y-1) */
            m[row + y] = max3(ix[prow + y - 1], iy[prow + y - 1],
                              m[prow + y - 1], &d) + ms;
            tm[row + y] = d;
            /* read-gap plane (up): open from m / extend ix */
            {
                /* open cost unscaled: x1 = gap_open + gap_extend * gm
                 * (update_3d_score, alignment_matrix.rs:618-665) */
                double open = m[prow + y] + w->gap_open
                              + w->gap_ext * gm;
                double ext = ix[prow + y] + w->gap_ext * gm;
                double cross = iy[prow + y] + w->gap_open
                               + w->gap_ext * gm;
                ix[row + y] = max3(ext, cross, open, &d);
                tx[row + y] = d;
            }
            /* ref-gap plane (left) */
            {
                double open = m[row + y - 1] + w->gap_open
                              + w->gap_ext * gm;
                double ext = iy[row + y - 1] + w->gap_ext * gm;
                double cross = ix[row + y - 1] + w->gap_open
                               + w->gap_ext * gm;
                iy[row + y] = max3(ext, cross, open, &d);
                ty[row + y] = d;
            }
        }
    }

    /* corner + traceback walk consuming the direction planes */
    int x = l1, y = l2, plane;
    double best = m[l1 * W + l2]; plane = 0;
    if (ix[l1 * W + l2] > best) { best = ix[l1 * W + l2]; plane = 1; }
    if (iy[l1 * W + l2] > best) { best = iy[l1 * W + l2]; plane = 2; }
    long ops = 0;
    while (x > 0 || y > 0) {
        uint8_t d;
        if (x == 0) { y--; ops++; continue; }
        if (y == 0) { x--; ops++; continue; }
        if (plane == 0) {
            d = tm[x * W + y];
            x--; y--;
            plane = (d == UP) ? 1 : (d == LEFT) ? 2 : 0;
        } else if (plane == 1) {
            d = tx[x * W + y];
            x--;
            plane = (d == UP) ? 1 : (d == LEFT) ? 2 : 0;
        } else {
            d = ty[x * W + y];
            y--;
            plane = (d == UP) ? 1 : (d == LEFT) ? 2 : 0;
        }
        ops++;
    }
    w->score_sum += best;
    w->ops_sum += ops;
}

static void *worker_main(void *arg)
{
    worker_t *w = (worker_t *)arg;
    const size_t cells = (size_t)(w->l1 + 1) * (w->l2 + 1);
    w->m = malloc(cells * sizeof(double));
    w->ix = malloc(cells * sizeof(double));
    w->iy = malloc(cells * sizeof(double));
    w->tm = malloc(cells);
    w->tx = malloc(cells);
    w->ty = malloc(cells);
    for (;;) {
        long i = __sync_fetch_and_add(w->next, 1);
        if (i >= w->n_reads)
            break;
        align_one(w, w->refs + (size_t)i * w->l1,
                  w->reads + (size_t)i * w->l2);
    }
    free(w->m); free(w->ix); free(w->iy);
    free(w->tm); free(w->tx); free(w->ty);
    return NULL;
}

/* Align n_reads (ref, read) pairs over n_threads; returns total traceback
 * op count (consumes every alignment so nothing is optimized away).
 * out_score_sum receives the summed corner scores. */
long refdp_align_many(const uint8_t *refs, int l1, const uint8_t *reads,
                      int l2, long n_reads, int n_threads,
                      double *out_score_sum)
{
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 64) n_threads = 64;
    pthread_t tids[64];
    worker_t ws[64];
    volatile long next = 0;
    for (int t = 0; t < n_threads; t++) {
        memset(&ws[t], 0, sizeof(worker_t));
        ws[t].refs = refs; ws[t].reads = reads;
        ws[t].l1 = l1; ws[t].l2 = l2; ws[t].n_reads = (int)n_reads;
        ws[t].match_s = 10.0; ws[t].mismatch_s = -11.0;
        ws[t].special_s = 9.0; ws[t].gap_open = -20.0;
        ws[t].gap_ext = -1.0; ws[t].fgm = 0.25;
        ws[t].next = &next;
        pthread_create(&tids[t], NULL, worker_main, &ws[t]);
    }
    long ops = 0; double ssum = 0.0;
    for (int t = 0; t < n_threads; t++) {
        pthread_join(tids[t], NULL);
        ops += ws[t].ops_sum;
        ssum += ws[t].score_sum;
    }
    if (out_score_sum) *out_score_sum = ssum;
    return ops;
}

/* ================= collapse-stage model =================
 *
 * Measured stand-in for the reference's collapse hot loops, so
 * bench.py's chain baseline is align + collapse MEASURED instead of the
 * old asserted /2.5 factor.  Per read it runs the ingestion walks of
 * collapse.rs:427-579 / extractor.rs (CIGAR recovery, reference stretch,
 * tag extraction, AlignmentCheck — all O(L) byte loops), then the level
 * machinery of correct_tags.rs (unique-tag counting, degenerate
 * clustering) and the consensus math of consensus_builders.rs:74-165 /
 * stretcher.rs (per-column allele log-posterior over every group
 * member).  Where rust_star's clustering internals are unknowable (the
 * crate is external, only call sites exist — SURVEY section 2 hard part
 * 4), the model uses the FAST symspell-style deletion-neighborhood
 * method for the big level-0 bin, deliberately UNDERSTATING the
 * reference's cost so vs_baseline stays conservative.  Threading mirrors
 * the reference: ingestion on the rayon-like pool, sort_level
 * single-threaded (collapse.rs:859), consensus on a pooled scope
 * (consensus_builders.rs:91-96).
 */

#include <math.h>
#include <stdio.h>

#define TAGMAX 32

static inline uint64_t fnv1a(const uint8_t *s, int n)
{
    uint64_t h = 1469598103934665603ULL;
    for (int i = 0; i < n; i++) { h ^= s[i]; h *= 1099511628211ULL; }
    return h;
}

/* banded Levenshtein <= k (returns k+1 when exceeded) */
static int lev_banded(const uint8_t *a, int la, const uint8_t *b, int lb,
                      int k)
{
    if (la - lb > k || lb - la > k) return k + 1;
    int prev[TAGMAX + 2], cur[TAGMAX + 2];
    for (int j = 0; j <= lb; j++) prev[j] = j;
    for (int i = 1; i <= la; i++) {
        cur[0] = i;
        int rowmin = cur[0];
        for (int j = 1; j <= lb; j++) {
            int c = prev[j - 1] + (a[i - 1] != b[j - 1]);
            int d = prev[j] + 1, e = cur[j - 1] + 1;
            if (d < c) c = d;
            if (e < c) c = e;
            cur[j] = c;
            if (c < rowmin) rowmin = c;
        }
        if (rowmin > k) return k + 1;
        memcpy(prev, cur, (lb + 1) * sizeof(int));
    }
    return prev[lb];
}

/* open-addressing hash of fixed-length byte keys -> id */
typedef struct {
    uint64_t *h;
    int32_t *id;
    uint8_t *keys;   /* [cap_keys][klen] */
    long cap, n, klen;
} khash_t;

static void kh_init(khash_t *t, long expect, int klen)
{
    long cap = 64;
    while (cap < expect * 4) cap <<= 1;
    t->cap = cap; t->n = 0; t->klen = klen;
    t->h = calloc(cap, sizeof(uint64_t));
    t->id = malloc(cap * sizeof(int32_t));
    t->keys = malloc((size_t)expect * klen + klen);
    for (long i = 0; i < cap; i++) t->id[i] = -1;
}

static void kh_free(khash_t *t)
{
    free(t->h); free(t->id); free(t->keys);
}

/* insert-or-get: returns id, sets *fresh */
static int32_t kh_get(khash_t *t, const uint8_t *key, int *fresh)
{
    uint64_t h = fnv1a(key, t->klen);
    long i = h & (t->cap - 1);
    for (;;) {
        if (t->id[i] < 0) {
            t->id[i] = (int32_t)t->n;
            t->h[i] = h;
            memcpy(t->keys + t->n * t->klen, key, t->klen);
            t->n++;
            *fresh = 1;
            return t->id[i];
        }
        if (t->h[i] == h &&
            !memcmp(t->keys + (size_t)t->id[i] * t->klen, key, t->klen)) {
            *fresh = 0;
            return t->id[i];
        }
        i = (i + 1) & (t->cap - 1);
    }
}

/* union-find */
static int uf_find(int32_t *p, int x)
{
    while (p[x] != x) { p[x] = p[p[x]]; x = p[x]; }
    return x;
}

/* ---- stage A: per-read ingestion walks (threaded) ---- */

typedef struct {
    const uint8_t *reads;   /* [n][L] read bytes (gapless model) */
    const uint8_t *ref;     /* [L] wildcard reference */
    int L;
    long n_reads;
    uint8_t *tags;          /* out [n][2*TAGMAX]: tag0 | tag1 */
    uint8_t *ar;            /* per-thread scratch */
    volatile long *next;
    long acc;
} ing_t;

static void ingest_one(ing_t *w, const uint8_t *seq, uint8_t *tag_out)
{
    const int L = w->L;
    uint8_t *ar = w->ar, *rr = w->ar + L, *st = w->ar + 2 * L;
    /* 1. CIGAR recovery walk (recover_aligned_sequences): per-byte op
     * branch building both aligned strings */
    for (int i = 0; i < L; i++) {
        uint8_t c = seq[i];
        ar[i] = (c == '-') ? '-' : c;
        rr[i] = w->ref[i];
    }
    /* 2. reference stretch walk (stretch_sequence_to_alignment) */
    int ni = 0;
    for (int i = 0; i < L; i++)
        st[i] = (rr[i] == '-') ? '-' : w->ref[ni++];
    /* 3. tag extraction walk (extract_tagged_sequences digits) */
    int tlen[10] = {0};
    for (int i = 0; i < L; i++) {
        uint8_t c = st[i];
        if (c >= '0' && c <= '9') {
            int s = c - '0';
            if (tlen[s] < TAGMAX)
                tag_out[s * TAGMAX + tlen[s]++] = ar[i];
        }
    }
    /* 4. AlignmentCheck (collapse.rs:251-279) */
    long match = 0, tot = 0;
    for (int i = 0; i < L; i++) {
        if (st[i] > 59 && st[i] != 'N' && ar[i] > 59) {
            tot++;
            match += (st[i] == ar[i]);
        }
    }
    w->acc += match + tot;
}

static void *ingest_main(void *arg)
{
    ing_t *w = (ing_t *)arg;
    w->ar = malloc((size_t)3 * w->L);
    for (;;) {
        long i = __sync_fetch_and_add(w->next, 1);
        if (i >= w->n_reads) break;
        ingest_one(w, w->reads + (size_t)i * w->L,
                   w->tags + (size_t)i * 2 * TAGMAX);
    }
    free(w->ar);
    return NULL;
}

/* ---- consensus over key-sorted groups (threaded pool) ---- */

typedef struct {
    const uint8_t *reads;
    const int32_t *order;    /* read indices in sorted key order */
    const int64_t *bounds;   /* group start offsets, n_groups+1 */
    long n_groups;
    int L;
    volatile long *next;
    double acc;
} cons_t;

static void *cons_main(void *arg)
{
    cons_t *w = (cons_t *)arg;
    const int L = w->L;
    double *logp = malloc((size_t)L * 5 * sizeof(double));
    const double hitl = log(0.9875), missl = log(0.0125 / 3.0);
    for (;;) {
        long g = __sync_fetch_and_add(w->next, 1);
        if (g >= w->n_groups) break;
        long s = w->bounds[g], e = w->bounds[g + 1];
        for (long i = 0; i < (long)L * 5; i++) logp[i] = 0.0;
        /* per member, per column: 5-allele log add
         * (combine_qual_scores, consensus_builders.rs:429-478) */
        for (long r = s; r < e; r++) {
            const uint8_t *seq = w->reads + (size_t)w->order[r] * L;
            for (int i = 0; i < L; i++) {
                int a = (seq[i] == 'A') ? 0 : (seq[i] == 'C') ? 1 :
                        (seq[i] == 'G') ? 2 : (seq[i] == 'T') ? 3 : 4;
                double *p = logp + (size_t)i * 5;
                p[0] += missl; p[1] += missl; p[2] += missl;
                p[3] += missl; p[4] += missl;
                p[a] += hitl - missl;
            }
        }
        /* per column: softmax-normalized posterior + argmax call
         * (calculate_qual_scores:480-487, consensus_base) */
        double cs = 0.0;
        for (int i = 0; i < L; i++) {
            double *p = logp + (size_t)i * 5;
            double mx = p[0];
            int am = 0;
            for (int a = 1; a < 5; a++)
                if (p[a] > mx) { mx = p[a]; am = a; }
            double z = 0.0;
            for (int a = 0; a < 5; a++) z += exp(p[a] - mx);
            cs += mx - log(z) + am;
        }
        w->acc += cs;
    }
    free(logp);
    return NULL;
}

/* ---- sort comparator ---- */

static int g_keylen;
static int keycmp(const void *a, const void *b)
{
    return memcmp(a, b, g_keylen);
}

/* ---- degenerate clustering of one bin's unique tags ----
 * symspell-style deletion neighborhoods (d<=2) + lev verify + union-find:
 * the fast method, deliberately flattering the baseline. */
static long cluster_uniques(khash_t *uni, int tlen, int max_distance)
{
    long n = uni->n;
    int32_t *parent = malloc(n * sizeof(int32_t));
    for (long i = 0; i < n; i++) parent[i] = (int32_t)i;
    khash_t var;
    long nvar_est = n * (1 + tlen + (long)tlen * (tlen - 1) / 2);
    kh_init(&var, nvar_est, tlen);   /* variants padded to tlen */
    int32_t *owner = malloc(nvar_est * sizeof(int32_t));
    uint8_t v1[TAGMAX], v2[TAGMAX];
    long merges = 0;

    for (long u = 0; u < n; u++) {
        const uint8_t *tag = uni->keys + (size_t)u * tlen;
        /* d=0 plus all 1- and 2-deletion variants, zero-padded;
         * del == -1 means "no deletion at this level" */
        for (int del1 = -1; del1 < tlen; del1++) {
            int l1v = 0;
            for (int i = 0; i < tlen; i++)
                if (i != del1) v1[l1v++] = tag[i];
            int d2hi = (del1 >= 0 && max_distance >= 2) ? l1v : 0;
            for (int del2 = -1; del2 < d2hi; del2++) {
                int l2v = 0;
                for (int i = 0; i < l1v; i++)
                    if (i != del2) v2[l2v++] = v1[i];
                memset(v2 + l2v, 0, tlen - l2v);
                int fresh;
                int32_t vid = kh_get(&var, v2, &fresh);
                if (fresh) {
                    owner[vid] = (int32_t)u;
                } else {
                    int32_t o = owner[vid];
                    if (uf_find(parent, o) != uf_find(parent, (int)u)) {
                        const uint8_t *ot = uni->keys + (size_t)o * tlen;
                        if (lev_banded(tag, tlen, ot, tlen, max_distance)
                                <= max_distance) {
                            parent[uf_find(parent, (int)u)] =
                                uf_find(parent, o);
                            merges++;
                        }
                    }
                }
                if (del1 < 0) break;   /* d=0 string: no second loop */
            }
        }
    }
    kh_free(&var);
    free(owner);
    free(parent);
    return merges;
}

/* Full collapse-stage model.  reads: [n][L] gapless read bytes aligned
 * under ref (wildcard digits mark the tag zones, '0' and '1').
 * Returns a consumed checksum (callers time the wall clock). */
double refdp_collapse_model(const uint8_t *reads, const uint8_t *ref,
                            int L, long n_reads, int t0_len, int t1_len,
                            int max_distance, int n_threads)
{
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 64) n_threads = 64;
    double acc = 0.0;

    /* stage A: ingestion (threaded like the rayon pool) */
    uint8_t *tags = malloc((size_t)n_reads * 2 * TAGMAX);
    {
        pthread_t tids[64];
        ing_t ws[64];
        volatile long next = 0;
        for (int t = 0; t < n_threads; t++) {
            memset(&ws[t], 0, sizeof(ing_t));
            ws[t].reads = reads; ws[t].ref = ref; ws[t].L = L;
            ws[t].n_reads = n_reads; ws[t].tags = tags;
            ws[t].next = &next;
            pthread_create(&tids[t], NULL, ingest_main, &ws[t]);
        }
        for (int t = 0; t < n_threads; t++) {
            pthread_join(tids[t], NULL);
            acc += (double)ws[t].acc;
        }
    }

    /* level 0: global unique-tag0 count + degenerate clustering
     * (sort_level is single-threaded, collapse.rs:859-992) */
    khash_t uni0;
    kh_init(&uni0, n_reads, t0_len);
    for (long r = 0; r < n_reads; r++) {
        int fresh;
        kh_get(&uni0, tags + (size_t)r * 2 * TAGMAX, &fresh);
    }
    acc += (double)cluster_uniques(&uni0, t0_len, max_distance);

    /* sort by (tag0, tag1) — the shardio external sort modeled as one
     * in-memory qsort (flatters the baseline) */
    int klen = t0_len + t1_len + 4;
    uint8_t *keys = malloc((size_t)n_reads * klen);
    for (long r = 0; r < n_reads; r++) {
        uint8_t *k = keys + (size_t)r * klen;
        memcpy(k, tags + (size_t)r * 2 * TAGMAX, t0_len);
        memcpy(k + t0_len, tags + (size_t)r * 2 * TAGMAX + TAGMAX, t1_len);
        int32_t ri = (int32_t)r;
        memcpy(k + t0_len + t1_len, &ri, 4);
    }
    g_keylen = t0_len + t1_len;
    qsort(keys, n_reads, klen, keycmp);

    /* level 1: per tag0-run unique-tag1 clustering (small bins: direct
     * pairwise lev, what a trie degenerates to at these sizes) */
    long run_start = 0;
    khash_t uni1;
    kh_init(&uni1, 4096, t1_len);
    for (long r = 1; r <= n_reads; r++) {
        if (r == n_reads ||
            memcmp(keys + (size_t)r * klen,
                   keys + (size_t)run_start * klen, t0_len)) {
            uni1.n = 0;
            for (long i = 0; i < uni1.cap; i++) uni1.id[i] = -1;
            for (long i = run_start; i < r; i++) {
                int fresh;
                kh_get(&uni1, keys + (size_t)i * klen + t0_len, &fresh);
            }
            long nu = uni1.n;
            for (long a = 0; a < nu; a++)
                for (long b = a + 1; b < nu; b++)
                    acc += lev_banded(uni1.keys + (size_t)a * t1_len,
                                      t1_len,
                                      uni1.keys + (size_t)b * t1_len,
                                      t1_len, max_distance);
            run_start = r;
        }
    }
    kh_free(&uni1);
    kh_free(&uni0);

    /* group bounds on the full (tag0, tag1) key */
    int32_t *order = malloc(n_reads * sizeof(int32_t));
    int64_t *bounds = malloc((n_reads + 1) * sizeof(int64_t));
    long n_groups = 0;
    for (long r = 0; r < n_reads; r++) {
        memcpy(&order[r], keys + (size_t)r * klen + t0_len + t1_len, 4);
        if (r == 0 || memcmp(keys + (size_t)r * klen,
                             keys + (size_t)(r - 1) * klen,
                             t0_len + t1_len))
            bounds[n_groups++] = r;
    }
    bounds[n_groups] = n_reads;

    /* consensus scope (threaded, consensus_builders.rs:91-96) */
    {
        pthread_t tids[64];
        cons_t ws[64];
        volatile long next = 0;
        for (int t = 0; t < n_threads; t++) {
            memset(&ws[t], 0, sizeof(cons_t));
            ws[t].reads = reads; ws[t].order = order;
            ws[t].bounds = bounds; ws[t].n_groups = n_groups;
            ws[t].L = L; ws[t].next = &next;
            pthread_create(&tids[t], NULL, cons_main, &ws[t]);
        }
        for (int t = 0; t < n_threads; t++) {
            pthread_join(tids[t], NULL);
            acc += ws[t].acc;
        }
    }

    free(order); free(bounds); free(keys); free(tags);
    return acc;
}
