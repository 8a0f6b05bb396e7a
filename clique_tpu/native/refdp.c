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
