/* Flat-ABI harness over the ACTUAL reference quantizer
 * (/root/reference/lib/src/quantize/{global,local,cells,sort,cluster}.c +
 * math/pca.c), compiled unmodified from the reference tree at test time
 * (tests/ref_native/__init__.py). Marshals plain double arrays through
 * the reference's own containers and reads cluster memberships back as a
 * dense label array, so tests can pin tests/ref_oracle.py's GQ cuts /
 * termination level / LQ split sequences against the real C
 * (VERDICT r4 next #3).
 */
#include <stdbool.h>
#include <stdint.h>
#include <string.h>

#include "array/matrix2D.h"
#include "array/vector.h"
#include "quantize/global.h"
#include "quantize/local.h"

/* colors: column-major (n x 3) doubles (the reference's wire layout,
 * patolette.c:126-129). weights: NULL or n doubles. labels_out: n int32,
 * filled with the cluster index of each pixel. Returns the cluster count,
 * or -1 on internal failure. do_lq: 0 = GQ only (termination-level /
 * DP-cut pin), 1 = GQ then LQ (split-sequence pin). */
int ref_quantize_labels(const double *colors, long n, const double *weights,
                        int palette_size, int do_lq, int32_t *labels_out) {
    patolette__Matrix2D *m = patolette__Matrix2D_init(n, 3, colors);
    patolette__Vector *w = NULL;
    if (weights != NULL) {
        w = patolette__Vector_init(n);
        memcpy(w->data, weights, (size_t)n * sizeof(double));
    }

    patolette__ColorClusterArray *clusters =
        patolette__GQ_quantize(m, w, (size_t)palette_size);
    if (clusters == NULL) return -1;
    if (do_lq) {
        clusters = patolette__LQ_quantize(clusters, (size_t)palette_size,
                                          false);
        if (clusters == NULL) return -1;
    }

    for (size_t i = 0; i < clusters->length; i++) {
        patolette__ColorCluster *c =
            patolette__ColorClusterArray_index(clusters, i);
        for (size_t j = 0; j < c->indices->length; j++)
            labels_out[patolette__IndexArray_index(c->indices, j)] =
                (int32_t)i;
    }
    return (int)clusters->length;
    /* leaks m/w/clusters by design: the harness runs a handful of small
     * fixtures in a short-lived test process */
}
