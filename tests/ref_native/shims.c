/* BLAS/LAPACK shims for the test-only reference oracle build
 * (tests/ref_native/__init__.py): the reference's GQ/LQ core is plain C
 * with exactly two external math calls — cblas_dgemv (sort.c:43) and
 * dsyev_ (eigen.c:50) — so a ~100-line shim lets the ACTUAL reference
 * sources compile and run here (VERDICT r4 next #3: de-correlate the
 * parity yardstick from the same-author numpy transcription).
 *
 * dsyev_ implements the LAPACK contract the reference relies on for its
 * 3x3 covariances: jobz='V', ascending eigenvalues, eigenvectors as
 * columns of A (column-major). Cyclic Jacobi in f64 — simple, robust,
 * and accurate to ~1e-15 for symmetric 3x3. The workspace query returns
 * 1.0 and the solver never touches `work`, which sidesteps the
 * reference's malloc(lwork)-bytes under-allocation (eigen.c:124-125,
 * quirk Q3) without changing its behavior.
 */
#include <math.h>
#include <stddef.h>
#include <string.h>

#include "cblas.h"

void cblas_dgemv(CBLAS_ORDER order, CBLAS_TRANSPOSE trans, blasint m,
                 blasint n, double alpha, const double *a, blasint lda,
                 const double *x, blasint incx, double beta, double *y,
                 blasint incy) {
    /* Only the reference's call shape (col-major, no-trans) is supported. */
    if (order != CblasColMajor || trans != CblasNoTrans) {
        for (blasint i = 0; i < m; i++) y[i * incy] = nan("");
        return;
    }
    for (blasint i = 0; i < m; i++) {
        double acc = 0.0;
        for (blasint j = 0; j < n; j++)
            acc += a[(size_t)j * lda + i] * x[(size_t)j * incx];
        y[(size_t)i * incy] = alpha * acc + beta * y[(size_t)i * incy];
    }
}

void dsyev_(const char *jobz, const char *uplo, const int *n, double *a,
            const int *lda, double *w, double *work, const int *lwork,
            int *info) {
    (void)jobz;
    *info = 0;
    if (*lwork == -1) {           /* workspace query */
        work[0] = 1.0;
        return;
    }
    const int N = *n;
    const int LDA = *lda;
    if (N <= 0 || N > 3) {        /* the reference only solves 3x3 */
        *info = -3;
        return;
    }
    /* Build the full symmetric matrix from the populated triangle. */
    double A[3][3] = {{0}}, V[3][3] = {{0}};
    for (int j = 0; j < N; j++)
        for (int i = 0; i < N; i++)
            A[i][j] = (*uplo == 'L' || *uplo == 'l')
                ? (i >= j ? a[(size_t)j * LDA + i] : a[(size_t)i * LDA + j])
                : (i <= j ? a[(size_t)j * LDA + i] : a[(size_t)i * LDA + j]);
    for (int i = 0; i < N; i++) V[i][i] = 1.0;

    /* Cyclic Jacobi sweeps. */
    for (int sweep = 0; sweep < 64; sweep++) {
        double off = 0.0;
        for (int p = 0; p < N - 1; p++)
            for (int q = p + 1; q < N; q++)
                off += A[p][q] * A[p][q];
        if (off < 1e-300) break;
        for (int p = 0; p < N - 1; p++) {
            for (int q = p + 1; q < N; q++) {
                if (A[p][q] == 0.0) continue;
                const double theta = (A[q][q] - A[p][p]) / (2.0 * A[p][q]);
                const double t = (theta >= 0 ? 1.0 : -1.0)
                    / (fabs(theta) + sqrt(theta * theta + 1.0));
                const double c = 1.0 / sqrt(t * t + 1.0);
                const double s = t * c;
                for (int k = 0; k < N; k++) {
                    const double akp = A[k][p], akq = A[k][q];
                    A[k][p] = c * akp - s * akq;
                    A[k][q] = s * akp + c * akq;
                }
                for (int k = 0; k < N; k++) {
                    const double apk = A[p][k], aqk = A[q][k];
                    A[p][k] = c * apk - s * aqk;
                    A[q][k] = s * apk + c * aqk;
                }
                for (int k = 0; k < N; k++) {
                    const double vkp = V[k][p], vkq = V[k][q];
                    V[k][p] = c * vkp - s * vkq;
                    V[k][q] = s * vkp + c * vkq;
                }
            }
        }
    }

    /* Sort ascending; write eigenvectors into A's columns (col-major). */
    int ord[3] = {0, 1, 2};
    for (int i = 0; i < N - 1; i++)
        for (int j = i + 1; j < N; j++)
            if (A[ord[j]][ord[j]] < A[ord[i]][ord[i]]) {
                const int tmp = ord[i]; ord[i] = ord[j]; ord[j] = tmp;
            }
    for (int j = 0; j < N; j++) {
        w[j] = A[ord[j]][ord[j]];
        for (int i = 0; i < N; i++)
            a[(size_t)j * LDA + i] = V[i][ord[j]];
    }
}
