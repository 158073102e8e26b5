/* Minimal cblas declaration shim for compiling the reference's own C
 * quantizer sources (/root/reference/lib/src/quantize, math) into a
 * test-only oracle library without an OpenBLAS install. Only the one
 * entry point the reference uses (sort.c:43 cblas_dgemv) is declared;
 * the implementation lives in ../shims.c. */
#pragma once

typedef enum { CblasRowMajor = 101, CblasColMajor = 102 } CBLAS_ORDER;
typedef enum {
    CblasNoTrans = 111,
    CblasTrans = 112,
    CblasConjTrans = 113
} CBLAS_TRANSPOSE;

typedef int blasint;

void cblas_dgemv(CBLAS_ORDER order, CBLAS_TRANSPOSE trans, blasint m,
                 blasint n, double alpha, const double *a, blasint lda,
                 const double *x, blasint incx, double beta, double *y,
                 blasint incy);
