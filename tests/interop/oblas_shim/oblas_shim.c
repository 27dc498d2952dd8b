/* Scalar oblas shim implementation — see the header comments in octmat.h /
 * oblas.h / gf2.h.  Correctness over speed: this code only runs inside the
 * conformance tests (tests/test_interop.py) to let the reference
 * encode/decode binaries build and exchange wire streams with our
 * framework. */
#include <stdlib.h>
#include <string.h>

#include "gf2.h"
#include "oblas.h"
#include "octmat.h"

uint8_t OCT_EXP[510];
uint8_t OCT_LOG[256];
uint8_t OCT_INV[256];

__attribute__((constructor)) static void gf256_tables_init(void) {
  /* alpha = 2 over GF(2^8)/0x11D (RFC 6330 §5.7.2) */
  unsigned x = 1;
  for (int i = 0; i < 255; i++) {
    OCT_EXP[i] = (uint8_t)x;
    OCT_LOG[x] = (uint8_t)i;
    x <<= 1;
    if (x & 0x100)
      x ^= 0x11D;
  }
  for (int i = 255; i < 510; i++)
    OCT_EXP[i] = OCT_EXP[i - 255];
  OCT_LOG[0] = 0; /* undefined; callers guard zero */
  OCT_INV[0] = 0;
  for (int v = 1; v < 256; v++)
    OCT_INV[v] = OCT_EXP[255 - OCT_LOG[v]];
}

void om_resize(octmat *m, uint32_t rows, uint32_t cols) {
  if (m->data)
    free(m->data);
  m->rows = rows;
  m->cols = cols;
  m->cols_al = (uint32_t)OM_ALIGNED(cols);
  m->data = calloc((size_t)rows, m->cols_al);
}

void om_destroy(octmat *m) {
  if (m->data)
    free(m->data);
  m->data = NULL;
  m->rows = m->cols = m->cols_al = 0;
}

void oaxpy(uint8_t *a, const uint8_t *b, int i, int j, int k, uint8_t u) {
  size_t st = OM_ALIGNED(k);
  uint8_t *ar = a + (size_t)i * st;
  const uint8_t *br = b + (size_t)j * st;
  if (u == 0)
    return;
  if (u == 1) {
    for (int c = 0; c < k; c++)
      ar[c] ^= br[c];
    return;
  }
  const unsigned lu = OCT_LOG[u];
  for (int c = 0; c < k; c++)
    if (br[c])
      ar[c] ^= OCT_EXP[OCT_LOG[br[c]] + lu];
}

void oscal(uint8_t *a, int i, int k, uint8_t u) {
  uint8_t *ar = a + (size_t)i * OM_ALIGNED(k);
  if (u == 1)
    return;
  if (u == 0) {
    memset(ar, 0, (size_t)k);
    return;
  }
  const unsigned lu = OCT_LOG[u];
  for (int c = 0; c < k; c++)
    if (ar[c])
      ar[c] = OCT_EXP[OCT_LOG[ar[c]] + lu];
}

void oswaprow(uint8_t *a, int i, int j, int k) {
  size_t st = OM_ALIGNED(k);
  uint8_t *ar = a + (size_t)i * st, *br = a + (size_t)j * st;
  for (int c = 0; c < k; c++) {
    uint8_t t = ar[c];
    ar[c] = br[c];
    br[c] = t;
  }
}

void oaxpy_b32(uint8_t *a, const uint32_t *bits, int i, int k, uint8_t u) {
  uint8_t *ar = a + (size_t)i * OM_ALIGNED(k);
  if (u == 0)
    return;
  for (int c = 0; c < k; c++)
    if ((bits[c / 32] >> (c % 32)) & 1)
      ar[c] ^= u;
}

gf2mat *gf2mat_new(int rows, int cols) {
  gf2mat *a = calloc(1, sizeof(gf2mat));
  a->rows = rows;
  a->cols = cols;
  a->stride = (cols + 31) / 32;
  a->bits = calloc((size_t)rows * a->stride, sizeof(uint32_t));
  return a;
}

void gf2mat_free(gf2mat *a) {
  if (!a)
    return;
  free(a->bits);
  free(a);
}

int gf2mat_get(const gf2mat *a, int i, int j) {
  return (a->bits[(size_t)i * a->stride + j / 32] >> (j % 32)) & 1;
}

void gf2mat_set(gf2mat *a, int i, int j, int b) {
  uint32_t *w = a->bits + (size_t)i * a->stride + j / 32;
  if (b)
    *w |= 1u << (j % 32);
  else
    *w &= ~(1u << (j % 32));
}

void gf2mat_xor(gf2mat *a, const gf2mat *b, int i, int j) {
  uint32_t *ar = a->bits + (size_t)i * a->stride;
  const uint32_t *br = b->bits + (size_t)j * b->stride;
  for (int w = 0; w < a->stride; w++)
    ar[w] ^= br[w];
}

void gf2mat_fill(const gf2mat *a, int i, uint8_t *dst) {
  for (int j = 0; j < a->cols; j++)
    dst[j] = (uint8_t)gf2mat_get(a, i, j);
}
