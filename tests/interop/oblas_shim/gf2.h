/* Bit-packed GF(2) matrix standing in for oblas's gf2mat (see octmat.h
 * header comment).  API + raw-field layout reconstructed from the reference
 * call sites: include/wrkmat.h:21-22 accesses `bits` and `stride` directly
 * (stride counted in u32 WORDS, bits LSB-first within a word), and
 * lib/wrkmat.c:12,27,62,69,81-83,100 uses new/free/get/set/xor/fill, where
 * fill expands bit row i into a 0/1 byte buffer (the GF(2)->GF(256) row
 * promotion at lib/wrkmat.c:98-106). */
#ifndef SHIM_GF2_H
#define SHIM_GF2_H

#include <stdint.h>

typedef struct {
  uint32_t *bits;
  int rows;
  int cols;
  int stride; /* row stride in u32 words */
} gf2mat;

gf2mat *gf2mat_new(int rows, int cols);
void gf2mat_free(gf2mat *a);
int gf2mat_get(const gf2mat *a, int i, int j);
void gf2mat_set(gf2mat *a, int i, int j, int b);
void gf2mat_xor(gf2mat *a, const gf2mat *b, int i, int j);
void gf2mat_fill(const gf2mat *a, int i, uint8_t *dst);

#endif
