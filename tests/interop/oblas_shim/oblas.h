/* Scalar GF(256) row kernels standing in for oblas (see octmat.h header
 * comment).  API reconstructed from the reference call sites:
 *   oaxpy      lib/precode.c:18, lib/wrkmat.c:79,104 — row i of a ^= u (*)
 *              row j of b over k payload bytes (aligned stride)
 *   oscal      lib/precode.c:20, lib/wrkmat.c:112    — row i of a *= u
 *   oswaprow   lib/precode.c:7                        — swap rows i and j
 *   oaxpy_b32  lib/wrkmat.c:91 — row i of a ^= u (*) a bit-packed GF(2)
 *              row (u32 words, LSB-first), i.e. a[c] ^= bit(c) ? u : 0
 * Field tables are the standard RFC 6330 GF(2^8) with reducing polynomial
 * x^8+x^4+x^3+x^2+1 (0x11D) and generator alpha=2 (RFC 6330 §5.7.2);
 * OCT_EXP is doubled so EXP[LOG[a]+LOG[b]] needs no modular reduction. */
#ifndef SHIM_OBLAS_H
#define SHIM_OBLAS_H

#include <stdint.h>

#include "octmat.h"

extern uint8_t OCT_EXP[510];
extern uint8_t OCT_LOG[256];
extern uint8_t OCT_INV[256];

void oaxpy(uint8_t *a, const uint8_t *b, int i, int j, int k, uint8_t u);
void oscal(uint8_t *a, int i, int k, uint8_t u);
void oswaprow(uint8_t *a, int i, int j, int k);
void oaxpy_b32(uint8_t *a, const uint32_t *bits, int i, int k, uint8_t u);

#endif
