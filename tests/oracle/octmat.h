/* Minimal stub standing in for oblas's octmat.h: the reference's util.h only
 * needs the typedef for its repair_sym struct; none of the spec-derivation
 * sources compiled by the oracle touch octmat functionally. */
#ifndef ORACLE_OCTMAT_STUB_H
#define ORACLE_OCTMAT_STUB_H
#include <stdint.h>
typedef struct {
  uint16_t rows, cols, cols_al;
  uint8_t *data;
} octmat;
#endif
