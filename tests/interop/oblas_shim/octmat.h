/* Scalar stand-in for the reference's absent `deps/oblas` dependency
 * (empty git submodule, /root/reference/.gitmodules:1-3), written from the
 * reference's call sites only (lib/wrkmat.c:79-112, lib/precode.c:3-32,
 * 60-97, lib/nanorq.c:8-13,142,418-460): a dense byte matrix with rows
 * padded to an alignment stride.  It exists so the REFERENCE binaries can
 * be compiled and run for wire-format conformance tests
 * (tests/test_interop.py); it is not part of the framework's compute path.
 */
#ifndef SHIM_OCTMAT_H
#define SHIM_OCTMAT_H

#include <stdint.h>
#include <stdlib.h>

#ifndef OCTMAT_ALIGN
#define OCTMAT_ALIGN 32
#endif
#define OM_ALIGNED(k) \
  ((((size_t)(k) + OCTMAT_ALIGN - 1) / OCTMAT_ALIGN) * OCTMAT_ALIGN)

typedef struct {
  uint32_t rows;
  uint32_t cols;
  uint32_t cols_al; /* aligned row stride in bytes */
  uint8_t *data;
} octmat;

#define OM_INITIAL \
  { 0, 0, 0, NULL }
#define om_P(v) ((v).data)
#define om_R(v, r) ((v).data + (size_t)(r) * (v).cols_al)
#define om_A(v, r, c) ((v).data[(size_t)(r) * (v).cols_al + (c)])

void om_resize(octmat *m, uint32_t rows, uint32_t cols);
void om_destroy(octmat *m);

#endif
