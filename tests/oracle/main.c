/* Golden-vector generator: compiles the *reference's* pure spec-derivation
 * sources (lib/rand.c, lib/tuple.c, lib/params.c — no oblas dependency
 * beyond a struct typedef stub) and prints Rand/Tuple/params/LT-neighbor
 * values for a grid of inputs.  Used by tests/test_rfc_oracle.py to check
 * our vectorized NumPy implementations bit-for-bit against the reference.
 * The reference tree is referenced in place at /root/reference; nothing is
 * copied into the framework. */
#include <stdio.h>
#include <stdlib.h>

#include "params.h"
#include "rand.h"
#include "tuple.h"

int main(int argc, char **argv) {
  if (argc < 2) return 1;
  unsigned K = (unsigned)strtoul(argv[1], NULL, 10);
  unsigned nX = argc > 2 ? (unsigned)strtoul(argv[2], NULL, 10) : 32;

  params P = params_init((uint16_t)K);
  printf("P %u %u %u %u %u %u %u %u %u %u\n", P.Kprime, P.J, P.S, P.H, P.W,
         P.L, P.P, P.P1, P.U, P.B);

  for (unsigned X = 0; X < nX; X++) {
    tuple t = gen_tuple(X, &P);
    printf("T %u %u %u %u %u %u %u\n", X, t.d, t.a, t.b, t.d1, t.a1, t.b1);
    uint_vec idxs;
    kv_init(idxs);
    params_set_idxs(X, &P, &idxs);
    printf("I %u", X);
    for (size_t k = 0; k < kv_size(idxs); k++) printf(" %u", kv_A(idxs, k));
    printf("\n");
    kv_destroy(idxs);
  }

  /* a few raw PRNG probes */
  for (unsigned y = 0; y < 8; y++)
    printf("R %u %u %u\n", y * 2654435761u, y & 7,
           rnd_get(y * 2654435761u, (uint8_t)(y & 7), 1u << 20));
  return 0;
}
