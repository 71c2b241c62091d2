// Force-included (-include) into every oracle TU: macros/functions the
// reference sources pick up transitively from the absent MMseqs2 framework.
#ifndef STUB_ORACLE_PRELUDE_H
#define STUB_ORACLE_PRELUDE_H

#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#define OPENMP 1
#else
static inline int omp_get_thread_num() { return 0; }
static inline int omp_get_num_threads() { return 1; }
static inline void omp_set_num_threads(int) {}
#endif

#ifndef SORT_PARALLEL
#define SORT_PARALLEL std::sort
#endif
#ifndef SORT_SERIAL
#define SORT_SERIAL std::sort
#endif

#endif
