// Stub of the MMseqs2 FastSort header (submodule absent; the real one maps
// SORT_PARALLEL to ips4o). Plain std::sort keeps identical ordering
// semantics for oracle purposes. Test scaffolding.
#ifndef STUB_FASTSORT_H
#define STUB_FASTSORT_H

#include <algorithm>

#define SORT_PARALLEL std::sort
#define SORT_SERIAL std::sort

#endif
