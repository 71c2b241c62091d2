// Stub: StringBlock lives in NcbiTaxonomy.h here (single reconstruction of
// the mmseqs string pool used by both the taxonomy and UnirefTree).
#ifndef STUB_STRINGBLOCK_H
#define STUB_STRINGBLOCK_H
#include "NcbiTaxonomy.h"
#endif
