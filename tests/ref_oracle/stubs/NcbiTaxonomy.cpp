// Stub for the `#include "NcbiTaxonomy.cpp"` in the reference's
// IndexCreator.cpp:9 (the mmseqs submodule source is absent). All stub
// NcbiTaxonomy implementation is inline in NcbiTaxonomy.h.
