// Stub of the MMseqs2 KSeqBufferReader header (submodule absent).
// Only included transitively; no symbols needed by the oracle TUs.
#ifndef STUB_KSEQBUFFERREADER_H
#define STUB_KSEQBUFFERREADER_H

#include <cstddef>

struct kseq_buffer_t {
    char *buffer = nullptr;
    size_t length = 0;
    size_t position = 0;
};

inline int kseq_buffer_reader(kseq_buffer_t *, char *, int) { return 0; }

#endif
