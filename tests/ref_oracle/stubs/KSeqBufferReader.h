// Stub of the MMseqs2 KSeqBufferReader header (submodule absent).
// Only included transitively; no symbols needed by the oracle TUs.
#ifndef STUB_KSEQBUFFERREADER_H
#define STUB_KSEQBUFFERREADER_H
#endif
