// Stub of kseq.h (vendored inside the absent MMseqs2 submodule).
// The wrapper interface lives in KSeqWrapper.h; nothing needed here.
#ifndef STUB_KSEQ_H
#define STUB_KSEQ_H
#endif
