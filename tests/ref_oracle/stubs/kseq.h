// Stub of kseq.h (vendored inside the absent MMseqs2 submodule).
// The wrapper interface lives in KSeqWrapper.h; nothing needed here.
#ifndef STUB_KSEQ_H
#define STUB_KSEQ_H

// SeqIterator.h:29 instantiates KSEQ_INIT but never uses the generated
// functions in the compiled oracle TUs; expand to nothing.
#define KSEQ_INIT(type_t, read)

#endif
