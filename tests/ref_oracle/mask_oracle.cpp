// Mask oracle: runs the reference's SeqIterator::maskLowComplexityRegions
// (`/root/reference/src/commons/SeqIterator.cpp:154-175`) — reference code
// over the stub tantan/ProbabilityMatrix (the real MMseqs2 tantan is an
// absent submodule; see stubs/tantan.h) — and prints the masked sequence.
//
// Usage: mask_oracle <maskProb>   (sequence on stdin, one line)
#include <cstdio>
#include <cstdlib>
#include <iostream>
#include <string>

#include "NucleotideMatrix.h"
#include "SeqIterator.h"

int main(int argc, char** argv) {
    float mask_prob = argc > 1 ? atof(argv[1]) : 0.9f;
    std::string seq;
    if (!std::getline(std::cin, seq)) return 2;
    NucleotideMatrix subMat("nucleotide.out", 1.0, 0.0);
    ProbabilityMatrix probMat(subMat);
    std::string masked(seq.size() + 1, '\0');
    SeqIterator::maskLowComplexityRegions(
        (const unsigned char*)seq.c_str(), (unsigned char*)&masked[0],
        probMat, mask_prob, &subMat);
    masked.resize(seq.size());
    printf("%s\n", masked.c_str());
    return 0;
}
