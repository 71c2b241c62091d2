// Differential-test oracle for metamer/AA/syncmer k-mer extraction, built
// from the REFERENCE's own scanner code (compiled, not transliterated):
//   - GeneticCode           /root/reference/src/commons/GeneticCode.h
//   - MetamerScanner et al. /root/reference/src/commons/KmerScanner.h
//   - SyncmerScanner et al. /root/reference/src/commons/SyncmerScanner.h
// The per-frame driving loop mirrors KmerExtractor::fillQueryKmerBuffer
// (/root/reference/src/commons/KmerExtractor.cpp:342-373) and
// extractTargetKmers (:407-426).
//
// Protocol:
//   scan_oracle --kmer-format F --syncmer S --smer-len L --reduced R --mode M
//   stdin  (mode=query):  one DNA sequence per line -> 6-frame query scan
//                         with usedLen = getMaxCoveredLength(len)
//   stdin  (mode=block):  "<start>\t<end>\t<strand>\t<seq>" -> single block
//                         scan like target extraction
//   stdin  (mode=aa):     one protein sequence per line (kmer-format 4)
//   stdout: "<seqIdx> <frame> <pos> <value-hex>" per emitted k-mer
//           (frame=-1 for block/aa modes)
#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <iostream>
#include <string>

#include "KmerScanner.h"  // pulls Kmer.h -> NcbiTaxonomy.h (std includes) -> GeneticCode.h
#include "SyncmerScanner.h"
#include "LocalUtil.h"

static KmerScanner *makeScanner(int kmerFormat, int syncmer, int smerLen,
                                const GeneticCode &gc) {
    // selection mirrors KmerExtractor's ctor
    // (/root/reference/src/commons/KmerExtractor.cpp:8-30)
    switch (kmerFormat) {
        case 1: return new OldMetamerScanner(gc);
        case 2:
            if (syncmer) return new SyncmerScanner(smerLen, gc);
            return new MetamerScanner(gc);
        case 3: return new KmerScanner_dna2aa(gc, 12);
        case 4: return new KmerScanner_aa2aa(12);
        case 5: return new SyncmerScanner_dna2aa(gc, 12, smerLen);
        default:
            fprintf(stderr, "bad kmer-format %d\n", kmerFormat);
            exit(1);
    }
}

int main(int argc, char **argv) {
    int kmerFormat = 2, syncmer = 0, smerLen = 5, reduced = 0;
    std::string mode = "query";
    for (int i = 1; i + 1 < argc; i += 2) {
        if (!strcmp(argv[i], "--kmer-format")) kmerFormat = atoi(argv[i + 1]);
        else if (!strcmp(argv[i], "--syncmer")) syncmer = atoi(argv[i + 1]);
        else if (!strcmp(argv[i], "--smer-len")) smerLen = atoi(argv[i + 1]);
        else if (!strcmp(argv[i], "--reduced")) reduced = atoi(argv[i + 1]);
        else if (!strcmp(argv[i], "--mode")) mode = argv[i + 1];
    }
    GeneticCode gc(reduced != 0);
    KmerScanner *scanner = makeScanner(kmerFormat, syncmer, smerLen, gc);

    std::string line;
    long seqIdx = -1;
    while (std::getline(std::cin, line)) {
        ++seqIdx;
        if (mode == "block") {
            // start \t end \t strand \t seq
            size_t p1 = line.find('\t');
            size_t p2 = line.find('\t', p1 + 1);
            size_t p3 = line.find('\t', p2 + 1);
            int start = atoi(line.substr(0, p1).c_str());
            int end = atoi(line.substr(p1 + 1, p2 - p1 - 1).c_str());
            int strand = atoi(line.substr(p2 + 1, p3 - p2 - 1).c_str());
            std::string seq = line.substr(p3 + 1);
            scanner->initScanner(seq.c_str(), start, end, strand > -1);
            Kmer kmer;
            while ((kmer = scanner->next()).value != UINT64_MAX) {
                printf("%ld -1 %u %" PRIx64 "\n", seqIdx, kmer.pos, kmer.value);
            }
            continue;
        }
        if (mode == "aa") {
            if (line.size() < 12) continue;
            scanner->initScanner(line.c_str(), 0, line.size() - 1, true);
            Kmer kmer;
            while ((kmer = scanner->next()).value != UINT64_MAX) {
                printf("%ld -1 %u %" PRIx64 "\n", seqIdx, kmer.pos, kmer.value);
            }
            continue;
        }
        // query mode: 6 frames over usedLen, as fillQueryKmerBuffer does
        int seqLen = (int)line.size();
        int usedLen = LocalUtil::getMaxCoveredLength(seqLen);
        if (usedLen < 24) continue;
        for (int frame = 0; frame < 6; frame++) {
            bool isForward = frame < 3;
            int begin = isForward ? (frame % 3) : ((seqLen % 3) - (frame % 3));
            if (begin < 0) begin += 3;
            scanner->initScanner(line.c_str(), begin, begin + usedLen - 1, isForward);
            Kmer kmer;
            while ((kmer = scanner->next()).value != UINT64_MAX) {
                printf("%ld %d %u %" PRIx64 "\n", seqIdx, frame, kmer.pos, kmer.value);
            }
        }
    }
    delete scanner;
    return 0;
}
