// Read-group common-k-mer filter oracle: drives the REFERENCE's
// GroupGenerator::filterCommonKmers2 (matching query k-mers against a
// common-k-mer DB via KmerDbReader, then the +-neighborKmers positional
// suppression walk, /root/reference/src/read-group/GroupGenerator.cpp:349-534)
// on a caller-supplied query k-mer set.
//
// Usage:
//   group_oracle queryDummy.fna commonKmerDB taxDir outDir nk < kmers.txt
// stdin lines: "<id> <pos> <value-hex>" (any order; the harness sorts with
// Kmer::compareQueryKmer exactly like KmerExtractor::extractQueryKmers
// does before the filter runs). ids must be >= 1 (id 0 marks the
// reference's blank slots).
// stdout: "K <id> <pos> <value-hex>" per surviving k-mer in post-filter
// buffer order, then "M <id> <pos>" per recorded common-k-mer match in
// sorted match-buffer order.
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <iostream>
#include <string>
#include <vector>

#include "GroupGenerator.h"
#include "LocalParameters.h"

int main(int argc, char **argv) {
    if (argc < 6) {
        std::cerr << "usage: group_oracle queryDummy commonKmerDB taxDir"
                     " outDir nk < kmers\n";
        return 2;
    }
    Parameters::initParameterSingleton();
    LocalParameters &par = LocalParameters::getLocalInstance();
    par.seqMode = 1;
    par.threads = 1;
    par.kmerFormat = 2;
    par.reducedAA = 0;
    par.matchPerKmer = 4;
    par.ramUsage = 2;
    par.syncmer = 0;
    par.smerLen = 5;
    par.minEdgeWeight = 2;
    par.neighborKmers = atoi(argv[5]);
    par.printLog = 0;
    // filenames layout for seqMode != 2 (GroupGenerator ctor):
    // [0]=query, [1]=commonKmerDB, [2]=taxDbDir, [3]=orgRes, [4]=outDir
    par.filenames = {argv[1], argv[2], argv[3], std::string(argv[4]),
                     std::string(argv[4])};

    GroupGenerator gg(par);

    std::vector<Kmer> kmers;
    uint32_t id, pos;
    char hex[32];
    while (scanf("%u %u %31s", &id, &pos, hex) == 3) {
        uint64_t value = strtoull(hex, nullptr, 16);
        kmers.emplace_back(value, id, pos, (uint8_t)0);
    }
    Buffer<Kmer> qBuf(kmers.size() + 16);
    qBuf.init();
    size_t at = qBuf.reserveMemory(kmers.size());
    std::copy(kmers.begin(), kmers.end(), qBuf.buffer + at);
    std::sort(qBuf.buffer, qBuf.buffer + qBuf.startIndexOfReserve,
              Kmer::compareQueryKmer);

    Buffer<std::pair<uint32_t, uint32_t>> matchBuf(kmers.size() + 1024);
    matchBuf.init();
    gg.filterCommonKmers2(qBuf, matchBuf, argv[2]);

    for (size_t i = 0; i < qBuf.startIndexOfReserve; ++i) {
        printf("K %u %u %llx\n", qBuf.buffer[i].qInfo.sequenceID,
               qBuf.buffer[i].qInfo.pos,
               (unsigned long long)qBuf.buffer[i].value);
    }
    for (size_t i = 0; i < matchBuf.startIndexOfReserve; ++i) {
        printf("M %u %u\n", matchBuf.buffer[i].first,
               matchBuf.buffer[i].second);
    }
    return 0;
}
