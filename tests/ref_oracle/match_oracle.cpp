// Match-phase oracle: runs the reference's query pipeline up to the sorted
// Match list (QueryIndexer -> KmerExtractor::extractQueryKmers ->
// KmerMatcher::matchKmers -> sortMatches), mirroring
// Classifier::startClassify stages (/root/reference/src/commons/
// Classifier.cpp:44-118), then prints every Match record.
//
// Usage: match_oracle q.fna[ q2.fna] dbDir [key=value ...]   (keys like
// classify_oracle). Output lines:
//   qid pos frame targetId speciesId dnaEncoding rightEndHamming hamming
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "Classifier.h"
#include "LocalParameters.h"
#include "common.h"

int main(int argc, char **argv) {
    Parameters::initParameterSingleton();
    LocalParameters &par = LocalParameters::getLocalInstance();
    par.syncmer = 0;
    par.smerLen = 5;
    par.kmerFormat = 2;
    par.skipRedundancy = 0;
    par.reducedAA = 0;
    par.seqMode = 1;
    par.hammingMargin = 0;
    par.ramUsage = 2;
    par.matchPerKmer = 4;
    par.maskMode = 0;
    par.maskProb = 0.9f;
    par.threads = 1;

    std::vector<std::string> positional;
    for (int i = 1; i < argc; ++i) {
        std::string arg = argv[i];
        size_t eq = arg.find('=');
        if (eq == std::string::npos) {
            positional.push_back(arg);
            continue;
        }
        std::string k = arg.substr(0, eq), v = arg.substr(eq + 1);
        if (k == "seq-mode") par.seqMode = atoi(v.c_str());
        else if (k == "threads") par.threads = atoi(v.c_str());
        else if (k == "syncmer") par.syncmer = atoi(v.c_str());
        else if (k == "smer-len") par.smerLen = atoi(v.c_str());
        else if (k == "kmer-format") par.kmerFormat = atoi(v.c_str());
        else if (k == "reduced-aa") par.reducedAA = atoi(v.c_str());
        else if (k == "match-per-kmer") par.matchPerKmer = atoi(v.c_str());
        else if (k == "skip-redundancy") par.skipRedundancy = atoi(v.c_str());
        else { fprintf(stderr, "unknown key %s\n", k.c_str()); return 2; }
    }
    // filenames layout as the classify workflow builds it; out/job unused
    positional.push_back("out");
    positional.push_back("job");
    par.filenames = positional;

    const std::string dbDir = par.filenames[1 + (par.seqMode == 2)];
    loadDbParameters(par, dbDir);
    TaxonomyWrapper *taxonomy = loadTaxonomy(dbDir, par.taxonomyPath);
    GeneticCode geneticCode(par.reducedAA == 1);
    QueryIndexer queryIndexer(par);
    KmerExtractor kmerExtractor(par, geneticCode, par.kmerFormat);
    KmerMatcher kmerMatcher(par, taxonomy, par.kmerFormat);

    Buffer<Kmer> queryKmerBuffer;
    Buffer<Match> matchBuffer;
    std::vector<Query> queryList;
    queryIndexer.setBytesPerKmer(par.matchPerKmer);
    queryIndexer.indexQueryFile(0);
    const std::vector<QuerySplit> &splits = queryIndexer.getQuerySplits();

    KSeqWrapper *kseq1 = KSeqFactory(par.filenames[0].c_str());
    KSeqWrapper *kseq2 = nullptr;
    if (par.seqMode == 2) kseq2 = KSeqFactory(par.filenames[1].c_str());

    for (size_t s = 0; s < splits.size(); ++s) {
        queryList.clear();
        queryList.resize(splits[s].end - splits[s].start);
        queryKmerBuffer.reallocateMemory(splits[s].kmerCnt);
        queryKmerBuffer.init();
        matchBuffer.reallocateMemory(splits[s].kmerCnt * par.matchPerKmer * 8);
        matchBuffer.startIndexOfReserve = 0;
        kmerExtractor.extractQueryKmers(queryKmerBuffer, queryList, splits[s],
                                        par, kseq1, kseq2);
        bool ok = kmerMatcher.matchKmers(&queryKmerBuffer, &matchBuffer);
        if (!ok) { fprintf(stderr, "match buffer overflow\n"); return 3; }
        kmerMatcher.sortMatches(&matchBuffer);
        for (size_t i = 0; i < matchBuffer.startIndexOfReserve; ++i) {
            const Match &m = matchBuffer.buffer[i];
            printf("%u %u %u %d %d %u %u %u\n",
                   (uint32_t)m.qInfo.sequenceID, (uint32_t)m.qInfo.pos,
                   (uint32_t)m.qInfo.frame, m.targetId, m.speciesId,
                   m.dnaEncoding, (uint32_t)m.rightEndHamming,
                   (uint32_t)m.hamming);
        }
    }
    delete kseq1;
    delete kseq2;
    return 0;
}
