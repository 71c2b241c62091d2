// Definitions for stub-framework statics plus a directly-constructible
// LocalParameters. The real LocalParameters.cpp lives on the MMseqs2
// Parameters framework (absent submodule); oracle harnesses only need the
// plain data members, initialized to the reference defaults from
// /root/reference/src/workflow/classify.cpp:10-37 and build.cpp:10-30.
#include "LocalParameters.h"
#include "Debug.h"

Parameters *Parameters::instance = nullptr;
int Debug::debugLevel = Debug::ERROR;  // keep oracle stdout clean

// IndexCreator.cpp:12 references the binary's version string
const char *version = "oracle";

void Parameters::initParameterSingleton() { instance = new LocalParameters(); }

LocalParameters::LocalParameters() {
    // defaults from src/workflow/classify.cpp:10-37 (setClassifyDefaults)
    threads = 1;
    seqMode = 2;
    reducedAA = 0;
    minScore = 0.15f;
    minSpScore = 0.0f;
    hammingMargin = 0;
    verbosity = 3;
    ramUsage = 8;
    printLog = 0;
    maxGap = 0;
    taxonomyPath = "";
    minSSMatch = 4;
    minConsCnt = 4;
    minConsCntEuk = 9;
    matchPerKmer = 4;
    maskProb = 0.9f;
    maskMode = 0;
    tieRatio = 0.95f;
    printLineage = 0;
    maxShift = 0;
    em = false;
    accessionLevel = 0;
    // DB/build defaults from src/workflow/build.cpp:10-30
    syncmer = 0;
    smerLen = 5;
    kmerFormat = 2;
    skipRedundancy = 0;
    splitNum = 4096;
    bufferSize = 1000000;
    gtdb = 0;
    validateInput = 0;
    validateDb = 0;
    makeLibrary = 0;
    cdsInfo = "";
    dbName = "";
    dbDate = "";
    // misc
    randomSeed = 42;
    skipSecondary = 0;
    higherRankFile = 0;
    removeUnclassified = false;
    report = true;
    targetTaxId = 0;
    extractMode = 0;
    printMode = 1;
    weightMode = 0;
    minEdgeWeight = 0;
    minVoteScr = 0.0f;
    neighborKmers = 0;
    readIdCol = 0;
    taxidCol = 1;
    scoreCol = 2;
    infoBegin = 0;
    infoEnd = 0;
    kmerBegin = 0;
    kmerEnd = 0;
    assembly = false;
    thresholdK = 0.0f;
    virusTaxId = 10239;
    bacteriaTaxId = 2;
    archaeaTaxId = 2157;
}

// no-op definition for util/ command drivers compiled into oracles (their
// command-line entry is never invoked; oracles set fields directly)
void LocalParameters::parseParameters(int, const char **, const Command &,
                                      bool, int, int) {}
