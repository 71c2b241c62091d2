// Stub of the MMseqs2 Parameters framework header (the mmseqs submodule is
// absent from /root/reference). Provides just enough for the reference's
// LocalParameters.h (/root/reference/src/commons/LocalParameters.h) to parse
// and for oracle harnesses to construct parameter objects directly.
//
// This is test-harness scaffolding, not framework code.
#ifndef STUB_PARAMETERS_H
#define STUB_PARAMETERS_H

#include <cstddef>
#include <cstdint>
#include <string>
#include <vector>

static const int CITATION_END = 0;

struct Command;  // referenced by LocalParameters::parseParameters signature

struct MMseqsParameter {
    std::string name;
    std::string display;
    std::string description;
    MMseqsParameter() = default;
};

// The real macro declares a static MMseqsParameter member; harnesses never
// touch these, so a plain (empty-initialized) member is enough to parse.
#define PARAMETER(x) MMseqsParameter PARAM_##x;

// Minimal stand-in for MultiParam<NuclAA<std::string>> used by
// par.scoringMatrixFile.values.nucleotide().
struct StubNuclAAString {
    std::string nucl;
    std::string nucleotide() const { return nucl; }
};
struct StubMultiParamString {
    StubNuclAAString values;
};

class Parameters {
public:
    // Base-class fields the reference commons/ code reads.
    std::vector<std::string> filenames;
    int threads = 1;
    int verbosity = 3;
    int maskMode = 0;
    float maskProb = 0.9f;
    // MMseqs2 base-Parameters field consumed by GroupGenerator::getRepLabel
    // (set by workflow/groupGeneration.cpp:19; default mirrors it)
    float majorityThr = 0.5f;
    StubMultiParamString scoringMatrixFile;

    static Parameters &getInstance() { return *instance; }
    static void initParameterSingleton();

    // enough surface for util/ command drivers compiled into oracles
    // (their main() is never called; parseParameters is a no-op defined
    // in support.cpp for the LocalParameters override)
    static const int PARSE_ALLOW_EMPTY = 1;

protected:
    Parameters() = default;
    static Parameters *instance;
};

#endif
