// QueryFilter oracle: runs the REFERENCE's filter flow
// (/root/reference/src/workflow/filter.cpp:25-45 driving
// QueryFilter::filterReads, /root/reference/src/commons/QueryFilter.cpp).
// Exists to DOCUMENT (with compiled reference code) that the upstream
// filter never searches any contamination DB: its per-DB loop is
// `for (auto db : contams) { cout << ""; }` (QueryFilter.cpp:168-170), so
// no read ever gets a match and nothing is filtered. The repo's filter
// implements the documented intent instead; the differential test locks
// the upstream behavior as a canary.
//
// Usage:
//   filter_oracle q.fna[ q2.fna] dbDir [key=value ...]
// Keys: seq-mode, contam-list, min-score, taxonomy-path, print-mode.
// Outputs land next to the query file (<base>_filtered.fna etc).
#include <cstdlib>
#include <cstring>
#include <iostream>
#include <string>
#include <vector>

#include "LocalParameters.h"
#include "QueryFilter.h"

int main(int argc, char **argv) {
    if (argc < 3) {
        std::cerr << "usage: filter_oracle q.fna [q2.fna] dbDir [k=v ...]\n";
        return 2;
    }
    Parameters::initParameterSingleton();
    LocalParameters &par = LocalParameters::getLocalInstance();
    // setFilterDefaults (filter.cpp:4-23)
    par.reducedAA = 0;
    par.seqMode = 2;
    par.minScore = 0.5;
    par.minSpScore = 0;
    par.hammingMargin = 0;
    par.ramUsage = 2;
    par.printLog = 0;
    par.maxGap = 0;
    par.taxonomyPath = "";
    par.minConsCnt = 4;
    par.minConsCntEuk = 9;
    par.maskMode = 0;
    par.maskProb = 0.9f;
    par.matchPerKmer = 4;
    par.printMode = 1;
    par.contamList = "";
    par.accessionLevel = 0;
    par.threads = 1;
    par.kmerFormat = 2;
    par.syncmer = 0;
    par.smerLen = 5;
    par.em = false;
    par.skipRedundancy = 0;
    par.tieRatio = 0.95f;

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
        else if (k == "contam-list") par.contamList = v;
        else if (k == "min-score") par.minScore = atof(v.c_str());
        else if (k == "taxonomy-path") par.taxonomyPath = v;
        else if (k == "print-mode") par.printMode = atoi(v.c_str());
        else {
            std::cerr << "unknown key " << k << "\n";
            return 2;
        }
    }
    size_t expect = par.seqMode == 2 ? 3 : 2;
    if (positional.size() != expect) {
        std::cerr << "expected " << expect << " positional args\n";
        return 2;
    }
    par.filenames = positional;
    if (par.contamList.empty()) {
        std::cerr << "contam-list required\n";
        return 1;
    }
    QueryFilter *queryFilter = new QueryFilter(par);
    queryFilter->filterReads(par);
    delete queryFilter;
    return 0;
}
