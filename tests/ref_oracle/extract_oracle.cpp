// Read-extraction oracle: runs the REFERENCE's extract flow
// (/root/reference/src/workflow/extract.cpp:45-131 driving
// Reporter::getReadsClassifiedToClade + Reporter::printSpecifiedReads,
// /root/reference/src/commons/Reporter.cpp:236-365) on a query file +
// classifications TSV + DB directory, writing <base>_<taxid>.fna/.fq next
// to the query (or in out-dir).
//
// Usage:
//   extract_oracle q.fna[ q2.fna] classifications dbDir [key=value ...]
// Keys: seq-mode, tax-id, extract-mode, out-dir, taxonomy-path.
#include <cstdlib>
#include <cstring>
#include <iostream>
#include <string>
#include <vector>

#include "LocalParameters.h"
#include "Reporter.h"
#include "common.h"

static void baseAndDir(const std::string &q, std::string &dirPath,
                       std::string &baseName) {
    // extractBaseNameAndExtension (extract.cpp:14-43), gz-aware
    size_t lastDot = q.find_last_of('.');
    if (lastDot == std::string::npos) {
        baseName = q;
    } else if (q.substr(lastDot) == ".gz") {
        size_t second = q.substr(0, lastDot).find_last_of('.');
        baseName = q.substr(0, second == std::string::npos ? lastDot : second);
    } else {
        baseName = q.substr(0, lastDot);
    }
    size_t lastSlash = baseName.find_last_of('/');
    if (lastSlash != std::string::npos) {
        dirPath = baseName.substr(0, lastSlash);
        baseName = baseName.substr(lastSlash + 1);
    } else {
        dirPath = "";
    }
}

int main(int argc, char **argv) {
    if (argc < 4) {
        std::cerr << "usage: extract_oracle q.fna [q2.fna] classifications "
                     "dbDir [key=value ...]\n";
        return 2;
    }
    Parameters::initParameterSingleton();
    LocalParameters &par = LocalParameters::getLocalInstance();
    // setExtractDefaults (extract.cpp:6-12)
    par.taxonomyPath = "";
    par.outputDir = "";
    par.seqMode = 2;
    par.targetTaxId = 0;
    par.extractMode = 0;
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
        else if (k == "tax-id") par.targetTaxId = atoi(v.c_str());
        else if (k == "extract-mode") par.extractMode = atoi(v.c_str());
        else if (k == "out-dir") par.outputDir = v;
        else if (k == "taxonomy-path") par.taxonomyPath = v;
        else {
            std::cerr << "unknown key " << k << "\n";
            return 2;
        }
    }
    size_t expect = par.seqMode == 2 ? 4 : 3;
    if (positional.size() != expect) {
        std::cerr << "expected " << expect << " positional args\n";
        return 2;
    }
    par.filenames = positional;

    std::string classificationFileName = par.filenames[1 + (par.seqMode == 2)];
    std::string dbDir = par.filenames[2 + (par.seqMode == 2)];
    TaxID externalTaxID = par.targetTaxId;

    TaxonomyWrapper *taxonomy = loadTaxonomy(dbDir, par.taxonomyPath);
    Reporter reporter(par, taxonomy);

    TaxID targetTaxID;
    if (externalTaxID == -1) {
        targetTaxID = -1;
    } else {
        targetTaxID = taxonomy->getInternalTaxID(externalTaxID);
        if (targetTaxID == -1) {
            std::cerr << "taxon " << externalTaxID << " not in taxonomy\n";
            return 1;
        }
    }

    std::vector<size_t> readIdxs;
    reporter.getReadsClassifiedToClade(targetTaxID, classificationFileName,
                                       readIdxs);

    for (int fi = 0; fi < 1 + (par.seqMode == 2); ++fi) {
        std::string queryFileName = par.filenames[fi];
        std::string outdirPath, baseName;
        baseAndDir(queryFileName, outdirPath, baseName);
        if (!par.outputDir.empty()) {
            outdirPath = par.outputDir + "/";
        } else {
            outdirPath = outdirPath + "/";
        }
        std::string outFileName =
            outdirPath + baseName + "_" + std::to_string(externalTaxID);
        reporter.printSpecifiedReads(readIdxs, queryFileName, outFileName);
    }
    delete taxonomy;
    return 0;
}
