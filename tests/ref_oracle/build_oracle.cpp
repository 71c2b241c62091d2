// Full DB-build oracle: runs the REFERENCE's IndexCreator
// (/root/reference/src/commons/IndexCreator.cpp:316-376 createIndex, with
// Prodigal gene prediction, strandedness check, dedup/LCA filtering, delta
// writer, k-way merge) on a FASTA list + acc2taxid + taxonomy dumps,
// producing a complete reference-format DB directory (diffIdx/info/split/
// taxID_list/db.parameters/taxonomyDB).
//
// Mirrors src/workflow/build.cpp:32-132 minus input validation and the
// GTDB rename path.
//
// Usage:
//   build_oracle dbDir fnaList acc2taxid [key=value ...]
// Keys: threads, syncmer, smer-len, reduced-aa, mask-mode, mask-prob,
// accession-level, split-num, buffer-size, ram-usage, taxonomy-path,
// db-name, db-date, cds-info, skip-redundancy.
#include <cstdlib>
#include <cstring>
#include <iostream>
#include <string>
#include <vector>

#include "IndexCreator.h"
#include "LocalParameters.h"

int main(int argc, char **argv) {
    if (argc < 4) {
        std::cerr << "usage: build_oracle dbDir fnaList acc2taxid [k=v ...]\n";
        return 2;
    }
    Parameters::initParameterSingleton();
    LocalParameters &par = LocalParameters::getLocalInstance();
    // setDefaults_build (src/workflow/build.cpp:10-30)
    par.syncmer = 0;
    par.smerLen = 5;
    par.gtdb = 0;
    par.makeLibrary = 0;
    par.reducedAA = 0;
    par.ramUsage = 4;
    par.validateInput = 0;
    par.validateDb = 0;
    par.taxonomyPath = "";
    par.splitNum = 4096;
    par.maskProb = 0.9f;
    par.maskMode = 1;
    par.accessionLevel = 0;
    par.dbDate = "oracle";
    par.dbName = "oracle";
    par.threads = 1;
    par.kmerFormat = 2;
    par.bufferSize = 16 * 1024 * 1024;

    std::vector<std::string> positional;
    for (int i = 1; i < argc; ++i) {
        std::string arg = argv[i];
        size_t eq = arg.find('=');
        if (eq == std::string::npos) {
            positional.push_back(arg);
            continue;
        }
        std::string k = arg.substr(0, eq), v = arg.substr(eq + 1);
        if (k == "threads") par.threads = atoi(v.c_str());
        else if (k == "syncmer") par.syncmer = atoi(v.c_str());
        else if (k == "smer-len") par.smerLen = atoi(v.c_str());
        else if (k == "reduced-aa") par.reducedAA = atoi(v.c_str());
        else if (k == "mask-mode") par.maskMode = atoi(v.c_str());
        else if (k == "mask-prob") par.maskProb = atof(v.c_str());
        else if (k == "accession-level") par.accessionLevel = atoi(v.c_str());
        else if (k == "split-num") par.splitNum = atoi(v.c_str());
        else if (k == "buffer-size") par.bufferSize = (size_t)atoll(v.c_str());
        else if (k == "ram-usage") par.ramUsage = atoi(v.c_str());
        else if (k == "taxonomy-path") par.taxonomyPath = v;
        else if (k == "db-name") par.dbName = v;
        else if (k == "db-date") par.dbDate = v;
        else if (k == "cds-info") par.cdsInfo = v;
        else if (k == "skip-redundancy") par.skipRedundancy = atoi(v.c_str());
        else if (k == "kmer-format") par.kmerFormat = atoi(v.c_str());
        else {
            std::cerr << "unknown key " << k << "\n";
            return 2;
        }
    }
    if (positional.size() != 3) {
        std::cerr << "expected 3 positional args\n";
        return 2;
    }
    par.filenames = positional;
    const std::string &dbDir = par.filenames[0];
    if (!FileUtil::directoryExists(dbDir.c_str())) {
        FileUtil::makeDir(dbDir.c_str());
    }
    std::string taxonomyDir = par.taxonomyPath.empty()
                                  ? dbDir + "/taxonomy/"
                                  : par.taxonomyPath + "/";

    TaxonomyWrapper *taxonomy = new TaxonomyWrapper(
        taxonomyDir + "/names.dmp", taxonomyDir + "/nodes.dmp",
        taxonomyDir + "/merged.dmp", true);

    IndexCreator idxCre(par, taxonomy, par.kmerFormat);
    idxCre.createIndex();
    if (par.accessionLevel == 1) {
        taxonomy = idxCre.getTaxonomy();
    }
    taxonomy->writeTaxonomyDB(dbDir + "/taxonomyDB");

    if (idxCre.getNumOfFlush() == 1) {
        std::cout << "Index creation completed." << std::endl;
        return 0;
    }
    idxCre.updateTaxId2SpeciesTaxId(dbDir + "/taxID_list");
    idxCre.setMergedFileNames(dbDir + "/diffIdx", dbDir + "/info",
                              dbDir + "/split");
    idxCre.mergeTargetFiles<FilterMode::DB_CREATION>();
    std::cout << "Index creation completed." << std::endl;
    return 0;
}
