// DB-update oracle: runs the REFERENCE's updateDB flow
// (/root/reference/src/workflow/updateDB.cpp:36-157: IndexCreator in
// updating mode over the new sequences, taxID_list union, k-way merge of
// the new flushes with the old diffIdx/info) producing a complete updated
// DB directory.
//
// Usage:
//   update_oracle newDbDir fnaList acc2taxid oldDbDir [key=value ...]
// Keys: threads, syncmer, smer-len, mask-mode, mask-prob, accession-level,
// split-num, buffer-size, ram-usage, taxonomy-path, db-name, db-date,
// cds-info, new-taxa.
#include <cstdlib>
#include <cstring>
#include <iostream>
#include <string>
#include <unordered_set>
#include <vector>

#include "FileUtil.h"
#include "IndexCreator.h"
#include "LocalParameters.h"
#include "common.h"

int main(int argc, char **argv) {
    if (argc < 5) {
        std::cerr << "usage: update_oracle newDbDir fnaList acc2taxid "
                     "oldDbDir [k=v ...]\n";
        return 2;
    }
    Parameters::initParameterSingleton();
    LocalParameters &par = LocalParameters::getLocalInstance();
    // setDefaults_updateDB (updateDB.cpp:11-34) minus the randomized
    // dbName/dbDate (pinned for reproducible db.parameters)
    par.makeLibrary = 0;
    par.gtdb = 0;
    par.validateInput = 0;
    par.validateDb = 0;
    par.kmerFormat = 1;
    par.skipRedundancy = 0;
    par.reducedAA = 0;
    par.ramUsage = 2;
    par.taxonomyPath = "";
    par.splitNum = 4096;
    par.maskProb = 0.9f;
    par.maskMode = 1;
    par.accessionLevel = 0;
    par.dbDate = "oracle";
    par.dbName = "oracle";
    par.threads = 1;
    par.bufferSize = 16 * 1024 * 1024;
    par.newTaxa = "";

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
        else if (k == "mask-mode") par.maskMode = atoi(v.c_str());
        else if (k == "mask-prob") par.maskProb = atof(v.c_str());
        else if (k == "accession-level") par.accessionLevel = atoi(v.c_str());
        else if (k == "split-num") par.splitNum = atoi(v.c_str());
        else if (k == "buffer-size") par.bufferSize = atoll(v.c_str());
        else if (k == "ram-usage") par.ramUsage = atoi(v.c_str());
        else if (k == "taxonomy-path") par.taxonomyPath = v;
        else if (k == "db-name") par.dbName = v;
        else if (k == "db-date") par.dbDate = v;
        else if (k == "cds-info") par.cdsInfo = v;
        else if (k == "new-taxa") par.newTaxa = v;
        else {
            std::cerr << "unknown key " << k << "\n";
            return 2;
        }
    }
    if (positional.size() != 4) {
        std::cerr << "expected 4 positional args\n";
        return 2;
    }
    par.filenames = positional;
    std::string newDbDir = par.filenames[0];
    std::string oldDbDir = par.filenames[3];
    if (!FileUtil::directoryExists(newDbDir.c_str())) {
        FileUtil::makeDir(newDbDir.c_str());
    }

    TaxonomyWrapper *taxonomy = loadTaxonomy(oldDbDir);
    FileUtil::copyFile(oldDbDir + "/acc2taxid.map",
                       newDbDir + "/acc2taxid.map");

    if (!par.newTaxa.empty()) {
        taxonomy->checkNewTaxa(par.newTaxa);
        std::vector<NewTaxon> newTaxaList;
        TaxonomyWrapper::getListOfTaxa(par.newTaxa, newTaxaList);
        TaxonomyWrapper *newTaxonomy = taxonomy->addNewTaxa(newTaxaList);
        delete taxonomy;
        taxonomy = newTaxonomy;
    }

    loadDbParameters(par, oldDbDir);
    IndexCreator idxCre(par, taxonomy, par.kmerFormat);
    idxCre.setIsUpdating(true);
    idxCre.createIndex();
    if (par.accessionLevel == 1) {
        taxonomy = idxCre.getTaxonomy();
    }

    if (taxonomy->IsExternalData()) {
        FileUtil::copyFile(oldDbDir + "/taxonomyDB", newDbDir + "/taxonomyDB");
    } else {
        taxonomy->writeTaxonomyDB(newDbDir + "/taxonomyDB");
    }

    std::unordered_set<TaxID> taxIdSet = idxCre.getTaxIdSet();
    FILE *oldTaxIdListFile =
        fopen((oldDbDir + "/taxID_list").c_str(), "r");
    if (oldTaxIdListFile == NULL) {
        std::cerr << "cannot open old taxID_list\n";
        return 1;
    }
    char taxID[100];
    while (fscanf(oldTaxIdListFile, "%31s", taxID) == 1) {
        taxIdSet.insert(static_cast<TaxID>(std::stoul(taxID)));
    }
    fclose(oldTaxIdListFile);
    FILE *taxidListFile = fopen((newDbDir + "/taxID_list").c_str(), "w");
    for (auto &taxid : taxIdSet) {
        fprintf(taxidListFile, "%d\n", taxid);
    }
    fclose(taxidListFile);

    idxCre.updateTaxId2SpeciesTaxId(newDbDir + "/taxID_list");
    idxCre.addFilesToMerge(oldDbDir + "/diffIdx", oldDbDir + "/info");
    idxCre.setMergedFileNames(newDbDir + "/diffIdx", newDbDir + "/info",
                              newDbDir + "/split");
    idxCre.mergeTargetFiles<FilterMode::DB_CREATION>();
    delete taxonomy;
    return 0;
}
