// createnewtaxalist oracle: runs the REFERENCE's createnewtaxalist
// (/root/reference/src/util/createnewtaxalist.cpp) end to end:
// observed accessions from the FASTA list, taxonomy lookup through the
// acc2taxid map (merged-node aware), lineage-walk grafting against the
// old DB taxonomy with name dedup and used-taxid collision reallocation,
// writing newtaxa.tsv / newtaxa.accession2taxid / unmapped_accessions.txt.
//
// Usage: newtaxa_oracle oldDbDir fastaList newTaxonomyDir acc2taxid outDir
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#include "FileUtil.h"
#include "LocalParameters.h"
#include "TaxonomyWrapper.h"
#include "common.h"
#include "createnewtaxalist.h"

// the reference's helpers live in createnewtaxalist.cpp (compiled in)
void getObservedAccessions(const std::string &fnaListFileName,
                           std::unordered_map<std::string, TaxID> &observed);
int getTaxonomyOfAccessions(std::unordered_map<std::string, TaxID> &observed,
                            TaxonomyWrapper *&taxonomy,
                            const std::string &acc2taxidFileName,
                            size_t threadNum);
int createnewtaxalist(TaxonomyWrapper *oldTaxonomy,
                      TaxonomyWrapper *newTaxonomy,
                      std::vector<NewTaxon> &newTaxaList,
                      std::map<std::string, TaxID> &newAccessions,
                      std::vector<std::string> &unmappedAccessions);

int main(int argc, char **argv) {
    if (argc != 6) {
        std::cerr << "usage: newtaxa_oracle oldDbDir fastaList "
                     "newTaxonomyDir acc2taxid outDir\n";
        return 2;
    }
    Parameters::initParameterSingleton();
    LocalParameters &par = LocalParameters::getLocalInstance();
    par.threads = 1;
    std::string oldDbDir = argv[1], fastaList = argv[2],
                newTaxonomyDir = argv[3], acc2taxidFileName = argv[4],
                outdir = argv[5];
    if (!FileUtil::directoryExists(outdir.c_str())) {
        FileUtil::makeDir(outdir.c_str());
    }
    TaxonomyWrapper *oldTaxonomy = loadTaxonomy(oldDbDir);
    TaxonomyWrapper *newTaxonomy = new TaxonomyWrapper(
        newTaxonomyDir + "/names.dmp", newTaxonomyDir + "/nodes.dmp",
        newTaxonomyDir + "/merged.dmp", false);

    std::unordered_map<std::string, TaxID> newAccessions;
    getObservedAccessions(fastaList, newAccessions);
    getTaxonomyOfAccessions(newAccessions, newTaxonomy, acc2taxidFileName,
                            par.threads);
    std::map<std::string, TaxID> newAcc2taxid(newAccessions.begin(),
                                              newAccessions.end());
    std::vector<NewTaxon> newTaxaList;
    std::vector<std::string> unmappedAccessions;
    createnewtaxalist(oldTaxonomy, newTaxonomy, newTaxaList, newAcc2taxid,
                      unmappedAccessions);

    SORT_PARALLEL(newTaxaList.begin(), newTaxaList.end(),
                  [](const NewTaxon &a, const NewTaxon &b) {
                      return a.taxId < b.taxId;
                  });
    std::ofstream newTaxaFile(outdir + "/newtaxa.tsv");
    for (const auto &it : newTaxaList) {
        newTaxaFile << it.taxId << "\t" << it.parentTaxId << "\t" << it.rank
                    << "\t" << it.name << "\n";
    }
    newTaxaFile.close();
    std::ofstream newAccessionsFile(outdir + "/newtaxa.accession2taxid");
    newAccessionsFile << "accession\taccession.version\ttaxid\tgi\n";
    for (const auto &it : newAcc2taxid) {
        if (it.second == 0) continue;
        newAccessionsFile << it.first << "\t" << it.first << "\t" << it.second
                          << "\t" << "0\n";
    }
    newAccessionsFile.close();
    SORT_PARALLEL(unmappedAccessions.begin(), unmappedAccessions.end());
    std::ofstream unmappedFile(outdir + "/unmapped_accessions.txt");
    for (const auto &it : unmappedAccessions) {
        unmappedFile << it << "\n";
    }
    unmappedFile.close();
    delete oldTaxonomy;
    delete newTaxonomy;
    return 0;
}
