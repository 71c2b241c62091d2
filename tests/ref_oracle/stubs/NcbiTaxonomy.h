// Stub reconstruction of the MMseqs2 NcbiTaxonomy base class (the mmseqs
// submodule is absent from /root/reference — see
// /root/reference/.gitmodules:6-8). TaxonomyWrapper
// (/root/reference/src/commons/TaxonomyWrapper.{h,cpp}) subclasses this and
// pins most of the contract: member names/types via direct access
// (taxonNodes, maxNodes, maxTaxID, D, E, L, H, M, block, mmapData, mmapSize,
// externalData), the Euler-tour helpers (elh, computeSparseTable, nodeId),
// and the serialize field order (TaxonomyWrapper.cpp:289-361).
//
// LCA here is the standard Euler-tour + sparse-table RMQ — a mathematically
// unique function of the tree, so oracle comparisons of LCA-dependent
// semantics (Taxonomer, filterKmers) do not depend on reconstruction guesses.
// Byte-level file-format details that ARE guesses (TaxonNode padding,
// StringBlock header) are documented at the definitions below.
//
// Test-harness scaffolding, not framework code.
#ifndef STUB_NCBITAXONOMY_H
#define STUB_NCBITAXONOMY_H

#include <algorithm>
#include <cassert>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <map>
#include <string>
#include <unordered_map>
#include <vector>

#include "Debug.h"

typedef int TaxID;

struct TaxonNode {
    int id;
    TaxID taxId;
    TaxID parentTaxId;
    size_t rankIdx;
    size_t nameIdx;

    TaxonNode() : id(0), taxId(0), parentTaxId(0), rankIdx(0), nameIdx(0) {}
    TaxonNode(int id, TaxID taxId, TaxID parentTaxId, size_t rankIdx, size_t nameIdx)
        : id(id), taxId(taxId), parentTaxId(parentTaxId), rankIdx(rankIdx), nameIdx(nameIdx) {}
    void print() const {
        std::cout << id << "\t" << taxId << "\t" << parentTaxId << "\t"
                  << rankIdx << "\t" << nameIdx << "\n";
    }
};

struct TaxonCounts {
    unsigned int taxCount = 0;    // reads assigned directly to this taxon
    unsigned int cladeCount = 0;  // reads assigned to this taxon or any descendant
    std::vector<TaxID> children;
};

// StringBlock: append-only string pool; append() returns the entry index,
// getString() resolves it. Serialized layout (a reconstruction guess, only
// relevant for taxonomyDB file parity):
//   [byteSize:size_t][entryCount:size_t][offsets:T*entryCount][data:byteSize]
template <typename T>
class StringBlock {
public:
    StringBlock(size_t byteCapacity_ = 32768, T entryCapacity_ = 1024) {
        byteCapacity = byteCapacity_;
        entryCapacity = entryCapacity_;
        data = (char *)malloc(byteCapacity);
        offsets = (T *)malloc(sizeof(T) * (entryCapacity + 1));
        offsets[0] = 0;
        entryCount = 0;
        externalData = false;
    }
    // deep copy from pointer (used by TaxonomyWrapper::getEditableCopy)
    explicit StringBlock(const StringBlock<T> *other)
        : StringBlock(other->byteCapacity, other->entryCapacity + 1) {
        memcpy(data, other->data, other->offsets[other->entryCount]);
        memcpy(offsets, other->offsets, sizeof(T) * (other->entryCount + 1));
        entryCount = other->entryCount;
    }

    ~StringBlock() {
        if (!externalData) {
            free(data);
            free(offsets);
        }
    }

    const char *getString(T idx) const {
        if (idx >= entryCount) return nullptr;
        return data + offsets[idx];
    }

    T append(const char *str, size_t length) {
        size_t nextSize = (size_t)offsets[entryCount] + length + 1;
        if (nextSize > byteCapacity) {
            byteCapacity = std::max(nextSize, byteCapacity * 2);
            data = (char *)realloc(data, byteCapacity);
        }
        memcpy(data + offsets[entryCount], str, length);
        data[offsets[entryCount] + length] = '\0';
        entryCount++;
        if (entryCount >= entryCapacity) {
            entryCapacity = entryCapacity * 2;
            offsets = (T *)realloc(offsets, sizeof(T) * (entryCapacity + 1));
        }
        offsets[entryCount] = (T)nextSize;
        return entryCount - 1;
    }

    void compact() const {
        // serialized size uses the exact used bytes
        const_cast<StringBlock *>(this)->byteCapacity = offsets[entryCount];
        const_cast<StringBlock *>(this)->entryCapacity = entryCount;
    }

    static size_t memorySize(const StringBlock<T> &block) {
        return 2 * sizeof(size_t) + block.entryCount * sizeof(T) +
               block.offsets[block.entryCount];
    }

    static char *serialize(const StringBlock<T> &block) {
        size_t byteSize = block.offsets[block.entryCount];
        size_t entryCount = block.entryCount;
        char *mem = (char *)malloc(memorySize(block));
        char *p = mem;
        memcpy(p, &byteSize, sizeof(size_t)); p += sizeof(size_t);
        memcpy(p, &entryCount, sizeof(size_t)); p += sizeof(size_t);
        memcpy(p, block.offsets, entryCount * sizeof(T)); p += entryCount * sizeof(T);
        memcpy(p, block.data, byteSize);
        return mem;
    }

    static StringBlock<T> *unserialize(const char *mem) {
        size_t byteSize, entryCount;
        const char *p = mem;
        memcpy(&byteSize, p, sizeof(size_t)); p += sizeof(size_t);
        memcpy(&entryCount, p, sizeof(size_t)); p += sizeof(size_t);
        StringBlock<T> *block = new StringBlock<T>(byteSize + 1, entryCount + 1);
        memcpy(block->offsets, p, entryCount * sizeof(T)); p += entryCount * sizeof(T);
        memcpy(block->data, p, byteSize);
        block->entryCount = (T)entryCount;
        block->offsets[entryCount] = (T)byteSize;
        return block;
    }

    char *data;
    size_t byteCapacity;
    T entryCapacity;
    T entryCount;
    T *offsets;
    bool externalData;
};

// Weighted-vote LCA types (MMseqs2 API surface consumed by
// GroupGenerator::getRepLabel). LINK-ONLY STUB for the group_oracle: the
// oracle harness exercises filterCommonKmers2, never getRepLabel, so this
// implements the documented weighted-majority semantics without claiming
// bit parity with the absent MMseqs2 submodule.
struct WeightedTaxHit {
    TaxID taxon;
    float weight;
    WeightedTaxHit(TaxID taxon, float evalue, int weightVoteMode)
        : taxon(taxon), weight(evalue) {
        if (weightVoteMode == 0) weight = 1.0f;
    }
};

struct WeightedTaxResult {
    TaxID taxon = 0;
    size_t assignedSeqs = 0;
    size_t unassignedSeqs = 0;
    size_t seqsAgreeWith = 0;
    float percentageOfWeight = 0.0f;
};

class NcbiTaxonomy {
public:
    static const int SERIALIZATION_VERSION = 2;

    NcbiTaxonomy()
        : taxonNodes(nullptr), maxNodes(0), maxTaxID(0), D(nullptr), E(nullptr),
          L(nullptr), H(nullptr), M(nullptr), block(nullptr), externalData(false),
          mmapData(nullptr), mmapSize(0) {}

    NcbiTaxonomy(TaxonNode *taxonNodes, size_t maxNodes, int maxTaxID, int *D,
                 int *E, int *L, int *H, int **M, StringBlock<unsigned int> *block)
        : taxonNodes(taxonNodes), maxNodes(maxNodes), maxTaxID(maxTaxID), D(D),
          E(E), L(L), H(H), M(M), block(block), externalData(true),
          mmapData(nullptr), mmapSize(0) {}

    virtual ~NcbiTaxonomy() {
        if (!externalData) {
            delete[] taxonNodes;
            delete[] D;
            delete[] E;
            delete[] L;
            delete[] H;
            if (M) { delete[] M[0]; delete[] M; }
            delete block;
        }
    }

    int nodeId(TaxID taxonId) const {
        if (taxonId < 0 || taxonId > maxTaxID || D[taxonId] == -1) {
            Debug(Debug::ERROR) << "Invalid node " << taxonId << "!\n";
            EXIT(EXIT_FAILURE);
        }
        return D[taxonId];
    }

    bool nodeExists(TaxID taxonId) const {
        return taxonId >= 0 && taxonId <= maxTaxID && D[taxonId] != -1;
    }

    TaxonNode const *taxonNode(TaxID taxonId, bool fail = true) const {
        if (!nodeExists(taxonId)) {
            if (fail) {
                Debug(Debug::ERROR) << "Invalid node " << taxonId << "!\n";
                EXIT(EXIT_FAILURE);
            }
            return nullptr;
        }
        return &taxonNodes[nodeId(taxonId)];
    }

    const char *getString(size_t blockIdx) const {
        return block->getString((unsigned int)blockIdx);
    }

    // --- Euler-tour LCA -----------------------------------------------------
    bool IsAncestor(TaxID ancestor, TaxID child) const {
        if (ancestor == child) return true;
        if (ancestor == 0 || child == 0) return false;
        if (!nodeExists(ancestor) || !nodeExists(child)) return false;
        return lcaHelper(nodeId(child), nodeId(ancestor)) == nodeId(ancestor);
    }

    TaxID LCA(TaxID taxonA, TaxID taxonB) const {
        if (!nodeExists(taxonA)) return taxonB;
        if (!nodeExists(taxonB)) return taxonA;
        return taxonNodes[lcaHelper(nodeId(taxonA), nodeId(taxonB))].taxId;
    }

    TaxonNode const *LCA(const std::vector<TaxID> &taxa) const {
        size_t i = 0;
        while (i < taxa.size() && !nodeExists(taxa[i])) ++i;
        if (i == taxa.size()) return nullptr;
        int node = nodeId(taxa[i]);
        for (++i; i < taxa.size(); ++i) {
            if (!nodeExists(taxa[i])) continue;
            node = lcaHelper(node, nodeId(taxa[i]));
        }
        return &taxonNodes[node];
    }

    // LINK-ONLY STUB (see WeightedTaxHit above): accumulate each vote's
    // weight along its ancestor chain; deepest node clearing the majority
    // cutoff wins. Not exercised by the group_oracle harness.
    WeightedTaxResult weightedMajorityLCA(
        const std::vector<WeightedTaxHit> &setTaxa,
        float majorityCutoff) const {
        std::map<TaxID, float> acc;
        std::map<TaxID, int> depth;
        float total = 0.0f;
        for (const auto &h : setTaxa) {
            if (h.taxon == 0 || !nodeExists(h.taxon)) continue;
            total += h.weight;
            TaxID cur = h.taxon;
            int d = 0;
            std::vector<TaxID> chain;
            while (true) {
                chain.push_back(cur);
                TaxonNode const *n = taxonNode(cur, false);
                if (n == nullptr || n->parentTaxId == cur) break;
                cur = n->parentTaxId;
            }
            for (size_t i = 0; i < chain.size(); ++i) {
                acc[chain[i]] += h.weight;
                int cd = (int)(chain.size() - i);
                auto it = depth.find(chain[i]);
                if (it == depth.end() || it->second < cd) depth[chain[i]] = cd;
                (void)d;
            }
        }
        WeightedTaxResult res;
        float best = -1.0f;
        int bestDepth = -1;
        for (const auto &kv : acc) {
            if (kv.second > majorityCutoff * total) {
                int dd = depth[kv.first];
                if (dd > bestDepth ||
                    (dd == bestDepth && kv.second > best)) {
                    bestDepth = dd;
                    best = kv.second;
                    res.taxon = kv.first;
                    res.percentageOfWeight =
                        total > 0 ? kv.second / total : 0.0f;
                }
            }
        }
        return res;
    }

    // --- rank utilities -----------------------------------------------------
    static int findRankIndex(const std::string &rank) {
        static const std::map<std::string, int> ranks = {
            {"forma", 1}, {"varietas", 2}, {"subspecies", 3}, {"species", 4},
            {"species subgroup", 5}, {"species group", 6}, {"subgenus", 7},
            {"genus", 8}, {"subtribe", 9}, {"tribe", 10}, {"subfamily", 11},
            {"family", 12}, {"superfamily", 13}, {"parvorder", 14},
            {"infraorder", 15}, {"suborder", 16}, {"order", 17},
            {"superorder", 18}, {"infraclass", 19}, {"subclass", 20},
            {"class", 21}, {"superclass", 22}, {"subphylum", 23}, {"phylum", 24},
            {"superphylum", 25}, {"subkingdom", 26}, {"kingdom", 27},
            {"superkingdom", 28}, {"domain", 28}, {"no rank", 0}};
        auto it = ranks.find(rank);
        return it == ranks.end() ? -1 : it->second;
    }

    static std::string findShortRank(const std::string &rank) {
        static const std::map<std::string, std::string> shortRanks = {
            {"species", "s"}, {"genus", "g"}, {"family", "f"}, {"order", "o"},
            {"class", "c"}, {"phylum", "p"}, {"kingdom", "k"},
            {"superkingdom", "d"}, {"domain", "d"}};
        auto it = shortRanks.find(rank);
        return it == shortRanks.end() ? "-" : it->second;
    }

    std::string taxLineage(TaxonNode const *node, bool infoAsName = true) const {
        std::vector<TaxonNode const *> path;
        while (node != nullptr && node->parentTaxId != node->taxId) {
            path.push_back(node);
            node = taxonNode(node->parentTaxId, false);
        }
        if (node != nullptr) path.push_back(node);
        std::string out;
        for (auto it = path.rbegin(); it != path.rend(); ++it) {
            if (it != path.rbegin()) out += ";";
            if (infoAsName) {
                out += findShortRank(getString((*it)->rankIdx));
                out += "_";
            }
            out += getString((*it)->nameIdx);
        }
        return out;
    }

    std::vector<std::string> AtRanks(TaxonNode const *node,
                                     const std::vector<std::string> &levels) const {
        std::vector<std::string> result;
        std::map<std::string, std::string> rank2name;
        while (node != nullptr) {
            rank2name[getString(node->rankIdx)] = getString(node->nameIdx);
            if (node->parentTaxId == node->taxId) break;
            node = taxonNode(node->parentTaxId, false);
        }
        for (const std::string &level : levels) {
            auto it = rank2name.find(level);
            result.push_back(it == rank2name.end() ? "" : it->second);
        }
        return result;
    }

    std::unordered_map<TaxID, std::vector<TaxID>> getParentToChildren() const {
        std::unordered_map<TaxID, std::vector<TaxID>> parentToChildren;
        for (size_t i = 0; i < maxNodes; ++i) {
            if (taxonNodes[i].parentTaxId != taxonNodes[i].taxId) {
                parentToChildren[taxonNodes[i].parentTaxId].push_back(
                    taxonNodes[i].taxId);
            }
        }
        return parentToChildren;
    }

    // Kraken2-style report accounting (Reporter.cpp:121-122): per-taxon
    // counts roll up to every ancestor; children lists keep only taxa that
    // appear in the clade counts.
    std::unordered_map<TaxID, TaxonCounts> getCladeCounts(
        const std::unordered_map<TaxID, unsigned int> &taxonCounts,
        const std::unordered_map<TaxID, std::vector<TaxID>> &parentToChildren)
        const {
        std::unordered_map<TaxID, TaxonCounts> cladeCounts;
        for (const auto &entry : taxonCounts) {
            cladeCounts[entry.first].taxCount = entry.second;
            cladeCounts[entry.first].cladeCount += entry.second;
            if (!nodeExists(entry.first)) continue;
            TaxonNode const *taxon = taxonNode(entry.first);
            while (taxon->parentTaxId != taxon->taxId &&
                   nodeExists(taxon->parentTaxId)) {
                taxon = taxonNode(taxon->parentTaxId);
                cladeCounts[taxon->taxId].cladeCount += entry.second;
            }
        }
        for (auto &entry : cladeCounts) {
            auto it = parentToChildren.find(entry.first);
            if (it == parentToChildren.end()) continue;
            for (TaxID child : it->second) {
                if (cladeCounts.find(child) != cladeCounts.end()) {
                    entry.second.children.push_back(child);
                }
            }
        }
        return cladeCounts;
    }

    std::unordered_map<TaxID, TaxonCounts> getCladeCounts(
        const std::unordered_map<TaxID, unsigned int> &taxonCounts) const {
        std::unordered_map<TaxID, TaxonCounts> cladeCounts;
        for (const auto &entry : taxonCounts) {
            TaxonNode const *node = taxonNode(entry.first, false);
            if (node == nullptr) continue;
            cladeCounts[node->taxId].taxCount = entry.second;
            while (node != nullptr) {
                cladeCounts[node->taxId].cladeCount += entry.second;
                if (node->parentTaxId == node->taxId) break;
                TaxonNode const *parent = taxonNode(node->parentTaxId, false);
                if (parent != nullptr) {
                    std::vector<TaxID> &ch = cladeCounts[parent->taxId].children;
                    if (std::find(ch.begin(), ch.end(), node->taxId) == ch.end()) {
                        ch.push_back(node->taxId);
                    }
                }
                node = parent;
            }
        }
        return cladeCounts;
    }

protected:
    // non-internal-ID loaders (TaxonomyWrapper falls back to these when
    // useInternalTaxID is false, TaxonomyWrapper.cpp:97-100)
    size_t loadNodes(std::vector<TaxonNode> &tmpNodes, const std::string &nodesFile);
    size_t loadMerged(const std::string &mergedFile);

    void elh(std::vector<std::vector<TaxID>> const &children, TaxID taxId,
             int level, std::vector<int> &tmpE, std::vector<int> &tmpL) {
        int id = nodeId(taxId);
        if (H[id] == 0) H[id] = (int)tmpE.size();
        tmpE.push_back(id);
        tmpL.push_back(level);
        for (TaxID child : children[id]) {
            elh(children, child, level + 1, tmpE, tmpL);
            tmpE.push_back(id);
            tmpL.push_back(level);
        }
    }

    void computeSparseTable() {
        size_t dim = maxNodes * 2;
        int k = mlog2(dim) + 1;
        for (size_t i = 0; i < dim; ++i) M[i][0] = (int)i;
        for (int j = 1; j < k; ++j) {
            size_t span = (size_t)1 << j;
            for (size_t i = 0; i + span <= dim; ++i) {
                int a = M[i][j - 1];
                int b = M[i + (span >> 1)][j - 1];
                M[i][j] = (L[a] <= L[b]) ? a : b;
            }
        }
    }

    int lcaHelper(int i, int j) const {
        if (i == j) return E[H[i]];
        int lo = H[i], hi = H[j];
        if (lo > hi) std::swap(lo, hi);
        int j2 = mlog2((size_t)(hi - lo + 1));
        int a = M[lo][j2];
        int b = M[hi - (1 << j2) + 1][j2];
        return (L[a] <= L[b]) ? E[a] : E[b];
    }

    static int mlog2(size_t v) {
        int r = 0;
        while (v >>= 1) ++r;
        return r;
    }

public:  // TaxonomyWrapper accesses these directly
    TaxonNode *taxonNodes;
    size_t maxNodes;
    int maxTaxID;
    int *D;  // external taxid -> node id (or -1)
    int *E;  // Euler tour of node ids (2*maxNodes)
    int *L;  // levels along the tour (2*maxNodes)
    int *H;  // first occurrence of node id in E
    int **M; // sparse table over L
    StringBlock<unsigned int> *block;
    bool externalData;
    char *mmapData;
    size_t mmapSize;
};

inline size_t NcbiTaxonomy::loadNodes(std::vector<TaxonNode> &tmpNodes,
                                      const std::string &nodesFile) {
    std::ifstream ss(nodesFile);
    if (ss.fail()) {
        Debug(Debug::ERROR) << "File " << nodesFile << " not found!\n";
        EXIT(EXIT_FAILURE);
    }
    std::map<TaxID, int> Dm;
    int currentNodeId = 0;
    std::string line;
    while (std::getline(ss, line)) {
        size_t p1 = line.find("\t|\t");
        size_t p2 = line.find("\t|\t", p1 + 3);
        size_t p3 = line.find("\t|\t", p2 + 3);
        TaxID taxId = (TaxID)strtol(line.substr(0, p1).c_str(), nullptr, 10);
        TaxID parentTaxId = (TaxID)strtol(line.substr(p1 + 3, p2 - p1 - 3).c_str(), nullptr, 10);
        std::string rank = line.substr(p2 + 3, p3 - p2 - 3);
        size_t rankIdx = block->append(rank.c_str(), rank.size());
        tmpNodes.emplace_back(currentNodeId, taxId, parentTaxId, rankIdx, (size_t)-1);
        Dm.emplace(taxId, currentNodeId);
        maxTaxID = std::max(maxTaxID, taxId);
        ++currentNodeId;
    }
    D = new int[maxTaxID + 1];
    std::fill_n(D, maxTaxID + 1, -1);
    for (auto &kv : Dm) D[kv.first] = kv.second;
    return tmpNodes.size();
}

inline size_t NcbiTaxonomy::loadMerged(const std::string &mergedFile) {
    std::ifstream ss(mergedFile);
    if (ss.fail()) {
        Debug(Debug::ERROR) << "File " << mergedFile << " not found!\n";
        EXIT(EXIT_FAILURE);
    }
    std::string line;
    size_t count = 0;
    while (std::getline(ss, line)) {
        size_t p1 = line.find("\t|\t");
        size_t p2 = line.find("\t|", p1 + 3);
        TaxID oldId = (TaxID)strtol(line.substr(0, p1).c_str(), nullptr, 10);
        TaxID mergedId = (TaxID)strtol(line.substr(p1 + 3, p2 - p1 - 3).c_str(), nullptr, 10);
        if (oldId <= maxTaxID && !nodeExists(oldId) && nodeExists(mergedId)) {
            D[oldId] = D[mergedId];
            ++count;
        }
    }
    return count;
}

#endif
