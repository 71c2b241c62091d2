// Stub for the `#include "NcbiTaxonomy.cpp"` in the reference's
// IndexCreator.cpp:9 (the mmseqs submodule source is absent). The class
// implementation is inline in NcbiTaxonomy.h; the mmseqs .cpp also defined
// the free helper splitByDelimiter that IndexCreator.cpp:1395 uses.
#include <string>
#include <vector>

static std::vector<std::string> splitByDelimiter(const std::string &s,
                                                 const std::string &delimiter,
                                                 int maxCol) {
    std::vector<std::string> result;
    size_t prev = 0, pos = 0;
    int i = 0;
    do {
        pos = s.find(delimiter, prev);
        if (pos == std::string::npos) pos = s.length();
        result.emplace_back(s.substr(prev, pos - prev));
        prev = pos + delimiter.length();
        i++;
    } while (pos < s.length() && prev < s.length() && i < maxCol);
    return result;
}
