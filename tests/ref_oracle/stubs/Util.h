// Stub of the MMseqs2 Util header (submodule absent). Test scaffolding.
#ifndef STUB_UTIL_H
#define STUB_UTIL_H

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#ifndef SSTR
#define SSTR(x) std::to_string(x)
#endif

class Util {
public:
    static bool endsWith(const std::string &suffix, const std::string &str) {
        if (str.length() < suffix.length()) return false;
        return (!str.compare(str.length() - suffix.length(), suffix.length(), suffix));
    }

    static bool startWith(const std::string &prefix, const std::string &str,
                          size_t offset = 0) {
        if (str.length() < prefix.length() + offset) return false;
        return (!str.compare(offset, prefix.length(), prefix));
    }

    static std::vector<std::string> split(const std::string &str,
                                          const std::string &sep) {
        std::vector<std::string> arr;
        char *cstr = const_cast<char *>(str.c_str());
        const char *csep = sep.c_str();
        char *rest;
        char *current = strtok_r(cstr, csep, &rest);
        while (current != nullptr) {
            arr.emplace_back(current);
            current = strtok_r(nullptr, csep, &rest);
        }
        return arr;
    }

    static bool isNumber(const std::string &s) {
        if (s.empty()) return false;
        return std::all_of(s.begin(), s.end(),
                           [](unsigned char c) { return std::isdigit(c); });
    }
};

#endif
