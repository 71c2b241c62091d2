// Stub of the MMseqs2 FileUtil header (submodule absent). Test scaffolding.
#ifndef STUB_FILEUTIL_H
#define STUB_FILEUTIL_H

#include <cstdio>
#include <fstream>
#include <string>
#include <sys/stat.h>
#include <sys/types.h>

class FileUtil {
public:
    static bool fileExists(const char *path) {
        struct stat st;
        return stat(path, &st) == 0;
    }

    static bool directoryExists(const char *path) {
        struct stat st;
        return stat(path, &st) == 0 && S_ISDIR(st.st_mode);
    }

    static bool makeDir(const char *path, int mode = 0777) {
        return mkdir(path, mode) == 0;
    }

    static size_t getFileSize(const std::string &path) {
        struct stat st;
        if (stat(path.c_str(), &st) != 0) return (size_t)-1;
        return (size_t)st.st_size;
    }

    static void copyFile(const std::string &src, const std::string &dst) {
        std::ifstream in(src, std::ios::binary);
        std::ofstream out(dst, std::ios::binary);
        out << in.rdbuf();
    }
};

#endif
