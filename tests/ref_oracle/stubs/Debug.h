// Stub of the MMseqs2 Debug header (submodule absent). Test scaffolding.
#ifndef STUB_DEBUG_H
#define STUB_DEBUG_H

#include <cstdlib>
#include <iostream>
#include <string>

#ifndef EXIT
#define EXIT(x) exit(x)
#endif

class Debug {
public:
    static const int NOTHING = 0;
    static const int ERROR = 1;
    static const int WARNING = 2;
    static const int INFO = 3;
    static int debugLevel;

    explicit Debug(int level) : level(level) {}

    template <typename T>
    Debug &operator<<(const T &t) {
        if (level <= debugLevel) std::cerr << t;
        return *this;
    }

private:
    int level;
};

#endif
