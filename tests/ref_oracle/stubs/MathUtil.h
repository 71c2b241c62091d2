// Stub of the MMseqs2 MathUtil header (submodule absent). Test scaffolding.
#ifndef STUB_MATHUTIL_H
#define STUB_MATHUTIL_H

#include <cmath>
#include <cstddef>

class MathUtil {
public:
    static double flog2(double x) { return log2(x); }
};

#endif
