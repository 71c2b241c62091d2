// Stub of the tantan header vendored inside the absent MMseqs2 submodule.
// Implements the published tantan algorithm (Frith 2011, "A new repeat-
// masking method enables specific detection of homologous sequences"):
// an HMM with one background state and maxCycleLength repeat-offset states,
// b->r[c] ∝ decay^c (normalized, total repeatProb), r->b = repeatEndProb,
// emission likelihood-ratios from the probability matrix; positions whose
// posterior repeat probability reaches minMaskProb are overwritten with
// maskTable[letter]. No gap states (the reference passes 0,0).
//
// Written as an exact full-sequence forward-backward (double precision,
// per-position rescaling) so it can serve as an independent cross-check of
// metabuli_tpu/native/masker.cpp, which implements the same published
// algorithm with chunked bounded-memory passes. Test scaffolding.
#ifndef STUB_TANTAN_H
#define STUB_TANTAN_H

#include <cstddef>
#include <vector>

namespace tantan {

inline void maskSequences(unsigned char *seqBeg, unsigned char *seqEnd,
                          int maxCycleLength,
                          const double **likelihoodRatioMatrix,
                          double repeatProb, double repeatEndProb,
                          double repeatOffsetProbDecay, double firstGapProb,
                          double otherGapProb, double minMaskProb,
                          const unsigned char *maskTable) {
    (void)firstGapProb;
    (void)otherGapProb;
    const long len = (long)(seqEnd - seqBeg);
    if (len <= 0) return;
    const int C = maxCycleLength;

    // transition probabilities
    std::vector<double> b2r(C);
    double norm = 0.0, p = 1.0;
    for (int c = 0; c < C; ++c) {
        p *= repeatOffsetProbDecay;
        b2r[c] = p;
        norm += p;
    }
    for (int c = 0; c < C; ++c) b2r[c] *= repeatProb / norm;
    const double b2b = 1.0 - repeatProb;
    const double r2b = repeatEndProb;
    const double r2r = 1.0 - repeatEndProb;

    auto ratio = [&](long i, int c) -> double {
        long j = i - (c + 1);
        if (j < 0) return 1.0;
        return likelihoodRatioMatrix[seqBeg[i]][seqBeg[j]];
    };

    // forward with per-position rescaling
    std::vector<double> fwdR((size_t)len * C, 0.0), fwdB(len), scale(len);
    std::vector<double> curR(C, 0.0);
    double curB = 1.0;
    for (long i = 0; i < len; ++i) {
        double sumR = 0.0;
        for (int c = 0; c < C; ++c) sumR += curR[c];
        double nb = curB * b2b + sumR * r2b;
        double total = nb;
        for (int c = 0; c < C; ++c) {
            double nr = (curB * b2r[c] + curR[c] * r2r) * ratio(i, c);
            curR[c] = nr;
            total += nr;
        }
        curB = nb;
        double inv = total > 0 ? 1.0 / total : 1.0;
        curB *= inv;
        for (int c = 0; c < C; ++c) {
            curR[c] *= inv;
            fwdR[(size_t)i * C + c] = curR[c];
        }
        fwdB[i] = curB;
        scale[i] = inv;
    }

    // backward + posterior
    std::vector<double> mask(len);
    std::vector<double> bwdR(C, 1.0), e(C);
    double bwdB = 1.0;
    for (long i = len - 1; i >= 0; --i) {
        double denom = fwdB[i] * bwdB, rep = 0.0;
        for (int c = 0; c < C; ++c) {
            double v = fwdR[(size_t)i * C + c] * bwdR[c];
            denom += v;
            rep += v;
        }
        mask[i] = denom > 0 ? rep / denom : 0.0;
        if (i == 0) break;
        for (int c = 0; c < C; ++c) e[c] = ratio(i, c) * bwdR[c];
        double nb = b2b * bwdB;
        for (int c = 0; c < C; ++c) nb += b2r[c] * e[c];
        for (int c = 0; c < C; ++c) bwdR[c] = (r2b * bwdB + r2r * e[c]) * scale[i];
        bwdB = nb * scale[i];
    }

    for (long i = 0; i < len; ++i) {
        if (mask[i] >= minMaskProb) seqBeg[i] = maskTable[seqBeg[i]];
    }
}

}  // namespace tantan

#endif
