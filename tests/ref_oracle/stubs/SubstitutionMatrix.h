// Stub of the MMseqs2 SubstitutionMatrix/BaseMatrix headers (submodule
// absent). The reference uses these only to feed tantan masking
// (SeqIterator.cpp:154-175): subMat->aa2num[] chars and the probability
// ratio matrix. BaseMatrix here models the nucleotide case the reference
// constructs (NucleotideMatrix("nucleotide.out", 1.0, 0.0)).
// Test scaffolding.
#ifndef STUB_SUBSTITUTIONMATRIX_H
#define STUB_SUBSTITUTIONMATRIX_H

#include <cmath>
#include <cstring>

class BaseMatrix {
public:
    int alphabetSize = 5;          // a c g t x
    char num2aa[32];
    int aa2num[256];
    double **probMatrix = nullptr; // joint probabilities p(a,b)
    double *pBack = nullptr;       // background p(a)

    BaseMatrix() {
        const char *alpha = "acgtx";
        for (int i = 0; i < 256; ++i) aa2num[i] = alphabetSize - 1;  // -> x
        for (int i = 0; i < alphabetSize; ++i) {
            num2aa[i] = alpha[i];
            aa2num[(unsigned char)alpha[i]] = i;
            aa2num[(unsigned char)(alpha[i] - 32)] = i;  // uppercase
        }
        probMatrix = new double *[alphabetSize];
        pBack = new double[alphabetSize];
        for (int i = 0; i < alphabetSize; ++i) {
            probMatrix[i] = new double[alphabetSize];
            pBack[i] = 1.0 / 4.0;
        }
        pBack[alphabetSize - 1] = 1e-10;
        // Nucleotide scoring model used by MMseqs2's NucleotideMatrix:
        // match +2 / mismatch -3 with the Karlin-Altschul lambda solving
        // sum_ab p_a p_b exp(lambda*s_ab) = 1 for uniform p=0.25
        // (~0.63373; same bisection as native/masker.cpp tantan_lambda,
        // the value MMseqs2's probability fit converges to for this
        // matrix — the vendored nucleotide.out itself is absent).
        double lambda;
        {
            double lo = 1e-6, hi = 10.0;
            for (int it = 0; it < 200; ++it) {
                double mid = 0.5 * (lo + hi);
                double v = 0.25 * exp(2.0 * mid) + 0.75 * exp(-3.0 * mid);
                if (v > 1.0) hi = mid; else lo = mid;
            }
            lambda = 0.5 * (lo + hi);
        }
        for (int i = 0; i < alphabetSize; ++i) {
            for (int j = 0; j < alphabetSize; ++j) {
                double s = (i == j) ? 2.0 : -3.0;
                if (i == alphabetSize - 1 || j == alphabetSize - 1) s = 0.0;
                probMatrix[i][j] = pBack[i] * pBack[j] * exp(lambda * s);
            }
        }
    }

    virtual ~BaseMatrix() {
        if (probMatrix) {
            for (int i = 0; i < alphabetSize; ++i) delete[] probMatrix[i];
            delete[] probMatrix;
        }
        delete[] pBack;
    }
};

class SubstitutionMatrix : public BaseMatrix {};

#endif
