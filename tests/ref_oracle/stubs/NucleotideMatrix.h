// Stub of the MMseqs2 NucleotideMatrix header (submodule absent).
// Test scaffolding; see SubstitutionMatrix.h for the model notes.
#ifndef STUB_NUCLEOTIDEMATRIX_H
#define STUB_NUCLEOTIDEMATRIX_H

#include "SubstitutionMatrix.h"

class NucleotideMatrix : public BaseMatrix {
public:
    NucleotideMatrix(const char * /*scoringMatrixFileName*/, float /*bitFactor*/,
                     float /*scoreBias*/) {}
};

class ProbabilityMatrix {
public:
    explicit ProbabilityMatrix(const BaseMatrix &subMat) {
        alphabetSize = subMat.alphabetSize;
        probMatrix = new double *[alphabetSize];
        for (int i = 0; i < alphabetSize; ++i) {
            probMatrix[i] = new double[alphabetSize];
            for (int j = 0; j < alphabetSize; ++j) {
                // likelihood ratio p(a,b) / (p(a) p(b)) — what tantan expects
                probMatrix[i][j] =
                    subMat.probMatrix[i][j] / (subMat.pBack[i] * subMat.pBack[j]);
            }
        }
        probMatrixPointers = (const double **)probMatrix;
        hardMaskTable = new unsigned char[256];
        for (int i = 0; i < 256; ++i) hardMaskTable[i] = (unsigned char)(alphabetSize - 1);
    }
    ~ProbabilityMatrix() {
        for (int i = 0; i < alphabetSize; ++i) delete[] probMatrix[i];
        delete[] probMatrix;
        delete[] hardMaskTable;
    }

    int alphabetSize;
    double **probMatrix;
    const double **probMatrixPointers;
    unsigned char *hardMaskTable;
};

#endif
