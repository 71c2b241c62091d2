// Differential oracle for the Prodigal single-mode port
// (metabuli_tpu/native/prodigal.cpp). Runs the reference's OWN
// ProdigalWrapper (vendored Prodigal sources compiled from
// /root/reference) and dumps trained-model / node / gene state in the
// exact text format pdg_dump emits, so the port can be byte-compared.
//
// Usage: prodigal_oracle <stage>
//   stdin line 1: training sequence (raw bases)
//   stdin line 2: target sequence (raw bases; may equal line 1)
// stage 0: trained _training dump; 1: node dump after getPredictedGenes;
// stage 2: raw genes; 3: genes after removeCompletelyOverlappingGenes.

#include <cstdio>
#include <cstring>
#include <iostream>
#include <string>

#include "ProdigalWrapper.h"

int main(int argc, char** argv) {
    if (argc < 2) return 2;
    int stage = atoi(argv[1]);
    std::string train_seq, target_seq;
    if (!std::getline(std::cin, train_seq)) return 3;
    if (!std::getline(std::cin, target_seq)) target_seq = train_seq;

    ProdigalWrapper pw;
    if (stage >= 4) {
        // meta mode: bins loaded via METABULI_META_BINS (training stub);
        // trainMeta picks the best bin, getPredictedGenes predicts with it
        // (ProdigalWrapper.cpp:129-186, 217-250). Stage 4 = raw genes,
        // stage 5 = after removeCompletelyOverlappingGenes.
        pw.is_meta = 1;
        pw.trainMeta((unsigned char*)train_seq.data(), train_seq.size());
        pw.getPredictedGenes((unsigned char*)target_seq.data(),
                             target_seq.size());
        if (stage == 6) {  // meta node dump
            for (int i = 0; i < pw.nn; i++) {
                const _node& n = pw.nodes[i];
                printf("node %d %d %d %d %d %.17g %.17g %.17g %.17g %.17g %d %d\n",
                       n.ndx, n.type, n.strand, n.stop_val, n.edge, n.cscore,
                       n.sscore, n.tscore, n.rscore, n.uscore, n.rbs[0],
                       n.rbs[1]);
            }
            return 0;
        }
        if (stage == 4) {
            printf("max_phase %d\n", pw.max_phase);
            for (int i = 0; i < pw.getNumberOfPredictedGenes(); i++)
                printf("gene %d %d %d\n", pw.genes[i].begin, pw.genes[i].end,
                       pw.nodes[pw.genes[i].start_ndx].strand);
            return 0;
        }
        pw.removeCompletelyOverlappingGenes();
        for (int i = 0; i < pw.fng; i++)
            printf("gene %d %d %d\n", pw.finalGenes[i].begin,
                   pw.finalGenes[i].end,
                   pw.nodes[pw.finalGenes[i].start_ndx].strand);
        return 0;
    }
    pw.is_meta = 0;
    pw.trainASpecies((unsigned char*)train_seq.data(), train_seq.size());
    _training* ti = pw.getTrainingInfo();

    if (stage == 0) {
        printf("gc %.17g\nuses_sd %d\nno_mot %.17g\n", ti->gc, ti->uses_sd,
               ti->no_mot);
        printf("bias %.17g %.17g %.17g\n", ti->bias[0], ti->bias[1],
               ti->bias[2]);
        printf("type_wt %.17g %.17g %.17g\n", ti->type_wt[0], ti->type_wt[1],
               ti->type_wt[2]);
        for (int i = 0; i < 28; i++)
            printf("rbs_wt %d %.17g\n", i, ti->rbs_wt[i]);
        for (int i = 0; i < 32; i++)
            printf("ups %d %.17g %.17g %.17g %.17g\n", i, ti->ups_comp[i][0],
                   ti->ups_comp[i][1], ti->ups_comp[i][2], ti->ups_comp[i][3]);
        for (int i = 0; i < 4096; i++)
            if (ti->gene_dc[i] != 0.0)
                printf("dc %d %.17g\n", i, ti->gene_dc[i]);
        for (int j = 0; j < 4; j++)
            for (int k = 0; k < 4; k++)
                for (int l = 0; l < 4096; l++)
                    if (ti->mot_wt[j][k][l] != 0.0)
                        printf("mot %d %d %d %.17g\n", j, k, l,
                               ti->mot_wt[j][k][l]);
        return 0;
    }

    pw.getPredictedGenes((unsigned char*)target_seq.data(),
                         target_seq.size());
    if (stage == 1) {
        for (int i = 0; i < pw.nn; i++) {
            const _node& n = pw.nodes[i];
            printf("node %d %d %d %d %d %.17g %.17g %.17g %.17g %.17g %d %d\n",
                   n.ndx, n.type, n.strand, n.stop_val, n.edge, n.cscore,
                   n.sscore, n.tscore, n.rscore, n.uscore, n.rbs[0], n.rbs[1]);
        }
        return 0;
    }
    if (stage == 2) {
        for (int i = 0; i < pw.getNumberOfPredictedGenes(); i++)
            printf("gene %d %d %d\n", pw.genes[i].begin, pw.genes[i].end,
                   pw.nodes[pw.genes[i].start_ndx].strand);
        return 0;
    }
    pw.removeCompletelyOverlappingGenes();
    for (int i = 0; i < pw.fng; i++)
        printf("gene %d %d %d\n", pw.finalGenes[i].begin, pw.finalGenes[i].end,
               pw.nodes[pw.finalGenes[i].start_ndx].strand);
    return 0;
}
