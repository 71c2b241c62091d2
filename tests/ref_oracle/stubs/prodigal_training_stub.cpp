// Stub for lib/prodigal/training.cpp, which is a missing large blob in the
// reference checkout (/root/reference/.MISSING_LARGE_BLOBS). It contained
// only the 50 precomputed metagenomic training-data initializers; the
// single-species training path (the oracle target — used for every >=100kb
// non-eukaryote training genome, IndexCreator.cpp:1140-1151) does not touch
// them. These stubs zero-fill the bins so meta-mode runs don't crash, but
// meta-mode output carries no oracle authority.
#include <cstring>

#include "training.h"

static void zero_fill(struct _training *tinf) {
    memset(tinf, 0, sizeof(struct _training));
    tinf->st_wt = 4.35;
    tinf->trans_table = 11;
}

int write_training_file(char *, struct _training *) { return 0; }
int read_training_file(char *, struct _training *) { return -1; }

#define DEFINE_META_INIT(n) \
    void initialize_metagenome_##n(struct _training *tinf) { zero_fill(tinf); }

DEFINE_META_INIT(0) DEFINE_META_INIT(1) DEFINE_META_INIT(2) DEFINE_META_INIT(3)
DEFINE_META_INIT(4) DEFINE_META_INIT(5) DEFINE_META_INIT(6) DEFINE_META_INIT(7)
DEFINE_META_INIT(8) DEFINE_META_INIT(9) DEFINE_META_INIT(10) DEFINE_META_INIT(11)
DEFINE_META_INIT(12) DEFINE_META_INIT(13) DEFINE_META_INIT(14) DEFINE_META_INIT(15)
DEFINE_META_INIT(16) DEFINE_META_INIT(17) DEFINE_META_INIT(18) DEFINE_META_INIT(19)
DEFINE_META_INIT(20) DEFINE_META_INIT(21) DEFINE_META_INIT(22) DEFINE_META_INIT(23)
DEFINE_META_INIT(24) DEFINE_META_INIT(25) DEFINE_META_INIT(26) DEFINE_META_INIT(27)
DEFINE_META_INIT(28) DEFINE_META_INIT(29) DEFINE_META_INIT(30) DEFINE_META_INIT(31)
DEFINE_META_INIT(32) DEFINE_META_INIT(33) DEFINE_META_INIT(34) DEFINE_META_INIT(35)
DEFINE_META_INIT(36) DEFINE_META_INIT(37) DEFINE_META_INIT(38) DEFINE_META_INIT(39)
DEFINE_META_INIT(40) DEFINE_META_INIT(41) DEFINE_META_INIT(42) DEFINE_META_INIT(43)
DEFINE_META_INIT(44) DEFINE_META_INIT(45) DEFINE_META_INIT(46) DEFINE_META_INIT(47)
DEFINE_META_INIT(48) DEFINE_META_INIT(49)
