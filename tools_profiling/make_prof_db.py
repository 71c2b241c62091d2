"""Build the bench world's DB once and cache it for the profile_* scripts."""

import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B


def main():
    with tempfile.TemporaryDirectory() as tmp:
        tax, genomes, rng = B.build_world(tmp)
        t0 = time.time()
        values, taxids, cap = B.build_db(tax, genomes)
        print(f"db: {len(values)} kmers, cap {cap}, {time.time()-t0:.1f}s")
        np.savez("/tmp/prof_db.npz", values=values, taxids=taxids, cap=cap)


if __name__ == "__main__":
    main()
