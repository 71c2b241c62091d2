"""ctypes bridge to the native (C++) batch taxonomer.

Same semantics as classify.taxonomer (the annotated Python implementation);
processes a whole batch of reads in one OpenMP-parallel call.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..db.taxonomy import Taxonomy
from ..native import get_lib
from .taxonomer import ReadClassification, TaxonomerParams

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C")


class NativeTaxonomer:
    def __init__(self, params: TaxonomerParams, taxonomy: Taxonomy, threads: int = 0):
        self.p = params
        self.tax = taxonomy
        self.threads = threads
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("native library unavailable")
        t = taxonomy
        self._parent = np.ascontiguousarray(t.parent, np.int32)
        self._euler_first = np.ascontiguousarray(t.euler_first, np.int64)
        self._euler_node = np.ascontiguousarray(t.euler_node, np.int32)
        self._sparse = np.ascontiguousarray(t.sparse, np.int64)
        self._euler_depth = np.ascontiguousarray(t._euler_depth, np.int64)
        self._tin = np.ascontiguousarray(t.tin, np.int64)
        self._tout = np.ascontiguousarray(t.tout, np.int64)
        self._species_of = np.ascontiguousarray(t.species_of, np.int32)
        leafish = np.zeros(t.n_nodes() + 1, np.uint8)
        for i in range(1, t.n_nodes() + 1):
            r = t.rank_of(i)
            if r in ("", "accession"):
                leafish[i] = 1
        self._leafish = leafish

    def assign_batch(
        self,
        m: dict,
        read_start: np.ndarray,
        read_end: np.ndarray,
        read_lens: np.ndarray,
    ) -> tuple[list[ReadClassification], list[tuple[int, int, float]]]:
        n_reads = len(read_start)
        n_matches = len(m["qid"])
        p = self.p
        arrays = {
            k: np.ascontiguousarray(m[k], np.int32)
            for k in ("qid", "species", "frame", "pos", "hamming", "dna", "taxid", "h16")
        }
        out_taxid = np.zeros(n_reads, np.int32)
        out_score = np.zeros(n_reads, np.float32)
        out_cls = np.zeros(n_reads, np.uint8)
        taxcnt_cap = max(1024, n_matches + n_reads)
        tc_read = np.zeros(taxcnt_cap, np.int64)
        tc_tax = np.zeros(taxcnt_cap, np.int32)
        tc_cnt = np.zeros(taxcnt_cap, np.int32)
        tc_used = ctypes.c_int64(0)
        map_cap = (10 * n_reads) if p.em else 1
        mp_read = np.zeros(map_cap, np.int64)
        mp_sp = np.zeros(map_cap, np.int32)
        mp_score = np.zeros(map_cap, np.float32)
        mp_used = ctypes.c_int64(0)

        import os as _os

        dump = _os.environ.get("METABULI_TPU_DUMP_NATIVE")
        if dump and n_matches and not _os.path.exists(
                _os.path.join(dump, "manifest.txt")):
            # raw-buffer dump for the sanitizer replay harness
            # (native/sancheck.cpp): the ASan runtime cannot coexist with
            # jaxlib in one process, so the real call is replayed there
            self._dump_args(
                dump, n_matches, arrays, read_start, read_end, read_lens,
                n_reads, 0 if m.get("sorted", True) else 1)

        rc = self.lib.taxonomer_assign(
            ctypes.c_int64(n_matches),
            arrays["qid"].ctypes, arrays["species"].ctypes, arrays["frame"].ctypes,
            arrays["pos"].ctypes, arrays["hamming"].ctypes, arrays["dna"].ctypes,
            arrays["taxid"].ctypes, arrays["h16"].ctypes,
            ctypes.c_int64(n_reads),
            np.ascontiguousarray(read_start, np.int64).ctypes,
            np.ascontiguousarray(read_end, np.int64).ctypes,
            np.ascontiguousarray(read_lens, np.int32).ctypes,
            ctypes.c_int32(self.tax.n_nodes()),
            self._parent.ctypes, self._euler_first.ctypes,
            self._euler_node.ctypes, self._sparse.ctypes,
            self._euler_depth.ctypes,
            ctypes.c_int32(self._sparse.shape[0]),
            ctypes.c_int64(self._sparse.shape[1]),
            self._tin.ctypes, self._tout.ctypes, self._species_of.ctypes,
            self._leafish.ctypes, ctypes.c_int32(self.tax.eukaryota_id),
            ctypes.c_int32(p.kmer_format),
            ctypes.c_float(p.min_score), ctypes.c_float(p.min_sp_score),
            ctypes.c_int32(p.min_cons_cnt), ctypes.c_int32(p.min_cons_cnt_euk),
            ctypes.c_float(p.tie_ratio), ctypes.c_int32(p.dna_shift),
            ctypes.c_int32(p.max_codon_shift), ctypes.c_int32(p.denominator),
            ctypes.c_int32(p.accession_level), ctypes.c_int32(1 if p.em else 0),
            ctypes.c_int32(p.bits_per_codon),
            ctypes.c_int32(self.threads),
            ctypes.c_int32(0 if m.get("sorted", True) else 1),
            out_taxid.ctypes, out_score.ctypes, out_cls.ctypes,
            ctypes.c_int64(taxcnt_cap), tc_read.ctypes, tc_tax.ctypes,
            tc_cnt.ctypes, ctypes.byref(tc_used),
            ctypes.c_int64(map_cap), mp_read.ctypes, mp_sp.ctypes,
            mp_score.ctypes, ctypes.byref(mp_used),
        )
        if rc != 0:
            raise RuntimeError("native taxonomer output buffer overflow")

        results = [
            ReadClassification(
                is_classified=bool(out_cls[i]),
                taxid=int(out_taxid[i]),
                score=float(out_score[i]),
            )
            for i in range(n_reads)
        ]
        for k in range(int(tc_used.value)):
            res = results[int(tc_read[k])]
            res.tax_counts[int(tc_tax[k])] = int(tc_cnt[k])
        mappings = []
        for k in range(int(mp_used.value)):
            mappings.append((int(mp_read[k]), int(mp_sp[k]), float(mp_score[k])))
            results[int(mp_read[k])].species_scores.append(
                (int(mp_sp[k]), float(mp_score[k]))
            )
        return results, mappings

    def _dump_args(self, out_dir, n_matches, arrays, read_start, read_end,
                   read_lens, n_reads, need_sort):
        """Write the exact taxonomer_assign argument buffers for the
        sanitizer replay harness (tests/test_native_sanitize.py)."""
        import os

        os.makedirs(out_dir, exist_ok=True)
        p = self.p
        named = dict(
            arrays,
            read_start=np.ascontiguousarray(read_start, np.int64),
            read_end=np.ascontiguousarray(read_end, np.int64),
            read_len=np.ascontiguousarray(read_lens, np.int32),
            parent=self._parent, euler_first=self._euler_first,
            euler_node=self._euler_node,
            sparse=np.ascontiguousarray(self._sparse.reshape(-1)),
            euler_depth=self._euler_depth, tin=self._tin, tout=self._tout,
            species_of=self._species_of, leafish=self._leafish,
        )
        lines = []
        for name, arr in named.items():
            arr.tofile(os.path.join(out_dir, name + ".bin"))
            lines.append(f"array {name} {arr.dtype.itemsize} {arr.size}")
        scalars = dict(
            n_matches=n_matches, n_reads=n_reads,
            n_nodes=self.tax.n_nodes(),
            sparse_levels=self._sparse.shape[0],
            euler_len=self._sparse.shape[1],
            eukaryota_id=self.tax.eukaryota_id,
            kmer_format=p.kmer_format, min_cons_cnt=p.min_cons_cnt,
            min_cons_cnt_euk=p.min_cons_cnt_euk, dna_shift=p.dna_shift,
            max_codon_shift=p.max_codon_shift, denominator=p.denominator,
            accession_level=p.accession_level, em=1 if p.em else 0,
            bits_per_codon=p.bits_per_codon, need_sort=need_sort,
        )
        for name, v in scalars.items():
            lines.append(f"scalar {name} {int(v)}")
        for name, v in (("min_score", p.min_score),
                        ("min_sp_score", p.min_sp_score),
                        ("tie_ratio", p.tie_ratio)):
            lines.append(f"fscalar {name} {float(v)!r}")
        with open(os.path.join(out_dir, "manifest.txt"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
