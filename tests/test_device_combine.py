"""Device combineMatchPaths vs the annotated Python implementation."""

import numpy as np
import pytest

from metabuli_tpu.classify.device_combine import combine_paths
from metabuli_tpu.classify.taxonomer import Taxonomer, TaxonomerParams, _Path
from metabuli_tpu.db.taxonomy import Taxonomy


def _taxonomy(tmp_path):
    (tmp_path / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n" +
        "".join(f"{t}\t|\t1\t|\tspecies\t|\n" for t in range(2, 10)))
    (tmp_path / "names.dmp").write_text(
        "".join(f"{t}\t|\tN{t}\t|\t\t|\tscientific name\t|\n" for t in range(1, 10)))
    (tmp_path / "merged.dmp").write_text("")
    return Taxonomy.from_dmp(str(tmp_path / "names.dmp"),
                             str(tmp_path / "nodes.dmp"),
                             str(tmp_path / "merged.dmp"))


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_device_combine_matches_python(tmp_path, seed):
    tax = _taxonomy(tmp_path)
    tp = TaxonomerParams()
    py = Taxonomer(tp, tax)
    rng = np.random.default_rng(seed)

    rows = []       # flat paths
    expected = {}   # (read, species) -> python combined score
    read_lens = np.zeros(64, np.int32)
    for read in range(32):
        read_len = int(rng.integers(100, 300))
        read_lens[read] = read_len
        for sp in sorted(rng.choice(range(2, 10), rng.integers(1, 3),
                                    replace=False)):
            n_paths = int(rng.integers(1, 7))
            paths = []
            for _ in range(n_paths):
                start = int(rng.integers(0, read_len - 24))
                length = 24 + 3 * int(rng.integers(0, (read_len - start - 24) // 3 + 1))
                end = start + length - 1
                depth = 1 + (length - 24) // 3
                h16s = int(rng.integers(0, 1 << 16))
                h16e = int(rng.integers(0, 1 << 16))
                ham = int(rng.integers(0, 12))
                score = np.float32(3.0 * depth + 8 + rng.integers(0, 40) * 0.5)
                paths.append((start, end, float(score), ham, depth, h16s, h16e))
            # python oracle over copies (combine mutates)
            m = {"h16": np.array([p[5] for p in paths]
                                 + [p[6] for p in paths], np.int64)}
            py_paths = [
                _Path(p[0], p[1], np.float32(p[2]), p[3], p[4], i, len(paths) + i)
                for i, p in enumerate(paths)
            ]
            expected[(read, sp)] = min(
                1.0, float(py._combine_paths(m, py_paths, read_len))
            )
            for p in paths:
                rows.append((read, sp) + p)

    rng.shuffle(rows)
    arr_i = np.array([(r[0], r[1], r[2], r[3], r[5], r[6], r[7], r[8])
                      for r in rows], np.int32)
    scores = np.array([r[4] for r in rows], np.float32)
    res = combine_paths(
        arr_i[:, 0], arr_i[:, 1], arr_i[:, 2], arr_i[:, 3], scores,
        arr_i[:, 4], arr_i[:, 6], arr_i[:, 7],
        np.ones(len(rows), bool), read_lens,
        n_groups=256, p_max=8,
    )
    assert not np.asarray(res.fallback).any()
    got = {}
    g_r = np.asarray(res.group_read)
    g_s = np.asarray(res.group_species)
    g_sc = np.asarray(res.score)
    for i in np.nonzero(np.asarray(res.group_valid))[0]:
        got[(int(g_r[i]), int(g_s[i]))] = float(g_sc[i])
    assert set(got) == set(expected)
    for key in expected:
        assert abs(got[key] - expected[key]) < 1e-5, (
            key, got[key], expected[key]
        )
