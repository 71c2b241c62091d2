"""Binary taxonomyDB reader against a synthetic file in the documented
serialize layout (`TaxonomyWrapper.cpp:289-361`)."""

import struct

import numpy as np
import pytest

from metabuli_tpu.db.taxdb_binary import TaxonomyDBError, read_taxonomy_db


def _write_synthetic(path, use_internal=True):
    # nodes: internal ids 1..5, originals 100,200,...; ranks/names in block
    nodes = [
        # (taxId, parent, rankIdx, nameIdx)
        (1, 1, 0, 1),  # root, rank "no rank"
        (2, 1, 2, 2),  # superkingdom
        (3, 2, 3, 3),  # species
        (4, 2, 3, 4),
        (5, 3, 4, 5),  # subspecies
    ]
    strings = ["", "root", "no rank", "superkingdom", "species", "subspecies",
               "Bac", "SpA", "SpB", "SpAsub"]
    # names use indices 6..9 for real names; remap node name idx
    nodes = [
        (1, 1, 2, 1),
        (2, 1, 3, 6),
        (3, 2, 4, 7),
        (4, 2, 4, 8),
        (5, 3, 5, 9),
    ]
    max_nodes = len(nodes)
    max_taxid = 5
    buf = b""
    buf += struct.pack("<i", 2)               # version
    if use_internal:
        buf += struct.pack("<q", 1)           # internalTaxIdUsed
    buf += struct.pack("<q", max_nodes)
    buf += struct.pack("<i", max_taxid)
    for i, (t, p, r, n) in enumerate(nodes):  # 32-byte TaxonNode with id
        buf += struct.pack("<iii4xqq", i, t, p, r, n)
    # D array
    buf += np.arange(max_taxid + 1, dtype=np.int32).tobytes()
    if use_internal:
        buf += np.array([0, 100, 200, 300, 400, 500], np.int32).tobytes()
    buf += np.zeros(2 * 2 * max_nodes, np.int32).tobytes()   # E, L
    buf += np.zeros(max_nodes, np.int32).tobytes()           # H
    dim = 2 * max_nodes
    k = int(np.floor(np.log2(dim))) + 1
    buf += np.zeros(dim * k, np.int32).tobytes()             # M
    # string block: [byteSize][entryCount][offsets u32][data]
    data = b"".join(s.encode() + b"\0" for s in strings)
    offsets = []
    off = 0
    for s in strings:
        offsets.append(off)
        off += len(s) + 1
    buf += struct.pack("<qq", len(data), len(strings))
    buf += np.array(offsets, np.uint32).tobytes()
    buf += data
    path.write_bytes(buf)


def test_read_synthetic_taxonomy_db(tmp_path):
    f = tmp_path / "taxonomyDB"
    _write_synthetic(f)
    tax = read_taxonomy_db(str(f))
    assert tax.n_nodes() == 5
    assert tax.to_original(tax.to_internal(300)) == 300
    sp_a = tax.to_internal(300)
    sub = tax.to_internal(500)
    assert tax.rank_of(sp_a) == "species"
    assert tax.name_of(sub) == "SpAsub"
    assert tax.is_ancestor(sp_a, sub)
    assert tax.lca([sp_a, tax.to_internal(400)]) == tax.to_internal(200)


def test_reject_garbage(tmp_path):
    f = tmp_path / "taxonomyDB"
    f.write_bytes(b"\x01\x02\x03\x04" * 100)
    with pytest.raises(TaxonomyDBError):
        read_taxonomy_db(str(f))
