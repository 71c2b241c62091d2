"""Reader for the reference's binary ``taxonomyDB`` files.

Parses the serialization written by ``TaxonomyWrapper::serialize``
(`/root/reference/src/commons/TaxonomyWrapper.cpp:289-361`):

  [version:int] [internalTaxIdUsed:size_t]? [maxNodes:size_t] [maxTaxID:int]
  [TaxonNode * maxNodes] [D:int*(maxTaxID+1)] [internal2org:int*(maxTaxID+1)]?
  [E:int*2N] [L:int*2N] [H:int*N] [M sparse table] [StringBlock]

The TaxonNode struct and StringBlock layout come from the MMseqs2 framework,
which is a git submodule not vendored in the reference checkout — so this
reader validates its structural assumptions (node/taxid ranges, string-table
offsets) and raises rather than silently mis-parsing. Verified assumptions:
TaxonNode = {int id; int taxId; int parentTaxId; pad; size_t rankIdx;
size_t nameIdx} (32 bytes) with a 24-byte no-id variant as fallback;
StringBlock = [byteSize:size_t][entryCount:size_t][offsets:u32*entries][data].
"""

from __future__ import annotations

import struct

import numpy as np

from .taxonomy import Taxonomy


class TaxonomyDBError(ValueError):
    pass


def _parse_string_block(buf: bytes):
    """Try both field orders of the StringBlock header; return list[str]."""
    if len(buf) < 16:
        raise TaxonomyDBError("string block too small")
    a, b = struct.unpack_from("<QQ", buf, 0)
    for byte_size, entries in ((a, b), (b, a)):
        need = 16 + entries * 4 + byte_size
        if entries == 0 or entries > 1 << 30 or byte_size > 1 << 34:
            continue
        if need > len(buf) + 8:  # allow trailing alignment slack
            continue
        offsets = np.frombuffer(buf, np.uint32, count=entries, offset=16)
        data = buf[16 + entries * 4 : 16 + entries * 4 + byte_size]
        if len(offsets) and (offsets.max() >= max(byte_size, 1)):
            continue
        strings = []
        ok = True
        for off in offsets:
            end = data.find(b"\0", off)
            if end < 0:
                ok = False
                break
            strings.append(data[off:end].decode("utf-8", "replace"))
        if ok:
            return strings
    raise TaxonomyDBError("unrecognized StringBlock layout")


def _try_parse(mem: bytes, node_size: int, has_id: bool):
    p = 0
    (version,) = struct.unpack_from("<i", mem, p)
    p += 4
    use_internal = False
    (flag,) = struct.unpack_from("<q", mem, p)
    if flag == 1:
        use_internal = True
        p += 8
    (max_nodes,) = struct.unpack_from("<q", mem, p)
    p += 8
    (max_taxid,) = struct.unpack_from("<i", mem, p)
    p += 4
    if not (0 < max_nodes < 1 << 31) or not (0 < max_taxid < 1 << 31):
        raise TaxonomyDBError("implausible header")
    if use_internal and max_taxid > max_nodes + 1:
        raise TaxonomyDBError("internal-ID header mismatch")

    nodes_bytes = max_nodes * node_size
    if p + nodes_bytes > len(mem):
        raise TaxonomyDBError("truncated nodes")
    raw = np.frombuffer(mem, np.uint8, count=nodes_bytes, offset=p).reshape(
        max_nodes, node_size
    )
    p += nodes_bytes
    if has_id:
        tax_ids = raw[:, 4:8].copy().view(np.int32).reshape(-1)
        parents = raw[:, 8:12].copy().view(np.int32).reshape(-1)
        rank_idx = raw[:, 16:24].copy().view(np.int64).reshape(-1)
        name_idx = raw[:, 24:32].copy().view(np.int64).reshape(-1)
    else:
        tax_ids = raw[:, 0:4].copy().view(np.int32).reshape(-1)
        parents = raw[:, 4:8].copy().view(np.int32).reshape(-1)
        rank_idx = raw[:, 8:16].copy().view(np.int64).reshape(-1)
        name_idx = raw[:, 16:24].copy().view(np.int64).reshape(-1)

    if (tax_ids < 0).any() or (tax_ids > max_taxid).any():
        raise TaxonomyDBError("taxid out of range")
    if (parents < 0).any() or (parents > max_taxid).any():
        raise TaxonomyDBError("parent out of range")

    p += (max_taxid + 1) * 4  # D
    internal2org = None
    if use_internal:
        internal2org = np.frombuffer(
            mem, np.int32, count=max_taxid + 1, offset=p
        ).copy()
        p += (max_taxid + 1) * 4
    p += 2 * (2 * max_nodes) * 4  # E, L
    p += max_nodes * 4            # H
    matrix_dim = 2 * max_nodes
    matrix_k = int(np.floor(np.log2(matrix_dim))) + 1
    p += matrix_dim * matrix_k * 4
    if p >= len(mem):
        raise TaxonomyDBError("truncated before string block")
    strings = _parse_string_block(mem[p:])
    if (rank_idx >= len(strings)).any() or (name_idx >= len(strings)).any():
        raise TaxonomyDBError("string index out of range")
    return (tax_ids, parents, rank_idx, name_idx, strings, internal2org,
            use_internal, max_taxid)


def read_taxonomy_db(path: str) -> Taxonomy:
    """Parse a reference-format binary taxonomyDB into our Taxonomy."""
    with open(path, "rb") as fh:
        mem = fh.read()
    last_err = None
    for node_size, has_id in ((32, True), (24, False), (40, True)):
        try:
            parsed = _try_parse(mem, node_size, has_id)
            break
        except (TaxonomyDBError, struct.error, ValueError) as e:
            last_err = e
    else:
        raise TaxonomyDBError(
            f"could not parse {path}: {last_err}. The MMseqs2 TaxonNode "
            "layout may differ; regenerate dmp files with the reference's "
            "`taxdump` command and load those instead."
        )
    (tax_ids, parents, rank_idx, name_idx, strings, internal2org,
     use_internal, max_taxid) = parsed

    # map (internal) taxids -> our dense 1..N space; taxids in the file are
    # already dense when internal IDs are used
    n = len(tax_ids)
    id_map = {int(t): i + 1 for i, t in enumerate(tax_ids)}
    parent = np.zeros(n + 1, np.int32)
    rank_id = np.zeros(n + 1, np.int32)
    name_id = np.zeros(n + 1, np.int32)
    i2o = np.zeros(n + 1, np.int64)
    ranks: list[str] = []
    names: list[str] = []
    rank_pool: dict[str, int] = {}
    name_pool: dict[str, int] = {}

    def intern(s, pool, idx):
        if s not in idx:
            idx[s] = len(pool)
            pool.append(s)
        return idx[s]

    intern("", ranks, rank_pool)
    intern("unclassified", names, name_pool)
    for i in range(n):
        iid = i + 1
        parent[iid] = id_map.get(int(parents[i]), iid)
        rank_id[iid] = intern(strings[rank_idx[i]], ranks, rank_pool)
        name_id[iid] = intern(strings[name_idx[i]], names, name_pool)
        if use_internal and internal2org is not None:
            t = int(tax_ids[i])
            i2o[iid] = internal2org[t] if t <= max_taxid else t
        else:
            i2o[iid] = int(tax_ids[i])
    return Taxonomy(
        parent=parent, rank_id=rank_id, name_id=name_id, ranks=ranks,
        names=names, internal2org=i2o, use_internal=True,
    )
