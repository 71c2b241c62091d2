"""`databases` download machinery, exercised via file:// URLs
(the zero-egress analogue of data/metabulidatabases.sh)."""

import hashlib
import os
import subprocess
import sys
import tarfile

import numpy as np
import pytest

from metabuli_tpu.tools.databases import CATALOG, download_database


def _make_tarball(tmp_path, name, nested=False):
    """Package a tiny valid DB directory as <name> under tmp_path/serve."""
    from metabuli_tpu.db.build import build_database
    from metabuli_tpu.params import BuildParams

    rng = np.random.default_rng(1)
    root = tmp_path / "world"
    (root / "taxonomy").mkdir(parents=True)
    (root / "taxonomy" / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\t\t|\n4\t|\t1\t|\tspecies\t|\t\t|\n")
    (root / "taxonomy" / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "4\t|\tSp\t|\t\t|\tscientific name\t|\n")
    (root / "taxonomy" / "merged.dmp").write_text("")
    g = bytes(rng.choice(np.array(list(b"ACGT"), np.uint8), 3000))
    (root / "g.fna").write_text(f">ACC_1.1\n{g.decode()}\n")
    (root / "lib.txt").write_text(str(root / "g.fna") + "\n")
    (root / "map.tsv").write_text("ACC_1.1\t4\n")
    db = root / "db"
    build_database(str(db), str(root / "lib.txt"), str(root / "map.tsv"),
                   str(root / "taxonomy"), BuildParams(gene_prediction=0, mask_mode=0))
    serve = tmp_path / "serve"
    serve.mkdir()
    tar_path = serve / name
    with tarfile.open(tar_path, "w:gz") as tf:
        if nested:
            tf.add(db, arcname="unpacked_db")
        else:
            for f in sorted(os.listdir(db)):
                tf.add(db / f, arcname=f)
    return serve, tar_path


def test_download_unpack_flow(tmp_path):
    serve, tar_path = _make_tarball(tmp_path, CATALOG["RefSeq_virus"][0])
    sha = hashlib.sha256(tar_path.read_bytes()).hexdigest()
    out = tmp_path / "outdb"
    db_dir = download_database(
        "RefSeq_virus", str(out), str(tmp_path / "dl_tmp"),
        base_url=f"file://{serve}", checksum=sha,
    )
    assert os.path.exists(os.path.join(db_dir, "diffIdx"))
    assert os.path.exists(os.path.join(db_dir, "db.parameters"))
    # resumable: a second call reuses the tarball (delete the server copy)
    tar_path.unlink()
    db_dir2 = download_database(
        "RefSeq_virus", str(tmp_path / "outdb2"), str(tmp_path / "dl_tmp"),
        base_url=f"file://{serve}",
    )
    assert os.path.exists(os.path.join(db_dir2, "info"))


def test_nested_tarball_and_checksum_mismatch(tmp_path):
    serve, tar_path = _make_tarball(tmp_path, CATALOG["GTDB"][0], nested=True)
    db_dir = download_database(
        "GTDB", str(tmp_path / "out"), str(tmp_path / "t"),
        base_url=f"file://{serve}",
    )
    assert db_dir.endswith("unpacked_db")
    with pytest.raises(ValueError, match="checksum mismatch"):
        download_database(
            "GTDB", str(tmp_path / "out2"), str(tmp_path / "t2"),
            base_url=f"file://{serve}", checksum="0" * 64,
        )


def test_unknown_selection_and_cli_catalog(tmp_path):
    with pytest.raises(ValueError, match="unknown database"):
        download_database("NopeDB", str(tmp_path / "o"), str(tmp_path / "t"))
    res = subprocess.run(
        [sys.executable, "-m", "metabuli_tpu.cli", "databases"],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert res.returncode == 0
    assert "GTDB" in res.stdout and "RefSeq_virus" in res.stdout
