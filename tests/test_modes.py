"""Amino-acid mode and score-matrix-file parity vs reference goldens."""
import pathlib

import pytest

from conftest import DATA, GOLDEN_SAN
from test_parity import run_cli

PROT = str(DATA / "prot.fa")
SEQ = str(DATA / "seq.fa")
REF = pathlib.Path("/root/reference")


def test_aa_cons():
    expected = (GOLDEN_SAN / "prot_cons.fa").read_text()
    assert run_cli(["-c", PROT]) == expected


def test_aa_msa():
    expected = (GOLDEN_SAN / "prot_cons_msa.out").read_text()
    assert run_cli(["-c", "-r2", PROT]) == expected


@pytest.mark.skipif(not (REF / "BLOSUM62.mtx").exists(),
                    reason="reference matrix files not mounted")
def test_aa_blosum62():
    expected = (GOLDEN_SAN / "prot_blosum_cons.fa").read_text()
    assert run_cli(["-c", "-t", str(REF / "BLOSUM62.mtx"), PROT]) \
        == expected


@pytest.mark.skipif(not (REF / "HOXD70.mtx").exists(),
                    reason="reference matrix files not mounted")
def test_nt_hoxd70():
    expected = (GOLDEN_SAN / "seq_hoxd70_cons.fa").read_text()
    assert run_cli(["-t", str(REF / "HOXD70.mtx"), SEQ]) == expected


def test_fastq_qv_weights():
    """-Q: FASTQ quality as edge weight (ref abpoa_align.c:465)."""
    expected = (GOLDEN_SAN / "seq_fq_Q_cons.fa").read_text()
    assert run_cli(["-Q", str(DATA / "seq.fq")]) == expected


def test_fastq_qv_multicons_msa():
    """-Q -d2 -r2: qv-weighted multi-consensus clustering."""
    expected = (GOLDEN_SAN / "seq_fq_Qd2_msa.out").read_text()
    assert run_cli(["-Q", "-d2", "-r2", str(DATA / "seq.fq")]) == expected


def test_list_mode(tmp_path):
    """-l: input is a list of sequence files (serial, one graph each)."""
    lst = tmp_path / "list.txt"
    lst.write_text(f"{DATA / 'heter.fa'}\n{DATA / 'seq.fa'}\n")
    expected = (GOLDEN_SAN / "list_cons.fa").read_text()
    assert run_cli(["-l", str(lst)]) == expected


def test_amb_strand_jax_engine():
    """-s via the device/XLA engine: exercises the adaptive-band state
    writeback between two aligns of the same read (no re-toposort)."""
    expected = (GOLDEN_SAN / "seq_cons_ambs.fa").read_text()
    assert run_cli(["--engine", "jax", "-s", str(DATA / "seq.fa")]) \
        == expected
