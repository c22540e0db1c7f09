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
