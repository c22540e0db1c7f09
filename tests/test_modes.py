"""Amino-acid mode and score-matrix-file parity vs reference goldens."""
import pathlib

import pytest

from conftest import DATA, GOLDEN_SAN
from test_parity import run_cli

PROT = str(DATA / "prot.fa")
SEQ = str(DATA / "seq.fa")
# vendored score-matrix data files at repo root (same layout as the
# reference repo, so `-t BLOSUM62.mtx` works standalone)
MTX = pathlib.Path(__file__).resolve().parent.parent


def test_aa_cons():
    expected = (GOLDEN_SAN / "prot_cons.fa").read_text()
    assert run_cli(["-c", PROT]) == expected


def test_aa_msa():
    expected = (GOLDEN_SAN / "prot_cons_msa.out").read_text()
    assert run_cli(["-c", "-r2", PROT]) == expected


def test_aa_blosum62():
    expected = (GOLDEN_SAN / "prot_blosum_cons.fa").read_text()
    assert run_cli(["-c", "-t", str(MTX / "BLOSUM62.mtx"), PROT]) \
        == expected


def test_nt_hoxd70():
    expected = (GOLDEN_SAN / "seq_hoxd70_cons.fa").read_text()
    assert run_cli(["-t", str(MTX / "HOXD70.mtx"), SEQ]) == expected


def test_aa_pam250():
    expected = (GOLDEN_SAN / "prot_pam250_cons.fa").read_text()
    assert run_cli(["-c", "-t", str(MTX / "PAM250.mtx"), PROT]) \
        == expected


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


def test_verbose_seeding_messages():
    """-V1: seeding progress messages on stderr
    (ref abpoa_seed.c:234,322,691,699)."""
    import io
    import contextlib
    from abpoa_tpu.cli import main
    err = io.StringIO()
    with contextlib.redirect_stdout(io.StringIO()), \
            contextlib.redirect_stderr(err):
        rc = main(["-S", "-p", "-V1", str(DATA / "heter.fa")])
    assert rc == 0
    lines = err.getvalue().splitlines()
    assert "[abpoa_collect_mm] Collecting minimizers ... done!" in lines
    assert ("[abpoa_build_guide_tree] Building progressive guide tree"
            " ... done!") in lines


def test_amb_strand_jax_engine():
    """-s via the device/XLA engine: exercises the adaptive-band state
    writeback between two aligns of the same read (no re-toposort)."""
    expected = (GOLDEN_SAN / "seq_cons_ambs.fa").read_text()
    assert run_cli(["--engine", "jax", "-s", str(DATA / "seq.fa")]) \
        == expected


def test_pog_dot_golden(tmp_path):
    """-g: Graphviz .dot output byte-matches the reference
    (ref abpoa_plot.c:33-121)."""
    out = tmp_path / "pog.png"
    import io
    import contextlib
    from abpoa_tpu.cli import main
    with contextlib.redirect_stdout(io.StringIO()), \
            contextlib.redirect_stderr(io.StringIO()):
        main([str(DATA / "seq.fa"), "-g", str(out)])
    got = (tmp_path / "pog.png.dot").read_text()
    assert got == (GOLDEN_SAN / "seq_pog.dot").read_text()


def test_list_qv_batched_matches_serial(tmp_path):
    """-l -Q --engine jax: qv weights flow through BatchPOA (round-2 gap:
    the batched list mode silently fell back to the serial loop)."""
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join([str(DATA / "seq.fq")] * 4) + "\n")
    serial = run_cli(["-Q", "-l", str(lst)])
    batched = run_cli(["-Q", "-l", "--engine", "jax", str(lst)])
    assert batched == serial


def test_list_incr_batched_matches_serial(tmp_path):
    """-l -i --engine jax: every batched instance restores the same
    initial graph before its reads fuse, matching the serial loop."""
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join([str(DATA / "seq.fa")] * 4) + "\n")
    incr = str(GOLDEN_SAN / "seq.gfa")
    serial = run_cli(["-i", incr, "-l", str(lst), "-r3"])
    batched = run_cli(["-i", incr, "-l", "--engine", "jax", str(lst),
                       "-r3"])
    assert batched == serial


def test_list_empty_file_batched_matches_serial(tmp_path):
    """-l with an empty FASTA in the list: serial msa() returns before
    any output for that file (api.py msa early-return; ref abpoa_msa
    src/abpoa_align.c:373-437 via a 0-read loop) — the batched mode must
    skip it identically instead of emitting a restored/empty graph."""
    empty = tmp_path / "empty.fa"
    empty.write_text("")
    lst = tmp_path / "list.txt"
    # 4+ files: cli.py only routes --engine jax lists through
    # batch_msa_from_files at len(fns) >= 4
    lst.write_text("\n".join([str(DATA / "seq.fa"), str(empty),
                              str(DATA / "seq.fa"),
                              str(DATA / "test.fa")]) + "\n")
    serial = run_cli(["-l", str(lst)])
    batched = run_cli(["-l", "--engine", "jax", str(lst)])
    assert batched == serial
    incr = str(GOLDEN_SAN / "seq.gfa")
    serial_i = run_cli(["-i", incr, "-l", str(lst)])
    batched_i = run_cli(["-i", incr, "-l", "--engine", "jax", str(lst)])
    assert batched_i == serial_i
