"""Byte-parity tests against abPOA v1.4.1 golden outputs.

tests/golden/           outputs of the stock reference build.
tests/golden_sanitized/ outputs of the sanitized reference (deterministic
                        semantics; see docs/REFERENCE_UB.md). Our outputs
                        must byte-match EVERY sanitized golden; they also
                        match the stock goldens for every config where the
                        stock binary is deterministic.
"""
import io

import pytest

from conftest import DATA, GOLDEN, GOLDEN_SAN


def run_cli(args):
    from abpoa_tpu.cli import main
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(io.StringIO()):
        rc = main(args)
    assert rc == 0
    return buf.getvalue()


SEQ = str(DATA / "seq.fa")
TEST = str(DATA / "test.fa")
HETER = str(DATA / "heter.fa")

CASES = [
    ("seq_cons.fa", [SEQ]),
    ("seq_msa.out", ["-r1", SEQ]),
    ("seq_cons_msa.out", ["-r2", SEQ]),
    ("seq.gfa", ["-r3", SEQ]),
    ("seq_cons.gfa", ["-r4", SEQ]),
    ("seq_cons.fq", ["-r5", SEQ]),
    ("test_cons_msa.out", ["-r2", TEST]),
    ("seq_cons_lin.fa", ["-O", "0", SEQ]),
    ("seq_cons_aff.fa", ["-O", "4,0", SEQ]),
    ("seq_cons_local.fa", ["-m", "1", SEQ]),
    ("seq_cons_ext.fa", ["-m", "2", SEQ]),
    ("seq_cons_noband.fa", ["-b", "-1", SEQ]),
    ("seq_cons_ambs.fa", ["-s", SEQ]),
    ("heter_cons.fa", [HETER]),
    ("heter_d2_cons.fa", ["-d2", HETER]),
    ("heter_d2_cons_msa.out", ["-d2", "-r2", HETER]),
]

SEEDED_CASES = [
    ("heter_S_cons.fa", ["-S", HETER]),
    ("heter_Sp_cons.fa", ["-S", "-p", HETER]),
    ("heter_S_n100_cons.fa", ["-S", "-n", "100", HETER]),
]


@pytest.mark.parametrize("golden,args", CASES, ids=[c[0] for c in CASES])
def test_sanitized_parity(golden, args):
    expected = (GOLDEN_SAN / golden).read_text()
    assert run_cli(args) == expected


# configs where the stock reference binary is deterministic (no stale-memory
# dependence) — we byte-match the stock build too
STOCK_DETERMINISTIC = [c for c in CASES if not c[0].startswith("heter")
                       and c[0] not in ("seq_cons_local.fa", "seq_cons_ext.fa")]


@pytest.mark.parametrize("golden,args", STOCK_DETERMINISTIC,
                         ids=[c[0] for c in STOCK_DETERMINISTIC])
def test_stock_parity(golden, args):
    expected = (GOLDEN / golden).read_text()
    assert run_cli(args) == expected


def test_incremental_gfa(tmp_path):
    expected = (GOLDEN_SAN / "seq_incr_gfa.gfa").read_text()
    out = run_cli(["-i", str(GOLDEN_SAN / "seq.gfa"), SEQ, "-r3"])
    assert out == expected


def test_incremental_msa(tmp_path):
    expected = (GOLDEN_SAN / "seq_incr_msa.out").read_text()
    out = run_cli(["-i", str(GOLDEN_SAN / "seq_msa.out"), SEQ, "-r1"])
    assert out == expected


@pytest.mark.parametrize("golden,args", SEEDED_CASES,
                         ids=[c[0] for c in SEEDED_CASES])
def test_seeded_parity(golden, args):
    pytest.importorskip("abpoa_tpu.seed", reason="seeding lands in M5")
    expected = (GOLDEN_SAN / golden).read_text()
    assert run_cli(args) == expected
