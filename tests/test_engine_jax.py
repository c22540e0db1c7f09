"""JAX engine vs host oracle: per-call score/cigar equality on fixtures.

Gate M3 from SURVEY.md §7: the TPU (JAX/XLA) DP must produce identical
cigars and scores to the bit-exact host oracle on every alignment of the
golden fixtures, across align modes x gap modes.
"""
import numpy as np
import pytest

from conftest import DATA

from abpoa_tpu.api import ABPOA
from abpoa_tpu.params import (Params, GLOBAL_MODE, LOCAL_MODE, EXTEND_MODE,
                              LINEAR_GAP, AFFINE_GAP, CONVEX_GAP)
from abpoa_tpu.seqio import read_seqs
from abpoa_tpu.alphabet import encode_table
from abpoa_tpu import align as aln
from abpoa_tpu.align.engine_jax import align_sequence_to_graph_jax


def _encoded(fn, limit=None):
    tab = encode_table(5)
    recs = read_seqs(str(DATA / fn))
    seqs = [tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)] for r in recs]
    return seqs[:limit] if limit else seqs


def _run_both(seqs, params):
    """Drive plain POA with the oracle; at every align call also run the JAX
    engine on the same graph state and compare."""
    ab = ABPOA()
    n_checked = 0
    for i, q in enumerate(seqs):
        res_np = aln.align_sequence_to_graph(ab.graph, params, q,
                                             arena=ab.arena)
        if res_np is not None:
            res_jx = align_sequence_to_graph_jax(ab.graph, params, q)
            assert res_jx.best_score == res_np.best_score, \
                f"read {i}: score {res_jx.best_score} != {res_np.best_score}"
            assert res_jx.cigar == res_np.cigar, f"read {i}: cigar mismatch"
            n_checked += 1
        cigar = res_np.cigar if res_np is not None else []
        ab.graph.add_graph_alignment(params, q, [1] * len(q), cigar, None,
                                     i, True)
    assert n_checked > 0


MODES = [
    ("global-convex", GLOBAL_MODE, 4, 24),
    ("global-affine", GLOBAL_MODE, 4, 0),
    ("global-linear", GLOBAL_MODE, 0, 0),
    ("local-convex", LOCAL_MODE, 4, 24),
    ("local-affine", LOCAL_MODE, 4, 0),
    ("local-linear", LOCAL_MODE, 0, 0),
    ("extend-convex", EXTEND_MODE, 4, 24),
]


@pytest.mark.parametrize("name,amode,o1,o2", MODES, ids=[m[0] for m in MODES])
def test_seq_fa_modes(name, amode, o1, o2):
    params = Params(align_mode=amode, gap_open1=o1, gap_open2=o2).post_set()
    _run_both(_encoded("seq.fa"), params)


def test_seq_fa_unbanded():
    params = Params(wb=-1).post_set()
    _run_both(_encoded("seq.fa"), params)


def test_heter_fa_convex():
    params = Params().post_set()
    _run_both(_encoded("heter.fa", limit=6), params)


def test_test_fa_zdrop_extend():
    params = Params(align_mode=EXTEND_MODE, zdrop=100).post_set()
    _run_both(_encoded("test.fa"), params)


# --- end-to-end: CLI byte parity vs the reference goldens, JAX engine ---

from conftest import GOLDEN_SAN  # noqa: E402

E2E_CASES = [
    ("seq_cons.fa", []),
    ("seq_cons_msa.out", ["-r2"]),
    ("seq.gfa", ["-r3"]),
    ("seq_cons_local.fa", ["-m", "1"]),
    ("heter_d2_cons.fa", ["-d2"]),
]


@pytest.mark.parametrize("golden,extra", E2E_CASES,
                         ids=[c[0] for c in E2E_CASES])
def test_cli_golden_jax_engine(golden, extra):
    from test_parity import run_cli
    fn = str(DATA / ("heter.fa" if golden.startswith("heter") else "seq.fa"))
    expected = (GOLDEN_SAN / golden).read_text()
    assert run_cli(["--engine", "jax", *extra, fn]) == expected
