"""Batched device POA == single-instance oracle pipeline, incl. mesh DP."""
import numpy as np
import pytest

from conftest import DATA

from abpoa_tpu.api import ABPOA
from abpoa_tpu.params import Params
from abpoa_tpu.seqio import read_seqs
from abpoa_tpu.alphabet import encode_table, decode_table
from abpoa_tpu.consensus import generate_consensus
from abpoa_tpu.parallel import BatchPOA


def _encoded(fn):
    tab = encode_table(5)
    recs = read_seqs(str(DATA / fn))
    return [tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)]
            for r in recs]


def _oracle_consensus(reads, params):
    ab = ABPOA()
    ab.n_seq = len(reads)
    ab.names = [""] * len(reads)
    ab.is_rc = [0] * len(reads)
    ab.poa(params, reads, [[1] * len(q) for q in reads], 0)
    generate_consensus(ab, params)
    tab = decode_table(params.m)
    return [bytes(tab[b] for b in seq).decode()
            for seq in ab.cons.cons_base[:ab.cons.n_cons]]


def test_batch_matches_oracle():
    params = Params().post_set()
    insts = [_encoded("seq.fa"), _encoded("test.fa"), _encoded("seq.fa")[:5]]
    expected = [_oracle_consensus(r, Params().post_set()) for r in insts]
    bp = BatchPOA(Params().post_set())
    got = bp.run_consensus(insts)
    assert got == expected
    assert bp.dp_cells > 0 and bp.rounds > 0


def test_batch_mesh_sharded():
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (virtual CPU mesh)")
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("data",))
    params = Params().post_set()
    insts = [_encoded("seq.fa") for _ in range(4)]
    expected = _oracle_consensus(_encoded("seq.fa"), Params().post_set())
    got = BatchPOA(params, mesh=mesh).run_consensus(insts)
    assert all(g == expected for g in got)
