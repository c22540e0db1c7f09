"""The standalone lax backtrack (ops/bt_xla.backtrack_batch) stays honest:
it must reproduce the oracle cigar over XLA-engine planes (it is the
device-side fallback/validation twin of the in-kernel backtrack)."""
import numpy as np
import jax.numpy as jnp

from conftest import DATA

from abpoa_tpu.api import ABPOA
from abpoa_tpu.params import Params
from abpoa_tpu.seqio import read_seqs
from abpoa_tpu.alphabet import encode_table
from abpoa_tpu import align as aln
from abpoa_tpu.align.engine_jax import export_dense, _make_inputs
from abpoa_tpu.align.engine_np import AlignResult
from abpoa_tpu.ops.dp_xla import banded_poa_dp
from abpoa_tpu.ops import bt_xla


def test_lax_backtrack_matches_oracle():
    tab = encode_table(5)
    recs = read_seqs(str(DATA / "seq.fa"))
    seqs = [tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)]
            for r in recs][:4]
    params = Params().post_set()
    ab = ABPOA()
    for i, q in enumerate(seqs):
        res_np = aln.align_sequence_to_graph(ab.graph, params, q,
                                             arena=ab.arena)
        if res_np is not None:
            dg = export_dense(ab.graph, params, q)
            cfg, inp = _make_inputs(dg, params)
            out = banded_poa_dp(cfg, inp)
            # pack banded rows as full-width planes (W == WB here)
            btc = bt_xla.BTConfig(gap_mode=params.gap_mode, pn=dg.pn,
                                  R=dg.R, WB=dg.W, P=dg.P,
                                  LMAX=dg.R + dg.W)
            b = lambda x: jnp.asarray(x)[None]  # noqa: E731
            zero_sn = jnp.zeros((1, dg.R), jnp.int32)
            end_sn = jnp.asarray(out.dp_end)[None] // dg.pn
            qcodes = np.zeros(dg.W, np.int32)
            qcodes[:dg.qlen] = np.asarray(q)
            steps, n_steps, fail, ei, ej = bt_xla.backtrack_batch(
                btc, jnp.asarray(out.H)[None], jnp.asarray(out.E1)[None],
                jnp.asarray(out.E2)[None], jnp.asarray(out.F1)[None],
                jnp.asarray(out.F2)[None],
                jnp.asarray(out.dp_beg)[None] // dg.pn, end_sn,
                b(dg.pre_idx.reshape(-1)), b(dg.pre_n), b(dg.bases),
                b(qcodes), b(np.asarray(params.mat, np.int32)),
                jnp.asarray([out.best_i]), jnp.asarray([out.best_j]),
                b(np.int32(dg.qlen)), b(np.int32(params.gap_ext1)),
                b(np.int32(params.gap_oe1)), b(np.int32(params.gap_ext2)),
                b(np.int32(params.gap_oe2)), tile_sn=zero_sn)
            assert not bool(np.asarray(fail)[0])
            res_d = AlignResult()
            res_d.best_score = int(out.best_score)
            bt_xla.replay_steps(ab.graph, params, np.asarray(q),
                                np.asarray(steps)[0],
                                int(np.asarray(n_steps)[0]),
                                int(out.best_i), int(out.best_j),
                                int(np.asarray(ei)[0]),
                                int(np.asarray(ej)[0]), res_d)
            assert res_d.cigar == res_np.cigar
        cigar = res_np.cigar if res_np is not None else []
        ab.graph.add_graph_alignment(params, q, [1] * len(q), cigar,
                                     None, i, True)
