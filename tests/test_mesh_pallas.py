"""The shard_map+Pallas dispatch branch executes and is bit-identical.

parallel/batch.py routes mesh runs through _mesh_wrap (a process-global
jax.jit(shard_map(kernel)) cache). On hardware that wrapper is what
BatchPOA(mesh=...) dispatches every round (bench.py's mesh variant
captures a real-TPU run); here the SAME wrapper runs the production band
kernel in interpret mode on a 2-device virtual CPU mesh and must match
the direct kernel call bit-for-bit — proving the sharded dispatch path
(not just the XLA fallback) computes the production kernels correctly.

The seeded counterpart (window rounds over a mesh) is covered fast via
the XLA engine in test_seeded_xla.py; the full seeded pipeline over a
mesh runs in __graft_entry__.dryrun_multichip.
"""
import numpy as np
import pytest

from conftest import DATA

from abpoa_tpu.params import Params
from abpoa_tpu.graph import POAGraph


def _reads(fn, n):
    from abpoa_tpu.seqio import read_seqs
    from abpoa_tpu.alphabet import encode_table
    tab = encode_table(5)
    recs = read_seqs(str(DATA / fn))
    return [tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)]
            for r in recs][:n]


def test_mesh_wrap_band_kernel_parity():
    import jax
    import jax.numpy as jnp
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (virtual CPU mesh)")
    from jax.sharding import Mesh
    from abpoa_tpu.align.engine_jax import (export_dense, repad_dense,
                                            make_pallas_inputs, pick_WB)
    from abpoa_tpu.ops.dp_pallas_band import BandConfig, band_poa_dp_batch
    from abpoa_tpu.parallel.batch import BatchPOA, _MESH_KERN_CACHE

    params = Params().post_set()
    reads = _reads("seq.fa", 3)
    g = POAGraph()
    g.add_graph_alignment(params, reads[0], [1] * len(reads[0]), [],
                          None, 0, True)
    g.topological_sort(params)
    # two DIFFERENT queries against the same graph -> two distinct
    # per-shard results (a device-order bug cannot cancel out)
    nat = [export_dense(g, params, q) for q in reads[1:3]]
    R = max(d.R for d in nat)
    W = max(d.W for d in nat)
    P = max(d.P for d in nat)
    O = max(d.O for d in nat)
    dgs = [repad_dense(d, R, W, P, O) for d in nat]
    qmax = max(d.qlen for d in dgs)
    WB = max(pick_WB(params, d.qlen, d.pn) for d in dgs)
    Wq = (qmax // 128 + 1) * 128
    WqB = (Wq + WB - 1) // WB * WB
    LMAX = (R + WqB + 511) // 512 * 512
    cfgs, arrs = zip(*(make_pallas_inputs(d, params, WB, force_Wq=WqB,
                                          bt_lmax=LMAX) for d in dgs))
    cfg = cfgs[0]
    bc = BandConfig(cfg.gap_mode, cfg.align_mode, cfg.pn, R, WB, WqB,
                    cfg.P, cfg.O, cfg.m, cfg.use_zdrop, LMAX, 1)
    stacked = tuple(jnp.asarray(np.stack([a[i] for a in arrs]))
                    for i in range(len(arrs[0])))

    direct = band_poa_dp_batch(bc, *stacked, interpret=True)

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    bp = BatchPOA(params, mesh=mesh)
    wrapped = bp._mesh_wrap(
        lambda *a: band_poa_dp_batch(bc, *a, interpret=True),
        (bc, True), len(stacked))
    out = wrapped(*stacked)

    assert any(k[0] == (bc, True) for k in _MESH_KERN_CACHE)
    m_d = np.asarray(direct.misc)
    m_s = np.asarray(out.misc)
    assert (m_d == m_s).all()
    # the two instances really differ (shard order would show up)
    assert not (m_d[0] == m_d[1]).all()
    assert (np.asarray(direct.steps16) == np.asarray(out.steps16)).all()
    for f in ("mpl", "mpr"):
        assert (np.asarray(getattr(direct, f))
                == np.asarray(getattr(out, f))).all(), f
