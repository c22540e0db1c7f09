"""Native row kernels (native/dprow.c) == numpy oracle rows, bit-exact.

The C kernels are a scalar transcription of engine_np's row semantics;
this pins score + cigar equality across gap modes x align modes x
score widths x banding, on multi-read graphs (real branch/indeg
structure). The numpy path is forced by monkeypatching _dprow_lib.
"""
import numpy as np
import pytest

from abpoa_tpu.params import Params
from abpoa_tpu.api import ABPOA
from abpoa_tpu import align as aln
from abpoa_tpu.align import engine_np


def _reads(rng, n=5, L=140):
    anc = rng.integers(0, 4, L)
    out = []
    for _ in range(n):
        r = anc.copy()
        sub = rng.random(L) < 0.08
        r[sub] = rng.integers(0, 4, int(sub.sum()))
        keep = rng.random(L) > 0.03
        out.append(r[keep].astype(np.int64))
    return out


def _build(params, reads):
    ab = ABPOA()
    for i, q in enumerate(reads[:-1]):
        res = aln.align_sequence_to_graph(ab.graph, params, q,
                                          arena=ab.arena)
        ab.graph.add_graph_alignment(params, q, [1] * len(q),
                                     res.cigar if res else [], None, i,
                                     True)
    ab.graph.topological_sort(params)
    return ab


def _align(ab, params, q):
    res = aln.align_sequence_to_graph(ab.graph, params, q,
                                      arena=ab.arena)
    return res.best_score, list(res.cigar), res.node_s, res.node_e


@pytest.mark.skipif(engine_np._dprow_lib() is None,
                    reason="native kernels disabled")
@pytest.mark.parametrize("gaps", [(0, 0, 2, 1), (4, 0, 2, 1),
                                  (4, 24, 2, 1)],
                         ids=["linear", "affine", "convex"])
@pytest.mark.parametrize("mode", [0, 1, 2], ids=["glb", "loc", "ext"])
@pytest.mark.parametrize("wb", [10, -1], ids=["band", "noband"])
@pytest.mark.parametrize("match", [2, 999], ids=["w16", "w32"])
def test_c_rows_match_numpy(gaps, mode, wb, match, monkeypatch):
    params = Params()
    params.gap_open1, params.gap_open2, params.gap_ext1, \
        params.gap_ext2 = gaps
    params.align_mode = mode
    params.wb = wb
    params.match = match
    params.mismatch = 2 * match
    params.post_set()
    rng = np.random.default_rng(7 * mode + wb + match + sum(gaps))
    reads = _reads(rng)
    q = reads[-1]

    ab = _build(params, reads)
    got_c = _align(ab, params, q)

    monkeypatch.setattr(engine_np, "_dprow_lib", lambda: None)
    ab2 = _build(params, reads)
    got_np = _align(ab2, params, q)
    assert got_c == got_np
