"""Native (C) seeding/chaining equivalence vs the Python transcription.

Anchors determine windowed alignments and hence output bytes; the C port
(native/seedchain.c) must match seed.py exactly — including the reference
quirks (ilog2(0) == -1, double->int truncation, strand-from-index at
abpoa_seed.c:553).
"""
import os

import numpy as np
import pytest

from conftest import DATA

import abpoa_tpu.seed as S
from abpoa_tpu.params import Params
from abpoa_tpu.graph import NativeGraph

pytestmark = pytest.mark.skipif(not NativeGraph.available(),
                                reason="native library unavailable")


def _both(seqs, lens, params, monkeypatch):
    monkeypatch.delenv("ABPOA_NO_NATIVE", raising=False)
    nat = S.build_guide_tree_partition(seqs, lens, params)
    monkeypatch.setenv("ABPOA_NO_NATIVE", "1")
    py = S.build_guide_tree_partition(seqs, lens, params)
    return nat, py


def _fixture_reads(fn):
    from abpoa_tpu.seqio import read_seqs
    from abpoa_tpu.alphabet import encode_table
    tab = encode_table(5)
    return [tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)]
            for r in read_seqs(str(DATA / fn))]


def test_seed_chain_fixture(monkeypatch):
    reads = _fixture_reads("heter.fa")
    lens = [len(q) for q in reads]
    p = Params()
    p.disable_seeding = 0
    p.post_set()
    nat, py = _both(reads, lens, p, monkeypatch)
    assert nat == py
    assert len(nat[1]) > 0  # fixture produces anchors


def test_seed_chain_progressive(monkeypatch):
    reads = _fixture_reads("heter.fa")
    lens = [len(q) for q in reads]
    p = Params()
    p.disable_seeding = 0
    p.progressive_poa = 1
    p.post_set()
    nat, py = _both(reads, lens, p, monkeypatch)
    assert nat == py


@pytest.mark.parametrize("seed,amb", [(1, 0), (2, 0), (3, 1)])
def test_seed_chain_random(seed, amb, monkeypatch):
    """Random mutated reads (SNPs + indels) across strands."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 4, size=1500).astype(np.uint8)
    reads = []
    for i in range(6):
        q = base.copy()
        pos = rng.choice(len(q), size=30, replace=False)
        q[pos] = (q[pos] + 1 + rng.randint(0, 3, size=30)) % 4
        cut = rng.randint(0, 20)
        q = q[cut:len(q) - rng.randint(0, 20)]
        if amb and i % 2:
            from abpoa_tpu.alphabet import revcomp_codes
            q = revcomp_codes(q)
        reads.append(q)
    lens = [len(q) for q in reads]
    p = Params()
    p.disable_seeding = 0
    p.amb_strand = amb
    p.post_set()
    nat, py = _both(reads, lens, p, monkeypatch)
    assert nat == py
