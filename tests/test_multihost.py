"""Multi-host driver validation on a virtual CPU mesh.

Spawns 2 worker processes (jax.distributed over localhost) x 4 virtual CPU
devices each through benchmarks/scaling.py and byte-compares host 0's
gathered consensus FASTA against a single-process run of the same global
workload (SURVEY.md §5 distributed backend; the reference's output layer
is a single-process stdout write, ref src/abpoa_align.c:346-362).
"""
import io
import json
import os
import subprocess
import sys

import numpy as np

from conftest import REPO, DATA

N_INSTANCES = 6
FIXTURE = "seq.fa"


def _single_process_output():
    from abpoa_tpu.params import Params
    from abpoa_tpu.parallel import BatchPOA
    from abpoa_tpu.seqio import read_seqs
    from abpoa_tpu.alphabet import encode_table
    tab = encode_table(5)
    recs = read_seqs(str(DATA / FIXTURE))
    reads = [tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)]
             for r in recs]
    p = Params().post_set()
    abs_ = BatchPOA(p).run([reads] * N_INSTANCES)
    out = io.StringIO()
    for ab in abs_:
        ab.output(p, out)
    return out.getvalue()


def test_two_process_gather_matches_single(tmp_path):
    out_fa = tmp_path / "mh_cons.fa"
    cmd = [sys.executable, str(REPO / "benchmarks" / "scaling.py"),
           "--hosts", "2", "--cpu", "4",
           "--instances", str(N_INSTANCES), "--fixture", FIXTURE,
           "--out", str(out_fa)]
    env = dict(os.environ, ABPOA_SCALING_NO_WARM="1")
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=420)
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()]
    summary = lines[-1]
    assert summary["metric"] == "host_scaling_efficiency"
    assert summary["hosts"] == 2
    # every worker processed its shard
    shards = [ln["shard_instances"] for ln in lines[1:-1]]
    assert sum(shards) == N_INSTANCES
    assert out_fa.exists()
    assert out_fa.read_text() == _single_process_output()


def _single_process_seeded_output():
    from abpoa_tpu.params import Params
    from abpoa_tpu.parallel import BatchPOA
    from abpoa_tpu.seqio import read_seqs
    from abpoa_tpu.alphabet import encode_table
    tab = encode_table(5)
    recs = read_seqs(str(DATA / FIXTURE))
    reads = [tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)]
             for r in recs]
    p = Params().post_set()
    p.disable_seeding = 0
    p.post_set()
    abs_ = BatchPOA_seeded(p, [reads] * N_INSTANCES)
    out = io.StringIO()
    for ab in abs_:
        ab.output(p, out)
    return out.getvalue()


def BatchPOA_seeded(p, insts):
    from abpoa_tpu.parallel import BatchPOA
    return BatchPOA(p).run_seeded(insts)


def test_two_process_seeded_gather_matches_single(tmp_path):
    """--seeded: the distributed driver routes shards through the
    windowed -S pipeline (run_seeded + host-0 gather)."""
    out_fa = tmp_path / "mh_seeded_cons.fa"
    cmd = [sys.executable, str(REPO / "benchmarks" / "scaling.py"),
           "--hosts", "2", "--cpu", "4", "--seeded",
           "--instances", str(N_INSTANCES), "--fixture", FIXTURE,
           "--out", str(out_fa)]
    r = subprocess.run(cmd, env=dict(os.environ, ABPOA_SCALING_NO_WARM="1"),
                       capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()]
    assert lines[-1]["metric"] == "host_scaling_efficiency"
    assert out_fa.exists()
    assert out_fa.read_text() == _single_process_seeded_output()
