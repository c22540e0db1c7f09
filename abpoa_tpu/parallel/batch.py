"""Round-based batched POA across many independent instances.

One POA instance (align reads 1..n of one window onto its growing DAG) is
far too small to fill a TPU chip, and the graph-fusion step between reads is
inherently sequential per instance (ref abpoa_poa, src/abpoa_align.c:302-344,
re-toposorts after every read). The TPU-native throughput design therefore
batches ACROSS instances, round-synchronously:

    round r:  [device]  banded DP of read r of every live instance (vmap)
              [host]    backtrack + graph fusion + re-toposort per instance

Instances whose graphs/queries land in the same padded bucket
(R, W, P, O — powers of two) share one compiled program; a round issues one
device call per bucket group. Graph bookkeeping stays on the host: it is
O(V+E) with tiny constants vs the O(V·W) DP (SURVEY.md §7 design delta #5).

Optionally shards the batch axis over a jax.sharding.Mesh (pure data
parallelism — instances are independent, so no collectives are needed in the
DP itself; results gather on fetch).
"""
from __future__ import annotations

import numpy as np

from ..api import ABPOA
from ..params import Params, SRC_NODE_ID, SINK_NODE_ID
from ..align.engine_jax import (export_dense, repad_dense, _make_inputs,
                                _backtrack_from_planes, _bucket)


def _make_aligners(instances, params, init=None):
    """One ABPOA per instance, graph store backed by the native C core
    when available (same semantics as the Python store; equivalence is
    enforced by tests/test_native_graph.py).

    init(ab), when given, seeds each aligner's starting state before any
    read fuses — the batched analog of the serial loop's incremental
    restore (-i, ref abpoa_restore_graph src/abpoa_seq.c:595-660).
    Returns (aligners, read_id_offsets): new reads number from each
    instance's existing read count, exactly like the serial msa()."""
    from ..graph import NativeGraph
    abs_ = [ABPOA() for _ in instances]
    if NativeGraph.available():
        for ab in abs_:
            ab.graph = NativeGraph()
    rid0 = []
    for ab, reads in zip(abs_, instances):
        if init is not None:
            init(ab)
        exist = ab.n_seq
        rid0.append(exist)
        ab.n_seq = exist + len(reads)
        ab.names = list(ab.names) + [""] * len(reads)
        ab.is_rc = list(ab.is_rc) + [0] * len(reads)
        if NativeGraph.available():
            ab.graph.ensure_reads(ab.n_seq)
    return abs_, rid0


def _stack_inputs(dgs, params):
    """Stack per-instance DPInputs leaves along a new batch axis."""
    import jax.numpy as jnp
    from ..ops.dp_xla import DPInputs
    cfgs, inps = zip(*(_make_inputs(dg, params) for dg in dgs))
    cfg = cfgs[0]
    assert all(c == cfg for c in cfgs)
    batched = DPInputs(*(jnp.stack([getattr(i, f) for i in inps])
                         for f in DPInputs._fields))
    return cfg, batched


_DISPATCH_POOL = None
_HOST_POOL = None
_MESH_KERN_CACHE: dict = {}
def _interpret() -> bool:
    """ABPOA_PALLAS_INTERPRET=1 runs the Pallas kernels in interpret
    mode (CPU emulation) — the dispatch/sharding machinery is then
    exercised end-to-end without a TPU (tests/test_mesh_pallas.py)."""
    import os
    return os.environ.get("ABPOA_PALLAS_INTERPRET") == "1"


# When set to a list, every Pallas round dispatch appends
# (kern_fn, device_input_tuple, nb) — bench.py replays the captured call
# chained (K launches, one readback) to measure the on-chip kernel rate
# without the per-call tunnel RTT that e2e timing includes.
KERNEL_CAPTURE: list | None = None


def _host_pool():
    """Shared pool for per-instance host work (graph fusion, toposort,
    export). The hot paths are C calls through ctypes, which release the
    GIL, so instance-level threading gives real parallelism."""
    global _HOST_POOL
    if _HOST_POOL is None:
        import os
        from concurrent.futures import ThreadPoolExecutor
        _HOST_POOL = ThreadPoolExecutor(
            max_workers=min(8, os.cpu_count() or 4),
            thread_name_prefix="abpoa-host")
    return _HOST_POOL



def _step_stream(pend, steps, b, nst, bi, bj):
    """Instance b's decoded backtrack step stream. Handles the rare
    over-cap case (long deletion runs) by refetching the full stream from
    the device buffer kept alive in the pending handle — a blocking fetch
    over the ~16 MB/s tunnel downlink, so callers defer this past any
    early-out that never reads the steps."""
    from ..ops import bt_xla
    srow = steps[b]
    if nst > srow.shape[0]:
        import jax
        srow = jax.device_get(pend["steps_dev"][b, :nst])
    return (bt_xla.unpack_steps16(srow, nst, bi, bj)
            if pend.get("band") else srow)


def _pre_deltas(stacked_np, R, P):
    """Convert the stacked pre_idx stream (slot 2, int16 absolute) to
    uint8 deltas when every valid predecessor is within 255 rows — the
    band kernel reconstructs pred = t - delta on device. ~25% of the
    per-round upload over the ~60 MB/s tunnel uplink."""
    B_ = stacked_np[2].shape[0]
    pi = stacked_np[2].reshape(B_, R, P).astype(np.int64)
    valid = np.arange(P)[None, None, :] < stacked_np[3][:, :, None]
    delta = np.where(valid, np.arange(R)[None, :, None] - pi, 0)
    if 0 <= delta.min() and delta.max() <= 255:
        stacked_np[2] = delta.reshape(B_, R * P).astype(np.uint8)
    return stacked_np


class BatchPOA:
    """Run many independent POA problems through the batched device DP.

    instances: list of problems; each problem is a list of encoded reads
    (uint8 codes). Returns the list of ABPOA aligner states (call
    generate_consensus / output on them like the single-instance API).
    """

    def __init__(self, params: Params, mesh=None, batch_axis: str = "data",
                 engine: str = "pallas", pipeline: bool = True):
        self.params = params
        self.mesh = mesh
        self.batch_axis = batch_axis
        self.engine = engine       # "pallas" (device DP+backtrack) or "xla"
        self.pipeline = pipeline   # overlap host fusion with device rounds
        self.dp_cells = 0          # aggregate band cells computed on device
        self.dp_seconds = 0.0      # device wall time of DP calls (summed;
                                   #  overlapped shards can exceed wall)
        self.dp_intervals = []     # (t0, t1) per device call, for a
                                   #  non-overlapping busy-time union
        self.bt_seconds = 0.0      # device wall time of backtrack calls
        self.fallbacks = 0         # instances re-run on the host oracle
        self.rounds = 0
        self._weights = None       # per-instance per-read qv weights
        self._rid0 = []            # per-instance read-id offset (-i)
        self.used_device_loop = False  # single-dispatch loop engaged
        self.precompute_cons = False   # consensus inside the device-loop
        #                                replay pool (set by run_consensus)

    # -------------------------------------------------------------- #
    def _device_call(self, cfg, batched):
        import time
        import jax
        import jax.numpy as jnp
        from ..ops.dp_xla import banded_poa_dp_batch
        nb = int(batched.bases.shape[0])
        ndev = (int(np.prod(list(self.mesh.shape.values())))
                if self.mesh is not None else 1)
        # bucket the batch dim: live-group sizes shrink as instances
        # finish their reads, and every distinct B would be a fresh XLA
        # trace/compile of banded_poa_dp_batch — pad to ndev x next-pow2
        # (callers only read [:nb] / per-b slices, so trailing pad rows
        # are dead weight, which is far cheaper than a recompile; a mesh
        # shard additionally needs B % ndev == 0)
        per = -(-nb // ndev)
        BP = ndev * (1 << (per - 1).bit_length())
        pad = BP - nb
        if pad:
            batched = jax.tree.map(
                lambda x: jnp.concatenate(
                    [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])])
                if getattr(x, "ndim", 0) else x, batched)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(self.mesh, P(self.batch_axis))
            batched = jax.device_put(batched,
                                     jax.tree.map(lambda _: sh, batched))
        t0 = time.perf_counter()
        out = banded_poa_dp_batch(cfg, batched)
        out = jax.block_until_ready(out)
        t1 = time.perf_counter()
        self.dp_seconds += t1 - t0
        self.dp_intervals.append((t0, t1))
        self.dp_cells += int(np.sum(np.asarray(out.n_cells)[:nb]))
        return out

    def _weight(self, k, r, q):
        """Per-base fusion weights of instance k's read r (qv weights when
        provided, ref abpoa_msa src/abpoa_align.c:373-437; else unit)."""
        if self._weights is not None and self._weights[k] is not None:
            return self._weights[k][r]
        return [1] * len(q)

    def _rid(self, k, r) -> int:
        """Global read id: instance k's existing reads (incremental
        restore) come first, new reads number after them."""
        return self._rid0[k] + r

    def run(self, instances, weights=None, init=None) -> list[ABPOA]:
        params = self.params
        self._weights = weights
        abs_, self._rid0 = _make_aligners(instances, params, init)
        dl = _DeviceLoop(self, abs_, instances)
        if dl.eligible():
            try:
                if dl.run():
                    return abs_
            except Exception as e:
                # fail safe to the round-based path: wipe the read-0
                # fusions the loop setup performed so the standard loop
                # starts from clean graphs
                import sys as _sys
                print(f"[abpoa_tpu] device loop failed ({e!r}); "
                      f"falling back to the round-based path",
                      file=_sys.stderr)
                for ab in abs_:
                    ab.graph.reset()
        if (self._effective_engine() == "pallas" and len(instances) >= 4
                and self.pipeline):
            self._run_pipelined(abs_, instances)
            return abs_
        n_rounds = max((len(r) for r in instances), default=0)
        for r in range(n_rounds):
            live = [k for k, reads in enumerate(instances) if r < len(reads)]
            # first read / empty graph: straight fusion, no DP
            todo = []
            for k in live:
                ab, q = abs_[k], instances[k][r]
                if ab.graph.node_n <= 2:
                    ab.graph.add_graph_alignment(params, q,
                                                 self._weight(k, r, q),
                                                 [], None,
                                                 self._rid(k, r), True)
                else:
                    if not ab.graph.is_topological_sorted:
                        ab.graph.topological_sort(params)
                    todo.append(k)
            if not todo:
                continue
            # two-pass export: natural buckets, then re-pad to group max
            nat = {k: export_dense(abs_[k].graph, params, instances[k][r])
                   for k in todo}
            R = max(d.R for d in nat.values())
            W = max(d.W for d in nat.values())
            P_ = max(d.P for d in nat.values())
            O_ = max(d.O for d in nat.values())
            pns = {d.pn for d in nat.values()}
            for pn in pns:
                group = [k for k in todo if nat[k].pn == pn]
                dgs = [repad_dense(nat[k], R, W, P_, O_) for k in group]
                if self._effective_engine() == "pallas":
                    self._round_pallas(abs_, group, dgs, r, instances)
                else:
                    cfg, batched = _stack_inputs(dgs, params)
                    out = self._device_call(cfg, batched)
                    self._finish_round(abs_, group, dgs, out, r, instances)
            self.rounds += 1
        return abs_

    N_SHARDS = 4

    def _run_pipelined(self, abs_, instances):
        """Multi-shard software pipeline: the instance list splits into S
        shards; each shard's round is prepped on the main thread, then its
        upload + kernel + result fetch run on a worker thread (transport
        I/O and the C host kernels release the GIL), while the main thread
        fuses whichever shard's results arrived first. With the tunnel's
        ~30 ms dispatch/fetch RTT this keeps the device busy: S-1 rounds
        are in flight while one is being fused."""
        from collections import deque
        params = self.params
        n = len(instances)
        S = min(self.N_SHARDS, max(1, n // 4))
        shards = [list(range(s, n, S)) for s in range(S)]
        rounds = [0] * S
        n_rounds = [max((len(instances[k]) for k in s), default=0)
                    for s in shards]
        pending = [None] * S
        fifo = deque()

        def prep_and_dispatch(s):
            r = rounds[s]
            live = [k for k in shards[s] if r < len(instances[k])]
            todo = []
            for k in live:
                ab, q = abs_[k], instances[k][r]
                if ab.graph.node_n <= 2:
                    ab.graph.add_graph_alignment(params, q,
                                                 self._weight(k, r, q),
                                                 [], None,
                                                 self._rid(k, r), True)
                else:
                    todo.append(k)
            rounds[s] += 1
            if not todo:
                return []

            def sort_export(k):
                g = abs_[k].graph
                if not g.is_topological_sorted:
                    g.topological_sort(params)
                return export_dense(g, params, instances[k][r])
            nat = dict(zip(todo, _host_pool().map(sort_export, todo)))
            R = max(d.R for d in nat.values())
            W = max(d.W for d in nat.values())
            P_ = max(d.P for d in nat.values())
            O_ = max(d.O for d in nat.values())
            pends = []
            for pn in sorted({d.pn for d in nat.values()}):
                group = [k for k in todo if nat[k].pn == pn]
                dgs = [repad_dense(nat[k], R, W, P_, O_) for k in group]
                pend = self._pallas_dispatch(abs_, group, dgs, r,
                                             instances)
                if pend is not None:  # oversized: ran the XLA path inline
                    pends.append(pend)
            return pends

        while True:
            for s in range(S):
                if pending[s] is None and rounds[s] < n_rounds[s]:
                    pending[s] = prep_and_dispatch(s)
                    fifo.append(s)
                    self.rounds += 1
            if not fifo:
                break
            s = fifo.popleft()
            for pend in pending[s]:
                self._pallas_collect(pend)
            pending[s] = None

    # -------------------------------------------------------------- #
    def run_seeded(self, instances, weights=None, init=None) -> list[ABPOA]:
        """Batched seeded/progressive POA (the reference's -S/-p mode,
        ref abpoa_anchor_poa src/abpoa_align.c:192-299): minimizer seeding,
        guide tree and chaining run host-side per instance; the per-window
        subgraph alignments batch across instances each round, driving the
        same anchor_poa_requests generator as the sequential path."""
        from ..seed import build_guide_tree_partition
        from ..align.engine_jax import export_dense
        from ..align.engine_np import align_sequence_to_subgraph
        params = self.params
        self._weights = weights
        abs_, self._rid0 = _make_aligners(instances, params, init)
        gens = []
        reqs = {}
        for k, reads in enumerate(instances):
            ab = abs_[k]
            seq_lens = [len(q) for q in reads]
            ws = [self._weight(k, r, q) for r, q in enumerate(reads)]
            rmap, par_anchors, par_c = build_guide_tree_partition(
                reads, seq_lens, params)
            gen = ab.anchor_poa_requests(params, reads, ws, seq_lens,
                                         par_anchors, par_c, rmap,
                                         self._rid0[k])
            gens.append(gen)
            try:
                reqs[k] = next(gen)
            except StopIteration:
                pass
        eng = self._effective_engine()
        use_device = eng == "pallas"
        # portable device batching for window rounds: the XLA engine
        # consumes the same subgraph exports (filtered adjacency +
        # rowmask), so seeded rounds shard over a CPU/virtual mesh too
        # (dryrun, tests) and oversized-window fallbacks stay batched.
        # Off-mesh CPU runs keep the host oracle (status quo: compile
        # cost beats the win at test scale).
        import os as _os
        use_xla = (eng == "xla"
                   and (self.mesh is not None
                        or _os.environ.get("ABPOA_SEEDED_XLA") == "1"))
        # static-shape caps: window qlen is bounded by the longest read,
        # and R/P/O floors ratchet monotonically — without them the
        # per-round maxima drift and every round compiles a fresh kernel
        self._seed_wq_cap = max(
            ((max((len(q) for reads in instances for q in reads),
                  default=0) // 128) + 1) * 128, 128)
        self._seed_floors = {}
        # two interleaved shard groups: while one group's device round is
        # in flight (upload+kernel+fetch on a worker thread), the other
        # group's host work (oracle windows, replay, window fusion, next
        # chaining step) runs on the main thread + host pool
        S = 2 if (use_device and len(instances) >= 8) else 1
        shard_reqs = [{k: v for k, v in reqs.items() if k % S == s}
                      for s in range(S)]
        pending = [None] * S

        def prep_one(rq, k):
            beg_id, end_id, window = rq[k]
            g = abs_[k].graph
            if g.node_n <= 2:
                return k, None
            if not g.is_topological_sorted:
                g.topological_sort(params)
            if not (use_device or use_xla) or len(window) == 0:
                return k, None
            bi = int(g.node_id_to_index[beg_id])
            ei = int(g.node_id_to_index[end_id])
            dg = export_dense(g, params, window, beg_index=bi,
                              end_index=ei)
            # packed backtrack step is op|row<<2|col<<14 (12 row bits,
            # 17 col bits) — oversized windows go to the oracle, same
            # guard as _pallas_dispatch (the XLA engine has no packed
            # stream, so no cap there)
            if use_device and (dg.R > 4096
                               or (dg.qlen // 128 + 1) * 128 >= (1 << 17)):
                return k, None
            return k, (k, beg_id, end_id, window, dg)

        def oracle_one(rq, k):
            beg_id, end_id, window = rq[k]
            g = abs_[k].graph
            if g.node_n <= 2:
                return k, None
            return k, align_sequence_to_subgraph(
                g, params, beg_id, end_id, window, arena=abs_[k].arena)

        while any(shard_reqs) or any(p is not None for p in pending):
            for s in range(S):
                if pending[s] is None and shard_reqs[s]:
                    rq = shard_reqs[s]
                    batch = []
                    host_only = []
                    for k, item in _host_pool().map(
                            lambda k: prep_one(rq, k), sorted(rq)):
                        if item is None:
                            host_only.append(k)
                        else:
                            batch.append(item)
                    pends = ((self._seeded_dispatch(batch) if use_device
                              else self._seeded_dispatch_xla(batch))
                             if batch else [])
                    pending[s] = (rq, pends, host_only)
                    self.rounds += 1
            for s in range(S):
                if pending[s] is not None:
                    rq, pends, host_only = pending[s]
                    results = dict(_host_pool().map(
                        lambda k: oracle_one(rq, k), host_only))
                    for pend in pends:
                        results.update(self._seeded_apply(pend, abs_))

                    def advance(k):
                        try:
                            return k, gens[k].send(results[k]), True
                        except StopIteration:
                            return k, None, False
                    new_rq = {}
                    for k, v, ok in _host_pool().map(advance, sorted(rq)):
                        if ok:
                            new_rq[k] = v
                    shard_reqs[s] = new_rq
                    pending[s] = None
                    break
        return abs_

    def _ratchet_floors(self, pn, items):
        """Ratcheting padded-shape floors per pn (shared by the Pallas
        and XLA seeded dispatchers): padded dims only grow, bounding the
        number of distinct compiled kernels. R starts at the query-scale
        bucket (graphs grow to ~qlen rows, and the row sweep is bounded
        by live rows, so padding R only costs plane memory — not a new
        compile per growth step)."""
        fl = self._seed_floors.setdefault(
            pn, [min(_bucket(self._seed_wq_cap, 64), 4096), 256, 2, 2])
        fl[0] = max(fl[0], max(d[4].R for d in items))
        fl[1] = max(fl[1], max(d[4].W for d in items))
        fl[2] = max(fl[2], max(d[4].P for d in items))
        fl[3] = max(fl[3], max(d[4].O for d in items))
        return tuple(fl)

    def _seeded_dispatch(self, batch):
        """Enqueue one shard-round of window-level device work; the
        worker thread owns upload, kernel and result fetch so the tunnel
        RTT overlaps the other shard's host work."""
        import time
        import jax
        import jax.numpy as jnp
        from ..align.engine_jax import (make_pallas_inputs, repad_dense,
                                        pick_WB)
        from ..ops.dp_pallas_fw import FWConfig, fw_poa_dp_batch
        from ..ops.dp_pallas_band import (BandConfig, band_poa_dp_batch,
                                          pick_band_G)
        params = self.params
        # group by pn, pad to the round maxima; chunk at 128 instances so
        # the padded-batch shape set is bounded regardless of total size
        CH = 128
        by_pn = {}
        for item in batch:
            by_pn.setdefault(item[4].pn, []).append(item)
        by_pn = {(pn, i): items[i:i + CH]
                 for pn, items in by_pn.items()
                 for i in range(0, len(items), CH)}
        pends = []
        for (pn, _chunk), items in by_pn.items():
            R, W, P_, O_ = self._ratchet_floors(pn, items)
            Wq = self._seed_wq_cap
            dgs = [repad_dense(d[4], R, W, P_, O_) for d in items]
            LMAX = (R + Wq + 63) // 64 * 64
            # v4 banded kernel when the band tile applies; else full-width
            WB = pick_WB(params, self._seed_wq_cap, pn)
            G = pick_band_G(params.gap_mode, R, WB, P_, params.m, LMAX)
            use_band = (G > 0 and params.wb >= 0 and Wq < 32000
                        and R <= 4096 and P_ < 32)
            if not use_band:
                G = 4 if len(items) >= 4 else (2 if len(items) >= 2 else 1)
                while 5 * G * R * Wq * 4 > 100 * 1024 * 1024 and G > 1:
                    G //= 2
            WqB = (Wq + WB - 1) // WB * WB if use_band else Wq
            cfgs, arrs = zip(*(make_pallas_inputs(dg, params, WB,
                                                  force_Wq=WqB,
                                                  bt_lmax=LMAX)
                               for dg in dgs))
            cfg = cfgs[0]
            nb = len(items)
            # pad the batch to a power-of-FOUR multiple of G x ndev:
            # round group sizes vary as instances finish, and an
            # unbucketed batch dim would recompile the kernel every
            # round; over a mesh each device's shard must itself be a
            # multiple of G (the kernel grid walks the batch in G-groups)
            ndev = int(np.prod(list(self.mesh.shape.values()))) \
                if self.mesh is not None else 1
            BP = G * ndev
            while BP < nb:
                BP *= 4
            pad = BP - nb
            interp = _interpret()
            if use_band:
                kc = BandConfig(gap_mode=cfg.gap_mode,
                                align_mode=cfg.align_mode, pn=cfg.pn,
                                R=R, WB=WB, Wq=WqB, P=cfg.P, O=cfg.O,
                                m=cfg.m, use_zdrop=cfg.use_zdrop,
                                bt_lmax=LMAX, G=G)
                kern = lambda *a: band_poa_dp_batch(  # noqa: E731
                    kc, *a, interpret=interp)
            else:
                kc = FWConfig(gap_mode=cfg.gap_mode,
                              align_mode=cfg.align_mode, pn=cfg.pn, R=R,
                              Wq=WqB, P=cfg.P, O=cfg.O, m=cfg.m,
                              use_zdrop=cfg.use_zdrop, bt_lmax=LMAX, G=G,
                              banded=params.wb >= 0)
                kern = lambda *a: fw_poa_dp_batch(  # noqa: E731
                    kc, *a, interpret=interp)
            # seeded window rounds shard over the mesh exactly like the
            # plain path: pure data parallelism over independent windows
            # (SURVEY.md window partition = the unit of sharding; ref
            # windows /root/reference/src/abpoa_seed.c:485-577)
            kern = self._mesh_wrap(kern, (kc, interp), len(arrs[0]))
            dummy_out = {4, 5} if use_band else set()
            stacked_np = [np.zeros((nb + pad, 1), np.int8)
                          if i in dummy_out
                          else np.stack([a[i] for a in arrs]
                                        + [arrs[0][i]] * pad)
                          for i in range(len(arrs[0]))]
            # adaptive fetch cap (same policy as _pallas_dispatch):
            # typical walk ~ qlen + slack; rare overflows refetch from
            # the device buffer kept in the pending handle
            hard_cap = min(LMAX, (max(d[4].n_rows for d in items)
                                  + max(d[4].qlen for d in items)
                                  + 71) // 64 * 64)
            qmx = max(d[4].qlen for d in items)
            step_cap = min(hard_cap,
                           (qmx + max(96, qmx // 4) + 63) // 64 * 64)
            mxn = max(d[4].n_rows for d in items)
            t0 = time.perf_counter()
            pend = dict(items=items, nb=nb, t0=t0, band=use_band)

            def submit(kern=kern, stacked_np=stacked_np, nb=nb,
                       step_cap=step_cap, mxn=mxn, use_band=use_band,
                       R=R, P_=P_, pend=pend):
                sn = (_pre_deltas(list(stacked_np), R, P_) if use_band
                      else stacked_np)
                stacked = tuple(jnp.asarray(a) for a in sn)
                if KERNEL_CAPTURE is not None:
                    KERNEL_CAPTURE.append((kern, stacked, nb))
                out = kern(*stacked)
                st = out.steps16 if use_band else out.steps
                pend["steps_dev"] = st
                # mpl|mpr ship as ONE packed word per row: the band-state
                # writeback is half the seeded phase's downlink bytes
                # (values are < 2^15; the ~16 MB/s tunnel downlink is the
                # phase's bottleneck)
                mplr = (out.mpl[:nb, :mxn] & 0xFFFF) \
                    | (out.mpr[:nb, :mxn] << 16)
                return jax.device_get(
                    (out.misc[:nb], st[:nb, :step_cap], mplr))
            pend["future"] = self._pool().submit(submit)
            pends.append(pend)
        return pends

    def _seeded_dispatch_xla(self, batch):
        """Window rounds on the XLA engine (dp_xla.banded_poa_dp_batch):
        the same subgraph exports feed the batched banded DP — filtered
        adjacency keeps dead rows disconnected, and the band writeback is
        masked by the reachability rowmask (matching what the Pallas
        kernels do in-kernel). Mesh sharding rides _device_call's
        NamedSharding. Used on CPU/virtual meshes (dryrun, tests) and as
        the batched fallback when the Pallas envelope is exceeded."""
        from ..align.engine_jax import repad_dense
        params = self.params
        by_pn = {}
        for item in batch:
            by_pn.setdefault(item[4].pn, []).append(item)
        pends = []
        for pn, items in by_pn.items():
            R, W, P_, O_ = self._ratchet_floors(pn, items)
            dgs = [repad_dense(d[4], R, W, P_, O_) for d in items]
            cfg, batched = _stack_inputs(dgs, params)

            # worker thread owns dispatch AND the device->host fetch so
            # the round loop overlaps transfer with the other shard's
            # host work (same pattern as _seeded_dispatch)
            def submit(cfg=cfg, batched=batched):
                import jax
                return jax.device_get(self._device_call(cfg, batched))
            pends.append(dict(xla=True, future=self._pool().submit(submit),
                              items=items, dgs=dgs))
        return pends

    def _seeded_apply_xla(self, pend, abs_):
        """Unpack one XLA window chunk: masked band-state writeback +
        host backtrack from the fetched planes (subgraph-aware via
        dg.beg_index)."""
        from ..align.engine_jax import _backtrack_from_planes
        params = self.params
        out, items, dgs = pend["future"].result(), pend["items"], \
            pend["dgs"]
        H = np.asarray(out.H)
        E1 = np.asarray(out.E1)
        E2 = np.asarray(out.E2)
        F1 = np.asarray(out.F1)
        F2 = np.asarray(out.F2)
        dp_beg = np.asarray(out.dp_beg).astype(np.int64)
        dp_end = np.asarray(out.dp_end).astype(np.int64)
        bs = np.asarray(out.best_score)
        bi_ = np.asarray(out.best_i)
        bj = np.asarray(out.best_j)
        mpl = np.asarray(out.mpl)
        mpr = np.asarray(out.mpr)
        results = {}
        for b, (k, beg_id, end_id, window, dg0) in enumerate(items):
            g = abs_[k].graph
            n = dg0.n_rows
            bi = dg0.beg_index
            if params.wb >= 0:
                # only reachable rows carry band state (the oracle never
                # touches dead rows; the Pallas kernels leave them at
                # their input values — the same no-op)
                msk = (dg0.rowmask[:n].astype(bool)
                       if dg0.rowmask is not None
                       else np.ones(n, dtype=bool))
                ids = np.asarray(g.index_to_node_id[bi:bi + n],
                                 dtype=np.int64)[msk]
                g.node_id_to_max_pos_left[ids] = mpl[b, :n][msk]
                g.node_id_to_max_pos_right[ids] = mpr[b, :n][msk]
            results[k] = _backtrack_from_planes(
                g, params, window, dgs[b], H[b, :n], E1[b, :n],
                E2[b, :n], F1[b, :n], F2[b, :n], dp_beg[b, :n],
                dp_end[b, :n], int(bs[b]), int(bi_[b]), int(bj[b]))
        return results

    def _seeded_apply(self, pend, abs_):
        """Fetch one seeded chunk's results and replay/fuse them."""
        import time
        from ..align.engine_np import AlignResult, align_sequence_to_subgraph
        from ..ops import dp_pallas as dpp
        from ..ops import bt_xla
        if pend.get("xla"):
            return self._seeded_apply_xla(pend, abs_)
        params = self.params
        results = {}
        misc, steps, mplr = pend["future"].result()
        mpl = mplr & 0xFFFF
        mpr = mplr >> 16
        items = pend["items"]
        t1 = time.perf_counter()
        self.dp_seconds += t1 - pend["t0"]
        self.dp_intervals.append((pend["t0"], t1))
        self.dp_cells += int(misc[:, dpp.M_CELLS].sum())
        for b, (k, beg_id, end_id, window, dg0) in enumerate(items):
            ab = abs_[k]
            g = ab.graph
            if misc[b, dpp.M_FAIL] or misc[b, dpp.M_OVFL]:
                # oracle re-runs from the pre-call band state (no
                # writeback happened for this instance)
                self.fallbacks += 1
                results[k] = align_sequence_to_subgraph(
                    g, params, beg_id, end_id, window, arena=ab.arena)
                continue
            n = dg0.n_rows
            bi = dg0.beg_index
            ids = np.asarray(g.index_to_node_id[bi:bi + n],
                             dtype=np.int64)
            g.node_id_to_max_pos_left[ids] = mpl[b, :n]
            g.node_id_to_max_pos_right[ids] = mpr[b, :n]
            res = AlignResult()
            res.best_score = int(misc[b, dpp.M_BEST])
            nst = int(misc[b, dpp.M_NSTEPS])
            stp = _step_stream(pend, steps, b, nst,
                               int(misc[b, dpp.M_BI]),
                               int(misc[b, dpp.M_BJ]))
            bt_xla.replay_steps(g, params, np.asarray(window),
                                stp, nst,
                                int(misc[b, dpp.M_BI]),
                                int(misc[b, dpp.M_BJ]),
                                int(misc[b, dpp.M_ENDI]),
                                int(misc[b, dpp.M_ENDJ]), res,
                                row0=bi)
            results[k] = res
        pend.pop("steps_dev", None)
        return results

    def _effective_engine(self) -> str:
        """Pallas needs a real TPU backend (or the interpret-mode escape
        hatch, ABPOA_PALLAS_INTERPRET=1, which emulates the kernels on
        CPU so the shard_map+Pallas dispatch is testable without chips);
        all three align modes run on the device kernels (banded via
        band/fw, local/unbanded via the fw kernel's full rows)."""
        import jax
        from ..params import GLOBAL_MODE, LOCAL_MODE, EXTEND_MODE
        if self.engine == "xla":
            return "xla"
        if self.params.align_mode not in (GLOBAL_MODE, LOCAL_MODE,
                                          EXTEND_MODE):
            return "xla"
        if jax.default_backend() not in ("tpu", "axon") \
                and not _interpret():
            return "xla"
        return "pallas"

    def _mesh_wrap(self, kern_fn, cfg_key, n_in):
        """Data-parallel dispatch over the mesh: independent instances
        shard over the batch axis, each device runs the kernel on its
        shard — no collectives in the DP itself. The jitted shard-mapped
        callable caches process-globally per static config; a fresh
        jax.jit object every round would miss the C++ dispatch cache and
        retrace each round."""
        if self.mesh is None:
            return kern_fn
        import jax
        from jax.sharding import PartitionSpec as P
        key = (cfg_key, tuple(d.id for d in self.mesh.devices.flat),
               tuple(self.mesh.axis_names), self.batch_axis, n_in)
        if key not in _MESH_KERN_CACHE:
            _MESH_KERN_CACHE[key] = jax.jit(jax.shard_map(
                kern_fn, mesh=self.mesh,
                in_specs=tuple(P(self.batch_axis)
                               for _ in range(n_in)),
                out_specs=P(self.batch_axis), check_vma=False))
        return _MESH_KERN_CACHE[key]

    # -------------------------------------------------------------- #
    def _round_pallas(self, abs_, group, dgs, r, instances):
        pend = self._pallas_dispatch(abs_, group, dgs, r, instances)
        if pend is not None:
            self._pallas_collect(pend)

    def _pallas_dispatch(self, abs_, group, dgs, r, instances):
        """Enqueue one round's device work (DP + in-kernel backtrack) and
        return a pending handle; no device sync happens here, so the host
        can overlap other instances' fusion with this kernel's execution."""
        import time
        import jax
        import jax.numpy as jnp
        from ..align.engine_jax import make_pallas_inputs, pick_WB
        from ..ops import dp_pallas as dpp
        params = self.params
        from ..params import LINEAR_GAP, CONVEX_GAP
        WB = max(pick_WB(params, dg.qlen, dg.pn) for dg in dgs)
        Wq = max((dg.qlen // 128 + 1) * 128 for dg in dgs)
        LMAX = (dgs[0].R + Wq + 63) // 64 * 64
        R = dgs[0].R
        # v4 mod-WB banded kernel: G instances per program on [G, R, WB]
        # planes; per-instance band overflow falls back via M_OVFL
        from ..ops.dp_pallas_band import pick_band_G
        Gb = pick_band_G(params.gap_mode, R, WB,
                         max(d.P for d in dgs), params.m, LMAX)
        # packed 16-bit control words need qlen < 32766 and R <= 4096;
        # unbanded (-b -1) computes full rows -> fw kernel
        use_band = (Gb > 0 and Wq < 32000 and R <= 4096
                    and max(d.P for d in dgs) < 32 and params.wb >= 0)
        if not use_band:
            # full-width kernel (dp_pallas_fw) when its planes fit VMEM;
            # otherwise the v1 banded-tile kernel
            nplanes = {LINEAR_GAP: 1, CONVEX_GAP: 5}.get(params.gap_mode, 3)
            G = 0
            for g in (4, 2, 1):
                if nplanes * g * R * Wq * 4 <= 100 * 1024 * 1024:
                    G = g
                    break
            use_fw = G > 0
        # the packed backtrack step is op|row<<2|col<<14: rows need <=12
        # bits and cols <=17; larger problems use the XLA fallback engine
        if R > 4096 or Wq >= (1 << 17):
            cfg, batched = _stack_inputs(dgs, params)
            out = self._device_call(cfg, batched)
            self._finish_round(abs_, group, dgs, out, r, instances)
            return None
        WqB = (Wq + WB - 1) // WB * WB if use_band else Wq
        cfgs, arrs = zip(*(make_pallas_inputs(dg, params, WB, force_Wq=WqB,
                                              bt_lmax=LMAX)
                           for dg in dgs))
        cfg = cfgs[0]
        assert all(c == cfg for c in cfgs)
        nb = len(dgs)
        ndev = int(np.prod(list(self.mesh.shape.values()))) \
            if self.mesh is not None else 1
        chunk = (Gb if use_band else (G if use_fw else 1)) * ndev
        pad = (-nb) % chunk
        # the band kernel pulls band state from predecessors and never
        # reads out_idx/out_n (tuple slots 4/5); the whole-graph path runs
        # right after a toposort, so mpl0/mpr0 (slots 8/9) are the reset
        # pattern and rowmask (slot 10) is all-ones — the kernel
        # synthesizes both (fresh=True). Ship 1-element dummies — the
        # tunnel uplink is ~60 MB/s, so ~13 KB/instance matters
        dummy_out = {4, 5, 8, 9, 10} if use_band else set()
        stacked_np = [np.zeros((len(arrs) + pad, 1), np.int8)
                      if i in dummy_out
                      else np.stack([a[i] for a in arrs]
                                    + [arrs[0][i]] * pad)
                      for i in range(len(arrs[0]))]
        t0 = time.perf_counter()
        interp = _interpret()
        if use_band:
            from ..ops.dp_pallas_band import BandConfig, band_poa_dp_batch
            bc = BandConfig(gap_mode=cfg.gap_mode,
                            align_mode=cfg.align_mode, pn=cfg.pn, R=R,
                            WB=WB, Wq=WqB, P=cfg.P, O=cfg.O, m=cfg.m,
                            use_zdrop=cfg.use_zdrop, bt_lmax=LMAX, G=Gb,
                            fresh=True)
            kern_fn = lambda *a: band_poa_dp_batch(  # noqa: E731
                bc, *a, interpret=interp)
            cfg_key = bc
        elif use_fw:
            from ..ops.dp_pallas_fw import FWConfig, fw_poa_dp_batch
            fwc = FWConfig(gap_mode=cfg.gap_mode, align_mode=cfg.align_mode,
                           pn=cfg.pn, R=R, Wq=Wq, P=cfg.P, O=cfg.O,
                           m=cfg.m, use_zdrop=cfg.use_zdrop,
                           bt_lmax=LMAX, G=G, banded=params.wb >= 0)
            kern_fn = lambda *a: fw_poa_dp_batch(  # noqa: E731
                fwc, *a, interpret=interp)
            cfg_key = fwc
        else:
            kern_fn = lambda *a: dpp.pallas_poa_dp_batch(  # noqa: E731
                cfg, *a, interpret=interp)
            cfg_key = cfg
        kern_fn = self._mesh_wrap(kern_fn, (cfg_key, interp),
                                  len(stacked_np))

        # upload, dispatch AND result fetch all block on the tunnel RTT;
        # run the whole device round in a worker thread so transport
        # overlaps both the main thread's fusion and the other in-flight
        # shards' kernels (I/O releases the GIL)
        # adaptive fetch cap: the walk is bounded by rows+qlen, but the
        # TYPICAL path is ~qlen + a few deletions — fetch qlen + slack
        # and refetch the rare overflowing instance from the device
        # buffer kept alive in the pending handle (the ~16 MB/s tunnel
        # downlink makes steps16 the largest per-round fetch)
        hard_cap = min(LMAX, (max(d.n_rows for d in dgs)
                              + max(d.qlen for d in dgs) + 71) // 64 * 64)
        qmax = max(d.qlen for d in dgs)
        step_cap = min(hard_cap,
                       (qmax + max(96, qmax // 4) + 63) // 64 * 64)
        pend = dict(nb=nb, abs_=abs_, group=group, r=r,
                    instances=instances, t0=t0, band=use_band,
                    step_cap=step_cap)

        def submit():
            sn = (_pre_deltas(list(stacked_np), R, cfg.P) if use_band
                  else stacked_np)
            stacked = tuple(jnp.asarray(a) for a in sn)
            if KERNEL_CAPTURE is not None:
                KERNEL_CAPTURE.append((kern_fn, stacked, nb))
            out = kern_fn(*stacked)
            st = out.steps16 if use_band else out.steps
            pend["steps_dev"] = st  # for rare over-cap refetch
            return jax.device_get((out.misc[:nb], st[:nb, :step_cap]))
        pend["future"] = self._pool().submit(submit)
        return pend

    def _pool(self):
        # one shared dispatch pool for the process (BatchPOA instances
        # are created per run; per-instance executors would leak threads)
        global _DISPATCH_POOL
        if _DISPATCH_POOL is None:
            from concurrent.futures import ThreadPoolExecutor
            _DISPATCH_POOL = ThreadPoolExecutor(
                max_workers=self.N_SHARDS,
                thread_name_prefix="abpoa-dispatch")
        return _DISPATCH_POOL

    def _pallas_collect(self, pend):
        """Fetch a dispatched round's results and fuse them (host work)."""
        import time
        from ..align.engine_np import AlignResult, align_sequence_to_subgraph
        from ..ops import dp_pallas as dpp
        from ..ops import bt_xla
        from ..params import SRC_NODE_ID, SINK_NODE_ID
        params = self.params
        import jax
        (misc, steps), nb = pend["future"].result(), pend["nb"]
        abs_, group, r = pend["abs_"], pend["group"], pend["r"]
        instances = pend["instances"]
        t1 = time.perf_counter()
        self.dp_seconds += t1 - pend["t0"]
        self.dp_intervals.append((pend["t0"], t1))
        self.dp_cells += int(misc[:, dpp.M_CELLS].sum())
        from ..graph import NativeGraph

        def fuse_one(b_k):
            b, k = b_k
            ab = abs_[k]
            q = instances[k][r]
            w = self._weight(k, r, q)
            rid = self._rid(k, r)
            bad = bool(misc[b, dpp.M_OVFL] or misc[b, dpp.M_FAIL])
            nst = int(misc[b, dpp.M_NSTEPS])

            def step_stream():
                # deferred past the bad/amb early-outs (never read there)
                return _step_stream(pend, steps, b, nst,
                                    int(misc[b, dpp.M_BI]),
                                    int(misc[b, dpp.M_BJ]))
            if params.amb_strand and (
                    bad or self._amb_flagged(ab, q,
                                             int(misc[b, dpp.M_BEST]))):
                # rc-retry candidate: redo fwd+rc through the sequential
                # per-read body (bit-equal to the device fwd by the
                # engine equivalence chain), ref abpoa_align.c:315
                ab.poa_one(params, q, w, rid)
                return
            if bad:
                self.fallbacks += 1
                res = align_sequence_to_subgraph(
                    ab.graph, params, SRC_NODE_ID, SINK_NODE_ID, q,
                    arena=ab.arena)
            elif isinstance(ab.graph, NativeGraph) and not params.rev_cigar:
                # native fast path: replay the step stream and fuse it in
                # one C pass, no Python cigar materialization
                ab.graph.fuse_steps(params, 0, step_stream(), nst,
                                    int(misc[b, dpp.M_BJ]),
                                    int(misc[b, dpp.M_ENDJ]), q, rid, True,
                                    weight=(None if self._weights is None
                                            else w))
                return
            else:
                res = AlignResult()
                res.best_score = int(misc[b, dpp.M_BEST])
                bt_xla.replay_steps(ab.graph, params, np.asarray(q),
                                    step_stream(), nst,
                                    int(misc[b, dpp.M_BI]),
                                    int(misc[b, dpp.M_BJ]),
                                    int(misc[b, dpp.M_ENDI]),
                                    int(misc[b, dpp.M_ENDJ]), res)
            ab.graph.add_graph_alignment(params, q, w,
                                         res.cigar, None, rid, True)

        # instance-parallel fusion: each b mutates a different graph, and
        # the hot path is one C call (GIL released)
        list(_host_pool().map(fuse_one, enumerate(group)))
        pend.pop("steps_dev", None)  # release the device step buffer

    def _amb_flagged(self, ab, q, score: int) -> bool:
        """Ambiguous-strand retry threshold (ref abpoa_align.c:315)."""
        thres = (min(len(q), ab.graph.node_n - 2)
                 * self.params.max_mat * .3333)
        return score < thres

    def _finish_round(self, abs_, group, dgs, out, r, instances):
        params = self.params
        H = np.asarray(out.H)
        E1 = np.asarray(out.E1)
        E2 = np.asarray(out.E2)
        F1 = np.asarray(out.F1)
        F2 = np.asarray(out.F2)
        dp_beg = np.asarray(out.dp_beg).astype(np.int64)
        dp_end = np.asarray(out.dp_end).astype(np.int64)
        bs = np.asarray(out.best_score)
        bi = np.asarray(out.best_i)
        bj = np.asarray(out.best_j)
        mpl = np.asarray(out.mpl)
        mpr = np.asarray(out.mpr)
        for b, k in enumerate(group):
            ab = abs_[k]
            dg = dgs[b]
            q = instances[k][r]
            n = dg.n_rows
            g = ab.graph
            if params.amb_strand and self._amb_flagged(ab, q, int(bs[b])):
                # before the band-state writeback: the sequential rc-retry
                # reruns the fwd align from the pre-align band state
                ab.poa_one(params, q, self._weight(k, r, q),
                           self._rid(k, r))
                continue
            if params.wb >= 0:
                i2n = np.asarray(g.index_to_node_id[:n], dtype=np.int64)
                g.node_id_to_max_pos_left[i2n] = mpl[b, :n]
                g.node_id_to_max_pos_right[i2n] = mpr[b, :n]
            res = _backtrack_from_planes(
                g, params, q, dg, H[b, :n], E1[b, :n], E2[b, :n],
                F1[b, :n], F2[b, :n], dp_beg[b, :n], dp_end[b, :n],
                int(bs[b]), int(bi[b]), int(bj[b]))
            g.add_graph_alignment(params, q, self._weight(k, r, q),
                                  res.cigar, None, self._rid(k, r), True)

    def dp_busy_seconds(self) -> float:
        """Union length of the device-call intervals (the summed
        dp_seconds double-counts overlapped pipeline shards)."""
        total = 0.0
        end = float("-inf")
        for t0, t1 in sorted(self.dp_intervals):
            if t0 > end:
                total += t1 - t0
                end = t1
            elif t1 > end:
                total += t1 - end
                end = t1
        return total

    def run_consensus(self, instances, seeded=False, weights=None):
        """Full pipeline: batched POA then consensus per instance; returns
        list of consensus strings (heaviest bundling, max_n_cons=1).
        seeded=True routes through the windowed -S/-p pipeline."""
        from ..consensus import generate_consensus
        from ..alphabet import decode_table
        self.precompute_cons = True
        abs_ = (self.run_seeded(instances, weights=weights) if seeded
                else self.run(instances, weights=weights))
        tab = decode_table(self.params.m)

        def cons_one(ab):
            # instance-independent; heaviest-bundling runs C/numpy work
            # that releases the GIL, so the pool gives real parallelism
            generate_consensus(ab, self.params)
            c = ab.cons
            return [bytes(tab[b] for b in seq).decode()
                    for seq in c.cons_base[:c.n_cons]]
        return list(_host_pool().map(cons_one, abs_))


def batch_msa_from_files(params, fns, out):
    """Batched CLI list mode (-l): one POA instance per input file through
    BatchPOA, outputs rendered in file order — byte-identical to running
    abpoa_msa1 serially per file (the reference processes list entries
    one by one, src/abpoa_align.c:439-503; batching across files is the
    TPU-native win). Covers qv weights (-Q fastq, ref abpoa.c:135-138)
    and incremental graphs (-i, every instance restores the same initial
    graph before its reads fuse)."""
    from ..seqio import read_seqs
    from ..alphabet import encode_table
    from ..params import GLOBAL_MODE
    tab = encode_table(params.m)
    instances = []
    names = []
    weights = None
    if params.use_qv:
        weights = []
    for fn in fns:
        recs = read_seqs(fn)
        names.append([r.name for r in recs])
        instances.append([
            tab[np.frombuffer(r.seq.encode(), dtype=np.uint8)]
            for r in recs])
        if weights is not None:
            weights.append([
                [ord(c) - 32 for c in r.qual] if r.qual
                else [1] * len(r.seq) for r in recs])
    # serial parity: msa() returns before restore/output on an empty seq
    # list (api.py:196-198, ref abpoa_msa src/abpoa_align.c:373-437 via a
    # 0-iteration read loop) — an empty input file must produce NO output
    keep = [k for k, inst in enumerate(instances) if inst]
    instances = [instances[k] for k in keep]
    names = [names[k] for k in keep]
    if weights is not None:
        weights = [weights[k] for k in keep]
    if not instances:
        return
    init = None
    if params.incr_fn:
        from ..gfa import restore_graph

        def init(ab):
            restore_graph(ab, params)
    bp = BatchPOA(params)
    seeded = (not (params.disable_seeding and not params.progressive_poa)
              and params.align_mode == GLOBAL_MODE)
    abs_ = (bp.run_seeded(instances, weights=weights, init=init) if seeded
            else bp.run(instances, weights=weights, init=init))
    for ab, nm in zip(abs_, names):
        # restored reads (incremental) keep their names; new reads take
        # the input file's record names
        ab.names = list(ab.names[:ab.n_seq - len(nm)]) + nm
        ab.output(params, out)


# ---------------------------------------------------------------------- #
# device-resident loop dispatch (ops/poa_loop.py): the whole progressive
# POA loop in ONE device dispatch — no per-round host round trip.

def _loop_geometry(params, instances, wmax=None):
    """Static LoopConfig for a batch, or None if outside the v1 envelope
    (the round-based path then runs instead). wmax: max possible edge
    weight when per-base weights are in play (qv mode) — selects the
    wide-weight kernel variant (wmode=1) when it fits 15 bits."""
    from ..align.engine_np import score_width_dispatch
    from ..align.engine_jax import pick_WB
    from ..ops.poa_loop import LoopConfig
    from ..ops.dp_pallas_band import pick_band_G_packed
    lens = [len(q) for reads in instances for q in reads]
    if not lens:
        return None
    maxlen = max(lens)
    NR = max(len(reads) for reads in instances) - 1
    if NR < 1 or maxlen < 1:
        return None
    # node capacity: progressive graphs grow to ~maxlen + variants; cap
    # to keep the DP kernel at G=16 when possible, overflowing instances
    # fall back to the oracle
    R = min(4096, (int(maxlen + max(96, maxlen // 4)) + 63) // 64 * 64)
    R = max(R, 128)
    bits, pn, _ln, inf_min = score_width_dispatch(params, R, maxlen)
    if bits != 16:
        return None       # pn would vary per round; host path handles it
    WB = pick_WB(params, maxlen, pn)
    Wq = ((maxlen // 128) + 1) * 128
    Wq = (Wq + WB - 1) // WB * WB
    LS = (R + Wq + 63) // 64 * 64
    if Wq >= 32000 or R > 4096:
        return None
    import os
    G = pick_band_G_packed(params.gap_mode, R, WB, 8, params.m, LS)
    # the DP sweep is SCALAR-bound per row per g (round-5 on-chip A/B:
    # G=16 vs G=8 at B=64 was a wash, 1.18 vs 1.15 s median), so prefer
    # the smaller packing: same speed, half the VMEM, faster compiles
    G = min(G, 8)
    if G < 4:
        return None
    # out-edge weights pack above the node-id bits in 16-bit halves:
    # unit weights bound the max edge weight by reads-per-instance.
    # qv weights (wmode=1) use full words instead (id | w<<16) and need
    # the total per-edge weight to fit 15 bits.
    wmode = 0
    if wmax is not None:
        if wmax >= (1 << 15):
            return None
        wmode = 1
        wbits = 4          # unused in wide mode
    else:
        max_reads = max(len(reads) for reads in instances)
        wbits = max(4, int(max_reads).bit_length())
        if wbits > 6 or R > (1 << (16 - wbits)):
            return None
    GT = 4                          # graph kernel SMEM budget
    if wmode:
        # wide out-edge words double the outp blocks; the smem-resident
        # graph kernel fits GT=2 at heter scale (scalar-bound anyway)
        GT = 2
    # test hook: interpret-mode traces unroll the kernel bodies per g,
    # so suite runs cap the packing to keep compiles seconds not minutes
    g_env = os.environ.get("ABPOA_LOOP_G")
    if g_env:
        G = min(G, max(1, int(g_env)))
        GT = min(GT, G)
    # graph-kernel state residency + packing (bench probes): "any" keeps
    # the packed state HBM-resident (DMA'd per program), whose halved
    # SMEM footprint admits GT=8
    gk = os.environ.get("ABPOA_GK_IMPL", "smem")
    gt_env = os.environ.get("ABPOA_LOOP_GT")
    if gt_env:
        GT = max(1, int(gt_env))
    gv = int(os.environ.get("ABPOA_GK_VARIANT", "0"))
    abl = os.environ.get("ABPOA_GK_ABLATE", "")
    # dv=1 gates the band-pull predecessor tail behind npre>1 (chain
    # rows, the vast majority, skip P-1 pull iterations): -4% e2e in the
    # round-5 interleaved A/B (1.053 vs 1.096 s median at B=64)
    dv = int(os.environ.get("ABPOA_DP_VARIANT", "1"))
    return LoopConfig(R=R, E=12, P=8, A=4, Wq=Wq, WB=WB, LS=LS, NR=NR,
                      B=0, G=G, GT=GT, pn=pn, inf_min=inf_min,
                      gap_mode=params.gap_mode,
                      use_zdrop=params.zdrop > 0, wbits=wbits, gk=gk,
                      gv=gv, abl=abl, dv=dv, wmode=wmode)


_LOOP_MESH_CACHE: dict = {}


class _DeviceLoop:
    """One batched device-loop execution (state build, dispatch, replay)."""

    def __init__(self, bp: "BatchPOA", abs_, instances):
        self.bp = bp
        self.abs_ = abs_
        self.instances = instances

    def _loop_callable(self, cfg, interp):
        """The jitted scanned loop; over a mesh, shard_map'd data-parallel
        across the batch axis (instances are independent — the scan
        carries per-instance state only, so the sharded loop needs no
        collectives). Cached process-globally per static config."""
        from ..ops import poa_loop as pls
        bp = self.bp
        if bp.mesh is None:
            return pls.poa_device_loop_jit(cfg, interpret=interp)
        import jax
        from functools import partial
        from jax.sharding import PartitionSpec as P
        key = (cfg, interp, tuple(d.id for d in bp.mesh.devices.flat),
               tuple(bp.mesh.axis_names), bp.batch_axis)
        if key not in _LOOP_MESH_CACHE:
            Pb = P(bp.batch_axis)          # [B, ...] leaves
            Pr = P(None, bp.batch_axis)    # [NR, B, ...] round stacks
            Pn = P()                       # replicated scalars/params
            in_specs = (Pb, Pb, Pb, Pb, Pr, Pr, Pn, Pn, Pn)
            if cfg.wmode:
                in_specs = in_specs + (Pr,)    # qw_rounds
            _LOOP_MESH_CACHE[key] = jax.jit(jax.shard_map(
                partial(pls.poa_device_loop, cfg, interpret=interp),
                mesh=bp.mesh,
                in_specs=in_specs,
                out_specs=(Pb, Pr, Pr), check_vma=False))
        return _LOOP_MESH_CACHE[key]

    def eligible(self):
        import os
        bp, p = self.bp, self.bp.params
        if os.environ.get("ABPOA_DEVICE_LOOP", "1") == "0":
            return False
        if bp._effective_engine() != "pallas":
            return False
        if _interpret() and os.environ.get("ABPOA_DEVICE_LOOP") != "1":
            # interpret-mode compiles of the whole scanned loop take
            # minutes per shape bucket; only run it when explicitly
            # requested (tests/fuzz campaigns opt in)
            return False
        from ..params import GLOBAL_MODE
        if (p.align_mode != GLOBAL_MODE or p.wb < 0
                or p.rev_cigar or p.m != 5
                or any(r0 != 0 for r0 in bp._rid0)):
            return False
        wmax = None
        if bp._weights is not None:
            # qv mode: the device tracks true edge weights (remain's
            # heaviest-edge chase is band-geometry-critical); bound the
            # max possible edge weight = per-instance sum of per-read
            # weight maxima
            try:
                wmax = max(
                    sum(max(bp._weight(k, r, q)) for r, q in
                        enumerate(reads))
                    for k, reads in enumerate(self.instances) if reads)
            except (TypeError, ValueError):
                return False
            if wmax < 0:
                return False
        self.cfg = _loop_geometry(p, self.instances, wmax=wmax)
        return self.cfg is not None

    def run(self):
        import os
        import time
        import jax
        import jax.numpy as jnp
        from ..ops import poa_loop as pls
        from ..ops import dp_pallas as dpp
        bp, params = self.bp, self.bp.params
        abs_, instances = self.abs_, self.instances
        cfg0 = self.cfg
        # fuse read 0 + sort on the host (cheap C work, once)
        for k, reads in enumerate(instances):
            ab = abs_[k]
            if reads:
                ab.graph.add_graph_alignment(
                    params, reads[0], bp._weight(k, 0, reads[0]), [],
                    None, bp._rid(k, 0), True)
                ab.graph.topological_sort(params)
        live = [k for k, reads in enumerate(instances)
                if len(reads) >= 2]
        if not live:
            return True
        # each mesh device's shard must itself be a whole number of
        # kernel groups, so the batch aligns to chunk * ndev
        ndev = (int(np.prod(list(bp.mesh.shape.values())))
                if bp.mesh is not None else 1)
        chunk = int(np.lcm(cfg0.G, cfg0.GT)) * ndev
        # two sub-batches pipeline device execution against host replay:
        # XLA queues the second loop while the host replays the first
        if len(live) >= 2 * chunk:
            mid = (len(live) // 2 + chunk - 1) // chunk * chunk
            parts = [live[:mid], live[mid:]]
        else:
            parts = [live]
        scal_base = pls.make_scal_base(params, cfg0)
        interp = _interpret()
        bp.used_device_loop = True
        t0 = time.perf_counter()
        pends = []
        for part in parts:
            B = max(chunk, -(-len(part) // chunk) * chunk)
            cfg = cfg0._replace(B=B)
            graphs = [abs_[k].graph for k in part]
            graphs += [graphs[0]] * (B - len(part))   # pad replicas
            st, i2n, n2i, remain = pls.init_state_np(graphs, cfg)
            qc = np.zeros((cfg.NR, B, cfg.Wq), np.int8)
            ql = np.zeros((cfg.NR, B), np.int32)
            qw = (np.zeros((cfg.NR, B, cfg.Wq), np.int32)
                  if cfg.wmode else None)
            for b, k in enumerate(part):
                for r, q in enumerate(instances[k][1:]):
                    qc[r, b, 1:len(q) + 1] = q
                    ql[r, b] = len(q)
                    if cfg.wmode:
                        # weight stream is 0-based consumed-position
                        # indexed (ref weight[q])
                        qw[r, b, :len(q)] = bp._weight(k, r + 1, q)
            loop = self._loop_callable(cfg, interp)
            args = [jax.tree.map(jnp.asarray, st), jnp.asarray(i2n),
                    jnp.asarray(n2i), jnp.asarray(remain),
                    jnp.asarray(qc), jnp.asarray(ql),
                    jnp.asarray(scal_base), jnp.int32(params.wb),
                    jnp.int32(round(params.wf * 1000))]
            if cfg.wmode:
                args.append(jnp.asarray(qw))
            stF, misc_d, s16_d = loop(*args)
            maxlen = int(ql.max()) if len(part) else 0
            cap = min(cfg.LS, (maxlen + max(96, maxlen // 4) + 63)
                      // 64 * 64)
            # test hook: a forced tiny cap exercises the over-cap refetch
            # branch on ordinary inputs (tests/test_device_loop_dispatch)
            cap_env = os.environ.get("ABPOA_S16_CAP")
            if cap_env:
                cap = max(2, min(cap, int(cap_env)))
            pends.append((part, cfg, stF, misc_d, s16_d, cap))

        # dp_seconds denominator: the two sub-batches pipeline, so each
        # part accounts only its own [t_prev, fetch] interval — the sum
        # is the phase's total wall (<= e2e), never double-counted
        t_prev = t0
        for part, cfg, stF, misc_d, s16_d, cap in pends:
            # the wire format is steps16 halves packed 2/int32 word
            # (emitted by the DP kernel directly); a view recovers the
            # int16 stream
            misc, s16w, failv = jax.device_get(
                (misc_d, s16_d[:, :, :cap // 2], stF.fail))
            s16 = s16w.view(np.int16)
            t1 = time.perf_counter()
            bp.dp_seconds += t1 - t_prev
            bp.dp_intervals.append((t_prev, t1))
            t_prev = t1
            bp.rounds += cfg.NR
            ok_mask = failv == 0
            cells = 0
            for b, k in enumerate(part):
                if ok_mask[b]:
                    nr_k = len(instances[k]) - 1
                    cells += int(misc[:nr_k, b, dpp.M_CELLS].sum())
            bp.dp_cells += cells
            self._replay(part, misc, s16, s16_d, ok_mask)
        return True

    def _replay(self, live, misc, s16, s16_d, ok_mask):
        import jax
        bp, params = self.bp, self.bp.params
        abs_, instances = self.abs_, self.instances
        from ..ops import dp_pallas as dpp
        from ..ops import bt_xla
        from ..graph import NativeGraph
        # unpack ALL step streams in one vectorized pass (the per-case
        # unpack_steps16 cumsums would serialize on the GIL inside the
        # replay pool): steps16 is op|dj<<2|di<<3 deltas from (bi, bj)
        raw = s16.astype(np.int32) & 0xFFFF
        iall = (misc[:, :, dpp.M_BI:dpp.M_BI + 1]
                - np.cumsum((raw >> 3) & 0x1FFF, axis=2))
        jall = (misc[:, :, dpp.M_BJ:dpp.M_BJ + 1]
                - np.cumsum((raw >> 2) & 1, axis=2))
        steps_all = (raw & 3) | (iall << 2) | (jall << 14)

        def replay_one(b_k):
            b, k = b_k
            ab = abs_[k]
            reads = instances[k]
            if not ok_mask[b]:
                # sticky device failure: rebuild the instance on the
                # bit-exact oracle from scratch
                bp.fallbacks += 1
                ab.graph.reset()
                for r, q in enumerate(reads):
                    ab.poa_one(params, q, bp._weight(k, r, q),
                               bp._rid(k, r))
            else:
                g = ab.graph
                for r, q in enumerate(reads[1:]):
                    mi = misc[r, b]
                    if params.amb_strand and bp._amb_flagged(
                            ab, q, int(mi[dpp.M_BEST])):
                        # ambiguous-strand retry (ref abpoa_align.c:315):
                        # the device ran fw-only, so from the first
                        # flagged round the sequential fwd+rc body
                        # finishes the instance (bit-equal: the fw score
                        # the flag keyed on matches the oracle's by the
                        # engine equivalence chain)
                        for rr in range(r + 1, len(reads)):
                            qq = reads[rr]
                            ab.poa_one(params, qq,
                                       bp._weight(k, rr, qq),
                                       bp._rid(k, rr))
                        break
                    nst = int(mi[dpp.M_NSTEPS])
                    if nst > s16.shape[2]:   # rare over-cap: refetch
                        w = jax.device_get(
                            s16_d[r, b, :(nst + 1) // 2])
                        steps32 = bt_xla.unpack_steps16(
                            np.ascontiguousarray(w).view(np.int16)[:nst],
                            nst, int(mi[dpp.M_BI]), int(mi[dpp.M_BJ]))
                    else:
                        steps32 = steps_all[r, b]
                    if not g.is_topological_sorted:
                        g.topological_sort(params)
                    if isinstance(g, NativeGraph):
                        g.fuse_steps(params, 0, steps32, nst,
                                     int(mi[dpp.M_BJ]),
                                     int(mi[dpp.M_ENDJ]),
                                     q, bp._rid(k, r + 1), True,
                                     weight=(None
                                             if bp._weights is None
                                             else bp._weight(k, r + 1,
                                                             q)))
                    else:
                        from ..align.engine_np import AlignResult
                        res = AlignResult()
                        bt_xla.replay_steps(g, params, np.asarray(q),
                                            steps32, nst,
                                            int(mi[dpp.M_BI]),
                                            int(mi[dpp.M_BJ]),
                                            int(mi[dpp.M_ENDI]),
                                            int(mi[dpp.M_ENDJ]), res)
                        g.add_graph_alignment(params, q,
                                              bp._weight(k, r + 1, q),
                                              res.cigar, None,
                                              bp._rid(k, r + 1), True)
            if bp.precompute_cons:
                # consensus inside the replay pool: overlaps the other
                # sub-batch's device execution (run_consensus's later
                # pass is then an is_called_cons no-op)
                from ..consensus import generate_consensus
                generate_consensus(ab, params)

        import os as _os
        if _os.environ.get("ABPOA_LOOP_NO_REPLAY") != "1":
            # debug/bench-ablation escape hatch: skip the host replay
            # (outputs are then meaningless; timings isolate the device)
            list(_host_pool().map(replay_one, enumerate(live)))
        return True
