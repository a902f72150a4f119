"""Chunked vs single-dispatch signal EM E-step on the TPU.

The r4 chunk-pipelining that lifted the posterior families hides each
dispatch's fixed tunnel-sync latency under the next chunk's host prep;
the E-step's D2H is tiny (reduced accumulators), so the question is
whether prep/dispatch overlap still pays.  Usage:
    python tools/exp_chunk_em.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.fixtures import fixture_path
    from cpecan_tpu.io.npread import load_npread
    from cpecan_tpu.io.poremodel import load_pore_model
    from cpecan_tpu.models.state_machines import StateMachine3SignalStrawman
    from cpecan_tpu.ops.pallas_fb import StrawmanPallasAligner

    # same workload as bench.py: Zymo-scale synthetic reads
    rng = np.random.default_rng(7)
    model = load_pore_model(fixture_path("template_median68pA.model"))
    npr = load_npread(fixture_path("ZymoC_ch_1_file1.npRead"))
    ref = open(fixture_path("ZymoRef.txt")).read().splitlines()[0]
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    mm = model.match_model
    reads = []
    for i in range(128):
        n = 905
        s = "".join(rng.choice(list("ACGT"), n))
        l_x = n - 5
        kidx = seq_to_kmer_indices(s)
        n_ev = 800
        pos = np.sort(rng.integers(0, l_x, n_ev))
        ev = np.zeros((n_ev, 3))
        ev[:, 0] = mm[kidx[pos], 0] + rng.normal(0, 1.0, n_ev)
        ev[:, 1] = np.maximum(mm[kidx[pos], 2], 0.1)
        ev[:, 2] = 0.01
        anchors = [(j, int(j * n_ev / l_x)) for j in range(30, l_x - 30, 60)]
        anchors = [(x, y) for x, y in anchors if 0 < y < n_ev]
        reads.append((s, ev, l_x, n_ev, anchors))

    sm = StateMachine3SignalStrawman(model)
    pa = StrawmanPallasAligner(AlignmentParams(), interpret=False, group=32)

    def sync(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        np.asarray(leaf.ravel()[:8])

    def single():
        out = pa.run(sm, reads, expectations=True, ragged_left=True,
                     ragged_right=True)
        sync(out["expectations"]["trans"])

    def chunked(chunk):
        hint = (max(r[2] for r in reads),
                max(r[2] + r[3] for r in reads))
        outs = []
        for i in range(0, len(reads), chunk):
            o = pa.run(sm, reads[i:i + chunk], expectations=True,
                       ragged_left=True, ragged_right=True,
                       shape_hint=hint)
            outs.append(o)
        for o in outs:
            sync(o["expectations"]["trans"])

    def median(fn, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    single()
    print(f"single x128 : {128 / median(single):8.1f} reads/s")
    for chunk in (64, 32):
        chunked(chunk)
        print(f"chunked x{chunk:3d}: "
              f"{128 / median(lambda: chunked(chunk)):8.1f} reads/s")


if __name__ == "__main__":
    main()
