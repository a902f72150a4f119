"""Stage-level timing of the cPecanEm / trainModels E-steps on the TPU.

Breaks bench.py's dna_em / signal_em workloads into: host prep (band
construct + feature packing), device dispatch (H2D + kernels, async),
device sync, and expectation reduce + D2H — to show which side of the
tunnel the E-step is bound on.

Usage: python tools/profile_em.py [dna|signal]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def _t():
    return time.perf_counter()


def profile_dna():
    import random
    import jax
    from cpecan_tpu.io.cigar import parse_cigar_line
    from cpecan_tpu.ops.pallas_fb import Dna5PallasAligner
    from cpecan_tpu.pipeline.em import (EmOptions,
                                        calculate_expectations_pallas,
                                        PipelineHmm, _shard_alignments)

    rng = random.Random(3)
    seqs = {}
    alns = []
    for i in range(32):
        sx = "".join(rng.choice("ACGT") for _ in range(1000))
        sy = "".join(c if rng.random() > 0.12 else rng.choice("ACGT")
                     for c in sx)
        seqs[f"x{i}"] = sx
        seqs[f"y{i}"] = sy
        alns.append(parse_cigar_line(
            f"cigar: y{i} 0 {len(sy)} + x{i} 0 1000 + 0 M 1000"))
    options = EmOptions(train_emissions=True)
    hmm = PipelineHmm("fiveState")
    hmm.equalise()
    sm = hmm.to_state_machine()
    shards = _shard_alignments(alns, options, rng)
    pa = Dna5PallasAligner(options.realign_params, interpret=False, group=32)
    # warm
    calculate_expectations_pallas(shards, seqs, sm, options.realign_params, pa)

    # stage timings on the aligner directly (one batch = all 32 pairs)
    reads = []
    for aln in alns:
        sx, sy = seqs[aln.contig1], seqs[aln.contig2]
        anchors = [(j, j) for j in range(20, 980, 20)]
        reads.append((sx, sy, len(sx), len(sy), anchors))

    for rep in range(3):
        t0 = _t()
        prep = pa.prepare(sm, reads, ragged_right=True)
        t1 = _t()
        scal = pa._scalars(sm, ragged_left=True)
        fwd_fn, bwd_fn, bwd_exp_fn = pa._fns(prep["X"], prep["ND"],
                                             prep["C"], prep["W"])
        xf, yf = pa._device_features(sm, prep)
        Bp, A = prep["anch"].shape[:2]
        G = Bp // prep["R"]
        NDp = prep["NDp"]
        anch_d, meta_d, win3 = _bandsplit(pa, Bp, A, G, NDp)(
            jax.device_put(prep["bandmeta"]))
        basef, widthf, seedf, raggedf = pa._device_bands(NDp, A)(
            anch_d, meta_d)
        t2 = _t()
        fwd = fwd_fn(scal, win3, xf, yf, basef, widthf)
        posts, totals, trans, gapx = bwd_exp_fn(
            scal, win3, xf, yf, basef, widthf, seedf, raggedf, fwd)
        t3 = _t()
        np.asarray(totals.ravel()[:8])
        t4 = _t()
        exp = pa._reduce_expectations(sm, prep, trans, gapx, totals)
        t5 = _t()
        print(f"rep{rep}: prep={t1-t0:.3f} feat+bands={t2-t1:.3f} "
              f"dispatch={t3-t2:.3f} sync={t4-t3:.3f} reduceD2H={t5-t4:.3f} "
              f"total={t5-t0:.3f}")


def _bandsplit(pa, Bp, A, G, NDp):
    import jax
    key = ("bandsplit", Bp, A, G, NDp)
    if key not in pa._cache:
        na, nm = Bp * A * 2, Bp * 4

        def split(bm):
            anch = bm[:na].reshape(Bp, A, 2)
            meta = bm[na:na + nm].reshape(Bp, 4)
            win3 = bm[na + nm:].reshape(G, 1, NDp)
            return anch, meta, win3

        pa._cache[key] = jax.jit(split)
    return pa._cache[key]


def profile_signal():
    import jax
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.io.poremodel import load_pore_model
    from cpecan_tpu.ops.pallas_fb import StrawmanPallasAligner
    from __graft_entry__ import _synthetic_batch

    sm, reads = _synthetic_batch(n_reads=128, n_ref=905, n_events=800,
                                 seed=7)
    pa = StrawmanPallasAligner(AlignmentParams(), interpret=False, group=32)
    pa.run(sm, reads, expectations=True, ragged_left=True, ragged_right=True)
    for rep in range(3):
        t0 = _t()
        prep = pa.prepare(sm, reads, ragged_right=True)
        t1 = _t()
        scal = pa._scalars(sm, ragged_left=True)
        fwd_fn, bwd_fn, bwd_exp_fn = pa._fns(prep["X"], prep["ND"],
                                             prep["C"], prep["W"])
        xf, yf = pa._device_features(sm, prep)
        Bp, A = prep["anch"].shape[:2]
        G = Bp // prep["R"]
        NDp = prep["NDp"]
        anch_d, meta_d, win3 = _bandsplit(pa, Bp, A, G, NDp)(
            jax.device_put(prep["bandmeta"]))
        basef, widthf, seedf, raggedf = pa._device_bands(NDp, A)(
            anch_d, meta_d)
        t2 = _t()
        fwd = fwd_fn(scal, win3, xf, yf, basef, widthf)
        posts, totals, trans, gapx = bwd_exp_fn(
            scal, win3, xf, yf, basef, widthf, seedf, raggedf, fwd)
        t3 = _t()
        np.asarray(totals.ravel()[:8])
        t4 = _t()
        exp = pa._reduce_expectations(sm, prep, trans, gapx, totals)
        t5 = _t()
        print(f"rep{rep}: prep={t1-t0:.3f} feat+bands={t2-t1:.3f} "
              f"dispatch={t3-t2:.3f} sync={t4-t3:.3f} reduceD2H={t5-t4:.3f} "
              f"total={t5-t0:.3f}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "dna"
    (profile_dna if which == "dna" else profile_signal)()
