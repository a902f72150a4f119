"""Bounded block-wavefront spike (VERDICT r4 item 8): before attempting
any block decomposition of the wavefront loop, measure how much of the
per-step cost the candidate rewrite could even touch.  A block-wavefront
formulation (process K diagonals per outer iteration, batch their HBM
writes into one DMA, keep the K-step recurrence in registers) can save
at most (a) the per-step DMA ring overhead and (b) redundant emission
rebuilds — so time the production forward against trace-time ablations
that delete each wholesale (`pallas_fb._EXP_SKIP_DMA`,
`pallas_fb._EXP_CONST_EMISSIONS`).  Ablated outputs are garbage; only
the timing is meaningful.  Geometry = the 256-read strawman headline
workload at group=64, fwd only (the spike target named in BASELINE.md's
ceiling analysis).  Results are recorded in BASELINE.md
("Block-wavefront spike").

Usage: python tools/exp_block_wavefront.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:8])


def _time_fwd(pa, sm, reads, reps=3):
    import jax
    prep = pa.prepare(sm, reads)
    scal = pa._scalars(sm)
    fwd_fn, _, _ = pa._fns(prep["X"], prep["ND"], prep["C"], prep["W"])
    xf, yf = pa._device_features(sm, prep)
    basef, widthf, seedf, raggedf = pa._device_bands(
        prep["NDp"], prep["anch"].shape[1])(
        jax.device_put(prep["anch"]), jax.device_put(prep["meta"]))
    win3 = jax.device_put(prep["win"][:, None, :])

    def once():
        return fwd_fn(scal, win3, xf, yf, basef, widthf)

    _sync(once())  # compile + warm

    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        last = None
        for _ in range(reps):
            last = once()
        _sync(last)
        ts.append((time.perf_counter() - t0) / reps)
    cells = int(sum(b.width.sum() for b in prep["bands"]))
    dt = float(np.median(ts))
    return dt, cells


def main():
    from __graft_entry__ import _synthetic_batch
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.ops import pallas_fb
    from cpecan_tpu.ops.pallas_fb import StrawmanPallasAligner

    sm, reads = _synthetic_batch(n_reads=256, n_ref=905, n_events=800,
                                 seed=7)

    configs = [
        ("baseline (production fwd)", False, False),
        ("skip per-step DMA ring", True, False),
        ("const emissions", False, True),
        ("skip DMA + const emissions", True, True),
    ]
    rows = []
    for name, skip_dma, const_em in configs:
        pallas_fb._EXP_SKIP_DMA = skip_dma
        pallas_fb._EXP_CONST_EMISSIONS = const_em
        # fresh aligner: kernels are cached per-instance and the flags
        # are read at trace time
        pa = StrawmanPallasAligner(AlignmentParams(), interpret=False,
                                   group=64)
        dt, cells = _time_fwd(pa, sm, reads)
        rows.append((name, dt, cells))
        print(f"{name:32s}: {dt * 1e3:7.2f} ms  "
              f"({cells / dt:.3g} band cells/s fwd-only)", flush=True)
    pallas_fb._EXP_SKIP_DMA = False
    pallas_fb._EXP_CONST_EMISSIONS = False

    base = rows[0][1]
    print("\nheadroom a block-wavefront rewrite could recover:")
    for name, dt, _ in rows[1:]:
        print(f"  {name:30s}: {100 * (base - dt) / base:+.1f}% of fwd")


if __name__ == "__main__":
    main()
