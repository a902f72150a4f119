"""Benchmark: banded signal-alignment throughput on real TPU hardware.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: a batch of Zymo-scale nanopore signal alignments (each ~900 ref
6-mers x 800 events, lastz-style anchor chain, default banding parameters)
through the strawman 3-state posterior engine — the reference's headline
workload (vanillaAlign per read, SURVEY §3.2).  The reference publishes no
numbers (BASELINE.md), so vs_baseline is the ratio against the first TPU
measurement recorded here (cells/s noted in comments as history accrues).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    sys.path.insert(0, ".")
    from __graft_entry__ import _synthetic_batch
    from cpecan_tpu.parallel.batch import BatchedAligner

    batch = 32
    n_ref = 905          # Zymo fixture scale: 899-chars ref -> ~900 kmers
    n_events = 800
    sm, reads = _synthetic_batch(n_reads=batch, n_ref=n_ref,
                                 n_events=n_events, seed=7)
    ba = BatchedAligner(strict=False)

    template, feats, xei, yei, ctrl_arrays, bands = ba.prepare(sm, reads)
    key = ("bench", template.W, ctrl_arrays["base"].shape,
           ctrl_arrays["step_d"].shape)
    fn = ba._runner(template, key)

    def run():
        out = fn(feats, ctrl_arrays, template.start, template.end,
                 template.ragged_start, template.ragged_end, xei, yei)
        # np.asarray forces a device->host transfer: block_until_ready alone
        # does not synchronize on the axon-tunnelled backend.
        return np.asarray(out["posteriors"])

    run()  # compile + warm
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps

    total_cells = int(sum(b.width.sum() for b in bands))
    cells_per_sec = total_cells / dt
    alignments_per_sec = batch / dt

    print(json.dumps({
        "metric": "banded_signal_alignments_per_sec",
        "value": round(alignments_per_sec, 3),
        "unit": f"alignments/s (batch={batch}, ~{total_cells // batch} band cells each; "
                f"{cells_per_sec:.3g} DP cells/s)",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
