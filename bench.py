"""Benchmark: banded signal-alignment throughput on real TPU hardware.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: a batch of Zymo-scale nanopore signal alignments (each ~900 ref
6-mers x 800 events, anchor chain, default banding parameters) through the
strawman 3-state posterior engine — the reference's headline workload
(vanillaAlign per read, SURVEY §3.2).

Path: the Pallas wavefront kernel (fwd + bwd fused scans, 8 reads per
kernel instance on sublanes, x dense on lanes), band-local windowed
posterior/forward streaming, on-device feature assembly from compact
uploads, and on-device top-k posterior compaction; timing includes host
transfer of the compacted pairs.

History (this machine, TPU v5e 1 chip, batch end-to-end):
  r1 XLA-scan engine:              10.2 alignments/s
  r1 Pallas wavefront (first cut): ~93  alignments/s
  r1 + windowed streams, R=16,
     on-device assembly:           ~450 alignments/s
vs_baseline is the ratio against the first recorded TPU measurement
(10.2 aligns/s; the reference publishes no numbers — BASELINE.md).
"""

import json
import sys
import time

import numpy as np

FIRST_RECORDED = 10.2  # alignments/s, r1 XLA-scan engine on this chip


def main():
    sys.path.insert(0, ".")
    import os
    import jax
    # persistent compilation cache: repeated bench/driver runs skip the
    # 20-40s kernel compiles
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from __graft_entry__ import _synthetic_batch
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.ops.pallas_fb import StrawmanPallasAligner

    batch = 256
    sm, reads = _synthetic_batch(n_reads=batch, n_ref=905, n_events=800,
                                 seed=7)
    pa = StrawmanPallasAligner(AlignmentParams(), interpret=False, group=8)

    def run():
        out = pa.run(sm, reads, compact_k=2048)
        vals, idx = out["compact"]
        # np.asarray forces device->host sync (block_until_ready is not
        # reliable through the axon tunnel)
        return np.asarray(vals), np.asarray(idx), out

    run()  # compile + warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        vals, idx, out = run()
        times.append(time.perf_counter() - t0)
    # median rep: the tunnel to the chip stalls sporadically, which would
    # corrupt a mean
    dt = sorted(times)[len(times) // 2]

    bands = out["prep"]["bands"]
    total_cells = int(sum(b.width.sum() for b in bands))
    alignments_per_sec = batch / dt

    print(json.dumps({
        "metric": "banded_signal_alignments_per_sec",
        "value": round(alignments_per_sec, 3),
        "unit": f"alignments/s (batch={batch}, ~{total_cells // batch} band "
                f"cells each; {total_cells / dt:.3g} DP cells/s)",
        "vs_baseline": round(alignments_per_sec / FIRST_RECORDED, 2),
    }))


if __name__ == "__main__":
    main()
