"""Data-parallel E-step scaling evidence on the virtual CPU mesh.

This host has ONE physical core, so wall-clock *speedup* across virtual
devices is physically impossible to demonstrate here.  What this tool
records instead (the honest decomposition of scaling efficiency):

1. Strong scaling overhead: fixed total batch, shard width 1/2/4/8.
   On a serializing 1-core host, total wall-clock stays flat iff the
   sharded program adds no redundant work (padding waste, replicated
   compute, extra transposes).  Any sharding overhead shows up as
   wall-clock growth with width.
2. Collective payload: the ONLY cross-device traffic in the data-parallel
   E-step is the psum of the expectation accumulators (parallel/mesh.py
   reduces on device; reference merged expectation text files,
   scripts/trainModels.py:108-115).  The payload is measured from the
   pytree, and the predicted per-step collective time on a real v5e ICI
   ring is payload / ~45 GB/s.  Efficiency = compute / (compute + psum).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python tools/scaling_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main():
    from __graft_entry__ import _synthetic_batch
    from cpecan_tpu.parallel.batch import BatchedAligner
    from cpecan_tpu.parallel.mesh import make_data_mesh, sharded_align_fn

    devices = jax.devices("cpu")
    assert len(devices) >= 8, "need --xla_force_host_platform_device_count=8"

    # fixed TOTAL batch (strong scaling): per-device batch halves as the
    # mesh widens; shapes sized so the 1-core run stays under ~2 min/width
    total_reads, n_ref, n_events = 16, 320, 280
    sm, reads = _synthetic_batch(n_reads=total_reads, n_ref=n_ref,
                                 n_events=n_events, seed=3)
    ba = BatchedAligner(strict=False, compute_expectations=True)
    template, feats, xei, yei, ctrl_arrays, _ = ba.prepare(sm, reads)

    # collective payload: bytes psum-reduced per E-step
    rows = []
    payload = None
    for width in (1, 2, 4, 8):
        mesh = make_data_mesh(width, devices=devices)
        align = sharded_align_fn(template, mesh, strict=False,
                                 compute_expectations=True)
        out = align(feats, xei, yei, ctrl_arrays)  # compile + warm
        if payload is None:
            payload = sum(np.asarray(a).nbytes
                          for a in jax.tree_util.tree_leaves(
                              out["expectations"]))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = align(feats, xei, yei, ctrl_arrays)
            jax.tree_util.tree_map(
                lambda a: np.asarray(a), out["expectations"])
            np.asarray(out["totals"])
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        rows.append((width, dt, total_reads / dt))

    base = rows[0][1]
    print(f"\nStrong scaling, fixed total batch = {total_reads} reads "
          f"({n_ref} bp ref, {n_events} events), 1-core host:")
    print(f"{'width':>5} {'wall s':>8} {'reads/s':>9} {'overhead vs 1':>14}")
    for width, dt, rps in rows:
        print(f"{width:>5} {dt:>8.3f} {rps:>9.1f} {dt / base - 1:>13.1%}")

    # predicted real-hardware efficiency: per-device compute at width 8
    # vs one psum of the accumulator payload over a v5e ICI ring
    ici_gbs = 45e9          # v5e per-link ICI ~45 GB/s each direction
    psum_s = 2 * payload / ici_gbs   # reduce-scatter + all-gather ring
    comp_s = rows[0][1] / 8          # per-device share of the E-step
    eff = comp_s / (comp_s + psum_s)
    print(f"\nCollective payload (psum per E-step): {payload} bytes")
    print(f"Predicted 8-chip v5e: compute {comp_s * 1e3:.1f} ms/device-step, "
          f"psum {psum_s * 1e6:.1f} us -> efficiency {eff:.4%}")


if __name__ == "__main__":
    main()
