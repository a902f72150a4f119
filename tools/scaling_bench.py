"""Data-parallel E-step scaling evidence on the virtual CPU mesh.

This host has ONE physical core, so wall-clock *speedup* across virtual
devices is physically impossible to demonstrate here.  What this tool
records instead (the honest decomposition of scaling efficiency):

1. Strong scaling overhead: fixed total batch, shard width 1/2/4/8.
   On a serializing 1-core host, total wall-clock stays flat iff the
   sharded program adds no redundant work (padding waste, replicated
   compute, extra transposes).  Any sharding overhead shows up as
   wall-clock growth with width.  Reported as median ± spread over
   REPS timed runs per width (single numbers on this box sit inside
   their own ~±20% noise).
2. Collective payload: the ONLY cross-device traffic in the data-parallel
   E-step is the psum of the expectation accumulators (parallel/mesh.py
   reduces on device; reference merged expectation text files,
   scripts/trainModels.py:108-115).  The payload is measured from the
   pytree, and the predicted per-step collective time on a real v5e ICI
   ring is payload / ~45 GB/s.  Efficiency = compute / (compute + psum).

Both engines are measured: the XLA-scan engine (parallel/mesh.py
sharded_align_fn) and, since r4, the production Pallas fast path
(run(mesh=...), interpret mode on CPU) whose psum payload is the
already-reduced accumulator pytree — smaller still.

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
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

REPS = 5


def _timed(fn, sync):
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(fn())
        times.append(time.perf_counter() - t0)
    times = sorted(times)
    med = float(np.median(times))
    return med, times[0], times[-1]


def _print_rows(title, total_reads, rows):
    base = rows[0][1]
    print(f"\n{title} (fixed total batch = {total_reads} reads, "
          f"median of {REPS} [min..max], 1-core host):")
    print(f"{'width':>5} {'median s':>9} {'min':>7} {'max':>7} "
          f"{'reads/s':>8} {'overhead vs 1':>14}")
    for width, med, lo, hi, rps in rows:
        print(f"{width:>5} {med:>9.3f} {lo:>7.3f} {hi:>7.3f} "
              f"{rps:>8.1f} {med / base - 1:>13.1%}")


def bench_engine(devices):
    from __graft_entry__ import _synthetic_batch
    from cpecan_tpu.parallel.batch import BatchedAligner
    from cpecan_tpu.parallel.mesh import make_data_mesh, sharded_align_fn

    total_reads, n_ref, n_events = 16, 320, 280
    sm, reads = _synthetic_batch(n_reads=total_reads, n_ref=n_ref,
                                 n_events=n_events, seed=3)
    ba = BatchedAligner(strict=False, compute_expectations=True)
    template, feats, xei, yei, ctrl_arrays, _ = ba.prepare(sm, reads)

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

        def sync(out):
            jax.tree_util.tree_map(lambda a: np.asarray(a),
                                   out["expectations"])
            np.asarray(out["totals"])

        med, lo, hi = _timed(
            lambda: align(feats, xei, yei, ctrl_arrays), sync)
        rows.append((width, med, lo, hi, total_reads / med))

    _print_rows(f"[scan engine] strong scaling ({n_ref} bp ref, "
                f"{n_events} events)", total_reads, rows)
    return rows, payload


def bench_pallas(devices):
    """The r4 fast path on the mesh: run(mesh=...) with psum-reduced
    in-kernel EM accumulators (interpret mode on CPU — relative widths
    are what matters on this 1-core host)."""
    from jax.sharding import Mesh

    from __graft_entry__ import _synthetic_batch
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.ops.pallas_fb import StrawmanPallasAligner

    total_reads, n_ref, n_events = 16, 160, 140
    sm, reads = _synthetic_batch(n_reads=total_reads, n_ref=n_ref,
                                 n_events=n_events, seed=3)
    pa = StrawmanPallasAligner(AlignmentParams(), interpret=True, group=2)

    rows = []
    payload = None
    for width in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(devices[:width]), ("data",))
        out = pa.run(sm, reads, ragged_left=True, ragged_right=True,
                     expectations=True, mesh=mesh)  # compile + warm
        if payload is None:
            payload = sum(np.asarray(a).nbytes
                          for a in jax.tree_util.tree_leaves(
                              out["expectations_reduced"]))

        def sync(out):
            jax.tree_util.tree_map(lambda a: np.asarray(a),
                                   out["expectations_reduced"])

        med, lo, hi = _timed(
            lambda: pa.run(sm, reads, ragged_left=True, ragged_right=True,
                           expectations=True, mesh=mesh), sync)
        rows.append((width, med, lo, hi, total_reads / med))

    _print_rows(f"[pallas fast path] strong scaling ({n_ref} bp ref, "
                f"{n_events} events, interpret)", total_reads, rows)
    return rows, payload


def main():
    devices = jax.devices("cpu")
    assert len(devices) >= 8, "need --xla_force_host_platform_device_count=8"

    engine_rows, engine_payload = bench_engine(devices)
    pallas_rows, pallas_payload = bench_pallas(devices)

    # predicted real-hardware efficiency: per-device compute at width 8
    # vs one psum of the accumulator payload over a v5e ICI ring
    ici_gbs = 45e9          # v5e per-link ICI ~45 GB/s each direction
    for name, rows, payload, dev_comp_s in (
            ("scan engine", engine_rows, engine_payload,
             engine_rows[0][1] / 8),
            # the pallas kernels run ~80x faster compiled on the TPU than
            # interpret-mode here; use the measured TPU E-step share
            # (bench.py signal_em_estep: 128 reads / ~0.14 s -> ~17 ms
            # per 16-read device share) as the compute term
            ("pallas fast path (TPU-compiled compute term)", pallas_rows,
             pallas_payload, 0.017)):
        psum_s = 2 * payload / ici_gbs   # reduce-scatter + all-gather ring
        eff = dev_comp_s / (dev_comp_s + psum_s)
        print(f"\n[{name}] psum payload {payload} bytes/step, "
              f"compute {dev_comp_s * 1e3:.1f} ms/device-step, "
              f"psum {psum_s * 1e6:.1f} us -> efficiency {eff:.4%}")


if __name__ == "__main__":
    main()
