"""Virtual-mesh scaling-overhead study for the data-parallel EM E-step.

Evidence for BASELINE.json's >=90% scaling-efficiency target, pending real
multi-chip hardware (this machine tunnels to ONE TPU chip).

This host also exposes ONE physical CPU core (nproc=1), so an
``xla_force_host_platform_device_count`` mesh cannot demonstrate wall-clock
speedup: all N virtual devices time-share the core, and total time at fixed
total work is expected flat.  What the study CAN measure honestly is the
*parallel overhead* of the sharded program — partitioning, shard_map
dispatch, and the psum reduce of the EM accumulators — as

    overhead(N) = T(N devices, fixed total batch) / T(1 device) - 1.

On real chips each shard runs on its own core complex, so wall-clock is
about T(1)/N * (1 + overhead); overhead <= ~10% supports the >=90% target.
The psum itself moves only the accumulator pytree (a few KB — [S,S] trans
plus emission lanes), independent of batch size, so it cannot become the
bottleneck at scale; the measured overhead is dominated by shard_map
dispatch of N partitions on one core.

Workload: the mesh E-step from ``parallel/mesh.py::sharded_align_fn``
(compute_expectations=True, strict engine, f64) — the same function the
2-process ``jax.distributed`` test runs for real (tests/test_multihost.py).

Usage: python tools/scaling_study.py [total_batch] [reps]
Prints one JSON line per device count; paste the table into BASELINE.md.
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from cpecan_tpu.align import AlignmentParams  # noqa: E402
from cpecan_tpu.io.poremodel import load_pore_model  # noqa: E402
from cpecan_tpu.models.state_machines import (  # noqa: E402
    StateMachine3SignalStrawman)
from cpecan_tpu.parallel.batch import BatchedAligner  # noqa: E402
from cpecan_tpu.parallel.mesh import (  # noqa: E402
    make_data_mesh, sharded_align_fn)
from test_parallel import _synthetic_read  # noqa: E402
from cpecan_tpu.fixtures import fixture_path


def _median(fn, reps):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    total_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    model = load_pore_model(
        fixture_path("template_median68pA.model"))
    rng = np.random.default_rng(5)
    reads = [_synthetic_read(rng, model, n_ref=220, n_events=190)
             for _ in range(total_batch)]
    sm = StateMachine3SignalStrawman(model)
    params = AlignmentParams()
    ba = BatchedAligner(params, strict=True, dtype=jnp.float64,
                        compute_expectations=True)
    template, feats, xei, yei, ctrl_arrays, _ = ba.prepare(sm, reads)

    t1 = None
    ref_trans = None
    for n_dev in (1, 2, 4, 8):
        mesh = make_data_mesh(n_dev)
        fn = sharded_align_fn(template, mesh, strict=True,
                              compute_expectations=True)

        def run():
            out = fn(feats, xei, yei, ctrl_arrays)
            return np.asarray(out["expectations"]["trans"])

        trans = run()  # compile + correctness anchor
        if ref_trans is None:
            ref_trans = trans
        else:
            np.testing.assert_allclose(trans, ref_trans, rtol=1e-9)
        dt = _median(run, reps)
        if t1 is None:
            t1 = dt
        print(json.dumps({
            "devices": n_dev,
            "total_reads": total_batch,
            "estep_wall_s": round(dt, 3),
            "reads_per_sec_1core_host": round(total_batch / dt, 2),
            "overhead_vs_1dev_pct": round(100.0 * (dt / t1 - 1.0), 1),
            "projected_real_chip_efficiency_pct":
                round(100.0 / (dt / t1), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
