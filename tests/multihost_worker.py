"""Worker process for the real 2-process jax.distributed EM test.

Launched by tests/test_multihost.py as
``python tests/multihost_worker.py <process_id> <num_processes> <port> <dir>``.
Each process brings 2 local virtual CPU devices, joins the coordinator,
runs one distributed E-step (expectation psum over the global 4-device
mesh, each host feeding its own shard of the read batch), writes its view
of the reduced model to ``result_<pid>.npz``, and checkpoints through the
MultiHostEmController (which must write on host 0 only).

This mirrors the reference's run-the-real-thing distribution testing
(cPecanEmTest.py:56-113 runs the actual jobTree EM locally).
"""

import os
import sys

# `python tests/multihost_worker.py` puts tests/ (not the repo root) on
# sys.path; don't depend on the parent shell exporting PYTHONPATH
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 2 local devices per process BEFORE importing jax
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
from cpecan_tpu.fixtures import fixture_path


def main():
    process_id, num_processes, port, out_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.io.poremodel import load_pore_model
    from cpecan_tpu.models.state_machines import StateMachine3SignalStrawman
    from cpecan_tpu.parallel.batch import BatchedAligner
    from cpecan_tpu.parallel.mesh import sharded_align_fn
    from cpecan_tpu.parallel.multihost import (MultiHostEmController,
                                               is_primary,
                                               local_shard_bounds)
    from tests.test_parallel import _synthetic_read

    controller = MultiHostEmController(
        checkpoint_dir=os.path.join(out_dir, "ckpt"),
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes, process_id=process_id)
    assert controller.distributed, "jax.distributed must really initialize"
    assert jax.process_count() == num_processes
    assert jax.device_count() == 2 * num_processes
    assert is_primary() == (process_id == 0)

    # identical global batch on every host (deterministic seed); each host
    # feeds only its local shard, like each jobTree node sees its own
    # alignment shard
    model = load_pore_model(
        fixture_path("template_median68pA.model"))
    rng = np.random.default_rng(5)
    reads = [_synthetic_read(rng, model, n_ref=60, n_events=50)
             for _ in range(4)]

    sm = StateMachine3SignalStrawman(model)
    params = AlignmentParams()
    ba = BatchedAligner(params, strict=True, dtype=jnp.float64,
                        compute_expectations=True)
    template, feats, xei, yei, ctrl_arrays, _bands = ba.prepare(sm, reads)

    mesh = controller.mesh
    start, stop = local_shard_bounds(len(reads))
    sharding = NamedSharding(mesh, P("data"))

    def to_global(a):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(a)[start:stop])

    feats, xei, yei, ctrl_arrays = jax.tree_util.tree_map(
        to_global, (feats, xei, yei, ctrl_arrays))

    fn = sharded_align_fn(template, mesh, strict=True,
                          compute_expectations=True)
    out = fn(feats, xei, yei, ctrl_arrays)
    exp = {k: np.asarray(v) for k, v in out["expectations"].items()}

    # M-step is replicated: every host normalizes the same reduced counts
    trans = exp["trans"] / exp["trans"].sum(axis=1, keepdims=True)
    np.savez(os.path.join(out_dir, f"result_{process_id}.npz"),
             trans=trans, likelihood=exp["likelihood"],
             raw_trans=exp["trans"])
    # every host calls save; the controller must only write on host 0
    # (the "writer" meta records who actually wrote)
    controller.save(0, arrays={"trans": trans},
                    meta={"likelihood": float(exp["likelihood"]),
                          "writer": process_id})
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
