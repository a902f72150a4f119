"""Multi-host orchestration: the jobTree/multiprocessing replacement.

The reference distributes EM with jobTree targets and filesystem reduces
(cPecanEm.py:164-210) and batch alignment with per-read process pools
(scripts/signalAlign.py:101-141).  TPU-native replacement (SURVEY §2.9,
§7.7): every host runs the same SPMD program — `jax.distributed.initialize`
joins the hosts, a global mesh spans all chips, read batches shard over the
('data',) axis (each host feeds its local shard), expectation accumulators
reduce with psum over ICI/DCN inside the jitted step, and host 0 alone
writes checkpoints and logs.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Join the multi-host job.  No-op (returns False) when single-process:
    without a coordinator address (argument or JAX_COORDINATOR_ADDRESS env)
    this does nothing, so the same program runs unmodified on one host."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_primary():
    """True on the checkpoint/log-writing host (host 0)."""
    return jax.process_index() == 0


def global_data_mesh():
    """Mesh over every chip of every host, one 'data' axis."""
    return Mesh(np.asarray(jax.devices()), ("data",))


def local_shard_bounds(n_items):
    """[start, stop) of this host's contiguous slice of an n_items batch,
    proportional to its local device count (hosts with more chips take a
    proportionally larger slice, matching the 'data' mesh layout)."""
    pid = jax.process_index()
    total = jax.device_count()
    before = sum(1 for d in jax.devices() if d.process_index < pid)
    mine = sum(1 for d in jax.devices() if d.process_index == pid)
    start = (n_items * before) // total
    stop = (n_items * (before + mine)) // total
    return start, stop


def run_isolated(items, fn, retries=1, log=print):
    """Bounded-retry bisecting work isolation — the jobTree job-retry
    semantics the reference's cluster EM inherited (SURVEY §5; the Python
    pipelines' per-read try/except, scripts/signalAlign.py:52-58).

    Runs ``fn(sub_items) -> result`` on the whole list; on failure retries
    up to ``retries`` times, then bisects and recurses, so one poisoned
    item costs O(retries * log n) re-runs instead of the batch.  A single
    item that keeps failing is skipped and reported, never fatal.

    Returns ``(results, skipped)``: results as (sub_items, fn_result)
    pairs covering every non-poisoned item exactly once, skipped as
    (item, error string) pairs.
    """
    results, skipped = [], []

    def go(sub):
        err = None
        for attempt in range(retries + 1):
            try:
                results.append((sub, fn(sub)))
                return
            except Exception as exc:  # isolation boundary: never fatal
                err = exc
                log(f"work unit of {len(sub)} failed "
                    f"(attempt {attempt + 1}/{retries + 1}): {exc}")
        if len(sub) == 1:
            skipped.append((sub[0], str(err)))
            log(f"skipping poisoned item after {retries + 1} "
                f"attempts: {err}")
        else:
            mid = len(sub) // 2
            go(sub[:mid])
            go(sub[mid:])

    items = list(items)
    if items:
        go(items)
    return results, skipped


class MultiHostEmController:
    """Thin controller for distributed signal-HMM EM.

    Each host prepares its local read shard; the jitted sharded E-step
    (parallel.mesh.sharded_align_fn with compute_expectations=True) runs on
    the global mesh so the psum inside it reduces across every chip on
    every host; the M-step normalization is replicated (identical on all
    hosts — no broadcast needed); host 0 checkpoints.
    """

    def __init__(self, checkpoint_dir=None, log=print,
                 coordinator_address=None, num_processes=None,
                 process_id=None):
        self.distributed = initialize_distributed(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        self.mesh = global_data_mesh()
        self.log = (log if is_primary() else (lambda *a, **k: None))
        self.manager = None
        self.skipped_report = []
        if checkpoint_dir is not None and is_primary():
            from ..utils.checkpoint import CheckpointManager
            self.manager = CheckpointManager(checkpoint_dir)

    def run_shards(self, shards, fn, retries=1):
        """Elastic E-step execution: run ``fn(sub_items)`` over each
        shard's items with bounded retry + poisoned-item bisection
        (run_isolated) — the per-job retry the reference's jobTree stack
        provided.  The batch always completes; skipped items accumulate
        in ``self.skipped_report`` as (item, error) pairs, so a run can
        report exactly what work was dropped.

        Returns (results, skipped) for this call; results are
        (sub_items, fn_result) pairs for the caller's merge step.
        """
        all_results, all_skipped = [], []
        for shard in shards:
            r, s = run_isolated(list(shard), fn, retries=retries,
                                log=self.log)
            all_results += r
            all_skipped += s
        if all_skipped:
            self.log(f"{len(all_skipped)} work item(s) skipped after "
                     f"{retries + 1} attempts each")
        self.skipped_report.extend(all_skipped)
        return all_results, all_skipped

    def save(self, iteration, arrays, meta=None):
        if self.manager is not None:
            self.manager.save(iteration, arrays=arrays, meta=meta)

    def restore(self):
        if self.manager is not None:
            return self.manager.restore()
        return None
