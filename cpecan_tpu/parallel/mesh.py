"""Multi-chip execution: data-parallel read sharding over a device mesh.

The reference's distribution story is per-read process fan-out plus
filesystem reduces (SURVEY §2.9).  TPU-native replacement: reads are sharded
over a ``('data',)`` mesh axis with `shard_map`, model parameters are
replicated, and EM expectation accumulators are reduced on-device with
``jax.lax.psum`` (riding ICI instead of text files).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.engine import Control, backward_pass, forward_pass


def make_data_mesh(n_devices=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def sharded_align_fn(template, mesh, *, strict=False, ragged_left=False,
                     compute_expectations=False):
    """Returns a jitted function over batched (feats, xei, yei, ctrl_arrays)
    whose leading (read) axis is sharded over the mesh's 'data' axis.

    With ``compute_expectations`` the per-shard accumulators are psum-reduced
    across the mesh — the TPU-native version of the reference's
    expectation-file merge (scripts/trainModels.py:108-115).
    """

    def one(feats, xei, yei, ctrl_arrays):
        prob = dataclasses.replace(template, feats=feats, x_elem_idx=xei,
                                   y_elem_idx=yei)
        ctrl = Control(**ctrl_arrays, n_diag=0)
        all_fwd = forward_pass(prob, ctrl, feats, ragged_left=ragged_left,
                               strict=strict)
        return backward_pass(prob, ctrl, feats, all_fwd, strict=strict,
                             compute_expectations=compute_expectations)

    vmapped = jax.vmap(one)

    def shard_fn(feats, xei, yei, ctrl_arrays):
        out = vmapped(feats, xei, yei, ctrl_arrays)
        if compute_expectations:
            # reduce EM counts across data shards (replicated result)
            exp = out.pop("expectations")
            exp = jax.tree_util.tree_map(
                lambda a: jax.lax.psum(jnp.sum(a, axis=0), "data"), exp)
            out["expectations"] = exp
        return out

    in_spec = (P("data"), P("data"), P("data"), P("data"))

    def wrapped(feats, xei, yei, ctrl_arrays):
        per_read_spec = P("data")
        specs = dict(posteriors=per_read_spec, totals=per_read_spec,
                     step_d=per_read_spec, step_base=per_read_spec)
        if compute_expectations:
            specs["expectations"] = P()  # replicated after psum
        fn = shard_map(shard_fn, mesh=mesh,
                       in_specs=in_spec,
                       out_specs=specs, check_vma=False)
        return fn(feats, xei, yei, ctrl_arrays)

    return jax.jit(wrapped)
