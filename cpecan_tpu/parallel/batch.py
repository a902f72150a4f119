"""Batched alignment: many reads through one vmapped engine invocation.

The reference fans out one OS process per read
(scripts/signalAlign.py:101-141); here a batch of reads becomes stacked
feature/control arrays padded to a shared (W, n_diag, n_steps) bucket and the
whole forward+backward engine is vmapped — the TPU-native replacement.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.band import make_band, traceback_schedule
from ..ops.engine import Control, backward_pass, forward_pass, make_control
from ..align import AlignmentParams, _round_width, _round_bucket


def _pad_tail(arr, target_len, fill):
    if arr.shape[0] == target_len:
        return arr
    pad_shape = (target_len - arr.shape[0],) + arr.shape[1:]
    return jnp.concatenate([arr, jnp.full(pad_shape, fill, arr.dtype)])


def _pad_feats_like(feats_list):
    """Stack per-read feats pytrees, padding leading dims to the max."""
    flat_list = [jax.tree_util.tree_flatten(f) for f in feats_list]
    treedef = flat_list[0][1]
    n_leaves = len(flat_list[0][0])
    stacked = []
    for i in range(n_leaves):
        leaves = [fl[0][i] for fl in flat_list]
        max_len = max(l.shape[0] for l in leaves) if leaves[0].ndim > 0 else None
        if max_len is not None:
            fill = 0.0 if jnp.issubdtype(leaves[0].dtype, jnp.floating) else 0
            leaves = [_pad_tail(l, max_len, fill) for l in leaves]
        stacked.append(jnp.stack(leaves))
    return jax.tree_util.tree_unflatten(treedef, stacked)


class BatchedAligner:
    """Compile-once, vmapped banded aligner for one state-machine family.

    Usage:
        ba = BatchedAligner(sm_builder, params)
        out = ba.run([(x_input, y_input, l_x, l_y, anchors), ...])
    """

    def __init__(self, params: AlignmentParams = None, *, strict=False,
                 dtype=jnp.float32, ragged_left=False, ragged_right=False,
                 compute_expectations=False):
        self.params = params or AlignmentParams()
        self.strict = strict
        self.dtype = dtype
        self.ragged_left = ragged_left
        self.ragged_right = ragged_right
        self.compute_expectations = compute_expectations
        self._jit_cache = {}

    def prepare(self, sm, reads):
        """reads: list of (x_input, y_input, l_x, l_y, anchors).  Returns
        (template_problem, batched feats, batched ctrl arrays, per-read
        geometry records)."""
        p = self.params
        problems, ctrls, bands = [], [], []
        W_max, n_max, s_max = 8, 1, 1
        geoms = []
        for x_in, y_in, l_x, l_y, anchors in reads:
            band = make_band(anchors, l_x, l_y, p.diagonal_expansion)
            sched = traceback_schedule(
                band, min_diags_between_traceback=p.min_diags_between_traceback,
                traceback_diagonals=p.traceback_diagonals,
                diagonal_expansion=p.diagonal_expansion,
                ragged_right_end=self.ragged_right)
            geoms.append((band, sched))
            W_max = max(W_max, band.max_width)
            n_max = max(n_max, band.n_diag)
            s_max = max(s_max, sched.n_steps)
        W = _round_width(W_max)
        n_pad = _round_bucket(n_max)
        s_pad = _round_bucket(s_max)
        for (x_in, y_in, l_x, l_y, anchors), (band, sched) in zip(reads, geoms):
            problems.append(sm.build(x_in, y_in, W, dtype=self.dtype))
            ctrls.append(make_control(band, sched, n_pad=n_pad,
                                      n_steps_pad=s_pad))
        feats = _pad_feats_like([pr.feats for pr in problems])
        if problems[0].x_elem_idx is not None:
            xei = _pad_feats_like([{"x": pr.x_elem_idx} for pr in problems])["x"]
        else:
            xei = None
        if problems[0].y_elem_idx is not None:
            yei = _pad_feats_like([{"y": pr.y_elem_idx} for pr in problems])["y"]
        else:
            yei = None
        ctrl_arrays = {
            k: jnp.stack([getattr(c, k) for c in ctrls])
            for k in ("base", "width", "step_d", "step_seed", "step_emit",
                      "step_refresh", "step_ragged")
        }
        return problems[0], feats, xei, yei, ctrl_arrays, [g[0] for g in geoms]

    def _runner(self, template, key):
        if key in self._jit_cache:
            return self._jit_cache[key]
        strict = self.strict
        ragged_left = self.ragged_left
        ce = self.compute_expectations

        def one(feats, ctrl_arrays, start, end, rs, re, xei, yei):
            prob = dataclasses.replace(template, feats=feats, start=start,
                                       end=end, ragged_start=rs, ragged_end=re,
                                       x_elem_idx=xei, y_elem_idx=yei)
            ctrl = Control(**ctrl_arrays, n_diag=0)
            all_fwd = forward_pass(prob, ctrl, feats, ragged_left=ragged_left,
                                   strict=strict)
            return backward_pass(prob, ctrl, feats, all_fwd, strict=strict,
                                 compute_expectations=ce)

        fn = jax.jit(jax.vmap(one, in_axes=(0, 0, None, None, None, None,
                                            0, 0)))
        self._jit_cache[key] = fn
        return fn

    def run(self, sm, reads):
        template, feats, xei, yei, ctrl_arrays, bands = self.prepare(sm, reads)
        key = (type(sm).__name__, template.W,
               ctrl_arrays["base"].shape, ctrl_arrays["step_d"].shape)
        fn = self._runner(template, key)
        out = fn(feats, ctrl_arrays, template.start, template.end,
                 template.ragged_start, template.ragged_end, xei, yei)
        out = dict(out)
        out["bands"] = bands
        out["problem"] = template
        return out
