"""Validate the short-reference / long-event-axis shape e2e: a read with
X < 32k reference bases but > 32k events routes UNTILED (routing keys on
X), and until the r5 anchor-wire fix its int16 anchor upload silently
wrapped y (corrupting the device-rebuilt band).  Two processes, like
exp_check_strawman_exp.py:

    python tools/exp_long_events.py kernel /tmp/longev.npz   # TPU, f32
    python tools/exp_long_events.py engine /tmp/longev.npz   # CPU, f64

The kernel mode aligns a synthetic 1kb-reference / 40k-event strawman
read through the compiled fast path and dumps the compacted pair set;
the engine mode recomputes with the f64 scan engine and asserts pair
parity up to the documented near-threshold fringe (2e-3).
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import os
L_X = int(os.environ.get("LEV_X", 1000))
L_Y = int(os.environ.get("LEV_Y", 40000))


def synth_read():
    from cpecan_tpu.fixtures import fixture_path
    from cpecan_tpu.io.poremodel import load_pore_model
    from cpecan_tpu.models.kmers import seq_to_kmer_indices

    rng = np.random.default_rng(11)
    model = load_pore_model(fixture_path("template_median68pA.model"))
    ref = "".join(rng.choice(list("ACGT"), L_X + 5))
    kidx = seq_to_kmer_indices(ref)
    ev = np.zeros((L_Y, 3))
    for i in range(L_Y):
        k = kidx[min(int(i * L_X / L_Y), L_X - 1)]
        ev[i, 0] = model.match_model[k, 0] + rng.normal(0, 1.0)
        ev[i, 1] = max(model.match_model[k, 2], 0.1) + abs(rng.normal(0, .1))
        ev[i, 2] = 0.01
    # a dense monotone anchor chain along the event staircase keeps the
    # band narrow at this aspect ratio (y step ~40 per x)
    anchors = [(x, int(x * L_Y / L_X)) for x in range(20, L_X - 20, 25)]
    return ref, ev, anchors, model


def main():
    mode, path = sys.argv[1], sys.argv[2]
    ref, ev, anchors, model = synth_read()
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.models.state_machines import StateMachine3SignalStrawman
    params = AlignmentParams()
    if mode in ("kernel", "kernel-tiled"):
        from cpecan_tpu.ops.pallas_fb import (StrawmanPallasAligner,
                                              extract_pairs_auto,
                                              extract_pairs_long)
        sm = StateMachine3SignalStrawman(model)
        pa = StrawmanPallasAligner(params, interpret=False, group=8)
        if mode == "kernel-tiled":
            out = pa.run(sm, [(ref, ev, L_X, L_Y, anchors)],
                         compact_k=4096, tile_diag=2048)
            nd = out["prep"]["bands"][0].n_diag
            pairs = extract_pairs_long(out, 0, nd, params.threshold)
        else:
            out = pa.run(sm, [(ref, ev, L_X, L_Y, anchors)],
                         compact_k=4096)
            nd = out["prep"]["bands"][0].n_diag
            pairs = extract_pairs_auto(out, 0, nd, params.threshold)
        arr = np.asarray([(s, x, y) for s, x, y in pairs], np.float64)
        np.savez(path, pairs=arr)
        print(f"{mode}: ND={nd}, {len(pairs)} pairs -> {path}")
    elif mode == "engine":
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        from cpecan_tpu.constants import PAIR_ALIGNMENT_PROB_1 as P1
        from cpecan_tpu.ops.band import _plan_from_windows, make_band
        from cpecan_tpu.ops.engine import (backward_pass,
                                           extract_aligned_pairs,
                                           forward_pass, make_control)

        sm = StateMachine3SignalStrawman(model)
        band = make_band(anchors, L_X, L_Y, params.diagonal_expansion)
        nd = band.n_diag
        plan = _plan_from_windows([(0, nd, nd)], False, nd)
        plan.refresh[:] = False
        plan.refresh[0] = True
        ctrl = make_control(band, plan)
        problem = sm.build(ref, ev, ((band.max_width + 7) // 8) * 8,
                           dtype=jnp.float64)
        all_fwd = forward_pass(problem, ctrl, problem.feats)
        out = backward_pass(problem, ctrl, problem.feats, all_fwd)
        want = extract_aligned_pairs(out, params.threshold)
        z = np.load(path)
        got = [(s, int(x), int(y)) for s, x, y in z["pairs"]]
        ws = {(x, y) for _, x, y in want}
        gs = {(x, y) for _, x, y in got}
        wm = {(x, y): s for s, x, y in want}
        gm = {(x, y): s for s, x, y in got}
        fringe = ws ^ gs
        bad = [k for k in fringe
               if abs((wm.get(k) or gm.get(k)) / P1 - params.threshold)
               >= 2e-3]
        both = ws & gs
        diffs = (sorted(abs(wm[k] - gm[k]) / P1 for k in both)
                 if both else [0.0])
        devs = (sorted(abs((wm.get(k) or gm.get(k)) / P1
                           - params.threshold) for k in fringe)
                if fringe else [0.0])
        print(f"engine: ND={nd}, engine {len(ws)} vs kernel {len(gs)} "
              f"pairs, {len(fringe)} fringe, {len(bad)} beyond 2e-3; "
              f"fringe dev p99/max {np.percentile(devs, 99):.2e}"
              f"/{devs[-1]:.2e}; common score |diff| p50/p99/max "
              f"{np.percentile(diffs, 50):.2e}/"
              f"{np.percentile(diffs, 99):.2e}/{diffs[-1]:.2e}")
        if os.environ.get("LEV_NO_ASSERT"):
            return
        assert not bad, bad[:10]
        print("PASS: pair parity through the compiled path")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
