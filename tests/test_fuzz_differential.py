"""Randomized differential sweep: every Pallas machine family against
the exact single-window scan engine on random geometries, anchor chains,
batch sizes, and group sizes.  A bounded version of the campaign that
caught the uninitialized diagonal-0 posterior row; pair-decision sets
must agree up to a tiny f32-vs-f64 near-threshold fringe."""

import numpy as np
import jax.numpy as jnp
import pytest
from cpecan_tpu.fixtures import fixture_path

from cpecan_tpu.align import AlignmentParams
from cpecan_tpu.io.poremodel import load_pore_model
from cpecan_tpu.models.state_machines import (StateMachine3SignalStrawman,
                                              StateMachine3Vanilla,
                                              StateMachine4, StateMachine5)
from cpecan_tpu.ops.band import _plan_from_windows, make_band
from cpecan_tpu.ops.engine import (backward_pass, extract_aligned_pairs,
                                   forward_pass, make_control)
from cpecan_tpu.ops.pallas_fb import (Dna5PallasAligner, Sm4PallasAligner,
                                      StrawmanPallasAligner,
                                      VanillaPallasAligner,
                                      extract_pairs_auto)


@pytest.mark.slow
def test_fuzz_kernels_match_engine():
    import jax
    rng = np.random.default_rng(11)
    iters = 8
    model = load_pore_model(
        fixture_path("template_median68pA.model"))



    def engine_pairs(sm, ref, events, l_x, l_y, anchors, params,
                     ragged_left=False, ragged_right=False):
        band = make_band(anchors, l_x, l_y, params.diagonal_expansion)
        n = band.n_diag
        plan = _plan_from_windows([(0, n, n)], False, n)
        plan.refresh[:] = False
        plan.refresh[0] = True
        ctrl = make_control(band, plan)
        kw = {}
        if ragged_left or ragged_right:
            kw = dict(ragged_left=ragged_left, ragged_right=ragged_right)
        problem = sm.build(ref, events, ((band.max_width + 7) // 8) * 8,
                           dtype=jnp.float64, **kw)
        all_fwd = forward_pass(problem, ctrl, problem.feats)
        out = backward_pass(problem, ctrl, problem.feats, all_fwd)
        return extract_aligned_pairs(out, params.threshold)


    def synth_signal_read(l_x, l_y, with_anchors):
        from cpecan_tpu.models.kmers import seq_to_kmer_indices
        n = l_x + 5
        ref = "".join(rng.choice(list("ACGT"), n))
        kidx = seq_to_kmer_indices(ref)
        ev = np.zeros((l_y, 3))
        for i in range(l_y):
            k = kidx[min(int(i * l_x / max(l_y, 1)), l_x - 1)]
            ev[i, 0] = model.match_model[k, 0] + rng.normal(0, 1.0)
            ev[i, 1] = max(model.match_model[k, 2], 0.1) + abs(rng.normal(0, .1))
            ev[i, 2] = 0.01
        anchors = []
        if with_anchors and l_x > 8 and l_y > 8:
            px = py = 0
            for _ in range(int(rng.integers(1, 5))):
                x = px + 1 + int(rng.integers(0, max((l_x - px) // 2, 1)))
                y = py + 1 + int(rng.integers(0, max((l_y - py) // 2, 1)))
                if x < l_x - 1 and y < l_y - 1 and x > px and y > py:
                    anchors.append((x, y)); px, py = x, y
        return (ref, ev, l_x, l_y, anchors)


    def synth_dna_read(l_x, l_y, with_anchors):
        sx = "".join(rng.choice(list("ACGT"), l_x))
        sy = "".join((c if rng.random() > 0.15 else rng.choice(list("ACGT")))
                     for c in sx)[:l_y]
        sy = sy + "".join(rng.choice(list("ACGT"), max(0, l_y - len(sy))))
        anchors = []
        if with_anchors and l_x > 8 and l_y > 8:
            m = min(l_x, l_y)
            anchors = [(j, j) for j in range(3, m - 3, max(m // 3, 5))]
        return (sx, sy, l_x, l_y, anchors)


    FAMS = [
        ("strawman", StrawmanPallasAligner,
         lambda: StateMachine3SignalStrawman(model), synth_signal_read),
        ("vanilla", VanillaPallasAligner,
         lambda: StateMachine3Vanilla(model, strand="template"),
         synth_signal_read),
        ("sm4", Sm4PallasAligner, lambda: StateMachine4(model),
         synth_signal_read),
        ("dna5", Dna5PallasAligner, lambda: StateMachine5(), synth_dna_read),
    ]

    fails = 0
    trials = 0
    for it in range(iters):
        name, cls, mk_sm, synth = FAMS[rng.integers(0, len(FAMS))]
        sm = mk_sm()
        params = AlignmentParams()
        group = int(rng.choice([8, 16]))
        ragged = False  # ragged paths are covered by the suite
        nreads = int(rng.integers(1, 4))
        reads = []
        for _ in range(nreads):
            l_x = int(rng.integers(8, 160))
            l_y = int(rng.integers(8, 150))
            reads.append(synth(l_x, l_y, bool(rng.integers(0, 2))))
        pa = cls(params, interpret=True, group=group)
        out = pa.run(sm, reads, ragged_left=ragged, ragged_right=ragged)
        out = {k: (tuple(np.asarray(a) for a in v) if isinstance(v, tuple)
                   else v) for k, v in out.items()}
        out["posteriors"] = np.asarray(out["posteriors"])
        for i, (ref, ev, l_x, l_y, anchors) in enumerate(reads):
            trials += 1
            want = engine_pairs(sm, ref, ev, l_x, l_y, anchors, params,
                                ragged_left=ragged, ragged_right=ragged)
            got = extract_pairs_auto(out, i, l_x + l_y, params.threshold)
            ws = {(x, y) for _, x, y in want}
            gs = {(x, y) for _, x, y in got}
            sym = len(ws ^ gs)
            # f32 kernel vs f64 engine: allow a tiny near-threshold fringe
            tol = max(2, int(0.01 * max(len(ws), 1)))
            if sym > tol:
                fails += 1
                print(f"MISMATCH it={it} fam={name} read={i} lx={l_x} ly={l_y} "
                      f"g={group} ragged={ragged} anchors={len(anchors)} "
                      f"|want|={len(ws)} |got|={len(gs)} sym={sym}")
                print("  only_want:", sorted(ws - gs)[:6])
                print("  only_got:", sorted(gs - ws)[:6])
    assert fails == 0, f"{fails} of {trials} failed"
