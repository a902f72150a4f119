"""One-off compiled-on-TPU randomized differential campaign.

Compiled (non-interpret) kernels at production group sizes (32 and 64)
vs the exact f64 single-window scan engine, across all four pair-HMM
families on random geometries/anchors/batch sizes.  shape_hint pins one
kernel compile per (family, group).  Pair-decision sets must agree up to
the known f32-vs-f64 near-threshold fringe (same tolerance as
tests/test_fuzz_differential.py); expectation accumulators must agree to
~1e-3 rel.  Results are recorded in BASELINE.md.

Run: python tools/tpu_differential_sweep.py [iters_per_family]
"""

import sys

import numpy as np


def main():
    sys.path.insert(0, ".")
    from cpecan_tpu.fixtures import fixture_path
    import jax
    # NOTE the comparator engine runs f32 here: enabling x64 globally
    # breaks Pallas kernel tracing (type-promotion recursion), and the
    # `dtype=jnp.float64` engine build silently truncates on TPU.  The
    # true-f64 verdict for a marginal case lives in
    # tools/exp_check_strawman_exp.py (two processes: compiled kernel on
    # TPU, f64 engine on CPU) — measured worst rel 4.5e-3 on the
    # smallest kmer_gap accumulator entries, which sizes the expectation
    # tolerance below.
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.io.poremodel import load_pore_model
    from cpecan_tpu.models.state_machines import (
        StateMachine3SignalStrawman, StateMachine3Vanilla, StateMachine4,
        StateMachine5)
    from cpecan_tpu.ops.band import _plan_from_windows, make_band
    from cpecan_tpu.ops.engine import (backward_pass, extract_aligned_pairs,
                                       forward_pass, make_control)
    from cpecan_tpu.ops.pallas_fb import (Dna5PallasAligner,
                                          Sm4PallasAligner,
                                          StrawmanPallasAligner,
                                          VanillaPallasAligner,
                                          extract_pairs_auto)

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rng = np.random.default_rng(23)
    model = load_pore_model(
        fixture_path("template_median68pA.model"))

    def engine_run(sm, ref, events, l_x, l_y, anchors, params,
                   expectations=False):
        band = make_band(anchors, l_x, l_y, params.diagonal_expansion)
        n = band.n_diag
        plan = _plan_from_windows([(0, n, n)], False, n)
        plan.refresh[:] = False
        plan.refresh[0] = True
        ctrl = make_control(band, plan)
        problem = sm.build(ref, events, ((band.max_width + 7) // 8) * 8,
                           dtype=jnp.float64)
        all_fwd = forward_pass(problem, ctrl, problem.feats)
        out = backward_pass(problem, ctrl, problem.feats, all_fwd,
                            compute_expectations=expectations)
        return extract_aligned_pairs(out, params.threshold), \
            out.get("expectations")

    def synth_signal_read(l_x, l_y, with_anchors):
        from cpecan_tpu.models.kmers import seq_to_kmer_indices
        n = l_x + 5
        ref = "".join(rng.choice(list("ACGT"), n))
        kidx = seq_to_kmer_indices(ref)
        ev = np.zeros((l_y, 3))
        for i in range(l_y):
            k = kidx[min(int(i * l_x / max(l_y, 1)), l_x - 1)]
            ev[i, 0] = model.match_model[k, 0] + rng.normal(0, 1.0)
            ev[i, 1] = max(model.match_model[k, 2], 0.1) + abs(
                rng.normal(0, .1))
            ev[i, 2] = 0.01
        anchors = []
        if with_anchors and l_x > 16 and l_y > 16:
            px = py = 0
            for _ in range(int(rng.integers(1, 6))):
                x = px + 1 + int(rng.integers(0, max((l_x - px) // 2, 1)))
                y = py + 1 + int(rng.integers(0, max((l_y - py) // 2, 1)))
                if x < l_x - 1 and y < l_y - 1 and x > px and y > py:
                    anchors.append((x, y))
                    px, py = x, y
        return (ref, ev, l_x, l_y, anchors)

    def synth_dna_read(l_x, l_y, with_anchors):
        sx = "".join(rng.choice(list("ACGT"), l_x))
        sy = "".join((c if rng.random() > 0.15 else
                      str(rng.choice(list("ACGT")))) for c in sx)[:l_y]
        sy = sy + "".join(rng.choice(list("ACGT"), max(0, l_y - len(sy))))
        anchors = []
        if with_anchors and l_x > 16 and l_y > 16:
            m = min(l_x, l_y)
            anchors = [(j, j) for j in range(3, m - 3, max(m // 3, 5))]
        return (sx, sy, l_x, l_y, anchors)

    FAMS = [
        ("strawman", StrawmanPallasAligner,
         lambda: StateMachine3SignalStrawman(model), synth_signal_read,
         True),
        ("vanilla", VanillaPallasAligner,
         lambda: StateMachine3Vanilla(model, strand="template"),
         synth_signal_read, True),
        ("sm4", Sm4PallasAligner, lambda: StateMachine4(model),
         synth_signal_read, True),
        ("dna5", Dna5PallasAligner, lambda: StateMachine5(),
         synth_dna_read, True),
    ]
    MAX_L = 512
    params = AlignmentParams()
    total = fringe = 0
    exp_checked = 0
    for name, cls, mk_sm, synth, has_exp in FAMS:
        sm = mk_sm()
        for group in (32, 64):
            pa = cls(params, interpret=False, group=group)
            # one shape key for every batch of this (family, group)
            hint = (MAX_L, 2 * MAX_L + 64)
            for it in range(iters):
                nreads = int(rng.integers(1, 5))
                reads = []
                for _ in range(nreads):
                    l_x = int(rng.integers(16, MAX_L))
                    l_y = int(rng.integers(16, MAX_L - 16))
                    reads.append(synth(l_x, l_y, bool(rng.integers(0, 2))))
                # expectation runs skip posterior compaction (no "compact"
                # output), so pairs and expectations check on alternate
                # iterations.  Expectations only at group=32, the EM
                # operating point: at group=64 a ragged batch can widen
                # the per-group window union past ~500 lanes and the
                # O(NACC*R*W) VMEM accumulator ladder overflows Mosaic's
                # 16 MB scoped limit at compile time (the library now
                # raises an actionable ValueError there; every EM
                # pipeline runs group<=32 — BASELINE.md group sweep)
                want_exp = has_exp and it % 2 == 0 and group == 32
                out = pa.run(sm, reads, expectations=want_exp,
                             shape_hint=hint)
                if want_exp:
                    kexp = {k: np.asarray(v)
                            for k, v in out["expectations"].items()}
                for i, (ref, ev, l_x, l_y, anchors) in enumerate(reads):
                    total += 1
                    wantp, wante = engine_run(sm, ref, ev, l_x, l_y,
                                              anchors, params,
                                              expectations=want_exp)
                    if want_exp:
                        gotp, ws, gs = None, set(), set()
                    else:
                        nd = out["prep"]["bands"][i].n_diag
                        gotp = extract_pairs_auto(out, i, nd,
                                                  params.threshold)
                        ws = {(x, y) for _, x, y in wantp}
                        gs = {(x, y) for _, x, y in gotp}
                    if ws != gs:
                        # known fringe: f32 vs f64 disagreement only at
                        # posteriors within 2e-3 of the threshold
                        wm = {(x, y): s for s, x, y in wantp}
                        gm = {(x, y): s for s, x, y in gotp}
                        from cpecan_tpu.constants import \
                            PAIR_ALIGNMENT_PROB_1 as P1
                        ok = all(
                            abs((wm.get(k) or gm.get(k)) / P1
                                - params.threshold) < 2e-3
                            for k in ws ^ gs)
                        if not ok:
                            print(f"FAIL {name} g{group} it{it} read{i}: "
                                  f"{sorted(ws ^ gs)[:6]}")
                            sys.exit(1)
                        fringe += 1
                    if want_exp and wante is not None:
                        exp_checked += 1
                        # compare whichever accumulators both sides carry
                        # (families differ: trans/emis/kmer_gap/skip_bins)
                        keys = (set(wante) & set(kexp)) - {"likelihood"}
                        for key in sorted(keys):
                            w = np.asarray(wante[key], np.float64)
                            g = np.asarray(kexp[key][i], np.float64)
                            # a drift matters iff it is BOTH ≥1% of the
                            # entry AND ≥1e-3 of one observation: junk
                            # reads (random events, likelihood ~-1e6)
                            # produce accumulators whose entire mass is
                            # ~1e-4 expected counts, where f32's ~1e-6
                            # absolute noise is EM-irrelevant but any
                            # purely relative metric flags it.  True-f64
                            # verdicts sizing these floors:
                            # exp_check_strawman_exp.py — strawman g32
                            # it0 worst 4.5e-3 rel; sm4 g32 it8 read3
                            # "1.1e-2 rel" = 1.9e-6 absolute on a 1.8e-4
                            # count.
                            err = np.abs(g - w)
                            bad = (err > 1e-3) & \
                                  (err > 1e-2 * (np.abs(w) + 1e-9))
                            rel = np.max(err / (np.abs(w) + 1e-9))
                            if bad.any():
                                print(f"EXP FAIL {name} g{group} it{it} "
                                      f"read{i} {key}: rel {rel:.2e}")
                                sys.exit(1)
            print(f"{name} group={group}: ok ({total} cumulative reads)",
                  flush=True)
    print(f"PASS: {total} read comparisons, {fringe} near-threshold "
          f"fringe sets, {exp_checked} expectation checks")


if __name__ == "__main__":
    main()
