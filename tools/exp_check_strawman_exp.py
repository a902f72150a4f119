"""Two-process TRUE-f64 verdict on marginal expectation drifts reported
by tools/tpu_differential_sweep.py (whose engine comparator silently
runs f32 on TPU — enabling x64 globally breaks Pallas kernel tracing, so
exact comparisons need two processes).

Mode "kernel" (TPU process, x64 off): replay the sweep's rng(23) draw
sequence to the requested (family, group, iteration), run the COMPILED
expectation kernels on that exact batch, dump reads + per-read
accumulators to npz.

Mode "engine" (separate process, CPU platform + x64 on): load the npz,
run the f64 scan engine on each read, report per-key worst entry-rel
(denom |w|+1e-6, the sweep's historical metric) and scale-rel
(denom |w| + 1e-3 max|w|).

Usage:
    python tools/exp_check_strawman_exp.py kernel OUT.npz [family group it]
    python tools/exp_check_strawman_exp.py engine OUT.npz
Defaults: strawman 32 0 (the r5 first marginal case).
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

FAMS = ("strawman", "vanilla", "sm4", "dna5")
MAX_L = 512


def gen_reads(target_fam, target_group, target_it):
    """Replays tpu_differential_sweep.py's shared rng(23) consumption
    through families/groups/iterations up to the target, returning the
    target iteration's batch."""
    from cpecan_tpu.fixtures import fixture_path
    from cpecan_tpu.io.poremodel import load_pore_model
    from cpecan_tpu.models.kmers import seq_to_kmer_indices

    rng = np.random.default_rng(23)
    model = load_pore_model(fixture_path("template_median68pA.model"))

    def synth_signal_read(l_x, l_y, with_anchors):
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

    for fam in FAMS:
        synth = synth_dna_read if fam == "dna5" else synth_signal_read
        for group in (32, 64):
            for it in range(10):
                nreads = int(rng.integers(1, 5))
                reads = []
                for _ in range(nreads):
                    l_x = int(rng.integers(16, MAX_L))
                    l_y = int(rng.integers(16, MAX_L - 16))
                    reads.append(synth(l_x, l_y,
                                       bool(rng.integers(0, 2))))
                if (fam, group, it) == (target_fam, target_group,
                                        target_it):
                    return reads
    raise SystemExit(f"target {target_fam} g{target_group} it{target_it} "
                     f"not reached")


def _make_sm(fam):
    from cpecan_tpu.fixtures import fixture_path
    from cpecan_tpu.io.poremodel import load_pore_model
    from cpecan_tpu.models.state_machines import (
        StateMachine3SignalStrawman, StateMachine3Vanilla, StateMachine4,
        StateMachine5)
    if fam == "dna5":
        return StateMachine5()
    model = load_pore_model(fixture_path("template_median68pA.model"))
    return {"strawman": lambda: StateMachine3SignalStrawman(model),
            "vanilla": lambda: StateMachine3Vanilla(model,
                                                    strand="template"),
            "sm4": lambda: StateMachine4(model)}[fam]()


def main():
    mode, path = sys.argv[1], sys.argv[2]
    fam = sys.argv[3] if len(sys.argv) > 3 else "strawman"
    group = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    it = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    if mode == "kernel":
        from cpecan_tpu.align import AlignmentParams
        from cpecan_tpu.ops.pallas_fb import (Dna5PallasAligner,
                                              Sm4PallasAligner,
                                              StrawmanPallasAligner,
                                              VanillaPallasAligner)
        cls = {"strawman": StrawmanPallasAligner,
               "vanilla": VanillaPallasAligner,
               "sm4": Sm4PallasAligner,
               "dna5": Dna5PallasAligner}[fam]
        reads = gen_reads(fam, group, it)
        sm = _make_sm(fam)
        pa = cls(AlignmentParams(), interpret=False, group=group)
        out = pa.run(sm, reads, expectations=True,
                     shape_hint=(MAX_L, 2 * MAX_L + 64))
        kexp = {k: np.asarray(v) for k, v in out["expectations"].items()}
        save = {f"exp_{k}": v for k, v in kexp.items()}
        for i, (ref, ev, l_x, l_y, anchors) in enumerate(reads):
            save[f"ref_{i}"] = np.frombuffer(ref.encode(), dtype=np.uint8)
            save[f"ev_{i}"] = (np.frombuffer(ev.encode(), dtype=np.uint8)
                               if isinstance(ev, str)
                               else np.asarray(ev, np.float64))
            save[f"len_{i}"] = np.array([l_x, l_y])
            save[f"anch_{i}"] = np.array(anchors, np.int64).reshape(-1, 2)
        save["n"] = np.array([len(reads)])
        save["fam"] = np.frombuffer(fam.encode(), dtype=np.uint8)
        np.savez(path, **save)
        print(f"kernel: {fam} g{group} it{it}: wrote {len(reads)} reads + "
              f"{sorted(kexp)} to {path}")
    elif mode == "engine":
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        from cpecan_tpu.align import AlignmentParams
        from cpecan_tpu.ops.band import _plan_from_windows, make_band
        from cpecan_tpu.ops.engine import backward_pass, forward_pass, \
            make_control

        z = np.load(path)
        fam = z["fam"].tobytes().decode()
        n = int(z["n"][0])
        sm = _make_sm(fam)
        params = AlignmentParams()
        worst = {}
        for i in range(n):
            ref = z[f"ref_{i}"].tobytes().decode()
            ev = z[f"ev_{i}"]
            l_x, l_y = (int(v) for v in z[f"len_{i}"])
            if fam == "dna5":
                ev = "".join("ACGT"[int(c)] for c in np.argmax(
                    np.zeros(0), axis=0)) if False else None
                raise SystemExit("dna5 replay not wired (sy is a string; "
                                 "extend save format if ever needed)")
            anchors = [tuple(a) for a in z[f"anch_{i}"]]
            band = make_band(anchors, l_x, l_y, params.diagonal_expansion)
            nd = band.n_diag
            plan = _plan_from_windows([(0, nd, nd)], False, nd)
            plan.refresh[:] = False
            plan.refresh[0] = True
            ctrl = make_control(band, plan)
            problem = sm.build(ref, ev, ((band.max_width + 7) // 8) * 8,
                               dtype=jnp.float64)
            all_fwd = forward_pass(problem, ctrl, problem.feats)
            out = backward_pass(problem, ctrl, problem.feats, all_fwd,
                                compute_expectations=True)
            wante = out["expectations"]
            keys = (set(wante)
                    & {k[4:] for k in z.files if k.startswith("exp_")}
                    ) - {"likelihood"}
            for key in sorted(keys):
                w = np.asarray(wante[key], np.float64)
                g = np.asarray(z[f"exp_{key}"][i], np.float64)
                rel = float(np.max(np.abs(g - w) / (np.abs(w) + 1e-6)))
                srel = float(np.max(
                    np.abs(g - w) / (np.abs(w)
                                     + 1e-3 * np.max(np.abs(w)) + 1e-9)))
                worst[key] = max(worst.get(key, 0.0), srel)
                print(f"read{i} {key}: entry-rel {rel:.2e} "
                      f"scale-rel {srel:.2e}")
        print("worst scale-rel per key:",
              {k: f"{v:.2e}" for k, v in sorted(worst.items())})
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
