"""Experiment: does the chunk-pipelined recipe (async per-chunk D2H)
that lifted HDP 582->~1250/s also lift the DNA 5-state realign and
echelon benches, which still run one synchronous dispatch?

Run on the real TPU:  python tools/exp_chunk_family.py
"""
import os
import sys
import time

import numpy as np


def _med(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _bench(name, pa, sm, reads, compact_k, chunks, run_kw=None):
    run_kw = run_kw or {}
    # shape hint pins one kernel shape across chunk sizes
    hx = max(r[2] for r in reads)
    prep0 = pa.prepare(sm, reads)
    hint = (hx, prep0["ND"])

    def run(chunk):
        outs = []
        for i in range(0, len(reads), chunk):
            o = pa.run(sm, reads[i:i + chunk], compact_k=compact_k,
                       shape_hint=hint, **run_kw)
            for arr in o["compact"]:
                arr.copy_to_host_async()
            outs.append(o)
        return [tuple(np.asarray(a) for a in o["compact"])
                for o in outs]

    for chunk in chunks:
        run(chunk)  # compile + warm
        dt = _med(lambda: run(chunk))
        print(f"{name:12s} chunk={chunk:3d}  {dt * 1e3:7.1f} ms  "
              f"{len(reads) / dt:7.1f} aligns/s", flush=True)


def main():
    sys.path.insert(0, ".")
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import random
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.fixtures import fixture_path
    from cpecan_tpu.io.poremodel import load_pore_model
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import (StateMachine5,
                                                  StateMachineEchelon)
    from cpecan_tpu.ops.pallas_fb import (Dna5PallasAligner,
                                          EchelonPallasAligner)

    # --- DNA 5-state realign workload (bench_dna_realign shapes) ---
    rng = random.Random(11)
    reads = []
    for i in range(64):
        n = 2000
        sx = "".join(rng.choice("ACGT") for _ in range(n))
        sy = "".join(c if rng.random() > 0.12 else rng.choice("ACGT")
                     for c in sx)
        anchors = [(j, j) for j in range(40, n - 40, 50)]
        reads.append((sx, sy, n, len(sy), anchors))
    sm = StateMachine5()
    for group in (32, 64):
        pa = Dna5PallasAligner(AlignmentParams(), interpret=False,
                               group=group)
        print(f"--- dna5 group={group}")
        _bench("dna5", pa, sm, reads, 4096, (64, 32, 16),
               run_kw=dict(ragged_left=True, ragged_right=True))

    # --- echelon workload (bench_echelon shapes) ---
    nrng = np.random.default_rng(6)
    model = load_pore_model(fixture_path("template_median68pA.model"))
    mm = model.match_model
    ereads = []
    for r in range(64):
        n = 905
        ref = "".join(nrng.choice(list("ACGT"), n))
        l_x = n - 5
        kidx = seq_to_kmer_indices(ref)
        ev = np.zeros((800, 3))
        for i in range(800):
            k = kidx[min(int(i * l_x / 800), l_x - 1)]
            ev[i, 0] = mm[k, 0] + nrng.normal(0, 0.5)
            ev[i, 1] = max(mm[k, 2], 0.1)
            ev[i, 2] = 0.01
        anchors = []
        px = py = -1
        for j in range(1, 10):
            x = int(j * (l_x - 2) / 10) + 1
            y = int(j * 798 / 10) + 1
            if x > px and y > py:
                anchors.append((x, y))
                px, py = x, y
        ereads.append((ref, ev, l_x, 800, anchors))
    esm = StateMachineEchelon(model)
    for group in (32, 64):
        epa = EchelonPallasAligner(AlignmentParams(threshold=0.01),
                                   interpret=False, group=group)
        print(f"--- echelon group={group}")
        _bench("echelon", epa, esm, ereads, 4096, (64, 32, 16))


if __name__ == "__main__":
    main()
