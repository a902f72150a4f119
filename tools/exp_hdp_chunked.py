"""Experiment: HDP e2e with the headline chunked-pipelined recipe
(256 reads, chunk=64, async D2H) at group 32 vs 64.  VERDICT r3 item 5."""
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


def main():
    sys.path.insert(0, ".")
    import os
    import jax
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _synthetic_batch
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.fixtures import fixture_path
    from cpecan_tpu.hdp.nanopore_hdp import flat_hdp_model_2
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import StateMachine3Hdp
    from cpecan_tpu.io.poremodel import load_pore_model
    from cpecan_tpu.ops.pallas_fb import HdpPallasAligner

    _, reads = _synthetic_batch(n_reads=256, n_ref=905, n_events=800,
                                seed=7)
    model_path = fixture_path("template_median68pA.model")
    model = load_pore_model(model_path)
    rng = np.random.default_rng(1)
    ref_train = "".join(rng.choice(list("ACGT"), 200))
    kidx_t = seq_to_kmer_indices(ref_train)
    kmers_train = [ref_train[p:p + 6] for p in range(len(kidx_t))
                   for _ in (0, 1)]
    signals = [model.match_model[kidx_t[p], 0] + rng.normal(0, 1.0)
               for p in range(len(kidx_t)) for _ in (0, 1)]
    nhdp = flat_hdp_model_2("ACGT", 6, 1.0, 1.0, 1.0, 1.0, 30.0, 110.0,
                            120, model_path)
    nhdp.update_from_assignments(kmers_train, signals)
    nhdp.execute_gibbs_sampling(num_samples=6, burn_in=100, thinning=20)
    nhdp.finalize_distributions()
    sm = StateMachine3Hdp(nhdp)

    for group in (32, 64):
        pa = HdpPallasAligner(AlignmentParams(), interpret=False,
                              group=group)

        # --- current bench shape: one 64-read run, sync download ---
        sub = reads[:64]

        def single():
            out = pa.run(sm, sub, compact_k=2048)
            return np.asarray(out["compact"][0])

        single()
        dt = _med(single)
        print(f"group={group} single64   {dt * 1e3:7.1f} ms  "
              f"{64 / dt:7.1f} aligns/s", flush=True)

        # --- headline recipe: 256 reads, chunk=64, async D2H ---
        chunk = 64

        def chunked():
            outs = []
            for i in range(0, len(reads), chunk):
                o = pa.run(sm, reads[i:i + chunk], compact_k=2048)
                for arr in o["compact"]:
                    arr.copy_to_host_async()
                outs.append(o)
            return [tuple(np.asarray(a) for a in o["compact"])
                    for o in outs]

        chunked()
        dt = _med(chunked)
        print(f"group={group} chunk64x4  {dt * 1e3:7.1f} ms  "
              f"{256 / dt:7.1f} aligns/s", flush=True)

        # --- one big 256-read run (single density build + kernels) ---
        def big():
            out = pa.run(sm, reads, compact_k=2048)
            for arr in out["compact"]:
                arr.copy_to_host_async()
            return tuple(np.asarray(a) for a in out["compact"])

        try:
            big()
            dt = _med(big)
            print(f"group={group} big256     {dt * 1e3:7.1f} ms  "
                  f"{256 / dt:7.1f} aligns/s", flush=True)
        except Exception as e:
            print(f"group={group} big256     failed: {e!r}", flush=True)


if __name__ == "__main__":
    main()
