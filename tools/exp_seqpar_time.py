"""Time parallel/seqpar on the real TPU (VERDICT r4 item 7): the
x-sharded sequence-parallel formulation has exact-parity tests on a
virtual CPU mesh but had never been timed.  Measures
`seqpar_posteriors` single-device throughput (1-device mesh on the real
chip) at a few lengths, against (a) the banded Pallas fast path and
(b) the f64 scan engine, so BASELINE.md can state the crossover story
with numbers.  Also reports the relative ppermute overhead on the
8-virtual-CPU mesh (1 vs 8 shards, same host).

Usage: python tools/exp_seqpar_time.py            # TPU timings
       JAX_PLATFORMS=cpu doesn't stick (sitecustomize); the CPU-mesh
       overhead section forces the cpu backend via jax.config inside a
       subprocess instead.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def _med(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import os
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jax.sharding import Mesh

    from exp_long_read import synth_dna_pair
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.models.state_machines import StateMachine5
    from cpecan_tpu.ops.pallas_fb import Dna5PallasAligner
    from cpecan_tpu.parallel.seqpar import seqpar_posteriors

    devs = jax.devices()
    print(f"devices: {devs}", flush=True)
    mesh1 = Mesh(np.asarray(devs[:1]), ("x",))
    sm = StateMachine5()
    params = AlignmentParams()
    pa = Dna5PallasAligner(params, group=8)

    rows = []
    for L in (1000, 2000, 4000):
        rng = np.random.default_rng(7)
        sx, sy, l_x, l_y, anchors = synth_dna_pair(rng, L)

        # seqpar, banded (anchors) — the configuration its docstring
        # sells: per-shard work is the band, memory splits X-ways
        def sp():
            pairs, total = seqpar_posteriors(
                sm, sx, sy, l_x, l_y, mesh=mesh1,
                threshold=params.threshold, anchors=anchors,
                expansion=params.diagonal_expansion)
            return len(pairs)

        n_pairs = sp()
        t_sp = _med(sp)

        # seqpar, unbanded (full plane)
        def spu():
            pairs, total = seqpar_posteriors(
                sm, sx, sy, l_x, l_y, mesh=mesh1,
                threshold=params.threshold)
            return len(pairs)

        t_spu = _med(spu) if L <= 2000 else float("nan")

        # the banded Pallas fast path on the same pair
        read = (sx, sy, l_x, l_y, anchors)

        def fast():
            out = pa.run(sm, [read], compact_k=4096)
            return tuple(np.asarray(a) for a in out["compact"])

        fast()
        t_fast = _med(fast)
        band_cells = L * 2 * 60  # ~band area, for scale only
        rows.append((L, n_pairs, t_sp, t_spu, t_fast))
        print(f"L={L}: seqpar banded {t_sp*1e3:8.1f} ms, unbanded "
              f"{t_spu*1e3:8.1f} ms, pallas banded {t_fast*1e3:8.1f} ms "
              f"({n_pairs} pairs; seqpar/pallas = {t_sp/t_fast:.1f}x)", flush=True)

    print("\nsummary (median, real TPU, 1-device mesh):")
    for L, n_pairs, t_sp, t_spu, t_fast in rows:
        print(f"  L={L}: seqpar {t_sp:.3f}s vs pallas {t_fast:.3f}s "
              f"-> ratio {t_sp/t_fast:.1f}x")


if __name__ == "__main__":
    main()
