"""Chromosome-scale alignment experiment: the tiled long-alignment fast
path (ops/pallas_fb.py::_run_tiled) on the real TPU.

The reference's banded engine is O(band x window) memory at any length
(impl/pairwiseAligner.c:919-1055) — a well-anchored 100kb+ pair runs in
one piece.  This tool demonstrates the same capability class on the
Pallas fast path: one >=100kb DNA-5 pair and one >=100kb strawman signal
read, aligned e2e (upload -> tiled fwd/bwd -> per-chunk compaction ->
D2H -> pair extraction), reporting bases/s.

Usage: python tools/exp_long_read.py [--ref 100000] [--tile 2048]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _med(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def synth_dna_pair(rng, l_ref, sub=0.07, indel=0.05, anchor_step=64):
    """A mutated copy of a random reference plus dense exact anchors
    (every ~anchor_step bases, jittered like a lastz chain would be)."""
    x = rng.integers(0, 4, l_ref)
    keep = rng.random(l_ref) >= indel / 2          # deletions
    y_parts = []
    sub_mask = rng.random(l_ref) < sub
    y_base = np.where(sub_mask, rng.integers(0, 4, l_ref), x)
    # insertions: after ~indel/2 of positions, one random base
    ins_mask = rng.random(l_ref) < indel / 2
    pos_y = np.zeros(l_ref, np.int64)              # y coord of each kept x
    yi = 0
    for i in range(l_ref):
        if keep[i]:
            y_parts.append(y_base[i])
            pos_y[i] = yi
            yi += 1
        else:
            pos_y[i] = yi
        if ins_mask[i]:
            y_parts.append(rng.integers(0, 4))
            yi += 1
    y = np.array(y_parts)
    sx = BASES[x].tobytes().decode()
    sy = BASES[y].tobytes().decode()
    anchors, px, py = [], -1, -1
    for i in range(anchor_step, l_ref - anchor_step, anchor_step):
        j = int(pos_y[i])
        if i > px and 0 < j < len(y) - 1:
            anchors.append((i, j))
            px, py = i, j
    return sx, sy, len(sx), len(sy), anchors


def synth_signal_read(rng, l_ref, events_per_base=1.0, anchor_step=64):
    from cpecan_tpu.constants import KMER_LENGTH, NUM_OF_KMERS, MODEL_PARAMS
    from cpecan_tpu.io.poremodel import PoreModel
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import StateMachine3SignalStrawman

    model_rows = np.zeros((NUM_OF_KMERS, MODEL_PARAMS))
    model_rows[:, 0] = rng.uniform(50.0, 80.0, NUM_OF_KMERS)
    model_rows[:, 1] = rng.uniform(0.5, 1.5, NUM_OF_KMERS)
    model_rows[:, 2] = rng.uniform(0.5, 1.5, NUM_OF_KMERS)
    model_rows[:, 3] = rng.uniform(0.05, 0.2, NUM_OF_KMERS)
    model_rows[:, 4] = rng.uniform(0.5, 2.0, NUM_OF_KMERS)
    model = PoreModel(0.0, model_rows, np.full(30, 0.3), 0.0,
                      model_rows.copy())
    sm = StateMachine3SignalStrawman(model)

    ref = BASES[rng.integers(0, 4, l_ref)].tobytes().decode()
    l_x = l_ref - (KMER_LENGTH - 1)
    kidx = np.asarray(seq_to_kmer_indices(ref))
    n_events = int(l_x * events_per_base)
    src = np.minimum((np.arange(n_events) * l_x) // n_events, l_x - 1)
    k = kidx[src]
    ev = np.zeros((n_events, 3))
    ev[:, 0] = model_rows[k, 0] + rng.normal(0, 1.0, n_events)
    ev[:, 1] = np.maximum(model_rows[k, 2] + rng.normal(0, 0.1, n_events),
                          0.05)
    ev[:, 2] = 0.05
    anchors, px = [], -1
    for i in range(anchor_step, l_x - anchor_step, anchor_step):
        j = int(i * n_events / l_x)
        if i > px and 0 < j < n_events - 1:
            anchors.append((i, j))
            px = i
    return sm, (ref, ev, l_x, n_events, anchors)


def run_dna(l_ref, tile, compact_k, group):
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.models.state_machines import StateMachine5
    from cpecan_tpu.ops.pallas_fb import (Dna5PallasAligner,
                                          extract_pairs_long)

    rng = np.random.default_rng(7)
    read = synth_dna_pair(rng, l_ref)
    print(f"[dna5] l_x={read[2]} l_y={read[3]} anchors={len(read[4])}")
    sm = StateMachine5()
    params = AlignmentParams()
    pa = Dna5PallasAligner(params, group=group)

    def once():
        out = pa.run(sm, [read], compact_k=compact_k, tile_diag=tile)
        for _off, (v, *ix) in out["compact_chunks"]:
            np.asarray(v)  # force D2H sync
        return out

    t0 = time.perf_counter()
    out = once()
    t_compile = time.perf_counter() - t0
    nd = out["prep"]["bands"][0].n_diag
    pairs = extract_pairs_long(out, 0, nd, params.threshold, as_array=True)
    dt = _med(once, n=3)
    bases = read[2] + read[3]
    print(f"[dna5] NT={out['tiled']['NT']} tiles, compile+run "
          f"{t_compile:.1f}s, steady {dt:.2f}s, pairs={len(pairs)}, "
          f"{bases / dt:.0f} bases/s")
    # sanity: the extracted path must cover most of the reference
    xs = np.unique(pairs[:, 1])
    print(f"[dna5] x coverage {len(xs)}/{read[2]} "
          f"({100.0 * len(xs) / read[2]:.1f}%)")
    return bases / dt


def run_signal(l_ref, tile, compact_k, group):
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.ops.pallas_fb import (StrawmanPallasAligner,
                                          extract_pairs_long)

    rng = np.random.default_rng(11)
    sm, read = synth_signal_read(rng, l_ref)
    print(f"[strawman] l_x={read[2]} events={read[3]} "
          f"anchors={len(read[4])}")
    params = AlignmentParams()
    pa = StrawmanPallasAligner(params, group=group)

    def once():
        out = pa.run(sm, [read], compact_k=compact_k, tile_diag=tile)
        for _off, (v, *ix) in out["compact_chunks"]:
            np.asarray(v)
        return out

    t0 = time.perf_counter()
    out = once()
    t_compile = time.perf_counter() - t0
    nd = out["prep"]["bands"][0].n_diag
    pairs = extract_pairs_long(out, 0, nd, params.threshold, as_array=True)
    dt = _med(once, n=3)
    bases = read[2] + read[3]
    print(f"[strawman] NT={out['tiled']['NT']} tiles, compile+run "
          f"{t_compile:.1f}s, steady {dt:.2f}s, pairs={len(pairs)}, "
          f"{bases / dt:.0f} bases/s")
    return bases / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", type=int, default=100_000)
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--compact-k", type=int, default=2048)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--skip-signal", action="store_true")
    args = ap.parse_args()
    import jax
    print(f"devices: {jax.devices()}")
    r1 = run_dna(args.ref, args.tile, args.compact_k, args.group)
    if not args.skip_signal:
        r2 = run_signal(args.ref, args.tile, args.compact_k, args.group)
        print(f"RESULT dna5={r1:.0f} strawman={r2:.0f} bases/s")
    else:
        print(f"RESULT dna5={r1:.0f} bases/s")


if __name__ == "__main__":
    main()
