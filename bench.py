"""Benchmarks on real TPU hardware: one JSON line per metric.

Headline: banded signal-alignment throughput, batch end-to-end including
the compacted-pair transfer (the reference's per-read vanillaAlign
workload, SURVEY §3.2).  The batch is dispatched in chunks so host prep,
H2D, kernels, and D2H of different chunks overlap (JAX async dispatch);
one sync at the end.

Also emitted (BASELINE.md metric suite):
  device_banded_cells_per_sec   — kernel-only (fwd+bwd on resident data)
  dna_realign_alignments_per_sec — 5-state DNA batch (cPecanRealign)
  dna_em_estep_alignments_per_sec — cPecanEm E-step on the kernel
  signal_em_estep_reads_per_sec  — trainModels E-step on the kernel
  msa_pairwise_alignments_per_sec — makeAlignment rounds on the kernel
  hdp_alignments_per_sec         — HDP-emission alignment (streamed)

History (this machine, TPU v5e 1 chip, headline batch e2e):
  r1 XLA-scan engine:              10.2 alignments/s
  r1 Pallas wavefront (first cut): ~93  alignments/s
  r1 + windowed streams,
     on-device assembly:           ~450-520 alignments/s
  r2 + device-built bands, hierarchical exact top-k, chunk pipelining
  r2 + group=32 packing (band-local kernels amortize per-step fixed
     cost over 4x reads): device 4.84e8 -> 8.04e8 cells/s
  r3 + quantized wire formats (-36% tunnel bytes), chunk=64 with
     async per-chunk D2H:            ~965 -> ~1470 alignments/s
  r4 headline steady (~1270-1470, tunnel noise); the chunked recipe
     spread to every family — HDP 582 -> ~1030-1250, vanilla ~1050 ->
     ~1320, fourState ~1240 -> ~1380, dna realign 416 -> ~534 (x32),
     echelon 302 -> ~408 (x32); echelon joined the fast pipeline
     (signal_pipeline_echelon_reads_per_sec)
  r5 headline latency-floored (~1250-1300 on a ~15-20% slower tunnel
     day; device kernels are ~32 ms of a ~235 ms batch median, so the
     packed compact-pair wire (-128 KB/batch) sits below the tunnel
     noise — BASELINE.md "Round-5 deltas").  New: 100kb single
     alignments through the tiled fast path (long_read_bases_per_sec,
     both dna5 and strawman ~40k bases/s); MSA workload doubled to
     32x1kb with the native greedy column build (~19-25 jobs/s)
vs_baseline is the ratio against the first recorded TPU measurement
(10.2 aligns/s; the reference publishes no numbers — BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np
from cpecan_tpu.fixtures import fixture_path

FIRST_RECORDED = 10.2  # alignments/s, r1 XLA-scan engine on this chip


def _sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:8])


def _median_time(fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def _emit(metric, value, unit, baseline=None):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(value / baseline, 2) if baseline else 1.0,
    }), flush=True)


def bench_headline(sm, reads, pa):
    """Chunked, pipelined batch: dispatch every chunk, start its D2H
    asynchronously (copy_to_host_async), materialize at the end — chunk
    k's pair download rides under chunk k+1's host prep and kernels.
    chunk=64 / compact_k=1024 measured best on this tunnel (no top-k
    saturation at Zymo scale; the auto-extractor falls back if one
    occurs)."""
    chunk = 64

    def run():
        outs = []
        for i in range(0, len(reads), chunk):
            o = pa.run(sm, reads[i:i + chunk], compact_k=1024)
            for arr in o["compact"]:
                arr.copy_to_host_async()
            outs.append(o)
        return [tuple(np.asarray(a) for a in o["compact"])
                for o in outs], outs

    _, outs = run()  # compile + warm
    dt = _median_time(lambda: run(), reps=5)
    total_cells = sum(int(sum(b.width.sum() for b in o["prep"]["bands"]))
                      for o in outs)
    rate = len(reads) / dt
    _emit("banded_signal_alignments_per_sec", rate,
          f"alignments/s (batch={len(reads)}, chunked x{chunk}, "
          f"{total_cells / dt:.3g} DP cells/s e2e)", FIRST_RECORDED)
    return outs


def bench_device_only(sm, reads, pa):
    """Kernel-only throughput: fwd+bwd reruns on resident inputs."""
    import jax
    prep = pa.prepare(sm, reads)
    scal = pa._scalars(sm)
    fwd_fn, bwd_fn, _ = pa._fns(prep["X"], prep["ND"], prep["C"], prep["W"])
    xf, yf = pa._device_features(sm, prep)
    basef, widthf, seedf, raggedf = pa._device_bands(
        prep["NDp"], prep["anch"].shape[1])(
        jax.device_put(prep["anch"]), jax.device_put(prep["meta"]))
    win3 = jax.device_put(prep["win"][:, None, :])

    def once():
        fwd = fwd_fn(scal, win3, xf, yf, basef, widthf)
        posts, totals = bwd_fn(scal, win3, xf, yf, basef, widthf, seedf,
                               raggedf, fwd)
        return posts

    _sync(once())
    reps = 3

    def run():
        last = None
        for _ in range(reps):
            last = once()
        _sync(last)

    dt = _median_time(run) / reps
    cells = int(sum(b.width.sum() for b in prep["bands"]))
    _emit("device_banded_cells_per_sec", cells / dt,
          f"DP band cells/s, fwd+bwd kernels only (batch={len(reads)})")


def bench_long_read():
    """Chromosome-scale single alignment through the tiled fast path
    (ops/pallas_fb.py::_run_tiled): one 100kb well-anchored DNA pair,
    e2e (upload -> tiled fwd/bwd sweeps with per-tile log re-centering
    -> per-chunk compaction -> D2H -> extraction).  The reference's
    banded engine runs any length at O(band x window) memory
    (impl/pairwiseAligner.c:919-1055); this is the TPU equivalent."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from exp_long_read import synth_dna_pair
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.models.state_machines import StateMachine5
    from cpecan_tpu.ops.pallas_fb import (Dna5PallasAligner,
                                          extract_pairs_long)

    rng = np.random.default_rng(7)
    read = synth_dna_pair(rng, 100_000)
    sm = StateMachine5()
    params = AlignmentParams()
    pa = Dna5PallasAligner(params, group=8)

    def run():
        out = pa.run(sm, [read], compact_k=2048, tile_diag=2048)
        for _off, comp in out["compact_chunks"]:
            for a in comp:
                a.copy_to_host_async()
        nd = out["prep"]["bands"][0].n_diag
        return extract_pairs_long(out, 0, nd, params.threshold,
                                  as_array=True)

    pairs = run()
    n_x = len(np.unique(pairs[:, 1]))
    assert n_x >= 0.98 * read[2], (n_x, read[2])  # full-length coverage
    dt = _median_time(run)
    _emit("long_read_bases_per_sec", (read[2] + read[3]) / dt,
          "bases/s (one 100kb DNA pair, tiled fast path, e2e incl. "
          "extraction)")


def bench_dna_realign():
    import random

    import jax
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.models.state_machines import StateMachine5
    from cpecan_tpu.ops.pallas_fb import Dna5PallasAligner

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
    pa = Dna5PallasAligner(AlignmentParams(), interpret=False)
    # r4: chunk=32 with async per-chunk D2H (tools/exp_chunk_family.py:
    # 437 vs 278 aligns/s at one 64-read dispatch, group=32; group=64
    # regressed on 32-read chunks — half the group rows pad)
    chunk = 32
    hint = (max(r[2] for r in reads), pa.prepare(sm, reads)["ND"])

    def run():
        outs = []
        for i in range(0, len(reads), chunk):
            o = pa.run(sm, reads[i:i + chunk], ragged_left=True,
                       ragged_right=True, compact_k=4096, shape_hint=hint)
            o["compact"][0].copy_to_host_async()
            outs.append(o)
        return [np.asarray(o["compact"][0]) for o in outs]

    run()
    dt = _median_time(run)
    _emit("dna_realign_alignments_per_sec", len(reads) / dt,
          f"alignments/s (2kb pairs, 5-state DNA, cPecanRealign workload, "
          f"chunked x{chunk})")


def bench_dna_em():
    import random

    from cpecan_tpu.io.cigar import parse_cigar_line
    from cpecan_tpu.ops.pallas_fb import Dna5PallasAligner
    from cpecan_tpu.pipeline.em import (EmOptions,
                                        calculate_expectations_pallas,
                                        PipelineHmm, _shard_alignments)

    rng = random.Random(3)
    seqs = {}
    alns = []
    # 128 x 1kb pairs = 4 kernel chunks: the reference's cPecanEm samples
    # up to 50Mbp per iteration (maxAlignmentLengthToSample), so the
    # steady-state chunked E-step — deferred D2H of chunk k overlapping
    # chunk k+1's kernels — is the workload that matters, not a single
    # latency-bound launch
    for i in range(128):
        sx = "".join(rng.choice("ACGT") for _ in range(1000))
        sy = "".join(c if rng.random() > 0.12 else rng.choice("ACGT")
                     for c in sx)
        seqs[f"x{i}"] = sx
        seqs[f"y{i}"] = sy
        alns.append(parse_cigar_line(
            f"cigar: y{i} 0 {len(sy)} + x{i} 0 1000 + 0 M 1000"))
    options = EmOptions(train_emissions=True)
    hmm = PipelineHmm("fiveState")
    hmm.equalise()
    sm = hmm.to_state_machine()
    shards = _shard_alignments(alns, options, rng)
    # r3: the exp backward is band-local (page-ladder accumulators), so
    # EM runs at the full posterior-path group size
    pa = Dna5PallasAligner(options.realign_params, interpret=False,
                          group=32)
    calculate_expectations_pallas(shards, seqs, sm, options.realign_params,
                                  pa)
    dt = _median_time(lambda: calculate_expectations_pallas(
        shards, seqs, sm, options.realign_params, pa))
    _emit("dna_em_estep_alignments_per_sec", len(alns) / dt,
          "alignments/s (1kb pairs, cPecanEm E-step, in-kernel "
          "expectations)")


def bench_signal_em(sm, reads):
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.ops.pallas_fb import StrawmanPallasAligner

    pa = StrawmanPallasAligner(AlignmentParams(), interpret=False,
                               group=32)
    sub = reads[:128]

    def run():
        out = pa.run(sm, sub, expectations=True, ragged_left=True,
                     ragged_right=True)
        return out["expectations"]["trans"]

    run()
    dt = _median_time(run)
    _emit("signal_em_estep_reads_per_sec", len(sub) / dt,
          "reads/s (trainModels E-step, in-kernel trans+kmer-gap "
          "accumulators)")


def bench_family(name, cls, sm, reads, group=64, compact_k=1024):
    """Chunked batch e2e for one spec family on the strawman workload —
    same r3 recipe as the headline path: group=64 posterior packing,
    chunk=64 with async per-chunk D2H (chunk k's pair download rides
    under chunk k+1's host prep and kernels)."""
    from cpecan_tpu.align import AlignmentParams

    pa = cls(AlignmentParams(), interpret=False, group=group)
    chunk = 64

    def run():
        outs = []
        for i in range(0, len(reads), chunk):
            o = pa.run(sm, reads[i:i + chunk], compact_k=compact_k)
            for arr in o["compact"]:
                arr.copy_to_host_async()
            outs.append(o)
        return [np.asarray(o["compact"][0]) for o in outs]

    run()
    dt = _median_time(run)
    _emit(f"{name}_alignments_per_sec", len(reads) / dt,
          f"alignments/s (batch={len(reads)}, chunked x{chunk}, "
          f"group={group}, async D2H)")


def bench_vanilla_and_sm4(reads):
    from cpecan_tpu.io.poremodel import load_pore_model
    from cpecan_tpu.models.state_machines import (StateMachine3Vanilla,
                                                  StateMachine4)
    from cpecan_tpu.ops.pallas_fb import (Sm4PallasAligner,
                                          VanillaPallasAligner)

    try:
        model = load_pore_model(
            fixture_path("template_median68pA.model"))
    except OSError:
        return
    bench_family("vanilla", VanillaPallasAligner,
                 StateMachine3Vanilla(model, strand="template"), reads)
    bench_family("four_state", Sm4PallasAligner, StateMachine4(model),
                 reads)


def bench_echelon():
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.io.poremodel import load_pore_model
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.models.state_machines import StateMachineEchelon
    from cpecan_tpu.ops.pallas_fb import EchelonPallasAligner

    try:
        model = load_pore_model(
            fixture_path("template_median68pA.model"))
    except OSError:
        return
    rng = np.random.default_rng(6)
    mm = model.match_model
    reads = []
    for r in range(64):
        n = 905
        ref = "".join(rng.choice(list("ACGT"), n))
        l_x = n - 5
        kidx = seq_to_kmer_indices(ref)
        ev = np.zeros((800, 3))
        for i in range(800):
            k = kidx[min(int(i * l_x / 800), l_x - 1)]
            ev[i, 0] = mm[k, 0] + rng.normal(0, 0.5)
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
        reads.append((ref, ev, l_x, 800, anchors))
    sm = StateMachineEchelon(model)
    # r3: default operating point (threshold .01, the reference default —
    # impl/pairwiseAligner.c:1477-1490) so the metric is comparable with
    # every other family; compact_k=4096 keeps the multi-state top-k from
    # saturating at this threshold
    pa = EchelonPallasAligner(AlignmentParams(threshold=0.01),
                              interpret=False, group=32)
    # r4: chunk=32 with async per-chunk D2H (tools/exp_chunk_family.py:
    # 315 vs 238 aligns/s at one 64-read dispatch)
    chunk = 32
    hint = (max(r[2] for r in reads), pa.prepare(sm, reads)["ND"])

    def run():
        outs = []
        for i in range(0, len(reads), chunk):
            o = pa.run(sm, reads[i:i + chunk], compact_k=4096,
                       shape_hint=hint)
            o["compact"][0].copy_to_host_async()
            outs.append(o)
        return [np.asarray(o["compact"][0]) for o in outs]

    run()
    dt = _median_time(run)
    _emit("echelon_alignments_per_sec", len(reads) / dt,
          "alignments/s (7-state multi-kmer echelon, multi-state "
          f"posterior windows, chunked x{chunk})")


def bench_signal_pipeline():
    """Full signalAlign pipeline e2e (the reference's actual end-user
    driver, scripts/signalAlign.py:101-141): npRead parse -> guide anchors
    -> both strands through the kernels -> 15-column posterior tsvs."""
    import os
    import shutil
    import tempfile

    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.io.guide import exonerated_lastz
    from cpecan_tpu.io.npread import load_npread
    from cpecan_tpu.ops.pallas_fb import StrawmanPallasAligner
    from cpecan_tpu.pipeline.signal_align_batch import run_batch_fast

    REF = fixture_path("ZymoRef.txt")
    NPREAD = fixture_path("ZymoC_ch_1_file1.npRead")
    TMODEL = fixture_path("template_median68pA.model")
    CMODEL = fixture_path("complement_median68pA_pop2.model")
    if not os.path.exists(NPREAD):
        return
    n_reads = 64
    tmpdir = tempfile.mkdtemp()
    try:
        np_read = load_npread(NPREAD)
        with open(REF) as fh:
            ref_seq = fh.readline().strip()
        ref_fa = os.path.join(tmpdir, "ref.fa")
        with open(ref_fa, "w") as fh:
            fh.write(">ZymoRef\n" + ref_seq + "\n")
        read_fa = os.path.join(tmpdir, "read.fa")
        with open(read_fa, "w") as fh:
            fh.write(">r\n" + np_read.twod_read + "\n")
        guide0, _ = exonerated_lastz(ref_fa, read_fa)
        gf = guide0.split()
        pairs = []
        for i in range(n_reads):
            label = f"read{i:03d}"
            dst = os.path.join(tmpdir, label + ".npRead")
            shutil.copy(NPREAD, dst)
            pairs.append((dst, " ".join([gf[0], label] + gf[2:])))
        out_dir = os.path.join(tmpdir, "out")
        pa = StrawmanPallasAligner(AlignmentParams(), interpret=False,
                                   group=32)

        def run():
            # r4.2: drain extraction is one vectorized pass per chunk
            # (extract_pairs_chunk) and per-target tsv columns are cached,
            # so bigger chunks win — chunk=64/compact_k=2048 measured
            # ~250 reads/s vs 130 for the old chunk=32/k=4096 recipe
            # (k=1024 measured ~267 but sits 6% under Zymo's ~963
            # pairs/strand; 2048 keeps 2x saturation headroom)
            return run_batch_fast(REF, pairs, out_dir,
                                  template_model_file=TMODEL,
                                  complement_model_file=CMODEL,
                                  log=lambda m: None, aligner=pa,
                                  chunk=64, compact_k=2048)

        res = run()
        assert len(res) == n_reads
        dt = _median_time(run)
        _emit("signal_pipeline_reads_per_sec", n_reads / dt,
              "reads/s (fast5-less signalAlign pipeline: npRead parse + "
              "guide anchors + both strands + posterior tsvs)")

        # echelon through the same fast driver (r4: the last machine to
        # join run_batch_fast; multi-state extraction dominates its host
        # side, so it gets its own metric rather than skewing the
        # threeState one)
        from cpecan_tpu.ops.pallas_fb import EchelonPallasAligner
        e_pairs = pairs[:32]
        e_out = os.path.join(tmpdir, "out_echelon")
        pa_e = EchelonPallasAligner(AlignmentParams(threshold=0.15),
                                    interpret=False, group=32)

        def run_e():
            return run_batch_fast(REF, e_pairs, e_out,
                                  template_model_file=TMODEL,
                                  complement_model_file=CMODEL,
                                  log=lambda m: None, aligner=pa_e,
                                  sm_type="echelon", threshold=0.15)

        res_e = run_e()
        assert len(res_e) == len(e_pairs)
        dt_e = _median_time(run_e)
        _emit("signal_pipeline_echelon_reads_per_sec", len(e_pairs) / dt_e,
              "reads/s (signalAlign pipeline, echelon machine, "
              "multi-state posterior expansion)")
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def bench_msa():
    """MSA layer e2e (makeAlignment, impl/multipleAligner.c:892-944): the
    spanning-tree rounds' pairwise jobs run batched through the DNA
    5-state Pallas kernels (msa/tpu.py) instead of one DP per pair."""
    import random

    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.msa.multiple_aligner import SeqFrag, make_alignment
    from cpecan_tpu.msa.tpu import tpu_batch_align_fn
    from cpecan_tpu.ops.pallas_fb import Dna5PallasAligner

    rng = random.Random(17)
    base = "".join(rng.choice("ACGT") for _ in range(1000))

    def mutate(s):
        return "".join(c if rng.random() > 0.08 else rng.choice("ACGT")
                       for c in s)

    frags = [SeqFrag(mutate(base), 2 * i, 2 * i + 1) for i in range(32)]
    pa = Dna5PallasAligner(AlignmentParams(), interpret=False)
    n_jobs = [0]

    def counting_bfn(inner):
        def bfn(jobs):
            n_jobs[0] += len(jobs)
            return inner(jobs)
        return bfn

    bfn = counting_bfn(tpu_batch_align_fn(aligner=pa))

    def run():
        n_jobs[0] = 0
        return make_alignment(None, frags, spanning_trees=2,
                              max_pairs_to_consider=10000,
                              use_progressive_merging=False,
                              match_gamma=0.2, rng=random.Random(5),
                              batch_align_fn=bfn)

    mA = run()
    assert len(mA.aligned_pairs) > 0
    jobs = n_jobs[0]
    dt = _median_time(run)
    _emit("msa_pairwise_alignments_per_sec", jobs / dt,
          f"pairwise alignments/s inside makeAlignment (32x 1kb seqs, "
          f"2 spanning trees, {jobs} jobs total across both rounds, "
          f"batched kernel rounds, native greedy column build)")


def bench_hdp(reads):
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.hdp.nanopore_hdp import flat_hdp_model_2
    from cpecan_tpu.models.state_machines import StateMachine3Hdp
    from cpecan_tpu.models.kmers import seq_to_kmer_indices
    from cpecan_tpu.ops.pallas_fb import HdpPallasAligner
    from cpecan_tpu.io.poremodel import load_pore_model

    model_path = fixture_path("template_median68pA.model")
    try:
        model = load_pore_model(model_path)
    except OSError:
        return
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
    # r4: the headline chunk-pipelined recipe applied to HDP — 256 reads
    # dispatched in 64-read chunks with async per-chunk D2H, group=64.
    # Measured (tools/exp_hdp_chunked.py): one 64-read sync run 535/s
    # (g32) -> 634/s (g64); chunk64x4 888/s (g32) -> 1029/s (g64); one
    # big 256-read dispatch is WORSE (459/s — the per-read density
    # stream serializes ahead of the kernels instead of riding under the
    # previous chunk's D2H).  Each run() phase carries ~30-50 ms of
    # fixed tunnel-sync latency (tools/profile_hdp.py), which chunk
    # pipelining hides.
    pa = HdpPallasAligner(AlignmentParams(), interpret=False, group=64)
    chunk = 64

    def run():
        outs = []
        for i in range(0, len(reads), chunk):
            o = pa.run(sm, reads[i:i + chunk], compact_k=2048)
            for arr in o["compact"]:
                arr.copy_to_host_async()
            outs.append(o)
        return [tuple(np.asarray(a) for a in o["compact"])
                for o in outs]

    run()
    dt = _median_time(run)
    _emit("hdp_alignments_per_sec", len(reads) / dt,
          f"alignments/s (HDP spline-density emissions, streamed, "
          f"chunked x{chunk})")


def main():
    sys.path.insert(0, ".")
    import os
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from __graft_entry__ import _synthetic_batch
    from cpecan_tpu.align import AlignmentParams
    from cpecan_tpu.ops.pallas_fb import StrawmanPallasAligner

    batch = 256
    sm, reads = _synthetic_batch(n_reads=batch, n_ref=905, n_events=800,
                                 seed=7)
    # group=64 (64 reads per kernel launch) on the posterior-only paths:
    # band-local per-step vector work is so small that fixed per-step
    # costs dominate, so packing more reads per launch keeps winning —
    # 4.84e8 (R=8) -> 8.04e8 (R=32) -> 8.76e8 (R=64) device cells/s,
    # flat at R=128; pairs + expectations bit-identical to R=32 across
    # strawman/dna5/vanilla/sm4 (128/128 reads).  EM expectation runs
    # keep group=32: the two-page VMEM accumulator ladder doubles with R
    # and measured ~10% SLOWER at 64 (977 -> 882 reads/s).  The library
    # default stays 32 — heterogeneous batches widen the per-group window
    # union (prepare() grows W past 128 lanes), which taxes every read in
    # the group; 64 is right for shape-homogeneous batches like these.
    pa = StrawmanPallasAligner(AlignmentParams(), interpret=False, group=64)
    bench_headline(sm, reads, pa)
    for fn in (lambda: bench_device_only(sm, reads, pa),
               bench_long_read,
               bench_dna_realign,
               bench_dna_em,
               lambda: bench_signal_em(sm, reads),
               lambda: bench_vanilla_and_sm4(reads),
               bench_echelon,
               bench_signal_pipeline,
               bench_msa,
               lambda: bench_hdp(reads)):
        try:
            fn()
        except Exception as e:  # a secondary metric must not kill the run
            import traceback
            print(f"# metric failed: {e!r}", file=sys.stderr)
            traceback.print_exc()


if __name__ == "__main__":
    main()
