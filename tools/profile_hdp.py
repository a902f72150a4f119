"""Phase profile of the HDP e2e alignment path (VERDICT r3 item 5).

Splits one HdpPallasAligner.run() into its phases and times each with a
forced tunnel sync, so the BASELINE.md floor/lever analysis is measured
rather than guessed.  Phases:

  prepare      host-side read prep (codes, events, anchors, windows, bands)
  bandmeta     device band rebuild from anchor chains (_device_bands)
  features     device feature assembly (gap-x table broadcast)
  density      _stream_args: one-matmul density build + skew gather
  fwd          forward wavefront kernel
  bwd          backward wavefront kernel + posterior compaction inputs
  compact      hierarchical top-k posterior compaction
  d2h          np.asarray of the compact pair arrays

Run on the real TPU:  python tools/profile_hdp.py [n_reads]
"""
import sys
import time

import numpy as np


def _sync(x):
    # slice ON DEVICE first: np.asarray(whole array) would drag the full
    # buffer through the ~20 MB/s axon tunnel and swamp the phase time
    if hasattr(x, "ndim") and hasattr(x, "device"):
        x = x[(0,) * x.ndim]
    np.asarray(x)


def _sync_tree(t):
    import jax
    leaves = jax.tree_util.tree_leaves(t)
    if leaves:
        _sync(leaves[-1])


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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    _, reads = _synthetic_batch(n_reads=max(n, 64), n_ref=905,
                                n_events=800, seed=7)
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
    pa = HdpPallasAligner(AlignmentParams(), interpret=False, group=32)
    sub = reads[:n]

    # ---- e2e reference number (what bench_hdp measures) ----
    def e2e():
        out = pa.run(sm, sub, compact_k=2048)
        return np.asarray(out["compact"][0])

    e2e()
    t_e2e = _med(e2e)
    print(f"e2e            {t_e2e * 1e3:8.1f} ms   "
          f"{n / t_e2e:7.1f} aligns/s")

    # ---- phases ----
    prep = pa.prepare(sm, sub)
    t_prep = _med(lambda: pa.prepare(sm, sub))
    print(f"prepare (host) {t_prep * 1e3:8.1f} ms")

    X, ND, C, W = prep["X"], prep["ND"], prep["C"], prep["W"]
    print(f"  shapes: Bp={prep['Bp']} R={prep['R']} X={X} ND={ND} W={W}")
    scal = pa._scalars(sm)
    fwd_fn, bwd_fn, _ = pa._fns(X, ND, C, W)

    Bp, A = prep["anch"].shape[:2]
    G = Bp // prep["R"]
    NDp = prep["NDp"]
    na, nm = Bp * A * 2, Bp * 4

    def bands():
        bm = jax.device_put(prep["bandmeta"])
        anch = bm[:na].reshape(Bp, A, 2)
        meta = bm[na:na + nm].reshape(Bp, 4)
        win3 = bm[na + nm:].reshape(G, 1, NDp)
        out = pa._device_bands(NDp, A)(anch, meta)
        _sync_tree(out)
        return out + (win3,)

    basef, widthf, seedf, raggedf, win3 = bands()
    t_bands = _med(lambda: bands())
    print(f"bandmeta       {t_bands * 1e3:8.1f} ms")

    def feats():
        out = pa._device_features(sm, prep)
        _sync_tree(out)
        return out

    xf, yf = feats()
    t_feat = _med(feats)
    print(f"features       {t_feat * 1e3:8.1f} ms")

    def dens():
        out = pa._stream_args(sm, prep)
        _sync_tree(out)
        return out

    extra = dens()
    t_dens = _med(dens)
    est = extra[0]
    print(f"density        {t_dens * 1e3:8.1f} ms   est {est.shape} "
          f"{est.nbytes / 1e6:.1f} MB on device")

    def fwd():
        out = fwd_fn(scal, win3, xf, yf, basef, widthf, *extra)
        _sync_tree(out)
        return out

    fwd_o = fwd()
    t_fwd = _med(fwd)
    print(f"fwd kernel     {t_fwd * 1e3:8.1f} ms")

    def bwd():
        out = bwd_fn(scal, win3, xf, yf, basef, widthf, seedf, raggedf,
                     fwd_o, *extra)
        _sync_tree(out[1])
        return out

    posts, totals = bwd()
    t_bwd = _med(bwd)
    print(f"bwd kernel     {t_bwd * 1e3:8.1f} ms")

    out_full = pa.run(sm, sub, compact_k=2048)
    comp = out_full["compact"]

    def d2h():
        return tuple(np.asarray(a) for a in comp)

    t_d2h = _med(d2h)
    nb = sum(a.nbytes for a in comp)
    print(f"d2h compact    {t_d2h * 1e3:8.1f} ms   {nb / 1e6:.2f} MB "
          f"({nb / t_d2h / 1e6:.1f} MB/s)")

    acc = t_prep + t_bands + t_feat + t_dens + t_fwd + t_bwd + t_d2h
    print(f"sum of phases  {acc * 1e3:8.1f} ms   (compact kernel + "
          f"dispatch overlap explain e2e minus sum)")


if __name__ == "__main__":
    main()
