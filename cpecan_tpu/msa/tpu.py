"""TPU-batched pairwise alignment for the MSA layer.

The reference aligns each chosen sequence pair with one full DP
(addMultipleAlignedPairs = getAlignedPairs + reweightAlignedPairs2,
impl/multipleAligner.c:653-671).  Here a whole round of pairwise jobs —
all-pairs, the initial spanning chains, or one spanning-tree iteration's
next-best pairs — runs through the DNA 5-state Pallas wavefront kernel in
a handful of launches (one per distinct ragged-end combination, since the
ragged start/end vectors are kernel scalars).  Anchoring and large-gap
splitting follow getAlignedPairs (lastz anchors gated on matrix size,
split regions as independent kernel jobs, cli/realign.py does the same).
"""

import numpy as np


def tpu_batch_align_fn(params=None, sm=None, aligner=None, interpret=None,
                       lastz_path=None):
    """Build a ``batch_align_fn`` for `make_alignment`.

    jobs are (seq_x, seq_y, ragged_left, ragged_right); returns one
    reweighted (score, x, y) pair list per job, ordered by (x, y) like
    getAlignedPairs output after reweightAlignedPairs2.
    """
    import jax

    from ..align import AlignmentParams
    from ..models.state_machines import StateMachine5
    from ..ops.anchors import get_split_points
    from ..ops.blast import get_blast_pairs_for_pairwise_alignment_parameters
    from ..ops.pallas_fb import Dna5PallasAligner, extract_pairs_auto
    from ..ops.reweight import reweight_aligned_pairs_2

    params = params or AlignmentParams()
    sm = sm or StateMachine5()
    if aligner is None:
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        aligner = Dna5PallasAligner(params, interpret=interpret)

    def _anchor_one(ji, seq_x, seq_y, rl, rr):
        """lastz anchoring + large-gap splitting for one job (host /
        subprocess side of the pipeline)."""
        anchors = get_blast_pairs_for_pairwise_alignment_parameters(
            seq_x, seq_y, params, lastz_path=lastz_path)
        splits = get_split_points(
            anchors, len(seq_x), len(seq_y),
            params.split_matrix_bigger_than_this, rl, rr)
        kjobs, owners = [], []
        k = 0
        for (x1, y1, x2, y2) in splits:
            sub = []
            while k < len(anchors):
                ax, ay = anchors[k]
                if ax + ay >= x2 + y2:
                    break
                sub.append((ax - x1, ay - y1))
                k += 1
            if x2 - x1 <= 0 or y2 - y1 <= 0:
                continue
            kjobs.append((seq_x[x1:x2], seq_y[y1:y2],
                          x2 - x1, y2 - y1, sub))
            owners.append((ji, x1, y1))
        return kjobs, owners

    CHUNK = 16

    def batch_align(jobs):
        results = [[] for _ in jobs]
        # one kernel batch per ragged-end combination (batch-wide
        # scalars), each CHUNKED so the round pipelines: while chunk k's
        # kernels + async pair D2H run on device, the host is already
        # lastz-anchoring chunk k+1 (the anchoring subprocesses were
        # serialized ahead of one big dispatch before — r4's slowest
        # bench relative to workload).  A shared shape_hint keeps every
        # chunk on one compiled kernel shape.
        by_ragged = {}
        for ji, (seq_x, seq_y, rl, rr) in enumerate(jobs):
            if jobs[ji][0] and jobs[ji][1]:
                by_ragged.setdefault((bool(rl), bool(rr)), []).append(ji)
        max_x = max((len(jobs[ji][0])
                     for m in by_ragged.values() for ji in m), default=0)
        max_y = max((len(jobs[ji][1])
                     for m in by_ragged.values() for ji in m), default=0)
        hint = (min(max_x, params.split_matrix_bigger_than_this),
                min(max_x + max_y + 1,
                    2 * params.split_matrix_bigger_than_this + 1))
        pending = []  # (out, owners) in dispatch order
        for (rl, rr), members in by_ragged.items():
            for c0 in range(0, len(members), CHUNK):
                kjobs, owners = [], []
                for ji in members[c0:c0 + CHUNK]:
                    kj, ow = _anchor_one(ji, jobs[ji][0], jobs[ji][1],
                                         rl, rr)
                    kjobs.extend(kj)
                    owners.extend(ow)
                if not kjobs:
                    continue
                out = aligner.run(sm, kjobs, ragged_left=rl,
                                  ragged_right=rr, shape_hint=hint)
                if "compact" in out:
                    for a in out["compact"]:
                        a.copy_to_host_async()
                pending.append((out, owners))
        for out, owners in pending:
            if "compact" in out:
                out["compact"] = tuple(np.asarray(a)
                                       for a in out["compact"])
            for i, (ji, x1, y1) in enumerate(owners):
                sub_pairs = extract_pairs_auto(
                    out, i, out["prep"]["bands"][i].n_diag,
                    params.threshold)
                results[ji].extend((s, x + x1, y + y1)
                                   for s, x, y in sub_pairs)
        for ji, (seq_x, seq_y, _rl, _rr) in enumerate(jobs):
            pairs = sorted(results[ji], key=lambda t: (t[1], t[2]))
            results[ji] = reweight_aligned_pairs_2(
                pairs, len(seq_x), len(seq_y), params.gap_gamma)
        return results

    return batch_align
