"""MinION fast5 (HDF5) -> npRead conversion.

Feature parity with the reference's `NanoporeRead` class and
`get_npRead_2dseq_and_models` (scripts/nanoporeLib.py:54-152,297-666):
rebuild the 2D alignment-table sequence, construct the 2D kmer->event maps
for both strands, drift-correct event means, and write the 6-line npRead
text file plus per-read pore-model exports.

The mapping/transform cores are pure functions over plain numpy arrays (no
h5py objects), so they are unit-testable without real MinION data; `h5py` is
imported lazily and only required by `Fast5Read`.
"""

import sys
from dataclasses import dataclass

import numpy as np

# Default per-strand kmer-skip-bin priors exported alongside non-default
# models (scripts/nanoporeLib.py:638-651).
TEMPLATE_SKIP_BINS = [
    0.487, 0.412, 0.311, 0.229, 0.174, 0.134, 0.115, 0.103, 0.096, 0.092,
    0.088, 0.087, 0.084, 0.085, 0.083, 0.082, 0.085, 0.083, 0.084, 0.082,
    0.080, 0.085, 0.088, 0.086, 0.087, 0.089, 0.085, 0.090, 0.087, 0.096]
COMPLEMENT_SKIP_BINS = [
    0.531, 0.478, 0.405, 0.327, 0.257, 0.207, 0.172, 0.154, 0.138, 0.132,
    0.127, 0.123, 0.117, 0.115, 0.113, 0.113, 0.115, 0.109, 0.109, 0.107,
    0.104, 0.105, 0.108, 0.106, 0.111, 0.114, 0.118, 0.119, 0.110, 0.119]

DEFAULT_TEMPLATE_MODEL_ID = "template_median68pA.model"
DEFAULT_COMPLEMENT_MODEL_ID = "complement_median68pA_pop2.model"

TWOD_ALIGNMENT_ADDRESS = "/Analyses/Basecall_2D_000/BaseCalled_2D/Alignment"
TWOD_FASTQ_ADDRESS = "/Analyses/Basecall_2D_000/BaseCalled_2D/Fastq"
BASECALL_2D_GROUP = "/Analyses/Basecall_2D_000"


def _decode(v):
    return v.decode() if isinstance(v, bytes) else str(v)


def find_kmer_overlap(k_i, k_j):
    """Positions by which k_j is shifted right of k_i (the reference's
    non-matching-position count, scripts/nanoporeLib.py:366-377)."""
    for i in range(1, len(k_i)):
        if k_i[i:] == k_j[:-i]:
            return i
    return len(k_i)


def alignment_table_sequence(kmers):
    """Rebuild the read sequence spanned by the 2D alignment table from its
    kmer column (scripts/nanoporeLib.py:359-392): append the non-overlapping
    suffix of each new kmer."""
    kmers = [_decode(k) for k in kmers]
    seq = kmers[0]
    p_kmer = kmers[0]
    for kmer in kmers:
        if kmer != p_kmer:
            i = find_kmer_overlap(p_kmer, kmer)
            seq += kmer[-i:]
            p_kmer = kmer
    return seq


def twod_event_map(aln_seq, table, kmer_length):
    """Map every kmer position of `aln_seq` to a template event index and a
    complement event index (scripts/nanoporeLib.py:423-514).

    table: iterable of (template_event, complement_event, kmer) rows; -1
    marks a strand gap.  Returns (template_map, complement_map), each of
    length len(aln_seq).

    Template gaps are counted and back-filled with the next aligned event;
    complement gaps repeat the previous aligned event; sequence kmers absent
    from the table repeat both previous events; the final kmer_length-1
    positions (partial kmers) repeat the last events.
    """
    rows = [(int(t), int(c), _decode(k)) for t, c, k in table]
    t_map, c_map = [], []
    alignment_row = 0
    prev_kmer = ""
    nb_template_gaps = 0
    # the reference starts these as None; 0 keeps the emitted file valid if
    # the very first table row is a gap (a deliberate robustness deviation)
    previous_template_event = 0
    previous_complement_event = 0

    n_kmers = len(aln_seq) - kmer_length + 1
    for i in range(n_kmers):
        seq_kmer = aln_seq[i:i + kmer_length]
        current_kmer = rows[alignment_row][2]
        # skip repeat-kmer table rows (first alignment wins,
        # scripts/nanoporeLib.py:450-452)
        while current_kmer == prev_kmer:
            alignment_row += 1
            current_kmer = rows[alignment_row][2]

        if seq_kmer == current_kmer:
            template_event = rows[alignment_row][0]
            complement_event = rows[alignment_row][1]
            if template_event == -1:
                nb_template_gaps += 1
            else:
                t_map += [template_event] * (nb_template_gaps + 1)
                nb_template_gaps = 0
                previous_template_event = template_event
            if complement_event == -1:
                c_map.append(previous_complement_event)
            else:
                c_map.append(complement_event)
                previous_complement_event = complement_event
            prev_kmer = current_kmer
            alignment_row += 1
        else:
            # kmer absent from the table: reuse the latest aligned events
            t_map.append(previous_template_event)
            c_map.append(previous_complement_event)

    # partial kmers at the tail (scripts/nanoporeLib.py:505-509)
    for _ in range(kmer_length - 1):
        t_map += [previous_template_event] * (nb_template_gaps + 1)
        c_map.append(previous_complement_event)
        nb_template_gaps = 0

    if len(t_map) != len(aln_seq) or len(c_map) != len(aln_seq):
        raise ValueError("event map does not cover the alignment sequence")
    return np.array(t_map, dtype=np.int64), np.array(c_map, dtype=np.int64)


def strand_event_map(moves, probs, kmer_length=6):
    """1D ('strand') kmer->event map from per-event basecaller moves
    (scripts/nanoporeLib.py:394-421): move==1 appends the event, move>1
    back-fills the skipped positions with the previous event then appends,
    move==0 replaces the last mapping when the new event's model
    probability is higher.  Padded with kmer_length-1 copies of the final
    event (the reference hardcodes 5)."""
    event_map = [0]
    previous_prob = 0.0
    for i in range(1, len(moves)):
        move = int(moves[i])
        this_prob = float(probs[i])
        if move == 1:
            event_map.append(i)
        elif move > 1:
            event_map.extend([i - 1] * (move - 1))
            event_map.append(i)
        elif this_prob > previous_prob:
            event_map[-1] = i
        previous_prob = this_prob
    event_map.extend([event_map[-1]] * (kmer_length - 1))
    return np.array(event_map, dtype=np.int64)


def transform_events(events, drift):
    """Drift-correct event means in place of the reference's per-event loop
    (scripts/nanoporeLib.py:516-531): mean -= (start - start[0]) * drift.

    events: [n, 4] float array with columns (mean, start, stdev, length).
    Returns a corrected copy.
    """
    out = np.array(events, dtype=np.float64)
    out[:, 0] -= (out[:, 1] - out[0, 1]) * drift
    return out


def calculate_lambda(noise_mean, noise_sd):
    """lambda = noise_mean^3 / noise_sd^2 (scripts/nanoporeLib.py:592-594)."""
    return np.power(noise_mean, 3) / np.power(noise_sd, 2)


def write_model(fh, level_mean, level_sd, noise_mean, noise_sd, skip_bins):
    """3-line pore-model text (scripts/nanoporeLib.py:596-633): match model,
    skip bins, then the same model with level_sd scaled by 1.75 as the
    'extra event' gap-Y model.  Readable by io.poremodel.load_pore_model."""
    lam = calculate_lambda(noise_mean, noise_sd)
    print("0", end=' ', file=fh)
    for i in range(len(level_mean)):
        print(level_mean[i], level_sd[i], noise_mean[i], noise_sd[i], lam[i],
              end=' ', file=fh)
    print("", file=fh)
    for p in skip_bins:
        print(p, end=' ', file=fh)
    print("", file=fh)
    print("0", end=' ', file=fh)
    for i in range(len(level_mean)):
        print(level_mean[i], level_sd[i] * 1.75, noise_mean[i], noise_sd[i],
              lam[i], end=' ', file=fh)
    print("", file=fh)


@dataclass
class StrandData:
    events: np.ndarray        # [n, 4] (mean, start, stdev, length), drifted
    event_map: np.ndarray     # [read_length] kmer index -> event index
    scale: float
    shift: float
    drift: float
    var: float
    scale_sd: float
    var_sd: float
    model_id: str
    model_table: object       # h5py dataset or None


class Fast5Read:
    """One basecalled 2D MinION read (dragonet 1.15.0 / 1.19.0 layouts,
    scripts/nanoporeLib.py:337-357)."""

    def __init__(self, path):
        import h5py
        self.path = path
        self.f5 = h5py.File(path, "r")
        version = _decode(self.f5[BASECALL_2D_GROUP].attrs["dragonet version"])
        if version == "1.15.0":
            base = "/Analyses/Basecall_2D_000"
        elif version == "1.19.0":
            base = "/Analyses/Basecall_1D_000"
        else:
            raise ValueError(f"unsupported dragonet version {version!r} "
                             "(1.15.0 and 1.19.0 supported)")
        self._base = base
        table = self.f5[TWOD_ALIGNMENT_ADDRESS]
        if len(table) == 0:
            raise ValueError("empty 2D alignment table")
        self.table = table
        self.kmer_length = len(_decode(table[0][2]))
        self.alignment_sequence = alignment_table_sequence(
            [row[2] for row in table])

    def close(self):
        self.f5.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def read_id(self):
        if TWOD_FASTQ_ADDRESS in self.f5:
            fastq = _decode(self.f5[TWOD_FASTQ_ADDRESS][()])
            return fastq.split()[0][1:]
        return None

    def _strand(self, name, event_map):
        events_addr = f"{self._base}/BaseCalled_{name}/Events"
        model_addr = f"{self._base}/BaseCalled_{name}/Model"
        summary_addr = f"{self._base}/Summary/basecall_1d_{name}"
        raw = self.f5[events_addr]
        events = np.stack([np.asarray(raw[c], dtype=np.float64)
                           for c in ("mean", "start", "stdv", "length")],
                          axis=1)
        model = self.f5[model_addr]
        attrs = model.attrs
        model_id = None
        if summary_addr in self.f5:
            mf = _decode(self.f5[summary_addr].attrs["model_file"])
            model_id = mf.split("/")[-1]
        events = transform_events(events, float(attrs["drift"]))
        return StrandData(
            events=events, event_map=event_map,
            scale=float(attrs["scale"]), shift=float(attrs["shift"]),
            drift=float(attrs["drift"]), var=float(attrs["var"]),
            scale_sd=float(attrs["scale_sd"]), var_sd=float(attrs["var_sd"]),
            model_id=model_id, model_table=model)

    def strands(self):
        """Returns (template StrandData, complement StrandData) with 2D
        event maps built and drift-corrected events."""
        t_map, c_map = twod_event_map(self.alignment_sequence, self.table,
                                      self.kmer_length)
        return self._strand("template", t_map), self._strand("complement",
                                                             c_map)

    def export_strand_model(self, strand: StrandData, skip_bins, fh):
        m = strand.model_table
        write_model(fh,
                    np.asarray(m["level_mean"], dtype=np.float64),
                    np.asarray(m["level_stdv"], dtype=np.float64),
                    np.asarray(m["sd_mean"], dtype=np.float64),
                    np.asarray(m["sd_stdv"], dtype=np.float64),
                    skip_bins)


def write_npread(fh, aln_seq, template: StrandData, complement: StrandData):
    """6-line npRead text (scripts/nanoporeLib.py:84-122).  The complement
    event map is written reversed — it aligns to the reverse-complement
    reference (scripts/nanoporeLib.py:114-117)."""
    header = [len(aln_seq), len(template.events), len(complement.events),
              template.scale, template.shift, template.var,
              template.scale_sd, template.var_sd,
              complement.scale, complement.shift, complement.var,
              complement.scale_sd, complement.var_sd]
    print(" ".join(str(v) for v in header), file=fh)
    print(aln_seq, file=fh)
    print(" ".join(str(int(v)) for v in template.event_map), file=fh)
    print(" ".join(f"{e[0]} {e[2]} {e[3]}" for e in template.events), file=fh)
    print(" ".join(str(int(v)) for v in complement.event_map[::-1]), file=fh)
    print(" ".join(f"{e[0]} {e[2]} {e[3]}" for e in complement.events),
          file=fh)


def fast5_to_npread(fast5_path, npread_path, twod_fasta_path=None,
                    template_model_path=None, complement_model_path=None,
                    log=lambda m: print(m, file=sys.stderr)):
    """Full get_npRead_2dseq_and_models equivalent
    (scripts/nanoporeLib.py:54-152).  Returns
    (ok, template_model_path_or_None, complement_model_path_or_None);
    model paths come back None when the read used the default models."""
    with Fast5Read(fast5_path) as r:
        template, complement = r.strands()
        with open(npread_path, "w") as fh:
            write_npread(fh, r.alignment_sequence, template, complement)
        if twod_fasta_path is not None:
            with open(twod_fasta_path, "w") as fh:
                print(f">{fast5_path}", file=fh)
                print(r.alignment_sequence, file=fh)
        t_out = c_out = None
        if template.model_id != DEFAULT_TEMPLATE_MODEL_ID:
            if template_model_path is None:
                log(f"{fast5_path}: non-default template model "
                    f"{template.model_id} but no export path given")
            else:
                with open(template_model_path, "w") as fh:
                    r.export_strand_model(template, TEMPLATE_SKIP_BINS, fh)
                t_out = template_model_path
        else:
            log("signalAlign - found default template model")
        if complement.model_id != DEFAULT_COMPLEMENT_MODEL_ID:
            if complement_model_path is None:
                log(f"{fast5_path}: non-default complement model "
                    f"{complement.model_id} but no export path given")
            else:
                with open(complement_model_path, "w") as fh:
                    r.export_strand_model(complement, COMPLEMENT_SKIP_BINS,
                                          fh)
                c_out = complement_model_path
        else:
            log("signalAlign - found default complement model")
    return True, t_out, c_out
