"""Profile run_batch_fast (the signalAlign pipeline) on replicated Zymo reads.

Usage: python tools/profile_pipeline.py [n_reads] [--cprofile]

Times a steady-state batch (second call, shared aligner) and reports
reads/s; with --cprofile dumps the top host-side hotspots.
"""
import cProfile
import io
import os
import pstats
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cpecan_tpu.fixtures import fixture_path

REF = fixture_path("ZymoRef.txt")
NPREAD = fixture_path("ZymoC_ch_1_file1.npRead")
TMODEL = fixture_path("template_median68pA.model")
CMODEL = fixture_path("complement_median68pA_pop2.model")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 64
    use_cprofile = "--cprofile" in sys.argv

    from cpecan_tpu.ops.blast import LASTZ_ARGS, find_lastz
    from cpecan_tpu.io.npread import load_npread
    from cpecan_tpu.pipeline.signal_align_batch import run_batch_fast
    from cpecan_tpu.ops.pallas_fb import StrawmanPallasAligner
    from cpecan_tpu.align import AlignmentParams

    tmp = tempfile.mkdtemp()
    npr = load_npread(NPREAD)
    ref_seq = open(REF).read().splitlines()[0]
    ref_fa = os.path.join(tmp, "ref.fa")
    read_fa = os.path.join(tmp, "read.fa")
    open(ref_fa, "w").write(">ref\n" + ref_seq + "\n")
    open(read_fa, "w").write(">read2d\n" + npr.twod_read + "\n")
    res = subprocess.run([find_lastz()] + LASTZ_ARGS + [ref_fa, read_fa],
                         capture_output=True, text=True, check=True)
    guide = [l for l in res.stdout.splitlines() if l.startswith("cigar:")][0]
    qname = guide.split()[1]

    reads_dir = os.path.join(tmp, "reads")
    os.makedirs(reads_dir)
    pairs = []
    for i in range(n):
        p = os.path.join(reads_dir, f"{qname}_{i}.npRead")
        if i == 0:
            shutil.copy(NPREAD, p)
        else:
            os.link(os.path.join(reads_dir, f"{qname}_0.npRead"), p)
        g = guide.split()
        g[1] = f"{qname}_{i}"
        pairs.append((p, " ".join(g)))

    pa = StrawmanPallasAligner(AlignmentParams(threshold=0.01),
                               interpret=False)
    out_dir = os.path.join(tmp, "out")

    compact_k = next((int(a.split("=")[1]) for a in sys.argv
                      if a.startswith("--compact_k=")), 4096)
    chunk = next((int(a.split("=")[1]) for a in sys.argv
                  if a.startswith("--chunk=")), 64)

    def once(tag):
        t0 = time.perf_counter()
        results = run_batch_fast(REF, pairs, out_dir,
                                 template_model_file=TMODEL,
                                 complement_model_file=CMODEL,
                                 aligner=pa, log=lambda m: None,
                                 compact_k=compact_k, chunk=chunk)
        dt = time.perf_counter() - t0
        ok = sum(1 for _, s, _ in results if s)
        print(f"{tag}: {ok}/{n} reads in {dt:.2f}s = {ok/dt:.1f} reads/s")
        return dt

    once("warmup")
    if use_cprofile:
        pr = cProfile.Profile()
        pr.enable()
        once("steady")
        pr.disable()
        st = pstats.Stats(pr, stream=sys.stdout)
        st.sort_stats("cumulative").print_stats(35)
    else:
        once("steady")
        once("steady2")
    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
