"""Smoke-drive the band-local EM expectation kernel on the real TPU.

Usage: python tools/em_drive.py N_REF N_EVENTS GROUP [N_READS]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from cpecan_tpu.align import AlignmentParams
from cpecan_tpu.io.poremodel import load_pore_model
from cpecan_tpu.models.state_machines import StateMachine3SignalStrawman
from cpecan_tpu.ops.pallas_fb import StrawmanPallasAligner
from test_parallel import _synthetic_read
from cpecan_tpu.fixtures import fixture_path


def main():
    n_ref = int(sys.argv[1])
    n_events = int(sys.argv[2])
    group = int(sys.argv[3])
    n_reads = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    model = load_pore_model(
        fixture_path("template_median68pA.model"))
    rng = np.random.default_rng(7)
    reads = [_synthetic_read(rng, model, n_ref=n_ref + 16 * i,
                             n_events=n_events + 16 * i)
             for i in range(n_reads)]
    sm = StateMachine3SignalStrawman(model)
    pa = StrawmanPallasAligner(AlignmentParams(), interpret=False,
                               group=group)
    out = pa.run(sm, reads, expectations=True)
    exp = out["expectations"]
    for k, v in exp.items():
        a = np.asarray(v)
        assert np.all(np.isfinite(a)), k
        print(k, a.shape, round(float(a.sum()), 3))
    print(f"OK n_ref={n_ref} n_events={n_events} group={group}")


if __name__ == "__main__":
    main()
