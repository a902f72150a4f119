"""fast5 -> npRead converter CLI.

Equivalent of scripts/fast5_to_npRead.py (reference), upgraded to the
nanoporeLib.get_npRead_2dseq_and_models output set: npRead, optional 2D
fasta, optional per-read model exports.
"""

import argparse
import sys

from ..io.fast5 import fast5_to_npread


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="cpecan-fast5-to-npread",
        description="Convert a basecalled 2D MinION fast5 to the 6-line "
                    "npRead text format.")
    p.add_argument("fast5")
    p.add_argument("npread")
    p.add_argument("--twod-fasta", default=None,
                   help="also extract the 2D read sequence as fasta")
    p.add_argument("--template-model", default=None,
                   help="export path for a non-default template model")
    p.add_argument("--complement-model", default=None,
                   help="export path for a non-default complement model")
    args = p.parse_args(argv)
    ok, t_model, c_model = fast5_to_npread(
        args.fast5, args.npread, twod_fasta_path=args.twod_fasta,
        template_model_path=args.template_model,
        complement_model_path=args.complement_model)
    if t_model:
        print(f"template model -> {t_model}", file=sys.stderr)
    if c_model:
        print(f"complement model -> {c_model}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
