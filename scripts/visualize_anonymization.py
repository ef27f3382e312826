"""Anonymizer demo entry point (reference: visualization/visualize_anonymization.py).

Synthetic: ``python scripts/visualize_anonymization.py --synthetic --cpu``.
File-backed: --videos_glob + --saved_model_fa.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--videos_glob", type=str, default=None)
    ap.add_argument("--saved_model_fa", type=str, default=None)
    ap.add_argument("--out_dir", type=str, default="visualizations")
    args = ap.parse_args()
    setup_platform(args)

    from ted_spad_tpu.stages.visualization import anonymize_video

    if args.synthetic:
        uris = ["synthetic://n=30,h=48,w=64,seed=7"]
        size = (48, 64)
    else:
        import glob as _glob

        assert args.videos_glob, "pass --videos_glob or --synthetic"
        uris = sorted(_glob.glob(args.videos_glob))
        size = (240, 320)

    from ted_spad_tpu.utils.naming import dedup_names

    names = dedup_names(uris)  # same-basename videos in different dirs must not clobber
    for uri in uris:
        paths = anonymize_video(uri, args.out_dir, saved_model_fa=args.saved_model_fa,
                                size=size, out_name=names[uri])
        print(f"{uri} -> {paths['video']}, {paths['grid']}")


if __name__ == "__main__":
    main()
