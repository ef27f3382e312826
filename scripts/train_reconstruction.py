"""fa-pretraining entry point (reference: fa_pretraining/train_reconstruction.py).

Synthetic: ``python scripts/train_reconstruction.py --synthetic --cpu --epochs 2``.
File-backed: point --ucf_frames_glob / --vispr_dir at UCF101-frames jpgs + VISPR jpgs
(reconstruction_dl.py:20-32 mixes both pools).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, finalize_params, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--ucf_frames_glob", type=str, default=None)
    ap.add_argument("--vispr_dir", type=str, default=None)
    ap.add_argument("--arch_fa", type=str, default=None, choices=["unet", "unet++"])
    ap.add_argument("--restart", action="store_true", help="resume from the rolling temp ckpt")
    args = ap.parse_args()
    setup_platform(args)

    from ted_spad_tpu.config.params import ReconstructionParams
    from ted_spad_tpu.data.images import ReconstructionSource
    from ted_spad_tpu.stages.fa_pretraining import train_reconstruction

    p = finalize_params(ReconstructionParams(), args)
    if args.arch_fa:
        p = p.replace(arch_fa=args.arch_fa)
    if args.synthetic:
        p = p.replace(reso_h=64, reso_w=64, batch_size=8, compute_dtype="float32")
        train_src = ReconstructionSource(synthetic_n=64, seed=args.seed)
        val_src = ReconstructionSource(synthetic_n=16, seed=args.seed + 1)
    else:
        import glob as _glob

        paths = []
        if args.ucf_frames_glob:
            paths += sorted(_glob.glob(args.ucf_frames_glob))
        if args.vispr_dir:
            paths += sorted(_glob.glob(f"{args.vispr_dir}/*.jpg"))
        assert paths, "no images found; pass --ucf_frames_glob/--vispr_dir or --synthetic"
        train_src = ReconstructionSource(image_paths=paths)
        val_src = None

    res = train_reconstruction(
        p, train_source=train_src, val_source=val_src, save_dir=args.save_dir,
        max_epochs=args.epochs, restart=args.restart, seed=args.seed,
    )
    print(f"done; best: {res['best_path']}")


if __name__ == "__main__":
    main()
