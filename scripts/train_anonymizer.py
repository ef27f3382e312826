"""Adversarial anonymization entry point — the CORE stage (reference:
anonymization_training/train_anonymizer.py:557-573 CLI).

Synthetic: ``python scripts/train_anonymizer.py --synthetic --cpu --epochs 2``.
File-backed: --ucf101_root + --vispr_root (+ --params params_anonymization.py overlay).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, finalize_params, maybe_mesh, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--ucf101_root", type=str, default=None)
    ap.add_argument("--class_mapping", type=str, default=None)
    ap.add_argument("--vispr_root", type=str, default=None)
    args = ap.parse_args()
    setup_platform(args)

    import os

    from ted_spad_tpu.config.params import AnonymizationParams
    from ted_spad_tpu.data.images import SyntheticImageSource, VisprImageSource
    from ted_spad_tpu.data.videos import load_ucf101_list, synthetic_video_items
    from ted_spad_tpu.stages.anonymization_training import train_anonymizer

    p = finalize_params(AnonymizationParams(), args)
    if args.synthetic:
        p = p.replace(
            num_classes=4, num_frames=8, reso_h=32, reso_w=32, batch_size=2,
            batch_size_vispr=4, v_batch_size=2, num_modes=2, compute_dtype="float32",
            save_acc_threshold=-1.0,
        )
        train_items = synthetic_video_items(8, 4, num_frames=48, h=48, w=64, seed=args.seed)
        val_items = synthetic_video_items(4, 4, num_frames=48, h=48, w=64, seed=args.seed + 1)
        vispr = SyntheticImageSource(n=16, canonical=64, seed=args.seed)
    else:
        assert args.ucf101_root and args.vispr_root, "pass data roots or --synthetic"
        mapping = args.class_mapping or os.path.join(args.ucf101_root, "class_mapping.json")
        train_items = load_ucf101_list(
            os.path.join(args.ucf101_root, "ucfTrainTestlist", "trainlist01.txt"),
            os.path.join(args.ucf101_root, "Videos"), mapping,
        )
        val_items = load_ucf101_list(
            os.path.join(args.ucf101_root, "ucfTrainTestlist", "testlist01.txt"),
            os.path.join(args.ucf101_root, "Videos"), mapping,
        )
        vispr = VisprImageSource(
            os.path.join(args.vispr_root, "train2017"), os.path.join(args.vispr_root, "train_labels.pkl")
        )

    res = train_anonymizer(
        p, train_items=train_items, val_items=val_items, vispr_source=vispr,
        save_dir=args.save_dir, max_epochs=args.epochs, seed=args.seed,
        mesh=maybe_mesh(args),
    )
    print(f"done; best acc {res['best_acc']} at {res['best_path']}")


if __name__ == "__main__":
    main()
