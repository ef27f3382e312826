"""Action (ft) training entry point (reference: action_training/train_action.py and, with
--anonymized, train_anonymized_action.py).

Synthetic: ``python scripts/train_action.py --synthetic --cpu --epochs 2``.
File-backed: --ucf101_root with Videos/, ucfTrainTestlist/, class mapping json.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, finalize_params, maybe_mesh, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--ucf101_root", type=str, default=None)
    ap.add_argument("--class_mapping", type=str, default=None)
    ap.add_argument("--arch", type=str, default=None)
    ap.add_argument("--anonymized", action="store_true")
    ap.add_argument("--saved_model_fa", type=str, default=None)
    args = ap.parse_args()
    setup_platform(args)

    import os

    from ted_spad_tpu.config.params import ActionParams
    from ted_spad_tpu.data.videos import load_ucf101_list, synthetic_video_items
    from ted_spad_tpu.stages.action_training import train_action

    p = finalize_params(ActionParams(), args)
    if args.arch:
        p = p.replace(arch=args.arch)
    if args.anonymized:
        p = p.replace(anonymized=True, saved_model_fa=args.saved_model_fa)

    if args.synthetic:
        p = p.replace(
            num_classes=4, num_frames=8, reso_h=32, reso_w=32, batch_size=4,
            v_batch_size=4, num_modes=2, compute_dtype="float32",
        )
        train_items = synthetic_video_items(16, 4, num_frames=48, h=48, w=64, seed=args.seed)
        val_items = synthetic_video_items(8, 4, num_frames=48, h=48, w=64, seed=args.seed + 1)
    else:
        assert args.ucf101_root, "pass --ucf101_root or --synthetic"
        mapping = args.class_mapping or os.path.join(args.ucf101_root, "class_mapping.json")
        train_items = load_ucf101_list(
            os.path.join(args.ucf101_root, "ucfTrainTestlist", "trainlist01.txt"),
            os.path.join(args.ucf101_root, "Videos"), mapping,
        )
        val_items = load_ucf101_list(
            os.path.join(args.ucf101_root, "ucfTrainTestlist", "testlist01.txt"),
            os.path.join(args.ucf101_root, "Videos"), mapping,
        )

    res = train_action(
        p, train_items=train_items, val_items=val_items, save_dir=args.save_dir,
        max_epochs=args.epochs, seed=args.seed, mesh=maybe_mesh(args),
    )
    print(f"done; best acc {res['best_acc']} at {res['best_path']}")


if __name__ == "__main__":
    main()
