"""Privacy-attack evaluation entry point (reference: privacy_training/train_privacy.py).

Synthetic: ``python scripts/train_privacy.py --synthetic --cpu --epochs 2 [--anon]``.
File-backed: --vispr_root with {train,test}2017/ jpg dirs + {train,test}_labels.pkl
(aux_code/config.py vispr path layout).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, finalize_params, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--vispr_root", type=str, default=None)
    ap.add_argument("--anon", action="store_true", help="train on fa-anonymized images")
    ap.add_argument("--saved_model_fa", type=str, default=None)
    args = ap.parse_args()
    setup_platform(args)

    from ted_spad_tpu.config.params import PrivacyParams
    from ted_spad_tpu.data.images import SyntheticImageSource, VisprImageSource
    from ted_spad_tpu.stages.privacy_training import train_privacy

    p = finalize_params(PrivacyParams(), args)
    if args.anon:
        p = p.replace(anon=True)
        if args.saved_model_fa:
            p = p.replace(saved_model=args.saved_model_fa)
    if args.synthetic:
        p = p.replace(reso_h=64, reso_w=64, batch_size=8, v_batch_size=8, compute_dtype="float32")
        train_src = SyntheticImageSource(n=64, num_pa=p.num_pa, seed=args.seed)
        val_src = SyntheticImageSource(n=32, num_pa=p.num_pa, seed=args.seed + 1)
    else:
        import os

        assert args.vispr_root, "pass --vispr_root or --synthetic"
        train_src = VisprImageSource(
            os.path.join(args.vispr_root, "train2017"), os.path.join(args.vispr_root, "train_labels.pkl")
        )
        val_src = VisprImageSource(
            os.path.join(args.vispr_root, "test2017"), os.path.join(args.vispr_root, "test_labels.pkl"),
            shuffle=False,
        )

    res = train_privacy(
        p, train_source=train_src, val_source=val_src, save_dir=args.save_dir,
        max_epochs=args.epochs, seed=args.seed,
    )
    print(f"done; best cMAP {res['best_cmap']:.4f} at {res['best_path']}")


if __name__ == "__main__":
    main()
