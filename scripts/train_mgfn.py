"""MGFN anomaly-detection entry point (reference: anomaly_detection_mgfn/main.py +
test.py).

Synthetic: ``python scripts/train_mgfn.py --synthetic --cpu --epochs 3``.
File-backed: --rgb_list/--test_rgb_list/--gt per dataset (option.py:33-58);
--test_only <ckpt> runs evaluation alone (test.py __main__).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, maybe_mesh, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--datasetname", type=str, default="UCF", choices=["UCF", "ST", "XD"])
    ap.add_argument("--rgb_list", type=str, default=None)
    ap.add_argument("--test_rgb_list", type=str, default=None)
    ap.add_argument("--gt", type=str, default=None)
    ap.add_argument("--test_only", type=str, default=None, help="checkpoint to evaluate")
    ap.add_argument("--shuffle", action="store_true")
    args = ap.parse_args()
    setup_platform(args)

    import numpy as np

    from ted_spad_tpu.config.params import MGFNParams
    from ted_spad_tpu.config.params import apply_params_file
    from ted_spad_tpu.stages.anomaly_detection import train_anomaly_detection

    # --datasetname applies the full option.py:33-58 preset block (lists, gt name,
    # feature_size 1024 for XD, 16 frames/clip gt for ST); --params and the explicit
    # list/gt flags below still override.
    p = apply_params_file(MGFNParams.for_dataset(args.datasetname), args.params)
    gt = None
    if args.synthetic:
        import tempfile

        import ted_spad_tpu.data.features as fm

        tmp = tempfile.mkdtemp()
        rng = np.random.default_rng(args.seed)
        train_paths, test_paths, gts = [], [], []
        for i in range(16):
            t = int(rng.integers(40, 80))
            x = rng.normal(0, 1, (t, 64)).astype(np.float32)
            if i < 8:
                s = int(rng.integers(0, t - 4))
                x[s : s + 4] *= 6.0
            path = f"{tmp}/{'a' if i < 8 else 'n'}{i}.npy"
            np.save(path, x)
            train_paths.append(path)
        for i in range(6):
            t = int(rng.integers(40, 80))
            x = rng.normal(0, 1, (t, 64)).astype(np.float32)
            m = np.zeros(t, bool)
            if i % 2 == 0:
                s = int(rng.integers(0, t - 4))
                x[s : s + 4] *= 6.0
                m[s : s + 4] = True
            path = f"{tmp}/t{i}.npy"
            np.save(path, x)
            test_paths.append(path)
            gts.append(np.repeat(m.astype(np.float32), p.frames_per_clip))
        open(f"{tmp}/train.list", "w").write("\n".join(train_paths) + "\n")
        open(f"{tmp}/test.list", "w").write("\n".join(test_paths) + "\n")
        gt = np.concatenate(gts)
        fm.ABNORMAL_SPLIT[p.datasetname] = 8
        p = p.replace(
            rgb_list=f"{tmp}/train.list", test_rgb_list=f"{tmp}/test.list",
            feature_size=64, dims=(16, 32, 64), depths=(1, 1, 1), dim_head=16,
            batch_size=4, dropout_rate=0.3, model_name="mgfn_synth",
        )
    else:
        if args.rgb_list:
            p = p.replace(rgb_list=args.rgb_list)
        if args.test_rgb_list:
            p = p.replace(test_rgb_list=args.test_rgb_list)
        if args.gt:
            p = p.replace(gt=args.gt)

    if args.test_only:
        from ted_spad_tpu.data.features import TestFeatureDataset
        from ted_spad_tpu.models import load_mgfn_model
        from ted_spad_tpu.stages.anomaly_detection import evaluate, make_score_fn

        model, variables = load_mgfn_model(p, saved_model_file=args.test_only)
        test_ds = TestFeatureDataset(p.test_rgb_list, p.datasetname)
        gt_arr = gt if gt is not None else np.load(p.gt)
        roc, pr = evaluate(
            make_score_fn(model), variables, test_ds, gt_arr,
            frames_per_clip=p.frames_per_clip,
        )
        print(f"roc_auc {roc:.4f} pr_auc {pr:.4f}")
        return

    res = train_anomaly_detection(
        p, save_dir=args.save_dir, gt=gt, max_epochs=args.epochs, shuffle=args.shuffle,
        mesh=maybe_mesh(args),
    )
    print(f"done; best {res['best_metric']:.4f} at {res['best_path']}")


if __name__ == "__main__":
    main()
