"""Full TeD-SPAD pipeline, end-to-end (BASELINE.json config 5: decode -> anonymize ->
feature extract -> MGFN), chained through the same on-disk artifacts the reference's
stages exchange (ckpts + per-video .npy features, SURVEY.md §1 dataflow).

Synthetic: ``python scripts/run_pipeline.py --synthetic --cpu`` runs all five stages on
procedural data in one process:
  1. fa reconstruction pretraining (L1)
  2. adversarial anonymization (fa vs fb vs ft)
  3. feature extraction with the trained fa (+ft) -> .npy artifacts
  4. MGFN anomaly training/eval on those features -> frame-level AUC
  5. privacy attack on anonymized images -> cMAP
"""

import os
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    args = ap.parse_args()
    if not args.synthetic:
        raise SystemExit("file-backed pipelines run stage scripts individually; use --synthetic here")
    setup_platform(args)

    import numpy as np

    from ted_spad_tpu.config.params import (
        AnonymizationParams,
        FeatureExtractionParams,
        MGFNParams,
        PrivacyParams,
        ReconstructionParams,
    )
    from ted_spad_tpu.data.images import ReconstructionSource, SyntheticImageSource
    from ted_spad_tpu.data.videos import synthetic_video_items
    from ted_spad_tpu.stages.anonymization_training import train_anonymizer
    from ted_spad_tpu.stages.fa_pretraining import train_reconstruction
    from ted_spad_tpu.stages.feature_extraction import extract_features
    from ted_spad_tpu.stages.privacy_training import train_privacy

    save = args.save_dir
    ep = args.epochs or 1

    print("== stage 1/5: fa reconstruction pretraining")
    rp = ReconstructionParams(run_id="pipe_recon", reso_h=32, reso_w=32, batch_size=8,
                              warmup=1, arch_fa="unet++", compute_dtype="float32")
    rec = train_reconstruction(
        rp, train_source=ReconstructionSource(synthetic_n=24, canonical=64),
        val_source=ReconstructionSource(synthetic_n=8, canonical=64, seed=1),
        save_dir=save, max_epochs=ep, seed=args.seed,
    )

    print("== stage 2/5: adversarial anonymization")
    ano = AnonymizationParams(
        run_id="pipe_anon", num_classes=4, num_frames=8, reso_h=32, reso_w=32,
        batch_size=2, batch_size_vispr=4, v_batch_size=2, num_modes=2,
        compute_dtype="float32", save_acc_threshold=-1.0,
        # Chain stage 1's artifact (the reference seeds fa from fa_recon.pth,
        # params_anonymization.py): this exercises the on-disk ckpt handoff.
        saved_model_fa=rec["best_path"],
    )
    train_items = synthetic_video_items(8, 4, num_frames=48, h=48, w=64, seed=args.seed)
    val_items = synthetic_video_items(4, 4, num_frames=48, h=48, w=64, seed=args.seed + 1)
    anon = train_anonymizer(
        ano, train_items=train_items, val_items=val_items,
        vispr_source=SyntheticImageSource(n=16, canonical=64),
        save_dir=save, max_epochs=ep, seed=args.seed,
    )

    print("== stage 3/5: feature extraction with the trained fa")
    fx = FeatureExtractionParams(num_frames=8, reso_h=32, reso_w=32, anonymized=True,
                                 compute_dtype="float32")
    # Synthetic surveillance set: "abnormal" videos use a different procedural class
    # family than "normal" ones (SyntheticVideoReader seed//1000 structure), so MGFN has
    # a real feature-level signal (shared fixture, scripts/_common.py).
    from scripts._common import synthetic_crime_fixture

    uris, gt, _split = synthetic_crime_fixture(3, 3)
    feats = extract_features(
        fx, uris, os.path.join(save, "pipe_features"),
        fa_variables=anon["fa_variables"], ft_variables=anon["ft_variables"],
        batch_size=4, decode_hw=(48, 64),
    )
    print(f"   {feats['clips']} clips @ {feats['clips_per_sec']:.2f} clips/s")

    print("== stage 4/5: MGFN anomaly training on extracted features")
    import ted_spad_tpu.data.features as fm

    # uris order == gt order (decode order is nondeterministic). On a re-run with the
    # same save_dir, already-extracted artifacts come back under 'existing', not 'saved'.
    available = {**feats.get("existing", {}), **feats["saved"]}
    paths = [available[u] for u in uris]
    train_list = os.path.join(save, "pipe_train.list")
    test_list = os.path.join(save, "pipe_test.list")
    open(train_list, "w").write("\n".join(paths) + "\n")
    open(test_list, "w").write("\n".join(paths) + "\n")
    fm.ABNORMAL_SPLIT["UCF"] = 3
    mp = MGFNParams(
        rgb_list=train_list, test_rgb_list=test_list, feature_size=2048,
        dims=(16, 32, 64), depths=(1, 1, 1), dim_head=16, batch_size=3,
        dropout_rate=0.3, model_name="pipe_mgfn",
    )
    from ted_spad_tpu.stages.anomaly_detection import train_anomaly_detection

    mg = train_anomaly_detection(mp, save_dir=save, gt=gt, max_epochs=max(ep, 2), shuffle=True)

    print("== stage 5/5: privacy attack on anonymized images")
    pp = PrivacyParams(run_id="pipe_priv", reso_h=32, reso_w=32, batch_size=8,
                       v_batch_size=8, anon=True, compute_dtype="float32", warmup=1)
    priv = train_privacy(
        pp, train_source=SyntheticImageSource(n=24, canonical=64),
        val_source=SyntheticImageSource(n=16, canonical=64, seed=1),
        save_dir=save, fa_variables=anon["fa_variables"], max_epochs=ep, seed=args.seed,
    )

    print("\n== pipeline summary")
    print(f"  recon best L1:        {min(rec['history']['val_loss'] or [float('nan')]):.4f}")
    print(f"  anonymizer utility:   {anon['history']['val_acc'][-1] if anon['history']['val_acc'] else float('nan'):.4f} top-1")
    print(f"  extraction:           {feats['clips']} clips, {feats['clips_per_sec']:.2f} clips/s")
    print(f"  anomaly ROC AUC:      {max(mg['history']['test_AUC']):.4f}")
    print(f"  privacy cMAP (anon):  {priv['best_cmap']:.4f} (lower = better privacy)")


if __name__ == "__main__":
    import os

    main()
