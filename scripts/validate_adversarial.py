"""Adversarial-dynamics validation: does anonymization reduce privacy leakage?

Synthetic end-to-end check of the paper's core claim (README.md:11 — cMAP reduction
after anonymization): train the 3-model adversarial stage, then train two privacy
attackers — one on raw images, one on fa-anonymized images — and compare cMAP.
Expected: cMAP(anonymized) < cMAP(raw). Observed on the synthetic task (4 epochs
adversarial, 3 epochs attack, CPU): 0.455 raw -> 0.418 anonymized.

Usage: ``python scripts/validate_adversarial.py --cpu [--epochs 4]``

``--scale reference`` runs the SAME check at the reference's production shapes
(16-frame 224² bf16 triplets, params_anonymization.py) — on a real TPU chip this
exercises the full-scale adversarial programs (remat resolution, HBM fit) end-to-end
on synthetic data, not just the CPU-sized mesh shapes.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--scale", choices=["tiny", "reference"], default="tiny",
                    help="'reference' = 16-frame 224^2 bf16 production shapes")
    args = ap.parse_args()
    setup_platform(args)

    import tempfile

    from ted_spad_tpu.config.params import AnonymizationParams, PrivacyParams, ReconstructionParams
    from ted_spad_tpu.data.images import SyntheticImageSource
    from ted_spad_tpu.data.videos import synthetic_video_items
    from ted_spad_tpu.stages.anonymization_training import train_anonymizer
    from ted_spad_tpu.stages.fa_pretraining import train_reconstruction
    from ted_spad_tpu.stages.privacy_training import train_privacy

    save = args.save_dir if args.save_dir != "saved_models" else tempfile.mkdtemp()
    ep = args.epochs or 4

    if args.scale == "reference":
        # FULL production scale (params_anonymization.py:52-59: 8 videos x 3 views +
        # 12 VISPR pairs, 16 frames 224^2, bf16) — remat='auto' resolves ON at this
        # size; measured on a 16 GB v5e: fa step 517 ms, fused fb/ft step 182 ms,
        # no OOM (scripts/bench_remat.py, round 4). Videos are decode-shaped
        # 240x320, images 256-canonical.
        # Reference LRs (1e-5, fa x0.4 — params_anonymization.py:55-57), NOT the tiny
        # branch's 1e-4: at 224² bf16 the 10x LR blows fa's unbounded output up within
        # two adversarial epochs (observed: finite train losses but NaN val logits).
        # This run validates scale/HBM/stability; the tiny run validates dynamics.
        ano = AnonymizationParams(
            run_id="validate_anon", num_classes=4, batch_size=8, batch_size_vispr=12,
            v_batch_size=4, num_modes=2, save_acc_threshold=-1.0,
        )
        train_items = synthetic_video_items(16, 4, num_frames=96, h=240, w=320, seed=args.seed)
        val_items = synthetic_video_items(4, 4, num_frames=96, h=240, w=320, seed=args.seed + 1)
        vispr = SyntheticImageSource(n=24, canonical=256, seed=args.seed)
        pp = PrivacyParams(batch_size=8, v_batch_size=8, warmup=1, learning_rate=1e-3,
                           compute_dtype="bfloat16")
        tr = SyntheticImageSource(n=48, canonical=256, seed=args.seed)
        va = SyntheticImageSource(n=32, canonical=256, seed=args.seed + 1)
        # The reference NEVER starts the adversarial loop from a random fa — it seeds
        # from the reconstruction pretrain (fa_recon.pth, train_anonymizer.py:334).
        # A random-init fa's unbounded output is tamed by train-mode BN but explodes
        # through ft's eval-mode BN (stale running stats) at 224²: finite train
        # losses, NaN val logits (observed). Mirror the reference workflow: a short
        # L1 reconstruction pretrain, then seed the anonymizer from its checkpoint.
        import os

        rp = ReconstructionParams(run_id="validate_recon", batch_size=8,
                                  compute_dtype="bfloat16")
        train_reconstruction(rp, train_source=vispr, val_source=None, save_dir=save,
                             max_epochs=2, log_fn=lambda s: None, seed=args.seed)
        ano = ano.replace(
            saved_model_fa=os.path.join(save, rp.run_id, "model_temp.ckpt")
        )
    else:
        ano = AnonymizationParams(
            run_id="validate_anon", num_classes=4, num_frames=8, reso_h=32, reso_w=32,
            batch_size=2, batch_size_vispr=8, v_batch_size=2, num_modes=2,
            compute_dtype="float32", save_acc_threshold=-1.0, learning_rate=1e-4,
        )
        train_items = synthetic_video_items(12, 4, num_frames=48, h=48, w=64, seed=args.seed)
        val_items = synthetic_video_items(6, 4, num_frames=48, h=48, w=64, seed=args.seed + 1)
        vispr = SyntheticImageSource(n=32, canonical=64, seed=args.seed)
        pp = PrivacyParams(reso_h=32, reso_w=32, batch_size=8, v_batch_size=8,
                           compute_dtype="float32", warmup=1, learning_rate=1e-3)
        tr = SyntheticImageSource(n=48, canonical=64, seed=args.seed)
        va = SyntheticImageSource(n=32, canonical=64, seed=args.seed + 1)

    anon = train_anonymizer(
        ano, train_items=train_items, val_items=val_items, vispr_source=vispr,
        save_dir=save, max_epochs=ep,
    )
    raw = train_privacy(pp.replace(anon=False, run_id="validate_priv_raw"),
                        train_source=tr, val_source=va, save_dir=save, max_epochs=3,
                        log_fn=lambda s: None)
    anonp = train_privacy(pp.replace(anon=True, run_id="validate_priv_anon"),
                          train_source=tr, val_source=va, save_dir=save,
                          fa_variables=anon["fa_variables"], max_epochs=3,
                          log_fn=lambda s: None)

    delta = raw["best_cmap"] - anonp["best_cmap"]
    print(f"\nprivacy cMAP raw:        {raw['best_cmap']:.4f}")
    print(f"privacy cMAP anonymized: {anonp['best_cmap']:.4f}")
    print(f"reduction:               {delta:+.4f} ({'privacy protected' if delta > 0 else 'no gain at this scale'})")


if __name__ == "__main__":
    main()
