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
    ap.add_argument("--lr", type=float, default=None,
                    help="adversarial base LR override (reference scale defaults to "
                         "2e-5 — see the in-branch rationale)")
    ap.add_argument("--attack_epochs", type=int, default=None,
                    help="privacy-attacker training epochs (default 8 reference / 3 tiny)")
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
    attack_ep = args.attack_epochs or (8 if args.scale == "reference" else 3)

    if args.scale == "reference":
        # FULL production scale (params_anonymization.py:52-59: 8 videos x 3 views +
        # 12 VISPR pairs, 16 frames 224^2, bf16) — remat='auto' resolves ON at this
        # size; measured on a 16 GB v5e: fa step 517 ms, fused fb/ft step 182 ms,
        # no OOM (scripts/bench_remat.py, round 4). Videos are decode-shaped
        # 240x320, images 256-canonical with style="attrs" (every privacy attribute
        # visually encoded — see SyntheticImageSource) so the raw attacker has real
        # signal to lose.
        #
        # LR rationale (VERDICT r4 #1 — the r4 run's 16 videos x 4 epochs gave fa
        # only ~4 updates at the reference LR 4e-6 and, unsurprisingly, "no gain"):
        # the reference trains thousands of fa steps; this run takes ~ep x 3. Base
        # LR 2e-5 (2x reference) x 60 steps matches the TOTAL fa parameter movement
        # of the validated tiny-scale run (1e-4 x 12 steps). 1e-4 itself was
        # observed to blow fa up at 224² bf16 (finite train losses, NaN val
        # logits); 2e-5 keeps the margin while making the mechanism observable.
        ep = args.epochs or 20
        ano = AnonymizationParams(
            run_id="validate_anon", num_classes=4, batch_size=8, batch_size_vispr=12,
            v_batch_size=4, num_modes=2, save_acc_threshold=-1.0,
            learning_rate=args.lr or 2e-5,
        )
        train_items = synthetic_video_items(48, 4, num_frames=96, h=240, w=320, seed=args.seed)
        val_items = synthetic_video_items(12, 4, num_frames=96, h=240, w=320, seed=args.seed + 1)
        vispr = SyntheticImageSource(n=160, canonical=256, seed=args.seed, style="attrs")
        pp = PrivacyParams(batch_size=8, v_batch_size=8, warmup=1, learning_rate=1e-3,
                           compute_dtype="bfloat16")
        tr = SyntheticImageSource(n=256, canonical=256, seed=args.seed, style="attrs")
        va = SyntheticImageSource(n=128, canonical=256, seed=args.seed + 1, style="attrs")
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
                        train_source=tr, val_source=va, save_dir=save,
                        max_epochs=attack_ep, log_fn=print)
    anonp = train_privacy(pp.replace(anon=True, run_id="validate_priv_anon"),
                          train_source=tr, val_source=va, save_dir=save,
                          fa_variables=anon["fa_variables"], max_epochs=attack_ep,
                          log_fn=print)

    delta = raw["best_cmap"] - anonp["best_cmap"]
    print(f"\nprivacy cMAP raw:        {raw['best_cmap']:.4f}")
    print(f"privacy cMAP anonymized: {anonp['best_cmap']:.4f}")
    print(f"reduction:               {delta:+.4f} ({'privacy protected' if delta > 0 else 'no gain at this scale'})")


if __name__ == "__main__":
    main()
