"""One-command parity harness vs the reference's headline numbers (BASELINE.md):
seed conversion -> the five training stages driven by the REAL reference params files ->
raw-vs-anonymized delta report (VISPR cMAP, frame-level ROC AUC).

Targets (reference README.md:11): cMAP change after anonymization -32.25% (relative),
UCF-Crime frame AUC cost -3.69 pts (absolute).

Dry run (no datasets, no seeds — validates the ENTIRE chain on synthetic data, with the
torch seed state-dicts synthesized from the hand-built oracle models and converted
through the exact production converter path):

    python scripts/run_parity.py --dry-run --cpu

Real data (paths default to ted_spad_tpu/config/paths.py; seeds are the reference's
published artifacts):

    python scripts/run_parity.py \
        --seeds_dir saved_models \
        --ucf101_train_list ucf101/trainlist01.txt --ucf101_val_list ucf101/testlist01.txt \
        --ucf101_videos ucf101/videos --vispr_train vispr --vispr_test vispr_test \
        --crime_glob 'UCF_Crimes/Train/*/*.mp4' \
        --crime_test_glob 'UCF_Crimes/Test/*/*.mp4' --crime_gt gt-parity.npy \
        --params_dir /root/reference

The MGFN AUC is scored on --crime_test_glob (the reference's held-out test split);
``--crime_gt`` must hold frame labels concatenated in the test-video order the run
writes to ``<save_dir>/parity_crime_order.txt`` (build it with scripts/make_gt.py over
that list — gt length is validated against the extracted clip counts before scoring).

Stage order mirrors the reference workflow (README.md:54-92): ft action training ->
fa reconstruction pretraining -> adversarial anonymization -> privacy attack raw+anon ->
feature extraction raw+anon -> MGFN raw+anon -> delta report (parity_report.json).
"""

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import glob
import os
import tempfile

BASELINE_CMAP_DELTA_PCT = -32.25  # README.md:11
BASELINE_AUC_DELTA_PTS = -3.69  # README.md:11

REF_PARAMS = {
    "action": "action_training/params_action.py",
    "recon": "fa_pretraining/parameters.py",
    "anon": "anonymization_training/params_anonymization.py",
    "privacy": "privacy_training/params_privacy.py",
    "extract": "feature_extraction/params_feature_ex.py",
}


def _maybe_overlay(params, params_dir: str | None, key: str):
    """Overlay the real reference params file when available (drop-in config parity,
    config/params.apply_params_file); silently keep defaults otherwise."""
    from ted_spad_tpu.config.params import apply_params_file

    if not params_dir:
        return params
    path = os.path.join(params_dir, REF_PARAMS[key])
    if os.path.exists(path):
        return apply_params_file(params, path)
    return params


def _oracle_state_dicts(tmp: str) -> dict[str, str]:
    """Dry-run seed synthesis: build the hand-built torch oracle models (the same ones
    the converter parity tests use) and torch.save their state_dicts — so conversion
    exercises the REAL load_torch_checkpoint -> convert_* path end to end."""
    import importlib.util

    import torch

    def load_mod(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    tests_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
    oracles = load_mod("parity_oracles", os.path.join(tests_dir, "test_torch_oracles.py"))
    convert = load_mod("parity_convert", os.path.join(tests_dir, "test_torch_convert.py"))

    out = {}
    m = oracles._torch_i3res50(num_classes=400).eval()
    torch.save(m.state_dict(), os.path.join(tmp, "i3d_r50_kinetics.pth"))
    out["largei3d"] = os.path.join(tmp, "i3d_r50_kinetics.pth")
    m = convert._torch_resnet18_encoder().eval()
    torch.save(m.state_dict(), os.path.join(tmp, "resnet18_imagenet.pth"))
    out["unet++"] = os.path.join(tmp, "resnet18_imagenet.pth")
    m = convert._torch_resnet50(num_classes=1000).eval()
    torch.save(m.state_dict(), os.path.join(tmp, "resnet50_imagenet.pth"))
    out["r50"] = os.path.join(tmp, "resnet50_imagenet.pth")
    return out


def convert_seeds(seed_srcs: dict[str, str], out_dir: str, num_classes: int, log) -> dict[str, str]:
    """Converts the three seeds the pipeline consumes — ft largei3d (Kinetics), fa UNet++
    encoder (ImageNet r18), fb predictor (ImageNet r50) — through the SAME
    ``convert_seed_payload`` used by scripts/convert_weights.py (shared kind->converter->
    payload-key mapping; small init shapes keep conversion cheap)."""
    from ted_spad_tpu.utils.checkpoint import save_checkpoint
    from ted_spad_tpu.utils.torch_convert import convert_seed_payload, load_torch_checkpoint

    os.makedirs(out_dir, exist_ok=True)
    names = {"largei3d": "ft", "unet++": "fa", "r50": "fb"}
    files = {"largei3d": "ft_largei3d_seed.ckpt", "unet++": "fa_unetpp_seed.ckpt",
             "r50": "fb_r50_seed.ckpt"}
    paths = {}
    for kind, slot in names.items():
        if kind not in seed_srcs:
            continue
        sd = load_torch_checkpoint(seed_srcs[kind])
        payload = convert_seed_payload(
            kind, sd, num_classes=num_classes, clip_shape=(8, 32, 32),
            image_size=(32, 32),
        )
        paths[slot] = os.path.join(out_dir, files[kind])
        save_checkpoint(paths[slot], payload)
    log(f"converted seeds: {sorted(paths)}")
    return paths


def run_parity(args) -> dict:
    import numpy as np

    from ted_spad_tpu.config.params import (
        AnonymizationParams,
        FeatureExtractionParams,
        MGFNParams,
        PrivacyParams,
        ReconstructionParams,
    )
    from ted_spad_tpu.stages.anomaly_detection import train_anomaly_detection
    from ted_spad_tpu.stages.anonymization_training import train_anonymizer
    from ted_spad_tpu.stages.fa_pretraining import train_reconstruction
    from ted_spad_tpu.stages.feature_extraction import extract_features
    from ted_spad_tpu.stages.privacy_training import train_privacy

    log = print
    save = args.save_dir
    os.makedirs(save, exist_ok=True)
    dry = args.dry_run
    ep = args.epochs

    # ---- phase 0: seeds -----------------------------------------------------------
    if dry:
        tmp = tempfile.mkdtemp(prefix="parity_seeds_")
        seed_srcs = _oracle_state_dicts(tmp)
    else:
        seed_srcs = {}
        names = {
            "largei3d": "i3d_r50_kinetics.pth",
            "unet++": "resnet18_imagenet.pth",
            "r50": "resnet50_imagenet.pth",
        }
        for kind, fname in names.items():
            path = os.path.join(args.seeds_dir or "saved_models", fname)
            if os.path.exists(path):
                seed_srcs[kind] = path
            else:
                log(f"WARNING: seed {path} missing — {kind} starts from random init")
    num_classes = 4 if dry else 102
    seeds = convert_seeds(seed_srcs, os.path.join(save, "seeds"), num_classes, log)

    # ---- data ---------------------------------------------------------------------
    if dry:
        from ted_spad_tpu.data.images import ReconstructionSource, SyntheticImageSource
        from ted_spad_tpu.data.videos import synthetic_video_items

        tiny = getattr(args, "tiny", False)
        nv = 4 if tiny else 8
        train_items = synthetic_video_items(nv, 4, num_frames=48, h=48, w=64, seed=args.seed)
        val_items = synthetic_video_items(max(nv // 2, 2), 4, num_frames=48, h=48, w=64, seed=args.seed + 1)
        vispr_train = SyntheticImageSource(n=8 if tiny else 16, canonical=64)
        vispr_test = SyntheticImageSource(n=8 if tiny else 16, canonical=64, seed=1)
        recon_train = ReconstructionSource(synthetic_n=8 if tiny else 16, canonical=64)
        recon_val = ReconstructionSource(synthetic_n=8, canonical=64, seed=1)
        from scripts._common import synthetic_crime_fixture

        nfam = 2 if tiny else 3
        crime_uris, crime_gt, abnormal_split = synthetic_crime_fixture(nfam, nfam)
        test_uris = crime_uris  # synthetic: plumbing check, train==test by design
        decode_hw = (48, 64)
        shape_kw = dict(num_frames=8, reso_h=32, reso_w=32, compute_dtype="float32")
    else:
        from ted_spad_tpu.data.images import ReconstructionSource, VisprImageSource
        from ted_spad_tpu.data.videos import load_ucf101_list

        train_items = load_ucf101_list(args.ucf101_train_list, args.ucf101_videos)
        val_items = load_ucf101_list(args.ucf101_val_list, args.ucf101_videos)
        labels_dir = args.vispr_labels or "vispr_labels"
        vispr_train = VisprImageSource(args.vispr_train, os.path.join(labels_dir, "train_labels.pkl"))
        vispr_test = VisprImageSource(args.vispr_test, os.path.join(labels_dir, "test_labels.pkl"))
        recon_paths = sorted(glob.glob(os.path.join(args.vispr_train, "*.jpg")))
        if args.ucf101_frames:
            recon_paths += sorted(glob.glob(os.path.join(args.ucf101_frames, "*", "*.jpg")))
        recon_train = ReconstructionSource(image_paths=recon_paths)
        recon_val = recon_train
        # FeatureDataset's normal/abnormal split takes the FIRST ``abnormal_split``
        # entries as abnormal (datasets/dataset.py:26-48) — a plain sorted() glob
        # interleaves the normal-video directories among the crime categories, so
        # partition abnormal-first explicitly and derive the split from the count.
        # UCF-Crime's normal dirs CONTAIN 'normal' but need not start with it
        # (Testing_Normal_Videos_Anomaly, Training-Normal-Videos).
        all_uris = sorted(glob.glob(args.crime_glob))
        _is_normal = lambda u: "normal" in os.path.basename(os.path.dirname(u)).lower()
        crime_uris = [u for u in all_uris if not _is_normal(u)] + [
            u for u in all_uris if _is_normal(u)
        ]
        abnormal_split = sum(1 for u in crime_uris if not _is_normal(u))
        # Held-out test videos: the reference trains MGFN on the 1610-video train
        # split and reports AUC on the 290-video test split. Without a separate
        # test glob the harness falls back to scoring the training videos — a
        # plumbing check, NOT the reference's test-split AUC.
        if args.crime_test_glob:
            test_uris = sorted(glob.glob(args.crime_test_glob))
        else:
            test_uris = crime_uris
            log("WARNING: no --crime_test_glob — MGFN AUC will be measured on the "
                "TRAINING videos (not comparable to the reference's test-split AUC)")
        # gt must be per-video frame labels concatenated in EXACTLY the test order;
        # persist the order so make_gt can be run against it.
        os.makedirs(args.save_dir, exist_ok=True)
        order_file = os.path.join(args.save_dir, "parity_crime_order.txt")
        open(order_file, "w").write("\n".join(test_uris) + "\n")
        crime_gt = np.load(args.crime_gt)
        decode_hw = (240, 320)
        shape_kw = {}

    # ---- phase 1a: ft action training on UCF101 ----------------------------------
    # The reference seeds anonymization with a UCF101-finetuned ft (ft_i3d_ucf101.pth,
    # train_anonymizer.py:336) built by action_training from the Kinetics seed.
    log("== parity 0/6: ft action training (UCF101)")
    from ted_spad_tpu.config.params import ActionParams
    from ted_spad_tpu.stages.action_training import train_action

    act = _maybe_overlay(ActionParams(run_id="parity_action"), args.params_dir, "action")
    act = act.replace(num_classes=num_classes, saved_model=seeds.get("ft"),
                      temporal_loss="trip")
    if dry:
        act = act.replace(batch_size=4, v_batch_size=4, num_modes=2, val_freq=1, **shape_kw)
    action = train_action(act, train_items=train_items, val_items=val_items,
                          save_dir=save, max_epochs=ep, decode_hw=decode_hw, seed=args.seed)
    ft_seed_path = action["best_path"] or seeds.get("ft")

    # ---- phase 1: fa reconstruction pretraining ----------------------------------
    log("== parity 1/6: fa reconstruction pretraining")
    rp = _maybe_overlay(ReconstructionParams(run_id="parity_recon"), args.params_dir, "recon")
    if dry:
        rp = rp.replace(batch_size=8, warmup=1, **{k: v for k, v in shape_kw.items() if k != "num_frames"})
    rec = train_reconstruction(rp, train_source=recon_train, val_source=recon_val,
                               save_dir=save, max_epochs=ep, seed=args.seed)

    # ---- phase 2: adversarial anonymization --------------------------------------
    log("== parity 2/6: adversarial anonymization")
    ano = _maybe_overlay(AnonymizationParams(run_id="parity_anon"), args.params_dir, "anon")
    # fb seed: the reference loads an SSL-pretrained fb (fb_ssl.pth, an EXTERNAL
    # artifact with the SimCLR projection head — train_anonymizer.py:338); the
    # ImageNet r50 seed converted above is the headless predictor and does NOT fit
    # this slot. Accept a pre-converted framework ckpt via --fb_ssl_ckpt; fresh
    # init otherwise (documented divergence when the artifact is absent).
    ano = ano.replace(
        saved_model_fa=rec["best_path"] or seeds.get("fa"),
        saved_model_ft=ft_seed_path, saved_model_fb=args.fb_ssl_ckpt,
        num_classes=num_classes,
    )
    if dry:
        ano = ano.replace(batch_size=2, batch_size_vispr=4, v_batch_size=2, num_modes=2,
                          save_acc_threshold=-1.0, **shape_kw)
    anon = train_anonymizer(ano, train_items=train_items, val_items=val_items,
                            vispr_source=vispr_train, save_dir=save,
                            max_epochs=ep, seed=args.seed)

    # ---- phase 3: privacy attack, raw vs anonymized ------------------------------
    log("== parity 3/6: privacy attack (raw)")
    pp = _maybe_overlay(PrivacyParams(run_id="parity_priv_raw"), args.params_dir, "privacy")
    if dry:
        pp = pp.replace(batch_size=8, v_batch_size=8, warmup=1,
                        **{k: v for k, v in shape_kw.items() if k != "num_frames"})
    priv_raw = train_privacy(pp.replace(anon=False), train_source=vispr_train,
                             val_source=vispr_test, save_dir=save, max_epochs=ep, seed=args.seed)
    log("== parity 3/6: privacy attack (anonymized)")
    priv_anon = train_privacy(
        pp.replace(anon=True, run_id="parity_priv_anon"), train_source=vispr_train,
        val_source=vispr_test, save_dir=save, fa_variables=anon["fa_variables"],
        max_epochs=ep, seed=args.seed,
    )

    # ---- phase 4: feature extraction, raw vs anonymized --------------------------
    log("== parity 4/6: feature extraction (raw + anonymized)")
    fx = _maybe_overlay(FeatureExtractionParams(run_id="parity_extract"), args.params_dir, "extract")
    fx = fx.replace(num_classes=num_classes, **(shape_kw if dry else {}))
    feats = {}
    extract_uris = crime_uris + [u for u in test_uris if u not in set(crime_uris)]
    for branch, fa_vars in (("raw", None), ("anon", anon["fa_variables"])):
        res = extract_features(
            fx.replace(anonymized=branch == "anon"), extract_uris,
            os.path.join(save, f"parity_features_{branch}"),
            fa_variables=fa_vars, ft_variables=anon["ft_variables"],
            batch_size=4 if dry else max(fx.batch_size, 8), decode_hw=decode_hw,
            num_workers=args.num_workers,
        )
        if res["skipped"]:
            log(f"   {branch}: skipped {len(res['skipped'])} undecodable videos")
        feats[branch] = res

    # ---- phase 5: MGFN, raw vs anonymized ----------------------------------------
    log("== parity 5/6: MGFN anomaly detection (raw + anonymized)")
    import ted_spad_tpu.data.features as fm

    aucs = {}
    old_split = fm.ABNORMAL_SPLIT.get("UCF")
    fm.ABNORMAL_SPLIT["UCF"] = abnormal_split
    try:
        for branch in ("raw", "anon"):
            # gt is per-video frame labels concatenated in TEST order — the test
            # feature list MUST stay aligned with it. Resumed artifacts come back in
            # ``existing``; a video missing from both (undecodable, skipped) would
            # silently shift every later video's labels, so refuse to score.
            available = {**feats[branch].get("existing", {}), **feats[branch]["saved"]}
            missing = [u for u in extract_uris if u not in available]
            if missing:
                raise RuntimeError(
                    f"{branch}: {len(missing)} video(s) have no features (skipped or "
                    f"failed: {missing[:3]}...) — gt alignment would break; fix or "
                    "drop them from BOTH the video list and the gt before scoring"
                )
            train_paths = [available[u] for u in crime_uris]
            test_paths = [available[u] for u in test_uris]
            # Validate gt length against the actual extracted clip counts — the
            # scorer's length-ratio interpolation fallback (ops/metrics.py) would
            # otherwise rescale a misaligned gt into a plausible-looking garbage
            # AUC. gt for UCF is 32 frames per clip (test.py repeat x32).
            total_clips = sum(
                int(np.load(p, mmap_mode="r").shape[0]) for p in test_paths
            )
            if len(crime_gt) != total_clips * 32:
                raise RuntimeError(
                    f"{branch}: gt has {len(crime_gt)} frames but the test features "
                    f"cover {total_clips} clips = {total_clips * 32} frames — the gt "
                    "was not built for this video list/order; rebuild it with "
                    "scripts/make_gt.py over parity_crime_order.txt"
                )
            lst = os.path.join(save, f"parity_{branch}.list")
            open(lst, "w").write("\n".join(train_paths) + "\n")
            tlst = os.path.join(save, f"parity_{branch}_test.list")
            open(tlst, "w").write("\n".join(test_paths) + "\n")
            mp = MGFNParams(rgb_list=lst, test_rgb_list=tlst, feature_size=2048,
                            model_name=f"parity_mgfn_{branch}")
            if dry:
                mp = mp.replace(dims=(16, 32, 64), depths=(1, 1, 1), dim_head=16,
                                batch_size=2 if getattr(args, 'tiny', False) else 3,
                                dropout_rate=0.3)
            mg = train_anomaly_detection(mp, save_dir=save, gt=crime_gt,
                                         max_epochs=max(ep, 2), shuffle=True)
            aucs[branch] = max(mg["history"]["test_AUC"])
    finally:
        if old_split is not None:
            fm.ABNORMAL_SPLIT["UCF"] = old_split

    # ---- phase 6: delta report ---------------------------------------------------
    log("== parity 6/6: delta report")
    cmap_raw, cmap_anon = priv_raw["best_cmap"], priv_anon["best_cmap"]
    cmap_delta_pct = (cmap_anon - cmap_raw) / max(cmap_raw, 1e-9) * 100.0
    auc_delta_pts = (aucs["anon"] - aucs["raw"]) * 100.0
    report = {
        "mode": "dry-run (synthetic; deltas NOT comparable to baseline)" if dry else "real-data",
        "cmap_raw": cmap_raw,
        "cmap_anon": cmap_anon,
        "cmap_delta_pct": cmap_delta_pct,
        "cmap_delta_target_pct": BASELINE_CMAP_DELTA_PCT,
        "auc_raw": aucs["raw"],
        "auc_anon": aucs["anon"],
        "auc_delta_pts": auc_delta_pts,
        "auc_delta_target_pts": BASELINE_AUC_DELTA_PTS,
        "extraction_clips_per_sec": feats["anon"]["clips_per_sec"],
        "seeds_converted": sorted(seeds),
    }
    out = os.path.join(save, "parity_report.json")
    json.dump(report, open(out, "w"), indent=2)
    log(f"  cMAP  raw {cmap_raw:.4f} -> anon {cmap_anon:.4f}  "
        f"delta {cmap_delta_pct:+.2f}% (target {BASELINE_CMAP_DELTA_PCT}%)")
    log(f"  AUC   raw {aucs['raw']:.4f} -> anon {aucs['anon']:.4f}  "
        f"delta {auc_delta_pts:+.2f} pts (target {BASELINE_AUC_DELTA_PTS} pts)")
    log(f"  report: {out}")
    return report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--dry-run", action="store_true",
                    help="synthetic data + oracle-synthesized seeds; validates the chain")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save_dir", default="parity_runs")
    ap.add_argument("--epochs", type=int, default=1, help="epochs per stage (dry-run: 1)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true", help="smallest dry-run (CI test scale)")
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--seeds_dir", default=None)
    ap.add_argument("--fb_ssl_ckpt", default=None,
                    help="pre-converted SSL fb checkpoint (the reference's fb_ssl.pth slot)")
    ap.add_argument("--params_dir", default=None,
                    help="reference checkout root; its params_*.py files overlay our configs")
    ap.add_argument("--ucf101_train_list"), ap.add_argument("--ucf101_val_list")
    ap.add_argument("--ucf101_videos"), ap.add_argument("--ucf101_frames")
    ap.add_argument("--vispr_train"), ap.add_argument("--vispr_test")
    ap.add_argument("--vispr_labels", help="dir with {train,test}_labels.pkl (vispr_labels/)")
    ap.add_argument("--crime_glob", help="UCF-Crime TRAINING videos glob")
    ap.add_argument("--crime_test_glob",
                    help="held-out test videos glob (reference test split); without it "
                    "the MGFN AUC is measured on the training videos")
    ap.add_argument("--crime_gt",
                    help=".npy frame labels concatenated in parity_crime_order.txt "
                    "order (build with scripts/make_gt.py)")
    args = ap.parse_args()
    from scripts._common import setup_platform

    args.devices = 0  # setup_platform contract (base_parser field not used here)
    setup_platform(args)
    if not args.dry_run:
        required = ["ucf101_train_list", "ucf101_val_list", "ucf101_videos",
                    "vispr_train", "vispr_test", "crime_glob", "crime_gt"]
        missing = [r for r in required if not getattr(args, r)]
        if missing:
            raise SystemExit(f"real-data mode needs --{' --'.join(missing)} (or use --dry-run)")
    run_parity(args)


if __name__ == "__main__":
    main()
