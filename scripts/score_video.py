"""One-command anomaly scoring for raw videos: decode -> (fa) -> ft -> MGFN frame scores.

The reference has NO single-video inference path — scoring a new video means running
feature_extraction/dali_extraction.py to .npy, hand-editing a .list file, then driving
anomaly_detection_mgfn/test.py over the whole set (test.py:13-51). This entry point
composes the same trained artifacts into one serving-style command:

    python scripts/score_video.py --videos_glob 'cam/*.mp4' \
        --mgfn_ckpt saved_models/mgfn_ucf_best.ckpt \
        --saved_model_fa saved_models/fa_best.ckpt \
        --saved_model_ft saved_models/ft_best.ckpt --out_dir scores

Per video it writes ``<out_dir>/scores/<name>.npy`` — frame-level anomaly scores in
[0, 1] (per-clip MGFN scores expanded by ``frames_per_clip``, exactly the reference's
repeat rule, test.py:32-43) — and prints one JSON line with the score summary and any
``--threshold`` exceedance spans. Intermediate 2048-d clip features land in
``<out_dir>/features`` (same artifacts as scripts/extract_features.py; re-runs reuse
them via resume-by-skip).

Synthetic smoke: ``python scripts/score_video.py --synthetic --cpu``.
"""

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, finalize_params, maybe_mesh, setup_platform


def spans_above(frame_scores, threshold: float) -> list[tuple[int, int]]:
    """[start, end) frame spans where the score exceeds threshold (serving summary)."""
    import numpy as np

    above = np.asarray(frame_scores) > threshold
    edges = np.flatnonzero(np.diff(above.astype(np.int8)))
    starts = list(edges[~above[edges]] + 1)
    ends = list(edges[above[edges]] + 1)
    if above[0]:
        starts.insert(0, 0)
    if above[-1]:
        ends.append(len(above))
    return [[int(s), int(e)] for s, e in zip(starts, ends)]  # plain ints: JSON-safe


def run(args) -> list[dict]:
    """Score every matched video; returns the per-video summary list (also written to
    ``<out_dir>/summary.json``). Split from main() so tests drive it in-process."""
    import numpy as np

    from ted_spad_tpu.config.params import FeatureExtractionParams, MGFNParams
    from ted_spad_tpu.data.features import padded_test_batch
    from ted_spad_tpu.models import load_mgfn_model
    from ted_spad_tpu.ops.metrics import frame_level_scores
    from ted_spad_tpu.ops.temporal import test_features
    from ted_spad_tpu.stages.anomaly_detection import make_score_fn
    from ted_spad_tpu.stages.feature_extraction import extract_features

    p = finalize_params(FeatureExtractionParams(), args)
    overrides = {"anonymized": not args.raw}
    if args.saved_model_fa:
        overrides["saved_model_fa"] = args.saved_model_fa
    if args.saved_model_ft:
        overrides["saved_model_ft"] = args.saved_model_ft
    p = p.replace(**overrides)

    mp = MGFNParams.for_dataset(args.datasetname)
    if args.synthetic:
        p = p.replace(num_frames=8, reso_h=32, reso_w=32, compute_dtype="float32")
        uris = [f"synthetic://n=120,h=40,w=80,seed={i}" for i in range(2)]
        decode_hw = (40, 80)
        # ft still emits 2048-d features at tiny spatial size; shrink only MGFN's
        # internal dims so random-init scoring stays CPU-cheap.
        mp = mp.replace(dims=(16, 32, 64), depths=(1, 1, 1), dim_head=16)
    else:
        import glob as _glob

        assert args.videos_glob, "pass --videos_glob or --synthetic"
        uris = sorted(_glob.glob(args.videos_glob))
        decode_hw = tuple(args.decode_hw) if args.decode_hw else (240, 320)

    feat_dir = _os.path.join(args.out_dir, "features")
    score_dir = _os.path.join(args.out_dir, "scores")
    _os.makedirs(score_dir, exist_ok=True)
    res = extract_features(
        p, uris, feat_dir, batch_size=args.batch, decode_hw=decode_hw,
        mesh=maybe_mesh(args), decode_mode=args.decode_mode,
        num_workers=args.num_workers,
    )
    feat_paths = {**res["existing"], **res["saved"]}

    model, variables = load_mgfn_model(mp, saved_model_file=args.mgfn_ckpt, ncrops=1)
    score_fn = make_score_fn(model)
    summaries = []
    for uri in uris:
        if uri not in feat_paths:
            summaries.append({"video": uri, "error": res["skipped"].get(uri, "no features")})
            print(json.dumps(summaries[-1]))
            continue
        feats = test_features(np.load(feat_paths[uri]))  # (T, 1, 2049) with magnitude
        video, mask, t = padded_test_batch(feats)
        clip_scores = np.asarray(score_fn(variables, video, mask))[0, :t]
        frames = frame_level_scores(clip_scores, t * mp.frames_per_clip,
                                    frames_per_clip=mp.frames_per_clip)
        out = _os.path.join(score_dir, _os.path.basename(feat_paths[uri]))
        np.save(out, frames)
        summaries.append({
            "video": uri,
            "scores": out,
            "clips": int(t),
            "frames": int(len(frames)),
            "max_score": round(float(frames.max()), 4),
            "mean_score": round(float(frames.mean()), 4),
            "spans_above_threshold": spans_above(frames, args.threshold),
        })
        print(json.dumps(summaries[-1]))
    with open(_os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump({"threshold": args.threshold, "videos": summaries}, f, indent=1)
    return summaries


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--videos_glob", type=str, default=None)
    ap.add_argument("--out_dir", type=str, default="scores_out")
    ap.add_argument("--mgfn_ckpt", type=str, default=None,
                    help="trained MGFN checkpoint (mgfn_model_state_dict); "
                         "random init if omitted (smoke runs only)")
    ap.add_argument("--saved_model_fa", type=str, default=None)
    ap.add_argument("--saved_model_ft", type=str, default=None)
    ap.add_argument("--raw", action="store_true", help="skip anonymization (raw features)")
    ap.add_argument("--datasetname", type=str, default="UCF", choices=["UCF", "ST", "XD"],
                    help="MGFN preset the checkpoint was trained with (frames/clip etc.)")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="frame-score threshold for the reported anomaly spans")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--decode_mode", type=str, default="rgb", choices=["rgb", "yuv"])
    ap.add_argument("--decode_hw", type=int, nargs=2, default=None, metavar=("H", "W"))
    args = ap.parse_args()
    setup_platform(args)
    run(args)


if __name__ == "__main__":
    main()
