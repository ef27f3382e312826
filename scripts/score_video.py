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
[0, 1] on the video's REAL frame timeline: per-clip MGFN scores expand by the
extraction windowing (``clip_step`` real frames per clip) with the reference's
length-ratio redistribution to the actual decoded frame count (test.py:32-43) —
and prints one JSON line with the score summary and any ``--threshold`` exceedance
spans. Intermediate clip features land in ``<out_dir>/features/<confighash>/`` —
keyed on the extraction config (fa/ft ckpts, --raw, decode flags) so re-runs with
different flags can never silently reuse stale features, while same-config re-runs
still get resume-by-skip.

Synthetic smoke: ``python scripts/score_video.py --synthetic --cpu``.
"""

import hashlib
import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import (
    add_extraction_args,
    base_parser,
    finalize_params,
    maybe_mesh,
    resolve_extraction_inputs,
    setup_platform,
)


def spans_above(frame_scores, threshold: float) -> list[tuple[int, int]]:
    """[start, end) frame spans where the score exceeds threshold (serving summary)."""
    import numpy as np

    above = np.asarray(frame_scores) > threshold
    if above.size == 0:
        return []
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
    p, uris, decode_hw = resolve_extraction_inputs(args, p, n_synthetic=2)

    mp = MGFNParams.for_dataset(args.datasetname)
    if args.synthetic:
        # ft still emits 2048-d features at tiny spatial size; shrink only MGFN's
        # internal dims so random-init scoring stays CPU-cheap.
        mp = mp.replace(dims=(16, 32, 64), depths=(1, 1, 1), dim_head=16)

    # Feature cache keyed on the full extraction config: a re-run with different
    # flags (e.g. --raw dropped, another fa checkpoint, other decode settings) must
    # re-extract, never resume-by-skip onto stale features from the old config.
    cfg = f"{p!r}|{args.decode_mode}|{decode_hw}"
    feat_dir = _os.path.join(args.out_dir, "features",
                             hashlib.sha1(cfg.encode()).hexdigest()[:12])
    score_dir = _os.path.join(args.out_dir, "scores")
    _os.makedirs(feat_dir, exist_ok=True)
    _os.makedirs(score_dir, exist_ok=True)
    with open(_os.path.join(feat_dir, "_extract_config.txt"), "w") as f:
        f.write(cfg + "\n")
    res = extract_features(
        p, uris, feat_dir, batch_size=args.batch, decode_hw=decode_hw,
        mesh=maybe_mesh(args), decode_mode=args.decode_mode,
        num_workers=args.num_workers,
    )
    feat_paths = {**res["existing"], **res["saved"]}

    model, variables = load_mgfn_model(mp, saved_model_file=args.mgfn_ckpt, ncrops=1)
    score_fn = make_score_fn(model)
    summaries = []
    checked_dim = False
    for uri in uris:
        if uri not in feat_paths:
            summaries.append({"video": uri, "error": res["skipped"].get(uri, "no features")})
            print(json.dumps(summaries[-1]))
            continue
        raw_feats = np.load(feat_paths[uri])  # (T, F)
        if not checked_dim:
            if raw_feats.shape[-1] != mp.feature_size:
                raise SystemExit(
                    f"extracted features are {raw_feats.shape[-1]}-d but the "
                    f"--datasetname {args.datasetname} MGFN preset (and its checkpoint) "
                    f"expects {mp.feature_size}-d — match the extractor to the "
                    f"checkpoint (e.g. XD's 1024-d presets need an i3d ft: pass a "
                    f"--params file with arch_ft='i3d')"
                )
            checked_dim = True
        feats = test_features(raw_feats)  # (T, 1, F+1) with magnitude
        video, mask, t = padded_test_batch(feats)
        clip_scores = np.asarray(score_fn(variables, video, mask))[0, :t]
        # Expand to the REAL frame timeline: each clip window covers p.clip_step
        # decoded frames; the reference's ratio redistribution absorbs the tail
        # (a final partial window / palindromed short clip), so span indices line
        # up with the actual video, not a 32-frames-per-clip assumption.
        try:
            from ted_spad_tpu.data.video_reader import open_video

            vr = open_video(uri, decode_hw[1], decode_hw[0])
            n_frames = len(vr)
            vr.close()
        except Exception:  # noqa: BLE001 — header re-read is best-effort
            n_frames = t * p.clip_step
        frames = frame_level_scores(clip_scores, n_frames, frames_per_clip=p.clip_step)
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
    add_extraction_args(ap)
    ap.add_argument("--out_dir", type=str, default="scores_out")
    ap.add_argument("--mgfn_ckpt", type=str, default=None,
                    help="trained MGFN checkpoint (mgfn_model_state_dict); "
                         "random init if omitted (smoke runs only)")
    ap.add_argument("--datasetname", type=str, default="UCF", choices=["UCF", "ST", "XD"],
                    help="MGFN preset the checkpoint was trained with (model dims, "
                         "feature size); the score timeline itself follows the "
                         "extraction windowing")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="frame-score threshold for the reported anomaly spans")
    args = ap.parse_args()
    setup_platform(args)
    run(args)


if __name__ == "__main__":
    main()
