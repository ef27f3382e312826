"""Feature-extraction entry point (reference: feature_extraction/dali_extraction.py +
st_feature_extraction.py).

Synthetic: ``python scripts/extract_features.py --synthetic --cpu``.
File-backed: --videos_glob 'path/*/*.mp4' (+ --saved_model_fa/--saved_model_ft).
Multi-host: --shard_id/--num_shards split the list (DALI sharding equivalent).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, finalize_params, maybe_mesh, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--videos_glob", type=str, default=None)
    ap.add_argument("--out_dir", type=str, default="features")
    ap.add_argument("--saved_model_fa", type=str, default=None)
    ap.add_argument("--saved_model_ft", type=str, default=None)
    ap.add_argument("--raw", action="store_true", help="skip anonymization (raw features)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--shard_id", type=int, default=0)
    ap.add_argument("--num_shards", type=int, default=1)
    ap.add_argument("--decode_mode", type=str, default="rgb", choices=["rgb", "yuv"],
                    help="'yuv': planar ingest — half the host->device bytes, "
                         "chroma upsample + BT.601 fused into the device preprocess "
                         "(reads at native resolution; set --decode_hw to match)")
    ap.add_argument("--decode_hw", type=int, nargs=2, default=None, metavar=("H", "W"),
                    help="decode resolution (default 240 320); in yuv mode must equal "
                         "the videos' native resolution")
    ap.add_argument("--decode_fast", action="store_true",
                    help="skip the h264 in-loop deblocking filter during decode "
                         "(~8%% faster software decode; NOT bit-exact with reference "
                         "decode — sub-pixel frame differences before the 224^2 resize)")
    ap.add_argument("--num_workers", type=int, default=8,
                    help="host decode threads — the throughput knob when extraction is "
                         "decode-bound (~1 host core per software-decode thread; size to "
                         "the host's core budget)")
    args = ap.parse_args()
    setup_platform(args)

    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.stages.feature_extraction import extract_features

    p = finalize_params(FeatureExtractionParams(), args)
    overrides = {"anonymized": not args.raw}
    if args.decode_fast:  # flag only turns it on (a params-file decode_fast=True stays)
        overrides["decode_fast"] = True
    if args.saved_model_fa:  # CLI only overrides when given (params files win otherwise)
        overrides["saved_model_fa"] = args.saved_model_fa
    if args.saved_model_ft:
        overrides["saved_model_ft"] = args.saved_model_ft
    p = p.replace(**overrides)
    if args.synthetic:
        p = p.replace(num_frames=8, reso_h=32, reso_w=32, compute_dtype="float32")
        # 40x80 @ crop 0.8 -> (32, 64) at even offsets: valid for both decode modes
        # (yuv needs a chroma-aligned crop window).
        uris = [f"synthetic://n=120,h=40,w=80,seed={i}" for i in range(4)]
        decode_hw = (40, 80)
    else:
        import glob as _glob

        assert args.videos_glob, "pass --videos_glob or --synthetic"
        uris = sorted(_glob.glob(args.videos_glob))
        decode_hw = tuple(args.decode_hw) if args.decode_hw else (240, 320)

    res = extract_features(
        p, uris, args.out_dir, batch_size=args.batch, decode_hw=decode_hw,
        shard_id=args.shard_id, num_shards=args.num_shards, mesh=maybe_mesh(args),
        decode_mode=args.decode_mode, num_workers=args.num_workers,
    )
    print(f"done; {res['clips']} clips @ {res['clips_per_sec']:.2f} clips/s"
          + (f"; {len(res['skipped'])} videos skipped (undecodable)" if res["skipped"] else ""))


if __name__ == "__main__":
    main()
