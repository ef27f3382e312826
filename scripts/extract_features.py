"""Feature-extraction entry point (reference: feature_extraction/dali_extraction.py +
st_feature_extraction.py).

Synthetic: ``python scripts/extract_features.py --synthetic --cpu``.
File-backed: --videos_glob 'path/*/*.mp4' (+ --saved_model_fa/--saved_model_ft).
Multi-host: --shard_id/--num_shards split the list (DALI sharding equivalent).
"""

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


def main() -> None:
    ap = base_parser(__doc__)
    add_extraction_args(ap)
    ap.add_argument("--out_dir", type=str, default="features")
    ap.add_argument("--shard_id", type=int, default=0)
    ap.add_argument("--num_shards", type=int, default=1)
    args = ap.parse_args()
    setup_platform(args)

    from ted_spad_tpu.config.params import FeatureExtractionParams
    from ted_spad_tpu.stages.feature_extraction import extract_features

    p = finalize_params(FeatureExtractionParams(), args)
    p, uris, decode_hw = resolve_extraction_inputs(args, p, n_synthetic=4)

    res = extract_features(
        p, uris, args.out_dir, batch_size=args.batch, decode_hw=decode_hw,
        shard_id=args.shard_id, num_shards=args.num_shards, mesh=maybe_mesh(args),
        decode_mode=args.decode_mode, num_workers=args.num_workers,
    )
    print(f"done; {res['clips']} clips @ {res['clips_per_sec']:.2f} clips/s"
          + (f"; {len(res['skipped'])} videos skipped (undecodable)" if res["skipped"] else ""))


if __name__ == "__main__":
    main()
