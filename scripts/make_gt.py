"""Frame-level GT builder entry point (reference: anomaly_detection_mgfn/data/
make_gt_{ucf,sh,xd}.py).

File-backed usage mirrors the reference: a test .list of per-video feature .npy files plus
dataset-specific annotations; output one concatenated gt .npy.

  UCF: --annotations_dir with <Class>_x264.mat temporal files (make_gt_ucf.py)
  ST:  --annotations_dir with test_frame_mask/*.npy (make_gt_sh.py; first 44 abnormal)
  XD:  --annotations_txt multi-span file (make_gt_xd.py; first 300 normal)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from scripts._common import base_parser, setup_platform


def main() -> None:
    ap = base_parser(__doc__)
    ap.add_argument("--dataset", type=str, required=True, choices=["UCF", "ST", "XD"])
    ap.add_argument("--test_list", type=str, required=True)
    ap.add_argument("--annotations_dir", type=str, default=None)
    ap.add_argument("--annotations_txt", type=str, default=None)
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()
    setup_platform(args)

    import os

    import numpy as np

    from ted_spad_tpu.data.features import read_list
    from ted_spad_tpu.data.gt_builders import (
        parse_xd_annotation_line,
        shanghai_video_gt,
        ucf_video_gt,
        xd_video_gt,
    )

    paths = read_list(args.test_list)
    parts = []
    if args.dataset == "UCF":
        from scipy.io import loadmat  # available via sklearn dep chain; gate if absent

        for path in paths:
            num_clips = np.load(path, allow_pickle=True).shape[0]
            nf = num_clips * 32
            if "Normal_" in path:
                parts.append(ucf_video_gt(nf, None))
                continue
            stem = os.path.basename(path).split("_")[0]
            mat = os.path.join(args.annotations_dir, stem + "_x264.mat")
            annots = loadmat(mat)["Annotation_file"]["Anno"].tolist()[0][0]
            events = [tuple(int(v) for v in row[:2]) for row in annots]
            parts.append(ucf_video_gt(nf, events))
    elif args.dataset == "ST":
        for i, path in enumerate(paths):
            num_clips = np.load(path, allow_pickle=True).shape[0]
            nf = num_clips * 16
            if i > 43:  # make_gt_sh.py:37 — first 44 are abnormal
                parts.append(shanghai_video_gt(nf, None))
            else:
                mask = np.load(os.path.join(args.annotations_dir, os.path.basename(path)))
                parts.append(shanghai_video_gt(nf, mask))
    else:  # XD
        annos = dict(
            parse_xd_annotation_line(ln) for ln in open(args.annotations_txt).read().splitlines() if ln
        )
        for i, path in enumerate(paths):
            num_clips = np.load(path, allow_pickle=True).shape[0]
            nf = num_clips * 32
            if i < 300:  # make_gt_xd.py:29 — first 300 normal
                parts.append(xd_video_gt(nf, None))
            else:
                stem = os.path.basename(path)[:-4]  # strip '.npy' (lines here are pre-stripped)
                # Exact key match first (the reference's make_gt_xd.py equality);
                # substring matching only as a suffix-tolerance fallback, and then
                # it must be UNIQUE — matches[0] on an ambiguous stem would bind
                # another video's anomaly spans to this row.
                if stem in annos:
                    spans = annos[stem]
                else:
                    matches = [k for k in annos if stem in k]
                    if not matches:
                        raise SystemExit(f"no XD annotation line matches {stem!r}")
                    if len(matches) > 1:
                        raise SystemExit(
                            f"ambiguous XD annotation match for {stem!r}: {matches[:4]}"
                        )
                    spans = annos[matches[0]]
                parts.append(xd_video_gt(nf, spans))

    gt = np.concatenate(parts)
    np.save(args.out, gt)
    print(f"wrote {args.out}: {len(gt)} frames, {gt.mean():.4f} positive rate")


if __name__ == "__main__":
    main()
