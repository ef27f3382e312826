"""Convert torch pretrained seeds into framework checkpoints.

Covers the reference's external weight artifacts (SURVEY.md §2.1 model factory row):
  - ``i3d_r50_kinetics.pth`` -> largei3d ft seed (model_loaders.py:185-197)
  - ``rgb_imagenet.pt``      -> i3d ft seed (model_loaders.py:171-182)
  - torchvision resnet50 ImageNet -> fb predictor seed (model_loaders.py:157-168)
  - torchvision resnet18 ImageNet -> UNet++ fa encoder seed (smp encoder_weights,
    model_loaders.py:18-30); smp's resnet18 encoder shares torchvision's state_dict
  - torchvision ``r3d_18(weights='DEFAULT')`` -> ft seed (model_loaders.py:203-204)
  - torchvision ``mvit_v2_s(weights='DEFAULT')`` -> ft seed (model_loaders.py:219-221)

Usage: ``python scripts/convert_weights.py --kind largei3d --src i3d_r50_kinetics.pth \
--out seeds/ft_largei3d.ckpt --num_classes 102``
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--kind", required=True,
        choices=["largei3d", "i3d", "r50", "unet++", "r3d_18", "mvitv2"],
    )
    ap.add_argument("--src", required=True, help="torch .pth/.pt (or .npz) checkpoint")
    ap.add_argument("--out", required=True, help="output .ckpt path")
    ap.add_argument("--num_classes", type=int, default=102)
    ap.add_argument("--num_pa", type=int, default=7)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    from scripts._common import setup_platform

    args.devices = 0  # setup_platform contract (no virtual-device flag here)
    setup_platform(args)

    from ted_spad_tpu.utils.checkpoint import save_checkpoint
    from ted_spad_tpu.utils.torch_convert import convert_seed_payload, load_torch_checkpoint

    sd = load_torch_checkpoint(args.src)
    payload = convert_seed_payload(
        args.kind, sd, num_classes=args.num_classes, num_pa=args.num_pa,
        image_size=(224, 224) if args.kind == "unet++" else (64, 64),
    )
    save_checkpoint(args.out, payload)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
