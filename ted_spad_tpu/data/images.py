"""Image pipelines: VISPR privacy-attribute datasets + fa-pretraining reconstruction mix.

Reference: aux_code/vispr_dl.py (vispr_dataset:18, vispr_ssl_dataset:133,
vispr_boring_dataset:255) and fa_pretraining/reconstruction_dl.py:17.

Host/device split (TPU-first): the host decodes JPEGs (PIL) and standardizes to a fixed
canonical resolution so batches are dense; all *augmentation* runs on device through
ops/augment.py in the jitted step. This replaces the reference's per-image torchvision CPU
transforms (vispr_dl.py:71-129). Labels are 7-dim multi-hot privacy-attribute vectors from
``{split}_labels.pkl`` (vispr_dl.py:21, 41).

Divergence (documented): the reference crops on the original image resolution; we crop on
the 256-canonical host copy — the same distribution of views at metric-level parity, with
dense batching.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import numpy as np

from ted_spad_tpu.ops.augment import AugmentParams

CANONICAL = 256  # host-side canonical square size fed to device-side crops


def load_vispr_labels(pkl_path: str) -> dict[str, np.ndarray]:
    """{image_name: 7-dim multi-hot float vector} (vispr_dl.py:21)."""
    with open(pkl_path, "rb") as f:
        return pickle.load(f)


def decode_image_canonical(path: str, size: int = CANONICAL) -> np.ndarray:
    """Decode a JPEG/PNG, gray->RGB (vispr_dl.py:50-52), short-side resize + center crop to
    (size, size, 3) uint8."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        scale = size / min(w, h)
        im = im.resize((max(int(w * scale + 0.5), size), max(int(h * scale + 0.5), size)), Image.BILINEAR)
        w, h = im.size
        x0, y0 = (w - size) // 2, (h - size) // 2
        im = im.crop((x0, y0, x0 + size, y0 + size))
        return np.asarray(im, dtype=np.uint8)


class VisprImageSource:
    """File-backed VISPR split: jpg folder + labels pkl (vispr_dl.py:18-33)."""

    def __init__(
        self,
        data_dir: str,
        labels_pkl: str,
        shuffle: bool = True,
        data_percentage: float = 1.0,
        seed: int = 0,
        canonical: int = CANONICAL,
        num_workers: int = 8,
    ):
        import glob as _glob

        self.labels = load_vispr_labels(labels_pkl)
        paths = sorted(_glob.glob(os.path.join(data_dir, "*.jpg")))
        if shuffle:
            np.random.default_rng(seed).shuffle(paths)
        self.paths = paths[: int(len(paths) * data_percentage)]
        self.canonical = canonical
        self._pool = ThreadPoolExecutor(num_workers)

    def __len__(self) -> int:
        return len(self.paths)

    def label_of(self, path: str) -> np.ndarray:
        return np.asarray(self.labels[os.path.basename(path).replace(".jpg", "")], np.float32)

    def get_batch(self, indices: Sequence[int]) -> tuple[np.ndarray, np.ndarray]:
        paths = [self.paths[i] for i in indices]
        imgs = list(self._pool.map(lambda p: decode_image_canonical(p, self.canonical), paths))
        labels = np.stack([self.label_of(p) for p in paths])
        return np.stack(imgs), labels


# One saturated, mutually-distinct color per privacy attribute (style="attrs").
_ATTR_COLORS = np.array(
    [
        [255, 32, 32], [32, 255, 32], [32, 96, 255], [255, 255, 32],
        [255, 32, 255], [32, 255, 255], [255, 144, 32],
    ],
    np.uint8,
)


class SyntheticImageSource:
    """Deterministic procedural images + multi-hot labels — the in-memory stand-in that
    lets every image stage run end-to-end without VISPR on disk (SURVEY.md §4).

    ``style``:
      - ``"stripes"`` (default): label-correlated stripe frequencies — 2 of the 7
        attributes visually encoded; kept for existing tests/fixtures.
      - ``"attrs"``: EVERY attribute visually encoded as a colored patch (distinct
        color + position per attribute, present iff the label bit is set) over a
        per-image smooth random background. Purpose: adversarial-dynamics
        validation (scripts/validate_adversarial.py) — a raw privacy attacker can
        reach high cMAP, and an anonymizer that destroys the image's distinctive
        content (what NT-Xent maximization pushes fa toward,
        train_anonymizer.py:119-123) erases exactly the attribute evidence, so the
        paper's cMAP-reduction claim (README.md:11) is observable on synthetic
        data. The per-image background is the identity signal NT-Xent's attacker
        matches views with.
    """

    def __init__(
        self, n: int = 256, num_pa: int = 7, seed: int = 0, canonical: int = CANONICAL,
        style: str = "stripes",
    ):
        self.n = n
        self.num_pa = num_pa
        self.seed = seed
        self.canonical = canonical
        self.style = style
        rng = np.random.default_rng(seed)
        self._labels = (rng.random((n, num_pa)) < 0.3).astype(np.float32)

    def __len__(self) -> int:
        return self.n

    def _image(self, i: int) -> np.ndarray:
        if self.style == "attrs":
            return self._image_attrs(i)
        s = self.canonical
        yy, xx = np.mgrid[0:s, 0:s]
        k = (self.seed * 131 + i * 17) % 251
        # Label-correlated structure so privacy classifiers can actually learn.
        r = (xx + k * 3) % 256
        g = (yy * (1 + int(self._labels[i, 0])) + k) % 256
        b = ((xx + yy) // 2 + int(self._labels[i, 1 % self.num_pa]) * 100) % 256
        return np.stack([r, g, b], axis=-1).astype(np.uint8)

    def _image_attrs(self, i: int) -> np.ndarray:
        s = self.canonical
        rng = np.random.default_rng((self.seed + 1) * 100003 + i)
        # Smooth random background: per-image identity texture for the SSL pair.
        cell = max(s // 4, 1)
        reps = -(-s // cell)
        bg = rng.integers(32, 224, (reps, reps, 3))
        img = np.kron(bg, np.ones((cell, cell, 1))).astype(np.uint8)[:s, :s]
        ps = max(s // 4, 4)  # patch survives the 0.6-1.0 random crop + 224 resize
        for k in range(self.num_pa):
            if self._labels[i, k] > 0:
                gy, gx = divmod(k % 9, 3)
                y0 = int(s * (0.12 + 0.28 * gy))
                x0 = int(s * (0.12 + 0.28 * gx))
                c = _ATTR_COLORS[k % len(_ATTR_COLORS)]
                img[y0 : y0 + ps, x0 : x0 + ps] = c
                q = ps // 3  # contrasting core: robust to mild color jitter
                img[y0 + q : y0 + 2 * q, x0 + q : x0 + 2 * q] = 255 - c
        return img

    def get_batch(self, indices: Sequence[int]) -> tuple[np.ndarray, np.ndarray]:
        return np.stack([self._image(int(i) % self.n) for i in indices]), self._labels[
            np.asarray(indices) % self.n
        ]


def sample_image_augment_params(
    rng: np.random.Generator,
    batch: int,
    src: int = CANONICAL,
    out_h: int = 224,
    out_w: int = 224,
    erase_size: int = 19,
    shared_crop_origin: np.ndarray | None = None,
) -> AugmentParams:
    """Image-stage augmentation draw (vispr_dl.py:72-123). Differences from the video draw:
    single erase box gated at p=0.25 on the *hflip* random slot (vispr_dl.py:115-121 uses
    random_array[6] twice — faithful), erase sizes ~U[erase/2, erase). ``shared_crop_origin``
    (y0, x0 arrays) reproduces the SSL pair trick: both views share the crop origin while
    sizes differ (vispr_dl.py:197-199 vs :214)."""
    cf = rng.uniform(0.6, 1.0, size=batch)
    crop = (src * cf).astype(np.int32)
    if shared_crop_origin is None:
        x0 = (rng.random(batch) * (src - crop + 1)).astype(np.int32)
        y0 = (rng.random(batch) * (src - crop + 1)).astype(np.int32)
    else:
        y0, x0 = shared_crop_origin
        y0 = np.minimum(y0, src - crop)
        x0 = np.minimum(x0, src - crop)
    r = rng.random((batch, 8))
    return AugmentParams(
        y0=y0,
        x0=x0,
        crop_h=crop,
        crop_w=crop.copy(),
        do_contrast=r[:, 0] < 0.125,
        contrast=rng.uniform(0.9, 1.1, batch),
        do_hue=r[:, 1] < 0.15,
        hue=rng.uniform(-0.05, 0.05, batch),
        do_saturation=r[:, 2] < 0.15,
        saturation=rng.uniform(0.9, 1.1, batch),
        do_brightness=r[:, 3] < 0.15,
        brightness=rng.uniform(0.9, 1.1, batch),
        do_grayscale=r[:, 4] > 0.9,
        do_gamma=(r[:, 4] > 0.9) & (r[:, 5] > 0.25),
        gamma=rng.uniform(0.85, 1.15, batch),
        do_hflip=r[:, 6] > 0.5,
        do_erase=np.stack([r[:, 6] < 0.25, np.zeros(batch, bool)], axis=1),
        erase_y=rng.integers(0, out_h, size=(batch, 2)).astype(np.int32),
        erase_x=rng.integers(0, out_w, size=(batch, 2)).astype(np.int32),
        erase_h=rng.integers(erase_size // 2, erase_size, size=(batch, 2)).astype(np.int32),
        erase_w=rng.integers(erase_size // 2, erase_size, size=(batch, 2)).astype(np.int32),
    )


@dataclasses.dataclass
class ImageBatch:
    """Host-side batch: canonical uint8 images + labels (+ optional second-view params)."""

    images: np.ndarray  # (B, S, S, 3) uint8
    labels: np.ndarray  # (B, num_pa) f32
    params: AugmentParams | None = None  # view 1 (train only)
    params2: AugmentParams | None = None  # view 2 (SSL only)


def vispr_batches(
    source,
    batch_size: int,
    *,
    train: bool = True,
    ssl: bool = False,
    out_h: int = 224,
    out_w: int = 224,
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator[ImageBatch]:
    """Epoch iterator. ``ssl=True`` attaches two augmentation draws with a shared crop
    origin (the NT-Xent positive pair, vispr_ssl_dataset). Eval batches carry no params —
    the stage applies the deterministic center-crop+resize transform on device."""
    rng = np.random.default_rng(seed)
    order = np.arange(len(source))
    if train:
        rng.shuffle(order)
    n_steps = len(order) // batch_size if drop_last else (len(order) + batch_size - 1) // batch_size
    for s in range(n_steps):
        idx = order[s * batch_size : (s + 1) * batch_size]
        if len(idx) == 0:
            return
        images, labels = source.get_batch(idx)
        if not train:
            yield ImageBatch(images, labels)
            continue
        src = images.shape[1]
        p1 = sample_image_augment_params(rng, len(idx), src, out_h, out_w)
        if not ssl:
            yield ImageBatch(images, labels, p1)
            continue
        p2 = sample_image_augment_params(
            rng, len(idx), src, out_h, out_w, shared_crop_origin=(p1.y0.copy(), p1.x0.copy())
        )
        yield ImageBatch(images, labels, p1, p2)


def boring_video_batch(images: np.ndarray, num_frames: int) -> np.ndarray:
    """vispr_boring_dataset (vispr_dl.py:255-308): each image repeated ``num_frames``x as a
    static video — (B, S, S, 3) -> (B, T, S, S, 3). Lets image sets stand in for video
    batches when probing ft with still content."""
    return np.repeat(images[:, None], num_frames, axis=1)


class ReconstructionSource:
    """fa-pretraining mix: UCF101 frame jpgs + VISPR jpgs in one pool
    (reconstruction_dl.py:20-41). File-backed variant takes explicit path lists; the
    synthetic variant mixes procedural 'frames' and 'photos'."""

    def __init__(self, image_paths: list[str] | None = None, synthetic_n: int = 0, seed: int = 0, canonical: int = CANONICAL):
        self.paths = image_paths or []
        self.canonical = canonical
        self._synth = SyntheticImageSource(synthetic_n, seed=seed, canonical=canonical) if synthetic_n else None
        self._pool = ThreadPoolExecutor(8) if self.paths else None

    def __len__(self) -> int:
        return len(self.paths) if self.paths else len(self._synth)

    def get_batch(self, indices: Sequence[int]) -> tuple[np.ndarray, np.ndarray]:
        if self.paths:
            imgs = list(
                self._pool.map(lambda i: decode_image_canonical(self.paths[int(i)], self.canonical), indices)
            )
            images = np.stack(imgs)
            return images, np.zeros((len(imgs), 0), np.float32)
        return self._synth.get_batch(indices)
