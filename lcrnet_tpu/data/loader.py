"""Host-side dataset wrappers and prefetching loaders.

Parity targets:
  - `experiments/lcrnet/datasets/loop_closure/kitti/dataset.py:69-197` and
    `datasets/registration/*` (pair datasets over KITTI-style sequences)
  - `experiments/lcrnet/data.py:436-468` + `utils/utils/torch.py:40-77`
    (dataloader assembly)

The TPU inversion: the reference's 8-worker collate pool computes the whole
pyramid on CPU per sample; here the host only loads scans, augments, caps
and pads — the pyramid is built on device inside the jitted step.  A small
double-buffered prefetch thread keeps the host ahead of the device.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from lcrnet_tpu.config import LCRNetConfig
from lcrnet_tpu.data.kitti import (
    AugmentConfig,
    KittiScanSource,
    augment_pair,
    load_kitti_gt_pose,
    load_pair_text,
    pad_points,
    relative_transform,
)


class RegistrationPairDataset:
    """Pairs (ref=pos, src=anc) from a pair list + scan source."""

    def __init__(
        self,
        scan_source: Callable[[int], np.ndarray],
        pairs: List[dict],
        cfg: LCRNetConfig,
        augment: bool = False,
        seed: int = 7351,
    ):
        self.scan_source = scan_source
        self.pairs = pairs
        self.cfg = cfg
        self.augment = augment
        self.rng = np.random.default_rng(seed)
        self.aug_cfg = AugmentConfig(
            rotation=cfg.train.augmentation_rotation,
            noise=cfg.train.augmentation_noise,
            min_scale=cfg.train.augmentation_min_scale,
            max_scale=cfg.train.augmentation_max_scale,
            shift=cfg.train.augmentation_shift,
        )

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i: int):
        pair = self.pairs[i]
        ref = self.scan_source(pair["pos_idx"])
        src = self.scan_source(pair["anc_idx"])
        transform = pair["transform"]
        if self.augment:
            ref, src, transform = augment_pair(ref, src, transform, self.rng, self.aug_cfg)
        cap = self.cfg.shapes.points[0]
        limit = self.cfg.train.point_limit if self.augment else None
        rp, rm = pad_points(ref, cap, limit, self.rng if self.augment else None)
        sp, sm = pad_points(src, cap, limit, self.rng if self.augment else None)
        return {
            "points": np.stack([rp, sp]),
            "masks": np.stack([rm, sm]),
            "transform": transform,
            "pos_idx": pair["pos_idx"],
            "anc_idx": pair["anc_idx"],
        }


class ScanDataset:
    """Single scans (descriptor extraction path)."""

    def __init__(self, scan_source: Callable[[int], np.ndarray], indices: Sequence[int], cfg: LCRNetConfig):
        self.scan_source = scan_source
        self.indices = list(indices)
        self.cfg = cfg

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i: int):
        idx = self.indices[i]
        pts = self.scan_source(idx)
        p, m = pad_points(pts, self.cfg.shapes.points[0])
        return {"points": p, "masks": m, "index": idx}


def batch_pairs(samples: List[dict]):
    """Stack per-pair samples into PairBatch arrays (P, 2, N, ...)."""
    from lcrnet_tpu.engine.train import PairBatch
    import jax.numpy as jnp

    return PairBatch(
        points=jnp.asarray(np.stack([s["points"] for s in samples])),
        masks=jnp.asarray(np.stack([s["masks"] for s in samples])),
        transform=jnp.asarray(np.stack([s["transform"] for s in samples])),
    )


def prefetch(iterable: Iterable, depth: int = 2) -> Iterator:
    """Background-thread prefetch (replaces the reference's worker pool —
    the heavy lifting moved on-device, the host just stays ahead)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for item in iterable:
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


def pair_loader(
    dataset: RegistrationPairDataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator:
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)

    def gen():
        buf = []
        for i in order:
            buf.append(dataset[int(i)])
            if len(buf) == batch_size:
                yield batch_pairs(buf)
                buf = []
        if buf and not drop_last:
            yield batch_pairs(buf)

    return prefetch(gen())


def make_kitti_registration_dataset(
    cfg: LCRNetConfig,
    dataset_root: str,
    seq: int,
    pair_file: str,
    augment: bool = False,
) -> RegistrationPairDataset:
    source = KittiScanSource(dataset_root, seq, cfg.backbone.init_voxel_size)
    pairs = load_pair_text(pair_file)
    return RegistrationPairDataset(source, pairs, cfg, augment=augment)


def make_registration_dataset(
    cfg: LCRNetConfig,
    family: str,
    dataset_root: str,
    seq,
    pair_file: str,
    augment: bool = False,
) -> RegistrationPairDataset:
    """Family-generic registration dataset (kitti / kitti360 / ford /
    apollo / mulran — reference `datasets/registration/*/dataset.py`).
    The pair-file format (`anc pos r00..r23` rows, or the loop npz) is
    shared across families; only the scan source differs."""
    from lcrnet_tpu.data.datasets import make_sequence
    from lcrnet_tpu.data.kitti import load_pair_npz

    source = make_sequence(family, dataset_root, seq, cfg.backbone.init_voxel_size)
    pairs = load_pair_npz(pair_file) if pair_file.endswith(".npz") else load_pair_text(pair_file)
    return RegistrationPairDataset(source, pairs, cfg, augment=augment)
