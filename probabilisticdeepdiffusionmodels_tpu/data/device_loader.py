"""Device-resident data loading: the dataset lives in HBM, epochs ship bytes
of randomness instead of megabytes of pixels.

Motivation (measured, docs/KERNELS.md training section): on this remote-TPU
tunnel the per-epoch host->device pixel transfer is BANDWIDTH-bound — a
16x128-batch CIFAR epoch moves ~25 MB and costs ~0.8 s, dwarfing both the
62.5 ms/step compute and any dispatch-latency saving (which is why the
fused-scan path alone did not move end-to-end throughput,
docs/results/train_loop_fused.json).  A CIFAR-scale training set is a few
hundred MB against 16 GB of HBM: the TPU-native shape is to place the raw
uint8 images on device ONCE and per batch send only the random decisions —
indices, flip flags, crop offsets; a few KB — while the pixel work
(gather, flip, pad+crop, normalize) runs as one jitted program on device.

``DeviceDataLoader`` mirrors ``DataLoader``'s RNG contract exactly — the
same ``np.random.default_rng(seed)`` draws in the same order (epoch order,
then per-batch flip/crop decisions) — so for a given seed it yields the
SAME sample stream as the host loader (parity-tested in
tests/test_device_loader.py), just already on device.

The reference has no analogue: its pipeline is torchvision transforms on
CPU workers feeding CUDA copies (reference src/datasets/data.py:24-105).
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .transforms import resolve_normalization

__all__ = ["DeviceDataLoader"]


@functools.partial(jax.jit, static_argnames=("crop", "pad", "cs", "flip"))
def _make_batch(data, idx, flip_flags, ys, xs, mean, std,
                *, crop: bool, pad: int, cs: int, flip: bool):
    """Gather + transform one batch entirely on device.

    data: [N, H, W, C] uint8 (resident); idx: [B] int32; the rest mirror
    Transform._apply_numpy step for step so the two executors agree."""
    imgs = jnp.take(data, idx, axis=0)
    if flip:
        imgs = jnp.where(flip_flags[:, None, None, None],
                         imgs[:, :, ::-1, :], imgs)
    if crop:
        if pad:
            imgs = jnp.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

        def one(img, y, x):
            return jax.lax.dynamic_slice(
                img, (y, x, 0), (cs, cs, img.shape[-1]))

        imgs = jax.vmap(one)(imgs, ys, xs)
    x = imgs.astype(jnp.float32) / 255.0
    if mean is not None:
        x = (x - mean.reshape(1, 1, 1, -1)) / std.reshape(1, 1, 1, -1)
    return x


class DeviceDataLoader:
    """Drop-in ``DataLoader`` replacement yielding DEVICE batches.

    Same constructor surface for the supported subset; raises for the
    cases that genuinely need host-side work per sample (file-backed
    datasets via ``.load``, superres pairing).  ``shard_id/num_shards``
    follow the host loader: every process draws the same epoch order and
    takes its interleaved slice (only this host's slice is gathered).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        train: bool = True,
        transformation_kwargs: Optional[dict] = None,
        num_samples_per_epoch: Optional[int] = None,
        shuffle: Optional[bool] = None,
        seed: int = 0,
        drop_last: bool = True,
        shard_id: int = 0,
        num_shards: int = 1,
        superres_factor: Optional[int] = None,
    ):
        if superres_factor:
            raise ValueError(
                "DeviceDataLoader does not build superres pairs; use the "
                "host DataLoader for SuperResModel training")
        if hasattr(dataset, "load"):
            raise ValueError(
                "DeviceDataLoader needs an in-memory ArrayDataset "
                "(file-backed datasets stream through the host DataLoader)")
        tk = dict(transformation_kwargs or {})
        # fail loudly on typo'd transform keys, exactly like the host
        # Transform.__init__ would (the silent-config-drop class is a
        # documented past failure — see CLAUDE.md data.normalize GOTCHA)
        known = {"flip", "crop", "crop_size", "crop_padding",
                 "normalize", "eval_random_crop"}
        unknown = set(tk) - known
        if unknown:
            raise TypeError(
                f"DeviceDataLoader got unsupported transformation_kwargs "
                f"{sorted(unknown)}")
        self.batch_size = batch_size
        self.train = train
        self.num_samples_per_epoch = num_samples_per_epoch
        self.shuffle = train if shuffle is None else shuffle
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        assert 0 <= shard_id < num_shards
        self.shard_id = shard_id
        self.num_shards = num_shards

        # mirror Transform.__init__'s flag resolution exactly
        self.flip = bool(tk.get("flip", False)) and train
        eval_random_crop = bool(tk.get("eval_random_crop", True))
        self.crop = bool(tk.get("crop", False)) and (train or eval_random_crop)
        self.crop_size = int(tk.get("crop_size", 32))
        self.crop_padding = int(tk.get("crop_padding", 4))
        norm = resolve_normalization(tk.get("normalize"))
        self._mean = None if norm is None else jnp.asarray(norm[0])
        self._std = None if norm is None else jnp.asarray(norm[1])

        imgs = np.asarray(dataset.images)
        if imgs.dtype != np.uint8:
            raise ValueError(
                f"DeviceDataLoader expects uint8 images, got {imgs.dtype}")
        self._data = jax.device_put(imgs)          # resident, once
        self._labels = np.asarray(dataset.labels)  # tiny; stays host-side
        self._n = len(imgs)

    def __len__(self):
        n = self.num_samples_per_epoch or self._n
        n = (n - self.shard_id + self.num_shards - 1) // self.num_shards
        return (n // self.batch_size if self.drop_last
                else -(-n // self.batch_size))

    def epoch(self) -> Iterator[Tuple[jax.Array, np.ndarray]]:
        # SAME rng consumption order as DataLoader.epoch + Transform.__call__
        if self.num_samples_per_epoch is not None:
            order = self.rng.integers(0, self._n,
                                      size=self.num_samples_per_epoch)
        elif self.shuffle:
            order = self.rng.permutation(self._n)
        else:
            order = np.arange(self._n)
        if self.num_shards > 1:
            order = order[self.shard_id:: self.num_shards]

        bs = self.batch_size
        stop = len(order) - (len(order) % bs if self.drop_last else 0)
        h = self._data.shape[1] + 2 * self.crop_padding
        w = self._data.shape[2] + 2 * self.crop_padding
        cs = self.crop_size
        for i in range(0, stop, bs):
            idx = order[i: i + bs].astype(np.int32)
            b = len(idx)
            flip_flags = (self.rng.random(b) < 0.5) if self.flip else None
            ys = xs = None
            if self.crop:
                ys = self.rng.integers(0, h - cs + 1, size=b).astype(np.int32)
                xs = self.rng.integers(0, w - cs + 1, size=b).astype(np.int32)
            x = _make_batch(
                self._data, jnp.asarray(idx),
                None if flip_flags is None else jnp.asarray(flip_flags),
                None if ys is None else jnp.asarray(ys),
                None if xs is None else jnp.asarray(xs),
                self._mean, self._std,
                crop=self.crop, pad=self.crop_padding, cs=cs,
                flip=self.flip,
            )
            yield x, self._labels[idx]

    def __iter__(self):
        return self.epoch()
