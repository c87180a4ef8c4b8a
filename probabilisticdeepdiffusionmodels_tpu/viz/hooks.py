"""Visualization suite: sample grids, interpolations, reconstructions.

Capability-parity port of the reference's VisualizationCallback
(reference: src/visualization_hooks.py:33-626):
  * random-sample grids showing the denoising trajectory at chosen
    timesteps (visualize_random_grid -> show_full_reconstruction,
    visualization_hooks.py:101-169)
  * latent interpolation: noise two images to t, lerp in x_t space, denoise
    each lerp point, red-bordered endpoints (visualization_hooks.py:194-345)
  * reconstruction grids from each t_start (visualization_hooks.py:507-616)
  * single-row reconstructions with the per-step std curve
    (visualization_hooks.py:391-505)
Every visualization runs under EMA weights (the reference's ema_fun
decorator, visualization_hooks.py:17-30) via use_ema=True.

Outputs are PNG files in the run directory media/ folder (the reference
logs to W&B; our MetricLogger mirrors them there when enabled).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from ..data.transforms import unnormalize

__all__ = ["VisualizationCallback"]


def _to_img(x: np.ndarray, normalize) -> np.ndarray:
    """NHWC float -> [0,1] displayable."""
    x = unnormalize(x, normalize=normalize, clip=True, channel_dim=-1)
    return np.clip(x, 0, 1)


def _grid(ax, img: np.ndarray, border_color=None):
    if img.shape[-1] == 1:
        ax.imshow(img[..., 0], cmap="gray", vmin=0, vmax=1)
    else:
        ax.imshow(img)
    ax.set_xticks([])
    ax.set_yticks([])
    if border_color:
        for spine in ax.spines.values():
            spine.set_edgecolor(border_color)
            spine.set_linewidth(3)
    else:
        ax.axis("off")


class VisualizationCallback:
    def __init__(
        self,
        val_batch: np.ndarray,
        ts: Sequence[int],
        media_dir: Path,
        normalize=None,
        n_images: int = 4,
        n_random: int = 4,
        n_interpolation_steps: int = 10,
        n_interpolation_pairs: int = 4,
        run_every: int = 5,
        use_ema: bool = True,
        logger=None,
        labels: Optional[np.ndarray] = None,
    ):
        self.val_batch = np.asarray(val_batch)
        self.ts = sorted(set(int(t) for t in ts))
        self.media_dir = Path(media_dir)
        self.normalize = normalize
        self.n_images = n_images
        self.n_random = n_random
        self.n_interpolation_steps = n_interpolation_steps
        self.n_interpolation_pairs = n_interpolation_pairs
        self.run_every = run_every
        self.use_ema = use_ema
        self.logger = logger
        self.labels = labels

    def __call__(self, engine, epoch: int):
        tag = f"epoch{epoch}" if epoch >= 0 else "final"
        self.visualize_random_grid(engine, tag)
        self.visualize_interpolation(engine, tag)
        self.visualize_reconstructions_grid(engine, tag)
        self.visualize_single_reconstructions(engine, tag)

    def _save(self, fig, name: str):
        path = self.media_dir / f"{name}.png"
        fig.savefig(path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        if self.logger is not None:
            self.logger.log_image(name.rsplit("_", 1)[0], path)
        return path

    # -- random samples with trajectory (visualization_hooks.py:101-169)
    def visualize_random_grid(self, engine, tag: str):
        steps = [t for t in self.ts if t < engine.diffusion_steps] or [1]
        noise, imgs = engine.generate_images_grid(
            steps_to_return=steps, n=self.n_random, minibatch=self.n_random,
            use_ema=self.use_ema, seed=0,
        )
        # rows: sample; cols: x_T then recorded steps (descending t)
        n, s = imgs.shape[0], imgs.shape[1]
        fig, axes = plt.subplots(n, s + 1, figsize=(2 * (s + 1), 2 * n))
        axes = np.atleast_2d(axes)
        for i in range(n):
            _grid(axes[i, 0], _to_img(noise[i], self.normalize))
            for j in range(s):
                _grid(axes[i, j + 1], _to_img(imgs[i, j], self.normalize))
        return self._save(fig, f"random_grid_{tag}")

    def _interpolation_pairs(self, n_pairs: int):
        """Index pairs for interpolation; when labels are available, pairs
        share a class (reference same_class_interpolation,
        visualization_hooks.py:175-192), else consecutive images."""
        if self.labels is not None:
            labels = np.asarray(self.labels)
            pairs = []
            for cls in np.unique(labels):
                idx = np.nonzero(labels == cls)[0]
                for i in range(0, len(idx) - 1, 2):
                    pairs.append((idx[i], idx[i + 1]))
                    if len(pairs) >= n_pairs:
                        return pairs
            return pairs
        return [(2 * p, 2 * p + 1) for p in range(n_pairs)]

    # -- latent interpolation (visualization_hooks.py:194-345)
    def visualize_interpolation(self, engine, tag: str, t: Optional[int] = None):
        t = t if t is not None else engine.diffusion_steps // 2
        pairs = min(self.n_interpolation_pairs, len(self.val_batch) // 2)
        if pairs == 0:
            return None
        k = self.n_interpolation_steps
        rows = []
        for p, (ia, ib) in enumerate(self._interpolation_pairs(pairs)):
            x0a = self.val_batch[ia : ia + 1]
            x0b = self.val_batch[ib : ib + 1]
            xa = np.asarray(engine.get_noised_representation(x0a, t, seed=p))
            xb = np.asarray(engine.get_noised_representation(x0b, t, seed=p + 1))
            lerps = [
                (1 - w) * xa + w * xb for w in np.linspace(0.0, 1.0, k)
            ]
            x_t = np.concatenate(lerps, axis=0)
            recon = np.asarray(
                engine.sample_from_step(x_t, t, use_ema=self.use_ema, seed=p)
            )
            rows.append((x0a[0], recon, x0b[0]))

        if not rows:
            return None
        fig, axes = plt.subplots(
            len(rows), k + 2, figsize=(2 * (k + 2), 2 * len(rows))
        )
        axes = np.atleast_2d(axes)
        for i, (a, recon, b) in enumerate(rows):
            _grid(axes[i, 0], _to_img(a, self.normalize), border_color="red")
            for j in range(k):
                _grid(axes[i, j + 1], _to_img(recon[j], self.normalize))
            _grid(axes[i, -1], _to_img(b, self.normalize), border_color="red")
        return self._save(fig, f"interpolation_t{t}_{tag}")

    # -- reconstruction grid from each t_start (visualization_hooks.py:507-616)
    def visualize_reconstructions_grid(self, engine, tag: str):
        n = min(self.n_images, len(self.val_batch))
        x0 = self.val_batch[:n]
        t_starts = [t for t in self.ts if 1 < t <= engine.diffusion_steps]
        if not t_starts:
            return None
        fig, axes = plt.subplots(
            n, len(t_starts) + 1, figsize=(2 * (len(t_starts) + 1), 2 * n)
        )
        axes = np.atleast_2d(axes)
        for i in range(n):
            _grid(axes[i, 0], _to_img(x0[i], self.normalize), border_color="green")
        for j, t in enumerate(t_starts):
            recon, _ = engine.diffuse_and_reconstruct(
                x0, t, seed=j, use_ema=self.use_ema
            )
            recon = np.asarray(recon)
            for i in range(n):
                _grid(axes[i, j + 1], _to_img(recon[i], self.normalize))
        return self._save(fig, f"reconstructions_{tag}")

    # -- single-row recon + std curve (visualization_hooks.py:391-505)
    def visualize_single_reconstructions(self, engine, tag: str):
        x0 = self.val_batch[:1]
        t_start = engine.diffusion_steps
        steps = [t for t in self.ts if t < t_start] or [1]
        (step_imgs, stds), x_t = engine.diffuse_and_reconstruct_grid(
            x0, t_start, steps_to_return=steps, return_stds=True,
            use_ema=self.use_ema, seed=0,
        )
        step_imgs = np.asarray(step_imgs)
        stds = np.asarray(stds)

        s = step_imgs.shape[1]
        fig, axes = plt.subplots(1, s + 2, figsize=(2 * (s + 2), 2.4))
        _grid(axes[0], _to_img(x0[0], self.normalize), border_color="green")
        for j in range(s):
            _grid(axes[j + 1], _to_img(step_imgs[0, j], self.normalize))
        axes[-1].plot(stds)
        axes[-1].set_xlabel("step")
        axes[-1].set_ylabel("std(x_t)")
        return self._save(fig, f"single_recon_std_{tag}")
