"""DiffusionEngine: the user-facing facade over the functional core.

Capability-parity equivalent of the reference's ``Engine`` LightningModule
(reference: src/engine.py:79-657) with the same constructor surface
(model_config, optimizer_config, diffusion_steps, beta_start/end, mode,
max_beta, sigma_mode, resolution, clip_while_generating, sampling, ema,
scheduler_name, scheduler_kwargs) and the same public endpoints
(generate_images, generate_images_grid, sample_and_return_steps,
diffuse_and_reconstruct(_grid), get_noised_representation,
calculate_likelihood) — but TPU-native underneath: the state is a pytree,
every step is a cached jit, sampling is a lax.scan, and batches can be
sharded over a device mesh.

Where the reference swaps ``self.model`` inside an ``ema_on`` context
manager (engine.py:171-182), here every endpoint takes ``use_ema`` and
simply selects the parameter pytree.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .core.diffusion import DiffusionTables
from .core.schedules import NoiseSchedule
from .core import diffusion as D
from .evals.nll import calculate_likelihood
from .models import get_model
from .parallel.mesh import data_sharding, replicated, shard_batch, spatial_sharding
from .sample.sampler import (
    ddim_sample_loop,
    p_sample_loop,
    respaced_schedule,
    space_timesteps,
)
from .train.state import TrainState
from .train.step import make_eval_step, make_train_step

__all__ = ["DiffusionEngine", "make_lr_schedule"]


def make_lr_schedule(
    scheduler_name: Optional[str], scheduler_kwargs: Optional[dict], base_lr: float
):
    """LR schedule by name (reference picks torch schedulers by getattr,
    src/engine.py:242-246; config/scheduler/cosine_annealing.yaml)."""
    if not scheduler_name:
        return base_lr
    kw = scheduler_kwargs or {}
    if scheduler_name == "CosineAnnealingWarmRestarts":
        t0 = int(kw.get("T_0", 1000))
        eta_min = float(kw.get("eta_min", 0.0))

        def sched(step):
            pos = (step % t0).astype(jnp.float32) / t0
            return eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * pos))

        return sched
    if scheduler_name == "CosineAnnealing":
        t_max = int(kw.get("T_max", 10000))
        return optax.cosine_decay_schedule(base_lr, t_max, alpha=kw.get("eta_min", 0.0))
    raise ValueError(f"Unknown scheduler: {scheduler_name}")


class DiffusionEngine:
    def __init__(
        self,
        model_config: Dict[str, Any],
        optimizer_config: Dict[str, Any],
        diffusion_steps: int = 1000,
        beta_start: Optional[float] = None,
        beta_end: Optional[float] = None,
        mode: str = "linear",
        max_beta: float = 0.999,
        sigma_mode: str = "beta",
        resolution: int = 32,
        clip_while_generating: bool = False,
        sampling: str = "uniform",
        ema: Optional[float] = None,
        scheduler_name: Optional[str] = None,
        scheduler_kwargs: Optional[dict] = None,
        seed: int = 0,
        loss_type: str = "simple",
        grad_clip: Optional[float] = None,
        accumulate_grad_batches: int = 1,
        mesh: Optional[Any] = None,
        in_channels: Optional[int] = None,
    ):
        self.hparams = dict(
            model_config=dict(model_config),
            optimizer_config=dict(optimizer_config),
            diffusion_steps=diffusion_steps,
            beta_start=beta_start,
            beta_end=beta_end,
            mode=mode,
            max_beta=max_beta,
            sigma_mode=sigma_mode,
            resolution=resolution,
            clip_while_generating=clip_while_generating,
            sampling=sampling,
            ema=ema,
            scheduler_name=scheduler_name,
            scheduler_kwargs=dict(scheduler_kwargs or {}),
            seed=seed,
            loss_type=loss_type,
            grad_clip=grad_clip,
            accumulate_grad_batches=accumulate_grad_batches,
        )
        self.diffusion_steps = diffusion_steps
        self.resolution = resolution
        self.sigma_mode = sigma_mode
        self.clip_while_generating = clip_while_generating
        self.mesh = mesh

        mc = dict(model_config)
        if loss_type == "hybrid":
            mc.setdefault("learn_sigma", True)
        self.model = get_model(resolution, mc)
        self.in_channels = in_channels or getattr(self.model, "in_channels", 3)

        self.schedule = NoiseSchedule.create(
            diffusion_steps=diffusion_steps,
            mode=mode,
            beta_start=beta_start,
            beta_end=beta_end,
            max_beta=max_beta,
        )
        self.tables = DiffusionTables.from_schedule(self.schedule)

        # optimizer: Adam with the reference's config surface
        # (engine.py:238-248), plus optional global-norm clipping and
        # optax.MultiSteps gradient accumulation (the Lightning
        # accumulate_grad_batches equivalent).
        lr = make_lr_schedule(
            scheduler_name, scheduler_kwargs, float(optimizer_config.get("lr", 1e-4))
        )
        opt_kwargs = {k: v for k, v in optimizer_config.items() if k != "lr"}
        tx = optax.adam(lr, **opt_kwargs)
        if grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
        if accumulate_grad_batches > 1:
            tx = optax.MultiSteps(tx, accumulate_grad_batches)
        self.tx = tx

        key = jax.random.PRNGKey(seed)
        key, init_key, state_key = jax.random.split(key, 3)
        dummy = jnp.zeros((1, resolution, resolution, self.in_channels), jnp.float32)
        dummy_t = jnp.ones((1,), jnp.int32)
        init_kwargs = {}
        if getattr(self.model, "num_classes", None):
            init_kwargs["y"] = jnp.zeros((1,), jnp.int32)
        variables = self.model.init(init_key, dummy, dummy_t, **init_kwargs)
        self.state = TrainState.create(
            variables["params"],
            tx,
            diffusion_steps,
            state_key,
            ema_decay=ema,
        )

        self._apply = lambda params, x, t, y=None, **kw: self.model.apply(
            {"params": params}, x, t, y, **kw
        )
        dropout = float(dict(model_config).get("dropout", 0) or 0) > 0
        self._train_step = jax.jit(
            make_train_step(
                self._apply,
                self.tables,
                sampling=sampling,
                loss_type=loss_type,
                dropout=dropout,
            ),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(make_eval_step(self._apply, self.tables))
        self._nll = jax.jit(
            functools.partial(
                calculate_likelihood, self._apply, sigma_mode=self.sigma_mode
            ),
            static_argnames=(),
        )

    # ------------ params selection (reference ema_on, engine.py:171-182)

    def params(self, use_ema: bool = False):
        if use_ema and self.state.ema_params is not None:
            return self.state.ema_params
        return self.state.params

    # ------------ training

    def training_step(self, x: jax.Array, y: Optional[jax.Array] = None):
        if self.mesh is not None:
            x = shard_batch(self.mesh, x)
        self.state, metrics = self._train_step(self.state, x, y)
        return metrics

    def validation_step(
        self, x: jax.Array, rng: Optional[jax.Array] = None
    ) -> Dict[str, jax.Array]:
        """val_loss (EMA) and val_loss_no_ema (reference engine.py:309-330)."""
        rng = rng if rng is not None else jax.random.PRNGKey(int(self.state.step))
        out = {"val_loss_no_ema": self._eval_step(self.state.params, rng, x)}
        if self.state.ema_params is not None:
            out["val_loss"] = self._eval_step(self.state.ema_params, rng, x)
        else:
            out["val_loss"] = out.pop("val_loss_no_ema")
        return out

    # ------------ forward process utilities

    def get_noised_representation(self, x0, t=None, seed=None, key=None):
        """Forward-noise x0 to step t (reference engine.py:604-615)."""
        t = t if t is not None else self.diffusion_steps
        key = key if key is not None else jax.random.PRNGKey(seed or 0)
        noise = jax.random.normal(key, x0.shape, x0.dtype)
        tb = jnp.full((x0.shape[0],), t, jnp.int32)
        return D.q_sample(self.tables, jnp.asarray(x0), noise, tb)

    # ------------ sampling endpoints (reference engine.py:510-657)

    def _sample_tables(self, num_sample_steps=None):
        """Tables + timestep map for full or strided sampling."""
        if num_sample_steps is None or num_sample_steps >= self.diffusion_steps:
            return self.tables, None, self.diffusion_steps
        kept = space_timesteps(self.diffusion_steps, num_sample_steps)
        new_sched, tmap = respaced_schedule(self.schedule, kept)
        return (
            DiffusionTables.from_schedule(new_sched),
            jnp.asarray(tmap),
            len(kept),
        )

    def sample_from_step(self, x_t, t_start, mean_only=False, seed=None,
                         use_ema=True, key=None):
        key = key if key is not None else jax.random.PRNGKey(seed or 0)
        return p_sample_loop(
            self._apply, self.params(use_ema), self.tables, jnp.asarray(x_t), key,
            t_start=t_start, sigma_mode=self.sigma_mode,
            clip=self.clip_while_generating, mean_only=mean_only,
        )

    def sample_and_return_steps(
        self, x_t, t_start=None, steps_to_return=(1,), mean_only=False,
        seed=None, return_stds=False, use_ema=True, key=None,
    ):
        """Returns [B, STEPS, H, W, C] (reference engine.py:510-554)."""
        t_start = t_start if t_start is not None else self.diffusion_steps
        key = key if key is not None else jax.random.PRNGKey(seed or 0)
        out = p_sample_loop(
            self._apply, self.params(use_ema), self.tables, jnp.asarray(x_t), key,
            t_start=t_start, sigma_mode=self.sigma_mode,
            clip=self.clip_while_generating, mean_only=mean_only,
            steps_to_return=tuple(steps_to_return), return_stds=return_stds,
        )
        if return_stds:
            _, steps, stds = out
            return steps, stds
        _, steps = out
        return steps

    def generate_images(
        self, n=1, minibatch=4, mean_only=False, seed=None, use_ema=True,
        num_sample_steps=None, ddim=False, ddim_eta=0.0, shard_mode="batch",
    ) -> np.ndarray:
        """Batched generation (reference engine.py:556-574), with optional
        strided/DDIM fast sampling (BASELINE config #3 extension)."""
        tables, tmap, _ = self._sample_tables(num_sample_steps)
        params = self.params(use_ema)
        key = jax.random.PRNGKey(seed if seed is not None else 0)
        images = []
        shape = (minibatch, self.resolution, self.resolution, self.in_channels)

        if self.mesh is not None:
            # batch-sharded sampling over the mesh (BASELINE config #5):
            # x_T sharded on the data axis, params replicated, every step of
            # the scanned trajectory stays sharded with no collectives
            params = jax.device_put(params, replicated(self.mesh))

        for i in range(int(np.ceil(n / minibatch))):
            key, knoise, kloop = jax.random.split(key, 3)
            x_t = jax.random.normal(knoise, shape, jnp.float32)
            if self.mesh is not None:
                shard = (
                    spatial_sharding(self.mesh)
                    if shard_mode == "spatial"
                    else data_sharding(self.mesh, x_t.ndim)
                )
                x_t = jax.device_put(x_t, shard)
            if ddim:
                x = ddim_sample_loop(
                    self._apply, params, tables, x_t, kloop, eta=ddim_eta,
                    clip=self.clip_while_generating, timestep_map=tmap,
                )
            else:
                x = p_sample_loop(
                    self._apply, params, tables, x_t, kloop,
                    sigma_mode=self.sigma_mode, clip=self.clip_while_generating,
                    mean_only=mean_only, timestep_map=tmap,
                )
            images.append(np.asarray(x))
        return np.concatenate(images, axis=0)[:n]

    def generate_images_grid(
        self, steps_to_return, n=1, minibatch=4, mean_only=False, seed=None,
        use_ema=True,
    ):
        """Returns (starting noise, [B, STEPS, ...]) (reference
        engine.py:576-602)."""
        key = jax.random.PRNGKey(seed if seed is not None else 0)
        noises, images = [], []
        shape = (n, self.resolution, self.resolution, self.in_channels)
        key, knoise, kloop = jax.random.split(key, 3)
        x_t = jax.random.normal(knoise, shape, jnp.float32)
        noises.append(np.asarray(x_t))
        steps = self.sample_and_return_steps(
            x_t, self.diffusion_steps, steps_to_return, mean_only=mean_only,
            use_ema=use_ema, key=kloop,
        )
        images.append(np.asarray(steps))
        return np.concatenate(noises), np.concatenate(images)

    def diffuse_and_reconstruct(self, x0, t=None, seed=None, use_ema=True):
        """Noise to t then reconstruct (reference engine.py:617-625)."""
        t = t if t is not None else self.diffusion_steps
        key = jax.random.PRNGKey(seed or 0)
        knoise, kloop = jax.random.split(key)
        x_t = self.get_noised_representation(x0, t, key=knoise)
        recon = p_sample_loop(
            self._apply, self.params(use_ema), self.tables, x_t, kloop,
            t_start=t, sigma_mode=self.sigma_mode,
            clip=self.clip_while_generating,
        )
        return recon, x_t

    def diffuse_and_reconstruct_grid(
        self, x0, t_start=None, steps_to_return=(1,), seed=None,
        mean_only=False, return_stds=False, use_ema=True,
    ):
        """(reference engine.py:627-657)"""
        t_start = t_start if t_start is not None else self.diffusion_steps
        key = jax.random.PRNGKey(seed or 0)
        knoise, kloop = jax.random.split(key)
        x_t = self.get_noised_representation(x0, t_start, key=knoise)
        out = p_sample_loop(
            self._apply, self.params(use_ema), self.tables, x_t, kloop,
            t_start=t_start, sigma_mode=self.sigma_mode,
            clip=self.clip_while_generating, mean_only=mean_only,
            steps_to_return=tuple(steps_to_return), return_stds=return_stds,
        )
        if return_stds:
            _, steps, stds = out
            return (steps, stds), x_t
        _, steps = out
        return steps, x_t

    def get_feature_vectors(self, x, t, y=None, use_ema: bool = False):
        """All intermediate activations {'down': [...], 'middle': ...,
        'up': [...]} (reference UNetModel.get_feature_vectors,
        src/modules/unet.py:497-527)."""
        tb = jnp.full((x.shape[0],), t, jnp.int32) if np.isscalar(t) else jnp.asarray(t)
        return self.model.apply(
            {"params": self.params(use_ema)}, jnp.asarray(x), tb, y,
            return_features=True,
        )

    # ------------ evaluation (reference engine.py:407-506)

    def calculate_likelihood(self, x, seed=0, use_ema=True):
        return self._nll(
            self.params(use_ema), self.tables, jnp.asarray(x),
            jax.random.PRNGKey(seed),
        )

    def test_step(self, x, seed=0, use_ema=True) -> Dict[str, float]:
        nll = self.calculate_likelihood(x, seed=seed, use_ema=use_ema)
        return {
            "test_L_0": float(jnp.mean(nll["L_0"])),
            "test_L_intermediate": float(jnp.mean(nll["L_intermediate"])),
            "test_L_T": float(jnp.mean(nll["L_T"])),
            "test_nll": float(jnp.mean(nll["nll"])),
            "test_mse": float(nll["MSE"]),
        }
