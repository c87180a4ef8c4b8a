"""Sampling/visualization entry point.

Reference surface: scripts/sample.py:18-151 — load a trained run (there: by
W&B run id; here: by run directory), rebuild the engine from its saved
config, override clip_while_generating, run the regular visualization suite
and/or the detailed per-t0 mean/sampled x clip/no-clip reconstruction panels
(sample.py:104-147).

    python -m probabilisticdeepdiffusionmodels_tpu.cli.sample \
        run_dir=runs/run-xyz clip_while_generating=true detailed_viz=true
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import yaml

from ..config import load_config
from ..train.checkpoint import CheckpointManager
from ..viz.hooks import VisualizationCallback, _grid, _to_img
from .train import build_engine, build_loaders

__all__ = ["run_sampling", "main", "load_engine_from_run"]


def load_engine_from_run(run_path: str, clip_while_generating=None, use_best=True,
                         devices=None):
    """Rebuild engine + restore weights from a run directory (the
    reference's download_file + load_from_checkpoint path, sample.py:47-52).

    ``devices``: int or "all" builds a mesh so sampling is batch-sharded
    over the slice (VERDICT r2 next #1).  When absent, the engine is built
    single-device regardless of the run's own ``trainer.devices`` — a
    checkpoint trained on an 8-device mesh must stay loadable on a smaller
    host (ADVICE r3: sampling topology is the caller's choice, not the
    training run's)."""
    run_path = Path(run_path)
    with open(run_path / "experiment_config.yaml") as f:
        cfg = yaml.safe_load(f)
    if clip_while_generating is not None:
        cfg["engine"]["clip_while_generating"] = bool(clip_while_generating)
    cfg.setdefault("trainer", {})["devices"] = (
        devices if devices is not None else 1
    )
    from .train import build_mesh

    engine = build_engine(cfg, mesh=build_mesh(cfg))
    ckpt = CheckpointManager(run_path / "checkpoints")
    step = ckpt.best_step() if use_best else None
    engine.state = ckpt.restore(engine.state, step)
    engine.replicate_state()
    return engine, cfg


def run_detailed_viz(engine, cfg, media_dir: Path, normalize, n_images=4):
    """Per-t0 mean/sampled x clip/no-clip panels (reference
    scripts/sample.py:104-147: t0 in {T, .9T, .8T, .5T})."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _, val_loader = build_loaders(cfg)
    x0 = next(iter(val_loader))[0][:n_images]
    T = engine.diffusion_steps
    t0s = [T, int(0.9 * T), int(0.8 * T), int(0.5 * T)]
    orig_clip = engine.clip_while_generating
    for t0 in t0s:
        fig, axes = plt.subplots(
            len(x0), 5, figsize=(10, 2 * len(x0))
        )
        axes = np.atleast_2d(axes)
        for clip_idx, clip in enumerate((False, True)):
            engine.clip_while_generating = clip
            for mean_idx, mean_only in enumerate((True, False)):
                recon, _ = engine.diffuse_and_reconstruct(x0, t0, seed=t0)
                recon = np.asarray(recon)
                col = 1 + clip_idx * 2 + mean_idx
                for i in range(len(x0)):
                    _grid(axes[i, col], _to_img(recon[i], normalize))
        for i in range(len(x0)):
            _grid(axes[i, 0], _to_img(np.asarray(x0[i]), normalize))
        path = media_dir / f"detailed_t0_{t0}.png"
        fig.savefig(path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        print(f"[sample] wrote {path}")
    engine.clip_while_generating = orig_clip


def run_sampling(cfg) -> None:
    assert cfg.get("run_dir"), "pass run_dir=<path to a training run>"
    # Surface CFG knob misconfiguration up front: guidance_rescale without
    # guidance_scale would otherwise never reach the engine's own
    # validation (the fast-sampler branch below only fires on
    # guidance_scale) and be silently ignored (ADVICE r4).
    if (cfg.get("guidance_rescale") is not None
            and cfg.get("guidance_scale") is None):
        raise ValueError("guidance_rescale needs guidance_scale")
    engine, run_cfg = load_engine_from_run(
        cfg["run_dir"], cfg.get("clip_while_generating"),
        devices=cfg.get("devices"),
    )
    media_dir = Path(cfg["run_dir"]) / "media"
    media_dir.mkdir(exist_ok=True)
    normalize = (run_cfg["data"].get("transformation_kwargs") or {}).get("normalize")

    if cfg.get("regular_viz", True) and \
            engine.prediction_type == "consistency":
        # the viz suites render ancestral trajectory grids, which need the
        # eps-view a consistency model doesn't have
        print("[sample] regular viz needs the eps-view; skipped for "
              'prediction_type="consistency" (use sampler=consistency)')
    elif cfg.get("regular_viz", True):
        T = engine.diffusion_steps
        n_vis = cfg.get("num_vis_steps") or (5 if T <= 30 else 10)
        ts = sorted(set(int(t) for t in np.linspace(1, T - 1, n_vis)))
        _, val_loader = build_loaders(run_cfg)
        val_batch = next(iter(val_loader))[0]
        vis = VisualizationCallback(
            val_batch=val_batch,
            ts=ts,
            media_dir=media_dir,
            normalize=normalize,
            n_images=cfg.get("n_images", 4),
            n_random=cfg.get("n_random", 4),
            n_interpolation_steps=cfg.get("n_interpolation_steps", 10),
            n_interpolation_pairs=cfg.get("n_interpolation_pairs", 4),
            use_ema=cfg.get("use_ema", True),
        )
        vis(engine, -1)
        print(f"[sample] regular viz written to {media_dir}")

    if (cfg.get("num_sample_steps")
            or cfg.get("sampler") in ("ddim", "dpmpp", "heun", "edm",
                                      "flow", "consistency")
            or cfg.get("guidance_scale") is not None):
        # fast-sampler generation grid (strided/DDIM, BASELINE config #3;
        # sampler=dpmpp selects DPM-Solver++(2M), sampler=heun the EDM
        # Heun 2nd-order solver retrofitted onto the VP tables,
        # sampler=edm the NATIVE sigma-space EDM sampler, sampler=flow
        # the NATIVE flow-matching ODE — the native ones need a run
        # trained with the matching engine.prediction_type)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = int(cfg.get("n_random", 4))
        gen_kwargs = {}
        gs = cfg.get("guidance_scale")
        gr = cfg.get("guidance_rescale")
        if gs is not None:
            # classifier-free guidance grid: one sample per class, cycling
            nc = int(getattr(engine.model, "num_classes", 0) or 0)
            assert nc, "guidance_scale needs a class-conditional model"
            gen_kwargs = dict(
                guidance_scale=float(gs), y=np.arange(n) % nc
            )
            gi = cfg.get("guidance_interval")
            if gi is not None:
                # "lo,hi" string (dotted CLI override) or a 2-seq
                lo, hi = (
                    (int(v) for v in gi.split(","))
                    if isinstance(gi, str) else gi
                )
                gen_kwargs["guidance_interval"] = (int(lo), int(hi))
            if gr is not None:
                gen_kwargs["guidance_rescale"] = float(gr)
        imgs = engine.generate_images(
            n=n, minibatch=n, seed=0, use_ema=cfg.get("use_ema", True),
            num_sample_steps=cfg.get("num_sample_steps"),
            ddim=cfg.get("sampler") == "ddim",
            dpm_solver=cfg.get("sampler") == "dpmpp",
            dpm_order=int(cfg.get("dpm_order", 2)),
            heun=cfg.get("sampler") == "heun",
            heun_churn=float(cfg.get("heun_churn", 0.0)),
            edm=cfg.get("sampler") == "edm",
            edm_churn=float(cfg.get("edm_churn", 0.0)),
            flow=cfg.get("sampler") == "flow",
            flow_shift=cfg.get("flow_shift"),
            flow_heun=bool(cfg.get("flow_heun", False)),
            consistency=cfg.get("sampler") == "consistency",
            **gen_kwargs,
        )
        fig, axes = plt.subplots(1, n, figsize=(2 * n, 2.2))
        for i in range(n):
            _grid(np.atleast_1d(axes)[i], _to_img(imgs[i], normalize))
        tagname = f"fast_{cfg.get('sampler','ancestral')}_{cfg.get('num_sample_steps') or 'full'}"
        if gs is not None:
            tagname += f"_cfg{float(gs):g}"
        path = media_dir / f"{tagname}.png"
        fig.savefig(path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        print(f"[sample] wrote {path}")

    if (cfg.get("inpaint", False) or cfg.get("detailed_viz", False)) and \
            engine.prediction_type == "consistency":
        # both panels run table-driven chains through the eps-view, which
        # a consistency model doesn't have — skip with a notice instead of
        # dying mid-command (mirrors the regular_viz gate above)
        print("[sample] inpaint/detailed_viz need the eps-view; skipped "
              'for prediction_type="consistency"')
    elif cfg.get("inpaint", False):
        # RePaint inpainting panel (beyond the reference): mask val images
        # and fill the hidden region conditioned on the rest
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        _, val_loader = build_loaders(run_cfg)
        vb = next(iter(val_loader))
        n_img = int(cfg.get("n_images", 4))
        x0 = np.asarray(vb[0][:n_img])
        # guided inpainting when requested and the model is conditional:
        # condition on the val images' own labels
        ip_kwargs = {}
        gs = cfg.get("guidance_scale")
        if gs is not None:
            assert getattr(engine.model, "num_classes", None), (
                "guidance_scale needs a class-conditional model"
            )
            assert len(vb) > 1 and vb[1] is not None, (
                "guidance_scale inpainting needs labeled val data"
            )
            ip_kwargs = dict(guidance_scale=float(gs),
                             y=np.asarray(vb[1][:n_img]))
            gi = cfg.get("guidance_interval")
            if gi is not None:
                lo, hi = (
                    (int(v) for v in gi.split(","))
                    if isinstance(gi, str) else gi
                )
                ip_kwargs["guidance_interval"] = (int(lo), int(hi))
        res = x0.shape[1]
        spec = cfg.get("inpaint_mask", "right_half")
        mask = np.zeros((res, res, 1), np.float32)
        if spec == "right_half":
            mask[:, : res // 2] = 1.0
        elif spec == "bottom_half":
            mask[: res // 2] = 1.0
        elif spec == "center_box":
            q = res // 4
            mask[:] = 1.0
            mask[q : res - q, q : res - q] = 0.0
        else:
            raise ValueError(f"unknown inpaint_mask: {spec!r} (right_half | "
                             "bottom_half | center_box)")
        out = np.asarray(engine.inpaint(
            x0, mask, seed=int(cfg.get("seed", 0) or 0),
            use_ema=cfg.get("use_ema", True),
            num_sample_steps=cfg.get("num_sample_steps"),
            resample_steps=int(cfg.get("resample_steps", 1)),
            **ip_kwargs,
        ))
        masked = x0 * mask + (-1.0) * (1 - mask)
        k = len(x0)
        fig, axes = plt.subplots(3, k, figsize=(2 * k, 6.4))
        axes = np.asarray(axes).reshape(3, k)  # (3,) for k=1 otherwise
        for j in range(k):
            for i, img in enumerate((x0[j], masked[j], out[j])):
                _grid(axes[i, j], _to_img(img, normalize))
        for i, name in enumerate(("original", "masked", "inpainted")):
            axes[i, 0].set_ylabel(name, fontsize=9)
            axes[i, 0].set_axis_on()
            axes[i, 0].set_xticks([]); axes[i, 0].set_yticks([])
        path = media_dir / f"inpaint_{spec}.png"
        fig.savefig(path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        print(f"[sample] wrote {path}")

    if cfg.get("detailed_viz", False) and \
            engine.prediction_type != "consistency":
        run_detailed_viz(
            engine, run_cfg, media_dir, normalize, n_images=cfg.get("n_images", 4)
        )


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = load_config("sample", argv)
    return run_sampling(cfg)


if __name__ == "__main__":
    main()
