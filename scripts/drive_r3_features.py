"""TPU drive of the round-3 features (verify artifact): min-SNR + v +
importance training, karras-respaced DDIM/DPM++ sampling, RePaint
inpainting (full/respaced/resampled), x0-prediction - one real-hardware
pass over everything this round added.  Run via scripts/r3_tpu_queue.sh.
"""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine

MODEL_CFG = dict(name="unet", in_channels=1, model_channels=32,
                 num_res_blocks=1, attention_resolutions=[8],
                 channel_mult=[1, 2], num_heads=2)
eng = DiffusionEngine(
    model_config=MODEL_CFG, optimizer_config={"lr": 1e-3},
    diffusion_steps=100, mode="cosine", resolution=16, seed=0,
    loss_weighting="min_snr", snr_gamma=5.0, prediction_type="v",
    sampling="importance",
)
x = jax.random.normal(jax.random.PRNGKey(7), (8, 16, 16, 1))
losses = [float(eng.training_step(x)["loss"]) for _ in range(5)]
print('min-snr+v+importance losses:', [round(l, 4) for l in losses], flush=True)
assert np.isfinite(losses).all()
# karras respaced DDIM + dpmpp + heun (r4)
for spec, kw in [("karras10", dict(ddim=True)), ("karras10", dict(dpm_solver=True)),
                 ("karras10", dict(heun=True))]:
    imgs = np.asarray(eng.generate_images(n=4, minibatch=4, seed=1,
                                          num_sample_steps=spec, **kw))
    assert np.isfinite(imgs).all(), (spec, kw)
    print('karras sample ok', kw, float(imgs.std()), flush=True)
# inpaint endpoint (full + respaced + resample)
x0 = jax.random.normal(jax.random.PRNGKey(5), (4, 16, 16, 1))
mask = jnp.zeros((16, 16, 1)).at[:, :8].set(1.0)
out = np.asarray(eng.inpaint(x0, mask, seed=3))
m = np.broadcast_to(np.asarray(mask), x0.shape).astype(bool)
assert np.array_equal(out[m], np.asarray(x0)[m]) and np.isfinite(out).all()
out2 = np.asarray(eng.inpaint(x0, mask, seed=3, num_sample_steps=10, resample_steps=2))
assert np.array_equal(out2[m], np.asarray(x0)[m]) and np.isfinite(out2).all()
print('inpaint ok', float(out.std()), float(out2.std()), flush=True)

# x0-prediction engine path
eng2 = DiffusionEngine(
    model_config=MODEL_CFG, optimizer_config={"lr": 1e-3},
    diffusion_steps=100, mode="cosine", resolution=16, seed=0,
    prediction_type="x0",
)
l2 = float(eng2.training_step(x)["loss"])
imgs2 = np.asarray(eng2.generate_images(n=2, minibatch=2, seed=1))
assert np.isfinite(l2) and np.isfinite(imgs2).all()
print('x0 path ok', l2, flush=True)
print('TPU DRIVE OK', flush=True)
