"""DeviceDataLoader (data/device_loader.py): HBM-resident data path.

The contract is STREAM PARITY with the host DataLoader — same seed, same
rng consumption order, same samples out — with the pixel work jitted on
device instead of run in numpy/native on host."""

import numpy as np
import pytest

from probabilisticdeepdiffusionmodels_tpu.data import (
    ArrayDataset,
    DataLoader,
    DeviceDataLoader,
    get_dataset,
)


def _pairs(h, d):
    hb, db = list(h), list(d)
    assert len(hb) == len(db) and len(hb) > 0
    return zip(hb, db)


@pytest.mark.parametrize("tk", [
    dict(normalize="cifar"),
    dict(normalize="oneone", flip=True),
    dict(normalize="mnist", flip=True, crop=True, crop_size=16,
         crop_padding=2),
])
def test_stream_parity_with_host_loader(tk):
    ds = get_dataset("synthetic", resolution=16, n=48, channels=3)
    kw = dict(batch_size=16, train=True, seed=7, transformation_kwargs=tk,
              num_samples_per_epoch=32)
    host = DataLoader(ds, **kw)
    dev = DeviceDataLoader(ds, **kw)
    for (xh, yh), (xd, yd) in _pairs(host, dev):
        # pixels match to float-conversion-order noise; decisions (indices,
        # flips, crops) match EXACTLY or the arrays would differ wholesale
        np.testing.assert_allclose(np.asarray(xd), xh, atol=2e-6)
        np.testing.assert_array_equal(np.asarray(yd), yh)


def test_two_epochs_advance_rng_like_host():
    ds = get_dataset("synthetic", resolution=8, n=32, channels=1)
    kw = dict(batch_size=8, train=True, seed=3,
              transformation_kwargs=dict(normalize="mnist", flip=True))
    host, dev = DataLoader(ds, **kw), DeviceDataLoader(ds, **kw)
    for _ in range(2):  # second epoch draws a NEW order from the same rng
        for (xh, yh), (xd, yd) in _pairs(host, dev):
            np.testing.assert_allclose(np.asarray(xd), xh, atol=2e-6)


def test_eval_split_no_shuffle():
    ds = get_dataset("synthetic", resolution=8, n=24, channels=1)
    kw = dict(batch_size=8, train=False,
              transformation_kwargs=dict(normalize="mnist"))
    for (xh, _), (xd, _) in _pairs(DataLoader(ds, **kw),
                                   DeviceDataLoader(ds, **kw)):
        np.testing.assert_allclose(np.asarray(xd), xh, atol=2e-6)


def test_shard_slicing_matches_host():
    ds = get_dataset("synthetic", resolution=8, n=32, channels=1)
    kw = dict(batch_size=4, train=True, seed=5,
              transformation_kwargs=dict(normalize="mnist"),
              num_samples_per_epoch=24, shard_id=1, num_shards=2)
    host, dev = DataLoader(ds, **kw), DeviceDataLoader(ds, **kw)
    assert len(host) == len(dev)
    for (xh, _), (xd, _) in _pairs(host, dev):
        np.testing.assert_allclose(np.asarray(xd), xh, atol=2e-6)


def test_rejections():
    ds = get_dataset("synthetic", resolution=8, n=8, channels=1)
    with pytest.raises(ValueError, match="superres"):
        DeviceDataLoader(ds, batch_size=4, superres_factor=2)
    floats = ArrayDataset(
        np.zeros((8, 8, 8, 1), np.float32), np.zeros((8,), np.int32))
    with pytest.raises(ValueError, match="uint8"):
        DeviceDataLoader(floats, batch_size=4)

    class FileBacked:
        def load(self, idx):  # pragma: no cover - marker only
            raise NotImplementedError

    with pytest.raises(ValueError, match="in-memory"):
        DeviceDataLoader(FileBacked(), batch_size=4)


def test_trainer_runs_on_device_loader(tmp_path):
    """End-to-end: Trainer + device-resident loader + fused steps — device
    batches must flow through prefetch/fused stacking without a host
    round trip (jnp.stack path) and train to finite losses."""
    from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine
    from probabilisticdeepdiffusionmodels_tpu.logging.sink import (
        MetricLogger,
        RunDir,
    )
    from probabilisticdeepdiffusionmodels_tpu.train.loop import Trainer

    ds = get_dataset("synthetic", resolution=8, n=32, channels=1)
    loaders = [
        DeviceDataLoader(ds, batch_size=16, train=tr, seed=0,
                         transformation_kwargs=dict(normalize="mnist"))
        for tr in (True, False)
    ]
    engine = DiffusionEngine(
        model_config=dict(name="unet", in_channels=1, model_channels=16,
                          num_res_blocks=1, attention_resolutions=[],
                          channel_mult=[1, 2]),
        optimizer_config={"lr": 1e-3}, diffusion_steps=20, mode="cosine",
        resolution=8, ema=0.9, seed=0,
    )
    run_dir = RunDir(str(tmp_path), "devloader")
    trainer = Trainer(engine, run_dir, logger=MetricLogger(run_dir),
                      max_epochs=2, check_val_every_n_epoch=2, patience=100,
                      fused_steps=2)
    result = trainer.fit(*loaders)
    assert np.isfinite(result["best_val_loss"])
    assert result["steps"] == 4
