"""Native (C++) transform executor parity vs the numpy reference path."""

import numpy as np
import pytest

from probabilisticdeepdiffusionmodels_tpu.data.native import (
    get_lib,
    transform_batch_native,
)
from probabilisticdeepdiffusionmodels_tpu.data.transforms import Transform

native_available = get_lib() is not None
pytestmark = pytest.mark.skipif(
    not native_available, reason="native lib unavailable (no g++)"
)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(normalize="oneone", flip=True),
        dict(normalize="mnist", crop=True, crop_size=28, crop_padding=4),
        dict(normalize=None, flip=True, crop=True, crop_size=24, crop_padding=0),
        dict(normalize="cifar", flip=True, crop=True, crop_size=32, crop_padding=4),
    ],
)
def test_native_matches_numpy(kwargs):
    rng_data = np.random.default_rng(0)
    ch = 1 if kwargs.get("normalize") == "mnist" else 3
    raw = rng_data.integers(0, 256, size=(8, 28 if ch == 1 else 32,
                                          28 if ch == 1 else 32, ch),
                            dtype=np.uint8)
    tf = Transform(train=True, **kwargs)
    out_native = tf(raw, np.random.default_rng(42), use_native=True)
    out_numpy = tf(raw, np.random.default_rng(42), use_native=False)
    assert out_native.shape == out_numpy.shape
    np.testing.assert_allclose(out_native, out_numpy, rtol=0, atol=1e-6)


def test_native_direct_no_ops():
    raw = np.random.default_rng(1).integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    out = transform_batch_native(
        raw, None, False, 0, 0, None, None,
        np.zeros(3, np.float32), np.ones(3, np.float32),
    )
    np.testing.assert_allclose(out, raw.astype(np.float32) / 255.0, atol=1e-7)
