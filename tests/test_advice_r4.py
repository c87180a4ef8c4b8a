"""Regression tests for the ADVICE r4 findings (all three fixed this round).

1. cli.sample: guidance_rescale set WITHOUT guidance_scale now raises the
   engine's readable error instead of being silently dropped.
2. engine._sample_tables docstring lists "trailingN" (the zero_terminal_snr
   pairing) alongside the other respacing specs.
3. core.schedules.rescale_zero_terminal_snr validates its output with a
   ValueError, not a bare ``assert`` (stripped under ``python -O``).
"""

import numpy as np
import pytest

from probabilisticdeepdiffusionmodels_tpu.core.schedules import (
    rescale_zero_terminal_snr,
)
from probabilisticdeepdiffusionmodels_tpu.engine import DiffusionEngine


def test_sample_cli_guidance_rescale_without_scale_raises(tmp_path):
    from probabilisticdeepdiffusionmodels_tpu.cli import sample as sample_cli

    cfg = {
        "run_dir": str(tmp_path),  # never reached: validation fires first
        "guidance_rescale": 0.7,
    }
    with pytest.raises(ValueError, match="guidance_rescale needs guidance_scale"):
        sample_cli.run_sampling(cfg)


def test_sample_tables_docstring_lists_trailing():
    doc = DiffusionEngine._sample_tables.__doc__
    for spec in ('"ddimN"', '"karrasN"', '"trailingN"'):
        assert spec in doc, f"{spec} missing from _sample_tables docstring"


def test_ztsnr_output_check_is_valueerror():
    # A 2-step table is the minimal legal input; force the pathological
    # branch by feeding betas whose rescale pushes beta out of (0, 1).
    bad = np.array([0.999999, 0.999999], np.float32)
    try:
        out = rescale_zero_terminal_snr(bad)
    except ValueError:
        pass  # the new explicit validation path
    else:
        # if this input happens to survive, the contract still holds
        assert np.all(out > 0) and np.all(out < 1)

    # and a healthy table still round-trips fine
    good = np.linspace(1e-4, 0.02, 100, dtype=np.float32)
    out = rescale_zero_terminal_snr(good)
    assert np.all(out > 0) and np.all(out < 1)
    abar = np.cumprod(1 - out.astype(np.float64))
    assert abar[-1] < 1e-6  # terminal SNR ~ 0
