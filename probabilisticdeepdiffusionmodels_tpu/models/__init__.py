"""Model factory (reference: src/modules/__init__.py:1-49).

``get_model(resolution, cfg)`` consumes a config dict with a ``name`` key.
As in the reference, ``attention_resolutions`` in configs are image-side
lengths (e.g. [16, 8]) converted here to downsample rates
(``resolution // res`` — reference src/modules/__init__.py:30-32).

Divergences from the reference, both deliberate and documented:
  * ``learn_sigma`` is a real option (out_channels doubles, IDDPM-style)
    instead of the reference's hard-coded False TODO
    (src/modules/__init__.py:34-39).  Default False for parity.
  * ``dense`` is accepted (the reference imports DenseModel but rejects
    every name except "unet", src/modules/__init__.py:9-10).
  * ``superres`` builds the SuperResModel subclass, reachable in the
    reference only programmatically.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .dense import DenseModel
from .unet import SuperResModel, UNetModel

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def get_model(resolution: int, cfg: Dict[str, Any]):
    cfg = dict(cfg)
    name = cfg.pop("name")
    if name == "unet":
        return get_unet(resolution, **cfg)
    if name == "superres":
        return get_unet(resolution, _cls=SuperResModel, **cfg)
    if name == "dense":
        cfg.setdefault("resolution", resolution)
        cfg.pop("compute_dtype", None)
        return DenseModel(**cfg)
    raise ValueError(f"Unknown model name: {name!r}")


def get_unet(
    resolution: int,
    in_channels: int,
    model_channels: int,
    num_res_blocks: int,
    attention_resolutions,
    dropout: float = 0,
    channel_mult=(1, 2, 4, 8),
    conv_resample: bool = True,
    dims: int = 2,
    num_classes=None,
    cfg_null_class: bool = False,
    use_checkpoint: bool = False,
    num_heads: int = 1,
    num_heads_upsample: int = -1,
    use_scale_shift_norm: bool = False,
    learn_sigma: bool = False,
    compute_dtype: str = "float32",
    use_pallas_attention: bool = False,
    pallas_attention_min_tokens: int = 256,
    use_pallas_gn: bool = False,
    use_pallas_conv: bool = False,
    _cls=UNetModel,
):
    if dims not in (1, 2, 3):
        raise ValueError(f"dims must be 1, 2 or 3, got {dims}")
    if cfg_null_class and not num_classes:
        raise ValueError("cfg_null_class requires num_classes (the null "
                         "token is the extra row of the label embedding)")
    if dims != 2 and _cls is SuperResModel:
        raise NotImplementedError("SuperResModel is 2-D (bilinear low_res)")
    attention_ds = tuple(resolution // int(res) for res in attention_resolutions)
    kwargs = {} if _cls is SuperResModel else {"dims": dims}
    return _cls(
        in_channels=in_channels,
        model_channels=model_channels,
        out_channels=in_channels * (2 if learn_sigma else 1),
        num_res_blocks=num_res_blocks,
        attention_resolutions=attention_ds,
        dropout=dropout,
        channel_mult=tuple(channel_mult),
        conv_resample=conv_resample,
        num_classes=num_classes,
        cfg_null_class=cfg_null_class,
        use_checkpoint=use_checkpoint,
        num_heads=num_heads,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        use_pallas_attention=use_pallas_attention,
        pallas_attention_min_tokens=pallas_attention_min_tokens,
        use_pallas_gn=use_pallas_gn,
        use_pallas_conv=use_pallas_conv,
        dtype=_DTYPES[compute_dtype],
        **kwargs,
    )
