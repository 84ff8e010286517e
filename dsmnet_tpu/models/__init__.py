"""Model zoo registry (reference models/__init__.py:4-34).

Every model obeys the contract::

    scales, disps = model.apply(variables, imL, imR, train=..., clamp=...)

with NHWC images, ``disps[i]`` of shape (N, H/2^scales[i], W/2^scales[i], 1),
``disps[0]`` full resolution, and a ``count_levels`` attribute consumed by
the loss level-weight curriculum.
"""

from __future__ import annotations

from .dispnet import DispNet, DispNetC
from .gcnet import GCNet
from .iresnet import IResNet
from .psmnet import PSMNet
from .psmnet_basic import PSMNetBasic

MODELS = {
    "dispnet": DispNet,
    "dispnetcorr": DispNetC,
    "iresnet": IResNet,
    "gcnet": GCNet,
    "psmnet": PSMNet,
    "psmnet_basic": PSMNetBasic,
}


def create_model(name: str, maxdisparity: int = 192, **kwargs):
    """Name -> flax module instance (reference model_create_by_name)."""
    if name not in MODELS:
        raise ValueError(f"unknown model '{name}'; supported: {sorted(MODELS)}")
    return MODELS[name](maxdisparity=maxdisparity, **kwargs)


__all__ = [
    "MODELS",
    "create_model",
    "DispNet",
    "DispNetC",
    "IResNet",
    "GCNet",
    "PSMNet",
    "PSMNetBasic",
]
