"""String-keyed architecture registry.

The reference resolves architectures by name via ``model.__dict__[arch_name]()``
(``ESRGAN/train_esrgan.py:239-244``, ``BSRGAN/train_bsrgan.py:274-285``);
here that surface is an explicit registry shared by all model families.
"""

from __future__ import annotations

from typing import Any, Callable

_REGISTRY: dict[str, Callable[..., Any]] = {}


def register(name: str) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
    def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
        if name in _REGISTRY:
            raise ValueError(f"duplicate arch name {name!r}")
        _REGISTRY[name] = fn
        return fn

    return deco


def create_model(arch_name: str, **kwargs: Any):
    """Instantiate a Flax module by its reference-compatible arch name
    (e.g. ``rrdbnet_x4``, ``bsrgan_x2``, ``discriminator_unet``)."""
    try:
        factory = _REGISTRY[arch_name]
    except KeyError:
        raise KeyError(
            f"unknown arch {arch_name!r}; available: {sorted(_REGISTRY)}"
        ) from None
    return factory(**kwargs)


def list_models() -> list[str]:
    return sorted(_REGISTRY)


def arch_accepts(arch_name: str, field: str) -> bool:
    """True if the arch's module class declares ``field`` as a dataclass
    attribute. Resolved from the factory's return annotation (the factories
    are thin ``**kw`` pass-throughs, so their signatures say nothing);
    conservatively False when the annotation can't be resolved."""
    import dataclasses
    import inspect
    import sys

    factory = _REGISTRY.get(arch_name)
    if factory is None:
        return False
    ann = inspect.signature(factory).return_annotation
    if isinstance(ann, str):  # from __future__ import annotations
        ann = getattr(sys.modules.get(factory.__module__), ann, None)
    if ann is None or not dataclasses.is_dataclass(ann):
        return False
    return field in {f.name for f in dataclasses.fields(ann)}
