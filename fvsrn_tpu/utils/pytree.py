"""Pytree dataclass infrastructure.

The reference (fV-SRN) builds its module system around ``IModule`` /
``IKernelModule`` (reference: renderer/imodule.h:132,303): named, serializable
host classes that generate CUDA code snippets and fill ``__constant__`` blocks.
On TPU the natural analogue is a *pytree dataclass*: static configuration
becomes jit-specialization (aux data), differentiable parameters become leaves.
``jax.jit`` then plays the role of the NVRTC kernel assembly
(reference: renderer/kernel_loader.cpp:372-540): every distinct static config
compiles its own fused XLA/Pallas program, cached by trace signature instead of
a SHA1 source hash.
"""
from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

_T = TypeVar("_T")


def static_field(**kwargs: Any) -> Any:
    """A dataclass field treated as static (auxiliary) pytree data.

    Static fields participate in jit specialization -- they are the TPU
    equivalent of the reference's ``#define`` kernel configuration
    (reference: renderer/imodule.h:368 getDefines).
    """
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def struct(cls: type[_T]) -> type[_T]:
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields created with :func:`static_field` are aux data; all other fields
    are child pytrees (arrays / parameters).
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    cls = jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )

    def replace(self: _T, **updates: Any) -> _T:
        return dataclasses.replace(self, **updates)

    cls.replace = replace  # type: ignore[attr-defined]
    return cls
