"""Serialization registry: ``@register(name)`` writes a ``name`` file in
the artifact directory so ``load(path)`` dispatches by model type
(reference: external/fv3fit/fv3fit/_shared/io.py:17-92)."""
from __future__ import annotations

import os
from typing import Callable, Dict, Type, TypeVar

from fv3net_tpu.fit.predictor import Reloadable

_NAME_PATH = "name"

R = TypeVar("R", bound=Type[Reloadable])


class _Register:
    def __init__(self) -> None:
        self._model_types: Dict[str, Type[Reloadable]] = {}

    def __call__(self, name: str) -> Callable[[R], R]:
        if name in self._model_types:
            raise ValueError(
                f"{name} already registered by {self._model_types[name]}"
            )

        def decorator(cls: R) -> R:
            self._model_types[name] = cls
            return cls

        return decorator

    def get_name(self, obj: Reloadable) -> str:
        best = None
        best_cls = None
        for name, cls in self._model_types.items():
            if isinstance(obj, cls):
                if best_cls is None or issubclass(cls, best_cls):
                    best, best_cls = name, cls
        if best is None:
            raise ValueError(
                f"{type(obj)} is not registered; decorate it with "
                "@fv3net_tpu.fit.register('name')"
            )
        return best

    def load(self, path: str) -> Reloadable:
        with open(os.path.join(path, _NAME_PATH)) as f:
            name = f.read().strip()
        try:
            cls = self._model_types[name]
        except KeyError:
            raise ValueError(f"unknown model type {name!r} at {path}")
        return cls.load(path)

    def dump(self, obj: Reloadable, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, _NAME_PATH), "w") as f:
            f.write(self.get_name(obj))
        obj.dump(path)


register = _Register()


def dump(obj: Reloadable, path: str) -> None:
    register.dump(obj, path)


def load(path: str) -> Reloadable:
    return register.load(path)
