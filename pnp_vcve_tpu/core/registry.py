"""Name -> constructor registry (reference: mmedit registries built on
mmcv ``build_from_cfg``, mmedit/models/registry.py:5-8). Reference type
names are registered as aliases so existing config files keep working."""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

__all__ = ["Registry"]


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._map: Dict[str, Callable] = {}

    def register(self, obj: Optional[Callable] = None, *, name=None, aliases=()):
        def deco(o):
            names = [name or o.__name__, *aliases]
            for n in names:
                if n in self._map:
                    raise KeyError(f"{n!r} already registered in {self.name}")
                self._map[n] = o
            return o

        return deco(obj) if obj is not None else deco

    def get(self, name: str) -> Callable:
        if name not in self._map:
            raise KeyError(
                f"{name!r} not found in registry {self.name}; "
                f"known: {sorted(self._map)}"
            )
        return self._map[name]

    def build(self, cfg: dict, **extra) -> Any:
        """Instantiate from a {'type': name, ...kwargs} dict. Builders that
        declare a ``_type_name`` parameter receive the requested type name
        (so one builder can serve several aliases, e.g. the LDP PQF /
        non-PQF pair)."""
        import inspect

        cfg = dict(cfg)
        typ = cfg.pop("type")
        fn = self.get(typ)
        try:
            if "_type_name" in inspect.signature(fn).parameters:
                extra = {**extra, "_type_name": typ}
        except (TypeError, ValueError):
            pass
        return fn(**cfg, **extra)

    def __contains__(self, name: str) -> bool:
        return name in self._map
