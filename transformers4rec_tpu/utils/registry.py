"""Minimal name→class registry with ``parse`` dispatch.

The reference threads registries through masking / aggregation / transformation /
transformer-config / dataloader / metrics (e.g. masking_registry at
/root/reference/transformers4rec/torch/masking.py:26). Same capability here,
dependency-free.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._items: Dict[str, Any] = {}

    def register(self, *names: str) -> Callable:
        def deco(obj):
            for n in names:
                key = n.lower()
                self._items[key] = obj
            return obj

        return deco

    def register_with_multiple_names(self, *names: str) -> Callable:
        return self.register(*names)

    def get(self, name: str, default=None):
        return self._items.get(name.lower(), default)

    def parse(self, name_or_obj):
        """Resolve a registered name → class; pass through instances/classes."""
        if isinstance(name_or_obj, str):
            key = name_or_obj.lower()
            if key not in self._items:
                raise KeyError(
                    f"{name_or_obj!r} not found in {self.name} registry; "
                    f"available: {sorted(self._items)}"
                )
            return self._items[key]
        return name_or_obj

    def keys(self):
        return self._items.keys()

    def __contains__(self, name: str) -> bool:
        return name.lower() in self._items
