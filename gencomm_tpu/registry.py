"""Explicit name->factory registries.

The reference wires everything through string reflection and ``eval``
(reference: opencood/tools/train_utils.py:255-324, opencood/hypes_yaml/
yaml_utils.py:46-48). We replace that with explicit registries: safer,
greppable, and importable without scanning modules.
"""

from __future__ import annotations

from typing import Callable, Dict


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Callable] = {}

    def register(self, name: str, obj: Callable | None = None):
        """Register ``obj`` under ``name``; usable as a decorator."""
        key = name.lower()

        def _do(o):
            if key in self._entries and self._entries[key] is not o:
                raise KeyError(f"duplicate {self.kind} registration: {name}")
            self._entries[key] = o
            return o

        return _do(obj) if obj is not None else _do

    def get(self, name: str) -> Callable:
        key = name.lower()
        if key not in self._entries:
            known = ", ".join(sorted(self._entries))
            raise KeyError(f"unknown {self.kind} '{name}'. known: {known}")
        return self._entries[key]

    def __contains__(self, name: str) -> bool:
        return name.lower() in self._entries

    def names(self):
        return sorted(self._entries)


MODELS = Registry("model")          # core_method in model: block
LOSSES = Registry("loss")           # core_method in loss: block
FUSIONS = Registry("fusion")        # fusion_method in model args
ENCODERS = Registry("encoder")      # per-modality core_method (point_pillar, ...)
PREPROCESSORS = Registry("preprocessor")
POSTPROCESSORS = Registry("postprocessor")
DATASETS = Registry("dataset")
YAML_PARSERS = Registry("yaml_parser")
