"""Ensemble/timeseries volume factory with LRU caching.

Rebuild of ``VolumeEnsembleFactory`` (reference: renderer/volume.h:511-640,
volume.cpp:1440-1505) + the LRU cache (reference: renderer/lru_cache.h:12):
maps (ensemble, timestep) indices to filenames through a printf-style
format string with start/step offsets, loads volumes on demand, and keeps
the most recent loads in a bounded cache. JSON settings round-trip like
the reference's save/load.
"""
from __future__ import annotations

import json
import os
from collections import OrderedDict
from typing import Callable, Generic, Hashable, Optional, TypeVar

from .volume import Volume

K = TypeVar("K", bound=Hashable)
V = TypeVar("V")


class LRUCache(Generic[K, V]):
    """Bounded least-recently-used cache (reference: lru_cache.h:12)."""

    def __init__(self, capacity: int = 4):
        self.capacity = capacity
        self._store: OrderedDict = OrderedDict()

    def get(self, key: K) -> Optional[V]:
        if key not in self._store:
            return None
        self._store.move_to_end(key)
        return self._store[key]

    def put(self, key: K, value: V):
        self._store[key] = value
        self._store.move_to_end(key)
        while len(self._store) > self.capacity:
            self._store.popitem(last=False)

    def get_or_load(self, key: K, loader: Callable[[K], V]) -> V:
        v = self.get(key)
        if v is None:
            v = loader(key)
            self.put(key, v)
        return v

    def __len__(self):
        return len(self._store)


class VolumeEnsembleFactory:
    def __init__(self, format_string: str = "", start_ensemble: int = 0,
                 num_ensembles: int = 1, start_timestep: int = 0,
                 num_timesteps: int = 1, step_ensemble: int = 1,
                 step_timestep: int = 1, root: str = "./",
                 cache_size: int = 4):
        self.format_string = format_string
        self.start_ensemble = start_ensemble
        self.num_ensembles = num_ensembles
        self.start_timestep = start_timestep
        self.num_timesteps = num_timesteps
        self.step_ensemble = step_ensemble
        self.step_timestep = step_timestep
        self.root = root
        self._cache: LRUCache = LRUCache(cache_size)

    def get_volume_filename(self, ensemble: int, time: int) -> str:
        """(reference: volume.cpp:1489-1505): the format string receives
        (ensemble, time) after start/step mapping; relative paths resolve
        against ``root``."""
        if not (0 <= ensemble < self.num_ensembles):
            raise IndexError("ensemble out of bounds")
        if not (0 <= time < self.num_timesteps):
            raise IndexError("timestep out of bounds")
        e = self.start_ensemble + self.step_ensemble * ensemble
        t = self.start_timestep + self.step_timestep * time
        filename = _tinyformat(self.format_string, e, t)
        if not os.path.isabs(filename):
            filename = os.path.abspath(os.path.join(self.root, filename))
        return filename

    def load_volume(self, ensemble: int, time: int) -> Optional[Volume]:
        filename = self.get_volume_filename(ensemble, time)

        def loader(_key):
            if not os.path.exists(filename):
                return None
            return Volume.load(filename)

        return self._cache.get_or_load((ensemble, time), loader)

    # JSON settings round-trip (reference: volume.h:543-548)
    def save(self, filename: str):
        with open(filename, "w") as f:
            json.dump({
                "formatString": self.format_string,
                "startEnsemble": self.start_ensemble,
                "stepEnsemble": self.step_ensemble,
                "numEnsembles": self.num_ensembles,
                "startTimestep": self.start_timestep,
                "stepTimestep": self.step_timestep,
                "numTimesteps": self.num_timesteps,
            }, f, indent=2)

    @classmethod
    def from_file(cls, filename: str) -> "VolumeEnsembleFactory":
        with open(filename) as f:
            j = json.load(f)
        fac = cls(
            format_string=j.get("formatString", ""),
            start_ensemble=j.get("startEnsemble", 0),
            num_ensembles=j.get("numEnsembles", 1),
            start_timestep=j.get("startTimestep", 0),
            num_timesteps=j.get("numTimesteps", 1),
            step_ensemble=j.get("stepEnsemble", 1),
            step_timestep=j.get("stepTimestep", 1),
        )
        fac.root = os.path.dirname(os.path.abspath(filename))
        return fac


def _tinyformat(fmt: str, *args) -> str:
    """printf-style formatting with the subset tinyformat supports for
    filename templates (%d, %04d, %s ...); ignores surplus arguments like
    format strings that only reference the ensemble."""
    # count conversion specifiers (%% doesn't consume an argument)
    import re
    n = len(re.findall(r"%[-+0-9.# ]*[a-zA-Z]", fmt.replace("%%", "")))
    return fmt % args[:n] if n else fmt
