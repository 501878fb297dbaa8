"""Storage backend abstraction (reference pcdet/utils/file_client.py).

Only the HardDiskBackend is wired by shipped configs; other backends (e.g.
object stores) can subclass BaseBackend.  Methods cover the loaders the
datasets/augmentor need: raw bytes, text, numpy, pickle.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np


class BaseBackend:
    def get(self, filepath) -> bytes:
        raise NotImplementedError

    def get_text(self, filepath) -> str:
        raise NotImplementedError

    def exists(self, filepath) -> bool:
        raise NotImplementedError

    def load_to_numpy(self, filepath, dtype=np.float32):
        return np.frombuffer(self.get(filepath), dtype=dtype).copy()

    def load_pickle(self, filepath):
        return pickle.loads(self.get(filepath))


class HardDiskBackend(BaseBackend):
    """Local filesystem backend (reference file_client.py:50+)."""

    def __init__(self, **kwargs):
        pass

    def get(self, filepath) -> bytes:
        return Path(filepath).read_bytes()

    def get_text(self, filepath) -> str:
        return Path(filepath).read_text()

    def exists(self, filepath) -> bool:
        return Path(filepath).exists()

    def put(self, obj: bytes, filepath):
        Path(filepath).write_bytes(obj)
