"""Training checkpoints: hdf5 run files + pickled state.

Rebuild of the reference checkpoint scheme
(reference: applications/volnet/train_volnet.py:178-267): one `.hdf5` file
per run holding all hyperparameters as attrs, per-epoch loss curves and
times as datasets, and serialized weights appended per checkpointed epoch
into a variable-length `weights` dataset -- inference reconstructs the
whole model from the hdf5 alone (reference: inference.py:112-189).
"""
from __future__ import annotations

import io
import json
import pickle
import time
from typing import Any, Optional

import h5py
import jax
import numpy as np


def _serialize_pytree(tree) -> bytes:
    leaves, treedef = jax.tree.flatten(tree)
    payload = {
        "leaves": [np.asarray(l) for l in leaves],
        "treedef": pickle.dumps(treedef),
    }
    buf = io.BytesIO()
    pickle.dump(payload, buf)
    return buf.getvalue()


def _deserialize_pytree(data: bytes):
    payload = pickle.loads(bytes(data))
    treedef = pickle.loads(payload["treedef"])
    return jax.tree.unflatten(treedef, payload["leaves"])


class RunCheckpoint:
    """One training run's hdf5 file (reference: train_volnet.py:169-267)."""

    def __init__(self, path: str, mode: str = "a"):
        self.path = path
        self.file = h5py.File(path, mode)

    def close(self):
        self.file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- hyperparameters as attrs (reference: :178-188) -----------------
    def set_options(self, opts: dict):
        for k, v in opts.items():
            if isinstance(v, (dict, list, tuple)):
                v = json.dumps(v)
            if v is None:
                v = "None"
            self.file.attrs[k] = v
        self.file.attrs.setdefault("created", time.time())

    def get_options(self) -> dict:
        return dict(self.file.attrs)

    # -- loss curves (reference: :190-194) ------------------------------
    def append_losses(self, epoch: int, losses: dict, seconds: float):
        for name, value in {**losses, "times": seconds}.items():
            if name not in self.file:
                self.file.create_dataset(name, (0,), maxshape=(None,),
                                         dtype=np.float64)
            ds = self.file[name]
            ds.resize((max(len(ds), epoch + 1),))
            ds[epoch] = float(value)

    def get_losses(self, name: str) -> np.ndarray:
        return np.asarray(self.file[name])

    # -- weights snapshots (reference: :196-266) -------------------------
    def save_weights(self, network, epoch: int):
        blob = np.frombuffer(_serialize_pytree(network), np.uint8)
        grp = self.file.require_group("weights")
        name = f"epoch_{epoch:06d}"
        if name in grp:
            del grp[name]
        grp.create_dataset(name, data=blob)
        self.file.attrs["last_epoch"] = epoch
        self.file.flush()

    def load_weights(self, epoch: Optional[int] = None):
        grp = self.file["weights"]
        if epoch is None:
            name = sorted(grp.keys())[-1]
        else:
            name = f"epoch_{epoch:06d}"
        return _deserialize_pytree(np.asarray(grp[name]).tobytes())

    def epochs_with_weights(self) -> list[int]:
        if "weights" not in self.file:
            return []
        return sorted(int(k.split("_")[1]) for k in self.file["weights"])


def save_state(path: str, network, opt_state: Any = None,
               extra: Optional[dict] = None):
    """Full-state snapshot (the reference's torch.save `.pth`,
    train_volnet.py:261-263)."""
    with open(path, "wb") as f:
        pickle.dump({
            "network": _serialize_pytree(network),
            "opt_state": _serialize_pytree(opt_state)
            if opt_state is not None else None,
            "extra": extra or {},
        }, f)


def load_state(path: str):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    network = _deserialize_pytree(blob["network"])
    opt_state = (_deserialize_pytree(blob["opt_state"])
                 if blob["opt_state"] is not None else None)
    return network, opt_state, blob["extra"]
