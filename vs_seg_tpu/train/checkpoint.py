"""Full-state checkpointing.

The reference saves weights only (params/VSparams.py:508,526), so a crash loses
the optimizer state and epoch counter. Here a checkpoint is the complete
training state: params, batch_stats, optimizer state, epoch, PRNG key, best
metric — a true resume point. Serialized with flax msgpack (self-describing,
no template needed to restore).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    data = serialization.msgpack_serialize(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
