"""Checkpoint / resume via Orbax.

The reference saves ``network.state_dict()`` every epoch into
``output/<training_id>/<exp_name>/epochs/<epoch>/network.pth`` with a ring
buffer of the newest ``save_que_len`` checkpoints and auto-resume from the
latest epoch directory (reference train.py:238-265, 664-673).  This module
keeps that UX but also checkpoints what the reference forgets: optimizer
state, the RNG key, the epoch, and the extracted skeleton.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..skeleton import Skeleton


def _epoch_dirs(ckpt_root: str) -> list[int]:
    if not os.path.isdir(ckpt_root):
        return []
    out = []
    for name in os.listdir(ckpt_root):
        if name.isdigit():
            out.append(int(name))
    return sorted(out)


class CheckpointManager:
    """Epoch-directory checkpoints with ring-buffer retention."""

    def __init__(self, logger_path: str, save_que_len: int = 100):
        self.ckpt_root = os.path.abspath(os.path.join(logger_path, "epochs"))
        os.makedirs(self.ckpt_root, exist_ok=True)
        self.save_que_len = save_que_len
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, epoch: int, state, skeleton: Optional[Skeleton] = None,
             extra: Optional[dict[str, Any]] = None) -> None:
        # orbax's Checkpointer is itself a collective in multi-host runs
        # (internal sync_global_devices barriers): EVERY process must call
        # save; only the filesystem bookkeeping is coordinator-only
        multiproc = jax.process_count() > 1
        coordinator = jax.process_index() == 0
        if coordinator:
            # ring buffer (reference train.py:666-671)
            existing = _epoch_dirs(self.ckpt_root)
            while len(existing) >= self.save_que_len:
                shutil.rmtree(os.path.join(self.ckpt_root,
                                           str(existing[0])))
                existing = existing[1:]
        path = os.path.join(self.ckpt_root, str(epoch))
        if coordinator and os.path.exists(path):
            shutil.rmtree(path)
        if multiproc:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"nm_ckpt_pre_{epoch}")
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "rng": state.rng,
            "step": state.step,
        }
        self._ckptr.save(os.path.join(path, "state"), payload)
        meta: dict[str, Any] = {"epoch": epoch}
        if extra:
            meta.update(extra)
        if skeleton is not None:
            meta["skeleton"] = {
                "A": np.asarray(skeleton.A).tolist(),
                "priority_values":
                    np.asarray(skeleton.priority_values).tolist(),
                "priority_indices":
                    np.asarray(skeleton.priority_indices).tolist(),
                "parents": np.asarray(skeleton.parents).tolist(),
            }
        if coordinator:
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f)
        self._ckptr.wait_until_finished()
        if multiproc:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"nm_ckpt_post_{epoch}")

    def latest_epoch(self) -> Optional[int]:
        dirs = _epoch_dirs(self.ckpt_root)
        return dirs[-1] if dirs else None

    def restore(self, state_template, epoch: Optional[int] = None):
        """Restore (state, skeleton, meta).  ``epoch=None`` -> latest."""
        if epoch is None:
            epoch = self.latest_epoch()
        if epoch is None:
            raise FileNotFoundError(
                f"no checkpoints under {self.ckpt_root}")
        path = os.path.join(self.ckpt_root, str(epoch))
        template = {
            "params": state_template.params,
            "opt_state": state_template.opt_state,
            "rng": state_template.rng,
            "step": state_template.step,
        }
        payload = self._ckptr.restore(os.path.join(path, "state"), template)
        state = state_template.replace(**payload)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        skeleton = None
        if "skeleton" in meta:
            sk = meta.pop("skeleton")
            skeleton = Skeleton(
                A=np.asarray(sk["A"], np.float32),
                priority_values=np.asarray(sk["priority_values"], np.float32),
                priority_indices=np.asarray(sk["priority_indices"], np.int32),
                parents=np.asarray(sk["parents"], np.int32))
        return state, skeleton, meta


def load_params_only(logger_path: str, state_template, epoch=None):
    mgr = CheckpointManager(logger_path)
    state, skeleton, meta = mgr.restore(state_template, epoch)
    return state.params, skeleton, meta
