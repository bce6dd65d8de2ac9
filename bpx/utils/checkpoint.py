"""Checkpoint / resume via orbax (ref: utils/utils.py:21-30, train.py:372-379,
419-430).

Semantics preserved from the reference:
* every improvement saves ``latest`` and refreshes ``best``
  (ref: save_checkpoint writes checkpoint.pt and copies to model_best.pt);
* auto-resume picks up ``latest`` when the run dir already contains one
  (ref: train.py:372-379), restoring epoch, early-stop counters, best metric
  and the LR-scheduler state alongside the device state.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, savedir: str):
        self.savedir = os.path.abspath(savedir)
        os.makedirs(self.savedir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.savedir, tag)

    def save(self, state, host_state: Dict[str, Any],
             is_best: bool = False) -> None:
        """Write ``latest`` (and mirror to ``best`` on improvement)."""
        path = self._path("latest")
        tmp = self._path("latest.tmp")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._ckptr.save(tmp, state)
        self._ckptr.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        with open(os.path.join(self.savedir, "host_state.json"), "w") as f:
            json.dump(host_state, f, indent=2, default=float)
        if is_best:
            best = self._path("best")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
            with open(os.path.join(self.savedir, "best_host_state.json"),
                      "w") as f:
                json.dump(host_state, f, indent=2, default=float)

    def has_checkpoint(self, tag: str = "latest") -> bool:
        return os.path.exists(self._path(tag))

    def restore(self, example_state, tag: str = "latest"
                ) -> Tuple[Any, Dict[str, Any]]:
        """Restore device state (structured like ``example_state``) + host
        state dict."""
        state = self._ckptr.restore(self._path(tag), example_state)
        host_file = ("best_host_state.json" if tag == "best"
                     else "host_state.json")
        host_path = os.path.join(self.savedir, host_file)
        host_state: Dict[str, Any] = {}
        if os.path.exists(host_path):
            with open(host_path) as f:
                host_state = json.load(f)
        return state, host_state

    def save_config(self, config) -> None:
        """Args snapshot (ref: train.py:367 ``torch.save(args, args.pt)``)."""
        import dataclasses
        with open(os.path.join(self.savedir, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(config), f, indent=2, default=str)
