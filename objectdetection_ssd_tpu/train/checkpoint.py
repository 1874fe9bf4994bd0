"""Orbax checkpointing: per-epoch save, resume-with-sharding.

The TPU-native replacement for the reference's `torch.save` of
{epoch, model, optimizer, loss, epoch_losses} to a hard-coded Drive path
every epoch (`train_function.py:23-34,114-120`).  Differences by design:
  * path comes from config, not a literal;
  * async save overlaps with the next epoch's compute;
  * restore does NOT reset the learning rate (the reference force-overrides
    lr on resume, `train_function.py:29-30` — a quirk we drop because the
    schedule is part of the optimizer state here).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

from objectdetection_ssd_tpu.train.state import TrainState


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for TrainState + metadata."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, epoch: int, state: TrainState,
             metadata: Optional[Dict[str, Any]] = None) -> None:
        """Save at ``epoch`` (reference saves every epoch,
        `train_function.py:114-120`)."""
        payload = {"state": ocp.args.StandardSave(_savable(state))}
        if metadata is not None:
            payload["metadata"] = ocp.args.JsonSave(metadata)
        self._mgr.save(epoch, args=ocp.args.Composite(**payload))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, epoch: Optional[int] = None
                ) -> Tuple[TrainState, Dict[str, Any], int]:
        """Restore (state, metadata, epoch); ``state`` provides the target
        pytree structure/shardings."""
        epoch = epoch if epoch is not None else self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        restored = self._mgr.restore(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(_savable(state)),
                metadata=ocp.args.JsonRestore(),
            ))
        meta = restored.get("metadata") or {}
        new_state = state.replace(**restored["state"])
        return new_state, meta, epoch

    def close(self):
        self._mgr.close()


def _savable(state: TrainState) -> Dict[str, Any]:
    """The array-bearing fields of TrainState (tx/apply_fn are static)."""
    out = {"step": state.step, "params": state.params,
           "opt_state": state.opt_state}
    if state.batch_stats is not None:
        out["batch_stats"] = state.batch_stats
    if state.ema_params is not None:
        out["ema_params"] = state.ema_params
    return out
