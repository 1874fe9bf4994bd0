"""AOT export of the compiled inference program for deployment.

The reference has no serving story at all — detection is a notebook call
(`Losses.py:11-98`) that needs the full training codebase, torch, and the
original image files on the serving host.  Here the whole inference program
(preprocessed images -> final boxes/classes/scores) is serialized as a
portable StableHLO artifact via `jax.export`: a serving process can load
and run it with zero framework code (no Flax, no model definition, no
priors — the weights and priors are baked in as constants) and it is
forward-compatible across JAX/XLA releases per StableHLO's versioning
guarantees.

Artifact layout (a directory):
  program.jaxexport   -- serialized jax.export.Exported (StableHLO bytes)
  meta.json           -- batch size, image size, top_k, class names
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_ssd_tpu.config import Config, VOC_CLASSES
from objectdetection_ssd_tpu.infer.postprocess import Detections, postprocess
from objectdetection_ssd_tpu.models.ssd import build_model
from objectdetection_ssd_tpu.ops import priors as priors_lib

_PROGRAM = "program.jaxexport"
_META = "meta.json"


def export_detector(config: Config, params: Any, out_dir: str,
                    batch_size: int = 8,
                    batch_stats: Any = None,
                    platforms: Optional[list] = None) -> str:
    """Serialize (model apply + postprocess) with weights baked in.

    ``platforms``: lowering platforms for the artifact (default: the current
    backend plus 'cpu', so an exported-on-TPU artifact still loads on a CPU
    box for smoke checks).
    """
    model = build_model(config.model)
    priors = jnp.asarray(priors_lib.priors_for_model(config.model,
                                                     config.priors))
    pp_cfg = config.postprocess
    size = config.model.image_size

    # Close over the weights: the artifact is self-contained.
    frozen = jax.tree_util.tree_map(jnp.asarray, params)
    frozen_stats = (jax.tree_util.tree_map(jnp.asarray, batch_stats)
                    if batch_stats is not None else None)

    def serve(images):
        variables = {"params": frozen}
        if frozen_stats is not None:
            variables["batch_stats"] = frozen_stats
        loc, conf = model.apply(variables, images, train=False)
        dets = postprocess(loc, conf, priors, pp_cfg)
        return dets.boxes_xyxy, dets.scores, dets.classes, dets.valid

    if platforms is None:
        cur = jax.default_backend()
        platforms = [cur] + (["cpu"] if cur != "cpu" else [])

    exported = jax.export.export(
        jax.jit(serve), platforms=platforms)(
        jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.float32))

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _PROGRAM), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump({
            "batch_size": batch_size,
            "image_size": size,
            "top_k": pp_cfg.top_k,
            "classes": list(VOC_CLASSES),
            "backbone": config.model.backbone,
            "platforms": platforms,
        }, f, indent=2)
    return out_dir


class ExportedDetector:
    """Load and run an exported artifact — no model code needed."""

    def __init__(self, artifact_dir: str):
        with open(os.path.join(artifact_dir, _PROGRAM), "rb") as f:
            self.exported = jax.export.deserialize(bytearray(f.read()))
        with open(os.path.join(artifact_dir, _META)) as f:
            self.meta = json.load(f)
        self._call = jax.jit(self.exported.call)

    def __call__(self, images: np.ndarray) -> Detections:
        """(B, S, S, 3) preprocessed f32 images -> Detections.

        The exported program is fixed-shape at the compiled batch size; a
        SMALLER batch is padded (repeating the last image) and the pad rows
        sliced off the result, so callers only split batches LARGER than
        the artifact's size.
        """
        b = self.meta["batch_size"]
        n = images.shape[0]
        if n > b:
            raise ValueError(
                f"exported program takes batch<={b}, got {n}; split "
                "upstream")
        if n == 0:
            raise ValueError("empty batch")
        if n < b:
            pad = np.repeat(images[-1:], b - n, axis=0)
            images = np.concatenate([np.asarray(images), pad], axis=0)
        boxes, scores, classes, valid = self._call(jnp.asarray(images))
        return Detections(boxes[:n], scores[:n], classes[:n], valid[:n])
