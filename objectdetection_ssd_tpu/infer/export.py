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
# Artifact format version. Bump on any layout/semantics change; loaders
# refuse artifacts from a DIFFERENT major so a stale serving host fails
# loudly instead of mis-parsing (the StableHLO program itself is already
# versioned/forward-compatible by jax.export).
# 1.1: additive ``input_dtype`` field ("uint8" programs take raw 0-255
# pixels and normalize on device; absent/"float32" = host-normalized).
# 1.2: additive ``scoped_vmem_limit_kib`` hint — the measured-best TPU
# scoped-VMEM budget for this inference graph; loaders pass it as a PJRT
# compiler option on TPU backends (absent/0 = compiler default).
# 1.3: additive ``quantized_convs`` / ``tta_flip`` descriptors — int8-PTQ
# and TTA programs are self-contained (quantized weights and the mirrored
# second forward are baked into the StableHLO), the fields just document
# what the artifact is.
FORMAT_VERSION = "1.3"


def export_detector(config: Config, params: Any, out_dir: str,
                    batch_size: int = 8,
                    batch_stats: Any = None,
                    platforms: Optional[list] = None,
                    input_dtype: Optional[str] = None,
                    quant: Any = None) -> str:
    """Serialize (model apply + postprocess) with weights baked in.

    ``platforms``: lowering platforms for the artifact (default: the current
    backend plus 'cpu', so an exported-on-TPU artifact still loads on a CPU
    box for smoke checks).

    ``input_dtype``: "uint8" (default, from DataConfig.transfer_dtype) bakes
    the ImageNet normalization INTO the program — the serving host posts
    raw 0-255 resized pixels, 4x less host->device transfer per request;
    "float32" keeps the legacy host-normalized contract.  Recorded in
    meta.json as ``input_dtype``.

    ``quant``: optional int8-PTQ act-scale tree (`infer.quant.act_scales`)
    — the int8 weights constant-fold into the artifact, so the serving
    host needs nothing extra.
    """
    model = build_model(config.model)
    priors = jnp.asarray(priors_lib.priors_for_model(config.model,
                                                     config.priors))
    pp_cfg = config.postprocess
    size = config.model.image_size
    if input_dtype is None:
        input_dtype = config.data.transfer_dtype
    in_dtype = jnp.uint8 if input_dtype == "uint8" else jnp.float32

    # Close over the weights: the artifact is self-contained.
    frozen = jax.tree_util.tree_map(jnp.asarray, params)
    frozen_stats = (jax.tree_util.tree_map(jnp.asarray, batch_stats)
                    if batch_stats is not None else None)
    frozen_quant = (jax.tree_util.tree_map(jnp.asarray, quant)
                    if quant is not None else None)

    def serve(images):
        variables = {"params": frozen}
        if frozen_stats is not None:
            variables["batch_stats"] = frozen_stats
        if frozen_quant is not None:
            variables["quant"] = frozen_quant
        from objectdetection_ssd_tpu.infer.detector import (
            forward_for_postprocess)
        loc, conf, pri = forward_for_postprocess(model, variables, images,
                                                 priors, pp_cfg)
        dets = postprocess(loc, conf, pri, pp_cfg)
        return dets.boxes_xyxy, dets.scores, dets.classes, dets.valid

    if platforms is None:
        cur = jax.default_backend()
        platforms = [cur] + (["cpu"] if cur != "cpu" else [])

    exported = jax.export.export(
        jax.jit(serve), platforms=platforms)(
        jax.ShapeDtypeStruct((batch_size, size, size, 3), in_dtype))

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _PROGRAM), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump({
            "format_version": FORMAT_VERSION,
            "input_dtype": input_dtype,
            "batch_size": batch_size,
            "image_size": size,
            "top_k": pp_cfg.top_k,
            "classes": list(VOC_CLASSES),
            "backbone": config.model.backbone,
            "platforms": platforms,
            "scoped_vmem_limit_kib": pp_cfg.scoped_vmem_limit_kib or 0,
            "quantized_convs": (0 if quant is None else
                                len(jax.tree_util.tree_leaves(quant))),
            "tta_flip": bool(pp_cfg.tta_flip),
        }, f, indent=2)
    return out_dir


class ExportedDetector:
    """Load and run an exported artifact — no model code needed."""

    def __init__(self, artifact_dir: str):
        with open(os.path.join(artifact_dir, _PROGRAM), "rb") as f:
            self.exported = jax.export.deserialize(bytearray(f.read()))
        with open(os.path.join(artifact_dir, _META)) as f:
            self.meta = json.load(f)
        check_format_version(self.meta)
        from objectdetection_ssd_tpu.xla_options import scoped_vmem_options
        self._call = jax.jit(
            self.exported.call,
            compiler_options=scoped_vmem_options(
                self.meta.get("scoped_vmem_limit_kib")))

    def __call__(self, images: np.ndarray) -> Detections:
        """(B, S, S, 3) images -> Detections.

        The expected image dtype is ``meta["input_dtype"]``: "uint8"
        artifacts (the default) take RAW 0-255 resized pixels and
        normalize inside the program; "float32" artifacts take
        host-ImageNet-normalized images.  A mismatched dtype fails loudly
        at call time.

        The exported program is fixed-shape at the compiled batch size;
        any caller batch size works: SMALLER batches are padded (repeating
        the last image) and LARGER ones run in compiled-size chunks, with
        the results re-stacked — one XLA program serves every call.
        """
        b = self.meta["batch_size"]
        images = np.asarray(images)
        n = images.shape[0]
        if n == 0:
            raise ValueError("empty batch")
        outs = []
        for start in range(0, n, b):
            chunk = images[start:start + b]
            if chunk.shape[0] < b:
                pad = np.repeat(chunk[-1:], b - chunk.shape[0], axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            outs.append(self._call(jnp.asarray(chunk)))
        if len(outs) == 1:
            boxes, scores, classes, valid = outs[0]
        else:
            boxes, scores, classes, valid = (
                jnp.concatenate([o[i] for o in outs], axis=0)
                for i in range(4))
        return Detections(boxes[:n], scores[:n], classes[:n], valid[:n])


def check_format_version(meta: dict) -> None:
    """Refuse artifacts whose major format version differs from ours.

    Pre-versioning artifacts (no ``format_version`` key) are treated as
    major 1 — the layout is identical.
    """
    found = str(meta.get("format_version", "1.0"))
    if found.split(".")[0] != FORMAT_VERSION.split(".")[0]:
        raise ValueError(
            f"artifact format_version {found} is incompatible with this "
            f"loader (supports major {FORMAT_VERSION.split('.')[0]}); "
            "re-export the artifact or upgrade the serving host")
