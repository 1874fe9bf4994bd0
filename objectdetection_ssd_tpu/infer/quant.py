"""Post-training int8 quantization (PTQ) for inference/serving.

TPU-native rationale: the v5e MXU's int8 peak (394 TOPS) is 2x its bf16
peak, and SSD inference is conv-bound — quantizing the conv stack is the
single biggest serving-throughput lever left after bf16.  The reference has
no quantization story (`Model.py` runs f32 end-to-end); this is a TPU-added
capability (SURVEY.md §2.2).

Design (standard symmetric PTQ, zero model-code changes):
  * `models/layers.py:TorchConv` — every conv in both model families —
    records its input absmax into a ``quant_stats`` variable collection
    when calibration makes it mutable, and switches to the int8 kernel
    (`Int8Conv`) when the caller passes an ``act_scale`` for its path in a
    ``"quant"`` collection.  The param tree is untouched: a trained f32
    checkpoint drives the quantized model directly.
  * weights quantize per-output-channel at trace time (AOT export constant-
    folds the int8 weights into the artifact); activations use per-tensor
    scales calibrated here.
  * exclusion policy = omission: convs without an ``act_scale`` entry stay
    f32.  Default policy keeps the loc/conf heads f32 (the usual PTQ
    accuracy recipe: the regression outputs are scale-sensitive while the
    trunk/pyramid are ReLU-bounded).

Typical use::

    stats = calibrate(model, params, calib_batches)
    qtree = act_scales(stats)                       # heads excluded
    detector = Detector(cfg, params, quant=qtree)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import numpy as np

# Head convs stay f32 by default: path segments created by
# models/ssd.py:SSD300 (loc_head_i / conf_head_i) and SSDResNet34
# (loc_t* / conf_t*).
DEFAULT_EXCLUDE_PREFIXES = ("loc", "conf")


def calibrate(model, params: Any, batches: Iterable[Any],
              batch_stats: Any = None) -> Dict[str, Any]:
    """Run ``batches`` through the f32 model, returning per-conv input
    absmax as a nested dict mirroring the param tree's module paths.

    ``batches``: iterable of image batches (uint8 or normalized float, as
    the model expects).  Scales fold as a running max ACROSS batches, so
    more calibration data can only widen ranges (never clip harder).
    """
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    # Params travel as jit ARGUMENTS: closing over them would bake the
    # ~100 MB pytree into the program as literal constants (CLAUDE.md
    # "Hard-won rules"; bench.py learned this the slow way).
    @jax.jit
    def one(variables, images):
        _, st = model.apply(variables, images, train=False,
                            mutable=["quant_stats"])
        return st["quant_stats"]

    folded: Optional[Dict[str, Any]] = None
    for images in batches:
        stats = jax.device_get(one(variables, images))
        folded = stats if folded is None else jax.tree_util.tree_map(
            np.maximum, folded, stats)
    if folded is None:
        raise ValueError("calibrate() needs at least one batch")
    return folded


def act_scales(stats: Dict[str, Any],
               keep: Optional[Callable[[Tuple[str, ...]], bool]] = None,
               quantize_heads: bool = False) -> Dict[str, Any]:
    """Build the ``"quant"`` variable collection from calibration stats.

    Replaces each ``absmax`` leaf with ``act_scale = absmax / 127`` and
    drops entries ``keep(path)`` rejects.  Default policy excludes any
    module whose path contains a segment starting with ``loc``/``conf``
    (the detection heads); pass ``quantize_heads=True`` for full-model
    quantization studies.
    """
    if keep is None:
        if quantize_heads:
            keep = lambda path: True
        else:
            keep = lambda path: not any(
                seg.startswith(DEFAULT_EXCLUDE_PREFIXES) for seg in path)

    flat = jax.tree_util.tree_flatten_with_path(stats)[0]
    out: Dict[str, Any] = {}
    for path, absmax in flat:
        segs = tuple(
            p.key for p in path if isinstance(p, jax.tree_util.DictKey))
        assert segs[-1] == "absmax", segs
        mod_path = segs[:-1]
        if not keep(mod_path):
            continue
        node = out
        for seg in mod_path:
            node = node.setdefault(seg, {})
        node["act_scale"] = np.float32(np.asarray(absmax) / 127.0)
    return out


def count_quantized(qtree: Dict[str, Any]) -> int:
    """Number of convs the tree quantizes (act_scale leaves)."""
    return sum(1 for _ in jax.tree_util.tree_leaves(qtree))


def save_scales(qtree: Dict[str, Any], path: str) -> None:
    """Persist an act-scale tree as JSON (``a/b/act_scale`` -> float).

    `cli train --qat` writes this next to the checkpoint so eval/detect/
    export ``--int8`` serve with the SAME scales the fake-quant training
    baked the weights for (recalibrating on the fine-tuned weights would
    give slightly different scales than the ones trained against).
    """
    import json
    flat = {}
    for path_keys, leaf in jax.tree_util.tree_flatten_with_path(qtree)[0]:
        segs = tuple(p.key for p in path_keys
                     if isinstance(p, jax.tree_util.DictKey))
        flat["/".join(segs)] = float(np.asarray(leaf))
    with open(path, "w") as f:
        json.dump({"format": "act_scales/1", "scales": flat}, f, indent=2)


def load_scales(path: str) -> Dict[str, Any]:
    """Inverse of `save_scales`."""
    import json
    with open(path) as f:
        blob = json.load(f)
    if blob.get("format") != "act_scales/1":
        raise ValueError(f"{path}: not an act_scales/1 file")
    out: Dict[str, Any] = {}
    for key, val in blob["scales"].items():
        node = out
        segs = key.split("/")
        for seg in segs[:-1]:
            node = node.setdefault(seg, {})
        node[segs[-1]] = np.float32(val)
    return out


SCALES_FILENAME = "quant_scales.json"
