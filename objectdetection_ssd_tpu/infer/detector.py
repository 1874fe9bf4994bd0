"""User-facing detection API: image(s) -> final boxes, fully on device.

Replaces the reference's notebook-invoked `inference` flow
(`Losses.py:11-98` + the re-opened image file for sizing, `Losses.py:87`)
with a single jitted program: preprocess tensors in, (boxes, classes,
scores, valid) out — no per-class host loops, no `.cpu()` pulls mid-flight.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_ssd_tpu.config import (Config, ID_TO_CLASS,
                                            PostprocessConfig)
from objectdetection_ssd_tpu.data import pipeline as data_pipeline
from objectdetection_ssd_tpu.infer.postprocess import (Detections,
                                                       postprocess,
                                                       scale_detections)
from objectdetection_ssd_tpu.models.ssd import build_model
from objectdetection_ssd_tpu.ops import priors as priors_lib


def mirror_permutation(priors_np: np.ndarray):
    """``perm[i]`` = index of the prior at the horizontally-mirrored
    position ``(1-cx, cy, w, h)``, or None when the set has no exact
    mirror partner for every anchor.

    The real anchor grids are mirror-symmetric by construction (SSD300
    cell centers are ``(i+0.5)/f_k`` with cell-independent shapes,
    `ops/priors.py`; same for the resnet34 zoom/ratio grid), which is what
    makes flip-AVERAGED TTA possible.  Matching is done in exact integer
    arithmetic (1e-5 quantization) so float noise degrades to the union
    fallback instead of mispairing."""
    k = np.rint(np.asarray(priors_np, np.float64) * 1e5).astype(np.int64)
    index = {tuple(row): i for i, row in enumerate(k)}
    perm = np.empty(len(k), np.int32)
    for i, (cx, cy, w, h) in enumerate(k):
        j = index.get((100000 - cx, cy, w, h))
        if j is None:
            return None
        perm[i] = j
    return perm


def forward_for_postprocess(model, variables, images, priors, pp_config):
    """Model forward -> (loc, conf, priors) ready for `postprocess`.

    Shared by the live `Detector` and the AOT export path so opt-in
    inference features behave identically in both.  With
    ``pp_config.tta_flip`` it also runs the horizontally-mirrored image
    and mirrors its decoded boxes back (cx -> 1-cx), then merges the two
    views:

      * **flip-averaged** (when the anchor grid is mirror-symmetric —
        both real model families are): each anchor's mirrored-view
        prediction is realigned to its mirror-partner anchor and the two
        views' boxes/logits are AVERAGED.  Pure variance reduction — no
        candidate doubling, so no duplicate-FP risk (measured: union TTA
        cost a saturated toy detector ~0.09 mAP via cross-view duplicates
        whose IoU fell below the NMS threshold; averaging is neutral on
        saturated models and still recovers single-view misses at reduced
        confidence).
      * **union fallback** (asymmetric/custom grids): both views'
        candidates concatenate along the anchor axis and one NMS pass
        dedups them — the classic TTA formulation; best for recall, can
        add duplicate FPs.
    """
    loc, conf = model.apply(variables, images, train=False)
    if pp_config.tta_flip:
        from objectdetection_ssd_tpu.ops import boxes as box_ops
        loc_f, conf_f = model.apply(
            variables, images[:, :, ::-1, :], train=False)
        b = box_ops.decode(loc_f, priors)
        b = jnp.concatenate([1.0 - b[..., :1], b[..., 1:]], axis=-1)
        try:
            perm = mirror_permutation(np.asarray(priors))
        except Exception:          # traced priors: symmetry unknowable
            perm = None
        if perm is not None:
            b = b[:, perm]                       # realign to direct anchors
            conf_f = conf_f[:, perm]
            b_avg = (box_ops.decode(loc, priors) + b) * 0.5
            loc = box_ops.encode(b_avg, priors)
            conf = ((conf.astype(jnp.float32)
                     + conf_f.astype(jnp.float32)) * 0.5).astype(conf.dtype)
        else:
            loc_f = box_ops.encode(b, priors)
            loc = jnp.concatenate([loc, loc_f], axis=1)
            conf = jnp.concatenate([conf, conf_f], axis=1)
            priors = jnp.concatenate([priors, priors], axis=0)
    return loc, conf, priors


class Detector:
    """Bundles model apply + postprocess into one compiled inference path."""

    # Class-level default so hand-built instances (tests construct via
    # __new__ to inject tiny models) still satisfy the detect_batch /
    # evaluate contract without every fixture tracking new attributes.
    mesh = None

    @classmethod
    def from_checkpoint(cls, config: Config,
                        checkpoint_dir: Optional[str] = None,
                        allow_random_init: bool = False,
                        **kw) -> "Detector":
        """Build a Detector from the latest orbax checkpoint.

        Raises FileNotFoundError when no checkpoint exists (a typo'd
        directory must not silently serve random-weight garbage); pass
        ``allow_random_init=True`` to get a fresh-init detector instead
        (smoke tests, architecture checks)."""
        import jax
        from objectdetection_ssd_tpu.train.checkpoint import CheckpointManager
        from objectdetection_ssd_tpu.train.state import create_train_state
        model = build_model(config.model)
        size = config.model.image_size
        state = create_train_state(
            model, jax.random.PRNGKey(config.train.seed),
            jnp.zeros((1, size, size, 3)), config.optim)
        ckpt_dir = checkpoint_dir or config.train.checkpoint_dir
        try:
            mgr = CheckpointManager(ckpt_dir)
            state, _, _ = mgr.restore(state)
        except FileNotFoundError:
            if not allow_random_init:
                raise FileNotFoundError(
                    f"no checkpoint found under {ckpt_dir!r}; pass "
                    "allow_random_init=True for an untrained detector")
        return cls(config, state.params, state.batch_stats, **kw)

    def __init__(self, config: Config, params: Any,
                 batch_stats: Any = None,
                 postprocess_config: Optional[PostprocessConfig] = None,
                 mesh=None, quant: Any = None,
                 model=None, priors=None):
        """``mesh``: optional `jax.sharding.Mesh` with a ``data`` axis —
        batches are sharded over it and params replicated, scaling batched
        inference across chips the same way the train step does.  A mesh
        with a ``model`` axis (> 1) additionally runs TENSOR-PARALLEL
        inference: params live channel-sharded and each device computes
        its slice of every conv's output channels (same arrangement as
        `train --tp N`; see parallel/mesh.py:tp_sharding_for).  A
        ``spatial`` axis (> 1) runs SPATIALLY-PARTITIONED inference: the
        image H dim shards over the axis and GSPMD partitions each conv
        with halo exchange (parallel/mesh.py:image_sharding) — the
        latency lever for small-batch serving, where the data axis has
        too few rows to split.

        ``quant``: optional int8-PTQ activation-scale tree from
        `infer.quant.act_scales` — convs with an entry run int8 on the MXU
        (see `infer/quant.py`); the f32 params are quantized at trace
        time, so the same checkpoint drives both modes.

        ``model``/``priors``: override the registry model (tests,
        custom architectures) — mirrors the Trainer's injection points.

        Multi-host (``jax.process_count() > 1`` with a global ``mesh``):
        `detect_batch` takes this PROCESS'S rows of the global batch
        (`parallel.distributed.local_shard_bounds`) and assembles the
        global array from every process's contribution, exactly like the
        training loader path."""
        self.config = config
        from objectdetection_ssd_tpu.xla_options import (
            apply_compilation_cache)
        apply_compilation_cache(config.train.compilation_cache_dir)
        self.model = model if model is not None else build_model(config.model)
        self.params = params
        self.batch_stats = batch_stats
        self.pp_config = postprocess_config or config.postprocess
        self.priors = jnp.asarray(
            priors if priors is not None else
            priors_lib.priors_for_model(config.model, config.priors))
        self.mesh = mesh
        self.quant = quant

        def _infer(params, batch_stats, images):
            # uint8 batches are normalized inside the model itself
            # (models/ssd.py:prepare_input — every registry model starts
            # with it), so no boundary conversion is needed here.
            variables = {"params": params}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            if self.quant is not None:
                # Scales are small scalars: baking them into the program
                # as closure constants is fine (unlike the params).
                variables["quant"] = self.quant
            loc, conf, priors = forward_for_postprocess(
                self.model, variables, images, self.priors, self.pp_config)
            return postprocess(loc, conf, priors, self.pp_config)

        from objectdetection_ssd_tpu.xla_options import scoped_vmem_options
        copts = scoped_vmem_options(self.pp_config.scoped_vmem_limit_kib)
        if mesh is None:
            self._infer = jax.jit(_infer, compiler_options=copts)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
            repl = NamedSharding(mesh, P())
            data = mesh_lib.batch_sharding(mesh)
            p_shard = repl
            if "model" in mesh.axis_names and mesh.shape["model"] > 1:
                # Tensor-parallel inference: conv channels (params AND
                # compute) partition over the model axis, exactly like the
                # train step under --tp (parallel/mesh.py:tp_sharding_for).
                # Params are placed sharded up front so each device holds
                # only its channel slice.
                p_shard = jax.tree_util.tree_map(
                    lambda x: mesh_lib.tp_sharding_for(jnp.asarray(x), mesh),
                    params)
                self.params = jax.tree_util.tree_map(
                    lambda x, s: jax.device_put(jnp.asarray(x), s),
                    params, p_shard)
            img = (mesh_lib.image_sharding(mesh)
                   if mesh_lib.spatial_ways(mesh) > 1 else data)
            self._infer = jax.jit(
                _infer, in_shardings=(p_shard, repl, img),
                out_shardings=data, compiler_options=copts)

    def detect_batch(self, images: jnp.ndarray) -> Detections:
        """(B, S, S, 3) preprocessed images -> Detections (normalized boxes).

        Multi-host: ``images`` is this process's LOCAL rows; the global
        batch assembles from every process's contribution
        (`parallel.mesh.shard_batch` mechanics) and the returned Detections
        leaves are global arrays sharded over the mesh's batch axes —
        gather with `local_detection_rows` + `process_allgather`
        (eval/evaluate.py does this)."""
        if self.mesh is not None and jax.process_count() > 1:
            from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
            images = mesh_lib.shard_batch(
                {"images": np.asarray(images)}, self.mesh)["images"]
        return self._infer(self.params, self.batch_stats, images)

    def detect_images(self, paths: Sequence[str],
                      batch_size: int = 8) -> List[Dict[str, np.ndarray]]:
        """Decode, preprocess, run, and rescale to original pixel coords
        (the reference rescales with the on-disk image size,
        `Losses.py:87-89`).

        Runs in fixed-size chunks of exactly ``batch_size`` (short batches
        and the tail padded by repetition) so the jitted program compiles
        ONCE regardless of how many images are passed — every distinct
        batch shape is a separate XLA compilation, so a serving loop that
        alternates 3- and 5-image calls must still hit one shape."""
        size = self.config.model.image_size
        bs = batch_size
        u8 = self.config.data.transfer_dtype == "uint8"
        out: List[Dict[str, np.ndarray]] = []
        for start in range(0, len(paths), bs):
            chunk = paths[start:start + bs]
            imgs, sizes = [], []
            for p in chunk:
                raw = data_pipeline.load_image(p)
                sizes.append((raw.shape[1], raw.shape[0]))  # (w, h)
                img = data_pipeline.preprocess_image(raw, size,
                                                     normalize=not u8)
                imgs.append(data_pipeline.quantize_uint8(img) if u8 else img)
            n_real = len(imgs)
            while len(imgs) < bs:                 # pad tail, slice below
                imgs.append(imgs[-1])
                sizes.append(sizes[-1])
            dets = self.detect_batch(jnp.asarray(np.stack(imgs)))
            dets = scale_detections(dets, jnp.asarray(sizes, jnp.float32))
            # One host pull per batch (per-row indexing would issue four
            # device transfers per image — see eval/evaluate.py).
            dets = jax.device_get(dets)
            for i in range(n_real):
                valid = dets.valid[i]
                classes = dets.classes[i][valid]
                out.append({
                    "boxes_xyxy": dets.boxes_xyxy[i][valid],
                    "classes": classes,
                    "labels": np.asarray(
                        [ID_TO_CLASS[int(c)] for c in classes]),
                    "scores": dets.scores[i][valid],
                })
        return out
