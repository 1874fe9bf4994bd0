"""Typed configuration for the whole framework.

The reference scatters every hyperparameter as a literal at its point of use
(batch size/workers `train.py:29,40`, lr/momentum/wd `train.py:53-55`,
StepLR(7, 0.1) `train.py:57`, epochs 1000 `train.py:59`, seed 10 `train.py:13`,
match threshold 0.5 `Util.py:333` / `Losses.py:171`, neg:pos ratio 3
`Losses.py:189`, score 0.2 / NMS IoU 0.45 / top-k 200 `Losses.py:11`, input
300x300 + ImageNet normalize `Dataset.py:10-13`). Here they are lifted into
dataclasses so every subsystem reads from one place and the CLI can override
them.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

# PASCAL VOC class vocabulary: 20 foreground classes, background sentinel at
# index 20 (reference `Util.py:26-27`, `Losses.py:171`).
VOC_CLASSES: Tuple[str, ...] = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)
NUM_CLASSES = len(VOC_CLASSES)          # 20 foreground
BACKGROUND_CLASS = NUM_CLASSES          # 20
NUM_CLASSES_WITH_BG = NUM_CLASSES + 1   # 21 logits

CLASS_TO_ID = {name: i for i, name in enumerate(VOC_CLASSES)}
ID_TO_CLASS = dict(enumerate(VOC_CLASSES + ("bg",)))

# ImageNet normalization used by the pretrained VGG backbone
# (reference `Dataset.py:12`).
IMAGENET_MEAN: Tuple[float, float, float] = (0.485, 0.456, 0.406)
IMAGENET_STD: Tuple[float, float, float] = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    """SSD300 prior (anchor) grid spec (reference `Util.py:105-137`)."""

    feature_map_sizes: Sequence[int] = (38, 19, 10, 5, 3, 1)
    scales: Sequence[float] = (0.1, 0.2, 0.375, 0.55, 0.725, 0.9)
    # Aspect ratios per map; ratio 1.0 additionally emits the extra
    # sqrt(s_k * s_{k+1}) box (reference `Util.py:129-134`).
    aspect_ratios: Sequence[Sequence[float]] = (
        (1.0, 2.0, 0.5),
        (1.0, 2.0, 3.0, 0.5, 0.333),
        (1.0, 2.0, 3.0, 0.5, 0.333),
        (1.0, 2.0, 3.0, 0.5, 0.333),
        (1.0, 2.0, 0.5),
        (1.0, 2.0, 0.5),
    )

    @property
    def boxes_per_cell(self) -> Tuple[int, ...]:
        return tuple(len(r) + 1 for r in self.aspect_ratios)

    @property
    def num_priors(self) -> int:
        return sum(
            g * g * k
            for g, k in zip(self.feature_map_sizes, self.boxes_per_cell)
        )


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """SSD model family selection and structural knobs."""

    backbone: str = "vgg16"            # "vgg16" | "resnet34"
    image_size: int = 300              # square input (reference 300x300)
    num_classes: int = NUM_CLASSES_WITH_BG
    # conv4_3 L2-norm rescale initial value (reference `Model.py:133`).
    l2_norm_scale_init: float = 20.0
    # ResNet-34 variant: freeze the pretrained trunk
    # (reference `Model.py:81-86` wraps it in torch.no_grad()).
    freeze_backbone: bool = True
    # VGG-16 variant: freeze the first N conv stages (1=conv1 .. 5=whole
    # trunk incl. fc6/fc7) — the standard fine-tuning recipe from pretrained
    # weights and the VGG analog of the ResNet freeze above.  XLA drops the
    # frozen stages' backward sweep entirely (large train-step saving).
    freeze_stages: int = 0
    dropout_rate: float = 0.4          # reference `Model.py:13`
    # Compute dtype for the conv stack. Params stay f32; bf16 activations
    # keep the MXU fed at full rate on TPU.
    compute_dtype: str = "float32"
    # VGG trunk convs whose filter gradient routes through the Pallas
    # tap-matrix kernel (ops/dw_pallas.py) during training.  MEASURED
    # NEGATIVE (round 4): the attribution ladder put conv1_2's dW at ~33%
    # MFU under XLA, but the hand kernel lost the full-graph A/B 177 ms
    # vs 293 ms/step — copy-bound, see RESULTS.md "Pallas dW kernel".
    # Kept as the documented experiment; default () = XLA native always.
    # Inference/int8 graphs ignore this (no dW there).
    dw_pallas_convs: Sequence[str] = ()


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Multibox loss knobs (reference `Losses.py:136-199`)."""

    match_iou_threshold: float = 0.5   # bg below this (`Losses.py:171`)
    neg_pos_ratio: int = 3             # hard negatives (`Losses.py:189`)
    # The reference calls its loc loss `smooth_l1` but instantiates plain
    # nn.L1Loss (`Losses.py:147`). Keep L1 for parity; huber is opt-in.
    loc_loss: str = "l1"               # "l1" | "huber"
    # Encode/decode variance conventions expressed as the reference writes
    # them: /10 for centers, *5 / /5 for sizes (`Util.py:86-102`).
    center_variance_inv: float = 10.0
    size_variance_inv: float = 5.0
    # Hard-negative mining only needs the SUM of each image's top
    # 3*N_pos negative CE values (`Losses.py:188-195`), not the full
    # descending sort of all 8732 — rank the top `hnm_topk` candidates with
    # lax.top_k instead, with a lax.cond fallback to the exact full sort
    # whenever any image needs more than `hnm_topk` negatives (so the math
    # is ALWAYS identical to the reference; the cap only picks the faster
    # of two exact formulations at runtime).  0 = always full sort.
    hnm_topk: int = 1024


@dataclasses.dataclass(frozen=True)
class PostprocessConfig:
    """Detection post-processing (reference `Losses.py:11`)."""

    score_threshold: float = 0.2
    nms_iou_threshold: float = 0.45
    top_k: int = 200                   # global cap across classes
    # Fixed-shape per-class candidate slots (the NMS works on the top-K
    # scores >= threshold per class).  With a trained model and threshold
    # 0.2, per-class candidate counts are typically < 20, so 64 never binds
    # in practice while keeping the K x K suppression cheap; raise for
    # ultra-dense scenes or exact-parity studies.  32 measured +1.8% e2e
    # at bs=256 (RESULTS.md r3 sweep) — worth it only when per-class
    # detection capacity of 32 is acceptable.
    per_class_top_k: int = 64
    # approx_max_k is the TPU-native top-k (per-lane binning); exact lax.top_k
    # behind the flag for bit-parity runs.
    use_approx_top_k: bool = True
    approx_recall_target: float = 0.95
    # Two-stage candidate selection: first keep the top-M anchors by
    # max-foreground score, then rank per class among those M only.  Cuts
    # the dominant (B, 20, P) top-k to (B, 20, M).  A candidate is lost only
    # if >M anchors outscore its anchor's best class — never in practice at
    # threshold 0.2 (128 slots vs typically < 20 survivors/class).  0
    # disables; exact mode (use_approx_top_k=False) always ranks over all P
    # anchors.  Measured at bs=256 (same-process A/Bs, RESULTS.md): 512 ->
    # 256 +2% e2e (r3), 256 -> 128 another +2.0% bf16 / +3.1% int8 (late
    # r3); approx-vs-exact mAP delta re-validated at the 5k-image rehearsal
    # scale with this default.  Raise for ultra-dense scenes.
    anchor_prefilter: int = 128
    # TPU compiler knob for the INFERENCE graph (PJRT compiler_options,
    # see xla_options.py): per-fusion scoped-VMEM budget in KiB.  24 MiB
    # measured +1.2% e2e img/s at bs=256 (2222 -> 2248, replicated across
    # two sessions); 64 MiB — the TRAIN optimum — costs inference 4.2%,
    # which is why this is a separate field from
    # TrainConfig.scoped_vmem_limit_kib (sweeps in RESULTS.md
    # "scoped-VMEM compiler option").  Applied by Detector,
    # ExportedDetector (via an additive meta.json hint), bench.py, and
    # latency.py.  None/0 = compiler default.  Ignored on CPU.
    scoped_vmem_limit_kib: Optional[int] = 24576
    # NMS flavor: "hard" = the reference's binary greedy suppression
    # (`Losses.py:44-56`); "soft_gaussian" / "soft_linear" = Soft-NMS
    # (Bodla et al. 2017) — overlapping candidates keep a DECAYED score
    # instead of being dropped, which recovers true positives in crowded
    # scenes.  Opt-in (the reference has no soft-NMS); exact fixed-shape
    # formulation in infer/postprocess.py:soft_nms_scores, oracle-tested
    # against a scalar reference implementation.
    nms_method: str = "hard"
    soft_nms_sigma: float = 0.5        # gaussian decay width (paper's sigma)
    # Unroll the greedy-suppression recurrence at trace time (no per-step XLA
    # while-loop overhead); the fori_loop variant is for very large K.
    # (A hand-written Pallas suppression kernel was built and benchmarked
    # across three formulations and retired: best 2232 vs 2248 img/s for
    # this unrolled-XLA path — benchmarks/RESULTS.md "Pallas NMS".)
    nms_unrolled: bool = True
    # Test-time augmentation: also run the horizontally-flipped image
    # through the model and merge the two views.  On mirror-symmetric
    # anchor grids (both real model families) the views are AVERAGED
    # per-anchor (flip-averaged TTA — variance reduction with no
    # duplicate-FP risk); on asymmetric/custom grids it falls back to the
    # classic candidate-union + one NMS pass.  See
    # infer/detector.py:forward_for_postprocess for the measured
    # rationale.  Opt-in — it costs a second forward per image, and the
    # reference has no TTA (its flip is train-time only, `Dataset.py`).
    tta_flip: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """VOC data pipeline (reference `DataLists.py`, `Dataset.py`, `train.py`)."""

    voc_root: str = "VOCdevkit"
    batch_size: int = 20               # reference `train.py:29`
    num_workers: int = 2               # reference `train.py:29`
    max_boxes: int = 64                # pad ragged GT to this many per image
    keep_difficult: bool = False       # reference `Dataset.py:29-31`
    val_fraction: float = 0.1          # reference `train.py:14`
    split_seed: int = 10               # reference `train.py:13`
    # Reference samples the val split WITH replacement (`train.py:14`),
    # yielding slightly <10% unique val ids. Fixed by default; set True for
    # byte-exact split parity.
    parity_split: bool = False
    # A missing VOC year's list file is a hard error unless this opts in
    # (deliberate single-year experiments); see data/voc.py:voc_file_lists.
    allow_partial_voc: bool = False
    augment: bool = True
    # Use the native C++ augmentation pipeline (native/src/voc_native.cpp)
    # when built: ~10x faster per image than the numpy path, same transform
    # semantics, different (still deterministic) random stream.
    use_native_augment: bool = True
    # Dtype of the image batches shipped to the device.  "uint8" (default)
    # sends RAW 0-255 pixels — 4x less host->device traffic and host memcpy
    # — and the model normalizes on device in f32 fused into the first conv
    # (models/ssd.py:prepare_input).  This also matches the reference more
    # closely: torchvision's ToTensor reads uint8 PIL images, so its inputs
    # are uint8-quantized too (`Dataset.py:10-13`).  "float32" ships
    # host-normalized images.
    transfer_dtype: str = "uint8"
    # Packed decoded-image cache path PREFIX (`--image-cache`): the train
    # loader decodes every JPEG once into `<prefix>.bin/.idx.npz` (mmap'd
    # thereafter; data/cache.py), eval appends `.{split}` / `.val` for its
    # own corpus.  Bit-exact vs per-epoch decode; kills first-touch JPEG
    # I/O (RESULTS.md "Eval throughput attribution").  None = decode per
    # use, like the reference (`Dataset.py:25`).
    image_cache: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """SGD setup (reference `train.py:53-57`)."""

    lr: float = 1e-4
    bias_lr_multiplier: float = 2.0    # 2x lr for biases (`train.py:54`)
    momentum: float = 0.9
    weight_decay: float = 5e-4
    # StepLR(step_size=7, gamma=0.1) is constructed but scheduler.step() is
    # never called in the reference (`train_function.py`), so lr is constant.
    # We implement the schedule properly; parity mode disables it.
    lr_decay_epochs: int = 7
    lr_decay_gamma: float = 0.1
    use_lr_schedule: bool = True
    # Linear lr warmup over the first N steps (0 = off).  Not a reference
    # feature — the reference fine-tunes a pretrained VGG and never needs
    # it — but from-scratch SSD training is unstable without it.
    warmup_steps: int = 0
    # Accumulate gradients over N micro-batches before each SGD update
    # (optax.MultiSteps): effective batch = N x batch_size without the HBM
    # cost of the larger activations (the bs=128 step already peaks at
    # ~10.4 GB of 16 GB — see benchmarks/RESULTS.md).  1 = off.
    grad_accum_steps: int = 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_epochs: int = 1000             # reference `train.py:59`
    checkpoint_dir: str = "checkpoints"
    checkpoint_every_epochs: int = 1   # reference saves per-epoch
    max_checkpoints_to_keep: int = 3
    log_every_steps: int = 20          # reference `train_function.py:99`
    # Write TensorBoard event files (loss/lr/img-s scalars) here; None = off.
    tensorboard_dir: Optional[str] = None
    seed: int = 10
    # Device mesh axes; plain data parallelism is the default.
    mesh_shape: Optional[Tuple[int, ...]] = None   # None = all devices on 'data'
    mesh_axis_names: Tuple[str, ...] = ("data",)
    # Pipeline parallelism (GPipe, `train --pp N`): split the model into N
    # stages on N devices and stream microbatches through them
    # (parallel/pipeline.py).  0/1 = off.  Mutually exclusive with the
    # mesh-axis strategies (fsdp/tp/sp) — PP is staged-jit, not GSPMD.
    # SSD300 cuts: 2 = trunk|head, 3 = conv1-3|conv4-fc7|head,
    # 4 = conv1-2|conv3-4|conv5-fc7|head (SSD300_STAGE_CUTS).
    pp_stages: int = 0
    # Microbatches streamed per step under --pp; gradients are MEANed over
    # them (`--grad-accum` semantics; 1 = bit-exact monolithic step).
    pp_microbatches: int = 1
    # Data-parallel ways WITHIN each pipeline stage (`train --pp N
    # --pp-dp D` — needs N x D devices): every stage becomes a D-device
    # mesh, its params replicate, microbatch rows shard over the stage
    # mesh's data axis, and the per-stage gradient all-reduce rides the
    # stage's ICI.  1 = plain GPipe.  This is how PP composes with data
    # parallelism (the remaining devices after the pipeline cut).
    pp_dp: int = 1
    donate_state: bool = True
    # Third pipeline stage for the input stream: run the pad + H2D
    # device_put of each batch on its own thread (data/pipeline.prefetch
    # around Trainer.to_device), so the copy of batch N+1 overlaps both
    # the host prep of batch N+2 and the device step of batch N.  The
    # reference overlaps only host prep (DataLoader workers,
    # `train.py:29`).  Identical numerics: the stream is deterministic
    # and ordered either way.
    device_prefetch: bool = False
    # Gradient-checkpoint the forward at VGG stage boundaries
    # (jax.checkpoint + save_only_these_names over the trunk's
    # VGG_STAGE_CKPT markers): ~1/3 extra forward FLOPs for a large
    # activation-HBM saving — turn on for bs>=256 (see
    # benchmarks/RESULTS.md round 3).
    remat: bool = False
    # Exponential-moving-average weights: e <- d*e + (1-d)*p per step,
    # maintained inside the jitted train step.  0.0 = off (the reference
    # has no EMA — parity default); typical values 0.999-0.9999.  Eval /
    # detect / export read the averaged weights with --use-ema (pass the
    # SAME --ema-decay so the checkpoint target structure matches).
    ema_decay: float = 0.0
    # TPU compiler knob (PJRT compiler_options, reaches the TPU compiler
    # even where XLA_FLAGS cannot — the CPU-only client XLA aborts on
    # --xla_tpu_* flags): per-fusion scoped-VMEM budget in KiB.  64 MiB
    # measured +1.5% train img/s at bs=128 and +2.9% at bs=256, flat
    # across 32-96 MiB; the SAME option hurts the inference graph -4.2%,
    # so it is applied to the TRAIN step only (RESULTS.md "scoped-VMEM
    # compiler option").  None/0 = compiler default.  Ignored on CPU.
    scoped_vmem_limit_kib: Optional[int] = 65536
    # Persistent XLA compilation cache directory (`--compilation-cache`,
    # all subcommands): compiled executables are serialized here and
    # reloaded by later processes, so a fresh `eval`/`detect`/`serve`
    # process skips its multi-minute first-batch compile wall (the
    # reference has no compiles to cache; this is a TPU-runtime concern).
    # None = off (JAX default).  Applied by `cli.main` (pre-dispatch) and
    # by `Trainer.__init__`/`Detector.__init__` from this field
    # (xla_options.apply_compilation_cache), so programmatic users need
    # only set it; min-compile-time/entry-size thresholds are zeroed so
    # every program caches.
    compilation_cache_dir: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Post-training int8 quantization for inference/serving.

    Opt-in, inference-only (the reference has no quantization story; this
    is a TPU-added capability — the v5e MXU's int8 peak is 2x bf16).  See
    `infer/quant.py` for the calibration + scale mechanics; training and
    checkpoints are always f32 — the SAME checkpoint drives both modes.
    """

    int8: bool = False
    # Images drawn from the eval/train records for activation-range
    # calibration (batched at data.batch_size; a few dozen images is the
    # standard PTQ recipe — ranges only widen with more data).
    calib_images: int = 64
    # Keep the loc/conf heads f32 (the usual PTQ accuracy recipe); flip for
    # full-model quantization studies.
    quantize_heads: bool = False
    # Chain the requantize between consecutive quantized convs: each
    # chained conv's epilogue emits int8 directly in the NEXT conv's
    # activation scale (one fused int32->int8 rescale; no bf16
    # materialization between them — half the inter-conv HBM bytes).
    # Bit-exact vs the unchained graph (infer/quant.py:chain_scales,
    # pinned in tests), so it is ON by default; --no-int8-chain exists
    # for A/B measurement.
    chain_requant: bool = True
    # Ignore a checkpoint dir's saved quant_scales.json and calibrate
    # fresh scales (the explicit escape from the fingerprint binding —
    # see infer/quant.py:verify_scales_binding).
    recalibrate: bool = False
    # Quantization-aware fine-tuning (`train --qat`): calibrate on the
    # current weights, then train through the differentiable fake-quant
    # path (straight-through estimator) so the checkpoint serves int8 with
    # the same scales at ~no accuracy cost.  Uses calib_images /
    # quantize_heads above for the calibration pass.
    qat: bool = False


@dataclasses.dataclass(frozen=True)
class DoctorConfig:
    """Backend health probe (`cli doctor`, utils/doctor.py).

    The reference has no health tooling (SURVEY.md §5 "failure detection:
    none"); this probes the accelerator backend from a fresh subprocess
    under a hard timeout and classifies the known relay degradation modes
    (hung-init / compile-stall / worker-crashed).
    """

    # Hard wall for the subprocess probe.  Healthy relay init + first tiny
    # compile is well under 60 s; both observed degradation modes exceed
    # any finite wait, so the default only bounds the bad-news latency.
    timeout_s: float = 120.0
    # Optional jax platform override for the probe child (e.g. "cpu").
    # None probes the default backend — the real chip in deployment.
    platform: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class Config:
    priors: PriorConfig = dataclasses.field(default_factory=PriorConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    postprocess: PostprocessConfig = dataclasses.field(
        default_factory=PostprocessConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    quant: QuantConfig = dataclasses.field(default_factory=QuantConfig)
    doctor: DoctorConfig = dataclasses.field(default_factory=DoctorConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
