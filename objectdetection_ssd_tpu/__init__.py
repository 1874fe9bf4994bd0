"""objectdetection_ssd_tpu — a TPU-native (JAX/XLA/Pallas) SSD object
detection framework with the capabilities of nitishsaDire/objectDetection_ssd,
re-designed TPU-first.

Quick start:
    from objectdetection_ssd_tpu import Config, build_model, ssd300_priors
    from objectdetection_ssd_tpu.infer.detector import Detector
"""

from objectdetection_ssd_tpu.config import (BACKGROUND_CLASS, CLASS_TO_ID,
                                            ID_TO_CLASS, NUM_CLASSES,
                                            NUM_CLASSES_WITH_BG, VOC_CLASSES,
                                            Config, DataConfig, LossConfig,
                                            ModelConfig, OptimConfig,
                                            PostprocessConfig, PriorConfig,
                                            QuantConfig, TrainConfig)
from objectdetection_ssd_tpu.infer.postprocess import (Detections,
                                                        postprocess,
                                                        scale_detections)
from objectdetection_ssd_tpu.losses.multibox import multibox_loss
from objectdetection_ssd_tpu.models.ssd import SSD300, SSDResNet34, build_model
from objectdetection_ssd_tpu.ops.boxes import (cxcywh_to_xyxy, decode, encode,
                                               pairwise_iou, xyxy_to_cxcywh)
from objectdetection_ssd_tpu.ops.priors import (priors_for_model,
                                                resnet34_priors,
                                                ssd300_priors,
                                                zoom_ratio_priors)

__version__ = "0.3.0"
