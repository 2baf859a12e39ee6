"""Neural Marionette TPU — a TPU-native JAX/XLA/Pallas framework for
unsupervised motion-skeleton and latent-dynamics learning from volumetric
video (the capability set of jinseokbae/neural_marionette, re-designed for
TPU hardware).
"""
from .config import MarionetteConfig, adjust_config, derive_training_id, \
    load_reference_pickle
from .skeleton import Skeleton, extract_skeleton

__version__ = "0.1.0"

__all__ = [
    "MarionetteConfig", "adjust_config", "derive_training_id",
    "load_reference_pickle", "Skeleton", "extract_skeleton",
]
