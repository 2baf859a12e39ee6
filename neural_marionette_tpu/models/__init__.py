"""Model components (L3/L3.5 layers)."""
from .blocks import (Basic3DBlock, Res3DBlock, Pool3DBlock, Upsample3DBlock,
                     Hourglass)
from .detector import (VoxToKyptNet, KyptToVoxNet, KyptDetector, FeatureNet,
                       VoxelDecoder)
from .dynamics import HSVRNNBVH, SkeletonArrays
from .marionette import NeuralMarionette

__all__ = [
    "Basic3DBlock", "Res3DBlock", "Pool3DBlock", "Upsample3DBlock",
    "Hourglass", "VoxToKyptNet", "KyptToVoxNet", "KyptDetector",
    "FeatureNet", "VoxelDecoder", "HSVRNNBVH", "SkeletonArrays",
    "NeuralMarionette",
]
