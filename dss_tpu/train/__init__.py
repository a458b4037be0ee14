from .dataset import SequentialSpeechTrials, padded_batches
from .checkpoints import StoreBestModel
from .optim import torch_rmsprop
from .synth_queue import AsynchronousSynthesisQueue

__all__ = [
    "SequentialSpeechTrials",
    "padded_batches",
    "StoreBestModel",
    "torch_rmsprop",
    "AsynchronousSynthesisQueue",
]
