from .dataset import SequentialSpeechTrials, padded_batches
from .checkpoints import StoreBestModel, save_train_state, load_train_state
from .optim import torch_rmsprop
from .synth_queue import AsynchronousSynthesisQueue

__all__ = [
    "SequentialSpeechTrials",
    "padded_batches",
    "StoreBestModel",
    "save_train_state",
    "load_train_state",
    "torch_rmsprop",
    "AsynchronousSynthesisQueue",
]
