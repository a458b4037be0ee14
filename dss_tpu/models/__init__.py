from .lstm import (
    lstm_init,
    lstm_apply,
    linear_init,
    linear_apply,
    zeros_state,
    LstmState,
)
from .vad import UnidirectionalVoiceActivityDetector
from .decoder import BidirectionalSpeechSynthesisModel
from .torch_port import (
    from_torch_state_dict,
    to_torch_state_dict,
    load_checkpoint,
)

__all__ = [
    "lstm_init",
    "lstm_apply",
    "linear_init",
    "linear_apply",
    "zeros_state",
    "LstmState",
    "UnidirectionalVoiceActivityDetector",
    "BidirectionalSpeechSynthesisModel",
    "from_torch_state_dict",
    "to_torch_state_dict",
    "load_checkpoint",
]
