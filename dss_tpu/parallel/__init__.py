from .mesh import make_mesh
from .shard import (
    shard_lstm_params,
    shard_batch,
    sharded_decoder_train_step,
    sharded_vad_train_step,
    sharded_vocoder_train_step,
    sharded_fused_word_path,
    batched_vocoder_sharding,
)

__all__ = [
    "make_mesh",
    "shard_lstm_params",
    "shard_batch",
    "sharded_decoder_train_step",
    "sharded_vad_train_step",
    "sharded_vocoder_train_step",
    "sharded_fused_word_path",
    "batched_vocoder_sharding",
]
