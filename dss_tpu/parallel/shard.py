"""Sharding rules and sharded training/inference steps.

Layout strategy:
* batch/stream axis -> mesh "data" (data parallelism over trials/streams);
* LSTM gate matrices [4H, in]/[4H, H] and gate biases [4H] -> mesh "model"
  on the 4H axis (Megatron-style tensor parallelism: each shard computes its
  gate block; the recurrent hidden state is all-gathered per step by GSPMD);
* heads and everything else replicated (they are tiny).

Steps are ordinary jitted functions: GSPMD propagates the input shardings
and inserts the collectives.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _lstm_param_spec(path_leaf_shape, hidden4: int) -> P:
    shape = path_leaf_shape
    if len(shape) >= 1 and shape[0] == hidden4:
        return P("model") if len(shape) == 1 else P("model", None)
    return P()


def shard_lstm_params(mesh: Mesh, params: Any, hidden_size: int) -> Any:
    """Place a model params pytree on the mesh with gate-block sharding."""
    hidden4 = 4 * hidden_size

    def place(leaf):
        leaf = np.asarray(leaf)
        spec = _lstm_param_spec(leaf.shape, hidden4)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def shard_batch(mesh: Mesh, *arrays):
    """Place batch-leading arrays on the mesh's data axis."""
    out = []
    for a in arrays:
        spec = P("data", *([None] * (np.asarray(a).ndim - 1)))
        out.append(jax.device_put(np.asarray(a), NamedSharding(mesh, spec)))
    return out if len(out) > 1 else out[0]


def sharded_decoder_train_step(mesh: Mesh, x, y, mask, hidden: int = 100):
    """One dp x tp decoder training step on the mesh (used by the driver's
    multi-chip dry run and by scale-up training)."""
    from ..models import BidirectionalSpeechSynthesisModel
    from ..train.trainer_decoder import DecoderTrainer

    model = BidirectionalSpeechSynthesisModel(
        nb_layer=2, nb_hidden_units=hidden, nb_electrodes=x.shape[-1]
    )
    trainer = DecoderTrainer(model)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    with mesh:
        params = shard_lstm_params(mesh, params, hidden)
        opt_state = jax.tree.map(
            lambda l: l, trainer.optimizer.init(params)
        )
        xb, yb, mb = shard_batch(mesh, x, y, mask)
        dropout_rng = jax.random.PRNGKey(1)
        new_params, _opt, loss = trainer.train_step(
            params, opt_state, xb, yb, mb, dropout_rng
        )
        jax.block_until_ready(new_params)
    return loss


def sharded_vad_train_step(mesh: Mesh, x, y, mask, hidden: int = 150):
    """One dp x tp nVAD TBPTT trial on the mesh."""
    from ..models import UnidirectionalVoiceActivityDetector
    from ..train.trainer_vad import VadTrainer

    model = UnidirectionalVoiceActivityDetector(
        nb_layer=2, nb_hidden_units=hidden, nb_electrodes=x.shape[-1]
    )
    trainer = VadTrainer(model)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    with mesh:
        params = shard_lstm_params(mesh, params, hidden)
        opt_state = trainer.optimizer.init(params)
        xb, yb, mb = shard_batch(mesh, x, y, mask)
        new_params, _opt, loss = trainer.tbptt_trial(
            params, opt_state, xb, yb, mb, jax.random.PRNGKey(1)
        )
        jax.block_until_ready(new_params)
    return loss


def batched_vocoder_sharding(mesh: Mesh, state, features):
    """Place vocoder stream state + features on the data axis for N-way
    parallel synthesis across chips."""
    def place(leaf):
        leaf = np.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] == features.shape[0]:
            spec = P("data", *([None] * (leaf.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    state = jax.tree.map(place, state)
    features = shard_batch(mesh, features)
    return state, features


def sharded_fused_word_path(mesh: Mesh, segments, masks, decoder,
                            dec_params, voc_model, voc_params, voc_state):
    """One SPMD execution of the EXACT online word program — bidirectional
    decode + repeat-pad masking + autoregressive vocoder synthesis fused in
    a single jitted call (runtime/units.py FusedDecoderVocoder.segment_
    program) — with the word batch and vocoder stream state sharded over
    the mesh "data" axis.

    This is the serving word path the closed loop runs, scaled across
    chips: N completed segments (one per stream) decode and vocode in one
    program.  Returns (lpc [N, T, 20], pcm [N, T*160]).
    """
    import jax.numpy as jnp

    from ..vocoder.net import net_synthesize_frames

    def program(dec_params, voc_params, voc_state, x, mask):
        pred, _ = decoder.apply(dec_params, x, None, mask=mask)
        # Same pad-tail handling as the online unit: hold the last valid
        # frame over the padded positions (mask is 1s then 0s).
        nxt = jnp.concatenate([mask[:, 1:], jnp.zeros_like(mask[:, :1])],
                              axis=1)
        last_ind = mask * (1.0 - nxt)
        last_frame = jnp.einsum("bt,btf->bf", last_ind, pred)
        feats = pred * mask[..., None] \
            + last_frame[:, None, :] * (1.0 - mask[..., None])
        pcm, voc_state = net_synthesize_frames(
            voc_model, voc_params, voc_state, feats)
        return pred, pcm, voc_state

    def replicate(leaf):
        return jax.device_put(np.asarray(leaf), NamedSharding(mesh, P()))

    with mesh:
        dec_params = jax.tree.map(replicate, dec_params)
        voc_params = jax.tree.map(replicate, voc_params)
        voc_state, xb = batched_vocoder_sharding(mesh, voc_state, segments)
        mb = shard_batch(mesh, masks)
        lpc, pcm, _ = jax.jit(program)(dec_params, voc_params, voc_state,
                                       xb, mb)
        lpc, pcm = np.asarray(lpc), np.asarray(pcm)
    return lpc, pcm


def sharded_vocoder_train_step(mesh: Mesh, trainer, params, opt_state,
                               features, signal, rng):
    """One data-parallel vocoder training step on the mesh.

    Parameters and optimizer state are replicated; the utterance-chunk
    batch is sharded over the mesh "data" axis.  The jitted train_step is
    unchanged — GSPMD turns the batch-mean gradient into a psum across
    shards, so this IS the multi-chip trainer (the driver dry-runs it on a
    virtual mesh; on real hardware the same code scales batch throughput
    by the device count).

    Returns (params, opt_state, loss) with the same replicated layout, so
    steps chain.
    """
    def replicate(leaf):
        return jax.device_put(np.asarray(leaf), NamedSharding(mesh, P()))

    with mesh:
        params = jax.tree.map(replicate, params)
        opt_state = jax.tree.map(replicate, opt_state)
        fb, sb = shard_batch(mesh, features, signal)
        params, opt_state, loss = trainer.train_step(
            params, opt_state, fb, sb, rng)
        jax.block_until_ready(loss)
    return params, opt_state, loss
