"""Neural autoregressive vocoder (LPCNet-architecture-equivalent) in JAX.

Architecture (capability match to the LPCNet C library the reference wraps;
sizes are MXU-aligned re-choices, weights are trained with
dss_tpu.train.trainer_vocoder — the reference ships no weights):

* frame-rate network: two causal 3-tap convs + two dense layers (all tanh)
  mapping the 20-dim features to a 128-dim conditioning vector per frame;
* sample-rate network, per 16 kHz sample: mu-law embeddings (256 x 128) of
  (last signal, last excitation, current LPC prediction), GRU-A (384 units,
  optionally block-sparse recurrent mask), GRU-B (32 units), dual-FC softmax
  over 256 mu-law excitation levels; sampled excitation + LPC prediction
  gives the next sample.  LPC coefficients come from the shared cepstral
  envelope definition (vocoder/lpc.py), exactly like LPCNet derives its
  prediction filter from the transmitted cepstrum.

TPU design: the whole batch of streams advances through the sample loop in
one ``lax.scan`` whose body is a handful of [B, .] x [., .] matmuls —
batching is what feeds the MXU.  Sampling uses precomputed Gumbel noise so
the compiled loop is deterministic given its inputs (and so the Pallas
sampler kernel can be cross-checked bit-for-bit).  Temperature sharpening is
pitch-correlation-dependent, as in LPCNet.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .lpc import FRAME_SIZE, LPC_ORDER, NB_BANDS, NB_FEATURES, PREEMPH, \
    bands_from_cepstrum, lpc_from_bands
from .mulaw import MULAW_LEVELS, mulaw_decode, mulaw_encode

EMBED_DIM = 128
COND_DIM = 128
GRU_A_UNITS = 384
GRU_B_UNITS = 32
CONV_WIDTH = 3
FEAT_CONTEXT = 2 * (CONV_WIDTH - 1)  # left context of the two causal convs


class LPCNetModel:
    """Hyperparameters + functional init/apply for the neural vocoder.

    ``bunch``: number of samples emitted per sample-rate-network step
    (Bunched-LPCNet-style).  At bunch=S the GRU-A/GRU-B recurrence runs at
    16 kHz / S; each step conditions on the last S samples + S excitations
    (per-lag embedding tables) and emits S excitations through per-
    sub-sample dual-FC heads, where sub-sample j >= 1 additionally
    conditions on the previous intra-bunch excitation and its own LPC
    prediction via [256, 256] correction embeddings.  S must divide the
    160-sample frame.  bunch=1 is the classic LPCNet step."""

    def __init__(self, gru_a_units: int = GRU_A_UNITS,
                 gru_b_units: int = GRU_B_UNITS, cond_dim: int = COND_DIM,
                 embed_dim: int = EMBED_DIM, bunch: int = 1):
        assert FRAME_SIZE % bunch == 0, "bunch must divide the frame"
        assert 1 <= bunch <= LPC_ORDER
        self.gru_a_units = gru_a_units
        self.gru_b_units = gru_b_units
        self.cond_dim = cond_dim
        self.embed_dim = embed_dim
        self.bunch = bunch

    @classmethod
    def from_params(cls, params) -> "LPCNetModel":
        """Reconstruct the model config from a checkpoint's parameter
        shapes (bunch inferred from the per-lag embedding tables)."""
        bunch = 1
        while f"emb_sig_l{bunch}" in params:
            bunch += 1
        return cls(
            gru_a_units=params["gru_a_wh"].shape[0],
            gru_b_units=params["gru_b_wh"].shape[0],
            cond_dim=params["fc1_w"].shape[0],
            embed_dim=params["emb_sig"].shape[1],
            bunch=bunch,
        )

    # -- parameters ----------------------------------------------------
    def init(self, key: jax.Array):
        S = self.bunch
        ks = jax.random.split(key, 16 + 6 * S)
        g = jax.nn.initializers.glorot_uniform()
        ed, cd, ga, gb = self.embed_dim, self.cond_dim, self.gru_a_units, self.gru_b_units
        gru_a_in = (2 * S + 1) * ed + cd
        gru_b_in = ga + cd
        extra = {}
        for j in range(1, S):
            k = ks[16 + 6 * j:16 + 6 * (j + 1)]
            extra[f"emb_sig_l{j}"] = g(k[0], (MULAW_LEVELS, ed))
            extra[f"emb_exc_l{j}"] = g(k[1], (MULAW_LEVELS, ed))
            extra[f"fc_out1_w_b{j}"] = g(k[2], (gb, MULAW_LEVELS))
            extra[f"fc_out2_w_b{j}"] = g(k[3], (gb, MULAW_LEVELS))
            extra[f"fc_out1_g_b{j}"] = jnp.ones(MULAW_LEVELS)
            extra[f"fc_out2_g_b{j}"] = jnp.ones(MULAW_LEVELS)
            extra[f"fc_out_b_b{j}"] = jnp.zeros(MULAW_LEVELS)
            extra[f"bunch_exc_emb_b{j}"] = g(k[4], (MULAW_LEVELS,
                                                    MULAW_LEVELS))
            extra[f"bunch_pred_emb_b{j}"] = g(k[5], (MULAW_LEVELS,
                                                     MULAW_LEVELS))
        return extra | {
            "emb_sig": g(ks[0], (MULAW_LEVELS, ed)),
            "emb_pred": g(ks[1], (MULAW_LEVELS, ed)),
            "emb_exc": g(ks[2], (MULAW_LEVELS, ed)),
            "conv1_w": g(ks[3], (CONV_WIDTH * NB_FEATURES, cd)),
            "conv1_b": jnp.zeros(cd),
            "conv2_w": g(ks[4], (CONV_WIDTH * cd, cd)),
            "conv2_b": jnp.zeros(cd),
            "fc1_w": g(ks[5], (cd, cd)),
            "fc1_b": jnp.zeros(cd),
            "fc2_w": g(ks[6], (cd, cd)),
            "fc2_b": jnp.zeros(cd),
            "gru_a_wx": g(ks[7], (gru_a_in, 3 * ga)),
            "gru_a_wh": g(ks[8], (ga, 3 * ga)),
            "gru_a_bx": jnp.zeros(3 * ga),
            "gru_a_bh": jnp.zeros(3 * ga),
            "gru_b_wx": g(ks[9], (gru_b_in, 3 * gb)),
            "gru_b_wh": g(ks[10], (gb, 3 * gb)),
            "gru_b_bx": jnp.zeros(3 * gb),
            "gru_b_bh": jnp.zeros(3 * gb),
            "fc_out1_w": g(ks[11], (gb, MULAW_LEVELS)),
            "fc_out2_w": g(ks[12], (gb, MULAW_LEVELS)),
            "fc_out1_g": jnp.ones(MULAW_LEVELS),
            "fc_out2_g": jnp.ones(MULAW_LEVELS),
            "fc_out_b": jnp.zeros(MULAW_LEVELS),
            # Block-sparse mask over GRU-A recurrent weights (all-ones =
            # dense; trainer may prune to LPCNet-style 16x1 block sparsity).
            "gru_a_mask": jnp.ones((ga, 3 * ga)),
        }

    # -- frame-rate network --------------------------------------------
    def condition(self, params, features: jnp.ndarray) -> jnp.ndarray:
        """features [B, T, 20] (with FEAT_CONTEXT left-padding expected by
        the caller for streaming) -> cond [B, T, cond_dim]."""
        x = features
        B, T, F = x.shape

        # Imported xiph-LPCNet checkpoints (vocoder/interop.py) carry an
        # ``emb_pitch`` table: the frame net there sees
        # concat(features, embed_pitch(period)) with SAME-padded convs
        # (upstream lpcnet.py uses padding='same'); our native models use
        # the 20 features directly with causal convs.  Both run through the
        # same code, switched on the presence of the table.
        same_pad = "emb_pitch" in params
        if same_pad:
            period_idx = jnp.clip(
                jnp.round(50.0 * x[..., 18] + 100.0), 0, MULAW_LEVELS - 1
            ).astype(jnp.int32)
            x = jnp.concatenate([x, params["emb_pitch"][period_idx]], axis=-1)

        def conv3(x, w, b, width):
            if same_pad:
                left = (width - 1) // 2
                pads_l = [x[:, :1] * 0.0] * left
                pads_r = [x[:, :1] * 0.0] * (width - 1 - left)
                xp = jnp.concatenate(pads_l + [x] + pads_r, axis=1)
            else:
                xp = jnp.concatenate([x[:, :1] * 0.0] * (width - 1) + [x],
                                     axis=1)
            cols = [xp[:, i:i + T] for i in range(width)]
            stacked = jnp.concatenate(cols, axis=-1)  # [B, T, width*F]
            return jnp.tanh(stacked @ w + b)

        h = conv3(x, params["conv1_w"], params["conv1_b"], CONV_WIDTH)
        h = conv3(h, params["conv2_w"], params["conv2_b"], CONV_WIDTH)
        h = jnp.tanh(h @ params["fc1_w"] + params["fc1_b"])
        h = jnp.tanh(h @ params["fc2_w"] + params["fc2_b"])
        return h

    # -- sample-rate network (one step, batched) ------------------------
    def _gru(self, x, h, wx, wh, bx, bh, mask=None):
        gx = x @ wx + bx
        wh_eff = wh if mask is None else wh * mask
        gh = h @ wh_eff + bh
        H = h.shape[-1]
        rx, zx, nx = gx[..., :H], gx[..., H:2 * H], gx[..., 2 * H:]
        rh, zh, nh = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
        r = jax.nn.sigmoid(rx + rh)
        z = jax.nn.sigmoid(zx + zh)
        n = jnp.tanh(nx + r * nh)
        return (1.0 - z) * n + z * h

    def sample_logits(self, params, h_b: jnp.ndarray) -> jnp.ndarray:
        # Optional per-channel biases INSIDE the tanh: xiph's MDense head
        # (imported checkpoints, vocoder/interop.py).  Native checkpoints
        # use the shared outside bias only.
        b1 = params.get("fc_out1_b", 0.0)
        b2 = params.get("fc_out2_b", 0.0)
        t1 = jnp.tanh(h_b @ params["fc_out1_w"] + b1) * params["fc_out1_g"]
        t2 = jnp.tanh(h_b @ params["fc_out2_w"] + b2) * params["fc_out2_g"]
        return t1 + t2 + params["fc_out_b"]

    def sample_step(self, params, carry, cond, lpc, gumbel, temperature):
        """One autoregressive step for a batch of streams.

        carry: (h_a [B,ga], h_b [B,gb], sig_mem [B,16], exc_idx [B,])
        cond [B, cond_dim]; lpc [B, 16]; gumbel [B, 256]; temperature [B, 1].
        Returns (carry, (sample [B], exc_idx [B], logits [B,256])).
        """
        h_a, h_b, sig_mem, exc_idx = carry
        pred = -jnp.sum(sig_mem * lpc, axis=-1)  # [B]

        sig_idx = mulaw_encode(sig_mem[:, 0])
        pred_idx = mulaw_encode(pred)

        x_a = jnp.concatenate([
            params["emb_sig"][sig_idx],
            params["emb_pred"][pred_idx],
            params["emb_exc"][exc_idx],
            cond,
        ], axis=-1)
        h_a = self._gru(x_a, h_a, params["gru_a_wx"], params["gru_a_wh"],
                        params["gru_a_bx"], params["gru_a_bh"],
                        params["gru_a_mask"])
        x_b = jnp.concatenate([h_a, cond], axis=-1)
        h_b = self._gru(x_b, h_b, params["gru_b_wx"], params["gru_b_wh"],
                        params["gru_b_bx"], params["gru_b_bh"])
        logits = self.sample_logits(params, h_b)

        # Negative temperature selects greedy argmax (used by the Pallas
        # kernel equivalence tests).
        scores = jnp.where(temperature < 0.0, logits,
                           logits * temperature + gumbel)
        new_exc = jnp.argmax(scores, axis=-1)
        e = mulaw_decode(new_exc)
        sample = jnp.clip(pred + e, -1.0, 1.0)
        sig_mem = jnp.concatenate([sample[:, None], sig_mem[:, :-1]], axis=1)
        return (h_a, h_b, sig_mem, new_exc), (sample, new_exc, logits)

    # -- bunched sample-rate network (S samples per step) ---------------
    def sub_logits(self, params, h_b: jnp.ndarray, j: int) -> jnp.ndarray:
        """Dual-FC output head for intra-bunch sub-sample ``j``."""
        if j == 0:
            return self.sample_logits(params, h_b)
        b1 = params.get(f"fc_out1_b_b{j}", 0.0)
        b2 = params.get(f"fc_out2_b_b{j}", 0.0)
        t1 = jnp.tanh(h_b @ params[f"fc_out1_w_b{j}"] + b1) \
            * params[f"fc_out1_g_b{j}"]
        t2 = jnp.tanh(h_b @ params[f"fc_out2_w_b{j}"] + b2) \
            * params[f"fc_out2_g_b{j}"]
        return t1 + t2 + params[f"fc_out_b_b{j}"]

    def bunch_step(self, params, carry, cond, lpc, gumbel, temperature):
        """One bunched autoregressive step emitting ``self.bunch`` samples.

        carry: (h_a [B,ga], h_b [B,gb], sig_mem [B,16],
                exc_hist [B,S] int32, most recent first)
        cond [B, cond_dim]; lpc [B, 16]; gumbel [B, S, 256];
        temperature [B, 1].
        Returns (carry, (samples [B,S], exc [B,S])).
        """
        S = self.bunch
        h_a, h_b, sig_mem, exc_hist = carry

        pred = -jnp.sum(sig_mem * lpc, axis=-1)  # [B] (first sub-sample)
        parts = [params["emb_sig"][mulaw_encode(sig_mem[:, 0])]]
        for j in range(1, S):
            parts.append(params[f"emb_sig_l{j}"][mulaw_encode(sig_mem[:, j])])
        parts.append(params["emb_pred"][mulaw_encode(pred)])
        parts.append(params["emb_exc"][exc_hist[:, 0]])
        for j in range(1, S):
            parts.append(params[f"emb_exc_l{j}"][exc_hist[:, j]])
        parts.append(cond)
        x_a = jnp.concatenate(parts, axis=-1)
        h_a = self._gru(x_a, h_a, params["gru_a_wx"], params["gru_a_wh"],
                        params["gru_a_bx"], params["gru_a_bh"],
                        params["gru_a_mask"])
        x_b = jnp.concatenate([h_a, cond], axis=-1)
        h_b = self._gru(x_b, h_b, params["gru_b_wx"], params["gru_b_wh"],
                        params["gru_b_bx"], params["gru_b_bh"])

        samples, excs = [], []
        for j in range(S):
            logits = self.sub_logits(params, h_b, j)
            if j > 0:
                logits = (logits
                          + params[f"bunch_exc_emb_b{j}"][excs[-1]]
                          + params[f"bunch_pred_emb_b{j}"][mulaw_encode(pred)])
            scores = jnp.where(temperature < 0.0, logits,
                               logits * temperature + gumbel[:, j])
            new_exc = jnp.argmax(scores, axis=-1)
            sample = jnp.clip(pred + mulaw_decode(new_exc), -1.0, 1.0)
            sig_mem = jnp.concatenate([sample[:, None], sig_mem[:, :-1]],
                                      axis=1)
            samples.append(sample)
            excs.append(new_exc)
            if j + 1 < S:
                pred = -jnp.sum(sig_mem * lpc, axis=-1)
        exc_hist = jnp.stack(excs[::-1], axis=1)  # most recent first
        return (h_a, h_b, sig_mem, exc_hist), (jnp.stack(samples, axis=1),
                                               jnp.stack(excs, axis=1))


class NetVocoderState(NamedTuple):
    h_a: jnp.ndarray        # [B, GRU_A]
    h_b: jnp.ndarray        # [B, GRU_B]
    sig_mem: jnp.ndarray    # [B, LPC_ORDER]
    exc_idx: jnp.ndarray    # [B] int32
    feat_mem: jnp.ndarray   # [B, FEAT_CONTEXT, 20] conv left-context
    deemph: jnp.ndarray     # [B]
    rng: jax.Array          # base key; per-frame keys fold in frame_ctr
    frame_ctr: jnp.ndarray  # [] int32, absolute frame position of the stream


def net_vocoder_init(model: LPCNetModel, batch: int, seed: int = 0
                     ) -> NetVocoderState:
    exc_shape = (batch,) if model.bunch == 1 else (batch, model.bunch)
    return NetVocoderState(
        h_a=jnp.zeros((batch, model.gru_a_units), jnp.float32),
        h_b=jnp.zeros((batch, model.gru_b_units), jnp.float32),
        sig_mem=jnp.zeros((batch, LPC_ORDER), jnp.float32),
        exc_idx=jnp.full(exc_shape, MULAW_LEVELS // 2, jnp.int32),
        feat_mem=jnp.zeros((batch, FEAT_CONTEXT, NB_FEATURES), jnp.float32),
        deemph=jnp.zeros((batch,), jnp.float32),
        rng=jax.random.PRNGKey(seed),
        frame_ctr=jnp.zeros((), jnp.int32),
    )


# Canonical synthesis block (see the blocked scan in
# net_synthesize_frames): 50 frames = 8000 samples, matching the runtime's
# segment_length_multiple bucket so word programs and 50-frame chunk
# programs share block boundaries.
COND_BLOCK = 50
DEEMPH_BLOCK = COND_BLOCK * FRAME_SIZE

# Gumbel tail cap for the mu-law excitation sampler.  An uncapped Gumbel
# draw reaches +10..16 once per ~10^5..10^7 lane-samples; in near-silence
# (logit gaps ~8-13 after pitch-corr sharpening) such a draw picks a
# far-off excitation level whose pulse re-excites the autoregressive
# loop, audible as 0.1 s crackle bursts riding post-speech silence
# (measured in closed-loop recos: 0.02 mean|x| vs the 0.0004 mu-law
# quantization floor).  Capping at +8 forbids only picks whose
# probability ratio is < e^-8/temp — upstream LPCNet's probability-floor
# trick (subtract-and-renormalize over the softmax) exists for exactly
# this failure mode; the cap is its Gumbel-argmax equivalent and costs
# nothing on the sampler's serial chain (noise prep is off-chain).
NOISE_CAP = 8.0

# Energy-gated sampling sharpening (see the temperature derivation in
# net_synthesize_frames): frames whose Bark-cepstral c0 is below QUIET_C0
# sample at temperature scaled by 1 + (QUIET_C0 - c0) * QUIET_GAIN.
# Speech frames in the deployed corpora run c0 ~ -12..0; room-tone floors
# sit at -18..-21, where this reaches ~4-5x (near-greedy, stable).
QUIET_C0 = -12.0
QUIET_GAIN = 0.5


@partial(jax.jit, static_argnames=("model", "use_pallas", "sparse_pattern",
                                   "temperature_scale", "greedy",
                                   "quiet_sharpen"))
def net_synthesize_frames(model: LPCNetModel, params,
                          state: NetVocoderState, features: jnp.ndarray,
                          use_pallas: bool = False, sparse_pattern=None,
                          temperature_scale: float = 1.0,
                          greedy: bool = False,
                          quiet_sharpen: bool = False):
    """features [B, T, 20] -> (pcm [B, T*160] in [-1,1], new state).

    sparse_pattern: static GRU-A tile keep-pattern (see
    ops/pallas/sampler.py ``tile_sparse_pattern``); must be derived from
    the concrete mask OUTSIDE this jitted function.  Pallas path only.

    temperature_scale multiplies the pitch-correlation-derived sharpening
    (xiph LPCNet exposes the analogous knob on its sampler); greedy=True
    selects per-sample argmax decoding (deterministic, used for
    diagnostics and kernel-equivalence tests).

    Chunk invariance: synthesis is a pure stream function of the carried
    state — splitting a feature sequence across calls produces BIT-identical
    concatenated audio to one call, as long as every call is a whole number
    of DEEMPH_BLOCK sample blocks (50 frames; the runtime's bucket
    granularity).  Sampling noise is keyed per ABSOLUTE frame
    (``fold_in(rng, frame_ctr + t)``), never per call, and de-emphasis
    associates in fixed 50-frame blocks.  Pinned by
    tests/test_vocoder.py chunk-invariance cases; the fused online word
    path (runtime/units.py FusedDecoderVocoder) relies on it to ship audio
    chunks before the whole word is synthesized."""
    B, T, _ = features.shape

    # Per-frame keys from the stream's absolute frame counter: noise for
    # frame t depends only on (rng, frame_ctr + t), so call boundaries do
    # not perturb the sampled stream (chunk invariance, see docstring).
    frame_keys = jax.vmap(lambda t: jax.random.fold_in(state.rng, t))(
        state.frame_ctr + jnp.arange(T, dtype=jnp.int32))

    feats_ctx_all = jnp.concatenate([state.feat_mem, features], axis=1)

    def block(carry, feats_ctx, keys):
        """One canonical synthesis block.

        feats_ctx [B, FEAT_CONTEXT+L, 20] (causal-conv left context first),
        keys [L] per-frame PRNG keys, carry (h_a, h_b, sig_mem, exc_idx,
        deemph).  ALL per-frame compute — conditioning convs, LPC
        derivation, sampling, de-emphasis — happens at block shape: a
        full 50-frame block of a stream therefore executes the identical
        compiled body no matter how calls chunk the stream, which is what
        makes chunked output bit-identical (XLA's matmul/associative-scan
        FP schedules depend on operand length, so full-call-shaped compute
        would round differently per chunking)."""
        h_a, h_b, sig_mem, exc_idx, deemph = carry
        feats = feats_ctx[:, FEAT_CONTEXT:]
        L = feats.shape[1]
        cond_all = model.condition(params, feats_ctx)[:, FEAT_CONTEXT:]
        bands = bands_from_cepstrum(feats[..., :NB_BANDS])
        lpc_all, _ = jax.vmap(jax.vmap(lpc_from_bands))(bands)  # [B, L, 16]

        corr = jnp.clip(feats[..., NB_BANDS + 1] + 0.5, 0.0, 1.0)  # [B, L]
        if greedy:
            temperature = jnp.full(corr.shape + (1,), -1.0, jnp.float32)
        else:
            # Sharper when voiced (pitch-correlation-dependent, as LPCNet).
            temperature = ((1.0 + 1.5 * corr) * temperature_scale)[..., None]
            if quiet_sharpen:
                # ONLINE squelch (opt-in; the streaming units enable it):
                # ALSO sharper when the conditioning itself says quiet.
                # On closed-loop DECODED features — whose "silence" is
                # smoother than any training silence — the sampler sits
                # near a regime where noise occasionally ignites a
                # sustained AR limit cycle: 0.1 s crackle bursts riding
                # post-speech silence at a ~40% per-word rate, on BOTH
                # the scan and Pallas paths (isolated by a 5-seed A/B).
                # Energy-gated sharpening starves the oscillation exactly
                # where the features prescribe quiet.  OFF by default:
                # in-family encoder features put genuine low-energy
                # speech (fricative tails, c0 -21..-16) in the same band,
                # and throttling their noise excitation costs ~1-3 dB
                # roundtrip CD on trained material.
                quiet = jnp.maximum(0.0,
                                    (QUIET_C0 - feats[..., 0]) * QUIET_GAIN)
                temperature = temperature * (1.0 + quiet)[..., None]

        if use_pallas and model.bunch > 1:
            from ..ops.pallas.sampler import sampler_frames_bunched_pallas

            seeds = jax.vmap(lambda k: jax.random.randint(
                k, (), 0, 2**31 - 1, jnp.int32))(keys)
            (h_a, h_b, sig_mem, exc_idx), sig = sampler_frames_bunched_pallas(
                model, params, (h_a, h_b, sig_mem, exc_idx),
                cond_all, lpc_all, temperature, seeds,
                frame_size=FRAME_SIZE, sparse_pattern=sparse_pattern,
            )
        elif use_pallas and model.bunch == 1:
            from ..ops.pallas.sampler import sampler_frames_pallas

            seeds = jax.vmap(lambda k: jax.random.randint(
                k, (), 0, 2**31 - 1, jnp.int32))(keys)
            (h_a, h_b, sig_mem, exc_idx), sig = sampler_frames_pallas(
                model, params, (h_a, h_b, sig_mem, exc_idx),
                cond_all, lpc_all, temperature, seeds,
                frame_size=FRAME_SIZE, sparse_pattern=sparse_pattern,
            )
        elif model.bunch > 1:
            S = model.bunch
            steps = FRAME_SIZE // S
            gumbel = jnp.minimum(jax.vmap(lambda k: jax.random.gumbel(
                k, (steps, B, S, MULAW_LEVELS), jnp.float32))(keys),
                NOISE_CAP)

            def frame_body(carry, frame_in):
                cond_t, lpc_t, gumbel_t, temp_t = frame_in

                def step(c, g):
                    c, (samples, _) = model.bunch_step(
                        params, c, cond_t, lpc_t, g, temp_t
                    )
                    return c, samples  # [B, S]

                carry, samples = jax.lax.scan(step, carry, gumbel_t)
                return carry, samples  # [steps, B, S]

            frame_ins = (
                jnp.moveaxis(cond_all, 1, 0),   # [L, B, cd]
                jnp.moveaxis(lpc_all, 1, 0),    # [L, B, 16]
                gumbel,                          # [L, steps, B, S, 256]
                jnp.moveaxis(temperature, 1, 0),
            )
            (h_a, h_b, sig_mem, exc_idx), sig = jax.lax.scan(
                frame_body, (h_a, h_b, sig_mem, exc_idx), frame_ins
            )
            # [L, steps, B, S] -> [B, L*steps*S]
            sig = jnp.moveaxis(sig, 2, 0).reshape(B, L * FRAME_SIZE)
        else:
            gumbel = jnp.minimum(jax.vmap(lambda k: jax.random.gumbel(
                k, (FRAME_SIZE, B, MULAW_LEVELS), jnp.float32))(keys),
                NOISE_CAP)

            def frame_body(carry, frame_in):
                cond_t, lpc_t, gumbel_t, temp_t = frame_in

                def step(c, g):
                    c, (sample, _, _) = model.sample_step(
                        params, c, cond_t, lpc_t, g, temp_t
                    )
                    return c, sample

                carry, samples = jax.lax.scan(step, carry, gumbel_t)
                return carry, samples  # [FRAME_SIZE, B]

            frame_ins = (
                jnp.moveaxis(cond_all, 1, 0),   # [L, B, cd]
                jnp.moveaxis(lpc_all, 1, 0),    # [L, B, 16]
                gumbel,                          # [L, 160, B, 256]
                jnp.moveaxis(temperature, 1, 0),
            )
            (h_a, h_b, sig_mem, exc_idx), sig = jax.lax.scan(
                frame_body, (h_a, h_b, sig_mem, exc_idx), frame_ins
            )
            sig = jnp.moveaxis(sig.reshape(L * FRAME_SIZE, B), 0, 1)

        # De-emphasis: y[t] = s[t] + a*y[t-1] as a parallel associative
        # scan over affine maps (exact; see ops/filters.py for the same
        # construction).  A sequential lax.scan here costs ~1 us per step
        # x 16000 samples per 100 frames — it dominated the whole
        # synthesis call (~40% of device time).  Association is per block,
        # so it too is canonical for full blocks.
        def combine(left, right):
            ml, bl = left
            mr, br = right
            return ml * mr, mr * bl + br

        m_cum, b_cum = jax.lax.associative_scan(
            combine, (jnp.full_like(sig, PREEMPH), sig), axis=1)
        y = m_cum * deemph[..., None] + b_cum
        deemph = y[:, -1]
        pcm = jnp.clip(y, -1.0, 1.0)
        return (h_a, h_b, sig_mem, exc_idx, deemph), pcm

    carry = (state.h_a, state.h_b, state.sig_mem, state.exc_idx,
             state.deemph)
    # Imported same-pad checkpoints (emb_pitch) condition on FUTURE frames,
    # so 50-frame block boundaries would perturb their conditioning: they
    # run single-shot (chunk invariance is not offered for them — their
    # path is offline import/eval, reference LPCNet.pyx:30-40 surface).
    if "emb_pitch" in params:
        nfull, rem = 0, T
    else:
        nfull, rem = divmod(T, COND_BLOCK)
    parts = []
    if nfull:
        idx = (jnp.arange(nfull)[:, None] * COND_BLOCK
               + jnp.arange(COND_BLOCK + FEAT_CONTEXT)[None, :])
        blocks = jnp.moveaxis(feats_ctx_all[:, idx], 1, 0)
        keys_b = frame_keys[: nfull * COND_BLOCK].reshape(
            (nfull, COND_BLOCK) + frame_keys.shape[1:])
        carry, pcm_b = jax.lax.scan(
            lambda c, x: block(c, x[0], x[1]), carry, (blocks, keys_b))
        parts.append(jnp.moveaxis(pcm_b, 0, 1).reshape(B, nfull
                                                       * DEEMPH_BLOCK))
    if rem:
        carry, pcm_r = block(carry,
                             feats_ctx_all[:, nfull * COND_BLOCK:],
                             frame_keys[nfull * COND_BLOCK:])
        parts.append(pcm_r)
    pcm = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

    h_a, h_b, sig_mem, exc_idx, deemph = carry
    new_state = NetVocoderState(
        h_a=h_a, h_b=h_b, sig_mem=sig_mem, exc_idx=exc_idx,
        feat_mem=(feats_ctx_all[:, -FEAT_CONTEXT:] if FEAT_CONTEXT
                  else state.feat_mem),
        deemph=deemph, rng=state.rng,
        frame_ctr=state.frame_ctr + jnp.int32(T),
    )
    return pcm, new_state
