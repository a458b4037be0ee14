"""Neural vocoder trainer: teacher-forced mu-law excitation modeling.

Capability target: the training recipe of the LPCNet C library the reference
wraps (Valin & Skoglund 2019): per 16 kHz sample, predict the mu-law
excitation distribution given the previous signal sample, the LPC prediction,
the previous excitation, and the frame conditioning; cross-entropy loss;
progressive magnitude pruning of the GRU-A recurrent matrix to block
sparsity.

TPU design: with teacher forcing every sample's *inputs* are known up front,
so the embedding+input projections for a whole utterance batch are a few
large MXU matmuls hoisted out of the recurrence; only the GRU state scan
remains sequential.  Noise injection on the signal history (mu-law
quantization-domain jitter) matches LPCNet's robustness trick.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..vocoder.features import LPCFeatureEncoder
from ..vocoder.lpc import FRAME_SIZE, LPC_ORDER, NB_BANDS, PREEMPH, \
    bands_from_cepstrum, lpc_from_bands
from ..vocoder.mulaw import MULAW_LEVELS, mulaw_decode, mulaw_encode
from ..vocoder.net import FEAT_CONTEXT, LPCNetModel


def prepare_utterance(audio: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """16 kHz PCM -> (features [T, 20], preemphasized float signal [T*160]).

    Trailing partial frames are dropped; the signal is in the vocoder's
    pre-emphasized modeling domain.
    """
    audio = np.asarray(audio)
    if np.issubdtype(audio.dtype, np.integer):
        audio = audio.astype(np.float32) / 32768.0
    enc = LPCFeatureEncoder()
    pcm = np.clip(np.round(audio * 32767.0), -32768, 32767).astype(np.int16)
    feats = enc.compute_LPC_features(pcm)
    n = len(feats) * FRAME_SIZE
    sig = audio[:n].astype(np.float32)
    shifted = np.concatenate([[0.0], sig[:-1]]).astype(np.float32)
    return feats, sig - PREEMPH * shifted


def _multi_res_stft_loss(x: jnp.ndarray, y: jnp.ndarray,
                         fft_sizes=(512, 1024, 256)) -> jnp.ndarray:
    """Mean log-magnitude STFT distance over several resolutions.

    Magnitude-only (an AR sampler can never match the target's noise
    phase), log-domain (what the Bark-cepstral quality metric measures),
    mean over frames/bins/resolutions.  x, y: [B, S] in the modeling
    (pre-emphasized) domain.
    """
    fft_sizes = [n for n in fft_sizes if n <= x.shape[1]] or [
        1 << (int(x.shape[1]).bit_length() - 1)]
    total = 0.0
    for n_fft in fft_sizes:
        hop = n_fft // 4
        win = jnp.hanning(n_fft)
        S_frames = 1 + (x.shape[1] - n_fft) // hop
        idx = (jnp.arange(S_frames)[:, None] * hop
               + jnp.arange(n_fft)[None, :])                 # [F, n_fft]
        fx = jnp.fft.rfft(x[:, idx] * win, axis=-1)
        fy = jnp.fft.rfft(y[:, idx] * win, axis=-1)
        lx = jnp.log(jnp.abs(fx) + 1e-5)
        ly = jnp.log(jnp.abs(fy) + 1e-5)
        total = total + jnp.mean(jnp.abs(lx - ly))
    return total / len(fft_sizes)


class VocoderBatch(NamedTuple):
    features: jnp.ndarray  # [B, T, 20]
    signal: jnp.ndarray    # [B, T*160] pre-emphasized float


class VocoderTrainer:
    def __init__(self, model: LPCNetModel, learning_rate: float = 1e-3,
                 noise_level: int = 2, lr_decay: float = 0.0,
                 drift_bound: int = 24, stft_weight: float = 2.0,
                 grad_clip: float = 0.0, rollout_detach: int = 0):
        self.model = model
        # mu-law domain jitter on the signal history (LPCNet's input noise).
        self.noise_level = noise_level
        # Scheduled sampling: max |fed-back - correcting| excitation
        # deviation in mu-law levels.  Unbounded drift degenerates — the
        # model learns to sample insanely so histories rail at +-1 and the
        # clipped targets become trivially predictable (measured: CE fell
        # to 2.17 while val distortion rose 22 -> 27 dB).  The bound keeps
        # drift inside a realistic tube around the data manifold.
        self.drift_bound = drift_bound
        # Weight of the multi-resolution STFT term in the free-running
        # fine-tune loss (train_step_freerun) relative to the CE anchor.
        self.stft_weight = stft_weight
        # Global-norm gradient clip (0 = off).  The free-running rollout
        # backpropagates through an LPC synthesis filter — a resonant IIR
        # with poles near the unit circle — so unclipped gradients explode
        # (measured: the fine-tune loss ROSE 7.0 -> 10.4 over 40 epochs).
        self.grad_clip = grad_clip
        # Truncate rollout backprop every N samples (0 = full-length):
        # the forward pass still free-runs the whole chunk, but gradient
        # paths are windowed, bounding the resonance amplification the
        # same way TBPTT bounds RNN gradients.
        self.rollout_detach = rollout_detach
        if lr_decay > 0.0:
            # Hyperbolic per-step decay, the schedule of the LPCNet recipe
            # the reference wraps (xiph LPCNet train_lpcnet.py uses
            # Adam(decay=...), i.e. lr_t = lr0 / (1 + decay * t)).  A flat
            # 1e-3 Adam plateaus on rich corpora: the CE stops descending
            # around 2.9 while the same run with decay keeps improving.
            schedule = lambda step: learning_rate / (1.0 + lr_decay * step)
            self.optimizer = optax.adam(schedule)
        else:
            self.optimizer = optax.adam(learning_rate)

    def init(self, key: jax.Array):
        params = self.model.init(key)
        return params, self.optimizer.init(params)

    def _prepare_cond(self, params, features):
        """-> (cond_up [B,S,cd], lpc_up [B,S,16], corr [B,T]) shared by all
        loss variants."""
        model = self.model
        B, T, _ = features.shape
        feats_ctx = jnp.concatenate(
            [jnp.zeros((B, FEAT_CONTEXT, features.shape[-1])), features],
            axis=1)
        cond = model.condition(params, feats_ctx)[:, FEAT_CONTEXT:]  # [B,T,cd]
        cond_up = jnp.repeat(cond, FRAME_SIZE, axis=1)               # [B,S,cd]
        bands = bands_from_cepstrum(features[..., :NB_BANDS])
        lpc, _ = jax.vmap(jax.vmap(lpc_from_bands))(bands)           # [B,T,16]
        lpc_up = jnp.repeat(lpc, FRAME_SIZE, axis=1)                 # [B,S,16]
        corr = jnp.clip(features[..., NB_BANDS + 1] + 0.5, 0.0, 1.0)
        return cond_up, lpc_up, corr

    def _recursion(self, signal, lpc_up, noise=None, feedback=None):
        """Run the LPC synthesis recurrence with an imperfect fed-back
        excitation, exactly as the sampler feeds back its own samples
        (net.py sample_step: next history sample = clip(pred + decoded e)).

        The teacher-forced history then drifts the way inference drift
        does, and the CE target is the excitation that CORRECTS back toward
        the clean signal — iid jitter on the input indices alone does not
        teach correction (measured: free-running energy ran away 3x on a
        breathy corpus whose teacher-forced sampling scored 2.4 dB).

        Exactly one of:
        * ``noise`` [B,S] int — mu-law-domain jitter ADDED to each step's
          correcting excitation (the LPCNet paper's §3.3 scheme);
        * ``feedback`` [B,S] int — an externally chosen fed-back excitation
          index per step (scheduled sampling: the model's own draws).

        -> (pred, exc_tgt, exc_fb, sig_rec), all [B,S]: the LPC prediction
        from the drifted history, the correcting mu-law target, the fed-back
        excitation, and the drifted reconstruction.
        """
        B, S = signal.shape

        def step(hist, inp):
            s_t, lpc_t, n_t = inp                      # [B], [B,16], [B]
            pred_t = -jnp.sum(hist * lpc_t, axis=-1)   # [B]
            e_idx_t = mulaw_encode(jnp.clip(s_t - pred_t, -1.0, 1.0))
            if feedback is None:
                e_fb_t = jnp.clip(e_idx_t + n_t, 0, MULAW_LEVELS - 1)
            else:
                # Clamp the sampled feedback to a tube around the correcting
                # excitation (see __init__ drift_bound).
                e_fb_t = jnp.clip(n_t, e_idx_t - self.drift_bound,
                                  e_idx_t + self.drift_bound)
                e_fb_t = jnp.clip(e_fb_t, 0, MULAW_LEVELS - 1)
            s_rec_t = jnp.clip(pred_t + mulaw_decode(e_fb_t), -1.0, 1.0)
            hist = jnp.concatenate([s_rec_t[:, None], hist[:, :-1]], axis=1)
            return hist, (pred_t, e_idx_t, e_fb_t, s_rec_t)

        inject = noise if feedback is None else feedback
        if inject is None:
            inject = jnp.zeros((B, S), jnp.int32)
        _, outs = jax.lax.scan(
            step, jnp.zeros((B, LPC_ORDER)),
            (jnp.moveaxis(signal, 1, 0), jnp.moveaxis(lpc_up, 1, 0),
             jnp.moveaxis(inject, 1, 0)))
        pred, exc_tgt, exc_fb, sig_rec = (jnp.moveaxis(o, 0, 1) for o in outs)
        return pred, exc_tgt, exc_fb, sig_rec

    @partial(jax.jit, static_argnames=("self",))
    def _loss(self, params, features, signal, rng):
        """Teacher-forced CE over all samples of the batch (uniform
        mu-law-domain noise propagated through the AR recurrence)."""
        B, T, _ = features.shape
        S = T * FRAME_SIZE
        cond_up, lpc_up, _corr = self._prepare_cond(params, features)
        if self.noise_level > 0:
            rng, nk = jax.random.split(rng)
            noise = jax.random.randint(
                nk, (B, S), -self.noise_level, self.noise_level + 1)
        else:
            noise = jnp.zeros((B, S), jnp.int32)
        pred, exc_idx, exc_noisy, sig_rec = self._recursion(
            signal, lpc_up, noise=noise)
        return self._forward_ce(params, cond_up, pred, exc_idx, exc_noisy,
                                sig_rec)

    def _forward_ce(self, params, cond_up, pred, exc_idx, exc_noisy, sig_rec,
                    return_logits=False):
        """Sample-rate network forward on (possibly drifted) teacher inputs.

        exc_idx is the CE target; exc_noisy/sig_rec are the fed-back
        excitation and reconstruction actually seen as inputs.  With
        ``return_logits`` (bunch=1 only) returns [B,S,256] logits instead
        of the scalar CE.
        """
        B, S = pred.shape

        prev_exc = jnp.concatenate(
            [jnp.full((B, 1), MULAW_LEVELS // 2, jnp.int32),
             exc_noisy[:, :-1]], axis=1,
        )
        prev_sig_idx = mulaw_encode(
            jnp.pad(sig_rec, ((0, 0), (1, 0)))[:, :S])
        pred_idx = mulaw_encode(pred)

        # Hoist all input projections out of the GRU scans.  At bunch=K the
        # recurrence runs at 16 kHz / K: GRU inputs are gathered at bunch
        # starts (teacher-forced lags of the previous K samples/excitations)
        # and each sub-sample j gets its own output head on the shared h_b.
        K = self.model.bunch
        assert not (return_logits and K > 1), \
            "return_logits is a bunch=1 (per-sample head) facility"
        if K > 1:
            starts = jnp.arange(0, S, K)
            parts = [params["emb_sig"][prev_sig_idx[:, starts]]]
            for j in range(1, K):
                # lag j at bunch start t: noisy reconstruction s_rec[t-1-j]
                # (the injected noise already rode through the recurrence).
                lag_idx = mulaw_encode(
                    jnp.pad(sig_rec, ((0, 0), (j + 1, 0)))[:, :S][:, starts])
                parts.append(params[f"emb_sig_l{j}"][lag_idx])
            parts.append(params["emb_pred"][pred_idx[:, starts]])
            parts.append(params["emb_exc"][prev_exc[:, starts]])
            for j in range(1, K):
                lag_exc = jnp.pad(exc_noisy, ((0, 0), (j + 1, 0)),
                                  constant_values=MULAW_LEVELS // 2)[:, :S]
                parts.append(params[f"emb_exc_l{j}"][lag_exc[:, starts]])
            parts.append(cond_up[:, starts])
            x_a = jnp.concatenate(parts, axis=-1)        # [B, S/K, in]
            cond_up = cond_up[:, starts]                 # [B, S/K, cd]
        else:
            x_a = jnp.concatenate([
                params["emb_sig"][prev_sig_idx],
                params["emb_pred"][pred_idx],
                params["emb_exc"][prev_exc],
                cond_up,
            ], axis=-1)                                              # [B,S,in]
        ga = self.model.gru_a_units
        gb = self.model.gru_b_units
        gx_a = x_a @ params["gru_a_wx"] + params["gru_a_bx"]
        wh_a = params["gru_a_wh"] * params["gru_a_mask"]

        def gru_scan(gx, wh, bh, units, h0):
            def step(h, gx_t):
                gh = h @ wh + bh
                r = jax.nn.sigmoid(gx_t[:, :units] + gh[:, :units])
                z = jax.nn.sigmoid(gx_t[:, units:2 * units]
                                   + gh[:, units:2 * units])
                n = jnp.tanh(gx_t[:, 2 * units:] + r * gh[:, 2 * units:])
                h = (1.0 - z) * n + z * h
                return h, h

            _, hs = jax.lax.scan(step, h0, jnp.moveaxis(gx, 1, 0))
            return jnp.moveaxis(hs, 0, 1)                            # [B,S,u]

        h_a = gru_scan(gx_a, wh_a, params["gru_a_bh"], ga,
                       jnp.zeros((B, ga)))
        x_b = jnp.concatenate([h_a, cond_up], axis=-1)
        gx_b = x_b @ params["gru_b_wx"] + params["gru_b_bx"]
        h_b = gru_scan(gx_b, params["gru_b_wh"], params["gru_b_bh"], gb,
                       jnp.zeros((B, gb)))

        if K > 1:
            ces = []
            for j in range(K):
                logits = self.model.sub_logits(params, h_b, j)
                if j > 0:
                    # Condition on the (noisy) fed-back excitation, as the
                    # sampler will at inference; the target stays clean.
                    prev_sub = exc_noisy[:, starts + j - 1]
                    logits = (
                        logits
                        + params[f"bunch_exc_emb_b{j}"][prev_sub]
                        + params[f"bunch_pred_emb_b{j}"][
                            pred_idx[:, starts + j]]
                    )
                logp = jax.nn.log_softmax(logits, axis=-1)
                tgt = exc_idx[:, starts + j]
                ces.append(-jnp.take_along_axis(
                    logp, tgt[..., None], axis=-1)[..., 0])
            return jnp.mean(jnp.stack(ces))

        logits = self.model.sample_logits(params, h_b)               # [B,S,256]
        if return_logits:
            return logits
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, exc_idx[..., None], axis=-1)[..., 0]
        return jnp.mean(ce)

    @partial(jax.jit, static_argnames=("self",))
    def _loss_sampled(self, params, features, signal, rng):
        """Scheduled-sampling CE (bunch=1): drift the teacher-forced history
        with the model's OWN sampled excitations instead of uniform noise.

        Uniform +-noise_level jitter under-represents the real feedback
        perturbation: at inference the model samples from its conditional,
        whose spread on breathy/noisy corpora is tens of mu-law levels.
        Pass 1 computes clean teacher-forced logits, samples one excitation
        per step with the INFERENCE temperature shaping (1 + 1.5*corr,
        net.py; the draw itself is stop-gradiented), and pass 2 trains the
        model to emit the correcting excitation given the so-drifted
        history.  The drift compounds through the LPC recurrence within the
        chunk, exposing the model to exactly the runaway states free-running
        synthesis visits.

        The loss is the MEAN of the clean pass-1 CE and the drifted pass-2
        CE.  The clean anchor matters: with the drifted term alone the
        model's best move is to distort its clean conditional so that its
        own samples become easy to correct (measured: pure-sampled resume
        drove CE below the clean floor while val distortion worsened 22 ->
        27 dB).  Anchoring on the already-computed pass-1 logits costs no
        extra forward.
        """
        assert self.model.bunch == 1, \
            "scheduled sampling is implemented for bunch=1; use the " \
            "uniform-noise loss for bunched models"
        B, T, _ = features.shape
        S = T * FRAME_SIZE
        cond_up, lpc_up, corr = self._prepare_cond(params, features)

        # Pass 1: clean teacher forcing -> logits (with grad: the clean
        # anchor term) -> one stop-gradiented sampled draw per step.
        pred0, exc0, exc_fb0, sig_rec0 = self._recursion(signal, lpc_up)
        logits0 = self._forward_ce(
            params, cond_up, pred0, exc0, exc_fb0, sig_rec0,
            return_logits=True)
        logp0 = jax.nn.log_softmax(logits0, axis=-1)
        ce_clean = -jnp.mean(jnp.take_along_axis(
            logp0, exc0[..., None], axis=-1))
        temp = jnp.repeat(1.0 + 1.5 * corr, FRAME_SIZE, axis=1)[..., None]
        rng, gk = jax.random.split(rng)
        frozen = jax.lax.stop_gradient(logits0)
        gumbel = jax.random.gumbel(gk, frozen.shape, frozen.dtype)
        e_samp = jnp.argmax(frozen * temp + gumbel, axis=-1)         # [B,S]

        # Pass 2: drifted history from the sampled feedback; correcting CE.
        pred_d, exc_tgt, exc_fb, sig_rec = self._recursion(
            signal, lpc_up, feedback=e_samp.astype(jnp.int32))
        ce_drift = self._forward_ce(params, cond_up, pred_d, exc_tgt, exc_fb,
                                    sig_rec)
        return 0.5 * (ce_clean + ce_drift)

    @partial(jax.jit, static_argnames=("self",))
    def _loss_freerun(self, params, features, signal, rng):
        """Free-running fine-tune loss (bunch=1): synthesize the chunk the
        way inference does — the model's own sampled excitation fed back
        through the LPC recurrence AND the GRU state — and penalize the
        spectral divergence of the rollout from the true signal.

        Gradient path: the sampled excitation is a straight-through
        estimator (forward: the hard mu-law draw exactly as net.py
        sample_step; backward: the softmax-expected decoded excitation),
        so the multi-resolution STFT loss differentiates through the
        whole 16 kHz rollout — prediction, feedback, and logits.  This
        optimizes precisely the failure mode CE cannot see: free-running
        energy runaway (measured 8-13x excess in the F1 region while
        teacher-forced sampling of the same model scored 2.4 dB).  The
        clean teacher-forced CE rides along as an anchor so the
        conditional distribution stays calibrated.

        Bunched models (bunch=K) roll out with the exact ``bunch_step``
        semantics: one GRU advance per K samples, per-lag embeddings
        gathered from the drifted history, sub-sample j's head corrected
        by the previous intra-bunch draw, each sub-sample sampled
        straight-through.
        """
        if self.model.bunch > 1:
            sig_rec = self._rollout_bunched(params, features, signal, rng)
            stft = _multi_res_stft_loss(sig_rec, signal)
            cond_up, lpc_up, _ = self._prepare_cond(params, features)
            pred0, exc0, exc_fb0, sig_rec0 = self._recursion(signal, lpc_up)
            ce = self._forward_ce(params, cond_up, pred0, exc0, exc_fb0,
                                  sig_rec0)
            return ce + self.stft_weight * stft
        model = self.model
        B, T, _ = features.shape
        S = T * FRAME_SIZE
        cond_up, lpc_up, corr = self._prepare_cond(params, features)
        temp_up = jnp.repeat(1.0 + 1.5 * corr, FRAME_SIZE, axis=1)  # [B,S]
        decode_table = mulaw_decode(jnp.arange(MULAW_LEVELS))       # [256]

        rng, gk = jax.random.split(rng)
        gumbel = jax.random.gumbel(gk, (S, B, MULAW_LEVELS))

        ga, gb = model.gru_a_units, model.gru_b_units

        # The GRU consumes hard indices (exactly inference); the waveform
        # path consumes the straight-through excitation.
        def scan_step(carry, inp):
            h_a, h_b, hist, exc_prev = carry
            cond_t, lpc_t, gum_t, temp_t, detach_t = inp
            # Truncated rollout backprop: windowed gradient paths, full-
            # length forward drift (see __init__ rollout_detach).
            h_a = jnp.where(detach_t, jax.lax.stop_gradient(h_a), h_a)
            h_b = jnp.where(detach_t, jax.lax.stop_gradient(h_b), h_b)
            hist = jnp.where(detach_t, jax.lax.stop_gradient(hist), hist)
            pred = -jnp.sum(hist * lpc_t, axis=-1)                  # [B]
            sig_idx = mulaw_encode(jax.lax.stop_gradient(hist[:, 0]))
            pred_idx = mulaw_encode(jax.lax.stop_gradient(pred))
            x_a = jnp.concatenate([
                params["emb_sig"][sig_idx],
                params["emb_pred"][pred_idx],
                params["emb_exc"][exc_prev],
                cond_t,
            ], axis=-1)
            h_a = model._gru(x_a, h_a, params["gru_a_wx"],
                             params["gru_a_wh"], params["gru_a_bx"],
                             params["gru_a_bh"], params["gru_a_mask"])
            x_b = jnp.concatenate([h_a, cond_t], axis=-1)
            h_b = model._gru(x_b, h_b, params["gru_b_wx"],
                             params["gru_b_wh"], params["gru_b_bx"],
                             params["gru_b_bh"])
            logits = model.sample_logits(params, h_b)               # [B,256]
            exc_hard = jnp.argmax(logits * temp_t[:, None] + gum_t, axis=-1)
            # Straight-through: forward the hard draw, backprop the
            # softmax-expected decoded excitation (sharpened like the draw).
            p = jax.nn.softmax(logits * temp_t[:, None], axis=-1)
            e_soft = p @ decode_table                               # [B]
            e_hard = decode_table[exc_hard]
            e = e_soft + jax.lax.stop_gradient(e_hard - e_soft)
            sample = jnp.clip(pred + e, -1.0, 1.0)
            hist = jnp.concatenate([sample[:, None], hist[:, :-1]], axis=1)
            return (h_a, h_b, hist, exc_hard), (sample, logits)

        scan_step = jax.checkpoint(scan_step)
        if self.rollout_detach > 0:
            detach = (jnp.arange(S) % self.rollout_detach == 0) \
                & (jnp.arange(S) > 0)
        else:
            detach = jnp.zeros((S,), bool)
        init = (jnp.zeros((B, ga)), jnp.zeros((B, gb)),
                jnp.zeros((B, LPC_ORDER)),
                jnp.full((B,), MULAW_LEVELS // 2, jnp.int32))
        _, (samples, _logits) = jax.lax.scan(
            scan_step, init,
            (jnp.moveaxis(cond_up, 1, 0), jnp.moveaxis(lpc_up, 1, 0),
             gumbel, jnp.moveaxis(temp_up, 1, 0), detach))
        sig_rec = jnp.moveaxis(samples, 0, 1)                       # [B,S]

        stft = _multi_res_stft_loss(sig_rec, signal)

        # Clean teacher-forced CE anchor (same weights, true history).
        pred0, exc0, exc_fb0, sig_rec0 = self._recursion(signal, lpc_up)
        ce = self._forward_ce(params, cond_up, pred0, exc0, exc_fb0,
                              sig_rec0)
        return ce + self.stft_weight * stft

    def _rollout_bunched(self, params, features, signal, rng):
        """Free-running synthesis of the chunk for a bunch=K model,
        differentiable via straight-through sub-sample draws.

        Mirrors ``LPCNetModel.bunch_step`` (net.py) operation for
        operation: per GRU advance the input gathers the previous K
        samples/excitations from the *drifted* history through the
        per-lag embedding tables, and sub-sample j>=1's dual-FC head is
        shifted by the previous intra-bunch draw's correction embedding.
        Returns the reconstruction [B, S] in the modeling domain.
        """
        model = self.model
        K = model.bunch
        B, T, _ = features.shape
        S = T * FRAME_SIZE
        n_steps = S // K
        cond_up, lpc_up, corr = self._prepare_cond(params, features)
        temp_up = jnp.repeat(1.0 + 1.5 * corr, FRAME_SIZE, axis=1)  # [B,S]
        decode_table = mulaw_decode(jnp.arange(MULAW_LEVELS))       # [256]
        starts = jnp.arange(0, S, K)

        rng, gk = jax.random.split(rng)
        gumbel = jax.random.gumbel(gk, (n_steps, B, K, MULAW_LEVELS))

        ga, gb = model.gru_a_units, model.gru_b_units

        def scan_step(carry, inp):
            h_a, h_b, hist, exc_hist = carry
            cond_t, lpc_t, gum_t, temp_t, detach_t = inp
            h_a = jnp.where(detach_t, jax.lax.stop_gradient(h_a), h_a)
            h_b = jnp.where(detach_t, jax.lax.stop_gradient(h_b), h_b)
            hist = jnp.where(detach_t, jax.lax.stop_gradient(hist), hist)

            pred = -jnp.sum(hist * lpc_t, axis=-1)                  # [B]
            pred0_idx = mulaw_encode(jax.lax.stop_gradient(pred))
            parts = [params["emb_sig"][
                mulaw_encode(jax.lax.stop_gradient(hist[:, 0]))]]
            for j in range(1, K):
                parts.append(params[f"emb_sig_l{j}"][
                    mulaw_encode(jax.lax.stop_gradient(hist[:, j]))])
            parts.append(params["emb_pred"][pred0_idx])
            parts.append(params["emb_exc"][exc_hist[:, 0]])
            for j in range(1, K):
                parts.append(params[f"emb_exc_l{j}"][exc_hist[:, j]])
            parts.append(cond_t)
            x_a = jnp.concatenate(parts, axis=-1)
            h_a = model._gru(x_a, h_a, params["gru_a_wx"],
                             params["gru_a_wh"], params["gru_a_bx"],
                             params["gru_a_bh"], params["gru_a_mask"])
            x_b = jnp.concatenate([h_a, cond_t], axis=-1)
            h_b = model._gru(x_b, h_b, params["gru_b_wx"],
                             params["gru_b_wh"], params["gru_b_bx"],
                             params["gru_b_bh"])

            samples, excs = [], []
            for j in range(K):
                logits = model.sub_logits(params, h_b, j)
                if j > 0:
                    logits = (
                        logits
                        + params[f"bunch_exc_emb_b{j}"][excs[-1]]
                        + params[f"bunch_pred_emb_b{j}"][
                            mulaw_encode(jax.lax.stop_gradient(pred))]
                    )
                exc_hard = jnp.argmax(
                    logits * temp_t[:, None] + gum_t[:, j], axis=-1)
                p = jax.nn.softmax(logits * temp_t[:, None], axis=-1)
                e_soft = p @ decode_table
                e = e_soft + jax.lax.stop_gradient(
                    decode_table[exc_hard] - e_soft)
                sample = jnp.clip(pred + e, -1.0, 1.0)
                hist = jnp.concatenate([sample[:, None], hist[:, :-1]],
                                       axis=1)
                samples.append(sample)
                excs.append(exc_hard)
                if j + 1 < K:
                    pred = -jnp.sum(hist * lpc_t, axis=-1)
            exc_hist = jnp.stack(excs[::-1], axis=1)    # most recent first
            return (h_a, h_b, hist, exc_hist), jnp.stack(samples, axis=1)

        scan_step = jax.checkpoint(scan_step)
        if self.rollout_detach > 0:
            period = max(1, self.rollout_detach // K)
            detach = (jnp.arange(n_steps) % period == 0) \
                & (jnp.arange(n_steps) > 0)
        else:
            detach = jnp.zeros((n_steps,), bool)
        init = (jnp.zeros((B, ga)), jnp.zeros((B, gb)),
                jnp.zeros((B, LPC_ORDER)),
                jnp.full((B, K), MULAW_LEVELS // 2, jnp.int32))
        _, samples = jax.lax.scan(
            scan_step, init,
            (cond_up[:, starts].swapaxes(0, 1),
             lpc_up[:, starts].swapaxes(0, 1),
             gumbel, temp_up[:, starts].swapaxes(0, 1), detach))
        # [n_steps, B, K] -> [B, S]
        return samples.swapaxes(0, 1).reshape(B, S)

    @partial(jax.jit, static_argnames=("self",))
    def train_step(self, params, opt_state, features, signal, rng):
        loss, grads = jax.value_and_grad(
            lambda p: self._loss(p, features, signal, rng)
        )(params)
        return self._apply(params, opt_state, loss, grads)

    @partial(jax.jit, static_argnames=("self",))
    def train_step_sampled(self, params, opt_state, features, signal, rng):
        """train_step with the scheduled-sampling loss (bunch=1)."""
        loss, grads = jax.value_and_grad(
            lambda p: self._loss_sampled(p, features, signal, rng)
        )(params)
        return self._apply(params, opt_state, loss, grads)

    @partial(jax.jit, static_argnames=("self",))
    def train_step_freerun(self, params, opt_state, features, signal, rng):
        """train_step with the free-running STFT + CE-anchor loss."""
        loss, grads = jax.value_and_grad(
            lambda p: self._loss_freerun(p, features, signal, rng)
        )(params)
        return self._apply(params, opt_state, loss, grads)

    def _apply(self, params, opt_state, loss, grads):
        grads = dict(grads, gru_a_mask=jnp.zeros_like(grads["gru_a_mask"]))
        # Skip non-finite updates outright.  Clipping by scale alone is NOT
        # a safety net here: an inf gradient norm gives scale = 0 and
        # inf * 0 = NaN, which poisons every weight in one step (observed
        # live: the free-running fine-tune's backprop through the resonant
        # LPC synthesis filter overflowed at the phase transition and the
        # whole run went NaN from that epoch on).  A skipped batch costs
        # one step; a poisoned model costs the run.
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        if self.grad_clip > 0.0:
            scale = jnp.minimum(1.0, self.grad_clip / (gnorm + 1e-9))
            scale = jnp.where(finite, scale, 0.0)
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, new_opt_state = self.optimizer.update(
            grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = lambda old, new: jax.tree_util.tree_map(
            lambda a, b: jnp.where(finite, b, a), old, new)
        params = keep(params, new_params)
        opt_state = keep(opt_state, new_opt_state)
        # Keep pruned blocks at exactly zero.
        params = dict(params, gru_a_wh=params["gru_a_wh"] * params["gru_a_mask"])
        # loss is reported as-is (a skipped batch logs its non-finite loss).
        return params, opt_state, loss

    def sparsify(self, params, density: float, block=None):
        """Magnitude-prune GRU-A recurrent weights to ``density``; returns
        params with updated mask.

        Default block granularity is the Pallas sampler's [16, 128] compute
        tile (ops/pallas/sampler.py ROW_BLOCK x COL_BLOCK) so that every
        pruned block is a whole skippable tile: the sampler then streams and
        computes only ``density`` of the recurrent weights.  The reference
        LPCNet prunes 16x1 blocks (sized for ARM dot kernels); on TPU that
        granularity leaves every [16, 128] tile partially occupied, which
        zeroes weights without saving any bandwidth or FLOPs.  Pass
        ``block=(16, 1)`` for reference-compatible masks (dense compute)."""
        w = np.asarray(params["gru_a_wh"])
        H, G = w.shape
        if block is None:
            from ..ops.pallas.sampler import COL_BLOCK, ROW_BLOCK

            block = (ROW_BLOCK, COL_BLOCK)
            if H % ROW_BLOCK or G % COL_BLOCK:
                # Model too small for whole compute tiles — fall back to
                # reference 16x1 granularity (dense compute, zeroed weights).
                block = (min(16, H), 1)
        bh, bw = block
        blocks = w.reshape(H // bh, bh, G // bw, bw)
        mags = np.abs(blocks).sum(axis=(1, 3))
        k = max(1, int(round(density * mags.size)))
        threshold = np.partition(mags.ravel(), -k)[-k]
        keep = (mags >= threshold).astype(np.float32)
        mask = np.repeat(np.repeat(keep, bh, axis=0), bw, axis=1)
        return dict(params, gru_a_mask=jnp.asarray(mask),
                    gru_a_wh=params["gru_a_wh"] * jnp.asarray(mask))
