"""Vocoder trainer tests: teacher-forced loss decreases, sparsification
produces the requested density, pruned weights stay zero."""

import chex
import numpy as np

import jax
import jax.numpy as jnp

from dss_tpu.train.trainer_vocoder import VocoderTrainer, prepare_utterance
from dss_tpu.vocoder import LPCNetModel
from dss_tpu.vocoder.lpc import FRAME_SIZE


def _tiny_model():
    return LPCNetModel(gru_a_units=32, gru_b_units=8, cond_dim=16,
                       embed_dim=16)


def test_prepare_utterance(rng):
    audio = (rng.normal(size=FRAME_SIZE * 7 + 50) * 5000).astype(np.int16)
    feats, sig = prepare_utterance(audio)
    assert feats.shape == (7, 20)
    assert sig.shape == (7 * FRAME_SIZE,)
    # Pre-emphasized domain: sig = x - 0.85 x[-1]
    x = audio.astype(np.float32)[:len(sig)] / 32768.0
    np.testing.assert_allclose(sig[1], x[1] - 0.85 * x[0], atol=1e-6)


def test_train_step_reduces_loss(rng):
    model = _tiny_model()
    trainer = VocoderTrainer(model, learning_rate=3e-3, noise_level=0)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    B, T = 4, 3
    feats = jnp.asarray(rng.normal(size=(B, T, 20)), jnp.float32) * 0.1
    # A simple periodic target signal.
    t = np.arange(T * FRAME_SIZE)
    sig = jnp.asarray(
        np.tile(0.3 * np.sin(2 * np.pi * t / 80), (B, 1)), jnp.float32
    )

    key = jax.random.PRNGKey(1)
    loss0 = float(trainer._loss(params, feats, sig, key))
    for _ in range(15):
        key, dk = jax.random.split(key)
        params, opt_state, loss = trainer.train_step(
            params, opt_state, feats, sig, dk)
    loss1 = float(trainer._loss(params, feats, sig, key))
    assert loss1 < loss0
    # Initial CE should be near log(256) for untrained uniform-ish logits.
    assert loss0 < np.log(256) * 2


def test_sparsify_density_and_zeroing(rng):
    model = _tiny_model()
    trainer = VocoderTrainer(model)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    params = trainer.sparsify(params, density=0.25, block=(8, 1))
    mask = np.asarray(params["gru_a_mask"])
    density = mask.mean()
    assert 0.2 <= density <= 0.3
    w = np.asarray(params["gru_a_wh"])
    assert np.all(w[mask == 0] == 0)

    # A train step must keep pruned blocks at zero.
    B, T = 2, 2
    feats = jnp.asarray(rng.normal(size=(B, T, 20)), jnp.float32) * 0.1
    sig = jnp.zeros((B, T * FRAME_SIZE), jnp.float32)
    params, _, _ = trainer.train_step(params, opt_state, feats, sig,
                                      jax.random.PRNGKey(2))
    w = np.asarray(params["gru_a_wh"])
    assert np.all(w[np.asarray(params["gru_a_mask"]) == 0] == 0)


def test_sparsify_default_is_tile_sparse():
    """Default pruning granularity must be the Pallas sampler's compute
    tile so the sparse kernel path activates on trained masks."""
    from dss_tpu.ops.pallas.sampler import tile_sparse_pattern

    model = LPCNetModel()  # full-size: gru_a=384 -> wh [384, 1152]
    trainer = VocoderTrainer(model)
    params, _ = trainer.init(jax.random.PRNGKey(0))
    params = trainer.sparsify(params, density=0.2)
    mask = np.asarray(params["gru_a_mask"])
    pattern, kept = tile_sparse_pattern(mask)
    assert pattern is not None
    assert abs(kept - 0.2) < 0.05
    assert abs(mask.mean() - 0.2) < 0.05


def test_sparsify_tiny_model_falls_back():
    """Non-tile-divisible models prune at reference 16x1 granularity."""
    model = _tiny_model()  # wh [32, 96]: not COL_BLOCK-divisible
    trainer = VocoderTrainer(model)
    params, _ = trainer.init(jax.random.PRNGKey(0))
    params = trainer.sparsify(params, density=0.25)
    mask = np.asarray(params["gru_a_mask"])
    assert 0.2 <= mask.mean() <= 0.3


def test_train_vocoder_cli_resume(tmp_path, monkeypatch):
    """apps/train_vocoder.py --resume continues from train_state.pkl with
    the saved epoch counter (same contract as the other trainers)."""
    import sys

    from scipy.io.wavfile import write as wavwrite

    sys.path.insert(0, str(
        __import__("pathlib").Path(__file__).resolve().parent.parent / "apps"))
    import train_vocoder

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=16000) * 3000).astype(np.int16)
    wavwrite(wav_dir / "utt.wav", 16000, audio)
    out = tmp_path / "out"

    def run(args):
        monkeypatch.setattr(sys, "argv", ["train_vocoder.py", str(wav_dir),
                                          str(out), "--batch", "2",
                                          "--chunk-frames", "4",
                                          "--density", "1.0"] + args)
        train_vocoder.main()

    from dss_tpu.train.checkpoints import load_train_state

    run(["--epochs", "1"])
    assert (out / "vocoder.npz").exists()
    _, _, extra = load_train_state(str(out / "train_state.pkl"))
    assert extra["epoch"] == 1

    # Resume continues the epoch counter instead of restarting at 0
    # (logging is swallowed by pytest's root logger, so assert on the
    # persisted state).
    run(["--epochs", "2", "--resume"])
    params, opt_state, extra = load_train_state(str(out / "train_state.pkl"))
    assert extra["epoch"] == 2
    assert "gru_a_wh" in params


def test_noise_recursion_matches_sampler_feedback(rng):
    """The teacher-forcing construction must mirror the sampler's AR loop:
    with noise_level=0 the propagated reconstruction equals the clean signal
    up to mu-law quantization of each step's excitation, and the CE target
    is the excitation of that SAME recursion (so with noise>0 the target is
    the correcting excitation, not the clean-history one)."""
    from dss_tpu.vocoder.lpc import LPC_ORDER, lpc_from_bands, \
        bands_from_cepstrum
    from dss_tpu.vocoder.mulaw import MULAW_LEVELS, mulaw_decode, mulaw_encode

    B, T = 2, 3
    S = T * FRAME_SIZE
    feats = jnp.asarray(rng.normal(size=(B, T, 20)), jnp.float32) * 0.1
    t = np.arange(S)
    sig = jnp.asarray(np.stack([0.3 * np.sin(2 * np.pi * t / 80),
                                0.2 * np.sin(2 * np.pi * t / 120)]),
                      jnp.float32)

    bands = bands_from_cepstrum(feats[..., :18])
    lpc, _ = jax.vmap(jax.vmap(lpc_from_bands))(bands)
    lpc_up = jnp.repeat(lpc, FRAME_SIZE, axis=1)

    # Replay the trainer's recursion at noise 0 in pure numpy.
    sig_np, lpc_np = np.asarray(sig), np.asarray(lpc_up)
    hist = np.zeros((B, LPC_ORDER), np.float64)
    rec = np.zeros((B, S))
    for i in range(S):
        pred = -np.sum(hist * lpc_np[:, i], axis=-1)
        e_idx = np.asarray(mulaw_encode(
            jnp.asarray(np.clip(sig_np[:, i] - pred, -1.0, 1.0))))
        rec[:, i] = np.clip(
            pred + np.asarray(mulaw_decode(jnp.asarray(e_idx))), -1.0, 1.0)
        hist = np.concatenate([rec[:, i:i + 1], hist[:, :-1]], axis=1)
    # Quantization error of one mu-law step near these amplitudes is small;
    # the recursion must track the clean signal, not drift.
    assert np.max(np.abs(rec - sig_np)) < 0.05
    assert np.mean(np.abs(rec - sig_np)) < 0.01


def test_sampled_noise_train_step(rng):
    """Scheduled-sampling loss: runs, finite, and trains (loss decreases
    over a few steps on a deterministic target)."""
    model = _tiny_model()
    trainer = VocoderTrainer(model, learning_rate=3e-3, noise_level=0)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    B, T = 4, 3
    feats = jnp.asarray(rng.normal(size=(B, T, 20)), jnp.float32) * 0.1
    t = np.arange(T * FRAME_SIZE)
    sig = jnp.asarray(
        np.tile(0.3 * np.sin(2 * np.pi * t / 80), (B, 1)), jnp.float32)

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(8):
        key, dk = jax.random.split(key)
        params, opt_state, loss = trainer.train_step_sampled(
            params, opt_state, feats, sig, dk)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_freerun_train_step(rng):
    """Free-running STFT fine-tune loss: runs, finite, gradients reach the
    GRU weights, and the loss decreases over a few steps on a
    deterministic target."""
    model = _tiny_model()
    trainer = VocoderTrainer(model, learning_rate=3e-3, stft_weight=2.0)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    B, T = 4, 3
    feats = jnp.asarray(rng.normal(size=(B, T, 20)), jnp.float32) * 0.1
    t = np.arange(T * FRAME_SIZE)
    sig = jnp.asarray(
        np.tile(0.3 * np.sin(2 * np.pi * t / 80), (B, 1)), jnp.float32)

    before = {k: np.asarray(v) for k, v in params.items()}
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(8):
        key, dk = jax.random.split(key)
        params, opt_state, loss = trainer.train_step_freerun(
            params, opt_state, feats, sig, dk)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # The rollout gradient path must reach the recurrent weights.
    for k in ("gru_a_wh", "gru_b_wh", "fc_out1_w"):
        assert np.abs(np.asarray(params[k]) - before[k]).max() > 0


def test_nonfinite_gradients_skip_update(rng):
    """An inf/NaN gradient batch must leave params and optimizer state
    untouched (observed live: backprop through the resonant LPC filter in
    the free-running fine-tune overflowed; clip-by-scale turned inf * 0
    into NaN and poisoned the whole run from that epoch on)."""
    model = _tiny_model()
    trainer = VocoderTrainer(model, grad_clip=1.0)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    for bad in (jnp.inf, jnp.nan):
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        grads["gru_a_wx"] = grads["gru_a_wx"].at[0, 0].set(bad)
        new_params, new_opt, _ = trainer._apply(
            params, opt_state, jnp.float32(1.0), grads)
        for k in params:
            np.testing.assert_array_equal(np.asarray(new_params[k]),
                                          np.asarray(params[k]), err_msg=k)
        chex.assert_trees_all_equal(new_opt, opt_state)


def test_finite_gradients_still_update(rng):
    model = _tiny_model()
    trainer = VocoderTrainer(model, grad_clip=1.0)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    new_params, _, _ = trainer._apply(
        params, opt_state, jnp.float32(1.0), grads)
    assert not np.allclose(np.asarray(new_params["gru_a_wx"]),
                           np.asarray(params["gru_a_wx"]))


def test_init_weights_inherits_pruned_mask(tmp_path):
    """--init-weights from an already-pruned checkpoint must keep the
    checkpoint's mask fixed instead of restarting the prune ramp from
    100% density: re-sparsifying at mid-ramp densities admits zeroed
    tiles back into the mask (they regrow), and the ramp's density —
    not the mask's — mis-gated best-by-validation until the ramp caught
    up (observed live: a freerun fine-tune scored a new best at epoch 5
    but saved nothing because the schedule still reported 1.00)."""
    import subprocess
    import sys
    from pathlib import Path

    from scipy.io.wavfile import write as wavwrite

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=12800) * 3000).astype(np.int16)
    wavwrite(wav_dir / "utt.wav", 16000, audio)

    app = Path(__file__).resolve().parent.parent / "apps" / "train_vocoder.py"

    def run(out, args):
        # Subprocess on purpose — see the sibling ramp test below.
        r = subprocess.run(
            [sys.executable, str(app), str(wav_dir), str(out),
             "--batch", "2", "--chunk-frames", "4", "--platform", "cpu"]
            + args,
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        return (out / "training.log").read_text()

    # Stage 1: a short pruned run (2 epochs => the ramp completes).
    run(tmp_path / "a", ["--epochs", "2", "--density", "0.5"])
    mask_in = np.load(tmp_path / "a" / "vocoder.npz")["gru_a_mask"]
    assert 0 < mask_in.mean() <= 0.5 + 1e-6

    # Stage 2: fine-tune from it.  5 epochs puts prune_start at epoch 1,
    # which without inheritance would re-sparsify at ~0.9 density.
    log_text = run(tmp_path / "b", ["--epochs", "5", "--density", "0.5",
                                    "--init-weights",
                                    str(tmp_path / "a" / "vocoder.npz")])
    assert "pruning disabled, mask inherited" in log_text
    mask_out = np.load(tmp_path / "b" / "vocoder.npz")["gru_a_mask"]
    np.testing.assert_array_equal(mask_out, mask_in)


def test_freerun_train_step_bunched(rng):
    """The free-running fine-tune must also work for bunched models,
    rolling out with bunch_step semantics: finite loss, decreasing over
    a few steps, gradients reaching the recurrent weights AND the
    bunch-specific heads/correction embeddings."""
    model = LPCNetModel(gru_a_units=32, gru_b_units=8, cond_dim=16,
                        embed_dim=16, bunch=2)
    trainer = VocoderTrainer(model, learning_rate=3e-3, stft_weight=2.0,
                             grad_clip=1.0, rollout_detach=160)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    B, T = 4, 3
    feats = jnp.asarray(rng.normal(size=(B, T, 20)), jnp.float32) * 0.1
    t = np.arange(T * FRAME_SIZE)
    sig = jnp.asarray(
        np.tile(0.3 * np.sin(2 * np.pi * t / 80), (B, 1)), jnp.float32)

    before = {k: np.asarray(v) for k, v in params.items()}
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(8):
        key, dk = jax.random.split(key)
        params, opt_state, loss = trainer.train_step_freerun(
            params, opt_state, feats, sig, dk)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    for k in ("gru_a_wh", "gru_b_wh", "fc_out1_w", "fc_out1_w_b1",
              "bunch_exc_emb_b1", "emb_sig_l1"):
        assert np.abs(np.asarray(params[k]) - before[k]).max() > 0, k


def test_init_weights_partial_mask_ramps_from_checkpoint_density(
        tmp_path):
    """--init-weights from a PARTIALLY pruned checkpoint (denser than the
    target, e.g. a stage-1 best captured mid-recovery-window at 0.25)
    must ramp from ITS density down to the target — a ramp restarted
    from 1.0 re-admits zeroed tiles (regrowth) and spends most of the
    run above the best-by-validation density gate (observed live: a
    160-epoch fine-tune whose 2.73 dB epoch-65 score was rejected
    because the from-1.0 ramp sat at 0.55)."""
    import subprocess
    import sys
    from pathlib import Path

    from scipy.io.wavfile import write as wavwrite

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=12800) * 3000).astype(np.int16)
    wavwrite(wav_dir / "utt.wav", 16000, audio)

    app = Path(__file__).resolve().parent.parent / "apps" / "train_vocoder.py"

    def run(out, args):
        # Subprocess on purpose: in-process, this test is the ~Nth fresh
        # compile of the vocoder train step in one long pytest process and
        # XLA's CPU compiler segfaulted there reproducibly (full-suite runs
        # only; isolation always passed).  A fresh process also matches how
        # the staged CLI is actually used.
        r = subprocess.run(
            [sys.executable, str(app), str(wav_dir), str(out),
             "--batch", "2", "--chunk-frames", "4", "--platform", "cpu"]
            + args,
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        return (out / "training.log").read_text()

    # Stage 1: prune to 0.5 — denser than stage 2's 0.25 target.
    run(tmp_path / "a", ["--epochs", "2", "--density", "0.5"])
    mask_in = np.load(tmp_path / "a" / "vocoder.npz")["gru_a_mask"]
    d_in = mask_in.mean()
    assert 0 < d_in <= 0.5 + 1e-6

    # Stage 2 with a lower target: the ramp must start at the
    # checkpoint's density (never above), and end at the new target.
    log_text = run(tmp_path / "b", ["--epochs", "5", "--density", "0.25",
                                    "--init-weights",
                                    str(tmp_path / "a" / "vocoder.npz")])
    assert "prune ramp starts at the checkpoint density" in log_text
    for msg in log_text.splitlines():
        if "GRU-A density" in msg:
            d = float(msg.split("GRU-A density ")[1].rstrip(")"))
            assert d <= d_in + 1e-2, f"ramp exceeded checkpoint density: {msg}"
    mask_out = np.load(tmp_path / "b" / "vocoder.npz")["gru_a_mask"]
    assert mask_out.mean() <= 0.25 + 1e-3
    # No regrowth: the final mask is a subset of the checkpoint mask.
    assert np.all(mask_out <= mask_in + 1e-6)
