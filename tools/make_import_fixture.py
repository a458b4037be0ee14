"""Build an upstream-shaped LPCNet import fixture for the interop fast path.

Writes a Keras-layout ``.h5`` checkpoint at the released xiph-LPCNet sizes
(gru_a=384, gru_b=16, embed=128, cond=128, pitch embedding, MDense head
with per-channel inner biases — the exact feature set import_lpcnet_h5
maps; reference extensions/lpcnet/LPCNet.pyx:6-40 wraps such a model) and a
36-column ``.f32`` feature file (the ``lpcnet_demo -features`` format,
reference LPCNet.pyx:90-115), so the imported-checkpoint path can be driven
end to end without upstream assets:

    python tools/make_import_fixture.py            # /tmp/import_fixture/
    python tools/vocoder_ab.py /tmp/import_fixture/feats.f32 \
        --h5 /tmp/import_fixture/xiph_like.h5 --rtf

Weights are random (the rendering is noise); what this validates is the
format mapping and the kernel path/speed, which depend only on shapes.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def write_foreign_h5(path: str, gru_a: int = 384, gru_b: int = 16,
                     cond: int = 128, embed: int = 128,
                     pitch_dim: int = 64, seed: int = 0) -> None:
    import h5py

    rng = np.random.default_rng(seed)
    r = lambda *s: (rng.normal(size=s) * 0.15).astype(np.float32)
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")

        def put(layer, kind, arr):
            g = mw.require_group(layer).require_group(layer)
            g.create_dataset(f"{kind}:0", data=arr)

        put("embed_sig", "embeddings", r(256, embed))
        put("embed_pitch", "embeddings", r(256, pitch_dim))
        put("feature_conv1", "kernel", r(3, 20 + pitch_dim, cond))
        put("feature_conv1", "bias", r(cond))
        put("feature_conv2", "kernel", r(3, cond, cond))
        put("feature_conv2", "bias", r(cond))
        put("feature_dense1", "kernel", r(cond, cond))
        put("feature_dense1", "bias", r(cond))
        put("feature_dense2", "kernel", r(cond, cond))
        put("feature_dense2", "bias", r(cond))
        put("gru_a", "kernel", r(3 * embed + cond, 3 * gru_a))
        put("gru_a", "recurrent_kernel", r(gru_a, 3 * gru_a))
        put("gru_a", "bias", r(2, 3 * gru_a))
        put("gru_b", "kernel", r(gru_a + cond, 3 * gru_b))
        put("gru_b", "recurrent_kernel", r(gru_b, 3 * gru_b))
        put("gru_b", "bias", r(2, 3 * gru_b))
        put("dual_fc", "kernel", r(gru_b, 256, 2))
        put("dual_fc", "bias", r(256, 2))      # inner (pre-tanh) biases
        put("dual_fc", "factor", r(256, 2))


def write_feature_file(path: str, seconds: float = 3.0, seed: int = 1) -> None:
    """Encode synthetic speech-like audio into the 36-column .f32 format
    (columns 0..17 Bark cepstrum, 18-19 pitch period/correlation — the 20
    the decoder consumes — padded to NB_TOTAL_FEATURES=36 with zeros)."""
    from dss_tpu.vocoder.features import LPCFeatureEncoder

    rng = np.random.default_rng(seed)
    n = int(seconds * 16000)
    t = np.arange(n) / 16000.0
    f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = np.cumsum(2 * np.pi * f0 / 16000.0)
    sig = (0.4 * np.sin(phase) + 0.2 * np.sin(2 * phase)
           + 0.05 * rng.normal(size=n)).astype(np.float32)
    pcm = np.clip(sig * 12000.0, -32768, 32767).astype(np.int16)

    enc = LPCFeatureEncoder()
    feats = enc.compute_LPC_features(pcm)  # [N, 20]
    full = np.zeros((feats.shape[0], 36), np.float32)
    full[:, :20] = feats
    full.tofile(path)


def main() -> None:
    # Fixture generation is tiny; the tunneled TPU's minutes-long compiles
    # (and random device-read stalls) are pure downside here — force CPU.
    import jax

    jax.config.update("jax_platforms", "cpu")

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out-dir", default="/tmp/import_fixture")
    parser.add_argument("--seconds", type=float, default=3.0)
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    h5 = os.path.join(args.out_dir, "xiph_like.h5")
    f32 = os.path.join(args.out_dir, "feats.f32")
    write_foreign_h5(h5)
    write_feature_file(f32, seconds=args.seconds)

    from dss_tpu.vocoder.interop import import_lpcnet_h5

    params, model = import_lpcnet_h5(h5)
    assert "fc_out1_b" in params and "emb_pitch" in params
    n_frames = os.path.getsize(f32) // (36 * 4)
    print(f"wrote {h5} (gru_a={model.gru_a_units} gru_b={model.gru_b_units}, "
          f"MDense inner biases + pitch embedding)")
    print(f"wrote {f32} ({n_frames} frames, {n_frames * 0.01:.2f} s)")


if __name__ == "__main__":
    main()
