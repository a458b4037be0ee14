"""Fixtures for the closed-loop verify run (see .claude/skills/verify):
writes /tmp/verify_e2e/KeywordSynthesis_Overt_R01.mat (128-ch noise with a
loud 2.0-3.5 s burst + audio channel) and vad_threshold.npz, a hand-crafted
2-layer-LSTM checkpoint that behaves as a deterministic threshold VAD
(speech iff mean(feature) > -2.5), so the full online graph can be driven
without any training."""
import os
import sys
import numpy as np
from scipy.io import savemat

os.makedirs("/tmp/verify_e2e", exist_ok=True)

fs, seconds, burst = 1000, 6.0, (2.0, 3.5)
rng = np.random.default_rng(7)
T = int(seconds * fs)
envelope = np.full(T, 0.05)
envelope[int(burst[0] * fs):int(burst[1] * fs)] = 2.0
signal = rng.normal(size=(T, 129)) * envelope[:, None]
code = np.zeros(T, np.int16)
code[int(burst[0] * fs):int(burst[1] * fs)] = 1
savemat("/tmp/verify_e2e/KeywordSynthesis_Overt_R01.mat", {
    "signal": signal,
    "parameters": {
        "SamplingRate": {"NumericValue": fs},
        "SourceChGain": {"NumericValue": np.ones(129)},
        "Stimuli": {"Value": np.array([["Enter"]])},
    },
    "states": {"StimulusCode": code},
})

# Threshold VAD as a 2-layer LSTM(64->150) + classifier(150->2) state dict.
# Unit 0 of each layer carries tanh(s*(mean(x) - theta)); all gates forced
# open/closed by large biases so the cell is stateless; classifier maps the
# sign of unit 0 to the speech logit.
H, IN, s, theta = 150, 64, 10.0, -2.5
sd = {}
for layer, in_size in ((0, IN), (1, H)):
    w_ih = np.zeros((4 * H, in_size), np.float32)
    w_hh = np.zeros((4 * H, H), np.float32)
    b_ih = np.zeros(4 * H, np.float32)
    b_hh = np.zeros(4 * H, np.float32)
    b_ih[0:H] = 10.0        # i gate open
    b_ih[H:2 * H] = -10.0   # f gate closed (stateless)
    b_ih[3 * H:4 * H] = 10.0  # o gate open
    if layer == 0:
        w_ih[2 * H, :] = s / IN          # g gate, unit 0: s * mean(x)
        b_ih[2 * H] = -s * theta
    else:
        w_ih[2 * H, 0] = s               # pass through unit 0's sign
    sd[f"lstm.weight_ih_l{layer}"] = w_ih
    sd[f"lstm.weight_hh_l{layer}"] = w_hh
    sd[f"lstm.bias_ih_l{layer}"] = b_ih
    sd[f"lstm.bias_hh_l{layer}"] = b_hh
cls_w = np.zeros((2, H), np.float32)
cls_w[0, 0], cls_w[1, 0] = -5.0, 5.0
sd["classifier.weight"] = cls_w
sd["classifier.bias"] = np.zeros(2, np.float32)
np.savez("/tmp/verify_e2e/vad_threshold.npz", **sd)

# Sanity: run the jitted VAD on a synthetic feature ramp.
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
from dss_tpu.models import UnidirectionalVoiceActivityDetector
from dss_tpu.models.torch_port import load_checkpoint

vad = UnidirectionalVoiceActivityDetector(2, H, IN)
params = load_checkpoint("/tmp/verify_e2e/vad_threshold.npz", 2,
                         bidirectional=False, head_name="classifier")
x = np.full((1, 6, IN), -4.6, np.float32)
x[0, 2:4] = -0.9
logits, _ = vad.apply(params, x, vad.create_new_initial_state(1))
labels = np.argmax(np.asarray(logits), axis=-1)
print("labels:", labels, "(expect 0 0 1 1 0 0)")
assert labels.tolist() == [[0, 0, 1, 1, 0, 0]]
print("fixtures ok")
