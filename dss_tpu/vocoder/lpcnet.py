"""Public vocoder API matching the reference Cython binding surface.

Parity targets:
* ``LPCNet.synthesize(features[20]) -> int16[160]`` and ``reset_decoder()``
  (reference extensions/lpcnet/LPCNet.pyx:6-40);
* ``LPCFeatureFile`` iterator over ``.f32`` feature dumps
  (reference extensions/lpcnet/LPCNet.pyx:90-115);
* plus ``BatchedLPCNet`` — the TPU-native extension: N-way parallel
  autoregressive synthesis in a single compiled program (the reference's
  per-stream C loop cannot batch).

Backend selection: ``backend='dsp'`` (deterministic source-filter synthesis,
no weights needed — the default until trained weights are supplied) or
``backend='net'`` (neural sample-rate network; pass ``weights`` as a params
pytree or an ``.npz`` path saved by the vocoder trainer).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .dsp import LPCVocoder
from .lpc import FRAME_SIZE, NB_FEATURES
from .net import LPCNetModel, net_synthesize_frames, net_vocoder_init


def _load_params(weights):
    if weights is None:
        return None
    if isinstance(weights, (str,)) or hasattr(weights, "__fspath__"):
        loaded = dict(np.load(weights))
        return {k: jnp.asarray(v) for k, v in loaded.items()}
    return weights


def _resolve_use_pallas(use_pallas) -> bool:
    """None auto-selects the Pallas AR sampler on accelerator backends (it
    is ~4x faster than the XLA scan formulation at small batch); CPU keeps
    the scan path (the kernel would need the slow interpreter there)."""
    if use_pallas is None:
        import jax

        return jax.default_backend() != "cpu"
    return bool(use_pallas)


def _sparse_pattern_of(params, use_pallas: bool):
    """Static GRU-A tile keep-pattern when the trained mask is tile-sparse
    (Pallas path only; the pattern must be derived outside jit)."""
    if not use_pallas or params is None or "gru_a_mask" not in params:
        return None
    from ..ops.pallas.sampler import tile_sparse_pattern

    pattern, _kept = tile_sparse_pattern(np.asarray(params["gru_a_mask"]))
    return pattern


class LPCNet:
    """Single-stream vocoder with the reference's frame API."""

    LPCNET_FRAME_SIZE = FRAME_SIZE

    def __init__(self, backend: str = "dsp", weights=None,
                 model: Optional[LPCNetModel] = None, seed: int = 0,
                 use_pallas: Optional[bool] = None,
                 temperature_scale: float = 1.0,
                 quiet_sharpen: bool = False):
        if backend not in ("dsp", "net"):
            raise ValueError(f"Unknown vocoder backend: {backend}")
        self.backend = backend
        self.use_pallas = _resolve_use_pallas(use_pallas)
        self._seed = seed
        # Multiplies the pitch-correlation-derived sharpening (net backend;
        # xiph LPCNet exposes the analogous sampler knob). 1.0 = default.
        self.temperature_scale = float(temperature_scale)
        # Energy-gated quiet-frame sharpening (the online units' squelch,
        # vocoder/net.py QUIET_C0); off by default for offline scoring.
        self.quiet_sharpen = bool(quiet_sharpen)
        if backend == "dsp":
            self._dsp = LPCVocoder(seed=seed)
        else:
            self._params = _load_params(weights)
            if model is not None:
                self._model = model
            elif self._params is not None:
                # Infer the architecture (incl. bunch factor) from the
                # checkpoint so trained bunched models "just work".
                self._model = LPCNetModel.from_params(self._params)
            else:
                self._model = LPCNetModel()
            if self._params is None:
                import jax

                self._params = self._model.init(jax.random.PRNGKey(0))
            self._sparse = _sparse_pattern_of(self._params, self.use_pallas)
            self.reset_decoder()

    def reset_decoder(self) -> None:
        if self.backend == "dsp":
            self._dsp.reset_decoder()
        else:
            self._state = net_vocoder_init(self._model, batch=1, seed=self._seed)

    def synthesize(self, features: np.ndarray) -> np.ndarray:
        """features [20] float32 -> int16 [160] (10 ms @ 16 kHz)."""
        if self.backend == "dsp":
            return self._dsp.synthesize(features)
        pcm, self._state = net_synthesize_frames(
            self._model, self._params, self._state,
            jnp.asarray(features, jnp.float32).reshape(1, 1, NB_FEATURES),
            use_pallas=self.use_pallas, sparse_pattern=self._sparse,
            temperature_scale=self.temperature_scale,
            quiet_sharpen=self.quiet_sharpen,
        )
        return np.asarray(
            np.clip(np.asarray(pcm[0]) * 32767.0, -32768, 32767),
            dtype=np.int16,
        )

    def warm(self, n_frames: int) -> None:
        """Compile (and transfer-warm) the ``n_frames`` synthesis program
        without touching decoder state."""
        if self.backend == "dsp":
            from .dsp import dsp_synthesize_frames, dsp_vocoder_init

            pcm, _ = dsp_synthesize_frames(
                dsp_vocoder_init(self._seed),
                jnp.zeros((n_frames, NB_FEATURES), jnp.float32))
            np.asarray(pcm)
            return
        state = net_vocoder_init(self._model, batch=1, seed=self._seed)
        pcm, _ = net_synthesize_frames(
            self._model, self._params, state,
            jnp.zeros((1, n_frames, NB_FEATURES), jnp.float32),
            use_pallas=self.use_pallas, sparse_pattern=self._sparse,
            temperature_scale=self.temperature_scale,
            quiet_sharpen=self.quiet_sharpen,
        )
        np.asarray(pcm)

    def synthesize_frames(self, features: np.ndarray) -> np.ndarray:
        """features [T, 20] -> int16 [T*160]; one compiled call."""
        if self.backend == "dsp":
            return self._dsp.synthesize_frames(features)
        pcm, self._state = net_synthesize_frames(
            self._model, self._params, self._state,
            jnp.asarray(features, jnp.float32)[None],
            use_pallas=self.use_pallas, sparse_pattern=self._sparse,
            temperature_scale=self.temperature_scale,
            quiet_sharpen=self.quiet_sharpen,
        )
        return np.asarray(
            np.clip(np.asarray(pcm[0]) * 32767.0, -32768, 32767),
            dtype=np.int16,
        )


class BatchedLPCNet:
    """N-stream parallel vocoder: one compiled program advances all streams.

    This is the TPU answer to the reference's ``AsynchronousSynthesisQueue``
    (local/training.py:165-207, a CPU multiprocessing pool): batched
    autoregressive synthesis keeps the MXU busy with [N, .] matmuls instead
    of N independent scalar loops.
    """

    def __init__(self, batch: int, backend: str = "net", weights=None,
                 model: Optional[LPCNetModel] = None, seed: int = 0,
                 use_pallas: Optional[bool] = None,
                 temperature_scale: float = 1.0,
                 quiet_sharpen: bool = False):
        self.batch = batch
        self.backend = backend
        self.use_pallas = _resolve_use_pallas(use_pallas)
        self.temperature_scale = float(temperature_scale)
        self.quiet_sharpen = bool(quiet_sharpen)
        if backend == "dsp":
            self._states = [LPCVocoder(seed=seed + i) for i in range(batch)]
        else:
            self._params = _load_params(weights)
            if model is not None:
                self._model = model
            elif self._params is not None:
                self._model = LPCNetModel.from_params(self._params)
            else:
                self._model = LPCNetModel()
            if self._params is None:
                import jax

                self._params = self._model.init(jax.random.PRNGKey(0))
            self._sparse = _sparse_pattern_of(self._params, self.use_pallas)
            self._state = net_vocoder_init(self._model, batch=batch, seed=seed)

    def reset(self) -> None:
        if self.backend == "dsp":
            for s in self._states:
                s.reset_decoder()
        else:
            self._state = net_vocoder_init(self._model, batch=self.batch)

    def synthesize_frames(self, features: np.ndarray) -> np.ndarray:
        """features [N, T, 20] -> int16 [N, T*160]."""
        features = np.asarray(features, np.float32)
        assert features.shape[0] == self.batch
        if self.backend == "dsp":
            return np.stack([
                s.synthesize_frames(features[i])
                for i, s in enumerate(self._states)
            ])
        pcm, self._state = net_synthesize_frames(
            self._model, self._params, self._state, jnp.asarray(features),
            use_pallas=self.use_pallas, sparse_pattern=self._sparse,
            temperature_scale=self.temperature_scale,
            quiet_sharpen=self.quiet_sharpen,
        )
        return np.asarray(
            np.clip(np.asarray(pcm) * 32767.0, -32768, 32767), dtype=np.int16
        )


class LPCFeatureFile:
    """Iterate 20-of-36 features from an LPCNet ``.f32`` feature dump."""

    def __init__(self, filename: str, loop: bool = False,
                 nb_total_features: int = 36):
        raw = np.fromfile(filename, dtype=np.float32)
        self.features = raw.reshape((-1, nb_total_features))
        self.index = 0
        self.loop = loop

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self.index >= len(self.features):
            raise StopIteration
        features = self.features[self.index]
        self.index += 1
        if self.index == len(self.features) and self.loop:
            self.index = 0
        return features[:NB_FEATURES]
