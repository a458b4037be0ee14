"""Streaming graph units for the online speech neuroprosthesis.

Parity target: reference local/units.py — same unit roster, message
contracts, log-file formats, and latency bookkeeping:

* ``ZMQConnector``       — BCI2000 GenericSignal ZMQ SUB ingest (:39-89)
* ``HighGammaActivity``  — feature front-end unit (:97-207)
* ``BinaryLogger``       — raw ``tobytes`` binary logs (:212-270)
* ``VoiceActivityDetectionLogger`` — ``.lab`` segment log (:273-319)
* ``DelayedWavLogger``   — per-segment ``reco_%05d.wav`` (:322-364)
* ``FilterSpeechSegments`` — nVAD gate + smoothing + segment history (:369-447)
* ``RecurrentNeuralDecodingModel`` — per-segment bidirectional decode (:450-508)
* ``DelayedLPCNetVocoder`` — vocoder unit (:513-538)
* ``DelayedStdoutForSoX``  — int16 PCM on stdout for SoX playback (:543-552)

TPU design: every unit's math is a jitted device program with explicit
carried state; shapes are bucketed (fixed packet size for the front-end and
VAD; segment lengths padded to multiples of 50 with masked LSTM state
propagation, which yields bit-identical results to unpadded processing), so
the closed loop never recompiles after warm-up.
"""

from __future__ import annotations

import logging
import os
import struct
import sys
import time
from dataclasses import replace
from pathlib import Path
from typing import Any, AsyncGenerator, Callable, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.torch_port import load_checkpoint
from ..ops.hga import HighGammaExtractor
from ..ops.ringbuffer import SpeechSegmentHistory, VoiceActivityDetectionSmoothing
from ..utils.audio import write_wav
from .graph import InputStream, OutputStream, Settings, Unit, \
    coalescing, publisher, subscriber
from .messages import ClosedLoopMessage, TimeSeriesMessage

logger = logging.getLogger("dss_tpu.runtime.units")

Transforms = Optional[List[Callable]]

BCI2000_HEADER = struct.Struct("=BBB HH")
BCI2000_TOPIC = struct.Struct("=BBB").pack(4, 1, 2)


def _with_stamps(msg, extra, **kw):
    """``replace(msg, **kw)`` plus appended latency stamps (closed-loop
    messages only; see ClosedLoopMessage.stamps).  ``extra`` is an iterable
    of (stage_name, wall_time) pairs."""
    if isinstance(msg, ClosedLoopMessage):
        kw["stamps"] = getattr(msg, "stamps", ()) + tuple(extra)
    return replace(msg, **kw)


def _anonymize(msg, **kw):
    """``replace(msg, **kw)`` with latency bookkeeping stripped: used for
    the non-first audio chunks of a word (and the whole-word wav tap) so
    the audio sink does not count them as fresh word latencies."""
    if isinstance(msg, ClosedLoopMessage):
        kw.setdefault("received_at", None)
        kw.setdefault("stamps", ())
    return replace(msg, **kw)


def interpret_bci2000_packet(data: bytes) -> np.ndarray:
    """GenericSignal packet -> float64 [samples, channels] array.

    Uses the native single-pass codec (dss_tpu.native) when built; the
    fallback inside ``unpack_packet`` reproduces the reference's
    struct/transpose path (local/units.py:78-82).
    """
    from ..native import unpack_packet

    return unpack_packet(data)


# region BCI2000 -> ZMQ connector
class ZMQConnectorSettings(Settings):
    fs: int
    port: int = 5556
    address: str = "localhost"
    # End the stream after this many seconds without packets (None = never;
    # the replay/integration harness uses a finite value for clean exits).
    idle_timeout: Optional[float] = None


class ZMQConnector(Unit):
    """SUB socket on the BCI2000 GenericSignal topic with drop-old semantics
    (RCVHWM=1), stamping ingest wall-clock time on each message."""

    SETTINGS: ZMQConnectorSettings

    OUTPUT = OutputStream(ClosedLoopMessage)

    def initialize(self) -> None:
        import zmq
        import zmq.asyncio

        self._context = zmq.asyncio.Context()
        self._socket = self._context.socket(zmq.SUB)
        self._socket.setsockopt(zmq.RCVHWM, 1)
        address = f"tcp://{self.SETTINGS.address}:{self.SETTINGS.port}"
        self._socket.connect(address)
        self._socket.subscribe(BCI2000_TOPIC)

    def shutdown(self) -> None:
        self._socket.close()
        self._context.destroy()

    @publisher(OUTPUT)
    async def process(self) -> AsyncGenerator:
        import asyncio

        while not self._socket.closed:
            if self.SETTINGS.idle_timeout is not None:
                try:
                    data = await asyncio.wait_for(
                        self._socket.recv(), timeout=self.SETTINGS.idle_timeout
                    )
                except asyncio.TimeoutError:
                    logger.info("ZMQConnector idle timeout — ending stream.")
                    return
            else:
                data = await self._socket.recv()
            array = interpret_bci2000_packet(data)
            yield self.OUTPUT, ClosedLoopMessage(
                data=array, fs=self.SETTINGS.fs, received_at=time.time()
            )
# endregion


# region Feature extraction
class HighGammaActivitySettings(Settings):
    fs: int
    nb_electrodes: int
    window_length: float = 0.05
    window_shift: float = 0.01
    l_freq: int = 70
    h_freq: int = 170
    pre_transforms: Transforms = None
    post_transforms: Transforms = None
    # When set, packets of exactly this many samples run through the single
    # fully-jitted packet step (zero recompiles, minimal latency).
    package_size: Optional[int] = None
    # Channel count of incoming packets (BCI2000 exports carry 128 ECoG
    # channels + 1 audio channel = 129). When both package_size and
    # raw_channels are known, the packet program compiles at initialization
    # instead of on the first live packet.
    raw_channels: Optional[int] = None


class HighGammaActivity(Unit):
    SETTINGS: HighGammaActivitySettings

    # Bounded: when this unit falls behind (slow device round trips),
    # backpressure reaches the ZMQ ingest and the socket's drop-old
    # HWM sheds stale packets — latency stays bounded under overload.
    INPUT = InputStream(TimeSeriesMessage, maxsize=8)
    OUTPUT = OutputStream(TimeSeriesMessage)

    def initialize(self) -> None:
        s = self.SETTINGS
        self._extractor = HighGammaExtractor(
            fs=s.fs, nb_electrodes=s.nb_electrodes,
            window_length=s.window_length, window_shift=s.window_shift,
            l_freq=s.l_freq, h_freq=s.h_freq,
            pre_transforms=s.pre_transforms, post_transforms=s.post_transforms,
        )
        self._state = self._extractor.init_state()
        self._first = True
        from concurrent.futures import ThreadPoolExecutor

        self._executor = ThreadPoolExecutor(max_workers=1)
        if s.package_size is not None and s.raw_channels is not None:
            # Warm up the packet program NOW so the first real packet isn't
            # stuck behind a multi-second XLA compile (packets would be
            # dropped by the ingest's HWM=1 while compiling). Sync via a
            # host transfer, not block_until_ready: the live path does a
            # device->host read each packet and some remote backends only
            # pay (and warm) the transfer channel on an actual read.
            dummy = jnp.zeros((s.package_size, s.raw_channels), jnp.float32)
            feats, _ = self._extractor.packet_step(
                self._extractor.init_state(), dummy
            )
            np.asarray(feats)

    def shutdown(self) -> None:
        self._executor.shutdown(wait=True)

    def _packet_features(self, data: np.ndarray) -> np.ndarray:
        # Host-side f64->f32 cast: a device-side cast would compile on
        # the first live packet (stream-time event-loop freeze).
        feats, self._state = self._extractor.packet_step(
            self._state, jnp.asarray(np.asarray(data, np.float32))
        )
        return np.asarray(feats)

    @subscriber(INPUT)
    @publisher(OUTPUT)
    async def process(self, msg: TimeSeriesMessage) -> AsyncGenerator:
        import asyncio

        s = self.SETTINGS
        if s.package_size is not None and msg.data.shape[0] == s.package_size:
            # Device dispatch + readback run OFF the event loop: a stalled
            # device round trip (remote/tunneled backends can block for
            # seconds) must never freeze packet ingest. One worker keeps
            # the carried filter state strictly ordered.
            feats = await asyncio.get_running_loop().run_in_executor(
                self._executor, self._packet_features, msg.data
            )
            if self._first:
                feats = feats[self._extractor.warmup_frames(s.package_size):]
                self._first = False
        else:
            feats = await asyncio.get_running_loop().run_in_executor(
                self._executor, self._extractor.extract_features, msg.data
            )
        # float64 on the wire: downstream binary logs are .f64 by contract
        # (reference decode_online.py:135 log.hga.f64).
        feats = np.asarray(feats, np.float64)
        yield self.OUTPUT, replace(msg, data=feats, fs=1 / s.window_shift)
# endregion


# region Logging units
class LoggerSettings(Settings):
    filename: str
    overwrite: bool
    config_filename: Optional[str] = None


class BinaryLogger(Unit):
    """Append each message's raw ``data.tobytes()`` to a binary log.

    Restore with ``np.fromfile(path, dtype=...).reshape((-1, C))``.
    """

    SETTINGS: LoggerSettings
    INPUT = InputStream(TimeSeriesMessage)

    def initialize(self) -> None:
        filename = os.path.abspath(self.SETTINGS.filename)
        extension = os.path.basename(filename).split(".")[-1]
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        if os.path.isfile(filename) and not self.SETTINGS.overwrite:
            raise PermissionError(
                f"The specified .{extension} file already exists and "
                f"overwrite is disabled."
            )
        self._fd = open(filename, mode="wb")

    def shutdown(self) -> None:
        self._fd.flush()
        self._fd.close()

    @subscriber(INPUT)
    async def write(self, message: TimeSeriesMessage) -> None:
        self._fd.write(np.asarray(message.data).tobytes())


class VoiceActivityDetectionLogger(Unit):
    """``.lab`` rows ``start<TAB>stop<TAB>"N frames"`` per speech segment,
    positioned by the cumulative frame counter (10 ms frames)."""

    SETTINGS: LoggerSettings
    INPUT = InputStream(ClosedLoopMessage)

    def initialize(self) -> None:
        filename = os.path.abspath(self.SETTINGS.filename)
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        if os.path.isfile(filename) and not self.SETTINGS.overwrite:
            raise PermissionError(
                "The specified .lab file already exists and overwrite is "
                "disabled."
            )
        self._fd = open(filename, mode="w")

    def shutdown(self) -> None:
        self._fd.flush()
        self._fd.close()

    @subscriber(INPUT)
    async def write(self, message: ClosedLoopMessage) -> None:
        start = message.previous_frames * 0.01
        stop = (message.previous_frames + len(message.data)) * 0.01
        self._fd.write(f"{start:.02f}\t{stop:.02f}\t{len(message.data)} frames\n")


class DelayedWavLoggerSettings(Settings):
    base_path: Path
    overwrite: bool
    prefix: Optional[str] = None


class DelayedWavLogger(Unit):
    """Save each synthesized segment as ``{prefix}_{counter:05d}.wav``."""

    SETTINGS: DelayedWavLoggerSettings
    INPUT = InputStream(TimeSeriesMessage)

    def initialize(self) -> None:
        os.makedirs(self.SETTINGS.base_path, exist_ok=True)
        self._counter = 1

    @subscriber(INPUT)
    async def write(self, message: TimeSeriesMessage) -> None:
        prefix = self.SETTINGS.prefix or ""
        filename = os.path.join(
            Path(self.SETTINGS.base_path).as_posix(),
            f"{prefix}_{self._counter:05d}.wav",
        )
        self._counter += 1
        if not (os.path.isfile(filename) and not self.SETTINGS.overwrite):
            write_wav(filename, np.asarray(message.data), fs=16000)
# endregion


# region Neural VAD and speech decoding units
class FilterSpeechSegmentsSettings(Settings):
    nb_features: int
    fs: int
    vad_architecture: Any
    buffer_size: int
    context_frames: int = 0
    vad_weights_path: Optional[Path] = None
    vad_parameters: Optional[dict] = None


class FilterSpeechSegments(Unit):
    """nVAD gate: per-packet LSTM inference with carried (h, c), label
    smoothing, and segment assembly; emits completed speech segments with
    ``previous_frames`` set for downstream alignment."""

    SETTINGS: FilterSpeechSegmentsSettings
    # Bounded: when this unit falls behind (slow device round trips),
    # backpressure reaches the ZMQ ingest and the socket's drop-old
    # HWM sheds stale packets — latency stays bounded under overload.
    INPUT = InputStream(ClosedLoopMessage, maxsize=8)
    OUTPUT = OutputStream(ClosedLoopMessage)

    def initialize(self) -> None:
        s = self.SETTINGS
        self._history = SpeechSegmentHistory(
            nb_features=s.nb_features, buffer_size=s.buffer_size,
            context=s.context_frames,
        )
        self._smoothing = VoiceActivityDetectionSmoothing(
            nb_features=s.nb_features, context_frames=5
        )
        params = s.vad_parameters or {}
        self._model = s.vad_architecture(**params)
        if s.vad_weights_path is not None:
            self._params = load_checkpoint(
                Path(s.vad_weights_path).as_posix(), self._model.nb_layer,
                bidirectional=False, head_name="classifier",
            )
        else:
            import jax

            self._params = self._model.init(jax.random.PRNGKey(0))
        self._state = self._model.create_new_initial_state(batch_size=1)
        self._frame_counter = 0

        import jax

        # argmax lives INSIDE the jit: a bare jnp.argmax on the host path
        # would compile its own tiny program on the first live packet and
        # freeze the event loop mid-stream (ingest drops packets meanwhile).
        def _forward(p, x, st):
            logits, st = self._model.apply(p, x, st)
            return jnp.argmax(logits, axis=2), st

        self._infer = jax.jit(_forward)
        # Warm both per-packet shapes (warm-start first packet emits fewer
        # frames than the steady state) so live packets never hit a compile.
        # Sync via host transfer — the live path reads labels back each
        # packet, and block_until_ready does not warm the transfer channel
        # on some remote backends.
        for frames in (1, 4):
            labels, _ = self._infer(
                self._params,
                jnp.zeros((1, frames, s.nb_features), jnp.float32),
                self._model.create_new_initial_state(batch_size=1),
            )
            np.asarray(labels)
        from concurrent.futures import ThreadPoolExecutor

        self._executor = ThreadPoolExecutor(max_workers=1)

    def shutdown(self) -> None:
        self._executor.shutdown(wait=True)

    def _vad_labels(self, data: np.ndarray) -> np.ndarray:
        # dtype conversion on the HOST: a device-side f64->f32 cast would
        # compile a convert_element_type program on the first live packet.
        x = jnp.asarray(np.asarray(data, np.float32)[None])
        labels, self._state = self._infer(self._params, x, self._state)
        out = np.asarray(labels).ravel()
        self._t_device_done = time.time()
        return out

    @subscriber(INPUT)
    @publisher(OUTPUT)
    async def process(self, msg: ClosedLoopMessage) -> AsyncGenerator:
        import asyncio

        t_dispatch = time.time()
        # Device work off the event loop (see HighGammaActivity.process).
        predictions = await asyncio.get_running_loop().run_in_executor(
            self._executor, self._vad_labels, msg.data
        )

        data, predictions = self._smoothing.insert(
            data=np.asarray(msg.data), speech_labels=predictions
        )
        speech_segments = self._history.insert(data=data,
                                               speech_labels=predictions)

        self._frame_counter += len(msg.data)
        for segment in speech_segments:
            previous_frames = (
                self._frame_counter - len(segment)
                - (len(msg.data) - int(np.count_nonzero(predictions)))
            )
            yield self.OUTPUT, _with_stamps(
                msg,
                (("vad_dispatch", t_dispatch),
                 ("vad_device_done", self._t_device_done),
                 ("seg_close", time.time())),
                data=segment, fs=100, previous_frames=previous_frames,
            )


class FusedFrontendVadSettings(Settings):
    """Settings for the fused packet path (front-end + nVAD in ONE device
    program — no reference counterpart; halves per-packet dispatches)."""

    nb_features: int
    fs: int
    buffer_size: int
    context_frames: int = 0
    window_length: float = 0.05
    window_shift: float = 0.01
    pre_transforms: Transforms = None
    post_transforms: Transforms = None
    package_size: int = 40
    raw_channels: int = 129
    vad_architecture: Any = None
    vad_weights_path: Optional[Path] = None
    vad_parameters: Optional[dict] = None
    # Backlog-drain batch sizes (in packets) pre-compiled in the background
    # at startup; see ``process``.  () disables coalescing.
    coalesce_packets: Tuple[int, ...] = (2, 4, 8)


class FusedFrontendVad(Unit):
    """Packet -> features -> VAD logits in a single jitted dispatch.

    Functionally identical to HighGammaActivity + FilterSpeechSegments in
    series (same carried states, same smoothing/segment assembly on the
    host), but the per-packet critical path costs one device round trip
    instead of two.  Publishes the feature stream on FEATURES (for the
    log.hga tap) and completed speech segments on OUTPUT.

    Backlog coalescing: when the per-packet device round trip exceeds the
    packet period (a tunneled backend's ~30-50 ms RPC vs the 40 ms packet
    budget), a one-packet-at-a-time consumer builds an O(queue-bound)
    backlog — measured 481 ms p50 ingest->dispatch wait plus drop-old
    packet shedding in exactly that regime.  The subscriber therefore
    drains whatever packets are already queued (graph.coalescing) and
    processes them in ONE device call (the filter scan, framer carry, and
    VAD recurrence are streaming-equivalent over concatenation), bounding
    queue wait near one in-flight round trip regardless of RPC jitter.
    Batch shapes compile in the background at startup; un-warmed sizes
    never compile at stream time (greedy largest-warmed-first split).
    """

    SETTINGS: FusedFrontendVadSettings
    # Bounded: when this unit falls behind (slow device round trips),
    # backpressure reaches the ZMQ ingest and the socket's drop-old
    # HWM sheds stale packets — latency stays bounded under overload.
    INPUT = InputStream(ClosedLoopMessage, maxsize=8)
    FEATURES = OutputStream(ClosedLoopMessage)
    OUTPUT = OutputStream(ClosedLoopMessage)

    def initialize(self) -> None:
        import jax

        s = self.SETTINGS
        self._extractor = HighGammaExtractor(
            fs=s.fs, nb_electrodes=s.nb_features,
            window_length=s.window_length, window_shift=s.window_shift,
            pre_transforms=s.pre_transforms, post_transforms=s.post_transforms,
        )
        params = s.vad_parameters or {}
        self._model = s.vad_architecture(**params)
        if s.vad_weights_path is not None:
            self._params = load_checkpoint(
                Path(s.vad_weights_path).as_posix(), self._model.nb_layer,
                bidirectional=False, head_name="classifier",
            )
        else:
            self._params = self._model.init(jax.random.PRNGKey(0))

        self._history = SpeechSegmentHistory(
            nb_features=s.nb_features, buffer_size=s.buffer_size,
            context=s.context_frames,
        )
        self._smoothing = VoiceActivityDetectionSmoothing(
            nb_features=s.nb_features, context_frames=5
        )
        self._frame_counter = 0
        self._first = True

        extractor = self._extractor
        model = self._model
        params = self._params

        @jax.jit
        def packet_path(fe_state, vad_state, packet):
            feats, fe_state = extractor.packet_step(fe_state, packet)
            logits, vad_state = model.apply(params, feats[None], vad_state)
            labels = jnp.argmax(logits, axis=-1)[0]
            # Pack features + labels into ONE output array: the host needs
            # both every packet, and each separate device->host read is a
            # full round trip (~30 ms on a tunneled backend — two reads
            # blew the 40 ms packet budget on their own).
            packed = jnp.concatenate(
                [feats, labels[:, None].astype(feats.dtype)], axis=1)
            return fe_state, vad_state, packed

        self._packet_path = packet_path
        self._fe_state = extractor.init_state()
        self._vad_state = model.create_new_initial_state(batch_size=1)

        # Warm up both shapes used live; sync via host transfer (the live
        # path reads back every packet — see HighGammaActivity).
        dummy = jnp.zeros((s.package_size, s.raw_channels), jnp.float32)
        out = packet_path(extractor.init_state(),
                          model.create_new_initial_state(batch_size=1), dummy)
        np.asarray(out[2])
        from concurrent.futures import ThreadPoolExecutor

        self._executor = ThreadPoolExecutor(max_workers=1)

        # Coalesced batch shapes compile in the background; until a size is
        # in self._warmed the splitter never uses it (no stream-time
        # compiles, pinned by tests/test_no_stream_compiles.py).
        import threading

        self._warm_lock = threading.Lock()
        self._warmed = {1}
        sizes = tuple(s.coalesce_packets or ())

        def prewarm():
            for n in sorted(sizes):
                try:
                    d = jnp.zeros((n * s.package_size, s.raw_channels),
                                  jnp.float32)
                    o = packet_path(
                        extractor.init_state(),
                        model.create_new_initial_state(batch_size=1), d)
                    np.asarray(o[2])
                    with self._warm_lock:
                        self._warmed.add(n)
                except Exception:  # pragma: no cover - warm is advisory
                    logger.exception("frontend coalesce prewarm failed")
                    return

        if sizes:
            threading.Thread(target=prewarm, daemon=True,
                             name="frontend-coalesce-prewarm").start()

    def shutdown(self) -> None:
        self._executor.shutdown(wait=True)

    def _step(self, data: np.ndarray):
        self._fe_state, self._vad_state, packed = self._packet_path(
            self._fe_state, self._vad_state,
            jnp.asarray(np.asarray(data, np.float32)),
        )
        packed = np.asarray(packed)  # ONE device->host read per packet
        self._t_device_done = time.time()
        return packed[:, :-1].astype(np.float64), \
            packed[:, -1].astype(np.int32)

    @subscriber(INPUT)
    @publisher(FEATURES)
    @publisher(OUTPUT)
    @coalescing(8)
    async def process(self, msgs) -> AsyncGenerator:
        import asyncio

        # ``msgs`` is 1..8 queued packets (graph.coalescing).  Split into
        # the largest background-warmed device-call sizes so a backlog
        # drains in O(1) round trips without any stream-time compile.
        i = 0
        while i < len(msgs):
            with self._warm_lock:
                warmed = sorted(self._warmed, reverse=True)
            take = next((n for n in warmed if n <= len(msgs) - i), 1)
            chunk = msgs[i:i + take]
            i += take
            # Latency stamps ride the EARLIEST packet of the chunk: a
            # segment closed by any packet in it is reported no faster
            # than its oldest contributor (conservative under backlog).
            msg = chunk[0]
            data = (msg.data if take == 1
                    else np.concatenate([m.data for m in chunk], axis=0))

            t_dispatch = time.time()
            # Device work off the event loop (see HighGammaActivity).
            feats, labels = await asyncio.get_running_loop().run_in_executor(
                self._executor, self._step, data
            )
            if self._first:
                k = self._extractor.warmup_frames(data.shape[0])
                feats = feats[k:]
                labels = labels[k:]
                self._first = False

            yield self.FEATURES, replace(
                msg, data=feats, fs=1 / self.SETTINGS.window_shift
            )

            data, predictions = self._smoothing.insert(
                data=feats.astype(np.float32), speech_labels=labels
            )
            segments = self._history.insert(data=data,
                                            speech_labels=predictions)
            self._frame_counter += len(feats)
            for segment in segments:
                previous_frames = (
                    self._frame_counter - len(segment)
                    - (len(feats) - int(np.count_nonzero(predictions)))
                )
                yield self.OUTPUT, _with_stamps(
                    msg,
                    (("fe_dispatch", t_dispatch),
                     ("fe_device_done", self._t_device_done),
                     ("seg_close", time.time())),
                    data=segment, fs=100, previous_frames=previous_frames,
                )


class RecurrentNeuralDecodingModelSettings(Settings):
    path_to_model_weights: Optional[str]
    model: Any
    params: Optional[dict]
    config_filename: Optional[str] = None
    length_multiple: int = 50  # segment padding bucket (masked; exact)
    # Segment-length buckets compiled in a background thread at startup
    # (multiples of length_multiple); 2*length_multiple is warmed
    # synchronously in initialize(). See DelayedLPCNetVocoderSettings.
    prewarm_frames: Tuple[int, ...] = (50, 150, 200, 250, 300)


class RecurrentNeuralDecodingModel(Unit):
    """Decode one complete speech segment per message; state is reset after
    every segment (reference local/units.py:507)."""

    SETTINGS: RecurrentNeuralDecodingModelSettings
    INPUT = InputStream(TimeSeriesMessage)
    OUTPUT = OutputStream(TimeSeriesMessage)

    def initialize(self) -> None:
        s = self.SETTINGS
        params = s.params or {}
        self._model = s.model(**params)
        if s.path_to_model_weights is not None:
            self._params = load_checkpoint(
                str(s.path_to_model_weights), self._model.nb_layer,
                bidirectional=True, head_name="regressor",
            )
        else:
            import jax

            self._params = self._model.init(jax.random.PRNGKey(0))

        import jax

        self._infer = jax.jit(
            lambda p, x, m: self._model.apply(p, x, None, mask=m)
        )
        # Warm the smallest segment bucket; longer buckets compile on first
        # use (the per-word path tolerates one-off latency better than the
        # per-packet path, and buckets are few).
        electrodes = self._model.nb_electrodes
        mult = self.SETTINGS.length_multiple
        pred, _ = self._infer(
            self._params,
            jnp.zeros((1, 2 * mult, electrodes), jnp.float32),
            jnp.ones((1, 2 * mult), jnp.float32),
        )
        np.asarray(pred)  # host-transfer sync (warms the readback channel)
        from concurrent.futures import ThreadPoolExecutor

        self._executor = ThreadPoolExecutor(max_workers=1)
        if self.SETTINGS.prewarm_frames:
            import threading

            infer, params = self._infer, self._params

            def prewarm():
                for n in self.SETTINGS.prewarm_frames:
                    try:
                        p, _ = infer(params,
                                     jnp.zeros((1, n, electrodes), jnp.float32),
                                     jnp.ones((1, n), jnp.float32))
                        np.asarray(p)
                    except Exception:  # pragma: no cover - warm is advisory
                        logger.exception("decoder prewarm failed")
                        return

            threading.Thread(target=prewarm, daemon=True,
                             name="decoder-prewarm").start()

    def shutdown(self) -> None:
        self._executor.shutdown(wait=True)

    @subscriber(INPUT)
    @publisher(OUTPUT)
    async def decode(self, msg: TimeSeriesMessage) -> AsyncGenerator:
        import asyncio

        data = np.asarray(msg.data, np.float32)
        T = len(data)
        mult = self.SETTINGS.length_multiple
        Tp = -(-T // mult) * mult
        x = np.zeros((1, Tp, data.shape[1]), np.float32)
        x[0, :T] = data
        mask = np.zeros((1, Tp), np.float32)
        mask[0, :T] = 1.0

        t_dispatch = time.time()

        # Off the event loop: a previously unseen segment-length bucket
        # compiles here (tens of seconds on a tunneled device) and must not
        # freeze ingest. Single worker keeps segments ordered.
        def run():
            pred, _ = self._infer(self._params, jnp.asarray(x),
                                  jnp.asarray(mask))
            return np.asarray(pred)[0, :T]

        predictions = await asyncio.get_running_loop().run_in_executor(
            self._executor, run
        )
        yield self.OUTPUT, _with_stamps(
            msg,
            (("dec_dispatch", t_dispatch), ("dec_device_done", time.time())),
            data=predictions, fs=100,
        )
# endregion


# region Vocoder unit
class DelayedLPCNetVocoderSettings(Settings):
    backend: str = "dsp"
    weights: Optional[str] = None
    length_multiple: int = 10  # frame-count bucket for jit shape reuse
    # Frame-count buckets compiled in a background thread at startup so the
    # first real segments rarely pay a stream-time compile (they would not
    # freeze ingest either way — device work runs off the event loop — but
    # the word's audio would be late). Must be multiples of length_multiple.
    prewarm_frames: Tuple[int, ...] = (100, 200, 300)


class DelayedLPCNetVocoder(Unit):
    """Synthesize a whole decoded segment (all frames in one compiled call)."""

    SETTINGS: Optional[DelayedLPCNetVocoderSettings]
    INPUT = InputStream(TimeSeriesMessage)
    OUTPUT = OutputStream(TimeSeriesMessage)

    def initialize(self) -> None:
        from concurrent.futures import ThreadPoolExecutor

        from ..vocoder import LPCNet

        s = self.SETTINGS or DelayedLPCNetVocoderSettings()
        self._lpcnet = LPCNet(backend=s.backend, weights=s.weights)
        self._executor = ThreadPoolExecutor(max_workers=1)
        if s.prewarm_frames and s.backend != "dsp":
            import threading

            def prewarm():
                for n in s.prewarm_frames:
                    try:
                        self._lpcnet.warm(n)
                    except Exception:  # pragma: no cover - warm is advisory
                        logger.exception("vocoder prewarm failed")
                        return

            threading.Thread(target=prewarm, daemon=True,
                             name="vocoder-prewarm").start()

    def shutdown(self) -> None:
        self._executor.shutdown(wait=True)
        del self._lpcnet

    @subscriber(INPUT)
    @publisher(OUTPUT)
    async def synthesize(self, msg: TimeSeriesMessage) -> AsyncGenerator:
        import asyncio

        features = np.asarray(msg.data, np.float32)
        # Bucket the frame count so segment lengths reuse compiled programs;
        # pad with repeats of the last frame and trim the emitted samples.
        T = len(features)
        mult = (self.SETTINGS or DelayedLPCNetVocoderSettings()).length_multiple
        Tp = -(-T // mult) * mult
        if Tp != T:
            pad = np.repeat(features[-1:], Tp - T, axis=0)
            features = np.concatenate([features, pad], axis=0)
        t_dispatch = time.time()
        # Off the event loop: first use of a new frame-count bucket compiles
        # (slow on a tunneled device) and must not freeze packet ingest.
        acoustic = await asyncio.get_running_loop().run_in_executor(
            self._executor,
            lambda: self._lpcnet.synthesize_frames(features)[: T * 160],
        )
        yield self.OUTPUT, _with_stamps(
            msg,
            (("voc_dispatch", t_dispatch), ("voc_device_done", time.time())),
            data=acoustic, fs=16000,
        )
# endregion


# region Fused decode+vocode unit
class FusedDecoderVocoderSettings(Settings):
    """Settings for the fused per-word path (bidirectional decode + vocoder
    synthesis in ONE device program — no reference counterpart; halves the
    per-word device round trips and shares one segment-length bucket)."""

    path_to_model_weights: Optional[str]
    model: Any
    params: Optional[dict]
    vocoder_backend: str = "net"
    vocoder_weights: Optional[str] = None
    length_multiple: int = 50  # shared decode+vocode padding bucket
    # Buckets compiled in a background thread at startup; 2*length_multiple
    # is warmed synchronously in initialize().
    prewarm_frames: Tuple[int, ...] = (50, 150, 200, 250, 300)
    # Chunked audio emission (net backend): the head program decodes the
    # word and vocodes only the FIRST 50-frame chunk; later chunks are
    # separate pre-dispatched programs whose audio ships as each readback
    # lands.  First-audio latency then pays one chunk of vocoding instead
    # of the whole word's; concatenated output is BIT-identical to the
    # single-shot program (net_synthesize_frames chunk invariance).
    # Requires length_multiple % 50 == 0 (falls back to single-shot
    # otherwise).
    chunk_emission: bool = True
    # Online anti-crackle squelch: energy-gated sampling sharpening in
    # frames whose conditioning says quiet (vocoder/net.py QUIET_C0).
    # Decoder-smoothed silence otherwise ignites AR crackle bursts at a
    # ~40% per-word rate; offline/gate scoring keeps it off.
    quiet_sharpen: bool = True


class FusedDecoderVocoder(Unit):
    """Decode one completed speech segment AND vocode it in a single jitted
    dispatch (net backend; the dsp backend decodes on device and vocodes on
    the host, same unit surface).

    Functionally equivalent to RecurrentNeuralDecodingModel +
    DelayedLPCNetVocoder in series: decoder state is fresh per segment
    (reference local/units.py:507), vocoder state carries across segments.
    The per-word critical path costs one device round trip instead of two,
    and both stages share one segment-length bucket, so every prewarmed
    length is compile-free at stream time.  Publishes the decoded features
    on LPC (for the log.lpc tap) and int16 audio on OUTPUT; both ride the
    same packed device->host read.
    """

    SETTINGS: FusedDecoderVocoderSettings
    INPUT = InputStream(TimeSeriesMessage)
    LPC = OutputStream(TimeSeriesMessage)
    OUTPUT = OutputStream(TimeSeriesMessage)   # audio chunks, in order
    WORD = OutputStream(TimeSeriesMessage)     # whole word (wav-logger tap)

    def initialize(self) -> None:
        import jax

        s = self.SETTINGS
        params = s.params or {}
        self._model = s.model(**params)
        if s.path_to_model_weights is not None:
            self._dec_params = load_checkpoint(
                str(s.path_to_model_weights), self._model.nb_layer,
                bidirectional=True, head_name="regressor",
            )
        else:
            self._dec_params = self._model.init(jax.random.PRNGKey(0))

        if s.vocoder_backend == "net":
            from ..vocoder.lpcnet import _load_params, _sparse_pattern_of
            from ..vocoder.net import COND_BLOCK, LPCNetModel, \
                net_synthesize_frames, net_vocoder_init

            self._voc_params = _load_params(s.vocoder_weights)
            # Architecture (incl. the bunch factor) rides in the checkpoint.
            self._voc_model = (LPCNetModel.from_params(self._voc_params)
                               if self._voc_params is not None
                               else LPCNetModel())
            if self._voc_params is None:
                self._voc_params = self._voc_model.init(jax.random.PRNGKey(0))
            use_pallas = jax.default_backend() != "cpu"
            sparse = _sparse_pattern_of(self._voc_params, use_pallas)
            self._voc_state = net_vocoder_init(self._voc_model, batch=1)
            decoder, voc_model = self._model, self._voc_model
            # Chunked emission needs buckets that are whole 50-frame
            # synthesis blocks, or chunk boundaries would perturb the
            # stream (net_synthesize_frames chunk-invariance contract).
            self._chunk = COND_BLOCK
            self._chunked = bool(s.chunk_emission) \
                and s.length_multiple % COND_BLOCK == 0
            chunk = self._chunk

            def pack_audio(pcm):
                # int16 PAIRS bitcast into f32 lanes: the audio leaves the
                # host as int16 anyway and is ~90% of the payload — f32 PCM
                # nearly doubled the word readback (Tp*720 vs Tp*400
                # bytes).  Same clip->truncate conversion the host applied
                # before, so output bytes are unchanged.
                pcm16 = jnp.clip(pcm.reshape(-1) * 32767.0,
                                 -32768, 32767).astype(jnp.int16)
                return jax.lax.bitcast_convert_type(
                    pcm16.reshape(-1, 2), jnp.float32)

            def padded_features(dec_params, x, mask):
                pred, _ = decoder.apply(dec_params, x, None, mask=mask)
                # Replace padded positions with the last valid frame (the
                # same repeat-pad the separate vocoder unit applies) so the
                # carried vocoder state never consumes masked-garbage
                # conditioning.  mask is 1s then 0s; the last valid frame
                # is picked with a one-hot reduction (no dynamic indexing).
                # NB the carried vocoder state DOES advance over the pad
                # tail (< length_multiple frames of held conditioning).
                # The last valid frame of every segment is trailing-context
                # silence (segments end with `context` non-speech frames,
                # reference local/common.py:156-215), so the drift is "a
                # little more silence synthesis" — matching the separate
                # DelayedLPCNetVocoder chain, and decayed long before the
                # next word's onset (>= 0.5 s later by construction).
                nxt = jnp.concatenate(
                    [mask[:, 1:], jnp.zeros_like(mask[:, :1])], axis=1)
                last_ind = mask * (1.0 - nxt)
                last_frame = jnp.einsum("bt,btf->bf", last_ind, pred)
                feats = pred * mask[..., None] \
                    + last_frame[:, None, :] * (1.0 - mask[..., None])
                return pred, feats

            @jax.jit
            def segment_program(dec_params, voc_params, voc_state, x, mask):
                # Single-shot: decode + vocode the WHOLE word in one
                # program; features + audio packed into ONE f32 array (the
                # host needs both per word, and each separate device->host
                # read is a full round trip on tunneled backends).
                pred, feats = padded_features(dec_params, x, mask)
                pcm, voc_state = net_synthesize_frames(
                    voc_model, voc_params, voc_state, feats,
                    use_pallas=use_pallas, sparse_pattern=sparse,
                quiet_sharpen=s.quiet_sharpen,
                )
                packed = jnp.concatenate([pred.reshape(-1),
                                          pack_audio(pcm)])
                return packed, voc_state

            @jax.jit
            def head_program(dec_params, voc_params, voc_state, x, mask):
                # Chunked head: decode the word but vocode only the FIRST
                # chunk — first-audio latency stops paying the rest of the
                # word's synthesis.  Padded conditioning stays on device
                # for the tail programs.
                pred, feats = padded_features(dec_params, x, mask)
                pcm, voc_state = net_synthesize_frames(
                    voc_model, voc_params, voc_state, feats[:, :chunk],
                    use_pallas=use_pallas, sparse_pattern=sparse,
                quiet_sharpen=s.quiet_sharpen,
                )
                packed = jnp.concatenate([pred.reshape(-1),
                                          pack_audio(pcm)])
                return packed, feats, voc_state

            @jax.jit
            def tail_program(voc_params, voc_state, feats, k):
                # Vocode chunk k (traced index: ONE compile covers every
                # chunk of a bucket).  Dispatched eagerly right after the
                # head, so chunk compute pipelines behind the readbacks.
                fch = jax.lax.dynamic_slice(
                    feats, (0, k * chunk, 0),
                    (feats.shape[0], chunk, feats.shape[2]))
                pcm, voc_state = net_synthesize_frames(
                    voc_model, voc_params, voc_state, fch,
                    use_pallas=use_pallas, sparse_pattern=sparse,
                quiet_sharpen=s.quiet_sharpen,
                )
                return pack_audio(pcm), voc_state

            self._program = segment_program
            self._head = head_program
            self._tail = tail_program
            self._lpcnet = None
        else:
            from ..vocoder import LPCNet

            self._lpcnet = LPCNet(backend=s.vocoder_backend,
                                  weights=s.vocoder_weights)
            decoder = self._model

            @jax.jit
            def segment_program(dec_params, voc_params, voc_state, x, mask):
                pred, _ = decoder.apply(dec_params, x, None, mask=mask)
                return pred.reshape(-1), voc_state

            self._program = segment_program
            self._head = self._tail = None
            self._chunked = False
            self._voc_params = None
            self._voc_state = None

        # Warm the smallest bucket synchronously (host-transfer sync — see
        # HighGammaActivity.initialize); remaining buckets in background.
        electrodes = self._model.nb_electrodes
        mult = s.length_multiple
        self._warm(2 * mult, electrodes)
        from concurrent.futures import ThreadPoolExecutor

        self._executor = ThreadPoolExecutor(max_workers=1)
        if s.prewarm_frames:
            import threading

            def prewarm():
                for n in s.prewarm_frames:
                    try:
                        self._warm(n, electrodes)
                    except Exception:  # pragma: no cover - warm is advisory
                        logger.exception("fused decode+vocode prewarm failed")
                        return

            threading.Thread(target=prewarm, daemon=True,
                             name="decvoc-prewarm").start()

    def _warm(self, n_frames: int, electrodes: int) -> None:
        """Compile the n_frames bucket against a THROWAWAY vocoder state."""
        if self._voc_state is None:  # dsp backend: decode-only program
            state = None
        else:
            from ..vocoder.net import net_vocoder_init

            state = net_vocoder_init(self._voc_model, batch=1)
        x = jnp.zeros((1, n_frames, electrodes), jnp.float32)
        mask = jnp.ones((1, n_frames), jnp.float32)
        if self._chunked:
            packed, feats, st = self._head(
                self._dec_params, self._voc_params, state, x, mask)
            if n_frames > self._chunk:  # buckets with tail chunks
                bits, st = self._tail(self._voc_params, st, feats,
                                      jnp.int32(1))
                np.asarray(bits)
            np.asarray(packed)
            return
        packed, _ = self._program(
            self._dec_params, self._voc_params, state, x, mask,
        )
        np.asarray(packed)
        if self._lpcnet is not None:
            self._lpcnet.warm(n_frames)

    def shutdown(self) -> None:
        self._executor.shutdown(wait=True)

    def _pad_segment(self, data: np.ndarray):
        T = len(data)
        mult = self.SETTINGS.length_multiple
        Tp = -(-T // mult) * mult
        x = np.zeros((1, Tp, data.shape[1]), np.float32)
        x[0, :T] = data
        mask = np.zeros((1, Tp), np.float32)
        mask[0, :T] = 1.0
        return T, Tp, jnp.asarray(x), jnp.asarray(mask)

    def _decode_and_vocode(self, data: np.ndarray):
        T, Tp, x, mask = self._pad_segment(data)
        packed, self._voc_state = self._program(
            self._dec_params, self._voc_params, self._voc_state, x, mask,
        )
        packed = np.asarray(packed)  # ONE device->host read per word
        self._t_device_done = time.time()
        nb_out = self._model.nb_outputs
        lpc = packed[:Tp * nb_out].reshape(Tp, nb_out)[:T]
        if self._lpcnet is not None:  # dsp backend: vocode on the host
            # Repeat-pad to the shared bucket so the host vocoder reuses
            # the same compiled shapes as the decode program.
            feats = np.concatenate(
                [lpc, np.repeat(lpc[-1:], Tp - T, axis=0)], axis=0)
            audio = self._lpcnet.synthesize_frames(feats)[: T * 160]
        else:
            audio = packed[Tp * nb_out:].view(np.int16)[: T * 160]
        return lpc, audio

    def _decode_head(self, data: np.ndarray):
        """Chunked word start: run the head program, eagerly dispatch every
        tail chunk (device compute pipelines behind the readbacks), then
        read back decoded features + the first chunk's audio — the only
        device round trip on the first-audio critical path."""
        T, Tp, x, mask = self._pad_segment(data)
        packed, feats, st = self._head(
            self._dec_params, self._voc_params, self._voc_state, x, mask)
        pending = []
        for k in range(1, Tp // self._chunk):
            bits, st = self._tail(self._voc_params, st, feats, jnp.int32(k))
            pending.append(bits)
        self._voc_state = st
        packed = np.asarray(packed)
        self._t_device_done = time.time()
        nb_out = self._model.nb_outputs
        lpc = packed[:Tp * nb_out].reshape(Tp, nb_out)[:T]
        audio0 = packed[Tp * nb_out:].view(np.int16)
        audio0 = audio0[: min(T, self._chunk) * 160]
        return lpc, audio0, pending, T

    def _read_chunk(self, bits, k: int, T: int) -> np.ndarray:
        """Read back tail chunk ``k``, trimmed to the word's valid frames
        (the padded repeat-pad tail is synthesized for state continuity but
        never shipped).  Clamped at zero: with length_multiple a multiple
        of the chunk (100, 150, ...) a short word can end before a tail
        chunk even starts — that chunk is pure repeat-pad and ships no
        samples (an unclamped negative stop sliced from the END, emitting
        a near-full chunk of padded garbage to the loudspeaker)."""
        valid = max(0, min(T - k * self._chunk, self._chunk))
        return np.asarray(bits).view(np.int16)[: valid * 160]

    @subscriber(INPUT)
    @publisher(LPC)
    @publisher(OUTPUT)
    @publisher(WORD)
    async def decode(self, msg: TimeSeriesMessage) -> AsyncGenerator:
        import asyncio

        loop = asyncio.get_running_loop()
        data = np.asarray(msg.data, np.float32)
        t_dispatch = time.time()
        # Off the event loop: an un-prewarmed segment-length bucket compiles
        # here (tens of seconds on a tunneled device) and must not freeze
        # ingest. Single worker keeps segments ordered.
        if not self._chunked:
            lpc, audio = await loop.run_in_executor(
                self._executor, self._decode_and_vocode, data
            )
            stamps = (("dv_dispatch", t_dispatch),
                      ("dv_device_done", self._t_device_done))
            yield self.LPC, replace(msg, data=lpc, fs=100)
            yield self.OUTPUT, _with_stamps(msg, stamps, data=audio,
                                            fs=16000)
            yield self.WORD, _anonymize(msg, data=audio, fs=16000)
            return

        lpc, audio0, pending, T = await loop.run_in_executor(
            self._executor, self._decode_head, data
        )
        stamps = (("dv_dispatch", t_dispatch),
                  ("dv_device_done", self._t_device_done))
        yield self.LPC, replace(msg, data=lpc, fs=100)
        # First chunk carries the word's latency stamps: its audio_out time
        # IS the time speech starts playing (the reference's "delayed"
        # latency contract, local/units.py:34-35).
        yield self.OUTPUT, _with_stamps(msg, stamps, data=audio0, fs=16000)
        parts = [audio0]
        for i, bits in enumerate(pending, start=1):
            audio_k = await loop.run_in_executor(
                self._executor, self._read_chunk, bits, i, T)
            parts.append(audio_k)
            if len(audio_k) == 0 and i != len(pending):
                continue  # all-pad chunk: nothing to ship, no marker due
            if i == len(pending):
                # Completion marker: the sink aggregates these rows into a
                # separate word-completion distribution (not the latency
                # table — chunks 2..N of a word are not new words).
                out = _with_stamps(
                    msg, (("dv_dispatch", t_dispatch),
                          ("dv_word_complete", time.time())),
                    data=audio_k, fs=16000)
            else:
                out = _anonymize(msg, data=audio_k, fs=16000)
            yield self.OUTPUT, out
        word = np.concatenate(parts) if len(parts) > 1 else audio0
        yield self.WORD, _anonymize(msg, data=word, fs=16000)


class ShardedFusedDecoderVocoderSettings(Settings):
    """Settings for the multi-chip serving word path (see the unit)."""

    path_to_model_weights: Optional[str]
    model: Any
    params: Optional[dict]
    vocoder_weights: Optional[str] = None
    length_multiple: int = 50
    prewarm_frames: Tuple[int, ...] = ()
    # Mesh size (0 = all attached devices) and serve batch (0 = the
    # mesh's data-axis size; must be a multiple of it).
    n_devices: int = 0
    streams: int = 0
    # Per-word segments for the NON-LIVE serve slots: a callable
    # ``(n_background_slots, live_frames) -> iterable of [T_i, ch]``
    # float32 arrays (lengths may differ per slot — each slot gets its
    # own validity mask).  None replays the live segment into every slot
    # (shape-exercise mode).
    slot_feeder: Optional[Any] = None
    # Chunked audio emission on the sharded path too (same 50-frame
    # head+tail structure as FusedDecoderVocoder; falls back to
    # single-shot when length_multiple isn't whole synthesis blocks).
    chunk_emission: bool = True
    # Online anti-crackle squelch (see FusedDecoderVocoderSettings).
    quiet_sharpen: bool = True


class ShardedFusedDecoderVocoder(Unit):
    """Multi-chip serving variant of FusedDecoderVocoder.

    The word program — bidirectional decode + repeat-pad + neural
    vocoder synthesis (the same math as FusedDecoderVocoder's
    segment_program / parallel.shard.sharded_fused_word_path) — executes
    SPMD over a ``jax.sharding.Mesh``: decoder + vocoder parameters are
    replicated, the serve batch and every per-stream vocoder state tensor
    are sharded over the mesh's "data" axis.  The live closed-loop stream
    occupies slot 0 of the serve batch (the remaining slots are serving
    capacity for more concurrent streams; here they replay the same
    segment, keeping the SPMD shapes fully exercised).  Single-shot
    emission; same LPC/OUTPUT/WORD surface as the fused unit, so
    decode_online's wiring works unchanged.

    This is the runtime-graph face of the pod-serving story
    (apps/serve_multichip.py): one jitted program advances all streams,
    with no cross-chip communication inside the vocoder.
    """

    SETTINGS: ShardedFusedDecoderVocoderSettings
    INPUT = InputStream(TimeSeriesMessage)
    LPC = OutputStream(TimeSeriesMessage)
    OUTPUT = OutputStream(TimeSeriesMessage)
    WORD = OutputStream(TimeSeriesMessage)

    def initialize(self) -> None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import batched_vocoder_sharding, make_mesh
        from ..vocoder.lpcnet import _load_params, _sparse_pattern_of
        from ..vocoder.net import COND_BLOCK, LPCNetModel, \
            net_synthesize_frames, net_vocoder_init

        s = self.SETTINGS
        self._model = s.model(**(s.params or {}))
        if s.path_to_model_weights is not None:
            dec_params = load_checkpoint(
                str(s.path_to_model_weights), self._model.nb_layer,
                bidirectional=True, head_name="regressor")
        else:
            dec_params = self._model.init(jax.random.PRNGKey(0))
        voc_params = _load_params(s.vocoder_weights)
        voc_model = (LPCNetModel.from_params(voc_params)
                     if voc_params is not None else LPCNetModel())
        if voc_params is None:
            voc_params = voc_model.init(jax.random.PRNGKey(0))

        mesh = make_mesh(s.n_devices or None)
        data_size = mesh.shape["data"]
        streams = s.streams or data_size
        if streams % data_size:
            raise ValueError(
                f"streams={streams} must be a multiple of the mesh's "
                f"data axis ({data_size})")
        self._mesh, self._streams = mesh, streams

        def rep(leaf):
            return jax.device_put(np.asarray(leaf),
                                  NamedSharding(mesh, P()))

        self._dec_params = jax.tree.map(rep, dec_params)
        self._voc_params = jax.tree.map(rep, voc_params)
        state = net_vocoder_init(voc_model, batch=streams)
        self._voc_state, _ = batched_vocoder_sharding(
            mesh, state, np.zeros((streams, 1, 1), np.float32))

        use_pallas = jax.default_backend() != "cpu"
        sparse = _sparse_pattern_of(voc_params, use_pallas)
        decoder = self._model
        self._chunk = COND_BLOCK
        self._chunked = bool(s.chunk_emission) \
            and s.length_multiple % COND_BLOCK == 0
        chunk = self._chunk

        def pack_audio(pcm):
            # All slots' audio leaves the device as int16 pairs bitcast
            # into f32 lanes (same wire format as the single-chip fused
            # unit): each served stream's PCM must reach the host anyway,
            # and f32 would double the readback.
            pcm16 = jnp.clip(pcm * 32767.0, -32768, 32767).astype(jnp.int16)
            return jax.lax.bitcast_convert_type(
                pcm16.reshape(pcm.shape[0], -1, 2), jnp.float32)

        def padded_features(dec_params, x, mask):
            # Per-slot repeat-pad: each slot's own last VALID frame holds
            # over its padded tail (slots may carry different-length
            # segments — the mask is per slot).
            pred, _ = decoder.apply(dec_params, x, None, mask=mask)
            nxt = jnp.concatenate(
                [mask[:, 1:], jnp.zeros_like(mask[:, :1])], axis=1)
            last_ind = mask * (1.0 - nxt)
            last_frame = jnp.einsum("bt,btf->bf", last_ind, pred)
            feats = pred * mask[..., None] \
                + last_frame[:, None, :] * (1.0 - mask[..., None])
            return pred, feats

        @jax.jit
        def word_program(dec_params, voc_params, voc_state, x, mask):
            pred, feats = padded_features(dec_params, x, mask)
            pcm, voc_state = net_synthesize_frames(
                voc_model, voc_params, voc_state, feats,
                use_pallas=use_pallas, sparse_pattern=sparse,
                quiet_sharpen=s.quiet_sharpen)
            # Slot 0 is the live closed-loop stream: only its LPC is
            # logged; every slot's audio ships.
            return pred[0], pack_audio(pcm), voc_state

        @jax.jit
        def head_program(dec_params, voc_params, voc_state, x, mask):
            pred, feats = padded_features(dec_params, x, mask)
            pcm, voc_state = net_synthesize_frames(
                voc_model, voc_params, voc_state, feats[:, :chunk],
                use_pallas=use_pallas, sparse_pattern=sparse,
                quiet_sharpen=s.quiet_sharpen)
            return pred[0], pack_audio(pcm), feats, voc_state

        @jax.jit
        def tail_program(voc_params, voc_state, feats, k):
            fch = jax.lax.dynamic_slice(
                feats, (0, k * chunk, 0),
                (feats.shape[0], chunk, feats.shape[2]))
            pcm, voc_state = net_synthesize_frames(
                voc_model, voc_params, voc_state, fch,
                use_pallas=use_pallas, sparse_pattern=sparse,
                quiet_sharpen=s.quiet_sharpen)
            return pack_audio(pcm), voc_state

        self._program = word_program
        self._head = head_program
        self._tail = tail_program
        # Last word's background-slot audio (slot index 1.. -> int16
        # array), the serving tap tests and downstream consumers read.
        self.slot_audio: dict = {}
        electrodes = self._model.nb_electrodes
        self._warm(2 * s.length_multiple, electrodes)
        from concurrent.futures import ThreadPoolExecutor

        self._executor = ThreadPoolExecutor(max_workers=1)
        if s.prewarm_frames:
            import threading

            def prewarm():
                for n in s.prewarm_frames:
                    try:
                        self._warm(n, electrodes)
                    except Exception:  # pragma: no cover - advisory
                        logger.exception("sharded word-path prewarm failed")
                        return

            threading.Thread(target=prewarm, daemon=True,
                             name="sharded-decvoc-prewarm").start()

    def _warm(self, n_frames: int, electrodes: int) -> None:
        """Compile the n_frames bucket against a THROWAWAY vocoder state
        (the sharded live state must not advance on warm-up zeros)."""
        import jax

        from ..parallel import batched_vocoder_sharding, shard_batch

        x = np.zeros((self._streams, n_frames, electrodes), np.float32)
        mask = np.ones((self._streams, n_frames), np.float32)
        state, xb = batched_vocoder_sharding(
            self._mesh, jax.tree.map(np.asarray, self._voc_state), x)
        mb = shard_batch(self._mesh, mask)
        with self._mesh:
            if self._chunked:
                _pred, bits, feats, st = self._head(
                    self._dec_params, self._voc_params, state, xb, mb)
                if n_frames > self._chunk:
                    bits, st = self._tail(self._voc_params, st, feats,
                                          jnp.int32(1))
                np.asarray(bits)
            else:
                _pred, bits, _ = self._program(
                    self._dec_params, self._voc_params, state, xb, mb)
                np.asarray(bits)

    def shutdown(self) -> None:
        self._executor.shutdown(wait=True)

    def _batch_slots(self, data: np.ndarray):
        """Per-slot segments -> padded batch.  Slot 0 carries the live
        stream; non-live slots come from ``slot_feeder`` (distinct streams
        with their own lengths/masks) or replay the live segment."""
        from ..parallel import shard_batch

        feeder = self.SETTINGS.slot_feeder
        if feeder is None:
            segs = [data] * self._streams
        else:
            segs = [data] + [np.asarray(b, np.float32)
                             for b in feeder(self._streams - 1, len(data))]
            if len(segs) != self._streams:
                raise ValueError(
                    f"slot_feeder yielded {len(segs) - 1} segments for "
                    f"{self._streams - 1} background slots")
        Ts = [len(s) for s in segs]
        mult = self.SETTINGS.length_multiple
        Tp = -(-max(Ts) // mult) * mult
        x = np.zeros((self._streams, Tp, data.shape[1]), np.float32)
        mask = np.zeros((self._streams, Tp), np.float32)
        for i, seg in enumerate(segs):
            x[i, :Ts[i]] = seg
            mask[i, :Ts[i]] = 1.0
        xb, mb = shard_batch(self._mesh, x, mask)
        return Ts, Tp, xb, mb

    @staticmethod
    def _unpack_slots(bits, Ts, lo_frame: int, chunk_frames: int):
        """int16 audio per slot from the packed readback, each trimmed to
        its own word length (clamped: an all-pad chunk ships nothing)."""
        pcm = np.asarray(bits).view(np.int16).reshape(len(Ts), -1)
        out = []
        for i, T in enumerate(Ts):
            valid = max(0, min(T - lo_frame, chunk_frames))
            out.append(pcm[i, : valid * 160])
        return out

    def _decode_and_vocode(self, data: np.ndarray):
        Ts, Tp, xb, mb = self._batch_slots(data)
        with self._mesh:
            pred0, bits, self._voc_state = self._program(
                self._dec_params, self._voc_params, self._voc_state,
                xb, mb)
        slots = self._unpack_slots(bits, Ts, 0, Tp)
        lpc = np.asarray(pred0)[: Ts[0]]
        self.slot_audio = {i: a for i, a in enumerate(slots) if i > 0}
        self._t_device_done = time.time()
        return lpc, slots[0]

    def _decode_head(self, data: np.ndarray):
        """Chunked word start on the sharded path: head program (decode all
        slots + every slot's first chunk), eagerly dispatched tails, one
        packed readback on the first-audio critical path."""
        Ts, Tp, xb, mb = self._batch_slots(data)
        with self._mesh:
            pred0, bits, feats, st = self._head(
                self._dec_params, self._voc_params, self._voc_state,
                xb, mb)
            pending = []
            for k in range(1, Tp // self._chunk):
                bits_k, st = self._tail(self._voc_params, st, feats,
                                        jnp.int32(k))
                pending.append(bits_k)
        self._voc_state = st
        slots = self._unpack_slots(bits, Ts, 0, self._chunk)
        lpc = np.asarray(pred0)[: Ts[0]]
        self._bg_parts = {i: [a] for i, a in enumerate(slots) if i > 0}
        self._t_device_done = time.time()
        return lpc, slots[0], pending, Ts

    def _read_chunk(self, bits, k: int, Ts) -> np.ndarray:
        slots = self._unpack_slots(bits, Ts, k * self._chunk, self._chunk)
        for i, a in enumerate(slots):
            if i > 0 and len(a):
                self._bg_parts[i].append(a)
        return slots[0]

    @subscriber(INPUT)
    @publisher(LPC)
    @publisher(OUTPUT)
    @publisher(WORD)
    async def decode(self, msg: TimeSeriesMessage) -> AsyncGenerator:
        import asyncio

        loop = asyncio.get_running_loop()
        data = np.asarray(msg.data, np.float32)
        t_dispatch = time.time()
        if not self._chunked:
            lpc, audio = await loop.run_in_executor(
                self._executor, self._decode_and_vocode, data
            )
            stamps = (("dv_dispatch", t_dispatch),
                      ("dv_device_done", self._t_device_done))
            yield self.LPC, replace(msg, data=lpc, fs=100)
            yield self.OUTPUT, _with_stamps(msg, stamps, data=audio,
                                            fs=16000)
            yield self.WORD, _anonymize(msg, data=audio, fs=16000)
            return

        lpc, audio0, pending, Ts = await loop.run_in_executor(
            self._executor, self._decode_head, data
        )
        stamps = (("dv_dispatch", t_dispatch),
                  ("dv_device_done", self._t_device_done))
        yield self.LPC, replace(msg, data=lpc, fs=100)
        yield self.OUTPUT, _with_stamps(msg, stamps, data=audio0, fs=16000)
        parts = [audio0]
        for i, bits in enumerate(pending, start=1):
            audio_k = await loop.run_in_executor(
                self._executor, self._read_chunk, bits, i, Ts)
            parts.append(audio_k)
            if len(audio_k) == 0 and i != len(pending):
                continue
            if i == len(pending):
                out = _with_stamps(
                    msg, (("dv_dispatch", t_dispatch),
                          ("dv_word_complete", time.time())),
                    data=audio_k, fs=16000)
            else:
                out = _anonymize(msg, data=audio_k, fs=16000)
            yield self.OUTPUT, out
        word = np.concatenate(parts) if len(parts) > 1 else audio0
        self.slot_audio = {i: np.concatenate(p) if len(p) > 1 else p[0]
                           for i, p in getattr(self, "_bg_parts",
                                               {}).items()}
        yield self.WORD, _anonymize(msg, data=word, fs=16000)
# endregion


# region Output unit
class SoXOutputSettings(Settings):
    """Optional latency-budget reporting knobs for the audio sink.

    ``rpc_floor_ms``: measured per-call host<->device round-trip floor
    (decode_online measures it after warm-up); used to attribute the tunnel
    share of each word's latency.  ``budget_path``: when set, the per-stage
    p50/p95 budget table is also written there as JSON at shutdown."""

    rpc_floor_ms: Optional[float] = None
    budget_path: Optional[str] = None
    # A word whose total exceeds this is counted as a STALL (multi-second
    # tunnel device-read freezes, absorbed by the executor isolation) and
    # excluded from the tail percentiles — but always counted and reported.
    stall_threshold_ms: float = 1000.0


class DelayedStdoutForSoX(Unit):
    """Write int16 PCM to stdout for ``play -t raw -r 16000 ...``.

    Also the closed loop's latency probe: each segment's ``received_at``
    stamp (set at ZMQ ingest, propagated through every unit — reference
    local/units.py:34,89) yields the end-to-end ingest->audio time, and the
    per-stage ``stamps`` appended along the word path decompose it into a
    latency budget (aggregated p50/p95 at shutdown; intervals ending in
    ``*_device_done`` each contain exactly one device round trip, so
    ``rpc_floor_ms`` gives the tunnel-RPC share)."""

    SETTINGS: Optional[SoXOutputSettings]
    INPUT = InputStream(ClosedLoopMessage)

    def initialize(self) -> None:
        self.latencies_ms: List[float] = []
        self.completions_ms: List[float] = []
        self._budget_rows: List[dict] = []

    @subscriber(INPUT)
    async def print(self, msg: ClosedLoopMessage) -> None:
        sys.stdout.buffer.write(np.asarray(msg.data).tobytes())
        sys.stdout.flush()
        if getattr(msg, "received_at", None) is None:
            return  # interior audio chunk of a word — bytes only
        now = time.time()
        latency_ms = (now - msg.received_at) * 1000.0
        stamps = tuple(getattr(msg, "stamps", ()) or ())
        if any(name == "dv_word_complete" for name, _ in stamps):
            # Final chunk of a chunked word: a completion row, not a new
            # word (the word's latency was logged with its first chunk).
            self.completions_ms.append(latency_ms)
            logger.info(
                f"word complete: last chunk out, ingest->last_audio "
                f"{latency_ms:.1f} ms"
            )
            return
        self.latencies_ms.append(latency_ms)
        logger.info(
            f"segment audio out: {len(msg.data)} samples, "
            f"ingest->audio {latency_ms:.1f} ms"
        )
        if stamps:
            row = {}
            prev_name, prev_t = "ingest", msg.received_at
            for name, t in stamps + (("audio_out", now),):
                row[f"{prev_name}->{name}"] = (t - prev_t) * 1000.0
                prev_name, prev_t = name, t
            row["total"] = latency_ms
            self._budget_rows.append(row)

    def shutdown(self) -> None:
        if self.latencies_ms:
            p50 = float(np.percentile(self.latencies_ms, 50))
            logger.info(
                f"ingest->audio latency over {len(self.latencies_ms)} "
                f"segments: p50 {p50:.1f} ms"
            )
        if not self._budget_rows:
            return
        # Aggregate the per-word stage intervals (keys in path order from
        # the first row; wirings are homogeneous within a run).
        s = self.SETTINGS
        stall_ms = float(getattr(s, "stall_threshold_ms", 1000.0)
                         if s is not None else 1000.0)
        stalls = [r for r in self._budget_rows if r["total"] > stall_ms]
        keys = [k for k in self._budget_rows[0] if k != "total"]
        table = {}
        for k in keys + ["total"]:
            vals = [r[k] for r in self._budget_rows if k in r]
            table[k] = {"p50": float(np.percentile(vals, 50)),
                        "p95": float(np.percentile(vals, 95)),
                        "n": len(vals)}
        lines = [f"latency budget over {len(self._budget_rows)} words "
                 f"(ms, p50/p95):"]
        for k in keys + ["total"]:
            lines.append(f"  {k:<32s} {table[k]['p50']:7.1f} / "
                         f"{table[k]['p95']:7.1f}")
        floor = getattr(s, "rpc_floor_ms", None) if s is not None else None
        if floor is None:
            floor = self._measure_rpc_floor()
        n_rpc = sum(1 for k in keys if k.endswith("_device_done"))
        report = {"n_words": len(self._budget_rows), "stages": table,
                  "device_round_trips_per_word": n_rpc,
                  "stall_threshold_ms": stall_ms,
                  "stall_count": len(stalls)}
        if self.completions_ms:
            report["word_complete"] = {
                "p50": float(np.percentile(self.completions_ms, 50)),
                "p95": float(np.percentile(self.completions_ms, 95)),
                "n": len(self.completions_ms)}
            lines.append(
                f"  word complete (last chunk)      "
                f"{report['word_complete']['p50']:7.1f} / "
                f"{report['word_complete']['p95']:7.1f}   "
                f"(n={len(self.completions_ms)}; multi-chunk words only)")
        if floor is not None and n_rpc:
            tunnel_ms = float(floor) * n_rpc
            net = table["total"]["p50"] - tunnel_ms
            report["rpc_floor_ms"] = float(floor)
            report["tunnel_rpc_share_ms"] = tunnel_ms
            report["total_p50_net_of_tunnel_ms"] = net
            # Tail latency net of the tunnel floor.  Stalled words
            # (multi-second tunnel freezes) are EXCLUDED from the tail
            # percentile but counted above — on a locally attached chip
            # neither the floor nor the stalls exist.
            ok = [r["total"] for r in self._budget_rows
                  if r["total"] <= stall_ms]
            if ok:
                p95_net = float(np.percentile(ok, 95)) - tunnel_ms
                report["total_p95_net_of_tunnel_ms"] = p95_net
                lines.append(
                    f"  tunnel share: {n_rpc} round trips x {floor:.1f} ms"
                    f" floor = {tunnel_ms:.1f} ms -> p50 net of tunnel "
                    f"{net:.1f} ms, p95 net {p95_net:.1f} ms "
                    f"({len(stalls)} stall(s) > {stall_ms:.0f} ms "
                    f"excluded from p95)")
            else:
                lines.append(
                    f"  tunnel share: {n_rpc} round trips x {floor:.1f} ms"
                    f" floor = {tunnel_ms:.1f} ms -> p50 net of tunnel "
                    f"{net:.1f} ms")
        logger.info("\n".join(lines))
        path = getattr(s, "budget_path", None) if s is not None else None
        if path:
            import json

            with open(path, "w") as fd:
                json.dump(report, fd, indent=1)

    @staticmethod
    def _measure_rpc_floor() -> Optional[float]:
        """Median wall time of a trivial jitted call + hard host sync —
        the per-round-trip floor every device interval pays (≈30 ms on the
        tunneled axon backend, ~0.1 ms on a locally attached chip).
        Measured at shutdown: the device is idle and readiness latency is
        unaffected."""
        try:
            import jax

            f = jax.jit(lambda x: x + 1.0)
            x = jnp.zeros((8, 128), jnp.float32)
            np.asarray(f(x))  # compile + transfer warm
            times = []
            for _ in range(10):
                t0 = time.perf_counter()
                np.asarray(f(x))
                times.append(time.perf_counter() - t0)
            return float(np.median(times) * 1000.0)
        except Exception:  # pragma: no cover - advisory only
            logger.exception("rpc-floor measurement failed")
            return None
# endregion
