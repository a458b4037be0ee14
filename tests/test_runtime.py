"""Runtime tests: graph plumbing, packet codec, loggers, unit behavior."""

import asyncio

import numpy as np
import pytest

import dss_tpu.runtime as ez
from dss_tpu.native import float_to_pcm16, pack_packet, unpack_packet
from dss_tpu.runtime.messages import ClosedLoopMessage, TimeSeriesMessage
from dss_tpu.runtime.units import (
    BinaryLogger,
    LoggerSettings,
    VoiceActivityDetectionLogger,
    interpret_bci2000_packet,
)


def test_packet_codec_roundtrip(rng):
    data = rng.normal(size=(40, 128)).astype(np.float32)
    buf = pack_packet(data)
    assert len(buf) == 7 + 40 * 128 * 4
    out = unpack_packet(buf)
    assert out.dtype == np.float64 and out.shape == (40, 128)
    np.testing.assert_array_equal(out.astype(np.float32), data)
    # The connector's entry point agrees.
    np.testing.assert_array_equal(interpret_bci2000_packet(buf), out)


def test_pcm16_conversion():
    x = np.array([-2.0, -1.0, 0.0, 0.25, 1.0, 2.0], np.float32)
    out = float_to_pcm16(x)
    assert out.dtype == np.int16
    assert out[0] == -32768 and out[-1] == 32767
    assert out[3] == int(round(0.25 * 32767))


class _NumberSourceSettings(ez.Settings):
    count: int


class _NumberSource(ez.Unit):
    SETTINGS: _NumberSourceSettings
    OUTPUT = ez.OutputStream(TimeSeriesMessage)

    @ez.publisher(OUTPUT)
    async def run(self):
        for i in range(self.SETTINGS.count):
            yield self.OUTPUT, TimeSeriesMessage(data=np.array([i]), fs=1)


class _Doubler(ez.Unit):
    INPUT = ez.InputStream(TimeSeriesMessage)
    OUTPUT = ez.OutputStream(TimeSeriesMessage)

    @ez.subscriber(INPUT)
    @ez.publisher(OUTPUT)
    async def process(self, msg):
        yield self.OUTPUT, TimeSeriesMessage(data=msg.data * 2, fs=msg.fs)


class _Collector(ez.Unit):
    INPUT = ez.InputStream(TimeSeriesMessage)

    def initialize(self):
        self.items = []

    @ez.subscriber(INPUT)
    async def collect(self, msg):
        self.items.append(int(msg.data[0]))


class _PipeSystem(ez.System):
    SOURCE = _NumberSource()
    DOUBLER = _Doubler()
    SINK = _Collector()
    TAP = _Collector()

    def configure(self):
        self.SOURCE.apply_settings(_NumberSourceSettings(count=5))

    def network(self):
        return (
            (self.SOURCE.OUTPUT, self.DOUBLER.INPUT),
            (self.DOUBLER.OUTPUT, self.SINK.INPUT),
            (self.SOURCE.OUTPUT, self.TAP.INPUT),  # fan-out tap
        )


def test_graph_pipeline_and_fanout():
    system = _PipeSystem()
    ez.run_system(system)
    assert system.SINK.items == [0, 2, 4, 6, 8]
    assert system.TAP.items == [0, 1, 2, 3, 4]


class _SlowBatchCollector(ez.Unit):
    """Coalescing consumer slower than its producer: the first call stalls
    so the source floods the queue; subsequent calls drain in batches."""

    INPUT = ez.InputStream(TimeSeriesMessage)

    def initialize(self):
        self.batches = []

    @ez.subscriber(INPUT)
    @ez.coalescing(4)
    async def collect(self, msgs):
        assert isinstance(msgs, list)  # always a list, even for one
        self.batches.append([int(m.data[0]) for m in msgs])
        if len(self.batches) == 1:
            await asyncio.sleep(0.05)  # let the source outrun us once


class _CoalesceSystem(ez.System):
    SOURCE = _NumberSource()
    SINK = _SlowBatchCollector()

    def configure(self):
        self.SOURCE.apply_settings(_NumberSourceSettings(count=9))

    def network(self):
        return ((self.SOURCE.OUTPUT, self.SINK.INPUT),)


def test_coalescing_subscriber_drains_backlog_in_batches():
    """A coalescing subscriber receives every message exactly once, in
    order, with backlogs delivered as multi-message batches (<= cap), and
    the drain/join accounting stays exact (clean shutdown)."""
    system = _CoalesceSystem()
    ez.run_system(system)
    flat = [i for b in system.SINK.batches for i in b]
    assert flat == list(range(9))
    assert all(1 <= len(b) <= 4 for b in system.SINK.batches)
    # The sleep in the first call guarantees at least one real batch.
    assert any(len(b) > 1 for b in system.SINK.batches)


def test_binary_logger(tmp_path, rng):
    fn = tmp_path / "log.hga.f64"
    logger = BinaryLogger()
    logger.apply_settings(LoggerSettings(filename=str(fn), overwrite=True))
    logger.initialize()
    data = rng.normal(size=(4, 3))
    asyncio.run(logger.write(TimeSeriesMessage(data=data, fs=100)))
    asyncio.run(logger.write(TimeSeriesMessage(data=data * 2, fs=100)))
    logger.shutdown()
    restored = np.fromfile(fn, dtype=np.float64).reshape((-1, 3))
    np.testing.assert_array_equal(restored[:4], data)
    np.testing.assert_array_equal(restored[4:], data * 2)

    # Overwrite protection.
    logger2 = BinaryLogger()
    logger2.apply_settings(LoggerSettings(filename=str(fn), overwrite=False))
    with pytest.raises(PermissionError):
        logger2.initialize()


def test_vad_logger_format(tmp_path):
    fn = tmp_path / "log.vad.lab"
    logger = VoiceActivityDetectionLogger()
    logger.apply_settings(LoggerSettings(filename=str(fn), overwrite=True))
    logger.initialize()
    msg = ClosedLoopMessage(data=np.zeros((120, 2)), fs=100,
                            previous_frames=250)
    asyncio.run(logger.write(msg))
    logger.shutdown()
    assert fn.read_text() == "2.50\t3.70\t120 frames\n"


def test_stage_timer():
    from dss_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    with timer.stage("a"):
        pass
    timer.record("a", 5.0)
    timer.record("b", 1.0)
    summary = timer.summary()
    assert summary["a"]["count"] == 2
    assert summary["b"]["p50_ms"] == 1.0
    timer.log_summary()  # must not raise


class _Exploder(ez.Unit):
    INPUT = ez.InputStream(TimeSeriesMessage)

    def initialize(self):
        self.seen = 0

    @ez.subscriber(INPUT)
    async def boom(self, msg):
        self.seen += 1
        if self.seen == 2:
            raise RuntimeError("boom")


class _ExplodingSystem(ez.System):
    SOURCE = _NumberSource()
    BAD = _Exploder()
    SINK = _Collector()

    def configure(self):
        self.SOURCE.apply_settings(_NumberSourceSettings(count=5))

    def network(self):
        return (
            (self.SOURCE.OUTPUT, self.BAD.INPUT),
            (self.SOURCE.OUTPUT, self.SINK.INPUT),
        )


def test_handler_error_does_not_wedge_graph():
    """A crashing handler drops that message and the graph still drains and
    shuts down cleanly (no deadlocked queue joins)."""
    system = _ExplodingSystem()
    ez.run_system(system)
    assert system.BAD.seen == 5      # kept consuming after the error
    assert system.SINK.items == [0, 1, 2, 3, 4]


class _LeadTracker(ez.Unit):
    """Slow consumer with a bounded input that records how far the source
    ran ahead of it (publisher backpressure check)."""

    INPUT = ez.InputStream(TimeSeriesMessage, maxsize=2)

    def initialize(self):
        self.seen = []
        self.max_lead = 0

    @ez.subscriber(INPUT)
    async def consume(self, msg):
        import asyncio

        await asyncio.sleep(0.005)  # slower than the source
        self.seen.append(int(msg.data[0]))
        self.max_lead = max(self.max_lead,
                            _BackpressureSystem.SOURCE.sent - len(self.seen))


class _CountingSource(_NumberSource):
    @ez.publisher(_NumberSource.OUTPUT)
    async def run(self):
        self.sent = 0
        for i in range(self.SETTINGS.count):
            yield self.OUTPUT, TimeSeriesMessage(data=np.array([i]), fs=1)
            self.sent += 1


class _BackpressureSystem(ez.System):
    SOURCE = _CountingSource()
    SLOW = _LeadTracker()

    def configure(self):
        self.SOURCE.apply_settings(_NumberSourceSettings(count=30))

    def network(self):
        return ((self.SOURCE.OUTPUT, self.SLOW.INPUT),)


def test_bounded_input_applies_backpressure():
    """A bounded input queue must stall the publisher instead of letting
    it run arbitrarily far ahead (reference drop-old conflate semantics
    rely on the publisher stalling at the socket)."""
    system = _BackpressureSystem()
    ez.run_system(system)
    assert system.SLOW.seen == list(range(30))  # in order, none lost
    # maxsize=2 queue + 1 in-flight: the source never leads by more.
    assert system.SLOW.max_lead <= 3, system.SLOW.max_lead


def test_systems_do_not_share_units():
    """Class-declared units are prototypes: every System instance must get
    its own copies, so two systems never alias mutable unit state."""
    a, b = _PipeSystem(), _PipeSystem()
    assert a.SINK is not b.SINK
    assert a.SOURCE is not b.SOURCE
    assert a.SINK is not _PipeSystem.SINK  # prototype itself stays untouched
    ez.run_system(a)
    ez.run_system(b)
    assert a.SINK.items == [0, 2, 4, 6, 8]
    assert b.SINK.items == [0, 2, 4, 6, 8]  # not doubled-up shared state


def test_concurrent_systems_isolated():
    """Two systems running in ONE event loop keep isolated unit state."""

    async def both():
        a, b = _PipeSystem(), _PipeSystem()
        from dss_tpu.runtime.graph import run_system_async

        await asyncio.gather(run_system_async(a), run_system_async(b))
        return a, b

    a, b = asyncio.run(both())
    assert a.SINK.items == [0, 2, 4, 6, 8]
    assert b.SINK.items == [0, 2, 4, 6, 8]
    assert a.TAP.items == [0, 1, 2, 3, 4]
    assert b.TAP.items == [0, 1, 2, 3, 4]


class _Fanner(ez.Unit):
    """Re-publishes each message twice — amplification during drain."""

    INPUT = ez.InputStream(TimeSeriesMessage)
    OUTPUT = ez.OutputStream(TimeSeriesMessage)

    @ez.subscriber(INPUT)
    @ez.publisher(OUTPUT)
    async def process(self, msg):
        yield self.OUTPUT, msg
        yield self.OUTPUT, msg


class _DeepChainSystem(ez.System):
    """Pipeline DEEPER than the unit count +1 sweep the old drain did:
    6 amplifying hops strand messages under a fixed-sweep heuristic if any
    handler re-publishes while the drain is in progress."""

    SOURCE = _NumberSource()
    F1 = _Fanner()
    F2 = _Fanner()
    F3 = _Fanner()
    F4 = _Fanner()
    F5 = _Fanner()
    F6 = _Fanner()
    SINK = _Collector()

    def configure(self):
        self.SOURCE.apply_settings(_NumberSourceSettings(count=3))

    def network(self):
        hops = [self.SOURCE, self.F1, self.F2, self.F3, self.F4, self.F5,
                self.F6, self.SINK]
        return tuple((a.OUTPUT, b.INPUT) for a, b in zip(hops, hops[1:]))


def test_topological_drain_deep_pipeline():
    system = _DeepChainSystem()
    ez.run_system(system)
    # 3 source messages, each amplified 2x over 6 hops = 3 * 64.
    assert len(system.SINK.items) == 3 * 2 ** 6
    assert sorted(set(system.SINK.items)) == [0, 1, 2]


def test_latency_budget_aggregation(tmp_path, capsys):
    """DelayedStdoutForSoX turns per-word stamps into the per-stage budget
    table: stage intervals keyed in path order, p50/p95 over words, one
    device round trip counted per *_device_done interval, and the JSON
    artifact written to budget_path.  Pins the math the closed-loop
    BUDGET_r03 artifacts rely on."""
    import asyncio
    import json
    import time

    from dss_tpu.runtime.units import DelayedStdoutForSoX, SoXOutputSettings

    unit = DelayedStdoutForSoX()
    path = tmp_path / "budget.json"
    unit.apply_settings(SoXOutputSettings(rpc_floor_ms=10.0,
                                          budget_path=str(path),
                                          stall_threshold_ms=5000.0))
    unit.initialize()

    t0 = time.time() - 1.0
    for k in range(4):
        msg = ClosedLoopMessage(
            data=np.zeros(16, np.int16), fs=16000, received_at=t0,
            stamps=(("fe_dispatch", t0 + 0.010),
                    ("fe_device_done", t0 + 0.040),
                    ("dv_dispatch", t0 + 0.045),
                    ("dv_device_done", t0 + 0.100 + 0.010 * k)),
        )
        asyncio.run(unit.print(msg))
    unit.shutdown()
    capsys.readouterr()  # swallow the raw PCM written to stdout

    report = json.loads(path.read_text())
    assert report["n_words"] == 4
    assert report["device_round_trips_per_word"] == 2
    assert report["rpc_floor_ms"] == 10.0
    assert report["tunnel_rpc_share_ms"] == 20.0
    stages = report["stages"]
    # Interval keys in path order, each with p50/p95 over the 4 words.
    assert list(stages)[:2] == ["ingest->fe_dispatch",
                                "fe_dispatch->fe_device_done"]
    assert abs(stages["fe_dispatch->fe_device_done"]["p50"] - 30.0) < 1.0
    assert stages["ingest->fe_dispatch"]["n"] == 4
    # total = ingest -> audio_out wall time; net subtracts the floor share.
    assert report["total_p50_net_of_tunnel_ms"] == \
        stages["total"]["p50"] - 20.0
    assert report["stall_count"] == 0
    assert report["total_p95_net_of_tunnel_ms"] > 0


def test_latency_budget_stalls_and_completions(tmp_path, capsys):
    """Tail-latency accounting (VERDICT r3 item 7): words over the stall
    threshold are counted but excluded from the net-of-tunnel p95; chunked
    words' final-chunk (dv_word_complete) rows aggregate into a separate
    word-completion distribution, not the word-latency table."""
    import asyncio
    import json
    import time

    from dss_tpu.runtime.units import DelayedStdoutForSoX, SoXOutputSettings

    unit = DelayedStdoutForSoX()
    path = tmp_path / "budget.json"
    unit.apply_settings(SoXOutputSettings(
        rpc_floor_ms=10.0, budget_path=str(path),
        stall_threshold_ms=1000.0))
    unit.initialize()

    now = time.time()
    # 9 normal words at ~100 ms + 1 multi-second tunnel stall.
    for k in range(10):
        total_s = 4.0 if k == 9 else 0.100 + 0.001 * k
        t0 = now - total_s
        msg = ClosedLoopMessage(
            data=np.zeros(16, np.int16), fs=16000, received_at=t0,
            stamps=(("dv_dispatch", t0 + 0.005),
                    ("dv_device_done", now - 0.001)),
        )
        asyncio.run(unit.print(msg))
        # Each word's final chunk lands ~40 ms later with the marker.
        t_done = now + 0.040
        fin = ClosedLoopMessage(
            data=np.zeros(16, np.int16), fs=16000, received_at=t0,
            stamps=(("dv_dispatch", t0 + 0.005),
                    ("dv_word_complete", t_done)),
        )
        asyncio.run(unit.print(fin))
    # Interior chunks (no received_at) must not count anywhere.
    asyncio.run(unit.print(ClosedLoopMessage(
        data=np.zeros(16, np.int16), fs=16000, received_at=None)))
    unit.shutdown()
    capsys.readouterr()

    report = json.loads(path.read_text())
    assert report["n_words"] == 10
    assert report["stall_count"] == 1
    assert report["stall_threshold_ms"] == 1000.0
    # p95 net of tunnel is over the 9 non-stalled words only: all under
    # 110 ms total minus the 20 ms floor share.
    assert report["total_p95_net_of_tunnel_ms"] < 110.0
    # ... while the all-words p95 in the table still carries the stall.
    assert report["stages"]["total"]["p95"] > 1000.0
    comp = report["word_complete"]
    assert comp["n"] == 10
    assert comp["p50"] > report["stages"]["total"]["p50"]
