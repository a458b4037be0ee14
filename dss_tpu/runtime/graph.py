"""Asyncio streaming dataflow graph — the framework's ezmsg equivalent.

Parity target: the reference builds its online system on ezmsg 3.0.0
(``ez.Unit``, ``ez.System``, ``ez.Settings``, ``ez.State``, ``InputStream``/
``OutputStream``, ``ez.run_system`` — used throughout local/units.py and
decode_online.py:42-169).  This module provides the same public surface so a
system definition reads identically to the reference's.

Runtime design difference, on purpose: ezmsg spawns units across OS
processes; here every unit is an asyncio task in ONE process, because the
TPU device context must be owned by a single process — the heavy math lives
in jitted device programs whose dispatch is already asynchronous, so
process-parallelism would only add serialization boundaries.  Units
communicate over per-edge asyncio queues; backpressure semantics at the
network ingest (drop-old, HWM=1) stay in the ZMQ socket options exactly as
in the reference.
"""

from __future__ import annotations

import asyncio
import dataclasses
import inspect
import logging
from typing import Any, Dict, Iterable, List, Optional, Tuple

logger = logging.getLogger("dss_tpu.runtime")


def _make_dataclass_subclass(cls):
    """Turn an annotated subclass into a dataclass (Settings/State bases)."""
    return dataclasses.dataclass(cls)


class Settings:
    """Immutable-by-convention unit configuration."""

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        _make_dataclass_subclass(cls)


class State:
    """Mutable per-unit state. Annotated fields become dataclass fields; all
    must have defaults (or Optional) so units can auto-instantiate."""

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        _make_dataclass_subclass(cls)


class _Stream:
    """Descriptor identifying a unit port. Accessing through an instance
    yields a port handle bound to that unit instance."""

    def __init__(self, msg_type: Any = None, maxsize: int = 0):
        self.msg_type = msg_type
        # For InputStream: edge queue capacity. 0 = unbounded (default).
        # A bounded input applies backpressure to its publishers: when the
        # consumer falls behind, publish() awaits, the upstream source
        # stalls, and drop-old semantics at the network socket (ZMQ
        # RCVHWM/conflate) shed stale packets — keeping end-to-end latency
        # bounded under overload instead of queueing it (the reference gets
        # the same behavior from its conflate SUB socket). Only safe on
        # acyclic routes: a bounded edge inside a publish cycle can
        # deadlock (every graph in this repo is a DAG).
        self.maxsize = maxsize
        self.name: Optional[str] = None

    def __set_name__(self, owner, name):
        self.name = name

    def __get__(self, instance, owner=None):
        if instance is None:
            return self
        return BoundStream(instance, self)


class InputStream(_Stream):
    pass


class OutputStream(_Stream):
    pass


class BoundStream:
    def __init__(self, unit: "Unit", stream: _Stream):
        self.unit = unit
        self.stream = stream

    def __hash__(self):
        return hash((id(self.unit), id(self.stream)))

    def __eq__(self, other):
        return (isinstance(other, BoundStream)
                and self.unit is other.unit
                and self.stream is other.stream)

    def __repr__(self):
        return f"{type(self.unit).__name__}.{self.stream.name}"


def subscriber(stream: _Stream):
    """Mark a coroutine as the consumer of an input stream."""

    def deco(fn):
        fn._dss_subscribes = stream
        return fn

    return deco


def publisher(stream: _Stream):
    """Mark an async generator as producing (stream, message) pairs."""

    def deco(fn):
        fn._dss_publishes = stream
        return fn

    return deco


def main_loop(fn):
    """Mark a source coroutine with no input stream (runs once as a task)."""
    fn._dss_main = True
    return fn


def coalescing(max_batch: int):
    """Mark a subscriber as batch-capable: when messages are waiting, the
    runner drains up to ``max_batch`` immediately-available messages and
    calls the handler ONCE with the list (always a list, even for one).

    This is the latency-bounding primitive for consumers whose per-call
    cost is dominated by a fixed dispatch overhead (a tunneled device
    round trip can exceed the packet period, at which point a one-at-a-
    time consumer builds an O(queue bound) backlog: measured 481 ms p50
    ingest->dispatch wait at a 47 ms round trip on 40 ms packets).  A
    coalescing consumer amortizes that fixed cost over the backlog and
    keeps queue wait at ~one in-flight call regardless of round-trip
    jitter."""

    def deco(fn):
        fn._dss_coalesce = int(max_batch)
        return fn

    return deco


class Unit:
    """Base class for graph nodes.

    Subclasses declare ``SETTINGS: SomeSettings`` / ``STATE: SomeState``
    annotations plus class-level InputStream/OutputStream ports, exactly like
    the reference's ezmsg units.
    """

    def __init__(self, settings: Optional[Settings] = None):
        self.SETTINGS = settings
        state_cls = self.__class__.__annotations__.get("STATE")
        self.STATE = state_cls() if isinstance(state_cls, type) else None

    def apply_settings(self, settings: Settings) -> None:
        self.SETTINGS = settings

    def initialize(self) -> None:  # noqa: B027
        pass

    def shutdown(self) -> None:  # noqa: B027
        pass

    def _handlers(self) -> List[Tuple[Optional[_Stream], Any]]:
        out = []
        for name in dir(type(self)):
            fn = getattr(type(self), name, None)
            if fn is None or not callable(fn):
                continue
            if hasattr(fn, "_dss_subscribes") or hasattr(fn, "_dss_main") or (
                hasattr(fn, "_dss_publishes")
                and not hasattr(fn, "_dss_subscribes")
            ):
                out.append((getattr(fn, "_dss_subscribes", None),
                            getattr(self, name)))
        return out


NetworkDefinition = Iterable[Tuple[BoundStream, BoundStream]]


class System:
    """A configured collection of units plus their wiring.

    Units are declared as class attributes (instantiated at class definition,
    like the reference's ``CONNECTOR = ZMQConnector()``); ``configure()``
    applies settings; ``network()`` returns (output, input) port pairs.
    """

    SETTINGS: Optional[Settings] = None

    def __init__(self, settings: Optional[Settings] = None):
        self.SETTINGS = settings
        # Bind per-instance COPIES of the class-level units so two systems
        # never share mutable unit state.  Class-declared units are
        # prototypes (mirroring the reference's `CONNECTOR = ZMQConnector()`
        # style); each System instance re-instantiates them, falling back to
        # a deep copy for unit classes with a custom constructor signature.
        import copy

        for name, value in list(vars(type(self)).items()):
            if isinstance(value, Unit):
                try:
                    clone = type(value)(settings=value.SETTINGS)
                except TypeError:
                    clone = copy.deepcopy(value)
                setattr(self, name, clone)

    def configure(self) -> None:  # noqa: B027
        pass

    def network(self) -> NetworkDefinition:
        return ()

    def units(self) -> List[Unit]:
        """Active units = the instance's own attributes; ``configure()`` may
        delattr class-declared units it decides not to use (e.g. optional
        fused paths), and those must not be initialized."""
        seen: List[Unit] = []
        for value in vars(self).values():
            if isinstance(value, Unit) and value not in seen:
                seen.append(value)
        return seen


class _Router:
    """Fan-out of published messages to all subscribed edge queues.

    Backpressure observability: queues are unbounded (ezmsg-style; drop-old
    semantics live at the ZMQ ingest), but a unit that falls behind is worth
    knowing about — depth is logged each time a queue doubles past the
    threshold."""

    QUEUE_WARN_DEPTH = 64

    def __init__(self):
        self.routes: Dict[BoundStream, List[asyncio.Queue]] = {}
        self._warned_depth: Dict[int, int] = {}

    def connect(self, src: BoundStream, queue: asyncio.Queue) -> None:
        self.routes.setdefault(src, []).append(queue)

    async def publish(self, port: BoundStream, message: Any) -> None:
        for q in self.routes.get(port, ()):
            await q.put(message)
            depth = q.qsize()
            if depth >= self._warned_depth.get(id(q), self.QUEUE_WARN_DEPTH):
                self._warned_depth[id(q)] = depth * 2
                logger.warning(
                    f"queue depth {depth} on edge from {port} — consumer "
                    f"is falling behind"
                )


async def _run_source(unit: Unit, fn, router: _Router) -> None:
    result = fn()
    if inspect.isasyncgen(result):
        async for item in result:
            if item is None:
                continue
            port_ref, message = item
            await router.publish(_bind(unit, port_ref), message)
    else:
        await result


def _bind(unit: Unit, port_ref) -> BoundStream:
    if isinstance(port_ref, BoundStream):
        return port_ref
    return BoundStream(unit, port_ref)


async def _run_subscriber(unit: Unit, fn, queue: asyncio.Queue,
                          router: _Router) -> None:
    peak = 0
    coalesce = getattr(fn, "_dss_coalesce", 0)
    stop_after = False
    while True:
        depth = queue.qsize()
        if depth > peak:
            # High-watermark observability: a large peak on an unbounded
            # edge means the consumer lagged and messages piled up in
            # memory (each raw 40 ms packet is ~41 KB).
            peak = depth
            queue._dss_peak = peak
        message = await queue.get()
        if message is _SHUTDOWN:
            queue.task_done()
            break
        extra = 0
        if coalesce > 1:
            batch = [message]
            while len(batch) < coalesce:
                try:
                    nxt = queue.get_nowait()
                except asyncio.QueueEmpty:
                    break
                extra += 1
                if nxt is _SHUTDOWN:
                    stop_after = True
                    break
                batch.append(nxt)
            message = batch
        try:
            result = fn(message)
            if inspect.isasyncgen(result):
                async for item in result:
                    if item is None:
                        continue
                    port_ref, out_msg = item
                    await router.publish(_bind(unit, port_ref), out_msg)
            elif inspect.iscoroutine(result):
                await result
        except Exception:
            # Contain per-message failures: a crashing handler must not
            # wedge the whole graph (queue joins would deadlock) — log and
            # keep consuming, mirroring the reference's swallow-per-job
            # behavior (local/training.py:196-198).  With coalescing the
            # handler saw a drained batch, so say how many messages the
            # failure cost, not just "message dropped".
            n_lost = len(message) if isinstance(message, list) else 1
            logger.exception(
                f"handler error in {type(unit).__name__}.{fn.__name__}; "
                f"{n_lost} message(s) dropped"
            )
        finally:
            queue.task_done()
            for _ in range(extra):
                queue.task_done()
        if stop_after:
            break


class _Shutdown:
    pass


_SHUTDOWN = _Shutdown()


def _topo_order(units: List[Unit], edges) -> Optional[List[Unit]]:
    """Kahn topological order of units over the edge graph (declaration
    order among ready units, for determinism).  Returns None on a cycle."""
    from collections import deque

    by_id = {id(u): u for u in units}
    adj: Dict[int, set] = {id(u): set() for u in units}
    indeg: Dict[int, int] = {id(u): 0 for u in units}
    for src, dst in edges:
        a, b = id(src.unit), id(dst.unit)
        if a in adj and b in adj and a != b and b not in adj[a]:
            adj[a].add(b)
            indeg[b] += 1

    ready = deque(id(u) for u in units if indeg[id(u)] == 0)
    out: List[Unit] = []
    while ready:
        n = ready.popleft()
        out.append(by_id[n])
        for m in adj[n]:
            indeg[m] -= 1
            if indeg[m] == 0:
                ready.append(m)
    return out if len(out) == len(units) else None


async def run_system_async(system: System,
                           duration: Optional[float] = None) -> None:
    system.configure()
    units = system.units()
    router = _Router()

    # One queue per (unit, subscriber handler); connect network edges.
    sub_queues: Dict[Tuple[int, int], asyncio.Queue] = {}
    handler_map: Dict[Unit, List[Tuple[Optional[_Stream], Any]]] = {
        u: u._handlers() for u in units
    }

    edges = list(system.network())
    for u in units:
        for stream, fn in handler_map[u]:
            if stream is not None:
                sub_queues[(id(u), id(stream))] = asyncio.Queue(
                    maxsize=getattr(stream, "maxsize", 0))

    for src, dst in edges:
        key = (id(dst.unit), id(dst.stream))
        if key not in sub_queues:
            raise ValueError(f"No subscriber handler for {dst}")
        router.connect(src, sub_queues[key])

    for u in units:
        u.initialize()
    logger.info(
        f"System initialized ({len(units)} units) — starting sources."
    )

    source_tasks: List[asyncio.Task] = []
    sub_tasks: List[Tuple[asyncio.Queue, asyncio.Task]] = []
    try:
        for u in units:
            for stream, fn in handler_map[u]:
                if stream is None:
                    source_tasks.append(
                        asyncio.create_task(_run_source(u, fn, router))
                    )
                else:
                    q = sub_queues[(id(u), id(stream))]
                    sub_tasks.append(
                        (q, asyncio.create_task(
                            _run_subscriber(u, fn, q, router)))
                    )

        if duration is not None:
            if source_tasks:
                done, pending = await asyncio.wait(
                    source_tasks, timeout=duration)
                # "Run for N seconds" means stop ingesting at N: cancel the
                # still-running sources BEFORE draining, so the drain below
                # is exact (no publishes race the queue joins).
                for t in pending:
                    t.cancel()
                await asyncio.gather(*pending, return_exceptions=True)
        else:
            if source_tasks:
                await asyncio.gather(*source_tasks)

        # Sources finished: drain subscribers in topological order.  Joining
        # a unit's input queues only after every upstream unit has fully
        # drained guarantees no message is stranded, regardless of pipeline
        # depth or handlers that re-publish during the drain (publishes
        # happen before task_done, so downstream queues see them before
        # their own join).  A cyclic graph (none in this repo) falls back to
        # repeated sweeps.
        order = _topo_order(units, edges)
        if order is not None:
            for u in order:
                for stream, _fn in handler_map[u]:
                    if stream is not None:
                        await sub_queues[(id(u), id(stream))].join()
        else:
            for _ in range(len(units) + 1):
                for q, _t in sub_tasks:
                    await q.join()
        for q, _t in sub_tasks:
            await q.put(_SHUTDOWN)
        for _q, t in sub_tasks:
            await t
        peaks = {}
        for u in units:
            for stream, _fn in handler_map[u]:
                if stream is None:
                    continue
                q = sub_queues[(id(u), id(stream))]
                peak = getattr(q, "_dss_peak", 0)
                if peak > 4:
                    peaks[type(u).__name__] = peak
        if peaks:
            logger.info(f"queue high-watermarks (messages): {peaks}")
    finally:
        for t in source_tasks:
            if not t.done():
                t.cancel()
        for u in units:
            try:
                u.shutdown()
            except Exception:  # shutdown hooks must not mask each other
                logger.exception(f"shutdown failed for {type(u).__name__}")


def run_system(system: System, duration: Optional[float] = None) -> None:
    """Run a system until its sources complete (or ``duration`` elapses),
    then drain in-flight messages and invoke every unit's shutdown hook."""
    try:
        asyncio.run(run_system_async(system, duration))
    except KeyboardInterrupt:
        logger.info("Interrupted — shutting down system.")
