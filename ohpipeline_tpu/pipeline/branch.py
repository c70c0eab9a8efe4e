"""Branching and async-source elements: Brancher, SenderThread,
AsyncTrackObserver, SpotifyReporter/AirplayReporter, AudioDumper.

Parity targets: Brancher.h:69-127 (tee cloning msgs to an attached branch
— the Songcast sender attach point, SourceReceiver.cpp:520-531),
SenderThread.cpp (decouples the branch from pipeline timing),
AsyncTrackObserver.cpp (out-of-band track/metadata injection),
SpotifyReporter/AirplayReporter (sample-counting + out-of-band track
change), AudioDumper (debug tap writing encoded audio to disk).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Optional

import numpy as np

from ..core import events as ev
from .elements import Element, Pushable


class Brancher(Element):
    """Tee: passes events downstream unchanged while cloning them to an
    attached branch (exclusive=True detaches the main path instead — the
    Bluetooth-offload variant)."""

    def __init__(self, upstream, name: str = "", exclusive: bool = False):
        super().__init__(upstream, name)
        self._branch: Optional[Pushable] = None
        self.exclusive = exclusive
        self._lock = threading.Lock()

    def attach(self, branch: Pushable) -> None:
        with self._lock:
            self._branch = branch

    def detach(self) -> None:
        with self._lock:
            self._branch = None

    def pull(self) -> ev.Event:
        e = self._next()
        with self._lock:
            branch = self._branch
        if branch is not None:
            if isinstance(e, ev.AudioPcmEvent):
                clone = ev.AudioPcmEvent(e.samples, e.info,
                                         e.track_offset_jiffies, e.ramp,
                                         e.attenuation)
                branch.push(clone)
            elif e.kind in ("decoded_stream", "track", "metatext", "halt",
                            "mode", "drain"):
                branch.push(e)
            if self.exclusive and isinstance(e, ev.AudioPcmEvent):
                return ev.SilenceEvent(e.jiffies, e.info)
        return e


class SenderThread(Pushable):
    """Decouples a pipeline branch from audio-thread timing
    (SenderThread.cpp): events are queued and drained by a worker that
    feeds the sink (e.g. net.songcast.OhmSender)."""

    def __init__(self, sink: Callable[[ev.Event], None],
                 max_events: int = 256, name: str = "SenderThread"):
        self._sink = sink
        self._q: "queue.Queue[ev.Event]" = queue.Queue(max_events)
        self._quit = False
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name=name)
        self._thread.start()

    def push(self, event: ev.Event) -> None:
        try:
            self._q.put_nowait(event)
        except queue.Full:
            # sender slower than realtime: drop oldest (the reference
            # discards when its fifo fills rather than stalling audio)
            try:
                self._q.get_nowait()
                self._q.put_nowait(event)
            except queue.Empty:
                pass

    def _run(self) -> None:
        while not self._quit:
            try:
                e = self._q.get(timeout=0.2)
            except queue.Empty:
                continue
            self._sink(e)
            if e.kind == "quit":
                break

    def quit(self) -> None:
        self._quit = True
        self._thread.join(1.0)


class SongcastBranch(Pushable):
    """Glue: pipeline branch events -> net.songcast.OhmSender frames
    (the reference's Sender element, Av/Songcast/Sender)."""

    FRAME_SAMPLES = 1024

    def __init__(self, sender):
        self._sender = sender
        self._info = None
        self._pending = None
        self._sample_pos = 0

    def push(self, e: ev.Event) -> None:
        if e.kind == "decoded_stream":
            self._info = e.info
        elif e.kind == "track":
            self._sender.send_track(e.track.uri, e.track.metadata)
        elif e.kind == "metatext":
            self._sender.send_metatext(e.text)
        elif isinstance(e, ev.AudioPcmEvent) and self._info is not None:
            samples = e.samples
            if self._pending is not None:
                samples = np.concatenate([self._pending, samples], axis=1)
            pos = 0
            while samples.shape[1] - pos >= self.FRAME_SAMPLES:
                chunk = samples[:, pos:pos + self.FRAME_SAMPLES]
                self._sender.send_audio(
                    chunk, self._info.sample_rate, self._info.bit_depth,
                    sample_start=self._sample_pos)
                self._sample_pos += self.FRAME_SAMPLES
                pos += self.FRAME_SAMPLES
            self._pending = samples[:, pos:] if pos < samples.shape[1] \
                else None
        elif e.kind == "halt":
            if self._pending is not None and self._info is not None:
                self._sender.send_audio(self._pending,
                                        self._info.sample_rate,
                                        self._info.bit_depth,
                                        sample_start=self._sample_pos,
                                        halt=True)
                self._pending = None


class IciBranch(Pushable):
    """Multiroom distribution over the device mesh: the Songcast sender
    semantics (SongcastBranch above; reference Av/Songcast/OhmSender)
    carried by an ICI all-gather instead of UDP multicast — attach to a
    Brancher exactly like SongcastBranch, but the master mix reaches
    every device ("room") of a jax.sharding.Mesh through
    parallel.room_fanout (SURVEY.md §2.7/§5.8).

    Branch PCM accumulates into fixed-shape tiles (static shapes keep
    ONE compiled fan-out program; partial tail tiles are zero-padded on
    halt), each tile rides the collective, and rooms() exposes the
    per-device replicas of the last tile plus its peak meter for
    observers/tests."""

    TILE = 1024

    def __init__(self, mesh):
        import jax
        from .. import parallel
        self._mesh = mesh
        self._pending = None
        self._last = None
        self._peak = 0.0
        self.tiles_sent = 0
        self._fn = jax.jit(lambda t: parallel.room_fanout(mesh, t))

    def push(self, e: ev.Event) -> None:
        if e.kind == "decoded_stream":
            # new stream format: drop any partial tile of the previous
            # track (its channel count may differ)
            self._pending = None
        elif isinstance(e, ev.AudioPcmEvent):
            samples = np.asarray(e.samples, np.float32)
            if self._pending is not None:
                samples = np.concatenate([self._pending, samples], axis=1)
            pos = 0
            while samples.shape[1] - pos >= self.TILE:
                self._send(samples[:, pos:pos + self.TILE])
                pos += self.TILE
            self._pending = samples[:, pos:] if pos < samples.shape[1] \
                else None
        elif e.kind == "halt" and self._pending is not None:
            tile = np.zeros((self._pending.shape[0], self.TILE),
                            np.float32)
            tile[:, :self._pending.shape[1]] = self._pending
            self._pending = None
            self._send(tile)

    def _send(self, tile: np.ndarray) -> None:
        with self._mesh:
            full, peak = self._fn(tile)
        self._last = full
        self._peak = float(peak)
        self.tiles_sent += 1

    def rooms(self) -> list:
        """Per-device replicas of the last distributed tile (every room
        must hold the identical full master mix)."""
        if self._last is None:
            return []
        return [np.asarray(s.data) for s in self._last.addressable_shards]

    @property
    def peak(self) -> float:
        return self._peak


class AsyncTrackObserver(Element):
    """Out-of-band track/metadata injection for async sources
    (AsyncTrackObserver.cpp): external callers post track/metadata that
    get emitted at the next pull boundary."""

    def __init__(self, upstream, name=""):
        super().__init__(upstream, name)
        self._lock = threading.Lock()
        self._pending: list[ev.Event] = []

    def track_changed(self, uri: str, metadata: str = "") -> None:
        with self._lock:
            self._pending.append(ev.TrackEvent(ev.Track(uri, metadata)))

    def metadata_changed(self, text: str) -> None:
        with self._lock:
            self._pending.append(ev.MetaTextEvent(text))

    def pull(self) -> ev.Event:
        with self._lock:
            if self._pending:
                return self._pending.pop(0)
        return self._next()


class SampleReporter(Element):
    """Sample-counting reporter base (SpotifyReporter/AirplayReporter,
    SURVEY §2.1 row 18): counts decoded samples per stream so out-of-band
    sources can map their own timeline onto pipeline time, and swaps
    in out-of-band track metadata."""

    def __init__(self, upstream, name=""):
        super().__init__(upstream, name)
        self.sample_count = 0
        self._rate = 0
        self._lock = threading.Lock()
        self._pending_track: Optional[ev.TrackEvent] = None

    def track_changed(self, uri: str, metadata: str = "") -> None:
        with self._lock:
            self._pending_track = ev.TrackEvent(ev.Track(uri, metadata))

    @property
    def track_position_ms(self) -> int:
        with self._lock:
            return (self.sample_count * 1000 // self._rate) if self._rate \
                else 0

    def flush_sample_count(self) -> None:
        with self._lock:
            self.sample_count = 0

    def pull(self) -> ev.Event:
        with self._lock:
            if self._pending_track is not None:
                t, self._pending_track = self._pending_track, None
                return t
        e = self._next()
        if e.kind == "decoded_stream":
            with self._lock:
                self._rate = e.info.sample_rate
                self.sample_count = 0
        elif isinstance(e, ev.AudioPcmEvent):
            with self._lock:
                self.sample_count += e.num_samples
        return e


SpotifyReporter = SampleReporter
AirplayReporter = SampleReporter


class AudioDumper(Element):
    """Debug tap writing encoded audio to a file (AudioDumper.cpp,
    enabled via EPipelineSupportElementsAudioDumper)."""

    def __init__(self, upstream, path: str, name=""):
        super().__init__(upstream, name)
        self._f = open(path, "wb")

    def pull(self) -> ev.Event:
        e = self._next()
        if e.kind == "encoded_audio":
            self._f.write(e.data)
        elif e.kind in ("halt", "quit"):
            self._f.flush()
        return e

    def close(self) -> None:
        self._f.close()
