"""Pins: numbered shortcut slots that replay a serialisable invocation.

Parity target: OpenHome/Av/Pins/Pins.h:64-257 — Pin records (mode, type,
uri, title, description, artwork, shuffle), a device pin set persisted to
the store, an account pin set hook, and IPinInvoker dispatch by mode; the
reference ships invokers for playlist/radio/TuneIn/Tidal/Qobuz/
CalmRadio/podcasts/transport/URLs — the local ones live here.
"""

from __future__ import annotations

import json
import threading
from dataclasses import asdict, dataclass, field
from typing import Callable, Optional

from .config import RamStore, StoreKeyNotFound

DEVICE_PINS = 6       # reference default device pin count
ACCOUNT_PINS = 10


@dataclass(slots=True)
class Pin:
    mode: str = ""        # invoker id: "playlist", "radio", "transport"...
    type: str = ""
    uri: str = ""
    title: str = ""
    description: str = ""
    artwork_uri: str = ""
    shuffle: bool = False

    @property
    def empty(self) -> bool:
        return not self.mode

    def to_json(self) -> str:
        return json.dumps(asdict(self))

    @staticmethod
    def from_json(raw: str) -> "Pin":
        try:
            return Pin(**json.loads(raw))
        except (ValueError, TypeError):
            return Pin()


class PinInvoker:
    """One pin mode handler (IPinInvoker, Pins.h:64)."""

    mode: str = "?"

    def invoke(self, pin: Pin) -> None:
        raise NotImplementedError


class PinsManager:
    """Device pin set + invoker dispatch (PinsManager, Pins.h:180)."""

    def __init__(self, store: RamStore, device_pins: int = DEVICE_PINS):
        self._store = store
        self._pins = [Pin() for _ in range(device_pins)]
        self._invokers: dict[str, PinInvoker] = {}
        self._observers: list[Callable[[int], None]] = []
        self._lock = threading.RLock()
        for i in range(device_pins):
            try:
                self._pins[i] = Pin.from_json(
                    store.read(f"Pins.{i}").decode())
            except StoreKeyNotFound:
                pass

    def add_invoker(self, invoker: PinInvoker) -> None:
        self._invokers[invoker.mode] = invoker

    def modes(self) -> list[str]:
        return sorted(self._invokers)

    def add_observer(self, cb: Callable[[int], None]) -> None:
        self._observers.append(cb)

    def _notify(self, index: int) -> None:
        for cb in self._observers:
            cb(index)

    # -- pin set (ProviderPins actions) --------------------------------------
    def count(self) -> int:
        return len(self._pins)

    def pin(self, index: int) -> Pin:
        with self._lock:
            return self._pins[index]

    def set_pin(self, index: int, pin: Pin) -> None:
        if pin.mode and pin.mode not in self._invokers:
            raise KeyError(f"no invoker for mode {pin.mode!r}")
        with self._lock:
            self._pins[index] = pin
            self._store.write(f"Pins.{index}", pin.to_json().encode())
        self._notify(index)

    def clear_pin(self, index: int) -> None:
        self.set_pin(index, Pin())

    def swap(self, a: int, b: int) -> None:
        with self._lock:
            self._pins[a], self._pins[b] = self._pins[b], self._pins[a]
            self._store.write(f"Pins.{a}", self._pins[a].to_json().encode())
            self._store.write(f"Pins.{b}", self._pins[b].to_json().encode())
        self._notify(a)
        self._notify(b)

    def invoke(self, index: int) -> None:
        with self._lock:
            pin = self._pins[index]
        if pin.empty:
            raise LookupError(f"pin {index} empty")
        invoker = self._invokers.get(pin.mode)
        if invoker is None:
            raise KeyError(f"no invoker for mode {pin.mode!r}")
        invoker.invoke(pin)

    def id_array(self) -> list[str]:
        with self._lock:
            return [p.to_json() for p in self._pins]


# -- local invokers (the reference's PinInvoker* family) ---------------------

class TransportPinInvoker(PinInvoker):
    """Play/pause/stop shortcuts (PinInvokerTransport)."""

    mode = "transport"

    def __init__(self, pipeline_manager):
        self._pm = pipeline_manager

    def invoke(self, pin: Pin) -> None:
        action = pin.uri or pin.type
        if action == "play":
            self._pm.play()
        elif action == "pause":
            self._pm.pause()
        elif action == "stop":
            self._pm.stop()
        else:
            raise ValueError(f"unknown transport pin {action!r}")


class UrlPinInvoker(PinInvoker):
    """Play an arbitrary URI (PinInvokerUrl)."""

    mode = "url"

    def __init__(self, pipeline_manager):
        self._pm = pipeline_manager

    def invoke(self, pin: Pin) -> None:
        self._pm.play_uri(pin.uri, pin.description)


class RadioPinInvoker(PinInvoker):
    """Play a radio preset or station URI (PinInvokerRadio)."""

    mode = "radio"

    def __init__(self, source_radio):
        self._radio = source_radio

    def invoke(self, pin: Pin) -> None:
        if pin.type == "preset":
            self._radio.play_preset(int(pin.uri))
        else:
            self._radio.play_uri(pin.uri, pin.description)


class PlaylistPinInvoker(PinInvoker):
    """Start the playlist source, optionally at a track and shuffled
    (PinInvokerPlaylist)."""

    mode = "playlist"

    def __init__(self, source_playlist, product):
        self._playlist = source_playlist
        self._product = product

    def invoke(self, pin: Pin) -> None:
        self._product.set_source_by_name(self._playlist.system_name)
        self._playlist.provider.set_shuffle(pin.shuffle)
        if pin.uri:
            self._playlist.seek_id(int(pin.uri))
        else:
            self._playlist._pm.play()


class ServiceCatalogPinInvoker(PinInvoker):
    """Streaming-service catalogue pins (TidalPins.cpp / QobuzPins.cpp):
    a pin like ``tidal://album/123`` or ``qobuz://playlist/9?shuffle=1``
    resolves the container to tracks through the service's catalogue
    client and loads them into the playlist source.

    ``browse(kind, ident)`` is the injected catalogue callable returning
    a list of ``TrackMetadata``; per-service invokers bind it to
    TidalCatalogue / QobuzCatalogue methods."""

    def __init__(self, mode: str, browse, source_playlist, product):
        self.mode = mode
        self._browse = browse
        self._playlist = source_playlist
        self._product = product

    def invoke(self, pin: Pin) -> None:
        from urllib.parse import urlparse
        from .misc import didl_lite
        u = urlparse(pin.uri)
        kind = u.netloc            # album / playlist / artist / track ...
        ident = u.path.lstrip("/")
        tracks = self._browse(kind, ident)
        if not tracks:
            raise ValueError(f"{self.mode} pin found no tracks: {pin.uri}")
        self._product.set_source_by_name(self._playlist.system_name)
        db = self._playlist.db
        db.delete_all()
        after = 0
        for md in tracks:
            after = db.insert(after, md.uri, didl_lite(md))
        self._playlist.provider.set_shuffle(pin.shuffle)
        self._playlist.activate(auto_play=True)


def tidal_pin_invoker(catalogue, token_id: str, source_playlist, product):
    """TidalPins: map pin kinds onto TidalCatalogue requests."""

    def browse(kind: str, ident: str):
        if kind == "album":
            return catalogue.album_tracks(ident, token_id)
        if kind == "playlist":
            return catalogue.playlist_tracks(ident, token_id)
        if kind == "artist":
            return catalogue.artist_top_tracks(ident, token_id)
        if kind == "favorites":
            return catalogue.favorite_tracks(ident, token_id)
        if kind == "genre":
            return catalogue.genre_tracks(ident, token_id)
        if kind == "track":
            return [catalogue.track(ident, token_id)]
        raise ValueError(f"unknown tidal pin kind {kind!r}")
    return ServiceCatalogPinInvoker("tidal", browse, source_playlist,
                                    product)


def qobuz_pin_invoker(catalogue, source_playlist, product):
    """QobuzPins: map pin kinds onto QobuzCatalogue requests."""

    def browse(kind: str, ident: str):
        if kind == "album":
            return catalogue.album_tracks(ident)
        if kind == "playlist":
            return catalogue.playlist_tracks(ident)
        if kind == "favorites":
            return catalogue.favorite_tracks()
        if kind == "track":
            return [catalogue.track(ident)]
        raise ValueError(f"unknown qobuz pin kind {kind!r}")
    return ServiceCatalogPinInvoker("qobuz", browse, source_playlist,
                                    product)
