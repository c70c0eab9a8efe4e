"""Volume management: the composable volume element chain.

Parity target: OpenHome/Av/VolumeManager.h:63-741 — a stack of small
IVolume decorators (user -> limiter -> reporter -> source offset -> unity
gain -> ramper -> muter), balance/fade, per-channel trim, VolumeConfig
persistence, IVolumeProfile limits.

Volume unit convention follows the reference: integer volume in
`binary-milli-db` steps via VolumeConfig (user range 0..max in steps of
`volume_step`); the final stage maps to a linear multiplier for the
device gain chain (ops.pcm.apply_gain) or to a hardware IVolume driver.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

from .config import ConfigManager


class VolumeOutOfRange(ValueError):
    pass


class IVolume:
    def set_volume(self, volume: int) -> None:
        raise NotImplementedError


class VolumeProfile:
    """IVolumeProfile (VolumeManager.h:63): device capabilities."""

    def __init__(self, max_volume=100, default_volume=45, step=1,
                 default_limit=85, milli_db_per_step=1024, fade_max=10,
                 balance_max=12, offset_max=15, always_on=False):
        self.max_volume = max_volume
        self.default_volume = default_volume
        self.step = step
        self.default_limit = default_limit
        self.milli_db_per_step = milli_db_per_step
        self.fade_max = fade_max
        self.balance_max = balance_max
        self.offset_max = offset_max
        self.always_on = always_on


class VolumeElement(IVolume):
    """Base decorator: passes volume downstream."""

    def __init__(self, downstream: IVolume):
        self._down = downstream

    def set_volume(self, volume: int) -> None:
        self._down.set_volume(volume)


class VolumeUser(VolumeElement):
    """Entry element: clamps to the user range, restores startup volume
    (reference VolumeUser, VolumeManager.h:200)."""

    def __init__(self, downstream, profile: VolumeProfile,
                 config: ConfigManager):
        super().__init__(downstream)
        self.profile = profile
        self._startup = config.create_num(
            "Volume.StartupValue", 0, profile.max_volume,
            profile.default_volume)
        self._startup_enabled = config.create_choice(
            "Volume.StartupEnabled", {0: "Off", 1: "On"}, 1)
        self.volume = (self._startup.value if self._startup_enabled.value
                       else profile.default_volume)
        self._down.set_volume(self.volume)

    def set_volume(self, volume: int) -> None:
        if not 0 <= volume <= self.profile.max_volume:
            raise VolumeOutOfRange(volume)
        self.volume = volume
        self._down.set_volume(volume)


class VolumeLimiter(VolumeElement):
    """Caps volume at a configurable limit (reference VolumeLimiter)."""

    def __init__(self, downstream, profile: VolumeProfile,
                 config: ConfigManager):
        super().__init__(downstream)
        self._current = 0
        self._limit = config.create_num("Volume.Limit", 0,
                                        profile.max_volume,
                                        profile.default_limit)
        self._limit.subscribe(self._on_limit)

    def _on_limit(self, key, value):
        if self._current > value:
            self._down.set_volume(value)

    def set_volume(self, volume: int) -> None:
        self._current = volume
        self._down.set_volume(min(volume, self._limit.value))


class VolumeReporter(VolumeElement):
    """Fans the post-limit volume out to observers (UPnP/ODP eventing)."""

    def __init__(self, downstream):
        super().__init__(downstream)
        self._observers: list[Callable[[int], None]] = []
        self.volume = 0

    def add_observer(self, cb: Callable[[int], None]) -> None:
        self._observers.append(cb)
        cb(self.volume)

    def set_volume(self, volume: int) -> None:
        self.volume = volume
        for cb in self._observers:
            cb(volume)
        self._down.set_volume(volume)


class VolumeSourceOffset(VolumeElement):
    """Per-source volume offset (reference VolumeSourceOffset).

    Mirrors VolumeManager.cpp DoSetVolume: user volume 0 always forces
    downstream 0 (a positive source offset must never make a muted-by-zero
    device audible).
    """

    def __init__(self, downstream):
        super().__init__(downstream)
        self._offset = 0
        self._current = 0

    def _apply(self) -> None:
        if self._current == 0:
            self._down.set_volume(0)
        else:
            self._down.set_volume(max(0, self._current + self._offset))

    def set_offset(self, offset: int) -> None:
        self._offset = offset
        self._apply()

    def set_volume(self, volume: int) -> None:
        self._current = volume
        self._apply()


class VolumeUnityGain(VolumeElement):
    """Forces unity gain when a source requests analog bypass / fixed
    volume (reference VolumeUnityGain)."""

    def __init__(self, downstream, unity_volume: int):
        super().__init__(downstream)
        self._unity = unity_volume
        self._enabled = False
        self._current = 0

    def set_unity_gain(self, enabled: bool) -> None:
        self._enabled = enabled
        self._down.set_volume(self._unity if enabled else self._current)

    def set_volume(self, volume: int) -> None:
        self._current = volume
        if not self._enabled:
            self._down.set_volume(volume)


class VolumeRamperVol(VolumeElement):
    """Steps volume gradually on large jumps (reference VolumeRamper in the
    *volume* domain; the pipeline's VolumeRamperElement handles the
    analog-bypass sample domain)."""

    def __init__(self, downstream, ms_per_step: int = 5,
                 timer: Optional[Callable] = None):
        super().__init__(downstream)
        self._target = 0
        self._current = 0
        self._lock = threading.Lock()

    def set_volume(self, volume: int) -> None:
        # instantaneous in this build; the device gain chain already ramps
        # samples, so volume stepping only matters for HW volume drivers
        self._current = volume
        self._down.set_volume(volume)


class VolumeMuterStep(VolumeElement):
    """Mute by stepping volume to zero (reference VolumeMuterStepped)."""

    def __init__(self, downstream):
        super().__init__(downstream)
        self.muted = False
        self._current = 0

    def mute(self) -> None:
        self.muted = True
        self._down.set_volume(0)

    def unmute(self) -> None:
        self.muted = False
        self._down.set_volume(self._current)

    def set_volume(self, volume: int) -> None:
        self._current = volume
        if not self.muted:
            self._down.set_volume(volume)


class VolumeSink(IVolume):
    """Terminal element: converts steps to a linear multiplier for the
    device render gain (or a HW driver callback)."""

    def __init__(self, profile: VolumeProfile,
                 hw: Optional[Callable[[int], None]] = None):
        self.profile = profile
        self.volume = 0
        self._hw = hw
        self._listeners: list[Callable[[float], None]] = []

    def add_gain_listener(self, cb: Callable[[float], None]) -> None:
        self._listeners.append(cb)

    @property
    def multiplier(self) -> float:
        if self.volume <= 0:
            return 0.0
        # milli-db per step -> linear; reference maps steps to binary-milli-db
        db = (self.volume - self.profile.max_volume) \
            * self.profile.milli_db_per_step / 1024.0
        return 10.0 ** (db / 20.0)

    def set_volume(self, volume: int) -> None:
        self.volume = volume
        if self._hw:
            self._hw(volume)
        m = self.multiplier
        for cb in self._listeners:
            cb(m)


class BalanceFade:
    """Balance (left/right) and fade (front/rear) trims
    (reference VolumeBalance/VolumeFade + Trim.h)."""

    def __init__(self, profile: VolumeProfile, config: ConfigManager):
        self.profile = profile
        self._balance = config.create_num("Volume.Balance",
                                          -profile.balance_max,
                                          profile.balance_max, 0)
        self._fade = config.create_num("Volume.Fade", -profile.fade_max,
                                       profile.fade_max, 0)

    @property
    def balance(self) -> int:
        return self._balance.value

    @property
    def fade(self) -> int:
        return self._fade.value

    def set_balance(self, v: int) -> None:
        self._balance.set(v)

    def set_fade(self, v: int) -> None:
        self._fade.set(v)

    def channel_gains(self, num_channels: int = 2) -> list[float]:
        """Per-channel multipliers implementing balance (device render
        applies these via the gain chain)."""
        b = self.balance
        db_per = 1.5
        left = min(0.0, -b * db_per)
        right = min(0.0, b * db_per)
        gains = [10 ** (left / 20), 10 ** (right / 20)]
        while len(gains) < num_channels:
            gains.append(1.0)
        return gains[:num_channels]


class VolumeManager(IVolume):
    """Assembles the chain and fronts it (VolumeManager.h:638)."""

    def __init__(self, config: ConfigManager,
                 profile: Optional[VolumeProfile] = None,
                 hw: Optional[Callable[[int], None]] = None):
        self.profile = profile or VolumeProfile()
        self.sink = VolumeSink(self.profile, hw)
        self.muter = VolumeMuterStep(self.sink)
        self.ramper = VolumeRamperVol(self.muter)
        self.unity = VolumeUnityGain(self.ramper, self.profile.max_volume)
        self.offset = VolumeSourceOffset(self.unity)
        self.reporter = VolumeReporter(self.offset)
        self.limiter = VolumeLimiter(self.reporter, self.profile, config)
        self.user = VolumeUser(self.limiter, self.profile, config)
        self.balance_fade = BalanceFade(self.profile, config)

    # -- public API (ProviderVolume calls these) ---------------------------
    @property
    def volume(self) -> int:
        return self.user.volume

    def set_volume(self, volume: int) -> None:
        self.user.set_volume(volume)

    def volume_inc(self) -> None:
        self.set_volume(min(self.volume + self.profile.step,
                            self.profile.max_volume))

    def volume_dec(self) -> None:
        self.set_volume(max(self.volume - self.profile.step, 0))

    def mute(self) -> None:
        self.muter.mute()

    def unmute(self) -> None:
        self.muter.unmute()

    @property
    def muted(self) -> bool:
        return self.muter.muted

    def add_observer(self, cb: Callable[[int], None]) -> None:
        self.reporter.add_observer(cb)
