"""Volume management: the composable volume element chain.

Parity target: OpenHome/Av/VolumeManager.h:63-741 — a stack of small
IVolume decorators (user -> limiter -> reporter -> source offset -> unity
gain -> surround boost -> ramper -> muter), a mute chain
(MuteUser -> MuteReporter -> muter), balance/fade, per-channel trim,
VolumeConfig persistence, IVolumeProfile limits.  Error semantics follow
the reference: raising volume while pinned at the limit throws
VolumeOutOfRange (UPnP/ODP error 811) and volume changes during unity
gain throw VolumeNotSupported (814).

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


class VolumeNotSupported(Exception):
    """Volume control is currently disabled (unity-gain source / fixed
    volume); reference THROW(VolumeNotSupported), VolumeManager.cpp:414."""


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
    """Entry element: user range checks, startup/last-used volume, standby
    reapply (reference VolumeUser, VolumeManager.cpp:90-215).

    Reference semantics mirrored exactly:
    * SetVolume above max clamps TO max if the current volume is still
      below max, and only throws VolumeOutOfRange when already pinned at
      max (VolumeManager.cpp:150-160);
    * every accepted volume persists as the last-used volume
      (iStoreUserVolume, write-through here instead of the 2 s deferred
      timer);
    * startup-volume disabled means "start at last-used volume"
      (ApplyStartupVolume, VolumeManager.cpp:191-206);
    * leaving standby reapplies the startup volume, swallowing
      OutOfRange/NotSupported (StandbyDisabled, VolumeManager.cpp:177-180).
    """

    STORE_KEY = "Volume.LastUsed"

    def __init__(self, downstream, profile: VolumeProfile,
                 config: ConfigManager, power=None):
        super().__init__(downstream)
        self.profile = profile
        self._store = config.store
        self._startup = config.create_num(
            "Volume.StartupValue", 0, profile.max_volume,
            profile.default_volume)
        self._startup_enabled = config.create_choice(
            "Volume.StartupEnabled", {0: "Off", 1: "On"}, 1)
        self.volume = self._last_used()
        if power is not None:
            power.register_standby_handler(50, self)
        self._apply_startup_volume()

    def _last_used(self) -> int:
        try:
            return max(0, min(self.profile.max_volume, int(
                self._store.read(self.STORE_KEY).decode())))
        except Exception:                          # noqa: BLE001 — absent key
            return self.profile.default_volume

    def _apply_startup_volume(self) -> None:
        startup = (self._startup.value if self._startup_enabled.value
                   else self._last_used())
        try:
            self.set_volume(startup)
        except (VolumeNotSupported, VolumeOutOfRange):
            pass      # e.g. limit configured lower than startup volume

    # -- IStandbyHandler (PowerManager) --------------------------------
    def standby_enabled(self) -> None:
        pass          # volume unchanged on entering standby

    def standby_disabled(self) -> None:
        self._apply_startup_volume()

    def set_volume(self, volume: int) -> None:
        if volume < 0:
            raise VolumeOutOfRange(volume)
        if volume > self.profile.max_volume:
            if self.volume < self.profile.max_volume:
                volume = self.profile.max_volume
            else:
                raise VolumeOutOfRange(volume)
        self._down.set_volume(volume)
        self.volume = volume
        self._store.write(self.STORE_KEY, str(volume).encode())


class VolumeLimiter(VolumeElement):
    """Caps volume at a configurable limit (reference VolumeLimiter,
    VolumeManager.cpp:212-255): raising the volume further while already
    pinned at the limit throws VolumeOutOfRange (the control point sees
    error 811 instead of a silent no-op), and the stored current volume
    is the *clamped* one (so raising the limit later does not restore a
    higher pre-clamp request — reference DoSetVolume)."""

    def __init__(self, downstream, profile: VolumeProfile,
                 config: ConfigManager):
        super().__init__(downstream)
        self._current = 0
        self._limit = config.create_num("Volume.Limit", 0,
                                        profile.max_volume,
                                        profile.default_limit)
        self._limit.subscribe(self._on_limit)

    def _on_limit(self, key, value):
        try:
            self._do_set_volume()
        except (VolumeNotSupported, VolumeOutOfRange):
            pass                    # reference LimitChanged swallows both

    def _do_set_volume(self) -> None:
        self._current = min(self._current, self._limit.value)
        self._down.set_volume(self._current)

    def set_volume(self, volume: int) -> None:
        limit = self._limit.value
        if volume > limit and self._current >= limit:
            raise VolumeOutOfRange(volume)
        self._current = volume
        self._do_set_volume()


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

    def _apply(self, volume: int) -> None:
        if volume == 0:
            self._down.set_volume(0)
        else:
            self._down.set_volume(max(0, volume + self._offset))

    def set_offset(self, offset: int) -> None:
        self._offset = offset
        try:
            self._apply(self._current)
        except VolumeNotSupported:
            pass      # reference SetVolumeOffset swallows (cpp:327-334)

    def set_volume(self, volume: int) -> None:
        # reference SetVolume records iUpstreamVolume only after
        # DoSetVolume succeeds (cpp:318-324) — a VolumeNotSupported from
        # the unity-gain stage must not update the remembered volume
        self._apply(volume)
        self._current = volume


class VolumeUnityGain(VolumeElement):
    """Forces unity gain when a source requests analog bypass / fixed
    volume (reference VolumeUnityGainBase, VolumeManager.cpp:399-445):
    while unity gain is active, volume control is disabled — SetVolume
    throws VolumeNotSupported so control points see error 814 rather
    than a silently-ignored change."""

    def __init__(self, downstream, unity_volume: int):
        super().__init__(downstream)
        self._unity = unity_volume
        self._enabled = False
        self._current = 0

    @property
    def unity_gain(self) -> bool:
        return self._enabled

    def set_unity_gain(self, enabled: bool) -> None:
        self._enabled = enabled
        # reference SetVolumeControlEnabled pushes the new effective
        # volume, swallowing errors from the stage below
        try:
            self._down.set_volume(self._unity if enabled else self._current)
        except (VolumeNotSupported, VolumeOutOfRange):
            pass

    def set_volume(self, volume: int) -> None:
        if self._enabled:
            raise VolumeNotSupported(volume)
        self._current = volume
        self._down.set_volume(volume)


class VolumeSurroundBoost(VolumeElement):
    """Signed boost applied below unity gain (reference
    VolumeSurroundBoost, VolumeManager.cpp:352-396): zero upstream volume
    stays silent, a negative boost larger than the volume floors at 0."""

    def __init__(self, downstream):
        super().__init__(downstream)
        self._boost = 0
        self._current = 0

    def set_volume_boost(self, boost: int) -> None:
        self._boost = boost
        try:
            self._apply()
        except (VolumeNotSupported, VolumeOutOfRange):
            pass                    # reference SetVolumeBoost swallows

    def set_volume(self, volume: int) -> None:
        self._current = volume
        self._apply()

    def _apply(self) -> None:
        volume = self._current
        if volume != 0:
            volume = max(0, volume + self._boost)
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


class MuteReporter:
    """Fans mute-state changes out to observers, deduplicating repeats
    (reference MuteReporter, VolumeManager.cpp:828-868)."""

    def __init__(self, downstream):
        self._down = downstream
        self._observers: list[Callable[[bool], None]] = []
        self.muted = False

    def add_observer(self, cb: Callable[[bool], None]) -> None:
        cb(self.muted)
        self._observers.append(cb)

    def _report(self, muted: bool) -> bool:
        if muted == self.muted:
            return False
        self.muted = muted
        for cb in self._observers:
            cb(muted)
        return True

    def mute(self) -> None:
        if self._report(True):
            self._down.mute()

    def unmute(self) -> None:
        if self._report(False):
            self._down.unmute()


class MuteUser:
    """User-facing mute entry: clears mute when leaving standby
    (reference MuteUser, VolumeManager.cpp:789-825)."""

    def __init__(self, downstream, power=None):
        self._down = downstream
        if power is not None:
            power.register_standby_handler(50, self)

    def mute(self) -> None:
        self._down.mute()

    def unmute(self) -> None:
        self._down.unmute()

    # -- IStandbyHandler ------------------------------------------------
    def standby_enabled(self) -> None:
        pass          # mute unchanged entering standby

    def standby_disabled(self) -> None:
        self._down.unmute()


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
                 hw: Optional[Callable[[int], None]] = None,
                 power=None):
        self.profile = profile or VolumeProfile()
        self.sink = VolumeSink(self.profile, hw)
        self.muter = VolumeMuterStep(self.sink)
        self.ramper = VolumeRamperVol(self.muter)
        self.boost = VolumeSurroundBoost(self.ramper)
        self.unity = VolumeUnityGain(self.boost, self.profile.max_volume)
        self.offset = VolumeSourceOffset(self.unity)
        self.reporter = VolumeReporter(self.offset)
        self.limiter = VolumeLimiter(self.reporter, self.profile, config)
        self.user = VolumeUser(self.limiter, self.profile, config, power)
        self.balance_fade = BalanceFade(self.profile, config)
        self.mute_reporter = MuteReporter(self.muter)
        self.mute_user = MuteUser(self.mute_reporter, power)

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
        self.mute_user.mute()

    def unmute(self) -> None:
        self.mute_user.unmute()

    @property
    def muted(self) -> bool:
        return self.mute_reporter.muted

    def set_volume_boost(self, boost: int) -> None:
        self.boost.set_volume_boost(boost)

    def add_observer(self, cb: Callable[[int], None]) -> None:
        self.reporter.add_observer(cb)

    def add_mute_observer(self, cb: Callable[[bool], None]) -> None:
        self.mute_reporter.add_observer(cb)
