"""Randomized property test for the volume chain.

SURVEY.md §4.1's per-element style pins individual transitions; this
drives the assembled VolumeManager (user -> limiter -> reporter ->
offset -> unity -> boost -> ramper -> muter -> sink, VolumeManager.cpp
:1059-1112) with random op sequences and checks every step against an
exact model of the reference semantics:

* VolumeUser clamp-to-max-or-throw (VolumeManager.cpp:150-160);
* VolumeLimiter pinned-at-limit throw + clamped stored current
  (cpp:229-255);
* VolumeSourceOffset zero-stays-silent + floor-at-zero (cpp:330-348);
* VolumeUnityGain VolumeNotSupported while active (cpp:408-418), with
  upstream stages recording state exactly as the reference does when
  the throw unwinds through them;
* VolumeSurroundBoost clamps (cpp:377-396);
* mute forces sink 0, unmute restores the chain value.
"""

import numpy as np
import pytest

from ohpipeline_tpu.av.config import ConfigManager
from ohpipeline_tpu.av.volume import (VolumeManager, VolumeNotSupported,
                                      VolumeOutOfRange, VolumeProfile)

MAX = 100


class Model:
    """Reference-semantics model of the chain, op for op."""

    def __init__(self, default_volume, default_limit):
        self.user = default_volume
        self.limit = default_limit
        self.lim_current = 0
        self.off_current = 0
        self.offset = 0
        self.unity = False
        self.unity_current = 0
        self.boost = 0
        self.boost_current = 0
        self.muted = False
        self.muter_current = 0
        self.sink = 0
        self.set_volume(default_volume, startup=True)

    # -- stage transfer functions, bottom-up ---------------------------
    def _muter_set(self, v):
        self.muter_current = v
        if not self.muted:
            self.sink = v

    def _boost_apply(self):
        v = self.boost_current
        if v != 0:
            v = max(0, v + self.boost)
        self._muter_set(v)

    def _boost_set(self, v):
        self.boost_current = v
        self._boost_apply()

    def _unity_set(self, v):
        if self.unity:
            raise VolumeNotSupported(v)
        self._boost_set(v)
        self.unity_current = v      # recorded only on successful push

    def _offset_apply(self, v):
        out = 0 if v == 0 else max(0, v + self.offset)
        self._unity_set(out)

    def _offset_set(self, v):
        self._offset_apply(v)      # may throw: upstream NOT recorded
        self.off_current = v

    def _limiter_set(self, v):
        if v > self.limit and self.lim_current >= self.limit:
            raise VolumeOutOfRange(v)
        self.lim_current = min(v, self.limit)   # clamped BEFORE the push
        self._offset_set(self.lim_current)

    # -- public ops -----------------------------------------------------
    def set_volume(self, v, startup=False):
        if v < 0:
            raise VolumeOutOfRange(v)
        if v > MAX:
            if self.user < MAX:
                v = MAX
            else:
                raise VolumeOutOfRange(v)
        self._limiter_set(v)       # may throw: user volume NOT recorded
        self.user = v

    def set_offset(self, off):
        self.offset = off
        try:
            self._offset_apply(self.off_current)
        except VolumeNotSupported:
            pass

    def set_unity(self, enabled):
        self.unity = enabled
        try:
            self._boost_set(MAX if enabled else self.unity_current)
        except (VolumeNotSupported, VolumeOutOfRange):
            pass

    def set_boost(self, boost):
        self.boost = boost
        try:
            self._boost_apply()
        except (VolumeNotSupported, VolumeOutOfRange):
            pass

    def set_limit(self, limit):
        self.limit = limit
        try:
            self.lim_current = min(self.lim_current, limit)
            self._offset_set(self.lim_current)
        except (VolumeNotSupported, VolumeOutOfRange):
            pass

    def mute(self):
        self.muted = True
        self.sink = 0

    def unmute(self):
        self.muted = False
        self.sink = self.muter_current


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_volume_monkey(seed):
    rng = np.random.default_rng(seed)
    profile = VolumeProfile(max_volume=MAX, default_volume=40,
                            default_limit=80)
    hw = []
    vm = VolumeManager(ConfigManager(), profile, hw=hw.append)
    model = Model(40, 80)

    def paired(step, op, model_fn, real_fn):
        """Run the model and the real chain; their exception type (or
        absence) must agree."""
        want = got = None
        try:
            model_fn()
        except (VolumeOutOfRange, VolumeNotSupported) as e:
            want = type(e)
        try:
            real_fn()
        except (VolumeOutOfRange, VolumeNotSupported) as e:
            got = type(e)
        assert got == want, \
            f"step {step} op {op}: exception {got} != model {want}"

    ops = ["set", "set_big", "set_neg", "inc", "dec", "mute", "unmute",
           "offset", "unity_on", "unity_off", "boost", "limit"]
    for step in range(400):
        op = ops[int(rng.integers(len(ops)))]
        if op == "set":
            v = int(rng.integers(0, MAX + 1))
            paired(step, op, lambda: model.set_volume(v),
                   lambda: vm.set_volume(v))
        elif op == "set_big":
            v = MAX + int(rng.integers(1, 30))
            paired(step, op, lambda: model.set_volume(v),
                   lambda: vm.set_volume(v))
        elif op == "set_neg":
            v = -int(rng.integers(1, 10))
            paired(step, op, lambda: model.set_volume(v),
                   lambda: vm.set_volume(v))
        elif op == "inc":
            v = min(model.user + 1, MAX)
            paired(step, op, lambda: model.set_volume(v),
                   lambda: vm.volume_inc())
        elif op == "dec":
            v = max(model.user - 1, 0)
            paired(step, op, lambda: model.set_volume(v),
                   lambda: vm.volume_dec())
        elif op == "mute":
            paired(step, op, model.mute, vm.mute)
        elif op == "unmute":
            paired(step, op, model.unmute, vm.unmute)
        elif op == "offset":
            off = int(rng.integers(-20, 21))
            paired(step, op, lambda: model.set_offset(off),
                   lambda: vm.offset.set_offset(off))
        elif op == "unity_on":
            paired(step, op, lambda: model.set_unity(True),
                   lambda: vm.unity.set_unity_gain(True))
        elif op == "unity_off":
            paired(step, op, lambda: model.set_unity(False),
                   lambda: vm.unity.set_unity_gain(False))
        elif op == "boost":
            b = int(rng.integers(-15, 16))
            paired(step, op, lambda: model.set_boost(b),
                   lambda: vm.set_volume_boost(b))
        elif op == "limit":
            lim = int(rng.integers(0, MAX + 1))
            paired(step, op, lambda: model.set_limit(lim),
                   lambda: vm.limiter._limit.set(lim))
        assert vm.volume == model.user, \
            f"step {step} op {op}: user {vm.volume} != model {model.user}"
        assert vm.muted == model.muted
        sink = hw[-1] if hw else 0
        assert sink == model.sink, \
            f"step {step} op {op}: sink {sink} != model {model.sink}"
        assert 0 <= sink, "sink went negative"
        if not model.unity:
            assert sink <= MAX + 21, "sink far beyond range"


def test_odp_volume_error_codes(media_player=None):
    """SetVolume beyond the pinned limit surfaces ODP error 811 and
    unity-gain mode surfaces 814 (reference ProviderVolume codes,
    Av/ProviderVolume.cpp:18-28,575-598)."""
    from ohpipeline_tpu.av.media_player import MediaPlayer
    from ohpipeline_tpu.net.odp import OdpClient, OdpServer
    from ohpipeline_tpu.net.providers import make_device

    mp = MediaPlayer()
    server = OdpServer()
    server.add_device(make_device(mp))
    try:
        client = OdpClient("127.0.0.1", server.port)
        try:
            vmax = mp.volumes.profile.max_volume
            limit = mp.volumes.limiter._limit.value
            client.invoke("Volume", "SetVolume", value=limit)
            with pytest.raises(RuntimeError) as ei:
                client.invoke("Volume", "SetVolume", value=limit + 5)
            assert "Volume invalid" in str(ei.value)
            mp.volumes.unity.set_unity_gain(True)
            with pytest.raises(RuntimeError) as ei:
                client.invoke("Volume", "SetVolume", value=10)
            assert "Volume not supported" in str(ei.value)
        finally:
            client.close()
    finally:
        server.close()
