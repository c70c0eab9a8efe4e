"""Service providers: map the MediaPlayer onto ODP services.

Parity target: the reference's Provider* family (ProviderProduct,
ProviderTransport -> PipelineManager Play/Pause/Stop/Seek
(ProviderTransport.cpp:196-216), ProviderVolume -> VolumeManager,
ProviderInfo/Time -> pipeline observers, ProviderPlaylist -> TrackDatabase,
ProviderRadio -> presets, ProviderConfig -> ConfigManager), re-hosted on
the ODP JSON control plane instead of UPnP SOAP.
"""

from __future__ import annotations

from .odp import OdpDevice, OdpError, OdpService


def make_product_service(mp) -> OdpService:
    svc = OdpService("Product")
    prod = mp.product
    svc.add_action("Room", lambda: {"value": prod.room})
    svc.add_action("Name", lambda: {"value": prod.name})
    svc.add_action("SourceCount", lambda: {"value": prod.source_count()})
    svc.add_action("SourceXml", lambda: {"value": prod.source_xml()})
    svc.add_action("SourceIndex", lambda: {"value": prod.source_index()})
    svc.add_action("SetSourceIndex",
                   lambda value: prod.set_source_index(int(value)) or {})
    svc.add_action("SetSourceByName",
                   lambda value: prod.set_source_by_name(value) or {})
    svc.add_action("Standby", lambda: {"value": prod.standby})
    svc.add_action(
        "SetStandby",
        lambda value: (prod.standby_enable() if value
                       else prod.standby_disable()) or {})

    def update():
        svc.set_property("SourceIndex", prod.source_index())
        svc.set_property("Standby", prod.standby)

    prod.add_observer(update)
    update()
    return svc


def make_transport_service(mp) -> OdpService:
    svc = OdpService("Transport")
    pm = mp.pipeline
    svc.add_action("Play", lambda: pm.play() or {})
    svc.add_action("Pause", lambda: pm.pause() or {})
    svc.add_action("Stop", lambda: pm.stop() or {})
    svc.add_action("SkipNext", lambda: pm.next() or {})
    svc.add_action("SkipPrevious", lambda: pm.prev() or {})
    svc.add_action("PlayUri",
                   lambda uri, metadata="": pm.play_uri(uri, metadata) or {})

    class Obs:
        def notify_pipeline_state(self, state):
            svc.set_property("TransportState", state.value)

        def notify_track(self, track, sos):
            svc.set_property("TrackUri", track.uri)

        def notify_time(self, seconds, total):
            svc.set_property("Seconds", seconds)

    pm.add_observer(Obs())
    svc.set_property("TransportState", mp.pipeline.pipeline.state.value)
    return svc


def make_volume_service(mp) -> OdpService:
    svc = OdpService("Volume")
    vm = mp.volumes

    def _vol(fn):
        """Translate volume-chain errors to the reference ProviderVolume
        codes: 811 'Volume invalid', 814 'Volume not supported'
        (Av/ProviderVolume.cpp:18-28,575-598)."""
        from ..av.volume import VolumeNotSupported, VolumeOutOfRange

        def wrapped(**kw):
            try:
                return fn(**kw)
            except VolumeOutOfRange:
                raise OdpError(811, "Volume invalid") from None
            except VolumeNotSupported:
                raise OdpError(814, "Volume not supported") from None
        return wrapped

    svc.add_action("Volume", lambda: {"value": vm.volume})
    svc.add_action("SetVolume",
                   _vol(lambda value: vm.set_volume(int(value)) or {}))
    svc.add_action("VolumeInc", _vol(lambda: vm.volume_inc() or {}))
    svc.add_action("VolumeDec", _vol(lambda: vm.volume_dec() or {}))
    svc.add_action("Mute", lambda: {"value": vm.muted})
    svc.add_action(
        "SetMute",
        lambda value: (vm.mute() if value else vm.unmute()) or {})
    svc.add_action("SetBalance",
                   lambda value: vm.balance_fade.set_balance(int(value)) or {})
    svc.add_action("VolumeMax",
                   lambda: {"value": vm.profile.max_volume})
    vm.add_observer(lambda v: svc.set_property("Volume", v))
    vm.add_mute_observer(lambda m: svc.set_property("Mute", m))
    return svc


def make_info_service(mp) -> OdpService:
    svc = OdpService("Info")

    class Obs:
        def notify_track(self, track, sos):
            svc.set_property("Uri", track.uri)
            svc.set_property("Metadata", track.metadata)

        def notify_metatext(self, text):
            svc.set_property("Metatext", text)

        def notify_stream_info(self, info):
            svc.set_property("SampleRate", info.sample_rate)
            svc.set_property("BitDepth", info.bit_depth)
            svc.set_property("CodecName", info.codec_name)
            svc.set_property("Lossless", info.lossless)

    mp.pipeline.add_observer(Obs())
    return svc


def make_playlist_service(mp) -> OdpService:
    svc = OdpService("Playlist")
    src = mp.source_playlist
    db = src.db
    svc.add_action(
        "Insert",
        lambda afterId, uri, metadata="":
        {"newId": db.insert(int(afterId), uri, metadata)})
    svc.add_action("DeleteId", lambda value: db.delete(int(value)) or {})
    svc.add_action("DeleteAll", lambda: db.delete_all() or {})
    svc.add_action("IdArray", lambda: {"array": db.id_array()})
    svc.add_action(
        "Read",
        lambda id: (lambda t: {"uri": t.uri if t else "",
                               "metadata": t.metadata if t else ""})(
            db.track_by_id(int(id))))
    svc.add_action("SeekId", lambda value: src.seek_id(int(value)) or {})
    svc.add_action(
        "SetRepeat",
        lambda value: src.provider.set_repeat(bool(value)) or {})
    svc.add_action(
        "SetShuffle",
        lambda value: src.provider.set_shuffle(bool(value)) or {})
    db.add_observer(lambda: svc.set_property("IdArraySeq", db.seq))
    return svc


def make_radio_service(mp) -> OdpService:
    svc = OdpService("Radio")
    src = mp.source_radio
    svc.add_action(
        "SetPreset",
        lambda index, uri, metadata="":
        src.presets.set_preset(int(index), uri, metadata) or {})
    svc.add_action("IdArray", lambda: {"array": src.presets.id_array()})
    svc.add_action("PlayPreset",
                   lambda index: src.play_preset(int(index)) or {})
    svc.add_action("PlayUri",
                   lambda uri, metadata="": src.play_uri(uri, metadata) or {})
    return svc


def make_config_service(mp) -> OdpService:
    svc = OdpService("Config")
    cm = mp.config
    svc.add_action("Keys", lambda: {"keys": cm.keys()})
    svc.add_action("Get", lambda key: {"value": cm.get(key).value})
    svc.add_action("Set", lambda key, value: cm.get(key).set(value) or {})
    return svc


def make_reaction_service(mp) -> OdpService:
    """Reaction service (reference Av/ProviderReaction.cpp): attach a
    reaction to the currently playing track via the registered
    handlers; properties mirror CanReact/CurrentReaction/
    AvailableReactions."""
    from ..av.reactions import ReactionError
    svc = OdpService("Reaction")
    reg = mp.reactions

    def _sync():
        svc.set_property("CanReact", reg.can_react)
        svc.set_property("CurrentReaction", reg.current_reaction)
        svc.set_property("AvailableReactions", reg.available_reactions)

    def _wrap(fn, *a):
        try:
            fn(*a)
        except ReactionError as e:
            return {"error": e.code, "message": str(e)}
        return {}

    svc.add_action("GetCanReact", lambda: {"value": reg.can_react})
    svc.add_action("GetCurrentReaction",
                   lambda: {"value": reg.current_reaction})
    svc.add_action("GetAvailableReactions",
                   lambda: {"value": reg.available_reactions})
    svc.add_action("SetReaction",
                   lambda reaction: _wrap(reg.set_reaction, reaction))
    svc.add_action("ClearReaction", lambda: _wrap(reg.clear_reaction))

    class Obs:
        def notify_track(self, track, sos):
            reg.notify_track(track, sos)

    mp.pipeline.add_observer(Obs())
    reg.add_observer(_sync)
    _sync()
    return svc


def make_debug_service(mp) -> OdpService:
    """Debug service (reference ProviderDebug,
    OpenHome/Av/ProviderDebug.h:48-63 over Debug2): ring-buffer log
    dump, log upload through the ILogPoster hook, SSDP re-announce and
    the recent-M-SEARCH observer list; plus a LogBuffers action
    reporting pipeline reservoir occupancy (the reference exposes the
    same numbers through its Shell 'pipeline' command)."""
    import json as _json

    svc = OdpService("Debug")
    svc.add_action("GetLog", lambda: {"value": mp.log.dump()})

    def send_log(data=""):
        if mp.log_poster is None:
            raise RuntimeError("no log poster configured")
        mp.log_poster(mp.log.dump(), data)
        return {}

    svc.add_action("SendLog", send_log)

    def announce():
        for r in mp.ssdp_responders:
            r.notify_alive()
        return {}

    svc.add_action("SendDeviceAnnouncements", announce)

    def msearches():
        out = []
        for r in mp.ssdp_responders:
            out += [{"address": a, "seconds_ago": s}
                    for a, s in r.recent_msearches()]
        return {"value": _json.dumps(out)}

    svc.add_action("GetRecentMSearches", msearches)

    def log_buffers():
        pipe = mp.pipeline.pipeline     # PipelineManager -> Pipeline
        return {"encoded_bytes": pipe.encoded.occupancy,
                "decoded_jiffies": pipe.decoded.occupancy}

    svc.add_action("LogBuffers", log_buffers)
    return svc


def make_device(mp, udn: str = "ohpipeline-tpu-1") -> OdpDevice:
    """Build the full ODP device for a MediaPlayer (the reference's
    DvDeviceStandard + provider registration in MediaPlayer.cpp)."""
    dev = OdpDevice(udn, mp.product.name, "av.openhome.org:media")
    for factory in (make_product_service, make_transport_service,
                    make_volume_service, make_info_service,
                    make_playlist_service, make_radio_service,
                    make_config_service, make_reaction_service,
                    make_debug_service):
        dev.add_service(factory(mp))
    return dev
