"""The Av device/application layer (reference OpenHome/Av/, SURVEY.md
§2.4-2.5): media-player composition root, product/source model, volume
chain, typed persistent config, power management, sources."""

from .config import (ConfigChoice, ConfigManager, ConfigNum, ConfigText,
                     ConfigTextChoice, FileStore, RamStore)
from .media_player import MediaPlayer, MediaPlayerInitParams
from .power import PowerManager, StoreVal
from .product import Product, Source
from .sources import (PresetDatabase, SourcePlaylist, SourceRadio,
                      TrackDatabase, UriProviderPlaylist, UriProviderRadio)
from .volume import VolumeManager, VolumeProfile

__all__ = [
    "ConfigChoice", "ConfigManager", "ConfigNum", "ConfigText",
    "ConfigTextChoice", "FileStore", "RamStore", "MediaPlayer",
    "MediaPlayerInitParams", "PowerManager", "StoreVal", "Product",
    "Source", "PresetDatabase", "SourcePlaylist", "SourceRadio",
    "TrackDatabase", "UriProviderPlaylist", "UriProviderRadio",
    "VolumeManager", "VolumeProfile",
]
