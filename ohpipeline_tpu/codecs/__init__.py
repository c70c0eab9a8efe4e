"""Codec plug-ins (reference: OpenHome/Media/Codec/CodecFactory.h).

Import order here defines the default registry; recognition order is by
`recognition_cost` (cheap container sniffs first), mirroring the
reference's RecognitionComplexity sort (CodecController.cpp:362).
"""

from .base import (BufferReader, CodecBase, CodecRegistry, CodecStreamCorrupt,
                   DecodedBatch, EndOfStream, StreamReader, default_registry)
from .wav import CodecWav, parse_wav, write_wav
from .aiff import CodecAifc, CodecAiff, write_aiff
from .pcm_raw import CodecPcm
from .dsd import CodecDsdDff, CodecDsdDsf, CodecDsdRaw
from .flac import CodecFlac
from .aac import CodecAacAdts, CodecAacMp4
from .mp3 import CodecMp3
from .alac import CodecAlac
from .vorbis import CodecVorbis
from .opus import CodecOpus, CodecOpusMp4

for _f in (CodecWav, CodecAiff, CodecAifc, CodecDsdDsf, CodecDsdDff,
           CodecFlac, CodecAlac, CodecAacMp4, CodecOpusMp4, CodecAacAdts,
           CodecOpus, CodecVorbis, CodecMp3):
    default_registry.add(_f)

__all__ = [
    "BufferReader", "CodecBase", "CodecRegistry", "CodecStreamCorrupt",
    "DecodedBatch", "EndOfStream", "StreamReader", "default_registry",
    "CodecWav", "CodecAiff", "CodecAifc", "CodecPcm", "CodecDsdDsf",
    "CodecDsdDff", "CodecDsdRaw", "CodecVorbis", "CodecOpus",
    "CodecOpusMp4", "parse_wav", "write_wav", "write_aiff",
]
