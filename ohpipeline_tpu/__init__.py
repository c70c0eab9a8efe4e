"""ohpipeline_tpu — a TPU-native audio streaming framework.

A brand-new framework with the capabilities of openhome/ohPipeline (the
OpenHome `ohMediaPlayer` audio renderer), re-designed TPU-first:

* Control plane, stream protocols, container parsing and bitstream entropy
  decode run host-side (Python orchestration + C++ unpackers).
* All dense math — codec synthesis (LPC residual synthesis, IMDCT, polyphase
  filterbanks) and every PCM transform (format conversion, ramps, volume,
  mute, aggregation, latency trimming) — runs as batched JAX/XLA/Pallas
  programs so many streams decode in parallel per chip.
* Multi-chip scaling uses `jax.sharding.Mesh` + collectives over ICI, not
  host threads.

Subpackages
-----------
core       timebase (jiffies), stream-event model, audio tiles, ramp spec
ops        device kernels: LPC synthesis, IMDCT, filterbanks, PCM DSP
codecs     FLAC/WAV/AIFF/PCM/ALAC/MP3/AAC/Vorbis/Opus/DSD decode paths
containers ID3v2 / MP4 (ISO-BMFF) / MPEG-TS / Ogg framing
protocols  file/tone/http/icy/hls/dash stream sources
pipeline   reservoirs, pipeline elements, manager, filler (pull model)
parallel   device-mesh sharding of the batched decode/DSP path
av         product/source/volume/config media-player layer
native     C++ host helpers (bitstream unpack) loaded via ctypes
"""

__version__ = "0.1.0"
