"""Floor 1 decode + curve synthesis (spec §7.2.3/7.2.4; parity: Tremor
floor1.c).  Integer post decode and Bresenham line render in the dB
domain, then the 256-entry inverse-dB map (tables.npz, extracted from the
reference's fixed-point table as float)."""

from __future__ import annotations

import pathlib

import numpy as np

from .bitreader import EndOfPacket, LsbBitReader, ilog
from .headers import Floor1

_NPZ = np.load(pathlib.Path(__file__).resolve().parent / "tables.npz")
FROMDB = _NPZ["floor1_fromdb"]

_RANGES = (256, 128, 86, 64)


def decode_floor1(br: LsbBitReader, fl: Floor1,
                  books: list) -> list | None:
    """Returns (final_y, step2_flags) posts or None when the channel is
    unused this frame (zero bit, or end-of-packet during decode)."""
    try:
        if not br.read(1):
            return None
        rng = _RANGES[fl.multiplier - 1]
        ybits = ilog(rng - 1)
        y = [br.read(ybits), br.read(ybits)]
        for i in range(fl.partitions):
            cls = fl.partition_classes[i]
            cdim = fl.class_dims[cls]
            cbits = fl.class_subclasses[cls]
            csub = (1 << cbits) - 1
            cval = 0
            if cbits:
                cval = books[fl.class_masterbooks[cls]].decode(br)
            for _ in range(cdim):
                book = fl.subclass_books[cls][cval & csub]
                cval >>= cbits
                y.append(books[book].decode(br) if book >= 0 else 0)
    except EndOfPacket:
        return None

    # amplitude value synthesis (spec §7.2.4 step 1)
    npost = len(fl.x_list)
    final = [0] * npost
    step2 = [False] * npost
    final[0], final[1] = y[0], y[1]
    step2[0] = step2[1] = True
    for i in range(2, npost):
        lo, hi = fl.neighbors[i - 2]
        pred = _render_point(fl.x_list[lo], final[lo],
                             fl.x_list[hi], final[hi], fl.x_list[i])
        val = y[i]
        highroom = rng - pred
        lowroom = pred
        room = 2 * min(highroom, lowroom)
        if val:
            step2[lo] = step2[hi] = step2[i] = True
            if val >= room:
                if highroom > lowroom:
                    final[i] = val - lowroom + pred
                else:
                    final[i] = pred - (val - highroom) - 1
            else:
                final[i] = pred - ((val + 1) // 2) if (val & 1) \
                    else pred + val // 2
        else:
            step2[i] = False
            final[i] = pred
        final[i] = max(0, min(rng - 1, final[i]))
    return final, step2


def _render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    dy = y1 - y0
    adx = x1 - x0
    err = abs(dy) * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def render_curve(posts, fl: Floor1, n: int) -> np.ndarray:
    """(final_y, step2) -> amplitude curve of length n (= blocksize/2)."""
    final, step2 = posts
    mult = fl.multiplier
    ydb = np.zeros(n, np.int32)
    order = [i for i in fl.sort_order if step2[i]]
    lx, ly = 0, final[order[0]] * mult if order else 0
    hx = 0
    hy = ly
    for i in order[1:]:
        hx = fl.x_list[i]
        hy = final[i] * mult
        if lx < n:
            # render with the true segment slope; writes clamp to n
            _render_line(lx, ly, hx, hy, ydb)
        lx, ly = hx, hy
    if hx < n:
        ydb[hx:] = ly
    np.clip(ydb, 0, 255, out=ydb)
    return FROMDB[ydb]


def _render_line(x0: int, y0: int, x1: int, y1: int,
                 v: np.ndarray) -> None:
    """Integer Bresenham in the dB domain (spec §9.2.6/7)."""
    dy = y1 - y0
    adx = x1 - x0
    if adx <= 0:
        return
    ady = abs(dy)
    base = int(dy / adx)                 # truncate toward zero
    sy = base - 1 if dy < 0 else base + 1
    ady -= abs(base) * adx
    y = y0
    err = 0
    n = len(v)
    if x0 < n:
        v[x0] = y
    for x in range(x0 + 1, min(x1, n)):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        v[x] = y
