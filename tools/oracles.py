"""Self-contained verification: auto-build the golden-oracle CLIs.

The conformance suite's ground truth is the reference's vendored decoder
libraries (flac-1.2.1, fdk-aac, libmad, apple_alac, Tremor, opus-1.5.2),
compiled in place by tools/build_oracles.sh into the gitignored
`.oracle_build/`.  The reference's own suite is environment-complete —
`/root/reference/oncommit.test:36-89` spins up every asset it needs and
`projectdata/dependencies.json:3-16` fetches every dependency — so a
clean checkout runs the full suite on every commit.  This module gives
the same property to this repo: `ensure_oracles()` builds any missing
oracle binary on first use (one-time, a few minutes), so `pytest` and
`bench.py` never silently degrade to "not checked" on a fresh machine.

Set OHP_NO_ORACLE_BUILD=1 to disable (tests then skip as before).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(REPO, ".oracle_build")

#: every binary build_oracles.sh produces, keyed by its build target
TARGETS = {
    "flac": ("flac_oracle",),
    "aac": ("aac_oracle", "sbr_probe"),
    "mad": ("mad_oracle",),
    "alac": ("alac_oracle",),
    "vorbis": ("vorbis_oracle",),
    "opus": ("opus_oracle", "celt_probe", "silk_probe"),
}
ALL_BINARIES = tuple(b for bins in TARGETS.values() for b in bins)


def oracles_present(binaries=ALL_BINARIES) -> bool:
    return all(os.path.exists(os.path.join(OUT, b)) for b in binaries)


def _missing_targets():
    return [t for t, bins in TARGETS.items() if not oracles_present(bins)]


def ensure_oracles(verbose: bool = True) -> bool:
    """Build any missing oracle binaries; returns True when all exist.

    Safe to call from multiple processes (mkdir-based lock) and cheap
    when everything is already built (a handful of stat calls).
    """
    if oracles_present():
        return True
    if os.environ.get("OHP_NO_ORACLE_BUILD"):
        return False
    ref = os.environ.get("REF", "/root/reference/thirdparty")
    if not os.path.isdir(ref):
        if verbose:
            print(f"[oracles] reference sources not found at {ref}; "
                  "conformance oracles unavailable", file=sys.stderr)
        return False
    os.makedirs(OUT, exist_ok=True)
    lock = OUT + ".lock"
    for _ in range(3600):          # wait out a concurrent builder
        try:
            os.mkdir(lock)
            break
        except FileExistsError:
            time.sleep(1)
            if oracles_present():
                return True
    else:
        return oracles_present()
    try:
        missing = _missing_targets()
        if not missing:
            return True
        if verbose:
            print(f"[oracles] building {', '.join(missing)} from the "
                  "reference's vendored sources (one-time, ~minutes)...",
                  file=sys.stderr, flush=True)
        for target in missing:
            t0 = time.monotonic()
            r = subprocess.run(
                ["bash", os.path.join(HERE, "build_oracles.sh"), target],
                capture_output=True, text=True)
            if verbose:
                status = "ok" if r.returncode == 0 else "FAILED"
                print(f"[oracles] {target}: {status} "
                      f"({time.monotonic() - t0:.0f}s)",
                      file=sys.stderr, flush=True)
            if r.returncode != 0 and verbose:
                tail = (r.stdout[-1500:] + "\n" + r.stderr[-1500:]).strip()
                print(f"[oracles] {target} build output tail:\n{tail}",
                      file=sys.stderr)
        return oracles_present()
    finally:
        try:
            os.rmdir(lock)
        except OSError:
            pass


if __name__ == "__main__":
    sys.exit(0 if ensure_oracles() else 1)
