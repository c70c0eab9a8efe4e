"""OAuth: device-code flows and token management for streaming services.

Parity target: OpenHome/OAuth.cpp / OAuth.h:349-625 (device-code limited
input flow, TokenManager with short/long-lived token slots, refresh
scheduling, persisted refresh tokens) and Av/ProviderOAuth (the control
surface).  Network calls go through an injectable `http_post` so tests
(and this zero-egress environment) use fakes, like the reference's test
doubles.
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

from .config import RamStore, StoreKeyNotFound

MAX_SHORT_LIVED = 10     # TokenManager slot caps (OAuth.h)
MAX_LONG_LIVED = 5


@dataclass(slots=True)
class Token:
    token_id: str
    access_token: str = ""
    refresh_token: str = ""
    expires_at: float = 0.0
    long_lived: bool = False

    @property
    def valid(self) -> bool:
        return bool(self.access_token) and time.time() < self.expires_at


@dataclass(slots=True)
class DeviceCodeRequest:
    """State of one device-code ("limited input") authorisation flow."""
    service_id: str
    device_code: str
    user_code: str
    verification_url: str
    interval: float
    expires_at: float
    job_id: int = 0


def default_http_post(url: str, data: dict, headers: dict) -> dict:
    import urllib.parse
    import urllib.request
    req = urllib.request.Request(
        url, urllib.parse.urlencode(data).encode(),
        headers={"Content-Type": "application/x-www-form-urlencoded",
                 **headers})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


class TokenManager:
    """Per-service token slots with refresh + persistence
    (OAuth.h TokenManager)."""

    def __init__(self, service_id: str, store: RamStore,
                 refresh_fn: Callable[[str], dict],
                 max_short: int = MAX_SHORT_LIVED,
                 max_long: int = MAX_LONG_LIVED):
        self.service_id = service_id
        self._store = store
        self._refresh = refresh_fn
        self._max = {False: max_short, True: max_long}
        self._tokens: dict[str, Token] = {}
        self._lock = threading.RLock()
        self._observers: list[Callable[[], None]] = []
        self._load()

    def _key(self) -> str:
        return f"OAuth.{self.service_id}.Tokens"

    def _load(self) -> None:
        try:
            raw = json.loads(self._store.read(self._key()))
        except (StoreKeyNotFound, ValueError):
            return
        for t in raw:
            tok = Token(t["id"], refresh_token=t["refresh"],
                        long_lived=t.get("long", False))
            self._tokens[tok.token_id] = tok

    def _save(self) -> None:
        raw = [{"id": t.token_id, "refresh": t.refresh_token,
                "long": t.long_lived} for t in self._tokens.values()]
        self._store.write(self._key(), json.dumps(raw).encode())

    def add_observer(self, cb: Callable[[], None]) -> None:
        self._observers.append(cb)

    def _notify(self):
        for cb in self._observers:
            cb()

    # -- API (ProviderOAuth actions) ----------------------------------------
    def add_token(self, token_id: str, refresh_token: str,
                  long_lived: bool = False) -> None:
        with self._lock:
            count = sum(1 for t in self._tokens.values()
                        if t.long_lived == long_lived)
            if token_id not in self._tokens \
                    and count >= self._max[long_lived]:
                raise RuntimeError("token slots full")
            self._tokens[token_id] = Token(token_id,
                                           refresh_token=refresh_token,
                                           long_lived=long_lived)
            self._save()
        self._notify()

    def remove_token(self, token_id: str) -> None:
        with self._lock:
            self._tokens.pop(token_id, None)
            self._save()
        self._notify()

    def clear_all(self) -> None:
        with self._lock:
            self._tokens.clear()
            self._save()
        self._notify()

    def token_ids(self) -> list[str]:
        with self._lock:
            return sorted(self._tokens)

    def access_token(self, token_id: str) -> Optional[str]:
        """Valid access token, refreshing through the service if stale."""
        with self._lock:
            tok = self._tokens.get(token_id)
            if tok is None:
                return None
            if tok.valid:
                return tok.access_token
            resp = self._refresh(tok.refresh_token)
            tok.access_token = resp.get("access_token", "")
            tok.expires_at = time.time() + float(resp.get("expires_in", 0))
            if resp.get("refresh_token"):
                tok.refresh_token = resp["refresh_token"]
                self._save()
            return tok.access_token or None


class OAuthDeviceFlow:
    """Device-code ("limited input") authorisation
    (OAuth.h OAuthPollingManager semantics)."""

    def __init__(self, service_id: str, auth_url: str, token_url: str,
                 client_id: str, scope: str = "",
                 http_post: Callable = default_http_post,
                 client_secret: str = ""):
        self.service_id = service_id
        self.auth_url = auth_url
        self.token_url = token_url
        self.client_id = client_id
        self.client_secret = client_secret
        self.scope = scope
        self._post = http_post

    def begin(self) -> DeviceCodeRequest:
        resp = self._post(self.auth_url,
                          {"client_id": self.client_id, "scope": self.scope},
                          {})
        return DeviceCodeRequest(
            service_id=self.service_id,
            device_code=resp["device_code"],
            user_code=resp.get("user_code", ""),
            verification_url=resp.get("verification_uri",
                                      resp.get("verification_url", "")),
            interval=float(resp.get("interval", 5)),
            expires_at=time.time() + float(resp.get("expires_in", 300)))

    def poll_once(self, req: DeviceCodeRequest) -> Optional[dict]:
        """One token poll; None while authorisation is pending."""
        if time.time() > req.expires_at:
            raise TimeoutError("device code expired")
        data = {"client_id": self.client_id,
                "device_code": req.device_code,
                "grant_type": "urn:ietf:params:oauth:grant-type:device_code"}
        if self.client_secret:
            data["client_secret"] = self.client_secret
        resp = self._post(self.token_url, data, {})
        if resp.get("error") in ("authorization_pending", "slow_down"):
            return None
        if resp.get("error"):
            raise RuntimeError(resp["error"])
        return resp

    def poll_until_authorised(self, req: DeviceCodeRequest,
                              deadline: Optional[float] = None) -> dict:
        while True:
            resp = self.poll_once(req)
            if resp is not None:
                return resp
            if deadline and time.time() > deadline:
                raise TimeoutError("authorisation timed out")
            time.sleep(req.interval)

    def refresh(self, refresh_token: str) -> dict:
        data = {"client_id": self.client_id, "refresh_token": refresh_token,
                "grant_type": "refresh_token"}
        if self.client_secret:
            data["client_secret"] = self.client_secret
        return self._post(self.token_url, data, {})
