"""Embedded web application framework + the config web UI.

Parity targets: OpenHome/Web/WebAppFramework.h:41-397 — an HTTP app server
hosting multiple apps, each client getting a server-side "tab" with a
long-poll message queue (create via /<app>/lpcreate, poll /<app>/lp,
terminate /<app>/lpterminate, inactive tabs reaped) — and
Web/ConfigUi/ConfigUi.h:313-494, the app that generates its UI from
ConfigManager metadata and round-trips value changes as JSON messages.
"""

from __future__ import annotations

import json
import queue
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

TAB_TIMEOUT_S = 30.0
MAX_TABS = 8          # reference kMaxSessions-ish
LONGPOLL_WAIT_S = 5.0


class Tab:
    """One client's session: a message queue the app pushes into
    (IWebApp/ITab, WebAppFramework.h)."""

    def __init__(self, tab_id: int):
        self.id = tab_id
        self.queue: "queue.Queue[dict]" = queue.Queue(256)
        self.last_seen = time.monotonic()
        self.destroyed = False

    def send(self, message: dict) -> None:
        try:
            self.queue.put_nowait(message)
        except queue.Full:
            pass

    def poll(self, timeout: float = LONGPOLL_WAIT_S) -> list[dict]:
        self.last_seen = time.monotonic()
        out = []
        try:
            out.append(self.queue.get(timeout=timeout))
            while True:
                out.append(self.queue.get_nowait())
        except queue.Empty:
            pass
        return out


class WebApp:
    """An app: static resources + tab lifecycle + message handling."""

    name = "?"

    def resource(self, path: str) -> Optional[tuple[str, bytes]]:
        """(mime, body) for a static resource, or None."""
        return None

    def tab_created(self, tab: Tab) -> None:
        pass

    def tab_destroyed(self, tab: Tab) -> None:
        """Called when a tab is terminated or reaped; apps release any
        per-tab resources (subscriptions) here."""

    def receive(self, tab: Tab, message: dict) -> None:
        pass


class WebAppFramework:
    """The app server (WebAppFramework.h:41)."""

    def __init__(self, port: int = 0, host: str = "127.0.0.1"):
        self._apps: dict[str, WebApp] = {}
        self._tabs: dict[int, tuple[str, Tab]] = {}
        self._next_tab = 1
        self._lock = threading.Lock()
        framework = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, body: bytes,
                       mime: str = "application/json"):
                self.send_response(code)
                self.send_header("Content-Type", mime)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                framework._handle(self, "GET")

            def do_POST(self):
                framework._handle(self, "POST")

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True, name="WebAppFramework")
        self._reaper = threading.Thread(target=self._reap_loop, daemon=True)
        self._running = True

    def start(self) -> None:
        self._thread.start()
        self._reaper.start()

    def close(self) -> None:
        self._running = False
        self._server.shutdown()

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def add_app(self, app: WebApp) -> None:
        self._apps[app.name] = app

    # -- internals -----------------------------------------------------------
    def _destroy_tab(self, tid: int) -> None:
        with self._lock:
            entry = self._tabs.pop(tid, None)
        if entry is not None:
            app_name, tab = entry
            tab.destroyed = True
            app = self._apps.get(app_name)
            if app is not None:
                app.tab_destroyed(tab)

    def _reap_loop(self) -> None:
        while self._running:
            time.sleep(2.0)
            now = time.monotonic()
            with self._lock:
                dead = [tid for tid, (_a, t) in self._tabs.items()
                        if now - t.last_seen > TAB_TIMEOUT_S]
            for tid in dead:
                self._destroy_tab(tid)

    def _handle(self, h, method: str) -> None:
        parsed = urllib.parse.urlparse(h.path)
        parts = [p for p in parsed.path.split("/") if p]
        if not parts:
            apps = "".join(f'<li><a href="/{a}/">{a}</a></li>'
                           for a in sorted(self._apps))
            h._reply(200, f"<html><ul>{apps}</ul></html>".encode(),
                     "text/html")
            return
        app = self._apps.get(parts[0])
        if app is None:
            h._reply(404, b"{}")
            return
        sub = "/".join(parts[1:]) or "index.html"
        if sub == "lpcreate":
            with self._lock:
                if len(self._tabs) >= MAX_TABS:
                    h._reply(503, b'{"error":"no free tabs"}')
                    return
                tab = Tab(self._next_tab)
                self._next_tab += 1
                self._tabs[tab.id] = (app.name, tab)
            app.tab_created(tab)
            h._reply(200, json.dumps({"session-id": tab.id}).encode())
            return
        if sub in ("lp", "lpterminate", "send"):
            qs = urllib.parse.parse_qs(parsed.query)
            tid = int(qs.get("session-id", ["0"])[0])
            with self._lock:
                entry = self._tabs.get(tid)
            if entry is None or entry[0] != app.name:
                h._reply(404, b'{"error":"no such tab"}')
                return
            tab = entry[1]
            if sub == "lp":
                msgs = tab.poll()
                h._reply(200, json.dumps(msgs).encode())
            elif sub == "lpterminate":
                self._destroy_tab(tid)
                h._reply(200, b"{}")
            else:  # send
                length = int(h.headers.get("Content-Length", 0))
                body = h.rfile.read(length)
                try:
                    msg = json.loads(body)
                except ValueError:
                    h._reply(400, b'{"error":"bad json"}')
                    return
                app.receive(tab, msg)
                h._reply(200, b"{}")
            return
        res = app.resource(sub)
        if res is None:
            h._reply(404, b"{}")
            return
        mime, body = res
        h._reply(200, body, mime)


class ConfigApp(WebApp):
    """The config web UI (ConfigUi.h:313): UI model generated from
    ConfigManager metadata; value updates round-trip as JSON messages."""

    name = "config"

    def __init__(self, config_manager):
        self._cm = config_manager
        # tab id -> [(config_val, subscription_id)] so reaped/terminated
        # tabs release their callbacks (previously leaked forever)
        self._subs: dict[int, list] = {}
        self._subs_lock = threading.Lock()

    def _meta(self) -> list[dict]:
        from ..av.config import ConfigChoice, ConfigNum, ConfigText
        out = []
        for key in self._cm.keys():
            val = self._cm.get(key)
            entry = {"key": key, "value": val.value}
            if isinstance(val, ConfigNum):
                entry.update(type="num", min=val.min_value,
                             max=val.max_value)
            elif isinstance(val, ConfigChoice):
                entry.update(type="choice", choices=val.choices)
            elif isinstance(val, ConfigText):
                entry.update(type="text", maxLength=val.max_length)
            else:
                entry.update(type="text")
            out.append(entry)
        return out

    def resource(self, path: str) -> Optional[tuple[str, bytes]]:
        if path == "index.html":
            return ("text/html", _CONFIG_HTML.encode())
        if path == "meta.json":
            return ("application/json", json.dumps(self._meta()).encode())
        return None

    def tab_created(self, tab: Tab) -> None:
        # initial state push + subscribe every value to this tab
        for entry in self._meta():
            tab.send({"type": "update", "key": entry["key"],
                      "value": entry["value"]})
        subs = []
        for key in self._cm.keys():
            val = self._cm.get(key)

            def cb(k, v, _tab=tab):
                if not _tab.destroyed:
                    _tab.send({"type": "update", "key": k, "value": v})
            subs.append((val, val.subscribe(cb)))
        with self._subs_lock:
            self._subs[tab.id] = subs

    def tab_destroyed(self, tab: Tab) -> None:
        with self._subs_lock:
            subs = self._subs.pop(tab.id, [])
        for val, sid in subs:
            val.unsubscribe(sid)

    def receive(self, tab: Tab, message: dict) -> None:
        if message.get("type") == "set":
            key = message.get("key", "")
            if self._cm.has(key):
                try:
                    self._cm.get(key).set(message.get("value"))
                except (ValueError, TypeError) as e:
                    tab.send({"type": "error", "key": key,
                              "description": str(e)})


_CONFIG_HTML = """<!doctype html><html><head><title>Config</title></head>
<body><h1>Configuration</h1><div id="cfg"></div>
<script>
async function boot() {
  const meta = await (await fetch('meta.json')).json();
  const sid = (await (await fetch('lpcreate')).json())['session-id'];
  const div = document.getElementById('cfg');
  const inputs = new Map();   // key -> input (no innerHTML: values/keys
  for (const m of meta) {     // are user data and must never parse as HTML)
    const row = document.createElement('div');
    const label = document.createElement('label');
    label.textContent = m.key;
    const input = document.createElement('input');
    input.value = String(m.value);
    input.onchange = (e) => fetch(`send?session-id=${sid}`, {
      method: 'POST',
      body: JSON.stringify({type:'set', key:m.key, value:e.target.value})});
    row.appendChild(label);
    row.appendChild(document.createTextNode(' '));
    row.appendChild(input);
    inputs.set(m.key, input);
    div.appendChild(row);
  }
  while (true) {
    const msgs = await (await fetch(`lp?session-id=${sid}`)).json();
    for (const m of msgs)
      if (m.type === 'update' && inputs.has(m.key))
        inputs.get(m.key).value = String(m.value);
  }
}
boot();
</script></body></html>"""
