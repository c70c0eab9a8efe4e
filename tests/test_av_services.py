"""Credentials/OAuth/Pins/service-client tests (reference TestCredentials,
TestOAuth, TestPins, TestQobuz-with-fakes style)."""

import json
import time

import numpy as np
import pytest

from ohpipeline_tpu.av.config import RamStore
from ohpipeline_tpu.av.credentials import Credentials
from ohpipeline_tpu.av.oauth import (DeviceCodeRequest, OAuthDeviceFlow,
                                     TokenManager)
from ohpipeline_tpu.av.pins import (Pin, PinsManager, TransportPinInvoker,
                                    UrlPinInvoker)
from ohpipeline_tpu.av import services as SVC


class TestCredentials:
    def test_roundtrip_encrypted_at_rest(self):
        store = RamStore()
        c = Credentials(store)
        c.add("qobuz.com")
        c.set("qobuz.com", "alice", b"s3cret")
        user, pw = c.get("qobuz.com")
        assert (user, pw) == ("alice", b"s3cret")
        # at rest the password must NOT be plaintext
        raw = store.read("Credentials.qobuz.com.Password")
        assert b"s3cret" not in raw
        # same store, fresh instance: key + creds persist
        c2 = Credentials(store)
        assert c2.get("qobuz.com") == ("alice", b"s3cret")

    def test_control_point_encrypts_with_public_key(self):
        from cryptography.hazmat.primitives import serialization
        from cryptography.hazmat.primitives.asymmetric import padding
        c = Credentials(RamStore())
        c.add("svc")
        pub = serialization.load_pem_public_key(c.public_key_pem().encode())
        blob = pub.encrypt(b"networkpw", padding.PKCS1v15())
        c.set("svc", "bob", blob)
        assert c.get("svc") == ("bob", b"networkpw")

    def test_observers_and_clear(self):
        c = Credentials(RamStore())
        c.add("svc")
        seen = []
        c.subscribe("svc", lambda: seen.append(1))
        c.set("svc", "u", b"p")
        c.clear("svc")
        assert len(seen) == 2
        assert c.get("svc") == ("", b"")


class FakeAuthServer:
    """Scripted device-flow endpoint (the reference's TestPipe-style
    mock)."""

    def __init__(self, authorise_after=2):
        self.polls = 0
        self.authorise_after = authorise_after

    def post(self, url, data, headers):
        if "device_authorization" in url or url.endswith("/auth"):
            return {"device_code": "DEV", "user_code": "ABCD",
                    "verification_uri": "https://x/activate",
                    "interval": 0.01, "expires_in": 60}
        if data.get("grant_type", "").endswith("device_code"):
            self.polls += 1
            if self.polls < self.authorise_after:
                return {"error": "authorization_pending"}
            return {"access_token": "AT1", "refresh_token": "RT1",
                    "expires_in": 3600}
        if data.get("grant_type") == "refresh_token":
            return {"access_token": f"AT-{data['refresh_token']}",
                    "expires_in": 3600}
        raise AssertionError(url)


class TestOAuth:
    def test_device_flow_to_tokens(self):
        srv = FakeAuthServer()
        flow = OAuthDeviceFlow("svc", "https://x/auth", "https://x/token",
                               "client1", http_post=srv.post)
        req = flow.begin()
        assert req.user_code == "ABCD"
        resp = flow.poll_until_authorised(req)
        assert resp["access_token"] == "AT1"
        store = RamStore()
        tm = TokenManager("svc", store, flow.refresh)
        tm.add_token("t1", resp["refresh_token"])
        assert tm.access_token("t1") == "AT-RT1"
        # persistence: fresh manager sees the refresh token
        tm2 = TokenManager("svc", store, flow.refresh)
        assert tm2.token_ids() == ["t1"]

    def test_token_slot_limits(self):
        tm = TokenManager("svc", RamStore(), lambda rt: {}, max_short=2)
        tm.add_token("a", "r1")
        tm.add_token("b", "r2")
        with pytest.raises(RuntimeError):
            tm.add_token("c", "r3")
        tm.remove_token("a")
        tm.add_token("c", "r3")


class TestPins:
    def test_set_invoke_persist(self):
        store = RamStore()
        calls = []

        class FakePm:
            def play(self):
                calls.append("play")

            def play_uri(self, uri, md=""):
                calls.append(("uri", uri))

        pm = FakePm()
        pins = PinsManager(store)
        pins.add_invoker(TransportPinInvoker(pm))
        pins.add_invoker(UrlPinInvoker(pm))
        pins.set_pin(0, Pin(mode="transport", uri="play", title="Play"))
        pins.set_pin(1, Pin(mode="url", uri="http://radio/x", title="X"))
        pins.invoke(0)
        pins.invoke(1)
        assert calls == ["play", ("uri", "http://radio/x")]
        with pytest.raises(LookupError):
            pins.invoke(2)
        # persisted across managers
        pins2 = PinsManager(store)
        assert pins2.pin(1).uri == "http://radio/x"

    def test_unknown_mode_rejected(self):
        pins = PinsManager(RamStore())
        with pytest.raises(KeyError):
            pins.set_pin(0, Pin(mode="nosuch", uri="x"))


class FakeHttp:
    def __init__(self, routes):
        self.routes = routes
        self.calls = []

    def __call__(self, method, url, headers, body=b""):
        self.calls.append((method, url))
        for prefix, resp in self.routes.items():
            if prefix in url:
                return 200, json.dumps(resp).encode()
        return 404, b"{}"


class TestServices:
    def test_qobuz_login_and_signed_stream_url(self):
        creds = Credentials(RamStore())
        http = FakeHttp({"user/login": {"user_auth_token": "UAT"},
                         "track/getFileUrl": {"url": "http://cdn/a.flac"}})
        q = SVC.QobuzService(creds, "app1", "secret1", http=http)
        creds.set(q.ID, "user@x", b"pw")
        assert q.login()
        assert q.stream_url("99") == "http://cdn/a.flac"
        assert "request_sig=" in http.calls[-1][1]

    def test_tidal_stream_url_with_token(self):
        store = RamStore()
        srv = FakeAuthServer(authorise_after=1)
        http = FakeHttp({"playbackinfo": {"urls": ["http://cdn/t.flac"]}})
        t = SVC.TidalService(store, "cid", http=http, http_post=srv.post)
        resp = t.oauth.poll_until_authorised(t.oauth.begin())
        t.tokens.add_token("u1", resp["refresh_token"])
        assert t.stream_url("42", "u1") == "http://cdn/t.flac"

    def test_calmradio_token_url(self):
        creds = Credentials(RamStore())
        http = FakeHttp({"get_token": {"token": "TOK"}})
        c = SVC.CalmRadioService(creds, http=http)
        creds.set(c.ID, "u", b"p")
        url = c.stream_url("http://streams.calm/chan1")
        assert url.startswith("http://streams.calm/chan1?user=u&token=TOK")

    def test_tunein_opml_parse_and_refresh(self):
        opml = """<opml version="1"><body>
          <outline type="audio" text="Station A" URL="http://a/s.mp3"/>
          <outline type="link" text="More" URL="http://x"/>
          <outline type="audio" text="Station B" URL="http://b/s.aac"/>
        </body></opml>"""
        http = lambda m, u, h, b=b"": (200, opml.encode())
        svc = SVC.TuneInService("pid", "user", http=http)
        from ohpipeline_tpu.av.sources import PresetDatabase
        db = PresetDatabase()
        assert svc.refresh_into(db) == 2
        assert db.preset(0).uri == "http://a/s.mp3"
        assert db.preset(1).metadata == "Station B"

    def test_service_protocol_resolves_then_streams(self):
        streamed = []

        class FakeHttpProtocol:
            def initialise(self, supply, ids):
                pass

            def stream(self, uri):
                streamed.append(uri)
                from ohpipeline_tpu.protocols.base import ProtocolStreamResult
                return ProtocolStreamResult.SUCCESS

        p = SVC.ServiceProtocol("tidal", lambda uri: "http://cdn/x.flac",
                                http_protocol=FakeHttpProtocol())
        p.initialise(None, None)
        assert p.recognise("tidal://track/9")
        p.stream("tidal://track/9")
        assert streamed == ["http://cdn/x.flac"]
