"""Live-protocol tests for the urllib Gmail client (S1): a local
``http.server`` speaks the Gmail REST shapes from
``resources/gmail_functions.py:154-185`` — token grant, paginated list,
per-id get — plus the failure modes (429 with Retry-After, expiring
access tokens) a real extract run hits."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from gmail_etl_spark.sources.gmail_http import (
    HttpClientConfig,
    HttpGmailClient,
    http_client_factory,
)

MESSAGES = [
    {
        "id": f"m{i:03d}",
        "payload": {
            "mimeType": "text/plain",
            "headers": [{"name": "Subject", "value": f"msg {i}"}],
            "body": {"data": None},
            "parts": None,
        },
    }
    for i in range(10)
]


class _GmailStub(BaseHTTPRequestHandler):
    """Serves /token, /gmail/v1/users/me/messages[?pageToken] and
    /gmail/v1/users/me/messages/{id}; scriptable failures via class
    state."""

    state: dict = {}

    def log_message(self, *args):  # silence
        pass

    def _json(self, code: int, payload: dict, headers: dict | None = None) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        st = self.state
        if urlparse(self.path).path != "/token":
            return self._json(404, {"error": "not found"})
        length = int(self.headers["Content-Length"])
        form = parse_qs(self.rfile.read(length).decode())
        if form["grant_type"] == ["authorization_code"]:
            # RFC 6749 §4.1.3 exchange: the one-time bootstrap path
            st["code_grants"] = st.get("code_grants", 0) + 1
            if form.get("code") != ["authcode-42"]:
                return self._json(400, {"error": "invalid_grant"})
            assert form["redirect_uri"] == ["http://localhost"]
            tok = "at-bootstrap"
            st.setdefault("valid_tokens", set()).add(tok)
            return self._json(
                200,
                {
                    "access_token": tok,
                    "refresh_token": "rt-secret",
                    "expires_in": 3600,
                },
            )
        st["token_grants"] = st.get("token_grants", 0) + 1
        assert form["grant_type"] == ["refresh_token"]
        assert form["refresh_token"] == ["rt-secret"]
        tok = f"at-{st['token_grants']}"
        st.setdefault("valid_tokens", set()).add(tok)
        return self._json(200, {"access_token": tok, "expires_in": 3600})

    def do_GET(self):
        st = self.state
        parsed = urlparse(self.path)
        auth = self.headers.get("Authorization", "")
        st["auth_seen"] = st.get("auth_seen", []) + [auth]
        token = auth.removeprefix("Bearer ")
        if token not in st.get("valid_tokens", set()):
            return self._json(401, {"error": "invalid token"})
        if st.get("throttle_next", 0) > 0:
            st["throttle_next"] -= 1
            return self._json(429, {"error": "quota"}, {"Retry-After": "0"})
        if parsed.path == "/gmail/v1/users/me/messages":
            q = parse_qs(parsed.query)
            start = int(q.get("pageToken", ["0"])[0])
            size = int(q.get("maxResults", ["4"])[0])
            page = MESSAGES[start : start + size]
            payload = {"messages": [{"id": m["id"]} for m in page]}
            if start + size < len(MESSAGES):
                payload["nextPageToken"] = str(start + size)  # absent on last page
            return self._json(200, payload)
        if parsed.path.startswith("/gmail/v1/users/me/messages/"):
            mid = parsed.path.rsplit("/", 1)[1]
            st["gets"] = st.get("gets", 0) + 1
            by_id = {m["id"]: m for m in MESSAGES}
            if mid not in by_id:
                return self._json(404, {"error": "unknown id"})
            return self._json(200, by_id[mid])
        return self._json(404, {"error": "not found"})


@pytest.fixture()
def stub_server():
    _GmailStub.state = {}
    server = ThreadingHTTPServer(("127.0.0.1", 0), _GmailStub)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        yield base, _GmailStub.state
    finally:
        server.shutdown()
        thread.join(timeout=5)


def _cfg(base: str, **kw) -> HttpClientConfig:
    return HttpClientConfig(
        api_base=f"{base}/gmail/v1",
        token_url=f"{base}/token",
        client_id="cid",
        client_secret="cs",
        refresh_token="rt-secret",
        sleep=lambda _s: None,
        **kw,
    )


def test_oauth_grant_pagination_and_get(stub_server):
    base, state = stub_server
    client = HttpGmailClient(_cfg(base))

    ids, tok = client.list_message_ids(None)
    assert ids == ["m000", "m001", "m002", "m003"] and tok == "4"
    ids2, tok2 = client.list_message_ids(tok)
    assert ids2 == ["m004", "m005", "m006", "m007"] and tok2 == "8"
    ids3, tok3 = client.list_message_ids(tok2)
    assert ids3 == ["m008", "m009"] and tok3 is None  # last page: no token key

    msg = client.get_message("m007")
    assert msg["payload"]["headers"][0]["value"] == "msg 7"
    # exactly one refresh grant served every call; Bearer header on each
    assert state["token_grants"] == 1
    assert all(a.startswith("Bearer at-1") for a in state["auth_seen"])


def test_retry_on_429_and_token_replay(stub_server):
    base, state = stub_server
    client = HttpGmailClient(_cfg(base))
    state["throttle_next"] = 2  # two quota hits, then success
    ids, _ = client.list_message_ids(None)
    assert ids[0] == "m000"

    # simulate server-side token expiry: invalidate, expect 401 → one
    # forced refresh → replay succeeds with the new token
    state["valid_tokens"].clear()
    msg = client.get_message("m001")
    assert msg["id"] == "m001"
    assert state["token_grants"] == 2


def test_max_retries_exhausted_raises(stub_server):
    import urllib.error

    base, state = stub_server
    client = HttpGmailClient(_cfg(base, max_retries=1))
    state["throttle_next"] = 99
    with pytest.raises(urllib.error.HTTPError):
        client.list_message_ids(None)


def test_fetch_messages_through_spark_http(spark, stub_server):
    """End-to-end E1 over the wire: driver paginates via HTTP, executors
    fetch their id slices via HTTP (local[*] reaches the same stub)."""
    from gmail_etl_spark.sources.gmail import fetch_messages

    base, state = stub_server
    factory = http_client_factory(_cfg(base))
    df = fetch_messages(spark, factory, limit=300, fetch_partitions=4)
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {m["id"] for m in MESSAGES}
    assert state["gets"] == len(MESSAGES)

    # ledger anti-join (J1): already-ingested ids are never fetched
    state["gets"] = 0
    ledger = spark.createDataFrame([("m000",), ("m001",)], "id string")
    df2 = fetch_messages(spark, factory, limit=300, ledger=ledger, fetch_partitions=4)
    assert {r["id"] for r in df2.collect()} == {m["id"] for m in MESSAGES[2:]}
    assert state["gets"] == len(MESSAGES) - 2


def test_bootstrap_authorization_code_flow(stub_server):
    """One-time interactive setup (reference get_token.py:29-31, done
    headless): consent URL printed, pasted code exchanged for a refresh
    token, and the resulting config drives the normal client path."""
    from gmail_etl_spark.sources.gmail_http import (
        authorization_url,
        bootstrap_refresh_token,
    )

    base, state = stub_server
    cfg = _cfg(base)  # refresh_token unused by the bootstrap path

    url = authorization_url(cfg, auth_url=f"{base}/auth")
    assert "response_type=code" in url and "access_type=offline" in url

    printed: list[str] = []
    booted = bootstrap_refresh_token(
        cfg,
        auth_url=f"{base}/auth",
        input_fn=lambda _prompt: "http://localhost/?code=authcode-42&scope=x",
        print_fn=printed.append,
    )
    assert state["code_grants"] == 1
    assert booted.refresh_token == "rt-secret"
    assert any("response_type=code" in line for line in printed)

    # the bootstrapped config works end-to-end against the live protocol
    client = HttpGmailClient(booted)
    ids, nxt = client.list_message_ids(None)
    assert ids == [m["id"] for m in MESSAGES[:4]] and nxt == "4"


def test_exchange_code_rejects_bad_code(stub_server):
    from urllib.error import HTTPError

    from gmail_etl_spark.sources.gmail_http import exchange_code

    base, state = stub_server
    with pytest.raises(HTTPError):
        exchange_code(_cfg(base), "wrong-code")
