"""S1 — live Gmail REST client over stdlib urllib (no extra deps).

Implements the reference's wire protocol exactly
(``resources/gmail_functions.py:154-185``): ``Authorization: Bearer``
header, ``GET {base}/users/me/messages?pageToken=…`` list pages, ``GET
{base}/users/me/messages/{id}`` per-id fetch — plus the OAuth
refresh-token grant the reference delegates to google-auth
(``resources/get_token.py:24-26``), done here as a plain POST to the
token endpoint (RFC 6749 §6), so the path needs nothing beyond the
standard library.

Production posture the reference lacks:

* **retry with exponential backoff** on 429/5xx, honoring
  ``Retry-After`` (the reference's raw ``requests.get`` loop dies on the
  first quota hit);
* **401 → one forced token refresh + replay** (long extract runs cross
  token expiry);
* **no credentials through the driver**: executors build clients via
  :class:`HttpClientConfig` (a picklable dataclass of endpoints + the
  refresh credential), matching the ``client_factory`` contract of
  :func:`gmail_etl_spark.sources.gmail.fetch_messages`.

Everything here is injectable for tests: ``tests/test_gmail_http.py``
drives it against a local ``http.server`` speaking these shapes.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field

GMAIL_API_BASE = "https://gmail.googleapis.com/gmail/v1"
GOOGLE_TOKEN_URL = "https://oauth2.googleapis.com/token"
GOOGLE_AUTH_URL = "https://accounts.google.com/o/oauth2/v2/auth"
GMAIL_READONLY_SCOPE = "https://www.googleapis.com/auth/gmail.readonly"

#: statuses worth retrying (quota + transient server errors)
_RETRYABLE = frozenset({429, 500, 502, 503, 504})


@dataclass
class HttpClientConfig:
    """Everything an executor needs to build a live client — plain data,
    safe to pickle into ``client_factory`` closures."""

    api_base: str = GMAIL_API_BASE
    token_url: str = GOOGLE_TOKEN_URL
    client_id: str = ""
    client_secret: str = ""
    refresh_token: str = ""
    #: pre-issued access token (skips the refresh grant; tests, short jobs)
    access_token: str | None = None
    user_id: str = "me"
    page_size: int | None = None
    timeout_s: float = 30.0
    max_retries: int = 4
    backoff_s: float = 0.5
    #: injectable sleeper so tests don't wait out real backoff
    sleep: object = field(default=time.sleep, repr=False, compare=False)


class OAuthTokenSource:
    """Access-token cache over the OAuth 2.0 refresh-token grant.

    POSTs ``grant_type=refresh_token`` to the token endpoint and caches
    the access token until ~60 s before expiry — the stdlib equivalent
    of google-auth's ``creds.refresh(Request())`` in the reference's
    ``get_token.py:26``."""

    def __init__(self, cfg: HttpClientConfig) -> None:
        self._cfg = cfg
        self._token: str | None = cfg.access_token
        self._expires_at = float("inf") if cfg.access_token else 0.0

    def token(self, force_refresh: bool = False) -> str:
        if force_refresh or self._token is None or time.time() >= self._expires_at:
            self._refresh()
        assert self._token is not None
        return self._token

    def _refresh(self) -> None:
        body = urllib.parse.urlencode(
            {
                "client_id": self._cfg.client_id,
                "client_secret": self._cfg.client_secret,
                "refresh_token": self._cfg.refresh_token,
                "grant_type": "refresh_token",
            }
        ).encode()
        req = urllib.request.Request(
            self._cfg.token_url,
            data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self._cfg.timeout_s) as resp:
            payload = json.loads(resp.read().decode())
        self._token = payload["access_token"]
        self._expires_at = time.time() + float(payload.get("expires_in", 3600)) - 60.0


class HttpGmailClient:
    """Live implementation of the :class:`~gmail_etl_spark.sources.gmail.
    GmailClient` protocol over urllib."""

    def __init__(self, cfg: HttpClientConfig) -> None:
        self._cfg = cfg
        self._tokens = OAuthTokenSource(cfg)

    # -- GmailClient protocol -------------------------------------------------

    def list_message_ids(self, page_token: str | None) -> tuple[list[str], str | None]:
        params: dict[str, str] = {}
        if page_token:
            params["pageToken"] = page_token  # gmail_functions.py:164
        if self._cfg.page_size:
            params["maxResults"] = str(self._cfg.page_size)
        qs = f"?{urllib.parse.urlencode(params)}" if params else ""
        url = f"{self._cfg.api_base}/users/{self._cfg.user_id}/messages{qs}"
        payload = self._get_json(url)
        ids = [m["id"] for m in payload.get("messages", [])]
        # .get, not [..]: the reference exits its loop through an
        # unguarded KeyError on the last page (gmail_functions.py:185)
        return ids, payload.get("nextPageToken")

    def get_message(self, message_id: str) -> dict:
        url = f"{self._cfg.api_base}/users/{self._cfg.user_id}/messages/{message_id}"
        return self._get_json(url)

    # -- transport ------------------------------------------------------------

    def _get_json(self, url: str) -> dict:
        cfg = self._cfg
        force_refresh = False
        for attempt in range(cfg.max_retries + 1):
            req = urllib.request.Request(
                url,
                headers={
                    "Authorization": f"Bearer {self._tokens.token(force_refresh)}"
                },
            )
            force_refresh = False
            try:
                with urllib.request.urlopen(req, timeout=cfg.timeout_s) as resp:
                    return json.loads(resp.read().decode())
            except urllib.error.HTTPError as err:
                if err.code == 401 and attempt < cfg.max_retries:
                    force_refresh = True  # expired mid-run: refresh + replay
                    continue
                if err.code in _RETRYABLE and attempt < cfg.max_retries:
                    retry_after = err.headers.get("Retry-After")
                    delay = (
                        float(retry_after)
                        if retry_after
                        else cfg.backoff_s * (2**attempt)
                    )
                    cfg.sleep(delay)
                    continue
                raise
            except urllib.error.URLError:
                if attempt < cfg.max_retries:
                    cfg.sleep(cfg.backoff_s * (2**attempt))
                    continue
                raise
        raise RuntimeError("unreachable: retry loop exits via return or raise")


# ---------------------------------------------------------------------------
# one-time interactive bootstrap — authorization-code grant (RFC 6749 §4.1)
# ---------------------------------------------------------------------------


def authorization_url(
    cfg: HttpClientConfig,
    scope: str = GMAIL_READONLY_SCOPE,
    redirect_uri: str = "http://localhost",
    auth_url: str = GOOGLE_AUTH_URL,
    state: str | None = None,
) -> str:
    """Consent-screen URL for the one-time authorization-code grant.

    The reference mints its refresh token interactively via google-auth's
    ``InstalledAppFlow.run_local_server`` (``resources/get_token.py:29-31``);
    this is the same flow with no dependency: open the returned URL in a
    browser, approve, and paste the ``code`` query parameter of the
    redirect back into :func:`exchange_code`.  ``access_type=offline`` +
    ``prompt=consent`` force a refresh token in the response."""
    params = {
        "client_id": cfg.client_id,
        "redirect_uri": redirect_uri,
        "response_type": "code",
        "scope": scope,
        "access_type": "offline",
        "prompt": "consent",
    }
    if state is not None:
        params["state"] = state
    return f"{auth_url}?{urllib.parse.urlencode(params)}"


def exchange_code(
    cfg: HttpClientConfig,
    code: str,
    redirect_uri: str = "http://localhost",
) -> HttpClientConfig:
    """Exchange a pasted authorization code for tokens (RFC 6749 §4.1.3)
    and return a config carrying the minted refresh token — ready for
    :func:`http_client_factory` / the streaming extract path.

    The paste may be the bare code or the full redirect URL; the ``code``
    query parameter is extracted either way."""
    if "://" in code or "code=" in code:
        qs = urllib.parse.parse_qs(urllib.parse.urlparse(code).query)
        code = qs["code"][0]
    body = urllib.parse.urlencode(
        {
            "client_id": cfg.client_id,
            "client_secret": cfg.client_secret,
            "code": code,
            "redirect_uri": redirect_uri,
            "grant_type": "authorization_code",
        }
    ).encode()
    req = urllib.request.Request(
        cfg.token_url,
        data=body,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=cfg.timeout_s) as resp:
        payload = json.loads(resp.read().decode())
    from dataclasses import replace

    return replace(
        cfg,
        refresh_token=payload["refresh_token"],
        access_token=payload.get("access_token"),
    )


def bootstrap_refresh_token(
    cfg: HttpClientConfig,
    scope: str = GMAIL_READONLY_SCOPE,
    redirect_uri: str = "http://localhost",
    auth_url: str = GOOGLE_AUTH_URL,
    input_fn=input,
    print_fn=print,
) -> HttpClientConfig:
    """Interactive one-time setup: print the consent URL, accept the
    pasted code (or full redirect URL), exchange it, and return the
    refresh-token-bearing config.  ``input_fn``/``print_fn`` are
    injectable so tests drive the flow without a TTY."""
    print_fn("Open this URL in a browser and approve access:")
    print_fn(authorization_url(cfg, scope, redirect_uri, auth_url))
    code = input_fn("Paste the authorization code (or redirect URL): ").strip()
    return exchange_code(cfg, code, redirect_uri)


def http_client_factory(cfg: HttpClientConfig):
    """Picklable factory for :func:`fetch_messages` — each executor
    partition constructs its own client (own token cache, own
    connections); only the config dataclass crosses the wire."""

    def make() -> HttpGmailClient:
        return HttpGmailClient(cfg)

    return make
