"""Credential providers (reference: src/sheets/auth/*, src/gsheets_auth.cpp).

* :class:`BearerTokenAuth` — static token
  (src/sheets/auth/bearer_token_auth.cpp:6-8).
* :class:`ServiceAccountAuth` — RS256 JWT built from a service-account
  key, exchanged at the Google token endpoint, cached ~29 min with a
  60 s early refresh (src/sheets/auth/service_account_auth.cpp:44-151).
* :func:`auth_from_options` — resolve credentials with the precedence
  reader/writer options > environment, replacing the reference's
  secret manager (src/sheets/auth_factory.cpp:10-34,
  src/gsheets_auth.cpp:34-138). Spark has no secret store; options and
  env are the equivalents, and sensitive option values are never
  echoed back: error paths that include options route them through
  :func:`redact_options` (reference redacts token/secret/filepath).
* :mod:`.oauth_cli` — the interactive OAuth flow (A2) as a separate
  token-minting CLI, kept out of the cluster job path.
"""

from __future__ import annotations

import base64
import json
import os
import time

from duckdb_gsheets_spark.sources.gsheets.errors import SheetsApiError, SheetsParseError
from duckdb_gsheets_spark.sources.gsheets.transport import Transport

TOKEN_URL = "https://oauth2.googleapis.com/token"
SCOPE = "https://www.googleapis.com/auth/spreadsheets"
TOKEN_TTL_SECONDS = 1800
EARLY_REFRESH_SECONDS = 60

#: Option keys whose values must never appear in logs or error text
#: (reference redact_keys, src/gsheets_auth.cpp:30-32; proxy_password
#: added — the reference stores it in its secret manager instead).
REDACTED_OPTIONS = frozenset(
    {"token", "secret", "private_key", "key_file", "proxy_password"}
)


def redact_options(options: dict[str, str]) -> dict[str, str]:
    """Copy of *options* safe to embed in error text or logs: values
    of :data:`REDACTED_OPTIONS` keys are replaced with ``<redacted>``.
    Every error path that echoes connector options must go through
    this (parity with the reference's redact_keys behavior)."""
    return {
        k: "<redacted>" if k.lower() in REDACTED_OPTIONS else v
        for k, v in options.items()
    }


def base64url_encode(data: bytes | str) -> str:
    """No-padding URL-safe base64 (reference: encoding.cpp:14-43)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


def normalize_pem_key(key: str) -> str:
    """Replace literal ``\\n`` with newlines in pasted keys
    (reference: encoding.cpp:45-53)."""
    return key.replace("\\n", "\n")


class AuthProvider:
    def authorization_header(self) -> str:
        raise NotImplementedError


class BearerTokenAuth(AuthProvider):
    def __init__(self, token: str):
        self._token = token

    def authorization_header(self) -> str:
        return f"Bearer {self._token}"


class ServiceAccountAuth(AuthProvider):
    """JWT-bearer flow for service accounts.

    JWT claims: iss=client_email, scope, aud=token endpoint, iat=now,
    exp=now+1800 — signed RS256 with the account's private key, then
    exchanged for an access token. The token is cached and refreshed
    60 s before expiry.
    """

    def __init__(
        self,
        client_email: str,
        private_key: str,
        transport: Transport,
        token_url: str = TOKEN_URL,
    ):
        self._email = client_email
        self._key = normalize_pem_key(private_key)
        self._transport = transport
        self._token_url = token_url
        self._token: str | None = None
        self._expires_at: float = 0.0

    def create_jwt(self, now: float | None = None) -> str:
        now = time.time() if now is None else now
        header = base64url_encode(json.dumps({"alg": "RS256", "typ": "JWT"}))
        claims = base64url_encode(
            json.dumps(
                {
                    "iss": self._email,
                    "scope": SCOPE,
                    "aud": self._token_url,
                    "iat": int(now),
                    "exp": int(now) + TOKEN_TTL_SECONDS,
                }
            )
        )
        signing_input = f"{header}.{claims}"
        signature = self._sign(signing_input.encode("ascii"))
        return f"{signing_input}.{base64url_encode(signature)}"

    def _sign(self, message: bytes) -> bytes:
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import padding

        key = serialization.load_pem_private_key(
            self._key.encode("utf-8"), password=None
        )
        return key.sign(message, padding.PKCS1v15(), hashes.SHA256())

    def _exchange(self, jwt: str) -> tuple[str, float]:
        body = (
            "grant_type=urn%3Aietf%3Aparams%3Aoauth%3Agrant-type%3Ajwt-bearer"
            f"&assertion={jwt}"
        )
        resp = self._transport.post(
            self._token_url,
            body,
            {"Content-Type": "application/x-www-form-urlencoded"},
        )
        if resp.status != 200:
            raise SheetsApiError(resp.status, resp.body)
        try:
            payload = json.loads(resp.body)
        except json.JSONDecodeError as ex:
            raise SheetsParseError(f"bad token response: {ex}") from ex
        token = payload.get("access_token")
        if not token:
            raise SheetsParseError("token response missing access_token")
        expires_in = float(payload.get("expires_in", TOKEN_TTL_SECONDS))
        return token, time.time() + expires_in

    def _is_expired(self) -> bool:
        return (
            self._token is None
            or time.time() >= self._expires_at - EARLY_REFRESH_SECONDS
        )

    def authorization_header(self) -> str:
        if self._is_expired():
            self._token, self._expires_at = self._exchange(self.create_jwt())
        return f"Bearer {self._token}"


def _from_key_file_json(payload: dict, transport: Transport, token_url: str) -> AuthProvider:
    email = payload.get("client_email")
    key = payload.get("private_key")
    if not email or not key:
        raise ValueError("key file missing client_email/private_key")
    return ServiceAccountAuth(email, key, transport, token_url)


def auth_from_options(
    options: dict[str, str], transport: Transport
) -> AuthProvider | None:
    """Resolve an auth provider from connector options, then env.

    Precedence: ``token`` option > ``key_file`` option >
    ``GSHEETS_TOKEN`` env > ``GOOGLE_APPLICATION_CREDENTIALS`` env.
    Returns None when nothing is configured (caller decides whether
    that is an error — the reference raises at bind,
    src/gsheets_read.cpp:108-110).
    """
    token_url = options.get("token_url", TOKEN_URL)
    token = options.get("token")
    if token:
        return BearerTokenAuth(token)
    key_file = options.get("key_file")
    if key_file:
        with open(key_file, encoding="utf-8") as fh:
            return _from_key_file_json(json.load(fh), transport, token_url)
    env_token = os.environ.get("GSHEETS_TOKEN")
    if env_token:
        return BearerTokenAuth(env_token)
    env_key_file = os.environ.get("GOOGLE_APPLICATION_CREDENTIALS")
    if env_key_file:
        with open(env_key_file, encoding="utf-8") as fh:
            return _from_key_file_json(json.load(fh), transport, token_url)
    return None
