"""Interactive OAuth token helper — A2 parity, OUT of the Spark job path.

The reference's ``InitiateOAuthFlow`` (src/gsheets_auth.cpp:140-184)
runs the implicit web-app flow: print/open an accounts.google.com auth
URL (fixed public client id, redirect to duckdb-gsheets.com/oauth,
``response_type=token``, spreadsheets scope, random CSRF state), then
read the token the user pastes back. A cluster job can't block on
stdin/browser (SURVEY §7), so the same flow ships as this small CLI:

    python -m duckdb_gsheets_spark.sources.gsheets.oauth_cli

mints a token interactively; export it as ``GSHEETS_TOKEN`` (or pass
as the ``token`` option) for the actual Spark job.
"""

from __future__ import annotations

import os
import sys
import webbrowser
from urllib.parse import urlencode

from duckdb_gsheets_spark.sources.gsheets.urls import random_state

#: Public OAuth client of the reference extension
#: (src/gsheets_auth.cpp:142-144) — same web-app implicit flow.
CLIENT_ID = "793766532675-rehqgocfn88h0nl88322ht6d1i12kl4e.apps.googleusercontent.com"
REDIRECT_URI = "https://duckdb-gsheets.com/oauth"
AUTH_URL = "https://accounts.google.com/o/oauth2/v2/auth"
SCOPE = "https://www.googleapis.com/auth/spreadsheets"


def build_auth_url(
    client_id: str = CLIENT_ID,
    redirect_uri: str = REDIRECT_URI,
    state: str | None = None,
) -> str:
    """The authorization URL (reference: gsheets_auth.cpp:149-151)."""
    query = urlencode(
        {
            "client_id": client_id,
            "redirect_uri": redirect_uri,
            "response_type": "token",
            "scope": SCOPE,
            "state": state if state is not None else random_state(10),
        }
    )
    return f"{AUTH_URL}?{query}"


def initiate_oauth_flow(
    client_id: str = CLIENT_ID,
    redirect_uri: str = REDIRECT_URI,
    open_browser: bool | None = None,
    input_fn=input,
    print_fn=print,
) -> str:
    """Print (and best-effort open) the auth URL, return the pasted
    token. ``open_browser=None`` mirrors the reference's headless
    check: skip the browser when no DISPLAY/WAYLAND_DISPLAY."""
    url = build_auth_url(client_id, redirect_uri)
    print_fn("Visit the below URL to authorize access")
    print_fn(url)
    if open_browser is None:
        open_browser = bool(
            os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")
        )
    if open_browser:
        try:
            webbrowser.open(url)
        except Exception:
            pass  # the printed URL is the contract; the browser is sugar
    return input_fn("After granting permission, enter the token: ").strip()


def main() -> int:
    token = initiate_oauth_flow()
    if not token:
        print("no token entered", file=sys.stderr)
        return 1
    print(f"export GSHEETS_TOKEN={token}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
