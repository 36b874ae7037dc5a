"""Spreadsheet URL/id parsing (reference: src/gsheets_utils.cpp).

* ``extract_spreadsheet_id`` — bare id or ``/d/<id>`` from a full URL
  (src/gsheets_utils.cpp:11-28).
* ``extract_sheet_id`` — ``gid=<n>`` query/fragment param
  (src/gsheets_utils.cpp:30-39).
* ``extract_sheet_range`` — ``range=<a1>`` query param
  (src/gsheets_utils.cpp:41-51).
* ``url_encode`` — percent-encode for path segments
  (src/gsheets_utils.cpp:70-82).
* ``random_state`` — CSRF state strings (src/gsheets_utils.cpp:53-68).
"""

from __future__ import annotations

import re
import secrets
import urllib.parse

_ID_RE = re.compile(r"^[a-zA-Z0-9-_]+$")
_D_SEGMENT_RE = re.compile(r"/d/([a-zA-Z0-9-_]+)")
_GID_RE = re.compile(r"gid=([0-9]+)")
_RANGE_RE = re.compile(r"range=([^&#]+)")


def extract_spreadsheet_id(url_or_id: str) -> str:
    """Spreadsheet id from a bare id or a docs.google.com URL."""
    if _ID_RE.match(url_or_id):
        return url_or_id
    m = _D_SEGMENT_RE.search(url_or_id)
    if m:
        return m.group(1)
    raise ValueError(f"could not extract spreadsheet id from {url_or_id!r}")


def extract_sheet_id(url: str) -> int | None:
    """Numeric sheet id (gid) from a URL, or None."""
    m = _GID_RE.search(url)
    return int(m.group(1)) if m else None


def extract_sheet_range(url: str) -> str | None:
    """A1 range from a ``range=`` URL parameter, or None."""
    m = _RANGE_RE.search(url)
    return urllib.parse.unquote(m.group(1)) if m else None


def url_encode(value: str) -> str:
    """Percent-encode everything outside the unreserved set."""
    return urllib.parse.quote(value, safe="-_.~")


def random_state(length: int = 32) -> str:
    """URL-safe random state string (OAuth CSRF)."""
    return secrets.token_urlsafe(length)[:length]
