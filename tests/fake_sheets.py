"""In-process fake of the Sheets v4 API surface the connector uses.

Runs a real HTTP server on localhost (Spark's Python worker processes
connect over the socket, so cross-process reads/writes exercise the
genuine executor path). Implements the endpoints from SURVEY §2
C2-C8: values get/update/append/clear, spreadsheet metadata,
batchUpdate addSheet — with Google-like grid semantics (trailing-empty
trimming on reads, append-below-table, ranged clears).
"""

from __future__ import annotations

import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from duckdb_gsheets_spark.sources.gsheets.a1 import A1Range, parse_bounds

Grid = list[list[str]]


class SpreadsheetStore:
    """One spreadsheet: sheet metadata + mutable grids."""

    def __init__(self, spreadsheet_id: str, title: str = "Fake Spreadsheet"):
        self.spreadsheet_id = spreadsheet_id
        self.title = title
        self.sheets: list[dict] = []
        self.grids: dict[str, Grid] = {}
        self._next_sheet_id = 0
        #: Drive-style per-file change counter (files.get fields=
        #: version): bumps on EVERY mutation. Tests that poke
        #: ``grids`` directly must call touch() (or use append_rows)
        #: or a revision-polling reader will rightly see "unchanged".
        self.version = 1

    def touch(self) -> None:
        self.version += 1

    def append_rows(self, name: str, rows: Grid) -> None:
        """Test helper: append rows to a sheet AND bump the Drive
        version, like any real mutation would."""
        self.grids[name].extend([list(r) for r in rows])
        self.touch()

    def add_sheet(self, name: str, grid: Grid | None = None) -> dict:
        props = {
            "sheetId": self._next_sheet_id,
            "title": name,
            "index": len(self.sheets),
            "sheetType": "GRID",
        }
        self._next_sheet_id += 1
        self.sheets.append(props)
        self.grids[name] = [list(r) for r in (grid or [])]
        self.touch()
        return props

    def metadata(self) -> dict:
        return {
            "spreadsheetId": self.spreadsheet_id,
            "properties": {
                "title": self.title,
                "locale": "en_US",
                "timeZone": "Etc/UTC",
            },
            "sheets": [{"properties": p} for p in self.sheets],
        }


def _resolve(store: SpreadsheetStore, a1: str) -> tuple[str, object]:
    rng = A1Range.parse(a1)
    sheet = rng.sheet if rng.sheet is not None else store.sheets[0]["title"]
    if sheet not in store.grids:
        raise KeyError(sheet)
    return sheet, parse_bounds(rng.cell_range)


def _get_values(store: SpreadsheetStore, a1: str) -> list[list[str]]:
    sheet, b = _resolve(store, a1)
    grid = store.grids[sheet]
    r0 = b.row_start or 0
    c0 = b.col_start or 0
    r1 = b.row_end if b.row_end is not None else len(grid) - 1
    out: list[list[str]] = []
    for r in range(r0, min(r1, len(grid) - 1) + 1):
        row = grid[r]
        c1 = b.col_end if b.col_end is not None else len(row) - 1
        cells = [row[c] if c < len(row) else "" for c in range(c0, c1 + 1)]
        while cells and cells[-1] == "":
            cells.pop()
        out.append(cells)
    while out and not out[-1]:
        out.pop()
    return out


def _grow(grid: Grid, rows: int, cols: int) -> None:
    while len(grid) < rows:
        grid.append([])
    for row in grid:
        while len(row) < cols:
            row.append("")


def _update(store: SpreadsheetStore, a1: str, values: list[list[str]]) -> int:
    sheet, b = _resolve(store, a1)
    grid = store.grids[sheet]
    r0 = b.row_start or 0
    c0 = b.col_start or 0
    # Clip to the range extent when bounded (undersized-range writes
    # only fill the window, like test/sql/copy_to.test's C6:C7 case).
    max_r = b.row_end if b.row_end is not None else None
    max_c = b.col_end if b.col_end is not None else None
    n = 0
    for i, row in enumerate(values):
        r = r0 + i
        if max_r is not None and r > max_r:
            break
        for j, cell in enumerate(row):
            c = c0 + j
            if max_c is not None and c > max_c:
                break
            _grow(grid, r + 1, c + 1)
            grid[r][c] = cell
            n += 1
    store.touch()
    return n


def _append(store: SpreadsheetStore, a1: str, values: list[list[str]]) -> int:
    """Append below the existing table within the range's column span."""
    sheet, b = _resolve(store, a1)
    grid = store.grids[sheet]
    c0 = b.col_start or 0
    c1 = b.col_end
    last = -1
    for r, row in enumerate(grid):
        span = row[c0 : (c1 + 1) if c1 is not None else len(row)]
        if any(cell != "" for cell in span):
            last = r
    start = max(last + 1, b.row_start or 0)
    n = 0
    for i, row in enumerate(values):
        for j, cell in enumerate(row):
            _grow(grid, start + i + 1, c0 + j + 1)
            grid[start + i][c0 + j] = cell
            n += 1
    store.touch()
    return n


def _user_entered_values(values: list[list], user_entered: bool) -> list[list]:
    """Emulate ``valueInputOption=USER_ENTERED`` cell parsing for the
    slice the connector round-trips: real Sheets turns a typed
    ``true``/``False`` (any case) into a boolean cell whose formatted
    read-back is the canonical ``TRUE``/``FALSE`` — the normalization
    that makes the reference's types.test round-trip produce uppercase
    booleans (test/sql/types.test:46-51)."""
    if not user_entered:
        return values
    out = []
    for row in values:
        out.append(
            [
                cell.strip().upper()
                if isinstance(cell, str)
                and cell.strip().lower() in ("true", "false")
                else cell
                for cell in row
            ]
        )
    return out


def _clear(store: SpreadsheetStore, a1: str) -> None:
    sheet, b = _resolve(store, a1)
    grid = store.grids[sheet]
    if b.row_start is None and b.col_start is None and b.row_end is None:
        store.grids[sheet] = []
        store.touch()
        return
    r0 = b.row_start or 0
    c0 = b.col_start or 0
    r1 = b.row_end if b.row_end is not None else len(grid) - 1
    for r in range(r0, min(r1, len(grid) - 1) + 1):
        row = grid[r]
        c1 = b.col_end if b.col_end is not None else len(row) - 1
        for c in range(c0, min(c1, len(row) - 1) + 1):
            row[c] = ""
    store.touch()


_VALUES_RE = re.compile(r"^/v4/spreadsheets/(?P<sid>[^/]+)/values/(?P<rest>.+)$")
_META_RE = re.compile(r"^/v4/spreadsheets/(?P<sid>[^/:]+)$")
_BATCH_RE = re.compile(r"^/v4/spreadsheets/(?P<sid>[^/:]+):batchUpdate$")
#: Drive v3 files.get — the revision counter the streaming reader
#: polls (served on the same host; the connector derives the Drive
#: root from api_base in hermetic setups).
_DRIVE_RE = re.compile(r"^/drive/v3/files/(?P<sid>[^/:]+)$")


class FakeSheetsServer:
    """Threaded HTTP server + store registry."""

    def __init__(self) -> None:
        self.stores: dict[str, SpreadsheetStore] = {}
        self.request_log: list[tuple[str, str]] = []
        registry = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # silence
                pass

            def _reply(self, status: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authorized(self) -> bool:
                auth = self.headers.get("Authorization", "")
                return auth.startswith("Bearer ") and len(auth) > 7

            def _handle(self, method: str) -> None:
                path = urllib.parse.unquote(self.path.split("?")[0])
                query = self.path.split("?", 1)[1] if "?" in self.path else ""
                user_entered = "valueInputOption=USER_ENTERED" in query
                registry.request_log.append((method, path))
                if not self._authorized():
                    self._reply(401, {"error": {"message": "unauthorized"}})
                    return
                length = int(self.headers.get("Content-Length") or 0)
                payload = (
                    json.loads(self.rfile.read(length)) if length else {}
                )
                try:
                    m = _VALUES_RE.match(path)
                    if m:
                        store = registry.stores[m.group("sid")]
                        rest = m.group("rest")
                        verb = None
                        for suffix in (":append", ":clear"):
                            if rest.endswith(suffix):
                                rest, verb = rest[: -len(suffix)], suffix
                                break
                        a1 = rest
                        if method == "GET" and verb is None:
                            vals = _get_values(store, a1)
                            out = {"range": a1, "majorDimension": "ROWS"}
                            if vals:
                                out["values"] = vals
                            self._reply(200, out)
                        elif method == "PUT" and verb is None:
                            vals = _user_entered_values(
                                payload.get("values", []), user_entered
                            )
                            n = _update(store, a1, vals)
                            self._reply(200, {"updatedCells": n})
                        elif method == "POST" and verb == ":append":
                            vals = _user_entered_values(
                                payload.get("values", []), user_entered
                            )
                            n = _append(store, a1, vals)
                            self._reply(200, {"updates": {"updatedCells": n}})
                        elif method == "POST" and verb == ":clear":
                            _clear(store, a1)
                            self._reply(200, {"clearedRange": a1})
                        else:
                            self._reply(405, {"error": {"message": "bad verb"}})
                        return
                    m = _BATCH_RE.match(path)
                    if m and method == "POST":
                        store = registry.stores[m.group("sid")]
                        replies = []
                        for req in payload.get("requests", []):
                            if "addSheet" in req:
                                title = req["addSheet"]["properties"]["title"]
                                props = store.add_sheet(title)
                                replies.append(
                                    {"addSheet": {"properties": props}}
                                )
                        self._reply(200, {"replies": replies})
                        return
                    m = _META_RE.match(path)
                    if m and method == "GET":
                        store = registry.stores[m.group("sid")]
                        self._reply(200, store.metadata())
                        return
                    m = _DRIVE_RE.match(path)
                    if m and method == "GET":
                        store = registry.stores[m.group("sid")]
                        # Drive serializes version as a string.
                        self._reply(200, {"version": str(store.version)})
                        return
                    self._reply(404, {"error": {"message": f"no route {path}"}})
                except KeyError as ex:
                    self._reply(404, {"error": {"message": f"not found: {ex}"}})

            def do_GET(self):
                self._handle("GET")

            def do_POST(self):
                self._handle("POST")

            def do_PUT(self):
                self._handle("PUT")

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    @property
    def base_url(self) -> str:
        host, port = self._server.server_address
        return f"http://{host}:{port}/v4"

    def start(self) -> "FakeSheetsServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()

    def new_spreadsheet(self, spreadsheet_id: str) -> SpreadsheetStore:
        store = SpreadsheetStore(spreadsheet_id)
        self.stores[spreadsheet_id] = store
        return store
