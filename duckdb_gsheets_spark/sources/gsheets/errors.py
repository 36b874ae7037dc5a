"""Exception hierarchy for the Sheets connector.

Behavior parity with the reference's typed exceptions
(src/include/sheets/exception.hpp:9-59): API errors carry the HTTP
status + body, parse errors wrap malformed JSON, lookup errors carry
the identifier that missed.
"""

from __future__ import annotations


class SheetsError(Exception):
    """Base class for all connector errors."""


class SheetsApiError(SheetsError):
    """Non-2xx response from the Sheets API."""

    def __init__(self, status: int, body: str):
        self.status = status
        self.body = body
        super().__init__(f"Sheets API error {status}: {body}")


class SheetsParseError(SheetsError):
    """Response body could not be decoded as the expected JSON shape."""


class SheetNotFoundError(SheetsError):
    """No sheet matched the requested id/name/index."""

    def __init__(self, identifier: object):
        self.identifier = identifier
        super().__init__(f"Sheet not found: {identifier!r}")


class SheetNotCreatedError(SheetsError):
    """addSheet batchUpdate did not return the created sheet."""


class EmptyRangeError(SheetsError):
    """A read returned no cells (reference: 'Range %s is empty',
    src/gsheets_read.cpp:190-192)."""

    def __init__(self, range_str: str):
        self.range = range_str
        super().__init__(f"Range {range_str} is empty")


class InvalidRangeError(SheetsError):
    """A1 notation failed validation."""
