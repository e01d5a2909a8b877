"""Percent-encoding with the reference engine's exact character set.

The reference encodes template-slot values with Rust ``pct-str``'s
``URIReserved`` encoder (``/root/reference/src/function/uri_encode.rs:36-42``):
a character is percent-encoded iff it is NOT ASCII-graphic (0x21..0x7E) —
i.e. space, control chars, and all non-ASCII — OR it is one of the URI-reserved
set ``! # $ % & ' ( ) * + , / : ; = ? @ [ ]`` (which includes ``%`` itself).
Multi-byte characters are encoded per UTF-8 byte, uppercase hex.

Notably *kept raw* (ASCII-graphic, not in the reserved set):
``" < > \\ ^ _ ` { | } ~ - .`` and alphanumerics.  The raw survivors
``" < > \\ ^ ` { | }`` are *invalid* in URIs, which is how the reference's
``Iri`` function can still produce its ``"INVALID"`` sentinel downstream of
``UriEncode`` (see ``functions/iri.py``).
"""

from __future__ import annotations

import re

import pandas as pd

# Characters NOT encoded: ASCII-graphic minus pct-str's URIReserved set.
_KEEP = r'0-9A-Za-z"<>\\^_`{|}~.\-'
_ENCODE_RE = re.compile(f"[^{_KEEP}]")


def _encode_match(m: re.Match) -> str:
    return "".join(f"%{b:02X}" for b in m.group().encode("utf-8"))


def pct_encode(value: str) -> str:
    """Percent-encode one string with pct-str URIReserved parity."""
    return _ENCODE_RE.sub(_encode_match, value)


def pct_encode_series(values: pd.Series) -> pd.Series:
    """Vectorized-ish percent-encode over a pandas Series (Arrow batch).

    Only rows that actually contain an encodable character pay the
    ``re.sub`` cost; clean rows (common for id-like columns) pass through.
    """
    values = values.fillna("")
    mask = values.str.contains(_ENCODE_RE, regex=True)
    if not mask.any():
        return values
    out = values.copy()
    out[mask] = values[mask].map(pct_encode)
    return out
