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

#: the same keep-set as a plain character string (for Spark ``translate``)
KEEP_CHARS = (
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    '"<>\\^_`{|}~.-'
)


def _encode_match(m: re.Match) -> str:
    return "".join(f"%{b:02X}" for b in m.group().encode("utf-8"))


def pct_encode(value: str) -> str:
    """Percent-encode one string with pct-str URIReserved parity."""
    return _ENCODE_RE.sub(_encode_match, value)


def pct_encode_series(values: pd.Series) -> pd.Series:
    """Percent-encode a pandas Series (one Arrow batch).

    Two hot-path optimizations for corpus-scale columns:
    - factorize first: massively repeated values (conv ids, roles, graph
      names) are encoded once per distinct value per batch;
    - distinct values without any encodable character skip ``re.sub``.
    """
    import numpy as np

    values = values.fillna("")
    codes, uniques = pd.factorize(values, sort=False)
    if len(uniques) == 0:
        return values
    encoded = np.array(
        [pct_encode(u) if _ENCODE_RE.search(u) else u for u in uniques],
        dtype=object,
    )
    return pd.Series(encoded[codes], index=values.index)
