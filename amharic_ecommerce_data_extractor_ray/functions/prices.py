"""Price parsing (M17) — notebook-03 cell 11 semantics (the canonical spec;
the src/analytics variant cannot run, SURVEY.md §2.4 note).

``extract_numerical_price``: join tokens, lowercase, strip the character class
``[ብርbirr\\s,]``, ``float()`` else NaN.  Note this is a *character-class*
strip — e.g. ``"25000 etb"`` → strips b/i/r/s chars → ``"25000 et"`` → NaN —
preserved exactly.
"""

from __future__ import annotations

import math
import re

_PRICE_STRIP = re.compile(r"[ብርbirr\s,]")

NAN = float("nan")


def extract_numerical_price(price_tokens: list[str]) -> float:
    if not price_tokens:
        return NAN
    joined = "".join(price_tokens).lower()
    stripped = _PRICE_STRIP.sub("", joined)
    try:
        return float(stripped)
    except ValueError:
        return NAN


def is_nan(x: float) -> bool:
    return isinstance(x, float) and math.isnan(x)
