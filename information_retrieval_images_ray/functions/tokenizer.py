"""Code-aware deterministic tokenizers.

The reference normalizes text with ``caption.lower().split()``
(/root/reference/MAP.py:5-6, caption_generator_post.py:15-16). Our
engine generalizes that to a *code-aware* analyzer per the north_star:
identifiers are split on non-alphanumerics, camelCase / snake_case /
letter-digit boundaries expand into subtokens, and both the compound
identifier and its parts are emitted (lowercased) so a query for
``getUserName`` matches docs containing ``get``, ``user``, ``name``.

Two modes:

- ``code``   — the code-aware analyzer above (rank-identity for the
  engine's own fixtures is defined against THIS tokenizer).
- ``simple`` — lowercase ``[a-z0-9]+`` runs; chosen because it is
  bit-reproducible in ANSI SQL (DuckDB
  ``regexp_extract_all(lower(text), '[a-z0-9]+')``), which the driver's
  correctness oracle uses.

Tokenizers are pure functions of the input string: no locale, no
wall-clock, no process-salted hashing. They define rank identity, so
every behavior here is frozen by golden tests
(tests/test_tokenizer.py).
"""

from __future__ import annotations

import re
from collections import Counter

# Runs of identifier characters (underscores kept so the compound
# snake_case token is emitted alongside its parts).
_IDENT_RE = re.compile(r"[A-Za-z0-9_]+")

# camelCase / ALLCAPS splitter. Digits stay attached to a preceding
# lowercase/capitalized run ("sha256", "Server2" stay whole — they are
# meaningful identifiers in code), leading digit runs stand alone:
#   "HTTPServer2Config" -> HTTP, Server2, Config
#   "parseJSON"         -> parse, JSON
#   "2fast"             -> 2fast (one [a-z0-9]+ run after lowering? no:
#                          applied pre-lowering -> "2fast" matches
#                          [a-z0-9]+ as one run)
_CAMEL_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+|[0-9]+")

_SIMPLE_RE = re.compile(r"[a-z0-9]+")


def tokenize_simple(text: str) -> list[str]:
    """Lowercase alphanumeric runs — SQL-parity tokenizer."""
    return _SIMPLE_RE.findall(text.lower())


def _split_subtokens(ident: str) -> list[str]:
    """snake_case then camelCase expansion of one identifier run."""
    parts: list[str] = []
    for chunk in ident.split("_"):
        if chunk:
            parts.extend(_CAMEL_RE.findall(chunk))
    return parts


# Identifier-expansion memo: identifiers in real code (and the Zipf
# benchmark corpus) repeat massively, and expansion of one identifier
# is a pure function — a bounded memo turns the regex+split work into
# a dict hit for the common case. Bounded (clear-on-full) so a
# pathological vocabulary can't grow worker heaps unboundedly.
_EXPAND_CACHE: dict[str, tuple[str, ...]] = {}
_EXPAND_CACHE_MAX = 1 << 20


def _expand_ident(ident: str) -> tuple[str, ...]:
    hit = _EXPAND_CACHE.get(ident)
    if hit is not None:
        return hit
    compound = ident.lower().replace("_", "")
    if not compound:
        toks: tuple[str, ...] = ()  # pure-underscore runs
    else:
        parts = _split_subtokens(ident)
        if len(parts) == 1 and parts[0].lower() == compound:
            toks = (compound,)
        else:
            toks = (compound, *(p.lower() for p in parts))
    if len(_EXPAND_CACHE) >= _EXPAND_CACHE_MAX:
        _EXPAND_CACHE.clear()
    _EXPAND_CACHE[ident] = toks
    return toks


def tokenize_code(text: str) -> list[str]:
    """Code-aware tokenize: for each identifier run emit the lowercased
    compound plus its lowercased subtokens (only when they differ from
    the compound). Order: compound first, then parts, in source order.
    """
    out: list[str] = []
    for ident in _IDENT_RE.findall(text):
        out.extend(_expand_ident(ident))
    return out


_TOKENIZERS = {"code": tokenize_code, "simple": tokenize_simple}


def get_tokenizer(mode: str):
    try:
        return _TOKENIZERS[mode]
    except KeyError:  # pragma: no cover
        raise ValueError(f"unknown tokenizer mode {mode!r}; options: {sorted(_TOKENIZERS)}")


def term_frequencies(tokens: list[str]) -> tuple[list[str], list[int]]:
    """(unique terms, tf) with terms in first-occurrence order."""
    c = Counter(tokens)
    return list(c.keys()), list(c.values())
