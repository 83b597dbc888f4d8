"""JSON canonicalization for stable line diffs.

The reference canonicalizes checkpoint payloads before diffing by parsing
them as JSON and re-serializing with Jackson's default pretty printer, so
that line splits are stable across producers; non-JSON content falls back to
a raw line split (reference: service/DiffService.java:227-240).

This module reproduces that observable behavior:

- objects print one entry per line, two-space indent per nesting level,
  ``"key" : value`` (space around the colon — Jackson's default);
- arrays print on a single line as ``[ v1, v2 ]`` (Jackson's
  FixedSpaceIndenter), with nested objects breaking onto their own lines;
- empty object/array print as ``{ }`` / ``[ ]``;
- key order is preserved (Jackson reads into LinkedHashMap).

Exact byte-parity with Jackson only matters for hunk positions of real JSON
payloads; the golden diff fixtures exercise the non-JSON fallback path.
"""

from __future__ import annotations

import json
from typing import Any

LINE_SEP = "\n"


def java_split_lines(s: str, sep: str = LINE_SEP) -> list[str]:
    """Split with Java ``String.split`` semantics: trailing empty strings are
    dropped, but splitting the empty string yields ``[""]``
    (reference relies on this in service/DiffService.java:146,170,238)."""
    if s == "":
        return [""]
    parts = s.split(sep)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def _scalar(v: Any) -> str:
    return json.dumps(v, ensure_ascii=False)


def _pretty(v: Any, depth: int) -> str:
    pad = "  " * (depth + 1)
    close_pad = "  " * depth
    if isinstance(v, dict):
        if not v:
            return "{ }"
        entries = [f'{pad}{json.dumps(str(k), ensure_ascii=False)} : {_pretty(val, depth + 1)}' for k, val in v.items()]
        return "{" + LINE_SEP + ("," + LINE_SEP).join(entries) + LINE_SEP + close_pad + "}"
    if isinstance(v, list):
        if not v:
            return "[ ]"
        return "[ " + ", ".join(_pretty(item, depth + 1) for item in v) + " ]"
    return _scalar(v)


def jackson_pretty(obj: Any) -> str:
    """Pretty-print a parsed JSON value in Jackson's default style."""
    return _pretty(obj, 0)


def canonicalize_lines(content: str) -> list[str]:
    """Parse-then-pretty-print when the content is JSON, else raw line split.

    Mirrors reference service/DiffService.java:227-240 (``doSeparateLines``).
    """
    try:
        parsed = json.loads(content)
    except (ValueError, TypeError):
        return java_split_lines(content)
    return java_split_lines(jackson_pretty(parsed))
