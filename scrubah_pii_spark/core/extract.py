"""HTML -> text extraction (replaces the reference's PDF/DOCX/image parsers).

Our input is Common-Crawl-style pages (html:binary). The per-url invariant is
byte-identical extracted text (BASELINE.json input_hint). The extractor is a
deterministic pure function: fast path unwraps the canonical
``<html><body><pre>...</pre></body></html>`` frame produced by the corpus
generator (FIXTURES.md §1 makes extraction trivially invertible); the general
path is a deterministic tag-stripper with the block/heading/table handling the
reference's DOCX->markdown walker applies (fileParser.effect.ts:606-721
informs the rules; no code ported).
"""

from __future__ import annotations

import html as _html
import re

_PRE_FRAME_RE = re.compile(
    rb"^<html><body><pre>(.*)</pre></body></html>$", re.DOTALL
)
_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1>", re.DOTALL | re.IGNORECASE)
_BLOCK_RE = re.compile(
    r"</?(p|div|br|h[1-6]|li|tr|table|ul|ol|section|article|header|footer)\b[^>]*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_MULTI_NL_RE = re.compile(r"\n{3,}")
_TRAIL_WS_RE = re.compile(r"[ \t]+\n")


def extract_text(html_bytes: bytes) -> str:
    """Deterministic html->text. Idempotent and total (never raises)."""
    if html_bytes is None:
        return ""
    m = _PRE_FRAME_RE.match(html_bytes)
    if m:
        return m.group(1).decode("utf-8", errors="replace")
    raw = html_bytes.decode("utf-8", errors="replace")
    raw = _SCRIPT_RE.sub("", raw)
    raw = _BLOCK_RE.sub("\n", raw)
    raw = _TAG_RE.sub("", raw)
    raw = _html.unescape(raw)
    raw = _TRAIL_WS_RE.sub("\n", raw)
    raw = _MULTI_NL_RE.sub("\n\n", raw)
    return raw.strip()


def clean_final_output(text: str) -> str:
    """OCR-stutter cleanup (markdownFormatter.effect.ts:143-166): rstrip each
    line; drop a line identical to the previous CLEANED line when short
    (0 < len < 50); collapse 3+ newlines to 2; trim. Byte-exact port."""
    cleaned: list = []
    for raw in text.split("\n"):
        line = raw.rstrip()
        prev = cleaned[-1] if cleaned else None
        if prev is not None and line == prev and 0 < len(line) < 50:
            continue
        cleaned.append(line)
    return _MULTI_NL_RE.sub("\n\n", "\n".join(cleaned)).strip()
