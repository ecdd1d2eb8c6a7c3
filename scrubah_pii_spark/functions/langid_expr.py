"""Heuristic language-ID as a native column program.

Marker-count scoring identical to core.langid.heuristic_langid: per language,
the number of non-overlapping marker-substring occurrences in the lowercased,
newline-flattened, space-padded text; winner by (score desc, language order);
'xx' when every score is 0. Occurrence counting is (len(s) - len(replace(s,
m, ''))) / len(m) — pure string ops, JVM-side, and reproducible 1:1 in ANSI
SQL for the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core.langid import LANG_MARKERS, LANG_ORDER


def _padded(text: Column) -> Column:
    return F.concat(F.lit(" "), F.replace(F.lower(text), F.lit("\n"), F.lit(" ")), F.lit(" "))


def lang_scores(text: Column) -> dict:
    p = _padded(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        s = F.lit(0)
        for m in markers:
            s = s + (F.length(p) - F.length(F.replace(p, F.lit(m), F.lit("")))) / len(m)
        out[lang] = s.cast("int")
    return out


def langid_columns(text: Column) -> dict:
    scores = lang_scores(text)
    ordered = [scores[lang] for lang in LANG_ORDER]
    best = F.greatest(*ordered)

    # winner: first language (in LANG_ORDER) achieving the max score
    lang = F.when(best == 0, "xx")
    for l in LANG_ORDER[:-1]:
        lang = lang.when(scores[l] == best, l)
    lang = lang.otherwise(LANG_ORDER[-1])

    second = F.sort_array(F.array(*ordered), asc=False)[1]
    margin = F.when(best == 0, 0).otherwise(best - second)
    score = F.when(best == 0, 0).otherwise(best)
    return {"lang_pred": lang, "lang_score": score, "lang_margin": margin}
