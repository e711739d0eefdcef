"""Text-analysis operators for large-scale training-data pipelines.

All pure column expressions (JVM-side, whole-stage codegen): language ID
via stopword-hit heuristics, quality scoring from length/punct/stopword
ratios, token counting, and document fingerprinting.  At 100 TB these run
as a single map stage over the documents scan — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# tiny per-language stopword markers for the n-gram/stopword heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "fr": [" le ", " la ", " les ", " et ", " est "],
    "de": [" der ", " die ", " und ", " ist ", " das "],
    "es": [" el ", " los ", " las ", " es ", " una "],
}


def _norm(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit(" "), F.lower(F.regexp_replace(c, r"\s+", " ")), F.lit(" "))


def _marker_hits(norm: Column, lang: str) -> Column:
    hits = None
    for m in _LANG_MARKERS[lang]:
        # count non-overlapping occurrences: (len - len(without)) / len(marker)
        h = (F.length(norm) - F.length(F.replace(norm, F.lit(m), F.lit("")))) / F.lit(len(m))
        hits = h if hits is None else hits + h
    return hits


def language_id(col) -> Column:
    """Argmax of per-language stopword hit counts; 'und' when no marker
    fires.  Deterministic tie-break by the fixed language order."""
    norm = _norm(col)
    scores = [(lang, _marker_hits(norm, lang)) for lang in _LANG_MARKERS]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for lang, s in reversed(scores):
        out = F.when((best_score > 0) & (s == best_score), F.lit(lang)).otherwise(out)
    return out


def token_count(col) -> Column:
    """Whitespace token count (BPE-ish pre-tokenization proxy)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def quality_score(col) -> Column:
    """Heuristic quality in [0,1]: blend of length band, alpha ratio,
    punctuation ratio, and English-stopword density (the classic
    C4/Gopher-style cheap filters)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).cast("double")
    stop_hits = _marker_hits(_norm(c), "en").cast("double")
    toks = token_count(c).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct_penalty = F.when(n > 0, F.least(punct / n * 10.0, F.lit(1.0))).otherwise(F.lit(0.0))
    stop_density = F.when(toks > 0, F.least(stop_hits / toks * 5.0, F.lit(1.0))).otherwise(
        F.lit(0.0)
    )
    score = (
        len_score * 0.3 + alpha_ratio * 0.4 + (F.lit(1.0) - punct_penalty) * 0.1
        + stop_density * 0.2
    )
    return F.round(score, 4)


def document_fingerprint(col) -> Column:
    """Whitespace/case-canonicalized content fingerprint — md5 is
    engine-portable (identical in Spark and DuckDB), unlike xxhash64."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))
