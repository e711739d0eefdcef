"""Scalar column expressions re-expressing the reference's row-level logic.

Every function here is a pure JVM-side column expression (whole-stage
codegen, no Python in the hot path).  The reference's two genuine per-row
Python escapes — ``df.apply(days_to_readable_compact)`` (reference
pipeline/timeline/cbioportal_timeline_deidentify.py:189-223,497-498) and
``apply(lambda x: x[:9])`` (reference pipeline/lib/utils/
get_anchor_dates.py:39) — are eliminated by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# mixed-format tolerant parse list (reference uses pandas
# ``to_datetime(errors='coerce', format='mixed')``:
# pipeline/timeline/cbioportal_timeline_deidentify.py:412-419)
_DATE_FORMATS = [
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd",
    "MM/dd/yyyy",
    "yyyyMMdd",
]


def zero_pad_id(col, width: int = 8) -> Column:
    """MRN zero-pad (reference F1, used at e.g.
    pipeline/lib/summary/summary_config_processor.py:193-194)."""
    return F.lpad(F.col(col) if isinstance(col, str) else col, width, "0")


def tolerant_to_date(col) -> Column:
    """Null-on-failure multi-format date parse (reference F2/F3:
    pd.to_datetime(errors='coerce', format='mixed') + tz strip)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c.cast("string"), r"(Z|[+-]\d{2}:?\d{2})$", "")
    return F.coalesce(
        *[F.try_to_timestamp(c, F.lit(f)) for f in _DATE_FORMATS]
    ).cast("date")


def interval_days(date_col, anchor_col) -> Column:
    """Date→integer-day-offset deid core (reference F4:
    pipeline/timeline/cbioportal_timeline_deidentify.py:490-494)."""
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    a = F.col(anchor_col) if isinstance(anchor_col, str) else anchor_col
    return F.datediff(d, a)


def days_to_months(days) -> Column:
    """Reference F5 (pipeline/summary/cbioportal_overall_survival.py:70)."""
    d = F.col(days) if isinstance(days, str) else days
    return d / F.lit(30.417)


def days_to_years(days, denom: float = 365.25) -> Column:
    d = F.col(days) if isinstance(days, str) else days
    return d / F.lit(denom)


def coalesce_min(primary, fallback) -> Column:
    """Death date else last-contact, min-corrected (reference F6:
    cbioportal_timeline_deidentify.py:122-126) — null-safe least."""
    p = F.col(primary) if isinstance(primary, str) else primary
    f_ = F.col(fallback) if isinstance(fallback, str) else fallback
    return F.least(F.coalesce(p, f_), F.coalesce(f_, p))


def truncate_to_limit(date_col, limit_col) -> Column:
    """Cap event dates at the OS date (reference F7:
    cbioportal_timeline_deidentify.py:470-475)."""
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    l = F.col(limit_col) if isinstance(limit_col, str) else limit_col
    return F.when(l.isNotNull() & (d > l), l).otherwise(d)


def null_future_dates(date_col, today) -> Column:
    """Null dates after 'today' (reference F8:
    cbioportal_timeline_deidentify.py:444-456).  ``today`` is an injected
    job parameter, never ``current_date()`` — determinism requirement."""
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.when(d > F.lit(today).cast("date"), F.lit(None).cast("date")).otherwise(d)


def clamp_age(age_col, lo: int = 18, hi: int = 89) -> Column:
    """HIPAA age clamping (reference F15:
    pipeline/lib/utils/age_at_sequencing.py:113-132;
    pipeline/summary/patient_age_info.py:82-91).  Mixed-type result →
    string column, matching the reference's stringly output."""
    a = (F.col(age_col) if isinstance(age_col, str) else age_col).cast("double")
    return (
        F.when(a.isNull(), F.lit(None).cast("string"))
        .when(a < lo, F.lit(f"<{lo}"))
        .when(a > hi, F.lit(f">{hi}"))
        .otherwise(F.floor(a).cast("long").cast("string"))
    )


def days_to_readable(days) -> Column:
    """Compact human interval '2y 3m 15d' (reference F16:
    cbioportal_timeline_deidentify.py:189-223, applied per-row at
    :497-498).  Pure integer arithmetic + concat — no UDF."""
    d = (F.col(days) if isinstance(days, str) else days).cast("long")
    neg = d < 0
    ad = F.abs(d)
    y = F.floor(ad / 365)
    m = F.floor((ad % 365) / 30)
    dd = ad % 365 % 30
    parts = F.concat_ws(
        " ",
        F.when(y > 0, F.concat(y.cast("string"), F.lit("y"))),
        F.when(m > 0, F.concat(m.cast("string"), F.lit("m"))),
        F.when((dd > 0) | ((y == 0) & (m == 0)), F.concat(dd.cast("string"), F.lit("d"))),
    )
    return F.when(d.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(neg, F.concat(F.lit("-"), parts)).otherwise(parts)
    )


def yes_no(cond: Column) -> Column:
    """Boolean→label (reference F17:
    pipeline/summary/cbioportal_summary_pathology_pdl1.py:44)."""
    return F.when(cond, F.lit("Yes")).otherwise(F.lit("No"))


def normalize_colname(name: str) -> str:
    """Column-name normalization (reference P3/F13:
    summary_config_processor.py:306-314)."""
    out = name.strip().upper()
    for ch in (" ", "/", "-"):
        out = out.replace(ch, "_")
    return out
