"""List-row date parsing — the L1/L2/L3 cascades as JVM-side expressions.

The reference parses board-list dates with per-site strptime cascades
(dcinside_politics.py:176-191, ppomppu_freeboard.py:152-169,
instiz_issue.py:37-74). We express the whole cascade with
``try_to_timestamp`` + regexp guards so Catalyst keeps it inside
whole-stage codegen — no Python.

Frozen-divergence note: dcinside_politics.py:188 falls back to a hard-coded
"2025-02-27" for unparseable dates (a bug; dcinside_peoplepower.py:129 uses
now()). We normalize: unparseable → NULL, today-style times → run_date.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _ts(col: Column, fmt: str) -> Column:
    return F.try_to_timestamp(col, F.lit(fmt))


def parse_list_date(date_txt: Column, date_attr: Column, run_date: str) -> Column:
    """Parse a board-list date string to a timestamp.

    ``date_attr`` is ppomppu's ``title`` attribute carrying the full
    ``yy.MM.dd HH:mm:ss`` (L2); ``date_txt`` is the visible cell text.
    ``run_date`` is "today" (YYYY-MM-DD) — time-only strings resolve to it,
    and month-day-only formats (instiz ``MM.dd HH:mm``, inven ``MM-dd``)
    resolve to the run year with the December/January boundary correction
    (instiz_issue.py:55-63).
    """
    run = F.lit(run_date)
    run_ts = F.to_timestamp(F.lit(run_date + " 23:59:59"))
    year = F.date_format(run, "yyyy")

    # month-day forms with year-boundary correction: if the assembled date
    # lands in the future relative to the run date, it was last year.
    md_dot = _ts(F.concat(year, F.lit("."), date_txt), "yyyy.MM.dd HH:mm")
    md_dot = F.when(md_dot > run_ts, md_dot - F.expr("INTERVAL 1 YEAR")).otherwise(md_dot)
    md_dash = _ts(F.concat(year, F.lit("-"), date_txt), "yyyy-MM-dd")
    md_dash = F.when(md_dash > run_ts, md_dash - F.expr("INTERVAL 1 YEAR")).otherwise(md_dash)

    return F.coalesce(
        # L2: ppomppu title attribute, full precision
        _ts(date_attr, "yy.MM.dd HH:mm:ss"),
        # time-only ⇒ today (all sites' "today" rows)
        F.when(
            date_txt.rlike(r"^\d{2}:\d{2}:\d{2}$"),
            _ts(F.concat(run, F.lit(" "), date_txt), "yyyy-MM-dd HH:mm:ss"),
        ),
        F.when(
            date_txt.rlike(r"^\d{2}:\d{2}$"),
            _ts(F.concat(run, F.lit(" "), date_txt), "yyyy-MM-dd HH:mm"),
        ),
        # absolute formats, most-specific first (L1 cascade)
        _ts(date_txt, "yyyy-MM-dd HH:mm:ss"),
        _ts(date_txt, "yyyy-MM-dd HH:mm"),
        _ts(date_txt, "yyyy-MM-dd"),
        _ts(date_txt, "yyyy.MM.dd"),
        F.when(date_txt.rlike(r"^\d{2}/\d{2}/\d{2} \d{2}:\d{2}$"), _ts(date_txt, "yy/MM/dd HH:mm")),
        F.when(date_txt.rlike(r"^\d{2}/\d{2}/\d{2}$"), _ts(date_txt, "yy/MM/dd")),
        F.when(date_txt.rlike(r"^\d{2}\.\d{2}\.\d{2}$"), _ts(date_txt, "yy.MM.dd")),
        # instiz MM.dd HH:mm / inven MM-dd (L3, year-corrected)
        F.when(date_txt.rlike(r"^\d{2}\.\d{2} \d{2}:\d{2}$"), md_dot),
        F.when(date_txt.rlike(r"^\d{2}-\d{2}$"), md_dash),
    )


def is_today(ts: Column, run_date: str) -> Column:
    """F4 freshness predicate: post date falls on the run date."""
    return F.to_date(ts) == F.lit(run_date).cast("date")
