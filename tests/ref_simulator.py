"""Straight-line reimplementation of the reference crawl-loop semantics.

Independent oracle for the frontier-equivalence harness (SURVEY.md §5.3):
given the same pages snapshot (url → html bytes), walk each board exactly the
way the reference scripts do — serial page loop in scheduler order
(crawler_schedule.py:23-46), regex row parsing (deliberately NOT the engine's
DOM module), notice skip (F2), URL validity (F1), today filter (F4),
min_views threshold (F3), in-run seen set (D1), consecutive-staleness stop
(P9, stop_n per board), page budget (P8, max_pages) — and emit the ordered
candidate URL list + final seen set.

The engine must reproduce the same FINAL SET and, under the deterministic
priority key (site_rank, page_no, row_idx), the same ORDER.
"""

from __future__ import annotations

import re
from datetime import datetime

from politics_crawler_spark.config import BoardConfig
from politics_crawler_spark.sources.synthetic_pages import list_url

_ROW_RE = re.compile(
    r'<tr(?P<notice> class="notice")?>'
    r'<td class="num">(?P<num>.*?)</td>'
    r'<td class="title"><a href="(?P<href>.*?)">(?P<title>.*?)</a></td>'
    r'<td class="writer">(?P<writer>.*?)</td>'
    r'<td class="date"(?: title="(?P<dattr>.*?)")?>(?P<dtxt>.*?)</td>'
    r'<td class="views">(?P<views>.*?)</td>'
    r'<td class="rec">(?P<rec>.*?)</td>'
    r'<td class="cat">(?P<cat>.*?)</td>'
    r'(?:<td class="cmt">.*?</td>)?</tr>'
)


def _parse_date(dtxt: str, dattr: str, run_date: str) -> datetime | None:
    if dattr:
        try:
            return datetime.strptime(dattr, "%y.%m.%d %H:%M:%S")
        except ValueError:
            pass
    run = datetime.fromisoformat(run_date)
    for fmt in ("%H:%M:%S", "%H:%M"):
        try:
            t = datetime.strptime(dtxt, fmt)
            return run.replace(hour=t.hour, minute=t.minute, second=t.second)
        except ValueError:
            pass
    for fmt in (
        "%Y-%m-%d %H:%M:%S",
        "%Y-%m-%d %H:%M",
        "%Y-%m-%d",
        "%Y.%m.%d",
        "%y/%m/%d %H:%M",
        "%y/%m/%d",
        "%y.%m.%d",
    ):
        try:
            return datetime.strptime(dtxt, fmt)
        except ValueError:
            pass
    for fmt, sep in (("%m.%d %H:%M", "."), ("%m-%d", "-")):
        try:
            t = datetime.strptime(dtxt, fmt)
            d = t.replace(year=run.year)
            if d > run.replace(hour=23, minute=59, second=59):
                d = d.replace(year=run.year - 1)
            return d
        except ValueError:
            pass
    return None


def _parse_views(txt: str) -> int:
    txt = txt.strip().replace(",", "")
    m = re.match(r"^([0-9]+(?:\.[0-9]+)?)\s*[kK]$", txt)
    if m:
        return int(float(m.group(1)) * 1000)
    return int(txt) if txt.isdigit() else 0


def _valid(url: str | None) -> bool:
    if not url or "javascript:" in url or "addc.dcinside.com" in url:
        return False
    return url.startswith("http")


def simulate(
    pages: dict[str, bytes], boards: list[BoardConfig], run_date: str
) -> tuple[list[tuple], set]:
    """Return (ordered candidates [(site_rank, page_no, row_idx, url)], seen set)."""
    seen: set[str] = set()
    out: list[tuple] = []
    for b in sorted(boards, key=lambda x: x.site_rank):
        stale = 0
        for page_no in range(b.max_pages):
            url = list_url(b, page_no)
            html = pages.get(url)
            if html is None:
                break
            text = html.decode(b.encoding, errors="replace")
            n_today = 0
            for row_idx, m in enumerate(_ROW_RE.finditer(text)):
                if m.group("notice") or m.group("num") in ("공지", "설문", "이벤트"):
                    continue
                link = m.group("href")
                if not _valid(link):
                    continue
                d = _parse_date(m.group("dtxt"), m.group("dattr") or "", run_date)
                if d is None or d.date() != datetime.fromisoformat(run_date).date():
                    continue
                n_today += 1
                if _parse_views(m.group("views")) < b.min_views:
                    continue
                if link in seen:
                    continue
                seen.add(link)
                out.append((b.site_rank, page_no, row_idx, link))
            if n_today == 0:
                stale += 1
            else:
                stale = 0
            if stale >= b.stop_n:
                break
    return out, seen
