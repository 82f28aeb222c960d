"""Live-fetch stage tests (P1 UA rotation, P2 timeout, P6 retry/backoff +
short-response detection) — fault-injecting transports and a real local
HTTP page server driving the full crawl loop."""

from __future__ import annotations

import threading
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, quote, urlparse

import pytest
from pyspark.sql import functions as F

from politics_crawler_spark.operators.fetch import (
    DEFAULT_UA_POOL,
    make_fetch_stage,
    urllib_transport,
)

# ---------------------------------------------------------------------------
# unit: retry / short-response / UA rotation via an injected fake transport
# ---------------------------------------------------------------------------

def _flaky_transport(url, ua, timeout_s):
    """Deterministic per-task transport: per-url call counting works because
    the test runs the stage in one task (coalesce(1))."""
    _flaky_transport.calls.setdefault(url, 0)
    _flaky_transport.calls[url] += 1
    n = _flaky_transport.calls[url]
    if "flaky" in url:
        if n == 1:
            raise TimeoutError("simulated timeout")  # P2/P6
        return 200, b"<html>recovered</html>"
    if "dead" in url:
        return 500, b""
    if "short" in url:
        return (200, b"x") if n == 1 else (200, b"<html>full body here</html>")
    if "tiny" in url:
        return 200, b"y"  # short on every attempt -> status 'short'
    return 200, b"<html>ok</html>"


_flaky_transport.calls = {}


def test_fetch_retry_short_and_ua(spark):
    urls = [
        ("https://h/flaky",),
        ("https://h/dead",),
        ("https://h/short",),
        ("https://h/tiny",),
        ("https://h/fine",),
    ]
    df = spark.createDataFrame(urls, "url string").coalesce(1)
    fetch = make_fetch_stage(
        transport=_flaky_transport, max_attempts=2, min_bytes=5, sleep=None
    )
    rows = {r.url: r for r in fetch(df).collect()}

    assert rows["https://h/flaky"].fetch_status == "ok"
    assert rows["https://h/flaky"].attempts == 2          # P6 retry recovered
    assert rows["https://h/dead"].fetch_status == "error"
    assert rows["https://h/dead"].attempts == 2
    assert rows["https://h/dead"].html is None
    assert rows["https://h/short"].fetch_status == "ok"   # short → retry → full
    assert rows["https://h/short"].attempts == 2
    assert rows["https://h/tiny"].fetch_status == "short"  # gave up with body
    assert rows["https://h/tiny"].html == b"y"
    assert rows["https://h/fine"].attempts == 1

    # P1: deterministic UA rotation — pool[crc32(url#attempt) % n]
    for url, r in rows.items():
        exp = DEFAULT_UA_POOL[
            zlib.crc32(f"{url}#{r.attempts}".encode()) % len(DEFAULT_UA_POOL)
        ]
        assert r.ua == exp
    # a retried url saw a DIFFERENT UA on attempt 1 than on attempt 2
    u = "https://h/flaky"
    ua1 = DEFAULT_UA_POOL[zlib.crc32(f"{u}#1".encode()) % len(DEFAULT_UA_POOL)]
    assert rows[u].ua != ua1


def test_fetch_backoff_exhausts_attempts_with_bounded_jitter(spark):
    fetch = make_fetch_stage(
        transport=lambda u, ua, t: (500, b""),
        max_attempts=3,
        backoff_s=(2.0, 4.0),
        sleep=None,  # executor-side sleeps aren't observable; jitter checked below
    )
    df = spark.createDataFrame([("https://h/x",)], "url string").coalesce(1)
    out = fetch(df).collect()
    assert out[0].attempts == 3 and out[0].fetch_status == "error"
    # deterministic backoff jitter lands in [lo, hi)
    for attempt in (1, 2):
        j = zlib.crc32(f"https://h/x#{attempt + 7919}".encode()) % 1000
        assert 2.0 <= 2.0 + (j / 1000.0) * 2.0 < 4.0


# ---------------------------------------------------------------------------
# end-to-end: full crawl over a fault-injecting local HTTP page server
# ---------------------------------------------------------------------------

class _PageServer:
    """Serves the synthetic pages table over HTTP with injected faults:
    every 7th url 500s on first hit, every 13th returns a short body on
    first hit (instiz_issue.py:221-229 territory). All recover on retry."""

    def __init__(self, pages: dict[str, bytes]):
        self.pages = pages
        self.hits: dict[str, int] = {}
        self.lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):
                q = parse_qs(urlparse(self.path).query)
                url = q.get("u", [""])[0]
                body = outer.pages.get(url)
                with outer.lock:
                    outer.hits[url] = outer.hits.get(url, 0) + 1
                    n = outer.hits[url]
                if body is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                h = zlib.crc32(url.encode())
                if n == 1 and h % 7 == 0:
                    self.send_response(500)
                    self.end_headers()
                    return
                if n == 1 and h % 13 == 0:
                    body = b"x"  # short response
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    def stop(self):
        self.server.shutdown()


def test_crawl_over_live_http_matches_snapshot_join(spark, pages_pdf, pages_df):
    """The live-fetch crawl (UA pool, retry, short-response detection, no
    pages snapshot at all) produces the same extracted set and contents as
    the synthetic join-based crawl; retry counters land in metrics."""
    from politics_crawler_spark.plans.crawl import run_crawl

    srv = _PageServer(dict(zip(pages_pdf["url"], pages_pdf["html"])))
    try:
        port = srv.port

        def transport(url, ua, timeout_s):
            return urllib_transport(
                f"http://127.0.0.1:{port}/?u={quote(url, safe='')}", ua, timeout_s
            )

        fetch = make_fetch_stage(
            transport=transport, max_attempts=2, min_bytes=50, sleep=None,
            timeout_s=5.0,
        )
        live = run_crawl(spark, None, n_shards=8, fetcher=fetch)
        base = run_crawl(spark, pages_df, n_shards=8)

        a = {(r.url, r.content) for r in live.extracted.collect()}
        b = {(r.url, r.content) for r in base.extracted.collect()}
        assert a == b and len(a) > 0

        # P6 retry counters observed per round, and faults actually fired
        total_att = sum(m["detail_fetch_attempts"] + m["list_fetch_attempts"]
                        for m in live.metrics)
        total_fetch = sum(m["detail_fetches"] + m["list_fetches"]
                          for m in live.metrics)
        assert total_att > total_fetch  # at least one retry happened
    finally:
        srv.stop()


# ---------------------------------------------------------------------------
# P3-P5: per-host pacing is ENFORCED in the fetch stage (round-4 item)
# ---------------------------------------------------------------------------

def _recording_transport(log_path):
    """Appends '<host> <monotonic>' per request — O_APPEND short writes are
    atomic, and local-mode Python workers share the filesystem."""

    def transport(url, ua, timeout_s):
        import time as _t
        from urllib.parse import urlsplit

        with open(log_path, "a") as f:
            f.write(f"{urlsplit(url).netloc} {_t.monotonic():.6f}\n")
        return 200, b"<html>plenty long ok body</html>"

    return transport


def _times_by_host(log_path):
    by = {}
    with open(log_path) as f:
        for line in f:
            h, t = line.split()
            by.setdefault(h, []).append(float(t))
    return {h: sorted(ts) for h, ts in by.items()}


def test_per_host_pacing_unsalted(spark, tmp_path):
    """Consecutive requests to one host are spaced >= min_interval_s even
    when several hosts share a task; distinct hosts don't inherit each
    other's pacing state (both hosts complete in one batch)."""
    import time as _time

    log = str(tmp_path / "req.log")
    rows = [(f"https://{h}/p{i}", h) for h in ("a.com", "b.com") for i in range(5)]
    df = spark.createDataFrame(rows, "url string, host string").coalesce(1)
    fetch = make_fetch_stage(
        transport=_recording_transport(log), max_attempts=1,
        sleep=_time.sleep, min_interval_s=0.05,
    )
    out = fetch(df).collect()
    assert len(out) == 10 and all(r.fetch_status == "ok" for r in out)
    times = _times_by_host(log)
    eps = 0.01
    for h in ("a.com", "b.com"):
        diffs = [b - a for a, b in zip(times[h], times[h][1:])]
        assert len(diffs) == 4
        assert all(d >= 0.05 - eps for d in diffs), (h, diffs)


def test_per_host_pacing_salted_budget_division(spark, tmp_path):
    """A salt-split mega-host's AGGREGATE request rate honors the same
    per-host budget: salt_n concurrent tasks each pace at salt_n ×
    min_interval_s (politeness.with_pace), so among any salt_n+1
    consecutive requests (merged across tasks) two share a task and are
    >= salt_n × interval apart — the merged stream can never exceed
    1/min_interval_s for long."""
    import time as _time

    from politics_crawler_spark.plans.politeness import (
        salted_repartition_by_host,
        with_pace,
    )

    log = str(tmp_path / "req.log")
    salt_n, interval = 3, 0.05
    plan = {"m.com": salt_n}
    df = spark.createDataFrame(
        [(f"https://m.com/p{i}", "m.com") for i in range(12)],
        "url string, host string",
    )
    paced = with_pace(
        salted_repartition_by_host(df, salt_plan=plan), interval, plan
    )
    assert "_pace_s" in paced.columns
    fetch = make_fetch_stage(
        transport=_recording_transport(log), max_attempts=1, sleep=_time.sleep,
    )
    out = fetch(paced).collect()
    assert len(out) == 12
    assert "_pace_s" not in out[0].asDict()  # stage consumes the pace column
    ts = _times_by_host(log)["m.com"]
    eps = 0.01
    # pigeonhole over the merged stream: any salt_n+1 consecutive requests
    # include two from the same task, spaced >= salt_n * interval
    for i in range(len(ts) - salt_n):
        assert ts[i + salt_n] - ts[i] >= salt_n * interval - eps, (
            i, ts[i + salt_n] - ts[i]
        )


def test_run_crawl_live_pacing_wiring(spark, pages_pdf, pages_df):
    """min_interval_s wired through run_crawl (list repartition-by-host +
    with_pace, detail budget-divided pace after salting) must leave the
    extracted output IDENTICAL to the unpaced snapshot crawl — the pace
    column and host repartitions are pure scheduling, never semantics."""
    import time as _time

    from politics_crawler_spark.plans.crawl import run_crawl

    pages = dict(zip(pages_pdf["url"], pages_pdf["html"]))

    def transport(url, ua, timeout_s):
        body = pages.get(url)
        return (200, body) if body is not None else (404, b"")

    fetch = make_fetch_stage(
        transport=transport, max_attempts=2, min_bytes=50,
        sleep=_time.sleep, min_interval_s=0.002,
    )
    live = run_crawl(
        spark, None, n_shards=8, fetcher=fetch, min_interval_s=0.002
    )
    base = run_crawl(spark, pages_df, n_shards=8)
    a = {(r.url, r.content) for r in live.extracted.collect()}
    b = {(r.url, r.content) for r in base.extracted.collect()}
    assert a == b and len(a) > 0
