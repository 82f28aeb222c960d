"""Parser fixtures (SURVEY.md §5.1): hand-written HTML per family pinning
the byte-identical extraction semantics, plus the full generator round-trip.

Hand fixtures are authored from the reference's cited behavior, NOT from the
generator — they are the independent anchor; the generator round-trip then
covers the combinatorics.
"""

from urllib.parse import urlparse

from politics_crawler_spark.parsers import sites
from politics_crawler_spark.sources.synthetic_pages import synthesize_pages_pandas


def x(site, html: str, url="u", encoding="utf-8"):
    return sites.extract(site, html.encode(encoding), url)


# -- E1 dcinside ------------------------------------------------------------

def test_dcinside_container_cascade_and_urljoin():
    r = x("dcinside", '<div class="write_div"><p>본문 A</p><p>B</p><img src="/img/x.png"></div>')
    assert r.content == "본문 A\nB"
    assert r.images == ["https://gall.dcinside.com/img/x.png"]
    r2 = x("dcinside", '<div class="writing_view_box">fallback</div>')
    assert r2.content == "fallback"
    r3 = x("dcinside", "<div>none</div>")
    assert r3.content == "내용을 찾을 수 없습니다." and r3.status == "no_content"


# -- E2 fmkorea --------------------------------------------------------------

def test_fmkorea_symbol_filter_and_bare_prefix():
    r = x("fmkorea", '<div class="xe_content"><p>안녕 hello, world! ★😀</p><img src="/files/a.jpg"></div>')
    assert r.content == "안녕 hello, world! "
    assert r.images == ["https://www.fmkorea.com/files/a.jpg"]


def test_fmkorea_keeps_allowed_punct():
    assert sites.filter_korean_english("a.b,c!d?e_f (g)") == "a.b,c!d?e_f g"


# -- E3 ppomppu --------------------------------------------------------------

def test_ppomppu_p_only_and_nbsp_skip_euckr():
    html = (
        '<table class="pic_bg"><tr><td><p>첫 줄</p><p>&nbsp;</p>주변 텍스트'
        '<img src="//cdn.x.com/a.gif"></td></tr></table>'
        '<table class="pic_bg"><tr><td><p>둘째 줄</p></td></tr></table>'
    )
    r = x("ppomppu", html, encoding="euc-kr")
    assert r.content == "첫 줄\n둘째 줄"  # td text ignored, nbsp skipped
    assert r.images == ["https://cdn.x.com/a.gif"]


def test_ppomppu_sentinels():
    assert x("ppomppu", "<div></div>", encoding="euc-kr").content == "pic_bg 테이블을 찾을 수 없습니다."
    assert (
        x("ppomppu", '<table class="pic_bg"><tr><td>no p</td></tr></table>', encoding="euc-kr").content
        == "텍스트 없음"
    )


# -- E4 ruliweb --------------------------------------------------------------

def test_ruliweb_date_recommend_and_image_rules():
    html = (
        '<span class="regdate" itemprop="datePublished">2025.03.12 (13:52:47)</span>'
        '<span class="like_value">12</span>'
        '<div class="view_content">내용<img src="/bare.png"><img src="//c.x/i.jpg">'
        '<img src="https://h/k.jpg"></div>'
    )
    r = x("ruliweb", html)
    assert r.content == "내용"
    assert r.recommend == "12"
    assert r.actual_date is not None and r.actual_date.isoformat() == "2025-03-12T13:52:47"
    assert r.images == ["https://c.x/i.jpg", "https://h/k.jpg"]  # bare dropped


# -- E5 mlbpark --------------------------------------------------------------

def test_mlbpark_ar_txt_and_ad_exclusions():
    html = (
        '<span id="likeCnt">3</span><div class="view_context">'
        '<div class="ar_txt">본문</div><img src="//i.x/a.png">'
        '<img src="https://yellow.contentsfeed.com/ad.png">'
        '<div style="background:#f8f7f7;"><img src="https://ads/x.png"></div></div>'
    )
    r = x("mlbpark", html)
    assert r.content == "본문" and r.recommend == "3"
    assert r.images == ["https://i.x/a.png"]


# -- E6 theqoo ---------------------------------------------------------------

def test_theqoo_multiclass_and_article_fallback():
    assert x("theqoo", '<div class="rd_body clear">a</div>').content == "a"
    assert x("theqoo", '<article itemprop="articleBody">b</article>').content == "b"
    r = x("theqoo", "<div>none</div>")
    assert r.content == "" and r.status == "no_content"


# -- E7 instiz ---------------------------------------------------------------

def test_instiz_loading_gif_excluded_and_bare_prefix():
    html = (
        '<div class="memo_content">글<img src="https://www.instiz.net/images/ico_loading.gif">'
        '<img src="/files/p.jpg"><img src="//e.x/q.png"></div>'
    )
    r = x("instiz", html)
    assert r.content == "글"
    assert r.images == ["https://www.instiz.net/files/p.jpg", "https://e.x/q.png"]


# -- E8 clien ----------------------------------------------------------------

def test_clien_only_frdib_images():
    html = (
        '<div class="post_article">본문<img class="fr-dib" src="/i/a.png">'
        '<img src="/i/b.png"><img class="fr-dib other" src="//c/d.png"></div>'
    )
    r = x("clien", html)
    assert r.content == "본문"
    assert r.images == ["https://www.clien.net/i/a.png", "https://c/d.png"]


# -- E9 82cook ---------------------------------------------------------------

def test_82cook_id_container():
    r = x("82cook", '<div id="articleBody">ab<img src="/p.gif"></div>')
    assert r.content == "ab"
    assert r.images == ["https://www.82cook.com/p.gif"]


# -- E10 bobaedream ----------------------------------------------------------

def test_bobaedream_cascade():
    assert x("bobaedream", '<div class="bodyCont">1</div>').content == "1"
    assert x("bobaedream", '<div class="bbs_content">2</div>').content == "2"
    assert x("bobaedream", '<div id="bodyCont">3</div>').content == "3"
    assert x("bobaedream", "<p>x</p>").content == "내용을 찾을 수 없습니다."


def test_bobaedream_ipadd_post_id_recovery():
    """bestboard post-id recovery from p.copyAddress > button.ipAdd text
    (bobaedream_bestboard.py:43-48); widget text never leaks into content."""
    html = (
        '<p class="copyAddress"><button class="ipAdd">'
        "https://www.bobaedream.co.kr/view?code=best&amp;No=987654</button></p>"
        '<div id="bodyCont">본문</div>'
    )
    r = x("bobaedream", html)
    assert r.post_id == "987654"
    assert r.content == "본문"
    # no widget → post_id None (caller falls back to the URL-derived id)
    assert x("bobaedream", '<div class="bodyCont">1</div>').post_id is None
    # button present but no No= match → None (extract_post_id returns None)
    bad = '<p class="copyAddress"><button class="ipAdd">no id here</button></p><div id="bodyCont">x</div>'
    assert x("bobaedream", bad).post_id is None


# -- E11 inven ---------------------------------------------------------------

def test_inven_video_and_date():
    html = (
        '<div class="articleDate">2025-03-12 09:30</div>'
        '<div id="powerbbsContent">글<img src="//m.x/i.png"><video src="https://v/x.mp4"></video></div>'
    )
    r = x("inven", html)
    assert r.content == "글"
    assert r.images == ["https://m.x/i.png", "https://v/x.mp4"]
    assert r.actual_date.isoformat() == "2025-03-12T09:30:00"


# -- full generator round-trip (byte-identical invariant) --------------------

def test_generator_round_trip_byte_identical(pages_pdf):
    checked = 0
    for _, row in pages_pdf.iterrows():
        if not row["text"]:
            continue
        site = sites.site_of_host(urlparse(row["url"]).netloc)
        r = sites.extract(site, row["html"], row["url"])
        assert r.status == "ok"
        assert r.content == row["text"], row["url"]
        checked += 1
    assert checked > 1000
    # all 11 families covered
    fams = {
        sites.site_of_host(urlparse(u).netloc)
        for u in pages_pdf.loc[pages_pdf["text"] != "", "url"]
    }
    assert len(fams) == 11
