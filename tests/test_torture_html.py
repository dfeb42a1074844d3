"""Realistic messy-HTML torture cases: the goldens cover well-formed
synthetic fixtures; these assert sane behavior on the tag soup a
10^12-turn web corpus actually contains."""

from readability_scanner_spark.extraction.readability import extract_main_content

ARTICLE = (
    "<p>The committee approved the proposal on Tuesday, citing budget "
    "constraints, regional considerations, and a long list of procedural "
    "requirements that had accumulated over the preceding months.</p>"
    "<p>Officials said the decision, while controversial, reflected months "
    "of deliberation and consultation with stakeholders across the region, "
    "including community groups, industry bodies, and independent experts.</p>"
    "<p>The plan now moves to the full council, which is expected to vote "
    "before the end of the quarter, barring further procedural delays.</p>"
)


def test_unclosed_everything():
    html = f"<html><body><div class='content'><p>intro{ARTICLE}<div><td>stray cell"
    r = extract_main_content(html)
    assert not r.parse_failed
    assert "committee approved" in r.text_content


def test_deeply_nested_tables_layout():
    # 1990s table-based layout: article buried 6 tables deep
    inner = f"<td><div class='story'>{ARTICLE}</div></td>"
    html = "<table><tr>" + "<td><table><tr>" * 5 + inner + "</tr></table></td>" * 5 + "</tr></table>"
    r = extract_main_content(f"<html><body>{html}</body></html>")
    assert not r.parse_failed
    assert "committee approved" in r.text_content


def test_conditional_comments_and_cdata():
    html = (
        "<html><body><!--[if IE]><div class='banner'>IE junk</div><![endif]-->"
        f"<script>/*<![CDATA[*/ var x = '<p>fake</p>'; /*]]>*/</script>"
        f"<div class='article'>{ARTICLE}</div></body></html>"
    )
    r = extract_main_content(html)
    assert not r.parse_failed
    assert "fake" not in r.text_content
    assert "committee approved" in r.text_content


def test_huge_attribute_and_inline_svg():
    blob = "x" * 50_000
    html = (
        f"<html><body><div data-blob='{blob}'>"
        "<svg viewBox='0 0 10 10'><path d='M0 0'/></svg>"
        f"<div class='post-content'>{ARTICLE}</div></div></body></html>"
    )
    r = extract_main_content(html)
    assert not r.parse_failed
    assert "committee approved" in r.text_content


def test_mixed_case_tags_and_attrs():
    html = f"<HTML><BODY><DIV CLASS='Article-Content'>{ARTICLE.upper()}</DIV></BODY></HTML>"
    r = extract_main_content(html)
    assert not r.parse_failed
    assert "COMMITTEE APPROVED" in r.text_content


def test_ad_iframes_and_trackers_stripped():
    html = (
        "<html><body>"
        "<iframe src='https://ads.example.com/f'></iframe>"
        "<img src='https://tracker.example.com/p.gif' width='1' height='1'>"
        f"<div class='main'>{ARTICLE}</div>"
        "<div class='sponsor'><p>Sponsored: buy things</p></div>"
        "</body></html>"
    )
    r = extract_main_content(html)
    assert not r.parse_failed
    assert "Sponsored" not in r.text_content
    assert "committee approved" in r.text_content


def test_duplicate_body_and_stray_head_content():
    html = f"<html><head><title>t</title></head><body><body><p>x</p>{ARTICLE}</body></html>"
    r = extract_main_content(html)
    assert not r.parse_failed


def test_right_to_left_and_emoji():
    html = (
        "<html><body><div class='content'>"
        "<p>مرحبا بالعالم، هذا نص عربي طويل بما يكفي ليتم احتسابه ضمن الفقرات المهمة في الصفحة.</p>"
        f"{ARTICLE}"
        "<p>Great news 🎉🎉 everyone was thrilled, absolutely thrilled, by the outcome.</p>"
        "</div></body></html>"
    )
    r = extract_main_content(html)
    assert not r.parse_failed
    assert "🎉" in r.text_content or "committee approved" in r.text_content


def test_megabyte_document_bounded_time():
    import time

    big = "<html><body><div class='content'>" + ARTICLE * 300 + "</div></body></html>"
    assert len(big) > 150_000
    t0 = time.time()
    r = extract_main_content(big)
    assert not r.parse_failed
    assert time.time() - t0 < 10.0  # linear-ish, no quadratic blowup
