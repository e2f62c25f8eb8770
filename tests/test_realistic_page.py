"""Spot-check extraction quality on a realistic article-shaped page:
body paragraphs survive; chrome (nav, infobox, references list, category
links, cookie banner, comments form) does not."""

from lightly_ocr_spark.functions.extract import extract_text

ARTICLE = """<!DOCTYPE html>
<html><head>
<title>The Example River — Example Encyclopedia</title>
<meta charset="utf-8"><style>.infobox{float:right}</style>
<script>window.dataLayer = [{"a": 1, "b": "x>y"}];</script>
</head><body>
<div id="cookie-banner"><p><a href="/accept">Accept</a> <a href="/deny">Deny</a></p></div>
<nav><ul>
<li><a href="/">Main page</a></li><li><a href="/random">Random</a></li>
<li><a href="/about">About</a></li><li><a href="/donate">Donate</a></li>
</ul></nav>
<header><h1>The Example River</h1></header>
<table class="infobox"><tr><th><a href="/len">Length</a></th><td>42 km</td></tr>
<tr><th><a href="/src">Source</a></th><td><a href="/hills">Example Hills</a></td></tr></table>
<main>
<p>The Example River is a slow moving waterway that drains the western
slopes of the Example Hills and meanders through three counties before
reaching the coastal plain near the old harbor town.</p>
<p>Early settlers used the river for transport and for powering grain
mills, and several of the original stone weirs still stand along the
middle reaches where the valley narrows considerably.</p>
<p>Seasonal flooding shaped both the floodplain agriculture and the
location of every bridge crossing, which is why the oldest villages sit
on the gravel terraces well above the winter waterline.</p>
</main>
<h2>References</h2>
<ol>
<li><a href="/ref1">Rivers of the Example Region</a></li>
<li><a href="/ref2">Hydrology Survey 1952</a></li>
<li><a href="/ref3">County Atlas</a></li>
</ol>
<div id="categories"><a href="/c/rivers">Rivers</a> | <a href="/c/geo">Geography</a></div>
<form id="comments"><p><a href="/login">Log in</a> to comment</p></form>
<footer><p>Content licensed <a href="/license">freely</a> &copy; contributors</p></footer>
</body></html>"""


def test_article_body_extracted_chrome_dropped():
    r = extract_text(ARTICLE.encode())
    text = r.text
    # all three body paragraphs, in order
    assert "slow moving waterway" in text
    assert "powering grain mills" in text.replace("\n", " ")
    assert "gravel terraces" in text
    assert text.index("waterway") < text.index("stone weirs") < text.index("terraces")
    # chrome is gone
    for chrome in ["Main page", "Donate", "Accept", "Deny", "Log in",
                   "County Atlas", "Hydrology Survey", "| ", "licensed",
                   "42 km", "dataLayer"]:
        assert chrome not in text, chrome
    # headline absorbed or dropped is fine; title tag must never leak
    assert "Example Encyclopedia" not in text
    # spans: at least one segment, scores in range, ordered
    assert len(r.spans) >= 1
    starts = [s.start for s in r.spans]
    assert starts == sorted(starts)
    assert all(0.0 <= s.score <= 1.0 for s in r.spans)


def test_search_results_page_yields_nothing():
    items = "".join(
        f'<div class="hit"><a href="/r{i}">Result {i} title words</a>'
        f'<span>site{i}.example.com</span></div>' for i in range(20)
    )
    r = extract_text(f"<html><body><div>{items}</div></body></html>".encode())
    assert r.text == ""
